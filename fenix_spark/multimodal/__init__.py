"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched pandas functions over
``mapInPandas``.

The reference's tensor extension types (src/fenix/ex/arrow/) carry raw
numeric payloads with shape metadata; this package is the same idea at
the media level. Codec libraries (Pillow, ffmpeg, soundfile) are NOT in
this container, so the byte→pixels/samples DECODE step is stubbed
behind ``fenix_spark.multimodal.media.decode_payload`` — a
deterministic fake decoder (documented there) — while everything
Spark-side is real and tested: the schema, the mapInPandas batch
plumbing, partitioning behavior, and the feature/resize/frame-sample
operators' shapes.
"""

from fenix_spark.multimodal.media import (
    MEDIA_SCHEMA,
    audio_features,
    decode_payload,
    image_features,
    resize_images,
    sample_frames,
    synthesize_media,
)

__all__ = [
    "MEDIA_SCHEMA",
    "audio_features",
    "decode_payload",
    "image_features",
    "resize_images",
    "sample_frames",
    "synthesize_media",
]
