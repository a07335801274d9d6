"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched pandas functions over
``mapInPandas``.

The reference's tensor extension types (src/fenix/ex/arrow/) carry raw
numeric payloads with shape metadata; this package is the same idea at
the media level. The byte→pixels/samples DECODE step is REAL for formats the stdlib
can parse — 24-bit BMP (``struct``) and 8/16-bit PCM WAV (``wave``),
round-trip tested against the encoders in ``media.py`` — and stubbed
behind ``decode_payload``/``decode_audio`` for formats that need
codec libraries absent from this container (jpeg/mp3/mp4); BMP, PNG
and WAV are real stdlib codecs.
Everything Spark-side is real and tested: the schema, the mapInPandas
batch plumbing, partitioning behavior, and the feature/resize/
frame-sample operators' shapes.
"""

from fenix_spark.multimodal.media import (
    MEDIA_SCHEMA,
    audio_features,
    decode_audio,
    decode_payload,
    encode_bmp,
    encode_wav,
    image_features,
    resize_images,
    sample_frames,
    synthesize_media,
)

__all__ = [
    "MEDIA_SCHEMA",
    "audio_features",
    "decode_audio",
    "decode_payload",
    "encode_bmp",
    "encode_wav",
    "image_features",
    "resize_images",
    "sample_frames",
    "synthesize_media",
]
