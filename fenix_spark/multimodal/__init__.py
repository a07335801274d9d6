"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched pandas functions over
``mapInPandas``.

The reference's tensor extension types (src/fenix/ex/arrow/) carry raw
numeric payloads with shape metadata; this package is the same idea at
the media level. The byte→pixels/samples DECODE step is REAL for
24-bit BMP (``struct``), 8/16-bit PCM WAV (``wave``), 8-bit PNG
(``zlib`` + ``struct``, all five scanline filters), baseline JPEG
(numpy DCT codec in ``jpeg.py`` — 4:4:4/4:2:2/4:2:0, restart markers)
and lossless WebP (pure-Python VP8L in ``vp8l.py``, golden-tested
byte-identical to libwebp, with the system libwebp as a ctypes fast
path when loadable); formats that still need absent codec libraries
(mp3/mp4 payloads, lossy VP8 without libwebp) raise
NotImplementedError at the single
``decode_payload``/``decode_audio`` swap-in point.
Everything Spark-side is real and tested: the schema,
the mapInPandas batch plumbing, partitioning behavior, and the
feature/resize/frame-sample operators' shapes.
"""

from fenix_spark.multimodal.jpeg import decode_jpeg, encode_jpeg
from fenix_spark.multimodal.audiofp import (
    audio_fingerprints,
    audio_match_pairs,
    frame_hashes,
)
from fenix_spark.multimodal.audiofeat import (
    audio_mfcc,
    log_mel_spectrogram,
    mel_filterbank,
    mfcc,
)
from fenix_spark.multimodal.mp3 import parse_id3v2, write_id3v2
from fenix_spark.multimodal.compress import (
    decompress_blobs,
    decompress_payload,
    sniff_compression,
)
from fenix_spark.multimodal.exif import (
    apply_orientation,
    image_exif,
    parse_exif,
    write_exif_app1,
)
from fenix_spark.multimodal.phash import (
    dhash64,
    image_dhashes,
    image_neardup_pairs,
)
from fenix_spark.multimodal.mp4 import (
    encode_minimal_mp4,
    encode_mp4_with_samples,
    mp4_sample_ranges,
    parse_mp4_metadata,
    sample_encoded_frames,
    video_frame_dedup_pairs,
    video_metadata,
)
from fenix_spark.multimodal.gif import decode_gif, encode_gif, parse_gif_metadata
from fenix_spark.multimodal.tiff import decode_tiff, encode_tiff, parse_tiff_metadata
from fenix_spark.multimodal.vp8l import decode_vp8l, decode_webp_lossless
from fenix_spark.multimodal.vp8l_enc import encode_vp8l
from fenix_spark.multimodal.media import (
    MEDIA_SCHEMA,
    audio_features,
    decode_audio,
    decode_payload,
    encode_bmp,
    encode_png,
    encode_wav,
    image_features,
    resize_images,
    sample_frames,
    synthesize_media,
)

__all__ = [
    "MEDIA_SCHEMA",
    "audio_features",
    "audio_fingerprints",
    "audio_mfcc",
    "log_mel_spectrogram",
    "mel_filterbank",
    "mfcc",
    "apply_orientation",
    "decompress_blobs",
    "decompress_payload",
    "sniff_compression",
    "image_exif",
    "parse_exif",
    "parse_id3v2",
    "write_id3v2",
    "write_exif_app1",
    "audio_match_pairs",
    "decode_audio",
    "decode_jpeg",
    "decode_payload",
    "decode_gif",
    "decode_tiff",
    "decode_vp8l",
    "decode_webp_lossless",
    "encode_gif",
    "encode_tiff",
    "encode_vp8l",
    "parse_gif_metadata",
    "parse_tiff_metadata",
    "encode_bmp",
    "encode_jpeg",
    "encode_png",
    "dhash64",
    "encode_minimal_mp4",
    "encode_mp4_with_samples",
    "mp4_sample_ranges",
    "sample_encoded_frames",
    "video_frame_dedup_pairs",
    "frame_hashes",
    "encode_wav",
    "image_dhashes",
    "image_features",
    "image_neardup_pairs",
    "resize_images",
    "sample_frames",
    "parse_mp4_metadata",
    "synthesize_media",
    "video_metadata",
]
