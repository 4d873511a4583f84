"""Multimodal column handling for the training-data pipeline.

Policy (SURVEY-level design): image/audio/video payloads are opaque
``binary`` columns with typed metadata structs alongside.  Decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so bytes never round-trip through Python row by row,
and partitioning stays byte-size-aware (a 100 TB corpus partitions by
``total bytes per partition``, not row count).

Pixel decode is REAL and fully in-engine for all three driver-visible
image formats: PNG (``png.py`` — stdlib zlib, all five scanline
filters, palette/tRNS, CRC checks), GIF (``gif.py`` — pure-python LZW,
interlace, transparency, animated frame sampling) and baseline JPEG
(``jpeg.py`` — canonical Huffman, restart markers, exact matrix IDCT,
4:2:0/4:2:2 chroma, BT.601).  `decode_image_stub` remains only as the
hook a deployment would wire PIL into for progressive JPEG or formats
outside these three; the deterministic-fake resize/frame/feature
stages remain for pipeline-shape tests.
"""

from ton_indexer_spark.multimodal.binary import (
    audio_features,
    binary_metadata,
    decode_audio,
    decode_image_stub,
    decode_images,
    extract_features,
    resize_images,
    sample_frames,
    sample_gif_frames,
    with_binary_payload,
)

__all__ = [
    "audio_features",
    "binary_metadata",
    "decode_audio",
    "decode_image_stub",
    "decode_images",
    "extract_features",
    "resize_images",
    "sample_frames",
    "sample_gif_frames",
    "with_binary_payload",
]
