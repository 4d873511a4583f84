"""Multimodal column handling for the training-data pipeline.

Policy (SURVEY-level design): image/audio/video payloads are opaque
``binary`` columns with typed metadata structs alongside.  Decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so bytes never round-trip through Python row by row,
and partitioning stays byte-size-aware (a 100 TB corpus partitions by
``total bytes per partition``, not row count).

PNG pixel decode is REAL and fully in-engine (stdlib zlib + numpy,
``png.py`` — all five scanline filters, palette/tRNS expansion, CRC
checks).  JPEG/GIF pixel decode still requires codec libraries not
present in this container, so those route to the declared external seam
(`decode_image_stub`); the deterministic-fake resize/frame/feature
stages remain for pipeline-shape tests.
"""

from ton_indexer_spark.multimodal.binary import (
    binary_metadata,
    decode_image_stub,
    decode_images,
    extract_features,
    resize_images,
    sample_frames,
    sample_gif_frames,
    with_binary_payload,
)

__all__ = [
    "binary_metadata",
    "decode_image_stub",
    "decode_images",
    "extract_features",
    "resize_images",
    "sample_frames",
    "sample_gif_frames",
    "with_binary_payload",
]
