"""Multimodal column handling for the training-data pipeline.

Policy (SURVEY-level design): image/audio/video payloads are opaque
``binary`` columns with typed metadata structs alongside.  Decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so bytes never round-trip through Python row by row,
and partitioning stays byte-size-aware (a 100 TB corpus partitions by
``total bytes per partition``, not row count).

The decode step itself requires codec libraries not present in this
container, so it is STUBBED (`NotImplementedError` / deterministic fake) —
the Spark-side plumbing (schema, UDF signature, batch shape, metadata
computation) is real and tested.
"""

from ton_indexer_spark.multimodal.binary import (
    binary_metadata,
    decode_image_stub,
    extract_features,
    resize_images,
    sample_frames,
    with_binary_payload,
)

__all__ = [
    "binary_metadata",
    "decode_image_stub",
    "extract_features",
    "resize_images",
    "sample_frames",
    "with_binary_payload",
]
