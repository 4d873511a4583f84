"""Binary-column plumbing: metadata extraction and the stubbed decode stage.

``binary_metadata`` is the real production shape: an Arrow-batched
``mapInPandas`` pass computing per-blob metadata (byte length, digest,
magic-byte sniff) — the pattern every decode/feature stage follows.  The
iterator-of-batches signature means constant memory per task regardless of
blob sizes, and the output schema is explicit so Catalyst can prune it.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MAGIC = {
    b"\xff\xd8\xff": "jpeg",
    b"\x89PNG": "png",
    b"GIF8": "gif",
    b"RIFF": "riff",  # wav/avi containers
    b"OggS": "ogg",
}

META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("format", T.StringType()),
    ]
)


def with_binary_payload(df: DataFrame, text_col: str = "text",
                        out_col: str = "payload") -> DataFrame:
    """Testing aid: derive a deterministic binary column from text (the
    container has no real media files).  Production replaces this with the
    parquet binary column itself."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))


def binary_metadata(df: DataFrame, id_col: str = "doc_id",
                    payload_col: str = "payload") -> DataFrame:
    """Per-blob metadata via Arrow-batched mapInPandas."""

    def meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": blobs.map(lambda b: 0 if b is None else len(b)),
                    "digest": blobs.map(
                        lambda b: hashlib.md5(b or b"").hexdigest()
                    ),
                    "format": blobs.map(_sniff),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(meta, schema=META_SCHEMA)


def _sniff(blob: bytes | None) -> str:
    if not blob:
        return "empty"
    for magic, fmt in _MAGIC.items():
        if blob[: len(magic)] == magic:
            return fmt
    return "unknown"


def decode_image_stub(blob: bytes) -> None:
    """Decode stage stub — the real implementation needs an image codec
    (PIL/libjpeg) that is intentionally not vendored here.  The mapInPandas
    wrapper calling this is identical to ``binary_metadata``'s."""
    raise NotImplementedError(
        "image decode requires a codec library; wire PIL/torchvision here — "
        "the Spark-side batch plumbing is binary_metadata()'s shape"
    )
