"""Multimodal stage plumbing: resize / frame-sample / feature-extract
(SURVEY-level 'beyond' operators; decode is a deterministic fake, the
Spark-side schemas, batching, and explode semantics are the product)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from ton_indexer_spark.catalog import Catalog
from ton_indexer_spark.multimodal import (
    extract_features,
    resize_images,
    sample_frames,
    with_binary_payload,
)


def _docs(spark):
    return with_binary_payload(Catalog(spark, SF_SMALL).documents.limit(50))


def test_resize_fixed_shape_and_deterministic(spark):
    out = resize_images(_docs(spark), width=8, height=4).collect()
    assert len(out) == 50
    assert all(r["width"] == 8 and r["height"] == 4 for r in out)
    assert all(len(r["pixels"]) == 32 for r in out)
    # determinism: same input -> same pixels
    again = {r["doc_id"]: r["pixels"]
             for r in resize_images(_docs(spark), width=8, height=4).collect()}
    assert all(again[r["doc_id"]] == r["pixels"] for r in out)


def test_sample_frames_counts_and_content(spark):
    docs = _docs(spark)
    raw = {r["doc_id"]: r["payload"] for r in docs.collect()}
    frames = sample_frames(docs, every_n=2, frame_bytes=64).collect()
    by_doc: dict[int, list] = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, blob in raw.items():
        n_frames = max(1, len(blob) // 64)
        expect_idxs = list(range(0, n_frames, 2))
        rows = sorted(by_doc[doc_id], key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in rows] == expect_idxs
        for r in rows:
            i = r["frame_idx"]
            assert bytes(r["frame"]) == bytes(blob[i * 64:(i + 1) * 64])


def test_extract_features_feed_similarity(spark):
    feats = extract_features(_docs(spark), dim=16)
    rows = feats.collect()
    assert all(len(r["embedding"]) == 16 for r in rows)
    assert all(-1.0 <= v <= 1.0 for r in rows for v in r["embedding"])
    # the output column shape matches the embeddings table, so the vectors
    # compose straight into the ANN operators
    from ton_indexer_spark.similarity import cosine_topk

    q = feats.filter(F.col("doc_id") % 10 == 0).withColumnRenamed(
        "doc_id", "vec_id"
    )
    c = feats.withColumnRenamed("doc_id", "vec_id")
    topk = cosine_topk(q, c, k=3, id_col="vec_id", vec_col="embedding")
    got = topk.groupBy("query_id").count().collect()
    assert got and all(r["count"] == 3 for r in got)
