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


class TestImageHeaderDecode:
    """PNG IHDR / JPEG SOFn / GIF descriptor parsing from spec-built
    bytes (ISO 15948 §11.2.2, ITU-T.81 §B.2.2, GIF89a §18) — pure header
    reads, no codec."""

    def test_png(self):
        from ton_indexer_spark.multimodal.binary import decode_image_header
        blob = (b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
                + (7).to_bytes(4, "big") + (99999).to_bytes(4, "big"))
        assert decode_image_header(blob) == ("png", 7, 99999)

    def test_jpeg_progressive_sof2_and_restart_markers(self):
        from ton_indexer_spark.multimodal.binary import decode_image_header
        # fill bytes before the marker + SOF2 (progressive)
        blob = (b"\xff\xd8\xff\xff\xff"
                + b"\xc2" + (11).to_bytes(2, "big") + b"\x08"
                + (33).to_bytes(2, "big") + (44).to_bytes(2, "big")
                + b"\x01\x01\x11\x00")
        assert decode_image_header(blob) == ("jpeg", 44, 33)

    def test_jpeg_dht_is_not_a_frame_header(self):
        from ton_indexer_spark.multimodal.binary import decode_image_header
        # DHT (0xC4) sits in the SOF range numerically but is not a frame
        blob = (b"\xff\xd8\xff"
                + b"\xc4" + (5).to_bytes(2, "big") + b"\x00\x01\x02"
                + b"\xff\xc0" + (11).to_bytes(2, "big") + b"\x08"
                + (10).to_bytes(2, "big") + (20).to_bytes(2, "big")
                + b"\x01\x01\x11\x00")
        assert decode_image_header(blob) == ("jpeg", 20, 10)

    def test_jpeg_sos_before_sof_gives_no_dims(self):
        from ton_indexer_spark.multimodal.binary import decode_image_header
        blob = (b"\xff\xd8\xff"
                + b"\xda" + (4).to_bytes(2, "big") + b"\x00\x00"
                + b"\x12\x34")
        assert decode_image_header(blob) == ("jpeg", None, None)

    def test_gif87a(self):
        from ton_indexer_spark.multimodal.binary import decode_image_header
        blob = b"GIF87a" + (2).to_bytes(2, "little") + (3).to_bytes(2, "little")
        assert decode_image_header(blob) == ("gif", 2, 3)

    def test_garbage_and_none(self):
        from ton_indexer_spark.multimodal.binary import decode_image_header
        assert decode_image_header(b"\x00\x01") == (None, None, None)
        assert decode_image_header(None) == (None, None, None)
        assert decode_image_header(b"") == (None, None, None)

    def test_png_wrong_first_chunk(self):
        from ton_indexer_spark.multimodal.binary import decode_image_header
        blob = (b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"XXXX"
                + b"\x00" * 8)
        assert decode_image_header(blob) == ("png", None, None)
