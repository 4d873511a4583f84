"""Behavioral tests for product-quantization ANN (similarity/pq.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def _emb_df(spark, vecs, start_id=0):
    rows = [
        (start_id + i, [float(x) for x in v]) for i, v in enumerate(vecs)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _rand_vecs(n, d, seed=7):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, d))


class TestPqEncode:
    def test_codes_shape_and_determinism(self, spark):
        from ton_indexer_spark.similarity.pq import (
            pq_encode,
            pq_seed_codebooks,
        )

        df = _emb_df(spark, _rand_vecs(40, 8))
        cb = pq_seed_codebooks(df, n_code=4, n_sub=2)
        assert cb.shape == (2, 4, 4)
        codes = {r["vec_id"]: r["codes"] for r in pq_encode(df, cb).collect()}
        assert len(codes) == 40
        assert all(len(c) == 2 for c in codes.values())
        assert all(0 <= x < 4 for c in codes.values() for x in c)
        # seeds quantize to themselves: seed i's subvectors ARE codeword i
        for i in range(4):
            assert codes[i] == [i, i]

    def test_partition_invariance(self, spark):
        from ton_indexer_spark.similarity.pq import (
            pq_encode,
            pq_seed_codebooks,
        )

        df = _emb_df(spark, _rand_vecs(64, 8))
        cb = pq_seed_codebooks(df, n_code=8, n_sub=2)
        one = {
            r["vec_id"]: r["codes"]
            for r in pq_encode(df.coalesce(1), cb).collect()
        }
        many = {
            r["vec_id"]: r["codes"]
            for r in pq_encode(df.repartition(7), cb).collect()
        }
        assert one == many

    def test_dim_not_divisible_raises(self, spark):
        from ton_indexer_spark.similarity.pq import pq_seed_codebooks

        df = _emb_df(spark, _rand_vecs(8, 6))
        with pytest.raises(ValueError, match="not divisible"):
            pq_seed_codebooks(df, n_code=4, n_sub=4)


class TestPqTopk:
    def test_exact_when_corpus_equals_codebook(self, spark):
        """With the whole corpus inside the codebook, quantization is
        lossless and ADC ranks exactly like brute-force L2."""
        from ton_indexer_spark.similarity.pq import pq_topk

        vecs = _rand_vecs(8, 8)
        df = _emb_df(spark, vecs)
        out = pq_topk(df.filter(F.col("vec_id") == 0), df, n_code=8,
                      n_sub=2, k=3).collect()
        got = [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])]
        d = np.linalg.norm(vecs - vecs[0], axis=1)
        want = [int(i) for i in np.argsort(d) if i != 0][:3]
        assert got == want

    def test_recall_against_brute_force(self, spark):
        """Clustered data: ADC top-1 finds a same-cluster member for
        every query (the recall property PQ is used for)."""
        from ton_indexer_spark.similarity.pq import pq_topk

        rng = np.random.default_rng(3)
        centers = rng.standard_normal((4, 16)) * 10
        vecs = np.vstack([
            c + rng.standard_normal((10, 16)) * 0.1 for c in centers
        ])
        df = _emb_df(spark, vecs)
        queries = df.filter(F.col("vec_id") % 10 == 5)
        out = pq_topk(queries, df, n_code=8, n_sub=4, k=1).collect()
        assert len(out) == 4
        for r in out:
            assert r["neighbor_id"] // 10 == r["query_id"] // 10

    def test_self_excluded_and_rank_contiguous(self, spark):
        from ton_indexer_spark.similarity.pq import pq_topk

        df = _emb_df(spark, _rand_vecs(30, 8))
        out = pq_topk(df.filter(F.col("vec_id") < 3), df, n_code=4,
                      n_sub=2, k=5).collect()
        by_q = {}
        for r in out:
            assert r["neighbor_id"] != r["query_id"]
            by_q.setdefault(r["query_id"], []).append(r["rank"])
        assert set(by_q) == {0, 1, 2}
        assert all(sorted(v) == [1, 2, 3, 4, 5] for v in by_q.values())

    def test_max_queries_guard(self, spark):
        from ton_indexer_spark.similarity.pq import pq_topk

        df = _emb_df(spark, _rand_vecs(12, 8))
        with pytest.raises(ValueError, match="max_queries"):
            pq_topk(df, df, n_code=4, n_sub=2, k=2, max_queries=4)

    def test_hard_negative_mode_masks_same_label(self, spark):
        """brute.cosine_topk(exclude_label_col=...) — the hard-negative
        miner must return the nearest OTHER-class vectors even when the
        globally nearest neighbors share the query's class."""
        from ton_indexer_spark.similarity.brute import cosine_topk

        rng = np.random.default_rng(11)
        a = rng.standard_normal(8)
        vecs = [a, a * 1.01, a * 0.99, -a, rng.standard_normal(8)]
        rows = [
            (i, [float(x) for x in v], lab)
            for i, (v, lab) in enumerate(zip(vecs, [0, 0, 0, 1, 2]))
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        out = cosine_topk(
            df.filter(F.col("vec_id") == 0), df, k=2,
            exclude_label_col="label",
        ).collect()
        got = {r["neighbor_id"] for r in out}
        # ids 1/2 are near-copies but share label 0 — must be excluded
        assert got == {3, 4}

    def test_hard_negative_null_label_excluded(self, spark):
        """SQL `!=` semantics: a NULL label on either side is never a
        hard negative (matches the gate oracle's NULL handling)."""
        from ton_indexer_spark.similarity.brute import cosine_topk

        a = [1.0, 0.0, 0.0, 0.0]
        rows = [
            (0, a, 0),          # query, label 0
            (1, a, None),       # near-copy, NULL label — excluded
            (2, a, 1),          # near-copy, other label — the negative
            (3, a, 0),          # same label — excluded
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        out = cosine_topk(
            df.filter(F.col("vec_id") == 0), df, k=4,
            exclude_label_col="label",
        ).collect()
        assert {r["neighbor_id"] for r in out} == {2}

    def test_trained_codebook_seam(self, spark):
        """A caller may pass offline-trained codebooks; the seeds path and
        an explicitly-passed identical tensor must agree."""
        from ton_indexer_spark.similarity.pq import (
            pq_seed_codebooks,
            pq_topk,
        )

        df = _emb_df(spark, _rand_vecs(40, 8))
        cb = pq_seed_codebooks(df, n_code=8, n_sub=2)
        q = df.filter(F.col("vec_id") % 10 == 0)
        a = pq_topk(q, df, n_code=8, n_sub=2, k=3).collect()
        b = pq_topk(q, df, n_sub=2, k=3, codebooks=cb).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
