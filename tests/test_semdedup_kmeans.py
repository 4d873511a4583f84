"""Behavioral tests for semantic dedup (SemDeDup) and distributed k-means."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def _emb_df(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


class TestSemDedup:
    def test_within_cluster_duplicates(self, spark):
        from ton_indexer_spark.similarity.semdedup import semdedup

        # two well-separated directions; ids 0/1 are the seeds, so each
        # direction forms one cluster; near-copies inside each
        vecs = [
            [1.0, 0.0, 0.0],          # 0: seed A (kept)
            [0.0, 1.0, 0.0],          # 1: seed B (kept)
            [0.999, 0.01, 0.0],       # 2: dup of 0
            [0.0, 0.998, 0.02],       # 3: dup of 1
            [0.0, 0.0, 1.0],          # 4: orthogonal — own direction,
                                       #    lands somewhere but dups nothing
        ]
        out = {
            r["vec_id"]: r
            for r in semdedup(
                _emb_df(spark, vecs), n_clusters=2, threshold=0.95
            ).collect()
        }
        assert len(out) == 5
        assert not out[0]["is_duplicate"] and out[0]["dup_of"] is None
        assert not out[1]["is_duplicate"]
        assert out[2]["is_duplicate"] and out[2]["dup_of"] == 0
        assert out[3]["is_duplicate"] and out[3]["dup_of"] == 1
        assert not out[4]["is_duplicate"]

    def test_cross_cluster_pairs_not_compared(self, spark):
        from ton_indexer_spark.similarity.semdedup import semdedup

        # 1 and 2 are near-identical, but seeds 0/1 pull them into
        # different clusters -> SemDeDup (by design) does not compare them
        vecs = [
            [1.0, 0.0],
            [0.9, 0.44],
            [0.88, 0.48],
        ]
        out = {
            r["vec_id"]: r
            for r in semdedup(
                _emb_df(spark, vecs), n_clusters=2, threshold=0.99
            ).collect()
        }
        if out[1]["cluster_id"] != out[2]["cluster_id"]:
            assert not out[2]["is_duplicate"]

    def test_partition_invariance(self, spark):
        from ton_indexer_spark.similarity.semdedup import semdedup

        rng = np.random.default_rng(7)
        vecs = rng.normal(size=(60, 8))
        df = _emb_df(spark, vecs)
        a = sorted(
            (r["vec_id"], r["cluster_id"], r["dup_of"], r["is_duplicate"])
            for r in semdedup(df, n_clusters=4, threshold=0.6).collect()
        )
        b = sorted(
            (r["vec_id"], r["cluster_id"], r["dup_of"], r["is_duplicate"])
            for r in semdedup(
                df.repartition(13), n_clusters=4, threshold=0.6
            ).collect()
        )
        assert a == b


class TestKMeans:
    def test_matches_numpy_reference(self, spark):
        from ton_indexer_spark.similarity.kmeans import QUANT, kmeans

        rng = np.random.default_rng(11)
        vecs = rng.normal(size=(80, 6)).astype(np.float32)
        out = {
            r["vec_id"]: r["cluster_id"]
            for r in kmeans(_emb_df(spark, vecs), k=4, n_iter=3).collect()
        }

        # reference replay in numpy with the same exact-integer update
        def unit(m):
            n = np.linalg.norm(m, axis=1, keepdims=True)
            n[n == 0] = 1.0
            return m / n

        def rha(x, d=6):
            s = 10.0**d
            return np.sign(x) * np.floor(np.abs(x) * s + 0.5) / s

        mat = vecs.astype(np.float64)
        cids = np.arange(4, dtype=np.int64)
        cent = unit(mat[:4])
        for it in range(3):
            sims = rha(unit(mat) @ cent.T)
            order = np.lexsort((np.broadcast_to(cids, sims.shape), -sims))
            assign = cids[order[:, 0]]
            if it == 2:
                break
            qv = rha(mat * QUANT, 0).astype(np.int64)
            new_ids, new_cent = [], []
            for c in sorted(set(assign)):
                members = qv[assign == c]
                new_ids.append(c)
                new_cent.append(members.sum(axis=0) / (len(members) * QUANT))
            cids = np.array(new_ids, dtype=np.int64)
            cent = unit(np.array(new_cent))
        expected = dict(enumerate(assign.tolist()))
        assert out == expected

    def test_partition_invariance(self, spark):
        from ton_indexer_spark.similarity.kmeans import kmeans

        rng = np.random.default_rng(3)
        vecs = rng.normal(size=(100, 5)).astype(np.float32)
        df = _emb_df(spark, vecs)
        a = sorted(
            (r["vec_id"], r["cluster_id"])
            for r in kmeans(df, k=5, n_iter=3).collect()
        )
        b = sorted(
            (r["vec_id"], r["cluster_id"])
            for r in kmeans(df.repartition(17), k=5, n_iter=3).collect()
        )
        assert a == b

    def test_single_iteration_is_seed_assignment(self, spark):
        from ton_indexer_spark.similarity.ivf import ivf_assign, ivf_seed_matrix
        from ton_indexer_spark.similarity.kmeans import kmeans

        rng = np.random.default_rng(5)
        vecs = rng.normal(size=(30, 4)).astype(np.float32)
        df = _emb_df(spark, vecs)
        got = sorted(
            (r["vec_id"], r["cluster_id"])
            for r in kmeans(df, k=3, n_iter=1).collect()
        )
        ids, seeds = ivf_seed_matrix(df, 3)
        want = sorted(
            (r["vec_id"], r["list_id"])
            for r in ivf_assign(df, ids, seeds, nprobe=1).collect()
        )
        assert got == want

    def test_rejects_bad_iter(self, spark):
        from ton_indexer_spark.similarity.kmeans import kmeans

        with pytest.raises(ValueError):
            kmeans(_emb_df(spark, [[1.0, 0.0]]), k=1, n_iter=0)


def test_kmeans_fit_centroids_drop_into_ivf(spark):
    """kmeans_fit's trained centroids work as ivf_topk's coarse quantizer
    (the offline-training seam) and recall at nprobe=k_lists equals the
    brute-force top-k."""
    from ton_indexer_spark.similarity.brute import cosine_topk
    from ton_indexer_spark.similarity.ivf import ivf_topk
    from ton_indexer_spark.similarity.kmeans import kmeans_fit

    rng = np.random.default_rng(19)
    vecs = rng.normal(size=(120, 6)).astype(np.float32)
    df = _emb_df(spark, vecs)
    _assign, ids, cent = kmeans_fit(df, k=4, n_iter=3)
    assert cent.shape == (len(ids), 6)
    queries = df.filter(F.col("vec_id") % 40 == 0)
    got = ivf_topk(queries, df, nprobe=len(ids), k=3,
                   centroids=(ids, cent))
    brute = cosine_topk(queries, df, k=3)
    a = sorted(map(tuple, got.select("query_id", "rank", "neighbor_id").collect()))
    b = sorted(map(tuple, brute.select("query_id", "rank", "neighbor_id").collect()))
    assert a == b  # probing every trained list == exact search


def test_semdedup_with_trained_centroids(spark):
    """kmeans_fit centroids drop into semdedup (the published SemDeDup
    recipe: k-means clusters, then within-cluster near-dup)."""
    from ton_indexer_spark.similarity.kmeans import kmeans_fit
    from ton_indexer_spark.similarity.semdedup import semdedup

    rng = np.random.default_rng(23)
    base = rng.normal(size=(40, 6))
    vecs = np.vstack([base, base[:5] + 1e-4])  # 5 near-copies appended
    df = _emb_df(spark, vecs)
    _a, ids, cent = kmeans_fit(df, k=4, n_iter=2)
    out = {r["vec_id"]: r
           for r in semdedup(df, threshold=0.999,
                             centroids=(ids, cent)).collect()}
    assert len(out) == 45
    dups = [v for v in out.values() if v["is_duplicate"]]
    # each appended near-copy lands in its original's cluster (identical
    # direction) and is flagged against it
    assert {d["vec_id"] for d in dups} == {40, 41, 42, 43, 44}
    assert all(out[40 + i]["dup_of"] == i for i in range(5))
