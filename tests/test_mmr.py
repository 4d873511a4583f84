"""Behavioral tests for MMR diversified selection (similarity/mmr.py)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


def _emb_df(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_first_pick_is_most_relevant_then_diversifies(spark):
    """Query near cluster A: pick 1 is the closest A member, but pick 2
    must jump to cluster B even though every A member out-ranks B on
    pure relevance — the redundancy penalty at work."""
    from ton_indexer_spark.similarity.mmr import mmr_select

    def at(deg):  # unit vector at an angle from the query axis
        r = np.deg2rad(deg)
        return [float(np.cos(r)), float(np.sin(r)), 0.0, 0.0]

    # near-copies at ~30°: rel ≈ 0.87 each, but mutual sim ≈ 1.0, so
    # their marginal score after one pick is ≈ −0.13; the −60° vector
    # has rel 0.5 and is ~orthogonal to the copies → marginal ≈ +0.5
    vecs = [
        at(0),    # 0: the query itself
        at(30),   # 1: cluster A
        at(31),   # 2: cluster A near-copy
        at(29),   # 3: cluster A near-copy
        at(-60),  # 4: relevant-but-orthogonal direction
    ]
    df = _emb_df(spark, vecs)
    out = sorted(
        mmr_select(
            df.filter(F.col("vec_id") == 0), df, k=3, n_candidates=4
        ).collect(),
        key=lambda r: r["step"],
    )
    assert [r["step"] for r in out] == [1, 2, 3]
    assert out[0]["neighbor_id"] == 3  # most relevant (29° beats 30°/31°)
    assert out[1]["neighbor_id"] == 4  # diversity beats the near-copies


def test_pool_smaller_than_k_stops_early(spark):
    from ton_indexer_spark.similarity.mmr import mmr_select

    rng = np.random.default_rng(5)
    df = _emb_df(spark, rng.standard_normal((4, 8)))
    out = mmr_select(
        df.filter(F.col("vec_id") == 0), df, k=10, n_candidates=10
    ).collect()
    assert sorted(r["step"] for r in out) == [1, 2, 3]  # only 3 others


def test_precomputed_candidate_seam(spark):
    """An ANN stage's (query_id, neighbor_id, sim) pool drops in via
    `candidates` and must agree with the brute default on the same pool."""
    from ton_indexer_spark.similarity.brute import cosine_topk
    from ton_indexer_spark.similarity.mmr import mmr_select

    rng = np.random.default_rng(9)
    df = _emb_df(spark, rng.standard_normal((30, 8)))
    q = df.filter(F.col("vec_id") % 10 == 0)
    pool = cosine_topk(q, df, k=8)
    a = mmr_select(q, df, k=4, n_candidates=8).collect()
    b = mmr_select(q, df, k=4, candidates=pool).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_partition_invariance(spark):
    from ton_indexer_spark.similarity.mmr import mmr_select

    rng = np.random.default_rng(13)
    df = _emb_df(spark, rng.standard_normal((60, 8)))
    q = df.filter(F.col("vec_id") % 6 == 0)
    one = mmr_select(q, df.coalesce(1), k=3, n_candidates=10).collect()
    many = mmr_select(q, df.repartition(9), k=3, n_candidates=10).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, many))
