"""Persisted ANN index round-trips (similarity/index_store.py): serving
from a saved+loaded artifact must equal serving from a fresh build."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


def _emb_df(spark, n=80, d=16, seed=21):
    rng = np.random.default_rng(seed)
    rows = [
        (i, [float(x) for x in v]) for i, v in enumerate(
            rng.standard_normal((n, d))
        )
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_ivf_index_roundtrip(spark, tmp_path):
    from ton_indexer_spark.similarity.index_store import (
        load_ivf_index,
        save_ivf_index,
    )
    from ton_indexer_spark.similarity.ivf import (
        ivf_assign,
        ivf_seed_matrix,
        ivf_topk,
    )

    df = _emb_df(spark)
    q = df.filter(F.col("vec_id") % 10 == 0)
    cents = ivf_seed_matrix(df, n_lists=8)
    assigned = ivf_assign(df, *cents, nprobe=1)
    save_ivf_index(str(tmp_path / "ivf"), cents, assigned)
    loaded_c, loaded_a = load_ivf_index(spark, str(tmp_path / "ivf"))

    fresh = ivf_topk(q, df, n_lists=8, nprobe=3, k=4).collect()
    served = ivf_topk(
        q, df, nprobe=3, k=4, centroids=loaded_c, assigned=loaded_a
    ).collect()
    assert sorted(map(tuple, fresh)) == sorted(map(tuple, served))
    # the inverted lists are partition-pruned artifacts
    parts = [p.name for p in (tmp_path / "ivf" / "assigned").iterdir()]
    assert any(p.startswith("list_id=") for p in parts)


def test_pq_index_roundtrip(spark, tmp_path):
    from ton_indexer_spark.similarity.index_store import (
        load_pq_index,
        save_pq_index,
    )
    from ton_indexer_spark.similarity.pq import (
        pq_encode,
        pq_seed_codebooks,
        pq_topk,
    )

    df = _emb_df(spark)
    q = df.filter(F.col("vec_id") % 10 == 3)
    cb = pq_seed_codebooks(df, n_code=8, n_sub=4)
    codes = pq_encode(df, cb)
    save_pq_index(str(tmp_path / "pq"), cb, codes)
    loaded_cb, loaded_codes = load_pq_index(spark, str(tmp_path / "pq"))
    assert np.array_equal(loaded_cb, cb)

    fresh = pq_topk(q, df, n_code=8, n_sub=4, k=4).collect()
    served = pq_topk(
        q, df, n_sub=4, k=4, codebooks=loaded_cb, codes=loaded_codes
    ).collect()
    assert sorted(map(tuple, fresh)) == sorted(map(tuple, served))
