"""High-dimensionality probe for ``cosine_neardup_pairs`` (r9 ask #4).

PERF.md's round-9 analysis argued the 40.9x/decade wall growth of
`dedup_embedding_cosine` is inherent to sign-LSH at 64 dims (16 bands x
4 planes uses EVERY coordinate, so the bucket count is pinned at
2^4/band and per-bucket flops grow quadratically with the corpus) and
that production dims (768-4096) allow more planes per band, re-bounding
bucket sizes and restoring ~linear scaling.  That was analysis; this
probe is the measurement.

Design: two decades of a 768-dim store (100k -> 1M vectors, 10% planted
twins at cosine ~0.958), run three ways:

  A   100k, 8 bands x 10 planes   (2^10 buckets/band)
  B   1M,  12 bands x 13 planes   (2^13 buckets/band — planes scaled
      with the decade so mean bucket size stays ~flat; bands 8->12 buy
      back the recall the narrower bands give up: analytic recall at
      cosine 0.958 is ~98% both ways — "matched recall")
  B0  1M,   8 bands x 10 planes   (decade-A geometry held FIXED — the
      64-dim failure mode transplanted to 768 dims, for contrast)

Measured per run: wall, pair count, RECALL against the planted-twin
ground truth (true cosines computed exactly at generation time), and
the realized (band,bucket) size distribution (p50/p95/max).

Expectations under test:
  - bucket p50/p95 roughly FLAT A -> B (the re-bounding claim);
  - wall(B)/wall(A) ~ the data ratio or below (restored ~linear),
    vs wall(B0)/wall(A) growing ~quadratically-per-bucket;
  - recall(A) ~ recall(B) (the scaling is not bought with recall).

Usage: python scripts/highdim_probe.py [out.json]
       (default PERF_highdim_768.json; stores cached in .sfgen/)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

D = 768
TWIN_FRAC = 0.10
NOISE = 0.30          # cosine(v, v+0.3*n) ~ 1/sqrt(1+0.09) ~ 0.958
THRESHOLD = 0.90

RUNS = [
    # label, n_rows, n_bands, band_planes
    ("A_100k_b8_p10", 100_000, 8, 10),
    ("B_1m_b12_p13", 1_000_000, 12, 13),
    ("B0_1m_fixed_b8_p10", 1_000_000, 8, 10),
]


def _store_path(n: int) -> str:
    return os.path.join(REPO, ".sfgen", f"d{D}_{n}")


def make_store(n: int, seed: int = 7) -> tuple[str, int]:
    """Parquet store of n vectors, TWIN_FRAC of which are noisy twins of
    the first n*TWIN_FRAC base vectors.  Returns (path, n_true_pairs) —
    the number of planted pairs whose TRUE cosine >= THRESHOLD."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = _store_path(n)
    meta = os.path.join(path, "_meta.json")
    if os.path.exists(meta):
        return path, json.load(open(meta))["n_true_pairs"]
    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_twins = int(n * TWIN_FRAC)
    n_base = n - n_twins
    base = rng.standard_normal((n_base, D), dtype=np.float32)
    noise = rng.standard_normal((n_twins, D), dtype=np.float32)
    twins = base[:n_twins] + NOISE * noise
    # exact planted-pair cosines (float64 for the ground truth)
    a = base[:n_twins].astype(np.float64)
    b = twins.astype(np.float64)
    cos = (a * b).sum(1) / (
        np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
    )
    n_true = int((cos >= THRESHOLD).sum())
    vecs = np.vstack([base, twins])
    ids = np.arange(n, dtype=np.int64)  # twin of base i has id n_base+i
    tbl = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.reshape(-1)), D
            ).cast(pa.list_(pa.float32())),
        }
    )
    pq.write_table(tbl, os.path.join(path, "embeddings.parquet"))
    json.dump(
        {"n": n, "n_base": n_base, "n_twins": n_twins,
         "n_true_pairs": n_true, "d": D, "noise": NOISE},
        open(meta, "w"),
    )
    print(f"# built {path}: {n} rows, {n_true} true pairs", flush=True)
    return path, n_true


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "PERF_highdim_768.json"
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from pyspark.sql import functions as F

    from ton_indexer_spark.session import get_spark
    from ton_indexer_spark.similarity.lsh import banded_sign_buckets
    from ton_indexer_spark.similarity.neardup import cosine_neardup_pairs

    spark = get_spark(app_name="highdim_probe")
    results: dict[str, dict] = {}
    for label, n, bands, planes in RUNS:
        path, n_true = make_store(n)
        emb = spark.read.parquet(os.path.join(path, "embeddings.parquet"))
        n_base = n - int(n * TWIN_FRAC)

        # realized bucket-size distribution (untimed: diagnostics)
        sizes = (
            emb.select(
                F.explode(
                    banded_sign_buckets(F.col("embedding"), bands, planes)
                ).alias("bb")
            )
            .groupBy("bb.band", "bb.bucket")
            .count()
        )
        dist = sizes.agg(
            F.expr("percentile_approx(count, 0.5)").alias("p50"),
            F.expr("percentile_approx(count, 0.95)").alias("p95"),
            F.max("count").alias("max"),
            F.count(F.lit(1)).alias("n_buckets"),
        ).collect()[0]

        t0 = time.perf_counter()
        pairs = cosine_neardup_pairs(
            emb, THRESHOLD, n_bands=bands, band_planes=planes
        ).cache()
        n_pairs = pairs.count()
        wall = time.perf_counter() - t0

        # recall vs the planted ground truth (untimed)
        twins = int(n * TWIN_FRAC)
        planted = spark.range(twins).select(
            F.col("id").alias("vec_a"),
            (F.col("id") + n_base).alias("vec_b"),
        )
        found = pairs.join(planted, ["vec_a", "vec_b"], "left_semi").count()
        pairs.unpersist()
        recall = round(found / n_true, 4) if n_true else None

        results[label] = {
            "n": n, "bands": bands, "planes": planes,
            "wall_sec": round(wall, 2), "pairs": n_pairs,
            "recall": recall, "true_pairs": n_true,
            "bucket_p50": int(dist["p50"]), "bucket_p95": int(dist["p95"]),
            "bucket_max": int(dist["max"]),
            "n_buckets": int(dist["n_buckets"]),
        }
        print(f"# {label}: wall={wall:.1f}s pairs={n_pairs} "
              f"recall={recall} buckets p50={dist['p50']} "
              f"p95={dist['p95']} max={dist['max']}", flush=True)

    a, b, b0 = (results[r[0]] for r in RUNS)
    summary = {
        "d": D,
        "threshold": THRESHOLD,
        "runs": results,
        "wall_ratio_scaled_geometry": round(
            b["wall_sec"] / a["wall_sec"], 2
        ),
        "wall_ratio_fixed_geometry": round(
            b0["wall_sec"] / a["wall_sec"], 2
        ),
        "data_ratio": round(b["n"] / a["n"], 1),
    }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
