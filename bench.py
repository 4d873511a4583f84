"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

value = total wall seconds over the headline set (excluding Spark startup and
a warm-up run of the catalog reads).

Each query is consumed through a full-column checksum (sum of xxhash64 over
every output column), not ``.count()`` — a count over a filter-only plan lets
Spark prune the projection entirely, flattering projection-heavy queries.
The checksum forces every output column to materialize JVM-side at roughly
the cost a real consumer (writer/serializer) would pay.

``--latency`` mode instead reports warm per-query serving latency
(p50/p95 over repeated runs after a warm-up execution), the interactive-API
counterpart of the reference's per-request envelope: catches fixed-overhead
creep that the throughput total hides.
"""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINE = [
    # the canonical read path + every operator family with nontrivial cost
    "filter_sort_page",
    "group_agg",
    "join_enrich",
    "semi_join",
    "inout_pivot",
    "self_join_adjacent",
    "first_per_group",
    "latest_state",
    "ordered_collect",
    "sessionize",
    "asof_join",
    "connected_components",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "embed_cosine_topk",
    "embed_lsh_topk",
    "embed_ivf_topk",
    "embed_pq_topk",
    "dedup_embedding_cosine",
    "tumbling_window",
    "token_count",
    "text_quality",
    "doc_fingerprint",
    "tfidf_topk",
    "doc_chunks",
    "dedup_cluster_canonical",
    "decontaminate",
    "bloom_membership",
    "semdedup",
    "embed_kmeans",
    "source_mixture",
    "pii_detect",
    "char_lm_quality",
    "common_ngrams",
    "repeated_spans",
    "bpe_pair_counts",
    "shard_assign",
    "cross_source_overlap",
    "dsir_weight",
    "funnel_steps",
    "cohort_retention",
    "group_topk",
    # round 6
    "line_dedup",
    "quality_score_hashed",
    "classify_actions",
    # round 7
    "quality_nb_score",
    "curriculum_order",
    "quality_nb_auc",
    "wordpiece_segment",
    # round 9: the in-engine media codecs (fixture-sized fixed-cost
    # gates — they measure the Arrow decode stage, not corpus scans)
    "png_decode",
    "gif_decode",
    "jpeg_decode",
    "wav_decode",
    # round 10: the in-engine TVM executing real mainnet contract code
    # (fixture-sized fixed-cost gates, like the codecs)
    "tvm_get_method",
    "tvm_compute_replay",
    # round 11: chained replay (c4 + set_code + balance/fee phases
    # propagated across whole per-account tx sequences)
    "tvm_chained_replay",
    "tvm_signed_external",
]


def consume(df) -> int:
    """Materialize EVERY output column of ``df`` and return the row count.

    bit_xor(xxhash64(all columns)) runs entirely JVM-side (hash
    expressions support nested array/struct/map/binary types), never
    overflows under ANSI mode, and cannot be pruned to a count-only plan,
    so projection-heavy queries pay their full cost.
    """
    from pyspark.sql import functions as F

    row = (
        df.select(
            F.xxhash64(*[F.col(c) for c in df.columns]).alias("_h")
        )
        .agg(F.expr("bit_xor(_h)").alias("_cs"),
             F.count(F.lit(1)).alias("_n"))
        .collect()[0]
    )
    return row["_n"]


def _setup():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from ton_indexer_spark.queries import all_specs
    from ton_indexer_spark.session import get_spark

    spark = get_spark(app_name="ton_indexer_spark_bench")
    specs = all_specs()

    # warm-up: touch every table once so JVM/parquet-footer costs don't
    # pollute the first query's number
    from ton_indexer_spark.catalog import Catalog

    cat = Catalog(spark, sf_dir)
    for name in cat.available():
        cat.table(name).count()
    # warm the join/aggregate/window machinery (codegen compilation, shuffle
    # service) so the first measured query isn't charged for JVM warm-up
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    (
        cat.table("nation")
        .join(cat.table("region"), F.col("n_regionkey") == F.col("r_regionkey"))
        .withColumn("rn", F.row_number().over(
            Window.partitionBy("r_regionkey").orderBy("n_nationkey")))
        .groupBy("r_name")
        .agg(F.count(F.lit(1)))
        .count()
    )
    return spark, specs, sf_dir


def _sf_of(sf_dir: str):
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    return float(sf) if sf.replace(".", "").isdigit() else sf


def _env_snapshot() -> dict:
    """Host-load annotation (r9 verdict ask #7: the driver's run came in
    a uniform ~1.25x over an identical local run — record load alongside
    results so round-over-round comparisons don't need forensics)."""
    try:
        l1, l5, l15 = os.getloadavg()
    except OSError:
        l1 = l5 = l15 = None
    return {
        "load_1m": round(l1, 2) if l1 is not None else None,
        "load_5m": round(l5, 2) if l5 is not None else None,
        "cpus": os.cpu_count(),
        "spark_cpus": os.environ.get("SPARK_GRAFT_CPUS"),
    }


def _headline() -> list[str]:
    """$SPARK_GRAFT_BENCH_QUERIES (comma-separated) narrows the set —
    used by the scaling runs (sf10) that only exercise the families
    whose plan shape is under test."""
    sel = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    if not sel:
        return HEADLINE
    want = [s.strip() for s in sel.split(",") if s.strip()]
    return [n for n in want if n]


def main() -> None:
    spark, specs, sf_dir = _setup()
    env_start = _env_snapshot()

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in _headline():
        spec = specs.get(name)
        if spec is None:
            continue
        # best of two runs: the first execution of a plan shape pays JVM
        # codegen/broadcast warm-up that a steady-state service would not
        best = None
        n = 0
        try:
            for _ in range(2):
                # clear cached intermediates so each run measures the full
                # pipeline, not a cache hit from the previous iteration
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                n = consume(spec.builder(spark, sf_dir))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
        except Exception as exc:  # noqa: BLE001 — one broken query must
            # never zero out the whole bench run; record and continue
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"# {name}: FAILED {errors[name]}", file=sys.stderr)
            continue
        timings[name] = round(best, 4)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    out = {
        "metric": "headline_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_of(sf_dir),
        "env": {"start": env_start, "end": _env_snapshot()},
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


def main_latency(runs: int = 7) -> None:
    """Warm serving-latency mode: one warm-up execution per query, then
    ``runs`` timed executions; reports per-query p50/p95 and the headline
    sum-of-p50s.  Caches are NOT cleared between runs — this measures the
    steady-state request path of an interactive deployment (parquet
    footers hot, codegen compiled, broadcast vars resident), the regime
    the reference's per-request limits are set for.

    The builder runs ONCE per query and the same DataFrame is re-consumed
    (r9 verdict ask #6): re-invoking the builder per iteration rebuilt
    classify's fixture store + persisted stage every run, charging p95
    with construction cost a serving deployment pays once.  Re-consuming
    the same plan re-executes it end-to-end unless the builder itself
    checkpointed a stage — which is exactly the stage a steady-state
    service would hold resident."""
    spark, specs, sf_dir = _setup()
    env_start = _env_snapshot()

    lat: dict[str, dict[str, float]] = {}
    errors: dict[str, str] = {}
    for name in _headline():
        spec = specs.get(name)
        if spec is None:
            continue
        try:
            df = spec.builder(spark, sf_dir)
            consume(df)  # warm-up, untimed
            samples = []
            for _ in range(runs):
                t0 = time.perf_counter()
                consume(df)
                samples.append(time.perf_counter() - t0)
            samples.sort()
            p50 = samples[len(samples) // 2]
            p95 = samples[min(len(samples) - 1,
                              int(round(0.95 * (len(samples) - 1))))]
            lat[name] = {"p50": round(p50, 4), "p95": round(p95, 4)}
            print(f"# {name}: p50={p50:.3f}s p95={p95:.3f}s",
                  file=sys.stderr)
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"# {name}: FAILED {errors[name]}", file=sys.stderr)

    out = {
        "metric": "warm_latency_p50_total",
        "value": round(sum(v["p50"] for v in lat.values()), 4),
        "unit": "sec",
        "queries": lat,
        "sf": _sf_of(sf_dir),
        "runs": runs,
        "env": {"start": env_start, "end": _env_snapshot()},
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    if "--latency" in sys.argv[1:]:
        main_latency()
    else:
        main()
