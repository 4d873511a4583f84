"""Per-query optimization measurement harness (round 11).

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
        python scripts/opt_measure.py [--explain DIR] [--suffix SUF] \
        [--runs N] [query ...]

For each named query (default: the bench HEADLINE set) this:
  - builds the DataFrame (timed separately: driver-side plan construction
    incl. any eager collect/checkpoint jobs the builder runs),
  - times the bench's checksum consume best-of-N with cache-clear between
    runs (the exact methodology of bench.py),
  - optionally writes .explain("formatted") to DIR/<query>_<suffix>.txt,
  - reports the Spark job/stage counts the query triggered (scheduler
    fixed costs dominate at sf0.1 — 17 MB input — so job count is the
    first-order metric alongside wall time).

Prints one JSON line per query and a total at the end.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, consume  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    explain_dir = None
    suffix = "before"
    runs = 2
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--explain":
            explain_dir = args[i + 1]
            i += 2
        elif args[i] == "--suffix":
            suffix = args[i + 1]
            i += 2
        elif args[i] == "--runs":
            runs = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1
    if not names:
        names = list(HEADLINE)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from ton_indexer_spark.catalog import Catalog
    from ton_indexer_spark.queries import all_specs
    from ton_indexer_spark.session import get_spark

    spark = get_spark(app_name="opt_measure")
    specs = all_specs()
    cat = Catalog(spark, sf_dir)
    for name in cat.available():
        cat.table(name).count()
    # warm shuffle/codegen machinery like bench.py does
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    (
        cat.table("nation")
        .join(cat.table("region"), F.col("n_regionkey") == F.col("r_regionkey"))
        .withColumn("rn", F.row_number().over(
            Window.partitionBy("r_regionkey").orderBy("n_nationkey")))
        .groupBy("r_name").agg(F.count(F.lit(1))).count()
    )

    tracker = spark.sparkContext.statusTracker()

    def _job_count() -> int:
        ids = tracker.getJobIdsForGroup(None)
        return max(ids) if ids else 0

    total = 0.0
    for name in names:
        spec = specs.get(name)
        if spec is None:
            print(f"# unknown query: {name}", file=sys.stderr)
            continue
        spark.catalog.clearCache()
        sc = spark.sparkContext
        sc.setJobDescription(f"opt_measure:{name}:build")
        jobs0 = _job_count()
        t0 = time.perf_counter()
        df = spec.builder(spark, sf_dir)
        t_build = time.perf_counter() - t0
        jobs_build = _job_count() - jobs0

        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(explain_dir, f"{name}_{suffix}.txt"),
                      "w") as fh:
                fh.write(plan)

        best = None
        jobs_run = 0
        n = 0
        for r in range(runs):
            spark.catalog.clearCache()
            sc.setJobDescription(f"opt_measure:{name}:run{r}")
            # re-build per run like bench.py (builder may cache/checkpoint)
            t0 = time.perf_counter()
            df_r = spec.builder(spark, sf_dir)
            j0 = _job_count()
            n = consume(df_r)
            dt = time.perf_counter() - t0
            jobs_run = _job_count() - j0
            best = dt if best is None else min(best, dt)
        sc.setJobDescription(None)
        total += best
        print(json.dumps({
            "query": name, "best": round(best, 4),
            "build_s": round(t_build, 4), "rows": n,
            "jobs_build": jobs_build, "jobs_run": jobs_run,
        }))
        sys.stdout.flush()
    print(json.dumps({"total": round(total, 4), "n_queries": len(names)}))


if __name__ == "__main__":
    main()
