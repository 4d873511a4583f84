"""Capture .explain('formatted') for named queries into plans/r11/.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/opt_explain.py SUFFIX q1 q2 ...
Driver-side only (no job execution beyond what builders run eagerly).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r11")
    os.makedirs(out_dir, exist_ok=True)

    from ton_indexer_spark.queries import all_specs
    from ton_indexer_spark.session import get_spark

    spark = get_spark(app_name="opt_explain")
    specs = all_specs()
    for name in names:
        spec = specs.get(name)
        if spec is None:
            print(f"unknown: {name}", file=sys.stderr)
            continue
        df = spec.builder(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
