"""Session-config experiment: run the bench HEADLINE with config overrides.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/opt_confexp.py k=v [k=v ...]
Creates the session with the overrides FIRST (bench's get_spark then
reuses it via getOrCreate) and runs the same best-of-2 checksum loop as
bench.py, printing the one-line JSON.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    overrides = dict(kv.split("=", 1) for kv in sys.argv[1:])
    from ton_indexer_spark.session import get_spark

    get_spark(app_name="ton_indexer_spark_bench", extra_conf=overrides)
    import bench

    bench.main()


if __name__ == "__main__":
    main()
