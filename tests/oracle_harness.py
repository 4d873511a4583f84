"""Local replica of the driver's correctness comparison.

Runs a registered query's Spark builder and its DuckDB oracle on the same
sf_dir, normalizes both results (column names sorted, rows sorted by all
columns) and compares values exactly.  Used by tests/test_oracle_parity.py
so a failure here predicts a CORRECTNESS_r{N}.json failure.
"""

from __future__ import annotations

import math
import os

import pandas as pd

from ton_indexer_spark.catalog import DRIVER_TABLES


def register_duck_views(con, sf_dir: str) -> None:
    for name in DRIVER_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.isdir(path):
            # Spark-written dataset (directory of part files) — e.g. the
            # make_sf1.py store; DuckDB needs the glob form
            path = os.path.join(path, "*.parquet")
        elif not os.path.exists(path):
            continue
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize cell values so engine-specific types compare equal
    def canon(v):
        if v is None:
            return "<null>"
        if isinstance(v, float):
            if math.isnan(v):
                return "<null>"
            return repr(v)
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(canon(x) for x in v) + "]"
        return str(v)

    out = df.apply(lambda col: col.map(canon))
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def compare(spark, duck, spec, sf_dir: str) -> tuple[bool, str]:
    sdf = spec.builder(spark, sf_dir).toPandas()
    register_duck_views(duck, sf_dir)
    ddf = duck.execute(spec.oracle).df()
    return compare_frames(sdf, ddf)


def compare_frames(sdf: pd.DataFrame, ddf: pd.DataFrame) -> tuple[bool, str]:
    """The normalization+equality half of :func:`compare`, split out so
    callers (scripts/oracle_sweep.py) can time the Spark and DuckDB
    executions separately."""
    if sorted(sdf.columns) != sorted(ddf.columns):
        return False, f"schema mismatch: spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}"
    if len(sdf) != len(ddf):
        return False, f"row count mismatch: spark={len(sdf)} duck={len(ddf)}"
    a, b = _normalize(sdf), _normalize(ddf)
    if not a.equals(b):
        diff_mask = (a != b).any(axis=1)
        sample = pd.concat(
            [a[diff_mask].head(5).add_prefix("spark_"),
             b[diff_mask].head(5).add_prefix("duck_")],
            axis=1,
        )
        return False, f"value mismatch on {int(diff_mask.sum())} rows:\n{sample}"
    return True, f"ok ({len(sdf)} rows)"
