"""Every registered query with an oracle must hash-match DuckDB at sf0.001.

This is the same comparison the driver runs at sf0.01 — keep it green.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL
from tests.oracle_harness import compare
from ton_indexer_spark.queries import all_specs

SPECS = all_specs()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_oracle_parity(spark, duck, name):
    spec = SPECS[name]
    if spec.oracle is None:
        df = spec.builder(spark, SF_SMALL)
        assert df.count() >= 0  # rows-only check, mirrors the driver
        return
    ok, msg = compare(spark, duck, spec, SF_SMALL)
    assert ok, f"{name}: {msg}"
