from __future__ import annotations

import os

import pytest

SF_SMALL = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from ton_indexer_spark.session import get_spark

    # the whole suite (~800 tests, thousands of stages) shares ONE JVM:
    # localCheckpoint blocks and broadcast variables are reclaimed lazily
    # (ContextCleaner runs on driver GC), so the long-lived test session
    # gets more heap than the 8g production default — a full-suite run
    # OOM'd the shared JVM at ~7,500 stages in under 8g
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "20g")
    s = get_spark(app_name="ton_indexer_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    yield con
    con.close()


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory):
    """Shared TON-schema fixture — generated once per test session."""
    from tests.fixture_gen import generate

    return generate(str(tmp_path_factory.mktemp("ton_fixture")))
