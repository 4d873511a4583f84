"""Property-based operator tests (hypothesis) — beyond the reference's test
strategy (SURVEY.md §5 notes it has none): determinism and algebraic
invariants that must hold for ANY input, not just fixtures.

Data strategy note: one shared Spark session + small generated frames keep
each example cheap; deadlines are disabled because JVM latency is noisy.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),     # key
        st.integers(min_value=0, max_value=1000),  # version
        st.integers(min_value=0, max_value=10**6), # payload
    ),
    min_size=1,
    max_size=40,
)


@given(ROWS)
@settings(**SETTINGS)
def test_latest_by_idempotent_and_single_winner(spark, rows):
    from ton_indexer_spark.operators import latest_by

    df = spark.createDataFrame(rows, "k int, v int, payload int")
    once = latest_by(df, ["k"], "v", tiebreakers=["payload"])
    got = {r["k"]: (r["v"], r["payload"]) for r in once.collect()}
    # one row per key, and it is the max (version, payload) pair
    assert len(got) == len({k for k, _, _ in rows})
    for k in got:
        assert got[k] == max((v, p) for kk, v, p in rows if kk == k)
    # idempotence: applying again changes nothing
    twice = latest_by(once, ["k"], "v", tiebreakers=["payload"])
    assert sorted(map(tuple, twice.collect())) == sorted(map(tuple, once.collect()))


@given(ROWS)
@settings(**SETTINGS)
def test_paginate_is_deterministic_partition_of_input(spark, rows):
    from ton_indexer_spark.operators import paginate

    df = spark.createDataFrame(rows, "k int, v int, payload int").distinct()
    n = df.count()
    sort = [("v", "desc"), ("k", "asc"), ("payload", "asc")]
    pages = []
    size = 7
    for off in range(0, n, size):
        pages.append(
            [tuple(r) for r in paginate(df, sort, limit=size, offset=off).collect()]
        )
    flat = [t for p in pages for t in p]
    # pages are disjoint, cover everything, and respect the total order
    assert len(flat) == n and len(set(flat)) == n
    keys = [(-v, k, p) for (k, v, p) in flat]
    assert keys == sorted(keys)


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10**6)),
        min_size=1, max_size=40, unique=True,
    )
)
@settings(**SETTINGS)
def test_sessionize_matches_bruteforce(spark, rows):
    from ton_indexer_spark.operators import sessionize_by_gap

    GAP = 1000
    df = spark.createDataFrame(rows, "user int, ts long")
    got = {
        (r["user"], r["ts"]): r["session_seq"]
        for r in sessionize_by_gap(df, "user", "ts", GAP).collect()
    }
    by_user: dict[int, list[int]] = {}
    for u, ts in rows:
        by_user.setdefault(u, []).append(ts)
    for u, tss in by_user.items():
        seq = 0
        prev = None
        for ts in sorted(tss):
            if prev is None or ts - prev > GAP:
                seq += 1
            assert got[(u, ts)] == seq, (u, ts)
            prev = ts


@given(
    st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)),
             min_size=1, max_size=60)
)
@settings(**SETTINGS)
def test_connected_components_matches_union_find(spark, edges):
    from ton_indexer_spark.operators import connected_components

    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want_groups: dict[int, set] = {}
    for a, b in edges:
        for n in (a, b):
            want_groups.setdefault(find(n), set()).add(n)
    for root, members in want_groups.items():
        labels = {got[m] for m in members}
        assert len(labels) == 1
        assert labels == {min(members)}
