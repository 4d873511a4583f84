"""uint256 overflow policy (SURVEY §1.2; round-7 verdict ask #7).

Policy, as documented at ``classify._bound_numeric`` / ``schemas.DEC38``:

- TEP-74 ``Coins`` is VarUInteger 16 (max 2^120 - 1 ≈ 1.3e36), which
  ALWAYS fits DecimalType(38,0) (max ~1.7e38): spec-conformant amounts
  are exact end-to-end, decode → typed schema → aggregation.
- Genuinely uint256-typed fields (order seqnos, asset ids) and
  out-of-protocol/adversarial values keep full fidelity at the DECODE
  layer (python ints), and any value that cannot be represented in its
  output column domain becomes NULL at the serialize boundary — never a
  silent two's-complement wrap, never saturation.  Full fidelity stays
  recoverable from the raw body BOC / ``order_boc`` string twins.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from test_classifier import A, TraceBuilder, acts_of, body_of, run

from ton_indexer_spark.classifier.base import (
    EXCESSES,
    JETTON_INTERNAL,
    JETTON_NOTIFY,
    JETTON_TRANSFER,
)

W1, W2 = "0:w1" + "0" * 60, "0:w2" + "0" * 60
JET = "0:jet" + "0" * 59

COINS_MAX = 2**120 - 1  # TEP-74 VarUInteger 16 ceiling


def _jetton_trace(amount: int, trace_id: str = "u1") -> TraceBuilder:
    b = TraceBuilder(trace_id)
    r = b.tx(A[0], None)
    t = b.chain(r, W1, opcode=JETTON_TRANSFER, value=10**8,
                body=body_of({"amount": amount, "destination": A[1]}))
    i = b.chain(t, W2, opcode=JETTON_INTERNAL, value=10**7,
                body=body_of({"amount": amount}))
    b.chain(i, A[1], opcode=JETTON_NOTIFY, value=1,
            body=body_of({"amount": amount}))
    b.chain(i, A[0], opcode=EXCESSES, value=1)
    return b


def _wallets():
    return [
        {"address": W1, "owner": A[0], "jetton": JET},
        {"address": W2, "owner": A[1], "jetton": JET},
    ]


def test_coins_max_decodes_exactly_through_real_boc():
    """VarUInteger 16 ceiling survives encode → cell codec → decode."""
    from ton_indexer_spark.functions.boc import (
        decode_message_body,
        encode_jetton_transfer,
    )

    body = encode_jetton_transfer(1, COINS_MAX, destination=A[1])
    d = decode_message_body(body)
    assert d["amount"] == COINS_MAX


def test_uint256_field_keeps_fidelity_at_decode_layer():
    """A genuinely uint256-typed field (multisig order_seqno) ≥ 2^126 decodes to
    the full python int — precision loss never happens at decode."""
    from ton_indexer_spark.functions.boc import (
        decode_message_body,
        encode_multisig_execute,
    )

    big = 2**200 + 12345
    body = encode_multisig_execute(
        query_id=1, order_seqno=big, expiration_date=1_800_000_000,
        approvals_num=2, signers_hash=b"\x11" * 32,
    )
    assert decode_message_body(body)["order_seqno"] == big


def test_coins_max_flows_to_decimal_schema_and_aggregates(spark):
    """2^120-1 through classify → DecimalType(38,0) column → SUM, exact
    at every step (the spec-conformant path never nulls or rounds)."""
    res = run(spark, [_jetton_trace(COINS_MAX)], jetton_wallets=_wallets())
    acts = acts_of(res, "u1")
    assert [a["type"] for a in acts] == ["jetton_transfer"]
    assert acts[0]["amount"] == Decimal(COINS_MAX)
    agg = (
        res.actions.filter(F.col("type") == "jetton_transfer")
        .agg(F.sum("amount").alias("s"))
        .first()
    )
    assert int(agg["s"]) == COINS_MAX


def test_beyond_decimal38_amount_nulls_never_wraps(spark):
    """An out-of-protocol amount ≥ 2^126 classifies normally but its
    numeric column is NULL (policy: null, not wrap/saturate/crash —
    an unbounded python int would otherwise fail Arrow conversion and
    poison the whole batch)."""
    big = 2**130
    res = run(spark, [_jetton_trace(big, "u2")], jetton_wallets=_wallets())
    acts = acts_of(res, "u2")
    assert [a["type"] for a in acts] == ["jetton_transfer"]
    assert acts[0]["amount"] is None  # nulled, trace NOT failed
    assert acts[0]["success"]
    states = {r["trace_id"]: r["classification_state"]
              for r in res.classification_states.collect()}
    assert states["u2"] == "ok"


def test_bound_numeric_unit():
    from pyspark.sql import types as T

    from ton_indexer_spark.classifier.classify import (
        _DEC38_MAX,
        _bound_numeric,
    )

    dec, lng, itg = T.DecimalType(38, 0), T.LongType(), T.IntegerType()
    assert _bound_numeric(_DEC38_MAX, dec) == _DEC38_MAX
    assert _bound_numeric(_DEC38_MAX + 1, dec) is None
    assert _bound_numeric(2**63 - 1, lng) == 2**63 - 1
    assert _bound_numeric(2**63, lng) is None
    assert _bound_numeric(-(2**63) - 1, lng) is None
    assert _bound_numeric(2**31, itg) is None
    assert _bound_numeric(True, T.BooleanType()) is True
    # nested struct + array recursion
    st = T.StructType([
        T.StructField("a", dec),
        T.StructField("xs", T.ArrayType(T.StructType([
            T.StructField("b", lng)]))),
        T.StructField("s", T.StringType()),
    ])
    v = {"a": 10**38, "xs": [{"b": 2**70}, {"b": 7}], "s": "keep"}
    out = _bound_numeric(v, st)
    assert out == {"a": None, "xs": [{"b": None}, {"b": 7}], "s": "keep"}
