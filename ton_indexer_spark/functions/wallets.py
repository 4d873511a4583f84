"""Wallet state-data decoding — the /walletStates / /walletInformation seam.

The reference answers its wallet-family endpoints by decoding the wallet
contract's DATA cell off ``latest_account_states``, dispatching the layout
on the account's code hash (``ton-index-go/index/parse/wallet_parse.go:78-114``
``walletParsersMap`` + ``ParseWalletState``):

    v1/v2 (all revisions):  seqno:uint32 ...
    v3/v4 (all revisions):  seqno:uint32 wallet_id:uint32 ...
    v5 (beta/r1):           is_signature_allowed:Bool seqno:uint32
                            wallet_id:uint32 ...

Unknown code hashes are NOT wallets (``is_wallet = false``, every decoded
column null) — the reference silently skips them the same way
(wallet_parse.go:100-102).  Decode happens in an Arrow-batched
``mapInPandas`` over whatever slice of the states dimension the plan
selected — page-sized for the endpoint, never table-scans on its own.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ton_indexer_spark.functions.boc import parse_boc

# code hash (base64) → (wallet type name, data layout); the hashes identify
# the PUBLISHED standard wallet contract code (wallet_parse.go:78-90)
WALLET_PARSERS: dict[str, tuple[str, str]] = {
    "oM/CxIruFqJx8s/AtzgtgXVs7LEBfQd/qqs7tgL2how=": ("wallet v1 r1", "seqno"),
    "1JAvzJ+tdGmPqONTIgpo2g3PcuMryy657gQhfBfTBiw=": ("wallet v1 r2", "seqno"),
    "WHzHie/xyE9G7DeX5F/ICaFP9a4k8eDHpqmcydyQYf8=": ("wallet v1 r3", "seqno"),
    "XJpeaMEI4YchoHxC+ZVr+zmtd+xtYktgxXbsiO7mUyk=": ("wallet v2 r1", "seqno"),
    "/pUw0yQ4Uwg+8u8LTCkIwKv2+hwx6iQ6rKpb+MfXU/E=": ("wallet v2 r2", "seqno"),
    "thBBpYp5gLlG6PueGY48kE0keZ/6NldOpCUcQaVm9YE=": ("wallet v3 r1", "v3"),
    "hNr6RJ+Ypph3ibojI1gHK8D3bcRSQAKl0JGLmnXS1Zk=": ("wallet v3 r2", "v3"),
    "ZN1UgFUixb6KnbWc6gEFzPDQh4bKeb64y3nogKjXMi0=": ("wallet v4 r1", "v3"),
    "/rX/aCDi/w2Ug+fg1iyBfYRniftK5YDIeIZtlZ2r1cA=": ("wallet v4 r2", "v3"),
    "89fKU0k97trCizgZhqhJQDy6w9LFhHea8IEGWvCsS5M=": ("wallet v5 beta", "v5"),
    "IINLe3KxEhR+Gy+0V7hOdNGjDwT3N9T2KmaOlVLSty8=": ("wallet v5 r1", "v5"),
}

WALLET_FIELDS = T.StructType(
    [
        T.StructField("is_wallet", T.BooleanType()),
        T.StructField("wallet_type", T.StringType()),
        T.StructField("seqno", T.LongType()),
        T.StructField("wallet_id", T.LongType()),
        T.StructField("is_signature_allowed", T.BooleanType()),
    ]
)


def decode_wallet_data(data_boc: str | bytes | None, code_hash: str | None) -> dict:
    """One account's (data cell, code hash) → wallet fields dict.

    Raises on a recognized-wallet data cell that does not parse (the
    reference propagates that as a 500 — wallet_parse.go:96-98); returns
    ``is_wallet=False`` with null fields for unrecognized code.
    """
    out: dict = {
        "is_wallet": False,
        "wallet_type": None,
        "seqno": None,
        "wallet_id": None,
        "is_signature_allowed": None,
    }
    entry = WALLET_PARSERS.get(code_hash or "")
    if entry is None or data_boc is None:
        return out
    name, layout = entry
    s = parse_boc(data_boc).begin_parse()
    out["is_wallet"] = True
    out["wallet_type"] = name
    if layout == "v5":
        out["is_signature_allowed"] = bool(s.load_bit())
    out["seqno"] = s.load_uint(32)
    if layout in ("v3", "v5"):
        out["wallet_id"] = s.load_uint(32)
    return out


def with_wallet_fields(
    states: DataFrame,
    boc_col: str = "data_boc",
    code_hash_col: str = "code_hash",
) -> DataFrame:
    """Append the five wallet columns to a states DataFrame.

    Arrow-batched; a missing/undecodable data cell for a known wallet
    code hash surfaces in ``wallet_decode_error`` instead of failing the
    page (endpoint discipline: one bad account must not 500 a listing —
    this is deliberately softer than the reference's error-out, which a
    caller can reproduce by asserting the column null).
    """
    fields = [f.name for f in WALLET_FIELDS]
    out_schema = T.StructType(
        list(states.schema.fields)
        + list(WALLET_FIELDS.fields)
        + [T.StructField("wallet_decode_error", T.StringType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                err = None
                try:
                    d = decode_wallet_data(
                        rec.get(boc_col), rec.get(code_hash_col)
                    )
                except Exception as e:  # noqa: BLE001 — log-and-surface
                    d = {f: None for f in fields}
                    d["is_wallet"] = True
                    err = f"{type(e).__name__}: {e}"
                rows.append([d[f] for f in fields] + [err])
            add = pd.DataFrame(
                rows, columns=fields + ["wallet_decode_error"],
                index=pdf.index,
            )
            yield pd.concat([pdf, add], axis=1)

    return states.mapInPandas(run, schema=out_schema)


def encode_wallet_data(
    layout: str,
    seqno: int,
    wallet_id: int = 698983191,
    is_signature_allowed: bool = True,
) -> str:
    """Fixture encoder for the three wallet data layouts (base64 BOC)."""
    import base64

    from ton_indexer_spark.functions.boc import Builder, serialize_boc

    b = Builder()
    if layout == "v5":
        b.store_bit(1 if is_signature_allowed else 0)
    b.store_uint(seqno, 32)
    if layout in ("v3", "v5"):
        b.store_uint(wallet_id, 32)
    # standard wallets carry the public key next — 256 zero bits stand in
    b.store_uint(0, 256)
    return base64.b64encode(serialize_boc(b.end_cell())).decode()
