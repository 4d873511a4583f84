"""Offchain token-metadata fetch seam (S8).

The reference runs a Go sidecar (``ton-metadata-fetcher/main.go``): it
polls a ``background_tasks`` queue (main.go:140-180), fetches the
offchain JSON behind the ``uri`` of a token's on-chain content cell over
HTTP/IPFS (main.go:315-395), merges it with the on-chain fields, and
upserts ``address_metadata(address, type, valid, name, description,
image, symbol, extra, updated_at, expires_at)`` with retry + expiry
(main.go:452-460, 545-563).

Spark re-expression — three composable stages, no queue table:

* ``metadata_fetch_tasks`` derives the work queue declaratively: content
  rows whose metadata is missing, invalid, or expired.  The reference's
  ``background_tasks`` table dissolves into an anti-join + expiry filter
  (recomputable, idempotent, no state to corrupt).
* ``fetch_address_metadata`` executes a pluggable per-batch fetcher
  inside Arrow-batched ``mapInPandas`` — network I/O happens on
  executors, parallel across partitions, never in a driver loop.  The
  real HTTP/IPFS client is external to this container; ``FAKE_FETCHER``
  is the deterministic stand-in with the same row contract.
* results merge into the dimension with the bucket-pruned LWW upsert
  (``sources/writer.py::merge_dimension``, key=(address, type),
  version=updated_at) — the ON CONFLICT DO UPDATE analog.

Fetcher contract: ``fetcher(pdf: pandas.DataFrame) -> pandas.DataFrame``
where the input carries ``address, type, content_uri`` and the output
must carry ``address, type, valid, name, symbol, description, image``
(one row per input row; mark failures with ``valid=False`` rather than
dropping — the reference records failed fetches the same way,
main.go:499-500).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ton_indexer_spark.schemas import ADDRESS_METADATA

# address_metadata + the fetcher bookkeeping columns (main.go:545-563)
ADDRESS_METADATA_FETCHED = T.StructType(
    list(ADDRESS_METADATA.fields)
    + [
        T.StructField("updated_at", T.LongType()),
        T.StructField("expires_at", T.LongType()),
    ]
)

DEFAULT_TTL_S = 7 * 86400


def metadata_fetch_tasks(
    content_rows: DataFrame,
    existing_metadata: DataFrame | None = None,
    now: int = 0,
) -> DataFrame:
    """Derive the fetch queue: (address, type, content_uri) rows whose
    metadata row is missing, marked invalid, or past ``expires_at``.

    ``content_rows`` — (address, type, content_uri); typically projected
    from jetton_masters.jetton_content / nft_collections.collection_content
    ``uri`` fields.  Re-running after a merge converges to an empty queue
    until rows expire — the queue is a pure derivation.
    """
    tasks = content_rows.select("address", "type", "content_uri").where(
        F.col("content_uri").isNotNull()
    )
    if existing_metadata is None:
        return tasks
    # a row keeps its queue slot until expires_at, valid OR NOT: failed
    # fetches carry the SHORT retry expiry precisely so they stay OUT of
    # the queue during the backoff window (main.go:141-153) — gating on
    # valid here would re-hit a failing endpoint every cycle
    fresh = existing_metadata.where(
        F.col("expires_at") > F.lit(now)
    ).select("address", "type")
    return tasks.join(fresh, ["address", "type"], "left_anti")


def FAKE_FETCHER(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in for the HTTP/IPFS client (main.go:315-395).

    Derives stable metadata from the task row itself; a ``content_uri``
    containing the substring ``"bad"`` simulates a fetch failure
    (valid=False, null fields) so the retry/requeue path is testable.
    """
    out = []
    for r in pdf.itertuples(index=False):
        if "bad" in (r.content_uri or ""):
            out.append((r.address, r.type, None, None, None, None, False))
            continue
        h = hashlib.sha256(r.address.encode()).hexdigest()
        out.append((
            r.address, r.type,
            f"Token {h[:8]}",
            h[:4].upper(),
            f"fetched from {r.content_uri}",
            f"{r.content_uri}/image.png",
            True,
        ))
    return pd.DataFrame(
        out,
        columns=["address", "type", "name", "symbol", "description",
                 "image", "valid"],
    )


def fetch_address_metadata(
    tasks: DataFrame,
    fetcher: Callable[[pd.DataFrame], pd.DataFrame] = FAKE_FETCHER,
    now: int = 0,
    ttl_s: int = DEFAULT_TTL_S,
    invalid_retry_s: int = 3600,
) -> DataFrame:
    """Run ``fetcher`` over the task rows in Arrow batches →
    ADDRESS_METADATA_FETCHED rows ready for ``merge_dimension``.

    Failed fetches get a SHORT expiry (``invalid_retry_s``) so they
    re-enter the derived queue soon — the reference's retry_at backoff
    (main.go:141-153); successes expire after ``ttl_s``.
    """
    cols = [f.name for f in ADDRESS_METADATA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            res = fetcher(pdf)
            missing = set(cols) - set(res.columns)
            if missing:  # enforce the documented contract loudly
                raise ValueError(
                    f"metadata fetcher omitted columns: {sorted(missing)}"
                )
            res = res[cols].copy()
            res["updated_at"] = now
            res["expires_at"] = [
                now + (ttl_s if v else invalid_retry_s)
                for v in res["valid"]
            ]
            yield res

    return tasks.mapInPandas(run, ADDRESS_METADATA_FETCHED)


# ---- TEP-64 on-chain content decode (parse_token_data.cpp parity) ----------

TOKEN_CONTENT_DECODED = T.StructType(
    [
        T.StructField("address", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("valid", T.BooleanType()),
        T.StructField("content_uri", T.StringType()),   # offchain uri
        T.StructField("name", T.StringType()),
        T.StructField("symbol", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("image", T.StringType()),
        T.StructField("image_data", T.StringType()),    # base64
        T.StructField("decimals", T.StringType()),
    ]
)


def decode_token_content(
    content_rows: DataFrame,
    boc_col: str = "content_boc",
) -> DataFrame:
    """(address, type, <boc_col>) → TOKEN_CONTENT_DECODED via the
    clean-room TEP-64 parser (functions/boc.py::parse_token_data, parity
    with ton-index-worker parse_token_data.cpp:87-155).

    On-chain cells yield the attribute columns directly; off-chain cells
    yield ``content_uri`` for ``metadata_fetch_tasks`` to queue; a
    malformed cell yields valid=False (the worker's error row).  Pure
    Arrow-batch map — the decode distributes with the dimension scan."""
    from ton_indexer_spark.functions.boc import parse_token_data

    out_cols = [f.name for f in TOKEN_CONTENT_DECODED.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for r in pdf.itertuples(index=False):
                base = {c: None for c in out_cols}
                base["address"], base["type"] = r.address, r.type
                raw = getattr(r, boc_col)
                try:
                    attrs = parse_token_data(raw) if raw else {}
                    base["valid"] = True
                    base["content_uri"] = attrs.get("uri")
                    for k in ("name", "symbol", "description", "image",
                              "image_data", "decimals"):
                        base[k] = attrs.get(k)
                except Exception:
                    base["valid"] = False
                rows.append(base)
            yield pd.DataFrame(rows, columns=out_cols)

    return content_rows.select("address", "type", boc_col).mapInPandas(
        run, TOKEN_CONTENT_DECODED
    )
