"""Standing integrity audit — derived tables vs facts.

The reference ships a dedicated integrity checker that re-reads node data
and compares it against what the database holds
(ton-index-worker/ton-integrity-checker/src/IntegrityChecker.cpp:1-316;
SURVEY §5 "Data integrity").  In this engine every derived table (traces,
latest_account_states, action_accounts) is a pure function of the fact
tables, so the audit dissolves into cheap batch re-derivation + anti-join:
recompute the derived rows over a scoped slice and diff them against what
is stored.  A non-empty findings frame means a write was lost, duplicated
or corrupted — the same signal the reference checker raises, without a
node round-trip.

All three checks share one findings schema so they union into a single
report:

    check    — which audit produced the row
    key      — the violated row's natural key
    issue    — 'missing' (derivable but not stored) / 'extra' (stored but
               not derivable) / 'mismatch' (both present, fields differ)
    stored   — the stored value (or NULL)
    derived  — the recomputed value (or NULL)

Scale shape: every diff is keyed on the derived table's natural key
(trace_id / account / action_id+account), so each check is one shuffle on
that key; the trace check's recompute is ``assemble_traces`` itself, which
the caller scopes by seqno range (the reference checker walks a seqno
window the same way, IntegrityChecker.cpp:61-104).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FINDING_COLS = ("check", "key", "issue", "stored", "derived")


def _findings(df: DataFrame) -> DataFrame:
    return df.select(*FINDING_COLS)


def audit_traces(
    transactions: DataFrame,
    messages: DataFrame,
    stored_traces: DataFrame,
) -> DataFrame:
    """Re-run trace assembly over the facts and diff (trace_id, nodes_,
    state) against the stored traces table.  Callers scope all three
    inputs to the same seqno/lt range; the recompute is the batch
    assembler (operators/trace_assembly.py), i.e. exactly what ingest
    would have written."""
    from ton_indexer_spark.operators.trace_assembly import assemble_traces

    derived = assemble_traces(transactions, messages).traces.select(
        "trace_id",
        F.col("nodes_").cast("long").alias("d_nodes"),
        F.col("state").alias("d_state"),
    )
    stored = stored_traces.select(
        "trace_id",
        F.col("nodes_").cast("long").alias("s_nodes"),
        F.col("state").alias("s_state"),
    )
    j = derived.join(stored, "trace_id", "full_outer")
    return _findings(
        j.filter(
            F.col("s_nodes").isNull()
            | F.col("d_nodes").isNull()
            | (F.col("s_nodes") != F.col("d_nodes"))
            | (F.col("s_state") != F.col("d_state"))
        ).select(
            F.lit("traces").alias("check"),
            F.col("trace_id").alias("key"),
            F.when(F.col("s_nodes").isNull(), "missing")
            .when(F.col("d_nodes").isNull(), "extra")
            .otherwise("mismatch")
            .alias("issue"),
            F.when(
                F.col("s_nodes").isNotNull(),
                F.concat_ws("/", F.col("s_nodes"), F.col("s_state")),
            ).alias("stored"),
            F.when(
                F.col("d_nodes").isNotNull(),
                F.concat_ws("/", F.col("d_nodes"), F.col("d_state")),
            ).alias("derived"),
        )
    )


def audit_latest_states(
    account_states: DataFrame,
    stored_latest: DataFrame,
    version_col: str = "last_trans_lt",
) -> DataFrame:
    """latest_account_states must equal the W2 last-writer-wins window
    over the append-only account_states history."""
    from ton_indexer_spark.operators.windows import latest_by

    derived = latest_by(
        account_states, ["account"], version_col
    ).select(
        "account", F.col(version_col).cast("long").alias("d_lt")
    )
    stored = stored_latest.select(
        "account", F.col(version_col).cast("long").alias("s_lt")
    )
    j = derived.join(stored, "account", "full_outer")
    return _findings(
        j.filter(
            F.col("s_lt").isNull()
            | F.col("d_lt").isNull()
            | (F.col("s_lt") != F.col("d_lt"))
        ).select(
            F.lit("latest_account_states").alias("check"),
            F.col("account").alias("key"),
            F.when(F.col("s_lt").isNull(), "missing")
            .when(F.col("d_lt").isNull(), "extra")
            .otherwise("mismatch")
            .alias("issue"),
            F.col("s_lt").cast("string").alias("stored"),
            F.col("d_lt").cast("string").alias("derived"),
        )
    )


def audit_action_accounts(
    actions: DataFrame,
    stored_action_accounts: DataFrame,
) -> DataFrame:
    """action_accounts must equal explode(actions.accounts) — the J6
    pre-exploded table is derived, never authored."""
    derived = actions.select(
        "action_id", "trace_id", F.explode("accounts").alias("account")
    ).distinct()
    stored = stored_action_accounts.select(
        "action_id", "trace_id", "account"
    ).distinct()
    keys = ["action_id", "trace_id", "account"]
    missing = derived.join(stored, keys, "left_anti").select(
        F.lit("action_accounts").alias("check"),
        F.concat_ws("|", *keys).alias("key"),
        F.lit("missing").alias("issue"),
        F.lit(None).cast("string").alias("stored"),
        F.lit("present").alias("derived"),
    )
    extra = stored.join(derived, keys, "left_anti").select(
        F.lit("action_accounts").alias("check"),
        F.concat_ws("|", *keys).alias("key"),
        F.lit("extra").alias("issue"),
        F.lit("present").alias("stored"),
        F.lit(None).cast("string").alias("derived"),
    )
    return _findings(missing.unionByName(extra))


def integrity_report(
    transactions: DataFrame,
    messages: DataFrame,
    stored_traces: DataFrame,
    account_states: DataFrame | None = None,
    stored_latest: DataFrame | None = None,
    actions: DataFrame | None = None,
    stored_action_accounts: DataFrame | None = None,
) -> DataFrame:
    """Union of all applicable audits — one findings frame, empty when
    the store is consistent (the checker's pass condition)."""
    out = audit_traces(transactions, messages, stored_traces)
    if account_states is not None and stored_latest is not None:
        out = out.unionByName(
            audit_latest_states(account_states, stored_latest)
        )
    if actions is not None and stored_action_accounts is not None:
        out = out.unionByName(
            audit_action_accounts(actions, stored_action_accounts)
        )
    return out
