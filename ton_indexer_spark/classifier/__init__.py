"""Trace → actions classification engine (SURVEY.md §2.10 C1-C6).

The reference's event-classifier is ~25k lines of Python running outside the
database (indexer/indexer/events/*): per trace it builds a message tree,
runs ~95 protocol matchers over the block DAG and serializes matched blocks
into typed action rows.  In Spark terms that whole system is ONE grouped-map
pandas UDF:

    transactions ⋈ messages ⋈ message_contents   (rows, not objects)
      ⋈ broadcast dimension context               (C6 interface repository)
      → trace-partitioned mapInPandas stream (classify) (C1-C4)
      → actions + exploded action_accounts        (C5 serializer)

This package implements the DSL and a representative matcher set
(ton_transfer, call_contract, contract_deploy, jetton_transfer with
notify/excesses legs, nft_transfer, jetton_burn) — the remaining protocol
matchers are volume on the same substrate, not new machinery
(SURVEY.md §7 step 7).
"""

from ton_indexer_spark.classifier.classify import classify_traces

__all__ = ["classify_traces"]
