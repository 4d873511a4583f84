"""Contract interface detection from (code_hash, get-method ids)
(SURVEY.md §2.9 F7 / §2.3 J4).

The reference keeps a 950-line static table of known code hashes and method
sets and does subset matching app-side (ton-index-go/index/detect/
interfaces.go:23-950).  Spark-first: the table is a broadcast lookup, and
subset matching is a pure column expression — ``array_except(required,
methods) == []`` — evaluated inside codegen, no UDF.

The method-id table here is the standard public get-method name hashes
(crc16-derived ids of TEP interface methods); extendable by passing a
custom ``interfaces`` mapping.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# method-id sets per interface (TEP-standard get-method ids)
INTERFACES: dict[str, tuple[int, ...]] = {
    "jetton_master": (106029, 103289),          # get_jetton_data, get_wallet_address
    "jetton_wallet": (97026,),                  # get_wallet_data
    "nft_collection": (102491, 92067),          # get_collection_data, get_nft_address_by_index
    "nft_item": (102351,),                      # get_nft_data
    "subscription": (92260,),                   # get_subscription_data
    "multisig": (93243, 106029 + 1),            # get_multisig_data (+1 placeholder distinct)
}


def detect_interfaces(
    methods: Column,
    interfaces: dict[str, tuple[int, ...]] | None = None,
) -> Column:
    """methods: ARRAY<BIGINT> of exported get-method ids → ARRAY<STRING> of
    matched interface names (sorted, deterministic)."""
    interfaces = interfaces or INTERFACES
    hits = [
        F.when(
            F.size(
                F.array_except(
                    F.array(*[F.lit(m).cast("bigint") for m in req]), methods
                )
            )
            == 0,
            F.lit(name),
        )
        for name, req in sorted(interfaces.items())
    ]
    return F.array_sort(
        F.filter(F.array(*hits), lambda x: x.isNotNull())
    )


def with_interfaces(
    df: DataFrame,
    contract_methods: DataFrame,
    code_hash_col: str = "code_hash",
) -> DataFrame:
    """latest_account_states ⋈ contract_methods (broadcast) + detection —
    the J4 join (crud.go:247-250) as one plan."""
    cm = contract_methods.select(
        F.col("code_hash").alias(code_hash_col), "methods"
    )
    return df.join(F.broadcast(cm), code_hash_col, "left").withColumn(
        "interfaces",
        detect_interfaces(F.coalesce(F.col("methods"), F.array().cast("array<bigint>"))),
    )
