"""Streaming corpus curation demo — the LLM funnel over file drops.

The batch funnel (examples/llm_pipeline.py) as a Structured Streaming
job: documents land as parquet file drops; each micro-batch flows
through the SAME column-algebra quality/PII/split stages, exact dedup
keeps fingerprint state across batches (and restarts), and near-dup
screening probes the persisted LSH band index incrementally — cost per
batch is |batch| + matched buckets, never |corpus|.

Run:  python examples/streaming_curation.py   (~1 min on local[32])
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from ton_indexer_spark.functions.charlm import train_char_lm  # noqa: E402
from ton_indexer_spark.session import get_spark  # noqa: E402
from ton_indexer_spark.streaming.corpus import (  # noqa: E402
    run_curation_available_now,
    run_incremental_neardup_available_now,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = get_spark(app_name="streaming_curation_demo")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    model = train_char_lm(docs.filter(F.col("lang") == "en"))
    work = tempfile.mkdtemp(prefix="curation_stream_")

    # stage the corpus as two file drops (two micro-batches)
    src = f"{work}/src"
    docs.filter("doc_id % 2 = 0").coalesce(1).write.parquet(src)
    docs.filter("doc_id % 2 = 1").coalesce(1).write.mode("append").parquet(src)

    print("== curation stream (quality gate + PII + split + exact dedup)")
    out1 = f"{work}/curated"
    run_curation_available_now(
        spark, src, out1, f"{work}/ckpt1", model,
        max_nll_per_char=2_940_000,
    )
    curated = spark.read.parquet(out1)
    print(f"   curated rows: {curated.count()} "
          f"(distinct fp: {curated.select('fp').distinct().count()})")

    print("== incremental near-dup stream (persisted LSH band index)")
    out2 = f"{work}/neardup"
    run_incremental_neardup_available_now(
        spark, src, out2, f"{work}/ckpt2")
    kept = spark.read.parquet(f"{out2}/docs")
    index = spark.read.parquet(f"{out2}/_lsh_index")
    print(f"   kept docs: {kept.count()}; index rows: {index.count()}")
    print("== done — both sinks resume from their checkpoints on restart")


if __name__ == "__main__":
    main()
