"""Streaming corpus curation — the training-data funnel as a
Structured Streaming job.

A 100 TB corpus doesn't arrive at once: crawls land as file drops.  This
module runs the curation stages incrementally over a ``readStream`` file
source, with exactly the split the batch pipeline (examples/
llm_pipeline.py) documents:

- **stateless stages stream as-is** — quality scoring, PII redaction,
  token counting, dataset split are pure column expressions, so the SAME
  functions the batch path uses apply unchanged to a streaming DataFrame
  (that composability is the point of keeping them column algebra);
- **exact dedup becomes stateful** — ``dropDuplicates`` on the content
  fingerprint keeps seen-fingerprint state across micro-batches (Spark's
  streaming-dedup state store).  State grows with distinct content; for
  bounded state at planet scale, swap in ``dropDuplicatesWithinWatermark``
  keyed on crawl time, or the Bloom screen (``dedup/bloom.py``) inside
  ``foreachBatch`` against the persisted filter of prior runs;
- **near/semantic dedup stays in foreachBatch** — pair joins need the
  accumulated corpus, so each micro-batch deduplicates against the SINK
  (read back per batch), the same merge-vs-history shape as
  ``sources/writer.py::merge_dimension``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ton_indexer_spark.functions.pii import redact_pii
from ton_indexer_spark.functions.text import fingerprint, token_count
from ton_indexer_spark.operators.sampling import dataset_split

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def corpus_stream(spark: SparkSession, src_dir: str) -> DataFrame:
    """File-drop source: each parquet file landing in ``src_dir`` is one
    micro-batch increment (maxFilesPerTrigger=1 keeps drops ordered)."""
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )


def curate(
    docs: DataFrame,
    model: dict[str, int],
    max_nll_per_char: float,
    min_tokens: int = 5,
) -> DataFrame:
    """Stateless curation: quality gate → PII redaction → split.

    Works identically on batch and streaming DataFrames — every
    expression is map-side column algebra.  ``model`` comes from
    ``train_char_lm`` over a reference corpus (trained OFFLINE — a
    streaming job never re-trains its own filter mid-flight).
    """
    # inline the char-LM expressions (rather than joining the
    # char_lm_score projection back) so the streaming plan stays a single
    # stateless select — stream-stream joins need watermarks this
    # pipeline doesn't otherwise want.  Bind the score to a column FIRST:
    # repeating the 37-count expression inside each filter clause would
    # re-evaluate every replace() per clause
    from ton_indexer_spark.functions.charlm import nll_columns

    n_scored, nll = nll_columns(model)
    scored = docs.withColumn(
        "_nll_per_char",
        F.when(n_scored > 0, nll.cast("double") / n_scored.cast("double")),
    )
    gated = scored.where(
        (token_count(F.col("text")) >= min_tokens)
        & F.col("_nll_per_char").isNotNull()
        & (F.col("_nll_per_char") < max_nll_per_char)
    ).drop("_nll_per_char")
    redacted = gated.withColumn("text", redact_pii(F.col("text")))
    return dataset_split(redacted, id_col="doc_id").withColumn(
        "fp", fingerprint(F.col("text"))
    )


def dedup_stream(curated: DataFrame) -> DataFrame:
    """Cross-batch exact dedup: first occurrence of each fingerprint wins.

    ``dropDuplicates`` on a streaming DataFrame keeps fingerprint state in
    the state store — redelivered or re-crawled content in ANY later
    micro-batch is dropped, which is the exactly-once content guarantee
    the batch keep-smallest-id groupBy gives retroactively.
    """
    return curated.dropDuplicates(["fp"])


def run_curation_available_now(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    model: dict[str, int],
    max_nll_per_char: float,
) -> None:
    """Drain all pending file drops through curate→dedup into parquet."""
    stream = corpus_stream(spark, src_dir)
    result = dedup_stream(curate(stream, model, max_nll_per_char))
    (
        result.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def run_incremental_neardup_available_now(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """Near-dedup each micro-batch against ALL history via a persisted
    LSH index — without ever recomputing the corpus.

    The index is the MinHash band-bucket table (``dedup/minhash.py::
    band_buckets``) appended under ``out_dir``/_lsh_index.  Per batch:

    1. compute the batch's band buckets (shingle → signature → bands —
       one aggregation over the BATCH only);
    2. semi-join them against the stored index (shuffle keyed on the
       band hash; the probe touches only matching buckets, and Spark
       prunes the index scan to the two join columns);
    3. batch docs hitting any stored bucket are near-duplicates of
       history → dropped; survivors dedup among THEMSELVES (batch-local
       pair join, keep-smallest-id) and append to both the corpus sink
       and the index.

    Cost per batch is |batch| + |matched buckets|, not |corpus| — the
    same merge-vs-history shape as ``sources/writer.py::merge_dimension``.
    Exactly-once: both sinks are BATCH-KEYED (``batch=N`` subdirs written
    with overwrite — the same pattern as the ingest body store), and the
    history probe excludes the current batch's own partition, so a
    redelivered batch recomputes against the same history and overwrites
    its own output instead of self-colliding or double-appending.
    """
    import os

    from ton_indexer_spark.dedup.minhash import band_buckets

    index_dir = os.path.join(out_dir, "_lsh_index")
    docs_dir = os.path.join(out_dir, "docs")

    def process(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        if batch.rdd.isEmpty():
            return
        buckets = band_buckets(batch).localCheckpoint(eager=True)
        try:
            stored = s.read.option("basePath", index_dir).parquet(index_dir)
            stored = stored.filter(F.col("batch") != batch_id)
        except Exception:  # noqa: BLE001 — first batch: no index yet
            stored = None
        if stored is not None:
            hist_dups = (
                buckets.alias("n")
                .join(
                    stored.alias("o"),
                    (F.col("n.band_id") == F.col("o.band_id"))
                    & (F.col("n.band_hash") == F.col("o.band_hash")),
                )
                .select(F.col("n.doc_id").alias("doc_id"))
                .distinct()
            )
            kept = batch.join(hist_dups, "doc_id", "left_anti")
            kept_buckets = buckets.join(hist_dups, "doc_id", "left_anti")
        else:
            kept, kept_buckets = batch, buckets
        # batch-local near-dup among survivors: keep smallest doc_id
        a = kept_buckets.select(
            F.col("doc_id").alias("doc_a"), "band_id", "band_hash")
        b = kept_buckets.select(
            F.col("doc_id").alias("doc_b"), "band_id", "band_hash")
        local_dups = (
            a.join(b, ["band_id", "band_hash"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select(F.col("doc_b").alias("doc_id"))
            .distinct()
        )
        kept = kept.join(local_dups, "doc_id", "left_anti")
        kept_buckets = kept_buckets.join(local_dups, "doc_id", "left_anti")
        kept.write.mode("overwrite").parquet(
            os.path.join(docs_dir, f"batch={batch_id}"))
        kept_buckets.write.mode("overwrite").parquet(
            os.path.join(index_dir, f"batch={batch_id}"))

    (
        corpus_stream(spark, src_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def run_incremental_line_dedup_available_now(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    min_docs: int = 3,
    min_chars: int = 10,
) -> None:
    """C4 line-level boilerplate removal, incrementally — without ever
    recomputing global line frequencies over the accumulated corpus.

    The persisted index under ``out_dir``/_line_index holds one row per
    (line_digest, batch) with that batch's distinct-doc count; documents
    never recur across batches, so summing per-batch counts is EXACT
    distinct-doc frequency.  Per batch:

    1. aggregate the batch's (digest → n_docs) — one shuffle over the
       BATCH only, digest-keyed (bounded width, dedup/lines.py discipline);
    2. read the index, sum history+batch counts per digest, keep digests
       reaching ``min_docs`` — the boilerplate set as of THIS batch's
       arrival (already-written history is not retro-edited: the standard
       streaming approximation, same contract as the LSH index above);
    3. strip those lines from the batch's documents (anti-join on the
       digest), write cleaned docs and the batch's counts batch-keyed
       (overwrite-by-batch ⇒ redelivery-idempotent, exactly-once).

    Cost per batch is |batch lines| + |frequent digests|, not |corpus|.
    """
    import os

    from ton_indexer_spark.dedup.lines import split_lines

    index_dir = os.path.join(out_dir, "_line_index")
    docs_dir = os.path.join(out_dir, "docs")

    def process(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        if batch.rdd.isEmpty():
            return
        lines = split_lines(batch).localCheckpoint(eager=True)
        eligible = lines.filter(
            F.length(F.trim("line")) >= min_chars
        ).select(F.md5(F.trim("line")).alias("line_digest"), "doc_id")
        counts = eligible.groupBy("line_digest").agg(
            F.count_distinct("doc_id").alias("n_docs")
        ).localCheckpoint(eager=True)
        try:
            stored = s.read.option("basePath", index_dir).parquet(index_dir)
            stored = stored.filter(F.col("batch") != batch_id)
        except Exception:  # noqa: BLE001 — first batch: no index yet
            stored = None
        total = (
            counts if stored is None
            else counts.unionByName(stored.select("line_digest", "n_docs"))
        )
        frequent = (
            total.groupBy("line_digest")
            .agg(F.sum("n_docs").alias("n_docs"))
            .filter(F.col("n_docs") >= min_docs)
            .select("line_digest")
        )
        kept_lines = lines.join(
            frequent,
            F.md5(F.trim(lines["line"])) == frequent["line_digest"],
            "left_anti",
        )
        rebuilt = kept_lines.groupBy("doc_id").agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda st: st["line"],
                ),
                "\n",
            ).alias("clean_text")
        )
        cleaned = (
            batch.join(rebuilt, "doc_id", "left")
            .withColumn("text", F.coalesce("clean_text", F.lit("")))
            .drop("clean_text")
        )
        cleaned.write.mode("overwrite").parquet(
            os.path.join(docs_dir, f"batch={batch_id}"))
        counts.write.mode("overwrite").parquet(
            os.path.join(index_dir, f"batch={batch_id}"))

    (
        corpus_stream(spark, src_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
