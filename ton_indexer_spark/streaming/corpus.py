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
    # pipeline doesn't otherwise want
    from ton_indexer_spark.functions.charlm import ALPHABET, _char_count

    lowered = F.lower(F.col("text"))
    counts = [_char_count(lowered, c).cast("long") for c in ALPHABET]
    n_scored = sum(counts[1:], counts[0])
    nll = None
    for c, cnt in zip(ALPHABET, counts):
        term = cnt * F.lit(model[c])
        nll = term if nll is None else nll + term
    nll_per_char = F.when(
        n_scored > 0, nll.cast("double") / n_scored.cast("double")
    )
    gated = docs.where(
        (token_count(F.col("text")) >= min_tokens)
        & nll_per_char.isNotNull()
        & (nll_per_char < max_nll_per_char)
    )
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
