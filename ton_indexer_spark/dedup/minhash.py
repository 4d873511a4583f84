"""MinHash + LSH banding near-duplicate candidate generation.

Hash family: h_i(shingle) = md5(i ‖ ':' ‖ shingle) compared as hex strings —
deterministic, engine-portable (the DuckDB oracle computes the identical
signature), and uniform enough for LSH banding.  Signature = per-doc MIN of
each h_i, computed as ONE groupBy with n_hashes min() aggregates (a single
shuffle with full map-side combine).

Banding: the signature splits into bands of r rows; band hash =
md5(h_{br} ‖ … ‖ h_{br+r-1}).  Candidate pairs = docs sharing any
(band_id, band_hash) bucket — a self-join that shuffles on the bucket key,
never on the cross product.  With n=16, b=4, r=4 the usual S-curve puts the
50% detection point near jaccard ≈ (1/b)^(1/r) ≈ 0.71.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ton_indexer_spark.dedup.shingles import shingles

N_HASHES = 16
N_BANDS = 4


def _h(i: int) -> F.Column:
    return F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))


def minhash_signatures(
    docs: DataFrame,
    n_hashes: int = N_HASHES,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, h0..h{n-1}) — min of each hash function over the doc's shingles."""
    sh = shingles(docs, id_col, text_col, k)
    aggs = [F.min(_h(i)).alias(f"h{i}") for i in range(n_hashes)]
    return sh.groupBy(id_col).agg(*aggs)


def band_buckets(
    docs: DataFrame,
    n_hashes: int = N_HASHES,
    n_bands: int = N_BANDS,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, band_id, band_hash) — one row per (doc, band).

    The LSH index rows: two docs are near-dup CANDIDATES iff they share a
    (band_id, band_hash) bucket.  Persisting this table gives an
    incremental index — new docs only join their own bucket keys against
    it (see streaming/corpus.py)."""
    assert n_hashes % n_bands == 0
    r = n_hashes // n_bands
    sig = minhash_signatures(docs, n_hashes, k, id_col, text_col)
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(
                    F.concat_ws("|", *[F.col(f"h{b * r + j}") for j in range(r)])
                ).alias("band_hash"),
            )
            for b in range(n_bands)
        ]
    )
    return sig.select(
        F.col(id_col), F.explode(bands).alias("band")
    ).select(id_col, "band.band_id", "band.band_hash")


def lsh_candidate_pairs(
    docs: DataFrame,
    n_hashes: int = N_HASHES,
    n_bands: int = N_BANDS,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distinct (doc_a, doc_b) with doc_a < doc_b sharing ≥1 LSH band bucket."""
    # cache: the bucket table feeds both sides of the candidate self-join —
    # uncached, the whole shingle→signature pipeline executes twice
    buckets = band_buckets(
        docs, n_hashes, n_bands, k, id_col, text_col
    ).cache()
    a = buckets.select(
        F.col(id_col).alias("doc_a"), "band_id", "band_hash"
    )
    b = buckets.select(
        F.col(id_col).alias("doc_b"), "band_id", "band_hash"
    )
    return (
        a.join(b, ["band_id", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def source_overlap_matrix(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """(source_a, source_b, n_pairs) — near-dup pairs rolled up into a
    source × source overlap matrix (the "which crawls duplicate which"
    provenance report).

    Takes a MATERIALIZED ``(doc_a, doc_b)`` pair table — in a pipeline
    the expensive LSH pair derivation runs once and feeds both this
    report and cluster canonicalization (see examples/llm_pipeline.py)
    instead of being recomputed per consumer.  Cost is |pairs|-sized:
    two id-keyed joins and one tiny (|sources|²-bounded) aggregation.
    """
    src = docs.select(id_col, source_col)
    return (
        pairs.join(
            src.withColumnsRenamed({id_col: "doc_a", source_col: "_sa"}),
            "doc_a",
        )
        .join(
            src.withColumnsRenamed({id_col: "doc_b", source_col: "_sb"}),
            "doc_b",
        )
        .select(
            F.least("_sa", "_sb").alias("source_a"),
            F.greatest("_sa", "_sb").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("source_a", "source_b")
    )
