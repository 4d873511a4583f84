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

from ton_indexer_spark.dedup.shingles import shingle_array

N_HASHES = 16
N_BANDS = 4


def _h(i: int, shingle: F.Column | None = None) -> F.Column:
    s = F.col("shingle") if shingle is None else shingle
    return F.md5(F.concat(F.lit(f"{i}:"), s))


def minhash_signatures(
    docs: DataFrame,
    n_hashes: int = N_HASHES,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, h0..h{n-1}) — min of each hash function over the doc's shingles.

    Computed ENTIRELY map-side: the per-doc shingle array feeds
    ``array_min(transform(...))`` per hash function, so the signature
    stage has no explode, no aggregation and no shuffle (the old
    explode → groupBy formulation planned a SortAggregate pair around a
    corpus-wide exchange).  ``array_min`` and ``F.min`` share the same
    UTF8 binary string ordering, so signatures are bit-identical.
    Docs with fewer than k tokens have no shingles and produce no row
    (same as the groupBy form).
    """
    # Drop sub-k-token docs BEFORE shingling with a filter over the raw
    # token count — exactly the rows whose shingle array is empty.  A
    # post-hoc ``filter(size(sharr) > 0)`` is semantically identical but
    # catastrophically slower: predicate pushdown inlines the whole
    # array_distinct(transform(...)) expression into the Filter
    # condition and Catalyst's constraint propagation then re-
    # canonicalizes that tree repeatedly (measured: 0.6 s → 7.6 s at
    # sf0.1, almost all driver CPU).
    docs = docs.filter(
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")) >= k
    )
    arr = shingle_array(docs, id_col, text_col, k)
    sharr = F.col("sharr")

    def _hash_with(i: int):
        # single-arg closure: a 2-parameter lambda would be taken by the
        # HOF machinery as the (element, index) form
        return lambda s: _h(i, s)

    sigs = [
        F.array_min(F.transform(sharr, _hash_with(i))).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    return arr.select(F.col(id_col), *sigs)


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
