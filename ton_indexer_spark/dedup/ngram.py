"""n-gram Jaccard near-duplicate pairs.

shingle self-join → |A ∩ B| per pair → Jaccard = common / (|A|+|B|-common).
The threshold test is done in INTEGER arithmetic
(``common * denom_scale >= thresh_scaled * union``) so the cut is exact and
engine-independent; the reported jaccard double is a deterministic division
of those same integers.

Scale: the self-join shuffles on the shingle; hot shingles (stop-phrase
skew) are capped with a document-frequency filter — standard practice, and
the reason this beats |docs|² at 100 TB.  The cap DEFAULTS ON
(``max_shingle_df=256``): an unguarded posting-list self-join grows with
the square of the hottest shingle's document frequency, which the 10×
scale probe measured as 28× wall growth on a duplicate-heavy corpus.
A shingle shared by >256 documents carries ~no similarity signal (it is
boilerplate by definition) but contributes >32k join pairs; dropping it
changes Jaccard only for pairs that were already near-identical in their
rare shingles.  Pass ``max_shingle_df=None`` to disable, and enable INFO
logging on this module to see how many shingles the cap dropped.

Two LOSSLESS candidate filters on top of the cap (output provably
identical; both from the exact-similarity-join literature):

- **size filter** (always on): J(A,B) ≥ t forces t·|B| ≤ |A| ≤ |B|/t,
  checked in exact integer arithmetic inside the posting join before
  the per-pair aggregation — rows for size-incompatible pairs never
  reach the shuffle's reduce side.
- **prefix filter** (``prefix_filter=True``, OPT-IN — the
  AllPairs/SSJoin family, Bayardo et al. WWW'07, Chaudhuri et al.
  ICDE'06): under any global shingle order, a qualifying pair must
  share a shingle inside the probing doc's first
  ``|S| - ceil(t·|S|) + 1`` shingles (the common count is ≥
  ceil(t·|S|) and only ceil(t·|S|) - 1 shingles lie outside the
  prefix), so indexing only the prefix — ordered by ascending document
  frequency, i.e. the RARE shingles — against full postings drops
  candidate volume from Σ df² to Σ df_prefix·df.  That is a large win
  exactly when shingle document frequency is Zipf-skewed (natural
  text).  MEASURED counter-productive on this repo's synthetic
  flat-frequency corpus (155-word vocabulary → near-uniform df): at
  sf1 the prefix kept 71% of postings and candidate rows grew 152M vs
  114M plain (the `!=` join sees both orientations), so the default
  stays off and the gate uses the plain size-filtered join.

MEASURED regimes on a 500k-doc Zipf corpus (PERF.md round 8, local[32]):

- **EXACT mode (``max_shingle_df=None``): enable the prefix filter.**
  Hot-shingle df grows linearly with the corpus, so plain candidate
  volume grows quadratically (1.77B candidate rows, 1,340 s) while hot
  shingles stay OUT of rarity-ordered prefixes (7.7M candidates,
  111 s — 12× faster, 231× less join volume, and the gap widens every
  decade: at 50k docs plain still won, 9.4 s vs 25 s).  The prefix
  index is what makes exact all-pairs Jaccard tractable at scale.
- **capped mode (the lossy default)**: the df cap already bounds the
  quadratic term, and the capped plain join's narrow-row codegen beats
  the prefix path's set-verification wall-clock locally (20-26 s vs
  85-109 s) even though the prefix still generates 20× fewer candidate
  rows (3.7M vs 76M) — worth flipping on when the CLUSTER is
  shuffle-network-bound rather than CPU-bound.
"""

from __future__ import annotations

import logging

from fractions import Fraction

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ton_indexer_spark.dedup.shingles import shingles

logger = logging.getLogger(__name__)

DEFAULT_MAX_SHINGLE_DF = 256

# The per-doc sizes table is one ~32-byte row per document — it grows
# LINEARLY with the corpus, so a forced broadcast is only safe while the
# corpus is bounded.  Above this cap (~128 MB serialized) the hint is
# omitted and the join is left to AQE, whose runtime stats convert it to
# a broadcast exactly when it is actually small; at the billions-of-docs
# target the sizes side legitimately shuffles.
MAX_BROADCAST_DOCS = 4_000_000


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.3,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int | None = DEFAULT_MAX_SHINGLE_DF,
    prefix_filter: bool = False,
    n_docs: int | None = None,
) -> DataFrame:
    """Return (doc_a, doc_b, common, size_a, size_b, jaccard) for pairs with
    Jaccard >= threshold (doc_a < doc_b).

    ``max_shingle_df`` caps the posting-list length per shingle (the
    self-join skew guard — see module docstring); ``None`` disables.
    ``prefix_filter`` enables the lossless rare-shingle prefix index
    (identical output; wins on Zipf-skewed natural corpora, see module
    docstring); the default is the plain size-filtered posting join.

    ``n_docs`` contract: it skips the broadcast-gate count job, so it
    MUST be an UPPER BOUND on the corpus row count (e.g. a catalog/
    snapshot count taken at or after the read).  An understated value
    below ``MAX_BROADCAST_DOCS`` would force a broadcast of an
    arbitrarily large sizes table (driver/executor OOM).  When in doubt
    leave it ``None`` — the fallback count is one cheap job against a
    table this function aggregates anyway."""
    sh = shingles(docs, id_col, text_col, k)
    df_counts = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("sdf"))
    if max_shingle_df is not None:
        keep = df_counts.filter(F.col("sdf") <= max_shingle_df)
        if logger.isEnabledFor(logging.INFO):
            # no silent caps: count what the guard dropped (extra job, so
            # only when the caller opted into INFO logging)
            n_dropped = df_counts.count() - keep.count()
            logger.info(
                "ngram_jaccard_pairs: dropped %d shingles with df > %d",
                n_dropped, max_shingle_df,
            )
        df_counts = keep
        sh = sh.join(keep.select("shingle"), "shingle")
    # the shingle set feeds several plan branches (postings, prefix,
    # sizes); without caching, Catalyst re-runs tokenize+explode per branch
    sh = sh.cache()
    frac = Fraction(threshold).limit_denominator(10**6)
    num, den = frac.numerator, frac.denominator
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("size"))
    # postings carry the doc's set size: the size filter prunes inside
    # the posting join, and the per-pair sizes ride through the
    # aggregation (constant per group) instead of two downstream joins.
    # sizes is one row per doc, so the broadcast hint (which avoids
    # shuffling the postings side by doc id just to meet a tiny table)
    # is gated on corpus size — see MAX_BROADCAST_DOCS.  Callers that
    # already know the corpus size pass ``n_docs`` to skip the gate's
    # count job; otherwise the count is one cheap job against a table
    # this function aggregates anyway, negligible next to the posting
    # self-join it protects.
    if (n_docs if n_docs is not None else docs.count()) <= MAX_BROADCAST_DOCS:
        sizes = F.broadcast(sizes)
    shs = sh.join(sizes, id_col)

    if prefix_filter:
        common = _prefix_filtered_common(shs, df_counts, frac, id_col)
    else:
        a = shs.select(
            F.col(id_col).alias("doc_a"), "shingle", F.col("size").alias("size_a")
        )
        b = shs.select(
            F.col(id_col).alias("doc_b"), "shingle", F.col("size").alias("size_b")
        )
        common = (
            a.join(b, "shingle")
            .filter(F.col("doc_a") < F.col("doc_b"))
            # lossless size filter: J >= t forces t*|B| <= |A| <= |B|/t
            .filter(
                (F.col("size_a") * F.lit(den) >= F.col("size_b") * F.lit(num))
                & (F.col("size_b") * F.lit(den) >= F.col("size_a") * F.lit(num))
            )
            .groupBy("doc_a", "doc_b")
            .agg(
                F.count(F.lit(1)).alias("common"),
                F.max("size_a").alias("size_a"),
                F.max("size_b").alias("size_b"),
            )
        )
    out = (
        common.withColumn(
            "union_size", F.col("size_a") + F.col("size_b") - F.col("common")
        )
        .filter(
            F.col("common") * F.lit(den) >= F.lit(num) * F.col("union_size")
        )
        .select(
            "doc_a",
            "doc_b",
            "common",
            "size_a",
            "size_b",
            (F.col("common").cast("double") / F.col("union_size").cast("double")).alias(
                "jaccard"
            ),
        )
    )
    return out


def candidate_counts(
    docs: DataFrame,
    threshold: float = 0.3,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int | None = DEFAULT_MAX_SHINGLE_DF,
) -> dict:
    """Candidate-pair volume of the plain posting self-join vs the
    AllPairs prefix index, on the SAME shingle/size-filter setup as
    ``ngram_jaccard_pairs`` — the deterministic metric behind the
    prefix-index design point (wins exactly when shingle df is
    Zipf-skewed; measured counter-productive on flat df).  Returns
    {"plain": candidate rows entering the plain pair aggregation,
    "prefix": candidate rows entering the prefix verification}."""
    sh = shingles(docs, id_col, text_col, k)
    df_counts = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("sdf"))
    if max_shingle_df is not None:
        keep = df_counts.filter(F.col("sdf") <= max_shingle_df)
        df_counts = keep
        sh = sh.join(keep.select("shingle"), "shingle")
    sh = sh.cache()
    frac = Fraction(threshold).limit_denominator(10**6)
    num, den = frac.numerator, frac.denominator
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("size"))
    shs = sh.join(sizes, id_col)
    a = shs.select(F.col(id_col).alias("doc_a"), "shingle",
                   F.col("size").alias("size_a"))
    b = shs.select(F.col(id_col).alias("doc_b"), "shingle",
                   F.col("size").alias("size_b"))
    plain = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(
            (F.col("size_a") * F.lit(den) >= F.col("size_b") * F.lit(num))
            & (F.col("size_b") * F.lit(den) >= F.col("size_a") * F.lit(num))
        )
        .count()
    )
    prefix = _prefix_candidates(shs, df_counts, frac, id_col).count()
    sh.unpersist()
    return {"plain": plain, "prefix": prefix}


def _prefix_candidates(
    shs: DataFrame, df_counts: DataFrame, frac: Fraction, id_col: str
) -> DataFrame:
    """Pre-dedup candidate pair rows of the prefix index: each doc's
    rare-shingle prefix joined against the full posting lists, size
    filter applied inside (the volume the prefix path shuffles)."""
    ranked = shs.join(df_counts, "shingle")
    w = Window.partitionBy(id_col).orderBy("sdf", "shingle")
    num, den = frac.numerator, frac.denominator
    size = F.col("size")
    min_overlap = F.floor((F.lit(num) * size + F.lit(den - 1)) / F.lit(den))
    prefix = (
        ranked.withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= size - min_overlap + F.lit(1))
        .select(F.col(id_col).alias("_pa"), "shingle", size.alias("_za"))
    )
    return (
        prefix.join(
            shs.select(
                F.col(id_col).alias("_pb"), "shingle", size.alias("_zb")
            ),
            "shingle",
        )
        .filter(F.col("_pa") != F.col("_pb"))
        .filter(
            (F.col("_za") * F.lit(den) >= F.col("_zb") * F.lit(num))
            & (F.col("_zb") * F.lit(den) >= F.col("_za") * F.lit(num))
        )
        .select(
            F.least("_pa", "_pb").alias("doc_a"),
            F.greatest("_pa", "_pb").alias("doc_b"),
        )
    )


def _prefix_filtered_common(
    shs: DataFrame, df_counts: DataFrame, frac: Fraction, id_col: str
) -> DataFrame:
    """(doc_a, doc_b, common, size_a, size_b) for every pair that can
    reach the threshold.  ``shs`` is the posting table with a ``size``
    column per doc.

    Candidate generation: index only each doc's PREFIX — its first
    ``s - ceil(t·s) + 1`` shingles under the global (df asc, shingle asc)
    order — and join it against the FULL posting lists.  Lossless: a
    qualifying pair shares ≥ ceil(t·s) shingles, and the probing doc has
    only ceil(t·s) - 1 shingles outside its prefix, so at least one
    shared shingle falls inside it.  The size filter applies inside the
    candidate join.  Exact verification then recomputes |A∩B| with one
    array_intersect over the two docs' shingle sets — per-candidate
    work, no second posting join.
    """
    # rank each doc's shingles by global rarity; prefix = rarest few
    # (candidate generation shared with candidate_counts)
    cand = _prefix_candidates(shs, df_counts, frac, id_col).distinct()
    docsets = shs.groupBy(id_col).agg(
        F.collect_set("shingle").alias("shset"), F.max("size").alias("size")
    )
    return (
        cand.join(
            docsets.select(
                F.col(id_col).alias("doc_a"),
                F.col("shset").alias("_sa"),
                F.col("size").alias("size_a"),
            ),
            "doc_a",
        )
        .join(
            docsets.select(
                F.col(id_col).alias("doc_b"),
                F.col("shset").alias("_sb"),
                F.col("size").alias("size_b"),
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("_sa", "_sb")).cast("long").alias("common"),
            "size_a",
            "size_b",
        )
        .filter(F.col("common") > 0)
    )
