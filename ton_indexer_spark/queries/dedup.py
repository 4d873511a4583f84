"""Deduplication gate queries over `documents`.

The oracle SQL re-derives the identical md5-based shingle/signature algebra
in DuckDB, so exact, jaccard, minhash-LSH and simhash are all value-checked
end to end (SURVEY.md beyond-reference dedup set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ton_indexer_spark.catalog import Catalog
from ton_indexer_spark.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
    simhash_signature,
)
from ton_indexer_spark.dedup.minhash import N_BANDS, N_HASHES
from ton_indexer_spark.dedup.simhash import N_BITS
from ton_indexer_spark.queries import register

_SHINGLE_CTE = r"""
    toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents
        WHERE length(trim(text)) > 0
    ),
    sh AS (
        SELECT DISTINCT doc_id, shingle
        FROM (
            SELECT doc_id,
                   unnest(CASE WHEN len(t) >= 3
                               THEN list_transform(range(1, len(t) - 1),
                                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                               ELSE [] END) AS shingle
            FROM toks
        )
    )
"""


@register(
    "dedup_exact",
    r"""
    SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS n_dups
    FROM documents
    GROUP BY 1
    ORDER BY fingerprint
    """,
    survey_ops=("beyond:dedup-exact",),
    description="exact dedup: hash-groupBy on normalized-content fingerprint",
)
def dedup_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return exact_dedup(d).orderBy("fingerprint")


_NGRAM_JACCARD_ORACLE = f"""
    WITH {_SHINGLE_CTE},
    -- document-frequency skew cap, mirroring the Spark default
    -- (dedup/ngram.py DEFAULT_MAX_SHINGLE_DF)
    shc AS (
        SELECT doc_id, shingle FROM sh
        WHERE shingle IN (
            SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 256
        )
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shc GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
        FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, common,
           sa.sz AS size_a, sb.sz AS size_b,
           CAST(common AS DOUBLE) / (sa.sz + sb.sz - common) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE common * 10 >= 3 * (sa.sz + sb.sz - common)
    ORDER BY doc_a, doc_b
    """


@register(
    "dedup_ngram_jaccard",
    _NGRAM_JACCARD_ORACLE,
    survey_ops=("beyond:dedup-ngram",),
    description="3-gram shingle Jaccard pairs >= 0.3 (integer-exact threshold)",
)
def dedup_ngram_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    out = ngram_jaccard_pairs(d, threshold=0.3, k=3)
    return (
        out.withColumnRenamed("size_a", "size_a")
        .orderBy("doc_a", "doc_b")
    )


@register(
    "dedup_ngram_prefix",
    _NGRAM_JACCARD_ORACLE,
    survey_ops=("beyond:dedup-ngram-prefix",),
    description="the SAME exact Jaccard pair set through the lossless "
    "AllPairs rare-shingle prefix index (index prefix postings vs full "
    "postings, size filter in the candidate join, array_intersect "
    "verification) — one SQL ground truth attests both physical paths; "
    "the prefix path is the Zipf-skewed-corpus scale plan",
)
def dedup_ngram_prefix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return ngram_jaccard_pairs(
        d, threshold=0.3, k=3, prefix_filter=True
    ).orderBy("doc_a", "doc_b")


def _minhash_pairs_with() -> str:
    """Shared WITH-prefix deriving the LSH candidate pair set ``mpairs``."""
    r = N_HASHES // N_BANDS
    mins = ",\n               ".join(
        f"MIN(md5('{i}:' || shingle)) AS h{i}" for i in range(N_HASHES)
    )
    sep = " || '|' || "
    band_rows = "\n        UNION ALL\n        ".join(
        f"SELECT doc_id, {b} AS band_id, "
        f"md5({sep.join(f'h{b * r + j}' for j in range(r))}) AS band_hash "
        "FROM sig"
        for b in range(N_BANDS)
    )
    return f"""
    WITH {_SHINGLE_CTE},
    sig AS (
        SELECT doc_id,
               {mins}
        FROM sh GROUP BY doc_id
    ),
    buckets AS (
        {band_rows}
    ),
    mpairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM buckets a
        JOIN buckets b ON a.band_id = b.band_id AND a.band_hash = b.band_hash
                       AND a.doc_id < b.doc_id
    )
    """


def _minhash_oracle() -> str:
    return f"""
    {_minhash_pairs_with()}
    SELECT doc_a, doc_b FROM mpairs
    ORDER BY doc_a, doc_b
    """


@register(
    "dedup_minhash_lsh",
    _minhash_oracle(),
    survey_ops=("beyond:dedup-minhash",),
    description=f"MinHash({N_HASHES}) + LSH banding ({N_BANDS} bands) "
    "candidate pairs; md5 hash family is engine-portable",
)
def dedup_minhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return lsh_candidate_pairs(d).orderBy("doc_a", "doc_b")


def _simhash_oracle() -> str:
    odd = "('1','3','5','7','9','b','d','f')"
    votes = ",\n               ".join(
        f"SUM(CASE WHEN substr(th, {j + 1}, 1) IN {odd} THEN 1 ELSE -1 END) AS v{j}"
        for j in range(N_BITS)
    )
    bits = " || ".join(
        f"(CASE WHEN v{j} > 0 THEN '1' ELSE '0' END)" for j in range(N_BITS)
    )
    return rf"""
    WITH tok AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        FROM documents WHERE length(trim(text)) > 0
    ),
    th AS (SELECT doc_id, md5(token) AS th FROM tok WHERE length(token) > 0),
    votes AS (
        SELECT doc_id,
               {votes}
        FROM th GROUP BY doc_id
    )
    SELECT doc_id, {bits} AS simhash
    FROM votes
    ORDER BY doc_id
    """


@register(
    "dedup_simhash",
    _simhash_oracle(),
    survey_ops=("beyond:dedup-simhash",),
    description=f"{N_BITS}-bit SimHash signatures (md5-parity bit source)",
)
def dedup_simhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return simhash_signature(d).orderBy("doc_id")


_DECON_K = 5


def _shingle_cte(rel: str, k: int) -> str:
    """DuckDB k-token shingle CTE body over relation ``rel``."""
    parts = " || ' ' || ".join(f"t[i+{j}]" for j in range(k))
    return f"""
        SELECT DISTINCT doc_id, shingle
        FROM (
            SELECT doc_id,
                   unnest(CASE WHEN len(t) >= {k}
                               THEN list_transform(range(1, len(t) - {k - 2}),
                                        i -> {parts})
                               ELSE [] END) AS shingle
            FROM (
                SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
                FROM {rel}
                WHERE length(trim(text)) > 0
            )
        )
    """


@register(
    "decontaminate",
    f"""
    WITH tr AS (SELECT doc_id, text FROM documents WHERE source <> 'src0'),
    be AS (SELECT doc_id, text FROM documents WHERE source = 'src0'),
    trs AS ({_shingle_cte("tr", _DECON_K)}),
    bes AS (SELECT DISTINCT shingle FROM ({_shingle_cte("be", _DECON_K)})),
    per AS (SELECT doc_id, COUNT(*) AS n_shingles FROM trs GROUP BY 1),
    hits AS (
        SELECT doc_id, COUNT(*) AS n_hit
        FROM trs WHERE shingle IN (SELECT shingle FROM bes)
        GROUP BY 1
    )
    SELECT per.doc_id,
           per.n_shingles,
           COALESCE(hits.n_hit, 0) AS n_hit,
           COALESCE(hits.n_hit, 0) * 1000 >= per.n_shingles AS contaminated
    FROM per LEFT JOIN hits USING (doc_id)
    ORDER BY doc_id
    """,
    survey_ops=("beyond:decontaminate",),
    description=f"benchmark decontamination: {_DECON_K}-gram overlap of "
    "training docs (source != src0) against the benchmark corpus (source "
    "= src0); benchmark shingle set is broadcast — the 100 TB side never "
    "shuffles; integer-exact hit-ratio verdict",
)
def decontaminate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ton_indexer_spark.dedup.decontaminate import decontaminate

    d = Catalog(spark, sf_dir).documents
    train = d.filter(F.col("source") != "src0")
    bench = d.filter(F.col("source") == "src0")
    return decontaminate(
        train, bench, k=_DECON_K, min_hit_ratio=(1, 1000)
    ).orderBy("doc_id")


_NGRAM_PAIRS_CTE = f"""
    {_SHINGLE_CTE},
    shc AS (
        SELECT doc_id, shingle FROM sh
        WHERE shingle IN (
            SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 256
        )
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shc GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
        FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT doc_a, doc_b
        FROM common
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE common * 10 >= 3 * (sa.sz + sb.sz - common)
    )
"""


@register(
    "dedup_cluster_canonical",
    f"""
    WITH RECURSIVE {_NGRAM_PAIRS_CTE},
    sym AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION
        SELECT doc_b AS a, doc_a AS b FROM pairs
    ),
    walk AS (
        -- full reachability (recursive UNION de-dupes, so it terminates):
        -- the label-decreasing shortcut misses min ids reachable only
        -- through larger intermediate doc_ids (chain 1—100—2)
        SELECT a AS node, a AS component FROM sym
        UNION
        SELECT w.node, s.b AS component
        FROM walk w JOIN sym s ON s.a = w.component
    )
    SELECT node AS doc_id,
           CAST(MIN(component) AS BIGINT) AS canonical_id,
           node != MIN(component) AS is_duplicate
    FROM walk
    GROUP BY node
    ORDER BY doc_id
    """,
    survey_ops=("beyond:dedup-cluster",),
    description="the dedup pipeline's final stage: near-dup pairs "
    "(shingle Jaccard) → connected components → canonical doc per "
    "cluster (min doc_id = the min-label CC fixpoint); oracle chains the "
    "pair SQL into a recursive-CTE min-label walk",
)
def dedup_cluster_canonical_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ton_indexer_spark.operators import connected_components

    d = Catalog(spark, sf_dir).documents
    # materialize the (expensive) pair set once: the CC stage takes
    # multiple actions over its input (size gate + label resolution), and
    # an un-cached shingle-join plan would recompute per action
    pairs = (
        ngram_jaccard_pairs(d, threshold=0.3, k=3)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    cc = connected_components(pairs, src="doc_a", dst="doc_b")
    return cc.select(
        F.col("node").alias("doc_id"),
        F.col("component").cast("bigint").alias("canonical_id"),
        (F.col("node") != F.col("component")).alias("is_duplicate"),
    ).orderBy("doc_id")


_BLOOM_M = 2048
_BLOOM_K = 3
_FP_SQL = r"md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))"


def _bloom_oracle() -> str:
    pos = lambda i, key: (  # noqa: E731
        f"CAST(('0x' || substring(md5('{i}:' || {key}), 1, 8)) AS BIGINT) "
        f"% {_BLOOM_M}"
    )
    ref_pos = "\n        UNION\n        ".join(
        f"SELECT {pos(i, 'fp')} AS pos FROM ref" for i in range(_BLOOM_K)
    )
    cand_pos = "\n        UNION ALL\n        ".join(
        f"SELECT fp, {pos(i, 'fp')} AS pos FROM cand_keys"
        for i in range(_BLOOM_K)
    )
    return f"""
    WITH ref AS (
        SELECT DISTINCT {_FP_SQL} AS fp FROM documents WHERE source = 'src0'
    ),
    bloom AS (
        {ref_pos}
    ),
    cand AS (
        SELECT doc_id, {_FP_SQL} AS fp FROM documents WHERE source <> 'src0'
    ),
    cand_keys AS (SELECT DISTINCT fp FROM cand),
    cpos AS (
        {cand_pos}
    ),
    hits AS (
        SELECT fp, COUNT(*) AS n_set
        FROM cpos WHERE pos IN (SELECT pos FROM bloom)
        GROUP BY fp
    )
    SELECT c.doc_id,
           COALESCE(h.n_set, 0) = {_BLOOM_K} AS maybe_member,
           c.fp IN (SELECT fp FROM ref) AS exact_member
    FROM cand c LEFT JOIN hits h USING (fp)
    ORDER BY c.doc_id
    """


@register(
    "bloom_membership",
    _bloom_oracle(),
    survey_ops=("beyond:bloom",),
    description=f"Bloom-filter membership screen (m={_BLOOM_M} bits, "
    f"k={_BLOOM_K} md5 hashes) of candidate fingerprints against a "
    "reference corpus: the filter is the distinct set-bit position table "
    "— FIXED size regardless of reference cardinality (the 100 TB "
    "property the exact semi-join lacks), broadcast for a map-side "
    "probe; exact membership emitted alongside so false positives are "
    "observable",
)
def bloom_membership_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ton_indexer_spark.dedup.bloom import bloom_build, bloom_probe
    from ton_indexer_spark.functions.text import fingerprint

    d = Catalog(spark, sf_dir).documents
    ref = (
        d.filter(F.col("source") == "src0")
        .select(fingerprint(F.col("text")).alias("fp"))
    )
    cand = d.filter(F.col("source") != "src0").select(
        "doc_id", fingerprint(F.col("text")).alias("fp")
    )
    bloom = bloom_build(ref, "fp", m_bits=_BLOOM_M, k_hashes=_BLOOM_K)
    probed = bloom_probe(cand, bloom, "fp", m_bits=_BLOOM_M,
                         k_hashes=_BLOOM_K)
    exact = ref.select("fp").distinct()
    return (
        probed.join(exact.withColumn("_em", F.lit(True)), "fp", "left")
        .select(
            "doc_id",
            "maybe_member",
            F.coalesce(F.col("_em"), F.lit(False)).alias("exact_member"),
        )
        .orderBy("doc_id")
    )


_SPAN_K = 10  # tokens per span; spans repeated across >= 2 docs flag


@register(
    "repeated_spans",
    f"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
        FROM documents WHERE length(trim(text)) > 0
    ),
    grams AS (
        SELECT doc_id, pos, md5(g) AS gh
        FROM (
            SELECT doc_id,
                   unnest(CASE WHEN len(t) >= {_SPAN_K}
                               THEN list_transform(range(1, len(t) - {_SPAN_K - 2}),
                                        i -> {{'pos': i, 'g': {" || ' ' || ".join(f"t[i+{j}]" for j in range(10))}}})
                               ELSE [] END, recursive := true) AS u
            FROM toks
        )
    ),
    rep AS (
        SELECT gh FROM grams GROUP BY gh
        HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    hits AS (SELECT doc_id, pos, gh FROM grams WHERE gh IN (SELECT gh FROM rep))
    SELECT doc_id,
           COUNT(*) AS n_repeated_positions,
           COUNT(DISTINCT gh) AS n_repeated_grams,
           MIN(pos) AS first_pos
    FROM hits
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    survey_ops=("beyond:repeated-spans",),
    description=f"cross-document repeated-passage detection ({_SPAN_K}"
    "-token spans occurring in >= 2 docs — the passage-level dedup "
    "signal of 'Deduplicating Training Data Makes LMs Better'): "
    "positional gram explode hashed map-side, one df aggregation, "
    "semi-join back on the gram hash; per-doc summary keeps output "
    "bounded by corpus size, not span pairs",
)
def repeated_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ton_indexer_spark.operators.spread import spread_small

    d = Catalog(spark, sf_dir).documents
    toks = F.split(F.trim(F.col("text")), r"\s+")
    # the positional 10-gram explode (md5 over ~70-char spans, twice —
    # frequency branch + semi-join branch) is the dominant map cost:
    # spread a small single-split input across cores, identity at scale
    t = spread_small(d).select("doc_id", toks.alias("t")).filter(
        F.length(F.trim(F.col("text"))) > 0
    )
    k = _SPAN_K
    idx = F.when(
        F.size("t") >= k, F.sequence(F.lit(1), F.size("t") - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    gram = lambda i: F.md5(F.concat_ws(  # noqa: E731
        " ", *[F.element_at("t", (i + j).cast("int")) for j in range(k)]
    ))
    grams = t.select(
        "doc_id",
        F.explode(
            F.transform(idx, lambda i: F.struct(
                i.alias("pos"), gram(i).alias("gh")))
        ).alias("u"),
    ).select("doc_id", "u.pos", "u.gh")
    # document frequency via groupBy + semi-join: the explode runs once
    # per branch (2× map CPU), which is the RIGHT trade at scale — a
    # collect_set window over gh would be single-scan but holds one doc
    # set per gram in memory, and boilerplate grams shared by millions of
    # docs (the very thing this operator detects) make that unbounded
    rep = (
        grams.groupBy("gh")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= 2)
        .select("gh")
    )
    return (
        grams.join(rep, "gh", "left_semi")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_repeated_positions"),
            F.countDistinct("gh").alias("n_repeated_grams"),
            F.min("pos").alias("first_pos"),
        )
        .orderBy("doc_id")
    )


@register(
    "cross_source_overlap",
    f"""
    {_minhash_pairs_with()}
    SELECT LEAST(da.source, db.source) AS source_a,
           GREATEST(da.source, db.source) AS source_b,
           COUNT(*) AS n_pairs
    FROM mpairs
    JOIN documents da ON da.doc_id = mpairs.doc_a
    JOIN documents db ON db.doc_id = mpairs.doc_b
    GROUP BY 1, 2
    ORDER BY source_a, source_b
    """,
    survey_ops=("beyond:cross-source-overlap",),
    description="corpus provenance analytics: near-dup candidate pairs "
    "(MinHash-LSH) aggregated into a source x source overlap matrix — "
    "the 'which crawls duplicate which' report that drives mixture and "
    "dedup-order decisions; pair set is bucket-local, the matrix agg is "
    "|pairs|-sized, never |docs|^2",
)
def cross_source_overlap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the isolated gate derives its own pair set; a pipeline passes ONE
    # materialized pair table to source_overlap_matrix alongside its other
    # pair consumers (examples/llm_pipeline.py)
    from ton_indexer_spark.dedup import source_overlap_matrix

    d = Catalog(spark, sf_dir).documents
    return source_overlap_matrix(lsh_candidate_pairs(d), d)


# multi-line corpus view derived deterministically from the word-soup
# documents fixture (5-word groups joined by newlines) so the line-level
# operator has real cross-document repeats to remove; both engines derive
# it with identical arithmetic
_LINE_W = 5
_LINES_VIEW = f"""
    WITH w AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x != '') AS words
      FROM documents
    ),
    d AS (
      SELECT doc_id,
             array_to_string(
               list_transform(range(0, (len(words) + {_LINE_W - 1}) // {_LINE_W}),
                 i -> array_to_string(
                        words[(i*{_LINE_W}+1):((i+1)*{_LINE_W})], ' ')),
               chr(10)) AS text
      FROM w
    ),
    lines AS (
      SELECT doc_id, i AS pos, arr[i+1] AS line
      FROM (SELECT doc_id, string_split(text, chr(10)) AS arr FROM d),
           unnest(range(0, len(arr))) t(i)
    ),
    freq AS (
      SELECT md5(trim(line)) AS h
      FROM lines
      WHERE length(trim(line)) >= 10
      GROUP BY 1
      HAVING count(DISTINCT doc_id) >= 3
    ),
    kept AS (
      SELECT * FROM lines
      WHERE md5(trim(line)) NOT IN (SELECT h FROM freq)
    ),
    reb AS (
      SELECT doc_id,
             string_agg(line, chr(10) ORDER BY pos) AS clean_text,
             count(*) AS n_kept
      FROM kept GROUP BY doc_id
    ),
    tot AS (SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY doc_id)
"""


def _as_lines(docs: DataFrame) -> DataFrame:
    """documents with text rewritten as newline-joined 5-word lines."""
    words = F.filter(
        F.split(F.trim("text"), r"\s+"), lambda x: x != F.lit("")
    )
    n_groups = F.ceil(F.size(words) / F.lit(_LINE_W)).cast("int")
    lines_arr = F.transform(
        F.sequence(F.lit(0), n_groups - 1),
        lambda i: F.array_join(
            F.slice(words, i * _LINE_W + 1, _LINE_W), " "
        ),
    )
    return docs.select(
        "doc_id",
        F.when(F.size(words) > 0, F.array_join(lines_arr, "\n"))
        .otherwise(F.lit("")).alias("text"),
    )


@register(
    "line_dedup",
    f"""
    {_LINES_VIEW}
    SELECT t.doc_id,
           coalesce(r.clean_text, '') AS clean_text,
           t.n_lines,
           t.n_lines - coalesce(r.n_kept, 0) AS n_removed
    FROM tot t LEFT JOIN reb r USING (doc_id)
    ORDER BY t.doc_id
    """,
    survey_ops=("beyond:line-dedup",),
    description="C4/CCNet line-level boilerplate removal: lines occurring "
    "in >=3 distinct documents are dropped, order preserved; frequency "
    "table groups on the line digest (bounded shuffle width), removal is "
    "an anti-join against only the frequent digests",
)
def line_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ton_indexer_spark.dedup.lines import remove_repeated_lines

    docs = _as_lines(Catalog(spark, sf_dir).documents)
    return remove_repeated_lines(docs).orderBy("doc_id")
