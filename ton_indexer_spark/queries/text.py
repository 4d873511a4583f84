"""Text-analysis gate queries over `documents` (training-data pipeline ops)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ton_indexer_spark.catalog import Catalog
from ton_indexer_spark.functions.text import (
    LANG_MARKERS,
    fingerprint,
    lang_predict,
    lang_scores,
    quality_features,
    token_count,
    wordpiece_count,
)
from ton_indexer_spark.queries import register


def _marker_sql(markers: tuple[str, ...]) -> str:
    pattern = r"\b(" + "|".join(markers) + r")\b"
    return f"len(regexp_extract_all(lower(text), '{pattern}'))"


@register(
    "token_count",
    r"""
    SELECT doc_id,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]'))
               AS n_wordpieces
    FROM documents
    ORDER BY doc_id
    """,
    survey_ops=("beyond:tokenize",),
    description="whitespace + BPE-ish wordpiece token counting",
)
def token_count_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return d.select(
        "doc_id",
        token_count(F.col("text")).cast("bigint").alias("n_tokens"),
        wordpiece_count(F.col("text")).cast("bigint").alias("n_wordpieces"),
    ).orderBy("doc_id")


_EN = _marker_sql(LANG_MARKERS["en"])

@register(
    "text_quality",
    rf"""
    SELECT doc_id,
           length(text) AS n_chars,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
           CAST(len(regexp_extract_all(text, '[.!?,;:]')) AS DOUBLE)
             / greatest(length(text), 1) AS punct_ratio,
           CAST({_EN} AS DOUBLE)
             / greatest(CASE WHEN length(trim(text)) = 0 THEN 0
                             ELSE len(regexp_split_to_array(trim(text), '\s+')) END, 1)
             AS stopword_ratio,
           CAST(length(text) AS DOUBLE)
             / greatest(CASE WHEN length(trim(text)) = 0 THEN 0
                             ELSE len(regexp_split_to_array(trim(text), '\s+')) END, 1)
             AS mean_token_len
    FROM documents
    ORDER BY doc_id
    """,
    survey_ops=("beyond:quality",),
    description="document quality features: length, punct ratio, stopword "
    "ratio, mean token length",
)
def text_quality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    feats = quality_features(F.col("text"))
    return d.select(
        "doc_id",
        feats["n_chars"].alias("n_chars"),
        feats["n_tokens"].alias("n_tokens"),
        feats["punct_ratio"].alias("punct_ratio"),
        feats["stopword_ratio"].alias("stopword_ratio"),
        feats["mean_token_len"].alias("mean_token_len"),
    ).orderBy("doc_id")


def _langid_oracle() -> str:
    score = {lang: _marker_sql(m) for lang, m in LANG_MARKERS.items()}
    langs = sorted(score)  # alphabetical priority on ties (matches Spark impl)
    cases = []
    for i, lang in enumerate(langs):
        conds = [f"s.{lang} >= s.{other}" for other in langs[i + 1 :]]
        cond = " AND ".join(conds) if conds else "TRUE"
        cases.append(f"WHEN {cond} THEN '{lang}'")
    case_sql = " ".join(cases)
    greatest = ", ".join(f"s.{lang}" for lang in langs)
    scores_sql = ", ".join(f"{sql} AS {lang}" for lang, sql in score.items())
    return f"""
    WITH s AS (SELECT doc_id, lang AS lang_label, {scores_sql} FROM documents)
    SELECT doc_id, lang_label,
           CASE WHEN greatest({greatest}) <= 0 THEN 'und' {case_sql} END AS lang_pred
    FROM s
    ORDER BY doc_id
    """


@register(
    "lang_id",
    _langid_oracle(),
    survey_ops=("beyond:langid",),
    description="stopword-marker language-ID heuristic (argmax with "
    "alphabetical tiebreak)",
)
def lang_id_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ton_indexer_spark.operators.spread import spread_small

    # per-language marker scans over the text are the dominant map cost
    d = spread_small(Catalog(spark, sf_dir).documents)
    return d.select(
        "doc_id",
        F.col("lang").alias("lang_label"),
        lang_predict(F.col("text")).alias("lang_pred"),
    ).orderBy("doc_id")


@register(
    "doc_fingerprint",
    r"""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
    FROM documents
    ORDER BY doc_id
    """,
    survey_ops=("beyond:fingerprint", "F1"),
    description="content fingerprint over normalized text (md5 — portable "
    "across engines)",
)
def doc_fingerprint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return d.select("doc_id", fingerprint(F.col("text")).alias("fingerprint")).orderBy(
        "doc_id"
    )


# query terms for the TF-IDF ranking gate — fixed so the oracle is exact
TFIDF_TERMS = ("spark", "join", "window", "vector", "stream")


@register(
    "tfidf_topk",
    r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
      FROM documents
    ), q AS (
      SELECT * FROM toks
      WHERE term IN ('spark', 'join', 'window', 'vector', 'stream')
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM q GROUP BY 1, 2
    ), df AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM q GROUP BY 1
    ), n AS (SELECT COUNT(*) AS n FROM documents)
    SELECT tf.doc_id,
           CAST(SUM(tf.tf * (((n.n + 1) * 1000000) // (df.df + 1)))
                AS BIGINT) AS score_scaled
    FROM tf JOIN df USING (term) CROSS JOIN n
    GROUP BY tf.doc_id
    ORDER BY score_scaled DESC, doc_id
    LIMIT 20
    """,
    survey_ops=("beyond:tfidf",),
    description="TF-IDF document ranking for a fixed query-term set; "
    "integer-scaled rational idf ((N+1)*1e6 div (df+1)) keeps the score "
    "exact and order-independent cross-engine (the classic float "
    "log-idf sum is not associativity-safe); plan: tokenize-explode -> "
    "per-(doc,term) counts -> term df join (broadcast: |terms| rows) -> "
    "top-k",
)
def tfidf_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
            "term"),
    ).filter(F.col("term").isin(*TFIDF_TERMS))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = toks.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n"))
    return (
        tf.join(dfreq, "term")
        .crossJoin(n)  # 1 row — AQE broadcasts
        .withColumn("idf_scaled", F.expr("((n + 1) * 1000000) DIV (df + 1)"))
        .groupBy("doc_id")
        .agg(F.sum(F.col("tf") * F.col("idf_scaled")).alias("score_scaled"))
        .orderBy(F.desc("score_scaled"), "doc_id")
        .limit(20)
    )


CHUNK_SIZE = 32
CHUNK_STRIDE = 24  # 8-token overlap between consecutive chunks


@register(
    "doc_chunks",
    rf"""
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ), t2 AS (
      SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0
    )
    SELECT t2.doc_id,
           CAST(off // {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
           CAST(off AS BIGINT) AS chunk_start,
           CAST(len(list_slice(toks, off + 1, off + {CHUNK_SIZE}))
                AS BIGINT) AS chunk_len,
           array_to_string(list_slice(toks, off + 1, off + {CHUNK_SIZE}),
                           ' ') AS chunk_text
    FROM t2, unnest(range(0, n, {CHUNK_STRIDE})) AS u(off)
    ORDER BY doc_id, chunk_idx
    """,
    survey_ops=("beyond:chunking",),
    description="overlapping fixed-size token windows (training-sample "
    "chunking): sequence+explode over per-doc offsets, array slice per "
    "chunk — no shuffle beyond the final presentation sort",
)
def doc_chunks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    toks = F.filter(
        F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != F.lit(""))
    t = (
        d.select("doc_id", toks.alias("toks"))
        .withColumn("n", F.size("toks"))
        .filter(F.col("n") > 0)
    )
    offs = t.select(
        "doc_id", "toks",
        F.explode(
            F.sequence(F.lit(0), F.col("n") - 1, F.lit(CHUNK_STRIDE))
        ).alias("off"),
    )
    chunk = F.slice(F.col("toks"), F.col("off") + 1, CHUNK_SIZE)
    return offs.select(
        "doc_id",
        (F.col("off") / CHUNK_STRIDE).cast("bigint").alias("chunk_idx"),
        F.col("off").cast("bigint").alias("chunk_start"),
        F.size(chunk).cast("bigint").alias("chunk_len"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    ).orderBy("doc_id", "chunk_idx")


@register(
    "text_repetition",
    r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents
        WHERE length(trim(text)) > 0
    ),
    tri AS (
        SELECT doc_id,
               unnest(CASE WHEN len(t) >= 3
                           THEN list_transform(range(1, len(t) - 1),
                                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                           ELSE [] END) AS g
        FROM toks
    )
    SELECT doc_id,
           COUNT(*) AS n_trigrams,
           COUNT(DISTINCT g) AS n_distinct,
           1.0 - CAST(COUNT(DISTINCT g) AS DOUBLE) / COUNT(*) AS rep_ratio
    FROM tri
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    survey_ops=("beyond:quality",),
    description="trigram repetition ratio (1 - distinct/total) — the "
    "boilerplate/spam signal used by pretraining quality filters; exact "
    "integer counts divided in double",
)
def text_repetition_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    toks = F.filter(
        F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != F.lit(""))
    t = (
        d.select("doc_id", toks.alias("t"))
        .filter(F.size("t") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 2),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at("t", i),
                        F.element_at("t", i + 1),
                        F.element_at("t", i + 2),
                    ),
                )
            ).alias("g"),
        )
    )
    return (
        t.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.countDistinct("g").alias("n_distinct"),
        )
        .withColumn(
            "rep_ratio",
            F.lit(1.0) - F.col("n_distinct").cast("double") / F.col("n_trigrams"),
        )
        .orderBy("doc_id")
    )


def _pii_oracle() -> str:
    from ton_indexer_spark.functions.pii import PII_PATTERNS

    counts = ",\n           ".join(
        f"len(regexp_extract_all(text, '{pat}')) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    redacted = "text"
    for _, pat, token in PII_PATTERNS:
        redacted = f"regexp_replace({redacted}, '{pat}', '{token}', 'g')"
    return f"""
    SELECT doc_id,
           {counts},
           md5({redacted}) AS redacted_fp
    FROM documents
    ORDER BY doc_id
    """


@register(
    "pii_detect",
    _pii_oracle(),
    survey_ops=("beyond:pii",),
    description="PII detection + redaction (email/IPv4/phone regex "
    "classes, BigCode-style scrub): regexp_count + ordered "
    "regexp_replace, all JVM-side codegen column expressions; patterns "
    "restricted to the Java-regex ∩ RE2 portable subset",
)
def pii_detect_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ton_indexer_spark.functions.pii import pii_counts, redact_pii

    d = Catalog(spark, sf_dir).documents
    counts = pii_counts(F.col("text"))
    return d.select(
        "doc_id",
        *[c.cast("bigint").alias(f"n_{name}") for name, c in counts.items()],
        F.md5(redact_pii(F.col("text"))).alias("redacted_fp"),
    ).orderBy("doc_id")


def _charlm_oracle() -> str:
    from ton_indexer_spark.functions.charlm import ALPHABET, SCALE

    n = len(ALPHABET)
    cnt = lambda src, i: (  # noqa: E731
        f"length({src}) - length(replace({src}, '{ALPHABET[i]}', ''))"
    )
    ref_counts = ",\n               ".join(
        f"SUM({cnt('lt', i)}) AS c{i}" for i in range(n)
    )
    total = " + ".join(f"c{i}" for i in range(n)) + f" + {n}"
    model_cols = ",\n               ".join(
        f"CAST(FLOOR(-ln((c{i} + 1) * 1.0 / ({total})) * {SCALE} + 0.5) "
        f"AS BIGINT) AS q{i}"
        for i in range(n)
    )
    doc_counts = ",\n               ".join(
        f"{cnt('lt', i)} AS k{i}" for i in range(n)
    )
    n_scored = " + ".join(f"k{i}" for i in range(n))
    nll = " + ".join(f"k{i} * q{i}" for i in range(n))
    return f"""
    WITH ref AS (SELECT lower(text) AS lt FROM documents WHERE lang = 'en'),
    cnt AS (
        SELECT {ref_counts}
        FROM ref
    ),
    model AS (
        SELECT {model_cols}
        FROM cnt
    ),
    d AS (SELECT doc_id, lower(text) AS lt FROM documents),
    k AS (
        SELECT doc_id,
               {doc_counts}
        FROM d
    )
    SELECT k.doc_id,
           CAST({n_scored} AS BIGINT) AS n_scored,
           CAST({nll} AS BIGINT) AS nll_sum_scaled,
           CASE WHEN {n_scored} > 0
                THEN CAST({nll} AS DOUBLE) / ({n_scored}) END AS nll_per_char
    FROM k CROSS JOIN model
    ORDER BY doc_id
    """


@register(
    "char_lm_quality",
    _charlm_oracle(),
    survey_ops=("beyond:charlm",),
    description="perplexity-proxy quality scoring (CCNet/KenLM pattern, "
    "char-unigram form): model = ONE aggregation over the reference "
    "corpus (alphabet-sized, collected; any table-lookup LM drops into "
    "the same seam), scoring = map-side replace-count column algebra "
    "with integer-quantized log-probs — exact int64 sums, no explode, "
    "no shuffle",
)
def char_lm_quality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ton_indexer_spark.functions.charlm import char_lm_score, train_char_lm

    d = Catalog(spark, sf_dir).documents
    model = train_char_lm(d.filter(F.col("lang") == "en"))
    return char_lm_score(d, model).orderBy("doc_id")


@register(
    "word_lm_score",
    """
    WITH words AS (
        SELECT doc_id,
               list_filter(string_split(regexp_replace(lower(text),
                                                       '[^a-z0-9]+', ' ', 'g'),
                           ' '), x -> x != '') AS w
        FROM documents
    ),
    bi AS (
        SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
        FROM words, unnest(range(1, len(w))) AS u(i)
        WHERE len(w) >= 2
    ),
    big AS (SELECT w1, w2, COUNT(*) AS c12 FROM bi GROUP BY 1, 2),
    uni AS (SELECT w1, SUM(c12) AS c1 FROM big GROUP BY 1),
    vocab AS (
        SELECT COUNT(DISTINCT t) AS v
        FROM words, unnest(w) AS u(t)
    ),
    model AS (
        SELECT b.w1, b.w2,
               CAST(ROUND(-LN((b.c12 + 1.0) / (u.c1 + v.v)) * 1000000, 0)
                    AS BIGINT) AS q
        FROM big b JOIN uni u USING (w1) CROSS JOIN vocab v
    ),
    occ AS (
        SELECT doc_id, w1, w2, COUNT(*) AS n FROM bi GROUP BY 1, 2, 3
    )
    SELECT o.doc_id,
           CAST(SUM(o.n) AS BIGINT) AS n_bigrams,
           CAST(SUM(o.n * m.q) AS BIGINT) AS nll_sum_scaled,
           ROUND(SUM(o.n * m.q) * 1.0 / SUM(o.n) / 1000000, 6)
               AS nll_per_bigram
    FROM occ o JOIN model m USING (w1, w2)
    GROUP BY o.doc_id
    ORDER BY o.doc_id
    """,
    survey_ops=("beyond:wordlm",),
    description="word-bigram LM perplexity scoring (the KenLM-style "
    "distributed-model regime complementing char_lm_quality's broadcast "
    "model): bigram/marginal counts stay DataFrames — vocabulary-sized, "
    "never collected (only |V| is a scalar) — and scoring is a shuffle "
    "join on the bigram key over per-doc TYPE counts with exact "
    "micro-nat int64 sums",
)
def word_lm_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ton_indexer_spark.functions.wordlm import (
        doc_bigrams,
        train_word_bigram_lm,
        word_lm_score,
    )

    d = Catalog(spark, sf_dir).documents
    # one tokenize+explode pass feeds both train and score (the
    # localCheckpoint pattern the cluster-canonicalization gate uses
    # for a multi-consumer intermediate)
    bi = doc_bigrams(d).localCheckpoint(eager=False)
    lm, _ = train_word_bigram_lm(d, bigrams=bi)
    return word_lm_score(d, lm, bigrams=bi).orderBy("doc_id")


@register(
    "common_ngrams",
    r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents WHERE length(trim(text)) > 0
    ),
    tri AS (
        SELECT DISTINCT doc_id, g
        FROM (
            SELECT doc_id,
                   unnest(CASE WHEN len(t) >= 3
                               THEN list_transform(range(1, len(t) - 1),
                                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                               ELSE [] END) AS g
            FROM toks
        )
    )
    SELECT g AS ngram, COUNT(*) AS df
    FROM tri
    GROUP BY g
    HAVING COUNT(*) >= 3
    ORDER BY df DESC, ngram
    LIMIT 50
    """,
    survey_ops=("beyond:boilerplate",),
    description="boilerplate n-gram mining: top-50 trigram shingles by "
    "document frequency (df >= 3) — the blocklist builder behind "
    "boilerplate/template removal; shingle-explode + partial-agg "
    "count, one shuffle, TakeOrdered top-k",
)
def common_ngrams_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ton_indexer_spark.dedup.shingles import shingles

    d = Catalog(spark, sf_dir).documents
    return (
        shingles(d, k=3)
        .groupBy(F.col("shingle").alias("ngram"))
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= 3)
        .orderBy(F.desc("df"), "ngram")
        .limit(50)
    )


@register(
    "bpe_pair_counts",
    r"""
    WITH toks AS (
        SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS word
        FROM documents WHERE length(trim(text)) > 0
    ),
    wf AS (
        SELECT word, COUNT(*) AS freq FROM toks
        WHERE length(word) > 0 GROUP BY word
    ),
    pairs AS (
        SELECT unnest(list_transform(range(1, length(word)),
                   i -> substr(word, i, 1) || ' ' || substr(word, i+1, 1)))
                   AS pair,
               freq
        FROM wf WHERE length(word) >= 2
    )
    SELECT pair, CAST(SUM(freq) AS BIGINT) AS pair_count
    FROM pairs
    GROUP BY pair
    ORDER BY pair_count DESC, pair
    LIMIT 50
    """,
    survey_ops=("beyond:bpe",),
    description="distributed BPE merge-candidate counting (tokenizer "
    "training, Sennrich 2016 alg.1): corpus-sized pass is ONE word-"
    "frequency groupBy; pair explode + count run over the distinct "
    "VOCABULARY (Zipf-small), so later merge iterations never rescan "
    "the corpus; top-50 candidates via TakeOrdered",
)
def bpe_pair_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ton_indexer_spark.functions.bpe import bpe_pair_counts

    d = Catalog(spark, sf_dir).documents
    return bpe_pair_counts(d, top_k=50)


def _bpe_encode_oracle(n_merges: int = 8) -> str:
    """Full DuckDB replay of bpe_train + bpe_encode.

    Words are rendered as delimiter-framed symbol strings
    (``\\x01sym\\x02`` per symbol, collision-free because the corpus
    carries no control chars), so applying a merge is a plain
    ``replace`` — DuckDB's left-to-right non-overlapping scan IS the
    classic greedy merge.  Training is ``n_merges`` chained MATERIALIZED
    CTEs (pair-count → argmax with the count-desc/pair-asc tiebreak →
    vocabulary rewrite, exactly ``functions/bpe.py::bpe_train``);
    encoding is a recursive CTE that repeatedly applies the
    lowest-ranked merge present in each distinct word (the rank-greedy
    loop of ``bpe_encode``) — each step shortens the string, so the
    final state is the min-length row per word.
    """
    d1, d2 = "chr(1)", "chr(2)"
    iters = []
    for i in range(1, n_merges + 1):
        prev = f"v{i-1}"
        iters.append(f"""
    p{i} AS MATERIALIZED (
        SELECT s[i] || ' ' || s[i+1] AS pair, freq
        FROM (SELECT regexp_extract_all(w, {d1}||'(.*?)'||{d2}, 1) AS s,
                     freq FROM {prev}),
             unnest(range(1, len(s))) AS t(i)
        WHERE len(s) >= 2
    ),
    m{i} AS MATERIALIZED (
        SELECT split_part(pair, ' ', 1) AS a, split_part(pair, ' ', 2) AS b,
               {i} AS rank
        FROM p{i} GROUP BY pair ORDER BY SUM(freq) DESC, pair LIMIT 1
    ),
    v{i} AS MATERIALIZED (
        SELECT replace(w,
            (SELECT {d1}||a||{d2}||{d1}||b||{d2} FROM m{i}),
            (SELECT {d1}||a||b||{d2} FROM m{i})) AS w, freq
        FROM {prev}
    )""")
    merge_rows = " UNION ALL ".join(
        f"SELECT rank, {d1}||a||{d2}||{d1}||b||{d2} AS pat, "
        f"{d1}||a||b||{d2} AS rep FROM m{i}"
        for i in range(1, n_merges + 1)
    )
    return f"""
    WITH RECURSIVE toks AS MATERIALIZED (
        SELECT doc_id, word FROM (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
            FROM documents WHERE length(trim(text)) > 0
        ) WHERE length(word) > 0
    ),
    wf AS MATERIALIZED (
        SELECT word, COUNT(*) AS freq FROM toks GROUP BY word
    ),
    v0 AS MATERIALIZED (
        SELECT regexp_replace(word, '(.)', {d1}||'\\1'||{d2}, 'g') AS w,
               freq
        FROM wf
    ),{",".join(iters)},
    merges AS MATERIALIZED ({merge_rows}),
    rec AS (
        SELECT word AS orig,
               regexp_replace(word, '(.)', {d1}||'\\1'||{d2}, 'g') AS w
        FROM (SELECT DISTINCT word FROM toks)
        UNION ALL
        SELECT r.orig,
               replace(r.w, arg_min(m.pat, m.rank),
                       arg_min(m.rep, m.rank)) AS w
        FROM rec r JOIN merges m ON position(m.pat IN r.w) > 0
        GROUP BY r.orig, r.w
    ),
    encoded AS (
        SELECT orig, arg_min(w, length(w)) AS w FROM rec GROUP BY orig
    ),
    word_tok AS (
        SELECT orig, length(w) - length(replace(w, {d2}, '')) AS n_sym
        FROM encoded
    )
    SELECT d.doc_id,
           CAST(COALESCE(SUM(wt.n_sym), 0) AS BIGINT) AS n_bpe_tokens
    FROM documents d
    LEFT JOIN toks t ON t.doc_id = d.doc_id
    LEFT JOIN word_tok wt ON wt.orig = t.word
    GROUP BY d.doc_id
    ORDER BY d.doc_id
    """


@register(
    "bpe_encode_sample",
    _bpe_encode_oracle(),
    survey_ops=("beyond:bpe-train",),
    description="end-to-end BPE tokenizer demo: learn 8 merges over the "
    "corpus (vocabulary-sized iterations after ONE corpus pass), then "
    "encode map-only with the broadcast merge table; returns per-doc "
    "BPE token counts",
)
def bpe_encode_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ton_indexer_spark.functions.bpe import bpe_encode, bpe_train

    d = Catalog(spark, sf_dir).documents
    merges = bpe_train(d, n_merges=8)
    return (
        bpe_encode(d, merges)
        .select(
            "doc_id",
            F.size("bpe_tokens").cast("bigint").alias("n_bpe_tokens"),
        )
        .orderBy("doc_id")
    )


@register(
    "quality_score_hashed",
    """
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)),
                                               '[^a-z0-9]+'),
                         x -> x != '') AS toks
      FROM documents
    ),
    s AS (
      SELECT doc_id, len(toks) AS n_tokens,
             CAST(coalesce(list_sum(list_transform(toks, tok ->
               ((('0x' || substr(md5(tok), 1, 8))::BIGINT % 1024)
                 * 2654435761) % 2048 - 1024)), 0) AS BIGINT) AS raw_weight
      FROM t
    )
    SELECT doc_id, n_tokens, raw_weight,
           CASE WHEN n_tokens > 0
                THEN CAST(raw_weight AS DOUBLE) / (n_tokens * 1024.0)
                ELSE 0.0 END AS score
    FROM s
    ORDER BY doc_id
    """,
    survey_ops=("beyond:quality-classifier",),
    description="fastText-style hashed linear quality scoring, map-only: "
    "feature-hash tokens via the portable md5 prefix, sum integer weights "
    "inside F.aggregate over the token array (zero shuffles, zero "
    "explodes), one exact-int division at the end; a trained weight "
    "vector drops in as a map literal without changing the plan",
)
def quality_score_hashed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ton_indexer_spark.functions.quality_model import (
        hashed_linear_raw,
        hashed_linear_score,
        tokens_lower,
    )

    from ton_indexer_spark.operators.spread import spread_small

    docs = Catalog(spark, sf_dir).documents
    t = F.col("text")
    # bind n_tokens and the hashed aggregate ONCE: the inline form
    # evaluated tokens_lower 3× and the per-token md5 aggregate 2× per
    # row (multi-use non-cheap aliases stay bound through CollapseProject)
    scored = spread_small(docs).select(
        "doc_id",
        F.size(tokens_lower(t)).alias("n_tokens"),
        hashed_linear_raw(t).alias("raw_weight"),
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        "raw_weight",
        (
            F.when(
                F.col("n_tokens") > 0,
                F.col("raw_weight")
                / (F.col("n_tokens").cast("double") * 1024.0),
            ).otherwise(F.lit(0.0))
        ).alias("score"),
    ).orderBy("doc_id")


def _bpe_train_oracle(n_merges: int = 10) -> str:
    """DuckDB replay of JUST the trainer, emitting the ordered merge
    sequence — the same p/m/v iteration template as
    ``_bpe_encode_oracle`` (kept verbatim so the two oracles stay
    bit-compatible), finishing with the merge rows instead of encoding."""
    d1, d2 = "chr(1)", "chr(2)"
    iters = []
    for i in range(1, n_merges + 1):
        prev = f"v{i-1}"
        iters.append(f"""
    p{i} AS MATERIALIZED (
        SELECT s[i] || ' ' || s[i+1] AS pair, freq
        FROM (SELECT regexp_extract_all(w, {d1}||'(.*?)'||{d2}, 1) AS s,
                     freq FROM {prev}),
             unnest(range(1, len(s))) AS t(i)
        WHERE len(s) >= 2
    ),
    m{i} AS MATERIALIZED (
        SELECT split_part(pair, ' ', 1) AS a, split_part(pair, ' ', 2) AS b,
               {i} AS rank
        FROM p{i} GROUP BY pair ORDER BY SUM(freq) DESC, pair LIMIT 1
    ),
    v{i} AS MATERIALIZED (
        SELECT replace(w,
            (SELECT {d1}||a||{d2}||{d1}||b||{d2} FROM m{i}),
            (SELECT {d1}||a||b||{d2} FROM m{i})) AS w, freq
        FROM {prev}
    )""")
    merge_rows = " UNION ALL ".join(
        f"SELECT rank, a AS left_sym, b AS right_sym FROM m{i}"
        for i in range(1, n_merges + 1)
    )
    return f"""
    WITH toks AS MATERIALIZED (
        SELECT doc_id, word FROM (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
            FROM documents WHERE length(trim(text)) > 0
        ) WHERE length(word) > 0
    ),
    wf AS MATERIALIZED (
        SELECT word, COUNT(*) AS freq FROM toks GROUP BY word
    ),
    v0 AS MATERIALIZED (
        SELECT regexp_replace(word, '(.)', {d1}||'\\1'||{d2}, 'g') AS w,
               freq
        FROM wf
    ),{",".join(iters)}
    SELECT CAST(rank AS INTEGER) AS rank, left_sym, right_sym
    FROM ({merge_rows})
    ORDER BY rank
    """


@register(
    "bpe_train",
    _bpe_train_oracle(),
    survey_ops=("beyond:bpe-train",),
    description="the BPE TRAINER itself as a gate: the ordered 10-merge "
    "sequence learned over the corpus (count-desc / pair-lexicographic "
    "tiebreak) — deterministic, so the merge list IS the oracle output "
    "(Sennrich 2016 alg.1; one corpus pass then vocabulary-sized rounds)",
)
def bpe_train_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ton_indexer_spark.functions.bpe import bpe_train

    d = Catalog(spark, sf_dir).documents
    merges = bpe_train(d, n_merges=10)
    return spark.createDataFrame(
        [(i + 1, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, left_sym string, right_sym string",
    ).orderBy("rank")


_NB_SQL_COMMON = """
    t AS (
      SELECT doc_id, (lang = 'en') AS y,
             list_filter(regexp_split_to_array(lower(trim(text)),
                                               '[^a-z0-9]+'),
                         x -> x != '') AS toks
      FROM documents
    ),
    e AS (
      SELECT doc_id, y,
             ('0x' || substr(md5(tok), 1, 8))::BIGINT % 1024 AS bucket
      FROM (SELECT doc_id, y, unnest(toks) AS tok FROM t)
    ),
    c AS (
      SELECT bucket,
             CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS pos_cnt,
             CAST(SUM(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS neg_cnt
      FROM e GROUP BY 1
    ),
    tot AS (
      SELECT SUM(pos_cnt) AS pos_tot, SUM(neg_cnt) AS neg_tot FROM c
    ),
    w AS (
      SELECT bucket, pos_cnt, neg_cnt,
             CAST(FLOOR((ln(pos_cnt + 1.0) - ln(pos_tot + 1024.0)
                       - ln(neg_cnt + 1.0) + ln(neg_tot + 1024.0))
                        * 1000000 + 0.5) AS BIGINT) AS w_q
      FROM c, tot
    )"""


@register(
    "quality_nb_train",
    f"""
    WITH {_NB_SQL_COMMON}
    SELECT bucket, pos_cnt, neg_cnt, w_q FROM w ORDER BY bucket
    """,
    survey_ops=("beyond:quality-nb-train",),
    description="Naive-Bayes quality-classifier TRAINER over hashed token "
    "features (the CCNet/GPT-3-era quality-filter shape): one "
    "tokenize-explode-groupBy whose key cardinality is n_buckets=1024, so "
    "map-side partial agg collapses the shuffle to <=1024 rows per task "
    "at any corpus size; weights are integer-quantized micro-log-odds "
    "(Laplace-smoothed), exact across engines",
)
def quality_nb_train_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ton_indexer_spark.functions.quality_nb import nb_train

    d = Catalog(spark, sf_dir).documents
    return nb_train(d, F.col("lang") == F.lit("en")).orderBy("bucket")


@register(
    "quality_nb_score",
    f"""
    WITH {_NB_SQL_COMMON},
    pr AS (
      SELECT CAST(FLOOR((ln(SUM(CASE WHEN y THEN 1 ELSE 0 END) + 1.0)
                       - ln(SUM(CASE WHEN y THEN 0 ELSE 1 END) + 1.0))
                        * 1000000 + 0.5) AS BIGINT) AS prior_q
      FROM t
    ),
    s AS (
      SELECT e.doc_id, SUM(w.w_q) AS tok_sum
      FROM e JOIN w USING (bucket) GROUP BY 1
    )
    SELECT t.doc_id, len(t.toks) AS n_tokens,
           CAST(coalesce(s.tok_sum, 0)
                + (SELECT prior_q FROM pr) AS BIGINT) AS score_q,
           (coalesce(s.tok_sum, 0) + (SELECT prior_q FROM pr)) > 0
             AS pred_pos
    FROM t LEFT JOIN s USING (doc_id)
    ORDER BY doc_id
    """,
    survey_ops=("beyond:quality-nb-score",),
    description="end-to-end trained-model scoring: the NB trainer's "
    "<=1024-row weight table collects to a map literal (a bounded, "
    "model-sized collect) and scoring becomes the same map-only "
    "zero-shuffle F.aggregate projection as quality_score_hashed — "
    "integer score sums, exact across engines",
)
def quality_nb_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ton_indexer_spark.functions.quality_nb import nb_model, nb_score
    from ton_indexer_spark.functions.quality_model import tokens_lower

    d = Catalog(spark, sf_dir).documents
    label = F.col("lang") == F.lit("en")
    # fused model build: ONE corpus job for bucket counts + doc priors
    # (was: train collect + totals broadcast + two prior jobs ≈ 9 jobs)
    wmap, prior = nb_model(d, label)
    t = F.col("text")
    score = nb_score(t, wmap, prior)
    return d.select(
        "doc_id",
        F.size(tokens_lower(t)).alias("n_tokens"),
        score.alias("score_q"),
        (score > 0).alias("pred_pos"),
    ).orderBy("doc_id")


@register(
    "quality_nb_auc",
    f"""
    WITH {_NB_SQL_COMMON},
    pr AS (
      SELECT CAST(FLOOR((ln(SUM(CASE WHEN y THEN 1 ELSE 0 END) + 1.0)
                       - ln(SUM(CASE WHEN y THEN 0 ELSE 1 END) + 1.0))
                        * 1000000 + 0.5) AS BIGINT) AS prior_q
      FROM t
    ),
    sc AS (
      SELECT t.doc_id, t.y,
             coalesce(s.tok_sum, 0) + (SELECT prior_q FROM pr) AS score_q
      FROM t LEFT JOIN (
        SELECT e.doc_id, SUM(w.w_q) AS tok_sum
        FROM e JOIN w USING (bucket) GROUP BY 1
      ) s USING (doc_id)
    ),
    ag AS (
      SELECT score_q,
             SUM(CASE WHEN y THEN 1 ELSE 0 END) AS pos,
             SUM(CASE WHEN y THEN 0 ELSE 1 END) AS neg
      FROM sc GROUP BY 1
    ),
    ac AS (
      SELECT score_q, pos, neg,
             SUM(neg) OVER (ORDER BY score_q) AS cum_neg
      FROM ag
    )
    SELECT CAST(SUM(pos) AS BIGINT) AS npos,
           CAST(SUM(neg) AS BIGINT) AS nneg,
           CAST(SUM(pos * (2 * (cum_neg - neg) + neg)) AS BIGINT) AS u2,
           CAST(SUM(pos * (2 * (cum_neg - neg) + neg)) AS DOUBLE)
             / (2.0 * SUM(pos) * SUM(neg)) AS auc,
           CAST(SUM(CASE WHEN score_q > 0 THEN pos ELSE 0 END) AS BIGINT)
             AS tp,
           CAST(SUM(CASE WHEN score_q > 0 THEN neg ELSE 0 END) AS BIGINT)
             AS fp,
           CAST(SUM(CASE WHEN score_q <= 0 THEN neg ELSE 0 END) AS BIGINT)
             AS tn,
           CAST(SUM(CASE WHEN score_q <= 0 THEN pos ELSE 0 END) AS BIGINT)
             AS fn
    FROM ac
    """,
    survey_ops=("beyond:quality-auc",),
    description="exact distributed AUC (Mann-Whitney U) + confusion "
    "counts for the trained NB quality classifier, evaluated in-sample "
    "on the corpus labels: the corpus collapses to one row per DISTINCT "
    "integer score, the cumulative term comes from the two-phase "
    "distributed prefix sum (no single-partition window at any scale), "
    "and U is doubled so tie handling stays exact int64",
)
def quality_nb_auc_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ton_indexer_spark.functions.quality_nb import nb_model, nb_score
    from ton_indexer_spark.operators.evaluation import binary_auc

    d = Catalog(spark, sf_dir).documents
    label = F.col("lang") == F.lit("en")
    # fused model build: ONE corpus job for bucket counts + doc priors
    wmap, prior = nb_model(d, label)
    scored = d.select(
        nb_score(F.col("text"), wmap, prior).alias("score_q"),
        label.alias("y"),
    )
    return binary_auc(scored, F.col("score_q"), F.col("y"), threshold=0)


def _wordpiece_oracle(rounds: int = 10, min_freq: int = 4,
                      max_len: int = 6) -> str:
    """DuckDB replay of greedy longest-match segmentation, rounds
    unrolled as materialized CTEs (the bpe-oracle template; corpus max
    word length is 8, so 10 rounds always finish).  max_by's tie set at
    one cursor is a single distinct string (substr at fixed length is
    unique), so the argmax is deterministic."""
    adv = []
    for i in range(1, rounds + 1):
        adv.append(f"""
    s{i} AS MATERIALIZED (
        SELECT word, pos, toks FROM s{i - 1} WHERE pos > len(word)
        UNION ALL
        SELECT word, pos + len(t) AS pos, list_append(toks, t) AS toks
        FROM (
            SELECT s.word AS word, s.pos AS pos, s.toks AS toks,
                   max_by(v.token, len(v.token)) AS t
            FROM s{i - 1} s JOIN vocab v
              ON v.token = substr(s.word, s.pos, len(v.token))
            WHERE s.pos <= len(s.word)
            GROUP BY 1, 2, 3
        )
    )""")
    return f"""
    WITH wf AS (
        SELECT word, COUNT(*) AS freq FROM (
            SELECT unnest(list_filter(
                regexp_split_to_array(trim(text), '\\s+'),
                x -> x != '')) AS word
            FROM documents) GROUP BY 1
    ),
    subs AS (
        SELECT substr(word, s, l) AS token, freq
        FROM wf,
             unnest(range(1, len(word) + 1)) AS t1(s),
             unnest(range(1, least({max_len}, len(word) - s + 1) + 1))
               AS t2(l)
    ),
    vocab AS (
        SELECT token FROM (
            SELECT token, SUM(freq) AS tf FROM subs GROUP BY 1)
        WHERE len(token) = 1 OR tf >= {min_freq}
    ),
    s0 AS (SELECT word, 1 AS pos, CAST([] AS VARCHAR[]) AS toks FROM wf),
    {",".join(adv)}
    SELECT word, CAST(len(toks) AS INT) AS n_tokens,
           array_to_string(toks, ' ') AS segmented
    FROM s{rounds}
    ORDER BY word
    """


@register(
    "wordpiece_segment",
    _wordpiece_oracle(),
    survey_ops=("beyond:wordpiece-segment",),
    description="WordPiece/SentencePiece-style greedy longest-match "
    "segmentation over a corpus-derived substring vocabulary — the "
    "tokenizer-inference twin of the BPE trainer: segmentation runs "
    "over the distinct-word VOCABULARY (Zipf-small), each round one "
    "broadcast-vocab expression join + shrinking-frontier argmax, "
    "rounds bounded by the longest word; single-char coverage "
    "guarantees termination",
)
def wordpiece_segment_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ton_indexer_spark.functions.bpe import word_frequencies
    from ton_indexer_spark.functions.wordpiece import (
        wordpiece_segment,
        wordpiece_vocab,
    )

    d = Catalog(spark, sf_dir).documents
    # materialize the word-frequency table once: it feeds BOTH the vocab
    # derivation (broadcast side) and the segmentation probe side, and
    # without the checkpoint the corpus tokenize+groupBy runs twice
    wf = word_frequencies(d).localCheckpoint(eager=True)
    vocab = wordpiece_vocab(wf, min_freq=4)
    return wordpiece_segment(wf.select("word"), vocab).orderBy("word")
