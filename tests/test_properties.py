"""Property-based operator tests (hypothesis) — beyond the reference's test
strategy (SURVEY.md §5 notes it has none): determinism and algebraic
invariants that must hold for ANY input, not just fixtures.

Data strategy note: one shared Spark session + small generated frames keep
each example cheap; deadlines are disabled because JVM latency is noisy.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),     # key
        st.integers(min_value=0, max_value=1000),  # version
        st.integers(min_value=0, max_value=10**6), # payload
    ),
    min_size=1,
    max_size=40,
)


@given(ROWS)
@settings(**SETTINGS)
def test_latest_by_idempotent_and_single_winner(spark, rows):
    from ton_indexer_spark.operators import latest_by

    df = spark.createDataFrame(rows, "k int, v int, payload int")
    once = latest_by(df, ["k"], "v", tiebreakers=["payload"])
    got = {r["k"]: (r["v"], r["payload"]) for r in once.collect()}
    # one row per key, and it is the max (version, payload) pair
    assert len(got) == len({k for k, _, _ in rows})
    for k in got:
        assert got[k] == max((v, p) for kk, v, p in rows if kk == k)
    # idempotence: applying again changes nothing
    twice = latest_by(once, ["k"], "v", tiebreakers=["payload"])
    assert sorted(map(tuple, twice.collect())) == sorted(map(tuple, once.collect()))


@given(ROWS)
@settings(**SETTINGS)
def test_paginate_is_deterministic_partition_of_input(spark, rows):
    from ton_indexer_spark.operators import paginate

    df = spark.createDataFrame(rows, "k int, v int, payload int").distinct()
    n = df.count()
    sort = [("v", "desc"), ("k", "asc"), ("payload", "asc")]
    pages = []
    size = 7
    for off in range(0, n, size):
        pages.append(
            [tuple(r) for r in paginate(df, sort, limit=size, offset=off).collect()]
        )
    flat = [t for p in pages for t in p]
    # pages are disjoint, cover everything, and respect the total order
    assert len(flat) == n and len(set(flat)) == n
    keys = [(-v, k, p) for (k, v, p) in flat]
    assert keys == sorted(keys)


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10**6)),
        min_size=1, max_size=40, unique=True,
    )
)
@settings(**SETTINGS)
def test_sessionize_matches_bruteforce(spark, rows):
    from ton_indexer_spark.operators import sessionize_by_gap

    GAP = 1000
    df = spark.createDataFrame(rows, "user int, ts long")
    got = {
        (r["user"], r["ts"]): r["session_seq"]
        for r in sessionize_by_gap(df, "user", "ts", GAP).collect()
    }
    by_user: dict[int, list[int]] = {}
    for u, ts in rows:
        by_user.setdefault(u, []).append(ts)
    for u, tss in by_user.items():
        seq = 0
        prev = None
        for ts in sorted(tss):
            if prev is None or ts - prev > GAP:
                seq += 1
            assert got[(u, ts)] == seq, (u, ts)
            prev = ts


@given(
    st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)),
             min_size=1, max_size=60)
)
@settings(**SETTINGS)
def test_connected_components_matches_union_find(spark, edges):
    from ton_indexer_spark.operators import connected_components

    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want_groups: dict[int, set] = {}
    for a, b in edges:
        for n in (a, b):
            want_groups.setdefault(find(n), set()).add(n)
    for root, members in want_groups.items():
        labels = {got[m] for m in members}
        assert len(labels) == 1
        assert labels == {min(members)}


VECS = st.lists(
    st.lists(
        st.floats(min_value=-4.0, max_value=4.0,
                  allow_nan=False, allow_infinity=False, width=32),
        min_size=8, max_size=8,
    ),
    min_size=6,
    max_size=24,
)


@given(VECS)
@settings(**SETTINGS)
def test_pq_encode_deterministic_and_lossless_on_codebook_members(
    spark, vecs
):
    """PQ codes are a pure function of (vector, codebook): repartitioning
    can't change them, and a vector that IS a codeword quantizes to
    itself (zero distance beats every alternative, ties to lowest id)."""
    from ton_indexer_spark.similarity.pq import pq_encode, pq_seed_codebooks

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    n_code = min(4, len(vecs))
    cb = pq_seed_codebooks(df, n_code=n_code, n_sub=2)
    one = {r["vec_id"]: r["codes"]
           for r in pq_encode(df.coalesce(1), cb).collect()}
    many = {r["vec_id"]: r["codes"]
            for r in pq_encode(df.repartition(5), cb).collect()}
    assert one == many
    # every vector's code must be the argmin of the QUANTIZED subspace
    # distances (ties -> lowest code), replicated here in plain numpy;
    # in particular a codebook member always lands at distance 0
    import numpy as np

    from ton_indexer_spark.similarity.pq import _sub_dists_us

    f32 = np.array(vecs, dtype=np.float32).astype(np.float64)
    dus = _sub_dists_us(f32, cb)
    for i, codes in one.items():
        assert codes == list(dus[i].argmin(axis=1))
    for i in range(n_code):
        assert dus[i, 0, one[i][0]] == 0
        assert dus[i, 1, one[i][1]] == 0


@given(VECS)
@settings(**SETTINGS)
def test_mmr_first_pick_is_relevance_argmax(spark, vecs):
    """Whatever the geometry, MMR's step-1 pick must equal the plain
    relevance argmax (rounded-6dp cosine, ties to smaller id)."""
    from ton_indexer_spark.similarity.brute import cosine_topk
    from ton_indexer_spark.similarity.mmr import mmr_select

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    q = df.filter(F.col("vec_id") == 0)
    top1 = cosine_topk(q, df, k=1).collect()
    picks = mmr_select(q, df, k=3, n_candidates=len(vecs)).collect()
    first = next(r for r in picks if r["step"] == 1)
    assert first["neighbor_id"] == top1[0]["neighbor_id"]
    # and no id is ever picked twice
    ids = [r["neighbor_id"] for r in picks]
    assert len(ids) == len(set(ids))


# ---- round-7 properties: lossless ngram filters, exact AUC ----------------

_WORDS = ["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"]
DOCS = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=0, max_size=12),
    min_size=2,
    max_size=14,
)
THRESH = st.sampled_from([0.2, 0.3, 0.5, 0.8])


def _brute_jaccard_pairs(docs, threshold, k=3):
    """Pure-python ground truth: distinct k-shingles per doc, all pairs."""
    sets = {}
    for i, words in enumerate(docs):
        sh = {" ".join(words[j:j + k]) for j in range(len(words) - k + 1)}
        sets[i] = sh
    out = set()
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = sets[ids[x]], sets[ids[y]]
            if not a or not b:
                continue
            inter = len(a & b)
            union = len(a | b)
            if union and inter / union >= threshold - 1e-12:
                # integer-exact check like the engine: inter/union >= t
                from fractions import Fraction

                f = Fraction(threshold).limit_denominator(10**6)
                if inter * f.denominator >= f.numerator * union:
                    out.add((ids[x], ids[y]))
    return out


@given(DOCS, THRESH)
@settings(**SETTINGS)
def test_ngram_pairs_match_bruteforce_both_paths(spark, docs, threshold):
    from ton_indexer_spark.dedup.ngram import ngram_jaccard_pairs

    df = spark.createDataFrame(
        [(i, " ".join(w)) for i, w in enumerate(docs)],
        "doc_id long, text string",
    )
    want = _brute_jaccard_pairs(docs, threshold)
    for pf in (False, True):
        got = {
            (r["doc_a"], r["doc_b"])
            for r in ngram_jaccard_pairs(
                df, threshold=threshold, max_shingle_df=None, prefix_filter=pf
            ).collect()
        }
        assert got == want, (pf, threshold)


SCORES = st.lists(
    st.tuples(
        st.integers(min_value=-50, max_value=50),  # score
        st.booleans(),                             # label
    ),
    min_size=2,
    max_size=40,
).filter(lambda rs: any(y for _, y in rs) and any(not y for _, y in rs))


@given(SCORES)
@settings(**SETTINGS)
def test_binary_auc_matches_pair_enumeration(spark, rows):
    from ton_indexer_spark.operators.evaluation import binary_auc

    df = spark.createDataFrame(rows, "score long, y boolean")
    r = binary_auc(df, F.col("score"), F.col("y")).first()
    pos = [s for s, y in rows if y]
    neg = [s for s, y in rows if not y]
    u2 = sum(2 if p > n else (1 if p == n else 0) for p in pos for n in neg)
    assert r["u2"] == u2
    assert r["npos"] == len(pos) and r["nneg"] == len(neg)
    assert abs(r["auc"] - u2 / (2 * len(pos) * len(neg))) < 1e-12


WP_DOCS = st.lists(
    st.lists(
        st.text(alphabet="ab", min_size=1, max_size=7),
        min_size=1, max_size=8,
    ),
    min_size=1,
    max_size=6,
)


def _py_wordpiece(docs, min_freq=3, max_len=6):
    """Pure-python ground truth: substring vocab + greedy longest match."""
    from collections import Counter

    wf = Counter(w for words in docs for w in words)
    tf = Counter()
    for w, f in wf.items():
        n = len(w)
        for s in range(n):
            for ln in range(1, min(max_len, n - s) + 1):
                tf[w[s:s + ln]] += f
    vocab = {t for t, c in tf.items() if len(t) == 1 or c >= min_freq}
    segs = {}
    for w in wf:
        pos, toks = 0, []
        while pos < len(w):
            for ln in range(min(max_len, len(w) - pos), 0, -1):
                if w[pos:pos + ln] in vocab:
                    toks.append(w[pos:pos + ln])
                    pos += ln
                    break
        segs[w] = (" ".join(toks), len(toks))
    return segs


@given(WP_DOCS)
@settings(**SETTINGS)
def test_wordpiece_matches_python_greedy(spark, docs):
    from ton_indexer_spark.functions.bpe import word_frequencies
    from ton_indexer_spark.functions.wordpiece import (
        wordpiece_segment,
        wordpiece_vocab,
    )

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)],
        "doc_id long, text string",
    )
    wf = word_frequencies(df)
    v = wordpiece_vocab(wf, min_freq=3)
    got = {
        r["word"]: (r["segmented"], r["n_tokens"])
        for r in wordpiece_segment(wf.select("word"), v).collect()
    }
    assert got == _py_wordpiece(docs)
