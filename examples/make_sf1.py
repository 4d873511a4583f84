"""Synthesize an sf1 dataset (10x sf0.1) for the BENCH_sf1 scaling run.

The driver ships sf0.001/0.01/0.1 only (TESTDATA.md).  For a second
scaling point we build sf1 = ten disjoint copies of sf0.1 with:

- **FK-consistent id shifts**: every key column (PK and FK) moves by
  ``copy_idx * STRIDE`` so each copy is a self-contained relational
  island — joins stay 1:N exactly as at sf0.1, never 10x fan-out.
  ``nation``/``region`` keep their fixed TPC-H cardinality (25/5) like
  real TPC-H scaling does.
- **Isometric per-copy perturbation** of the similarity-bearing columns,
  so duplicate density and cluster geometry match sf0.1 instead of every
  row gaining nine verbatim twins:

  * ``embeddings.embedding``: copy *i* applies a seeded dimension
    permutation + sign flips (an exact isometry — within-copy cosines,
    norms and label-cluster structure are preserved bit-for-bit in
    expectation; cross-copy cosines collapse to ~N(0, 1/64), far below
    the 0.4 near-dup threshold).
  * ``documents.text``: copy *i* applies a seeded per-language
    vocabulary permutation PLUS a ``~i`` copy tag on every word — a
    bijection into a DISJOINT word space.  A bijection preserves
    within-copy n-gram/minhash/simhash duplicate structure exactly;
    disjointness keeps the shingle-df distribution FLAT across copies.
    (The first version permuted within the same tiny vocabulary: the
    ~30k-shingle universe saturates, so shingle df multiplied with the
    copy count — 9 -> 87 -> 873 median over two decades — until at
    sf10 every shingle crossed the df-256 boilerplate cap and the
    capped Jaccard join correctly returned zero pairs.  Caught by the
    round-9 third-decade scaling probe.)  ``n_chars`` is recomputed.

Run:  python examples/make_sf1.py [dst_dir]     (default .sfgen/sf1)
"""

from __future__ import annotations

import hashlib
import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# For a THIRD scaling decade, point SRC at a generated sf1 store and
# raise the stride a level so second-generation shifts cannot collide
# with first-generation ones (sf1 keys already carry i*1e10 offsets):
#   SPARK_GRAFT_SF_DIR=.sfgen/sf1 SPARK_GRAFT_STRIDE=1000000000000 \
#     python examples/make_sf1.py .sfgen/sf10
STRIDE = int(os.environ.get("SPARK_GRAFT_STRIDE", 10_000_000_000))
N_COPIES = int(os.environ.get("SPARK_GRAFT_COPIES", 10))

SHIFT_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIM_TABLES = {"nation", "region"}  # fixed cardinality, like TPC-H scaling


def _embedding_isometry(df, copy_idx: int, dim: int = 64):
    """Seeded dimension permutation + sign flips (exact isometry)."""
    if copy_idx == 0:
        return df
    rng = random.Random(10_000 + copy_idx)
    perm = list(range(dim))
    rng.shuffle(perm)
    signs = [rng.choice((-1.0, 1.0)) for _ in range(dim)]
    e = F.col("embedding")
    new = F.array(*[
        (e[perm[j]] * F.lit(signs[j])).cast("float") for j in range(dim)
    ])
    return df.withColumn("embedding", new)


def _vocab_permutations(spark, docs):
    """Per-language word list from the corpus (collected once; the vocab
    is generator-synthetic and tiny — a few hundred words)."""
    rows = (
        docs.select("lang", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") > 0)
        .distinct()
        .collect()
    )
    by_lang: dict[str, list[str]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["w"])
    for ws in by_lang.values():
        ws.sort()
    return by_lang


def _document_permutation(df, copy_idx: int, by_lang):
    """Apply the per-(lang, copy) vocabulary bijection to text: permute
    within the language's word list, then tag every word with ``~i`` so
    each copy's vocabulary (hence shingle universe) is DISJOINT — df
    distribution identical to the source instead of multiplying.

    Runs as a broadcast-dict mapInPandas stage rather than a
    ``create_map`` literal: at the second generation (sf1 -> sf10) the
    collected vocabulary is 10x, and a 10^5-entry literal expression
    tree is where Catalyst hurts."""
    if copy_idx == 0:
        return df
    mapping: dict[str, dict[str, str]] = {}
    for lang, words in by_lang.items():
        # stable seed: python's str hash is salted per process
        lang_h = int(hashlib.md5(lang.encode()).hexdigest()[:6], 16)
        rng = random.Random(20_000 + 1000 * copy_idx + lang_h % 997)
        shuffled = words[:]
        rng.shuffle(shuffled)
        tag = f"~{copy_idx}"
        mapping[lang] = {a: b + tag for a, b in zip(words, shuffled)}

    def stage(batches):
        for pdf in batches:
            texts = []
            for lang, text in zip(pdf["lang"], pdf["text"]):
                m = mapping.get(lang, {})
                texts.append(
                    " ".join(m.get(w, w) for w in text.split(" "))
                )
            pdf = pdf.copy()
            pdf["text"] = texts
            pdf["n_chars"] = [len(t) for t in texts]
            yield pdf

    return df.mapInPandas(stage, schema=df.schema)


def build(spark, src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    by_lang = None
    for fname in sorted(os.listdir(src)):
        if not fname.endswith(".parquet"):
            continue
        table = fname[:-8]
        df = spark.read.parquet(os.path.join(src, fname))
        if table in DIM_TABLES:
            df.write.mode("overwrite").parquet(os.path.join(dst, fname))
            print(f"  {table:<12} dim table, 1x")
            continue
        if table == "documents" and by_lang is None:
            by_lang = _vocab_permutations(spark, df)
            print(f"  vocab: {sum(len(v) for v in by_lang.values())} words "
                  f"across {len(by_lang)} languages")
        shift_cols = [c for c in SHIFT_COLS.get(table, []) if c in df.columns]
        copies = []
        for i in range(N_COPIES):
            c = df
            for col in shift_cols:
                c = c.withColumn(col, F.col(col) + F.lit(i * STRIDE))
            if table == "embeddings":
                c = _embedding_isometry(c, i)
            elif table == "documents":
                c = _document_permutation(c, i, by_lang)
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        path = os.path.join(dst, fname)
        out.write.mode("overwrite").parquet(path)
        n = spark.read.parquet(path).count()
        print(f"  {table:<12} {n} rows")


def main() -> None:
    from ton_indexer_spark.session import get_spark

    dst = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..", ".sfgen", "sf1")
    dst = os.path.abspath(dst)
    spark = get_spark()
    print(f"building sf1 at {dst} from {SRC}")
    build(spark, SRC, dst)
    print("done")


if __name__ == "__main__":
    main()
