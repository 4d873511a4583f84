"""10× scale probe — reproduces PERF.md's "10× scale probe" table.

Duplicates the sf-dir tables 10× with shifted ids (each copy is a
disjoint id range, so relational semantics are preserved while row count
and — for the dedup family — true-duplicate density grow), then times a
set of headline queries at 1× and 10× through the same `queries()`
entries the driver runs.

Run:  python examples/scale_probe.py [q1,q2,...]
Env:  SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

DEFAULT_QUERIES = [
    "sessionize",
    "asof_join",
    "connected_components",
    "embed_ivf_topk",
    "dedup_embedding_cosine",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_cluster_canonical",
    "decontaminate",
    "bloom_membership",
    "semdedup",
    "embed_kmeans",
    "char_lm_quality",
    "source_mixture",
]

# id-bearing columns to shift per copy, per table (disjoint ranges keep
# joins/windows meaningful instead of creating 10× fan-out on shared keys)
SHIFT_COLS = {
    "events": ["event_id", "user_id", "session_hint"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
}


def make_10x(spark, src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    for fname in os.listdir(src):
        if not fname.endswith(".parquet"):
            continue
        table = fname[:-8]
        df = spark.read.parquet(os.path.join(src, fname))
        shift_cols = [c for c in SHIFT_COLS.get(table, []) if c in df.columns]
        if shift_cols:
            # shift numeric ids by copy_idx * stride; leave other cols as-is
            stride = 10_000_000_000
            copies = []
            for i in range(10):
                c = df
                for col in shift_cols:
                    c = c.withColumn(col, F.col(col) + F.lit(i * stride))
                copies.append(c)
            out = copies[0]
            for c in copies[1:]:
                out = out.unionByName(c)
        else:
            out = df
            for _ in range(9):
                out = out.unionByName(df)
        out.write.mode("overwrite").parquet(os.path.join(dst, fname))


def scaled_builders() -> dict:
    """Knob-scaled variants for the operators whose GATE pins a fixed
    parameter for oracle determinism.  The gate-pinned probe shows
    super-linear wall growth at 10× because the knob stays at its 1×
    value; a real deployment scales the knob with N.  Each entry maps a
    query name to (builder_1x, builder_10x) where the 10× builder sets
    the knob as the documented scaling law prescribes:

    - semdedup: n_clusters ∝ N (bounded expected cluster size, so the
      intra-cluster pair scan stays Σ|c|² ≈ N·E|c|);
    - embed_ivf_topk: n_lists ∝ √N with nprobe fixed (per-query probed
      candidates grow √N, the classic IVF trade); the query set is held
      FIXED (copy-0 ids) — a lookup workload doesn't grow with the
      corpus;
    dedup_embedding_cosine is deliberately NOT here: on this probe's
    duplicated-copy corpus every vector gains ~10 identical twins, so the
    TRUE pair output grows ~100× — wall is output-bound and no candidate
    knob can (or should) hide that; the fixed-knob row already reflects
    it.
    """
    from pyspark.sql import functions as F  # noqa: F811

    from ton_indexer_spark.catalog import Catalog

    stride = 10_000_000_000

    def semdedup_b(nc):
        def f(spark, d):
            from ton_indexer_spark.similarity.semdedup import semdedup

            return semdedup(
                Catalog(spark, d).embeddings, n_clusters=nc, threshold=0.4
            )
        return f

    def ivf_b(nl):
        def f(spark, d):
            from ton_indexer_spark.similarity.ivf import ivf_topk

            emb = Catalog(spark, d).embeddings
            qs = emb.filter(
                (F.col("vec_id") % 50 == 25) & (F.col("vec_id") < stride)
            )
            return ivf_topk(qs, emb, n_lists=nl, nprobe=4, k=5)
        return f

    return {
        "semdedup": (semdedup_b(8), semdedup_b(80)),
        "embed_ivf_topk": (ivf_b(16), ivf_b(50)),
    }


def auto_knob_builders() -> dict:
    """Default-knob (auto-scaled) builders used by the probe's default
    run in place of the gate-pinned entries for semdedup/ivf."""
    from ton_indexer_spark.catalog import Catalog

    stride = 10_000_000_000

    def semdedup_auto(spark, d):
        from ton_indexer_spark.similarity.semdedup import semdedup

        return semdedup(Catalog(spark, d).embeddings, threshold=0.4)

    def ivf_auto(spark, d):
        from ton_indexer_spark.similarity.ivf import ivf_topk

        emb = Catalog(spark, d).embeddings
        qs = emb.filter(
            (F.col("vec_id") % 50 == 25) & (F.col("vec_id") < stride)
        )
        return ivf_topk(qs, emb, nprobe=4, k=5)

    return {"semdedup": semdedup_auto, "embed_ivf_topk": ivf_auto}


def main() -> None:
    from ton_indexer_spark.session import get_spark

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod

    args = [a for a in sys.argv[1:] if a != "--scaled"]
    scaled = "--scaled" in sys.argv[1:]
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="scale_probe")
    dst = os.path.join(tempfile.mkdtemp(prefix="scale10x_"), "sf10x")
    print(f"building 10x copy of {src} under {dst}")
    make_10x(spark, src, dst)

    if scaled:
        pairs = scaled_builders()
        names = args[0].split(",") if args else sorted(pairs)
        print(f"{'query (scaled knobs)':28s} {'x1':>8s} {'x10':>8s} "
              f"{'ratio':>6s}")
        for name in names:
            b1, b10 = pairs[name]
            walls = []
            for b, d in ((b1, src), (b10, dst)):
                best = float("inf")
                for _ in range(2):  # best-of-two: drop JIT/plan warm-up
                    t0 = time.time()
                    b(spark, d).write.format("noop").mode(
                        "overwrite").save()
                    best = min(best, time.time() - t0)
                walls.append(best)
            print(f"{name:28s} {walls[0]:7.2f}s {walls[1]:7.2f}s "
                  f"{walls[1] / walls[0]:5.1f}x")
        return

    names = args[0].split(",") if args else DEFAULT_QUERIES
    queries = entrymod.queries()
    # the GATE entries for these two pin their knob for oracle
    # determinism; the probe's default run measures the library DEFAULT
    # (auto-scaled knob: n_lists ∝ √N, n_clusters ∝ N) — the setting a
    # naive caller gets — so super-linear growth here is a real defect,
    # not a pinned-knob artifact
    auto = auto_knob_builders()
    queries = {**queries, **{k: v for k, v in auto.items() if k in names}}
    print(f"{'query':28s} {'x1':>8s} {'x10':>8s} {'ratio':>6s}")
    for name in names:
        fn = queries[name]
        walls = []
        for d in (src, dst):
            t0 = time.time()
            fn(spark, d).write.format("noop").mode("overwrite").save()
            walls.append(time.time() - t0)
        print(f"{name:28s} {walls[0]:7.2f}s {walls[1]:7.2f}s "
              f"{walls[1] / walls[0]:5.1f}x")


if __name__ == "__main__":
    main()
