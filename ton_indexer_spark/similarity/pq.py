"""Product-quantization ANN (PQ codes + asymmetric-distance scan).

The PQ decomposition (Jégou et al., "Product Quantization for Nearest
Neighbor Search", IEEE TPAMI 2011 — the ADC variant):

1. split each d-dim vector into ``n_sub`` contiguous subvectors;
2. quantize every subvector to its nearest codeword from a per-subspace
   codebook of ``n_code`` entries — a vector compresses to ``n_sub``
   small integers (64 float32 dims → 4 codes ≈ 64× smaller);
3. a query never decompresses the corpus: it precomputes a lookup table
   of ``n_sub × n_code`` query-to-codeword distances, and the scan
   approximates each query→vector distance as the sum of ``n_sub``
   table lookups (asymmetric distance computation).

Codebooks here are **deterministic seeds** — the subvectors of the
``n_code`` smallest-id corpus vectors — rather than per-subspace k-means,
for the same reason ``similarity/ivf.py`` uses seed centroids: the gate
oracle must replay the operator bit-for-bit, and float k-means is
engine-order-dependent.  A production deployment trains codebooks offline
(e.g. with ``similarity/kmeans.py`` per subspace) and passes them in; the
plan shape is identical.

Exactness: every subspace distance is quantized to integer micro-units
(``round(dist * 1e6)`` as int64) BEFORE the ADC sum, so per-pair scores
are exact int64 sums — order-independent across engines, partitionings
and batch shapes.  Sub-distance sums run over ≤128 elements, where numpy
reduces sequentially exactly like the oracle engine.

Scale shape (what survives 100×):

- encoding is one ``mapInPandas`` over the corpus — Arrow batches against
  a broadcast (n_sub × n_code × dsub) tensor; no shuffle, and the emitted
  code table is ~n_sub bytes/vector, the artifact a 100 TB deployment
  persists instead of raw vectors;
- the ADC scan broadcasts the per-query lookup tables (|Q| × n_sub ×
  n_code int64 — kilobytes per query) and streams the code table, each
  batch emitting at most |Q| · k candidates; the corpus never shuffles;
- the final global top-k is a |Q| · k · n_batches window, the same shape
  as ``brute.cosine_topk``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ton_indexer_spark.similarity.rounding import round_half_away


def pq_seed_codebooks(
    corpus: DataFrame,
    n_code: int = 16,
    n_sub: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """(n_sub, n_code, dsub) float64 codebook tensor from the ``n_code``
    smallest-id corpus vectors (a codebook-sized collect, not a corpus
    collect).  Raw subvectors — PQ is an L2 quantizer, no normalization."""
    rows = (
        corpus.select(id_col, vec_col).orderBy(id_col).limit(n_code).collect()
    )
    if not rows:
        raise ValueError("pq_seed_codebooks: corpus is empty")
    seeds = np.array([r[1] for r in rows], dtype=np.float64)
    d = seeds.shape[1]
    if d % n_sub:
        raise ValueError(f"dim {d} not divisible into {n_sub} subspaces")
    dsub = d // n_sub
    # (n_code, n_sub, dsub) -> (n_sub, n_code, dsub)
    return seeds.reshape(len(rows), n_sub, dsub).transpose(1, 0, 2)


def _sub_dists_us(mat: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """(n, n_sub, n_code) int64 — micro-unit L2 distance of every row's
    subvectors to every codeword.  ``sum(-1)`` over dsub ≤ 128 elements is
    numpy's sequential path, matching a sequential-accumulation oracle."""
    n_sub, n_code, dsub = codebooks.shape
    sub = mat.reshape(len(mat), n_sub, 1, dsub)
    diff = sub - codebooks[None, :, :, :]
    dist = np.sqrt((diff * diff).sum(-1))
    return round_half_away(dist * 1_000_000.0, 0).astype(np.int64)


def pq_encode(
    corpus: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, codes array<int>) — each vector's per-subspace nearest
    codeword (ties → smaller code index, exact via int64 distances)."""
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast(codebooks)
    out_schema = T.StructType(
        [
            T.StructField("vec_id", corpus.schema[id_col].dataType),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
        ]
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cb = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            dus = _sub_dists_us(mat, cb)
            codes = dus.argmin(axis=2).astype(np.int32)  # first min = low idx
            yield pd.DataFrame(
                {"vec_id": pdf[id_col], "codes": list(codes)}
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        encode, schema=out_schema
    )


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    n_code: int = 16,
    n_sub: int = 4,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: np.ndarray | None = None,
    codes: DataFrame | None = None,
    max_queries: int = 65_536,
) -> DataFrame:
    """(query_id, rank, neighbor_id, adc_dist_us) — PQ/ADC approximate
    top-k by ascending asymmetric L2 distance in exact micro-units.

    The query side is collected and its lookup tables broadcast (the
    ``max_queries`` contract shared with ``brute.cosine_topk``); the
    corpus side is encoded once and scanned — at 100 TB the code table is
    the persisted index and this function's scan half runs alone."""
    if codebooks is None:
        codebooks = pq_seed_codebooks(corpus, n_code, n_sub, id_col, vec_col)
    if codes is None:
        # `codes` — optional persisted code table
        # (similarity/index_store.py): encode once, serve many times
        codes = pq_encode(corpus, codebooks, id_col, vec_col)

    spark = corpus.sparkSession
    q_rows = queries.select(id_col, vec_col).limit(max_queries + 1).collect()
    if len(q_rows) > max_queries:
        raise ValueError(
            f"pq_topk query side exceeds max_queries={max_queries}; "
            "broadcast LUTs require a bounded query set"
        )
    id_type = queries.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("query_id", id_type),
            T.StructField("rank", T.IntegerType()),
            T.StructField("neighbor_id", corpus.schema[id_col].dataType),
            T.StructField("adc_dist_us", T.LongType()),
        ]
    )
    if not q_rows:
        return spark.createDataFrame([], out_schema)
    q_ids = [r[0] for r in q_rows]
    luts = _sub_dists_us(
        np.array([r[1] for r in q_rows], dtype=np.float64), codebooks
    )  # (|Q|, n_sub, n_code)
    bc = spark.sparkContext.broadcast((q_ids, luts))

    scored_schema = T.StructType(
        [
            T.StructField("query_id", id_type),
            T.StructField("neighbor_id", corpus.schema[id_col].dataType),
            T.StructField("adc_dist_us", T.LongType()),
        ]
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, lut = bc.value
        id_arr = np.array(ids, dtype=object)
        nq, n_sub_, _ = lut.shape
        for pdf in batches:
            if pdf.empty:
                continue
            c_ids = pdf["vec_id"].to_numpy()
            c_codes = np.array(list(pdf["codes"]), dtype=np.int64)
            # ADC: dist[q, c] = Σ_m lut[q, m, codes[c, m]] — int64-exact
            dist = np.zeros((nq, len(pdf)), dtype=np.int64)
            for m in range(n_sub_):
                dist += lut[:, m, c_codes[:, m]]
            mask = id_arr[:, None] != c_ids[None, :]
            id_order = np.argsort(c_ids, kind="stable")
            dist_o = dist[:, id_order]
            mask_o = mask[:, id_order]
            keep_q, keep_c = [], []
            for qi in range(nq):
                cols = np.nonzero(mask_o[qi])[0]
                if len(cols) > k:
                    cols = cols[np.argsort(dist_o[qi, cols], kind="stable")][:k]
                keep_q.extend([qi] * len(cols))
                keep_c.extend(id_order[cols].tolist())
            yield pd.DataFrame(
                {
                    "query_id": [ids[i] for i in keep_q],
                    "neighbor_id": [c_ids[j] for j in keep_c],
                    "adc_dist_us": [
                        int(dist[i, j]) for i, j in zip(keep_q, keep_c)
                    ],
                }
            )

    scored = codes.mapInPandas(scan, schema=scored_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist_us").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "adc_dist_us")
    )
