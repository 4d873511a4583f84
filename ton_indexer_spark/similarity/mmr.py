"""Maximal-marginal-relevance selection (diversified top-k).

MMR (Carbonell & Goldstein, SIGIR 1998): from a candidate pool ranked by
relevance to a query, greedily pick the item maximizing
``rel(c) − max_{s∈picked} sim(c, s)`` — relevance minus redundancy (the
λ=0.5 form, where the two terms weigh equally, so λ cancels out of the
argmax).  The dedup/selection stage retrieval pipelines run between ANN
and the final context window.

MMR is sequential BY DEFINITION — each pick depends on all previous — so
the scale decomposition is:

1. **candidate generation**: distributed ANN top-N per query (the
   brute/LSH/IVF/PQ operators; N bounds the greedy's working set);
2. **greedy**: per-query LOCAL loop over its ≤N candidates, parallel
   ACROSS queries via one ``applyInPandas`` — no driver collect, no
   cross-query coupling, linear scale-out in |queries|.

Exactness: relevance and pairwise similarities are quantized to integer
micro-units (``round(cos·1e6)`` int64) before the greedy, so every pick
and score is integer arithmetic — engine-independent and replayed by the
oracle's recursive CTE.  Ties → smaller neighbor id.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ton_indexer_spark.similarity.brute import cosine_topk
from ton_indexer_spark.similarity.rounding import round_half_away, unit_rows


def mmr_select(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_candidates: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """(query_id, step, neighbor_id, score_us) — the k MMR picks per
    query in selection order; ``score_us`` is the integer micro-unit
    marginal score at pick time (step 1 = pure relevance).

    ``candidates`` — optional precomputed (query_id, neighbor_id, sim)
    pool, e.g. from ``ivf_topk``/``pq_topk`` at scale; defaults to the
    exact ``cosine_topk`` top-``n_candidates``."""
    if candidates is None:
        candidates = cosine_topk(
            queries, corpus, k=n_candidates, id_col=id_col, vec_col=vec_col
        )
    # hydrate candidate vectors for the pairwise-redundancy term; the
    # pool is |Q|·N rows, the join shuffles only that
    cand = candidates.join(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
        ),
        "neighbor_id",
    ).select(
        "query_id",
        "neighbor_id",
        F.round(F.col("sim") * 1_000_000).cast("long").alias("rel_us"),
        "cvec",
    )

    out_schema = T.StructType(
        [
            T.StructField("query_id", candidates.schema["query_id"].dataType),
            T.StructField("step", T.IntegerType()),
            T.StructField(
                "neighbor_id", candidates.schema["neighbor_id"].dataType
            ),
            T.StructField("score_us", T.LongType()),
        ]
    )

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame(
                {"query_id": [], "step": [], "neighbor_id": [],
                 "score_us": []}
            )
        qid = pdf["query_id"].iloc[0]
        ids = pdf["neighbor_id"].to_numpy()
        rel = pdf["rel_us"].to_numpy(dtype=np.int64)
        unit = unit_rows(np.array(list(pdf["cvec"]), dtype=np.float64))
        sim = round_half_away(unit @ unit.T * 1_000_000.0, 0).astype(np.int64)
        n = len(ids)
        # deterministic candidate order: score desc, id asc via lexsort
        id_rank = np.argsort(np.argsort(ids, kind="stable"))
        avail = np.ones(n, dtype=bool)
        maxsim = np.full(n, np.iinfo(np.int64).min, dtype=np.int64)
        picks, scores = [], []
        for _ in range(min(k, n)):
            score = np.where(
                maxsim == np.iinfo(np.int64).min, rel, rel - maxsim
            )
            idx = np.nonzero(avail)[0]
            # negate only REAL scores (bounded ±4e6) — negating an int64
            # sentinel would overflow and invert the ordering
            best = idx[np.lexsort((id_rank[idx], -score[idx]))[0]]
            picks.append(best)
            scores.append(int(score[best]))
            avail[best] = False
            maxsim = np.maximum(maxsim, sim[:, best])
        return pd.DataFrame(
            {
                "query_id": [qid] * len(picks),
                "step": np.arange(1, len(picks) + 1, dtype=np.int32),
                "neighbor_id": ids[picks],
                "score_us": scores,
            }
        )

    def apply(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # a query's pool may straddle Arrow batch boundaries — the input
        # is sorted by query_id, so buffer the tail group across batches
        # (the _classify_stream pattern)
        tail: pd.DataFrame | None = None
        for pdf in batches:
            if pdf.empty:
                continue
            if tail is not None:
                pdf = pd.concat([tail, pdf], ignore_index=True)
            last_qid = pdf["query_id"].iloc[-1]
            tail = pdf[pdf["query_id"] == last_qid]
            for _, g in pdf[pdf["query_id"] != last_qid].groupby(
                "query_id", sort=False
            ):
                yield greedy(g)
        if tail is not None and not tail.empty:
            yield greedy(tail)

    # queries are independent: partition the pool by query and run each
    # greedy locally (candidate pools are tiny — stream them per batch)
    return (
        cand.repartition(F.col("query_id"))
        .sortWithinPartitions("query_id")
        .mapInPandas(apply, schema=out_schema)
    )
