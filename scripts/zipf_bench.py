"""Flat-vs-Zipf shape measurement (round-7 verdict ask #2).

Measures the queries whose plans are shape-sensitive on the flat driver
store vs the Zipf/heavy-hitter store produced by examples/make_zipf.py:

- n-gram Jaccard pair derivation, plain vs prefix-indexed (wall +
  candidate-row volume) — the prefix index must WIN on Zipf;
- MinHash-LSH, the hot-key window family (latest_state / sessionize /
  prev_pointer / group_topk) and classify-adjacent group aggregations.

Prints one JSON line per (store, query).
Usage: python scripts/zipf_bench.py [flat_dir] [zipf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

WINDOW_QUERIES = ("latest_state", "sessionize", "prev_pointer",
                  "group_topk", "first_per_group", "dedup_minhash_lsh")


def main() -> None:
    flat = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    zipf = sys.argv[2] if len(sys.argv) > 2 else ".sfgen/zipf0.1"

    from ton_indexer_spark.catalog import Catalog
    from ton_indexer_spark.dedup.ngram import (
        candidate_counts,
        ngram_jaccard_pairs,
    )
    from ton_indexer_spark.queries import all_specs
    from ton_indexer_spark.session import get_spark

    spark = get_spark(app_name="zipf_bench", shuffle_partitions=32)
    specs = all_specs()
    out = []

    for label, sf_dir in (("flat", flat), ("zipf", zipf)):
        docs = Catalog(spark, sf_dir).documents
        docs.count()  # warm the footer cache
        cc = candidate_counts(docs, threshold=0.3)
        for mode, pref in (("plain", False), ("prefix", True)):
            t0 = time.time()
            n_pairs = ngram_jaccard_pairs(
                docs, threshold=0.3, prefix_filter=pref
            ).count()
            rec = {
                "store": label, "query": f"ngram_jaccard[{mode}]",
                "sec": round(time.time() - t0, 2), "pairs": n_pairs,
                "candidates": cc[mode],
            }
            out.append(rec)
            print(json.dumps(rec), flush=True)
        for name in WINDOW_QUERIES:
            t0 = time.time()
            n = specs[name].builder(spark, sf_dir).count()
            rec = {"store": label, "query": name,
                   "sec": round(time.time() - t0, 2), "rows": n}
            out.append(rec)
            print(json.dumps(rec), flush=True)
    print(json.dumps({"summary": out}), flush=True)


if __name__ == "__main__":
    main()
