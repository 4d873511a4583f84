"""Third scaling decade for the dedup/similarity family (r9 ask #2).

Runs the scale-shape-sensitive queries through bench.py (checksum
consumer, one fresh JVM per store) at three decades:

  sf0.1 (driver store)  ->  sf1 (examples/make_sf1.py)
                        ->  sf10 (make_sf1.py over sf1, stride 1e12)

and records per-query wall plus decade-over-decade ratios.  The claim
under test (PERF.md two-regime analysis): minhash-LSH and the df-capped
ngram join stay at or below ~the data ratio per decade; the prefix
index stays near-linear; CC and latest_state follow their group sizes,
not the pair count.

Usage: python scripts/scale_decades.py [out.json]   (default BENCH_sf10.json)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUERIES = [
    "dedup_ngram_jaccard",
    "dedup_ngram_prefix",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "connected_components",
    "latest_state",
]

STORES = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", os.path.join(REPO, ".sfgen", "sf1")),
    ("sf10", os.path.join(REPO, ".sfgen", "sf10")),
]


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_sf10.json"
    points: dict[str, dict] = {}
    for label, sf_dir in STORES:
        env = dict(
            os.environ,
            SPARK_GRAFT_SF_DIR=sf_dir,
            SPARK_GRAFT_BENCH_QUERIES=",".join(QUERIES),
        )
        env.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
        print(f"=== {label} ({sf_dir})", flush=True)
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, cwd=REPO,
        )
        lines = [ln for ln in r.stdout.splitlines()
                 if ln.startswith('{"metric"')]
        if r.returncode != 0 or not lines:
            print(r.stdout[-3000:], file=sys.stderr)
            print(r.stderr[-3000:], file=sys.stderr)
            raise RuntimeError(f"bench failed at {label}")
        points[label] = json.loads(lines[-1])
        print(lines[-1], flush=True)

    ratios: dict[str, dict] = {}
    for a, b in (("sf0.1", "sf1"), ("sf1", "sf10")):
        ratios[f"{b}/{a}"] = {
            q: round(points[b]["queries"][q] / points[a]["queries"][q], 2)
            for q in QUERIES
            if q in points[a].get("queries", {})
            and q in points[b].get("queries", {})
        }
    summary = {
        "metric": "scaling_decades",
        "unit": "sec",
        "data_ratio_per_decade": 10,
        "points": points,
        "ratios": ratios,
    }
    with open(os.path.join(REPO, out_path), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(ratios), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
