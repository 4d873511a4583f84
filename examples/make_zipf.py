"""Synthesize a Zipf-skewed corpus variant (round-7 verdict ask #2).

The driver's synthetic tables are FLAT: documents draw from a 155-word
uniform vocabulary (so shingle document frequency is near-uniform — the
shape where the AllPairs prefix index is provably counter-productive,
see dedup/ngram.py module docstring) and events.user_id is uniform over
1,500 users (no hot keys).  Real corpora are Zipf and real chain traffic
is heavy-hitter-dominated, so this generator produces the REALISTIC
shape the flat tables cannot exercise:

- ``documents``: Zipfian vocabulary (30k words, p(rank) ∝ rank^-1.05 —
  natural-language shape), log-normal doc lengths, and a controlled
  duplicate structure (2% exact dups, 8% near-dups at ~90% token
  overlap) so the dedup operators have real signal to find.
- ``events``: three heavy-hitter accounts owning ~30% of all events
  (the mainnet DEX-router/marketplace shape), the rest Zipf-distributed
  over the user population.

All other tables pass through unchanged from the source store.  The
output is perf/shape data (PERF.md flat-vs-Zipf table, the prefix-index
and skew tests) — correctness parity stays on the driver stores.

Usage:  python examples/make_zipf.py [dst_dir] [mult]
        # defaults: .sfgen/zipf0.1  1   (mult 10 ≈ sf1 scale)
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSTHROUGH = ("region", "nation", "customer", "supplier", "part",
               "orders", "lineitem", "embeddings")

VOCAB_SIZE = 30_000
ZIPF_S = 1.05
N_DOCS_BASE = 5_000      # sf0.1 documents cardinality
N_EVENTS_BASE = 100_000  # sf0.1 events cardinality
N_USERS_BASE = 1_500
HOT_USERS = (1, 2, 3)    # own ~10% of events EACH
HOT_SHARE = 0.10
LANGS = np.array(["en", "de", "fr", "es", "ru"])
LANG_P = np.array([0.66, 0.12, 0.10, 0.07, 0.05])


def zipf_probs(n: int, s: float) -> np.ndarray:
    p = 1.0 / np.arange(1, n + 1) ** s
    return p / p.sum()


def gen_documents(rng: np.random.Generator, n_docs: int):
    vocab = np.array([f"w{i:05d}" for i in range(VOCAB_SIZE)])
    probs = zipf_probs(VOCAB_SIZE, ZIPF_S)
    lengths = np.clip(
        rng.lognormal(mean=3.7, sigma=0.5, size=n_docs), 10, 250
    ).astype(int)
    # draw every base doc's tokens in one flat sample, then split
    flat = rng.choice(VOCAB_SIZE, size=int(lengths.sum()), p=probs)
    offs = np.concatenate([[0], np.cumsum(lengths)])
    docs: list[list[int]] = [
        flat[offs[i]:offs[i + 1]].tolist() for i in range(n_docs)
    ]
    # duplicate structure: last 10% of doc ids clone a random earlier doc
    n_dup = n_docs // 10
    dup_targets = rng.integers(0, n_docs - n_dup, size=n_dup)
    for j in range(n_dup):
        i = n_docs - n_dup + j
        base = list(docs[dup_targets[j]])
        if j % 5 != 0:  # 8%: near-dup — resample ~10% of tokens
            n_swap = max(1, len(base) // 10)
            pos = rng.choice(len(base), size=n_swap, replace=False)
            repl = rng.choice(VOCAB_SIZE, size=n_swap, p=probs)
            for k, p_ in enumerate(pos):
                base[p_] = int(repl[k])
        docs[i] = base
    texts = [" ".join(vocab[t] for t in d) for d in docs]
    langs = rng.choice(len(LANGS), size=n_docs, p=LANG_P)
    src_p = zipf_probs(20, 1.0)
    sources = rng.choice(20, size=n_docs, p=src_p)
    return pa.table({
        "doc_id": pa.array(np.arange(n_docs), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(LANGS[langs], pa.string()),
        "source": pa.array([f"src{s}" for s in sources], pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def gen_events(rng: np.random.Generator, n_events: int, n_users: int):
    # heavy hitters first: each hot user owns HOT_SHARE of the stream
    n_hot = int(n_events * HOT_SHARE)
    cold_p = zipf_probs(n_users, 1.0)
    user_id = np.concatenate([
        np.full(n_hot, HOT_USERS[0]),
        np.full(n_hot, HOT_USERS[1]),
        np.full(n_hot, HOT_USERS[2]),
        rng.choice(n_users, size=n_events - 3 * n_hot, p=cold_p),
    ])
    rng.shuffle(user_id)
    base_us = np.int64(1_704_067_200_000_000)  # 2024-01-01 UTC, micros
    ts = base_us + np.sort(
        rng.integers(0, 30 * 86_400_000_000, size=n_events, dtype=np.int64)
    )
    etypes = np.array(["view", "click", "purchase", "error"])
    ev = rng.choice(4, size=n_events, p=[0.6, 0.25, 0.1, 0.05])
    value = np.round(rng.uniform(0, 500, size=n_events), 2)
    props = [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, n_events)]
    return pa.table({
        "event_id": pa.array(np.arange(n_events), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(user_id.astype(np.int64), pa.int64()),
        "event_type": pa.array(etypes[ev], pa.string()),
        "value": pa.array(value, pa.float64()),
        "props": pa.array(props, pa.string()),
    })


def main() -> None:
    dst = sys.argv[1] if len(sys.argv) > 1 else ".sfgen/zipf0.1"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    os.makedirs(dst, exist_ok=True)
    rng = np.random.default_rng(8008)
    docs = gen_documents(rng, N_DOCS_BASE * mult)
    pq.write_table(docs, os.path.join(dst, "documents.parquet"))
    print(f"documents: {docs.num_rows} rows", flush=True)
    events = gen_events(rng, N_EVENTS_BASE * mult, N_USERS_BASE * mult)
    pq.write_table(events, os.path.join(dst, "events.parquet"))
    print(f"events: {events.num_rows} rows "
          f"(3 hot users x {HOT_SHARE:.0%})", flush=True)
    for t in PASSTHROUGH:
        src = os.path.join(SRC, f"{t}.parquet")
        if os.path.isfile(src):
            shutil.copyfile(src, os.path.join(dst, f"{t}.parquet"))
    print(f"passthrough tables copied from {SRC} -> {dst}", flush=True)


if __name__ == "__main__":
    main()
