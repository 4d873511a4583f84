"""End-to-end LLM training-data pipeline: raw corpus → packed samples.

Composes the engine's training-data operators into the standard curation
funnel (the shape of CCNet / RefinedWeb / FineWeb / Dolma pipelines),
every stage a lazy DataFrame transformation — ONE Spark application, one
shuffle per stage that genuinely needs it:

    quality gates     char-LM perplexity proxy, trigram repetition,
                      token-count bounds                       (map-side)
    PII               redact emails/IPv4/phones                (map-side)
    decontamination   5-gram overlap vs benchmark corpus   (broadcast semi)
    exact dedup       fingerprint keep-smallest-id          (hash groupBy)
    near dedup        MinHash+LSH pairs → connected components →
                      cluster canonicalization            (banded buckets)
    semantic dedup    SemDeDup over embeddings            (cluster-scoped)
    mixing            source-mixture weights                  (map-side)
    split             leakage-safe train/val/test             (map-side)
    shaping           chunk to token windows, pack to a fixed
                      token budget                       (distributed scan)

Run:  python examples/llm_pipeline.py   (~1 min on local[32], sf0.01)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from ton_indexer_spark.catalog import Catalog  # noqa: E402
from ton_indexer_spark.dedup import (  # noqa: E402
    lsh_candidate_pairs,
    source_overlap_matrix,
)
from ton_indexer_spark.dedup.decontaminate import decontaminate  # noqa: E402
from ton_indexer_spark.functions.charlm import (  # noqa: E402
    char_lm_score,
    train_char_lm,
)
from ton_indexer_spark.functions.pii import redact_pii  # noqa: E402
from ton_indexer_spark.functions.text import (  # noqa: E402
    fingerprint,
    token_count,
)
from ton_indexer_spark.operators import connected_components  # noqa: E402
from ton_indexer_spark.operators.prefix import sequence_pack  # noqa: E402
from ton_indexer_spark.operators.sampling import (  # noqa: E402
    dataset_split,
    source_mixture,
)
from ton_indexer_spark.queries.text import (  # noqa: E402
    CHUNK_SIZE,
    CHUNK_STRIDE,
)
from ton_indexer_spark.session import get_spark  # noqa: E402
from ton_indexer_spark.similarity.semdedup import semdedup  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def stage(name: str, df, n_before: int) -> int:
    n = df.count()
    print(f"  {name:<28} {n_before:>7} -> {n:>7}")
    return n


def main() -> None:
    spark = get_spark(app_name="llm_pipeline_demo")
    cat = Catalog(spark, SF_DIR)
    docs = cat.documents
    emb = cat.embeddings
    n0 = docs.count()
    print(f"== corpus: {n0} documents from {SF_DIR}")

    # ---- 1. quality gates (all map-side column algebra) -------------------
    model = train_char_lm(docs.filter(F.col("lang") == "en"))
    scored = docs.join(
        char_lm_score(docs, model).select("doc_id", "nll_per_char"), "doc_id"
    ).withColumn("n_tokens", token_count(F.col("text")).cast("long"))
    # Materialize BEFORE filtering on the derived columns: nll_per_char is
    # a 37-term sum-of-products expression, and a Filter/Join above that
    # alias sends Catalyst's constraint propagation into a canonicalization
    # storm (minutes of driver CPU in getAllValidConstraints/
    # orderCommutative at 500 rows — measured).  Once the column is
    # materialized the filter compares a plain long.
    scored = scored.localCheckpoint(eager=True)
    kept = scored.filter(
        (F.col("n_tokens") >= 5)
        & F.col("nll_per_char").isNotNull()
        # char-LM tail cut: drop the least reference-like 5% (demo uses a
        # fixed threshold; production computes it from percentile_summary)
        & (F.col("nll_per_char") < 2_940_000)
    )
    # Stage discipline: each funnel stage below both (a) derives from the
    # previous stage's survivors and (b) is counted for the ledger.  An
    # unbroken lineage makes stage k's count re-execute stages 1..k-1
    # (quadratic total work) and grows the physical plan until AQE's
    # per-stage re-validation (outputPartitioning over alias chains)
    # dominates wall-clock on the DRIVER.  localCheckpoint at each stage
    # boundary truncates the plan and pins the survivors, so every stage
    # executes exactly once — the local-demo STAND-IN for writing each
    # stage's output to the lake.  Caveat: localCheckpoint stores blocks
    # on executors WITHOUT fault tolerance — at the 100 TB design point
    # an executor loss/decommission invalidates the pipeline, so
    # production uses a persisted write (or reliable checkpoint) between
    # stages, not this.
    n = stage("quality gates", kept, n0)

    # ---- 1b. hashed linear quality score (fastText-style, still map-only;
    # demo uses the synthetic closed-form weights — a trained vector drops
    # in as a map literal without changing the plan) ------------------------
    from ton_indexer_spark.functions.quality_model import hashed_linear_score

    kept = kept.withColumn("q_score", hashed_linear_score(F.col("text")))
    kept = kept.filter(F.col("q_score") > -0.9)  # loose floor for the demo

    # ---- 1c. word-bigram LM filter (the distributed-model perplexity
    # regime: the model is a DataFrame joined on the bigram key, never
    # collected — complements the broadcast char-LM above) ------------------
    from ton_indexer_spark.functions.wordlm import (
        train_word_bigram_lm,
        word_lm_score,
    )

    wlm, _v = train_word_bigram_lm(docs.filter(F.col("lang") == "en"))
    wscores = word_lm_score(kept, wlm).select("doc_id", "nll_per_bigram")
    # OOV bigrams take the smoothed floor, so every ≥2-token doc gets a
    # score; sub-2-token docs are the don't-know bucket — kept, not cut
    cuts = wscores.approxQuantile("nll_per_bigram", [0.95], 0.01)
    if cuts:
        scored_ok = wscores.filter(
            F.col("nll_per_bigram") <= cuts[0]
        ).select("doc_id")
        unscored = kept.select("doc_id").join(
            wscores.select("doc_id"), "doc_id", "left_anti"
        )
        kept = kept.join(scored_ok.union(unscored), "doc_id")
    kept = kept.localCheckpoint(eager=True)
    n = stage("word-LM filter", kept, n)

    # ---- 1d. distill the heuristic gates into a trained classifier: the
    # CCNet/GPT-3 move — docs the gates KEPT are positives, the rest
    # negatives; the NB trainer is one bounded-cardinality groupBy, the
    # trained weights collapse to a map literal, and scoring is the same
    # zero-shuffle projection as 1b.  AUC (exact, distributed) reports
    # how well the learned model reproduces the gates.
    from ton_indexer_spark.functions.quality_nb import (
        nb_prior_q,
        nb_score,
        nb_train,
        nb_weight_map,
    )
    from ton_indexer_spark.operators.evaluation import binary_auc

    labeled = docs.join(
        kept.select("doc_id", F.lit(True).alias("_kept")), "doc_id", "left"
    ).withColumn("_kept", F.coalesce(F.col("_kept"), F.lit(False)))
    wmap = nb_weight_map(nb_train(labeled, F.col("_kept")))
    prior = nb_prior_q(labeled, F.col("_kept"))
    ev = binary_auc(
        labeled.select(
            nb_score(F.col("text"), wmap, prior).alias("s"),
            F.col("_kept").alias("y"),
        ),
        F.col("s"),
        F.col("y"),
    ).first()
    print(f"  NB distilled classifier   AUC {ev['auc']:.3f} vs the gates "
          f"({ev['npos']} pos / {ev['nneg']} neg)")

    # ---- 2. PII redaction (map-side rewrite, text replaced in place) ------
    kept = kept.withColumn("text", redact_pii(F.col("text")))

    # ---- 2b. line-level boilerplate removal (C4 rule): lines occurring in
    # 3+ distinct docs are dropped corpus-wide; digest-keyed frequency
    # shuffle + anti-join, then the text column is replaced in place -------
    from ton_indexer_spark.dedup.lines import remove_repeated_lines

    cleaned = remove_repeated_lines(kept, min_docs=3)
    kept = kept.drop("text").join(
        cleaned.select(
            "doc_id", F.col("clean_text").alias("text"), "n_removed"
        ),
        "doc_id",
    )
    kept = kept.localCheckpoint(eager=True)
    n = stage("line dedup (C4)", kept.filter(F.length("text") > 0), n)

    # ---- 3. benchmark decontamination (broadcast the benchmark side) ------
    bench = docs.filter(F.col("source") == "src0")
    train_side = kept.filter(F.col("source") != "src0")
    decon = decontaminate(train_side, bench, k=5)
    kept = train_side.join(
        decon.filter(~F.col("contaminated")).select("doc_id"), "doc_id"
    ).localCheckpoint(eager=True)
    n = stage("decontaminate", kept, n)

    # ---- 3b. DSIR domain selection (importance weights vs a target) -------
    # demo target: the English slice; production points this at the clean
    # domain corpus you want more of.  Keep the top-weighted ~80%.
    from ton_indexer_spark.operators.selection import dsir_weights

    target = docs.filter(F.col("lang") == "en")
    w = dsir_weights(kept, target, n_buckets=512)
    cut = w.approxQuantile("logw_scaled", [0.2], 0.01)[0]
    kept = kept.join(
        w.filter(F.col("logw_scaled") >= cut).select("doc_id"), "doc_id"
    ).localCheckpoint(eager=True)
    n = stage("domain selection (DSIR)", kept, n)

    # ---- 4. exact dedup (keep smallest doc_id per fingerprint) ------------
    kept = kept.withColumn("fp", fingerprint(F.col("text")))
    keep_ids = kept.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    kept = kept.join(keep_ids.select("doc_id"), "doc_id").drop("fp")
    kept = kept.localCheckpoint(eager=True)
    n = stage("exact dedup", kept, n)

    # ---- 5. near dedup: MinHash+LSH pairs -> CC -> drop non-canonical -----
    # the pair table is derived ONCE (checkpoint = materialize) and feeds
    # every pair consumer below: connected components here, the source-
    # overlap provenance report next — never recomputed per consumer
    pairs = (
        lsh_candidate_pairs(kept)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    overlap = source_overlap_matrix(pairs, kept).collect()
    top = sorted(overlap, key=lambda r: -r["n_pairs"])[:3]
    print(
        "  cross-source overlap     ",
        [(r["source_a"], r["source_b"], r["n_pairs"]) for r in top],
    )
    clusters = connected_components(pairs, src="doc_a", dst="doc_b")
    dupes = clusters.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    kept = kept.join(dupes, "doc_id", "left_anti").localCheckpoint(eager=True)
    n = stage("near dedup (MinHash+CC)", kept, n)

    # ---- 6. semantic dedup over embeddings (SemDeDup) ---------------------
    sem_dupes = (
        semdedup(emb, n_clusters=8, threshold=0.4)
        .filter(F.col("is_duplicate"))
        .select(F.col("vec_id").alias("doc_id"))
    )
    kept = kept.join(sem_dupes, "doc_id", "left_anti").localCheckpoint(
        eager=True
    )
    n = stage("semantic dedup (SemDeDup)", kept, n)

    # ---- 7. source mixture + train/val/test split (map-side) --------------
    weights = {f"src{i}": (i % 5) + 1 for i in range(20)}
    mixed = source_mixture(kept, "doc_id", "source", weights)
    n = stage("source mixture", mixed, n)
    split = dataset_split(mixed, "doc_id").localCheckpoint(eager=True)
    print(
        "  split sizes              ",
        {
            r["split"]: r["n"]
            for r in split.groupBy("split")
            .agg(F.count("*").alias("n"))
            .collect()
        },
    )

    # ---- 8. chunk to token windows, pack to a fixed token budget ----------
    toks = F.filter(
        F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != F.lit("")
    )
    t = (
        split.filter(F.col("split") == "train")
        .select("doc_id", toks.alias("toks"))
        .withColumn("n", F.size("toks"))
        .filter(F.col("n") > 0)
    )
    chunks = t.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n") - 1, F.lit(CHUNK_STRIDE))
        ).alias("off"),
        F.col("n"),
    ).select(
        # multiplier must exceed any document's token count, or chunk_ids
        # collide across adjacent doc_ids (off can reach n - 1)
        (F.col("doc_id") * 1_000_000_000 + F.col("off")).alias("chunk_id"),
        F.least(F.lit(CHUNK_SIZE), F.col("n") - F.col("off")).alias(
            "chunk_tokens"
        ),
    )
    packed = sequence_pack(
        chunks, order_col="chunk_id", tokens_col="chunk_tokens", budget=2048
    ).localCheckpoint(eager=True)
    n_chunks = packed.count()
    n_bins = packed.agg(F.countDistinct("bin_id")).collect()[0][0]
    print(f"  chunk+pack                {n_chunks} chunks -> {n_bins} "
          f"bins of <=2048 tokens")

    # ---- 9. tokenizer: learn BPE merges over the train split --------------
    from ton_indexer_spark.functions.bpe import bpe_train

    merges = bpe_train(split.filter(F.col("split") == "train"), n_merges=15)
    print(f"  bpe tokenizer             {len(merges)} merges, first 5: "
          f"{['+'.join(m) for m in merges[:5]]}")

    # ---- 9b. WordPiece greedy segmentation (tokenizer inference over the
    # Zipf-small distinct-word vocabulary, never the corpus) ----------------
    from ton_indexer_spark.functions.bpe import word_frequencies
    from ton_indexer_spark.functions.wordpiece import (
        wordpiece_segment,
        wordpiece_vocab,
    )

    wf_train = word_frequencies(split.filter(F.col("split") == "train"))
    seg = wordpiece_segment(
        wf_train.select("word"), wordpiece_vocab(wf_train, min_freq=4)
    )
    stats = seg.agg(
        F.count(F.lit(1)).alias("w"), F.avg("n_tokens").alias("t")
    ).first()
    print(f"  wordpiece segmentation    {stats['w']} distinct words, "
          f"{stats['t']:.2f} tokens/word")

    # ---- 10. curriculum order (sort spec: tier by difficulty quantile +
    # deterministic shuffle key; the shard writer orders by it) -------------
    from ton_indexer_spark.operators.curriculum import curriculum_order

    curr = curriculum_order(
        packed, F.col("chunk_tokens"), n_tiers=4, id_col="chunk_id"
    )
    tiers = {r["tier"]: r["n"] for r in curr.groupBy("tier")
             .agg(F.count(F.lit(1)).alias("n")).collect()}
    print(f"  curriculum order          {len(tiers)} occupied tiers "
          f"{tiers} (quantile ties collapse on capped chunk sizes; "
          f"ORDER BY tier, shuffle_key)")

    # ---- 11. deterministic shard assignment for the training loader -------
    from ton_indexer_spark.operators.sampling import shard_assign

    sharded = shard_assign(packed, id_col="chunk_id", n_shards=8)
    per_shard = (
        sharded.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    sizes = sorted(r["n"] for r in per_shard)
    print(f"  shard assignment          8 shards, {sizes[0]}-{sizes[-1]} "
          f"chunks each")
    # ---- 12. embedding-side curation artifacts -----------------------------
    # (a) diversified eval exemplars: ANN candidates -> per-query MMR, so
    # the eval set spans the space instead of k near-copies of the center
    from ton_indexer_spark.similarity.mmr import mmr_select

    probes = emb.filter(F.col("vec_id") % 100 == 0)
    exemplars = mmr_select(probes, emb, k=3, n_candidates=16)
    print(f"  MMR eval exemplars        "
          f"{exemplars.count()} picks for {probes.count()} probes")
    # (b) contrastive hard negatives: nearest OTHER-class vectors per
    # anchor — the (anchor, negative) pairs an embedding trainer consumes
    from ton_indexer_spark.similarity.brute import cosine_topk

    negs = cosine_topk(probes, emb, k=4, exclude_label_col="label")
    print(f"  hard negatives            {negs.count()} pairs "
          f"(4 per anchor, cross-label)")

    # ---- 13. multimodal leg: decode -> resize -> embed -> near-dup --------
    # REAL in-engine PNG decode (stdlib zlib) on synthesized payloads;
    # the decode+resize fusion keeps full-size planes out of the
    # shuffle, and the extracted vectors feed the same similarity
    # operators the text side uses — one engine, both modalities.
    from ton_indexer_spark.multimodal.binary import (
        decode_images,
        extract_features,
    )
    from ton_indexer_spark.multimodal.png import encode_png
    from ton_indexer_spark.similarity.neardup import cosine_neardup_pairs

    def _to_png(batches):
        import hashlib as _h

        for pdf in batches:
            blobs = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                # deterministic 16x16 gray plane from the doc content
                seed = _h.md5(f"{did}:{text[:64]}".encode()).digest()
                px = (seed * 16)[:256]
                blobs.append(encode_png(px, 16, 16, 1, filter_type=2))
            pdf = pdf[["doc_id"]].copy()
            pdf["payload"] = blobs
            yield pdf

    media = kept.limit(200).select("doc_id", "text").mapInPandas(
        _to_png, schema="doc_id long, payload binary"
    )
    decoded = decode_images(media, out_w=8, out_h=8)
    n_ok = decoded.filter(F.col("decode_error").isNull()).count()
    vecs = extract_features(
        decoded.filter(F.col("decode_error").isNull()),
        dim=64, payload_col="pixels",
    ).withColumnRenamed("doc_id", "vec_id")
    media_dups = cosine_neardup_pairs(vecs, threshold=0.95)
    print(f"  multimodal leg            {n_ok} PNGs decoded in-engine, "
          f"{media_dups.count()} near-dup pairs at cos>=0.95")

    print("== done — every stage above is a lazy DataFrame plan; at 100 TB "
          "swap the paths and raise spark.sql.shuffle.partitions")
    # free the walkthrough's cached intermediates (the test suite runs
    # this inside its long-lived shared session)
    spark.catalog.clearCache()


if __name__ == "__main__":
    main()
