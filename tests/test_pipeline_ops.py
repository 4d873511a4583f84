"""Behavioral tests for the round-4 training-data pipeline operators:
decontamination, PII detect/redact, source-mixture sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # doc 1 copies benchmark doc 100's exact phrasing (contaminated)
        (1, "the quick brown fox jumps over the lazy dog today", "web"),
        (2, "completely original text about distributed query engines", "web"),
        (3, "short", "web"),  # < k tokens: no shingles, no output row
        (4, "another clean doc with its own words entirely here", "books"),
    ]
    bench = [
        (100, "exam question: the quick brown fox jumps over the lazy dog", "eval"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, source string")
    b = spark.createDataFrame(bench, "doc_id long, text string, source string")
    return d, b


class TestDecontaminate:
    def test_flags_overlap(self, spark, docs):
        from ton_indexer_spark.dedup.decontaminate import decontaminate

        d, b = docs
        out = {
            r["doc_id"]: r
            for r in decontaminate(d, b, k=5).collect()
        }
        assert out[1]["contaminated"] and out[1]["n_hit"] > 0
        assert not out[2]["contaminated"] and out[2]["n_hit"] == 0
        assert not out[4]["contaminated"]
        assert 3 not in out  # fewer than k tokens -> no shingles

    def test_ratio_threshold(self, spark, docs):
        from ton_indexer_spark.dedup.decontaminate import decontaminate

        d, b = docs
        # doc 1: 10 tokens -> 6 5-gram shingles, 5 of them hit the
        # benchmark ("the quick brown fox jumps over the lazy dog" spans
        # 9 tokens -> 5 shared shingles); 5/6 < 9/10, >= 1/2
        row = (
            decontaminate(d, b, k=5, min_hit_ratio=(9, 10))
            .filter(F.col("doc_id") == 1)
            .collect()[0]
        )
        assert row["n_shingles"] == 6 and row["n_hit"] == 5
        assert not row["contaminated"]
        row2 = (
            decontaminate(d, b, k=5, min_hit_ratio=(1, 2))
            .filter(F.col("doc_id") == 1)
            .collect()[0]
        )
        assert row2["contaminated"]


class TestPII:
    def test_counts_and_redaction(self, spark):
        from ton_indexer_spark.functions.pii import pii_counts, redact_pii

        d = spark.createDataFrame(
            [
                (1, "mail a@b.co and c.d+x@e-f.org, server 10.0.255.1, "
                    "call +1 (555) 123-4567 now"),
                (2, "no pii here at all"),
                (3, "see https://ex.com/u@v.com?q=1 and http://10.0.0.1/x"),
            ],
            "doc_id long, text string",
        )
        counts = pii_counts(F.col("text"))
        out = {
            r["doc_id"]: r
            for r in d.select(
                "doc_id",
                *[c.alias(f"n_{n}") for n, c in counts.items()],
                redact_pii(F.col("text")).alias("red"),
            ).collect()
        }
        assert out[1]["n_email"] == 2
        assert out[1]["n_ipv4"] == 1
        assert out[1]["n_phone"] == 1
        assert "<EMAIL>" in out[1]["red"] and "<IP>" in out[1]["red"]
        assert "<PHONE>" in out[1]["red"]
        assert "a@b.co" not in out[1]["red"]
        assert "10.0.255.1" not in out[1]["red"]
        assert out[2]["red"] == "no pii here at all"
        assert out[2]["n_email"] == out[2]["n_ipv4"] == out[2]["n_phone"] == 0
        # URLs are consumed whole (before email/IP), so the embedded
        # address and host IP never partially redact
        assert out[3]["n_url"] == 2
        assert out[3]["red"] == "see <URL> and <URL>"


class TestSourceMixture:
    def _df(self, spark):
        rows = [(i, f"src{i % 3}") for i in range(300)]
        return spark.createDataFrame(rows, "doc_id long, source string")

    def test_proportions_and_determinism(self, spark):
        from ton_indexer_spark.operators.sampling import source_mixture

        d = self._df(spark)
        # weights 3:1:1 but equal counts (100 each): the 3-weighted source
        # is the bottleneck -> T = 100*5/3 = 166, t = (99, 33, 33)
        out = source_mixture(
            d, "doc_id", "source", {"src0": 3, "src1": 1, "src2": 1}
        )
        by_src = {
            r["source"]: r["n"]
            for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        # hash filter hits the target in expectation; bound the deviation
        assert 80 <= by_src["src0"] <= 100
        assert 20 <= by_src["src1"] <= 46
        assert 20 <= by_src["src2"] <= 46
        # deterministic + partition-invariant
        a = sorted(r["doc_id"] for r in out.collect())
        b = sorted(
            r["doc_id"]
            for r in source_mixture(
                d.repartition(7), "doc_id", "source",
                {"src0": 3, "src1": 1, "src2": 1},
            ).collect()
        )
        assert a == b

    def test_unweighted_sources_dropped(self, spark):
        from ton_indexer_spark.operators.sampling import source_mixture

        d = self._df(spark)
        out = source_mixture(d, "doc_id", "source", {"src0": 1, "src1": 1})
        assert out.filter(F.col("source") == "src2").count() == 0

    def test_rejects_bad_weights(self, spark):
        from ton_indexer_spark.operators.sampling import source_mixture

        d = self._df(spark)
        with pytest.raises(ValueError):
            source_mixture(d, "doc_id", "source", {"src0": 0})
        with pytest.raises(ValueError):
            source_mixture(d, "doc_id", "source", {})


class TestBloom:
    def test_no_false_negatives_and_bounded_fp(self, spark):
        from ton_indexer_spark.dedup.bloom import bloom_build, bloom_probe

        ref = spark.createDataFrame(
            [(f"key{i}",) for i in range(50)], "k string"
        )
        cand = spark.createDataFrame(
            [(f"key{i}",) for i in range(40, 140)], "k string"
        )
        bloom = bloom_build(ref, "k", m_bits=4096, k_hashes=3)
        out = {r["k"]: r["maybe_member"]
               for r in bloom_probe(cand, bloom, "k", m_bits=4096,
                                    k_hashes=3).collect()}
        # Bloom guarantee: every true member reports maybe_member
        for i in range(40, 50):
            assert out[f"key{i}"]
        # false positives are rare at this load factor
        fps = sum(1 for i in range(50, 140) if out[f"key{i}"])
        assert fps <= 5

    def test_duplicate_candidate_keys(self, spark):
        from ton_indexer_spark.dedup.bloom import bloom_build, bloom_probe

        ref = spark.createDataFrame([("a",)], "k string")
        cand = spark.createDataFrame([("a",), ("a",), ("b",)], "k string")
        bloom = bloom_build(ref, "k", m_bits=1024, k_hashes=3)
        rows = bloom_probe(cand, bloom, "k", m_bits=1024, k_hashes=3).collect()
        got = sorted((r["k"], r["maybe_member"]) for r in rows)
        assert got == [("a", True), ("a", True), ("b", False)] or got[0][1]

    def test_filter_size_bounded(self, spark):
        from ton_indexer_spark.dedup.bloom import bloom_build

        ref = spark.createDataFrame(
            [(f"key{i}",) for i in range(5000)], "k string"
        )
        assert bloom_build(ref, "k", m_bits=256, k_hashes=3).count() <= 256


class TestDatasetSplit:
    def test_partition_and_stability(self, spark):
        from ton_indexer_spark.operators.sampling import dataset_split

        d = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
        out = dataset_split(d, "doc_id")
        by = {r["split"]: r["n"]
              for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
        assert sum(by.values()) == 2000
        assert by["train"] > 1900 and 0 < by.get("val", 0) < 60
        # growing the corpus never moves an existing row's split
        d2 = spark.createDataFrame([(i,) for i in range(4000)], "doc_id long")
        first = {r["doc_id"]: r["split"]
                 for r in dataset_split(d2, "doc_id").collect()}
        for r in out.collect():
            assert first[r["doc_id"]] == r["split"]

    def test_rejects_bad_weights(self, spark):
        from ton_indexer_spark.operators.sampling import dataset_split

        d = spark.createDataFrame([(1,)], "doc_id long")
        with pytest.raises(ValueError):
            dataset_split(d, "doc_id", splits=(("a", 0), ("b", 0)))


class TestFixedPerGroup:
    def test_exact_size_and_determinism(self, spark):
        from ton_indexer_spark.operators.sampling import fixed_per_group

        rows = [(i, f"g{i % 4}") for i in range(200)]
        d = spark.createDataFrame(rows, "doc_id long, g string")
        out = fixed_per_group(d, "g", "doc_id", 7)
        by = {r["g"]: r["n"]
              for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()}
        assert all(v == 7 for v in by.values())
        a = sorted(r["doc_id"] for r in out.collect())
        b = sorted(
            r["doc_id"]
            for r in fixed_per_group(d.repartition(9), "g", "doc_id", 7).collect()
        )
        assert a == b

    def test_small_group_kept_whole(self, spark):
        from ton_indexer_spark.operators.sampling import fixed_per_group

        d = spark.createDataFrame(
            [(1, "small"), (2, "small")], "doc_id long, g string"
        )
        assert fixed_per_group(d, "g", "doc_id", 10).count() == 2


class TestCharLM:
    def test_reference_like_text_scores_lower(self, spark):
        from ton_indexer_spark.functions.charlm import char_lm_score, train_char_lm

        ref = spark.createDataFrame(
            [(i, "the common english words appear here again and again")
             for i in range(5)],
            "doc_id long, text string",
        )
        model = train_char_lm(ref)
        docs = spark.createDataFrame(
            [
                (1, "the english words appear here"),
                (2, "zzzzqqqxxjjj zzzzqqq"),
                (3, "你好世界"),          # fully out-of-alphabet
                (4, ""),                   # empty
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in char_lm_score(docs, model).collect()}
        assert out[1]["nll_per_char"] < out[2]["nll_per_char"]
        assert out[3]["n_scored"] == 0 and out[3]["nll_per_char"] is None
        assert out[4]["n_scored"] == 0 and out[4]["nll_per_char"] is None
        # exact integer sum: recompute from the model
        text1 = "the english words appear here"
        expect = sum(model[c] for c in text1 if c in model)
        assert out[1]["nll_sum_scaled"] == expect

    def test_score_stage_is_shuffle_free(self, spark):
        import re

        from tests.test_explain import plan_of
        from ton_indexer_spark.functions.charlm import ALPHABET, char_lm_score

        d = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
        model = {c: 1 for c in ALPHABET}
        plan = plan_of(char_lm_score(d, model))
        assert not re.search(r"\(\d+\) Exchange", plan), plan


def test_llm_pipeline_example_runs(spark, monkeypatch, capsys):
    """The end-to-end curation example executes at sf0.001 and every stage
    is monotonically non-increasing until chunking."""
    import importlib

    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    import examples.llm_pipeline as lp

    importlib.reload(lp)
    lp.main()
    out = capsys.readouterr().out
    assert "done" in out
    counts = []
    for line in out.splitlines():
        parts = line.split("->")
        if len(parts) == 2 and parts[1].strip().isdigit():
            counts.append(int(parts[1].strip()))
    assert counts, out
    assert all(b <= a for a, b in zip(counts, counts[1:])), counts


class TestStreamingCuration:
    def test_cross_batch_dedup_and_quality(self, spark, tmp_path):
        from ton_indexer_spark.functions.charlm import train_char_lm
        from ton_indexer_spark.streaming.corpus import (
            run_curation_available_now,
        )

        ref = spark.createDataFrame(
            [(i, "plain english reference text for the model", "en", "web", 40)
             for i in range(3)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        model = train_char_lm(ref)

        good = "this document is made of plain english words and stays"
        src = tmp_path / "src"
        batch1 = [
            (1, good + " one", "en", "web", 50),
            (2, good + " one", "en", "web", 50),   # in-batch duplicate of 1
            (3, "zzqx jjqx zzqx wwqx vvqx kkqx", "en", "web", 30),  # low quality
        ]
        batch2 = [
            (4, good + " one", "en", "web", 50),   # cross-batch duplicate
            (5, good + " five", "en", "web", 50),
        ]
        cols = "doc_id long, text string, lang string, source string, n_chars long"
        spark.createDataFrame(batch1, cols).coalesce(1).write.parquet(str(src))
        spark.createDataFrame(batch2, cols).coalesce(1).write.mode(
            "append").parquet(str(src))

        out = tmp_path / "out"
        run_curation_available_now(
            spark, str(src), str(out), str(tmp_path / "ckpt"),
            model, max_nll_per_char=3_500_000,
        )
        got = spark.read.parquet(str(out))
        ids = sorted(r["doc_id"] for r in got.select("doc_id").collect())
        # 3 dropped by quality; 2 and 4 dropped as duplicates of 1
        assert 5 in ids and 3 not in ids
        fps = [r["fp"] for r in got.collect()]
        assert len(fps) == len(set(fps))
        assert len([i for i in ids if i in (1, 2, 4)]) == 1
        assert "split" in got.columns

    def test_restart_keeps_dedup_state(self, spark, tmp_path):
        from ton_indexer_spark.functions.charlm import train_char_lm
        from ton_indexer_spark.streaming.corpus import (
            run_curation_available_now,
        )

        ref = spark.createDataFrame(
            [(0, "plain english reference text", "en", "web", 28)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        model = train_char_lm(ref)
        cols = "doc_id long, text string, lang string, source string, n_chars long"
        text = "the same document text arrives in both runs exactly"
        src = tmp_path / "src"
        spark.createDataFrame(
            [(1, text, "en", "web", 50)], cols
        ).coalesce(1).write.parquet(str(src))
        out, ckpt = tmp_path / "out", tmp_path / "ckpt"
        run_curation_available_now(
            spark, str(src), str(out), str(ckpt), model, 3_500_000)
        # second run: the same content under a NEW doc_id lands later
        spark.createDataFrame(
            [(2, text, "en", "web", 50)], cols
        ).coalesce(1).write.mode("append").parquet(str(src))
        run_curation_available_now(
            spark, str(src), str(out), str(ckpt), model, 3_500_000)
        got = spark.read.parquet(str(out))
        assert got.count() == 1  # state survived the restart


class TestIncrementalNearDup:
    BASE = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")

    def _write(self, spark, path, rows, mode="overwrite"):
        cols = "doc_id long, text string, lang string, source string, n_chars long"
        spark.createDataFrame(
            [(i, t, "en", "web", len(t)) for i, t in rows], cols
        ).coalesce(1).write.mode(mode).parquet(path)

    def test_cross_batch_near_dup_dropped(self, spark, tmp_path):
        from ton_indexer_spark.streaming.corpus import (
            run_incremental_neardup_available_now,
        )

        src = str(tmp_path / "src")
        # batch 1: an original + an unrelated doc
        self._write(spark, src, [
            (1, self.BASE + " one extra"),
            (2, "totally different words about query engines and storage "
                "layers and optimizers and parquet readers working nicely"),
        ])
        # batch 2: a NEAR duplicate of doc 1 (one token changed) + fresh doc
        self._write(spark, src, [
            (3, self.BASE + " two extra"),
            (4, "fresh content with its own vocabulary entirely such as "
                "gardens rivers mountains forests meadows and valleys"),
        ], mode="append")
        out = str(tmp_path / "out")
        run_incremental_neardup_available_now(
            spark, src, out, str(tmp_path / "ckpt"))
        got = sorted(
            r["doc_id"]
            for r in spark.read.parquet(f"{out}/docs").collect()
        )
        assert 1 in got and 2 in got and 4 in got
        assert 3 not in got  # near-dup of history

    def test_batch_local_dups_keep_smallest(self, spark, tmp_path):
        from ton_indexer_spark.streaming.corpus import (
            run_incremental_neardup_available_now,
        )

        src = str(tmp_path / "src")
        self._write(spark, src, [
            (10, self.BASE + " aaa"),
            (11, self.BASE + " bbb"),   # near-dup of 10, same batch
        ])
        out = str(tmp_path / "out")
        run_incremental_neardup_available_now(
            spark, src, out, str(tmp_path / "ckpt"))
        got = sorted(
            r["doc_id"]
            for r in spark.read.parquet(f"{out}/docs").collect()
        )
        assert got == [10]


class TestPipelineProperties:
    def test_source_mixture_feasibility_invariant(self, spark):
        """For ANY weights and counts: thresholds never upsample (thr <=
        buckets) and the target total is the max feasible one."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from ton_indexer_spark.operators.sampling import source_mixture

        @settings(max_examples=8, deadline=None)
        @given(
            counts=st.lists(st.integers(min_value=1, max_value=60),
                            min_size=2, max_size=4),
            weights=st.lists(st.integers(min_value=1, max_value=9),
                             min_size=4, max_size=4),
        )
        def check(counts, weights):
            rows, i = [], 0
            for s, c in enumerate(counts):
                for _ in range(c):
                    rows.append((i, f"s{s}"))
                    i += 1
            d = spark.createDataFrame(rows, "doc_id long, source string")
            w = {f"s{s}": weights[s] for s in range(len(counts))}
            out = source_mixture(d, "doc_id", "source", w)
            by = {r["source"]: r["n"] for r in
                  out.groupBy("source").agg(F.count("*").alias("n")).collect()}
            W = sum(w[f"s{s}"] for s in range(len(counts)))
            T = min(c * W // w[f"s{s}"] for s, c in enumerate(counts))
            for s, c in enumerate(counts):
                t_s = T * w[f"s{s}"] // W
                assert by.get(f"s{s}", 0) <= c  # never upsample
                # hash filter keeps at most the target threshold share
                assert by.get(f"s{s}", 0) <= t_s + max(
                    3, t_s)  # loose statistical envelope

        check()

    def test_bloom_never_false_negative_property(self, spark):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from ton_indexer_spark.dedup.bloom import bloom_build, bloom_probe

        @settings(max_examples=5, deadline=None)
        @given(keys=st.sets(st.text(min_size=1, max_size=8), min_size=1,
                            max_size=30))
        def check(keys):
            ref = spark.createDataFrame([(k,) for k in keys], "k string")
            bloom = bloom_build(ref, "k", m_bits=512, k_hashes=3)
            out = {r["k"]: r["maybe_member"]
                   for r in bloom_probe(ref, bloom, "k", m_bits=512,
                                        k_hashes=3).collect()}
            assert all(out[k] for k in keys)  # the Bloom guarantee

        check()

    def test_charlm_score_is_exact_integer_sum(self, spark):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from ton_indexer_spark.functions.charlm import (
            ALPHABET,
            char_lm_score,
            train_char_lm,
        )

        ref = spark.createDataFrame(
            [(0, "the reference corpus text")], "doc_id long, text string")
        model = train_char_lm(ref)

        @settings(max_examples=5, deadline=None)
        @given(text=st.text(
            alphabet="abcXYZ 01.!你", min_size=0, max_size=60))
        def check(text):
            d = spark.createDataFrame(
                [(1, text)], "doc_id long, text string")
            row = char_lm_score(d, model).collect()[0]
            low = text.lower()
            expect = sum(model[c] for c in low if c in ALPHABET)
            n = sum(1 for c in low if c in ALPHABET)
            assert row["nll_sum_scaled"] == expect
            assert row["n_scored"] == n

        check()


class TestShardAssign:
    def test_complete_and_deterministic(self, spark):
        from ton_indexer_spark.operators.sampling import shard_assign

        d = spark.range(0, 200).withColumnRenamed("id", "doc_id")
        out = shard_assign(d, "doc_id", n_shards=8, seed="s")
        rows = out.collect()
        assert len(rows) == 200
        # every shard's positions are a contiguous 1..n_s sequence
        by_shard: dict[int, list[int]] = {}
        for r in rows:
            assert 0 <= r["shard"] < 8
            by_shard.setdefault(r["shard"], []).append(r["pos_in_shard"])
        assert sum(len(v) for v in by_shard.values()) == 200
        for poss in by_shard.values():
            assert sorted(poss) == list(range(1, len(poss) + 1))
        # partition-layout invariance: same assignment from 1 partition
        again = {
            (r["doc_id"]): (r["shard"], r["pos_in_shard"])
            for r in shard_assign(
                d.coalesce(1), "doc_id", n_shards=8, seed="s"
            ).collect()
        }
        assert again == {
            r["doc_id"]: (r["shard"], r["pos_in_shard"]) for r in rows
        }

    def test_seed_changes_order(self, spark):
        from ton_indexer_spark.operators.sampling import shard_assign

        d = spark.range(0, 100).withColumnRenamed("id", "doc_id")
        a = {r["doc_id"]: (r["shard"], r["pos_in_shard"])
             for r in shard_assign(d, "doc_id", 4, seed="a").collect()}
        b = {r["doc_id"]: (r["shard"], r["pos_in_shard"])
             for r in shard_assign(d, "doc_id", 4, seed="b").collect()}
        assert a != b  # astronomically unlikely to coincide


class TestBpePairCounts:
    def test_hand_counts(self, spark):
        from ton_indexer_spark.functions.bpe import bpe_pair_counts

        d = spark.createDataFrame(
            [(1, "low low lower"), (2, "low newest")],
            "doc_id long, text string",
        )
        got = {r["pair"]: r["pair_count"]
               for r in bpe_pair_counts(d, top_k=100).collect()}
        # 'low' freq 3, 'lower' 1, 'newest' 1
        assert got["l o"] == 4   # 3 in low + 1 in lower
        assert got["o w"] == 4
        assert got["w e"] == 2   # lower + newest
        assert got["e r"] == 1
        assert got["e s"] == 1
        assert "r l" not in got  # pairs never cross word boundaries

    def test_single_char_words_ignored(self, spark):
        from ton_indexer_spark.functions.bpe import bpe_pair_counts

        d = spark.createDataFrame(
            [(1, "a b c ab")], "doc_id long, text string")
        got = {r["pair"]: r["pair_count"]
               for r in bpe_pair_counts(d, top_k=10).collect()}
        assert got == {"a b": 1}


def _ref_bpe_train(corpus: list[str], n_merges: int) -> list[tuple[str, str]]:
    """Reference BPE learner (Sennrich 2016 alg.1), count-desc/pair-lex
    tiebreak — the spec the distributed trainer must reproduce."""
    from collections import Counter

    vocab = Counter()
    for text in corpus:
        for w in text.split():
            vocab[tuple(w)] += 1
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, freq in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += freq
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new_vocab = Counter()
        for syms, freq in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms)
                        and (syms[i], syms[i + 1]) == best):
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += freq
        vocab = new_vocab
    return merges


class TestBpeTrain:
    CORPUS = [
        "low low low lower lowest",
        "new newer newest newest",
        "wide wider widest low",
    ]

    def test_matches_reference_sequence(self, spark):
        from ton_indexer_spark.functions.bpe import bpe_train

        d = spark.createDataFrame(
            [(i, t) for i, t in enumerate(self.CORPUS)],
            "doc_id long, text string",
        )
        got = bpe_train(d, n_merges=12)
        want = _ref_bpe_train(self.CORPUS, 12)
        assert got == want

    def test_encode_roundtrip(self, spark):
        from ton_indexer_spark.functions.bpe import bpe_encode, bpe_train

        d = spark.createDataFrame(
            [(i, t) for i, t in enumerate(self.CORPUS)],
            "doc_id long, text string",
        )
        merges = bpe_train(d, n_merges=8)
        out = {r["doc_id"]: r["bpe_tokens"]
               for r in bpe_encode(d, merges).collect()}
        # concatenating tokens reconstructs the whitespace-joined text
        for i, text in enumerate(self.CORPUS):
            assert "".join(out[i]) == text.replace(" ", "")
        # a fully-merged frequent word surfaces as one token
        merged_units = {"".join(p) for p in merges}
        flat = [t for toks in out.values() for t in toks]
        assert any(t in merged_units and len(t) >= 3 for t in flat)

    def test_exhausted_vocab_stops_early(self, spark):
        from ton_indexer_spark.functions.bpe import bpe_train

        d = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
        got = bpe_train(d, n_merges=10)
        assert got == [("a", "b")]  # one possible merge, then dry


class TestDsir:
    def test_target_like_docs_weigh_more(self, spark):
        from ton_indexer_spark.operators.selection import dsir_weights

        target = spark.createDataFrame(
            [(100 + i, "the model trains on clean encyclopedic text")
             for i in range(5)],
            "doc_id long, text string",
        )
        raw = spark.createDataFrame(
            [
                (1, "the model trains on clean encyclopedic text"),
                (2, "buy cheap pills now click here winner prize"),
                (3, "xx yy"),
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in
               dsir_weights(raw, target, n_buckets=256).collect()}
        # per-gram average weight: target-like doc must beat spam
        avg1 = out[1]["logw_scaled"] / out[1]["n_grams"]
        avg2 = out[2]["logw_scaled"] / out[2]["n_grams"]
        assert avg1 > avg2
        assert out[1]["logw_scaled"] > 0  # more likely under target
        assert out[2]["logw_scaled"] < 0  # more likely under raw pool
        assert out[3]["n_grams"] == 1

    def test_short_docs_absent(self, spark):
        from ton_indexer_spark.operators.selection import dsir_weights

        raw = spark.createDataFrame(
            [(1, "one"), (2, ""), (3, "two tokens")],
            "doc_id long, text string",
        )
        target = spark.createDataFrame(
            [(9, "two tokens")], "doc_id long, text string")
        ids = {r["doc_id"] for r in dsir_weights(raw, target).collect()}
        assert ids == {3}


class TestIncrementalLineDedup:
    BOILER = "subscribe to our newsletter today"

    def _write(self, spark, path, rows, mode="overwrite"):
        cols = ("doc_id long, text string, lang string, source string, "
                "n_chars long")
        spark.createDataFrame(
            [(i, t, "en", "web", len(t)) for i, t in rows], cols
        ).coalesce(1).write.mode(mode).parquet(path)

    def test_cross_batch_frequency_strips_lines(self, spark, tmp_path):
        from ton_indexer_spark.streaming.corpus import (
            run_incremental_line_dedup_available_now,
        )

        src = str(tmp_path / "src")
        # batch 1: boilerplate seen in 2 docs — below min_docs=3, kept
        self._write(spark, src, [
            (1, f"unique alpha body line\n{self.BOILER}"),
            (2, f"{self.BOILER}\nanother body beta line"),
        ])
        # batch 2: a 3rd doc pushes the cumulative count to min_docs —
        # this batch's copy is stripped (history is not retro-edited)
        self._write(spark, src, [
            (3, f"gamma body line three\n{self.BOILER}"),
            (4, "delta body with no boilerplate at all"),
        ], mode="append")
        out = str(tmp_path / "out")
        run_incremental_line_dedup_available_now(
            spark, src, out, str(tmp_path / "ckpt"))
        got = {r["doc_id"]: r["text"]
               for r in spark.read.parquet(f"{out}/docs").collect()}
        assert self.BOILER in got[1] and self.BOILER in got[2]  # batch 1
        assert got[3] == "gamma body line three"  # stripped on arrival
        assert got[4] == "delta body with no boilerplate at all"

    def test_index_is_exact_and_redelivery_idempotent(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from ton_indexer_spark.streaming.corpus import (
            run_incremental_line_dedup_available_now,
        )

        src = str(tmp_path / "src")
        self._write(spark, src, [
            (1, f"one unique body line\n{self.BOILER}"),
            (2, f"{self.BOILER}\ntwo unique body line"),
        ])
        out = str(tmp_path / "out")
        run_incremental_line_dedup_available_now(
            spark, src, out, str(tmp_path / "ckpt"))
        # same drop again with a FRESH checkpoint replays batch history;
        # batch-keyed overwrite keeps docs and index without duplication
        run_incremental_line_dedup_available_now(
            spark, src, out, str(tmp_path / "ckpt2"))
        idx = spark.read.option("basePath", f"{out}/_line_index").parquet(
            f"{out}/_line_index")
        total = (
            idx.groupBy("line_digest").agg(F.sum("n_docs").alias("n"))
            .agg(F.max("n")).first()[0]
        )
        assert total == 2  # boilerplate digest counted once per doc
        docs = spark.read.parquet(f"{out}/docs")
        assert docs.count() == 2
