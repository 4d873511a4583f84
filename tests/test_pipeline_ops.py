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
