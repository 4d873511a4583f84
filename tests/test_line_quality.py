"""Unit semantics for line-level dedup and the hashed quality model."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def line_docs(spark):
    boiler = "subscribe to our newsletter now"
    rows = [
        (1, f"alpha unique one\n{boiler}\nbody text of doc one here"),
        (2, f"{boiler}\nanother body line entirely"),
        (3, f"closing thought three\n{boiler}"),
        # in-doc-only repetition: must be KEPT (1 distinct doc < 3)
        (4, "repeat me twice okay\nrepeat me twice okay\nfresh line four"),
        # short frequent line: below min_chars, never removed
        (5, "hi\nlong distinctive line five"),
        (6, "hi\nlong distinctive line six"),
        (7, "hi\nlong distinctive line seven"),
        # entirely boilerplate doc
        (8, boiler),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_remove_repeated_lines(spark, line_docs):
    from ton_indexer_spark.dedup.lines import remove_repeated_lines

    out = {r["doc_id"]: r for r in
           remove_repeated_lines(line_docs).collect()}
    assert out[1]["clean_text"] == (
        "alpha unique one\nbody text of doc one here"
    )
    assert out[1]["n_removed"] == 1 and out[1]["n_lines"] == 3
    # order preserved, in-doc repetition kept
    assert out[4]["clean_text"] == (
        "repeat me twice okay\nrepeat me twice okay\nfresh line four"
    )
    assert out[4]["n_removed"] == 0
    # short line survives despite appearing in 3 docs
    assert out[5]["clean_text"].startswith("hi\n")
    # fully-boilerplate doc survives as empty text
    assert out[8]["clean_text"] == "" and out[8]["n_removed"] == 1


def test_repeated_line_digests_threshold(spark, line_docs):
    from ton_indexer_spark.dedup.lines import (
        repeated_line_digests,
        split_lines,
    )

    lines = split_lines(line_docs)
    freq = repeated_line_digests(lines, min_docs=3)
    assert freq.count() == 1  # only the boilerplate line (4 docs)
    assert freq.first()["n_docs"] == 4
    assert repeated_line_digests(lines, min_docs=5).count() == 0


def test_hashed_quality_model(spark):
    from ton_indexer_spark.functions.quality_model import (
        hashed_linear_raw,
        hashed_linear_score,
        quality_logit,
        token_bucket,
    )

    df = spark.createDataFrame(
        [("hello",), ("",), ("hello hello",)], "text string"
    )
    rows = df.select(
        token_bucket(F.lit("hello")).alias("b"),
        hashed_linear_raw(F.col("text")).alias("raw"),
        hashed_linear_score(F.col("text")).alias("score"),
        quality_logit(hashed_linear_score(F.col("text"))).alias("p"),
    ).collect()
    # md5('hello')[:8] = 0x5d41402a = 1564557354; bucket = % 1024
    b = 1564557354 % 1024
    w = (b * 2654435761) % 2048 - 1024
    assert rows[0]["b"] == b
    assert rows[0]["raw"] == w
    assert rows[1]["raw"] == 0 and rows[1]["score"] == 0.0
    assert rows[2]["raw"] == 2 * w  # additive over tokens
    assert rows[0]["score"] == w / 1024.0
    assert 0.0 < rows[0]["p"] < 1.0


def test_quality_plan_is_map_only(spark):
    """The scorer must not shuffle: one scan, no Exchange in the plan."""
    from ton_indexer_spark.functions.quality_model import hashed_linear_score

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        docs.select("doc_id", hashed_linear_score(F.col("text")).alias("s"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def _py_line_dedup(docs, min_docs=3, min_chars=10):
    """Pure-Python oracle for remove_repeated_lines."""
    from collections import defaultdict

    by_line = defaultdict(set)
    for did, text in docs:
        for ln in text.split("\n"):
            if len(ln.strip()) >= min_chars:
                by_line[ln.strip()].add(did)
    frequent = {ln for ln, ds in by_line.items() if len(ds) >= min_docs}
    out = {}
    for did, text in docs:
        lines = text.split("\n")
        kept = [ln for ln in lines if ln.strip() not in frequent
                or len(ln.strip()) < min_chars]
        out[did] = ("\n".join(kept), len(lines), len(lines) - len(kept))
    return out


def test_line_dedup_matches_python_oracle(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ton_indexer_spark.dedup.lines import remove_repeated_lines

    # small line vocabulary forces cross-doc collisions
    line = st.sampled_from([
        "boilerplate banner line", "cookie consent notice here",
        "unique snowflake", "short", "another body sentence goes here",
        "", "  padded line with spaces  ",
    ])
    doc = st.lists(line, min_size=1, max_size=6).map("\n".join)
    corpus = st.lists(doc, min_size=1, max_size=8)

    @settings(max_examples=15, deadline=None)
    @given(corpus)
    def check(texts):
        docs = list(enumerate(texts))
        sdf = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_removed"])
            for r in remove_repeated_lines(sdf).collect()
        }
        assert got == _py_line_dedup(docs)

    check()
