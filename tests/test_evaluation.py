"""binary_auc unit tests — hand-computed Mann-Whitney with ties."""

from __future__ import annotations

from pyspark.sql import functions as F

from ton_indexer_spark.operators.evaluation import binary_auc


def _auc(spark, rows, threshold=0):
    df = spark.createDataFrame(rows, "score long, y boolean")
    return binary_auc(df, F.col("score"), F.col("y"), threshold).first()


def test_perfect_separation(spark):
    r = _auc(spark, [(10, True), (9, True), (1, False), (0, False)])
    assert r["auc"] == 1.0 and r["u2"] == 2 * 2 * 2 * 2 / 2  # 2*U, U=4
    # threshold 0: predicted positive = score > 0 -> {10,9} tp, {1} fp
    assert (r["tp"], r["fp"], r["tn"], r["fn"]) == (2, 1, 1, 0)


def test_reversed_separation(spark):
    r = _auc(spark, [(0, True), (1, True), (9, False), (10, False)])
    assert r["auc"] == 0.0 and r["u2"] == 0


def test_ties_count_half(spark):
    # pos scores {1}, neg scores {1}: one tied pair -> AUC 0.5
    r = _auc(spark, [(1, True), (1, False)])
    assert r["u2"] == 1  # 2*U = 2*0.5
    assert r["auc"] == 0.5


def test_hand_computed_mixed(spark):
    # pos: 3, 1; neg: 2, 1. pairs: (3,2)W (3,1)W (1,2)L (1,1)T
    # U = 2 + 0.5 = 2.5 -> u2 = 5; AUC = 2.5/4 = 0.625
    r = _auc(spark, [(3, True), (1, True), (2, False), (1, False)])
    assert r["u2"] == 5
    assert r["auc"] == 0.625
    assert (r["npos"], r["nneg"]) == (2, 2)
    # threshold 0: all four scores > 0 -> tp=2 fp=2 tn=0 fn=0
    assert (r["tp"], r["fp"], r["tn"], r["fn"]) == (2, 2, 0, 0)


def test_confusion_threshold(spark):
    r = _auc(spark, [(3, True), (1, True), (2, False), (1, False)],
             threshold=1)
    # score > 1 predicted positive: tp={3}, fp={2}, tn={1}, fn={1}
    assert (r["tp"], r["fp"], r["tn"], r["fn"]) == (1, 1, 1, 1)


def test_no_single_partition_window(spark):
    df = spark.createDataFrame(
        [(i, i % 3 == 0) for i in range(1000)], "score long, y boolean"
    )
    plan = (
        binary_auc(df, F.col("score"), F.col("y"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the prefix-sum path partitions windows by spark_partition_id, never
    # by the empty frame (a global single-partition sort)
    assert "Window [" not in plan or "_pid" in plan


def test_zero_class_auc_is_null(spark):
    # single-class input: 0 ranking pairs, AUC undefined -> NULL, never NaN
    r = _auc(spark, [(3, True), (1, True)])
    assert (r["npos"], r["nneg"]) == (2, 0)
    assert r["auc"] is None
    r = _auc(spark, [(3, False)])
    assert (r["npos"], r["nneg"]) == (0, 1)
    assert r["auc"] is None


def test_empty_input_auc(spark):
    df = spark.createDataFrame([], "score long, y boolean")
    r = binary_auc(df, F.col("score"), F.col("y")).first()
    assert (r["npos"], r["nneg"]) == (0, 0)
    assert r["auc"] is None
