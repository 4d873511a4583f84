"""Structured Streaming windowed aggregation with watermark (late-data
handling — the §2.8 'absent in reference' operators, available here)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from ton_indexer_spark.functions.timecols import epoch_us


def test_windowed_stream_with_watermark(spark, tmp_path):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    src = str(tmp_path / "src")
    ev.write.parquet(src)

    schema = spark.read.parquet(src).schema
    raw = spark.readStream.schema(schema).parquet(src)
    stream = (
        raw
        .withColumn("tsx", F.timestamp_micros(epoch_us(raw, "ts")))
        .withWatermark("tsx", "1 hour")
        .groupBy(F.window("tsx", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("win_agg")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["w"]["start"], r["event_type"]): r["n"]
        for r in spark.sql("select * from win_agg").collect()
    }
    assert got  # closed windows were emitted

    # emitted (closed) windows must agree with the batch computation
    batch = (
        ev.withColumn("tsx", F.timestamp_micros(epoch_us(ev, "ts")))
        .groupBy(F.window("tsx", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    want = {
        (r["w"]["start"], r["event_type"]): r["n"] for r in batch.collect()
    }
    for key, n in got.items():
        assert want[key] == n


def test_streaming_sessions_match_batch_for_closed(spark, tmp_path):
    """applyInPandasWithState gap-sessionizer: cross-batch state carries
    the open session, a past-gap event closes and emits it, and closed
    sessions agree with the batch sessionize_by_gap result."""
    import datetime as dt

    from pyspark.sql import functions as F

    from ton_indexer_spark.operators.sessionize import sessionize_by_gap
    from ton_indexer_spark.streaming.sessions import streaming_sessions

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)

    def ev(eid, uid, minutes):
        return (eid, t0 + dt.timedelta(minutes=minutes), uid, "view", 1.0, "{}")

    cols = ("event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string")
    drop1 = [ev(1, 1, 0), ev(2, 1, 10), ev(3, 2, 0)]
    drop2 = [ev(4, 1, 120), ev(5, 1, 121)]     # gap > 30min: closes session 1
    src = str(tmp_path / "src")
    spark.createDataFrame(drop1, cols).coalesce(1).write.parquet(src)
    spark.createDataFrame(drop2, cols).coalesce(1).write.mode(
        "append").parquet(src)

    gap_us = 1800 * 1_000_000
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = str(tmp_path / "sessions")
    (
        streaming_sessions(stream, gap_us)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    closed = {
        (r["user_id"], r["session_seq"]):
            (r["n_events"], r["start_us"], r["end_us"])
        for r in spark.read.parquet(out).collect()
    }
    # user 1 session 1 closed by the past-gap event in drop 2
    assert (1, 1) in closed
    n, start, end = closed[(1, 1)]
    assert n == 2 and (end - start) == 600 * 1_000_000
    # user 2's session closed via EVENT-TIME TIMEOUT: drop 2 advanced
    # the watermark (t0+121min - 1h) past user 2's end + gap (t0+30min)
    assert (2, 1) in closed and closed[(2, 1)][0] == 1

    # batch parity on the closed session
    from ton_indexer_spark.functions.timecols import epoch_us

    ev_df = spark.read.parquet(src)
    sess = sessionize_by_gap(ev_df, "user_id", "ts", gap_us,
                             tiebreakers=["event_id"])
    sess = sess.withColumn("_ts_us", epoch_us(sess, "ts"))
    batch = {
        (r["user_id"], r["session_seq"]):
            (r["n_events"], r["start_us"], r["end_us"])
        for r in sess.groupBy("user_id", "session_seq")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.min("_ts_us").alias("start_us"),
             F.max("_ts_us").alias("end_us"))
        .collect()
    }
    for k, v in closed.items():
        assert batch[k] == v


def test_streaming_sessions_seq_survives_timeout(spark, tmp_path):
    """After a timeout-close, the per-user counter is retained: the next
    session numbers seq+1 instead of colliding at (user, 1); an
    in-watermark straggler older than the open session closes as its own
    session, leaving the open session's count/start intact."""
    import datetime as dt

    from ton_indexer_spark.streaming.sessions import streaming_sessions

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)

    def ev(eid, uid, minutes):
        return (eid, t0 + dt.timedelta(minutes=minutes), uid, "view", 1.0, "{}")

    cols = ("event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string")
    src = str(tmp_path / "src")
    # drop 1: user 1 session [0]; user 9 far ahead drives the watermark
    spark.createDataFrame(
        [ev(1, 1, 0), ev(2, 9, 200)], cols
    ).coalesce(1).write.parquet(src)
    # drop 2: user 1 returns much later (session 1 closed via timeout in
    # between), plus a straggler 40 min older than the new session but
    # within the 1h watermark
    spark.createDataFrame(
        [ev(3, 1, 260), ev(4, 1, 220)], cols
    ).coalesce(1).write.mode("append").parquet(src)
    gap_us = 1800 * 1_000_000
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = str(tmp_path / "out")
    (
        streaming_sessions(stream, gap_us)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    rows = {
        (r["user_id"], r["session_seq"]): r
        for r in spark.read.parquet(out).collect()
    }
    u1_seqs = sorted(s for u, s in rows if u == 1)
    # session 1 (timeout-closed) and the straggler session carry DISTINCT
    # seq numbers; no (1, 1) collision
    assert len(u1_seqs) == len(set(u1_seqs))
    assert 1 in u1_seqs and len(u1_seqs) >= 2
    assert rows[(1, 1)]["n_events"] == 1  # the t0 session, not merged
