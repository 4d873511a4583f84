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
