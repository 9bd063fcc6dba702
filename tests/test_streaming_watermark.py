"""Watermark semantics with real multi-batch progression: a second
micro-batch arriving entirely behind the watermark must be dropped in
append mode. This is the state-bounding contract that keeps streaming
aggregations at fixed memory on unbounded input."""

import pytest

pytestmark = pytest.mark.slow  # heavy sweep: excluded from the fast lane (pytest -m "not slow")

import datetime
import uuid

from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("k", T.StringType()),
        T.StructField("v", T.LongType()),
    ]
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_watermark_drops_late_batch(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def ts(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    # batch 1: events up to 10:00 — watermark will advance to max - 10min
    _write_batch(spark, src, [(ts(0), "a", 1), (ts(600), "a", 1)])

    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("win"), "k")
        .agg(F.count("*").alias("n"))
    )
    name = f"wm_{uuid.uuid4().hex[:8]}"
    q = agg.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
        # batch 2: an event 9 hours behind the watermark → must be dropped;
        # plus one ahead that advances the stream
        _write_batch(spark, src, [(ts(60), "a", 1), (ts(700), "a", 1)])
        q.processAllAvailable()
        # batch 3: push watermark far forward so all open windows close/emit
        _write_batch(spark, src, [(ts(10000), "a", 1)])
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["win"]["start"], r["k"]): r["n"]
        for r in spark.table(name).collect()
    }
    # after batch 1 the watermark is 10:00 - 10min = 09:50, so batch 2's
    # ts(60)=01:00 row (window closing 02:00) is behind it → dropped;
    # its window must never emit. On-time rows emit one row per window.
    assert got[(t0, "a")] == 1
    assert (ts(60), "a") not in got, got  # late row's window never emitted
    assert got[(ts(600), "a")] == 1  # 10:00 window
    assert got[(ts(660), "a")] == 1  # 11:00 window (the on-time ts(700) row)


def test_checkpoint_recovery_exactly_once(spark, tmp_path):
    """Stop/restart a streaming query against the same checkpoint: the
    restarted query must resume from the offset log and NOT reprocess
    batch-1 files — the file-sink output stays exactly-once across the
    restart."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    _write_batch(spark, src, [(t0, "a", 1), (t0, "b", 2)])

    def start():
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        return (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert spark.read.parquet(out).count() == 2

    # new data lands while the query is DOWN; restart from the checkpoint
    _write_batch(spark, src, [(t0, "c", 3)])
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(r.k for r in spark.read.parquet(out).collect())
    assert got == ["a", "b", "c"], got  # no duplicates, nothing lost


def test_trigger_available_now_drains_and_stops(spark, tmp_path):
    """Trigger.AvailableNow: process everything currently available in
    bounded micro-batches, then stop on its own — the batch-like way to
    run a streaming pipeline on a schedule."""
    src = str(tmp_path / "an_src")
    t0 = datetime.datetime(2024, 1, 1)
    _write_batch(spark, src, [(t0, "a", 1), (t0, "b", 2)])
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    agg = stream.groupBy("k").agg(F.count("*").alias("n"))
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("an_counts")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "AvailableNow query did not self-terminate"
    got = {r.k: r.n for r in spark.table("an_counts").collect()}
    assert got == {"a": 1, "b": 1}


def test_rate_source_smoke(spark):
    """The rate source (synthetic benchmark stream) produces monotonically
    increasing values — smoke the second built-in streaming source."""
    stream = spark.readStream.format("rate").option("rowsPerSecond", "100").load()
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("rate_smoke")
        .start()
    )
    try:
        import time as _t

        deadline = _t.time() + 30
        while _t.time() < deadline and spark.table("rate_smoke").count() == 0:
            _t.sleep(0.5)
        rows = spark.table("rate_smoke").collect()
    finally:
        q.stop()
    assert rows, "rate source produced nothing in 30s"
    vals = sorted(r.value for r in rows)
    assert vals == list(range(vals[0], vals[0] + len(vals)))
