"""Structured Streaming twins of the batch event-time operators.

The reference is daily batch with no streaming at all (SURVEY.md §2.9);
this is the Spark-native extension: readStream → watermark → windowed agg
→ sink. Locally a parquet directory drives the stream to completion
synchronously (processAllAvailable); in production the source would be
Kafka/files and the sink a Delta/parquet table with checkpointing.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import configure_session

EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # raw nanos (nanosAsLong read)
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def hourly_event_stream(spark: SparkSession, sf_dir: str, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1-hour windowed aggregate as a streaming query, run to
    completion on the static events parquet and returned as a static
    DataFrame (memory sink, complete mode so all windows emit).

    Semantically identical to the batch events_hourly query — the oracle
    is the same SQL. The watermark bounds state at scale; with complete
    mode on a finite source it does not drop output."""
    configure_session(spark)
    # The file source needs a directory; events.parquet is a single file,
    # so stream the sf dir with a glob filter pinned to it.
    stream = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    name = f"hourly_events_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.table(name)
        .select(
            F.col("win.start").alias("hour"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
