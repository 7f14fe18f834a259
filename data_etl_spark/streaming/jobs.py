"""Structured Streaming layer (SURVEY.md §2.10, Phase 4).

The reference's incremental behaviors (N1 skip-processed, N2
create-if-missing, N3 idempotent re-ingestion) map to Spark as:
- file-source streaming with Trigger.AvailableNow (exactly-once batch
  drain of whatever is new),
- watermarked event-time windows for late data,
- foreachBatch + merge_by_key for idempotent upserts (exercised in
  tests/test_streaming.py against a tmp dir).

The streaming tumbling agg below produces, in complete mode, exactly the
batch tumbling result — which is what makes it oracle-checkable even
though it runs through the streaming engine.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # nanos (nanosAsLong)
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over events.parquet with the ns->µs conversion."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def run_to_memory(df: DataFrame, output_mode: str = "complete") -> DataFrame:
    """Drain a streaming DataFrame with Trigger.AvailableNow into an
    in-memory table and return it as a batch DataFrame."""
    name = f"stream_{uuid.uuid4().hex[:12]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(name)


def streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked 10-minute tumbling aggregation through the streaming
    engine (complete mode: no rows dropped, matches the batch oracle)."""
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )
    out = run_to_memory(agg, output_mode="complete")
    return out.select(
        F.unix_timestamp("w.start").alias("window_start"), "n_events", "sum_value"
    )
