"""Structured Streaming surface for the events table.

The reference is batch/request-driven (SURVEY §2.9: no streaming operators),
but the engine's event-ingest path uses Structured Streaming so late data
and incremental tile refreshes are first-class:

  windowed_counts — readStream → watermark → tumbling window agg. The batch
      twin is queries.events_window_5m (oracle-checked); this streaming
      version must produce the same aggregates when run to completion with
      Trigger.AvailableNow over the same input.

(The streaming faces of the TILE pipeline — incremental per-tile counts and
the batch-as-time-salt incremental tile build — live in streaming/tiles.py.)

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


# ---------------------------------------------------------------------------
# custom stateful operator: session windows via applyInPandasWithState
# ---------------------------------------------------------------------------

SESSION_GAP_S = 1800

_SESS_OUT = "user_id long, n_sessions long, n_events long"
_SESS_STATE = "ts_list array<long>"


def sessionize_stream(spark: SparkSession, events_path: str,
                      gap_s: int = SESSION_GAP_S,
                      watermark: str = "1 day") -> DataFrame:
    """Per-user session counting as a CUSTOM STATEFUL streaming operator
    (applyInPandasWithState) — the engine's applyInPandasWithState surface
    for operators Spark's built-in windows can't express. State = the
    user's event timestamps seen so far; on every trigger the handler
    re-derives (n_sessions, n_events) with the same 30-min-gap rule as the
    batch twin queries.events_sessionize (oracle-checked), so
    batch/stream parity is testable with Trigger.AvailableNow.

    Scale shape: state is per-user, partitioned by the groupBy key; the
    store is RocksDB-backed on a real cluster. (A production variant would
    keep only (last_ts, n_sessions, n_events) per user — O(1) state — and
    emit with the event-time timeout; the list form keeps the handler
    re-derivable and exactly matchable against the batch oracle at test
    scale.)"""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    static = spark.read.parquet(events_path)
    stream = (spark.readStream.schema(static.schema).parquet(events_path)
              .withColumn("ts", F.col("ts").cast("timestamp")))

    def handle(key, pdfs, state: GroupState):
        ts = list(state.get[0]) if state.exists else []
        for pdf in pdfs:
            ts.extend(int(v) for v in
                      (pdf["ts"].astype("int64") // 1_000_000_000).tolist())
        ts.sort()
        state.update((ts,))
        n_sessions = 0
        prev = None
        for t in ts:
            if prev is None or t - prev > gap_s:
                n_sessions += 1
            prev = t
        yield pd.DataFrame({"user_id": [int(key[0])],
                            "n_sessions": [n_sessions],
                            "n_events": [len(ts)]})

    return (stream
            .withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(handle, _SESS_OUT, _SESS_STATE,
                                    "update", GroupStateTimeout.NoTimeout))


def run_available_now_update(df: DataFrame, query_name: str) -> list:
    """Run an update-mode stateful query to completion; return the LATEST
    row per first output column (memory sink keeps every update)."""
    q = (df.writeStream
         .format("memory")
         .queryName(query_name)
         .outputMode("update")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    spark = df.sparkSession
    rows = spark.sql(f"SELECT * FROM {query_name}").collect()
    latest = {}
    for r in rows:  # memory sink appends updates in trigger order
        latest[r[0]] = r
    return list(latest.values())
