"""Streaming dedup — the incremental face of the corpus dedup operators.

A crawl is a stream: new document batches arrive continuously, and the
dedup decision ("have I seen these bytes?") must hold across batches.
Structured Streaming keeps the seen-set as operator state, so the same
declarative plan the batch path runs (md5-groupBy, queries.dedup_exact)
becomes an incremental one:

  * `exact_dedup_stream` — running (hash → keep_id, n_dups) aggregate,
    complete mode; state is one row per distinct document hash.
  * `distinct_docs_stream` — append-mode dropDuplicates on the hash:
    emits each NEW document exactly once, suppresses every later
    duplicate — the keep-list as a stream.

At corpus scale the seen-set state lives in the state store (RocksDB on
a real cluster) and is sharded by the hash — the same partitioning the
batch groupBy uses, so the scale shape is identical. Tests drive both
with availableNow over the static documents parquet and compare to the
batch oracle (the driver-gate query dedup_exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs_stream(spark: SparkSession, docs_path: str) -> DataFrame:
    static = spark.read.parquet(docs_path)
    return spark.readStream.schema(static.schema).parquet(docs_path)


def exact_dedup_stream(spark: SparkSession, docs_path: str) -> DataFrame:
    """Running exact-dedup aggregate over the document stream: one row per
    distinct md5(text) with the kept (minimum) doc_id and duplicate
    count — the streaming twin of queries.dedup_exact."""
    stream = _docs_stream(spark, docs_path)
    return (stream.groupBy(F.md5("text").alias("h"))
                  .agg(F.min("doc_id").alias("keep_id"),
                       F.count("*").alias("n_dups")))


def distinct_docs_stream(spark: SparkSession, docs_path: str) -> DataFrame:
    """Append-mode keep-list: each distinct document hash passes through
    exactly once (first arrival wins); later duplicates are dropped
    against the state store."""
    stream = _docs_stream(spark, docs_path)
    return (stream.withColumn("h", F.md5("text"))
                  .select("doc_id", "h")
                  .dropDuplicates(["h"]))


def run_available_now_append(df: DataFrame, query_name: str) -> list:
    """Drain an append-mode stream over all available input (memory sink)."""
    q = (df.writeStream
         .format("memory")
         .queryName(query_name)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return df.sparkSession.sql(f"SELECT * FROM {query_name}").collect()
