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


def lsh_pairs_stream(spark: SparkSession, docs_path: str, store_dir: str,
                     query_name: str = "lsh_pairs_stream",
                     max_files_per_trigger: int | None = None):
    """Incremental MinHash/LSH near-dup: the streaming twin of
    queries.dedup_lsh_pairs.

    Per micro-batch (foreachBatch):
      1. derive the batch's (doc_id, band, band_key) rows with the SAME
         row-local signature pipeline the batch path uses
         (operators.dedup.minhash_bands_from_docs — no token shuffle);
      2. join them against the ACCUMULATED band store plus themselves —
         a pair (a, b) surfaces exactly once, in the micro-batch where
         the later of the two documents arrives;
      3. append the batch's bands to the store (parquet, partitioned by
         band — the jobs/dedup_signatures.py table shape) and the found
         pairs to <store_dir>/pairs.

    At corpus scale the store is the materialized signature table the
    batch jobs already write; each trigger's work is |batch| × its band
    buckets, never a recompute of history. Returns the StreamingQuery;
    read <store_dir>/pairs for the accumulated result."""
    import os

    from ..operators.dedup import minhash_bands_from_docs

    bands_dir = os.path.join(store_dir, "bands")
    pairs_dir = os.path.join(store_dir, "pairs")

    def step(batch_df: DataFrame, batch_id: int):
        sess = batch_df.sparkSession
        bands_new = minhash_bands_from_docs(batch_df).persist()
        try:
            has_store = os.path.isdir(bands_dir) and any(
                "batch_id=" in f for f in os.listdir(bands_dir))
            if has_store:
                # only PRIOR batches: a replayed batch must not see its own
                # previous (partially written) rows as history
                store = (sess.read.parquet(bands_dir)
                         .where(F.col("batch_id") < batch_id)
                         .drop("batch_id"))
                everything = store.unionByName(bands_new)
            else:
                everything = bands_new
            pairs = (bands_new.alias("a")
                     .join(everything.alias("b"),
                           (F.col("a.band") == F.col("b.band"))
                           & (F.col("a.band_key") == F.col("b.band_key"))
                           & (F.col("a.doc_id") != F.col("b.doc_id")))
                     .select(F.least("a.doc_id", "b.doc_id").alias("doc_a"),
                             F.greatest("a.doc_id", "b.doc_id").alias("doc_b"))
                     .distinct())
            # batch_id-partitioned dynamic overwrite (the streaming/tiles
            # pattern): a replayed batch replaces its own partition, so the
            # store and the pair log stay exactly-once under restart
            for frame, path in ((pairs, pairs_dir), (bands_new, bands_dir)):
                (frame.withColumn("batch_id", F.lit(int(batch_id)))
                      .write.mode("overwrite").partitionBy("batch_id")
                      .option("partitionOverwriteMode", "dynamic")
                      .parquet(path))
        finally:
            bands_new.unpersist()

    static = spark.read.parquet(docs_path)
    reader = spark.readStream.schema(static.schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(docs_path)
    return (stream.writeStream
            .foreachBatch(step)
            .queryName(query_name)
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(store_dir, "ckpt"))
            .start())


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


def paragraph_keeplist_stream(spark: SparkSession,
                              docs_path: str,
                              segment: str = "words:8") -> DataFrame:
    """Streaming CCNet paragraph dedup: the keep-list of first-seen
    paragraph hashes as an append-mode stream — each distinct normalized
    paragraph passes through exactly once (arrival order decides the
    keeper, the natural streaming reading of batch keep-first), later
    repeats drop against the state store. Segmentation/normalization/
    hashing are the SAME map-side expressions the batch operator uses
    (operators/dedup.paragraph_rows), so the hash universe is identical;
    state shards by the hash like the batch window."""
    from ..operators.dedup import paragraph_rows

    stream = _docs_stream(spark, docs_path)
    return (paragraph_rows(stream, "doc_id", "text", segment)
            .select("doc_id", "pos", "h")
            .dropDuplicates(["h"]))
