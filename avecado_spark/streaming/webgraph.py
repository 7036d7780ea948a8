"""Streaming web-graph — the incremental face of operators/webgraph.

A crawl delivers pages continuously; link extraction is stateless (a
page's outlinks depend on that page alone), so the SAME mapInPandas
kernel the batch path uses runs unchanged over the stream. In-degree is
a running aggregate: state is one row per target url, sharded by url in
the state store — the identical partitioning the batch groupBy uses, so
the scale shape carries over.

  * `links_stream` — canonical outlinks per arriving page, append mode
    (stateless; exactly the batch operator applied to a readStream).
  * `indegree_stream` — running (url → in_cnt, top_anchor) aggregate,
    complete mode, after a stream-static join against the known url set
    (the frontier/corpus table) to drop dead links. Distinct-anchor
    counting is NOT incremental (streaming aggs can't hold per-group
    distinct sets); the streaming twin carries count + min-anchor, and
    tests compare exactly those columns to the batch
    indegree_signals.

Tests drive both with availableNow over a parquet copy of the pages
table and compare against the batch operators (same gate as
streaming/dedup.py's twins)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.webgraph import extract_links


def _pages_stream(spark: SparkSession, pages_path: str) -> DataFrame:
    static = spark.read.parquet(pages_path)
    return spark.readStream.schema(static.schema).parquet(pages_path)


def links_stream(spark: SparkSession, pages_path: str) -> DataFrame:
    """Canonical outlinks of each arriving page — the batch extractor
    over a stream (stateless, append mode, still shuffle-free)."""
    return extract_links(_pages_stream(spark, pages_path))


def indegree_stream(spark: SparkSession, pages_path: str) -> DataFrame:
    """Running in-degree + min-anchor per live target url (complete
    mode). Dead links drop via a stream-static join against the known
    url set read from the same corpus table."""
    links = links_stream(spark, pages_path).select("dst_url", "anchor")
    live = spark.read.parquet(pages_path) \
                .select(F.col("url").alias("dst_url")).distinct()
    return (links.join(live, "dst_url")
                 .groupBy("dst_url")
                 .agg(F.count("*").alias("in_cnt"),
                      F.min("anchor").alias("top_anchor"))
                 .withColumnRenamed("dst_url", "url"))
