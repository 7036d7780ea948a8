"""Scan-layout guard shared by the table readers.

The sandbox test tables are each ONE parquet row group, and a row group
is Spark's atomic split unit — so a plain `read.parquet` scan runs every
map-side operator downstream of it on a single task regardless of core
count (guide §2.5 "input skew: one huge unsplittable file"). The dedup
signature pipeline (interpreted higher-order shingle/minhash
expressions) measured 32x under-parallelized because of this. A real
corpus table has thousands of row groups and takes the no-op branch; the
rebalance is keyless round-robin of the raw rows, so results are
unchanged under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_split(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan, repartitioned to session parallelism when the file
    layout cannot split (fewer scan partitions than cores)."""
    df = spark.read.parquet(path)
    par = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        df = df.repartition(par)
    return df
