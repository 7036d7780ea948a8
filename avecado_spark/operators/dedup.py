"""Deduplication operators over the documents table (training-data pipeline).

Engine ops a 100 TB web-text corpus needs, each built twice from one spec:
a Spark DataFrame plan and a DuckDB oracle SQL string (exact value parity —
every hash is md5 over identical strings, every number integer or a single
IEEE op):

  exact          — md5(text) groups, keep lowest doc_id (hash-groupBy dedup)
  minhash + LSH  — word-3-gram shingles → H=8 md5-based min-hashes →
                   B=4 bands of 2 rows → band-bucket self-join → candidate
                   pairs. Lexicographic min over md5 hex strings is a valid
                   min-hash (uniform over permutations of the shingle space).
  n-gram jaccard — exact jaccard over distinct shingle sets for LSH
                   candidate pairs (verification pass after LSH recall).
  simhash        — 60-bit simhash from per-token md5s (sign of ±1 sums per
                   bit); hamming-adjacent docs are near-dups.
  embedding near-dup — cosine > threshold pairs over the embeddings table
                   (brute-force; the scale path is the LSH/IVF bucketing in
                   operators/similarity.py).

Scale notes (10^12 docs): every op here is shuffle-minimal — shingling and
hashing are map-side; the minhash signature is ONE groupBy(doc_id); the LSH
join shuffles only (band_key, doc_id) pairs (tiny vs text); the jaccard
verification joins only candidate pairs (LSH keeps that set near-linear).
Exact-dup md5 grouping is the canonical first pass that shrinks everything
downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

N_HASHES = 8
N_BANDS = 4  # 2 rows per band
SHINGLE = 3


# ---------------------------------------------------------------------------
# shingles: word 3-grams via lead() over tokenized text — identical relational
# formulation in Spark and DuckDB (no engine-specific array slicing).
# ---------------------------------------------------------------------------

def shingles_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "tok"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    sh = (toks
          .withColumn("t1", F.lead("tok", 1).over(w))
          .withColumn("t2", F.lead("tok", 2).over(w))
          .where(F.col("t2").isNotNull())
          .select("doc_id",
                  F.concat_ws(" ", "tok", "t1", "t2").alias("shingle")))
    return sh


SHINGLES_SQL = """(
  WITH toks AS (
    SELECT doc_id, unnest(arr) AS tok, generate_subscripts(arr, 1) AS pos
    FROM (SELECT doc_id, string_split(text, ' ') AS arr FROM documents)
  ), led AS (
    SELECT doc_id, tok,
           lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t1,
           lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS t2
    FROM toks
  )
  SELECT doc_id, tok || ' ' || t1 || ' ' || t2 AS shingle
  FROM led WHERE t2 IS NOT NULL
)"""


# ---------------------------------------------------------------------------
# minhash signatures + LSH bands
# ---------------------------------------------------------------------------

def minhash_bands_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = shingles_df(spark, sf_dir)
    aggs = [F.min(F.md5(F.concat(F.col("shingle"), F.lit(f"#{h}")))).alias(f"s{h}")
            for h in range(N_HASHES)]
    sig = sh.groupBy("doc_id").agg(*aggs)
    bands = []
    for b in range(N_BANDS):
        bands.append(sig.select(
            "doc_id", F.lit(b).alias("band"),
            F.md5(F.concat(F.col(f"s{2 * b}"), F.col(f"s{2 * b + 1}"))).alias("band_key")))
    out = bands[0]
    for b in bands[1:]:
        out = out.unionAll(b)
    return out


def minhash_bands_sql() -> str:
    mins = ", ".join(
        f"min(md5(shingle || '#{h}')) AS s{h}" for h in range(N_HASHES))
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, md5(s{2*b} || s{2*b+1}) AS band_key FROM sig"
        for b in range(N_BANDS))
    return f"""(
      WITH sig AS (
        SELECT doc_id, {mins} FROM {SHINGLES_SQL} sh GROUP BY doc_id
      )
      {band_selects}
    )"""


def lsh_pairs_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    bands = minhash_bands_df(spark, sf_dir)
    a = bands.alias("a")
    b = bands.alias("b")
    return (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.band_key") == F.col("b.band_key"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"))
             .distinct())


def lsh_pairs_sql() -> str:
    return f"""(
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM {minhash_bands_sql()} a
      JOIN {minhash_bands_sql()} b
        ON a.band = b.band AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
    )"""


# ---------------------------------------------------------------------------
# simhash (60-bit, per-token md5 sign sums)
# ---------------------------------------------------------------------------

def simhash_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    h = toks.select(
        "doc_id",
        F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long").alias("h"))
    bits = h.select("doc_id", "h", F.explode(F.sequence(F.lit(0), F.lit(59))).alias("b"))
    contrib = bits.select(
        "doc_id", "b",
        F.when(F.expr("shiftright(h, cast(b as int)) & 1") == 1,
               F.lit(1)).otherwise(F.lit(-1)).alias("c"))
    bitvals = (contrib.groupBy("doc_id", "b")
               .agg(F.sum("c").alias("s"))
               .select("doc_id",
                       F.when(F.col("s") > 0,
                              F.expr("shiftleft(cast(1 as bigint), cast(b as int))"))
                        .otherwise(F.lit(0).cast("long")).alias("v")))
    return bitvals.groupBy("doc_id").agg(F.sum("v").alias("simhash"))


SIMHASH_SQL = """(
  WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
  ), h AS (
    SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks
  ), bits AS (
    SELECT doc_id, h, r.range AS b FROM h, range(60) r
  ), contrib AS (
    SELECT doc_id, b, CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END AS c
    FROM bits
  ), bitvals AS (
    SELECT doc_id,
           CASE WHEN sum(c) > 0 THEN (1::BIGINT << b) ELSE 0 END AS v
    FROM contrib GROUP BY doc_id, b
  )
  SELECT doc_id, sum(v)::BIGINT AS simhash FROM bitvals GROUP BY doc_id
)"""
