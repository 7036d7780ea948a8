"""Text analysis operators over the documents table.

Training-data pipeline primitives: language-ID (marker-token heuristic),
quality scoring (length / token statistics / stopword ratio), token
counting, and document fingerprinting. All pure relational plans (split +
explode + join + groupBy) with exact DuckDB twins — no floats except single
divisions of identical integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# marker tokens per language (the synthetic corpus vocabulary is English-ish;
# real corpora would carry real stopword lists — the operator shape is what
# matters: explode → membership → per-lang counts → argmax with tie→'und')
LANG_MARKERS = {
    "en": ["the", "a", "of", "and", "fast"],
    "de": ["der", "die", "das", "und", "nicht"],
    "fr": ["le", "la", "les", "et", "ne"],
    "es": ["el", "los", "las", "que", "y"],
}
STOPWORDS = ["the", "a", "of", "and", "in", "to"]


def _toks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))


def lang_id_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _toks(spark, sf_dir)
    scores = toks.groupBy("doc_id").agg(*[
        F.sum(F.when(F.col("tok").isin(markers), 1).otherwise(0)).alias(f"n_{lang}")
        for lang, markers in LANG_MARKERS.items()])
    best = F.greatest(*[F.col(f"n_{l}") for l in LANG_MARKERS])
    pred = F.when(best == 0, F.lit("und"))
    for lang in LANG_MARKERS:  # dict order = tie-break priority
        pred = pred.when(F.col(f"n_{lang}") == best, F.lit(lang))
    return scores.select("doc_id", pred.alias("pred_lang"),
                         *[f"n_{l}" for l in LANG_MARKERS])


def lang_id_sql() -> str:
    sums = ", ".join(
        "CAST(sum(CASE WHEN tok IN ({}) THEN 1 ELSE 0 END) AS BIGINT) AS n_{}".format(
            ", ".join(f"'{m}'" for m in markers), lang)
        for lang, markers in LANG_MARKERS.items())
    best = "greatest({})".format(", ".join(f"n_{l}" for l in LANG_MARKERS))
    whens = " ".join(f"WHEN n_{l} = best THEN '{l}'" for l in LANG_MARKERS)
    return f"""(
      WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
      ), scores AS (
        SELECT doc_id, {sums} FROM toks GROUP BY doc_id
      )
      SELECT doc_id,
             CASE WHEN best = 0 THEN 'und' {whens} END AS pred_lang,
             {', '.join(f'n_{l}' for l in LANG_MARKERS)}
      FROM (SELECT *, {best} AS best FROM scores)
    )"""


def quality_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = _toks(spark, sf_dir)
    stats = toks.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.countDistinct("tok").alias("n_distinct"),
        F.sum(F.length("tok")).alias("sum_tok_len"),
        F.sum(F.when(F.col("tok").isin(STOPWORDS), 1).otherwise(0)).alias("n_stop"))
    return (docs.select("doc_id", F.length("text").alias("n_chars_actual"))
                .join(stats, "doc_id")
                .select("doc_id", "n_chars_actual", "n_tokens", "n_distinct",
                        (F.col("sum_tok_len") / F.col("n_tokens")).alias("avg_tok_len"),
                        (F.col("n_stop") / F.col("n_tokens")).alias("stop_ratio"),
                        (F.col("n_distinct") / F.col("n_tokens")).alias("ttr")))


def quality_sql() -> str:
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""(
      WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
      ), stats AS (
        SELECT doc_id, count(*) AS n_tokens,
               count(DISTINCT tok) AS n_distinct,
               sum(length(tok)) AS sum_tok_len,
               sum(CASE WHEN tok IN ({stop_list}) THEN 1 ELSE 0 END) AS n_stop
        FROM toks GROUP BY doc_id
      )
      SELECT d.doc_id, length(d.text) AS n_chars_actual, s.n_tokens, s.n_distinct,
             s.sum_tok_len / s.n_tokens AS avg_tok_len,
             s.n_stop / s.n_tokens AS stop_ratio,
             s.n_distinct / s.n_tokens AS ttr
      FROM documents d JOIN stats s USING (doc_id)
    )"""


def fingerprint_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 of normalized text + a winnowing-style
    min-hash over word 5-gram windows (rolling-hash stand-in)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from pyspark.sql.window import Window
    toks = docs.select("doc_id",
                       F.posexplode(F.split("text", " ")).alias("pos", "tok"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    grams = (toks.withColumn("g", F.concat_ws(" ", *[
                 F.lead("tok", i).over(w) for i in range(5)]))
                 .withColumn("t4", F.lead("tok", 4).over(w))
                 .where(F.col("t4").isNotNull()))
    winnow = grams.groupBy("doc_id").agg(F.min(F.md5("g")).alias("win_min"))
    return (docs.select("doc_id", F.md5(F.lower("text")).alias("fp_md5"))
                .join(winnow, "doc_id"))


def fingerprint_sql() -> str:
    return """(
      WITH toks AS (
        SELECT doc_id, unnest(arr) AS tok, generate_subscripts(arr, 1) AS pos
        FROM (SELECT doc_id, string_split(text, ' ') AS arr FROM documents)
      ), led AS (
        SELECT doc_id,
               tok || ' ' || lead(tok,1) OVER w || ' ' || lead(tok,2) OVER w
                   || ' ' || lead(tok,3) OVER w || ' ' || lead(tok,4) OVER w AS g,
               lead(tok,4) OVER w AS t4
        FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
      ), winnow AS (
        SELECT doc_id, min(md5(g)) AS win_min FROM led WHERE t4 IS NOT NULL
        GROUP BY doc_id
      )
      SELECT d.doc_id, md5(lower(d.text)) AS fp_md5, w.win_min
      FROM documents d JOIN winnow w USING (doc_id)
    )"""
