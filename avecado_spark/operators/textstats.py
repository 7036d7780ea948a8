"""Text analysis operators over the documents table.

Training-data pipeline primitives: language-ID (marker-token heuristic),
quality scoring (length / token statistics / stopword ratio), token
counting, and document fingerprinting.

The Spark side is SHUFFLE-FREE: every statistic is a per-document local
computation over the split-token array (size / filter / array_distinct /
aggregate / array_min higher-order functions) — one map-side pass in
whole-stage codegen, no explode, no window, no groupBy. Round 1 exploded
every token through groupBy(doc_id) (and fingerprinting through a
lead() OVER window = full token shuffle+sort); at 100 TB that shuffle is
the dominant cost and it computes nothing an array function can't.

The DuckDB oracle strings keep the relational explode+group formulation —
identical values, correctness-only engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import read_split

# marker tokens per language (the synthetic corpus vocabulary is English-ish;
# real corpora would carry real stopword lists — the operator shape is what
# matters: per-doc marker counts → argmax with tie→'und')
LANG_MARKERS = {
    "en": ["the", "a", "of", "and", "fast"],
    "de": ["der", "die", "das", "und", "nicht"],
    "fr": ["le", "la", "les", "et", "ne"],
    "es": ["el", "los", "las", "que", "y"],
}
STOPWORDS = ["the", "a", "of", "and", "in", "to"]


def _arr() -> Column:
    return F.split(F.col("text"), " ")


def _count_in(arr: Column, vocab: list[str]) -> Column:
    # size(filter(arr, t -> t IN vocab)) — map-side count, cast to BIGINT to
    # match the oracle's sum(CASE...) type
    return F.size(F.filter(arr, lambda t: t.isin(vocab))).cast("long")


def lang_id_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_split(spark, f"{sf_dir}/documents.parquet")
    scores = docs.select("doc_id", *[
        _count_in(_arr(), markers).alias(f"n_{lang}")
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
    docs = read_split(spark, f"{sf_dir}/documents.parquet")
    arr = _arr()
    n_tokens = F.size(arr).cast("long")
    n_distinct = F.size(F.array_distinct(arr)).cast("long")
    sum_tok_len = F.aggregate(arr, F.lit(0).cast("long"),
                              lambda acc, t: acc + F.length(t))
    n_stop = _count_in(arr, STOPWORDS)
    n_chars = F.length("text").cast("long")
    # punctuation = chars outside [A-Za-z0-9 ] (ASCII subset where Java
    # regex and RE2 agree; DuckDB twin needs the 'g' flag)
    n_punct = (n_chars - F.length(
        F.regexp_replace("text", "[^A-Za-z0-9 ]", "")).cast("long"))
    return docs.select(
        "doc_id", n_chars.alias("n_chars_actual"),
        n_tokens.alias("n_tokens"), n_distinct.alias("n_distinct"),
        (sum_tok_len / n_tokens).alias("avg_tok_len"),
        (n_stop / n_tokens).alias("stop_ratio"),
        (n_punct / n_chars).alias("punct_ratio"),
        (n_distinct / n_tokens).alias("ttr"))


def quality_sql() -> str:
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""(
      WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
      ), stats AS (
        SELECT doc_id, count(*) AS n_tokens,
               count(DISTINCT tok) AS n_distinct,
               CAST(sum(length(tok)) AS BIGINT) AS sum_tok_len,
               CAST(sum(CASE WHEN tok IN ({stop_list}) THEN 1 ELSE 0 END) AS BIGINT) AS n_stop
        FROM toks GROUP BY doc_id
      )
      SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars_actual,
             s.n_tokens, s.n_distinct,
             s.sum_tok_len / s.n_tokens AS avg_tok_len,
             s.n_stop / s.n_tokens AS stop_ratio,
             (CAST(length(d.text) AS BIGINT)
              - CAST(length(regexp_replace(d.text, '[^A-Za-z0-9 ]', '', 'g')) AS BIGINT))
               / CAST(length(d.text) AS BIGINT) AS punct_ratio,
             s.n_distinct / s.n_tokens AS ttr
      FROM documents d JOIN stats s USING (doc_id)
    )"""


def fingerprint_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 of normalized text + a winnowing-style
    min-hash over word 5-gram windows (rolling-hash stand-in). Both parts
    per-document local: the winnow minimum is array_min over the md5s of
    the grams built from the split array — zero shuffles."""
    docs = read_split(spark, f"{sf_dir}/documents.parquet")
    arr = _arr()
    idx = F.sequence(F.lit(1), F.size(arr) - 4)
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(arr, i + j) for j in range(5)])
    win_min = F.array_min(F.transform(idx, lambda i: F.md5(gram(i))))
    return (docs.where(F.size(arr) >= 5)   # docs with no 5-gram drop, as the
                                           # oracle's inner join does
                .select("doc_id", F.md5(F.lower("text")).alias("fp_md5"),
                        win_min.alias("win_min")))


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


# BPE-ish pre-tokenizer: letter runs | digit runs | single non-alnum
# (the GPT-2-style pre-split shape restricted to the ASCII subset where
# Java regex and RE2 agree byte-for-byte)
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def token_count_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways (training-data pipeline primitive):
    whitespace tokens and BPE-ish pre-tokens — both per-document local
    (size over split / regexp_extract_all), zero shuffles."""
    docs = read_split(spark, f"{sf_dir}/documents.parquet")
    arr = _arr()
    return docs.select(
        "doc_id",
        F.size(arr).cast("long").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_PATTERN), F.lit(0)))
         .cast("long").alias("n_bpe_tokens"))


def token_count_sql() -> str:
    return f"""(
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
             CAST(len(regexp_extract_all(text, '{BPE_PATTERN}')) AS BIGINT)
               AS n_bpe_tokens
      FROM documents
    )"""


def repetition_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_split(spark, f"{sf_dir}/documents.parquet")
    return repetition_stats(docs)


def repetition_stats(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1): per doc,
    the fraction of tokens covered by the single most frequent word
    bigram (`top_bigram_frac`) and the fraction of 8-token chunks that
    repeat an earlier chunk of the SAME document (`dup_chunk_frac`) —
    the two filters that catch boilerplate/SEO spam exact dedup misses.

    Unlike the other textstats ops this one genuinely needs per-doc
    frequency tables, so it shuffles — but only slim (doc_id, md5) rows
    (the text stays in the scan), with map-side partial counts on both
    groupBys. n_tokens < 2 → top_bigram_frac 0; docs shorter than one
    chunk → dup_chunk_frac 0."""
    from .dedup import paragraph_rows

    arr = F.split(F.col(text_col), " ")
    n_tokens = F.size(arr).cast("long")

    big = (docs.where(F.size(arr) >= 2)
               .select(id_col,
                       F.explode(F.transform(
                           F.sequence(F.lit(0), F.size(arr) - 2),
                           lambda i: F.concat_ws(
                               " ", F.element_at(arr, i + 1),
                               F.element_at(arr, i + 2)))).alias("bg"))
               .groupBy(id_col, "bg").agg(F.count("*").alias("c"))
               .groupBy(id_col).agg(F.max("c").alias("top_bg")))

    chunks = (paragraph_rows(docs, id_col, text_col, "words:8")
              .groupBy(id_col)
              .agg(F.count("*").alias("n_chunks"),
                   F.countDistinct("h").alias("n_uniq")))

    base = docs.select(id_col, n_tokens.alias("n_tokens"))
    return (base.join(big, id_col, "left").join(chunks, id_col, "left")
                .select(
                    id_col, "n_tokens",
                    F.coalesce(
                        (F.lit(2) * F.col("top_bg") / F.col("n_tokens")),
                        F.lit(0.0)).alias("top_bigram_frac"),
                    F.coalesce(
                        (F.col("n_chunks") - F.col("n_uniq"))
                        / F.col("n_chunks"), F.lit(0.0))
                    .alias("dup_chunk_frac")))


def repetition_sql() -> str:
    return """(
      WITH toks AS (
        SELECT doc_id, u.tok, u.i
        FROM documents,
             LATERAL (SELECT unnest(string_split(text, ' ')) AS tok,
                             generate_subscripts(string_split(text, ' '), 1) AS i) u
      ), bigrams AS (
        SELECT a.doc_id, a.tok || ' ' || b.tok AS bg
        FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
      ), topbg AS (
        SELECT doc_id, max(c) AS top_bg FROM (
          SELECT doc_id, bg, count(*) AS c FROM bigrams GROUP BY doc_id, bg
        ) GROUP BY doc_id
      ), chunks AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_chunks,
               CAST(count(DISTINCT md5(trim(regexp_replace(lower(para),
                    '\\s+', ' ', 'g')))) AS BIGINT) AS n_uniq
        FROM (
          SELECT doc_id, (i - 1) // 8 AS pos,
                 string_agg(tok, ' ' ORDER BY i) AS para
          FROM toks WHERE tok <> '' GROUP BY doc_id, (i - 1) // 8
        ) GROUP BY doc_id
      )
      SELECT d.doc_id,
             CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
             coalesce(2 * t.top_bg / CAST(len(string_split(d.text, ' '))
                                          AS BIGINT), 0.0)
               AS top_bigram_frac,
             coalesce((c.n_chunks - c.n_uniq) / CAST(c.n_chunks AS DOUBLE),
                      0.0) AS dup_chunk_frac
      FROM documents d
      LEFT JOIN topbg t USING (doc_id)
      LEFT JOIN chunks c USING (doc_id)
    )"""
