#!/usr/bin/env python3
"""spark-submit entry: pages → training-ready corpus, checkpointed per
stage and resumable — the capstone composition of the engine's
training-data operators.

    spark-submit --py-files avecado_spark.zip jobs/corpus_prep.py \
        --input /root/testdata/sf0.1 --out /tmp/corpus \
        [--sample-num 3 --sample-den 16]

Stages (each lands in storage with a _SUCCESS commit marker before the
next starts; a killed job re-submitted with the same --out resumes):

  {out}/docs/     html→text (byte-identical extractor,
                  functions/htmltext) + per-doc stats (token/char
                  counts, JVM-side) + the page's lang — the one pass
                  that reads html; everything downstream is slim
  {out}/para/     (only with --para-dedup) CCNet-style paragraph-level
                  boilerplate dedup: repeated paragraphs keep their
                  first corpus-wide occurrence; text/stats rewritten
  {out}/quality/  (only with quality thresholds) Gopher-style document
                  gate: token-count range + repetition signals
                  (top-bigram fraction, duplicate-chunk fraction)
  {out}/unique/   exact-dedup keep set: min url per md5(text) — the
                  canonical representative of every duplicate class
  {out}/corpus/   deduped docs, deterministically sampled
                  (salted md5 gate) and carved into
                  train/valid/test (980/10/10), written
                  partitioned by split
  {out}/metrics.jsonl  per-stage lineage: rows in/out, dup rate,
                  split sizes, wall seconds

Selection is hash-deterministic end to end (operators/sampling.py), so
a resumed or re-run job reproduces the identical corpus bit for bit —
no RNG, no partition-layout dependence.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jobs.webgraph_pagerank import _done, _log_metric  # noqa: E402


def run_corpus_prep(spark, sf_dir: str, out: str,
                    sample_num: int = 3, sample_den: int = 16,
                    para_dedup: str | None = None,
                    quality: dict | None = None) -> dict:
    """Importable driver (tests run it against a tmp dir). Returns final
    metrics; writes stage parquet + metrics.jsonl under `out`.

    `para_dedup` (e.g. "regex:\\n{2,}" or "words:8") inserts the
    CCNet-style paragraph-level boilerplate dedup between extraction and
    exact dedup: repeated paragraphs survive only their first corpus-wide
    occurrence, and the downstream exact/sample/split stages run over the
    cleaned text.

    `quality` inserts the Gopher-style document gate after paragraph
    dedup: thresholds {min_tokens, max_tokens, max_top_bigram_frac,
    max_dup_chunk_frac} (any subset); failing docs drop with per-reason
    counts in the metrics line."""
    from pyspark.sql import functions as F

    from avecado_spark.operators.dedup import paragraph_dedup
    from avecado_spark.operators.sampling import assign_splits, sample_fraction
    from avecado_spark.operators.textstats import repetition_stats
    from avecado_spark.operators.webgraph import extract_text
    from avecado_spark.sources.pages import pages_df

    os.makedirs(out, exist_ok=True)
    docs_path = os.path.join(out, "docs")
    para_path = os.path.join(out, "para")
    qual_path = os.path.join(out, "quality")
    uniq_path = os.path.join(out, "unique")
    corpus_path = os.path.join(out, "corpus")
    resumed = 0

    t = time.time()
    if not _done(docs_path):
        pg = pages_df(spark, sf_dir)
        texts = extract_text(pg)
        toks = F.split(F.col("text_x"), "\\s+")
        docs = (pg.select("url", "warc_ts", "lang")
                  .join(texts, "url")
                  .withColumn("n_chars", F.length("text_x").cast("long"))
                  .withColumn("n_tokens", F.size(toks).cast("long")))
        docs.write.mode("overwrite").parquet(docs_path)
        _log_metric(out, stage="docs", resumed=False,
                    rows=spark.read.parquet(docs_path).count(),
                    sec=round(time.time() - t, 3))
    else:
        resumed += 1
    docs = spark.read.parquet(docs_path)

    if para_dedup is not None:
        t = time.time()
        if not _done(para_path):
            clean = paragraph_dedup(docs, id_col="url", text_col="text_x",
                                    segment=para_dedup)
            paras = (docs.drop("text_x")
                         .join(clean, "url")
                         .withColumnRenamed("clean_text", "text_x")
                         .withColumn("n_chars",
                                     F.length("text_x").cast("long"))
                         .withColumn("n_tokens",
                                     F.size(F.split("text_x", "\\s+"))
                                      .cast("long")))
            paras.write.mode("overwrite").parquet(para_path)
            stats = (spark.read.parquet(para_path)
                          .agg(F.count("*").alias("rows"),
                               F.sum("n_paras").alias("n"),
                               (F.sum("n_paras") - F.sum("n_kept"))
                               .alias("d")).collect()[0])
            _log_metric(out, stage="para", resumed=False,
                        rows=stats["rows"],
                        paras_dropped=int(stats["d"] or 0),
                        paras_total=int(stats["n"] or 0),
                        sec=round(time.time() - t, 3))
        else:
            resumed += 1
        docs = spark.read.parquet(para_path)

    if quality is not None:
        t = time.time()
        if not _done(qual_path):
            rep = repetition_stats(docs, id_col="url", text_col="text_x")
            cond = F.lit(True)
            if "min_tokens" in quality:
                cond &= F.col("n_tokens") >= quality["min_tokens"]
            if "max_tokens" in quality:
                cond &= F.col("n_tokens") <= quality["max_tokens"]
            if "max_top_bigram_frac" in quality:
                cond &= (F.col("top_bigram_frac")
                         <= quality["max_top_bigram_frac"])
            if "max_dup_chunk_frac" in quality:
                cond &= (F.col("dup_chunk_frac")
                         <= quality["max_dup_chunk_frac"])
            # the gate's signal columns ride along — corpus lineage a
            # later filter sweep can re-threshold without recomputing
            kept = (docs.drop("n_tokens")
                        .join(rep, "url")
                        .where(cond))
            kept.write.mode("overwrite").parquet(qual_path)
            n_in = docs.count()
            n_out = spark.read.parquet(qual_path).count()
            if n_in and not n_out:
                # un-commit the stage so a re-run does not resume past
                # the failure
                os.remove(os.path.join(qual_path, "_SUCCESS"))
                raise ValueError(
                    f"quality gate {quality} dropped ALL {n_in} documents "
                    "— misconfigured thresholds (loud failure, no empty "
                    "corpus is silently written)")
            _log_metric(out, stage="quality", resumed=False,
                        rows_in=n_in, rows=n_out,
                        dropped=n_in - n_out,
                        thresholds=quality,
                        sec=round(time.time() - t, 3))
        else:
            resumed += 1
        docs = spark.read.parquet(qual_path)

    t = time.time()
    if not _done(uniq_path):
        keep = (docs.groupBy(F.md5("text_x").alias("h"))
                    .agg(F.min("url").alias("url"),
                         F.count("*").alias("n_dups")))
        keep.select("url", "n_dups").write.mode("overwrite").parquet(uniq_path)
        n_in, n_u = docs.count(), spark.read.parquet(uniq_path).count()
        _log_metric(out, stage="unique", resumed=False, rows_in=n_in,
                    rows=n_u,
                    dup_rate=round(1 - n_u / n_in, 4) if n_in else 0.0,
                    sec=round(time.time() - t, 3))
    else:
        resumed += 1
    uniq = spark.read.parquet(uniq_path)

    t = time.time()
    if not _done(corpus_path):
        kept = docs.join(uniq.select("url"), "url")
        sampled = sample_fraction(kept, "url", sample_num, sample_den)
        carved = assign_splits(sampled, "url",
                               [("train", 980), ("valid", 10), ("test", 10)])
        # writer-scoped static overwrite: under the session-wide dynamic
        # mode some components set (sources/manifest.py), a dynamic
        # partitioned write emits NO root _SUCCESS — which is this job's
        # resume marker
        (carved.write.mode("overwrite")
               .option("partitionOverwriteMode", "static")
               .partitionBy("split").parquet(corpus_path))
        final = spark.read.parquet(corpus_path)
        sizes = {r["split"]: r["n"] for r in
                 final.groupBy("split").agg(F.count("*").alias("n"))
                      .collect()}
        _log_metric(out, stage="corpus", resumed=False,
                    rows=sum(sizes.values()), splits=sizes,
                    sec=round(time.time() - t, 3))
    else:
        resumed += 1

    final = spark.read.parquet(corpus_path)
    sizes = {r["split"]: r["n"] for r in
             final.groupBy("split").agg(F.count("*").alias("n")).collect()}
    metrics = {"rows": sum(sizes.values()), "splits": sizes,
               "resumed_stages": resumed, "corpus_path": corpus_path}
    _log_metric(out, stage="final", **metrics)
    return metrics


def main(argv):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--sample-num", type=int, default=3)
    ap.add_argument("--sample-den", type=int, default=16)
    ap.add_argument("--para-dedup", default=None, metavar="SEGMENT",
                    help="enable paragraph-level boilerplate dedup, e.g. "
                         "'regex:\\n{2,}' or 'words:8'")
    ap.add_argument("--quality", default=None, metavar="JSON",
                    help="enable the Gopher-style quality gate, e.g. "
                         '\'{"min_tokens": 10, "max_top_bigram_frac": '
                         "0.2}'")
    args = ap.parse_args(argv)

    from avecado_spark.api import spark_session
    spark = spark_session(app="corpus_prep")
    spark.sparkContext.setLogLevel("WARN")
    metrics = run_corpus_prep(spark, args.input, args.out,
                              args.sample_num, args.sample_den,
                              para_dedup=args.para_dedup,
                              quality=(json.loads(args.quality)
                                       if args.quality else None))
    print(json.dumps(metrics))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
