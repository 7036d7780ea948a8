#!/usr/bin/env python3
"""spark-submit entry: link graph + PageRank over the pages corpus,
checkpointed per round and resumable.

    spark-submit --py-files avecado_spark.zip jobs/webgraph_pagerank.py \
        --input /root/testdata/sf0.1 --out /tmp/webgraph [--iters 5]

The durable form of queries.web_pagerank_top, shaped for the north
rule's resumability clause: every expensive stage lands in storage with
a commit marker before the next one starts, so a killed job re-submitted
with the same --out continues instead of recomputing.

  {out}/links/      raw extraction table (src, dst, anchor, first_pos,
                    nofollow) — the ONE html-parsing pass; at 10^12
                    docs this is the stage worth never repeating, and
                    every other graph signal derives from it
  {out}/edges/      canonicalized live link graph (src, dst, outdeg
                    pre-joined), from links/ — no re-parse
  {out}/indegree/   per-page in-link quality signals (in_cnt,
                    n_anchors, top_anchor), from links/
  {out}/frontier/   crawl want-list (url, want_cnt, n_srcs), from
                    links/ (nofollow-aware)
  {out}/hits/       integer HITS hubs/authorities, from edges/
  {out}/ranks_000/  r0 (uniform scale // n)
  {out}/ranks_NNN/  rank vector after round NNN
  {out}/metrics.jsonl  one line per completed stage: rows, total rank
                    mass (the conservation diagnostic — strictly
                    decreasing, dangling mass is lost), wall seconds,
                    resumed-or-computed

Resume = max NNN with a parquet _SUCCESS marker: parquet write is the
checkpoint (lineage truncation by storage — the durable analog of the
in-session loop's localCheckpoint), the _SUCCESS file is the atomic
commit marker, and metrics.jsonl is the per-stage lineage record. Ranks
are integer fixed-point (BIGINT floor division, webgraph.pagerank_int),
so a resumed run is bit-identical to an uninterrupted one — verified by
tests/test_webgraph.py::test_pagerank_job_resumes.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def _log_metric(out: str, **kv) -> dict:
    kv = {"ts": round(time.time(), 3), **kv}
    with open(os.path.join(out, "metrics.jsonl"), "a") as f:
        f.write(json.dumps(kv) + "\n")
    return kv


def run_pagerank_job(spark, sf_dir: str, out: str, iters: int = 5,
                     scale: int = 10**12) -> dict:
    """Importable driver (tests run it against a tmp dir). Returns the
    final metrics dict; writes stage parquet + metrics.jsonl under
    `out`."""
    from pyspark.sql import functions as F

    from avecado_spark.operators.webgraph import (edges_df, extract_links,
                                                  frontier_df, hits_int,
                                                  indegree_signals,
                                                  pagerank_int_round)
    from avecado_spark.sources.pages import pages_df

    os.makedirs(out, exist_ok=True)
    links_path = os.path.join(out, "links")
    edges_path = os.path.join(out, "edges")
    indeg_path = os.path.join(out, "indegree")
    frontier_path = os.path.join(out, "frontier")
    hits_path = os.path.join(out, "hits")
    stages_resumed = 0

    t = time.time()
    if not _done(links_path):
        pg = pages_df(spark, sf_dir)
        extract_links(pg).write.mode("overwrite").parquet(links_path)
        _log_metric(out, stage="links", resumed=False,
                    rows=spark.read.parquet(links_path).count(),
                    sec=round(time.time() - t, 3))
    else:
        stages_resumed += 1
    links = spark.read.parquet(links_path)
    pg_urls = pages_df(spark, sf_dir)

    t = time.time()
    if not _done(edges_path):
        e = edges_df(pg_urls, links=links)
        deg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
        e.join(deg, "src").write.mode("overwrite").parquet(edges_path)
        _log_metric(out, stage="edges", resumed=False,
                    rows=spark.read.parquet(edges_path).count(),
                    sec=round(time.time() - t, 3))
    else:
        stages_resumed += 1
    ed = spark.read.parquet(edges_path)

    # slim derived signals, one stage each — all from the stored links
    # table (no re-parse) or the stored edges table
    t = time.time()
    if not _done(indeg_path):
        indegree_signals(pg_urls, links=links) \
            .write.mode("overwrite").parquet(indeg_path)
        _log_metric(out, stage="indegree", resumed=False,
                    rows=spark.read.parquet(indeg_path).count(),
                    sec=round(time.time() - t, 3))
    else:
        stages_resumed += 1

    t = time.time()
    if not _done(frontier_path):
        frontier_df(pg_urls, links=links) \
            .write.mode("overwrite").parquet(frontier_path)
        _log_metric(out, stage="frontier", resumed=False,
                    rows=spark.read.parquet(frontier_path).count(),
                    sec=round(time.time() - t, 3))
    else:
        stages_resumed += 1

    t = time.time()
    if not _done(hits_path):
        hits_int(pg_urls.select("url"), ed.select("src", "dst")) \
            .write.mode("overwrite").parquet(hits_path)
        _log_metric(out, stage="hits", resumed=False,
                    rows=spark.read.parquet(hits_path).count(),
                    sec=round(time.time() - t, 3))
    else:
        stages_resumed += 1

    nodes = pages_df(spark, sf_dir).select("url")
    n = nodes.count()
    r0 = scale // n
    base = (15 * r0) // 100

    def rpath(i: int) -> str:
        return os.path.join(out, f"ranks_{i:03d}")

    # resume point: the highest round already committed to storage
    start = -1
    for i in range(iters, -1, -1):
        if _done(rpath(i)):
            start = i
            break
    if start < 0:
        t = time.time()
        nodes.select("url", F.lit(r0).cast("long").alias("r")) \
             .write.mode("overwrite").parquet(rpath(0))
        _log_metric(out, stage="ranks_000", resumed=False, rows=n,
                    mass=r0 * n, sec=round(time.time() - t, 3))
        start = 0
    else:
        stages_resumed += start + 1

    for i in range(start + 1, iters + 1):
        t = time.time()
        prev = spark.read.parquet(rpath(i - 1))
        pagerank_int_round(nodes, ed, prev, base) \
            .write.mode("overwrite").parquet(rpath(i))
        cur = spark.read.parquet(rpath(i))
        agg = cur.agg(F.count(F.lit(1)).alias("n"),
                      F.sum("r").alias("mass")).first()
        _log_metric(out, stage=f"ranks_{i:03d}", resumed=False,
                    rows=int(agg["n"]), mass=int(agg["mass"]),
                    sec=round(time.time() - t, 3))

    final = spark.read.parquet(rpath(iters))
    top = final.orderBy(F.col("r").desc(), "url").limit(1).first()
    metrics = {"rows": n, "iters": iters, "scale": scale,
               "resumed_stages": stages_resumed,
               "final_path": rpath(iters),
               "top_url": top["url"], "top_rank": int(top["r"])}
    _log_metric(out, stage="final", **metrics)
    return metrics


def main(argv):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args(argv)

    from avecado_spark.api import spark_session
    spark = spark_session(app="webgraph_pagerank")
    spark.sparkContext.setLogLevel("WARN")
    metrics = run_pagerank_job(spark, args.input, args.out, args.iters)
    print(json.dumps(metrics))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
