#!/usr/bin/env python3
"""spark-submit entry: link graph + PageRank over the pages corpus,
checkpointed per round and resumable.

    spark-submit --py-files avecado_spark.zip jobs/webgraph_pagerank.py \
        --input /root/testdata/sf0.1 --out /tmp/webgraph [--iters 5]

The durable form of queries.web_pagerank_top, shaped for the north
rule's resumability clause: every expensive stage lands in storage with
a commit marker before the next one starts, so a killed job re-submitted
with the same --out continues instead of recomputing.

  {out}/edges/      extracted+canonicalized live link graph (src, dst,
                    outdeg pre-joined) — the one html-parsing pass; at
                    10^12 docs this is the stage worth never repeating
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

    from avecado_spark.operators.webgraph import edges_df, pagerank_int_round
    from avecado_spark.sources.pages import pages_df

    os.makedirs(out, exist_ok=True)
    edges_path = os.path.join(out, "edges")
    stages_resumed = 0

    t = time.time()
    if not _done(edges_path):
        pg = pages_df(spark, sf_dir)
        e = edges_df(pg).localCheckpoint()  # parse html ONCE
        deg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
        e.join(deg, "src").write.mode("overwrite").parquet(edges_path)
        _log_metric(out, stage="edges", resumed=False,
                    rows=spark.read.parquet(edges_path).count(),
                    sec=round(time.time() - t, 3))
    else:
        stages_resumed += 1
    ed = spark.read.parquet(edges_path)

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
