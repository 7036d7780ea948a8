#!/usr/bin/env python3
"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline queries over $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] (default 32).

  tile_build_z14 — full pipeline: pages synth → geocode (Arrow UDF) →
                   integer tile keys → two-phase salted MVT encode → bytes.
  tile_assign    — declarative key-assign + count (pure JVM path).
  pip_first      — broadcast point-in-polygon join, first-match mode.

--scaling runs tile_build_z14 at local[8] and local[32] on identical input
and writes BENCH/BASELINE.md with throughputs + scaling efficiency
(the sandbox evidence for the north rule's N→4N criterion).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _session(cpus: int):
    from avecado_spark.api import spark_session
    spark = spark_session(f"local[{cpus}]", app=f"bench[{cpus}]",
                          shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _run_tile_build(spark, sf_dir):
    from avecado_spark.api import build_tiles
    from avecado_spark.sources.pages import pages_df
    from pyspark.sql import functions as F
    tiles = build_tiles(pages_df(spark, sf_dir), z=14)
    row = tiles.agg(F.count("*").alias("tiles"),
                    F.sum("n_features").alias("docs"),
                    F.sum(F.length("tile_pbf")).alias("bytes")).collect()[0]
    return int(row.tiles), int(row.docs)


def _run_tile_assign(spark, sf_dir):
    from avecado_spark import queries as q
    return q.queries()["tile_assign_z14"](spark, sf_dir).count()


def _run_pip_first(spark, sf_dir):
    from avecado_spark import queries as q
    qs = q.queries()
    if "j1a_pip_first" not in qs:
        return None
    return qs["j1a_pip_first"](spark, sf_dir).count()


def main():
    if "--scaling" in sys.argv:
        return scaling()

    spark = _session(CPUS)
    t0 = time.time()
    timings = {}

    t = time.time()
    n_tiles, n_docs = _run_tile_build(spark, SF_DIR)
    timings["tile_build_z14"] = round(time.time() - t, 3)

    t = time.time()
    _run_tile_assign(spark, SF_DIR)
    timings["tile_assign"] = round(time.time() - t, 3)

    t = time.time()
    if _run_pip_first(spark, SF_DIR) is not None:
        timings["pip_first"] = round(time.time() - t, 3)

    total = round(time.time() - t0, 3)
    out = {
        "metric": "bench_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "cpus": CPUS,
        "tiles_built_z14": n_tiles,
        "docs_encoded": n_docs,
        "tiles_per_sec_z14": round(n_tiles / timings["tile_build_z14"], 1),
        "docs_per_sec_encoded": round(n_docs / timings["tile_build_z14"], 1),
    }
    spark.stop()
    print(json.dumps(out))


def scaling():
    """Identical job at two parallelism levels → scaling efficiency."""
    results = {}
    for cpus in (8, 32):
        spark = _session(cpus)
        # warm-up JVM/Arrow once, then measure
        _run_tile_assign(spark, SF_DIR)
        t = time.time()
        n_tiles, n_docs = _run_tile_build(spark, SF_DIR)
        dt = time.time() - t
        results[cpus] = {"sec": round(dt, 3),
                         "tiles_per_sec": round(n_tiles / dt, 1),
                         "docs_per_sec": round(n_docs / dt, 1)}
        spark.stop()
    eff = results[32]["tiles_per_sec"] / (4 * results[8]["tiles_per_sec"])
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(f"""# BENCH/BASELINE — scaling evidence (north rule: ≥0.8 from N to 4N)

Identical job (full z14 MVT tile build, {SF_DIR}) at two local parallelism
levels, same input, fresh SparkSession each. tiles={n_tiles}, docs={n_docs}.

| config | seconds | tiles/sec | docs/sec |
|---|---|---|---|
| local[8]  | {results[8]['sec']} | {results[8]['tiles_per_sec']} | {results[8]['docs_per_sec']} |
| local[32] | {results[32]['sec']} | {results[32]['tiles_per_sec']} | {results[32]['docs_per_sec']} |

**Scaling efficiency (8 → 32 cores, 4×): {eff:.3f}** (target ≥ 0.8)
""")
    print(json.dumps({"metric": "scaling_efficiency_8_to_32", "value": round(eff, 3),
                      "unit": "ratio", "results": results, "sf": SF_DIR}))


if __name__ == "__main__":
    main()
