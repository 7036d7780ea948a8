#!/usr/bin/env python3
"""Supplementary benchmarks (bench.py is frozen for measurement — extra
evidence lands here and is cited from OPTIMIZATION_r08.md / BASELINE.md).

  --s2-crossover   pip_s2index vs pip_s2join at 10^4 AND 10^5 polygons:
                   the three-tier spatial-join family's crossover
                   evidence (r07 verdict ask #7). The broadcast
                   interval-index tier pays a driver-side build that
                   grows with polygon count; the distributed shuffle
                   join tier pays per-query shuffles that do not.
                   Prints one JSON line.

  --knn-cut        stage decomposition of pip_knn_10k (guide §1.4 noop
                   isolation): times (a) the pages scan + geocode with a
                   count sink, (b) the same plus the kNN probe — the
                   difference is the probe's true cost; prints both plus
                   the same-session inline JVM control for host context.

Usage: SPARK_GRAFT_CPUS=32 python bench_extra.py --s2-crossover
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))


def _session():
    from avecado_spark.api import spark_session
    spark = spark_session(f"local[{CPUS}]", app=f"bench_extra[{CPUS}]",
                          shuffle_partitions=2 * CPUS,
                          max_partition_bytes="4m")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def s2_crossover():
    from bench import _bench_polys_10k, _pages_table
    from avecado_spark.operators.adminizer import (adminize_points_s2index,
                                                   adminize_points_s2join,
                                                   polygons_to_df)
    from avecado_spark.operators.keys import geocode

    spark = _session()
    pages = spark.read.parquet(_pages_table(spark, SF_DIR))
    g = geocode(pages).select("url", "mx_mm", "my_mm").localCheckpoint()
    n_pts = g.count()  # untimed: isolate the probes from the geocode scan

    out = {"metric": "s2_crossover", "unit": "sec", "points": n_pts,
           "cpus": CPUS, "sf": SF_DIR, "tiers": {}}
    for n_side in (100, 316):        # 10^4 and ~10^5 polygons
        polys = _bench_polys_10k(n_side=n_side, world=40075016680.0)
        label = f"{n_side * n_side}"
        metrics: dict = {}
        t = time.time()
        n1 = adminize_points_s2index(g, polys, max_level=10,
                                     metrics=metrics).count()
        t_index = round(time.time() - t, 2)
        t = time.time()
        n2 = adminize_points_s2join(g, polygons_to_df(spark, polys),
                                    max_level=10).count()
        t_join = round(time.time() - t, 2)
        out["tiers"][label] = {
            "s2index_total_s": t_index,
            "s2index_build_s": metrics.get("index_build_s"),
            "s2join_total_s": t_join,
            "rows_index": n1, "rows_join": n2,
        }
    spark.stop()
    print(json.dumps(out))


def knn_cut():
    from bench import _bench_polys_10k, _control_inline, _pages_table
    from avecado_spark.operators.adminizer import adminize_points_knn_rings
    from avecado_spark.operators.keys import geocode

    spark = _session()
    out = {"metric": "knn_cut", "unit": "sec", "cpus": CPUS, "sf": SF_DIR}
    out["control_sec"] = _control_inline(spark)
    pages = spark.read.parquet(_pages_table(spark, SF_DIR))

    t = time.time()
    n_pts = geocode(pages).select("url", "mx_mm", "my_mm").count()
    out["scan_geocode_s"] = round(time.time() - t, 2)
    out["points"] = n_pts

    for rep in range(2):          # rep2 = warm JVM, the comparable number
        g = geocode(pages).select("url", "mx_mm", "my_mm")
        t = time.time()
        n = adminize_points_knn_rings(g, _bench_polys_10k(), k=2).count()
        out[f"full_probe_s_rep{rep}"] = round(time.time() - t, 2)
    out["rows"] = n
    out["control_sec_end"] = _control_inline(spark)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    if "--s2-crossover" in sys.argv:
        s2_crossover()
    elif "--knn-cut" in sys.argv:
        knn_cut()
    else:
        print(__doc__)
