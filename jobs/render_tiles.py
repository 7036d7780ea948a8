#!/usr/bin/env python3
"""spark-submit entry for the raster export leg (`avecado raster` role,
reference src/render_vector_tile.cpp): read a built tile table, render each
MVT to PNG with a Mapnik-rule style document, write a z/x/y.png tree.

    spark-submit --py-files avecado_spark.zip jobs/render_tiles.py \
        --tiles /tmp/tiles_out --style style.json --out /tmp/pngs \
        [--bbox z x0 x1 y0 y1]

The style document is the JSON subset of operators/raster.render_tile_styled
(draw-ordered rules, tag filters, alpha compositing, line widths, markers).
A --bbox read goes through the partition-pruned viewport reader, so
re-rendering one region never scans the whole tile table.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", required=True,
                    help="tile-table dir (run_resumable_build output)")
    ap.add_argument("--style", required=True, help="style JSON file")
    ap.add_argument("--out", required=True)
    ap.add_argument("--bbox", nargs=5, type=int, default=None,
                    metavar=("Z", "X0", "X1", "Y0", "Y1"))
    ap.add_argument("--tile-size", type=int, default=256)
    args = ap.parse_args()

    from avecado_spark.api import spark_session
    from avecado_spark.operators.raster import render_tiles_styled
    from avecado_spark.sources.manifest import read_tiles_bbox

    with open(args.style) as f:
        style = json.load(f)
    spark = spark_session(app="render_tiles")
    if args.bbox:
        z, x0, x1, y0, y1 = args.bbox
        tiles = read_tiles_bbox(spark, args.tiles, z, x0, x1, y0, y1)
    else:
        tiles = spark.read.parquet(os.path.join(args.tiles, "tiles"))
    pngs = render_tiles_styled(tiles, style, tile_size=args.tile_size)

    out_dir = args.out
    acc = spark.sparkContext.accumulator(0)  # count in the SAME pass

    def write_partition(rows):
        for r in rows:
            d = os.path.join(out_dir, str(r.z), str(r.x))
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, f"{r.y}.png"), "wb") as fh:
                fh.write(bytes(r.png))
            acc.add(1)

    pngs.foreachPartition(write_partition)
    print(json.dumps({"rendered": acc.value, "out": out_dir}))
    spark.stop()


if __name__ == "__main__":
    main()
