"""Tile-pyramid operators: overzoom ancestor lookup, subtree pruning,
full-cover copy-down, pyramid rollup.

Reference:
  overzoom     — /root/reference/src/fetch/overzoom.cpp:14-46 (z>max remaps
                 to max by right-shift; on not_found retry once at mask_zoom
                 if the effective z is deeper than the mask; other errors are
                 NOT retried)
  enumeration  — /root/reference/src/avecado_exporter.cpp:97-145 (recursive
                 4-way subtree from min_z..max_z, stopping at mask_z)
  pruning      — generate recurses only into painted parents
                 (avecado_exporter.cpp:193-202); uninteresting full-cover
                 tiles are copied to all descendants instead of re-rendered
                 (copy_subtree, :229-241)

Spark translation: tile keys are data-derived (empty pruning is free); the
subtree copy-down is an explode of parent keys to 4^dz children; overzoom is
a pair of computed-ancestor-key left joins with coalesce.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NOT_FOUND = "not_found"
SERVER_ERROR = "server_error"
OK = "ok"


# ---------------------------------------------------------------------------
# row-level overzoom (exact port; drives the truth-table test)
# ---------------------------------------------------------------------------

@dataclass
class Overzoom:
    """source(z, x, y) -> (status, payload|None); max_zoom; optional mask."""
    source: object
    max_zoom: int
    mask_zoom: int | None = None

    def fetch(self, z: int, x: int, y: int):
        if z > self.max_zoom:
            x >>= (z - self.max_zoom)
            y >>= (z - self.max_zoom)
            z = self.max_zoom
        status, payload = self.source(z, x, y)
        if (self.mask_zoom is not None and z > self.mask_zoom
                and status == NOT_FOUND):
            dz = z - self.mask_zoom
            status, payload = self.source(self.mask_zoom, x >> dz, y >> dz)
        return status, payload


# ---------------------------------------------------------------------------
# DataFrame overzoom: requests resolved against a tiles table
# ---------------------------------------------------------------------------

def overzoom_join(requests: DataFrame, tiles: DataFrame,
                  max_zoom: int, mask_zoom: int | None) -> DataFrame:
    """requests (z, x, y) × tiles (z, x, y, tile_pbf) → one row per request
    with (hit boolean, eff_z, eff_x, eff_y, tile_pbf). Two computed-key
    equi-joins (both sides broadcastable if small); no inequality join."""
    dz = F.greatest(F.col("z") - F.lit(max_zoom), F.lit(0))
    eff = (requests
           .withColumn("eff_z", F.least(F.col("z"), F.lit(max_zoom)))
           .withColumn("eff_x", F.expr(f"shiftright(x, greatest(z - {max_zoom}, 0))"))
           .withColumn("eff_y", F.expr(f"shiftright(y, greatest(z - {max_zoom}, 0))")))
    t1 = tiles.select(F.col("z").alias("eff_z"), F.col("x").alias("eff_x"),
                      F.col("y").alias("eff_y"), F.col("tile_pbf").alias("pbf1"))
    j = eff.join(t1, ["eff_z", "eff_x", "eff_y"], "left")
    if mask_zoom is not None:
        mz = mask_zoom
        j = (j.withColumn("mask_x", F.expr(f"shiftright(eff_x, eff_z - {mz})"))
              .withColumn("mask_y", F.expr(f"shiftright(eff_y, eff_z - {mz})")))
        t2 = tiles.select(F.col("z").alias("mz"), F.col("x").alias("mask_x"),
                          F.col("y").alias("mask_y"), F.col("tile_pbf").alias("pbf2"))
        j = (j.join(t2.where(F.col("mz") == mz).drop("mz"),
                    ["mask_x", "mask_y"], "left")
              .withColumn("pbf2", F.when(F.col("eff_z") > mz, F.col("pbf2"))))
        out = j.withColumn("tile_pbf", F.coalesce("pbf1", "pbf2"))
    else:
        out = j.withColumn("tile_pbf", F.col("pbf1"))
    return (out.withColumn("hit", F.col("tile_pbf").isNotNull())
               .select("z", "x", "y", "eff_z", "eff_x", "eff_y", "hit", "tile_pbf"))


# ---------------------------------------------------------------------------
# pyramid rollup + copy-down
# ---------------------------------------------------------------------------

def rollup_pyramid(tile_counts: DataFrame, from_z: int, to_z: int) -> DataFrame:
    """(x, y, n_docs) at from_z → per-zoom aggregates down to to_z by
    repeated ancestor shifts (map-side combinable; one shuffle per level,
    each 4× smaller — the hierarchical rollup of the z-pyramid)."""
    levels = [tile_counts.select(F.lit(from_z).alias("z"), "x", "y", "n_docs")]
    cur = tile_counts
    for z in range(from_z - 1, to_z - 1, -1):
        cur = (cur.select(F.shiftright("x", 1).alias("x"),
                          F.shiftright("y", 1).alias("y"), "n_docs")
                  .groupBy("x", "y").agg(F.sum("n_docs").alias("n_docs")))
        levels.append(cur.select(F.lit(z).alias("z"), "x", "y", "n_docs"))
    out = levels[0]
    for l in levels[1:]:
        out = out.unionAll(l)
    return out


def copy_down_subtrees(tiles: DataFrame, to_z: int) -> DataFrame:
    """Full-cover copy-down (reference copy_subtree,
    avecado_exporter.cpp:229-241): every UNinteresting tile's bytes are
    replicated to all its descendants down to to_z; interesting tiles pass
    through. Explode of (2^dz)² child offsets per parent."""
    unint = tiles.where(~F.col("interesting"))
    kid_frames = []
    # dz is data-dependent (z column), so build per-level from the parent
    # set; the distinct-z collect is a tiny driver-side plan decision.
    zs = [r.z for r in tiles.select("z").distinct().collect()]
    for z in zs:
        parents = unint.where(F.col("z") == z)
        for cz in range(z + 1, to_z + 1):
            n = 1 << (cz - z)
            off = F.explode(F.sequence(F.lit(0), F.lit(n * n - 1))).alias("o")
            kid_frames.append(
                parents.select("x", "y", "tile_pbf", "n_features", off)
                .select(F.lit(cz).alias("z"),
                        (F.col("x") * n + (F.col("o") % n)).alias("x"),
                        (F.col("y") * n + (F.col("o") / n).cast("long")).alias("y"),
                        F.lit(z).alias("src_z"),
                        "tile_pbf",
                        # copies carry the parent's count (reference
                        # copy_subtree duplicates the tile verbatim)
                        F.col("n_features")))
    if not kid_frames:
        return tiles
    kids = kid_frames[0]
    for k in kid_frames[1:]:
        kids = kids.unionAll(k)
    # Two uninteresting ancestors at different zooms can cover the same
    # child key — the nearest (deepest src_z) ancestor wins, matching the
    # reference's top-down recursion that stops at existing tiles.
    kids = (kids.groupBy("z", "x", "y")
                .agg(F.max(F.struct("src_z", "tile_pbf", "n_features")).alias("s"))
                .select("z", "x", "y", F.col("s.tile_pbf").alias("tile_pbf"),
                        F.col("s.n_features").alias("n_features"),
                        F.lit(False).alias("interesting")))
    # the reference's copy_subtree only fills tiles that were never
    # rendered — anti-join against existing keys so a rendered
    # descendant of an uninteresting parent is not duplicated
    kids = kids.join(tiles.select("z", "x", "y"), on=["z", "x", "y"],
                     how="left_anti")
    return tiles.unionAll(kids.select(*[c for c in tiles.columns]))
