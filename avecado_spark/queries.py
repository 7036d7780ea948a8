"""Driver-contract query registry.

Each entry couples a Spark implementation (spark, sf_dir) -> DataFrame with a
DuckDB oracle SQL string over the driver's pre-registered views (region,
nation, customer, supplier, part, orders, lineitem, events, documents,
embeddings). Column names/aliases are kept identical on both sides — the
driver sorts columns by name and value-hashes, so every computed column is
aliased the same way in Spark code and SQL text.

Queries whose semantics are not SQL-expressible (MVT byte assembly, izer
pipelines) register with oracle=None → the driver records a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.keys import geocode, with_tile_keys
from .sources.pages import pages_df, pages_oracle_sql

GEO_RE = r"geo:mxm=(-?\\d+);mym=(-?\\d+)"

_REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}


def register(name: str, oracle: str | None):
    def deco(fn):
        _REGISTRY[name] = (fn, oracle)
        return fn
    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {k: v[0] for k, v in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {k: v[1] for k, v in _REGISTRY.items() if v[1] is not None}


# ---------------------------------------------------------------------------
# shared oracle fragments
# ---------------------------------------------------------------------------

PAGES = pages_oracle_sql()

# geocode in DuckDB: regexp_extract of the same integer markers
GEO_SQL = f"""(
  SELECT url, text, lang,
         CAST(regexp_extract(text, 'geo:mxm=(-?\\d+);mym=(-?\\d+)', 1) AS BIGINT) AS mx_mm,
         CAST(regexp_extract(text, 'geo:mxm=(-?\\d+);mym=(-?\\d+)', 2) AS BIGINT) AS my_mm
  FROM {PAGES} p
)"""


def _geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    return geocode(pages_df(spark, sf_dir))


# ---------------------------------------------------------------------------
# S1/P2 — scan with mercator bbox predicate pushdown
# ---------------------------------------------------------------------------

_BBOX = (-9000000000, 4000000000, -7000000000, 6000000000)  # mm; covers city 0


@register("s1_scan_bbox_filter", f"""
  SELECT url, mx_mm, my_mm FROM {GEO_SQL} g
  WHERE mx_mm BETWEEN {_BBOX[0]} AND {_BBOX[2]}
    AND my_mm BETWEEN {_BBOX[1]} AND {_BBOX[3]}
""")
def s1_scan_bbox_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1+P2 (SURVEY §2.1/§2.2): bbox-windowed feature scan
    (reference make_vector_tile.cpp:30-33 query over buffered tile bbox)."""
    g = _geo(spark, sf_dir)
    return (g.where(F.col("mx_mm").between(_BBOX[0], _BBOX[2])
                    & F.col("my_mm").between(_BBOX[1], _BBOX[3]))
             .select("url", "mx_mm", "my_mm"))


# ---------------------------------------------------------------------------
# tile assignment / pyramid (A1 grouping, J4 ancestor, F1 box)
# ---------------------------------------------------------------------------

from .functions.mercator import (HALF_WORLD, WORLD_SIZE, tile_x_expr,
                                 tile_x_sql, tile_y_expr, tile_y_sql)


@register("tile_assign_z14", f"""
  SELECT {tile_x_sql('mx_mm', 14)} AS x, {tile_y_sql('my_mm', 14)} AS y,
         COUNT(*) AS n_docs
  FROM {GEO_SQL} g GROUP BY 1, 2
""")
def tile_assign_z14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 (SURVEY §2.4): the tile build's grouping — docs per z14 tile.
    Exact integer math (bit-identical to the oracle)."""
    g = _geo(spark, sf_dir)
    return (g.select(tile_x_expr("mx_mm", 14).alias("x"),
                     tile_y_expr("my_mm", 14).alias("y"))
             .groupBy("x", "y").agg(F.count("*").alias("n_docs")))


@register("j4_overzoom_ancestor", f"""
  WITH t AS (
    SELECT {tile_x_sql('mx_mm', 16)} AS x16, {tile_y_sql('my_mm', 16)} AS y16
    FROM {GEO_SQL} g
  )
  SELECT (x16 // 4) AS x14, (y16 // 4) AS y14, COUNT(*) AS n_docs
  FROM t GROUP BY 1, 2
""")
def j4_overzoom_ancestor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 (SURVEY §2.3): overzoom ancestor lookup — z16 keys right-shifted
    to their z14 ancestors (reference overzoom.cpp:14-23)."""
    g = _geo(spark, sf_dir)
    t = g.select(tile_x_expr("mx_mm", 16).alias("x16"),
                 tile_y_expr("my_mm", 16).alias("y16"))
    return (t.select(F.shiftright("x16", 2).alias("x14"),
                     F.shiftright("y16", 2).alias("y14"))
             .groupBy("x14", "y14").agg(F.count("*").alias("n_docs")))


@register("f1_box_for_tile", f"""
  WITH t AS (
    SELECT DISTINCT {tile_x_sql('mx_mm', 6)} AS x, {tile_y_sql('my_mm', 6)} AS y
    FROM {GEO_SQL} g
  )
  SELECT x, y,
    x * ({WORLD_SIZE!r} / 64.0) - {HALF_WORLD!r} AS minx,
    {HALF_WORLD!r} - (y + 1) * ({WORLD_SIZE!r} / 64.0) AS miny,
    (x + 1) * ({WORLD_SIZE!r} / 64.0) - {HALF_WORLD!r} AS maxx,
    {HALF_WORLD!r} - y * ({WORLD_SIZE!r} / 64.0) AS maxy
  FROM t
""")
def f1_box_for_tile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 (SURVEY §2.8): box_for_tile as a column expression
    (reference util.cpp:8-17). Same IEEE op order as the oracle."""
    g = _geo(spark, sf_dir)
    t = (g.select(tile_x_expr("mx_mm", 6).alias("x"),
                  tile_y_expr("my_mm", 6).alias("y")).distinct())
    scale = F.lit(WORLD_SIZE) / F.lit(64.0)
    return t.select(
        "x", "y",
        (F.col("x") * scale - F.lit(HALF_WORLD)).alias("minx"),
        (F.lit(HALF_WORLD) - (F.col("y") + F.lit(1)) * scale).alias("miny"),
        ((F.col("x") + F.lit(1)) * scale - F.lit(HALF_WORLD)).alias("maxx"),
        (F.lit(HALF_WORLD) - F.col("y") * scale).alias("maxy"))


@register("a2_layer_envelope", f"""
  WITH t AS (
    SELECT {tile_x_sql('mx_mm', 8)} AS x, {tile_y_sql('my_mm', 8)} AS y,
           mx_mm, my_mm
    FROM {GEO_SQL} g
  )
  SELECT x, y, MIN(mx_mm) AS minx, MIN(my_mm) AS miny,
         MAX(mx_mm) AS maxx, MAX(my_mm) AS maxy
  FROM t GROUP BY 1, 2
""")
def a2_layer_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 (SURVEY §2.4): per-tile layer envelope — the expand_to_include
    fold (reference adminizer.cpp:160-173) as MIN/MAX aggregates."""
    g = _geo(spark, sf_dir)
    t = g.select(tile_x_expr("mx_mm", 8).alias("x"),
                 tile_y_expr("my_mm", 8).alias("y"), "mx_mm", "my_mm")
    return t.groupBy("x", "y").agg(
        F.min("mx_mm").alias("minx"), F.min("my_mm").alias("miny"),
        F.max("mx_mm").alias("maxx"), F.max("my_mm").alias("maxy"))


@register("p6_valid_tile_range", f"""
  WITH t AS (
    SELECT {tile_x_sql('mx_mm', 14)} AS x, {tile_y_sql('my_mm', 14)} AS y
    FROM {GEO_SQL} g
  )
  SELECT COUNT(*) AS n_valid FROM t
  WHERE x >= 0 AND x < 16384 AND y >= 0 AND y < 16384
""")
def p6_valid_tile_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 (SURVEY §2.2): z/x/y range validation
    (reference mapnik_request_handler.cpp:127-140)."""
    g = _geo(spark, sf_dir)
    t = g.select(tile_x_expr("mx_mm", 14).alias("x"),
                 tile_y_expr("my_mm", 14).alias("y"))
    return (t.where((F.col("x") >= 0) & (F.col("x") < 16384)
                    & (F.col("y") >= 0) & (F.col("y") < 16384))
             .agg(F.count("*").alias("n_valid")))


# ---------------------------------------------------------------------------
# J1/J2 — broadcast spatial joins over pages points (SURVEY §2.3)
# ---------------------------------------------------------------------------

from .operators.adminizer import adminize_points
from .sources.pages import CITY_X, CITY_Y

_CORE = 1500000  # ±1.5 km around the hot-city centers (jitter is ±1 km)
ADMIN_BOXES = [
    (0, CITY_X[0] - _CORE, CITY_Y[0] - _CORE, CITY_X[0] + _CORE, CITY_Y[0] + _CORE, "city0_core"),
    (1, CITY_X[1] - _CORE, CITY_Y[1] - _CORE, CITY_X[1] + _CORE, CITY_Y[1] + _CORE, "city1_core"),
    (2, CITY_X[2] - _CORE, CITY_Y[2] - _CORE, CITY_X[2] + _CORE, CITY_Y[2] + _CORE, "city2_core"),
    (3, -20037508340, 3000000000, 20037508340, 7000000000, "north_band"),
    (4, -20037508340, -15000000000, 0, 15000000000, "west_hemi"),
]

_BOXES_SQL = "(VALUES " + ", ".join(
    f"({i}, {x0}, {y0}, {x1}, {y1}, '{v}')" for i, x0, y0, x1, y1, v in ADMIN_BOXES
) + ") AS b(idx, minx, miny, maxx, maxy, val)"


@register("j1a_pip_first", f"""
  SELECT g.url, min_by(b.val, b.idx) AS admin
  FROM {GEO_SQL} g
  LEFT JOIN {_BOXES_SQL}
    ON g.mx_mm BETWEEN b.minx AND b.maxx AND g.my_mm BETWEEN b.miny AND b.maxy
  GROUP BY g.url
""")
def j1a_pip_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1a (SURVEY §2.3): point-in-polygon broadcast join, first-match mode —
    lowest-index containing polygon wins (reference adminizer.cpp:63-80,
    :103-112). Probe is a vectorized mapInPandas over the broadcast index;
    no shuffle of the big side."""
    g = _geo(spark, sf_dir)
    return adminize_points(g, ADMIN_BOXES, mode="first").select("url", "admin")


@register("j1b_pip_collect", f"""
  SELECT g.url,
         CASE WHEN COUNT(b.idx) > 0
              THEN string_agg(b.val, ',' ORDER BY b.idx) END AS admin
  FROM {GEO_SQL} g
  LEFT JOIN {_BOXES_SQL}
    ON g.mx_mm BETWEEN b.minx AND b.maxx AND g.my_mm BETWEEN b.miny AND b.maxy
  GROUP BY g.url
""")
def j1b_pip_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1b (SURVEY §2.3): collect mode — all matching values in index order,
    comma-delimited (reference adminizer.cpp:94-107, :688-691)."""
    g = _geo(spark, sf_dir)
    return adminize_points(g, ADMIN_BOXES, mode="collect").select("url", "admin")


@register("j2_knn_nearest", f"""
  SELECT url, val AS admin FROM (
    SELECT g.url, b.val,
           (CAST(g.mx_mm - (b.minx + b.maxx) // 2 AS DOUBLE) * CAST(g.mx_mm - (b.minx + b.maxx) // 2 AS DOUBLE)
          + CAST(g.my_mm - (b.miny + b.maxy) // 2 AS DOUBLE) * CAST(g.my_mm - (b.miny + b.maxy) // 2 AS DOUBLE)) AS d2,
           b.idx
    FROM {GEO_SQL} g CROSS JOIN {_BOXES_SQL}
    QUALIFY row_number() OVER (PARTITION BY g.url ORDER BY d2, b.idx) = 1
  )
""")
def j2_knn_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 (SURVEY §2.3): kNN (k=1) classification against the admin table —
    nearest box centroid by squared euclidean distance, ties by index
    (the reference's within/disjoint trichotomy generalized to
    STRtree.nearest per the north rule)."""
    g = _geo(spark, sf_dir)
    return adminize_points(g, ADMIN_BOXES, mode="knn").select(
        "url", F.col("admin"))


# ---------------------------------------------------------------------------
# izer pipelines + MVT build (non-SQL-expressible → rows-only checks)
# ---------------------------------------------------------------------------

def _city_line_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-page road segments near city 0, grid-snapped so
    endpoints coincide and the unionizer has real work to do. Coordinates in
    mercator meters (WKT), tile keys at z12."""
    g = _geo(spark, sf_dir)
    c = g.where((F.col("mx_mm").between(CITY_X[0] - 1500000, CITY_X[0] + 1500000))
                & (F.col("my_mm").between(CITY_Y[0] - 1500000, CITY_Y[0] + 1500000)))
    c = (c.withColumn("sx", ((F.col("mx_mm") / 100000).cast("long") * 100).cast("double"))
          .withColumn("sy", ((F.col("my_mm") / 100000).cast("long") * 100).cast("double")))
    wkt = F.concat(F.lit("LINESTRING("),
                   F.col("sx").cast("long"), F.lit(" "), F.col("sy").cast("long"),
                   F.lit(", "),
                   (F.col("sx") + 100).cast("long"), F.lit(" "), F.col("sy").cast("long"),
                   F.lit(")"))
    return (c.select(F.lit(12).alias("z"),
                     tile_x_expr("mx_mm", 12).alias("x"),
                     tile_y_expr("my_mm", 12).alias("y"),
                     F.lit("roads").alias("layer"),
                     F.col("url").substr(32, 20).cast("long").alias("id"),
                     F.create_map(F.lit("a"), F.lit("yes")).alias("props"),
                     wkt.alias("wkt"))
             .dropDuplicates(["wkt"]))


@register("izer_unionize_tiles", None)
def izer_unionize_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3/U3 (SURVEY §2.3/§2.7): per-(tile, layer) unionizer via the
    distributed izer pipeline (groupBy(z,x,y,layer).applyInPandas — the
    izer_base.hpp:14-21 correspondence). Grid-snapped segments chain into
    longer linestrings; output is per-tile feature counts after the
    fixpoint (unionizer.cpp:537-563)."""
    from .plans.pipeline import apply_to_tiles
    feats = _city_line_features(spark, sf_dir)
    conf = {"roads": [{"minzoom": 0, "maxzoom": 22, "process": [
        {"type": "unionizer", "union_heuristic": "greedy",
         "tag_strategy": "intersect", "max_iterations": 10,
         "match_tags": ["a"]}]}]}
    out = apply_to_tiles(feats, conf)
    return (out.groupBy("x", "y")
               .agg(F.count("*").alias("n_features"),
                    F.sum(F.size(F.split(F.col("wkt"), ","))).alias("n_points"))
               .orderBy("x", "y"))


@register("izer_generalize_tiles", None)
def izer_generalize_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 (SURVEY §2.8): Douglas-Peucker via the izer pipeline. Synthetic
    5-point zigzags (deterministic from page coords) collapse to 2 points."""
    from .plans.pipeline import apply_to_tiles
    base = _geo(spark, sf_dir)
    m = (base.withColumn("bx", (F.col("mx_mm") / 1000).cast("long"))
             .withColumn("by", (F.col("my_mm") / 1000).cast("long")))
    wkt = F.concat(
        F.lit("LINESTRING("),
        F.col("bx"), F.lit(" "), F.col("by"), F.lit(", "),
        F.col("bx") + 100, F.lit(" "), F.col("by") + 1, F.lit(", "),
        F.col("bx") + 200, F.lit(" "), F.col("by"), F.lit(", "),
        F.col("bx") + 300, F.lit(" "), F.col("by") + 1, F.lit(", "),
        F.col("bx") + 400, F.lit(" "), F.col("by"), F.lit(")"))
    feats = m.select(F.lit(10).alias("z"),
                     tile_x_expr("mx_mm", 10).alias("x"),
                     tile_y_expr("my_mm", 10).alias("y"),
                     F.lit("roads").alias("layer"),
                     F.col("url").substr(32, 20).cast("long").alias("id"),
                     F.create_map(F.lit("a"), F.lit("yes")).alias("props"),
                     wkt.alias("wkt"))
    conf = {"roads": [{"minzoom": 0, "maxzoom": 22, "process": [
        {"type": "generalizer", "algorithm": "douglas-peucker",
         "tolerance": 5.0}]}]}
    out = apply_to_tiles(feats, conf)
    return (out.select("id",
                       F.size(F.split(F.col("wkt"), ",")).alias("n_points"))
               .groupBy("n_points").agg(F.count("*").alias("n_lines")))


@register("izer_adminize_split", None)
def izer_adminize_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1c (SURVEY §2.3): split-mode adminizer via the izer pipeline —
    east-west lines crossing the city-0 core box split at its boundary
    (adminizer.cpp:456-522); output counts per resulting admin value."""
    from .plans.pipeline import apply_to_tiles
    g = _geo(spark, sf_dir)
    c = g.where((F.col("mx_mm").between(CITY_X[0] - 3000000, CITY_X[0] + 3000000))
                & (F.col("my_mm").between(CITY_Y[0] - 1400000, CITY_Y[0] + 1400000)))
    bx = (F.col("mx_mm") / 1000).cast("long")
    by = (F.col("my_mm") / 1000).cast("long")
    wkt = F.concat(F.lit("LINESTRING("),
                   bx - 4000, F.lit(" "), by, F.lit(", "),
                   bx + 4000, F.lit(" "), by, F.lit(")"))
    feats = c.select(F.lit(10).alias("z"),
                     F.lit(0).cast("long").alias("x"),
                     F.lit(0).cast("long").alias("y"),
                     F.lit("roads").alias("layer"),
                     F.col("url").substr(32, 20).cast("long").alias("id"),
                     F.create_map().cast("map<string,string>").alias("props"),
                     wkt.alias("wkt"))
    core_m = (CITY_X[0] // 1000, CITY_Y[0] // 1000, 1500)
    box_wkt = (f"POLYGON(({core_m[0]-1500} {core_m[1]-1500}, {core_m[0]+1500} {core_m[1]-1500}, "
               f"{core_m[0]+1500} {core_m[1]+1500}, {core_m[0]-1500} {core_m[1]+1500}, "
               f"{core_m[0]-1500} {core_m[1]-1500}))")
    conf = {"roads": [{"minzoom": 0, "maxzoom": 22, "process": [
        {"type": "adminizer", "param_name": "region", "split": "true",
         "datasource": {"inline_rows": [(box_wkt, "core")]}}]}]}
    out = apply_to_tiles(feats, conf)
    return (out.groupBy(F.coalesce(F.col("props")["region"], F.lit("outside")).alias("region"))
               .agg(F.count("*").alias("n_segments")))


@register("mvt_build_z14", None)
def mvt_build_z14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/S4 (SURVEY §2.4/§2.1): the full two-phase salted MVT tile build;
    tile bytes are deterministic (gzip mtime=0), surfaced as md5."""
    from .api import build_tiles
    tiles = build_tiles(pages_df(spark, sf_dir), z=14)
    return tiles.select("z", "x", "y", "n_features", "interesting",
                        F.md5(F.col("tile_pbf")).alias("tile_md5"))
