"""The north-rule input table: Common-Crawl-style `pages`.

BASELINE.json.input_hint pins the shape:
    (url string, warc_ts timestamp, html binary, text string, lang string)

No external data is allowed, so the table is synthesized *deterministically*
from the driver-provided TPC-H-ish parquet (lineitem → one page per line
item; ~600k pages at sf0.1). Geography is embedded in `text` as integer
Web-Mercator millimeters ("geo:mxm=<int>;mym=<int>") so that

  * the engine's geocoding step is a real vectorized text-extraction UDF
    (byte-identical per url — the input_hint invariant), and
  * the DuckDB correctness oracle can re-derive the exact same integers
    with regexp_extract — giving bit-exact cross-engine parity without
    depending on transcendental-function rounding.

The spatial distribution is deliberately skewed (three "urban" hot spots
receive ~30% of pages within ±1 km) to exercise the hot-tile salting path
the north rule requires.

The synthesis is ONE SQL template rendered for two dialects (Spark, DuckDB),
so the oracle sees the same table by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

HALF_WORLD_MM = 20037508340  # = WORLD_SIZE_MM / 2
MARGIN_MM = 100000           # keep away from poles/antimeridian edges

# three hot "cities" in mercator mm (roughly NYC, London, Tokyo longitudes;
# values are arbitrary but fixed constants — only determinism matters)
CITY_X = (-8237642000, -14243000, 15550885000)
CITY_Y = (4970241000, 6711542000, 4253698000)
CITY_JITTER_MM = 1000000  # ±1 km

LANGS = ("en", "de", "fr", "es", "zh", "ru", "pt")

# dialect substitutions: {IDIV} integer division, {TS} epoch→timestamp
_DIALECT = {
    "spark": {"IDIV": "div", "TS": "timestamp_seconds"},
    "duckdb": {"IDIV": "//", "TS": "to_timestamp"},
}

_PAGES_TEMPLATE = """
WITH src AS (
  SELECT DISTINCT l_orderkey * 8 + l_linenumber AS k
  FROM {lineitem}
), geo AS (
  -- k is reduced mod 2^31 before the LCG multiply so k*2654435761 stays
  -- below 2^63 for any scale factor (2^31 * 2654435761 < 2^63): Spark
  -- would wrap int64 silently (non-ANSI) while DuckDB raises, breaking
  -- same-table-by-construction parity at large SF.
  SELECT k,
    (((k % 2147483648) * 2654435761 + 12345) % 100) AS hot,
    (((k % 2147483648) * 2654435761 + 1013904223) % {xspan}) - {xhalf} AS ux,
    (((k % 2147483648) * 2246822519 + 3266489917) % {yspan}) - {yhalf} AS uy,
    ((k * 97 + 13) % {jspan}) - {jhalf} AS jx,
    ((k * 89 + 7) % {jspan}) - {jhalf} AS jy
  FROM src
), pos AS (
  SELECT k,
    CASE
      WHEN hot < 10 THEN {cx0} + jx
      WHEN hot < 20 THEN {cx1} + jx
      WHEN hot < 30 THEN {cx2} + jx
      ELSE ux
    END AS mx_mm,
    CASE
      WHEN hot < 10 THEN {cy0} + jy
      WHEN hot < 20 THEN {cy1} + jy
      WHEN hot < 30 THEN {cy2} + jy
      ELSE uy
    END AS my_mm
  FROM geo
), lnk AS (
  -- deterministic outlink targets: the page body (below) embeds them as
  -- real <a href> anchors, so the engine's link-extraction path parses
  -- actual HTML while the DuckDB oracle can re-derive the same targets
  -- closed-form from k (avecado_spark/operators/webgraph.py docstring).
  -- t1: sibling linenumber (often live)  t2/t3: orderkey neighbours
  -- t4: scattered LCG key (dead with prob ~1 — exercises dead-link drop)
  SELECT k, mx_mm, my_mm,
    k - (k % 8) + ((k + 1) % 8) AS t1,
    k + 8 AS t2,
    CASE WHEN k >= 8 THEN k - 8 ELSE k + 16 END AS t3,
    ((k % 2147483648) * 2654435761 + 999983) % 2147483648 AS t4
  FROM pos
)
SELECT
  'https://crawl.example.org/page/' || CAST(p.k AS STRING) AS url,
  {TS}(1704067200 + (p.k % 31536000)) AS warc_ts,
  CAST(('<html><head><title>page ' || CAST(p.k AS STRING) || '</title></head><body>'
   || '<h1>Page ' || CAST(p.k AS STRING) || '</h1>'
   || '<a href="/page/' || CAST(p.t1 AS STRING) || '">to ' || CAST(p.t1 AS STRING) || '</a> '
   || '<A HREF="HTTPS://CRAWL.EXAMPLE.ORG:443/page/' || CAST(p.t2 AS STRING) || '#sec">next</A> '
   || '<a class="nav" href=''../page/' || CAST(p.t3 AS STRING) || '''>prev</a> '
   || '<a href="https://dead.example.net/lost/' || CAST(p.t4 AS STRING) || '?q=1" rel="nofollow">offsite</a> '
   || '<a href="#top">top</a> '
   || '<a href="https://crawl.example.org/page/' || CAST(p.t1 AS STRING) || '">again</a>'
   || '<p>page ' || CAST(p.k AS STRING) || ' body</p></body></html>') AS BINARY) AS html,
  ('page ' || CAST(p.k AS STRING)
   || ' geo:mxm=' || CAST(p.mx_mm AS STRING)
   || ';mym=' || CAST(p.my_mm AS STRING)
   || ' lang '
   || CASE CAST(p.k % 7 AS INT)
        WHEN 0 THEN 'en' WHEN 1 THEN 'de' WHEN 2 THEN 'fr' WHEN 3 THEN 'es'
        WHEN 4 THEN 'zh' WHEN 5 THEN 'ru' ELSE 'pt' END
   || ' body lorem ipsum dolor sit amet') AS text,
  CASE CAST(p.k % 7 AS INT)
    WHEN 0 THEN 'en' WHEN 1 THEN 'de' WHEN 2 THEN 'fr' WHEN 3 THEN 'es'
    WHEN 4 THEN 'zh' WHEN 5 THEN 'ru' ELSE 'pt' END AS lang
FROM lnk p
"""


def _render(dialect: str, lineitem_rel: str) -> str:
    xhalf = HALF_WORLD_MM - MARGIN_MM
    yhalf = 15000000000  # cap |merc y| ≈ ±74° lat — realistic inhabited band
    sub = dict(_DIALECT[dialect])
    sql = _PAGES_TEMPLATE.format(
        lineitem=lineitem_rel,
        xspan=2 * xhalf, xhalf=xhalf,
        yspan=2 * yhalf, yhalf=yhalf,
        jspan=2 * CITY_JITTER_MM, jhalf=CITY_JITTER_MM,
        cx0=CITY_X[0], cx1=CITY_X[1], cx2=CITY_X[2],
        cy0=CITY_Y[0], cy1=CITY_Y[1], cy2=CITY_Y[2],
        TS=sub["TS"],
    )
    if dialect == "duckdb":
        # duckdb: BINARY→BLOB, STRING→VARCHAR
        sql = sql.replace(" AS BINARY)", " AS BLOB)").replace(" AS STRING)", " AS VARCHAR)")
    return sql


def pages_df(spark: SparkSession, sf_dir: str, multiplier: int = 1) -> DataFrame:
    """The pages table as a Spark DataFrame (lazily, fully declarative —
    Catalyst sees straight column arithmetic over the parquet scan, so
    filter pushdown and column pruning still apply to lineitem).

    multiplier > 1 fans every source key out to `multiplier` distinct pages
    (k' = k·M + r; the LCG then scatters each replica independently). Used
    by the benchmark to make the tile build compute-dominated at local
    scale factors; the oracle-checked queries always use multiplier=1."""
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").createOrReplaceTempView("__pages_lineitem")
    src = "__pages_lineitem"
    if multiplier > 1:
        spark.sql(
            f"SELECT k0 * {multiplier} + m AS l_orderkey, 0 AS l_linenumber "
            f"FROM (SELECT DISTINCT l_orderkey * 8 + l_linenumber AS k0 "
            f"      FROM __pages_lineitem) "
            f"LATERAL VIEW explode(sequence(0, {multiplier - 1})) t AS m"
        ).createOrReplaceTempView("__pages_lineitem_mult")
        # the template re-derives k = l_orderkey*8 + l_linenumber; feeding
        # (k', 0) keeps keys distinct: k'' = k'*8
        src = "__pages_lineitem_mult"
    return spark.sql(_render("spark", src))


def pages_oracle_sql() -> str:
    """The identical table as a DuckDB subquery (for oracle_sql strings).
    Uses the driver's pre-registered `lineitem` view."""
    return "(" + _render("duckdb", "lineitem") + ")"
