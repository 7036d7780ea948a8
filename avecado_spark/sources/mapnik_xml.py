"""Mapnik Map-XML loader — the reference's primary on-disk config format.

The reference consumes a Mapnik XML file everywhere (`--map-file` in
avecado_exporter.cpp:365,537,685 and avecado_server.cpp:82; the Python
binding demos `mapnik.load_map(m, 'style.xml')`, python_module.cpp:224).
Three things are read off the loaded Map:

  * layers + their datasources (test fixtures use inline-CSV, e.g.
    test/single_poly.xml) — the feature SOURCE for make_vector_tile;
  * `<Parameters>` — the TileJSON document fields (tilejson.cpp:228-318
    `make_tilejson(map, base_url)`: integer-forced metatile/maskLevel/
    maxzoom/minzoom, defaults, maskLevel→maxzoom fallback, center/bounds
    as arrays, vector_layers from active layers);
  * styles/rules — the raster render leg (render_vector_tile.cpp applies
    the Map's styles per layer).

This module parses the same XML with the stdlib ElementTree and adapts it
onto the engine's existing surfaces: `features_from_map` → the izer/encode
feature DataFrame, `tilejson_from_map` → the TileJSON string
`fetch_from_tilejson` consumes, `style_from_map` → the
`render_tile_styled` rule document (the J5 style↔layer name join read
from the file format users actually have). The styling subset mirrors
what the styled renderer implements: Polygon/Line/Markers/Point
symbolizers with fill/opacity/stroke/width, and Filters of the form
`[key] = 'value'` (or an or-chain over one key → an `in` filter).
"""

from __future__ import annotations

import json
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession


def parse_map_xml(text: str | bytes) -> dict:
    """Map XML → plain dict:
    {"background": str|None, "parameters": {name: str},
     "layers": [{"name", "status", "styles": [names],
                 "header": [cols]|None, "rows": [{col: val}]|None}],
     "styles": {name: [rule dicts]}}."""
    root = ET.fromstring(text)
    if root.tag != "Map":
        raise ValueError(f"expected <Map> root, got <{root.tag}>")
    doc: dict = {
        "background": root.get("background-color"),
        "srs": root.get("srs"),
        "maximum_extent": root.get("maximum-extent"),
        "parameters": {},
        "layers": [],
        "styles": {},
    }
    for params in root.findall("Parameters"):
        for p in params.findall("Parameter"):
            doc["parameters"][p.get("name")] = (p.text or "").strip()
    for style in root.findall("Style"):
        doc["styles"][style.get("name")] = [
            _parse_rule(r) for r in style.findall("Rule")]
    for layer in root.findall("Layer"):
        entry = {
            "name": layer.get("name"),
            "status": layer.get("status", "on"),
            "styles": [s.text.strip() for s in layer.findall("StyleName")
                       if s.text],
            "header": None,
            "rows": None,
        }
        ds = layer.find("Datasource")
        if ds is not None:
            params = {p.get("name"): (p.text or "")
                      for p in ds.findall("Parameter")}
            if params.get("type", "").strip() == "csv":
                header, rows = _parse_inline_table(params.get("inline", ""))
                entry["header"] = header
                entry["rows"] = rows
        doc["layers"].append(entry)
    return doc


def _parse_inline_table(inline: str):
    """The reference's pipe-delimited inline CSV (test/single_poly.xml) —
    full-row variant of plans/pipeline.parse_inline_csv (which keeps only
    (wkt, value) for the adminizer datasource)."""
    lines = [l for l in inline.strip().split("\n") if l.strip()]
    if not lines:
        return None, None
    header = [h.strip() for h in lines[0].split("|")]
    rows = []
    for line in lines[1:]:
        cells = line.split("|")
        rows.append({h: (cells[i] if i < len(cells) else None)
                     for i, h in enumerate(header)})
    return header, rows


def _parse_rule(rule) -> dict:
    out: dict = {}
    filt = rule.find("Filter")
    if filt is not None and filt.text:
        out["filter"] = _parse_filter(filt.text.strip())
    poly = rule.find("PolygonSymbolizer")
    if poly is not None:
        out["polygon"] = {"fill": _color_with_opacity(
            poly.get("fill", "#808080"), poly.get("fill-opacity"))}
    line = rule.find("LineSymbolizer")
    if line is not None:
        out["line"] = {"stroke": _color_with_opacity(
            line.get("stroke", "#000000"), line.get("stroke-opacity")),
            "width": float(line.get("stroke-width", "1"))}
    pt = rule.find("MarkersSymbolizer")
    if pt is None:
        pt = rule.find("PointSymbolizer")
    if pt is not None:
        out["point"] = {"fill": _color_with_opacity(
            pt.get("fill", "#0000ff"), pt.get("opacity")),
            "radius": float(pt.get("width", "2")) / 2.0}
    return out


def _color_with_opacity(color: str, opacity: str | None) -> str:
    color = color.strip()
    if opacity is None:
        return color
    a = max(0, min(255, int(round(float(opacity) * 255))))
    if len(color) == 4 and color.startswith("#"):   # #rgb → #rrggbb
        color = "#" + "".join(c * 2 for c in color[1:])
    return f"{color}{a:02x}"


def _parse_filter(expr: str) -> dict:
    """Mapnik filter subset: `[key] = 'value'`, optionally or-chained over
    the SAME key → {"key", "equals"} or {"key", "in"}. Anything else is
    rejected loudly (honest boundary — no silent mis-styling)."""
    import re
    terms = re.split(r"\s+or\s+", expr.strip(), flags=re.IGNORECASE)
    key = None
    vals = []
    for t in terms:
        t = t.strip()
        if t.startswith("(") and t.endswith(")"):
            t = t[1:-1].strip()
        m = re.fullmatch(r"\[([^\]]+)\]\s*=\s*'([^']*)'", t)
        if not m:
            raise NotImplementedError(
                f"unsupported Mapnik filter term: {t!r} (supported: "
                f"[key] = 'value', or-chained over one key)")
        k, v = m.group(1), m.group(2)
        if key is None:
            key = k
        elif key != k:
            raise NotImplementedError(
                "or-chained filter over multiple keys is not supported")
        vals.append(v)
    if len(vals) == 1:
        return {"key": key, "equals": vals[0]}
    return {"key": key, "in": vals}


# ---------------------------------------------------------------------------
# adapters onto the engine's surfaces
# ---------------------------------------------------------------------------

def features_from_map(spark: SparkSession, doc: dict, z: int,
                      id_col: str = "id") -> DataFrame:
    """Inline-CSV layers → the izer/encode feature DataFrame
    (z, x, y, layer, id, props map, wkt). Tile keys are derived from the
    first coordinate of each WKT (the reference buckets by geometry the
    same way during the bulk export); non-CSV layers are skipped."""
    import re

    from ..functions.mercator import tile_for_mercator

    rows = []
    for layer in doc["layers"]:
        if layer["status"] != "on" or not layer["rows"]:
            continue
        for i, r in enumerate(layer["rows"]):
            wkt = r.get("wkt")
            if not wkt:
                continue
            m = re.search(r"(-?[\d.]+)\s+(-?[\d.]+)", wkt)
            if m is None:
                raise ValueError(
                    f"layer {layer['name']!r} row {i}: WKT has no "
                    f"coordinate pair: {wkt!r}")
            tx, ty = tile_for_mercator(float(m.group(1)),
                                       float(m.group(2)), z)
            x, y = int(tx), int(ty)
            props = {k: v for k, v in r.items() if k != "wkt"
                     and v is not None}
            fid = r.get(id_col)
            rows.append((z, x, y, layer["name"],
                         int(fid) if fid and fid.isdigit() else i,
                         props, wkt))
    return spark.createDataFrame(
        rows, "z int, x long, y long, layer string, id long, "
              "props map<string,string>, wkt string")


_TILEJSON_DEFAULTS = {
    "minzoom": 0,
    "maxzoom": 0,
    "format": "pbf",
    "name": "Avecado Development Server",
    "private": True,
    "scheme": "xyz",
    "tilejson": "2.0.0",
}
_INT_KEYS = ("metatile", "maskLevel", "maxzoom", "minzoom")
_ARRAY_KEYS = ("center", "bounds")


def tilejson_from_map(doc: dict, base_url: str) -> str:
    """The reference's make_tilejson(map, base_url) semantics
    (tilejson.cpp:228-318): Map Parameters + integer forcing for
    metatile/maskLevel/maxzoom/minzoom (string2int — non-numeric raises),
    defaults for missing keys, maskLevel defaulting to maxzoom,
    center/bounds emitted as number arrays, tiles = base_url pattern,
    vector_layers from active layers (fields = CSV columns minus wkt)."""
    params: dict = dict(_TILEJSON_DEFAULTS)
    for k, v in doc["parameters"].items():
        params[k] = v
    for k in _INT_KEYS:
        if k in params and not isinstance(params[k], (int, bool)):
            try:
                params[k] = int(str(params[k]).strip())
            except ValueError:
                raise ValueError(
                    f'Could not parse "{params[k]}" as integer')
    if "maskLevel" not in params:
        params["maskLevel"] = params["maxzoom"]
    for k in _ARRAY_KEYS:
        if k in params and isinstance(params[k], str):
            params[k] = [_num(x) for x in params[k].split(",")]
    layers = []
    for layer in doc["layers"]:
        if layer["status"] != "on":
            continue
        fields = [c for c in (layer["header"] or []) if c != "wkt"]
        layers.append({"id": layer["name"], "description": "",
                       "fields": {f: "" for f in fields}})
    params["tiles"] = [f"{base_url}/{{z}}/{{x}}/{{y}}.pbf"]
    params["vector_layers"] = layers
    return json.dumps(params, sort_keys=True)


def _num(s: str):
    s = s.strip()
    try:
        return int(s)
    except ValueError:
        return float(s)


def style_from_map(doc: dict) -> dict:
    """Map styles + per-layer StyleName references → the
    render_tile_styled rule document. Layer order is draw order (mapnik's
    painter model); within a layer, styles apply in StyleName order and
    rules in document order — each becomes one entry tagged with the
    layer's name (the J5 name join resolved at load time)."""
    out: dict = {"layers": []}
    if doc.get("background"):
        out["background"] = doc["background"]
    for layer in doc["layers"]:
        if layer["status"] != "on":
            continue
        for sname in layer["styles"]:
            for rule in doc["styles"].get(sname, []):
                entry = {"layer": layer["name"], **rule}
                out["layers"].append(entry)
    return out
