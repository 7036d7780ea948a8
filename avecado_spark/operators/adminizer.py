"""Adminizer — the spatial join post-processor.

Reference: /root/reference/src/post_process/adminizer.cpp (820 LoC).
For every feature of a layer, find admin polygons whose geometry intersects
it and attribute the polygon's `param_name` value onto the feature:

  mode first   (default) — value of the lowest-index intersecting polygon
                (param_updater + `*indices.begin()`, adminizer.cpp:63-80,
                 :103-112); early exit once polygon 0 matched (:766-768).
  mode collect — all matching values joined in ascending index order with a
                delimiter (default ",") (adminizer.cpp:94-107, :688-691).
  mode split   — recursively split feature geometry into inside/outside
                parts per matched polygon in ascending index order, each
                part adminized separately (adminizer.cpp:277-329, :392-443,
                 :456-522).

Index: packed STRtree over polygon bboxes, exact geometry re-check on
candidates (adminizer.cpp:620, :728-742, :594-602) — here a numpy STRtree
broadcast to executors.

Two surfaces:
  * `adminize_features` — exact row-level reference semantics over Geom
    features (used by the izer pipeline and the ported fixture tests).
  * `adminize_points` — the Spark-scale broadcast spatial join for the
    pages table (billions of points vs a small admin table): driver builds
    the packed index, broadcasts it, probes inside an Arrow-batched
    mapInPandas with fully vectorized numpy candidate tests. No shuffle:
    the admin side is broadcast, the probe is map-side only.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import geometry as G
from ..functions import wkt as W
from ..functions.strtree import STRtree
from ..functions.wkt import Geom


# ---------------------------------------------------------------------------
# entries + index construction (reference make_entries/make_index)
# ---------------------------------------------------------------------------

class AdminEntry:
    __slots__ = ("rings", "value", "index", "box")

    def __init__(self, rings, value, index):
        self.rings = [np.asarray(r, dtype=np.float64) for r in rings]
        self.value = value
        self.index = index
        self.box = G.bbox_of_rings(self.rings)


def make_entries(admin_rows: list[tuple]) -> list[AdminEntry]:
    """admin_rows: [(wkt, value)] in datasource order. One entry per POLYGON
    path; non-polygon geometries ignored (adminizer.cpp:706-716)."""
    entries = []
    index = 0
    for wkt_str, value in admin_rows:
        g = W.loads(wkt_str)
        if g.base_type() != "POLYGON":
            continue
        for rings in g.parts:
            entries.append(AdminEntry(rings, value, index))
            index += 1
    return entries


def make_index(entries: list[AdminEntry]) -> STRtree:
    return STRtree(np.array([e.box for e in entries]).reshape(-1, 4))


# ---------------------------------------------------------------------------
# exact geometry predicates per path (reference trichotomy + intersects)
# ---------------------------------------------------------------------------

def _path_points(geom: Geom, part) -> np.ndarray | None:
    if geom.base_type() == "POINT":
        return part[0]
    return None


def _intersects(geom_type: str, part, rings) -> bool:
    if geom_type == "POINT":
        return bool(G.points_cover(part[0], rings).any())
    if geom_type == "LINESTRING":
        return G.line_intersects_polygon(G.dedupe_vertices(part[0]), rings)
    return G.polygon_intersects_polygon(part, rings)


def _within(geom_type: str, part, rings) -> bool:
    if geom_type == "POINT":
        return bool(G.points_within(part[0], rings).all())
    if geom_type == "LINESTRING":
        return G.line_within_polygon(G.dedupe_vertices(part[0]), rings)
    return G.polygon_within_polygon(part, rings)


def _disjoint(geom_type: str, part, rings) -> bool:
    return not _intersects(geom_type, part, rings)


def _is_axis_box(rings) -> tuple | None:
    """Detect an axis-aligned rectangular clip polygon (no holes)."""
    if len(rings) != 1:
        return None
    r = G.close_ring(np.asarray(rings[0]))
    pts = r[:-1]
    if len(pts) != 4:
        return None
    xs, ys = set(pts[:, 0].tolist()), set(pts[:, 1].tolist())
    if len(xs) == 2 and len(ys) == 2:
        return (min(xs), min(ys), max(xs), max(ys))
    return None


def _split_part(geom_type: str, part, entry: AdminEntry):
    """split_hack equivalent: part → (inside_parts, outside_parts).
    Returns lists of parts of the same geometry type."""
    rings = entry.rings
    if geom_type == "POINT":
        pts = part[0]
        mask = G.points_cover(pts, rings)
        ins = [ [pts[mask]] ] if mask.any() else []
        outs = [ [pts[~mask]] ] if (~mask).any() else []
        return ins, outs
    if geom_type == "LINESTRING":
        ins, outs = G.split_line_by_polygon(part[0], rings)
        return [[a] for a in ins], [[a] for a in outs]
    # POLYGON: axis-box fast path (Sutherland–Hodgman slabs, all reference
    # fixtures), Greiner–Hormann general path for arbitrary (convex or
    # concave) admin polygons — the bg::intersection/bg::difference pair of
    # the reference (adminizer.cpp:285-291).
    box = _is_axis_box(rings)
    if box is not None:
        return G.split_polygon_by_box(part, box)
    return G.clip_polygon_general(part, rings)


# ---------------------------------------------------------------------------
# feature-level adminize (reference adminize_feature + split_and_update)
# ---------------------------------------------------------------------------

def _feature_paths(feat: dict):
    """Yield (geom_type, part) pairs, one per mapnik-style path."""
    for g in feat["geoms"]:
        bt = g.base_type()
        for part in g.parts:
            yield bt, part


def _update_params(indices: set[int], collect: bool, entries, feat: dict,
                   param_name: str, delimiter: str, append_to: list):
    append_to.append(feat)
    if indices:
        if collect:
            vals = [str(entries[i].value) for i in sorted(indices)]
            feat["props"] = dict(feat["props"], **{param_name: delimiter.join(vals)})
        else:
            feat["props"] = dict(feat["props"],
                                 **{param_name: entries[min(indices)].value})


def _split_and_update(indices: set[int], remaining: list[int], collect: bool,
                      entries, feat: dict, param_name: str, delimiter: str,
                      append_to: list):
    """Recursive split over matched polygon indices in ascending order
    (reference split_and_update, adminizer.cpp:456-522)."""
    if not remaining:
        _update_params(indices, collect, entries, feat, param_name,
                       delimiter, append_to)
        return
    remaining = list(remaining)
    index = heapq.heappop(remaining)
    e = entries[index]

    def _mk_geom(gtype: str, parts: list) -> Geom:
        return Geom(gtype if len(parts) == 1 else "MULTI" + gtype, parts)

    inside_geoms: list[Geom] = []
    outside_geoms: list[Geom] = []
    for gtype, part in _feature_paths(feat):
        if _within(gtype, part, e.rings):
            inside_geoms.append(Geom(gtype, [part]))
        elif _disjoint(gtype, part, e.rings):
            outside_geoms.append(Geom(gtype, [part]))
        else:
            ins, outs = _split_part(gtype, part, e)
            if ins:
                inside_geoms.append(_mk_geom(gtype, ins))
            if outs:
                outside_geoms.append(_mk_geom(gtype, outs))

    if inside_geoms:
        inside_feat = {"id": feat["id"], "props": dict(feat["props"]),
                       "geoms": inside_geoms}
        in_indices = indices | {index}
        if collect:
            _split_and_update(in_indices, remaining, collect, entries,
                              inside_feat, param_name, delimiter, append_to)
        else:
            # ascending order ⇒ first match already found (adminizer.cpp:497-505)
            _update_params(in_indices, collect, entries, inside_feat,
                           param_name, delimiter, append_to)
    if outside_geoms:
        outside_feat = {"id": feat["id"], "props": dict(feat["props"]),
                        "geoms": outside_geoms}
        _split_and_update(indices, remaining, collect, entries, outside_feat,
                          param_name, delimiter, append_to)


def adminize_features(features: list[dict], admin_rows: list[tuple],
                      param_name: str, split: bool = False,
                      collect: bool = False, delimiter: str = ",") -> list[dict]:
    """Exact reference semantics (adminizer::process, adminizer.cpp:779-800).

    features: [{"id": int, "props": {..}, "geoms": [Geom, ...]}]
    admin_rows: [(wkt, value)] in datasource order.
    Returns the new feature list (features may multiply in split mode).
    """
    entries = make_entries(admin_rows)
    tree = make_index(entries)
    out: list[dict] = []
    for feat in features:
        indices: set[int] = set()
        finished = False
        for gtype, part in _feature_paths(feat):
            env = G.bbox(np.vstack([np.asarray(a) for a in part]))
            for ei in tree.query_box(env):
                e = entries[int(ei)]
                if _intersects(gtype, part, e.rings):
                    indices.add(e.index)
                    if not collect and e.index == 0:
                        finished = True
            if finished:
                break
        if split:
            heap = sorted(indices)
            _split_and_update(set(), heap, collect, entries, feat,
                              param_name, delimiter, out)
        else:
            _update_params(indices, collect, entries, feat, param_name,
                           delimiter, out)
    return out


# ---------------------------------------------------------------------------
# Spark-scale broadcast point joins (pages table)
# ---------------------------------------------------------------------------

def adminize_points(df: DataFrame, admin_rows: list[tuple[int, float, float, float, float, str]],
                    mode: str = "first", delimiter: str = ",",
                    x_col: str = "mx_mm", y_col: str = "my_mm",
                    out_col: str = "admin") -> DataFrame:
    """Broadcast point-in-polygon join for axis-aligned admin boxes.

    admin_rows: [(idx, minx, miny, maxx, maxy, value)] — the packed index is
    tiny, so it ships as a closure constant (same role as the reference's
    per-thread rtree; a Spark broadcast variable for larger tables).
    mode 'first' → lowest-idx containing box; 'collect' → all values
    ascending joined by delimiter; 'knn' → value of nearest box centroid
    (squared euclidean, ties by idx — STRtree.nearest role).
    """
    rows = sorted(admin_rows)
    idxs = np.array([r[0] for r in rows], dtype=np.int64)
    boxes = np.array([r[1:5] for r in rows], dtype=np.float64)
    values = [r[5] for r in rows]

    from pyspark.sql.types import StringType, StructField, StructType
    # note: StructType.add mutates self — build a fresh one
    schema = StructType(list(df.schema.fields) + [StructField(out_col, StringType())])

    # dense rows×boxes masks are ideal for small admin tables; above this
    # many cells, chunk the point axis so the mask stays ~32 MB
    _CHUNK_CELLS = 4_000_000

    def probe(batches):
        for pdf in batches:
            xs = pdf[x_col].to_numpy(dtype=np.float64)
            ys = pdf[y_col].to_numpy(dtype=np.float64)
            if len(xs) * max(len(boxes), 1) > _CHUNK_CELLS:
                step = max(1, _CHUNK_CELLS // max(len(boxes), 1))
                outs = []
                for s in range(0, len(xs), step):
                    sub = pdf.iloc[s:s + step].copy()
                    outs.extend(probe([sub]))
                yield from outs
                continue
            if mode == "knn":
                # true box distance (STRtree.nearest contract): 0 inside,
                # else the clamped axis gaps — not the centroid shortcut
                dx = np.maximum(0.0, np.maximum(boxes[None, :, 0] - xs[:, None],
                                                xs[:, None] - boxes[None, :, 2]))
                dy = np.maximum(0.0, np.maximum(boxes[None, :, 1] - ys[:, None],
                                                ys[:, None] - boxes[None, :, 3]))
                d2 = dx * dx + dy * dy
                best = np.argmin(d2, axis=1)  # ties → lowest idx (rows sorted)
                pdf[out_col] = [values[b] for b in best]
            else:
                hit = ((xs[:, None] >= boxes[None, :, 0]) & (xs[:, None] <= boxes[None, :, 2]) &
                       (ys[:, None] >= boxes[None, :, 1]) & (ys[:, None] <= boxes[None, :, 3]))
                if mode == "first":
                    any_hit = hit.any(axis=1)
                    first = np.argmax(hit, axis=1)
                    pdf[out_col] = [values[f] if h else None
                                    for h, f in zip(any_hit, first)]
                else:  # collect
                    pdf[out_col] = [
                        delimiter.join(values[j] for j in np.flatnonzero(hit[i]))
                        if hit[i].any() else None
                        for i in range(len(xs))]
            yield pdf

    return df.mapInPandas(probe, schema=schema)


def adminize_points_rings(df: DataFrame, polygons: list[tuple[int, list, str]],
                          x_col: str = "mx_mm", y_col: str = "my_mm",
                          out_col: str = "admin") -> DataFrame:
    """Broadcast point-in-POLYGON join for general (non-box) admin rings,
    mode first: value of the lowest-index polygon strictly containing the
    point by the crossing-number test (points_in_ring — the same division
    expression the DuckDB oracle evaluates, so parity is exact in float64).

    polygons: [(idx, ring [(x, y), ...], value)]. The probe is an
    Arrow-batched mapInPandas over a closure-shipped ring table — the
    general-geometry sibling of adminize_points' box path; at larger admin
    tables the STRtree bbox prefilter bounds the per-point ring tests."""
    polys = sorted(polygons)
    rings = [np.asarray(r, dtype=np.float64) for _, r, _ in polys]
    values = [v for _, _, v in polys]
    boxes = np.array([G.bbox(r) for r in rings])

    from pyspark.sql.types import StringType, StructField, StructType
    schema = StructType(list(df.schema.fields) + [StructField(out_col, StringType())])

    def probe(batches):
        for pdf in batches:
            pts = np.stack([pdf[x_col].to_numpy(dtype=np.float64),
                            pdf[y_col].to_numpy(dtype=np.float64)], axis=1)
            hit = np.zeros((len(pts), len(rings)), dtype=bool)
            for j, ring in enumerate(rings):
                bb = boxes[j]
                cand = ((pts[:, 0] >= bb[0]) & (pts[:, 0] <= bb[2]) &
                        (pts[:, 1] >= bb[1]) & (pts[:, 1] <= bb[3]))
                if cand.any():
                    hit[cand, j] = G.points_in_ring(pts[cand], ring)
            any_hit = hit.any(axis=1)
            first = np.argmax(hit, axis=1)
            pdf[out_col] = [values[f] if h else None
                            for h, f in zip(any_hit, first)]
            yield pdf

    return df.mapInPandas(probe, schema=schema)
