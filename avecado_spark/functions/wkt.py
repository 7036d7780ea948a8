"""Minimal WKT parser/serializer over numpy coordinate arrays.

The reference consumes WKT through Mapnik's csv plugin in every unit test
(e.g. /root/reference/test/single_point.xml:6-12,
 /root/reference/test/adminizer.cpp:31-39 `mapnik::from_wkt`).
Shapely is not available in this environment, so this is a small
self-contained codec covering the geometry types the reference handles:
POINT, MULTIPOINT, LINESTRING, MULTILINESTRING, POLYGON, MULTIPOLYGON.

Canonical in-memory form (`Geom`):
  type  — one of the six names above (normalized upper-case)
  parts — list of "paths"; each path is a list of numpy (n,2) float arrays:
      POINT/MULTIPOINT      → [[ (n,2) ]]           (one path, one array)
      LINESTRING            → [[ arr ]]
      MULTILINESTRING       → [[ arr ], [ arr ], …] (one path per line)
      POLYGON               → [[ outer, hole, … ]]
      MULTIPOLYGON          → [[ outer, hole…], …]  (one path per polygon)
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class Geom:
    type: str
    parts: list  # list[list[np.ndarray]]

    @property
    def is_multi(self) -> bool:
        return self.type.startswith("MULTI")

    def base_type(self) -> str:
        return self.type[5:] if self.is_multi else self.type


def _parse_coords(text: str) -> np.ndarray:
    pts = []
    for pair in text.split(","):
        vals = pair.split()
        pts.append((float(vals[0]), float(vals[1])))
    return np.asarray(pts, dtype=np.float64)


def _split_groups(text: str) -> list[str]:
    """Split 'a ( b ), ( c )'-style bodies at top-level commas between groups."""
    groups = []
    depth = 0
    start = None
    for i, ch in enumerate(text):
        if ch == "(":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                groups.append(text[start:i])
    return groups


def loads(wkt: str) -> Geom:
    s = wkt.strip()
    up = s.upper()
    for t in ("MULTIPOLYGON", "MULTILINESTRING", "MULTIPOINT",
              "POLYGON", "LINESTRING", "POINT"):
        if up.startswith(t):
            body = s[len(t):].strip()
            break
    else:
        raise ValueError(f"unsupported WKT: {wkt[:60]}")

    if up.replace(" ", "").endswith("EMPTY"):
        return Geom(t, [])

    inner = body[1:-1].strip()  # strip outermost parens
    if t == "POINT":
        return Geom(t, [[_parse_coords(inner)]])
    if t == "LINESTRING":
        return Geom(t, [[_parse_coords(inner)]])
    if t == "MULTIPOINT":
        # both MULTIPOINT(1 2, 3 4) and MULTIPOINT((1 2),(3 4))
        if "(" in inner:
            arrs = [_parse_coords(g) for g in _split_groups(inner)]
            return Geom(t, [[np.vstack(arrs)]])
        return Geom(t, [[_parse_coords(inner)]])
    if t == "POLYGON":
        rings = [_parse_coords(g) for g in _split_groups(inner)]
        return Geom(t, [rings])
    if t == "MULTILINESTRING":
        return Geom(t, [[_parse_coords(g)] for g in _split_groups(inner)])
    if t == "MULTIPOLYGON":
        parts = []
        depth = 0
        start = None
        for i, ch in enumerate(inner):
            if ch == "(":
                if depth == 0:
                    start = i
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    poly_body = inner[start:i + 1]
                    parts.append([_parse_coords(g) for g in _split_groups(poly_body[1:-1])])
        return Geom(t, parts)
    raise ValueError(t)


def _fmt(v: float) -> str:
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def _coords_str(arr: np.ndarray) -> str:
    return ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in arr)


def dumps(g: Geom) -> str:
    t = g.type
    if not g.parts:
        return f"{t} EMPTY"
    if t == "POINT":
        return f"POINT({_coords_str(g.parts[0][0])})"
    if t == "MULTIPOINT":
        return f"MULTIPOINT({_coords_str(g.parts[0][0])})"
    if t == "LINESTRING":
        return f"LINESTRING({_coords_str(g.parts[0][0])})"
    if t == "MULTILINESTRING":
        inner = ", ".join(f"({_coords_str(p[0])})" for p in g.parts)
        return f"MULTILINESTRING({inner})"
    if t == "POLYGON":
        inner = ", ".join(f"({_coords_str(r)})" for r in g.parts[0])
        return f"POLYGON({inner})"
    if t == "MULTIPOLYGON":
        polys = ", ".join(
            "(" + ", ".join(f"({_coords_str(r)})" for r in rings) + ")"
            for rings in g.parts)
        return f"MULTIPOLYGON({polys})"
    raise ValueError(t)
