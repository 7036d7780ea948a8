"""Unionizer — merges linestring features whose endpoints coincide and whose
match-tags agree.

Reference: /root/reference/src/post_process/unionizer.cpp (600 LoC).
Faithfully cloned quirks (all pinned by test/unionizer.cpp):

  * candidates = FRONT and BACK of every LineString path with >1 vertex of
    every feature carrying ALL match_tags (unionizer.cpp:204-218, :225-236);
    sorted multiset keyed by (x, y, tag values in sorted-tag-name order)
    (:172-200), insertion order preserved among equals (stable sort here).
  * couples = adjacent equal keys; rejected when same (feature, path index),
    differing directionality, or directional with equal positions
    (:263-275).
  * scores are unsigned-char valued: greedy 0 / 127 / 255 for front-back /
    back-back / front-front (:277-287); obtuse = trunc(255·(dot+1)/2) of the
    curve-direction approximations, acute = 255−obtuse, degenerate → 255
    (:289-306). Scored couples live in a map<score, couple> whose emplace
    DROPS later couples with an equal score — only one couple survives per
    distinct score per round (:311-335).
  * one union per feature-id per round (:441-470): ids marked in a set; the
    reference's test features all carry id 0, so at most one union happens
    per round there — reproduced exactly.
  * union geometry: front-back appends (swapped so BACK receives), back-back
    appends reversed skipping the junction duplicate, front-front builds a
    NEW reversed+forward path appended at the end (:340-403).
  * tag sanitize: differing values null out in both strategies; INTERSECT
    also nulls keys missing from the partner; ACCUMULATE copies the
    partner's novel keys (:406-438). Null-valued props drop at encode time.
  * fixpoint: iterate until a round performs no union or max_iterations
    (:537-563); features with no remaining geometry culled at the end
    (:477-481).

The curve approximator (:35-110) consumes vertices from the union point
until per-axis budgets (tile-extent × angle_union_sample_ratio, default .1,
:620-633) are spent, then averages the offset vectors weighted by squared
length.

Spark surface: unionizing is a per-(tile, layer) grouped operation — see
plans/pipeline.apply (the izer runs inside applyInPandas groups).
"""

from __future__ import annotations

import math
from operator import attrgetter

import numpy as np

from ..functions.wkt import Geom

MAX_SCORE = 255
FRONT, BACK = 0, 1


class _CurveApprox:
    """Port of curve_approximator (unionizer.cpp:35-110)."""

    __slots__ = ("x", "y", "cx", "cy", "pts", "total")

    def __init__(self, x, y, consume_x, consume_y):
        self.x, self.y = x, y
        self.cx, self.cy = consume_x, consume_y
        self.pts = []
        self.total = 0.0

    def consume(self, x, y):
        xo = self.x - x
        yo = self.y - y
        xd, yd = abs(xo), abs(yo)
        if self.cx - xd < 0:
            yd = (yd / xd) * self.cx
            xd = self.cx
        if self.cy - yd < 0:
            xd = (xd / yd) * self.cy
            yd = self.cy
        self.cx -= xd
        self.cy -= yd
        xo = -xd if xo < 0 else xd
        yo = -yd if yo < 0 else yd
        w = xo * xo + yo * yo
        self.pts.append((xo, yo, w))
        self.total += w
        return self.cx > 0 and self.cy > 0

    def approximation(self):
        if abs(self.total) < 1e-5:  # sq_length_tolerance
            return 0.0, 0.0
        s = 1.0 / self.total
        return (sum(p[0] * p[2] for p in self.pts) * s,
                sum(p[1] * p[2] for p in self.pts) * s)


class _Candidate:
    __slots__ = ("position", "index", "feat", "directional", "x", "y",
                 "dx", "dy", "key")

    def __init__(self, position, index, feat, directional, heuristic, distance):
        self.position = position
        self.index = index
        self.feat = feat
        self.directional = directional
        path = feat["_paths"][index]
        v = path[0] if position == FRONT else path[-1]
        self.x, self.y = float(v[0]), float(v[1])
        self.dx = self.dy = math.nan
        if heuristic in ("obtuse", "acute"):
            appx = _CurveApprox(self.x, self.y, distance[0], distance[1])
            n = len(path)
            for i in range(1, n):
                p = path[i] if position == FRONT else path[n - i - 1]
                if not appx.consume(float(p[0]), float(p[1])):
                    break
            self.dx, self.dy = appx.approximation()

    def sort_key(self, tags):
        return (self.x, self.y,
                tuple(str(self.feat["props"].get(t)) for t in tags))

    def fill_key(self, tags):
        # Precomputed ONCE per round in _get_candidates: props are stable
        # between candidate collection and scoring, and the naive recompute
        # (per sort comparison + per scoring probe) dominated the unionizer
        # profile at many tiny groups. One-tag configs (the common case)
        # skip the genexpr machinery.
        if len(tags) == 1:
            self.key = (self.x, self.y,
                        (str(self.feat["props"].get(tags[0])),))
        else:
            self.key = (self.x, self.y,
                        tuple(str(self.feat["props"].get(t)) for t in tags))


def _make_couple(a: _Candidate, b: _Candidate):
    if a.index == b.index and a.feat is b.feat:
        return None
    if a.directional != b.directional:
        return None
    if a.directional and a.position == b.position:
        return None
    return (a, b)


def _greedy_score(c):
    a, b = c
    if a.position != b.position:
        return 0
    if a.position == BACK:
        return MAX_SCORE // 2
    return MAX_SCORE


def _obtuse_score(c):
    a, b = c
    if (a.dx == 0 and a.dy == 0) or (b.dx == 0 and b.dy == 0):
        return MAX_SCORE
    dot = a.dx * b.dx + a.dy * b.dy
    return max(0, min(MAX_SCORE, int(MAX_SCORE * ((dot + 1) * 0.5))))


def _acute_score(c):
    a, b = c
    if (a.dx == 0 and a.dy == 0) or (b.dx == 0 and b.dy == 0):
        return MAX_SCORE
    return MAX_SCORE - _obtuse_score(c)


_SCORERS = {"greedy": _greedy_score, "obtuse": _obtuse_score, "acute": _acute_score}

_KEY_GETTER = attrgetter("key")


def _get_candidates(layer, match_tags, directional_tags, heuristic, distance):
    cands = []
    has_dir = bool(directional_tags)
    for feat in layer:
        if not feat["_paths"]:
            continue
        # plain loops, not any(<genexpr>): this runs once per feature per
        # round and the generator machinery measured ~20% of the walk
        props = feat["props"]
        skip = False
        for t in match_tags:
            if props.get(t) is None:  # absent or explicit None alike
                skip = True
                break
        if skip:
            continue
        directional = False
        if has_dir:
            for t in directional_tags:
                if props.get(t) is not None:
                    directional = True
                    break
        for i, path in enumerate(feat["_paths"]):
            if feat["_ptypes"][i] == "LINESTRING" and len(path) > 1:
                cands.append(_Candidate(FRONT, i, feat, directional, heuristic, distance))
                cands.append(_Candidate(BACK, i, feat, directional, heuristic, distance))
    for c in cands:
        c.fill_key(match_tags)
    cands.sort(key=_KEY_GETTER)  # stable → insertion order kept
    return cands


def _score_candidates(cands, match_tags, scorer):
    scored: dict[int, tuple] = {}
    n = len(cands)
    for i in range(n):
        ki = cands[i].key
        j = i + 1
        while j < n and cands[j].key == ki:
            couple = _make_couple(cands[i], cands[j])
            if couple is not None:
                s = scorer(couple)
                if s not in scored:  # map::emplace drops equal scores
                    scored[s] = couple
            j += 1
    return scored


def _do_union(couple):
    a, b = couple
    if a.position != b.position:
        if b.position == BACK:
            a, b = b, a
        dst = a.feat["_paths"][a.index]
        src = b.feat["_paths"][b.index]
        a.feat["_paths"][a.index] = np.vstack([dst, src[1:]])
        del b.feat["_paths"][b.index]
        del b.feat["_ptypes"][b.index]
    elif a.position == BACK:
        dst = a.feat["_paths"][a.index]
        src = b.feat["_paths"][b.index]
        # reversed, skipping the junction duplicate (src's last == junction)
        a.feat["_paths"][a.index] = np.vstack([dst, src[-2::-1]])
        del b.feat["_paths"][b.index]
        del b.feat["_ptypes"][b.index]
    else:  # front-front: new reversed+forward geometry
        src1 = a.feat["_paths"][a.index]
        src2 = b.feat["_paths"][b.index]
        new = np.vstack([src1[::-1], src2[1:]])
        # the reference erases a.index then b.index without adjusting for the
        # shift when both live in the same feature (unionizer.cpp:394-398) —
        # a latent bug no fixture exercises; we adjust (deviation noted).
        del a.feat["_paths"][a.index]
        del a.feat["_ptypes"][a.index]
        bi = b.index
        if b.feat is a.feat and b.index > a.index:
            bi -= 1  # same container already shifted
        del b.feat["_paths"][bi]
        del b.feat["_ptypes"][bi]
        a.feat["_paths"].append(new)
        a.feat["_ptypes"].append("LINESTRING")
    return a, b


def _sanitize_tags(strategy, a_feat, b_feat):
    for k in list(a_feat["props"].keys()):
        v = a_feat["props"][k]
        if v is None:
            continue
        if k not in b_feat["props"]:
            if strategy == "intersect":
                a_feat["props"][k] = None
        elif b_feat["props"][k] != v:
            a_feat["props"][k] = None
    if strategy == "accumulate":
        for k, v in b_feat["props"].items():
            if k not in a_feat["props"]:
                a_feat["props"][k] = v


def unionize_features(features: list[dict], config: dict,
                      tile_extent: tuple[float, float] = (256.0, 256.0)) -> list[dict]:
    """izer surface. features: [{"id", "props", "geoms": [Geom]}].
    config keys as the reference (union_heuristic, tag_strategy,
    max_iterations, match_tags, preserve_direction_tags,
    angle_union_sample_ratio). tile_extent = (width, height) of the tile in
    map units (the reference reads it off the Map, unionizer.cpp:518-525).

    CONSUMES its input: feature dicts (including their "props" maps) are
    mutated in place, mirroring the reference's in-place layer rewrite
    (unionizer.cpp operates on the layer's feature set). Callers that need
    the originals must deep-copy before calling."""
    heuristic = config.get("union_heuristic", "greedy")
    if heuristic not in _SCORERS:
        raise ValueError(f"{heuristic} is not supported, try `greedy, obtuse or acute'")
    strategy = config.get("tag_strategy", "intersect")
    if strategy not in ("intersect", "accumulate"):
        raise ValueError(f"{strategy} is not supported, try `intersect'")
    max_iterations = int(config.get("max_iterations", 2 ** 62))
    match_tags = sorted(config.get("match_tags", []))
    directional_tags = sorted(config.get("preserve_direction_tags", []))
    ratio = float(config.get("angle_union_sample_ratio", 0.1))
    if not (0 < ratio <= 0.5):
        raise ValueError("Please make sure 0 < angle_union_sample_ratio <= .5")
    distance = (tile_extent[0] * ratio, tile_extent[1] * ratio)

    # flatten Geom parts into mapnik-style path lists
    layer = []
    for feat in features:
        paths, ptypes = [], []
        for g in feat["geoms"]:
            bt = g.base_type()
            for part in g.parts:
                if bt == "POLYGON":
                    paths.append(part)  # keep ring-list opaque
                    ptypes.append("POLYGON")
                else:
                    paths.append(np.asarray(part[0], dtype=np.float64))
                    ptypes.append(bt)
        # no defensive dict(props) copy: the reference mutates the feature
        # set in place (unionizer.cpp operates on the layer's features),
        # and both call sites (the izer walk, fixtures) treat input
        # features as consumed
        layer.append({"id": feat["id"], "props": feat["props"],
                      "_paths": paths, "_ptypes": ptypes})

    scorer = _SCORERS[heuristic]
    i = 0
    while i < max_iterations:
        i += 1
        cands = _get_candidates(layer, match_tags, directional_tags,
                                heuristic, distance)
        scored = _score_candidates(cands, match_tags, scorer)
        unioned_ids = set()
        for s in sorted(scored):
            a, b = scored[s]
            if a.feat["id"] in unioned_ids or b.feat["id"] in unioned_ids:
                continue
            ra, rb = _do_union((a, b))
            _sanitize_tags(strategy, ra.feat, rb.feat)
            unioned_ids.add(ra.feat["id"])
            unioned_ids.add(rb.feat["id"])
        if not unioned_ids:
            break

    # cull empties, rebuild Geoms
    out = []
    for feat in layer:
        if not feat["_paths"]:
            continue
        geoms = []
        for path, pt in zip(feat["_paths"], feat["_ptypes"]):
            if pt == "POLYGON":
                geoms.append(Geom("POLYGON", [path]))
            elif pt == "POINT":
                geoms.append(Geom("POINT", [[path]]))
            else:
                geoms.append(Geom("LINESTRING", [[path]]))
        out.append({"id": feat["id"], "props": feat["props"], "geoms": geoms})
    return out
