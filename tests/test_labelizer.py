"""Labelizer (operators/labelizer): the reference declares it and leaves
the body TODO (labelizer.cpp:18-20) — parity demands the default stays a
no-op; the completed placement semantics activate only on the opt-in
`spacing` key."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from avecado_spark.functions.wkt import Geom  # noqa: E402
from avecado_spark.operators.labelizer import labelize_features  # noqa: E402


def _line(fid, pts, props=None):
    return {"id": fid, "props": dict(props or {"name": "rd"}),
            "geoms": [Geom("LINESTRING",
                           [[np.asarray(pts, dtype=np.float64)]])]}


def _label_pts(out):
    return [(f["geoms"][0].parts[0][0][0, 0], f["geoms"][0].parts[0][0][0, 1])
            for f in out if f["props"].get("label_role") == "label"]


def test_default_config_is_reference_noop():
    """labelizer.cpp:22-24 ignores its config entirely — any config the
    reference accepts must pass features through unchanged."""
    feats = [_line(1, [(0, 0), (100, 0)])]
    for conf in ({}, {"type": "labelizer"},
                 {"type": "labelizer", "unrelated": "x"}):
        out = labelize_features(feats, conf)
        assert out == feats


def test_spacing_places_interval_midpoints():
    """L=100, spacing=40 → k = floor(100/40) = 2 placements at arc
    positions 25 and 75; props inherited + label_role."""
    feats = [_line(7, [(0, 0), (100, 0)], {"ref": "I-80"})]
    out = labelize_features(feats, {"spacing": 40.0})
    assert out[:1] == feats                       # originals first, intact
    labels = [f for f in out[1:]]
    assert len(labels) == 2
    assert _label_pts(out) == [(25.0, 0.0), (75.0, 0.0)]
    for lab in labels:
        assert lab["id"] == 7
        assert lab["props"]["ref"] == "I-80"      # shield attribution
        assert lab["props"]["label_role"] == "label"
        assert lab["geoms"][0].type == "POINT"


def test_short_line_gets_single_midpoint_and_min_length_gate():
    feats = [_line(1, [(0, 0), (30, 0)])]
    out = labelize_features(feats, {"spacing": 100.0})
    assert _label_pts(out) == [(15.0, 0.0)]       # k = max(1, 0) = 1
    out2 = labelize_features(feats, {"spacing": 100.0, "min_length": 50.0})
    assert _label_pts(out2) == []                 # gated


def test_arc_positions_follow_bends():
    """An L-shaped line (50 + 50): midpoint at arc position 50 = the
    corner; spacing 50 → k=2 at arc 25 and 75."""
    feats = [_line(1, [(0, 0), (50, 0), (50, 50)])]
    out = labelize_features(feats, {"spacing": 50.0})
    assert _label_pts(out) == [(25.0, 0.0), (50.0, 25.0)]


def test_collision_radius_suppresses_overlaps():
    """Two coincident lines: without a radius both label; with one, the
    second feature's candidate inside the radius is dropped (greedy in
    feature order)."""
    feats = [_line(1, [(0, 0), (60, 0)]), _line(2, [(0, 5), (60, 5)])]
    both = labelize_features(feats, {"spacing": 100.0})
    assert len(_label_pts(both)) == 2
    one = labelize_features(feats, {"spacing": 100.0,
                                    "collision_radius": 10.0})
    pts = _label_pts(one)
    assert pts == [(30.0, 0.0)]                   # first feature wins


def test_non_linear_geometry_skipped():
    poly = {"id": 3, "props": {}, "geoms": [Geom("POLYGON", [
        [np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 0.0]])]])]}
    pt = {"id": 4, "props": {},
          "geoms": [Geom("POINT", [[np.array([[1.0, 1.0]])]])]}
    out = labelize_features([poly, pt], {"spacing": 5.0})
    assert out == [poly, pt]
    with pytest.raises(ValueError, match="spacing"):
        labelize_features([poly], {"spacing": 0})


def test_pipeline_integration_zoom_gated(spark):
    """Through apply_to_tiles: labels appear inside the configured zoom
    band and not outside it."""
    from pyspark.sql import functions as F
    from avecado_spark.plans.pipeline import apply_to_tiles

    rows = [(z, 1, 1, "roads", 1, {"a": "yes"},
             "LINESTRING(0 0, 200 0)") for z in (8, 12)]
    df = spark.createDataFrame(
        rows, "z int, x long, y long, layer string, id long, "
              "props map<string,string>, wkt string")
    conf = {"roads": [{"minzoom": 10, "maxzoom": 22, "process": [
        {"type": "labelizer", "spacing": 90.0}]}]}
    out = apply_to_tiles(df, conf).collect()
    by_z = {}
    for r in out:
        by_z.setdefault(r.z, []).append(r)
    assert len(by_z[8]) == 1                      # below band: no-op
    z12_labels = [r for r in by_z[12]
                  if (r.props or {}).get("label_role") == "label"]
    assert len(z12_labels) == 2                   # floor(200/90) = 2
    assert all(r.wkt.startswith("POINT(") for r in z12_labels)


def test_collision_grid_matches_naive_and_scales():
    """The r05 grid-hash collision suppression must keep the exact greedy
    semantics of the naive O(n^2) scan (same accept/reject order) — checked
    against an in-test reimplementation over a label-dense line set."""
    import numpy as np

    from avecado_spark.functions.wkt import Geom
    from avecado_spark.operators.labelizer import (_arc_positions,
                                                   labelize_features)

    rng = np.random.default_rng(31)
    feats = []
    for i in range(120):
        x0, y0 = float(rng.integers(0, 2000)), float(rng.integers(0, 2000))
        ln = float(rng.integers(150, 900))
        path = np.array([[x0, y0], [x0 + ln, y0 + float(rng.integers(-40, 40))]])
        feats.append({"id": i, "props": {"n": str(i)},
                      "geoms": [Geom("LINESTRING", [[path]])]})

    conf = {"spacing": 100.0, "collision_radius": 60.0}
    out = labelize_features([dict(f, props=dict(f["props"]),
                                  geoms=list(f["geoms"])) for f in feats],
                            conf)
    got = [(round(float(g.parts[0][0][0][0]), 6),
            round(float(g.parts[0][0][0][1]), 6))
           for f in out[len(feats):] for g in f["geoms"]]

    # naive greedy reference
    accepted = []
    for f in feats:
        path = f["geoms"][0].parts[0][0]
        seg = np.diff(path, axis=0)
        length = float(np.hypot(seg[:, 0], seg[:, 1]).sum())
        k = max(1, int(length // 100.0))
        for px, py in _arc_positions(path, k):
            if any(max(abs(px - ax), abs(py - ay)) <= 60.0
                   for ax, ay in accepted):
                continue
            accepted.append((float(px), float(py)))
    want = [(round(ax, 6), round(ay, 6)) for ax, ay in accepted]
    assert got == want
    assert 0 < len(got) < sum(
        max(1, int(float(np.hypot(*np.diff(f["geoms"][0].parts[0][0],
                                           axis=0).T).sum()) // 100.0))
        for f in feats)  # suppression actually fired
