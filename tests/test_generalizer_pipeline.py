"""Generalizer golden (reference test/generalizer.cpp:32-64) and the
randomized zoom-gating test (reference test/post_processor.cpp:33-67)."""

import random

import numpy as np
import pytest

from avecado_spark.functions.wkt import Geom
from avecado_spark.operators.generalizer import simplify, generalize_features
from avecado_spark.plans.pipeline import PostProcessor, parse_inline_csv

ZIGZAG = np.array([[0., 0.], [1., 1.], [2., 0.], [3., 1.], [4., 0.]])


def test_vw_golden_straightens_zigzag():
    """VW tol 2.001 collapses the zigzag to its endpoints; the reference
    comment pins strict `<`: tolerance exactly 2 must NOT collapse it."""
    out = simplify(ZIGZAG, 2.001, "visvalingam-whyatt")
    assert out.tolist() == [[0, 0], [4, 0]]
    out2 = simplify(ZIGZAG, 2.0, "visvalingam-whyatt")
    # cascade stops at (3,1), whose recomputed area is exactly 2 (not < 2)
    assert out2.tolist() == [[0, 0], [3, 1], [4, 0]]


def test_dp_keeps_far_points():
    out = simplify(ZIGZAG, 0.5, "douglas-peucker")
    assert len(out) == 5
    out = simplify(ZIGZAG, 1.5, "douglas-peucker")
    assert out.tolist() == [[0, 0], [4, 0]]


def test_radial_distance():
    line = np.array([[0., 0.], [0.1, 0.], [5., 0.], [5.05, 0.], [10., 0.]])
    out = simplify(line, 1.0, "radial-distance")
    assert out.tolist() == [[0, 0], [5, 0], [10, 0]]


def test_unknown_algorithm():
    # zhao-saalfeld is REAL since r05 — only genuinely unknown names raise
    with pytest.raises(NotImplementedError):
        simplify(ZIGZAG, 1.0, "no-such-algorithm")


def test_generalize_features_izer():
    feats = [{"id": 0, "props": {},
              "geoms": [Geom("LINESTRING", [[ZIGZAG]])]}]
    out = generalize_features(feats, "visvalingam-whyatt", 2.001)
    assert out[0]["geoms"][0].parts[0][0].tolist() == [[0, 0], [4, 0]]


GATE_LINE = np.array([[0., 0.], [1., 1.], [2., 0.], [3., 1.], [4., 0.]])


def _try_zoom(proc, z):
    feats = [{"id": 0, "props": {}, "geoms": [Geom("LINESTRING", [[GATE_LINE.copy()]])]}]
    _, ran = proc.process_layer(feats, "test_layer", z)
    return ran


def test_zoom_gating_randomized():
    """100 random (minzoom, maxzoom) pairs: an izer runs iff low <= z <= high
    (reference test/post_processor.cpp:33-67)."""
    rng = random.Random(42)
    for _ in range(100):
        high = rng.randrange(22)
        low = rng.randrange(22)
        if low > high:
            low, high = high, low
        conf = {"test_layer": [{"minzoom": low, "maxzoom": high,
                                "process": [{"type": "generalizer",
                                             "tolerance": 2.001,
                                             "algorithm": "visvalingam-whyatt"}]}]}
        proc = PostProcessor(conf)
        for z in range(22):
            expect = 1 if low <= z <= high else 0
            assert _try_zoom(proc, z) == expect, (low, high, z)


def test_first_matching_range_only():
    """Only the first matching scale range runs (post_processor.cpp:110)."""
    conf = {"L": [
        {"minzoom": 0, "maxzoom": 10,
         "process": [{"type": "labelizer"}]},
        {"minzoom": 5, "maxzoom": 10,
         "process": [{"type": "labelizer"}, {"type": "labelizer"}]},
    ]}
    proc = PostProcessor(conf)
    feats = []
    _, ran = proc.process_layer(feats, "L", 7)
    assert ran == 1  # first range wins, not 2


def test_unknown_layer_is_noop():
    proc = PostProcessor({"other": []})
    _, ran = proc.process_layer([], "L", 7)
    assert ran == 0


def test_parse_inline_csv():
    rows = parse_inline_csv("wkt|foo\nPOLYGON((0 0,1 0,1 1,0 1,0 0))|val\n")
    assert rows == [("POLYGON((0 0,1 0,1 1,0 1,0 0))", "val")]


def test_pipeline_adminizer_end_to_end():
    """Pipeline-assembled adminizer over the reference's canonical config."""
    conf = {"point": [{"minzoom": 0, "maxzoom": 22, "process": [{
        "type": "adminizer", "param_name": "foo",
        "datasource": {"inline": "wkt|foo\n"
                       "Polygon((-10.0 -10.0, -10.0 10.0, 10.0 10.0, 10.0 -10.0, -10.0 -10.0))|foo_value\n"}}]}]}
    proc = PostProcessor(conf)
    from avecado_spark.functions import wkt as W
    feats = [{"id": 0, "props": {}, "geoms": [W.loads("POINT(0 0)")]}]
    out, ran = proc.process_layer(feats, "point", 10)
    assert ran == 1
    assert out[0]["props"]["foo"] == "foo_value"


def test_packed_and_wkt_interchange_agree(spark):
    """The r05 packed-coords izer interchange and the legacy WKT path are
    the same operator surface: identical features sent through both
    representations must produce identical (id, props, geometry) sets
    for a generalize + unionize pipeline."""
    from pyspark.sql import functions as F

    from avecado_spark.plans.pipeline import apply_to_tiles

    # deterministic snapped segments: two per group so the unionizer has
    # real work, zigzags so the generalizer does too
    rows = []
    for g in range(40):
        bx, by = 1000 + g * 10, 2000 + (g % 7)
        rows.append((10, g % 5, g // 5, "roads", g * 2,
                     {"a": str(g)},
                     [float(bx), float(by), float(bx + 50), float(by + 1),
                      float(bx + 100), float(by)], 3))
        rows.append((10, g % 5, g // 5, "roads", g * 2 + 1,
                     {"a": str(g)},
                     [float(bx + 100), float(by), float(bx + 200),
                      float(by)], 2))
    packed = spark.createDataFrame(
        rows, "z int, x long, y long, layer string, id long, "
              "props map<string,string>, coords array<double>, npts int") \
        .select("z", "x", "y", "layer", "id", "props",
                F.lit("LINESTRING").alias("gtype"), "coords",
                F.array(F.col("npts")).alias("rings"),
                F.array(F.lit(1)).alias("part_rings"))

    def to_wkt(coords):
        pts = ", ".join(f"{int(coords[i])} {int(coords[i+1])}"
                        for i in range(0, len(coords), 2))
        return f"LINESTRING({pts})"

    wkt_rows = [(z, x, y, lay, i, props, to_wkt(cs))
                for z, x, y, lay, i, props, cs, _ in rows]
    legacy = spark.createDataFrame(
        wkt_rows, "z int, x long, y long, layer string, id long, "
                  "props map<string,string>, wkt string")

    conf = {"roads": [{"minzoom": 0, "maxzoom": 22, "process": [
        {"type": "generalizer", "algorithm": "douglas-peucker",
         "tolerance": 5.0},
        {"type": "unionizer", "union_heuristic": "greedy",
         "tag_strategy": "intersect", "max_iterations": 10,
         "match_tags": ["a"]}]}]}

    out_p = apply_to_tiles(packed, conf).collect()
    out_w = apply_to_tiles(legacy, conf).collect()

    def norm_packed(r):
        pts = ", ".join(f"{int(r.coords[i])} {int(r.coords[i+1])}"
                        for i in range(0, len(r.coords), 2))
        return (r.z, r.x, r.y, r.layer, r.id,
                tuple(sorted(r.props.items())), f"LINESTRING({pts})")

    def norm_wkt(r):
        return (r.z, r.x, r.y, r.layer, r.id,
                tuple(sorted(r.props.items())), r.wkt)

    assert sorted(map(norm_packed, out_p)) == sorted(map(norm_wkt, out_w))
    # and the pipeline actually did work: unions shrank the feature count
    assert 0 < len(out_p) < len(rows)


def test_zhao_saalfeld_sleeve_invariants():
    """zhao-saalfeld (sleeve fitting): endpoints survive; a zigzag inside
    the corridor collapses to its endpoints; an excursion beyond the
    tolerance is anchored; collinear chains always collapse; the izer
    surface accepts the algorithm name."""
    import numpy as np

    from avecado_spark.operators.generalizer import simplify, simplify_zs

    # collinear → endpoints only at any positive tolerance
    line = np.array([[0.0, 0], [1, 0], [2, 0], [3, 0], [4, 0]])
    assert np.array_equal(simplify_zs(line, 0.5),
                          np.array([[0.0, 0], [4, 0]]))
    # small zigzag inside the sleeve collapses (guide vertex sets the ray
    # direction, so keep it on-axis)...
    zig = np.array([[0.0, 0], [1, 0], [2, 0.3], [3, -0.2], [4, 0]])
    out = simplify_zs(zig, 1.0)
    assert np.array_equal(out[[0, -1]], zig[[0, -1]])
    assert len(out) == 2
    # ...but survives when it escapes the corridor
    big = np.array([[0.0, 0], [1, 5.0], [2, 0], [3, 0], [4, 0]])
    out = simplify_zs(big, 1.0)
    assert len(out) > 2 and any((out == [1, 5.0]).all(axis=1))
    # corridor property: every dropped vertex is within tolerance of the
    # simplified polyline's segments (sample check)
    rng = np.random.default_rng(9)
    pts = np.cumsum(rng.normal(0, 1, (200, 2)), axis=0)
    tol = 2.5
    out = simplify_zs(pts, tol)

    def seg_d(q, a, b):
        d = b - a
        L2 = d @ d
        t = 0.0 if L2 == 0 else np.clip((q - a) @ d / L2, 0, 1)
        return np.hypot(*(q - (a + t * d)))

    for q in pts:
        dmin = min(seg_d(q, out[i], out[i + 1])
                   for i in range(len(out) - 1))
        assert dmin <= 2 * tol + 1e-9  # sleeve bound (anchor-ray corridor)
    # registered under the mapnik name
    assert len(simplify(line, 0.5, "zhao-saalfeld")) == 2


def test_props_reserved_bytes_fail_loudly(spark):
    """The izer interchange serializes props with \\x01/\\x02 delimiters;
    a tag value containing a reserved byte must raise (JVM-side guard),
    never silently corrupt the rebuilt map."""
    import pytest as _pytest

    from avecado_spark.plans.pipeline import apply_to_tiles

    conf = {"roads": [{"minzoom": 0, "maxzoom": 22, "process": [
        {"type": "generalizer", "tolerance": 1.0}]}]}
    for badval in ("x\x01y", "x\x02y"):
        bad = spark.createDataFrame(
            [(10, 1, 1, "roads", 1, {"a": badval},
              "LINESTRING(0 0, 1 1)")],
            "z int, x long, y long, layer string, id long, "
            "props map<string,string>, wkt string")
        with _pytest.raises(Exception, match="reserved"):
            apply_to_tiles(bad, conf).collect()
    # clean props still flow
    ok = spark.createDataFrame(
        [(10, 1, 1, "roads", 1, {"a": "x y,z"}, "LINESTRING(0 0, 1 1)")],
        "z int, x long, y long, layer string, id long, "
        "props map<string,string>, wkt string")
    assert apply_to_tiles(ok, conf).collect()[0].props == {"a": "x y,z"}
