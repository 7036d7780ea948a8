"""Property-based tests (hypothesis) for the wire codec and geometry kernels —
the encode path must hold for arbitrary inputs, not just fixtures."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from avecado_spark.functions import mvt
from avecado_spark.functions.mercator import zigzag_decode, zigzag_encode
from avecado_spark.functions.geometry import points_cover, split_line_by_polygon
from avecado_spark.functions.wkt import Geom, dumps, loads


@given(st.integers(min_value=-(2 ** 31), max_value=2 ** 31 - 1))
def test_zigzag_roundtrip_prop(v):
    assert int(zigzag_decode(zigzag_encode(np.array([v]))[0])) == v


@given(st.integers(min_value=0, max_value=2 ** 63 - 1))
def test_varint_roundtrip_prop(v):
    buf = mvt._varint(v)
    out, pos = mvt.read_varint(buf, 0)
    assert out == v and pos == len(buf)


@settings(max_examples=50)
@given(st.lists(st.tuples(st.integers(-4096, 8192), st.integers(-4096, 8192)),
                min_size=2, max_size=30))
def test_linestring_command_roundtrip(pts):
    xs = np.array([p[0] for p in pts], dtype=np.int64)
    ys = np.array([p[1] for p in pts], dtype=np.int64)
    cmds = mvt.encode_geometry([(xs, ys)], mvt.GEOM_LINESTRING, tolerance=0)
    paths = mvt.decode_geometry(cmds, mvt.GEOM_LINESTRING)
    assert len(paths) == 1
    assert np.array_equal(paths[0][0], xs) and np.array_equal(paths[0][1], ys)


@settings(max_examples=50)
@given(st.lists(st.tuples(st.floats(-100, 100, allow_nan=False),
                          st.floats(-100, 100, allow_nan=False)),
                min_size=2, max_size=12))
def test_line_split_conserves_geometry(pts):
    """inside ∪ outside re-covers the line: total length preserved."""
    line = np.array(pts, dtype=np.float64)
    ring = [np.array([[-10., -10.], [10., -10.], [10., 10.], [-10., 10.],
                      [-10., -10.]])]
    ins, outs = split_line_by_polygon(line, ring)

    def tot(parts):
        return sum(float(np.sqrt(((a[1:] - a[:-1]) ** 2).sum(axis=1)).sum())
                   for a in parts)

    from avecado_spark.functions.geometry import dedupe_vertices
    orig = tot([dedupe_vertices(line)])
    assert tot(ins) + tot(outs) == __import__("pytest").approx(orig, abs=1e-6)


@settings(max_examples=50)
@given(st.floats(-20, 20, allow_nan=False), st.floats(-20, 20, allow_nan=False))
def test_pip_box_agrees_with_arithmetic(x, y):
    ring = [np.array([[-10., -10.], [10., -10.], [10., 10.], [-10., 10.],
                      [-10., -10.]])]
    got = bool(points_cover(np.array([[x, y]]), ring)[0])
    expect = -10 <= x <= 10 and -10 <= y <= 10
    assert got == expect


@settings(max_examples=30)
@given(st.lists(st.tuples(st.integers(-1000, 1000), st.integers(-1000, 1000)),
                min_size=1, max_size=8))
def test_wkt_roundtrip_multipoint(pts):
    g = Geom("MULTIPOINT", [[np.array(pts, dtype=np.float64)]])
    rt = loads(dumps(g))
    assert rt.type == "MULTIPOINT"
    assert np.array_equal(rt.parts[0][0], g.parts[0][0])


@settings(max_examples=30)
@given(st.lists(st.binary(min_size=0, max_size=200), min_size=0, max_size=5),
       st.integers(0, 9))
def test_tile_gzip_roundtrip(payload_strings, level):
    layer = mvt.MvtLayer(name="p")
    for i, b in enumerate(payload_strings):
        layer.features.append(
            mvt.MvtFeature(id=i, type=1, geometry=[9, 2, 2],
                           tags=[]))
        layer.keys.append(b.hex() or "k")
    data = mvt.tile_to_gzip(mvt.MvtTile(layers=[layer]), level)
    rt = mvt.decode_tile(data)
    assert rt.layers[0].keys == layer.keys
    assert len(rt.layers[0].features) == len(layer.features)


# ---------------------------------------------------------------------------
# general polygon clipper properties
# ---------------------------------------------------------------------------

def _area_polys(polys):
    from avecado_spark.functions.geometry import close_ring, ring_area2
    total = 0.0
    for poly in polys:
        a = abs(ring_area2(close_ring(np.asarray(poly[0], float)))) / 2
        for h in poly[1:]:
            a -= abs(ring_area2(close_ring(np.asarray(h, float)))) / 2
        total += a
    return total


def _convex_ring(cx, cy, radii):
    """Convex ring from sorted angles around (cx, cy)."""
    n = len(radii)
    angs = np.linspace(0, 2 * np.pi, n, endpoint=False)
    pts = np.stack([cx + np.array(radii) * np.cos(angs),
                    cy + np.array(radii) * np.sin(angs)], axis=1)
    return pts


@settings(max_examples=60, deadline=None)
@given(
    st.tuples(st.integers(-6, 6), st.integers(-6, 6)),          # clip center
    st.lists(st.integers(2, 9), min_size=3, max_size=7),        # clip radii
    st.tuples(st.integers(-8, 0), st.integers(-8, 0),           # subject box
              st.integers(1, 16), st.integers(1, 16)),
)
def test_clip_polygon_general_conserves_area(c, radii, box):
    """inside + outside areas partition the subject exactly, for random
    convex clips (integer coords → vertex-on-edge degeneracies included)
    against random rectangles; and the axis-box fast path agrees with the
    general path on axis-box clips."""
    from avecado_spark.functions.geometry import (clip_polygon_general,
                                                  split_polygon_by_box)
    cx, cy = c
    x0, y0, w, h = box
    subj = [np.array([[x0, y0], [x0 + w, y0], [x0 + w, y0 + h],
                      [x0, y0 + h], [x0, y0]], float)]
    clip = [_convex_ring(cx, cy, radii)]
    ins, outs = clip_polygon_general(subj, clip)
    a_in, a_out = _area_polys(ins), _area_polys(outs)
    a_subj = _area_polys([subj])
    assert a_in >= -1e-9 and a_out >= -1e-9
    assert abs((a_in + a_out) - a_subj) <= 1e-6 * max(a_subj, 1.0)

    # axis-box clip: general path agrees with the Sutherland–Hodgman slabs
    bclip = [np.array([[cx - 3, cy - 2], [cx + 3, cy - 2],
                       [cx + 3, cy + 2], [cx - 3, cy + 2]], float)]
    gi, go = clip_polygon_general(subj, bclip)
    bi, bo = split_polygon_by_box(subj, (cx - 3, cy - 2, cx + 3, cy + 2))
    assert abs(_area_polys(gi) - _area_polys(bi)) <= 1e-6 * max(a_subj, 1.0)
    assert abs(_area_polys(go) - _area_polys(bo)) <= 1e-6 * max(a_subj, 1.0)


@given(st.integers(3, 10), st.integers(0, 10**6),
       st.floats(-50, 50), st.floats(-50, 50))
@settings(max_examples=60, deadline=None)
def test_ring_distance2_against_boundary_sampling(n_verts, seed, px, py):
    """ring_distance2 lower-bounds the distance to a dense boundary
    sampling, and is 0 exactly when the crossing-number test says inside."""
    import numpy as np
    from avecado_spark.functions import geometry as G
    rng = np.random.default_rng(seed)
    ang = np.sort(rng.uniform(0, 2 * np.pi, n_verts))
    if len(np.unique(np.round(ang, 6))) < 3:
        return
    r = rng.uniform(5, 20, n_verts)
    ring = np.column_stack([r * np.cos(ang), r * np.sin(ang)])
    pt = np.array([[px, py]])
    d2 = G.ring_distance2(pt, ring)[0]
    inside = G.points_in_ring(pt, G.close_ring(ring))[0]
    if inside:
        assert d2 == 0.0
        return
    # dense boundary sampling: true distance within one sampling step
    closed = G.close_ring(ring)
    samples = []
    for i in range(len(closed) - 1):
        t = np.linspace(0, 1, 200)[:, None]
        samples.append(closed[i] + t * (closed[i + 1] - closed[i]))
    s = np.vstack(samples)
    sd2 = ((s[:, 0] - px) ** 2 + (s[:, 1] - py) ** 2).min()
    assert d2 <= sd2 + 1e-9
    # and not much smaller than the sampled minimum (step <= ~0.3 units)
    assert np.sqrt(d2) >= np.sqrt(sd2) - 0.5


def test_ring_distance2_duplicate_vertex_no_nan():
    """Advisor r03: a zero-length edge (repeated consecutive vertex — common
    in real admin polygons) must NOT poison the distance with NaN; the
    degenerate edge contributes distance-to-vertex, matching the SQL
    oracle's clamp."""
    import numpy as np
    from avecado_spark.functions import geometry as G
    ring = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 0.0],  # duplicate
                     [10.0, 10.0], [0.0, 10.0]])
    pts = np.array([[20.0, 0.0], [5.0, 5.0], [-3.0, 0.0]])
    d2 = G.ring_distance2(pts, ring)
    assert not np.isnan(d2).any(), d2
    assert d2[0] == 100.0          # (20,0) → edge x=10: distance 10
    assert d2[1] == 0.0            # inside
    assert d2[2] == 9.0            # (-3,0) → edge x=0
    # an all-degenerate ring (every vertex identical) → distance to point
    point_ring = np.array([[3.0, 4.0]] * 3)
    d2p = G.ring_distance2(np.array([[0.0, 0.0]]), point_ring)
    assert not np.isnan(d2p).any()
    assert d2p[0] == 25.0


@given(st.integers(3, 8), st.integers(0, 10**6), st.integers(0, 6),
       st.floats(-50, 50), st.floats(-50, 50))
@settings(max_examples=40, deadline=None)
def test_ring_distance2_dup_vertex_invariant(n_verts, seed, dup_at, px, py):
    """Duplicating any vertex of a ring must not change ring_distance2."""
    import numpy as np
    from avecado_spark.functions import geometry as G
    rng = np.random.default_rng(seed)
    ang = np.sort(rng.uniform(0, 2 * np.pi, n_verts))
    if len(np.unique(np.round(ang, 6))) < 3:
        return
    r = rng.uniform(5, 20, n_verts)
    ring = np.column_stack([r * np.cos(ang), r * np.sin(ang)])
    i = dup_at % n_verts
    dup = np.insert(ring, i, ring[i], axis=0)
    pt = np.array([[px, py]])
    a = G.ring_distance2(pt, ring)[0]
    b = G.ring_distance2(pt, dup)[0]
    assert not np.isnan(b)
    assert a == b


def test_box_candidates_empty_inputs():
    """Advisor r03: empty Arrow batch / empty partition must not crash the
    bbox prefilter (np.concatenate([]) raised)."""
    import numpy as np
    from avecado_spark.operators.adminizer import _box_candidates
    boxes = np.array([[0.0, 0.0, 1.0, 1.0]])
    pts = np.array([[0.5, 0.5]])
    for p, b in [(np.zeros((0, 2)), boxes), (pts, np.zeros((0, 4))),
                 (np.zeros((0, 2)), np.zeros((0, 4)))]:
        pi, bi = _box_candidates(p, b)
        assert len(pi) == 0 and len(bi) == 0
        assert pi.dtype == np.int64 and bi.dtype == np.int64
    pi, bi = _box_candidates(pts, boxes)
    assert list(pi) == [0] and list(bi) == [0]


def test_packed_geom_interchange_roundtrip_property():
    """The izer packed-coords interchange (plans/pipeline._pack/_unpack
    closures, exercised here via equivalent standalone logic): random
    geometries of every supported type survive pack → unpack exactly.
    Guards the ring/part bookkeeping that replaced WKT text in r05."""
    import numpy as np

    from avecado_spark.functions.wkt import Geom, dumps, loads

    rng = np.random.default_rng(123)

    def rand_ring(n):
        return rng.integers(-10**6, 10**6, (n, 2)).astype(np.float64)

    def pack(g):
        if not g.parts:
            return g.type, np.empty(0), [], []
        rings, flats, part_rings = [], [], []
        for rlist in g.parts:
            part_rings.append(len(rlist))
            for arr in rlist:
                rings.append(len(arr))
                flats.append(np.asarray(arr, dtype=np.float64).ravel())
        return g.type, np.concatenate(flats), rings, part_rings

    def unpack(gtype, coords, rings, part_rings):
        c = np.asarray(coords, dtype=np.float64)
        if len(part_rings) == 0:
            return Geom(gtype, [])
        parts, pos, ri = [], 0, 0
        for nr in part_rings:
            rlist = []
            for _ in range(nr):
                npts = int(rings[ri])
                rlist.append(c[pos:pos + 2 * npts].reshape(-1, 2))
                pos += 2 * npts
                ri += 1
            parts.append(rlist)
        return Geom(gtype, parts)

    cases = []
    for _ in range(40):
        cases.append(Geom("POINT", [[rand_ring(1)]]))
        cases.append(Geom("LINESTRING", [[rand_ring(rng.integers(2, 9))]]))
        cases.append(Geom("MULTILINESTRING",
                          [[rand_ring(rng.integers(2, 6))]
                           for _ in range(rng.integers(1, 4))]))
        cases.append(Geom("POLYGON",
                          [[rand_ring(rng.integers(4, 8))
                            for _ in range(rng.integers(1, 3))]]))
        cases.append(Geom("MULTIPOLYGON",
                          [[rand_ring(rng.integers(4, 7))
                            for _ in range(rng.integers(1, 3))]
                           for _ in range(rng.integers(1, 3))]))
    cases.append(Geom("LINESTRING", []))          # EMPTY
    for g in cases:
        back = unpack(*pack(g))
        assert back.type == g.type
        # WKT text is the canonical equality form for nested arrays
        assert dumps(back) == dumps(g)


@given(st.integers(0, 10**6))
@settings(max_examples=40, deadline=None)
def test_ring_distance2_pairs_parity(seed):
    """r08: the pairwise equal-length kernel is BIT-equal to per-ring
    ring_distance2 on random polygons (incl. inside points and a
    degenerate repeated-vertex ring)."""
    import numpy as np
    from avecado_spark.functions import geometry as G
    rng = np.random.default_rng(seed)
    n_verts = int(rng.integers(3, 9))
    n = 40
    rings = []
    for _ in range(n):
        ang = np.sort(rng.uniform(0, 2 * np.pi, n_verts))
        r = rng.uniform(2, 20, n_verts)
        ring = np.column_stack([r * np.cos(ang), r * np.sin(ang)])
        ring += rng.uniform(-30, 30, 2)
        rings.append(ring)
    # one degenerate ring with a repeated vertex (zero-length edge)
    rings[0][1] = rings[0][0]
    pts = rng.uniform(-40, 40, (n, 2))
    expect = np.array([G.ring_distance2(pts[i:i + 1], rings[i])[0]
                       for i in range(n)])
    stacked = np.stack([G.close_ring(r) for r in rings])
    got = G.ring_distance2_pairs(pts, stacked)
    assert np.array_equal(got, expect), (got - expect)
