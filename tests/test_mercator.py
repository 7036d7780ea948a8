"""Golden tests for tile math, from reference values.

box_for_tile formula: /root/reference/src/util.cpp:8-17.
Quantization goldens: /root/reference/test/make_vector_tile.cpp:55-59 —
the decoded coordinates bake in the z0/extent-256 quantization loss."""

import numpy as np
import pytest

from avecado_spark.functions import mercator as M


def test_box_for_tile_z0():
    minx, miny, maxx, maxy = M.box_for_tile(0, 0, 0)
    H = 40075016.68 / 2
    assert minx == pytest.approx(-H)
    assert miny == pytest.approx(-H)
    assert maxx == pytest.approx(H)
    assert maxy == pytest.approx(H)


def test_box_for_tile_z1_quadrants():
    # z1/0/0 is the north-west quadrant (y grows southward)
    minx, miny, maxx, maxy = M.box_for_tile(1, 0, 0)
    H = 40075016.68 / 2
    assert (minx, miny, maxx, maxy) == pytest.approx((-H, 0.0, 0.0, H))
    minx, miny, maxx, maxy = M.box_for_tile(1, 1, 1)
    assert (minx, miny, maxx, maxy) == pytest.approx((0.0, -H, H, 0.0))


def test_meters_per_pixel():
    # reference post_processor.cpp:17-29: WORLD / 256 / 2^z
    assert M.meters_per_pixel(0) == pytest.approx(40075016.68 / 256)
    assert M.meters_per_pixel(14) == pytest.approx(40075016.68 / 256 / 16384)


def test_quantization_golden_line():
    """Input mercator x=-2000000 at z0 extent 256 must decode back to
    -2035059.44106453 (single_line_json golden)."""
    px, py = M.mercator_to_tile_px(np.array([-2000000.0, -1000000.0, 1000000.0, 2000000.0]),
                                   np.array([0.0, 1250000.0, 1000000.0, 0.0]),
                                   0, 0, 0, extent=256)
    # decode back
    minx, miny, maxx, maxy = M.box_for_tile(0, 0, 0)
    span = maxx - minx
    mx = px / 256.0 * span + minx
    my = maxy - py / 256.0 * span
    assert mx == pytest.approx(
        [-2035059.44106453, -939258.203568246, 939258.203568246, 2035059.44106453], abs=1e-3)
    assert my == pytest.approx(
        [0.0, 1252344.27142433, 939258.203568246, 0.0], abs=1e-3)


def test_zigzag_roundtrip():
    v = np.array([0, -1, 1, -2, 2, 2147483647, -2147483648])
    enc = M.zigzag_encode(v)
    assert list(enc[:5]) == [0, 1, 2, 3, 4]  # protobuf zigzag table
    assert np.array_equal(M.zigzag_decode(enc), v)


def test_tile_for_mercator_roundtrip():
    rng = np.random.default_rng(42)
    mx = rng.uniform(-2e7, 2e7, 1000)
    my = rng.uniform(-1.5e7, 1.5e7, 1000)
    for z in (0, 5, 14):
        tx, ty = M.tile_for_mercator(mx, my, z)
        minx, miny, maxx, maxy = M.box_for_tile(z, tx, ty)
        assert ((mx >= minx - 1e-6) & (mx <= maxx + 1e-6)).all()
        assert ((my >= miny - 1e-6) & (my <= maxy + 1e-6)).all()


def test_ancestor_tile():
    # overzoom.cpp:14-23 semantics
    z, x, y = M.ancestor_tile(np.array([16]), np.array([1000]), np.array([2000]), 14)
    assert (z[0], x[0], y[0]) == (14, 250, 500)
    z, x, y = M.ancestor_tile(np.array([12]), np.array([10]), np.array([20]), 14)
    assert (z[0], x[0], y[0]) == (12, 10, 20)


def test_lonlat_mercator_roundtrip():
    lon = np.array([0.0, -180.0, 45.0, 179.9])
    lat = np.array([0.0, 45.0, -60.0, 80.0])
    mx, my = M.lonlat_to_mercator(lon, lat)
    lon2, lat2 = M.mercator_to_lonlat(mx, my)
    assert lon2 == pytest.approx(lon, abs=1e-9)
    assert lat2 == pytest.approx(lat, abs=1e-9)
    # null island maps to origin
    assert M.lonlat_to_mercator(0.0, 0.0) == pytest.approx((0.0, 0.0))


def test_quadkey_cell_index_properties(spark):
    """cell_quadkey_z14 (unregistered since r05 — its oracle row was a
    bijective repack of tile_assign_z14's): pack/unpack bijection,
    ancestor-by-shift containment, and per-cell counts identical to the
    tile assignment it repacks."""
    from avecado_spark import queries as q
    from avecado_spark.queries import cell_quadkey_z14

    sf = "/root/testdata/sf0.001"
    cells = {r.cell: r.n_docs for r in cell_quadkey_z14(spark, sf).collect()}
    tiles = {(r.x, r.y): r.n_docs for r in
             q.queries()["tile_assign_z14"](spark, sf).collect()}
    assert len(cells) == len(tiles) > 0
    for cell, n in cells.items():
        z = cell >> 58
        x = (cell >> 29) & ((1 << 29) - 1)
        y = cell & ((1 << 29) - 1)
        assert z == 14 and tiles[(x, y)] == n       # bijection + counts
        parent = ((z - 1) << 58) + ((x >> 1) << 29) + (y >> 1)
        assert (parent >> 58) == 13                 # ancestor by shift
        assert ((parent >> 29) & ((1 << 29) - 1)) == x >> 1
