"""S2 cell index: three-way implementation parity + structural invariants.

The fast numpy path (4-bit lookup), the definitional python 2-bit walk, and
the DuckDB chained-CTE oracle are pinned against each other; the Hilbert
tables are additionally validated by curve-adjacency (a single wrong table
entry breaks consecutive-cell adjacency somewhere in the first 4 levels).
"""

import numpy as np
import pandas as pd
import pytest

from avecado_spark.functions import s2

rng = np.random.default_rng(7)
N = 2000
MX = rng.integers(-20037508340, 20037508340, N)
MY = rng.integers(-20037508340, 20037508340, N)


def _decompose(mx, my):
    px, py, pz = s2.xyz_from_mercator_mm(mx, my)
    face, u, v = s2.face_uv_from_xyz(px, py, pz)
    return face, s2.leaf_ij(s2.st_from_uv(u)), s2.leaf_ij(s2.st_from_uv(v))


def test_lookup_tables_are_inverse_permutations():
    for o in range(4):
        pos_vals = s2._LOOKUP_POS[np.arange(256) * 4 + o]
        assert sorted(v >> 2 for v in pos_vals) == list(range(256))
        for ij in range(256):
            v = s2._LOOKUP_POS[ij * 4 + o]
            back = s2._LOOKUP_IJ[(v >> 2) * 4 + o]
            assert back >> 2 == ij and (back & 3) == (v & 3)


def test_hilbert_curve_adjacency_and_coverage():
    """Consecutive curve positions at level 4 are grid neighbors and the
    curve visits every (i,j) exactly once — for every start orientation."""
    for face in range(6):
        seen = set()
        prev = None
        for pos in range(256):
            # decode pos -> ij with the definitional tables
            o, i, j = face & 1, 0, 0
            for k in range(3, -1, -1):
                q = (pos >> (2 * k)) & 3
                ij = s2.POS_TO_IJ[o][q]
                i = (i << 1) | (ij >> 1)
                j = (j << 1) | (ij & 1)
                o ^= s2.POS_TO_ORIENT[q]
            seen.add((i, j))
            if prev is not None:
                assert abs(i - prev[0]) + abs(j - prev[1]) == 1, (face, pos)
            prev = (i, j)
        assert len(seen) == 256


def test_fast_path_matches_definitional_walk():
    face, i, j = _decompose(MX, MY)
    fast = s2.cellid_from_face_ij(face, i, j)
    slow = np.array([s2._cellid_walk_py(int(f), int(a), int(b))
                     for f, a, b in zip(face, i, j)], dtype=np.uint64)
    assert np.array_equal(fast, slow)


def test_parent_snap_matches_direct_level_walk():
    face, i, j = _decompose(MX, MY)
    for level in (4, 12, 20):
        snapped = s2.cellid_from_mercator_mm(MX, MY, level)
        direct = np.array(
            [s2._cellid_walk_py(int(f), int(a) >> (30 - level),
                                int(b) >> (30 - level), level)
             for f, a, b in zip(face, i, j)], dtype=np.uint64)
        assert np.array_equal(snapped, direct.view(np.int64)), level


def test_decode_inverts_encode():
    face, i, j = _decompose(MX, MY)
    ids = s2.cellid_from_face_ij(face, i, j)
    f2, i2, j2 = s2.face_ij_from_cellid(ids)
    assert np.array_equal(f2, face)
    assert np.array_equal(i2, i)
    assert np.array_equal(j2, j)


def test_id_algebra_levels_ranges_containment():
    leaf = s2.cellid_from_mercator_mm(MX, MY, 30).view(np.uint64)
    assert np.all(s2.cell_level(leaf) == 30)
    prev_min = None
    for level in (2, 8, 14, 25):
        p = s2.parent(leaf, level)
        assert np.all(s2.cell_level(p) == level)
        assert np.all(s2.contains(p, leaf))
        # nesting: coarser ancestors contain finer ancestors' ranges
        if prev_min is not None:
            assert np.all(s2.range_min(p) >= prev_min[0])
            assert np.all(s2.range_max(p) <= prev_min[1])
        prev_min = (s2.range_min(p), s2.range_max(p))
    # siblings partition the parent range
    p8 = np.unique(s2.parent(leaf, 8))
    rmin, rmax = s2.range_min(p8), s2.range_max(p8)
    order = np.argsort(rmin)
    assert np.all(rmax[order][:-1] < rmin[order][1:])  # disjoint


def test_center_roundtrip_within_leaf_cell():
    ids = s2.cellid_from_mercator_mm(MX, MY, 30)
    lon, lat = s2.lonlat_rad_from_cellid(ids)
    lon0 = MX / 1000.0 / s2.EARTH_RADIUS_M
    lat0 = np.arctan(np.sinh(MY / 1000.0 / s2.EARTH_RADIUS_M))
    # leaf cells are ~1.5e-9 rad across; allow a few cells of slack
    dlon = np.abs(np.angle(np.exp(1j * (lon - lon0))))
    assert np.max(np.abs(lat - lat0)) < 1e-7
    assert np.max(dlon * np.cos(lat0)) < 1e-7


def test_tokens():
    ids = np.array([0x1000000000000000, 0x1234500000000000], dtype=np.uint64)
    assert s2.to_token(ids) == ["1", "12345"]


def test_equal_area_property_vs_mercator():
    """The point of S2 over the quadkey: polar cells do not blow up.
    A band of points at lat 80° and one at the equator land in level-8
    cells whose count ratio stays bounded (mercator z8 rows differ 6x)."""
    lon = np.linspace(-np.pi, np.pi, 20000, endpoint=False)
    R = s2.EARTH_RADIUS_M
    mx = (lon * R * 1000).astype(np.int64)
    eq = s2.cellid_from_mercator_mm(mx, np.zeros_like(mx), 8)
    y80 = np.arctanh(np.sin(np.radians(80.0))) * R * 1000
    polar = s2.cellid_from_mercator_mm(mx, np.full_like(mx, int(y80)), 8)
    n_eq, n_polar = len(np.unique(eq)), len(np.unique(polar))
    # same-length circles of latitude: cells crossed shrink only by the
    # circle's true length (cos 80 ≈ 0.17) times bounded distortion
    assert n_polar < n_eq
    assert n_polar > 0.17 * 0.4 * n_eq


def test_duckdb_oracle_parity_random_points():
    duckdb = pytest.importorskip("duckdb")
    df = pd.DataFrame({"url": [f"u{k}" for k in range(N)],
                       "mx_mm": MX, "my_mm": MY})
    con = duckdb.connect()
    con.register("pts_src", df)
    for level in (4, 12):
        got = (con.sql(s2.s2_cell_sql(level, "pts_src"))
               .df().sort_values("url").reset_index(drop=True))
        exp = (pd.DataFrame({"url": df.url,
                             "cell": s2.cellid_from_mercator_mm(MX, MY, level)})
               .sort_values("url").reset_index(drop=True))
        assert np.array_equal(got.cell.to_numpy(), exp.cell.to_numpy()), level
