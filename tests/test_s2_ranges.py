"""Adaptive S2 covers + leaf-range probe: collapse soundness, size bound,
and operator parity with the dense probe."""

import numpy as np
import pandas as pd

from avecado_spark.functions import s2

rng = np.random.default_rng(13)


def test_adaptive_cover_is_conservative_and_smaller():
    lon_lo, lat_lo, lon_hi, lat_hi = -0.3, 0.1, 0.2, 0.55
    fixed = set(s2.cover_bbox_rad(lon_lo, lat_lo, lon_hi, lat_hi, 8).tolist())
    adap = s2.cover_bbox_rad(lon_lo, lat_lo, lon_hi, lat_hi, 8, adaptive=True)
    au = adap.view(np.uint64)
    rmin, rmax = s2.range_min(au), s2.range_max(au)
    assert len(adap) < len(fixed) / 3
    # disjoint ranges
    order = np.argsort(rmin)
    assert np.all(rmax[order][:-1] < rmin[order][1:])
    # conservativeness: every bbox point's leaf id falls in some range
    lon = rng.uniform(lon_lo, lon_hi, 3000)
    lat = rng.uniform(lat_lo, lat_hi, 3000)
    r = s2.EARTH_RADIUS_M * 1000.0
    leaf = s2.cellid_from_mercator_mm(
        (lon * r).astype(np.int64),
        (np.arctanh(np.sin(lat)) * r).astype(np.int64)).view(np.uint64)
    pos = np.searchsorted(rmin[order], leaf, side="right") - 1
    assert np.all(pos >= 0)
    assert np.all(leaf <= rmax[order][pos])
    # precision: adaptive cells at the max level only appear on the
    # boundary — every emitted cell still intersects the bbox (checked by
    # construction), and deep levels exist
    assert s2.cell_level(au).max() == 8


def test_adaptive_cover_perimeter_scaling():
    """Two extra levels of precision cost ~4x cells (perimeter), not ~16x
    (area) — the property that makes precision affordable."""
    box = (-0.35, 0.05, 0.35, 0.6)
    n10 = len(s2.cover_bbox_rad(*box, 10, adaptive=True))
    n12 = len(s2.cover_bbox_rad(*box, 12, adaptive=True))
    assert n12 < 8 * n10


def test_s2ranges_operator_matches_dense_probe(spark):
    from avecado_spark.operators.adminizer import (adminize_points_rings,
                                                   adminize_points_s2ranges)
    from avecado_spark.queries import ADMIN_RINGS

    cx, cy = ADMIN_RINGS[0][1][0]
    n = 3000
    pdf = pd.DataFrame({
        "url": [f"u{i}" for i in range(n)],
        "mx_mm": np.concatenate([
            rng.integers(cx - 4_000_000_000, cx + 4_000_000_000, n // 2),
            rng.integers(-20_000_000_000, 20_000_000_000, n - n // 2)]),
        "my_mm": np.concatenate([
            rng.integers(cy - 4_000_000_000, cy + 4_000_000_000, n // 2),
            rng.integers(-15_000_000_000, 15_000_000_000, n - n // 2)]),
    })
    df = spark.createDataFrame(pdf)
    a = sorted(adminize_points_rings(df, ADMIN_RINGS).collect())
    for max_level in (8, 12):
        b = sorted(adminize_points_s2ranges(df, ADMIN_RINGS,
                                            max_level=max_level).collect())
        assert a == b, max_level
