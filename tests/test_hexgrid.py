"""Hex-grid binning (operators/keys.hex_cell_cols): the assignment must
be the true nearest-hex-center map, engine-exact."""

import numpy as np
from pyspark.sql import functions as F

S = 10**9  # circumradius, mercator mm
SQRT3 = 1.7320508075688772


def _ref_cell(x, y):
    """Reference cube-rounding in plain python."""
    q = (SQRT3 / 3.0 * x - y / 3.0) / S
    r = (2.0 / 3.0 * y) / S
    y0 = -q - r
    rx, ry, rz = np.floor(q + .5), np.floor(y0 + .5), np.floor(r + .5)
    dx, dy, dz = abs(rx - q), abs(ry - y0), abs(rz - r)
    if dx > dy and dx > dz:
        rx = -ry - rz
    elif dy > dz:
        ry = -rx - rz
    else:
        rz = -rx - ry
    return int(rx), int(rz)


def _center(hq, hr):
    return (S * SQRT3 * (hq + hr / 2.0), S * 1.5 * hr)


def test_hex_cell_matches_reference_and_is_nearest(spark):
    rng = np.random.default_rng(7)
    xs = rng.integers(-2 * 10**10, 2 * 10**10, 400)
    ys = rng.integers(-2 * 10**10, 2 * 10**10, 400)
    from avecado_spark.operators.keys import with_hex_cell
    df = spark.createDataFrame(
        [(int(x), int(y)) for x, y in zip(xs, ys)],
        "mx_mm long, my_mm long")
    got = with_hex_cell(df, S).collect()
    for row in got:
        x, y = row["mx_mm"], row["my_mm"]
        hq, hr = row["hq"], row["hr"]
        assert (hq, hr) == _ref_cell(x, y), (x, y)
        # true nearest center: own center beats all 6 neighbors
        cx, cy = _center(hq, hr)
        d0 = (x - cx) ** 2 + (y - cy) ** 2
        for dq, dr in ((1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1)):
            nx, ny = _center(hq + dq, hr + dr)
            assert d0 <= (x - nx) ** 2 + (y - ny) ** 2 + 1e-3, (x, y)


def test_hex_sql_matches_spark_exactly(spark, duck):
    """The SQL fragment (oracle side) is formula-identical: same cells
    on a coordinate sweep including near-boundary points."""
    from avecado_spark.operators.keys import hex_cell_sql, with_hex_cell
    rng = np.random.default_rng(11)
    pts = [(int(x), int(y)) for x, y in
           zip(rng.integers(-2 * 10**10, 2 * 10**10, 300),
               rng.integers(-2 * 10**10, 2 * 10**10, 300))]
    # points ON and near hex-center rows (tie-prone)
    for k in range(-5, 6):
        pts.append((int(S * SQRT3 * k), int(S * 1.5 * k)))
        pts.append((int(S * SQRT3 * (k + .5)), int(S * .75)))
    df = spark.createDataFrame(pts, "mx_mm long, my_mm long")
    got = {(r["mx_mm"], r["my_mm"]): (r["hq"], r["hr"])
           for r in with_hex_cell(df, S).collect()}
    import duckdb
    con = duckdb.connect()
    con.execute("CREATE TABLE pts(mx_mm BIGINT, my_mm BIGINT)")
    con.executemany("INSERT INTO pts VALUES (?, ?)", pts)
    frag = hex_cell_sql("mx_mm", "my_mm", S)
    want = {(x, y): (hq, hr) for x, y, hq, hr in
            con.sql(f"SELECT mx_mm, my_mm, {frag} FROM pts").fetchall()}
    assert got == want
