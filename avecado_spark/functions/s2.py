"""S2 cell ids — the real hierarchical sphere index (not a quadkey repack).

The north rule asks for an "H3/S2 index" with cell-cover polygon joins; the
h3/s2 libraries are not in this container, so this module implements the
published S2 cell-id scheme from scratch in vectorized numpy: unit sphere →
cube face → quadratic (u,v)→(s,t) projection → 2^30×2^30 leaf grid → Hilbert
curve position, packed as `face(3 bits) ‖ curve position(2·level bits) ‖
1000…0` in a 64-bit id.  The scheme (face layout, quadratic ST transform,
Hilbert orientation tables) follows the public S2 geometry documentation
(s2geometry.io, "S2 Cell Hierarchy"); everything here is derived from that
published spec — no library code.

Why S2 over the quadkey stand-in (operators/keys.quadkey_col):
  * cells are quasi-equal-AREA on the sphere (the quadratic projection
    bounds cell-size distortion to ~2.1×; mercator tiles blow up toward the
    poles), so per-cell doc counts are comparable across latitudes — the
    property that makes cell = shuffle-key a skew-safe choice at corpus
    scale;
  * the Hilbert curve gives LOCALITY: spatially close documents get close
    cell ids, so range-partitioning by cell id co-locates neighborhoods
    (quadkey interleaving jumps at quadrant boundaries);
  * prefix containment is arithmetic (parent/range_min/range_max below) —
    the containment join is a plain integer equality/range join, fully
    JVM-side.

Parity: the DuckDB oracle (s2_cell_sql) re-derives the id with an
INDEPENDENT algorithm — a per-level 2-bit Hilbert walk in chained CTEs —
while the numpy path uses the 4-bit lookup-table form; tests additionally
pin a third pure-python walk.  Float-parity note: both sides compute the
projection with the same IEEE ops (divisions, sqrt, sin/cos/exp); a last-ulp
libm difference could in principle flip a floor() at a cell boundary, but at
the level-12 grid the flip window is ~4e-16/2.4e-4 ≈ 2e-12 per document —
negligible (and the driver gate would surface it loudly).

Reference parallel: the reference engine has no sphere index at all — its
spatial joins scan per-tile feature lists (adminizer.cpp:63-80); the cell
index is the Spark-native replacement that makes the same joins broadcast-
or shuffle-key-able at 10^12 rows.
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_M = 6378137.0  # mercator sphere radius (functions/mercator.py)
MAX_LEVEL = 30
# batch-cover owner chunk: keeps each BFS level's frontier temporaries
# cache-resident (see cover_bboxes_rad_batch)
_COVER_CHUNK_OWNERS = 1024

# Hilbert orientation algebra (published S2 scheme): orientation is 2 bits
# (swap | invert); POS_TO_IJ[o][pos] = ij quadrant, IJ_TO_POS its row-wise
# inverse; POS_TO_ORIENT[pos] xors into the orientation when descending.
_SWAP, _INVERT = 1, 2
POS_TO_ORIENT = (1, 0, 0, 3)
POS_TO_IJ = ((0, 1, 3, 2),
             (0, 2, 3, 1),
             (3, 2, 0, 1),
             (3, 1, 0, 2))
IJ_TO_POS = tuple(tuple(row.index(ij) for ij in range(4)) for row in POS_TO_IJ)


def _build_lookup() -> tuple[np.ndarray, np.ndarray]:
    """4-bit-chunk lookup tables: key = i4<<6 | j4<<2 | orientation,
    value = pos8<<2 | end_orientation (and the ij-direction inverse).
    Built by running the definitional 2-bit walk four levels — the fast
    path is thereby derived from, not independent of, the walk; the
    INDEPENDENT check is the SQL/py walks in tests and the oracle."""
    lookup_pos = np.zeros(1024, dtype=np.int64)
    lookup_ij = np.zeros(1024, dtype=np.int64)
    for o0 in range(4):
        for i4 in range(16):
            for j4 in range(16):
                o, pos = o0, 0
                for k in range(3, -1, -1):
                    ij = (((i4 >> k) & 1) << 1) | ((j4 >> k) & 1)
                    q = IJ_TO_POS[o][ij]
                    pos = (pos << 2) | q
                    o ^= POS_TO_ORIENT[q]
                lookup_pos[(i4 << 6) | (j4 << 2) | o0] = (pos << 2) | o
                lookup_ij[(pos << 2) | o0] = (i4 << 6) | (j4 << 2) | o
    return lookup_pos, lookup_ij


_LOOKUP_POS, _LOOKUP_IJ = _build_lookup()


# ---------------------------------------------------------------------------
# projection: integer mercator mm → cube face (u, v)
# ---------------------------------------------------------------------------

def xyz_from_mercator_mm(mx_mm, my_mm):
    """Unnormalized direction vector for a web-mercator-mm point.

    lon = mx/R; the Gudermannian identities sin(lat)=tanh(q),
    cos(lat)=1/cosh(q) for q = my/R let the common 1/cosh(q) factor cancel
    (face choice and (u,v) are scale-invariant), leaving
    p = (cos lon, sin lon, sinh q) — no atan/tan calls, and sinh is spelled
    (exp(q)-exp(-q))/2 so the DuckDB oracle runs the identical op chain."""
    lon = np.asarray(mx_mm, dtype=np.float64) / 1000.0 / EARTH_RADIUS_M
    q = np.asarray(my_mm, dtype=np.float64) / 1000.0 / EARTH_RADIUS_M
    return np.cos(lon), np.sin(lon), (np.exp(q) - np.exp(-q)) * 0.5


def face_uv_from_xyz(px, py, pz):
    """Cube face (0..5) by largest-|component| axis, then the published
    per-face (u, v) ratios.  The comparison chain (strict >, x-then-y-then-z)
    is mirrored verbatim in the SQL oracle so ties break identically."""
    ax, ay, az = np.abs(px), np.abs(py), np.abs(pz)
    axis = np.where(ax > ay, np.where(ax > az, 0, 2), np.where(ay > az, 1, 2))
    face = np.where(axis == 0, np.where(px > 0, 0, 3),
                    np.where(axis == 1, np.where(py > 0, 1, 4),
                             np.where(pz > 0, 2, 5)))
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [py / px, -px / py, -px / pz, pz / px, pz / py], -py / pz)
        v = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [pz / px, pz / py, -py / pz, py / px, -px / py], -px / pz)
    return face.astype(np.int64), u, v


def st_from_uv(u):
    """Quadratic cell-space projection (the S2 default): near-uniform cell
    areas at ~3 flops. s ∈ [0, 1] exactly for u ∈ [-1, 1]."""
    # 1−3u for u<0 equals 1+3|u| bit-for-bit, so the single nonnegative
    # sqrt below is FP-identical to the two-branch SQL form (and warning-free)
    h = 0.5 * np.sqrt(1.0 + 3.0 * np.abs(u))
    return np.where(u >= 0.0, h, 1.0 - h)


def uv_from_st(s):
    return np.where(s >= 0.5, (4.0 * s * s - 1.0) / 3.0,
                    (1.0 - 4.0 * (1.0 - s) * (1.0 - s)) / 3.0)


def leaf_ij(s):
    """Leaf grid coordinate: floor(s·2^30) clamped. Multiplying by a power
    of two is exact in fp64, so floor(s·2^30)>>18 == floor(s·2^12) etc. —
    the SQL oracle may quantize directly at its level."""
    return np.clip(np.floor(s * float(1 << MAX_LEVEL)).astype(np.int64),
                   0, (1 << MAX_LEVEL) - 1)


# ---------------------------------------------------------------------------
# Hilbert encode / decode
# ---------------------------------------------------------------------------

def cellid_from_face_ij(face, i, j):
    """Leaf cell id (uint64) via the 4-bit lookup walk — 8 vectorized
    table-gather iterations for any batch size."""
    face = np.asarray(face, dtype=np.int64)
    i = np.asarray(i, dtype=np.int64)
    j = np.asarray(j, dtype=np.int64)
    bits = face & _SWAP
    n = face.astype(np.uint64) << np.uint64(60)
    for k in range(7, -1, -1):
        idx = (((i >> (4 * k)) & 15) << 6) | (((j >> (4 * k)) & 15) << 2) | bits
        v = _LOOKUP_POS[idx]
        n |= (v >> 2).astype(np.uint64) << np.uint64(8 * k)
        bits = v & 3
    return (n << np.uint64(1)) | np.uint64(1)


def face_ij_from_cellid(ids):
    """Inverse walk: (face, leaf i, leaf j) — for a non-leaf id the trailing
    1000…0 marker decodes to the cell's center leaf column/row."""
    ids = np.asarray(ids, dtype=np.uint64)
    face = (ids >> np.uint64(61)).astype(np.int64)
    bits = face & _SWAP
    i = np.zeros_like(face)
    j = np.zeros_like(face)
    for k in range(7, -1, -1):
        nbits = 2 if k == 7 else 4
        chunk = ((ids >> np.uint64(8 * k + 1)).astype(np.int64)
                 & ((1 << (2 * nbits)) - 1))
        v = _LOOKUP_IJ[(chunk << 2) | bits]
        i |= (v >> 6) << (4 * k)
        j |= ((v >> 2) & 15) << (4 * k)
        bits = v & 3
    return face, i, j


def _cellid_walk_py(face: int, i: int, j: int, level: int = MAX_LEVEL) -> int:
    """Definitional per-level 2-bit walk (scalar python) — the slow third
    implementation the tests pin the fast path against. i, j are at `level`
    resolution (i < 2^level)."""
    o, pos = face & _SWAP, 0
    for k in range(level):
        ij = (((i >> (level - 1 - k)) & 1) << 1) | ((j >> (level - 1 - k)) & 1)
        q = IJ_TO_POS[o][ij]
        pos = (pos << 2) | q
        o ^= POS_TO_ORIENT[q]
    shift = 2 * (MAX_LEVEL - level)
    return (face << 61) | (pos << (shift + 1)) | (1 << shift)


# ---------------------------------------------------------------------------
# id algebra (all O(1) arithmetic — the containment-join primitives)
# ---------------------------------------------------------------------------

def lsb_for_level(level: int) -> np.uint64:
    return np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))


def parent(ids, level: int):
    """Ancestor at `level`: clear below the new lsb, set the new lsb."""
    ids = np.asarray(ids, dtype=np.uint64)
    lsb = lsb_for_level(level)
    neg = (~lsb) + np.uint64(1)          # two's-complement -lsb
    return (ids & neg) | lsb


def cell_level(ids):
    ids = np.asarray(ids, dtype=np.uint64)
    lsb = ids & ((~ids) + np.uint64(1))
    tz = np.log2(lsb.astype(np.float64)).astype(np.int64)  # exact: power of 2
    return MAX_LEVEL - (tz >> 1)


def range_min(ids):
    ids = np.asarray(ids, dtype=np.uint64)
    lsb = ids & ((~ids) + np.uint64(1))
    return ids - (lsb - np.uint64(1))


def range_max(ids):
    ids = np.asarray(ids, dtype=np.uint64)
    lsb = ids & ((~ids) + np.uint64(1))
    return ids + (lsb - np.uint64(1))


def contains(parent_ids, child_ids) -> np.ndarray:
    return ((range_min(parent_ids) <= np.asarray(child_ids, np.uint64))
            & (np.asarray(child_ids, np.uint64) <= range_max(parent_ids)))


def to_token(ids) -> list[str]:
    """Canonical token: 16 hex digits, trailing zeros stripped."""
    return [format(int(x), "016x").rstrip("0") or "X"
            for x in np.asarray(ids, dtype=np.uint64)]


def cellid_from_mercator_mm(mx_mm, my_mm, level: int = MAX_LEVEL) -> np.ndarray:
    """mm coords → SIGNED int64 cell ids at `level` (faces 4/5 set bit 63;
    the signed view is the Spark/DuckDB interchange form)."""
    px, py, pz = xyz_from_mercator_mm(mx_mm, my_mm)
    face, u, v = face_uv_from_xyz(px, py, pz)
    ids = cellid_from_face_ij(face, leaf_ij(st_from_uv(u)),
                              leaf_ij(st_from_uv(v)))
    if level < MAX_LEVEL:
        ids = parent(ids, level)
    return ids.view(np.int64)


def lonlat_rad_from_cellid(ids):
    """Cell-center (leaf-resolution) lon/lat in radians — inverse transform
    for tests and cover bounds."""
    face, i, j = face_ij_from_cellid(np.asarray(ids, dtype=np.uint64))
    s = (i.astype(np.float64) + 0.5) / float(1 << MAX_LEVEL)
    t = (j.astype(np.float64) + 0.5) / float(1 << MAX_LEVEL)
    u, v = uv_from_st(s), uv_from_st(t)
    x, y, z = xyz_from_face_uv(face, u, v)
    return np.arctan2(y, x), np.arctan2(z, np.hypot(x, y))


def xyz_from_face_uv(face, u, v):
    """Published inverse face layout (unnormalized)."""
    one = np.ones_like(u)
    x = np.select([face == 0, face == 1, face == 2, face == 3, face == 4],
                  [one, -u, -u, -one, v], v)
    y = np.select([face == 0, face == 1, face == 2, face == 3, face == 4],
                  [u, one, -v, -v, -one], u)
    z = np.select([face == 0, face == 1, face == 2, face == 3, face == 4],
                  [v, v, one, -u, -u], -one)
    return x, y, z


# ---------------------------------------------------------------------------
# cell rect bounds + bbox covering — the cell-cover index for polygon joins
# ---------------------------------------------------------------------------

def _cell_rect_bound(face: int, u0: float, u1: float, v0: float, v1: float):
    """EXACT lon/lat bounding rect of the sphere region a face (u,v)-rect
    maps to, as (lon_lo, lon_hi, lat_lo, lat_hi); lon may be "unwrapped"
    (outside ±π) so an interval never straddles the antimeridian cut —
    intersection tests shift by 2π.

    Equatorial faces: lon = base + atan(p) is monotonic in one axis (p),
    and lat = atan(w/sqrt(1+p²)) attains extrema at w-endpoints with the
    p-endpoint nearest/farthest 0 — closed forms, no sampling.  Polar
    faces: lat from the radial min/max of the rect (pole if it contains
    the origin), lon from the corner-direction arc (the support directions
    of a convex region not containing the origin lie at its vertices)."""
    import math

    if face in (0, 1, 3, 4):
        if face in (0, 1):
            p0, p1, w0, w1 = u0, u1, v0, v1
        else:  # faces 3/4: lon along v, lat numerator is -u
            p0, p1, w0, w1 = v0, v1, -u1, -u0
        base = {0: 0.0, 1: math.pi / 2, 3: math.pi, 4: -math.pi / 2}[face]
        lon_lo, lon_hi = base + math.atan(p0), base + math.atan(p1)
        p_near = 0.0 if p0 <= 0.0 <= p1 else min(abs(p0), abs(p1))
        p_far = max(abs(p0), abs(p1))

        def lat_at(w, favor_near):
            p = p_near if favor_near else p_far
            return math.atan(w / math.sqrt(1.0 + p * p))

        lat_hi = lat_at(w1, w1 > 0)
        lat_lo = lat_at(w0, w0 < 0)
        return lon_lo, lon_hi, lat_lo, lat_hi

    # polar faces: face 2 xyz=(-u,-v,1), face 5 xyz=(v,u,-1)
    contains_origin = u0 <= 0.0 <= u1 and v0 <= 0.0 <= v1
    du = 0.0 if u0 <= 0.0 <= u1 else min(abs(u0), abs(u1))
    dv = 0.0 if v0 <= 0.0 <= v1 else min(abs(v0), abs(v1))
    r2min = du * du + dv * dv
    r2max = max(u0 * u0, u1 * u1) + max(v0 * v0, v1 * v1)
    top = math.atan(1.0 / math.sqrt(r2min)) if r2min > 0 else math.pi / 2
    bot = math.atan(1.0 / math.sqrt(r2max)) if r2max > 0 else math.pi / 2
    lat_lo, lat_hi = (bot, top) if face == 2 else (-top, -bot)
    if contains_origin:
        return -math.pi, math.pi, lat_lo, lat_hi
    corners = [(cu, cv) for cu in (u0, u1) for cv in (v0, v1)]
    if face == 2:
        angs = [math.atan2(-cv, -cu) for cu, cv in corners]
    else:
        angs = [math.atan2(cu, cv) for cu, cv in corners]
    ref = angs[0]
    rel = [math.remainder(a - ref, 2.0 * math.pi) for a in angs]
    return ref + min(rel), ref + max(rel), lat_lo, lat_hi


def _lon_overlap(lo0, hi0, lo1, hi1) -> bool:
    """Interval overlap on the circle for possibly-unwrapped intervals."""
    import math
    for shift in (-2.0 * math.pi, 0.0, 2.0 * math.pi):
        if lo0 + shift <= hi1 and lo1 <= hi0 + shift:
            return True
    return False


def _lon_within(lo0, hi0, lo1, hi1) -> bool:
    """[lo0,hi0] ⊆ [lo1,hi1] on the circle (unwrapped intervals)."""
    import math
    for shift in (-2.0 * math.pi, 0.0, 2.0 * math.pi):
        if lo0 + shift >= lo1 and hi0 + shift <= hi1:
            return True
    return False


def cover_bbox_rad(lon_lo: float, lat_lo: float, lon_hi: float, lat_hi: float,
                   level: int, max_cells: int = 200_000,
                   adaptive: bool = False) -> np.ndarray:
    """Cells whose EXACT rect bound intersects the lon/lat bbox (radians) —
    a conservative superset of the cells intersecting any region inside the
    bbox, which is the candidate-generation contract for cover joins (a
    contained point's cell can never be missed).  BFS over the cell tree
    from the 6 face roots; returns signed int64 cell ids.

    Fixed mode (adaptive=False): all cells at exactly `level` — the shape
    for an EQUALITY join on a level-`level` doc column, but cover size
    grows 4× per level (O(area)).  Adaptive mode: `level` is the MAX
    level; a cell whose rect bound lies fully inside the bbox is emitted
    where it is (its whole subtree is inside — collapsing is sound because
    bound ⊇ region), so the cover is O(perimeter) cells at mixed levels —
    the canonical S2 covering, joined via [range_min, range_max] leaf-id
    ranges instead of equality.

    Implementation: the batch-of-one case of cover_bboxes_rad_batch —
    scalar and batch covers are the SAME code path, so per-owner parity
    between them holds by construction."""
    ids, _ = cover_bboxes_rad_batch(
        np.array([lon_lo]), np.array([lat_lo]),
        np.array([lon_hi]), np.array([lat_hi]),
        level, max_total_cells=max_cells, adaptive=adaptive)
    return ids


def cover_bboxes_rad_batch(lon_lo, lat_lo, lon_hi, lat_hi, level: int,
                           max_total_cells: int = 50_000_000,
                           adaptive: bool = True):
    """Adaptive covers for MANY bboxes in one BFS: the frontier carries an
    owner index and every per-cell test gathers its owner's bbox, so the
    whole 10^4-polygon index build is a few dozen full-width numpy passes
    per level instead of 10^4 independent traversals, with all trig folded
    into O(owners) threshold tables up front (measured at 10k polygons /
    level-12 adaptive / 926k cover cells: 1.8s vs 47.3s for the
    per-polygon loop).  Returns (ids int64, owner int64); emitted
    cells per owner are exactly cover_bbox_rad(..., adaptive=...) of that
    owner's bbox — parity is test-pinned
    (tests/test_s2_cover.py::test_batch_cover_matches_scalar_per_owner).

    Owners are processed in chunks of _COVER_CHUNK_OWNERS so the deepest
    levels' frontier temporaries (~30 full-width arrays per level) stay
    cache-resident instead of streaming DRAM: at 10k owners / level 10 /
    1.1M cells the unchunked build measured 1.3-14.2s on this host's
    drifting memory subsystem, chunked it holds 1.2-1.6s.  Per-owner
    output is identical (each owner's BFS is independent); only the
    global row order changes, which no caller relies on (all re-sort by
    owner or cell)."""
    m_all = len(np.asarray(lon_lo, dtype=np.float64))
    if m_all > _COVER_CHUNK_OWNERS:
        ids_parts, owner_parts, n_total = [], [], 0
        for i in range(0, m_all, _COVER_CHUNK_OWNERS):
            j = i + _COVER_CHUNK_OWNERS
            ids_c, owner_c = cover_bboxes_rad_batch(
                np.asarray(lon_lo)[i:j], np.asarray(lat_lo)[i:j],
                np.asarray(lon_hi)[i:j], np.asarray(lat_hi)[i:j],
                level, max_total_cells=max_total_cells - n_total,
                adaptive=adaptive)
            n_total += len(ids_c)
            ids_parts.append(ids_c)
            owner_parts.append(owner_c + i)
        return np.concatenate(ids_parts), np.concatenate(owner_parts)
    pad = 1e-12
    lon_lo = np.asarray(lon_lo, dtype=np.float64) - pad
    lat_lo = np.asarray(lat_lo, dtype=np.float64) - pad
    lon_hi = np.asarray(lon_hi, dtype=np.float64) + pad
    lat_hi = np.asarray(lat_hi, dtype=np.float64) + pad
    m = len(lon_lo)
    shifts = np.array([-2.0 * np.pi, 0.0, 2.0 * np.pi])

    # ---- per-owner threshold tables: ALL trig happens here, O(m) ----------
    # Equatorial faces: cell lon interval is base + atan(p-interval) with
    # atan(p) in [-pi/4, pi/4], so every lon comparison pushes through tan
    # once the query-side angle is clipped to +-0.8 (> pi/4: a clipped
    # threshold is already saturated, |tan(+-0.8)| > 1 >= |p|).  One table
    # entry per (owner, face base, world shift).
    bases = np.array([0.0, np.pi / 2, np.pi, -np.pi / 2])
    off = bases[None, :, None] + shifts[None, None, :]              # [1,4,3]
    U_eq = np.tan(np.clip(lon_hi[:, None, None] - off, -0.8, 0.8))  # [m,4,3]
    L_eq = np.tan(np.clip(lon_lo[:, None, None] - off, -0.8, 0.8))
    # Equatorial lat: lat = atan(w / sqrt(1+p^2)) -> compare w against
    # tan(query lat) * sqrt(1+p^2) (query lat strictly inside +-pi/2).
    TL = np.tan(lat_lo)
    TH = np.tan(lat_hi)
    # Polar lat: face 2's lat interval is [atan(1/sqrt(r2max)),
    # atan(1/sqrt(r2min))] (face 5 negated+swapped) -> compare r2 against
    # 1/tan(query lat)^2; inf encodes the trivially-true/false sign cases.
    with np.errstate(divide="ignore"):
        C_lo = np.where(TL > 0, 1.0 / (TL * TL), np.inf)
        D_hi = np.where(TH > 0, 1.0 / (TH * TH), np.inf)
        E_lo = np.where(TL < 0, 1.0 / (TL * TL), np.inf)
        F_hi = np.where(TH < 0, 1.0 / (TH * TH), np.inf)
    full_circle = (lon_hi - lon_lo) >= 2.0 * np.pi
    # face -> column in the U_eq/L_eq base axis (faces 2/5 never look here)
    base_idx = np.array([0, 1, 0, 2, 3, 0], dtype=np.int64)

    out_f, out_l, out_i, out_j, out_p = [], [], [], [], []
    n_out = 0
    face = np.tile(np.arange(6, dtype=np.int64), m)
    pid = np.repeat(np.arange(m, dtype=np.int64), 6)
    ci = np.zeros(6 * m, dtype=np.int64)
    cj = np.zeros(6 * m, dtype=np.int64)
    for lvl in range(level + 1):
        if len(face) == 0:
            break
        scale = 1.0 / (1 << lvl)
        u0 = uv_from_st(ci * scale)
        u1 = uv_from_st((ci + 1) * scale)
        v0 = uv_from_st(cj * scale)
        v1 = uv_from_st((cj + 1) * scale)
        n = len(face)
        overlap = np.zeros(n, dtype=bool)
        inside = np.zeros(n, dtype=bool)
        is_polar = (face == 2) | (face == 5)

        eq = np.flatnonzero(~is_polar)
        if len(eq):
            fe, pe = face[eq], pid[eq]
            a0, a1, b0, b1 = u0[eq], u1[eq], v0[eq], v1[eq]
            eq34 = fe >= 3
            p0 = np.where(eq34, b0, a0)
            p1 = np.where(eq34, b1, a1)
            w0 = np.where(eq34, -a1, b0)
            w1 = np.where(eq34, -a0, b1)
            Ur = U_eq[pe, base_idx[fe]]                             # [ne,3]
            Lr = L_eq[pe, base_idx[fe]]
            lon_ok = ((p0[:, None] <= Ur) & (Lr <= p1[:, None])).any(axis=1)
            spans0 = (p0 <= 0.0) & (0.0 <= p1)
            p_near = np.where(spans0, 0.0, np.minimum(np.abs(p0), np.abs(p1)))
            p_far = np.maximum(np.abs(p0), np.abs(p1))
            s_near = np.sqrt(1.0 + p_near * p_near)
            s_far = np.sqrt(1.0 + p_far * p_far)
            s_hi = np.where(w1 > 0, s_near, s_far)
            s_lo = np.where(w0 < 0, s_near, s_far)
            TLr, THr = TL[pe], TH[pe]
            lat_ok = (w1 >= TLr * s_hi) & (w0 <= THr * s_lo)
            overlap[eq] = lon_ok & lat_ok
            if adaptive:
                lon_in = ((Lr <= p0[:, None]) & (p1[:, None] <= Ur)).any(axis=1)
                lat_in = (w0 >= TLr * s_lo) & (w1 <= THr * s_hi)
                inside[eq] = lon_in & lat_in

        po = np.flatnonzero(is_polar)
        if len(po):
            fp, pp = face[po], pid[po]
            a0, a1, b0, b1 = u0[po], u1[po], v0[po], v1[po]
            du = np.where((a0 <= 0.0) & (0.0 <= a1), 0.0,
                          np.minimum(np.abs(a0), np.abs(a1)))
            dv = np.where((b0 <= 0.0) & (0.0 <= b1), 0.0,
                          np.minimum(np.abs(b0), np.abs(b1)))
            r2min = du * du + dv * dv
            r2max = (np.maximum(a0 * a0, a1 * a1)
                     + np.maximum(b0 * b0, b1 * b1))
            is2 = fp == 2
            lat_ok = np.where(is2,
                              (r2min <= C_lo[pp]) & (r2max >= D_hi[pp]),
                              (r2max >= E_lo[pp]) & (r2min <= F_hi[pp]))
            if adaptive:
                lat_in = np.where(is2,
                                  (r2max <= C_lo[pp]) & (r2min >= D_hi[pp]),
                                  (r2min >= E_lo[pp]) & (r2max <= F_hi[pp]))
            else:
                lat_in = np.zeros(len(po), dtype=bool)
            # lon only matters for rows whose lat already passes (lat_in
            # implies lat_ok: the cell's lat interval sits inside the
            # query's, so it certainly overlaps it)
            need = np.flatnonzero(lat_ok)
            lon_ok = np.zeros(len(po), dtype=bool)
            lon_in = np.zeros(len(po), dtype=bool)
            if len(need):
                a0n, a1n = a0[need], a1[need]
                b0n, b1n = b0[need], b1[need]
                origin = ((a0n <= 0.0) & (0.0 <= a1n)
                          & (b0n <= 0.0) & (0.0 <= b1n))
                lon_ok[need[origin]] = True
                lon_in[need[origin]] = full_circle[pp[need[origin]]]
                sub = need[~origin]
                if len(sub):
                    k = len(sub)
                    cu = np.empty((k, 4))
                    cv = np.empty((k, 4))
                    cu[:, 0] = a0[sub]; cu[:, 1] = a0[sub]
                    cu[:, 2] = a1[sub]; cu[:, 3] = a1[sub]
                    cv[:, 0] = b0[sub]; cv[:, 1] = b1[sub]
                    cv[:, 2] = b0[sub]; cv[:, 3] = b1[sub]
                    angs = np.empty((k, 4))
                    m2 = is2[sub]
                    angs[m2] = np.arctan2(-cv[m2], -cu[m2])
                    angs[~m2] = np.arctan2(cu[~m2], cv[~m2])
                    # support angles of a convex region not containing the
                    # origin lie at its corners; wrap each corner angle to
                    # within pi of the first (|d| < 2pi, so one wrap step
                    # equals math.remainder(d, 2pi) incl. the +-pi ties)
                    ref = angs[:, 0]
                    d = angs - ref[:, None]
                    d = np.where(d > np.pi, d - 2.0 * np.pi, d)
                    d = np.where(d < -np.pi, d + 2.0 * np.pi, d)
                    g_lo = ref + d.min(axis=1)
                    g_hi = ref + d.max(axis=1)
                    qlo, qhi = lon_lo[pp[sub]], lon_hi[pp[sub]]
                    lon_ok[sub] = ((g_lo[:, None] + shifts <= qhi[:, None])
                                   & (qlo[:, None] <= g_hi[:, None] + shifts)
                                   ).any(axis=1)
                    if adaptive:
                        lon_in[sub] = ((g_lo[:, None] + shifts >= qlo[:, None])
                                       & (g_hi[:, None] + shifts
                                          <= qhi[:, None])).any(axis=1)
            overlap[po] = lat_ok & lon_ok
            if adaptive:
                inside[po] = lat_in & lon_in

        emit = overlap & (inside if lvl < level else np.ones(n, bool))
        if emit.any():
            out_f.append(face[emit])
            out_l.append(np.full(int(emit.sum()), lvl, dtype=np.int64))
            out_i.append(ci[emit])
            out_j.append(cj[emit])
            out_p.append(pid[emit])
            n_out += int(emit.sum())
            if n_out > max_total_cells:
                raise ValueError(
                    f"s2 batch cover exceeds {max_total_cells} total cells "
                    f"at level {level}; choose a coarser level")
        desc = overlap & ~emit
        face, ci, cj, pid = face[desc], ci[desc], cj[desc], pid[desc]
        if len(face) > 4 * max_total_cells:
            raise ValueError(
                f"s2 batch cover exceeds {max_total_cells} total cells "
                f"at level {level}; choose a coarser level")
        face = np.repeat(face, 4)
        pid = np.repeat(pid, 4)
        ci = (np.repeat(ci, 4) * 2
              + np.tile(np.array([0, 0, 1, 1], dtype=np.int64), len(ci)))
        cj = (np.repeat(cj, 4) * 2
              + np.tile(np.array([0, 1, 0, 1], dtype=np.int64), len(cj)))
    if n_out == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    faces = np.concatenate(out_f)
    lvls = np.concatenate(out_l)
    ii = np.concatenate(out_i) << (MAX_LEVEL - lvls)
    jj = np.concatenate(out_j) << (MAX_LEVEL - lvls)
    owner = np.concatenate(out_p)
    leaf = cellid_from_face_ij(faces, ii, jj)
    lsb = np.uint64(1) << (np.uint64(2) * (np.uint64(MAX_LEVEL) - lvls.astype(np.uint64)))
    ids = (leaf & ((~lsb) + np.uint64(1))) | lsb
    return ids.view(np.int64), owner


def cover_mercator_bboxes_mm_batch(minx, miny, maxx, maxy, level: int,
                                   adaptive: bool = True):
    """Batch covers of web-mercator-mm bboxes (see cover_bboxes_rad_batch)."""
    r = EARTH_RADIUS_M * 1000.0
    minx = np.asarray(minx, dtype=np.float64)
    maxx = np.asarray(maxx, dtype=np.float64)
    return cover_bboxes_rad_batch(
        minx / r, np.arctan(np.sinh(np.asarray(miny, np.float64) / r)),
        maxx / r, np.arctan(np.sinh(np.asarray(maxy, np.float64) / r)),
        level, adaptive=adaptive)


def cover_mercator_bbox_mm(minx: int, miny: int, maxx: int, maxy: int,
                           level: int, max_cells: int = 200_000,
                           adaptive: bool = False) -> np.ndarray:
    """Cover of a web-mercator-mm bbox: the mercator→lon/lat transform is
    monotonic per axis, so the bbox maps to a lon/lat bbox exactly."""
    r = EARTH_RADIUS_M * 1000.0
    lon_lo, lon_hi = minx / r, maxx / r
    lat_lo = float(np.arctan(np.sinh(miny / r)))
    lat_hi = float(np.arctan(np.sinh(maxy / r)))
    return cover_bbox_rad(lon_lo, lat_lo, lon_hi, lat_hi, level, max_cells,
                          adaptive=adaptive)


def cover_polygon_mm(ring_mm, max_level: int, max_cells: int = 200_000,
                     adaptive: bool = True) -> np.ndarray:
    """Cover of the polygon REGION itself (mercator-mm ring), not its bbox —
    for thin or diagonal polygons this prunes the bbox's dead corners, the
    difference between a candidate set proportional to the polygon and one
    proportional to its bounding box.

    Cell → lon/lat rect bound → mercator rect (both axis transforms are
    monotonic; latitude clamps at the mercator world edge).  A cell is
    PRUNED only when the exact rect/polygon intersection test says disjoint
    (rect bound ⊇ cell region, so pruning can never lose a candidate);
    it COLLAPSES (adaptive) when all rect corners are covered and no
    polygon edge crosses a rect edge — exact for simple polygons.  Face-3
    cells carry unwrapped longitudes, so the rect is tested at ±world
    shifts as well."""
    from . import geometry as G

    ring = np.asarray(ring_mm, dtype=np.float64)
    rc = G.close_ring(ring)
    edges = list(zip(rc[:-1], rc[1:]))
    rmm = EARTH_RADIUS_M * 1000.0
    world = float(np.pi) * rmm

    def merc_y(lat: float) -> float:
        s = np.sin(min(max(lat, -1.5707), 1.5707))
        if abs(s) >= 1.0:
            return np.sign(s) * 2.0 * world
        return float(np.arctanh(s)) * rmm

    def rect_vs_poly(x0, x1, y0, y1):
        """(intersects, within) under the three world shifts."""
        inter = within = False
        for shift in (-2.0 * world, 0.0, 2.0 * world):
            a, b = x0 + shift, x1 + shift
            rect = np.array([[a, y0], [b, y0], [b, y1], [a, y1]])
            if not G.boxes_intersect((a, y0, b, y1), G.bbox(ring)):
                continue
            if G.points_cover(rect, [ring]).all():
                crossed = False
                rrc = G.close_ring(rect)
                for i in range(4):
                    p0, p1 = tuple(rrc[i]), tuple(rrc[i + 1])
                    for q0, q1 in edges:
                        if G._seg_seg_params(p0, p1, tuple(q0), tuple(q1)):
                            crossed = True
                            break
                    if crossed:
                        break
                inter = True
                if not crossed:
                    within = True
                continue
            if G.polygon_intersects_polygon([rect], [ring]):
                inter = True
        return inter, within

    out: list[tuple[int, int, int, int]] = []
    stack: list[tuple[int, int, int, int]] = [(f, 0, 0, 0) for f in range(6)]
    while stack:
        face, lvl, ci, cj = stack.pop()
        scale = 1.0 / (1 << lvl)
        u0, u1 = (float(uv_from_st(np.float64(ci * scale))),
                  float(uv_from_st(np.float64((ci + 1) * scale))))
        v0, v1 = (float(uv_from_st(np.float64(cj * scale))),
                  float(uv_from_st(np.float64((cj + 1) * scale))))
        g_lo, g_hi, la_lo, la_hi = _cell_rect_bound(face, u0, u1, v0, v1)
        pad = 1e-12
        inter, within = rect_vs_poly((g_lo - pad) * rmm, (g_hi + pad) * rmm,
                                     merc_y(la_lo - pad), merc_y(la_hi + pad))
        if not inter:
            continue
        if lvl == max_level or (adaptive and within):
            out.append((face, lvl, ci, cj))
            if len(out) > max_cells:
                raise ValueError(
                    f"s2 polygon cover exceeds {max_cells} cells at level "
                    f"{max_level}; choose a coarser level")
            continue
        for di in (0, 1):
            for dj in (0, 1):
                stack.append((face, lvl + 1, ci * 2 + di, cj * 2 + dj))
    if not out:
        return np.zeros(0, dtype=np.int64)
    faces = np.array([f for f, _, _, _ in out], dtype=np.int64)
    lvls = np.array([l for _, l, _, _ in out], dtype=np.int64)
    ii = np.array([i << (MAX_LEVEL - l) for _, l, i, _ in out], dtype=np.int64)
    jj = np.array([j << (MAX_LEVEL - l) for _, l, _, j in out], dtype=np.int64)
    leaf = cellid_from_face_ij(faces, ii, jj)
    lsb = np.uint64(1) << (np.uint64(2)
                           * (np.uint64(MAX_LEVEL) - lvls.astype(np.uint64)))
    ids = (leaf & ((~lsb) + np.uint64(1))) | lsb
    return ids.view(np.int64)


# ---------------------------------------------------------------------------
# DuckDB oracle generator — the independent cross-engine implementation
# ---------------------------------------------------------------------------

def s2_cell_sql(level: int, src_sql: str,
                cols: str = "url", mx: str = "mx_mm", my: str = "my_mm") -> str:
    """SQL computing the signed level-`level` cell id for every row of
    `src_sql` (must expose `mx`/`my` integer-mm columns), as `cell` plus the
    pass-through `cols`.  Independent of the numpy fast path: projection in
    plain SQL expressions, then `level` chained-CTE steps of the 2-bit
    Hilbert walk with the orientation algebra inlined as CASEs."""
    n = 1 << level
    steps = []
    for k in range(level):
        bit = 1 << (level - 1 - k)
        prev = f"w{k - 1}" if k else "ij"
        steps.append(f"""w{k} AS (
  SELECT {cols}, face, i, j,
    pos * 4 + q AS pos,
    xor(o, CASE q WHEN 0 THEN 1 WHEN 3 THEN 3 ELSE 0 END) AS o
  FROM (
    SELECT {cols}, face, i, j, pos, o,
      CASE o
        WHEN 0 THEN CASE ij2 WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 3 ELSE 2 END
        WHEN 1 THEN CASE ij2 WHEN 0 THEN 0 WHEN 1 THEN 3 WHEN 2 THEN 1 ELSE 2 END
        WHEN 2 THEN CASE ij2 WHEN 0 THEN 2 WHEN 1 THEN 3 WHEN 2 THEN 1 ELSE 0 END
        ELSE        CASE ij2 WHEN 0 THEN 2 WHEN 1 THEN 1 WHEN 2 THEN 3 ELSE 0 END
      END AS q
    FROM (SELECT {cols}, face, i, j, pos, o,
                 ((i // {bit}) % 2) * 2 + ((j // {bit}) % 2) AS ij2
          FROM {prev})
  )
)""")
    shift = 2 * (MAX_LEVEL - level)
    last = f"w{level - 1}"
    return f"""WITH pts AS (
  SELECT {cols}, {mx} / 1000.0 / {EARTH_RADIUS_M!r} AS lon,
         {my} / 1000.0 / {EARTH_RADIUS_M!r} AS qq
  FROM {src_sql} s2src
), xyz AS (
  SELECT {cols}, cos(lon) AS px, sin(lon) AS py,
         (exp(qq) - exp(-qq)) * 0.5 AS pz
  FROM pts
), fc AS (
  SELECT {cols}, px, py, pz,
    CASE WHEN abs(px) > abs(py)
         THEN CASE WHEN abs(px) > abs(pz)
                   THEN CASE WHEN px > 0 THEN 0 ELSE 3 END
                   ELSE CASE WHEN pz > 0 THEN 2 ELSE 5 END END
         ELSE CASE WHEN abs(py) > abs(pz)
                   THEN CASE WHEN py > 0 THEN 1 ELSE 4 END
                   ELSE CASE WHEN pz > 0 THEN 2 ELSE 5 END END
    END AS face
  FROM xyz
), fuv AS (
  SELECT {cols}, face,
    CASE face WHEN 0 THEN py/px WHEN 1 THEN -px/py WHEN 2 THEN -px/pz
              WHEN 3 THEN pz/px WHEN 4 THEN pz/py ELSE -py/pz END AS u,
    CASE face WHEN 0 THEN pz/px WHEN 1 THEN pz/py WHEN 2 THEN -py/pz
              WHEN 3 THEN py/px WHEN 4 THEN -px/py ELSE -px/pz END AS v
  FROM fc
), st AS (
  SELECT {cols}, face,
    CASE WHEN u >= 0 THEN 0.5 * sqrt(1 + 3*u) ELSE 1 - 0.5 * sqrt(1 - 3*u) END AS s,
    CASE WHEN v >= 0 THEN 0.5 * sqrt(1 + 3*v) ELSE 1 - 0.5 * sqrt(1 - 3*v) END AS t
  FROM fuv
), ij AS (
  SELECT {cols}, i, j, face % 2 AS o, 0 AS pos, face
  FROM (SELECT {cols}, face,
               least(greatest(CAST(floor(s * {n}) AS BIGINT), 0), {n - 1}) AS i,
               least(greatest(CAST(floor(t * {n}) AS BIGINT), 0), {n - 1}) AS j
        FROM st)
),
{",".join(steps)}
SELECT {cols},
  CASE WHEN hid >= 9223372036854775808
       THEN hid - 18446744073709551616 ELSE hid END::BIGINT AS cell
FROM (SELECT {cols},
             CAST(face AS HUGEINT) * {1 << 61}
             + CAST(pos AS HUGEINT) * {1 << (shift + 1)} + {1 << shift} AS hid
      FROM {last})
"""
