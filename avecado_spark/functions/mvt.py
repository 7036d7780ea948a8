"""Mapbox-Vector-Tile wire codec, hand-rolled (no protobuf dependency).

Implements exactly the observable encoding the reference produces through
its mapnik-vector-tile submodule, as pinned by the reference's own tests:

  - command stream ints: cmd = entry & 7, repeat = entry >> 3;
    1=MoveTo, 2=LineTo, 7=ClosePath; zigzag deltas
    (decode loop: /root/reference/src/util_tile.cpp:60-92;
     golden integers: /root/reference/test/multi_verification.cpp:75-81
     multiline [9,...,10,...,9,...,10,...] size 12, and :128-144
     multipolygon [9,_,_,26,...,15, 9,_,_,42,...,15, 9,_,_,26,...,15]
     size 37, type 3)
  - layer fields name/extent/version (extent 4096, version 1 asserted at
    /root/reference/test/util_tile.cpp:26-30)
  - gzip framing of the serialized tile
    (/root/reference/src/tile.cpp:49-72); mtime pinned to 0 here so tile
    bytes are deterministic across runs.

Protobuf schema (Mapnik vector tile spec v1):
  Tile:    repeated Layer layers = 3
  Layer:   name=1 string, features=2 msg, keys=3 string, values=4 msg,
           extent=5 uint32, version=15 uint32
  Feature: id=1 uint64, tags=2 packed uint32, type=3 enum
           (1=POINT 2=LINESTRING 3=POLYGON), geometry=4 packed uint32
  Value:   string=1, float=2, double=3, int=4, uint=5, sint=6, bool=7

Pure-python byte assembly is only ever invoked once per feature/layer —
the per-vertex work (deltas, zigzag, thinning) is numpy-vectorized.
"""

from __future__ import annotations

import gzip
import struct
from dataclasses import dataclass, field

import numpy as np

CMD_MOVE_TO = 1
CMD_LINE_TO = 2
CMD_CLOSE = 7

GEOM_POINT = 1
GEOM_LINESTRING = 2
GEOM_POLYGON = 3

DEFAULT_EXTENT = 4096  # 256 px * path_multiplier 16
MVT_VERSION = 1


# ---------------------------------------------------------------------------
# varint / wire primitives
# ---------------------------------------------------------------------------

def _varint(value: int) -> bytes:
    out = bytearray()
    v = value & 0xFFFFFFFFFFFFFFFF
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field_num: int, wire_type: int) -> bytes:
    return _varint((field_num << 3) | wire_type)


def _len_delim(field_num: int, payload: bytes) -> bytes:
    return _tag(field_num, 2) + _varint(len(payload)) + payload


def _varint_field(field_num: int, value: int) -> bytes:
    return _tag(field_num, 0) + _varint(value)


def _packed_uint32(field_num: int, values) -> bytes:
    payload = b"".join(_varint(int(v)) for v in values)
    return _len_delim(field_num, payload)


def read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


# ---------------------------------------------------------------------------
# geometry command stream (numpy-vectorized)
# ---------------------------------------------------------------------------

def thin_points(xs: np.ndarray, ys: np.ndarray, tolerance: int) -> tuple[np.ndarray, np.ndarray]:
    """Sequential tolerance thinning: drop a vertex when BOTH |dx| and |dy|
    to the last *kept* vertex are strictly LESS than the tolerance (a vertex
    survives when either delta >= tolerance — mapnik-vector-tile behavior;
    reference doc: include/avecado.hpp:51-55 'tolerance in both the x and y
    directions'). First and last vertices always survive."""
    n = len(xs)
    if n <= 2 or tolerance <= 0:
        return xs, ys
    keep = np.zeros(n, dtype=bool)
    keep[0] = True
    last = 0
    for i in range(1, n - 1):
        if abs(int(xs[i]) - int(xs[last])) >= tolerance or abs(int(ys[i]) - int(ys[last])) >= tolerance:
            keep[i] = True
            last = i
    keep[n - 1] = True
    return xs[keep], ys[keep]


def encode_geometry(paths: list[tuple[np.ndarray, np.ndarray]],
                    geom_type: int,
                    start_x: int = 0,
                    start_y: int = 0,
                    tolerance: int = 0) -> list[int]:
    """Paths (already in integer tile-local units) → MVT command ints.

    Multi-geometries are encoded as repeated MoveTo runs in one stream
    (golden pattern in test/multi_verification.cpp). Polygon rings keep
    their explicit closing duplicate vertex as a LineTo before ClosePath
    and are NOT tolerance-thinned — both behaviors pinned by the goldens:
    single_poly_json repeats the first point twice at ring end
    (test/make_vector_tile.cpp:57) and the multipolygon stream keeps a
    zero-delta LineTo (test/multi_verification.cpp:137 expects 42 = five
    LineTos for a 6-coord ring whose first two points quantize equal).
    Cursor (start_x/start_y) is carried across paths.
    """
    cmds: list[int] = []
    cx, cy = int(start_x), int(start_y)
    for xs, ys in paths:
        xs = np.asarray(xs, dtype=np.int64)
        ys = np.asarray(ys, dtype=np.int64)
        if geom_type == GEOM_LINESTRING and tolerance > 0:
            xs, ys = thin_points(xs, ys, tolerance)
        n = len(xs)
        if n == 0:
            continue
        # deltas relative to cursor
        dx = np.diff(xs, prepend=cx)
        dy = np.diff(ys, prepend=cy)
        zx = ((dx << 1) ^ (dx >> 63)).astype(np.uint64)
        zy = ((dy << 1) ^ (dy >> 63)).astype(np.uint64)
        if geom_type == GEOM_POINT:
            cmds.append((n << 3) | CMD_MOVE_TO)
            for i in range(n):
                cmds.append(int(zx[i]))
                cmds.append(int(zy[i]))
        else:
            cmds.append((1 << 3) | CMD_MOVE_TO)
            cmds.append(int(zx[0]))
            cmds.append(int(zy[0]))
            if n > 1:
                cmds.append(((n - 1) << 3) | CMD_LINE_TO)
                for i in range(1, n):
                    cmds.append(int(zx[i]))
                    cmds.append(int(zy[i]))
            if geom_type == GEOM_POLYGON:
                cmds.append((1 << 3) | CMD_CLOSE)
        cx, cy = int(xs[-1]), int(ys[-1])
    return cmds


def decode_geometry(cmds, geom_type: int | None = None):
    """Command ints → list of paths [(xs, ys)] with absolute int coords.
    Mirrors the reference decode loop src/util_tile.cpp:60-92."""
    paths: list[tuple[list[int], list[int]]] = []
    x = y = 0
    i = 0
    n = len(cmds)
    cur_x: list[int] = []
    cur_y: list[int] = []
    while i < n:
        entry = int(cmds[i]); i += 1
        cmd = entry & 7
        repeat = entry >> 3
        if cmd == CMD_MOVE_TO:
            for _ in range(repeat):
                if cur_x and geom_type != GEOM_POINT:
                    paths.append((cur_x, cur_y))
                    cur_x, cur_y = [], []
                dx = int(cmds[i]); dy = int(cmds[i + 1]); i += 2
                x += (dx >> 1) ^ (-(dx & 1))
                y += (dy >> 1) ^ (-(dy & 1))
                cur_x.append(x); cur_y.append(y)
        elif cmd == CMD_LINE_TO:
            for _ in range(repeat):
                dx = int(cmds[i]); dy = int(cmds[i + 1]); i += 2
                x += (dx >> 1) ^ (-(dx & 1))
                y += (dy >> 1) ^ (-(dy & 1))
                cur_x.append(x); cur_y.append(y)
        elif cmd == CMD_CLOSE:
            if cur_x:
                cur_x.append(cur_x[0]); cur_y.append(cur_y[0])
                paths.append((cur_x, cur_y))
                cur_x, cur_y = [], []
    if cur_x:
        paths.append((cur_x, cur_y))
    return [(np.asarray(xs, dtype=np.int64), np.asarray(ys, dtype=np.int64)) for xs, ys in paths]


# ---------------------------------------------------------------------------
# tile model + protobuf encode/decode
# ---------------------------------------------------------------------------

@dataclass
class MvtFeature:
    id: int
    type: int
    geometry: list[int]
    tags: list[int] = field(default_factory=list)  # interleaved key/value indexes


@dataclass
class MvtLayer:
    name: str
    features: list[MvtFeature] = field(default_factory=list)
    keys: list[str] = field(default_factory=list)
    values: list = field(default_factory=list)  # python str/int/float/bool
    extent: int = DEFAULT_EXTENT
    version: int = MVT_VERSION


@dataclass
class MvtTile:
    layers: list[MvtLayer] = field(default_factory=list)


def _encode_value(v) -> bytes:
    if isinstance(v, bool):
        return _varint_field(7, 1 if v else 0)
    if isinstance(v, int):
        return _varint_field(4, v & 0xFFFFFFFFFFFFFFFF)
    if isinstance(v, float):
        return _tag(3, 1) + struct.pack("<d", v)
    return _len_delim(1, str(v).encode("utf-8"))


def _decode_value(buf: bytes):
    pos = 0
    while pos < len(buf):
        key, pos = read_varint(buf, pos)
        fn, wt = key >> 3, key & 7
        if fn == 1 and wt == 2:
            ln, pos = read_varint(buf, pos)
            return buf[pos:pos + ln].decode("utf-8")
        if fn == 3 and wt == 1:
            return struct.unpack("<d", buf[pos:pos + 8])[0]
        if fn == 2 and wt == 5:
            return struct.unpack("<f", buf[pos:pos + 4])[0]
        if fn in (4, 5) and wt == 0:
            v, pos = read_varint(buf, pos)
            if v >= 1 << 63:
                v -= 1 << 64
            return v
        if fn == 6 and wt == 0:
            v, pos = read_varint(buf, pos)
            return (v >> 1) ^ (-(v & 1))
        if fn == 7 and wt == 0:
            v, pos = read_varint(buf, pos)
            return bool(v)
        pos = _skip(buf, pos, wt)
    return None


def _encode_feature(f: MvtFeature) -> bytes:
    out = bytearray()
    out += _varint_field(1, f.id)
    if f.tags:
        out += _packed_uint32(2, f.tags)
    out += _varint_field(3, f.type)
    out += _packed_uint32(4, f.geometry)
    return bytes(out)


def encode_layer(layer: MvtLayer) -> bytes:
    out = bytearray()
    out += _len_delim(1, layer.name.encode("utf-8"))
    for f in layer.features:
        out += _len_delim(2, _encode_feature(f))
    for k in layer.keys:
        out += _len_delim(3, k.encode("utf-8"))
    for v in layer.values:
        out += _len_delim(4, _encode_value(v))
    out += _varint_field(5, layer.extent)
    out += _varint_field(15, layer.version)
    return bytes(out)


def encode_tile(tile: MvtTile) -> bytes:
    return b"".join(_len_delim(3, encode_layer(l)) for l in tile.layers)


def gzip_bytes(data: bytes, level: int = 9) -> bytes:
    """Deterministic gzip framing tuned for tiny tiles: window and memLevel
    sized to the payload (a full 32 KiB window costs ~50 µs of zeroing per
    call — 6× the deflate work for a 100-byte tile). Output is standard
    gzip (decoders ignore the declared window size); mtime is always 0."""
    import zlib
    n = max(len(data), 1)
    wbits = 16 + min(15, max(9, n.bit_length()))
    mem_level = min(8, max(1, n.bit_length() - 7))
    co = zlib.compressobj(level, zlib.DEFLATED, wbits, mem_level)
    return co.compress(data) + co.flush()


def tile_to_gzip(tile: MvtTile, compression_level: int = 6) -> bytes:
    """Gzip framing per reference src/tile.cpp:49-72 (GZIP format).
    compression_level 0 → raw protobuf (same switch as the reference).
    mtime=0 for deterministic bytes."""
    data = encode_tile(tile)
    if compression_level == 0:
        return data
    return gzip_bytes(data, compression_level)


def _skip(buf: bytes, pos: int, wire_type: int) -> int:
    if wire_type == 0:
        _, pos = read_varint(buf, pos)
    elif wire_type == 1:
        pos += 8
    elif wire_type == 2:
        ln, pos = read_varint(buf, pos)
        pos += ln
    elif wire_type == 5:
        pos += 4
    return pos


def _decode_packed(buf: bytes) -> list[int]:
    vals = []
    pos = 0
    while pos < len(buf):
        v, pos = read_varint(buf, pos)
        vals.append(v)
    return vals


def _decode_feature(buf: bytes) -> MvtFeature:
    f = MvtFeature(id=0, type=0, geometry=[])
    pos = 0
    while pos < len(buf):
        key, pos = read_varint(buf, pos)
        fn, wt = key >> 3, key & 7
        if fn == 1 and wt == 0:
            f.id, pos = read_varint(buf, pos)
        elif fn == 2 and wt == 2:
            ln, pos = read_varint(buf, pos)
            f.tags = _decode_packed(buf[pos:pos + ln]); pos += ln
        elif fn == 3 and wt == 0:
            f.type, pos = read_varint(buf, pos)
        elif fn == 4 and wt == 2:
            ln, pos = read_varint(buf, pos)
            f.geometry = _decode_packed(buf[pos:pos + ln]); pos += ln
        else:
            pos = _skip(buf, pos, wt)
    return f


def decode_layer(buf: bytes) -> MvtLayer:
    layer = MvtLayer(name="")
    pos = 0
    while pos < len(buf):
        key, pos = read_varint(buf, pos)
        fn, wt = key >> 3, key & 7
        if fn == 1 and wt == 2:
            ln, pos = read_varint(buf, pos)
            layer.name = buf[pos:pos + ln].decode("utf-8"); pos += ln
        elif fn == 2 and wt == 2:
            ln, pos = read_varint(buf, pos)
            layer.features.append(_decode_feature(buf[pos:pos + ln])); pos += ln
        elif fn == 3 and wt == 2:
            ln, pos = read_varint(buf, pos)
            layer.keys.append(buf[pos:pos + ln].decode("utf-8")); pos += ln
        elif fn == 4 and wt == 2:
            ln, pos = read_varint(buf, pos)
            layer.values.append(_decode_value(buf[pos:pos + ln])); pos += ln
        elif fn == 5 and wt == 0:
            layer.extent, pos = read_varint(buf, pos)
        elif fn == 15 and wt == 0:
            layer.version, pos = read_varint(buf, pos)
        else:
            pos = _skip(buf, pos, wt)
    return layer


def decode_tile(buf: bytes) -> MvtTile:
    if buf[:2] == b"\x1f\x8b":  # gzip sniffing, reference src/tilejson.cpp:83-96
        buf = gzip.decompress(buf)
    tile = MvtTile()
    pos = 0
    while pos < len(buf):
        key, pos = read_varint(buf, pos)
        fn, wt = key >> 3, key & 7
        if fn == 3 and wt == 2:
            ln, pos = read_varint(buf, pos)
            tile.layers.append(decode_layer(buf[pos:pos + ln])); pos += ln
        else:
            pos = _skip(buf, pos, wt)
    return tile


# ---------------------------------------------------------------------------
# interestingness classifier (reference src/util_tile.cpp:44-105)
# ---------------------------------------------------------------------------

class _MinMax:
    """Two-register distinct-coordinate tracker (util_tile.cpp:8-40)."""

    __slots__ = ("count", "overflow", "coords")

    def __init__(self):
        self.count = 0
        self.overflow = False
        self.coords = [0, 0]

    def add(self, v: int):
        for i in range(self.count):
            if self.coords[i] == v:
                return
        if self.count < 2:
            self.coords[self.count] = v
            self.count += 1
        else:
            self.overflow = True

    def inside(self, extent: int) -> bool:
        return any(0 < self.coords[i] < extent for i in range(self.count))


def is_interesting(layer: MvtLayer) -> bool:
    """Exact port of the classifier semantics at util_tile.cpp:44-105:
    a layer is uninteresting iff empty, or a single feature whose decoded
    geometry has ≤2 distinct x and ≤2 distinct y, all outside (0, extent)."""
    if not layer.features:
        return False
    if len(layer.features) > 1:
        return True
    f = layer.features[0]
    extent = layer.extent
    xm, ym = _MinMax(), _MinMax()
    x = y = 0
    i = 0
    g = f.geometry
    repeat = cmd = 0
    while i < len(g):
        if repeat == 0:
            entry = g[i]; i += 1
            cmd = entry & 7
            repeat = entry >> 3
        else:
            if cmd in (1, 2):
                dx = g[i]; dy = g[i + 1]; i += 2
                x += (dx >> 1) ^ (-(dx & 1))
                y += (dy >> 1) ^ (-(dy & 1))
                xm.add(x)
                ym.add(y)
            repeat -= 1
    if xm.overflow or ym.overflow:
        return True
    return xm.inside(extent) or ym.inside(extent)
