"""Raster leg: render a vector tile to an RGBA PNG.

Reference: /root/reference/src/render_vector_tile.cpp:63-97 (per style
layer, decode tile geometries and rasterize), pinned by the two pixel tests
in /root/reference/test/render_vector_tile.cpp:23-40 (empty tile → every
pixel = background colour) and :42-110 (single full-cover polygon → every
pixel = fill colour).

Mapnik's AGG renderer is not available here; this is a from-scratch numpy
scanline rasterizer (even-odd rule, pixel centers) plus a hand-rolled PNG
encoder (zlib is stdlib). Styling is a {layer_name: fill_rgba} dict — the
render-time layer↔tile-layer name join of the reference (J5,
render_vector_tile.cpp:33-56).

Spark surface: `render_tiles` maps (z, x, y, tile_pbf) → (z, x, y, png)
via an Arrow-batched UDF; each tile rasterizes independently (the same
per-tile parallelism as the reference's raster export loop).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from ..functions import mvt


# ---------------------------------------------------------------------------
# PNG encoder (RGBA8, no external deps)
# ---------------------------------------------------------------------------

def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def png_encode(rgba: np.ndarray) -> bytes:
    """(h, w, 4) uint8 → PNG bytes (filter 0 rows, zlib level 6)."""
    h, w = rgba.shape[:2]
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(h))
    return (b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0))
            + _chunk(b"IDAT", zlib.compress(raw, 6))
            + _chunk(b"IEND", b""))


def png_decode_size(data: bytes) -> tuple[int, int]:
    w, h = struct.unpack(">II", data[16:24])
    return w, h


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def png_decode(data: bytes) -> np.ndarray:
    """Pure-numpy PNG decoder — the matching half of png_encode: 8-bit
    depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA), all
    five scanline filters (None/Sub/Up/Average/Paeth), no interlace.
    Returns (h, w, channels) uint8. Sub is a per-channel cumulative sum
    mod 256 (vectorized); Average/Paeth walk pixels with the channel axis
    vectorized."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    pos = 8
    idat = []
    w = h = channels = None
    while pos + 8 <= len(data):
        ln = struct.unpack(">I", data[pos:pos + 4])[0]
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, inter = struct.unpack(
                ">IIBBBBB", payload)
            if depth != 8 or inter != 0:
                raise NotImplementedError(
                    "png_decode supports 8-bit non-interlaced PNGs")
            channels = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT size mismatch")
    out = np.empty((h, w, channels), dtype=np.uint8)
    prev = np.zeros((w, channels), dtype=np.uint8)
    for y in range(h):
        off = y * (stride + 1)
        f = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride,
                             offset=off + 1).reshape(w, channels)
        if f == 0:            # None
            cur = line.copy()
        elif f == 1:          # Sub: recon = prefix-sum per channel mod 256
            cur = np.cumsum(line, axis=0, dtype=np.uint64).astype(np.uint8)
        elif f == 2:          # Up (uint8 addition wraps mod 256)
            cur = line + prev
        elif f == 3:          # Average (sequential in x, vector in channel)
            cur = np.empty_like(line)
            left = np.zeros(channels, dtype=np.uint16)
            for x in range(w):
                cur[x] = line[x] + ((left + prev[x]) >> 1).astype(np.uint8)
                left = cur[x].astype(np.uint16)
        elif f == 4:          # Paeth
            cur = np.empty_like(line)
            left = np.zeros(channels, dtype=np.int16)
            ul = np.zeros(channels, dtype=np.int16)
            for x in range(w):
                up = prev[x].astype(np.int16)
                p = left + up - ul
                pa, pb, pc = (np.abs(p - left), np.abs(p - up),
                              np.abs(p - ul))
                pred = np.where((pa <= pb) & (pa <= pc), left,
                                np.where(pb <= pc, up, ul))
                cur[x] = line[x] + pred.astype(np.uint8)
                left = cur[x].astype(np.int16)
                ul = up
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = cur
        prev = cur
    return out


# ---------------------------------------------------------------------------
# scanline polygon fill (even-odd, pixel centers)
# ---------------------------------------------------------------------------

def fill_polygon(img: np.ndarray, rings: list[np.ndarray], rgba) -> None:
    """Fill polygon (rings in pixel coords, y down) into img (h, w, 4)."""
    h, w = img.shape[:2]
    edges = []
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        if len(r) < 3:
            continue
        if not np.array_equal(r[0], r[-1]):
            r = np.vstack([r, r[:1]])
        edges.append((r[:-1], r[1:]))
    if not edges:
        return
    a = np.vstack([e[0] for e in edges])
    b = np.vstack([e[1] for e in edges])
    ys = np.arange(h) + 0.5
    y0 = np.minimum(a[:, 1], b[:, 1])
    y1 = np.maximum(a[:, 1], b[:, 1])
    for yi, y in enumerate(ys):
        m = (y0 <= y) & (y < y1)
        if not m.any():
            continue
        aa, bb = a[m], b[m]
        t = (y - aa[:, 1]) / (bb[:, 1] - aa[:, 1])
        xs = np.sort(aa[:, 0] + t * (bb[:, 0] - aa[:, 0]))
        for i in range(0, len(xs) - 1, 2):
            x0 = int(np.ceil(xs[i] - 0.5))
            x1 = int(np.floor(xs[i + 1] - 0.5))
            if x1 >= x0:
                img[yi, max(x0, 0):min(x1 + 1, w)] = rgba


def draw_line(img: np.ndarray, pts: np.ndarray, rgba) -> None:
    """1px line stroke (sampled)."""
    h, w = img.shape[:2]
    for i in range(len(pts) - 1):
        p, q = pts[i], pts[i + 1]
        n = int(max(abs(q[0] - p[0]), abs(q[1] - p[1]))) + 1
        t = np.linspace(0, 1, n + 1)
        xs = np.clip((p[0] + t * (q[0] - p[0])).astype(int), 0, w - 1)
        ys = np.clip((p[1] + t * (q[1] - p[1])).astype(int), 0, h - 1)
        img[ys, xs] = rgba


# ---------------------------------------------------------------------------
# tile renderer
# ---------------------------------------------------------------------------

def render_tile(tile_bytes: bytes | None, styles: dict[str, tuple],
                background: tuple = (0x8C, 0xC6, 0x3F, 0xFF),
                tile_size: int = 256) -> np.ndarray:
    """Decode an MVT tile and rasterize styled layers over a background.

    styles: {layer_name: (r, g, b, a)} — only named layers render
    (the J5 name join). Unstyled layers are skipped, like style-less
    Mapnik layers."""
    img = np.empty((tile_size, tile_size, 4), dtype=np.uint8)
    img[:, :] = background
    if not tile_bytes:
        return img
    tile = mvt.decode_tile(bytes(tile_bytes))
    for layer in tile.layers:
        style = styles.get(layer.name)
        if style is None:
            continue
        scale = tile_size / float(layer.extent)
        for feat in layer.features:
            paths = mvt.decode_geometry(feat.geometry, feat.type)
            px = [(np.column_stack([xs, ys]) * scale) for xs, ys in paths]
            if feat.type == mvt.GEOM_POLYGON:
                fill_polygon(img, px, style)
            elif feat.type == mvt.GEOM_LINESTRING:
                for p in px:
                    draw_line(img, p, style)
            else:
                for p in px:
                    ip = np.clip(p.astype(int), 0, tile_size - 1)
                    img[ip[:, 1], ip[:, 0]] = style
    return img


def render_tile_png(tile_bytes: bytes | None, styles: dict[str, tuple],
                    background: tuple = (0x8C, 0xC6, 0x3F, 0xFF),
                    tile_size: int = 256) -> bytes:
    return png_encode(render_tile(tile_bytes, styles, background, tile_size))


def render_tiles(df, styles: dict[str, tuple],
                 background: tuple = (0x8C, 0xC6, 0x3F, 0xFF),
                 tile_size: int = 256):
    """Spark surface: (z, x, y, tile_pbf, ...) → (z, x, y, png binary)."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            out = pd.DataFrame({
                "z": pdf["z"], "x": pdf["x"], "y": pdf["y"],
                "png": [render_tile_png(b, styles, background, tile_size)
                        for b in pdf["tile_pbf"]],
            })
            yield out

    return df.select("z", "x", "y", "tile_pbf").mapInPandas(
        run, schema="z int, x long, y long, png binary")
