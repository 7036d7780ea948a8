"""Baseline JPEG codec in pure numpy — no PIL/libjpeg in this container.

Decoder (`jpeg_decode`): baseline sequential DCT (SOF0) AND progressive
(SOF2) — together the formats of essentially all web JPEGs. Handles
DQT/DHT/SOF/SOS/DRI/APPn/COM marker parsing, Huffman entropy decode with
byte-stuffing and restart markers, dequantize → inverse zigzag → 8x8
IDCT (separable orthonormal DCT-III as two matrix multiplies), chroma
upsampling for any (h,v) sampling factors in {1,2} (4:4:4, 4:2:2,
4:2:0), and JFIF YCbCr → RGB. Progressive scans accumulate coefficients
(interleaved/non-interleaved DC first + refinement, per-band AC first +
refinement with EOB runs and correction bits — T.81 G.1.2/G.2).
Lossless/hierarchical (SOF3+), arithmetic coding, and 12-bit precision
raise NotImplementedError — honest scope boundaries, sniffed up front.

Encoders: `jpeg_encode` (baseline: quality-scaled Annex-K quantization
tables, the spec's canonical Huffman tables, 4:4:4/4:2:2/4:2:0 /
grayscale, optional restart markers) and `jpeg_encode_progressive`
(SOF2 with all four scan kinds, custom per-scan AC tables carrying the
EOBn symbols Annex-K lacks) — round-trip fixtures and genuinely standard
output; for one image the two decode bit-identically.

All tables are the public constants of ITU-T T.81 Annex K.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# public spec constants (ITU-T T.81)
# --------------------------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int32)
UNZIGZAG = np.argsort(ZIGZAG)

QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64).reshape(8, 8)

QUANT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64).reshape(8, 8)

DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))

AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]

AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]

# orthonormal 8-point DCT basis: A[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
_A = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _fdct(block: np.ndarray) -> np.ndarray:
    return _A @ block @ _A.T


def _idct(coeff: np.ndarray) -> np.ndarray:
    return _A.T @ coeff @ _A


# --------------------------------------------------------------------------
# canonical Huffman code construction (T.81 C.2)
# --------------------------------------------------------------------------

def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value → (code, length)."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → value."""
    return {(ln, c): v for v, (c, ln) in _build_codes(bits, vals).items()}


class _BitReader:
    """MSB-first reader over an entropy-coded segment. The caller hands it
    raw scan bytes; 0xFF 0x00 stuffing is removed here, and a 0xFF
    followed by a marker ends the stream (the main loop handles RSTn)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                # marker: feed 0 padding (T.81 F.2.2.5 allows 1-fill; a
                # well-formed stream never reads past the pad)
                self.acc = (self.acc << 8)
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self):
        self.acc = 0
        self.nbits = 0

    def at_marker(self) -> int | None:
        """If (byte-aligned) the next bytes are a marker, return it."""
        d = self.data
        if self.pos + 1 < len(d) and d[self.pos] == 0xFF and d[self.pos + 1] != 0x00:
            return d[self.pos + 1]
        return None


def _extend(v: int, ssss: int) -> int:
    if ssss == 0:
        return 0
    if v < (1 << (ssss - 1)):
        return v - (1 << ssss) + 1
    return v


def _decode_huff(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.read_bit()
        v = table.get((ln, code))
        if v is not None:
            return v
    raise ValueError("invalid Huffman code in JPEG stream")


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------

JPEG_MAGIC = b"\xff\xd8"


def jpeg_decode(data: bytes) -> np.ndarray:
    """Baseline JPEG → (h, w, channels) uint8 (1 for grayscale, 3 RGB)."""
    if data[:2] != JPEG_MAGIC:
        raise ValueError("not a JPEG")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    coeffs = None
    restart_interval = 0
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            continue
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[p:p + 64], dtype=np.uint8).astype(np.int64)
                    p += 64
                else:
                    tbl = np.frombuffer(seg[p:p + 128], dtype=">u2").astype(np.int64)
                    p += 128
                full = np.zeros(64, dtype=np.int64)
                full[ZIGZAG] = tbl
                qt[tq] = full.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17:p + 17 + nv])
                p += 17 + nv
                (huff_ac if tc else huff_dc)[th] = _build_decode(bits, vals)
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
            if marker == 0xC2:
                coeffs = _alloc_coeffs(frame)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF{marker - 0xC0}) not supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scomps = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                scomps.append((cs, tdta >> 4, tdta & 15))
            ss, se, ahal = seg[1 + 2 * ns:4 + 2 * ns]
            pos += seglen
            if frame is None:
                raise ValueError("SOS before SOF")
            if not frame["progressive"]:
                return _decode_scan(data, pos, frame, scomps, qt, huff_dc,
                                    huff_ac, restart_interval)
            pos = _decode_scan_progressive(
                data, pos, frame, coeffs, scomps, huff_dc, huff_ac,
                restart_interval, ss, se, ahal >> 4, ahal & 15)
            continue
        pos += seglen
    if frame is not None and frame.get("progressive"):
        return _reconstruct(frame, coeffs, qt)
    raise ValueError("no SOS marker found")


def _decode_scan(data, pos, frame, scomps, qt, huff_dc, huff_ac,
                 restart_interval):
    if frame is None:
        raise ValueError("SOS before SOF")
    if len(scomps) < len(frame["comps"]):
        # Spec-valid baseline JPEGs may split components across multiple
        # scans; this decoder returns after the first SOS, so a partial
        # first scan would silently decode only those components (e.g. a
        # per-component-scan YCbCr file coming back as the Y plane). Fail
        # loudly instead — honest scope boundary, same contract as SOF3+.
        raise NotImplementedError(
            f"multi-scan baseline JPEG: first scan covers {len(scomps)} of "
            f"{len(frame['comps'])} components")
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    by_id = {c["id"]: c for c in comps}
    order = []
    for cs, td, ta in scomps:
        c = by_id[cs]
        order.append((c, huff_dc[td], huff_ac[ta], qt[c["tq"]]))
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = []
    for c, _, _, _ in order:
        planes.append(np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8),
                               dtype=np.float64))
    br = _BitReader(data, pos)
    pred = [0] * len(order)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                br.align()
                m = br.at_marker()
                if m is not None and 0xD0 <= m <= 0xD7:
                    br.pos += 2
                pred = [0] * len(order)
            for ci, (c, dct, act, q) in enumerate(order):
                for vb in range(c["v"]):
                    for hb in range(c["h"]):
                        blk = _decode_block(br, dct, act, q, pred, ci)
                        y0 = (my * c["v"] + vb) * 8
                        x0 = (mx * c["h"] + hb) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = blk
            mcu_count += 1
    out_planes = []
    for ci, (c, _, _, _) in enumerate(order):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        y = np.clip(out_planes[0] + 128.0, 0, 255).astype(np.uint8)
        return y[:, :, None]
    y = out_planes[0] + 128.0
    cb = out_planes[1]
    cr = out_planes[2]
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


def _decode_block(br, dct, act, q, pred, ci):
    zz = np.zeros(64, dtype=np.int64)
    ssss = _decode_huff(br, dct)
    diff = _extend(br.read_bits(ssss), ssss)
    pred[ci] += diff
    zz[0] = pred[ci]
    k = 1
    while k < 64:
        rs = _decode_huff(br, act)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(br.read_bits(s), s)
        k += 1
    coeff = np.zeros(64, dtype=np.float64)
    coeff[ZIGZAG] = zz * q.reshape(-1)[ZIGZAG]
    return _idct(coeff.reshape(8, 8))


# --------------------------------------------------------------------------
# progressive decoding (SOF2): coefficients accumulate across scans —
# DC first/refine (successive approximation on coef 0), AC first/refine
# per spectral band with EOB runs (ITU-T T.81 G.1.2 / G.2)
# --------------------------------------------------------------------------

def _grids(frame):
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    w, h = frame["w"], frame["h"]
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    out = []
    for c in comps:
        cw = -(-(w * c["h"]) // hmax)       # component sample dims
        chh = -(-(h * c["v"]) // vmax)
        out.append({
            "bw_i": mcus_x * c["h"], "bh_i": mcus_y * c["v"],
            "bw_n": -(-cw // 8), "bh_n": -(-chh // 8),
            "cw": cw, "ch": chh,
        })
    return hmax, vmax, mcus_x, mcus_y, out


def _alloc_coeffs(frame):
    _, _, _, _, grids = _grids(frame)
    return [np.zeros((g["bh_i"], g["bw_i"], 64), dtype=np.int64)
            for g in grids]


def _decode_scan_progressive(data, pos, frame, coeffs, scomps, huff_dc,
                             huff_ac, restart_interval, ss, se, ah, al):
    comps = frame["comps"]
    by_id = {c["id"]: i for i, c in enumerate(comps)}
    _, _, mcus_x, mcus_y, grids = _grids(frame)
    order = []  # (comp_index, dc_table, ac_table)
    for cs, td, ta in scomps:
        ci = by_id[cs]
        order.append((ci,
                      huff_dc.get(td) if ss == 0 else None,
                      huff_ac.get(ta) if ss > 0 else None))
    br = _BitReader(data, pos)
    pred = [0] * len(order)
    state = {"eobrun": 0}

    def _restart(unit):
        if restart_interval and unit and unit % restart_interval == 0:
            br.align()
            m = br.at_marker()
            if m is not None and 0xD0 <= m <= 0xD7:
                br.pos += 2
            pred[:] = [0] * len(order)
            state["eobrun"] = 0

    if len(order) > 1:
        # interleaved scan (DC only — T.81 forbids interleaved AC scans)
        if ss != 0:
            raise ValueError("interleaved AC scan is not valid JPEG")
        unit = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                _restart(unit)
                unit += 1
                for oi, (ci, dct, _) in enumerate(order):
                    c = comps[ci]
                    for vb in range(c["v"]):
                        for hb in range(c["h"]):
                            blk = coeffs[ci][my * c["v"] + vb,
                                             mx * c["h"] + hb]
                            _dc_progressive(br, blk, dct, pred, oi, ah, al)
    else:
        # non-interleaved: one component, blocks in its own raster order
        ci, dct, act = order[0]
        g = grids[ci]
        unit = 0
        for by in range(g["bh_n"]):
            for bx in range(g["bw_n"]):
                _restart(unit)
                unit += 1
                blk = coeffs[ci][by, bx]
                if ss == 0:
                    _dc_progressive(br, blk, dct, pred, 0, ah, al)
                elif ah == 0:
                    state["eobrun"] = _ac_first(br, blk, act, ss, se, al,
                                                state["eobrun"])
                else:
                    state["eobrun"] = _ac_refine(br, blk, act, ss, se, al,
                                                 state["eobrun"])
    br.align()
    return br.pos


def _dc_progressive(br, blk, dct, pred, oi, ah, al):
    if ah == 0:  # first scan: full (point-transformed) DC value
        s = _decode_huff(br, dct)
        pred[oi] += _extend(br.read_bits(s), s)
        blk[0] = pred[oi] << al
    else:        # refinement: one bit of added precision (two's complement
        if br.read_bit():   # OR, exactly as the spec's decoder does)
            blk[0] = int(blk[0]) | (1 << al)


def _ac_first(br, blk, act, ss, se, al, eobrun):
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_huff(br, act)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:          # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.read_bits(r)
            break
        k += r
        if k > se:
            raise ValueError("AC run past spectral band")
        blk[ZIGZAG[k]] = _extend(br.read_bits(s), s) << al
        k += 1
    return eobrun


def _ac_refine(br, blk, act, ss, se, al, eobrun):
    """Refinement scan for one block (T.81 G.1.2.3 correction-bit flow)."""
    p1 = 1 << al
    k = ss

    def correct(kk):
        z = ZIGZAG[kk]
        if blk[z] != 0:
            if br.read_bit() and (int(blk[z]) & p1) == 0:
                blk[z] += p1 if blk[z] > 0 else -p1
            return True
        return False

    if eobrun == 0:
        while k <= se:
            rs = _decode_huff(br, act)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read_bits(r)
                    break
                val = 0          # ZRL: skip 16 zero-history coeffs
            else:
                if s != 1:
                    raise ValueError("refinement scan with s > 1")
                val = p1 if br.read_bit() else -p1
            while k <= se:
                if correct(k):
                    k += 1
                else:
                    if r == 0:
                        break
                    r -= 1
                    k += 1
            if k <= se and s:
                blk[ZIGZAG[k]] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct(frame, coeffs, qt):
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax, vmax, _, _, grids = _grids(frame)
    planes = []
    for ci, c in enumerate(comps):
        g = grids[ci]
        q = qt[c["tq"]]
        plane = np.empty((g["bh_i"] * 8, g["bw_i"] * 8))
        for by in range(g["bh_i"]):
            for bx in range(g["bw_i"]):
                dq = (coeffs[ci][by, bx].astype(np.float64)
                      * q.reshape(-1)).reshape(8, 8)
                plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = _idct(dq)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane[:g["ch"], :g["cw"]],
                                        ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(planes[0] + 128.0, 0, 255).astype(np.uint8)[:, :, None]
    y = planes[0] + 128.0
    cb, cr = planes[1], planes[2]
    r = y + 1.402 * cr
    g2 = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g2, b], axis=2), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill (T.81 F.1.2.3)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    ql = np.clip((QUANT_LUM * scale + 50) // 100, 1, 255)
    qc = np.clip((QUANT_CHROM * scale + 50) // 100, 1, 255)
    return ql, qc


def _ssss(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_block(bw, block, q, pred, ci, dc_codes, ac_codes):
    coeff = np.round(_fdct(block) / q).astype(np.int64)
    zz = coeff.reshape(-1)[ZIGZAG]
    diff = int(zz[0]) - pred[ci]
    pred[ci] = int(zz[0])
    s = _ssss(diff)
    c, ln = dc_codes[s]
    bw.write(c, ln)
    if s:
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = np.flatnonzero(zz[1:])
    end = (last_nz[-1] + 2) if len(last_nz) else 1
    for k in range(1, end):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]
            bw.write(c, ln)
            run -= 16
        s = _ssss(v)
        c, ln = ac_codes[(run << 4) | s]
        bw.write(c, ln)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if end < 64:
        c, ln = ac_codes[0x00]
        bw.write(c, ln)


def _quantized_blocks(img, quality, subsampling):
    """Shared front half of both encoders: color transform, subsample,
    pad, FDCT, quantize. Returns (frame_info, per-component block arrays
    of NATURAL-order int64 coefficients, quant tables, samp, gray)."""
    img = np.asarray(img)
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[:, :, 0]
    gray = img.ndim == 2
    h, w = img.shape[:2]
    ql, qc = _quality_tables(quality)
    if gray:
        planes = [img.astype(np.float64) - 128.0]
        samp = [(1, 1)]
        qmap = [0]
    else:
        f = img.astype(np.float64)
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsampling == "420":
            cbp = _pad_to(cb, 2, 2)
            crp = _pad_to(cr, 2, 2)
            cb = (cbp[0::2, 0::2] + cbp[0::2, 1::2]
                  + cbp[1::2, 0::2] + cbp[1::2, 1::2]) / 4.0
            cr = (crp[0::2, 0::2] + crp[0::2, 1::2]
                  + crp[1::2, 0::2] + crp[1::2, 1::2]) / 4.0
            samp = [(2, 2), (1, 1), (1, 1)]
        elif subsampling == "422":
            cbp = _pad_to(cb, 1, 2)
            crp = _pad_to(cr, 1, 2)
            cb = (cbp[:, 0::2] + cbp[:, 1::2]) / 2.0
            cr = (crp[:, 0::2] + crp[:, 1::2]) / 2.0
            samp = [(2, 1), (1, 1), (1, 1)]
        elif subsampling == "444":
            samp = [(1, 1), (1, 1), (1, 1)]
        else:
            raise ValueError("subsampling must be '444', '422' or '420'")
        planes = [y, cb, cr]
        qmap = [0, 1, 1]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    qts = [ql, qc]
    blocks = []
    for p, (sh, sv), qi in zip(planes, samp, qmap):
        pp = np.pad(p, ((0, mcus_y * sv * 8 - p.shape[0]),
                        (0, mcus_x * sh * 8 - p.shape[1])), mode="edge")
        bh, bw_ = mcus_y * sv, mcus_x * sh
        arr = np.empty((bh, bw_, 64), dtype=np.int64)
        q = qts[qi]
        for by in range(bh):
            for bx in range(bw_):
                blkc = np.round(
                    _fdct(pp[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]) / q)
                arr[by, bx] = blkc.astype(np.int64).reshape(-1)
        blocks.append(arr)
    return (h, w, mcus_x, mcus_y), blocks, (ql, qc), samp, qmap, gray


def _headers(h, w, samp, qmap, gray, ql, qc, sof_marker, restart_interval=0):
    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) \
            + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00])
               + bytes(ql.reshape(-1)[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xDB, bytes([0x01])
                   + bytes(qc.reshape(-1)[ZIGZAG].astype(np.uint8)))
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        sof += bytes([i + 1, (samp[i][0] << 4) | samp[i][1], qmap[i]])
    out += seg(sof_marker, sof)

    def dht(tc, th, bits, vals):
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    out += dht(0, 0, DC_LUM_BITS, DC_LUM_VALS)
    out += dht(1, 0, AC_LUM_BITS, AC_LUM_VALS)
    if not gray:
        out += dht(0, 1, DC_CHROM_BITS, DC_CHROM_VALS)
        out += dht(1, 1, AC_CHROM_BITS, AC_CHROM_VALS)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    return out, seg


def jpeg_encode_progressive(img: np.ndarray, quality: int = 85,
                            subsampling: str = "444") -> bytes:
    """Progressive (SOF2) encoder exercising all four scan kinds the
    decoder implements: interleaved DC first at Al=1, DC refinement,
    then per-component AC first (Ss=1..63, Al=1, EOB runs) and AC
    refinement (correction bits + EOBRUN/BE buffering — T.81 G.1.2.3).
    Same quantized coefficients as jpeg_encode, so for one image the
    progressive and baseline decodes are bit-identical."""
    (h, w, mcus_x, mcus_y), blocks, (ql, qc), samp, qmap, gray = \
        _quantized_blocks(img, quality, subsampling)
    nc = 1 if gray else 3
    out, seg = _headers(h, w, samp, qmap, gray, ql, qc, 0xC2)
    dc_codes = [_build_codes(DC_LUM_BITS, DC_LUM_VALS),
                _build_codes(DC_CHROM_BITS, DC_CHROM_VALS)]
    # The Annex-K AC tables carry no EOBn symbols (0x10..0xE0) — those
    # exist only in progressive streams, where encoders ship custom
    # per-scan tables. Emit a flat 8-bit table covering every (r, s<15)
    # symbol: valid canonical code (240 < 255 — the all-ones code stays
    # reserved), suboptimal but exercises the same DHT machinery real
    # progressive files use.
    out += seg(0xC4, bytes([(1 << 4) | 0]) + bytes(_PROG_AC_BITS)
               + bytes(_PROG_AC_VALS))
    if not gray:
        out += seg(0xC4, bytes([(1 << 4) | 1]) + bytes(_PROG_AC_BITS)
                   + bytes(_PROG_AC_VALS))
    prog_ac = _build_codes(_PROG_AC_BITS, _PROG_AC_VALS)
    ac_codes = [prog_ac, prog_ac]

    def sos_header(comp_ids, ss, se, ah, al):
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            t = 0 if cid == 1 else 1
            body += bytes([cid, (t << 4) | t])
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, body)

    # --- scan 1: DC first, interleaved, Al=1 ---------------------------
    out += sos_header(list(range(1, nc + 1)), 0, 0, 0, 1)
    bw = _BitWriter()
    pred = [0] * nc
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(nc):
                sh, sv = samp[ci]
                codes = dc_codes[qmap[ci]]
                for vb in range(sv):
                    for hb in range(sh):
                        dc = int(blocks[ci][my * sv + vb, mx * sh + hb, 0])
                        v = dc >> 1          # point transform (arith shift)
                        diff = v - pred[ci]
                        pred[ci] = v
                        s = _ssss(diff)
                        c, ln = codes[s]
                        bw.write(c, ln)
                        if s:
                            bw.write(diff if diff > 0
                                     else diff + (1 << s) - 1, s)
    bw.flush()
    out += bw.out

    # --- scan 2: DC refinement, interleaved, Ah=1 Al=0 -----------------
    out += sos_header(list(range(1, nc + 1)), 0, 0, 1, 0)
    bw = _BitWriter()
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(nc):
                sh, sv = samp[ci]
                for vb in range(sv):
                    for hb in range(sh):
                        dc = int(blocks[ci][my * sv + vb, mx * sh + hb, 0])
                        bw.write(dc & 1, 1)
    bw.flush()
    out += bw.out

    # --- per component: AC first (Al=1) then AC refine (Ah=1, Al=0) ----
    for ci in range(nc):
        codes = ac_codes[qmap[ci]]
        # non-interleaved grid: ceil(component_samples / 8)
        hmax = max(s[0] for s in samp)
        vmax = max(s[1] for s in samp)
        cw = -(-(w * samp[ci][0]) // hmax)
        chh = -(-(h * samp[ci][1]) // vmax)
        bw_n = -(-cw // 8)
        bh_n = -(-chh // 8)

        out += sos_header([ci + 1], 1, 63, 0, 1)
        bw = _BitWriter()
        eobrun = 0
        for by in range(bh_n):
            for bx in range(bw_n):
                zz = blocks[ci][by, bx][ZIGZAG]   # zigzag order
                t = np.sign(zz) * (np.abs(zz) >> 1)   # AC point transform
                nz = np.flatnonzero(t[1:64]) + 1
                if len(nz) == 0:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        eobrun = _emit_eobrun(bw, codes, eobrun)
                    continue
                eobrun = _emit_eobrun(bw, codes, eobrun)
                k = 1
                for j in nz:
                    r = j - k
                    while r > 15:
                        c, ln = codes[0xF0]
                        bw.write(c, ln)
                        r -= 16
                    v = int(t[j])
                    s = _ssss(v)
                    c, ln = codes[(r << 4) | s]
                    bw.write(c, ln)
                    bw.write(v if v > 0 else v + (1 << s) - 1, s)
                    k = j + 1
                if k <= 63:
                    eobrun += 1
        _emit_eobrun(bw, codes, eobrun)
        bw.flush()
        out += bw.out

        out += sos_header([ci + 1], 1, 63, 1, 0)
        bw = _BitWriter()
        pend = {"eobrun": 0, "be": []}

        def emit_eobrun_refine():
            if pend["eobrun"] > 0:
                nbits = pend["eobrun"].bit_length() - 1
                c, ln = codes[nbits << 4]
                bw.write(c, ln)
                if nbits:
                    bw.write(pend["eobrun"] - (1 << nbits), nbits)
                for bit in pend["be"]:
                    bw.write(bit, 1)
                pend["eobrun"] = 0
                pend["be"] = []

        for by in range(bh_n):
            for bx in range(bw_n):
                zz = blocks[ci][by, bx][ZIGZAG]
                absv = np.abs(zz)
                # EOB = last position that becomes newly significant
                newly = np.flatnonzero(absv[1:64] == 1) + 1
                eob = int(newly[-1]) if len(newly) else 0
                r = 0
                br_bits: list[int] = []
                for k in range(1, 64):
                    temp = int(absv[k])
                    if temp == 0:
                        r += 1
                        continue
                    while r > 15 and k <= eob:
                        emit_eobrun_refine()
                        c, ln = codes[0xF0]
                        bw.write(c, ln)
                        r -= 16
                        for bit in br_bits:
                            bw.write(bit, 1)
                        br_bits = []
                    if temp > 1:
                        br_bits.append(temp & 1)
                        continue
                    emit_eobrun_refine()
                    c, ln = codes[(r << 4) | 1]
                    bw.write(c, ln)
                    bw.write(1 if zz[k] > 0 else 0, 1)
                    for bit in br_bits:
                        bw.write(bit, 1)
                    br_bits = []
                    r = 0
                if r > 0 or br_bits:
                    pend["eobrun"] += 1
                    pend["be"].extend(br_bits)
                    if pend["eobrun"] == 0x7FFF:
                        emit_eobrun_refine()
        emit_eobrun_refine()
        bw.flush()
        out += bw.out

    out += b"\xff\xd9"
    return bytes(out)


_PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 240, 0, 0, 0, 0, 0, 0, 0, 0]
_PROG_AC_VALS = [(r << 4) | s for r in range(16) for s in range(15)]


def _emit_eobrun(bw, codes, eobrun):
    if eobrun > 0:
        nbits = eobrun.bit_length() - 1
        c, ln = codes[nbits << 4]
        bw.write(c, ln)
        if nbits:
            bw.write(eobrun - (1 << nbits), nbits)
    return 0


def _pad_to(plane: np.ndarray, bh: int, bw_: int) -> np.ndarray:
    h, w = plane.shape
    ph = -(-h // bh) * bh
    pw = -(-w // bw_) * bw_
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def jpeg_encode(img: np.ndarray, quality: int = 85,
                subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """(h, w, 3) RGB or (h, w)/(h, w, 1) grayscale uint8 → baseline JPEG.
    subsampling: '444' or '420' (ignored for grayscale).
    restart_interval > 0 emits a DRI segment and RSTn markers every that
    many MCUs (exercises the decoder's restart path)."""
    img = np.asarray(img)
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[:, :, 0]
    gray = img.ndim == 2
    h, w = img.shape[:2]
    ql, qc = _quality_tables(quality)

    if gray:
        planes = [img.astype(np.float64) - 128.0]
        samp = [(1, 1)]
        qmap = [0]
    else:
        f = img.astype(np.float64)
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsampling == "420":
            cbp = _pad_to(cb, 2, 2)
            crp = _pad_to(cr, 2, 2)
            cb = (cbp[0::2, 0::2] + cbp[0::2, 1::2]
                  + cbp[1::2, 0::2] + cbp[1::2, 1::2]) / 4.0
            cr = (crp[0::2, 0::2] + crp[0::2, 1::2]
                  + crp[1::2, 0::2] + crp[1::2, 1::2]) / 4.0
            samp = [(2, 2), (1, 1), (1, 1)]
        elif subsampling == "422":
            cbp = _pad_to(cb, 1, 2)
            crp = _pad_to(cr, 1, 2)
            cb = (cbp[:, 0::2] + cbp[:, 1::2]) / 2.0
            cr = (crp[:, 0::2] + crp[:, 1::2]) / 2.0
            samp = [(2, 1), (1, 1), (1, 1)]
        elif subsampling == "444":
            samp = [(1, 1), (1, 1), (1, 1)]
        else:
            raise ValueError("subsampling must be '444', '422' or '420'")
        planes = [y, cb, cr]
        qmap = [0, 1, 1]

    dc_l = _build_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_l = _build_codes(AC_LUM_BITS, AC_LUM_VALS)
    dc_c = _build_codes(DC_CHROM_BITS, DC_CHROM_VALS)
    ac_c = _build_codes(AC_CHROM_BITS, AC_CHROM_VALS)

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # pad each plane to its own MCU-aligned size (edge replication)
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        padded.append(np.pad(p, ((0, mcus_y * sv * 8 - p.shape[0]),
                                 (0, mcus_x * sh * 8 - p.shape[1])),
                             mode="edge"))

    bw = _BitWriter()
    pred = [0] * len(planes)
    qts = [ql, qc]
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0] * len(planes)
            mcu_count += 1
            for ci, (p, (sh, sv)) in enumerate(zip(padded, samp)):
                q = qts[qmap[ci]]
                dcc = dc_l if qmap[ci] == 0 else dc_c
                acc = ac_l if qmap[ci] == 0 else ac_c
                for vb in range(sv):
                    for hb in range(sh):
                        y0 = (my * sv + vb) * 8
                        x0 = (mx * sh + hb) * 8
                        _encode_block(bw, p[y0:y0 + 8, x0:x0 + 8], q,
                                      pred, ci, dcc, acc)
    bw.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(ql.reshape(-1)[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xDB, bytes([0x01]) + bytes(qc.reshape(-1)[ZIGZAG].astype(np.uint8)))
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        sof += bytes([i + 1, (samp[i][0] << 4) | samp[i][1], qmap[i]])
    out += seg(0xC0, sof)

    def dht(tc, th, bits, vals):
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    out += dht(0, 0, DC_LUM_BITS, DC_LUM_VALS)
    out += dht(1, 0, AC_LUM_BITS, AC_LUM_VALS)
    if not gray:
        out += dht(0, 1, DC_CHROM_BITS, DC_CHROM_VALS)
        out += dht(1, 1, AC_CHROM_BITS, AC_CHROM_VALS)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for i in range(nc):
        t = 0 if i == 0 else 1
        sos += bytes([i + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
