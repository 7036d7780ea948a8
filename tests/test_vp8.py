"""Lossy VP8 key-frame codec tests (functions/vp8.py).

The bar (same as the JPEG/VP8L codecs): EXACT round-trips — the decoder
must reproduce the encoder's own reconstruction bit-for-bit through the
real bitstream — plus loud failure on malformed/out-of-scope streams.
"""

import random
import struct

import numpy as np
import pytest

from avecado_spark.functions import vp8
from avecado_spark.functions.vp8 import (BoolDecoder, BoolEncoder,
                                         vp8_decode, vp8_encode_planes,
                                         webp_encode_lossy)


def test_bool_coder_roundtrip_property():
    random.seed(11)
    for _ in range(60):
        n = random.randint(1, 400)
        bits = [random.randint(0, 1) for _ in range(n)]
        probs = [random.randint(1, 254) for _ in range(n)]
        enc = BoolEncoder()
        for b, p in zip(bits, probs):
            enc.write(b, p)
        dec = BoolDecoder(enc.flush())
        assert [dec.read(p) for p in probs] == bits


def test_transform_roundtrips_tight():
    rng = np.random.default_rng(7)
    for _ in range(100):
        x = rng.integers(-255, 256, (4, 4))
        assert np.abs(vp8.idct4x4(vp8.fdct4x4(x)) - x).max() <= 2
        assert np.abs(vp8.iwht4x4(vp8.fwht4x4(x)) - x).max() <= 2


def _trip(y, u, v, q, mode=None):
    stream, recon = vp8_encode_planes(y, u, v, qindex=q, mode=mode)
    dec = vp8_decode(stream)
    for k in ("y", "u", "v"):
        assert np.array_equal(dec[k], recon[k]), k
    return stream, dec


def test_roundtrip_noise_all_qindexes():
    rng = np.random.default_rng(3)
    for q in (0, 10, 40, 100, 127):
        y = rng.integers(0, 256, (48, 48)).astype(np.uint8)
        u = rng.integers(0, 256, (24, 24)).astype(np.uint8)
        v = rng.integers(0, 256, (24, 24)).astype(np.uint8)
        _trip(y, u, v, q)


def test_roundtrip_every_prediction_mode():
    rng = np.random.default_rng(4)
    for mode in (vp8.DC_PRED, vp8.V_PRED, vp8.H_PRED, vp8.TM_PRED):
        y = rng.integers(0, 256, (32, 32)).astype(np.uint8)
        u = rng.integers(0, 256, (16, 16)).astype(np.uint8)
        v = rng.integers(0, 256, (16, 16)).astype(np.uint8)
        stream, dec = _trip(y, u, v, 25, mode=mode)
        assert set(dec["ymodes"]) == {mode}


def test_roundtrip_nonmultiple_dims_and_skip():
    rng = np.random.default_rng(5)
    y = rng.integers(0, 256, (21, 37)).astype(np.uint8)
    u = rng.integers(0, 256, (11, 19)).astype(np.uint8)
    v = rng.integers(0, 256, (11, 19)).astype(np.uint8)
    stream, dec = _trip(y, u, v, 30)
    assert dec["width"] == 37 and dec["height"] == 21
    # flat image → every MB skips (smallest possible stream, still exact)
    flat = np.full((32, 32), 128, np.uint8)
    fu = np.full((16, 16), 128, np.uint8)
    s2, _ = _trip(flat, fu, fu, 20)
    assert len(s2) < len(stream)


def test_fidelity_improves_with_lower_qindex():
    yy, xx = np.mgrid[0:64, 0:64]
    y = (128 + 60 * np.sin(yy / 9.0) * np.cos(xx / 11.0)).astype(np.uint8)
    u = (128 + 40 * np.sin(yy[::2, ::2] / 7.0)).astype(np.uint8)
    v = (128 - 40 * np.cos(xx[::2, ::2] / 8.0)).astype(np.uint8)
    errs, sizes = [], []
    for q in (0, 20, 60):
        stream, recon = vp8_encode_planes(y, u, v, qindex=q)
        errs.append(np.abs(recon["y"].astype(int) - y.astype(int)).mean())
        sizes.append(len(stream))
    assert errs[0] < errs[1] < errs[2]      # rate-distortion behaves
    assert sizes[0] > sizes[1] > sizes[2]
    assert errs[0] < 1.0                     # near-lossless at q=0


def test_container_sniff_through_decode_image():
    from avecado_spark.functions.vp8 import rgb_to_yuv420, yuv420_to_rgb
    from avecado_spark.sources.multimodal import decode_image
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, (40, 56, 3)).astype(np.uint8)
    data = webp_encode_lossy(rgb, qindex=4)
    img = decode_image(data, 0, 0)
    assert img.shape == (40, 56, 3)
    # compare against the 4:2:0 color pipeline's own round-trip so the
    # assertion isolates CODEC loss from inherent chroma subsampling
    # (random per-pixel chroma loses ~44 mean levels to 2x2 averaging)
    baseline = yuv420_to_rgb(*rgb_to_yuv420(rgb))
    err = np.abs(img.astype(int) - baseline.astype(int))
    assert err.mean() < 6                    # q=4 coding loss only


def test_out_of_scope_streams_raise_loudly():
    y = np.full((16, 16), 90, np.uint8)
    u = np.full((8, 8), 90, np.uint8)
    stream, _ = vp8_encode_planes(y, u, u, qindex=20)
    # inter frame bit set
    inter = bytearray(stream)
    inter[0] |= 1
    with pytest.raises(NotImplementedError, match="inter frame"):
        vp8_decode(bytes(inter))
    # bad start code
    bad = bytearray(stream)
    bad[3] = 0x00
    with pytest.raises(ValueError, match="start code"):
        vp8_decode(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        vp8_decode(stream[:6])


def test_default_table_streams_roundtrip():
    """Streams that rely on the RFC 6386 default coefficient tables —
    the shape every real-world encoder emits — decode exactly now that
    the 13.4/13.5 tables are transcribed; the explicit-update header
    path still round-trips too and costs ~2.1 KB more."""
    rng = np.random.default_rng(21)
    y = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    u = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    stream, recon = vp8_encode_planes(y, u, u, qindex=20,
                                      transmit_probs=False)
    dec = vp8_decode(stream)
    for k in ("y", "u", "v"):
        assert np.array_equal(dec[k], recon[k]), k
    full, recon2 = vp8_encode_planes(y, u, u, qindex=20,
                                     transmit_probs=True)
    dec2 = vp8_decode(full)
    assert np.array_equal(dec2["y"], recon2["y"])
    assert np.array_equal(dec2["y"], dec["y"])  # same pixels either way
    assert len(full) > len(stream) + 1500  # the explicit prob set


def test_truncations_never_hang():
    rng = np.random.default_rng(9)
    y = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    u = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    stream, _ = vp8_encode_planes(y, u, u, qindex=10)
    for cut in range(1, len(stream), max(1, len(stream) // 23)):
        try:
            vp8_decode(stream[:cut])
        except (ValueError, NotImplementedError, IndexError):
            pass  # loud failure is fine; hanging or MemoryError is not


def test_loop_filter_roundtrip_all_levels():
    """Normal AND simple loop filters at several levels/sharpnesses:
    decode must equal the encoder's filtered reconstruction exactly, and
    a nonzero level must actually move pixels vs level 0."""
    rng = np.random.default_rng(13)
    y = rng.integers(0, 256, (48, 48)).astype(np.uint8)
    u = rng.integers(0, 256, (24, 24)).astype(np.uint8)
    v = rng.integers(0, 256, (24, 24)).astype(np.uint8)
    for ft in (0, 1):
        for fl in (10, 32, 63):
            stream, recon = vp8_encode_planes(
                y, u, v, qindex=30, filter_level=fl, filter_type=ft)
            dec = vp8_decode(stream)
            for k in ("y", "u", "v"):
                assert np.array_equal(dec[k], recon[k]), (ft, fl, k)
    for sh in (4, 7):
        stream, recon = vp8_encode_planes(
            y, u, v, qindex=30, filter_level=40, sharpness=sh)
        dec = vp8_decode(stream)
        assert np.array_equal(dec["y"], recon["y"])
    _, r0 = vp8_encode_planes(y, u, v, qindex=60, filter_level=0)
    _, r1 = vp8_encode_planes(y, u, v, qindex=60, filter_level=40)
    assert not np.array_equal(r0["y"], r1["y"])


def test_bpred_roundtrip_all_submodes():
    """B_PRED (per-4x4 prediction): forced-B_PRED encodes round-trip
    exactly across noise, crops, and the loop filter, and the min-SAD
    sub-mode search exercises many of the 10 predictors."""
    rng = np.random.default_rng(17)
    y = rng.integers(0, 256, (48, 48)).astype(np.uint8)
    u = rng.integers(0, 256, (24, 24)).astype(np.uint8)
    v = rng.integers(0, 256, (24, 24)).astype(np.uint8)
    for fl in (0, 32):
        stream, recon = vp8_encode_planes(y, u, v, qindex=25,
                                          mode=vp8.B_PRED, filter_level=fl)
        dec = vp8_decode(stream)
        for k in ("y", "u", "v"):
            assert np.array_equal(dec[k], recon[k]), (fl, k)
        assert set(dec["ymodes"]) == {vp8.B_PRED}
    y2 = rng.integers(0, 256, (21, 37)).astype(np.uint8)
    u2 = rng.integers(0, 256, (11, 19)).astype(np.uint8)
    stream, recon = vp8_encode_planes(y2, u2, u2, qindex=40,
                                      mode=vp8.B_PRED)
    assert np.array_equal(vp8_decode(stream)["y"], recon["y"])


def test_bpred_predictors_cover_and_bound():
    """Each of the 10 sub-block predictors emits in-range 4x4 output for
    random neighbors (no index errors at any mode)."""
    rng = np.random.default_rng(2)
    for m in range(10):
        for _ in range(20):
            out = vp8.predict_subblock(
                m, rng.integers(0, 256, 4), rng.integers(0, 256, 4),
                int(rng.integers(0, 256)), rng.integers(0, 256, 4))
            assert out.shape == (4, 4)
            assert out.min() >= 0 and out.max() <= 255


# ---------------------------------------------------------------------------
# third-party byte parity with the system libwebp (ctypes), both ways.
# Same-repo round-trips cannot falsify shared enc/dec conventions; these
# can — they caught the TM corner fill (127 vs 129), the B_HD row-0
# tail, and libwebp's permuted kf_bmode context axes. Skipped when the
# shared library is absent.
# ---------------------------------------------------------------------------

def _libwebp():
    import ctypes
    import glob
    for cand in sorted(glob.glob("/usr/lib/*/libwebp.so*")):
        try:
            return ctypes.CDLL(cand)
        except OSError:
            continue
    return None


def _libwebp_decode_yuv(lib, data):
    import ctypes
    w = ctypes.c_int()
    h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)()
    v = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int()
    uv_stride = ctypes.c_int()
    lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeYUV.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    yp = lib.WebPDecodeYUV(data, len(data), ctypes.byref(w),
                           ctypes.byref(h), ctypes.byref(u),
                           ctypes.byref(v), ctypes.byref(stride),
                           ctypes.byref(uv_stride))
    assert yp, "libwebp refused the stream"
    import ctypes as ct

    def grab(p, rows, cols, srd):
        n = rows * srd
        a = np.frombuffer(bytes(bytearray(
            ct.cast(p, ct.POINTER(ct.c_uint8 * n)).contents)),
            dtype=np.uint8).reshape(rows, srd)
        return a[:, :cols].copy()
    W, H, S, US = w.value, h.value, stride.value, uv_stride.value
    out = (grab(yp, H, W, S), grab(u, (H + 1) // 2, (W + 1) // 2, US),
           grab(v, (H + 1) // 2, (W + 1) // 2, US))
    lib.WebPFree(ctypes.cast(yp, ctypes.c_void_p))
    return out


def _wrap_vp8(stream):
    chunk = b"VP8 " + struct.pack("<I", len(stream)) + stream
    if len(stream) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def test_our_streams_decode_exactly_in_libwebp():
    lib = _libwebp()
    if lib is None:
        pytest.skip("system libwebp not present")
    rng = np.random.default_rng(3)
    y = rng.integers(0, 256, (32, 48)).astype(np.uint8)
    u = rng.integers(0, 256, (16, 24)).astype(np.uint8)
    v = rng.integers(0, 256, (16, 24)).astype(np.uint8)
    for mode in (None, vp8.DC_PRED, vp8.V_PRED, vp8.H_PRED,
                 vp8.TM_PRED, vp8.B_PRED):
        for fl in (0, 33, 63):
            stream, recon = vp8_encode_planes(y, u, v, qindex=40,
                                              mode=mode, filter_level=fl)
            ly, lu, lv = _libwebp_decode_yuv(lib, _wrap_vp8(stream))
            for k, ours, theirs in (("y", recon["y"], ly),
                                    ("u", recon["u"], lu),
                                    ("v", recon["v"], lv)):
                assert np.array_equal(ours, theirs), (mode, fl, k)
    # odd dimensions too (partial edge MBs)
    y2 = rng.integers(0, 256, (21, 37)).astype(np.uint8)
    u2 = rng.integers(0, 256, (11, 19)).astype(np.uint8)
    stream, recon = vp8_encode_planes(y2, u2, u2, qindex=25,
                                      filter_level=20)
    ly, lu, lv = _libwebp_decode_yuv(lib, _wrap_vp8(stream))
    assert np.array_equal(recon["y"], ly)
    assert np.array_equal(recon["u"], lu)


def test_real_libwebp_lossy_files_decode_exactly():
    """Real libwebp encoder output — segmentation with per-segment
    quantizers and seg-adjusted loop-filter levels, default prob tables,
    B_PRED with real context coding — must decode to libwebp's own YUV
    planes bit-for-bit."""
    import ctypes
    lib = _libwebp()
    if lib is None:
        pytest.skip("system libwebp not present")
    lib.WebPEncodeRGB.restype = ctypes.c_size_t
    lib.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
    rng = np.random.default_rng(3)
    h, w = 32, 48
    yy, xx = np.mgrid[0:h, 0:w]
    imgs = {
        "solid": np.full((h, w, 3), 120, np.uint8),
        "smooth": np.stack([(xx * 4) % 256, (yy * 5) % 256,
                            ((xx + yy) * 3) % 256], -1).astype(np.uint8),
        "noise": rng.integers(0, 256, (h, w, 3)).astype(np.uint8),
        "odd": rng.integers(0, 256, (29, 43, 3)).astype(np.uint8),
    }
    for q in (10.0, 50.0, 95.0):
        for name, img in imgs.items():
            ih, iw = img.shape[:2]
            out = ctypes.POINTER(ctypes.c_uint8)()
            n = lib.WebPEncodeRGB(img.tobytes(), iw, ih, iw * 3, q,
                                  ctypes.byref(out))
            assert n > 0, (name, q)
            data = bytes(bytearray(ctypes.cast(
                out, ctypes.POINTER(ctypes.c_uint8 * n)).contents))
            lib.WebPFree(ctypes.cast(out, ctypes.c_void_p))
            ly, lu, lv = _libwebp_decode_yuv(lib, data)
            i = 12
            chunk = None
            while i + 8 <= len(data):
                tag = data[i:i + 4]
                ln = int.from_bytes(data[i + 4:i + 8], "little")
                if tag == b"VP8 ":
                    chunk = data[i + 8:i + 8 + ln]
                i += 8 + ln + (ln & 1)
            dec = vp8_decode(chunk)
            for k, ours, theirs in (("y", dec["y"], ly),
                                    ("u", dec["u"], lu),
                                    ("v", dec["v"], lv)):
                assert np.array_equal(ours, theirs), (name, q, k)


def test_token_partitions_roundtrip_and_libwebp():
    """2/4/8 token partitions (RFC 6386 9.5): MB rows interleave across
    partitions with GLOBAL above/left nonzero contexts; exact self
    round-trip, and libwebp agrees when present."""
    rng = np.random.default_rng(29)
    y = rng.integers(0, 256, (80, 48)).astype(np.uint8)  # 5 MB rows
    u = rng.integers(0, 256, (40, 24)).astype(np.uint8)
    v = rng.integers(0, 256, (40, 24)).astype(np.uint8)
    lib = _libwebp()
    sizes = []
    for tp in (0, 1, 2, 3):
        stream, recon = vp8_encode_planes(y, u, v, qindex=40,
                                          filter_level=12,
                                          token_partitions=tp)
        dec = vp8_decode(stream)
        for k in ("y", "u", "v"):
            assert np.array_equal(dec[k], recon[k]), (tp, k)
        sizes.append(len(stream))
        if lib is not None:
            ly, lu, lv = _libwebp_decode_yuv(lib, _wrap_vp8(stream))
            assert np.array_equal(recon["y"], ly), tp
            assert np.array_equal(recon["u"], lu), tp
            assert np.array_equal(recon["v"], lv), tp
    # the partition size table costs 3 bytes per extra partition
    assert sizes[1] >= sizes[0] + 3
    # truncating the size table fails loudly
    stream, _ = vp8_encode_planes(y, u, v, qindex=40, token_partitions=3)
    tag = stream[0] | (stream[1] << 8) | (stream[2] << 16)
    fp = tag >> 5
    with pytest.raises(ValueError, match="partition"):
        vp8_decode(stream[:10 + fp + 10])
