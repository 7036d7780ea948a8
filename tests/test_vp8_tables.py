"""Provenance and landmark tests for the RFC 6386 fixed entropy tables
(functions/vp8_tables.py) and their wiring into the VP8 codec.

Three layers of evidence:
  1. shape/range sanity + canonical RFC landmark rows;
  2. byte-for-byte cross-check against the identical constants embedded
     in the system libwebp's VP8 decoder .rodata (skipped if the shared
     library is absent);
  3. the sub-mode coding is genuinely context-DEPENDENT — decoding the
     same bytes under a different (above, left) context yields different
     symbols, which the old neutral stand-in could never do.
"""

import glob
import os

import numpy as np
import pytest

from avecado_spark.functions import vp8
from avecado_spark.functions.vp8 import BoolDecoder, BoolEncoder
from avecado_spark.functions.vp8_tables import (COEFF_UPDATE_PROBS,
                                                DEFAULT_COEFF_PROBS,
                                                KF_BMODE_PROBS)


def _flat(t):
    return np.array(t, dtype=np.int64).ravel()


def test_shapes_and_ranges():
    d = np.array(DEFAULT_COEFF_PROBS)
    u = np.array(COEFF_UPDATE_PROBS)
    b = np.array(KF_BMODE_PROBS)
    assert d.shape == (4, 8, 3, 11)
    assert u.shape == (4, 8, 3, 11)
    assert b.shape == (10, 10, 9)
    # valid boolean-coder probabilities, and genuinely non-neutral
    for t in (d, u, b):
        assert t.min() >= 1 and t.max() <= 255
        assert not np.all(t == 128)
    # update flags are predominantly "no update" (mostly 255)
    assert (u == 255).mean() > 0.5


def test_rfc_landmark_rows():
    # default_coeff_probs: band 0 of plane 0 is never read -> all 128s
    assert DEFAULT_COEFF_PROBS[0][0] == [[128] * 11] * 3
    # plane 0, band 1, ctx 0 — the first populated row in RFC 6386 13.5
    assert DEFAULT_COEFF_PROBS[0][1][0][:6] == [253, 136, 254, 255, 228,
                                                219]
    # plane 1 (Y2), band 1, ctx 0 starts 1, 149, 241
    assert DEFAULT_COEFF_PROBS[1][1][0][:3] == [1, 149, 241]
    # kf_bmode_prob[B_DC][B_DC] — the most common context
    assert KF_BMODE_PROBS[0][0] == [231, 120, 48, 89, 115, 113, 120,
                                    152, 112]
    # kf_bmode_prob[B_TM][B_TM]
    assert KF_BMODE_PROBS[1][1] == [72, 187, 100, 130, 157, 111, 32,
                                    75, 80]
    # coeff_update_probs plane 0 band 0 never updates (all 255)
    assert COEFF_UPDATE_PROBS[0][0][0] == [255] * 11


def test_tables_match_system_libwebp_rodata():
    """The exact three tables live as contiguous .rodata in libwebp's
    VP8 decoder: coeff-update probs (1056 B), kf_bmode_prob (900 B) and
    default coeff probs (1056 B). Find them by content and require the
    binary to carry our bytes verbatim. libwebp's internal B-mode enum
    permutes RD/VR/LD relative to the RFC/bitstream order (its
    RD=4, VR=5, LD=6 vs the RFC's LD=4, RD=5, VR=6), so its stored
    kf_bmode table has both context axes in that order — apply the
    RFC→libwebp mode map before searching."""
    cands = sorted(glob.glob("/usr/lib/*/libwebp.so*"))
    cands = [c for c in cands if not os.path.islink(c)]
    if not cands:
        pytest.skip("system libwebp not present")
    blob = open(cands[0], "rb").read()
    for table in (DEFAULT_COEFF_PROBS, COEFF_UPDATE_PROBS):
        raw = bytes(int(v) for v in _flat(table))
        assert blob.count(raw) >= 1, "table bytes not found in libwebp"
    inv = {0: 0, 1: 1, 2: 2, 3: 3, 4: 5, 5: 6, 6: 4, 7: 7, 8: 8, 9: 9}
    webp_order = [[KF_BMODE_PROBS[inv[a]][inv[l]] for l in range(10)]
                  for a in range(10)]
    raw = bytes(int(v) for v in _flat(webp_order))
    assert blob.count(raw) >= 1, "kf_bmode bytes not found in libwebp"


def test_submode_coding_is_context_dependent():
    """Encode a sub-mode symbol stream under context (B_DC, B_DC) and
    decode the same bytes under (B_VE, B_HE): at least one symbol must
    differ, proving the entropy coding actually consumes the context
    (a neutral shared table would decode identically)."""
    ctx_a = KF_BMODE_PROBS[vp8.B_DC][vp8.B_DC]
    ctx_b = KF_BMODE_PROBS[vp8.B_VE][vp8.B_HE]
    assert ctx_a != ctx_b
    symbols = [vp8.B_DC, vp8.B_TM, vp8.B_VE, vp8.B_HU, vp8.B_RD,
               vp8.B_DC, vp8.B_LD, vp8.B_VL, vp8.B_HD, vp8.B_HE]
    enc = BoolEncoder()
    for s in symbols:
        enc.tree(vp8.BMODE_TREE, ctx_a, s)
    data = enc.flush()
    dec = BoolDecoder(data)
    assert [dec.tree(vp8.BMODE_TREE, ctx_a) for _ in symbols] == symbols
    dec2 = BoolDecoder(data)
    got = [dec2.tree(vp8.BMODE_TREE, ctx_b) for _ in symbols]
    assert got != symbols


def test_bpred_stream_crosses_mb_context_boundaries():
    """A 3x3-MB forced-B_PRED frame round-trips exactly with the real
    context tables: sub-mode contexts flow within MBs, across the MB to
    the left, and across the MB row above."""
    rng = np.random.default_rng(33)
    y = rng.integers(0, 256, (48, 48)).astype(np.uint8)
    u = rng.integers(0, 256, (24, 24)).astype(np.uint8)
    v = rng.integers(0, 256, (24, 24)).astype(np.uint8)
    stream, recon = vp8.vp8_encode_planes(y, u, v, qindex=35,
                                          mode=vp8.B_PRED)
    dec = vp8.vp8_decode(stream)
    for k in ("y", "u", "v"):
        assert np.array_equal(dec[k], recon[k]), k
    # the searched sub-modes are diverse enough to exercise many contexts
    flat = [m for sub in dec["bmodes"] if sub for m in sub]
    assert len(set(flat)) >= 5
