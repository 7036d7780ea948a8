"""Animated WebP (VP8X + ANIM/ANMF): container round-trip, blend/dispose
composition semantics, probe facts, and the video-frame sampling path.

Composition conventions mirror libwebp's AnimDecoder (canvas starts
transparent; dispose-to-background clears to transparent; source-over is
non-premultiplied integer math) — the system libwebp.so carries no demux
API, so semantics are pinned by hand-computed pixels and an independent
per-pixel reference compositor rather than ctypes parity.
"""

import numpy as np
import pytest

from avecado_spark.functions.webp import (
    webp_decode, webp_decode_frame, webp_encode, webp_encode_frames,
    webp_frame_count, webp_parse_animation)
from avecado_spark.functions.mediameta import probe_media
from avecado_spark.sources.multimodal import decode_video_frame


def _rgba(h, w, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 4), dtype=np.uint8)


def _solid(h, w, r, g, b, a):
    img = np.zeros((h, w, 4), dtype=np.uint8)
    img[:, :] = (r, g, b, a)
    return img


def _ref_over(dst, src):
    """Independent per-pixel reference of the documented source-over:
    non-premultiplied, integer /255 and /out_a divisions, src_a == 0
    keeps dst byte-for-byte."""
    out = dst.copy()
    for y in range(dst.shape[0]):
        for x in range(dst.shape[1]):
            sa = int(src[y, x, 3])
            if sa == 0:
                continue
            da = int(dst[y, x, 3])
            df = da * (255 - sa) // 255
            oa = sa + df
            for c in range(3):
                out[y, x, c] = (int(src[y, x, c]) * sa
                                + int(dst[y, x, c]) * df) // max(oa, 1)
            out[y, x, 3] = oa
    return out


def test_full_frame_overwrite_roundtrip():
    frames = [{"rgba": _rgba(10, 14, s), "x": 0, "y": 0, "blend": False}
              for s in range(3)]
    data = webp_encode_frames(frames)
    assert webp_frame_count(data) == 3
    for i in range(3):
        np.testing.assert_array_equal(webp_decode_frame(data, i),
                                      frames[i]["rgba"])
    # clamp beyond the last frame
    np.testing.assert_array_equal(webp_decode_frame(data, 99),
                                  frames[2]["rgba"])


def test_subrect_blend_matches_reference_compositor():
    base = _rgba(12, 16, 7)
    base[:, :, 3] = 255
    patch = _rgba(6, 8, 8)          # random alpha → real blending
    frames = [{"rgba": base, "x": 0, "y": 0, "blend": False},
              {"rgba": patch, "x": 4, "y": 2, "blend": True}]
    data = webp_encode_frames(frames)
    got = webp_decode_frame(data, 1)
    want = base.copy()
    want[2:8, 4:12] = _ref_over(base[2:8, 4:12], patch)
    np.testing.assert_array_equal(got, want)


def test_blend_known_pixel_values():
    # (255,0,0,128) over opaque (0,0,255,255):
    #   df = 255*127//255 = 127, oa = 255,
    #   r = 255*128//255 = 128, b = 255*127//255 = 127
    dst = _solid(2, 2, 0, 0, 255, 255)
    src = _solid(2, 2, 255, 0, 0, 128)
    frames = [{"rgba": dst, "x": 0, "y": 0, "blend": False},
              {"rgba": src, "x": 0, "y": 0, "blend": True}]
    got = webp_decode_frame(webp_encode_frames(frames), 1)
    assert tuple(got[0, 0]) == (128, 0, 127, 255)


def test_blend_src_alpha_zero_keeps_dst_bytes():
    dst = _solid(4, 4, 9, 8, 7, 200)
    src = _solid(4, 4, 250, 250, 250, 0)    # RGB under zero alpha
    frames = [{"rgba": dst, "x": 0, "y": 0, "blend": False},
              {"rgba": src, "x": 0, "y": 0, "blend": True}]
    got = webp_decode_frame(webp_encode_frames(frames), 1)
    np.testing.assert_array_equal(got, dst)


def test_no_blend_overwrites_including_transparency():
    dst = _solid(4, 4, 10, 20, 30, 255)
    src = _solid(2, 2, 250, 250, 250, 0)
    frames = [{"rgba": dst, "x": 0, "y": 0, "blend": False},
              {"rgba": src, "x": 2, "y": 2, "blend": False}]
    got = webp_decode_frame(webp_encode_frames(frames), 1)
    np.testing.assert_array_equal(got[2:4, 2:4], src)
    np.testing.assert_array_equal(got[0:2, :], dst[0:2, :])


def test_dispose_clears_rect_before_next_frame():
    base = _solid(8, 8, 100, 100, 100, 255)
    patch = _solid(4, 4, 200, 0, 0, 255)
    tiny = _solid(2, 2, 0, 200, 0, 255)
    frames = [{"rgba": base, "x": 0, "y": 0, "blend": False},
              {"rgba": patch, "x": 2, "y": 2, "blend": False,
               "dispose": True},
              {"rgba": tiny, "x": 0, "y": 0, "blend": True}]
    data = webp_encode_frames(frames)
    # at frame 1 the patch is visible (dispose happens before frame 2)
    np.testing.assert_array_equal(
        webp_decode_frame(data, 1)[2:6, 2:6], patch)
    got = webp_decode_frame(data, 2)
    # patch rect cleared to transparent, then tiny blended at (0,0)
    assert tuple(got[4, 4]) == (0, 0, 0, 0)
    np.testing.assert_array_equal(got[0:2, 0:2], tiny)
    np.testing.assert_array_equal(got[6:8, :], base[6:8, :])


def test_still_payload_any_frame_and_count():
    img = _rgba(9, 11, 3)
    data = webp_encode(img)
    assert webp_frame_count(data) == 1
    np.testing.assert_array_equal(webp_decode_frame(data, 5),
                                  webp_decode(data))
    with pytest.raises(ValueError):
        webp_parse_animation(data)


def test_encoder_validation():
    img = _rgba(4, 4, 1)
    with pytest.raises(ValueError, match="even"):
        webp_encode_frames([{"rgba": img, "x": 1, "y": 0}])
    with pytest.raises(ValueError, match="canvas"):
        webp_encode_frames([{"rgba": img, "x": 0, "y": 0},
                            {"rgba": img, "x": 2, "y": 2}])
    with pytest.raises(ValueError, match="no frames"):
        webp_encode_frames([])


def test_header_fields_roundtrip():
    frames = [{"rgba": _rgba(6, 6, 2), "x": 0, "y": 0,
               "duration_ms": 40, "blend": False},
              {"rgba": _rgba(4, 2, 4), "x": 2, "y": 2,
               "duration_ms": 123, "dispose": True}]
    data = webp_encode_frames(frames, loop_count=5,
                              bg_rgba=(1, 2, 3, 4))
    anim = webp_parse_animation(data)
    assert (anim["canvas_w"], anim["canvas_h"]) == (6, 6)
    assert anim["loop_count"] == 5
    assert anim["bg_rgba"] == (1, 2, 3, 4)
    f0, f1 = anim["frames"]
    assert (f0["duration_ms"], f0["blend"], f0["dispose"]) == (40, False,
                                                               False)
    assert (f1["x"], f1["y"], f1["w"], f1["h"]) == (2, 2, 2, 4)
    assert (f1["duration_ms"], f1["blend"], f1["dispose"]) == (123, True,
                                                               True)


def test_probe_media_animation_facts():
    frames = [{"rgba": _rgba(10, 12, s), "x": 0, "y": 0,
               "duration_ms": 250, "blend": False} for s in range(4)]
    meta = probe_media(webp_encode_frames(frames, loop_count=3))
    assert meta["format"] == "webp"
    assert meta["codec"] == "vp8l"
    assert (meta["width"], meta["height"]) == (12, 10)
    assert meta["animated"] is True
    assert meta["frame_count"] == 4
    assert meta["duration_s"] == 1.0
    assert meta["loop_count"] == 3
    assert meta["has_alpha"] is True


def test_decode_video_frame_webp_branch():
    frames = [{"rgba": _rgba(8, 8, s), "x": 0, "y": 0, "blend": False}
              for s in range(2)]
    data = webp_encode_frames(frames)
    got = decode_video_frame(data, 1, 8, 8)
    np.testing.assert_array_equal(got, frames[1]["rgba"][:, :, :3])
