"""GIF codec tests (functions/gif.py) — the PNG/VP8L bar: EXACT
round-trips through real bitstreams, loud failure on malformed input."""

import numpy as np
import pytest

from avecado_spark.functions.gif import (gif_decode, gif_encode,
                                         gif_frame_count)


def _pal_img(rng, n_colors, h, w):
    pal = np.unique(rng.integers(0, 256, (n_colors + 40, 3))
                    .astype(np.uint8), axis=0)[:n_colors]
    return pal[rng.integers(0, len(pal), (h, w))]


def test_roundtrip_plain_and_interlaced():
    rng = np.random.default_rng(3)
    img = _pal_img(rng, 13, 37, 52)
    for interlace in (False, True):
        back = gif_decode(gif_encode(img, interlace=interlace))
        assert back.shape == (37, 52, 4)
        assert np.array_equal(back[:, :, :3], img)
        assert (back[:, :, 3] == 255).all()


def test_roundtrip_palette_edges_and_lzw_overflow():
    rng = np.random.default_rng(11)
    # 256-color noise at 256x256 drives the LZW dictionary to 4096 and
    # through the clear-code reset path
    img = _pal_img(rng, 256, 256, 256)
    assert np.array_equal(gif_decode(gif_encode(img))[:, :, :3], img)
    # 2-color and 1-color palettes (min-code-size floor)
    two = np.where(rng.integers(0, 2, (50, 50, 1)).astype(bool),
                   np.uint8(255), np.uint8(0)) * np.ones((1, 1, 3), np.uint8)
    assert np.array_equal(gif_decode(gif_encode(two))[:, :, :3], two)
    one = np.full((20, 20, 3), 77, np.uint8)
    assert np.array_equal(gif_decode(gif_encode(one))[:, :, :3], one)


def test_transparency_and_frame_count():
    rng = np.random.default_rng(5)
    img = _pal_img(rng, 4, 8, 8)
    data = gif_encode(img, transparent=0)
    back = gif_decode(data)
    assert set(np.unique(back[:, :, 3])) <= {0, 255}
    assert (back[:, :, 3] == 0).any()      # some pixels hit index 0
    assert gif_frame_count(data) == 1


def test_too_many_colors_raises():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)  # ~4k colors
    with pytest.raises(ValueError, match="colors > 256"):
        gif_encode(img)


def test_malformed_streams_fail_loudly():
    rng = np.random.default_rng(9)
    data = gif_encode(_pal_img(rng, 16, 24, 24))
    with pytest.raises(ValueError, match="signature"):
        gif_decode(b"NOTGIF" + data[6:])
    for cut in range(3, len(data), max(1, len(data) // 17)):
        try:
            gif_decode(data[:cut])
        except ValueError:
            pass  # loud is fine; silent wrong pixels are not
        except Exception as e:  # noqa: BLE001
            raise AssertionError(f"non-ValueError at cut {cut}: {e!r}")


def test_decode_image_sniffs_gif():
    from avecado_spark.sources.multimodal import decode_image
    rng = np.random.default_rng(1)
    img = _pal_img(rng, 32, 21, 33)
    dec = decode_image(gif_encode(img), 0, 0)
    assert dec.shape == (21, 33, 3)
    assert np.array_equal(dec, img)


def test_animation_disposal_compositing():
    """3-frame animation with sub-rect patches: disposal 1 (leave) keeps
    prior content under later frames; disposal 2 (restore-to-background)
    clears the frame's rect before the next frame draws; frame_idx past
    the end serves the final state."""
    from avecado_spark.functions.gif import (gif_decode_frame,
                                             gif_encode_frames,
                                             gif_frame_count)

    red = np.array([200, 0, 0], np.uint8)
    blue = np.array([0, 0, 200], np.uint8)
    green = np.array([0, 200, 0], np.uint8)
    base = np.tile(red, (10, 10, 1))
    patch = np.tile(blue, (4, 4, 1))
    patch2 = np.tile(green, (2, 2, 1))
    frames = [(base, 0, 0), (patch, 2, 2), (patch2, 0, 0)]

    # disposal 1: every painted pixel persists
    data = gif_encode_frames(frames, disposal=1)
    assert gif_frame_count(data) == 3
    f0 = gif_decode_frame(data, 0)
    assert (f0[:, :, :3] == red).all()
    f1 = gif_decode_frame(data, 1)
    assert (f1[2:6, 2:6, :3] == blue).all()
    assert (f1[0, 0, :3] == red).all()
    f2 = gif_decode_frame(data, 2)
    assert (f2[0:2, 0:2, :3] == green).all()
    assert (f2[2:6, 2:6, :3] == blue).all()     # patch survived (leave)
    assert (f2[8, 8, :3] == red).all()
    # clamp past the end
    assert np.array_equal(gif_decode_frame(data, 99), f2)

    # disposal 2: the blue patch's rect is CLEARED before frame 2 draws
    data2 = gif_encode_frames(frames, disposal=2)
    g2 = gif_decode_frame(data2, 2)
    assert (g2[0:2, 0:2, :3] == green).all()
    assert (g2[3, 3, 3] == 0)                   # cleared to transparent
    assert (g2[8, 8, 3] == 0)                   # base rect cleared too


def test_decode_video_frame_routes_gif():
    from avecado_spark.functions.gif import gif_encode_frames
    from avecado_spark.sources.multimodal import decode_video_frame

    a = np.tile(np.array([10, 20, 30], np.uint8), (6, 6, 1))
    b = np.tile(np.array([200, 100, 0], np.uint8), (6, 6, 1))
    data = gif_encode_frames([(a, 0, 0), (b, 0, 0)], disposal=1)
    f0 = decode_video_frame(data, 0, 0, 0)
    f1 = decode_video_frame(data, 1, 0, 0)
    assert np.array_equal(f0, a) and np.array_equal(f1, b)
