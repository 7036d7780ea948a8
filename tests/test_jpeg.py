"""Baseline JPEG codec (functions/jpeg): round-trip fidelity across
subsampling modes, restart markers, grayscale, scope-boundary rejection,
and the decode_image integration — the r03 honesty boundary closed for
the dominant web image format."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from avecado_spark.functions.jpeg import (jpeg_decode,  # noqa: E402
                                          jpeg_encode)


def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 10 * np.log10(255.0 ** 2 / mse) if mse > 0 else np.inf


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([np.clip(xx * 3 + 20, 0, 255),
                     np.clip(yy * 4 + 10, 0, 255),
                     np.clip(255 - xx * 2, 0, 255)],
                    axis=2).astype(np.uint8)


@pytest.mark.parametrize("sub,quality,min_psnr", [
    ("444", 95, 45.0), ("444", 75, 40.0),
    ("422", 90, 40.0),
    ("420", 95, 38.0), ("420", 75, 35.0),
])
def test_roundtrip_rgb(sub, quality, min_psnr):
    img = _gradient(40, 56)   # non-multiple-of-16 dims exercise padding
    enc = jpeg_encode(img, quality=quality, subsampling=sub)
    assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
    dec = jpeg_decode(enc)
    assert dec.shape == img.shape
    assert _psnr(img, dec) >= min_psnr


def test_roundtrip_grayscale():
    yy, xx = np.mgrid[0:33, 0:47]
    g = np.clip(xx * 3 + yy * 2, 0, 255).astype(np.uint8)
    dec = jpeg_decode(jpeg_encode(g, quality=90))
    assert dec.shape == (33, 47, 1)
    assert _psnr(g[:, :, None], dec) >= 45.0


def test_roundtrip_noise_high_quality():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8).astype(np.uint8)
    dec = jpeg_decode(jpeg_encode(img, quality=98, subsampling="444"))
    assert _psnr(img, dec) >= 38.0


def test_restart_markers_roundtrip():
    """DRI + RSTn every 2 MCUs: the decoder must realign and reset DC
    predictors, bit-identical in fidelity to the unrestarted stream."""
    img = _gradient(48, 64)
    plain = jpeg_decode(jpeg_encode(img, quality=90))
    enc = jpeg_encode(img, quality=90, restart_interval=2)
    assert b"\xff\xdd" in enc                 # DRI segment present
    assert any(bytes([0xFF, 0xD0 + i]) in enc for i in range(8))
    dec = jpeg_decode(enc)
    assert (dec == plain).all()


def test_rejects_lossless_and_garbage():
    """SOF2 (progressive) is REAL since r04; the remaining honest frame
    boundary is lossless/hierarchical/arithmetic (SOF3+)."""
    img = _gradient(16, 16)
    enc = bytearray(jpeg_encode(img))
    sof = enc.find(b"\xff\xc0")
    enc[sof + 1] = 0xC3                       # flip SOF0 → SOF3 lossless
    with pytest.raises(NotImplementedError, match="non-baseline"):
        jpeg_decode(bytes(enc))
    with pytest.raises(ValueError, match="not a JPEG"):
        jpeg_decode(b"GIF89a....")


def test_decode_image_sniffs_jpeg():
    from avecado_spark.sources.multimodal import decode_image
    img = _gradient(20, 28)
    dec = decode_image(jpeg_encode(img, quality=92), 999, 999)
    assert dec.shape == (20, 28, 3)           # header dims win over meta
    assert _psnr(img, dec) >= 40.0
    g = np.clip(np.arange(16 * 16).reshape(16, 16) % 256, 0,
                255).astype(np.uint8)
    decg = decode_image(jpeg_encode(g), 0, 0)
    assert decg.shape == (16, 16, 3)          # gray expanded to RGB


def test_media_features_jpeg_payload(spark):
    """The Spark plumbing end-to-end with a REAL JPEG payload: decode →
    resize → features inside mapInPandas."""
    from avecado_spark.sources import multimodal as mm
    img = _gradient(32, 32)
    payload = jpeg_encode(img, quality=90)
    df = spark.createDataFrame(
        [(1, "image", bytearray(payload), (32, 32, "image/jpeg"))],
        mm.MEDIA_SCHEMA)
    out = mm.media_features(df).collect()
    assert len(out) == 1
    assert len(out[0].features) == mm.FEATURE_DIM
    assert all(np.isfinite(out[0].features))


from hypothesis import given, settings, strategies as st  # noqa: E402


@given(st.integers(8, 48), st.integers(8, 48), st.integers(0, 10**6),
       st.sampled_from(["444", "422", "420"]))
@settings(max_examples=25, deadline=None)
def test_roundtrip_property(h, w, seed, sub):
    """Any uint8 image round-trips through encode→decode with the right
    shape and bounded error at quality 95 (smooth content)."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (4, 4, 3))
    # upsample a 4x4 random field → smooth image (JPEG's good case)
    img = np.clip(np.kron(base, np.ones((12, 12, 1))), 0,
                  255)[:h, :w].astype(np.uint8)
    dec = jpeg_decode(jpeg_encode(img, quality=95, subsampling=sub))
    assert dec.shape == (h, w, 3)
    err = np.abs(dec.astype(int) - img.astype(int))
    # interior pixels of constant 12x12 cells stay close even at 4:2:0
    assert np.median(err) <= 6


# ---------------------------------------------------------------------------
# RIFF/WAVE PCM decode (sources/multimodal.wav_decode) — the audio twin of
# the real-codec story: uncompressed containers decode natively
# ---------------------------------------------------------------------------

def test_wav_roundtrip_and_formats():
    from avecado_spark.sources.multimodal import wav_decode, wav_encode
    t = np.arange(2000)
    sig = (10000 * np.sin(2 * np.pi * 440 * t / 16000)).astype(np.int16)
    out, rate = wav_decode(wav_encode(sig, rate=16000))
    assert rate == 16000
    assert np.array_equal(out, sig)

    # float32 WAV (format code 3)
    body = (sig.astype(np.float64) / 32767.0).astype("<f4").tobytes()
    hdr = (b"RIFF" + (36 + len(body)).to_bytes(4, "little") + b"WAVE"
           + b"fmt " + (16).to_bytes(4, "little")
           + (3).to_bytes(2, "little") + (1).to_bytes(2, "little")
           + (16000).to_bytes(4, "little") + (64000).to_bytes(4, "little")
           + (4).to_bytes(2, "little") + (32).to_bytes(2, "little")
           + b"data" + len(body).to_bytes(4, "little"))
    outf, _ = wav_decode(hdr + body)
    assert np.abs(outf.astype(int) - sig.astype(int)).max() <= 1

    # stereo downmix: L = sig, R = -sig → silence
    inter = np.empty(2 * len(sig), dtype=np.int16)
    inter[0::2] = sig
    inter[1::2] = -sig
    stereo = bytearray(wav_encode(inter, rate=8000))
    stereo[22:24] = (2).to_bytes(2, "little")   # channels = 2
    outs, _ = wav_decode(bytes(stereo))
    assert np.abs(outs.astype(int)).max() <= 1

    import pytest
    with pytest.raises(ValueError, match="not a RIFF"):
        wav_decode(b"OggS....")


def test_decode_audio_real_wav_and_stub_boundary():
    import pytest
    from avecado_spark.sources.multimodal import decode_audio, wav_encode
    sig = (np.arange(5000) % 997 - 498).astype(np.int16)
    wave = decode_audio(wav_encode(sig), n_samples=4096)
    assert np.array_equal(wave, sig[:4096])          # real decode, truncated
    short = decode_audio(wav_encode(sig[:100]), n_samples=256)
    assert len(short) == 256 and np.array_equal(short[:100], sig[:100])
    with pytest.raises(NotImplementedError, match="compressed audio"):
        decode_audio(b"\xff\xfb\x90\x00mp3-ish", 64)   # mp3 sync word


def test_audio_features_real_wav_payload(spark):
    """audio_features end to end with a REAL PCM WAV payload: the RMS
    frame energies match a driver-side recomputation."""
    from avecado_spark.sources import multimodal as mm
    t = np.arange(4096)
    sig = (8000 * np.sin(2 * np.pi * t / 64)).astype(np.int16)
    payload = mm.wav_encode(sig)
    df = spark.createDataFrame(
        [(7, "audio", bytearray(payload), (0, 0, "audio/wav"))],
        mm.MEDIA_SCHEMA)
    rows = mm.audio_features(df).collect()
    assert len(rows) == 1 and rows[0].media_id == 7
    want = np.sqrt((sig.astype(np.float64).reshape(mm.FEATURE_DIM, -1) ** 2)
                   .mean(axis=1))
    assert np.allclose(rows[0].features, want)


# ---------------------------------------------------------------------------
# YUV4MPEG2 frame extraction (sources/multimodal.y4m_decode_frame)
# ---------------------------------------------------------------------------

def _rgb_frames(n, h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([
        np.stack([np.clip(xx * 5 + 30 * i, 0, 255),
                  np.clip(yy * 6 + 10, 0, 255),
                  np.clip(200 - xx * 3 + 5 * i, 0, 255)], axis=2)
        for i in range(n)], axis=0).astype(np.uint8)


def test_y4m_frame_roundtrip_and_indexing():
    from avecado_spark.sources.multimodal import (y4m_decode_frame,
                                                  y4m_encode)
    frames = _rgb_frames(3, 24, 36)
    clip = y4m_encode(frames, chroma="444")
    for i in range(3):
        dec = y4m_decode_frame(clip, i)
        assert dec.shape == (24, 36, 3)
        assert np.abs(dec.astype(int) - frames[i].astype(int)).max() <= 3
    clip420 = y4m_encode(frames, chroma="420")
    dec420 = y4m_decode_frame(clip420, 1)
    assert np.abs(dec420.astype(int)[4:-4, 4:-4]
                  - frames[1].astype(int)[4:-4, 4:-4]).max() <= 40
    assert np.median(np.abs(dec420.astype(int) - frames[1].astype(int))) <= 6

    import pytest
    with pytest.raises(ValueError, match="beyond end"):
        y4m_decode_frame(clip, 3)
    with pytest.raises(ValueError, match="not a YUV4MPEG2"):
        y4m_decode_frame(b"RIFF....", 0)


def test_decode_video_frame_real_and_stub_boundary():
    import pytest
    from avecado_spark.sources.multimodal import (decode_video_frame,
                                                  y4m_encode)
    frames = _rgb_frames(2, 16, 16)
    clip = y4m_encode(frames)
    # the container's own dims win over metadata (passed 0x0 here)
    dec = decode_video_frame(clip, 1, 0, 0)
    assert dec.shape == (16, 16, 3)
    assert np.abs(dec.astype(int) - frames[1].astype(int)).max() <= 3
    with pytest.raises(NotImplementedError, match="compressed video"):
        decode_video_frame(b"\x00\x00\x00\x20ftypisom", 0, 8, 8)  # mp4 box


def test_sample_frames_real_y4m_payload(spark):
    """sample_frames end to end over a REAL y4m clip: one row fans out to
    one row per sampled frame, features computed from true frame pixels."""
    from avecado_spark.sources import multimodal as mm
    frames = _rgb_frames(3, 20, 20)
    clip = mm.y4m_encode(frames)
    df = spark.createDataFrame(
        [(9, "video", bytearray(clip), (20, 20, "video/x-yuv4mpeg"))],
        mm.MEDIA_SCHEMA)
    rows = mm.sample_frames(df, stride_s=1.0, fps=1.0, duration_s=3.0,
                            target=16).collect()
    assert sorted(r.frame_idx for r in rows) == [0, 1, 2]
    for r in rows:
        img = mm.resize_nearest(mm.y4m_decode_frame(clip, r.frame_idx),
                                16, 16)
        assert np.allclose(r.features,
                           mm.extract_features(img).astype(float))


# ---------------------------------------------------------------------------
# progressive JPEG (SOF2): coefficients accumulate across scans
# ---------------------------------------------------------------------------

def test_progressive_decode_matches_baseline_bit_for_bit():
    """Same quantized coefficients → same reconstruction: for any image,
    decoding the progressive stream (DC first/refine + per-component AC
    first/refine) must equal decoding the baseline stream EXACTLY."""
    from avecado_spark.functions.jpeg import jpeg_encode_progressive
    rng = np.random.default_rng(11)
    images = [_gradient(40, 56),
              rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
                 .astype(np.uint8)]
    for img in images:
        for sub in ("444", "422", "420"):
            for q in (95, 70):
                prog = jpeg_encode_progressive(img, quality=q,
                                               subsampling=sub)
                assert b"\xff\xc2" in prog[:200]          # SOF2 frame
                base = jpeg_decode(jpeg_encode(img, quality=q,
                                               subsampling=sub))
                assert (jpeg_decode(prog) == base).all()


def test_progressive_grayscale_and_quality():
    from avecado_spark.functions.jpeg import jpeg_encode_progressive
    yy, xx = np.mgrid[0:33, 0:47]
    g = np.clip(xx * 3 + yy * 2, 0, 255).astype(np.uint8)
    dec = jpeg_decode(jpeg_encode_progressive(g, quality=90))
    assert dec.shape == (33, 47, 1)
    assert _psnr(g[:, :, None], dec) >= 45.0


def test_progressive_noise_stresses_eobrun_and_refine():
    """High-entropy content at low quality maximizes EOB runs, ZRL and
    correction-bit traffic; identity with baseline must still hold."""
    from avecado_spark.functions.jpeg import jpeg_encode_progressive
    rng = np.random.default_rng(99)
    img = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8).astype(np.uint8)
    for q in (30, 85):
        base = jpeg_decode(jpeg_encode(img, quality=q, subsampling="420"))
        prog = jpeg_decode(jpeg_encode_progressive(img, quality=q,
                                                   subsampling="420"))
        assert (base == prog).all()


def test_decode_image_accepts_progressive():
    from avecado_spark.functions.jpeg import jpeg_encode_progressive
    from avecado_spark.sources.multimodal import decode_image
    img = _gradient(20, 28)
    dec = decode_image(jpeg_encode_progressive(img, quality=92), 0, 0)
    assert dec.shape == (20, 28, 3)
    assert _psnr(img, dec) >= 40.0


# ---------------------------------------------------------------------------
# adversarial robustness: malformed/truncated streams fail loudly and fast
# ---------------------------------------------------------------------------

@given(st.integers(0, 10**6), st.integers(1, 400))
@settings(max_examples=30, deadline=None)
def test_truncated_jpeg_raises_cleanly(seed, cut):
    """Any truncation of a valid stream must raise (ValueError /
    NotImplementedError / struct.error / IndexError) — never hang, never
    return silently-wrong pixels of the wrong shape."""
    import struct as _st
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8).astype(np.uint8)
    enc = jpeg_encode(img, quality=80)
    cut = min(cut, len(enc) - 3)
    try:
        out = jpeg_decode(enc[:len(enc) - cut])
        # decoding may succeed if only trailing EOI/pad was cut — then
        # the shape must still be right
        assert out.shape == (16, 16, 3)
    except (ValueError, NotImplementedError, _st.error, IndexError):
        pass


@given(st.integers(0, 10**6))
@settings(max_examples=30, deadline=None)
def test_random_bytes_never_hang_mvt_or_jpeg(seed):
    import struct as _st
    from avecado_spark.functions import mvt
    rng = np.random.default_rng(seed)
    blob = bytes(rng.integers(0, 256, 400, dtype=np.uint8))
    try:
        jpeg_decode(b"\xff\xd8" + blob)
    except (ValueError, NotImplementedError, _st.error, IndexError, KeyError):
        pass
    try:
        mvt.decode_tile(blob)
    except Exception as e:
        assert not isinstance(e, (MemoryError, RecursionError))


def test_multiscan_baseline_raises_loudly():
    """A spec-valid baseline JPEG may split components across scans; this
    decoder handles only single-scan baseline, and must say so rather than
    silently returning the first scan's components (r04 advisor). Rewrite
    the 3-component SOS header to cover 1 component; the guard fires
    before entropy decode, so the stale entropy bytes are never read."""
    img = _gradient(16, 16)
    enc = bytearray(jpeg_encode(img))
    sos = enc.find(b"\xff\xda")
    assert sos >= 0 and enc[sos + 4] == 3          # len(2 bytes), then ns=3
    # original segment: len(2) ns(1) 3*(cs,tdta) ss se ahal = 12 bytes
    body = enc[sos + 2:sos + 14]
    new_body = bytes([0, 8, 1]) + bytes(body[3:5]) + bytes(body[9:12])
    enc[sos + 2:sos + 14] = new_body
    with pytest.raises(NotImplementedError, match="multi-scan baseline"):
        jpeg_decode(bytes(enc))


def test_wav_g711_mulaw_alaw_decode():
    """WAV format codes 6 (A-law) / 7 (mu-law): ITU-T G.711 expansion —
    anchors from the published reference expansion (mu: 0xFF/0x7F are the
    two zeros, 0x00/0x80 the extremes at 16-bit scale +-32124; A-law has
    no true zero — 0xD5 -> +8, 0x55 -> -8, extremes +-32256) and the
    container path decodes a full byte ramp through wav_decode."""
    import struct

    import numpy as np

    from avecado_spark.sources.multimodal import _G711_TABLES, wav_decode

    mu, al = _G711_TABLES[7], _G711_TABLES[6]
    assert mu[0xFF] == 0 and mu[0x7F] == 0
    assert mu[0x00] == -32124 and mu[0x80] == 32124
    assert al[0xD5] == 8 and al[0x55] == -8
    assert al.max() == 32256 and al.min() == -32256
    # companding is symmetric: decode(b) == -decode(b ^ 0x80)
    b = np.arange(256)
    assert np.array_equal(mu[b], -mu[b ^ 0x80])
    assert np.array_equal(al[b], -al[b ^ 0x80])

    for code, table in ((7, mu), (6, al)):
        body = bytes(range(256))
        wav = (b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
               + b"fmt " + struct.pack("<I", 16)
               + struct.pack("<HHIIHH", code, 1, 8000, 8000, 1, 8)
               + b"data" + struct.pack("<I", len(body)) + body)
        s, rate = wav_decode(wav)
        assert rate == 8000
        assert np.array_equal(s, table[np.arange(256)])


def test_wav_ima_adpcm_decode():
    """IMA/DVI ADPCM (WAV tag 0x11): hand-pinned reconstruction steps
    against the published algorithm, block/stereo structure, and the
    wav_decode integration."""
    import numpy as np

    from avecado_spark.sources.multimodal import (_ima_step,
                                                  ima_adpcm_decode,
                                                  ima_adpcm_encode,
                                                  wav_decode)

    # hand-computed from the spec tables: state (pred=0, idx=0, step=7)
    assert _ima_step(0, 0, 6) == (10, 6)        # +7+3, index += 6
    assert _ima_step(0, 0, 0) == (0, 0)         # vpdiff = 7>>3 = 0
    assert _ima_step(0, 0, 15) == (-11, 8)      # sign bit, -(7+3+1)
    p, i = _ima_step(-32000, 80, 15)
    assert p == -32768 and i == 88               # clamps: int16 min, idx 88

    # structural: first sample of every block is the header predictor
    t = np.arange(2000)
    x = (3000 * np.sin(t / 20)).astype(np.int16)
    payload = ima_adpcm_encode(x, 8000, samples_per_block=505)
    mono, rate = wav_decode(payload)
    assert rate == 8000
    assert len(mono) >= len(x)
    assert mono[0] == x[0] and mono[505] == x[505]   # block headers exact
    # tracking quality: smooth signal reconstructs closely (lossy bound)
    err = np.abs(mono[:len(x)].astype(np.int64) - x.astype(np.int64))
    assert float(err.mean()) < 200 and int(err.max()) < 2000

    # stereo: channels decode independently and interleave correctly
    left = (2000 * np.sin(t / 15)).astype(np.int16)
    right = (1500 * np.cos(t / 25)).astype(np.int16)
    st = np.stack([left, right], axis=1)
    payload2 = ima_adpcm_encode(st, 16000, samples_per_block=505)
    # decode raw blocks (bypass downmix) to check per-channel tracking
    pos, fmtsz = 12, None
    data = block_align = None
    while pos + 8 <= len(payload2):
        tag = payload2[pos:pos + 4]
        sz = int.from_bytes(payload2[pos + 4:pos + 8], "little")
        if tag == b"fmt ":
            block_align = int.from_bytes(payload2[pos + 20:pos + 22],
                                         "little")
        elif tag == b"data":
            data = payload2[pos + 8:pos + 8 + sz]
        pos += 8 + sz + (sz & 1)
    dec = ima_adpcm_decode(data, 2, block_align)
    for c, ref in ((0, left), (1, right)):
        e = np.abs(dec[:len(t), c].astype(np.int64) - ref.astype(np.int64))
        assert float(e.mean()) < 200, c
    # wav_decode downmixes the same payload to mono
    mono2, _ = wav_decode(payload2)
    assert len(mono2) == len(dec)
