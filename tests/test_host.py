"""Host layer tests: Y4M/WAV round trips, render_field vs scalar golden,
timestamp normalization, bob/interlace packing."""

import io
from fractions import Fraction

import numpy as np

import golden.ref_scalar as ref
from cvsim_tpu.host import fieldops, timing, wavio, y4m


def test_y4m_roundtrip_420():
    rng = np.random.default_rng(0)
    hdr = y4m.Y4MHeader(width=32, height=16, fps=Fraction(30000, 1001),
                        colorspace="420jpeg")
    frames = [
        (rng.integers(0, 256, (16, 32), dtype=np.uint8),
         rng.integers(0, 256, (8, 16), dtype=np.uint8),
         rng.integers(0, 256, (8, 16), dtype=np.uint8))
        for _ in range(3)
    ]
    buf = io.BytesIO()
    w = y4m.Y4MWriter(buf, hdr)
    for f in frames:
        w.write(*f)
    buf.seek(0)
    r = y4m.Y4MReader(buf)
    assert r.header.width == 32 and r.header.fps == Fraction(30000, 1001)
    got = list(r)
    assert len(got) == 3
    for (gy, gu, gv), (fy, fu, fv) in zip(got, frames):
        np.testing.assert_array_equal(gy, fy)
        np.testing.assert_array_equal(gu, fu)
        np.testing.assert_array_equal(gv, fv)


def test_y4m_roundtrip_422(tmp_path):
    rng = np.random.default_rng(1)
    hdr = y4m.Y4MHeader(width=32, height=16, colorspace="422")
    p = tmp_path / "t.y4m"
    with open(p, "wb") as f:
        w = y4m.Y4MWriter(f, hdr)
        y = rng.integers(0, 256, (16, 32), dtype=np.uint8)
        u = rng.integers(0, 256, (16, 16), dtype=np.uint8)
        v = rng.integers(0, 256, (16, 16), dtype=np.uint8)
        w.write(y, u, v)
    with open(p, "rb") as f:
        got = list(y4m.Y4MReader(f))
    np.testing.assert_array_equal(got[0][1], u)


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    s = rng.integers(-32768, 32767, size=(1000, 2)).astype(np.int16)
    p = str(tmp_path / "t.wav")
    wavio.write_wav(p, s, 44100)
    got, rate = wavio.read_wav(p)
    assert rate == 44100
    np.testing.assert_array_equal(got, s)


def test_render_field_progressive_vs_golden():
    rng = np.random.default_rng(3)
    for src_h, chroma_h, dst_h in [(480, 480, 480), (240, 120, 480), (360, 360, 480)]:
        ys = rng.integers(0, 256, (src_h, 64)).astype(np.int64)
        us = rng.integers(0, 256, (chroma_h, 32)).astype(np.int64)
        vs = rng.integers(0, 256, (chroma_h, 32)).astype(np.int64)
        for parity in (0, 1):
            gy, gu, gv = fieldops.render_field(ys, us, vs, dst_h, parity)
            wy, wu, wv = ref.render_field_scalar(ys, us, vs, dst_h, parity)
            np.testing.assert_array_equal(np.asarray(gy), wy)
            np.testing.assert_array_equal(np.asarray(gu), wu)
            np.testing.assert_array_equal(np.asarray(gv), wv)


def test_render_field_interlaced_vs_golden():
    rng = np.random.default_rng(4)
    ys = rng.integers(0, 256, (480, 64)).astype(np.int64)
    us = rng.integers(0, 256, (240, 32)).astype(np.int64)
    vs = rng.integers(0, 256, (240, 32)).astype(np.int64)
    for parity in (0, 1):
        for tff in (True, False):
            for pts_delta in (0, 1, 2):
                gy, gu, gv = fieldops.render_field(
                    ys, us, vs, 480, parity, src_interlaced=True,
                    src_top_field_first=tff, pts_delta=pts_delta,
                    ticks_per_frame=2)
                wy, wu, wv = ref.render_field_scalar(
                    ys, us, vs, 480, parity, interlaced=True, tff=tff,
                    pts_delta=pts_delta, ticks_per_frame=2)
                np.testing.assert_array_equal(np.asarray(gy), wy)
                np.testing.assert_array_equal(np.asarray(gu), wu)
                np.testing.assert_array_equal(np.asarray(gv), wv)


def test_render_field_interlaced_422_vs_golden():
    """Interlaced 4:2:2 source: all planes use the LUMA row indices (chroma
    steps by 2 within the field, reference non-420 path :1109-1126) — both
    impl and oracle pinned to the same-field semantics."""
    rng = np.random.default_rng(5)
    ys = rng.integers(0, 256, (480, 64)).astype(np.int64)
    us = rng.integers(0, 256, (480, 32)).astype(np.int64)
    vs = rng.integers(0, 256, (480, 32)).astype(np.int64)
    for parity in (0, 1):
        for tff in (True, False):
            gy, gu, gv = fieldops.render_field(
                ys, us, vs, 480, parity, src_interlaced=True,
                src_top_field_first=tff, pts_delta=0, ticks_per_frame=2)
            wy, wu, wv = ref.render_field_scalar(
                ys, us, vs, 480, parity, interlaced=True, tff=tff,
                pts_delta=0, ticks_per_frame=2)
            np.testing.assert_array_equal(np.asarray(gy), wy)
            np.testing.assert_array_equal(np.asarray(gu), wu)
            np.testing.assert_array_equal(np.asarray(gv), wv)
    # the chroma index tables literally ARE the luma tables for non-420
    sy, sy2, syf, csy, csy2, csyf = fieldops.render_field_indices(
        480, 480, 480, 0, src_interlaced=True)
    np.testing.assert_array_equal(csy, sy)
    np.testing.assert_array_equal(csy2, sy2)


def test_timestamp_normalizer():
    tn = timing.TimestampNormalizer()
    assert tn.feed(10.0) == 0.0          # first packet rebases to 0
    assert abs(tn.feed(10.033) - 0.033) < 1e-9
    # backwards jump (DVD timecode reset)
    t = tn.feed(0.5)
    assert abs(t - 0.033) < 1e-9          # clock holds
    # forward jump > 5s
    t2 = tn.feed(100.0)
    assert abs(t2 - t) < 1e-9             # clamped to previous


def test_video_target_field():
    assert timing.video_target_field(None, 7) == 7
    assert timing.video_target_field(-3, 7) == 0
    assert timing.video_target_field(5, 7) == 7   # small backwards: hold
    assert timing.video_target_field(2, 7) == 2   # big backwards: jump
    assert timing.video_target_field(9, 7) == 9


def test_bob_rows():
    np.testing.assert_array_equal(
        fieldops.bob_rows(8, 1), [1, 1, 3, 3, 5, 5, 7, 7])
    np.testing.assert_array_equal(
        fieldops.bob_rows(8, 0), [0, 2, 2, 4, 4, 6, 6, 6])


def test_interleave_split_fields():
    rng = np.random.default_rng(5)
    frame = rng.integers(0, 256, (16, 8))
    top, bottom = fieldops.split_fields(np.asarray(frame))
    got = np.asarray(fieldops.interleave_fields(
        np.asarray(top), np.asarray(bottom)))
    np.testing.assert_array_equal(got, frame)
