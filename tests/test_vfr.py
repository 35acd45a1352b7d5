"""VFR/telecine duration handling (reference duration map,
ffmpeg_to_composite.cpp:1641-1647, 2303-2307).

A frame log (`-video-pts-in`) carries per-frame (pts, duration); the field
clock renders each frame for its own duration instead of the container's
constant cadence — the rebuild's version of the reordered_opaque ->
AVDelayedFrameInfo map that keeps telecined DVDs in sync.
"""

from fractions import Fraction

import numpy as np

from cvsim_tpu.cli.main import main
from cvsim_tpu.host import timing, y4m

FIELD_RATE = Fraction(60000, 1001)
TICKS = 60000                 # 1001 ticks per 59.94 field


def _write_const_clip(path, values, w=64, h=48):
    hdr = y4m.Y4MHeader(width=w, height=h, fps=Fraction(24000, 1001))
    with open(path, "wb") as f:
        wr = y4m.Y4MWriter(f, hdr)
        for val in values:
            wr.write(np.full((h, w), val, np.uint8),
                     np.full((h // 2, w // 2), 128, np.uint8),
                     np.full((h // 2, w // 2), 128, np.uint8))


def _expected_fields(durs):
    """Reference duration-map targeting: frame k covers output fields
    [round(pts_k * fr / rate), round((pts_k + dur_k) * fr / rate))."""
    clock = timing.FrameClock(Fraction(24000, 1001), FIELD_RATE,
                              log=_log_entries(durs), log_rate=TICKS)
    seq = []
    for k in range(len(durs)):
        s, e = clock.fields(k, 0)
        seq.extend([k] * (e - s))
    return seq


def _log_entries(durs):
    pts, entries = 0, []
    for d in durs:
        entries.append((pts, d))
        pts += d
    return entries


def test_telecine_32_pulldown(tmp_path):
    """3:2 pulldown durations (2002/3003 ticks alternating): each source
    frame must land in exactly its own 2 or 3 output fields — a constant
    24fps cadence would drift off this sequence within a few frames."""
    durs = [2002, 3003] * 4               # 8 film frames -> 20 fields
    values = [20 + 10 * k for k in range(len(durs))]
    src = str(tmp_path / "in.y4m")
    _write_const_clip(src, values)
    log = tmp_path / "frames.pts"
    log.write_text(f"rate {TICKS}\n" + "\n".join(
        f"{p} {d}" for p, d in _log_entries(durs)) + "\n")
    out = str(tmp_path / "out.y4m")
    rc = main(["to-composite", "-i", src, "-o", out, "-nocomp",
               "-video-pts-in", str(log), "-width", "64"])
    assert rc == 0

    with open(out, "rb") as f:
        frames = list(y4m.Y4MReader(f))
    expect = _expected_fields(durs)
    assert expect == [0, 0, 1, 1, 1, 2, 2, 3, 3, 3,
                      4, 4, 5, 5, 5, 6, 6, 7, 7, 7]
    assert len(frames) == len(expect)
    for j, (fy, fu, fv) in enumerate(frames):
        vals = np.unique(fy)
        assert vals.size == 1, f"field {j} not constant"
        assert vals[0] == values[expect[j]], (
            f"field {j}: got {vals[0]}, want frame {expect[j]}")


def test_vfr_without_log_is_cfr(tmp_path):
    """Same clip, no log: the 24000/1001 header fps pulls 2.4977 fields per
    frame on average — a DIFFERENT sequence (proves the log is load-bearing)."""
    durs = [2002, 3003] * 4
    values = [20 + 10 * k for k in range(len(durs))]
    src = str(tmp_path / "in.y4m")
    _write_const_clip(src, values)
    out = str(tmp_path / "out.y4m")
    rc = main(["to-composite", "-i", src, "-o", out, "-nocomp",
               "-width", "64"])
    assert rc == 0
    with open(out, "rb") as f:
        frames = list(y4m.Y4MReader(f))
    got = [int(np.unique(fy)[0]) for fy, _, _ in frames]
    want_vfr = [values[k] for k in _expected_fields(durs)]
    assert got != want_vfr


def test_frameclock_adj_time_repair():
    """Backward >1.5s and forward >5s pts jumps are compensated (the demux
    pump's adj_time, :2249-2293): field targets stay continuous."""
    rate = 90000
    fr = FIELD_RATE
    dur = 1501            # ~one field
    log = []
    pts = 0
    for k in range(10):
        if k == 4:
            pts += 90000 * 100    # +100s forward jump (timecode break)
        if k == 7:
            pts -= 90000 * 50     # -50s backward jump
        log.append((pts, dur))
        pts += dur
    clock = timing.FrameClock(Fraction(30000, 1001), fr, log=log,
                              log_rate=rate)
    starts = [clock.fields(k, 0)[0] for k in range(10)]
    # repaired: monotonically advancing by ~1 field, no 6000-field cliff
    diffs = np.diff(starts)
    assert (diffs >= 0).all() and diffs.max() <= 2


def test_frameclock_log_shorter_than_stream():
    """Frames past the log's coverage extend by the last duration."""
    clock = timing.FrameClock(Fraction(30000, 1001), FIELD_RATE,
                              log=[(0, 2002), (2002, 2002)], log_rate=TICKS)
    s, e = clock.fields(5, 0)
    assert (s, e) == (10, 12)


def test_frame_clock_seconds_rebased_to_stream_start():
    """A log starting at a nonzero container pts (MPEG-TS offset) must not
    shift the -ss/-se window: seconds() is stream-relative."""
    from fractions import Fraction

    from cvsim_tpu.host import timing

    base = 126_000_000           # 1400 s at 90 kHz
    log = [(base + k * 3003, 3003) for k in range(10)]
    clock = timing.FrameClock(Fraction(30000, 1001), Fraction(60000, 1001),
                              log=log, log_rate=90000)
    assert clock.seconds(0) == 0.0
    assert abs(clock.seconds(3) - 3 * 3003 / 90000) < 1e-9
