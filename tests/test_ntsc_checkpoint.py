"""Gen-2 (ntsc) checkpoint/resume + -video-pts-in (VERDICT r4 #4).

Round 4 left the framework's own headline extensions gen-1-only: `cvsim
ntsc` hard-rejected -checkpoint and -video-pts-in. These tests pin the
gen-2 versions: kill-and-resume is byte-identical (content-addressed noise
+ pure-function field clock — host/checkpoint.py contract), and a
3:2-pulldown frame log drives the YIQ path's per-frame field targeting
(reference duration map, ffmpeg_to_composite.cpp:1641-1647, applied to the
gen-2 master loop ffmpeg_ntsc.cpp:2146-2283).
"""

import os
from fractions import Fraction

import numpy as np
import pytest

from cvsim_tpu.host import checkpoint, timing, y4m
from cvsim_tpu.host.pipeline_yiq import YIQPipeline
from cvsim_tpu.presets import parse_composite_flags
from tests.test_cli import W, main, make_clip, read_all

FLAGS = ["-width", str(W), "-vhs", "-vhs-speed", "ep", "-seed", "3"]


def _run(src, out, ckpt_path=None, gop=4, fail_after=None, flags=FLAGS,
         mode="wb", frame_log=None, log_rate=90000):
    st = parse_composite_flags(list(flags), gen2=True)
    cfg = st.to_run_config(gen1=False)
    pipe = YIQPipeline(cfg, gop=gop, progress=False)
    with open(src, "rb") as fin, open(out, mode) as fout:
        return pipe.run_video([y4m.Y4MReader(fin)], fout,
                              ckpt_path=ckpt_path, ckpt_every=1,
                              frame_log=frame_log, frame_log_rate=log_rate,
                              _fail_after_gops=fail_after)


def _assert_same(a_path, b_path):
    g = read_all(a_path)[1]
    r = read_all(b_path)[1]
    assert len(g) == len(r)
    for fg, fr in zip(g, r):
        np.testing.assert_array_equal(fg[0], fr[0])
        np.testing.assert_array_equal(fg[1], fr[1])
        np.testing.assert_array_equal(fg[2], fr[2])


def test_crash_resume_bit_identical_ntsc(tmp_path):
    src = make_clip(str(tmp_path / "in.y4m"), frames=10)
    golden = str(tmp_path / "golden.y4m")
    _run(src, golden)

    out = str(tmp_path / "out.y4m")
    ck = str(tmp_path / "out.y4m.ckpt")
    with pytest.raises(RuntimeError, match="injected"):
        _run(src, out, ckpt_path=ck, fail_after=2)
    meta, _ = checkpoint.load(ck)
    assert meta["next_field"] == 8          # 2 GOPs of 4 fields written
    assert meta["frames_written"] == 8      # bobbed: 1 frame per field
    partial = read_all(out)[1]
    assert len(partial) >= meta["frames_written"]

    fields = _run(src, out, ckpt_path=ck, mode="r+b")
    assert fields == 20
    assert not os.path.exists(ck)           # cleared on success
    _assert_same(golden, out)


def test_mismatched_checkpoint_starts_over_ntsc(tmp_path):
    src = make_clip(str(tmp_path / "in.y4m"), frames=6)
    out = str(tmp_path / "out.y4m")
    ck = str(tmp_path / "out.y4m.ckpt")
    with pytest.raises(RuntimeError, match="injected"):
        _run(src, out, ckpt_path=ck, fail_after=1)
    # different seed => hash mismatch => full restart, full output
    other = list(FLAGS)
    other[other.index("-seed") + 1] = "7"
    fields = _run(src, out, ckpt_path=ck, flags=other, mode="r+b")
    assert fields == 12
    golden = str(tmp_path / "golden.y4m")
    _run(src, golden, flags=other)
    _assert_same(golden, out)


def test_checkpoint_cli_flag_ntsc(tmp_path):
    """-checkpoint through the real `cvsim ntsc` CLI: a completed run
    leaves no ckpt; rerunning the same command resumes from a planted
    mid-stream checkpoint and matches the uninterrupted output."""
    src = make_clip(str(tmp_path / "in.y4m"), frames=6)
    out = str(tmp_path / "out.y4m")
    args = ["ntsc", "-i", src, "-o", out, "-width", str(W),
            "-seed", "5", "-checkpoint"]
    rc = main(args)
    assert rc == 0
    assert not os.path.exists(out + ".ckpt")
    golden = read_all(out)[1]
    assert len(golden) == 12

    # plant a real mid-run checkpoint by crashing a direct pipeline run,
    # then resume through the CLI
    with pytest.raises(RuntimeError, match="injected"):
        _run(src, out, ckpt_path=out + ".ckpt", fail_after=1,
             flags=["-width", str(W), "-seed", "5"])
    rc = main(args)
    assert rc == 0
    assert not os.path.exists(out + ".ckpt")
    resumed = read_all(out)[1]
    assert len(resumed) == len(golden)
    for fg, fr in zip(golden, resumed):
        np.testing.assert_array_equal(fg[0], fr[0])


TICKS = 60000


def _write_const_clip(path, values, w=64, h=48):
    hdr = y4m.Y4MHeader(width=w, height=h, fps=Fraction(24000, 1001))
    with open(path, "wb") as f:
        wr = y4m.Y4MWriter(f, hdr)
        for val in values:
            wr.write(np.full((h, w), val, np.uint8),
                     np.full((h // 2, w // 2), 128, np.uint8),
                     np.full((h // 2, w // 2), 128, np.uint8))


def test_telecine_32_pulldown_ntsc(tmp_path):
    """3:2 pulldown durations through `cvsim ntsc -video-pts-in`: each film
    frame must land in exactly its own 2 or 3 output fields (the gen-1
    cadence test, tests/test_vfr.py, on the YIQ path)."""
    durs = [2002, 3003] * 4               # 8 film frames -> 20 fields
    values = [20 + 10 * k for k in range(len(durs))]
    src = str(tmp_path / "in.y4m")
    _write_const_clip(src, values)
    pts, entries = 0, []
    for d in durs:
        entries.append((pts, d))
        pts += d
    log = tmp_path / "frames.pts"
    log.write_text(f"rate {TICKS}\n" + "\n".join(
        f"{p} {d}" for p, d in entries) + "\n")
    out = str(tmp_path / "out.y4m")
    rc = main(["ntsc", "-i", src, "-o", out, "-nocomp",
               "-video-pts-in", str(log), "-width", "64"])
    assert rc == 0

    clock = timing.FrameClock(Fraction(24000, 1001),
                              Fraction(60000, 1001), log=entries,
                              log_rate=TICKS)
    expect = []
    for k in range(len(durs)):
        s, e = clock.fields(k, 0)
        expect.extend([k] * (e - s))
    assert expect == [0, 0, 1, 1, 1, 2, 2, 3, 3, 3,
                      4, 4, 5, 5, 5, 6, 6, 7, 7, 7]
    frames = read_all(out)[1]
    assert len(frames) == len(expect)
    for j, (fy, fu, fv) in enumerate(frames):
        vals = np.unique(fy)
        assert vals.size == 1, f"field {j} not constant"
        assert vals[0] == values[expect[j]], (
            f"field {j}: got {vals[0]}, want frame {expect[j]}")
