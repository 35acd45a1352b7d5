"""Checkpoint/resume (host/checkpoint.py): a crashed run resumed from its
sidecar cursor must produce byte-identical output to an uninterrupted run.

The reference has no checkpointing (SURVEY §5); this is an original
obligation. The resumability guarantees under test: content-addressed noise
makes regenerated fields start-invariant, the black-key carry is restored
from the checkpoint, and the output is truncated to the recorded frame
boundary before appending.
"""

import numpy as np
import pytest

from cvsim_tpu.host import checkpoint, y4m
from cvsim_tpu.host.pipeline import CompositePipeline
from cvsim_tpu.presets import parse_composite_flags
from tests.test_cli import make_clip, read_all, W, main


FLAGS = ["-width", str(W), "-vhs", "-vhs-speed", "ep", "-seed", "3",
         "-bkey-feedback", "20"]


def _run(src, out, ckpt_path=None, gop=4, fail_after=None, flags=FLAGS,
         mode="wb"):
    st = parse_composite_flags(list(flags))
    cfg = st.to_run_config(gen1=True)
    pipe = CompositePipeline(cfg, gop=gop, progress=False)
    with open(src, "rb") as fin, open(out, mode) as fout:
        return pipe.run_video(y4m.Y4MReader(fin), fout,
                              ckpt_path=ckpt_path, ckpt_every=1,
                              _fail_after_gops=fail_after)


def test_crash_resume_bit_identical(tmp_path):
    src = make_clip(str(tmp_path / "in.y4m"), frames=10)
    golden = str(tmp_path / "golden.y4m")
    _run(src, golden)

    out = str(tmp_path / "out.y4m")
    ck = str(tmp_path / "out.y4m.ckpt")
    with pytest.raises(RuntimeError, match="injected"):
        _run(src, out, ckpt_path=ck, fail_after=2)
    meta, arrs = checkpoint.load(ck)
    assert meta["next_field"] == 8          # 2 GOPs of 4 fields written
    assert set(arrs) == {"fy", "fu", "fv"}
    partial = read_all(out)[1]
    assert len(partial) >= meta["frames_written"]

    fields = _run(src, out, ckpt_path=ck, mode="r+b")
    assert fields == 20
    import os
    assert not os.path.exists(ck)           # cleared on success
    g = read_all(golden)[1]
    r = read_all(out)[1]
    assert len(g) == len(r)
    for fg, fr in zip(g, r):
        np.testing.assert_array_equal(fg[0], fr[0])
        np.testing.assert_array_equal(fg[1], fr[1])
        np.testing.assert_array_equal(fg[2], fr[2])


def test_crash_resume_interlaced_output(tmp_path):
    """-vi packs field pairs; checkpoints land on frame boundaries via the
    pending-pair guard."""
    flags = FLAGS + ["-vi"]
    src = make_clip(str(tmp_path / "in.y4m"), frames=10)
    golden = str(tmp_path / "golden.y4m")
    _run(src, golden, flags=flags)
    out = str(tmp_path / "out.y4m")
    ck = str(tmp_path / "out.y4m.ckpt")
    with pytest.raises(RuntimeError, match="injected"):
        _run(src, out, ckpt_path=ck, fail_after=3, flags=flags)
    _run(src, out, ckpt_path=ck, flags=flags, mode="r+b")
    g = read_all(golden)[1]
    r = read_all(out)[1]
    assert len(g) == len(r) == 10
    for fg, fr in zip(g, r):
        np.testing.assert_array_equal(fg[0], fr[0])
        np.testing.assert_array_equal(fg[1], fr[1])


def test_mismatched_checkpoint_starts_over(tmp_path):
    src = make_clip(str(tmp_path / "in.y4m"), frames=6)
    out = str(tmp_path / "out.y4m")
    ck = str(tmp_path / "out.y4m.ckpt")
    with pytest.raises(RuntimeError, match="injected"):
        _run(src, out, ckpt_path=ck, fail_after=1)
    # different flags (seed) => hash mismatch => full restart, full output
    other = FLAGS[:-3] + ["7", "-bkey-feedback", "20"]
    assert other[FLAGS.index("-seed") + 1] == "7"
    fields = _run(src, out, ckpt_path=ck, flags=other, mode="r+b")
    assert fields == 12
    golden = str(tmp_path / "golden.y4m")
    _run(src, golden, flags=other)
    g = read_all(golden)[1]
    r = read_all(out)[1]
    assert len(g) == len(r)
    for fg, fr in zip(g, r):
        np.testing.assert_array_equal(fg[0], fr[0])


def test_checkpoint_cli_flag(tmp_path):
    """-checkpoint through the real CLI: a completed run leaves no ckpt and
    a rerun resumes cleanly from one planted mid-stream."""
    src = make_clip(str(tmp_path / "in.y4m"), frames=6)
    out = str(tmp_path / "out.y4m")
    rc = main(["to-composite", "-i", src, "-o", out, "-width", str(W),
               "-noise", "0", "-checkpoint"])
    assert rc == 0
    import os
    assert not os.path.exists(out + ".ckpt")
    _, frames = read_all(out)
    assert len(frames) == 12


def test_skip_y4m_frames(tmp_path):
    src = make_clip(str(tmp_path / "in.y4m"), frames=5)
    with open(src, "rb") as f:
        r = y4m.Y4MReader(f)
        checkpoint.skip_y4m_frames(r, 3)
        rest = list(r)
    assert len(rest) == 2
    with open(src, "rb") as f:
        allf = list(y4m.Y4MReader(f))
    np.testing.assert_array_equal(rest[0][0], allf[3][0])
    np.testing.assert_array_equal(rest[1][2], allf[4][2])
