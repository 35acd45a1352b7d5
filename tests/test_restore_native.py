"""The in-process native restore tools are byte-identical to the Python
loops.

`cvsim vhsled|frameblend|filmac` delegates its whole decode -> kernel ->
encode loop to `cvsim-av <tool>` (native/avio.cpp cmd_tool) when the
native binary exists — the reference binaries' one-address-space cost
class (ffmpeg_vhsled.cpp:838-977, frameblend.cpp:929-1081,
filmac.cpp:842-1010).  The native loops call the same hostpix.cpp kernels
the Python fallback uses through ctypes and mirror cli/tools.py's loop
logic statement-for-statement, so with a .y4m output the two paths must
produce the SAME BYTES — header included.  Any divergence in the
frameblend weights port, the filmac level IIR, scaling constants, gamma
tables, chroma subsampling, or cadence shows here as a byte diff.
"""

from __future__ import annotations

import os
from fractions import Fraction

import numpy as np
import pytest

from cvsim_tpu.cli.main import main
from cvsim_tpu.host import ffmpeg_pipe, y4m

pytestmark = pytest.mark.skipif(ffmpeg_pipe.av_tool() is None,
                                reason="cvsim-av unavailable")


def _write_clip(path, n=10, h=240, w=360, fps=Fraction(30000, 1001),
                colorspace="420jpeg"):
    hdr = y4m.Y4MHeader(width=w, height=h, fps=fps, interlacing="p",
                        aspect="4:3", colorspace=colorspace)
    rng = np.random.RandomState(3)
    ch, cw = hdr.chroma_shape
    with open(path, "wb") as f:
        wr = y4m.Y4MWriter(f, hdr)
        for k in range(n):
            yp = np.full((h, w), 32, np.uint8)
            for row in range(h):
                sh = 8 + int(6 * np.sin(row * 0.05 + k * 0.3))
                yp[row, sh:sh + w - 60] = 80 + ((row * 3 + k * 11) % 120)
            up = rng.randint(90, 160, (ch, cw)).astype(np.uint8)
            vp = rng.randint(90, 160, (ch, cw)).astype(np.uint8)
            wr.write(yp, up, vp)
    return str(path)


def _both_paths(tmp_path, argv, src):
    """(native_bytes, python_bytes) for one tool invocation, y4m out."""
    o_nat = str(tmp_path / "nat.y4m")
    o_py = str(tmp_path / "py.y4m")
    assert main(argv + ["-i", src, "-o", o_nat]) == 0
    os.environ["CVSIM_NO_NATIVE_TOOL"] = "1"
    try:
        assert main(argv + ["-i", src, "-o", o_py]) == 0
    finally:
        del os.environ["CVSIM_NO_NATIVE_TOOL"]
    with open(o_nat, "rb") as f:
        nat = f.read()
    with open(o_py, "rb") as f:
        py = f.read()
    return nat, py


@pytest.mark.parametrize("argv", [
    ["vhsled"],
    ["vhsled", "-underscan", "10"],
    ["vhsled", "-width", "300", "-height", "200"],
    ["filmac"],
    ["filmac", "-gamma", "vga"],
    ["frameblend", "-or", "24"],
    ["frameblend", "-or", "24", "-sqnr"],
    ["frameblend", "-or", "20", "-fa", "2", "-ffa", "-gamma", "2.2"],
    ["frameblend", "-or", "24", "-422"],
    ["frameblend", "-or", "60000:1001"],   # upconversion cadence
], ids=lambda a: "-".join(a))
def test_native_matches_python_bytes(tmp_path, argv):
    src = _write_clip(tmp_path / "in.y4m")
    nat, py = _both_paths(tmp_path, argv, src)
    assert nat == py


def test_native_matches_python_422_input(tmp_path):
    # .y4m inputs keep their native chroma layout on both paths
    # (Y4MReader direct read vs VDecoder keep_chroma)
    src = _write_clip(tmp_path / "in422.y4m", colorspace="422")
    nat, py = _both_paths(tmp_path, ["vhsled"], src)
    assert nat == py


def test_native_matches_python_container_input(tmp_path):
    # container ingest: Python pipes through `cvsim-av decode` (-pix 420),
    # the native loop converts in-process — same decoded planes either way
    y4m_src = _write_clip(tmp_path / "in.y4m")
    src = str(tmp_path / "in.mkv")
    rc = main(["posterize", "-i", y4m_src, "-o", src, "-threshhold", "8",
               "-width", "360", "-tvstd", "ntsc"])
    assert rc == 0
    nat, py = _both_paths(tmp_path, ["filmac"], src)
    assert nat == py


def test_native_container_output_decodes_1to1(tmp_path):
    # container out goes through the in-process encoder (superfast crf16,
    # the reference's profile) — cadence must stay 1:1 with input frames
    src = _write_clip(tmp_path / "in.y4m", n=8)
    out = str(tmp_path / "out.mkv")
    assert main(["vhsled", "-i", src, "-o", out]) == 0
    r, proc = ffmpeg_pipe.open_video_reader(out)
    frames = [(y.copy(), u.copy(), v.copy()) for y, u, v in r]
    proc.stdout.close()
    proc.wait()
    assert len(frames) == 8
