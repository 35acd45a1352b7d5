"""ffmpeg-pipe backend tests against the stub binary (tests/ffmpeg_stub.py).

Round 1 shipped this backend gated-and-untested (no ffmpeg in the image);
here a PATH shim that speaks the exact invocation shapes exercises
open_video_reader/writer, read_audio, resolve_* and the CLI's muxed
container output end-to-end.
"""

from __future__ import annotations

import os
import stat
import struct
import subprocess
import sys
from fractions import Fraction

import numpy as np
import pytest

from cvsim_tpu.host import ffmpeg_pipe, wavio, y4m

STUB = os.path.join(os.path.dirname(__file__), "ffmpeg_stub.py")
MAGIC = b"CVSIMFAKE\n"


@pytest.fixture
def with_ffmpeg_stub(tmp_path, monkeypatch):
    sh = tmp_path / "bin" / "ffmpeg"
    sh.parent.mkdir()
    sh.write_text(f"#!/bin/sh\nexec {sys.executable} {STUB} \"$@\"\n")
    sh.chmod(sh.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{sh.parent}{os.pathsep}{os.environ['PATH']}")
    getattr(ffmpeg_pipe.have_ffmpeg, 'cache_clear', lambda: None)()
    # force the ffmpeg-binary fallback: when the native cvsim-av backend
    # builds (test_native_av.py covers it), it would otherwise win
    monkeypatch.setattr(ffmpeg_pipe, "av_tool", lambda: None)
    return sh


def _read_sections(path):
    blob = open(path, "rb").read()
    assert blob.startswith(MAGIC)
    sections, pos = {}, len(MAGIC)
    while pos < len(blob):
        tag = blob[pos:pos + 4]
        (n,) = struct.unpack(">Q", blob[pos + 4:pos + 12])
        sections[tag] = blob[pos + 12:pos + 12 + n]
        pos += 12 + n
    return sections


def _write_fake_container(path, *, y4m_bytes=None, wav_bytes=None):
    with open(path, "wb") as f:
        f.write(MAGIC)
        for tag, payload in ((b"vid0", y4m_bytes), (b"aud0", wav_bytes)):
            if payload is not None:
                f.write(tag + struct.pack(">Q", len(payload)) + payload)


def _y4m_bytes(frames=3, w=64, h=32, seed=0):
    import io

    rng = np.random.default_rng(seed)
    buf = io.BytesIO()
    wr = y4m.Y4MWriter(buf, y4m.Y4MHeader(
        width=w, height=h, fps=Fraction(30000, 1001)))
    planes = []
    for _ in range(frames):
        y = rng.integers(16, 236, size=(h, w)).astype(np.uint8)
        u = rng.integers(16, 241, size=(h // 2, w // 2)).astype(np.uint8)
        v = rng.integers(16, 241, size=(h // 2, w // 2)).astype(np.uint8)
        wr.write(y, u, v)
        planes.append((y, u, v))
    return buf.getvalue(), planes


def test_stub_on_path(with_ffmpeg_stub):
    assert ffmpeg_pipe.have_ffmpeg()
    out = subprocess.run(["ffmpeg", "-i", "x", "-badmode"],
                         capture_output=True)
    assert out.returncode == 2


def test_video_input_via_pipe(with_ffmpeg_stub, tmp_path):
    raw, planes = _y4m_bytes()
    src = tmp_path / "in.mkv"
    _write_fake_container(src, y4m_bytes=raw)
    reader, cleanup = ffmpeg_pipe.resolve_video_input(str(src))
    got = list(reader)
    cleanup()
    assert len(got) == len(planes)
    for (gy, gu, gv), (wy, wu, wv) in zip(got, planes):
        np.testing.assert_array_equal(gy, wy)
        np.testing.assert_array_equal(gu, wu)
        np.testing.assert_array_equal(gv, wv)


def test_native_y4m_bypasses_ffmpeg(with_ffmpeg_stub, tmp_path):
    raw, planes = _y4m_bytes()
    src = tmp_path / "in.y4m"
    src.write_bytes(raw)
    reader, cleanup = ffmpeg_pipe.resolve_video_input(str(src))
    assert len(list(reader)) == len(planes)
    cleanup()


def test_video_output_encoder_shape(with_ffmpeg_stub, tmp_path):
    raw, planes = _y4m_bytes(frames=2)
    dst = tmp_path / "out.mkv"
    stream, finalize = ffmpeg_pipe.resolve_video_output(str(dst),
                                                        interlaced=True)
    stream.write(raw)
    finalize()
    sections = _read_sections(dst)
    assert sections[b"vid0"] == raw
    argline = sections[b"arg0"].decode()
    # the reference's encoder shape (ffmpeg_to_composite.cpp:2067-2106)
    assert "-g 15" in argline and "-bf 0" in argline
    assert "-aspect 4:3" in argline and "+ildct" in argline


def test_audio_input_via_pipe(with_ffmpeg_stub, tmp_path):
    rng = np.random.default_rng(1)
    samples = rng.integers(-3000, 3000, size=(4096, 2)).astype(np.int16)
    wav = tmp_path / "raw.wav"
    wavio.write_wav(str(wav), samples, 44100)
    src = tmp_path / "in.mka"
    _write_fake_container(src, wav_bytes=wav.read_bytes())
    got, rate = ffmpeg_pipe.resolve_audio_input(str(src), 44100, 2)
    assert rate == 44100
    np.testing.assert_array_equal(got, samples)


def test_cli_muxed_av_output(with_ffmpeg_stub, tmp_path):
    """`cvsim to-composite -i in.y4m -audio-in in.wav -o out.mkv` must emit
    ONE container holding H.264-shaped video and processed PCM audio."""
    from cvsim_tpu.cli.main import main as cvsim_main

    raw, _ = _y4m_bytes(frames=4, w=64, h=32)
    src = tmp_path / "in.y4m"
    src.write_bytes(raw)
    rng = np.random.default_rng(2)
    samples = (2000 * np.sin(np.arange(8192) / 8.0)).astype(np.int16)
    samples = np.stack([samples, samples], -1)
    wav = tmp_path / "in.wav"
    wavio.write_wav(str(wav), samples, 44100)
    out = tmp_path / "out.mkv"

    rc = cvsim_main(["to-composite", "-i", str(src), "-audio-in", str(wav),
                     "-o", str(out)])
    assert rc == 0
    sections = _read_sections(out)
    argline = sections[b"arg0"].decode()
    assert "-c:a pcm_s16le" in argline and "-g 15" in argline

    # video payload is valid Y4M at output geometry
    import io

    frames = list(y4m.Y4MReader(io.BytesIO(sections[b"vid0"])))
    assert len(frames) == 8           # 4 frames -> 8 bob fields
    assert frames[0][0].shape == (480, 720)   # reference default raster

    # audio stream is present, same length, and actually processed
    adata = sections[b"aud0"]
    atmp = tmp_path / "muxed.wav"
    atmp.write_bytes(adata)
    got, rate = wavio.read_wav(str(atmp))
    assert rate == 44100
    assert got.shape == samples.shape
    assert not np.array_equal(got, samples)


def test_cli_sidecar_wav_still_wins(with_ffmpeg_stub, tmp_path):
    """-audio-out keeps sidecar semantics even when ffmpeg exists."""
    from cvsim_tpu.cli.main import main as cvsim_main

    samples = (1500 * np.sin(np.arange(4096) / 5.0)).astype(np.int16)
    samples = np.stack([samples, samples], -1)
    wav = tmp_path / "in.wav"
    wavio.write_wav(str(wav), samples, 44100)
    aout = tmp_path / "out.wav"
    rc = cvsim_main(["to-composite", "-audio-in", str(wav),
                     "-audio-out", str(aout)])
    assert rc == 0
    got, rate = wavio.read_wav(str(aout))
    assert got.shape == samples.shape
