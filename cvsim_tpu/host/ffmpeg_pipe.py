"""Gated FFmpeg-subprocess container backend.

The reference links libav* directly (ffmpeg_to_composite.cpp:34-53); this
environment has no FFmpeg libraries, so the framework speaks Y4M/WAV
natively and — when an `ffmpeg` binary exists on PATH — transparently demuxes
/ muxes arbitrary containers through subprocess pipes. Encoder settings
mirror the reference's output stream setup (H.264, gop_size=15,
max_b_frames=0, 4:3 SAR, PCM S16LE audio; :2034-2106).
"""

from __future__ import annotations

import shutil
import subprocess

from cvsim_tpu.host import y4m


def have_ffmpeg() -> bool:
    return shutil.which("ffmpeg") is not None


def open_video_reader(path: str):
    """Decode any container to a Y4M pipe. Returns (Y4MReader, Popen)."""
    proc = subprocess.Popen(
        ["ffmpeg", "-nostdin", "-v", "error", "-i", path,
         "-f", "yuv4mpegpipe", "-pix_fmt", "yuv420p", "-"],
        stdout=subprocess.PIPE)
    return y4m.Y4MReader(proc.stdout), proc


def open_video_writer(path: str, header: y4m.Y4MHeader, crf: int = 18):
    """Encode a Y4M pipe to H.264 with the reference's encoder shape."""
    proc = subprocess.Popen(
        ["ffmpeg", "-nostdin", "-v", "error", "-y",
         "-f", "yuv4mpegpipe", "-i", "-",
         "-c:v", "libx264", "-g", "15", "-bf", "0", "-crf", str(crf),
         "-aspect", "4:3", path],
        stdin=subprocess.PIPE)
    return y4m.Y4MWriter(proc.stdin, header), proc


def read_audio(path: str, rate: int, channels: int):
    """Decode + resample any audio to int16 [N, C] via ffmpeg."""
    import numpy as np

    out = subprocess.run(
        ["ffmpeg", "-nostdin", "-v", "error", "-i", path,
         "-f", "s16le", "-ac", str(channels), "-ar", str(rate), "-"],
        stdout=subprocess.PIPE, check=True)
    data = np.frombuffer(out.stdout, "<i2")
    return data.reshape(-1, channels)


def resolve_video_input(path: str):
    """Return (reader, cleanup) for a video path: native Y4M, or any
    container via ffmpeg when available."""
    if path.endswith(".y4m") or not have_ffmpeg():
        f = open(path, "rb")
        return y4m.Y4MReader(f), f.close
    reader, proc = open_video_reader(path)
    return reader, proc.terminate
