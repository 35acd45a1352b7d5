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

    def cleanup():
        proc.stdout.close()
        proc.wait()

    return reader, cleanup


def resolve_video_output(path: str, *, mux_wav: str | None = None,
                         interlaced: bool = False, crf: int = 18):
    """Return (out_stream, finalize) for a video output path.

    `.y4m` (or no ffmpeg binary): a plain file the pipeline writes Y4M into.
    Anything else: an ffmpeg encode process shaped like the reference's
    output setup (H.264 gop 15, no B-frames, 4:3 SAR, optional interlaced
    DCT; ffmpeg_to_composite.cpp:2067-2106), optionally muxing a processed
    WAV as PCM S16LE alongside (:2034-2065) so the tool emits ONE container
    with both streams, like every reference video tool."""
    if path.endswith(".y4m") or not have_ffmpeg():
        f = open(path, "wb")
        return f, f.close
    cmd = ["ffmpeg", "-nostdin", "-v", "error", "-y",
           "-f", "yuv4mpegpipe", "-i", "-"]
    if mux_wav is not None:
        cmd += ["-i", mux_wav, "-c:a", "pcm_s16le", "-shortest"]
    cmd += ["-c:v", "libx264", "-g", "15", "-bf", "0", "-crf", str(crf),
            "-aspect", "4:3"]
    if interlaced:
        cmd += ["-flags", "+ildct"]
    cmd += [path]
    proc = subprocess.Popen(cmd, stdin=subprocess.PIPE)

    def finalize():
        proc.stdin.close()
        rc = proc.wait()
        if rc:
            raise RuntimeError(f"ffmpeg encoder exited with {rc}")

    return proc.stdin, finalize


def resolve_audio_input(path: str, rate: int, channels: int):
    """Return int16 samples [N, C] at (rate, channels): native WAV (any
    rate/layout, resampled downstream), or any container via ffmpeg."""
    import numpy as np

    if path.endswith(".wav") or not have_ffmpeg():
        from cvsim_tpu.host import wavio

        return wavio.read_wav(path)
    return read_audio(path, rate, channels), rate
