"""ctypes binding for the native host runtime (libhostio).

Builds the shared library on first use with g++ (no pip deps). Falls back to
a NumPy implementation when no compiler is available (slower, same results).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading

# numpy imports lazily inside the classes that need it: build_av_tool()
# serves the numpy-free restore-tool fast path (cli/toolargs.py), where
# the numpy import alone costs ~0.3 s of a one-shot process

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "hostio.cpp")
_LIB = os.path.join(_DIR, "libhostio.so")
_lock = threading.Lock()
_lib = None

_AV_SRC = os.path.join(_DIR, "avio.cpp")
_AV_PIX_SRC = os.path.join(_DIR, "hostpix.cpp")  # restore-tool kernels,
# compiled into cvsim-av so the in-process tool loops share the exact
# pixel implementation the Python fallback dlopens (libhostpix.so)
_AV_BIN = os.path.join(_DIR, "cvsim-av")
_AV_LIBS = ["-lavformat", "-lavcodec", "-lavutil", "-lswscale",
            "-lswresample"]
_av_lock = threading.Lock()
_av_state: list = []  # [path | None] once resolved


def build_av_tool() -> str | None:
    """Path to the cvsim-av container-I/O binary (native/avio.cpp), built
    on first use against the system FFmpeg libraries.  None when g++ or
    the libav* dev libraries are unavailable (the framework then falls
    back to an `ffmpeg` binary on PATH, or native Y4M/WAV only)."""
    with _av_lock:
        if _av_state:
            return _av_state[0]
        path = None
        try:
            if (not os.path.exists(_AV_BIN) or os.path.getmtime(_AV_BIN)
                    < max(os.path.getmtime(_AV_SRC),
                          os.path.getmtime(_AV_PIX_SRC))):
                # build to a private temp name, then atomically rename:
                # concurrent processes (parallel CLI runs, daemon + client)
                # must never exec a half-linked binary or collide on the
                # shared output path.  hostpix.cpp's flags are load-bearing
                # (-ffp-contract=off: FMA would change the f32 results vs
                # numpy; see hostpix.py _load); -march=native vectorizes
                # rintf, with a portable fallback.
                tmp = f"{_AV_BIN}.tmp.{os.getpid()}"
                base = ["g++", "-O3", "-ffp-contract=off",
                        "-fno-math-errno", "-o", tmp, _AV_SRC,
                        _AV_PIX_SRC] + _AV_LIBS
                try:
                    subprocess.run(base[:1] + ["-march=native"] + base[1:],
                                   check=True, capture_output=True)
                except subprocess.CalledProcessError:
                    subprocess.run(base, check=True, capture_output=True)
                os.replace(tmp, _AV_BIN)
            path = _AV_BIN
        except subprocess.CalledProcessError as e:
            print("cvsim: cvsim-av build failed (container I/O limited to "
                  "Y4M/WAV + ffmpeg-on-PATH):\n"
                  + e.stderr.decode(errors="replace")[-800:],
                  file=sys.stderr)
            path = None
        except OSError:
            path = None
        _av_state.append(path)
        return path


class _HsyncDcStateStruct(ctypes.Structure):
    _fields_ = [
        ("filt_prev", ctypes.c_double * 3),
        ("alpha", ctypes.c_double),
        ("dc_level", ctypes.c_double),
        ("a_fast", ctypes.c_double),
        ("a_slow", ctypes.c_double),
        ("delay_len", ctypes.c_int),
        ("delay_pos", ctypes.c_int),
        ("delay", ctypes.c_uint8 * 4096),
    ]


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC],
                check=True)
        lib = ctypes.CDLL(_LIB)
        lib.hsync_dc_init.argtypes = [
            ctypes.POINTER(_HsyncDcStateStruct), ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_int,
            ctypes.c_double, ctypes.c_long]
        lib.hsync_dc_process.argtypes = [
            ctypes.POINTER(_HsyncDcStateStruct), ctypes.c_void_p,
            ctypes.c_long, ctypes.c_void_p, ctypes.c_void_p]
        _lib = lib
        return lib


class HsyncDcTracker:
    """Streaming hsync DC normalizer (ffmpeg_raw28ntsc.cpp:556-598)."""

    def __init__(self, sample_rate: float, one_scanline_time: float,
                 one_frame_time: float):
        cutoff = sample_rate / (one_scanline_time * 0.075 * 0.75)
        self._native = None
        self._params = (sample_rate, cutoff,
                        1.0 / (one_scanline_time * 0.07 * 0.75),
                        1.0 / (one_frame_time * 0.6),
                        int((one_scanline_time * 0.075 * 0.75) * 0.5),
                        128.0, int(one_frame_time))
        try:
            lib = _load()
            st = _HsyncDcStateStruct()
            lib.hsync_dc_init(ctypes.byref(st), *[
                ctypes.c_double(self._params[0]),
                ctypes.c_double(self._params[1]),
                ctypes.c_double(self._params[2]),
                ctypes.c_double(self._params[3]),
                ctypes.c_int(self._params[4]),
                ctypes.c_double(self._params[5]),
                ctypes.c_long(self._params[6]),
            ])
            self._native = (lib, st)
        except Exception:
            self._init_python()

    # ---------------------------------------------------------------- python
    def _init_python(self):
        import math

        import numpy as np
        rate, cutoff, a_fast, a_slow, dlen, pre, pre_n = self._params
        dt = 1.0 / rate
        tau = 1.0 / (cutoff * 2 * math.pi)
        self._alpha = dt / (tau + dt)
        self._prev = [0.0, 0.0, 0.0]
        for _ in range(pre_n):
            lv = pre
            for i in range(3):
                self._prev[i] = lv * self._alpha + (
                    self._prev[i] - self._prev[i] * self._alpha)
                lv = self._prev[i]
        self._dc = 128.0
        self._af, self._as = a_fast, a_slow
        self._delay = np.zeros(dlen, np.uint8)
        self._dpos = 0

    def process(self, raw):
        """raw: uint8 [N]. Returns (delayed_raw uint8 [N], dc uint8 [N])."""
        import numpy as np

        raw = np.ascontiguousarray(raw, np.uint8)
        n = len(raw)
        out_raw = np.empty(n, np.uint8)
        out_dc = np.empty(n, np.uint8)
        if self._native is not None:
            lib, st = self._native
            lib.hsync_dc_process(
                ctypes.byref(st), raw.ctypes.data, ctypes.c_long(n),
                out_raw.ctypes.data, out_dc.ctypes.data)
            return out_raw, out_dc
        # slow path
        a = self._alpha
        dlen = len(self._delay)
        for k in range(n):
            lv = float(raw[k])
            for i in range(3):
                self._prev[i] = lv * a + (self._prev[i] - self._prev[i] * a)
                lv = self._prev[i]
            r = self._af if self._dc > lv else self._as
            self._dc = self._dc * (1 - r) + lv * r
            if dlen:
                out_raw[k] = self._delay[self._dpos]
                self._delay[self._dpos] = raw[k]
                self._dpos = (self._dpos + 1) % dlen
            else:
                out_raw[k] = raw[k]
            out_dc[k] = min(255, max(0, int(lv - self._dc)))
        return out_raw, out_dc
