"""Streaming pipeline driver: demux -> field clock -> batched device chain ->
pack -> mux (reference L2-L4 orchestration, ffmpeg_to_composite.cpp main
:1957-2340).

Fields are accumulated into GOP-sized device batches; the composite chain
runs once per batch (jit, async dispatch overlaps the host's next batch
assembly). The black-key feedback frame (:974-999) is the one genuinely
frame-sequential piece — it runs as a lax.scan over the batch axis with the
filter planes carried across batches on the host.
"""

from __future__ import annotations

import sys
from fractions import Fraction

import numpy as np
import jax
import jax.numpy as jnp

from cvsim_tpu.config import RunConfig
from cvsim_tpu.host import fieldops, timing, wavio, y4m
from cvsim_tpu.host.colorconv import hscale_bilinear
from cvsim_tpu.models import yuv422
from cvsim_tpu.audio import (
    buzz_pulse_counts,
    composite_audio_process,
    init_audio_state,
)


def _bkey_scan(y, u, v, fy, fu, fv, level: int):
    """Sequential black-key feedback over the batch axis inside jit."""
    def step(carry, planes):
        cfy, cfu, cfv = carry
        py, pu, pv = planes
        (oy, ou, ov), (nfy, nfu, nfv) = yuv422.black_key_feedback(
            py, pu, pv, cfy, cfu, cfv, level)
        return (nfy, nfu, nfv), (oy, ou, ov)

    (fy, fu, fv), (oy, ou, ov) = jax.lax.scan(step, (fy, fu, fv), (y, u, v))
    return (oy, ou, ov), (fy, fu, fv)


class CompositePipeline:
    """Gen-1 flagship pipeline (ffmpeg_to_composite equivalent)."""

    def __init__(self, cfg: RunConfig, gop: int = 64, dtype=jnp.float32,
                 progress: bool = True):
        self.cfg = cfg
        self.gop = gop
        self.dtype = dtype
        self.progress = progress
        self.key = jax.random.PRNGKey(cfg.seed)
        out = cfg.output
        self._field_rate = Fraction(out.field_rate_num, out.field_rate_den)
        l = out.height // 2
        w2 = out.width // 2
        self._filter_planes = (
            jnp.full((l, out.width), 16, jnp.int32),
            jnp.full((l, w2), 128, jnp.int32),
            jnp.full((l, w2), 128, jnp.int32),
        )

        ccfg = cfg.composite
        bkey = cfg.black_key_level_feedback

        @jax.jit
        def process_batch(y, u, v, fieldno, parity, key, filter_planes):
            if bkey >= 0:
                (y, u, v), filter_planes = _bkey_scan(
                    y, u, v, *filter_planes, bkey)
            if cfg.enable_composite_emulation:
                y, u, v = yuv422.composite_video_process_auto(
                    y, u, v, fieldno, parity, key, cfg=ccfg, dtype=dtype)
            return y, u, v, filter_planes

        self._process_batch = process_batch

    # ----------------------------------------------------------- video side

    def _flush_batch(self, batch, writer, pending_interlace, final=False):
        """Double-buffered: dispatch this batch asynchronously, then drain the
        *previous* batch's device results while the device works — host
        packing/encoding overlaps device compute."""
        if batch:
            # pad short (final) batches to the GOP size so only one batch
            # shape is ever compiled; padded fields are dropped on emit
            n_real = len(batch)
            padded = batch + [batch[-1]] * (self.gop - n_real)
            ys = jnp.stack([b[0] for b in padded])
            us = jnp.stack([b[1] for b in padded])
            vs = jnp.stack([b[2] for b in padded])
            fieldnos = jnp.asarray([b[3] for b in padded], jnp.int32)
            parities = jnp.asarray([b[4] for b in padded], jnp.int32)
            # noise is content-addressed per (seed, fieldno, stage): pass the
            # base key straight through so output is GOP- and restart-invariant
            y, u, v, self._filter_planes = self._process_batch(
                ys, us, vs, fieldnos, parities, self.key, self._filter_planes)
            inflight = (y, u, v, [(int(b[3]), int(b[4])) for b in batch])
        else:
            inflight = None

        prev = getattr(self, "_inflight", None)
        self._inflight = inflight
        for item in ((prev,) if not final else (prev, inflight)):
            if item is None:
                continue
            y, u, v, meta = item
            y = np.asarray(y)
            u = np.asarray(u)
            v = np.asarray(v)
            for k, (fieldno, parity) in enumerate(meta):
                self._emit_field(y[k], u[k], v[k], fieldno, parity, writer,
                                 pending_interlace)
        if final:
            self._inflight = None

    def _emit_field(self, y, u, v, fieldno, parity, writer, pending):
        out = self.cfg.output
        if out.interlaced_output:
            pending[parity] = (y, u, v)
            if parity == 0 and 1 in pending and 0 in pending:
                # field pair complete: bottom field first (parity of field k
                # is (k & 1) ^ 1, so even field counters are bottom lines)
                top = pending[0]
                bottom = pending[1]
                fy = np.asarray(fieldops.interleave_fields(
                    jnp.asarray(top[0]), jnp.asarray(bottom[0])))
                fu = np.asarray(fieldops.interleave_fields(
                    jnp.asarray(top[1]), jnp.asarray(bottom[1])))
                fv = np.asarray(fieldops.interleave_fields(
                    jnp.asarray(top[2]), jnp.asarray(bottom[2])))
                self._write_frame(writer, fy, fu, fv)
                pending.clear()
        else:
            # bob: duplicate the field's rows per the reference row pattern
            rows = fieldops.bob_rows(out.height, parity)
            full_y = np.zeros((out.height, out.width), np.int32)
            full_u = np.zeros((out.height, out.width // 2), np.int32)
            full_v = np.zeros((out.height, out.width // 2), np.int32)
            full_y[parity::2] = y
            full_u[parity::2] = u
            full_v[parity::2] = v
            fy = full_y[rows]
            fu = full_u[rows]
            fv = full_v[rows]
            self._write_frame(writer, fy, fu, fv)
        if self.progress:
            print(f"\x0dOutput field {fieldno} ", end="", file=sys.stderr)

    def _write_frame(self, writer, y, u, v):
        if self.cfg.output.use_422_colorspace:
            writer.write(y.astype(np.uint8), u.astype(np.uint8), v.astype(np.uint8))
        elif self.cfg.output.interlaced_output:
            # interlaced 4:2:0 chroma interleaves the two fields' chroma rows
            # (output_frame, ffmpeg_to_composite.cpp:1215-1224)
            h = y.shape[0]
            sel = np.arange(h)[(np.arange(h) & 2) == 0]
            cy = (sel & 1) + ((sel & ~3) >> 1)
            cu = np.zeros((h // 2, u.shape[1]), u.dtype)
            cv = np.zeros((h // 2, v.shape[1]), v.dtype)
            cu[cy] = u[sel]
            cv[cy] = v[sel]
            writer.write(y.astype(np.uint8), cu.astype(np.uint8), cv.astype(np.uint8))
        else:
            writer.write(y.astype(np.uint8),
                         u[0::2].astype(np.uint8), v[0::2].astype(np.uint8))

    def run_video(self, reader: y4m.Y4MReader, out_stream):
        """Drive video frames from a Y4M reader through the chain."""
        cfg = self.cfg
        out = cfg.output
        hdr = reader.header
        fps = hdr.fps
        src_interlaced = hdr.interlacing in ("t", "b")
        src_tff = hdr.interlacing != "b"

        out_fps = (self._field_rate / 2 if out.interlaced_output
                   else self._field_rate)
        whdr = y4m.Y4MHeader(
            width=out.width, height=out.height, fps=out_fps,
            interlacing=("t" if out.interlaced_output else "p"),
            aspect="4:3",
            colorspace="422" if out.use_422_colorspace else "420jpeg")
        writer = y4m.Y4MWriter(out_stream, whdr)

        video_field = 0
        batch = []
        pending = {}
        ticks_per_frame = 2
        base_idx = None   # first accepted frame rebases the clock to zero
                          # (the reference's adj_time = -t, :2264-2265)

        for frame_idx, (ysrc, usrc, vsrc) in enumerate(reader):
            t = float(frame_idx / fps)
            if cfg.transcode_end >= 0 and t >= cfg.transcode_end:
                break
            if t < cfg.transcode_start:
                continue
            if base_idx is None:
                base_idx = frame_idx
            rel = frame_idx - base_idx
            frame_pts = timing.frame_pts_to_field(rel, fps, self._field_rate)
            tgt = timing.frame_pts_to_field(rel + 1, fps, self._field_rate)
            tgt = timing.video_target_field(tgt, video_field)
            if usrc is None:
                w2 = ysrc.shape[1] // 2
                usrc = np.full((ysrc.shape[0], w2), 128, np.uint8)
                vsrc = usrc
            # horizontal scale to output width (sws role)
            ysrc = hscale_bilinear(jnp.asarray(ysrc, jnp.int32), out.width)
            usrc = hscale_bilinear(jnp.asarray(usrc, jnp.int32), out.width // 2)
            vsrc = hscale_bilinear(jnp.asarray(vsrc, jnp.int32), out.width // 2)
            while video_field < tgt:
                parity = (video_field & 1) ^ 1  # bottom field first (:1784)
                # pts_delta selects which source field feeds this output field
                # for interlaced sources (:1033-1036)
                fy, fu, fv = fieldops.render_field(
                    ysrc, usrc, vsrc, out.height, parity,
                    src_interlaced=src_interlaced, src_top_field_first=src_tff,
                    pts_delta=max(0, video_field - frame_pts),
                    ticks_per_frame=ticks_per_frame)
                batch.append((fy, fu, fv, video_field, parity))
                video_field += 1
                if len(batch) >= self.gop:
                    self._flush_batch(batch, writer, pending)
                    batch = []
        self._flush_batch(batch, writer, pending, final=True)
        if self.progress:
            print("", file=sys.stderr)
        return video_field

    # ----------------------------------------------------------- audio side

    def run_audio(self, in_path: str, out_path: str, chunk: int = 65536):
        cfg = self.cfg
        acfg = cfg.audio
        samples, rate = wavio.read_wav(in_path)
        if rate != acfg.rate:
            samples = _resample_sinc(samples, rate, acfg.rate)
        if samples.shape[1] != acfg.channels:
            samples = _remix(samples, acfg.channels)
        if cfg.transcode_start > 0 or cfg.transcode_end >= 0:
            s0 = int(cfg.transcode_start * acfg.rate)
            s1 = (int(cfg.transcode_end * acfg.rate)
                  if cfg.transcode_end >= 0 else len(samples))
            samples = samples[s0:s1]
        if not cfg.enable_audio_emulation:
            wavio.write_wav(out_path, samples.astype(np.int16), acfg.rate)
            return len(samples)

        state = init_audio_state(acfg, self.dtype)
        outs = []
        key = jax.random.PRNGKey(cfg.seed + 1)
        pos = 0
        while pos < len(samples):
            part = samples[pos:pos + chunk]
            pulses = (buzz_pulse_counts(acfg, pos, len(part))
                      if not acfg.vhs_hifi else None)
            out, state = composite_audio_process(
                jnp.asarray(part, jnp.int32), state, key, cfg=acfg,
                pulses=pulses, dtype=self.dtype)
            outs.append(np.asarray(out))
            pos += chunk
        result = np.concatenate(outs) if outs else np.zeros((0, acfg.channels))
        wavio.write_wav(out_path, result.astype(np.int16), acfg.rate)
        return len(result)


def _resample_linear(samples: np.ndarray, src_rate: int, dst_rate: int):
    """Host-side linear resampler (kept for tiny inputs and as a reference
    point; _resample_sinc is the production path for the swr role,
    ffmpeg_to_composite.cpp:1839-1866)."""
    n = samples.shape[0]
    m = int(round(n * dst_rate / src_rate))
    xs = np.arange(m) * (n - 1) / max(1, m - 1)
    x0 = np.floor(xs).astype(np.int64)
    x1 = np.minimum(x0 + 1, n - 1)
    f = (xs - x0)[:, None]
    out = samples[x0] * (1 - f) + samples[x1] * f
    return np.round(out).astype(np.int64)


def _resample_sinc(samples: np.ndarray, src_rate: int, dst_rate: int,
                   taps: int = 32, beta: float = 8.6):
    """Windowed-sinc (Kaiser) resampler — the quality tier of the swr role
    (ffmpeg_to_composite.cpp:1839-1866). Direct per-output-sample evaluation,
    vectorized in blocks: out[j] = sum_k x[k] * w(k - t_j) with
    w = sinc(fc u) * kaiser(beta), fc = min(1, dst/src) for anti-aliased
    downsampling; weights are renormalized per output sample so DC is exact
    even at the edges. ~80 dB stopband at taps=32, beta=8.6."""
    if src_rate == dst_rate:
        return samples.astype(np.int64)
    n = samples.shape[0]
    m = int(round(n * dst_rate / src_rate))
    if n < 2 * taps or m < 2:
        return _resample_linear(samples, src_rate, dst_rate)
    fc = min(1.0, dst_rate / src_rate)
    half = taps // 2
    x = samples.astype(np.float64)
    i0 = np.i0(beta)
    out = np.empty((m,) + samples.shape[1:], np.float64)
    block = 1 << 16
    ks = np.arange(-half + 1, half + 1, dtype=np.float64)   # [taps]
    for j0 in range(0, m, block):
        j1 = min(j0 + block, m)
        t = np.arange(j0, j1, dtype=np.float64) * (src_rate / dst_rate)
        base = np.floor(t).astype(np.int64)
        frac = t - base
        u = ks[None, :] - frac[:, None]                     # [J, taps]
        w = np.sinc(fc * u) * fc
        arg = 1.0 - (u / half) ** 2
        w *= np.where(arg > 0, np.i0(beta * np.sqrt(np.maximum(arg, 0.0))), 0.0) / i0
        w /= w.sum(axis=1, keepdims=True)
        idx = np.clip(base[:, None] + ks.astype(np.int64)[None, :], 0, n - 1)
        out[j0:j1] = np.einsum("jt,jt...->j...", w, x[idx])
    return np.round(out).astype(np.int64)


def _remix(samples: np.ndarray, channels: int):
    if channels == 1:
        return np.round(samples.mean(axis=1)).astype(np.int64)[:, None]
    if samples.shape[1] == 1:
        return np.repeat(samples, channels, axis=1)
    return samples[:, :channels]
