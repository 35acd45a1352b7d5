"""VHS audio emulation chain (ffmpeg_to_composite.cpp:558-627, configured
:2126-2162; duplicated ffmpeg_ntsc.cpp:901-970).

Stage order per sample (reference loop):
  1. bandpass bank: 6 serial lowpasses then 6 serial highpasses per channel
     (HiLoPass::filter, ffmpeg_to_composite.cpp:153-157)
  2. preemphasis: s += pre[i].highpass(s) for i in range(channels) — NOTE the
     reference iterates over *all* channel filters for *every* channel's
     sample, so for stereo both filter states are driven by the interleaved
     stream at 2x rate. Quirk preserved: we scan over the flattened
     interleaved axis.
  3. sync-buzz on linear tracks: pure function of the running sample counter
     (16x oversampled hsync/vsync pulse train, :582-599) — closed form here,
     no recurrence.
  4. hard clip to [-1, 1]
  5. hiss: iid uniform in [-level, level] / 20000 (:607-609)
  6. linear-track high boost: s += boost[c].highpass(s) * k (:611-613)
  7. deemphasis: s = post[i].lowpass(s) for i in range(channels) — same
     interleaved-stream quirk as (2).

Everything linear runs as parallel associative scans over the sample axis;
the chain is a `(state, x) -> (state, y)` block so streaming in chunks with
carried state matches one-shot processing: bit-identical in float64, and to
within 1 int16 LSB in float32 (the blocked-IIR reduction tree varies with
sequence length). Hiss is content-addressed per absolute sample index
(ops/noise.hiss_per_sample), so callers pass ONE base key for the stream and
any chunking yields the same noise.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from cvsim_tpu.config import AudioConfig, iir_alpha
from cvsim_tpu.ops.cmath import clips16
from cvsim_tpu.ops.iir import iir_lowpass
from cvsim_tpu.ops.noise import hiss_per_sample


class AudioState(NamedTuple):
    """Carried filter registers. Shapes: [C, passes] for the bank, [C] for
    per-channel filters, [n_pre] for the interleaved-stream filters."""

    bank_lo: jax.Array      # [C, passes]
    bank_hi: jax.Array      # [C, passes]
    pre: jax.Array          # [C] preemphasis registers (interleaved stream)
    boost: jax.Array        # [C]
    post: jax.Array         # [C] deemphasis registers (interleaved stream)
    sample_count: jax.Array  # [] int64-ish running audio_proc_count


def init_audio_state(cfg: AudioConfig, dtype=jnp.float32) -> AudioState:
    c, p = cfg.channels, cfg.bandpass_passes
    z = lambda *s: jnp.zeros(s, dtype)
    return AudioState(
        bank_lo=z(c, p), bank_hi=z(c, p), pre=z(c), boost=z(c), post=z(c),
        sample_count=jnp.zeros((), jnp.int32))


def buzz_pulse_counts(cfg: AudioConfig, start_count: int, n: int):
    """Host-side (NumPy float64) closed form of the 16x-oversampled sync-buzz
    pulse train (ffmpeg_to_composite.cpp:582-599): number of pulse slots per
    sample, [n] uint8. Data-independent, so it is computed on the host and
    fed to the device kernel — float32 cannot hold the sample index exactly
    past ~6 minutes of audio."""
    import numpy as np

    hsync_hz = 15734.0 if cfg.ntsc else 15625.0
    vsync_lines = 525 if cfg.ntsc else 625
    vpulse_end = 10 if cfg.ntsc else 12
    hpulse_end = hsync_hz * ((4.7 if cfg.ntsc else 4.0) / 1e6)

    idx = np.arange(start_count, start_count + n, dtype=np.float64)
    oi = np.arange(16, dtype=np.float64)
    t = ((idx[:, None] * 16.0 + oi[None, :]) * hsync_hz) / cfg.rate / 16.0
    hpos = np.mod(t, 1.0)
    vline = np.mod(np.floor(t + 1e-4 - hpos), vsync_lines / 2.0)
    pulse = (hpos < hpulse_end) | (vline < vpulse_end)
    return pulse.sum(axis=-1).astype(np.uint8)


def _bandpass_bank(s, state_lo, state_hi, a_lo, a_hi, passes: int):
    """The reference's HiLoPass bank (ffmpeg_to_composite.cpp:133-228,
    wired :2126-2131): per channel, `passes` serial lowpasses then
    `passes` serial highpasses. s: [N, C] float; returns
    (filtered [N, C], bank_lo [C, passes], bank_hi [C, passes])."""
    new_lo, new_hi = [], []
    sc = s.T  # [C, N]
    for p in range(passes):
        lp = iir_lowpass(sc, a_lo, state_lo[:, p], axis=-1)
        new_lo.append(lp[:, -1])
        sc = lp
    for p in range(passes):
        lp = iir_lowpass(sc, a_hi, state_hi[:, p], axis=-1)
        new_hi.append(lp[:, -1])
        sc = sc - lp
    return sc.T, jnp.stack(new_lo, axis=-1), jnp.stack(new_hi, axis=-1)


def _interleaved_stage(x, alpha, y0, kind: str):
    """One reference-quirk filter stage over the flattened interleaved stream.

    x: [N, C] -> flatten to [N*C]; kind 'preemph' applies s + highpass(s),
    'deemph' applies lowpass(s). Returns ([N, C], new_register)."""
    n, c = x.shape
    flat = x.reshape(n * c)
    lp = iir_lowpass(flat, alpha, y0)
    out = 2.0 * flat - lp if kind == "preemph" else lp
    return out.reshape(n, c), lp[-1]


def composite_audio_process(
    audio,                     # int16-range [N, C] (interleaved samples)
    state: AudioState,
    key,
    *,
    cfg: AudioConfig,
    pulses=None,               # [N] buzz pulse counts from buzz_pulse_counts()
    dtype=jnp.float32,
):
    """Process a chunk; returns (int16-range [N, C], new AudioState)."""
    n, c = audio.shape
    assert c == cfg.channels
    s = audio.astype(dtype) / 32768.0

    # --- 1. bandpass bank: per channel, 6 lowpasses then 6 highpasses ------
    s, bank_lo, bank_hi = _bandpass_bank(
        s, state.bank_lo, state.bank_hi, iir_alpha(cfg.rate, cfg.lowpass_hz),
        iir_alpha(cfg.rate, cfg.highpass_hz), cfg.bandpass_passes)

    # --- 2. preemphasis (interleaved-stream quirk) --------------------------
    pre_reg = state.pre
    if cfg.emulating_preemphasis:
        a_pre = iir_alpha(cfg.rate, cfg.preemphasis_cut_hz)
        regs = []
        for i in range(c):
            s, r = _interleaved_stage(s, a_pre, state.pre[i], "preemph")
            regs.append(r)
        pre_reg = jnp.stack(regs)

    # --- 3. linear-track sync buzz ------------------------------------------
    linear_buzz = 10.0 ** (cfg.linear_buzz_db / 20.0)
    if (not cfg.vhs_hifi) and linear_buzz > 1e-9 and pulses is not None:
        s = s - (jnp.asarray(pulses, dtype) * (linear_buzz / 16.0 / 2.0))[:, None]

    # --- 4. clip -------------------------------------------------------------
    s = jnp.clip(s, -1.0, 1.0)

    # --- 5. hiss -------------------------------------------------------------
    # Content-addressed per absolute sample index: chunked streaming is
    # bit-identical to one-shot, so callers pass ONE base key for the whole
    # stream (no per-chunk splitting).
    level = cfg.hiss_level
    if level != 0:
        u = hiss_per_sample(key, state.sample_count, n, c, level, dtype)
        s = s + u / 20000.0

    # --- 6. linear high boost ------------------------------------------------
    boost_reg = state.boost
    if (not cfg.vhs_hifi) and cfg.linear_high_boost > 0:
        a_b = iir_alpha(cfg.rate, 10000.0)
        lp = iir_lowpass(s.T, a_b, state.boost, axis=-1)
        boost_reg = lp[:, -1]
        s = s + (s.T - lp).T * jnp.asarray(cfg.linear_high_boost, dtype)

    # --- 7. deemphasis (interleaved-stream quirk) ----------------------------
    post_reg = state.post
    if cfg.emulating_deemphasis:
        a_post = iir_alpha(cfg.rate, cfg.preemphasis_cut_hz)
        regs = []
        for i in range(c):
            s, r = _interleaved_stage(s, a_post, state.post[i], "deemph")
            regs.append(r)
        post_reg = jnp.stack(regs)

    out = clips16(s * 32768.0).astype(jnp.int32)
    new_state = AudioState(
        bank_lo=bank_lo, bank_hi=bank_hi, pre=pre_reg, boost=boost_reg,
        post=post_reg, sample_count=state.sample_count + n)
    return out, new_state
