"""Whole-chain fused Pallas implementation of the gen-1 YUV 4:2:2 engine
(ffmpeg_to_composite.cpp) — the sibling of models/fused_yiq.py.

Same kernel architecture: ONE merged pallas program for single-tile
rasters (with the head switch applied in VMEM), the A/B split with the
XLA head-switch stage for tiled ones. Gen-1 particulars handled here:
- u8 quantization (clampu8) at every reference writeback point
- chroma planes at half width, filtered at the 4:2:2 rate; the stride-2
  half<->full conversions run as 0/1 selection-matrix matmuls (Mosaic has
  no strided slicing; a [768, 384] pick matrix on the MXU is cheap)
- decode pads are luma black (16), not 0
- the chroma sharpen stage and the gen-1 chroma-phase rotation bug
- out-lowpass 'full' uses the ringing highpass + 3-pole shape

The debug taps (-nocolor-subcarrier[-after-yc-sep]) fall back to the
stage-by-stage XLA path (models/yuv422.py) via the auto dispatcher.
Bit-exact with the XLA path (tests/test_fused_chain.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cvsim_tpu.config import (
    CompositeConfig,
    NTSC_RATE,
    NTSC_RATE_422,
    iir_alpha,
)
from cvsim_tpu.models import yiq as yiq_mod
from cvsim_tpu.models.fused_yiq import (_TTBinder, _stack_alpha_consts,
                                        _pole, _pole3, _iota_w, _cdiv,
                                        _walk_rows_kernel,
                                        _head_switch_window,
                                        _hs_window_rows, _hs_specs)
from cvsim_tpu.ops.blocked_iir import _decay_consts
from cvsim_tpu.ops.cmath import c_int
from cvsim_tpu.ops.noise import (
    field_stage_keys,
    randint_per_field,
    random_walk_per_field,
)
from cvsim_tpu.ops.phase import scanline_phase_xi

BLOCK = 128

# Scoped-VMEM limit shared with fused_yiq (see its rationale): the
# default 16MB Mosaic budget left <0.1% headroom at SD and OOMed when
# surrounding-program layouts shifted; v5e cores carry 128MB of VMEM.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
# VMEM tiling thresholds (luma samples per tile); see fused_yiq.py
_SINGLE_TILE_BUDGET = 200_000
_TILE_BUDGET = 130_000


def _u8(x):
    return jnp.clip(jnp.trunc(x), 0.0, 255.0)


@functools.lru_cache(maxsize=2)
def _pick_matrices():
    """Block-local stride-2 selection: ed [256, 128] picks even samples of a
    256-column block; eu [128, 256] replicates a 128-column half-width block
    to 256 full-width columns. Applied per block so VMEM cost is constant
    (128KB) regardless of raster width (full-size matrices blew VMEM at HD).
    Requires wp == 2 * wp2."""
    j = np.arange(128)
    e_down = np.zeros((256, 128), np.float32)
    e_down[j * 2, j] = 1.0
    e_up = np.zeros((128, 256), np.float32)
    e_up[j, j * 2] = 1.0
    e_up[j, j * 2 + 1] = 1.0
    return e_down, e_up


def _down(full, ed):
    """[L, wp] -> [L, wp/2] even-sample pick via per-block matmuls."""
    wp = full.shape[-1]
    outs = [jnp.dot(full[:, 256 * j2:256 * (j2 + 1)], ed,
                    preferred_element_type=full.dtype)
            for j2 in range(wp // 256)]
    return jnp.concatenate(outs, axis=-1)


def _up(half, eu):
    """[L, wp/2] -> [L, wp] x2 replication via per-block matmuls."""
    wp2 = half.shape[-1]
    outs = [jnp.dot(half[:, 128 * j2:128 * (j2 + 1)], eu,
                    preferred_element_type=half.dtype)
            for j2 in range(wp2 // 128)]
    return jnp.concatenate(outs, axis=-1)


def _chroma_lowpass_full(p, cst_hp, cst_lp, delay, w2, wp2):
    """Gen-1 chroma lowpass: s = p + highpass_{cut/2}(p) then 3 lowpasses,
    clampu8 delayed writeback (ffmpeg_to_composite.cpp:353-393)."""
    nb = wp2 // BLOCK
    s = 2.0 * p - _pole(p, cst_hp, 128.0, nb)
    s = _u8(_pole3(s, cst_lp, 128.0, nb))
    shifted = jnp.roll(s, -delay, axis=-1) if delay else s
    xw = _iota_w(wp2)
    out = jnp.where(xw < (w2 - delay), shifted, p)
    return jnp.where(xw < w2, out, 0.0)


def _chroma_lowpass_lite(p, cst, w2, wp2):
    nb = wp2 // BLOCK
    s = _u8(_pole3(p, cst, 128.0, nb))
    shifted = jnp.roll(s, -1, axis=-1)
    xw = _iota_w(wp2)
    out = jnp.where(xw < (w2 - 1), shifted, p)
    return jnp.where(xw < w2, out, 0.0)


def _qam_encode_u8(y, u, v, xi_col, amp: int, eu, w: int, wp: int):
    """yuv_to_ntsc (ffmpeg_to_composite.cpp:434-477): 4:2:2 chroma repeated
    to full width, clampu8 luma writeback."""
    u2 = _up(u, eu) - 128.0
    v2 = _up(v, eu) - 128.0
    sxi = (xi_col + _iota_w(wp)) & 3
    um = jnp.where(sxi == 0, 1.0, jnp.where(sxi == 2, -1.0, 0.0))
    vm = jnp.where(sxi == 1, 1.0, jnp.where(sxi == 3, -1.0, 0.0))
    chroma = u2 * (amp * um) + v2 * (amp * vm)
    out = _u8(y + _cdiv(chroma, 50.0))
    return jnp.where(_iota_w(wp) < w, out, 0.0)


def _qam_decode_u8(y, xi_col, amp_back: int, ed, w: int, wp: int):
    """ntsc_to_yuv (ffmpeg_to_composite.cpp:480-553): box blur with
    16-precharge, 255-c sign flip, biased rescale, phase-swapped demux."""
    xw = _iota_w(wp)
    prev = jnp.where(xw == 0, 16.0, jnp.roll(y, 1, axis=-1))
    nxt1 = jnp.where(xw + 1 < w, jnp.roll(y, -1, axis=-1), 16.0)
    nxt2 = jnp.where(xw + 2 < w, jnp.roll(y, -2, axis=-1), 16.0)
    new_y = jnp.floor((prev + y + nxt1 + nxt2) / 4.0)  # positive sums
    chroma = _u8(nxt2 + 128.0 - new_y)

    x0 = (4 - xi_col) & 3
    r = (xw - x0) & 3
    flip = (r >= 2) & ((xw - r) >= x0)
    chroma = jnp.where(flip, 255.0 - chroma, chroma)
    chroma = _u8(_cdiv((chroma - 128.0) * 50.0, float(amp_back)) + 128.0)

    ce = _down(chroma, ed)
    co = _down(jnp.roll(chroma, -1, axis=-1), ed)
    odd_phase = (xi_col & 1) == 1
    new_u = jnp.where(odd_phase, 255.0 - co, 255.0 - ce)
    new_v = jnp.where(odd_phase, 255.0 - ce, 255.0 - co)
    new_y = jnp.where(xw < w, new_y, 0.0)
    w2 = w // 2
    xw2 = _iota_w(wp // 2)
    return (new_y, jnp.where(xw2 < w2, new_u, 0.0),
            jnp.where(xw2 < w2, new_v, 0.0))


# ------------------------------------------------------------------ kernels

def _alpha_consts_gen1(cfg: CompositeConfig):
    """Rows:
    0: in U cut (1.3MHz@422)         1: in U cut/2 highpass
    2: in V cut (0.6/1.3MHz@422)     3: in V cut/2 highpass
    4: preemphasis cut (@4fsc)       5: VHS luma cut (@4fsc)
    6: VHS chroma cut (@422)         7: sharpen luma 2x cut (@4fsc)
    8: sharpen chroma 2x cut (@422)  9: out-lite rate/4 (@422)
    10: the alpha-0.5 noise walk"""
    u_cut = 1300000.0
    v_cut = 600000.0 if cfg.ntsc else 1300000.0
    speed = cfg.vhs_tape_speed
    # see fused_yiq._alpha_consts: <=0 fills an unused row; positive values
    # pass through unclamped for stage/fused bit-identity
    pre_cut = (cfg.composite_preemphasis_cut
               if cfg.composite_preemphasis_cut > 0 else 1.0)
    specs = [
        (NTSC_RATE_422, u_cut), (NTSC_RATE_422, u_cut / 2),
        (NTSC_RATE_422, v_cut), (NTSC_RATE_422, v_cut / 2),
        (NTSC_RATE, pre_cut),
        (NTSC_RATE, speed.luma_cut),
        (NTSC_RATE_422, speed.chroma_cut),
        (NTSC_RATE, speed.luma_cut * 2),
        (NTSC_RATE_422, speed.chroma_cut * 2),
        (NTSC_RATE_422, NTSC_RATE_422 / 4),
    ]
    alphas = [float(iir_alpha(rate, cut)) for rate, cut in specs] + [0.5]
    return _stack_alpha_consts(alphas)


def _a_math(cfg: CompositeConfig, w: int, wp: int, w2: int, wp2: int,
            tl: int, y, u, v, xi_col, nk_u, cs, eu):
    """Gen-1 kernel A math on VMEM values (in-chroma lowpass, QAM encode,
    preemphasis, luma noise), returning the encoded luma. Shared by the
    standalone kernel A (tiled mode) and the merged single-tile kernel."""
    nb = wp // BLOCK

    if cfg.composite_in_chroma_lowpass:
        u_delay = 2
        v_delay = 4 if cfg.ntsc else 2
        u = _chroma_lowpass_full(u, cs[1], cs[0], u_delay, w2, wp2)
        v = _chroma_lowpass_full(v, cs[3], cs[2], v_delay, w2, wp2)

    y = _qam_encode_u8(y, u, v, xi_col, cfg.subcarrier_amplitude, eu, w, wp)

    if cfg.composite_preemphasis != 0 and cfg.composite_preemphasis_cut > 0:
        lp = _pole(y, cs[4], 16.0, nb)
        y = _u8(y + (y - lp) * cfg.composite_preemphasis)

    if cfg.video_noise != 0:
        y = _u8(y + _walk_rows_kernel(
            nk_u, pl.program_id(1) * tl, cfg.video_noise, 0, w, wp, tl,
            cs[10]))

    return jnp.where(_iota_w(wp) < w, y, 0.0)


def _make_kernel_a(cfg: CompositeConfig, w: int, wp: int, w2: int,
                   wp2: int, tl: int):
    def kernel(y_ref, u_ref, v_ref, xi_ref, nk_ref, tt_ref, d_ref,
               tt3_ref, d3_ref, vt_ref, eu_ref, y_out):
        cs = _TTBinder()
        cs.bind(tt_ref, d_ref, tt3_ref, d3_ref, vt_ref)
        y_out[0] = _a_math(cfg, w, wp, w2, wp2, tl, y_ref[0], u_ref[0],
                           v_ref[0], xi_ref[0].astype(jnp.int32),
                           nk_ref[0, 0, 0].astype(jnp.uint32), cs,
                           eu_ref[...])

    return kernel


def _b_front(cfg, w, wp, w2, wp2, l, tl, y, xi_col, nk_u, sin_a, cos_a,
             cs, ed):
    """Decode + chroma/phase noise + VHS bandlimit (row-independent)."""
    nb = wp // BLOCK
    nb2 = wp2 // BLOCK
    speed = cfg.vhs_tape_speed

    y, u, v = _qam_decode_u8(y, xi_col, cfg.subcarrier_amplitude_back,
                             ed, w, wp)

    if cfg.video_chroma_noise != 0:
        row0 = pl.program_id(1) * tl
        mag = cfg.video_chroma_noise
        u = _u8(u + _walk_rows_kernel(nk_u, row0, mag, 0, w2, wp2, tl,
                                      cs[10]))
        v = _u8(v + _walk_rows_kernel(nk_u, row0, mag, l * w2, w2, wp2, tl,
                                      cs[10]))

    if cfg.video_chroma_phase_noise != 0:
        uu = u - 128.0
        vv = v - 128.0
        # gen-1 rotation-matrix bug (ffmpeg_to_composite.cpp:772)
        u = _u8(uu * cos_a - uu * sin_a + 128.0)
        v = _u8(vv * cos_a + vv * sin_a + 128.0)

    if cfg.emulating_vhs:
        # luma: 3 lowpasses then emphasis vs a 4th same-cut pole
        t = _pole3(y, cs[5], 16.0, nb)
        lp = _pole(t, cs[5], 16.0, nb)
        y = jnp.where(_iota_w(wp) < w, _u8(t + (t - lp) * 1.6), 0.0)
        # chroma: 3 lowpasses @422 rate, clampu8 delayed writeback
        cd = speed.chroma_delay_gen1
        xw2 = _iota_w(wp2)

        def chroma_lp(p):
            sflt = _u8(_pole3(p, cs[6], 128.0, nb2))
            shifted = jnp.roll(sflt, -cd, axis=-1)
            out = jnp.where(xw2 < (w2 - cd), shifted, p)
            return jnp.where(xw2 < w2, out, 0.0)

        u = chroma_lp(u)
        v = chroma_lp(v)
    return y, u, v


def _b_vblend(w2, wp2, u, v):
    """In-kernel 2-line chroma blend with 128 init (single-tile only)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (u.shape[0], 1), 0)
    xw2 = _iota_w(wp2)

    def vblend(p):
        prev = jnp.roll(p, 1, axis=0)
        prev = jnp.where(rows == 1, 128.0, prev)
        blended = jnp.floor((prev + p + 1.0) / 2.0)
        blended = jnp.where(rows == 0, p, blended)
        return jnp.where(xw2 < w2, blended, 0.0)

    return vblend(u), vblend(v)


def _b_back(cfg, w, wp, w2, wp2, y, u, v, xi_col, keep, cs,
            ed, eu):
    """Sharpen + recombine + dropout + output lowpass (row-independent)."""
    nb = wp // BLOCK
    nb2 = wp2 // BLOCK
    xw2 = _iota_w(wp2)

    if cfg.emulating_vhs:
        # sharpen: luma x1.5 at 2x cut, chroma x0.85 at 2x cut
        ts = _pole3(y, cs[7], 16.0, nb)
        y = jnp.where(_iota_w(wp) < w,
                      _u8(y + (y - ts) * cfg.vhs_out_sharpen), 0.0)

        def sharpen_c(p):
            tsc = _pole3(p, cs[8], 128.0, nb2)
            out = _u8(p + (p - tsc) * cfg.vhs_out_sharpen_chroma)
            return jnp.where(xw2 < w2, out, 0.0)

        u = sharpen_c(u)
        v = sharpen_c(v)
        if not cfg.vhs_svideo_out:
            y = _qam_encode_u8(y, u, v, xi_col,
                               cfg.subcarrier_amplitude, eu, w, wp)
            y, u, v = _qam_decode_u8(y, xi_col,
                                     cfg.subcarrier_amplitude, ed, w, wp)

    if cfg.video_chroma_loss != 0:
        u = u * keep + 128.0 * (1.0 - keep)
        v = v * keep + 128.0 * (1.0 - keep)
        u = jnp.where(xw2 < w2, u, 0.0)
        v = jnp.where(xw2 < w2, v, 0.0)

    for _ in range(cfg.video_yc_recombine):
        y = _qam_encode_u8(y, u, v, xi_col, cfg.subcarrier_amplitude,
                           eu, w, wp)
        y, u, v = _qam_decode_u8(y, xi_col, cfg.subcarrier_amplitude,
                                 ed, w, wp)

    if cfg.composite_out_chroma_lowpass:
        u_delay = 2
        v_delay = 4 if cfg.ntsc else 2
        u = _chroma_lowpass_full(u, cs[1], cs[0], u_delay, w2, wp2)
        v = _chroma_lowpass_full(v, cs[3], cs[2], v_delay, w2, wp2)
    elif cfg.composite_out_chroma_lowpass_lite:
        u = _chroma_lowpass_lite(u, cs[9], w2, wp2)
        v = _chroma_lowpass_lite(v, cs[9], w2, wp2)
    return y, u, v


def _make_kernel_ab(cfg: CompositeConfig, w: int, wp: int, w2: int,
                    wp2: int, l: int, tl: int, hs_win: int | None = None):
    """MERGED single-tile kernel: kernel A + in-kernel head switch +
    kernel B in one pallas program (see fused_yiq._make_kernel_ab — the
    encoded-luma plane never touches HBM, constants load once)."""
    windowed = hs_win is not None and hs_win < tl

    def body(y_ref, u_ref, v_ref, xi_ref, nk_ref, sc_ref, drop_ref,
             tt_ref, d_ref, tt3_ref, d3_ref, vt_ref, ed_ref, eu_ref,
             y_out, u_out, v_out, hs=None, scratch_ref=None):
        cs = _TTBinder()
        cs.bind(tt_ref, d_ref, tt3_ref, d3_ref, vt_ref)
        xi_col = xi_ref[0].astype(jnp.int32)
        y = _a_math(cfg, w, wp, w2, wp2, tl, y_ref[0], u_ref[0], v_ref[0],
                    xi_col, nk_ref[0, 0, 0].astype(jnp.uint32), cs,
                    eu_ref[...])
        if hs is not None:
            hs_ref, w0_ref = hs
            y = _head_switch_window(y, scratch_ref, hs_ref,
                                    w0_ref[0, 0, 0], w=w, wp=wp,
                                    win=hs_win, fill=16.0)
        y, u, v = _b_front(cfg, w, wp, w2, wp2, l, tl, y, xi_col,
                           nk_ref[0, 0, 1].astype(jnp.uint32),
                           sc_ref[0, :, 0:1], sc_ref[0, :, 1:2],
                           cs, ed_ref[...])
        if cfg.emulating_vhs and cfg.vhs_chroma_vert_blend and cfg.ntsc:
            u, v = _b_vblend(w2, wp2, u, v)
        y, u, v = _b_back(cfg, w, wp, w2, wp2, y, u, v, xi_col, drop_ref[0],
                          cs, ed_ref[...], eu_ref[...])
        y_out[0] = y
        u_out[0] = u
        v_out[0] = v

    if hs_win is None:
        def kernel(y_ref, u_ref, v_ref, xi_ref, nk_ref, sc_ref, drop_ref,
                   tt_ref, d_ref, tt3_ref, d3_ref, vt_ref, ed_ref, eu_ref,
                   y_out, u_out, v_out):
            body(y_ref, u_ref, v_ref, xi_ref, nk_ref, sc_ref, drop_ref,
                 tt_ref, d_ref, tt3_ref, d3_ref, vt_ref, ed_ref, eu_ref,
                 y_out, u_out, v_out)
    elif windowed:
        def kernel(y_ref, u_ref, v_ref, xi_ref, nk_ref, sc_ref, drop_ref,
                   hs_ref, w0_ref, tt_ref, d_ref, tt3_ref, d3_ref, vt_ref,
                   ed_ref, eu_ref, y_out, u_out, v_out, scratch_ref):
            body(y_ref, u_ref, v_ref, xi_ref, nk_ref, sc_ref, drop_ref,
                 tt_ref, d_ref, tt3_ref, d3_ref, vt_ref, ed_ref, eu_ref,
                 y_out, u_out, v_out, hs=(hs_ref, w0_ref),
                 scratch_ref=scratch_ref)
    else:
        def kernel(y_ref, u_ref, v_ref, xi_ref, nk_ref, sc_ref, drop_ref,
                   hs_ref, w0_ref, tt_ref, d_ref, tt3_ref, d3_ref, vt_ref,
                   ed_ref, eu_ref, y_out, u_out, v_out):
            body(y_ref, u_ref, v_ref, xi_ref, nk_ref, sc_ref, drop_ref,
                 tt_ref, d_ref, tt3_ref, d3_ref, vt_ref, ed_ref, eu_ref,
                 y_out, u_out, v_out, hs=(hs_ref, w0_ref))

    return kernel


def _make_kernel_b1(cfg: CompositeConfig, w: int, wp: int, w2: int,
                    wp2: int, l: int, tl: int):
    """Tiled-mode front half."""

    def kernel(y_ref, xi_ref, nk_ref, sc_ref, tt_ref, d_ref,
               tt3_ref, d3_ref, vt_ref, ed_ref, y_out, u_out, v_out):
        cs = _TTBinder()
        cs.bind(tt_ref, d_ref, tt3_ref, d3_ref, vt_ref)
        xi_col = xi_ref[0].astype(jnp.int32)
        y, u, v = _b_front(cfg, w, wp, w2, wp2, l, tl, y_ref[0], xi_col,
                           nk_ref[0, 0, 1].astype(jnp.uint32),
                           sc_ref[0, :, 0:1], sc_ref[0, :, 1:2],
                           cs, ed_ref[...])
        y_out[0] = y
        u_out[0] = u
        v_out[0] = v

    return kernel


def _make_kernel_b2(cfg: CompositeConfig, w: int, wp: int, w2: int, wp2: int):
    """Tiled-mode back half."""

    def kernel(y_ref, u_ref, v_ref, xi_ref, drop_ref, tt_ref, d_ref,
               tt3_ref, d3_ref, vt_ref, ed_ref, eu_ref,
               y_out, u_out, v_out):
        cs = _TTBinder()
        cs.bind(tt_ref, d_ref, tt3_ref, d3_ref, vt_ref)
        xi_col = xi_ref[0].astype(jnp.int32)
        y, u, v = _b_back(cfg, w, wp, w2, wp2, y_ref[0], u_ref[0], v_ref[0],
                          xi_col, drop_ref[0], cs,
                          ed_ref[...], eu_ref[...])
        y_out[0] = y
        u_out[0] = u
        v_out[0] = v

    return kernel


# ---------------------------------------------------------------- dispatcher

@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def composite_video_process_fused(
    y, u, v, fieldno, field_parity, key, *,
    cfg: CompositeConfig, interpret: bool = False,
):
    """Drop-in twin of yuv422.composite_video_process (identical RNG
    consumption, f32). Caller must ensure the debug taps are off."""
    assert not cfg.nocolor_subcarrier
    assert not cfg.nocolor_subcarrier_after_yc_sep
    y = jnp.asarray(y, jnp.int32)
    b, l, w = y.shape
    w2 = w // 2
    wp2 = -(-w2 // BLOCK) * BLOCK
    wp = 2 * wp2   # block-local stride-2 selection requires wp == 2*wp2
    dtype = jnp.float32

    xi = scanline_phase_xi(
        fieldno, field_parity, l,
        cfg.video_scanline_phase_shift, cfg.video_scanline_phase_shift_offset,
        cfg.ntsc, gen1=True)
    keys = [field_stage_keys(key, fieldno, sid) for sid in range(5)]

    # per-pixel walk streams generated IN-KERNEL from these stream ids
    # (see fused_yiq._walk_rows_kernel); chroma streams index at half width
    keys_ab = jnp.stack([keys[0], keys[2]],
                    axis=-1).astype(jnp.int32)[:, None, :]  # [B,1,2]
    if cfg.video_chroma_phase_noise != 0:
        pwalk = random_walk_per_field(keys[3], l, cfg.video_chroma_phase_noise,
                                      dtype=dtype)
        ang = c_int(pwalk) * jnp.asarray(jnp.pi / 100.0, dtype)
        sincos = jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    else:
        zeros = jnp.zeros((b, l), dtype)
        sincos = jnp.stack([zeros, zeros + 1.0], axis=-1)
    if cfg.video_chroma_loss != 0:
        rr = randint_per_field(keys[4], (l,), 0, 100000)
        keep = (rr >= cfg.video_chroma_loss).astype(dtype)[..., None]
    else:
        keep = jnp.ones((b, l, 1), dtype)

    tt_np, d_np, tt3_np, d3_np, vt_np = _alpha_consts_gen1(cfg)
    tts = jnp.asarray(tt_np)
    ds = jnp.asarray(d_np)
    tt3s = jnp.asarray(tt3_np)
    d3s = jnp.asarray(d3_np)
    vts = jnp.asarray(vt_np)
    ed_np, eu_np = _pick_matrices()
    ed = jnp.asarray(ed_np)
    eu = jnp.asarray(eu_np)

    # line tiling (see fused_yiq.py): single tile keeps vblend in-kernel;
    # larger rasters tile the row axis with vblend in XLA between halves
    if l * wp <= min(_SINGLE_TILE_BUDGET, max(_TILE_BUDGET, 1) * 2):
        tl = l
    else:
        tl = 256
        while tl * wp > _TILE_BUDGET and tl > 8:
            tl //= 2
    n_lt = -(-l // tl)
    lp = n_lt * tl
    single_tile = (n_lt == 1)

    def padw(a, width, target):
        return jnp.concatenate(
            [a, jnp.zeros(a.shape[:-1] + (target - width,), a.dtype)],
            axis=-1) if target != width else a

    def padl(a):
        if lp != l:
            pad_shape = a.shape[:1] + (lp - l,) + a.shape[2:]
            a = jnp.concatenate([a, jnp.zeros(pad_shape, a.dtype)], axis=1)
        return a

    yf = padl(padw(y.astype(dtype), w, wp))
    uf = padl(padw(u.astype(jnp.int32).astype(dtype), w2, wp2))
    vf = padl(padw(v.astype(jnp.int32).astype(dtype), w2, wp2))
    xi_col = padl(xi[..., None].astype(jnp.float32))
    sincos_p = padl(sincos)
    keep_p = padl(keep)

    spec_full = pl.BlockSpec((1, tl, wp), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM)
    spec_half = pl.BlockSpec((1, tl, wp2), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM)
    spec_col = pl.BlockSpec((1, tl, 1), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)
    spec_sc = pl.BlockSpec((1, tl, 2), lambda i, j: (i, j, 0),
                           memory_space=pltpu.VMEM)
    spec_tt = pl.BlockSpec(tt_np.shape, lambda i, j: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_d = pl.BlockSpec(d_np.shape, lambda i, j: (0, 0),
                          memory_space=pltpu.VMEM)
    spec_d3 = pl.BlockSpec(d3_np.shape, lambda i, j: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_vt = pl.BlockSpec(vt_np.shape, lambda i, j: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_ed = pl.BlockSpec(ed_np.shape, lambda i, j: (0, 0),
                           memory_space=pltpu.VMEM)
    spec_eu = pl.BlockSpec(eu_np.shape, lambda i, j: (0, 0),
                           memory_space=pltpu.VMEM)
    spec_nk = pl.BlockSpec((1, 1, 2), lambda i, j: (i, 0, 0),
                           memory_space=pltpu.SMEM)
    grid = (b, n_lt)

    out_shapes = (jax.ShapeDtypeStruct((b, lp, wp), dtype),
                  jax.ShapeDtypeStruct((b, lp, wp2), dtype),
                  jax.ShapeDtypeStruct((b, lp, wp2), dtype))
    do_vblend = (cfg.emulating_vhs and cfg.vhs_chroma_vert_blend
                 and cfg.ntsc)
    if single_tile:
        # MERGED path: kernel A + in-kernel head switch + kernel B as ONE
        # pallas program (fused_yiq._make_kernel_ab rationale). Gen-1
        # reuses the switch point for both raster axes
        # (ffmpeg_to_composite.cpp:668-732) and pads with luma black.
        hs = None
        hs_win = None
        if cfg.vhs_head_switching:
            hs_win = _hs_window_rows(l)
            shifts, w0a = yiq_mod.head_switch_window_shifts(
                l, field_parity, keys[1],
                point=cfg.vhs_head_switching_point,
                phase=cfg.vhs_head_switching_point,
                phase_noise=cfg.vhs_head_switching_phase_noise,
                twidth=w + w // 10, ntsc=cfg.ntsc, win=hs_win)
            hs = (shifts[..., None].astype(jnp.float32),
                  w0a.reshape(b, 1, 1).astype(jnp.int32))
        kernel_ab = _make_kernel_ab(cfg, w, wp, w2, wp2, l, tl,
                                    hs_win=hs_win)
        in_specs = [spec_full, spec_half, spec_half, spec_col, spec_nk,
                    spec_sc, spec_col]
        operands = [yf, uf, vf, xi_col, keys_ab, sincos_p, keep_p]
        scratch = []
        if hs is not None:
            in_specs += list(_hs_specs(hs_win))
            operands += list(hs)
            if hs_win < tl:
                scratch = [pltpu.VMEM((tl, wp), dtype)]
        y_o, u_o, v_o = pl.pallas_call(
            kernel_ab,
            out_shape=out_shapes,
            grid=grid,
            in_specs=in_specs + [spec_tt, spec_d, spec_tt, spec_d3,
                                 spec_vt, spec_ed, spec_eu],
            out_specs=(spec_full, spec_half, spec_half),
            scratch_shapes=scratch,
            interpret=interpret,
            compiler_params=_COMPILER_PARAMS,
        )(*operands, tts, ds, tt3s, d3s, vts, ed, eu)
    else:
        kernel_a = _make_kernel_a(cfg, w, wp, w2, wp2, tl)
        y_enc = pl.pallas_call(
            kernel_a,
            out_shape=jax.ShapeDtypeStruct((b, lp, wp), dtype),
            grid=grid,
            in_specs=[spec_full, spec_half, spec_half, spec_col, spec_nk,
                      spec_tt, spec_d, spec_tt, spec_d3, spec_vt, spec_eu],
            out_specs=spec_full,
            interpret=interpret,
            compiler_params=_COMPILER_PARAMS,
        )(yf, uf, vf, xi_col, keys_ab, tts, ds, tt3s, d3s, vts, eu)
        if cfg.vhs_head_switching:
            # tiled mode: XLA windowed in-place head switch between the
            # kernel halves
            y_enc = yiq_mod.head_switching_padded(
                y_enc, l, w, field_parity, keys[1],
                point=cfg.vhs_head_switching_point,
                phase=cfg.vhs_head_switching_point,
                phase_noise=cfg.vhs_head_switching_phase_noise,
                ntsc=cfg.ntsc, fill=16.0)
        kernel_b1 = _make_kernel_b1(cfg, w, wp, w2, wp2, l, tl)
        y2, u2, v2 = pl.pallas_call(
            kernel_b1,
            out_shape=out_shapes,
            grid=grid,
            in_specs=[spec_full, spec_col, spec_nk, spec_sc,
                      spec_tt, spec_d, spec_tt, spec_d3, spec_vt, spec_ed],
            out_specs=(spec_full, spec_half, spec_half),
            interpret=interpret,
            compiler_params=_COMPILER_PARAMS,
        )(y_enc, xi_col, keys_ab, sincos_p, tts, ds, tt3s, d3s, vts, ed)
        if do_vblend:
            xw2 = jnp.arange(wp2)[None, None, :]

            def vblend(p):
                pr = p[:, :l]
                prev = jnp.concatenate(
                    [jnp.zeros_like(pr[:, :1]), pr[:, :-1]], axis=1)
                rows = jnp.arange(l)[None, :, None]
                prev = jnp.where(rows == 1, 128.0, prev)
                blended = jnp.floor((prev + pr + 1.0) / 2.0)
                blended = jnp.where(rows == 0, pr, blended)
                blended = jnp.where(xw2 < w2, blended, 0.0)
                return padl(blended)

            u2 = vblend(u2)
            v2 = vblend(v2)
        kernel_b2 = _make_kernel_b2(cfg, w, wp, w2, wp2)
        y_o, u_o, v_o = pl.pallas_call(
            kernel_b2,
            out_shape=out_shapes,
            grid=grid,
            in_specs=[spec_full, spec_half, spec_half, spec_col, spec_col,
                      spec_tt, spec_d, spec_tt, spec_d3, spec_vt,
                      spec_ed, spec_eu],
            out_specs=(spec_full, spec_half, spec_half),
            interpret=interpret,
            compiler_params=_COMPILER_PARAMS,
        )(y2, u2, v2, xi_col, keep_p, tts, ds, tt3s, d3s, vts, ed, eu)

    return (y_o[:, :l, :w].astype(jnp.int32),
            u_o[:, :l, :w2].astype(jnp.int32),
            v_o[:, :l, :w2].astype(jnp.int32))
