"""Whole-chain fused Pallas implementation of the gen-2 composite engine.

The stage-by-stage XLA path (models/yiq.py) makes ~60 HBM passes per field;
this implementation keeps a full field's planes resident in VMEM. For
single-tile rasters (SD and 1080i both fit) the WHOLE chain is ONE merged
pallas program (_make_kernel_ab):

  RGB->YIQ, input chroma lowpass, QAM encode, composite preemphasis,
  luma noise add, VHS head switching (in-VMEM windowed rotation modulo
  twidth=W+W/10 — _head_switch_window), Y/C separation + QAM decode,
  chroma AM/phase noise, VHS bandlimit/vertical blend/sharpen/recombine,
  chroma dropout, output chroma lowpass, YIQ->RGB

Rasters over the VMEM tile budget split into kernel A (through the noise
add) / XLA windowed head switch / kernel B1+B2 with the vertical blend
between them; the line-sharded multi-chip path uses the same split so its
cross-line stages can run as GSPMD seam stages (parallel/mesh.py).

Stochastic inputs (noise walks, phase angles, dropout masks, head-switch
shifts) are precomputed outside with the exact key-split order of
models/yiq.composite_layer, so both paths produce identical streams.

All math matches ffmpeg_ntsc.cpp semantics (same citations as yiq.py);
integer truncation is done in f32 (exact for the plane value ranges, which
stay far below 2^24).
"""

from __future__ import annotations

import functools
import types

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cvsim_tpu.config import CompositeConfig, NTSC_RATE, iir_alpha
from cvsim_tpu.models import yiq
from cvsim_tpu.ops.blocked_iir import _cascade3_consts, _decay_consts
from cvsim_tpu.ops.cmath import c_int
from cvsim_tpu.ops.noise import (
    field_stage_keys,
    randint_per_field,
    random_walk_per_field,
)
from cvsim_tpu.ops.phase import scanline_phase_xi

BLOCK = 128
# VMEM thresholds (samples per tile). The single-tile kernel B costs
# ~20x the tile's f32 bytes (12 live buffers + the double-buffered operand
# and 3 output blocks); the tiled kernel B1 ~26x (18 live). With the 100MB
# scoped limit below those bound tiles at ~1.22M / ~0.96M samples; the
# budgets sit under that with headroom. 1080i (540x1920 = 1.037M) now runs
# the SINGLE-TILE kernel — in-kernel vblend, no b1/vblend/b2 XLA hop —
# measured 2363 vs 1403 fields/s tiled on v5e (+68%, bit-identical; the
# trade is a one-time remote-compile cost of ~4 min for the HD kernel).
# Tests shrink _TILE_BUDGET to exercise the tiled path on small shapes.
_SINGLE_TILE_BUDGET = 1_050_000
_TILE_BUDGET = 525_000

# The kernels were originally tuned against Mosaic's default 16MB
# scoped-VMEM limit with ~0.1% headroom at SD — surrounding-program layout
# changes (e.g. the head-switch one-hot rewrite) shifted operand copies
# enough to OOM by 16KB on a real v5e. Raise the scoped limit explicitly:
# v5e cores have 128MB of VMEM and these kernels dominate their programs.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _merged_params(tile_samples: int) -> pltpu.CompilerParams:
    """Scoped-VMEM limit for the MERGED single-tile kernel. The 1080i
    merged program measured 110.7MB of scoped demand when the surrounding
    XLA program's layout choices added operand copies (a B=2 standalone
    fit under 100MB; a B=64 scan-wrapped build did not) — give big tiles
    the headroom up to near the v5e core's 128MB; SD-class tiles keep the
    shared 100MB limit."""
    mb = 120 if tile_samples > 600_000 else 100
    return pltpu.CompilerParams(vmem_limit_bytes=mb * 1024 * 1024)


# ----------------------------------------------------------- kernel helpers

def _trunc(x):
    return jnp.trunc(x)


def _cdiv(a, b):
    return jnp.trunc(a / b)


def _pole(x, cst, y0: float, nb: int):
    """One causal pole over [L, nb*128] (VMEM-resident blocked matmul).
    cst = (T_t, d, T3_t, V) — the stacked per-alpha constants."""
    T_t, d = cst[0], cst[1]
    outs = []
    carry = jnp.full((x.shape[0], 1), y0, x.dtype)
    for b in range(nb):
        xb = x[:, b * BLOCK:(b + 1) * BLOCK]
        yb = jnp.dot(xb, T_t, preferred_element_type=x.dtype) + d * carry
        carry = yb[:, BLOCK - 1:BLOCK]
        outs.append(yb)
    return jnp.concatenate(outs, axis=-1)


def _pole3(x, cst, y0: float, nb: int):
    """Three identical poles composed into ONE matmul per block:
    y3 = T^3 x + (T^2 d) c1 + (T d) c2 + d c3, carries from the last rows
    of T / T^2 (a third of the MXU work of three sequential _pole passes).
    Identical op order to ops/blocked_iir.iir_lowpass3_blocked so the XLA
    stage path stays bit-identical."""
    _, d, T3_t, D3, VT = cst
    dc1 = D3[0:1]                          # [1, 128] broadcast rows
    dc2 = D3[1:2]
    v12_t = VT[:, :2]                      # [128, 2]
    dl = d[BLOCK - 1:BLOCK]                # [1] (no scalar extracts)
    s2 = D3[1:2, BLOCK - 1:BLOCK]          # [1, 1]
    q1 = D3[0:1, BLOCK - 1:BLOCK]
    del q1  # c3 comes from yb's last lane (same fl sequence), not rebuilt
    outs = []
    c1 = c2 = c3 = jnp.full((x.shape[0], 1), y0, x.dtype)
    for b in range(nb):
        xb = x[:, b * BLOCK:(b + 1) * BLOCK]
        yb = (jnp.dot(xb, T3_t, preferred_element_type=x.dtype)
              + dc1 * c1 + dc2 * c2 + d * c3)
        u12 = jnp.dot(xb, v12_t, preferred_element_type=x.dtype)
        nc1 = u12[:, 0:1] + dl * c1
        nc2 = u12[:, 1:2] + s2 * c1 + dl * c2
        c3 = yb[:, BLOCK - 1:BLOCK]
        c1, c2 = nc1, nc2
        outs.append(yb)
    return jnp.concatenate(outs, axis=-1)


def _iota_w(wp):
    return jax.lax.broadcasted_iota(jnp.int32, (1, wp), 1)


def _lowpass_writeback(p, cst, delay: int, w: int, wp: int, y0=0.0):
    """3-pole cascade + the reference's delayed in-place writeback:
    out[x] = trunc(f[x+delay]) for x < w-delay, original beyond."""
    s = _trunc(_pole3(p, cst, y0, wp // BLOCK))
    shifted = jnp.roll(s, -delay, axis=-1) if delay else s
    xw = _iota_w(wp)
    out = jnp.where(xw < (w - delay), shifted, p)
    return jnp.where(xw < w, out, 0.0)


_GOLD = np.uint32(0x9E3779B9)


def _mix32_k(x):
    """In-kernel splitmix32 avalanche — same ops as ops/noise.mix32."""
    x = (x ^ (x >> 16)) * np.uint32(0x85EBCA6B)
    x = (x ^ (x >> 13)) * np.uint32(0xC2B2AE35)
    return x ^ (x >> 16)


def _walk_rows_kernel(key_u, row0: int, mag: int, plane_off: int,
                      w: int, wp: int, tl: int, cst):
    """In-kernel per-row smoothed noise walk [tl, wp]: generate the
    content-addressed increments (stream index plane_off + row*w + x, same
    as ops/noise.*_rows) on the VPU and run the alpha-0.5 walk on the MXU.
    Bit-equal to c_int(smoothed_noise_walk_rows(...)) — the blocked-matmul
    structure and f32 ops match iir_lowpass_blocked exactly, so the fused
    and stage-by-stage paths keep identical streams with the walks never
    touching HBM."""
    span = np.uint32(2 * mag + 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (tl, wp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tl, wp), 1)
    idx = (jnp.uint32(plane_off) + (rows + row0).astype(jnp.uint32)
           * np.uint32(w) + cols.astype(jnp.uint32))
    bits = _mix32_k(key_u + idx * _GOLD)
    u = (bits % span).astype(jnp.int32) - mag
    u = jnp.where(cols < w, u.astype(jnp.float32), 0.0)
    y = _pole(u, cst, 0.0, wp // BLOCK)
    sm = jnp.where(cols == 0, 0.0, jnp.roll(y, 1, axis=-1))
    return _trunc(sm)


def _qam_multipliers(xi_col, wp):
    sxi = (xi_col + _iota_w(wp)) & 3
    um = jnp.where(sxi == 0, 1.0, jnp.where(sxi == 2, -1.0, 0.0))
    vm = jnp.where(sxi == 1, 1.0, jnp.where(sxi == 3, -1.0, 0.0))
    return um, vm


def _qam_encode(y, i, q, xi_col, amp: int, wp: int):
    um, vm = _qam_multipliers(xi_col, wp)
    chroma = i * (amp * um) + q * (amp * vm)
    return y + _cdiv(chroma, 50.0)


def _roll2(a, shift_col):
    """Barrel shift for shifts in [0, 4): out[x] = a[(x + s) mod Wp]."""
    for b in range(2):
        bit = ((shift_col >> b) & 1) == 1
        a = jnp.where(bit, jnp.roll(a, -(1 << b), axis=-1), a)
    return a


def _hs_rotate(ywin, s_col, *, w: int, wp: int, fill: float):
    """Per-row rotation mod twidth = w + w//10 on a VMEM-resident window.

    out[x] = pad[(x+s) mod twidth] with pad[j] = row[j] (j < w) else fill
    (ffmpeg_ntsc.cpp:1683-1712). The mod-twidth rotation decomposes over
    the wp-cyclic lane axis into ONE barrel roll plus a static correction
    roll:
      no wrap:  row[x+s_pos] = roll_left(row, s_pos)          if x+s_pos < w
      wrap:     row[x+s_pos-twidth]
                  = roll_right(roll_left(row, s_pos), twidth mod wp)
                                                       if x >= twidth-s_pos
      else fill.
    Both conditions pin the true index into [0, w) <= wp, so the mod-wp
    aliasing of the cyclic rolls is always masked off. Rows with s == 0
    and columns >= w pass through (matches the staged path)."""
    twidth = w + w // 10
    swin = s_col.astype(jnp.int32)
    s_pos = jnp.remainder(swin, twidth)                    # [win, 1] >= 0
    xw = _iota_w(wp)
    t1 = ywin
    for bnum in range((twidth - 1).bit_length()):
        # the rolls are mod-wp cyclic by construction, so reduce each
        # shift mod wp and drop identity rolls — at wp <= 2^bnum a full
        # -wp roll otherwise lowers to a zero-size Mosaic slice (caught
        # by the w=128 line-sharded hardware test)
        sh = (1 << bnum) % wp
        if sh == 0:
            continue
        bit = ((s_pos >> bnum) & 1) == 1
        t1 = jnp.where(bit, jnp.roll(t1, -sh, axis=-1), t1)
    t2 = jnp.roll(t1, twidth % wp, axis=-1) if twidth % wp else t1
    rot = jnp.where(xw + s_pos < w, t1,
                    jnp.where(xw >= twidth - s_pos, t2, fill))
    return jnp.where((s_pos != 0) & (xw < w), rot, ywin)


def _head_switch_window(y, scratch_ref, hs_ref, w0, *, w: int,
                        wp: int, win: int, fill: float):
    """In-kernel VHS head switch: windowed per-row rotation mod twidth.

    Same permutation as yiq.head_switching_padded applied on the
    VMEM-resident tile inside the fused kernel — the XLA stage between
    the kernel halves cost 11.3 us/field at SD (round-5 stage ablation),
    dominated by the kernel-boundary HBM round trips of the one-hot
    extract/realign. Here only the <=win sublane-aligned rows move,
    entirely in VMEM: the shift operand arrives pre-windowed ([B, win, 1],
    yiq.head_switch_window_shifts), and the window rows slice dynamically
    through a VMEM scratch ref (Mosaic has no value-level dynamic_slice:
    full-tile copy in, windowed ref load/store, full-tile load out).
    Small tiles (win == rows) skip the window machinery entirely."""
    s_col = hs_ref[0]                                       # [win, 1]
    if win >= y.shape[0]:
        return _hs_rotate(y, s_col, w=w, wp=wp, fill=fill)
    # w0 is built 8-aligned (head_switch_window_shifts); Mosaic needs the
    # divisibility hint to allow a dynamic sublane start
    w0 = pl.multiple_of(w0, 8)
    scratch_ref[...] = y
    ywin = scratch_ref[pl.ds(w0, win), :]
    out = _hs_rotate(ywin, s_col, w=w, wp=wp, fill=fill)
    scratch_ref[pl.ds(w0, win), :] = out
    return scratch_ref[...]


def _qam_decode(y, xi_col, amp_back: int, w: int, wp: int):
    """Y/C separation + demux (ffmpeg_ntsc.cpp:1497-1567) on VMEM arrays."""
    xw = _iota_w(wp)
    prev = jnp.where(xw == 0, 0.0, jnp.roll(y, 1, axis=-1))
    # the reference's delay line zero-guards reads past the active width
    # (c = Y[x+2] if x+2 < w else 0); the explicit masks also stop the
    # cyclic rolls from wrapping when wp == w
    nxt1 = jnp.where(xw + 1 < w, jnp.roll(y, -1, axis=-1), 0.0)
    nxt2 = jnp.where(xw + 2 < w, jnp.roll(y, -2, axis=-1), 0.0)
    new_y = _cdiv(prev + y + nxt1 + nxt2, 4.0)
    chroma = nxt2 - new_y

    x0 = (4 - xi_col) & 3
    r = (xw - x0) & 3
    base = xw - r
    flip = (r >= 2) & (base >= x0) & ((base + 3) < w)
    chroma = jnp.where(flip, -chroma, chroma)
    chroma = _cdiv(chroma * 50.0, float(amp_back))

    r0 = _roll2(chroma, xi_col)
    gq = jnp.roll(r0, -1, axis=-1)
    even = (xw & 1) == 0
    valid = (xw + xi_col + 1) < w
    i_e = jnp.where(even & valid, -r0, 0.0)
    q_e = jnp.where(even & valid, -gq, 0.0)

    def interp(p):
        odd_val = jnp.floor(
            (jnp.roll(p, 1, axis=-1) + jnp.roll(p, -1, axis=-1)) / 2.0)
        out = jnp.where(even, p, odd_val)
        tail_start = w - 2 if w % 2 == 0 else w - 1
        return jnp.where(xw >= tail_start, 0.0, out)

    new_y = jnp.where(xw < w, new_y, 0.0)
    return new_y, interp(i_e), interp(q_e)


# ------------------------------------------------------------------ kernels

def _kernel_a_math(cfg: CompositeConfig, w: int, wp: int, tl: int,
                   r, g, b, xi_col, nk_u, row0, cs):
    """RGB->YIQ, in-chroma lowpass, QAM encode, preemphasis, luma noise —
    kernel A's math on VMEM values, returning the encoded luma. Shared by
    the standalone kernel A (tiled/sharded modes) and the merged
    single-tile kernel (_make_kernel_ab)."""
    nb = wp // BLOCK
    amp = cfg.subcarrier_amplitude
    do_pre = (cfg.composite_preemphasis != 0
              and cfg.composite_preemphasis_cut > 0)
    xw = _iota_w(wp)
    active = xw < w
    # RGB -> YIQ (x256 ints, trunc)
    dy = 0.30 * r + 0.59 * g + 0.11 * b
    y = _trunc(256.0 * dy)
    i = _trunc(256.0 * ((-0.27 * (b - dy)) + (0.74 * (r - dy))))
    q = _trunc(256.0 * ((0.41 * (b - dy)) + (0.48 * (r - dy))))
    y = jnp.where(active, y, 0.0)
    i = jnp.where(active, i, 0.0)
    q = jnp.where(active, q, 0.0)

    if cfg.composite_in_chroma_lowpass:
        i = _lowpass_writeback(i, cs[0], 2, w, wp)
        q = _lowpass_writeback(q, cs[1], 4, w, wp)

    y = _qam_encode(y, i, q, xi_col, amp, wp)

    if do_pre:
        lp = _pole(y, cs[2], 16.0, nb)
        y = _trunc(y + (y - lp) * cfg.composite_preemphasis)

    if cfg.video_noise != 0:
        # row0 is the global first-row index of this block (0 off-mesh):
        # the noise streams are content-addressed by ABSOLUTE row, so
        # line-sharded and plain dispatch generate identical walks
        # (parallel/mesh.run_sharded_chain_fused_lines)
        y = y + _walk_rows_kernel(nk_u, row0, cfg.video_noise,
                                  0, w, wp, tl, cs[7])

    return jnp.where(active, y, 0.0)


def _make_kernel_a(cfg: CompositeConfig, w: int, wp: int, tl: int):
    def kernel(r_ref, g_ref, b_ref, xi_ref, nk_ref, row_ref, tt_ref, d_ref,
               tt3_ref, d3_ref, vt_ref, y_ref):
        cs = _TTBinder()
        cs.bind(tt_ref, d_ref, tt3_ref, d3_ref, vt_ref)
        y_ref[0] = _kernel_a_math(
            cfg, w, wp, tl, r_ref[0], g_ref[0], b_ref[0],
            xi_ref[0].astype(jnp.int32),
            nk_ref[0, 0, 0].astype(jnp.uint32),
            row_ref[0, 0] + pl.program_id(1) * tl, cs)

    return kernel


def _kernel_b_front(cfg, w, wp, l, tl, y, xi_col, nk_u, row0, sin_a, cos_a,
                    cs):
    """Decode + chroma/phase noise + VHS bandlimit (row-independent).

    row0: GLOBAL index of this block's first row; l: GLOBAL field height
    (the q-walk's stream plane offset l*w addresses the whole field even
    when only a line shard of it is resident)."""
    nb = wp // BLOCK
    speed = cfg.vhs_tape_speed
    xw = _iota_w(wp)
    active = xw < w

    if not cfg.nocolor_subcarrier:
        y, i, q = _qam_decode(y, xi_col, cfg.subcarrier_amplitude_back, w, wp)
    else:
        i = jnp.zeros_like(y)
        q = jnp.zeros_like(y)

    if cfg.video_chroma_noise != 0:
        mag = cfg.video_chroma_noise
        i = i + _walk_rows_kernel(nk_u, row0, mag, 0, w, wp, tl, cs[7])
        q = q + _walk_rows_kernel(nk_u, row0, mag, l * w, w, wp, tl, cs[7])

    if cfg.video_chroma_phase_noise != 0:
        if cfg.chroma_phase_noise_gen1_bug:
            i2 = i * cos_a - i * sin_a
            q2 = q * cos_a + q * sin_a
        else:
            i2 = i * cos_a - q * sin_a
            q2 = i * sin_a + q * cos_a
        i = _trunc(i2)
        q = _trunc(q2)

    if cfg.emulating_vhs:
        s = _pole3(y, cs[3], 16.0, nb)
        lp = _pole(s, cs[3], 16.0, nb)
        y = jnp.where(active, _trunc(s + (s - lp) * 1.6), 0.0)
        i = _lowpass_writeback(i, cs[4], speed.chroma_delay_gen2, w, wp)
        q = _lowpass_writeback(q, cs[4], speed.chroma_delay_gen2, w, wp)
    return y, i, q


def _kernel_b_vblend(cfg, i, q):
    """In-kernel 2-line chroma blend (single-tile mode only)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (i.shape[0], 1), 0)

    def vblend(p):
        prev = jnp.roll(p, 1, axis=0)
        prev = jnp.where(rows == 1, 0.0, prev)
        blended = jnp.floor((prev + p + 1.0) / 2.0)
        return jnp.where(rows == 0, p, blended)

    return vblend(i), vblend(q)


def _kernel_b_back(cfg, w, wp, y, i, q, xi_col, keep, cs):
    """Sharpen + recombine + dropout + output lowpass + YIQ->RGB
    (row-independent)."""
    nb = wp // BLOCK
    xw = _iota_w(wp)
    active = xw < w

    if cfg.emulating_vhs:
        ts = _pole3(y, cs[5], 0.0, nb)
        y = jnp.where(active,
                      _trunc(y + (y - ts) * (cfg.vhs_out_sharpen * 2.0)), 0.0)
        if not cfg.vhs_svideo_out:
            y = _qam_encode(y, i, q, xi_col, cfg.subcarrier_amplitude, wp)
            y, i, q = _qam_decode(y, xi_col, cfg.subcarrier_amplitude, w, wp)

    if cfg.video_chroma_loss != 0:
        i = i * keep
        q = q * keep

    for _ in range(cfg.video_yc_recombine):
        y = _qam_encode(y, i, q, xi_col, cfg.subcarrier_amplitude, wp)
        y, i, q = _qam_decode(y, xi_col, cfg.subcarrier_amplitude, w, wp)

    if cfg.composite_out_chroma_lowpass:
        if cfg.composite_out_chroma_lowpass_lite:
            i = _lowpass_writeback(i, cs[6], 1, w, wp)
            q = _lowpass_writeback(q, cs[6], 1, w, wp)
        else:
            i = _lowpass_writeback(i, cs[0], 2, w, wp)
            q = _lowpass_writeback(q, cs[1], 4, w, wp)

    r = _trunc((1.000 * y + 0.956 * i + 0.621 * q) / 256.0)
    g = _trunc((1.000 * y - 0.272 * i - 0.647 * q) / 256.0)
    b = _trunc((1.000 * y - 1.106 * i + 1.703 * q) / 256.0)
    return (jnp.clip(r, 0.0, 255.0), jnp.clip(g, 0.0, 255.0),
            jnp.clip(b, 0.0, 255.0))


class _TTBinder:
    """Binds the stacked decay-constant refs so the section helpers can say
    _TT[k] -> (T_t, d, T3_t, D3, VT) without threading the refs
    everywhere.  T3_t/D3/VT are the composed-cascade constants
    (ops/blocked_iir._cascade3_consts): D3 rows 0/1 = T^2 d / T d, VT
    cols 0/1 = last rows of T / T^2 (transposed host-side so the kernel
    never transposes)."""

    def __init__(self):
        self.refs = None

    def bind(self, tt_ref, d_ref, tt3_ref, d3_ref, vt_ref):
        self.refs = (tt_ref, d_ref, tt3_ref, d3_ref, vt_ref)

    def __getitem__(self, k):
        return tuple(r[k] for r in self.refs)



def _make_kernel_ab(cfg: CompositeConfig, w: int, wp: int, l: int, tl: int,
                    hs_win: int | None = None):
    """MERGED single-tile kernel: kernel A + in-kernel head switch +
    kernel B in ONE pallas program. The two-kernel split existed only for
    the XLA head-switch stage between the halves; with the switch applied
    in VMEM (_head_switch_window) the single-tile path needs no kernel
    boundary at all — the encoded-luma plane never touches HBM and the
    IIR constant tables load once instead of twice. Unsharded single-tile
    only (the line-sharded and tiled paths keep the A/B split for their
    cross-shard seam stages); bit-identical to the split dispatch."""
    windowed = hs_win is not None and hs_win < tl

    def body(r_ref, g_ref, b_ref, xi_ref, nk_ref, sc_ref, drop_ref,
             tt_ref, d_ref, tt3_ref, d3_ref, vt_ref,
             r_out, g_out, b_out, hs=None, scratch_ref=None):
        cs = _TTBinder()
        cs.bind(tt_ref, d_ref, tt3_ref, d3_ref, vt_ref)
        xi_col = xi_ref[0].astype(jnp.int32)
        row0 = pl.program_id(1) * tl
        y = _kernel_a_math(cfg, w, wp, tl, r_ref[0], g_ref[0], b_ref[0],
                           xi_col, nk_ref[0, 0, 0].astype(jnp.uint32),
                           row0, cs)
        if hs is not None:
            hs_ref, w0_ref = hs
            y = _head_switch_window(y, scratch_ref, hs_ref,
                                    w0_ref[0, 0, 0], w=w, wp=wp,
                                    win=hs_win, fill=0.0)
        y, i, q = _kernel_b_front(cfg, w, wp, l, tl, y, xi_col,
                                  nk_ref[0, 0, 1].astype(jnp.uint32),
                                  row0,
                                  sc_ref[0, :, 0:1], sc_ref[0, :, 1:2], cs)
        if cfg.emulating_vhs and cfg.vhs_chroma_vert_blend and cfg.ntsc:
            i, q = _kernel_b_vblend(cfg, i, q)
        r, g, b = _kernel_b_back(cfg, w, wp, y, i, q, xi_col, drop_ref[0],
                                 cs)
        r_out[0] = r
        g_out[0] = g
        b_out[0] = b

    if hs_win is None:
        def kernel(r_ref, g_ref, b_ref, xi_ref, nk_ref, sc_ref, drop_ref,
                   tt_ref, d_ref, tt3_ref, d3_ref, vt_ref,
                   r_out, g_out, b_out):
            body(r_ref, g_ref, b_ref, xi_ref, nk_ref, sc_ref, drop_ref,
                 tt_ref, d_ref, tt3_ref, d3_ref, vt_ref,
                 r_out, g_out, b_out)
    elif windowed:
        def kernel(r_ref, g_ref, b_ref, xi_ref, nk_ref, sc_ref, drop_ref,
                   hs_ref, w0_ref, tt_ref, d_ref, tt3_ref, d3_ref, vt_ref,
                   r_out, g_out, b_out, scratch_ref):
            body(r_ref, g_ref, b_ref, xi_ref, nk_ref, sc_ref, drop_ref,
                 tt_ref, d_ref, tt3_ref, d3_ref, vt_ref,
                 r_out, g_out, b_out, hs=(hs_ref, w0_ref),
                 scratch_ref=scratch_ref)
    else:
        def kernel(r_ref, g_ref, b_ref, xi_ref, nk_ref, sc_ref, drop_ref,
                   hs_ref, w0_ref, tt_ref, d_ref, tt3_ref, d3_ref, vt_ref,
                   r_out, g_out, b_out):
            body(r_ref, g_ref, b_ref, xi_ref, nk_ref, sc_ref, drop_ref,
                 tt_ref, d_ref, tt3_ref, d3_ref, vt_ref,
                 r_out, g_out, b_out, hs=(hs_ref, w0_ref))

    return kernel


def _make_kernel_b1(cfg: CompositeConfig, w: int, wp: int, l: int, tl: int):
    """Tiled-mode front half (row-independent; vblend happens in XLA)."""

    def kernel(y_ref, xi_ref, nk_ref, row_ref, sc_ref, tt_ref, d_ref,
               tt3_ref, d3_ref, vt_ref, y_out, i_out, q_out):
        cs = _TTBinder()
        cs.bind(tt_ref, d_ref, tt3_ref, d3_ref, vt_ref)
        y = y_ref[0]
        xi_col = xi_ref[0].astype(jnp.int32)
        y, i, q = _kernel_b_front(cfg, w, wp, l, tl, y, xi_col,
                                  nk_ref[0, 0, 1].astype(jnp.uint32),
                                  row_ref[0, 0] + pl.program_id(1) * tl,
                                  sc_ref[0, :, 0:1], sc_ref[0, :, 1:2], cs)
        y_out[0] = y
        i_out[0] = i
        q_out[0] = q

    return kernel


def _make_kernel_b2(cfg: CompositeConfig, w: int, wp: int):
    """Tiled-mode back half (row-independent)."""

    def kernel(y_ref, i_ref, q_ref, xi_ref, drop_ref, tt_ref, d_ref,
               tt3_ref, d3_ref, vt_ref, r_ref, g_ref, b_ref):
        cs = _TTBinder()
        cs.bind(tt_ref, d_ref, tt3_ref, d3_ref, vt_ref)
        xi_col = xi_ref[0].astype(jnp.int32)
        r, g, b = _kernel_b_back(cfg, w, wp, y_ref[0], i_ref[0], q_ref[0],
                                 xi_col, drop_ref[0], cs)
        r_ref[0] = r
        g_ref[0] = g
        b_ref[0] = b

    return kernel


# ---------------------------------------------------------------- dispatcher

def _alpha_consts(cfg: CompositeConfig):
    """Stacked decay constants: rows are
    0: in/out I 1.3MHz, 1: in/out Q 0.6MHz, 2: preemphasis cut,
    3: VHS luma cut, 4: VHS chroma cut, 5: VHS sharpen (4x luma cut),
    6: out 'tv' 2.6MHz, 7: the alpha-0.5 noise walk."""
    speed = cfg.vhs_tape_speed
    # preemphasis row: the stage path gates on cut > 0, so <= 0 only ever
    # fills an UNUSED row (1.0 dummy keeps iir_alpha finite); a positive
    # sub-1Hz cut must pass through unclamped for stage/fused bit-identity
    pre_cut = (cfg.composite_preemphasis_cut
               if cfg.composite_preemphasis_cut > 0 else 1.0)
    cuts = [1300000.0, 600000.0, pre_cut,
            speed.luma_cut, speed.chroma_cut, speed.luma_cut * 4.0,
            2600000.0]
    alphas = [float(iir_alpha(NTSC_RATE, c)) for c in cuts] + [0.5]
    return _stack_alpha_consts(alphas)


def _stack_alpha_consts(alphas):
    """(tt, d, tt3, d3, vt) numpy stacks for a list of alphas — the
    single-pole constants plus the composed 3-pole-cascade constants
    (T^3, its carry vectors, and the last rows of T/T^2, pre-transposed
    for the in-kernel dots)."""
    tts, ds, tt3s, d3s, vts = [], [], [], [], []
    for a in alphas:
        T, d, _pk = _decay_consts(a, BLOCK, "float32")
        T3, dc1, dc2, _d, v12 = _cascade3_consts(a, BLOCK, "float32")
        tts.append(T.T.copy())
        ds.append(d)
        tt3s.append(T3.T.copy())
        d3 = np.zeros((8, BLOCK), np.float32)
        d3[0] = dc1
        d3[1] = dc2
        d3s.append(d3)
        vt = np.zeros((BLOCK, 8), np.float32)
        vt[:, 0] = v12[0]
        vt[:, 1] = v12[1]
        vts.append(vt)
    return tuple(np.stack(x) for x in (tts, ds, tt3s, d3s, vts))


class _FusedCtx(types.SimpleNamespace):
    """Prepared inputs/specs for one fused dispatch (or one line shard)."""


def _fused_prepare(cfg: CompositeConfig, rgb, fieldno, field_parity, key,
                   row0, noise_l: int, interpret: bool, sharded: bool):
    """Everything composite_layer_rgb_fused needs before the first kernel:
    per-field stage keys, per-line streams (phase xi, chroma-phase sincos,
    dropout keep — computed at the GLOBAL height `noise_l` and row-sliced
    when `sharded`, because the phase pattern, the per-line walk and the
    dropout stream are all addressed by ABSOLUTE line), decay constants,
    padded planes, line tiling, and the pallas specs/grid."""
    rgb = jnp.asarray(rgb, jnp.int32)
    b, l, w, _ = rgb.shape
    nb = -(-w // BLOCK)
    wp = nb * BLOCK
    dtype = jnp.float32

    gen_l = noise_l if sharded else l
    xi = scanline_phase_xi(
        fieldno, field_parity, gen_l,
        cfg.video_scanline_phase_shift, cfg.video_scanline_phase_shift_offset,
        cfg.ntsc, gen1=False)
    keys = [field_stage_keys(key, fieldno, sid) for sid in range(5)]

    # --- stochastic inputs: the per-pixel walk streams (luma + chroma) are
    # generated IN-KERNEL from these per-field stream ids (bit-equal to the
    # stage path's smoothed_noise_walk_rows — see _walk_rows_kernel); only
    # the small per-line streams (phase angle, dropout) ride HBM ---
    keys_ab = jnp.stack([keys[0], keys[2]],
                    axis=-1).astype(jnp.int32)[:, None, :]  # [B,1,2]
    if cfg.video_chroma_phase_noise != 0:
        pwalk = random_walk_per_field(keys[3], gen_l,
                                      cfg.video_chroma_phase_noise,
                                      dtype=dtype)
        ang = c_int(pwalk) * jnp.asarray(jnp.pi / 100.0, dtype)
        sincos = jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-1)  # [B, L, 2]
    else:
        zeros = jnp.zeros((b, gen_l), dtype)
        sincos = jnp.stack([zeros, zeros + 1.0], axis=-1)
    if cfg.video_chroma_loss != 0:
        rr = randint_per_field(keys[4], (gen_l,), 0, 100000)
        keep = (rr >= cfg.video_chroma_loss).astype(dtype)[..., None]  # [B,L,1]
    else:
        keep = jnp.ones((b, gen_l, 1), dtype)
    if sharded:
        # this shard's rows of the global per-line streams
        xi = jax.lax.dynamic_slice_in_dim(xi, row0, l, axis=1)
        sincos = jax.lax.dynamic_slice_in_dim(sincos, row0, l, axis=1)
        keep = jax.lax.dynamic_slice_in_dim(keep, row0, l, axis=1)

    tt_np, d_np, tt3_np, d3_np, vt_np = _alpha_consts(cfg)
    tts = jnp.asarray(tt_np)
    ds = jnp.asarray(d_np)
    tt3s = jnp.asarray(tt3_np)
    d3s = jnp.asarray(d3_np)
    vts = jnp.asarray(vt_np)

    # line tiling: single tile (whole field resident, vblend in-kernel) when
    # the field fits VMEM; otherwise TL-row tiles with the vertical blend in
    # XLA between the two row-independent kernel halves (HD path). A line
    # shard always runs tiled (the in-kernel vblend's row-0/1 special cases
    # are global-row facts) with tl | l, so the shard needs no line padding
    # and shards reassemble into the exact global raster.
    if sharded:
        tl = l
        while tl * wp > _TILE_BUDGET and tl > 1:
            tl = next(d for d in range(tl - 1, 0, -1) if l % d == 0)
    elif l * wp <= min(_SINGLE_TILE_BUDGET, max(_TILE_BUDGET, 1) * 2):
        tl = l
    else:
        tl = 256
        while tl * wp > _TILE_BUDGET and tl > 8:
            tl //= 2
    n_lt = -(-l // tl)
    lp = n_lt * tl
    single_tile = (n_lt == 1) and not sharded

    def padw(a, fill=0.0):
        if wp != w:
            a = jnp.concatenate(
                [a, jnp.full(a.shape[:-1] + (wp - w,), fill, a.dtype)],
                axis=-1)
        return a

    def padl(a):
        if lp != l:
            pad_shape = a.shape[:1] + (lp - l,) + a.shape[2:]
            a = jnp.concatenate([a, jnp.zeros(pad_shape, a.dtype)], axis=1)
        return a

    rf = padl(padw(rgb[..., 0].astype(dtype)))
    gf = padl(padw(rgb[..., 1].astype(dtype)))
    bf = padl(padw(rgb[..., 2].astype(dtype)))
    xi_col = padl(xi[..., None].astype(jnp.float32))   # [B, Lp, 1]
    sincos_p = padl(sincos)
    keep_p = padl(keep)

    specs3 = lambda: pl.BlockSpec((1, tl, wp), lambda i, j: (i, j, 0),
                                  memory_space=pltpu.VMEM)
    spec_col = pl.BlockSpec((1, tl, 1), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)
    spec_sc = pl.BlockSpec((1, tl, 2), lambda i, j: (i, j, 0),
                           memory_space=pltpu.VMEM)
    spec_tt = pl.BlockSpec((8, BLOCK, BLOCK), lambda i, j: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_d = pl.BlockSpec((8, BLOCK), lambda i, j: (0, 0),
                          memory_space=pltpu.VMEM)
    spec_d3 = pl.BlockSpec((8, 8, BLOCK), lambda i, j: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_vt = pl.BlockSpec((8, BLOCK, 8), lambda i, j: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_nk = pl.BlockSpec((1, 1, 2), lambda i, j: (i, 0, 0),
                           memory_space=pltpu.SMEM)
    spec_row = pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                            memory_space=pltpu.SMEM)
    # global first-row index of this dispatch's block 0 — nonzero only on
    # the line-sharded multi-chip path (run_sharded_chain_fused_lines)
    row0_arr = jnp.asarray(row0, jnp.int32).reshape(1, 1)

    return _FusedCtx(
        cfg=cfg, interpret=interpret, dtype=dtype,
        b=b, l=l, w=w, wp=wp, noise_l=noise_l,
        tl=tl, n_lt=n_lt, lp=lp, single_tile=single_tile,
        grid=(b, n_lt), padl=padl,
        rf=rf, gf=gf, bf=bf, xi_col=xi_col, sincos_p=sincos_p,
        keep_p=keep_p, keys=keys, keys_ab=keys_ab, row0_arr=row0_arr,
        consts=(tts, ds, tt3s, d3s, vts),
        specs3=specs3, spec_col=spec_col, spec_sc=spec_sc,
        spec_consts=(spec_tt, spec_d, spec_tt, spec_d3, spec_vt),
        spec_nk=spec_nk, spec_row=spec_row,
    )


def _fused_stage_a(ctx: _FusedCtx):
    """Kernel A: RGB->YIQ, in-chroma lowpass, QAM encode, preemphasis,
    luma noise. [B, Lp, Wp] encoded-luma plane out."""
    kernel_a = _make_kernel_a(ctx.cfg, ctx.w, ctx.wp, ctx.tl)
    return pl.pallas_call(
        kernel_a,
        out_shape=jax.ShapeDtypeStruct((ctx.b, ctx.lp, ctx.wp), ctx.dtype),
        grid=ctx.grid,
        in_specs=[ctx.specs3(), ctx.specs3(), ctx.specs3(), ctx.spec_col,
                  ctx.spec_nk, ctx.spec_row, *ctx.spec_consts],
        out_specs=ctx.specs3(),
        interpret=ctx.interpret,
        compiler_params=_COMPILER_PARAMS,
    )(ctx.rf, ctx.gf, ctx.bf, ctx.xi_col, ctx.keys_ab, ctx.row0_arr,
      *ctx.consts)


def _hs_window_rows(l: int) -> int:
    """Static row count of the in-kernel head-switch window: 64 shift rows
    plus up to 7 rows of sublane alignment slack, whole tile when small."""
    return min(72, l)


def _hs_specs(win: int):
    """(shift spec [1,win,1] VMEM, window-start spec [1,1,1] SMEM)."""
    spec_hs = pl.BlockSpec((1, win, 1), lambda i, j: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_w0 = pl.BlockSpec((1, 1, 1), lambda i, j: (i, 0, 0),
                           memory_space=pltpu.SMEM)
    return spec_hs, spec_w0


def _head_switch_operands(ctx: _FusedCtx, field_parity, *, phase):
    """(shift column [B,win,1] f32, window start [B,1,1] i32) for the
    in-kernel head switch. `phase` is split out because gen-1 reuses the
    switch point for both axes (ffmpeg_to_composite.cpp:668-732)."""
    cfg = ctx.cfg
    shifts, w0a = yiq.head_switch_window_shifts(
        ctx.l, field_parity, ctx.keys[1],
        point=cfg.vhs_head_switching_point, phase=phase,
        phase_noise=cfg.vhs_head_switching_phase_noise,
        twidth=ctx.w + ctx.w // 10, ntsc=cfg.ntsc,
        win=_hs_window_rows(ctx.l))
    # [B,1,1] with a (1,1,1) block: Mosaic requires the trailing block dims
    # to equal the array dims for SMEM operands (same shape idiom as keys_ab)
    return (shifts[..., None].astype(jnp.float32),
            w0a.reshape(ctx.b, 1, 1).astype(jnp.int32))


def _fused_stage_ab(ctx: _FusedCtx, hs=None):
    """Merged single-tile dispatch: RGB planes in, output RGB planes out,
    one pallas program (see _make_kernel_ab)."""
    hs_win = _hs_window_rows(ctx.l) if hs is not None else None
    kernel = _make_kernel_ab(ctx.cfg, ctx.w, ctx.wp, ctx.noise_l, ctx.tl,
                             hs_win=hs_win)
    in_specs = [ctx.specs3(), ctx.specs3(), ctx.specs3(), ctx.spec_col,
                ctx.spec_nk, ctx.spec_sc, ctx.spec_col]
    operands = [ctx.rf, ctx.gf, ctx.bf, ctx.xi_col, ctx.keys_ab,
                ctx.sincos_p, ctx.keep_p]
    scratch = []
    if hs is not None:
        in_specs += list(_hs_specs(hs_win))
        operands += list(hs)
        if hs_win < ctx.tl:
            scratch = [pltpu.VMEM((ctx.tl, ctx.wp), ctx.dtype)]
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((ctx.b, ctx.lp, ctx.wp),
                                        ctx.dtype),) * 3,
        grid=ctx.grid,
        in_specs=in_specs + list(ctx.spec_consts),
        out_specs=(ctx.specs3(),) * 3,
        scratch_shapes=scratch,
        interpret=ctx.interpret,
        compiler_params=_merged_params(ctx.tl * ctx.wp),
    )(*operands, *ctx.consts)


def _fused_stage_b1(ctx: _FusedCtx, y_enc):
    """Tiled-mode kernel B front half (row-independent)."""
    kernel_b1 = _make_kernel_b1(ctx.cfg, ctx.w, ctx.wp, ctx.noise_l, ctx.tl)
    return pl.pallas_call(
        kernel_b1,
        out_shape=(jax.ShapeDtypeStruct((ctx.b, ctx.lp, ctx.wp),
                                        ctx.dtype),) * 3,
        grid=ctx.grid,
        in_specs=[ctx.specs3(), ctx.spec_col, ctx.spec_nk, ctx.spec_row,
                  ctx.spec_sc, *ctx.spec_consts],
        out_specs=(ctx.specs3(),) * 3,
        interpret=ctx.interpret,
        compiler_params=_COMPILER_PARAMS,
    )(y_enc, ctx.xi_col, ctx.keys_ab, ctx.row0_arr, ctx.sincos_p,
      *ctx.consts)


def _vblend_xla(p, l: int, padl):
    """2-line chroma blend in XLA over the REAL rows of a padded plane
    (same math as the in-kernel version: row 0 kept, row 1 blends with 0)."""
    pr = p[:, :l]
    prev = jnp.concatenate(
        [jnp.zeros_like(pr[:, :1]), pr[:, :-1]], axis=1)
    rows = jnp.arange(l)[None, :, None]
    prev = jnp.where(rows == 1, 0.0, prev)
    blended = jnp.floor((prev + pr + 1.0) / 2.0)
    out = jnp.where(rows == 0, pr, blended)
    return padl(out)


def _fused_stage_b2(ctx: _FusedCtx, y2, i2, q2):
    """Tiled-mode kernel B back half (row-independent)."""
    kernel_b2 = _make_kernel_b2(ctx.cfg, ctx.w, ctx.wp)
    return pl.pallas_call(
        kernel_b2,
        out_shape=(jax.ShapeDtypeStruct((ctx.b, ctx.lp, ctx.wp),
                                        ctx.dtype),) * 3,
        grid=ctx.grid,
        in_specs=[ctx.specs3(), ctx.specs3(), ctx.specs3(), ctx.spec_col,
                  ctx.spec_col, *ctx.spec_consts],
        out_specs=(ctx.specs3(),) * 3,
        interpret=ctx.interpret,
        compiler_params=_COMPILER_PARAMS,
    )(y2, i2, q2, ctx.xi_col, ctx.keep_p, *ctx.consts)


def _crop_stack_rgb(ctx: _FusedCtx, r_o, g_o, b_o):
    out = jnp.stack([r_o[:, :ctx.l, :ctx.w], g_o[:, :ctx.l, :ctx.w],
                     b_o[:, :ctx.l, :ctx.w]], axis=-1)
    return out.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def composite_layer_rgb_fused(
    rgb, fieldno, field_parity, key, *,
    cfg: CompositeConfig, interpret: bool = False,
):
    """Drop-in twin of yiq.composite_layer_rgb running on the fused kernels.
    Identical RNG stream consumption; f32 math (production dtype)."""
    rgb = jnp.asarray(rgb, jnp.int32)
    l, w = rgb.shape[1:3]
    ctx = _fused_prepare(cfg, rgb, fieldno, field_parity, key,
                         row0=0, noise_l=l, interpret=interpret,
                         sharded=False)

    if ctx.single_tile:
        # MERGED path: kernel A + in-kernel head switch (windowed VMEM
        # rotation fed by tiny per-row/per-field operands — the XLA hop
        # between the halves cost 11.3 us/field at SD) + kernel B as ONE
        # pallas program; the encoded-luma plane never touches HBM.
        hs = None
        if cfg.vhs_head_switching:
            hs = _head_switch_operands(
                ctx, field_parity, phase=cfg.vhs_head_switching_phase)
        r_o, g_o, b_o = _fused_stage_ab(ctx, hs=hs)
        return _crop_stack_rgb(ctx, r_o, g_o, b_o)

    # tiled mode (HD-class rasters over the budget): A/B split with the
    # XLA windowed in-place head switch between the halves (only the
    # <=64-line window moves through HBM; no full-plane crop/re-pad)
    y_enc = _fused_stage_a(ctx)
    if cfg.vhs_head_switching:
        y_enc = yiq.head_switching_padded(
            y_enc, l, w, field_parity, ctx.keys[1],
            point=cfg.vhs_head_switching_point,
            phase=cfg.vhs_head_switching_phase,
            phase_noise=cfg.vhs_head_switching_phase_noise,
            ntsc=cfg.ntsc, fill=0.0)

    do_vblend = cfg.emulating_vhs and cfg.vhs_chroma_vert_blend and cfg.ntsc
    y2, i2, q2 = _fused_stage_b1(ctx, y_enc)
    if do_vblend:
        i2 = _vblend_xla(i2, l, ctx.padl)
        q2 = _vblend_xla(q2, l, ctx.padl)
    r_o, g_o, b_o = _fused_stage_b2(ctx, y2, i2, q2)

    return _crop_stack_rgb(ctx, r_o, g_o, b_o)
