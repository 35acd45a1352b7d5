"""Fused multi-stage IIR Pallas kernel.

The composite/VHS chains run several 3-pole-lowpass(+emphasis) stages per
plane. The XLA path (ops/blocked_iir.py) issues one MXU matmul pass per pole
with HBM-materialized intermediates; this kernel keeps a tile of scanlines
resident in VMEM across all poles plus the emphasis combine, cutting the
stage's HBM traffic to one read + one write.

Math per pole is identical to blocked_iir: within a 128-sample block,
y = x @ T^T with T[i,j] = a*(1-a)^(i-j) lower-triangular (MXU), plus the
carry-in term d[i] = (1-a)^(i+1) times the previous block's final value; the
carry chain runs across the handful of blocks inside the kernel.

Used for the lowpass-cascade / emphasis shapes of
ffmpeg_to_composite.cpp:809-828 (VHS luma), :882-923 (sharpen), :636-650
(preemphasis) and their gen-2 twins.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cvsim_tpu.ops.blocked_iir import _decay_consts

BLOCK = 128

# Scoped-VMEM limit shared with fused_yiq (see its rationale): the
# default 16MB Mosaic budget left <0.1% headroom at SD and OOMed when
# surrounding-program layouts shifted; v5e cores carry 128MB of VMEM.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
ROW_TILE = 256


def _pole_pass(x, T_t, d, y0, nb):
    """One pole over a [rows, nb*128] VMEM-resident array."""
    outs = []
    carry = jnp.full((x.shape[0], 1), y0, x.dtype)
    for b in range(nb):
        xb = x[:, b * BLOCK:(b + 1) * BLOCK]
        yb = jnp.dot(xb, T_t, preferred_element_type=x.dtype) + d * carry
        carry = yb[:, BLOCK - 1:BLOCK]  # static slice (Mosaic-lowering safe)
        outs.append(yb)
    return jnp.concatenate(outs, axis=-1)


def _make_kernel(n_poles, y0s, mode, gain, nb):
    def kernel(x_ref, tt_ref, d_ref, out_ref):
        x = x_ref[:]
        s = x
        # all poles except a possible trailing emphasis pole
        n_lp = n_poles - (1 if mode == "emph" else 0)
        for i in range(n_lp):
            s = _pole_pass(s, tt_ref[i], d_ref[i], y0s[i], nb)
        if mode == "emph":
            # s += highpass(s) * gain, highpass driven by the cascade output
            lp = _pole_pass(s, tt_ref[n_poles - 1], d_ref[n_poles - 1],
                            y0s[-1], nb)
            s = s + (s - lp) * gain
        elif mode == "unsharp":
            # out = x + (x - cascade(x)) * gain: the cascade smooths, the
            # ORIGINAL input is sharpened (reference sharpen stages)
            s = x + (x - s) * gain
        out_ref[:] = s

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("alphas", "y0s", "mode", "gain", "interpret"))
def fused_iir(x, *, alphas: tuple, y0s: tuple, mode: str = "none",
              gain: float = 0.0, interpret: bool = False):
    """Run a fused pole cascade over the last axis of x [..., W].

    alphas/y0s: per-pole coefficient and reset value. mode:
      'none'    -> plain cascade
      'emph'    -> cascade then s += highpass_{last alpha}(s) * gain
      'unsharp' -> x + (x - cascade(x)) * gain
    """
    x = jnp.asarray(x)
    dtype = x.dtype
    orig_shape = x.shape
    w = orig_shape[-1]
    nb = -(-w // BLOCK)
    wp = nb * BLOCK

    rows = int(np.prod(orig_shape[:-1])) if len(orig_shape) > 1 else 1
    xf = x.reshape(rows, w)
    if wp != w:
        xf = jnp.concatenate(
            [xf, jnp.zeros((rows, wp - w), dtype)], axis=-1)
    tile = min(ROW_TILE, rows)
    pad_rows = (-rows) % tile
    if pad_rows:
        xf = jnp.concatenate([xf, jnp.zeros((pad_rows, wp), dtype)], axis=0)
    n_tiles = xf.shape[0] // tile

    consts = [_decay_consts(float(a), BLOCK, np.dtype(dtype).name)
              for a in alphas]
    tts = jnp.asarray(np.stack([c[0].T.copy() for c in consts]))
    ds = jnp.asarray(np.stack([c[1] for c in consts]))
    k = len(alphas)

    kernel = _make_kernel(k, y0s, mode, float(gain), nb)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(xf.shape, dtype),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, wp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, BLOCK, BLOCK), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, BLOCK), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(xf, tts, ds)

    out = out[:rows, :w] if (pad_rows or wp != w) else out
    return out.reshape(orig_shape)
