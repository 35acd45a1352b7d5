"""One-pole IIR as a blocked lower-triangular matmul (MXU path).

The recurrence y[t] = a*x[t] + (1-a)*y[t-1] has the closed form

    y[t] = sum_k a*(1-a)^(t-k) x[k]  +  (1-a)^(t+1) y0

Split the sample axis into blocks of size K. Within a block the map
x_block -> y_block (ignoring carry-in) is multiplication by the dense lower-
triangular K x K matrix T[i,j] = a*(1-a)^(i-j); the carry-in contributes
d[i] = (1-a)^(i+1) times the previous block's final value. The carry itself
obeys c_b = yw_b[K-1] + (1-a)^K * c_{b-1} — a scalar recurrence over the
handful of blocks, unrolled in Python.

This replaces an O(W log W) associative scan (many HBM passes, poor lane
layouts) with one MXU matmul pass plus an O(W/K) fixup: the TPU-native way
to run the reference's per-scanline filters (ffmpeg_to_composite.cpp:99-131)
over [batch, lines, samples] tensors.

Numerics: T entries decay geometrically, so f32 matmul accumulation is
integer-exact for the 0..65535-scale plane values used by the engines
(validated against the sequential float64 loop in tests/test_iir.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

BLOCK = 128


@functools.lru_cache(maxsize=64)
def _decay_consts(alpha: float, block: int, np_dtype: str):
    """(T [K,K], d [K], pK scalar) as numpy constants for a given alpha."""
    a = np.float64(alpha)
    one_m = 1.0 - a
    i = np.arange(block)
    # T[i,j] = a * (1-a)^(i-j) for i >= j
    expo = i[:, None] - i[None, :]
    T = np.where(expo >= 0, a * one_m ** np.maximum(expo, 0), 0.0)
    d = one_m ** (i + 1.0)
    pk = one_m ** float(block)
    dt = np.dtype(np_dtype)
    return T.astype(dt), d.astype(dt), dt.type(pk)


def iir_lowpass_blocked(x: jax.Array, alpha, y0, block: int = BLOCK) -> jax.Array:
    """Blocked-matmul one-pole lowpass along the last axis.

    x: [..., W]; y0: scalar or [...] carry-in (the filter's reset value).
    Bit-compatible with the sequential recurrence to ~f32 rounding.
    """
    x = jnp.asarray(x)
    dtype = x.dtype
    w = x.shape[-1]
    nb = -(-w // block)
    pad = nb * block - w

    T_np, d_np, pk = _decay_consts(float(alpha), block, np.dtype(dtype).name)
    T = jnp.asarray(T_np)
    d = jnp.asarray(d_np)

    xb = x if pad == 0 else jnp.concatenate(
        [x, jnp.zeros(x.shape[:-1] + (pad,), dtype)], axis=-1)
    xb = xb.reshape(x.shape[:-1] + (nb, block))

    # Within-block response (no carry): yw[..., b, i] = sum_j T[i,j] x[b, j]
    yw = jnp.einsum("ij,...bj->...bi", T, xb,
                    preferred_element_type=dtype)

    # Carry chain across blocks: c_b = yw[b, -1] + pk * c_{b-1}. Unroll when
    # the block count is small (keeps the graph tiny for scanline widths);
    # otherwise run it as an associative scan over the block axis so long
    # axes (noise walks over L*W, audio streams) don't explode compile time.
    y0 = jnp.broadcast_to(jnp.asarray(y0, dtype), x.shape[:-1])
    last = yw[..., -1]
    if nb <= 16:
        carries = [y0]
        for b in range(nb - 1):
            carries.append(last[..., b] + pk * carries[-1])
        c = jnp.stack(carries, axis=-1)      # [..., nb] carry-in per block
    else:
        def comb(lhs, rhs):
            a_l, b_l = lhs
            a_r, b_r = rhs
            return a_r * a_l, a_r * b_l + b_r
        aa = jnp.full(last.shape, pk, dtype)
        _, post = jax.lax.associative_scan(comb, (aa, last), axis=-1)
        # post[b] = carry *after* block b with zero init; carry-in for block b
        # is post[b-1] plus the y0 term pk^b * y0.
        powers = jnp.asarray(
            np.power(np.float64(pk), np.arange(nb)).astype(np.dtype(dtype).name))
        prev = jnp.concatenate(
            [jnp.zeros_like(post[..., :1]), post[..., :-1]], axis=-1)
        c = prev + powers * y0[..., None]

    y = yw + d * c[..., None]
    y = y.reshape(x.shape[:-1] + (nb * block,))
    return y[..., :w] if pad else y
