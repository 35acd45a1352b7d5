"""C-semantics scalar helpers as vectorized JAX ops.

The reference engines rely on C integer conversion rules at quantization
points (u8 plane writeback in gen-1, int plane writeback in gen-2). These
helpers reproduce them exactly so golden tests can demand bit equality.
"""

from __future__ import annotations

import jax.numpy as jnp


def clampu8(x):
    """clampu8 (ffmpeg_to_composite.cpp:335-342) applied to a float stage output.

    In C the double is first converted to int (truncation toward zero,
    implementation-defined on overflow but the reference always clamps after),
    then clamped to [0, 255].
    """
    if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating):
        x = jnp.trunc(x)
    return jnp.clip(x, 0, 255)


def clips16(x):
    """clips16 (ffmpeg_to_composite.cpp:344-351)."""
    if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating):
        x = jnp.trunc(x)
    return jnp.clip(x, -32768, 32767)


def c_int(x):
    """C double->int conversion: truncation toward zero."""
    return jnp.trunc(x)


def c_div(a, b):
    """C integer division: truncation toward zero (jnp // floors)."""
    a = jnp.asarray(a)
    q = jnp.abs(a) // jnp.abs(jnp.asarray(b))
    return jnp.where((a < 0) != (jnp.asarray(b) < 0), -q, q).astype(a.dtype)


def shr1_floor(a):
    """C arithmetic right shift by 1 == floor division by 2 (gen-2 interp,
    ffmpeg_ntsc.cpp:1558)."""
    return jnp.asarray(a) >> 1


def dbfs(db):
    """dBFS scale factor (ffmpeg_to_composite.cpp:76-83): 10^(dB/20)."""
    return 10.0 ** (jnp.asarray(db) / 20.0)
