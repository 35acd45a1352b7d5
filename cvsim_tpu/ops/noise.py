"""Noise generators.

The reference uses unseeded libc rand() with a smoothed random-walk idiom
(ffmpeg_to_composite.cpp:661-663):

    use n; n += rand() % (2*mag + 1) - mag; n /= 2

Exact rand() parity is meaningless (libc-specific); per SURVEY.md section 7 we
target *statistical* parity: same increment distribution and the same
first-order decay recurrence, driven by counter-based `jax.random` so output
is deterministic per seed and independent of evaluation order.

The recurrence n[t] = (n[t-1] + u[t]) / 2 is affine, so it runs as a parallel
`lax.associative_scan` instead of a sequential loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cvsim_tpu.ops.iir import iir_lowpass


def random_walk(key, shape, mag: int, axis: int = -1, dtype=jnp.float32):
    """Post-update walk values n[t] = (n[t-1] + u[t]) / 2, n[-1] = 0,
    u ~ uniform int in [-mag, mag].

    This is exactly a one-pole lowpass with alpha=0.5 over the increment
    stream, so it runs on the blocked-matmul IIR path."""
    u = jax.random.randint(key, shape, -mag, mag + 1).astype(dtype)
    return iir_lowpass(u, 0.5, 0.0, axis=axis)


def smoothed_noise_walk(key, shape, mag: int, axis: int = -1, dtype=jnp.float32):
    """Pre-update walk values as *used* by the video-noise loops: the value
    added at sample t is the walk state before the t'th update, i.e.
    [0, n[0], n[1], ...]."""
    post = random_walk(key, shape, mag, axis=axis, dtype=dtype)
    w = post.shape[axis]
    head = jnp.zeros_like(jax.lax.slice_in_dim(post, 0, 1, axis=axis))
    return jnp.concatenate(
        [head, jax.lax.slice_in_dim(post, 0, w - 1, axis=axis)], axis=axis
    )


def uniform_pm1(key, shape=(), dtype=jnp.float32):
    """Uniform in [-1, 1) — used for head-switching phase jitter
    (ffmpeg_to_composite.cpp:675-680)."""
    return jax.random.uniform(key, shape, dtype, -1.0, 1.0)


def field_stage_keys(key, fieldno, stage: int):
    """Content-addressed per-field keys: fold the field counter then a stage
    id into the base key. Noise for field N is a pure function of
    (seed, N, stage) — independent of how fields are batched (GOP size,
    restarts), unlike per-batch key splitting."""
    def one(f):
        return jax.random.fold_in(jax.random.fold_in(key, f), stage)

    return jax.vmap(one)(jnp.asarray(fieldno))


def smoothed_noise_walk_per_field(keys, n: int, mag: int, dtype=jnp.float32):
    """Per-field smoothed walks: keys [B] (from field_stage_keys), walk
    length n per field. Returns [B, n] pre-update walk values."""
    u = jax.vmap(lambda k: jax.random.randint(k, (n,), -mag, mag + 1))(keys)
    post = iir_lowpass(u.astype(dtype), 0.5, 0.0, axis=-1)
    head = jnp.zeros_like(post[..., :1])
    return jnp.concatenate([head, post[..., :-1]], axis=-1)


def random_walk_per_field(keys, n: int, mag: int, dtype=jnp.float32):
    """Per-field post-update walks [B, n]."""
    u = jax.vmap(lambda k: jax.random.randint(k, (n,), -mag, mag + 1))(keys)
    return iir_lowpass(u.astype(dtype), 0.5, 0.0, axis=-1)


def randint_per_field(keys, shape, lo, hi):
    return jax.vmap(lambda k: jax.random.randint(k, shape, lo, hi))(keys)


def uniform_pm1_per_field(keys, dtype=jnp.float32):
    return jax.vmap(lambda k: jax.random.uniform(k, (), dtype, -1.0, 1.0))(keys)


def hiss_per_sample(key, start, n: int, c: int, level: int,
                    dtype=jnp.float32):
    """Content-addressed iid audio hiss: the noise added to sample t is a
    pure function of (seed, absolute sample index start + t), so streaming
    in chunks with a carried sample counter is bit-identical to one-shot
    processing (mirrors field_stage_keys for video). Returns [n, c] in
    [-level, level]."""
    idx = start + jnp.arange(n, dtype=jnp.int32)
    ks = jax.vmap(lambda i: jax.random.fold_in(key, i))(idx)
    u = jax.vmap(lambda k: jax.random.randint(k, (c,), -level, level + 1))(ks)
    return u.astype(dtype)
