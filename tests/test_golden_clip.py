"""Golden-clip regression guard: full chains with ALL stochastic stages on,
seeded, hashed. Catches any unintended behavior change across refactors
(jax.random is deterministic per key; float64 CPU math is stable).

If a change is *intended* to alter output (new quirk fix, reordered RNG
consumption), update the hashes and say why in the commit message.
"""

import hashlib

import numpy as np
import jax
import jax.numpy as jnp

from cvsim_tpu.config import CompositeConfig, VHSSpeed
from cvsim_tpu.models import yiq, yuv422

L, W = 16, 128

# Re-pinned when the noise generator moved from jax.random threefry to the
# splitmix32 counter stream (ops/noise.py): intended stream change, same
# distributions, ~2.5x less device time — see that module's docstring.
YIQ_HASH = "d712c51387e8a7343a63689c1f917d36c4303c6070c97ed2348bc42f2ddd7ea0"
YUV_HASH = "b5f71ef707abccf557d95eedd390e859545b90b73bffd20d9d3b09a6b21d0bd4"


def _cfg():
    return CompositeConfig(
        emulating_vhs=True, vhs_tape_speed=VHSSpeed.EP,
        vhs_head_switching=True, vhs_head_switching_point=0.15,
        vhs_head_switching_phase=0.15, vhs_head_switching_phase_noise=0.0,
        video_noise=6, video_chroma_noise=22, video_chroma_phase_noise=6,
        video_chroma_loss=100)


def _hash(planes):
    return hashlib.sha256(b"".join(
        np.ascontiguousarray(np.asarray(t, np.int64)).tobytes()
        for t in planes)).hexdigest()


def test_yiq_golden_clip():
    rng = np.random.default_rng(42)
    y = jnp.asarray(rng.integers(0, 65280, (2, L, W)), jnp.int32)
    i = jnp.asarray(rng.integers(-8000, 8000, (2, L, W)), jnp.int32)
    q = jnp.asarray(rng.integers(-8000, 8000, (2, L, W)), jnp.int32)
    out = yiq.composite_layer(
        y, i, q, cfg=_cfg(), fieldno=jnp.array([0, 1], jnp.int32),
        field_parity=jnp.array([0, 1], jnp.int32),
        key=jax.random.PRNGKey(123), dtype=jnp.float64)
    assert _hash(out) == YIQ_HASH


def test_yuv422_golden_clip():
    rng = np.random.default_rng(42)
    _ = rng.integers(0, 65280, (2, L, W))      # keep draw order aligned
    _ = rng.integers(-8000, 8000, (2, L, W))
    _ = rng.integers(-8000, 8000, (2, L, W))
    y = jnp.asarray(rng.integers(16, 236, (2, L, W)), jnp.int32)
    u = jnp.asarray(rng.integers(16, 241, (2, L, W // 2)), jnp.int32)
    v = jnp.asarray(rng.integers(16, 241, (2, L, W // 2)), jnp.int32)
    out = yuv422.composite_video_process(
        y, u, v, cfg=_cfg(), fieldno=jnp.array([0, 1], jnp.int32),
        field_parity=jnp.array([0, 1], jnp.int32),
        key=jax.random.PRNGKey(123), dtype=jnp.float64)
    assert _hash(out) == YUV_HASH
