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

YIQ_HASH = "969c89aa394b2874bfdf8eb83e23a39e9d8e7c2cd2320ffadc27b3d67da70242"
YUV_HASH = "c5509a41b27fc57d0855ee7800163eca6b9a40fb908ea6c91d30bbbc34583a93"


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
