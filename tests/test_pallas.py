"""Fused Pallas IIR kernel vs the XLA path (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from cvsim_tpu.config import NTSC_RATE, iir_alpha
from cvsim_tpu.ops.iir import iir_highpass, iir_lowpass_cascade
from cvsim_tpu.ops.pallas.fused_iir import fused_iir


def _x(shape=(3, 7, 704), seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, 65280, size=shape), jnp.float32)


def test_fused_cascade():
    x = _x()
    a = iir_alpha(NTSC_RATE, 1400000.0)
    got = fused_iir(x, alphas=(a,) * 3, y0s=(16.0,) * 3, interpret=True)
    want = iir_lowpass_cascade(x, a, 16.0, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=0.05)


def test_fused_emph_mode():
    x = _x(seed=1)
    a = iir_alpha(NTSC_RATE, 2400000.0)
    got = fused_iir(x, alphas=(a,) * 4, y0s=(16.0,) * 4, mode="emph",
                    gain=1.6, interpret=True)
    s = iir_lowpass_cascade(x, a, 16.0, 3)
    want = s + iir_highpass(s, a, 16.0) * jnp.float32(1.6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=0.1)


def test_fused_unsharp_mode():
    x = _x(seed=2)
    a = iir_alpha(NTSC_RATE, 5600000.0)
    got = fused_iir(x, alphas=(a,) * 3, y0s=(0.0,) * 3, mode="unsharp",
                    gain=3.0, interpret=True)
    want = x + (x - iir_lowpass_cascade(x, a, 0.0, 3)) * jnp.float32(3.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=0.1)


def test_fused_row_padding():
    """Row counts that don't divide the tile and widths off 128 multiples."""
    x = _x(shape=(5, 701), seed=3)
    a = iir_alpha(NTSC_RATE, 600000.0)
    got = fused_iir(x, alphas=(a,), y0s=(128.0,), interpret=True)
    want = iir_lowpass_cascade(x, a, 128.0, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=0.05)
