"""Fused two-kernel Pallas chain vs the stage-by-stage XLA chain: bit-exact
across configurations (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cvsim_tpu.config import CompositeConfig, VHSSpeed
from cvsim_tpu.models import yiq
from cvsim_tpu.models.fused_yiq import composite_layer_rgb_fused


CONFIGS = {
    "bare": CompositeConfig(
        video_noise=0, composite_in_chroma_lowpass=False,
        composite_out_chroma_lowpass=False,
        composite_out_chroma_lowpass_lite=False),
    "defaults-noise-off": CompositeConfig(video_noise=0),
    "full-lowpass-out": CompositeConfig(
        video_noise=0, composite_out_chroma_lowpass_lite=False),
    "preemph": CompositeConfig(
        video_noise=0, composite_preemphasis=7.0,
        composite_preemphasis_cut=315000000 / 88,
        subcarrier_amplitude_back=50 + int(50 * 7 * (315000000 / 88)
                                           / (2 * (315000000 / 88)))),
    "vhs-sp": CompositeConfig(video_noise=0, emulating_vhs=True),
    "vhs-ep-stochastic": CompositeConfig(
        video_noise=6, emulating_vhs=True, vhs_tape_speed=VHSSpeed.EP,
        vhs_head_switching=True, vhs_head_switching_point=0.15,
        vhs_head_switching_phase=0.15, vhs_head_switching_phase_noise=0.0,
        video_chroma_noise=22, video_chroma_phase_noise=6,
        video_chroma_loss=100),
    "yc-recomb": CompositeConfig(video_noise=0, video_yc_recombine=2),
    "svideo": CompositeConfig(video_noise=0, emulating_vhs=True,
                              vhs_svideo_out=True),
}


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_fused_matches_xla(name):
    cfg = CONFIGS[name]
    rng = np.random.default_rng(hash(name) % 2**31)
    rgb = jnp.asarray(rng.integers(0, 256, size=(2, 32, 128, 3)), jnp.int32)
    fn = jnp.array([0, 1], jnp.int32)
    par = jnp.array([0, 1], jnp.int32)
    key = jax.random.PRNGKey(5)
    a = np.asarray(yiq.composite_layer_rgb(rgb, fn, par, key, cfg=cfg))
    b = np.asarray(composite_layer_rgb_fused(
        rgb, fn, par, key, cfg=cfg, interpret=True))
    np.testing.assert_array_equal(a, b)


def test_fused_non_128_width():
    cfg = CompositeConfig(video_noise=0, emulating_vhs=True)
    rng = np.random.default_rng(9)
    rgb = jnp.asarray(rng.integers(0, 256, size=(1, 16, 176, 3)), jnp.int32)
    fn = jnp.array([4], jnp.int32)
    par = jnp.array([1], jnp.int32)
    key = jax.random.PRNGKey(1)
    a = np.asarray(yiq.composite_layer_rgb(rgb, fn, par, key, cfg=cfg))
    b = np.asarray(composite_layer_rgb_fused(
        rgb, fn, par, key, cfg=cfg, interpret=True))
    np.testing.assert_array_equal(a, b)
