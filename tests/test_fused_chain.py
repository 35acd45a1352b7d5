"""Fused two-kernel Pallas chain vs the stage-by-stage XLA chain: equal
across configurations (interpret mode on CPU).

"Equal" is bit-exact except at exact truncation boundaries: both paths run
the same f32 math, but XLA's FMA-contraction choices can differ between the
two compiled programs, so a value mathematically ON an integer (e.g. the
yiq_to_rgb sum 31232/256 = 122.0) may land one ULP either side of c_int's
trunc. assert_chain_equal allows <=1 int LSB on <=0.1% of pixels; everything
else must match exactly. Seeds are crc32(name) — `hash()` is salted per
process and made these tests nondeterministic.
"""

import zlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _seed(name):
    return zlib.crc32(name.encode())


def assert_chain_equal(a, b, err_msg=""):
    a = np.asarray(a).astype(np.int64)
    b = np.asarray(b).astype(np.int64)
    d = np.abs(a - b)
    if d.max() == 0:
        return
    assert d.max() <= 1 and (d > 0).mean() <= 1e-3, (
        f"{err_msg}: max diff {d.max()}, frac {(d > 0).mean():.2e}")

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
    # nonzero head-switch phase noise: exercises the geometry-noise branch
    # of the windowed padded head switch (a numpy-vs-jnp dtype bug hid
    # here once — the other configs all use phase_noise=0)
    "vhs-hs-phase-noise": CompositeConfig(
        video_noise=0, emulating_vhs=True, vhs_head_switching=True,
        vhs_head_switching_point=0.52, vhs_head_switching_phase=0.1,
        vhs_head_switching_phase_noise=0.08),
    "yc-recomb": CompositeConfig(video_noise=0, video_yc_recombine=2),
    "svideo": CompositeConfig(video_noise=0, emulating_vhs=True,
                              vhs_svideo_out=True),
}


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_fused_matches_xla(name):
    cfg = CONFIGS[name]
    rng = np.random.default_rng(_seed(name))
    rgb = jnp.asarray(rng.integers(0, 256, size=(2, 32, 128, 3)), jnp.int32)
    fn = jnp.array([0, 1], jnp.int32)
    par = jnp.array([0, 1], jnp.int32)
    key = jax.random.PRNGKey(5)
    a = np.asarray(yiq.composite_layer_rgb(rgb, fn, par, key, cfg=cfg))
    b = np.asarray(composite_layer_rgb_fused(
        rgb, fn, par, key, cfg=cfg, interpret=True))
    assert_chain_equal(a, b)


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
    assert_chain_equal(a, b)


GEN1_CONFIGS = {
    "defaults-noise-off": CompositeConfig(video_noise=0),
    "noise": CompositeConfig(video_noise=6),
    "vhs-sp": CompositeConfig(video_noise=0, emulating_vhs=True),
    "pal": CompositeConfig(video_noise=0, ntsc=False),
    "full-ep-stochastic": CompositeConfig(
        video_noise=6, emulating_vhs=True, vhs_tape_speed=VHSSpeed.EP,
        vhs_head_switching=True, vhs_head_switching_point=0.15,
        vhs_head_switching_phase_noise=0.0, video_chroma_noise=22,
        video_chroma_phase_noise=6, video_chroma_loss=100),
    "out-full-recomb": CompositeConfig(
        video_noise=0, composite_out_chroma_lowpass=True,
        composite_out_chroma_lowpass_lite=False, video_yc_recombine=2),
    "preemph-catv": CompositeConfig(
        video_noise=0, composite_preemphasis=1.5,
        composite_preemphasis_cut=315000000 / 88 / 2,
        subcarrier_amplitude_back=68),
    "svideo-novblend": CompositeConfig(
        video_noise=0, emulating_vhs=True, vhs_svideo_out=True,
        vhs_chroma_vert_blend=False),
}


@pytest.mark.parametrize("name", sorted(GEN1_CONFIGS))
def test_gen1_fused_matches_xla(name):
    from cvsim_tpu.models import yuv422
    from cvsim_tpu.models.fused_yuv import composite_video_process_fused

    cfg = GEN1_CONFIGS[name]
    rng = np.random.default_rng(_seed(name))
    B, L, W = 2, 32, 128
    y = jnp.asarray(rng.integers(16, 236, (B, L, W)), jnp.int32)
    u = jnp.asarray(rng.integers(16, 241, (B, L, W // 2)), jnp.int32)
    v = jnp.asarray(rng.integers(16, 241, (B, L, W // 2)), jnp.int32)
    fn = jnp.array([0, 1], jnp.int32)
    par = jnp.array([0, 1], jnp.int32)
    key = jax.random.PRNGKey(5)
    a = yuv422.composite_video_process(
        y, u, v, cfg=cfg, fieldno=fn, field_parity=par, key=key)
    b = composite_video_process_fused(
        y, u, v, fn, par, key, cfg=cfg, interpret=True)
    for x1, x2 in zip(a, b):
        assert_chain_equal(x1, x2)


def test_gen1_fused_non_128_width():
    from cvsim_tpu.models import yuv422
    from cvsim_tpu.models.fused_yuv import composite_video_process_fused

    cfg = CompositeConfig(video_noise=0, emulating_vhs=True)
    rng = np.random.default_rng(13)
    B, L, W = 1, 16, 176
    y = jnp.asarray(rng.integers(16, 236, (B, L, W)), jnp.int32)
    u = jnp.asarray(rng.integers(16, 241, (B, L, W // 2)), jnp.int32)
    v = jnp.asarray(rng.integers(16, 241, (B, L, W // 2)), jnp.int32)
    fn = jnp.array([2], jnp.int32)
    par = jnp.array([1], jnp.int32)
    key = jax.random.PRNGKey(1)
    a = yuv422.composite_video_process(
        y, u, v, cfg=cfg, fieldno=fn, field_parity=par, key=key)
    b = composite_video_process_fused(
        y, u, v, fn, par, key, cfg=cfg, interpret=True)
    for x1, x2 in zip(a, b):
        assert_chain_equal(x1, x2)


def test_tiled_fused_matches_xla():
    """HD path: force line tiling (vblend between kernel halves in XLA) and
    compare against the stage-by-stage path."""
    from cvsim_tpu.models import fused_yiq

    old = fused_yiq._TILE_BUDGET
    fused_yiq._TILE_BUDGET = 16 * 128   # 16-row tiles at W=128
    try:
        for name in ("vhs-ep-stochastic", "defaults-noise-off", "svideo"):
            cfg = CONFIGS[name]
            rng = np.random.default_rng(_seed(name))
            rgb = jnp.asarray(rng.integers(0, 256, (2, 48, 128, 3)), jnp.int32)
            fn = jnp.array([0, 1], jnp.int32)
            par = jnp.array([0, 1], jnp.int32)
            key = jax.random.PRNGKey(5)
            a = np.asarray(yiq.composite_layer_rgb(rgb, fn, par, key, cfg=cfg))
            b = np.asarray(composite_layer_rgb_fused(
                rgb, fn, par, key, cfg=cfg, interpret=True))
            assert_chain_equal(a, b, err_msg=name)
    finally:
        fused_yiq._TILE_BUDGET = old


def test_tiled_fused_non_divisible_rows():
    from cvsim_tpu.models import fused_yiq

    old = fused_yiq._TILE_BUDGET
    fused_yiq._TILE_BUDGET = 16 * 128
    try:
        cfg = CONFIGS["vhs-sp"]
        rng = np.random.default_rng(77)
        rgb = jnp.asarray(rng.integers(0, 256, (1, 40, 128, 3)), jnp.int32)
        fn = jnp.array([3], jnp.int32)
        par = jnp.array([1], jnp.int32)
        key = jax.random.PRNGKey(2)
        a = np.asarray(yiq.composite_layer_rgb(rgb, fn, par, key, cfg=cfg))
        b = np.asarray(composite_layer_rgb_fused(
            rgb, fn, par, key, cfg=cfg, interpret=True))
        assert_chain_equal(a, b)
    finally:
        fused_yiq._TILE_BUDGET = old


def test_gen1_tiled_fused_matches_xla():
    from cvsim_tpu.models import fused_yuv, yuv422
    from cvsim_tpu.models.fused_yuv import composite_video_process_fused

    old = fused_yuv._TILE_BUDGET
    fused_yuv._TILE_BUDGET = 16 * 128
    try:
        for name in ("full-ep-stochastic", "defaults-noise-off",
                     "svideo-novblend"):
            cfg = GEN1_CONFIGS[name]
            rng = np.random.default_rng(_seed(name))
            B, L, W = 2, 48, 128
            y = jnp.asarray(rng.integers(16, 236, (B, L, W)), jnp.int32)
            u = jnp.asarray(rng.integers(16, 241, (B, L, W // 2)), jnp.int32)
            v = jnp.asarray(rng.integers(16, 241, (B, L, W // 2)), jnp.int32)
            fn = jnp.array([0, 1], jnp.int32)
            par = jnp.array([0, 1], jnp.int32)
            key = jax.random.PRNGKey(5)
            a = yuv422.composite_video_process(
                y, u, v, cfg=cfg, fieldno=fn, field_parity=par, key=key)
            b = composite_video_process_fused(
                y, u, v, fn, par, key, cfg=cfg, interpret=True)
            for x1, x2 in zip(a, b):
                assert_chain_equal(x1, x2, err_msg=name)
    finally:
        fused_yuv._TILE_BUDGET = old


@pytest.mark.parametrize("point", [0.02, 0.52, 0.983])
def test_windowed_inkernel_head_switch(point):
    """Single-tile fields taller than the 72-row head-switch window take the
    IN-KERNEL windowed rotation (dynamic-slice window + barrel roll inside
    kernel B) instead of the XLA hop; the small CONFIGS shapes (l=32) only
    cover the whole-tile branch. Points at the top (l_start < 0), middle,
    and bottom (window start clipped to l-72) pin the window geometry."""
    cfg = CompositeConfig(
        video_noise=0, emulating_vhs=True, vhs_head_switching=True,
        vhs_head_switching_point=point, vhs_head_switching_phase=point,
        vhs_head_switching_phase_noise=0.04)
    rng = np.random.default_rng(_seed(f"win-{point}"))
    rgb = jnp.asarray(rng.integers(0, 256, size=(2, 96, 128, 3)), jnp.int32)
    fn = jnp.array([0, 3], jnp.int32)
    par = jnp.array([0, 1], jnp.int32)
    key = jax.random.PRNGKey(11)
    a = np.asarray(yiq.composite_layer_rgb(rgb, fn, par, key, cfg=cfg))
    b = np.asarray(composite_layer_rgb_fused(
        rgb, fn, par, key, cfg=cfg, interpret=True))
    assert_chain_equal(a, b, err_msg=f"point={point}")


@pytest.mark.parametrize("point", [0.02, 0.983])
def test_gen1_windowed_inkernel_head_switch(point):
    from cvsim_tpu.models import yuv422
    from cvsim_tpu.models.fused_yuv import composite_video_process_fused

    cfg = CompositeConfig(
        video_noise=0, emulating_vhs=True, vhs_head_switching=True,
        vhs_head_switching_point=point,
        vhs_head_switching_phase_noise=0.04)
    rng = np.random.default_rng(_seed(f"g1win-{point}"))
    B, L, W = 2, 96, 128
    y = jnp.asarray(rng.integers(16, 236, (B, L, W)), jnp.int32)
    u = jnp.asarray(rng.integers(16, 241, (B, L, W // 2)), jnp.int32)
    v = jnp.asarray(rng.integers(16, 241, (B, L, W // 2)), jnp.int32)
    fn = jnp.array([0, 3], jnp.int32)
    par = jnp.array([0, 1], jnp.int32)
    key = jax.random.PRNGKey(11)
    a = yuv422.composite_video_process(
        y, u, v, cfg=cfg, fieldno=fn, field_parity=par, key=key)
    b = composite_video_process_fused(
        y, u, v, fn, par, key, cfg=cfg, interpret=True)
    for x1, x2 in zip(a, b):
        assert_chain_equal(x1, x2, err_msg=f"gen1 point={point}")


def test_hd_shape_picks_single_tile():
    """1080i (540x1888 -> wp 1920, 1.037M samples) must take the SINGLE-tile
    kernel B — in-kernel vblend, no b1/vblend/b2 XLA hop. Measured 2363 vs
    1403 fields/s on v5e (round 4); this pins the dispatch decision so a
    budget edit can't silently demote HD back to the tiled path. SD stays
    single-tile too; a 4K-class raster still tiles."""
    from cvsim_tpu.models import fused_yiq

    def tile_meta(l, w):
        cfg = CONFIGS["vhs-ep-stochastic"]
        rgb = jnp.zeros((1, l, w, 3), jnp.int32)
        ctx = fused_yiq._fused_prepare(
            cfg, rgb, jnp.array([0], jnp.int32), jnp.array([0], jnp.int32),
            jax.random.PRNGKey(0), row0=0, noise_l=l, interpret=True,
            sharded=False)
        return ctx.single_tile, ctx.tl

    single, tl = tile_meta(540, 1888)          # 1080i field
    assert single and tl == 540
    single, tl = tile_meta(240, 704)           # 480i field
    assert single and tl == 240
    single, tl = tile_meta(1080, 3840)         # 4K-class: must tile
    assert not single and tl < 1080
