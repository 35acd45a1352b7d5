"""Golden tests: gen-1 YUV 4:2:2 engine vs the scalar reference port."""

import numpy as np
import jax
import jax.numpy as jnp

import golden.ref_scalar as ref
from cvsim_tpu.config import CompositeConfig, VHSSpeed
from cvsim_tpu.models import yuv422

L, W = 6, 64


def rand_planes(seed=0, l=L, w=W):
    rng = np.random.default_rng(seed)
    y = rng.integers(16, 236, size=(l, w)).astype(np.int64)
    u = rng.integers(16, 241, size=(l, w // 2)).astype(np.int64)
    v = rng.integers(16, 241, size=(l, w // 2)).astype(np.int64)
    return y, u, v


def to_dev(a):
    return jnp.asarray(a, jnp.int32)[None]


def assert_near_exact(got, want, frac=0.005, name=""):
    got = np.asarray(got)[0].astype(np.int64)
    diff = np.abs(got - want)
    assert diff.max() <= 1, f"{name}: max diff {diff.max()}"
    assert (diff != 0).mean() <= frac, f"{name}: {(diff != 0).mean()} mismatch frac"


def test_chroma_lowpass():
    y, u, v = rand_planes(0)
    gu, gv = yuv422.chroma_lowpass(to_dev(u), to_dev(v), ntsc=True, dtype=jnp.float64)
    wu, wv = ref.chroma_lowpass_yuv(u.copy(), v.copy(), ntsc=True)
    assert_near_exact(gu, wu, name="U")
    assert_near_exact(gv, wv, name="V")


def test_chroma_lowpass_lite():
    y, u, v = rand_planes(1)
    gu, gv = yuv422.chroma_lowpass_lite(to_dev(u), to_dev(v), dtype=jnp.float64)
    wu, wv = ref.chroma_lowpass_yuv(u.copy(), v.copy(), lite=True)
    assert_near_exact(gu, wu, name="U")
    assert_near_exact(gv, wv, name="V")


def test_yuv_to_ntsc_exact():
    for fieldno, parity, shift in [(0, 0, 180), (3, 1, 90), (5, 0, 270)]:
        y, u, v = rand_planes(2 + fieldno)
        xi = yuv422.scanline_phase_xi(
            jnp.array([fieldno]), jnp.array([parity]), L, shift, 0, True, gen1=True)
        gy, gu, gv = yuv422.yuv_to_ntsc(to_dev(y), to_dev(u), to_dev(v), xi, 50)
        wy, wu, wv = ref.yuv_to_ntsc(y.copy(), u.copy(), v.copy(), fieldno,
                                     parity, 50, shift, 0)
        np.testing.assert_array_equal(np.asarray(gy)[0], wy)
        np.testing.assert_array_equal(np.asarray(gu)[0], wu)
        np.testing.assert_array_equal(np.asarray(gv)[0], wv)


def test_ntsc_to_yuv_exact():
    for fieldno, parity, shift in [(0, 0, 180), (1, 1, 180), (4, 0, 90)]:
        y, u, v = rand_planes(10 + fieldno)
        y2, u2, v2 = ref.yuv_to_ntsc(y.copy(), u.copy(), v.copy(), fieldno,
                                     parity, 50, shift, 0)
        xi = yuv422.scanline_phase_xi(
            jnp.array([fieldno]), jnp.array([parity]), L, shift, 0, True, gen1=True)
        gy, gu, gv = yuv422.ntsc_to_yuv(to_dev(y2), to_dev(u2), to_dev(v2), xi, 50)
        wy, wu, wv = ref.ntsc_to_yuv(y2.copy(), u2.copy(), v2.copy(), fieldno,
                                     parity, 50, shift, 0)
        np.testing.assert_array_equal(np.asarray(gy)[0], wy)
        np.testing.assert_array_equal(np.asarray(gu)[0], wu)
        np.testing.assert_array_equal(np.asarray(gv)[0], wv)


def test_vhs_stages():
    y, u, v = rand_planes(20)
    sp = VHSSpeed.SP
    got = yuv422.vhs_luma_lowpass(to_dev(y), sp.luma_cut, jnp.float64)
    want = ref.vhs_luma_lowpass_yuv(y.copy(), sp.luma_cut)
    assert_near_exact(got, want, name="luma")

    gu, gv = yuv422.vhs_chroma_lowpass(to_dev(u), to_dev(v), sp.chroma_cut,
                                       sp.chroma_delay_gen1, jnp.float64)
    wu, wv = ref.vhs_chroma_lowpass_yuv(u.copy(), v.copy(), sp.chroma_cut,
                                        sp.chroma_delay_gen1)
    assert_near_exact(gu, wu, name="U")
    assert_near_exact(gv, wv, name="V")

    gu, gv = yuv422.vhs_chroma_vert_blend(to_dev(u), to_dev(v))
    wu, wv = ref.vhs_chroma_vert_blend_yuv(u.copy(), v.copy())
    np.testing.assert_array_equal(np.asarray(gu)[0], wu)
    np.testing.assert_array_equal(np.asarray(gv)[0], wv)

    got = yuv422.vhs_sharpen_luma(to_dev(y), sp.luma_cut, 1.5, jnp.float64)
    want = ref.vhs_sharpen_luma_yuv(y.copy(), sp.luma_cut, 1.5)
    assert_near_exact(got, want, name="sharpen luma")

    gu, gv = yuv422.vhs_sharpen_chroma(to_dev(u), to_dev(v), sp.chroma_cut,
                                       0.85, jnp.float64)
    wu, wv = ref.vhs_sharpen_chroma_yuv(u.copy(), v.copy(), sp.chroma_cut, 0.85)
    assert_near_exact(gu, wu, name="sharpen U")
    assert_near_exact(gv, wv, name="sharpen V")


def test_full_chain_pal_noise_off():
    """Full gen-1 PAL chain (VHS LP, noise off) vs composed golden stages:
    xi=(fieldno+y)&3 (ffmpeg_to_composite.cpp:456-459), single-branch PAL
    chroma lowpass (:366-431), vblend gated OFF for PAL (:859). The oracle's
    PAL branches are themselves pinned to the compiled reference in
    tests/test_ref_crosscheck.py (pal_* cases)."""
    from cvsim_tpu.config import VHSSpeed as VS

    cfg = CompositeConfig(
        ntsc=False, video_noise=0, video_chroma_noise=0,
        video_chroma_phase_noise=0, video_chroma_loss=0,
        vhs_head_switching=False, emulating_vhs=True,
        vhs_tape_speed=VS.LP)
    y, u, v = rand_planes(31)
    fieldno, parity = 3, 0
    gy, gu, gv = yuv422.composite_video_process(
        to_dev(y), to_dev(u), to_dev(v), cfg=cfg,
        fieldno=jnp.array([fieldno], jnp.int32),
        field_parity=jnp.array([parity], jnp.int32),
        key=jax.random.PRNGKey(0), dtype=jnp.float64)

    wy, wu, wv = y.copy(), u.copy(), v.copy()
    wu, wv = ref.chroma_lowpass_yuv(wu, wv, ntsc=False)
    wy, wu, wv = ref.yuv_to_ntsc(wy, wu, wv, fieldno, parity, 50, ntsc=False)
    wy, wu, wv = ref.ntsc_to_yuv(wy, wu, wv, fieldno, parity, 50, ntsc=False)
    sp = VS.LP
    wy = ref.vhs_luma_lowpass_yuv(wy, sp.luma_cut)
    wu, wv = ref.vhs_chroma_lowpass_yuv(wu, wv, sp.chroma_cut,
                                        sp.chroma_delay_gen1)
    # NO vert blend: NTSC-only
    wy = ref.vhs_sharpen_luma_yuv(wy, sp.luma_cut, cfg.vhs_out_sharpen)
    wu, wv = ref.vhs_sharpen_chroma_yuv(wu, wv, sp.chroma_cut,
                                        cfg.vhs_out_sharpen_chroma)
    wy, wu, wv = ref.yuv_to_ntsc(wy, wu, wv, fieldno, parity, 50, ntsc=False)
    wy, wu, wv = ref.ntsc_to_yuv(wy, wu, wv, fieldno, parity, 50, ntsc=False)
    wu, wv = ref.chroma_lowpass_yuv(wu, wv, ntsc=False)

    assert_near_exact(gy, wy, frac=0.02, name="Y")
    assert_near_exact(gu, wu, frac=0.02, name="U")
    assert_near_exact(gv, wv, frac=0.02, name="V")


def test_full_chain_noise_off():
    """Full gen-1 chain (VHS SP, noise off) vs composed golden stages."""
    cfg = CompositeConfig(
        video_noise=0, video_chroma_noise=0, video_chroma_phase_noise=0,
        video_chroma_loss=0, vhs_head_switching=False, emulating_vhs=True)
    y, u, v = rand_planes(30)
    fieldno, parity = 2, 1
    gy, gu, gv = yuv422.composite_video_process(
        to_dev(y), to_dev(u), to_dev(v), cfg=cfg,
        fieldno=jnp.array([fieldno], jnp.int32),
        field_parity=jnp.array([parity], jnp.int32),
        key=jax.random.PRNGKey(0), dtype=jnp.float64)

    wy, wu, wv = y.copy(), u.copy(), v.copy()
    wu, wv = ref.chroma_lowpass_yuv(wu, wv)
    wy, wu, wv = ref.yuv_to_ntsc(wy, wu, wv, fieldno, parity, 50)
    wy, wu, wv = ref.ntsc_to_yuv(wy, wu, wv, fieldno, parity, 50)
    sp = VHSSpeed.SP
    wy = ref.vhs_luma_lowpass_yuv(wy, sp.luma_cut)
    wu, wv = ref.vhs_chroma_lowpass_yuv(wu, wv, sp.chroma_cut, sp.chroma_delay_gen1)
    wu, wv = ref.vhs_chroma_vert_blend_yuv(wu, wv)
    wy = ref.vhs_sharpen_luma_yuv(wy, sp.luma_cut, cfg.vhs_out_sharpen)
    wu, wv = ref.vhs_sharpen_chroma_yuv(wu, wv, sp.chroma_cut, cfg.vhs_out_sharpen_chroma)
    wy, wu, wv = ref.yuv_to_ntsc(wy, wu, wv, fieldno, parity, 50)
    wy, wu, wv = ref.ntsc_to_yuv(wy, wu, wv, fieldno, parity, 50)
    wu, wv = ref.chroma_lowpass_yuv(wu, wv)

    assert_near_exact(gy, wy, frac=0.02, name="Y")
    assert_near_exact(gu, wu, frac=0.02, name="U")
    assert_near_exact(gv, wv, frac=0.02, name="V")
