"""Property tests (SURVEY.md section 4 plan item c)."""

import numpy as np
import jax
import jax.numpy as jnp

from cvsim_tpu.config import CompositeConfig
from cvsim_tpu.models import yiq, yuv422
from cvsim_tpu.ops.phase import scanline_phase_xi

L, W = 8, 128


def test_qam_roundtrip_recovers_flat_chroma():
    """encode -> decode at amp=50 is the identity on flat-color fields
    (the subcarrier is fully cancelled by the box filter)."""
    for iq in [(4000, -2500), (-8000, 100), (0, 12000)]:
        y = jnp.full((1, L, W), 30000, jnp.int32)
        i = jnp.full((1, L, W), iq[0], jnp.int32)
        q = jnp.full((1, L, W), iq[1], jnp.int32)
        xi = scanline_phase_xi(jnp.array([3]), jnp.array([1]), L, 180, 0, True)
        y2, i2, q2 = yiq.chroma_into_luma(y, i, q, xi, 50)
        y3, i3, q3 = yiq.chroma_from_luma(y2, i2, q2, xi, 50)
        # interior samples recover the constants exactly
        np.testing.assert_array_equal(np.asarray(i3)[0, :, 8:-8],
                                      np.full((L, W - 16), iq[0]))
        np.testing.assert_array_equal(np.asarray(q3)[0, :, 8:-8],
                                      np.full((L, W - 16), iq[1]))
        np.testing.assert_array_equal(np.asarray(y3)[0, :, 8:-8],
                                      np.full((L, W - 16), 30000))


def test_noise_deterministic_per_seed():
    cfg = CompositeConfig(video_noise=8, video_chroma_noise=10,
                          video_chroma_phase_noise=5, video_chroma_loss=100,
                          vhs_head_switching=True)
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.integers(0, 65280, (2, L, W)), jnp.int32)
    i = jnp.asarray(rng.integers(-8000, 8000, (2, L, W)), jnp.int32)
    q = jnp.asarray(rng.integers(-8000, 8000, (2, L, W)), jnp.int32)
    fn = jnp.array([0, 1], jnp.int32)
    par = jnp.array([0, 1], jnp.int32)

    def run(seed):
        out = yiq.composite_layer(y, i, q, cfg=cfg, fieldno=fn,
                                  field_parity=par, key=jax.random.PRNGKey(seed))
        return tuple(np.asarray(t) for t in out)

    a = run(7)
    b = run(7)
    c = run(8)
    for x1, x2 in zip(a, b):
        np.testing.assert_array_equal(x1, x2)
    assert any((x1 != x3).any() for x1, x3 in zip(a, c))


def test_video_noise_statistics():
    """The smoothed walk has the reference recurrence's stationary variance:
    n' = (n+u)/2 with u ~ U[-m, m] -> var(n) = var(u)/3."""
    from cvsim_tpu.ops.noise import smoothed_noise_walk

    m = 30
    w = np.asarray(smoothed_noise_walk(jax.random.PRNGKey(0), (1, 200000), m))
    var_u = (m * (m + 1)) / 3.0  # variance of discrete U[-m, m]
    assert abs(w.mean()) < 1.0
    assert abs(w.var() / (var_u / 3.0) - 1.0) < 0.1


def test_black_key_feedback_hall_of_mirrors():
    """Black pixels key through to the persistent filter frame; bright pixels
    update it (ffmpeg_to_composite.cpp:954-999)."""
    l, w2 = 4, 8
    w = w2 * 2
    y = jnp.full((l, w), 16, jnp.int32)    # black field
    u = jnp.full((l, w2), 128, jnp.int32)
    v = jnp.full((l, w2), 128, jnp.int32)
    fy = jnp.full((l, w), 200, jnp.int32)  # bright filter frame
    fu = jnp.full((l, w2), 90, jnp.int32)
    fv = jnp.full((l, w2), 160, jnp.int32)
    (oy, ou, ov), (nfy, nfu, nfv) = yuv422.black_key_feedback(
        y, u, v, fy, fu, fv, level=10)
    # black input keys through: output = filter frame
    np.testing.assert_array_equal(np.asarray(oy), np.asarray(fy))
    np.testing.assert_array_equal(np.asarray(ou), np.asarray(fu))
    # filter updates to the keyed result
    np.testing.assert_array_equal(np.asarray(nfy), np.asarray(oy))

    # bright input does NOT key; filter frame updates to the input
    yb = jnp.full((l, w), 235, jnp.int32)
    (oy2, ou2, ov2), (nfy2, _, _) = yuv422.black_key_feedback(
        yb, u, v, fy, fu, fv, level=10)
    np.testing.assert_array_equal(np.asarray(oy2), np.asarray(yb))
    np.testing.assert_array_equal(np.asarray(nfy2), np.asarray(yb))


def test_gen1_pal_chain_runs():
    cfg = CompositeConfig(ntsc=False, video_noise=0)
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.integers(16, 236, (1, L, W)), jnp.int32)
    u = jnp.asarray(rng.integers(16, 241, (1, L, W // 2)), jnp.int32)
    v = jnp.asarray(rng.integers(16, 241, (1, L, W // 2)), jnp.int32)
    oy, ou, ov = yuv422.composite_video_process(
        y, u, v, cfg=cfg, fieldno=jnp.array([5], jnp.int32),
        field_parity=jnp.array([1], jnp.int32), key=jax.random.PRNGKey(0))
    assert np.asarray(oy).shape == (1, L, W)
    # PAL xi pattern differs from NTSC: outputs must differ
    cfg_ntsc = CompositeConfig(ntsc=True, video_noise=0)
    oy2, _, _ = yuv422.composite_video_process(
        y, u, v, cfg=cfg_ntsc, fieldno=jnp.array([5], jnp.int32),
        field_parity=jnp.array([1], jnp.int32), key=jax.random.PRNGKey(0))
    assert (np.asarray(oy) != np.asarray(oy2)).any()


def test_nocolor_subcarrier_debug_taps():
    """-nocolor-subcarrier leaves the QAM-laden luma visible and neutral
    chroma (ffmpeg_to_composite.cpp:315,473-474)."""
    cfg = CompositeConfig(video_noise=0, nocolor_subcarrier=True)
    rng = np.random.default_rng(2)
    y = jnp.asarray(rng.integers(16, 236, (1, L, W)), jnp.int32)
    u = jnp.asarray(rng.integers(16, 241, (1, L, W // 2)), jnp.int32)
    v = jnp.asarray(rng.integers(16, 241, (1, L, W // 2)), jnp.int32)
    oy, ou, ov = yuv422.composite_video_process(
        y, u, v, cfg=cfg, fieldno=jnp.array([0], jnp.int32),
        field_parity=jnp.array([0], jnp.int32), key=jax.random.PRNGKey(0))
    # chroma was neutralized at encode; the out-lowpass keeps it at 128
    assert np.abs(np.asarray(ou).astype(int) - 128).max() <= 1
    assert np.abs(np.asarray(ov).astype(int) - 128).max() <= 1


def test_hd_1080_chain():
    """BASELINE config 5 (stretch): the chain is raster-size agnostic —
    1080p fields (540 lines x 1920 samples) run through the full VHS chain."""
    cfg = CompositeConfig(emulating_vhs=True, vhs_head_switching=True,
                          video_noise=4, video_chroma_noise=8,
                          video_chroma_phase_noise=2, video_chroma_loss=4)
    rng = np.random.default_rng(3)
    rgb = jnp.asarray(rng.integers(0, 256, (2, 540, 1920, 3)), jnp.int32)
    out = yiq.composite_layer_rgb(
        rgb, jnp.array([0, 1], jnp.int32), jnp.array([0, 1], jnp.int32),
        jax.random.PRNGKey(0), cfg=cfg)
    assert np.asarray(out).shape == (2, 540, 1920, 3)


def test_noise_is_batch_invariant():
    """Content-addressed RNG: a field's stochastic output depends only on
    (seed, fieldno), not on how fields are batched."""
    cfg = CompositeConfig(video_noise=8, video_chroma_noise=12,
                          video_chroma_phase_noise=4, video_chroma_loss=5000,
                          vhs_head_switching=True,
                          vhs_head_switching_point=0.15,
                          vhs_head_switching_phase=0.15)
    rng = np.random.default_rng(4)
    y = jnp.asarray(rng.integers(0, 65280, (4, L, W)), jnp.int32)
    i = jnp.asarray(rng.integers(-8000, 8000, (4, L, W)), jnp.int32)
    q = jnp.asarray(rng.integers(-8000, 8000, (4, L, W)), jnp.int32)
    fn = jnp.array([0, 1, 2, 3], jnp.int32)
    par = jnp.array([0, 1, 0, 1], jnp.int32)
    key = jax.random.PRNGKey(9)
    full = yiq.composite_layer(y, i, q, cfg=cfg, fieldno=fn, field_parity=par,
                               key=key)
    for k in range(4):
        single = yiq.composite_layer(
            y[k:k+1], i[k:k+1], q[k:k+1], cfg=cfg, fieldno=fn[k:k+1],
            field_parity=par[k:k+1], key=key)
        for x1, x2 in zip(full, single):
            np.testing.assert_array_equal(np.asarray(x1)[k], np.asarray(x2)[0])
