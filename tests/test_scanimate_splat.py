"""scanimate phosphor splat: the selection-matmul production path must match
the scatter-add oracle across all four warp effects and phases.

Tolerance: stamp values are integer-truncated before any accumulation, so
summation order is irrelevant; the only permitted deviation is XLA fusing
the fv multiply-adds differently between the two graphs, flipping
trunc(fv*255) by 1 at exact-multiple ties (see _splat_matmul docstring).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cvsim_tpu.models import tools

SRC_H, SRC_W = 64, 96
DST_H, DST_W = 144, 192


def _dots(src, fieldno, field, precision=1, input_ntsc=True):
    """Replicates scanimate_field's dot setup (kept in sync with it)."""
    ystep = 2 if input_ntsc else 1
    y0 = field if input_ntsc else 0
    ys = np.arange(y0, SRC_H, ystep)
    xs = np.arange(SRC_W << precision)
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    yy, xx = yy.reshape(-1), xx.reshape(-1)
    sx = (xx * 2.0) / (SRC_W << precision) - 1.0
    sy = ((yy * 2.0) / SRC_H - 1.0
          + ((xx * float(ystep)) / (SRC_W << precision)) / SRC_H)
    dot_radius = (DST_H * (2.05 if input_ntsc else 1.05)) / SRC_H
    g = src[yy, xx >> precision, 1].astype(jnp.float32) / 255.0
    frame_t = (yy * SRC_W * (1 << precision) + xx).astype(np.float64) / (
        SRC_W * SRC_H * (1 << precision))
    sigscal = (DST_W / SRC_W) * (DST_H / SRC_H) * 0.9
    sxj, syj, sig = tools._scanimate_warp(
        jnp.asarray(sx, jnp.float32), jnp.asarray(sy, jnp.float32), g,
        jnp.asarray(fieldno), jnp.asarray(frame_t, jnp.float32))
    radius = jnp.maximum(jnp.float32(dot_radius), 1.2)
    sig = jnp.clip(sig * sigscal, 0.0, 32.0) / radius
    px = (sxj + 1.0) * DST_W / 2.0
    py = (syj + 1.0) * DST_H / 2.0
    r_int = int(np.ceil(float(dot_radius if dot_radius > 1.2 else 1.2)))
    return px, py, sig, radius, r_int, precision


@pytest.mark.parametrize("effect", [0, 1, 2, 3])
@pytest.mark.parametrize("ef_field", [0, 40, 140])
def test_matmul_splat_matches_scatter(effect, ef_field):
    rng = np.random.default_rng(effect * 7 + 1)
    src = jnp.asarray(rng.integers(0, 256, size=(SRC_H, SRC_W, 3)), jnp.int32)
    fieldno = effect * 180 + ef_field
    got = np.asarray(tools.scanimate_field(
        src, DST_H, DST_W, 0, jnp.int32(fieldno), input_ntsc=True))
    px, py, sig, radius, r_int, p = _dots(src, fieldno, 0)
    want = np.asarray(tools._splat_scatter(
        px, py, sig, radius, r_int, DST_H, DST_W)) >> p
    diff = np.abs(got.astype(np.int64) - want.astype(np.int64))
    assert diff.max() <= 1, diff.max()
    assert (diff != 0).mean() < 1e-4, (diff != 0).mean()


def test_matmul_splat_progressive_source():
    """input_ntsc=False path (full-height dot grid, smaller radius)."""
    rng = np.random.default_rng(5)
    src = jnp.asarray(rng.integers(0, 256, size=(SRC_H, SRC_W, 3)), jnp.int32)
    got = np.asarray(tools.scanimate_field(
        src, DST_H, DST_W, 0, jnp.int32(200), input_ntsc=False))
    px, py, sig, radius, r_int, p = _dots(src, 200, 0, input_ntsc=False)
    want = np.asarray(tools._splat_scatter(
        px, py, sig, radius, r_int, DST_H, DST_W)) >> p
    diff = np.abs(got.astype(np.int64) - want.astype(np.int64))
    assert diff.max() <= 1
    assert (diff != 0).mean() < 1e-4
