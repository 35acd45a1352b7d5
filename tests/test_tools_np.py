"""Host-numpy tool paths == jax tool ops, element for element.

The CLI runs the sibling pixel tools on the host (models/tools_np); the
jax versions (models/tools.py, models/restore.py) remain the
batch/deployment path. These tests pin the two implementations together so
the CLI path, the jittable path, and the shared splitmix32 noise streams
can never drift.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cvsim_tpu.models import restore, tools, tools_np
from cvsim_tpu.ops import noise, noise_np


RNG = np.random.default_rng(42)


def rand_rgb(h=32, w=48):
    return RNG.integers(0, 256, (h, w, 3)).astype(np.int32)


# ------------------------------------------------------------------ noise

def test_noise_streams_match():
    jb = np.asarray(noise._bits(noise._key32(7), jnp.arange(256, dtype=jnp.uint32)))
    nb = noise_np.bits(noise_np.stream_id(7), np.arange(256, dtype=np.uint32))
    np.testing.assert_array_equal(jb, nb)


def test_randint_stream_matches_jax_and_prngkey():
    key = jax.random.PRNGKey(11)
    j = np.asarray(noise.randint_stream(key, (17, 23), 0, 20001))
    n = noise_np.randint_stream(key, (17, 23), 0, 20001)
    np.testing.assert_array_equal(j, n)
    # int seeds too
    j2 = np.asarray(noise.randint_stream(5, (64,), -3, 4))
    n2 = noise_np.randint_stream(5, (64,), -3, 4)
    np.testing.assert_array_equal(j2, n2)


def test_field_stage_key_matches():
    key = jax.random.PRNGKey(3)
    for fieldno in (0, 1, 97, 100000):
        for stage in (0, 1, 5):
            j = int(np.asarray(noise.field_stage_keys(
                key, jnp.asarray([fieldno]), stage))[0])
            n = int(noise_np.field_stage_key(key, fieldno, stage))
            assert j == n


# ------------------------------------------------------------------ tools

def test_posterize_matches():
    f = rand_rgb()
    for thr in (1, 3, 7):
        np.testing.assert_array_equal(
            np.asarray(tools.posterize(f, thr)), tools_np.posterize(f, thr))


def test_colormap_matches():
    f = rand_rgb()
    lut = RNG.integers(0, 256, (256, 3)).astype(np.int32)
    np.testing.assert_array_equal(
        np.asarray(tools.colormap_apply(f, lut)),
        tools_np.colormap_apply(f, lut))


@pytest.mark.parametrize("xdivr,noisekey,fade,invert", [
    (1, 0, 0, False),
    (4, 3000, 0, False),
    (4, 3000, 64, True),
    (3, 19000, 0, False),   # w % xdivr != 0 pad path
])
def test_colorkey_matches(xdivr, noisekey, fade, invert):
    src = rand_rgb()
    dst = rand_rgb()
    key = jax.random.PRNGKey(9)
    kwargs = dict(color=(120, 40, 200), threshhold=90, invert=invert,
                  noisekey=noisekey, fade=fade, xdivr=xdivr)
    j = np.asarray(tools.colorkey_apply(dst, src, key, **kwargs))
    n = tools_np.colorkey_apply(dst, src, key, **kwargs)
    np.testing.assert_array_equal(j, n)


def test_average_delay_matches():
    src = rand_rgb()
    dst = rand_rgb()
    for field, newlevel, delay in [(0, 128, 1), (7, 64, 3), (100, 255, 2)]:
        j = np.asarray(tools.average_delay_blend(
            dst, src, field, newlevel=newlevel, delay=delay))
        n = tools_np.average_delay_blend(
            dst, src, field, newlevel=newlevel, delay=delay)
        np.testing.assert_array_equal(j, n)


def test_frameblend_mix_matches():
    frames = np.stack([rand_rgb() for _ in range(3)])
    w16 = [(0, 0x8000), (1, 0x4000), (2, 0x4000)]
    gdec, genc = restore.gamma_tables(2.2)
    for dec, enc in [(None, None), (gdec, genc)]:
        j = np.asarray(restore.frameblend_mix(frames, w16, dec, enc))
        n = tools_np.frameblend_mix(frames, w16, dec, enc)
        np.testing.assert_array_equal(j, n)


def test_filmac_matches():
    f = rand_rgb(130, 300)   # spans >1 block in x, partial blocks
    gdec, genc = restore.gamma_tables(2.2)
    for dec, enc in [(None, None), (gdec, genc)]:
        jm = restore.filmac_measure(f, dec)
        nm = tools_np.filmac_measure(f, dec)
        assert jm == nm
        st = restore.FilmacState()
        restore.filmac_update_levels(st, nm[0], nm[1])
        j = np.asarray(restore.filmac_rescale(f, st, nm[2], dec, enc))
        n = tools_np.filmac_rescale(f, st, nm[2], dec, enc)
        np.testing.assert_array_equal(j, n)


def test_vhsled_matches():
    # frame with a jittered left edge: black margin then content
    h, w = 40, 120
    f = np.zeros((h, w, 3), np.int32)
    margins = (8 + 4 * np.sin(np.arange(h) / 3)).astype(int)
    for y in range(h):
        f[y, margins[y]:] = RNG.integers(64, 256, (w - margins[y], 3))
    j = np.asarray(restore.vhsled_dejitter(f))
    n = tools_np.vhsled_dejitter(f)
    np.testing.assert_array_equal(j, n)


def test_scanimate_batched_cli_matches_per_field(tmp_path):
    """The GOP-batched scanimate CLI == the per-field reference path."""
    from cvsim_tpu.cli.tools import run_scanimate
    from cvsim_tpu.host import y4m
    from cvsim_tpu.models import tools as ops
    from cvsim_tpu.host.pipeline_yiq import _scale_frame_to
    from fractions import Fraction

    W, H = 64, 48
    src = str(tmp_path / "in.y4m")
    with open(src, "wb") as fh:
        wr = y4m.Y4MWriter(fh, y4m.Y4MHeader(
            width=W, height=H, fps=Fraction(60000, 1001)))
        for i in range(5):
            wr.write(RNG.integers(16, 236, (H, W)).astype(np.uint8),
                     RNG.integers(16, 241, (H // 2, W // 2)).astype(np.uint8),
                     RNG.integers(16, 241, (H // 2, W // 2)).astype(np.uint8))
    out = str(tmp_path / "out.y4m")
    rc = run_scanimate(["-i", src, "-o", out, "-width", str(W)],
                       batch=4)   # forces a padded final batch
    assert rc == 0

    # per-field reference: same op, one field at a time
    with open(src, "rb") as fh:
        rd = y4m.Y4MReader(fh)
        frames = [_scale_frame_to(y, u if u is not None else np.full_like(y, 128),
                                  v if v is not None else np.full_like(y, 128),
                                  W, 480) for (y, u, v) in rd]
    # output raster defaults to 720x480 with width flag -> height 480
    with open(out, "rb") as fh:
        rd = y4m.Y4MReader(fh)
        got = list(rd)
    assert len(got) > 0
    prev = None
    for fieldno, (gy, gu, gv) in enumerate(got):
        # source fps == output field rate -> 1:1 frame advance
        ref = np.asarray(ops.scanimate_pack(ops.scanimate_field(
            frames[min(fieldno, len(frames) - 1)],
            480, W, 0, jnp.int32(fieldno), input_ntsc=False)))
        parity = (fieldno & 1) ^ 1
        if parity == 1 and prev is not None:
            ref = ref.copy()
            ref[0] = prev[0]
        prev = ref
        from cvsim_tpu.host.colorconv import rgb_to_yuv601_np
        ry, ru, rv = rgb_to_yuv601_np(ref[..., 0], ref[..., 1], ref[..., 2])
        # vmap changes XLA's fv fusion -> the documented trunc(fv*255)
        # +-1 flip (models/tools._splat_matmul docstring); allow +-2 after
        # RGB->YUV rounding, on a vanishing fraction of pixels
        diff = np.abs(gy.astype(int) - ry.astype(int))
        assert diff.max() <= 2
        assert (diff > 0).mean() < 1e-3
    assert prev is not None
