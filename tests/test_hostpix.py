"""Native host-pixel kernels (native/hostpix.cpp) == numpy twins, element
for element.

The CLI restore/sibling tools dispatch their per-frame work to libhostpix
(cli/tools.py); the numpy implementations in host/colorconv.py and
models/tools_np.py remain the semantic reference (they are what the
compiled-reference crosschecks pin). These tests hold the two bit-equal —
same float32 operation order, numpy round-half-to-even, numpy floor
division — across sizes, chroma subsamplings, and the gamma-LUT paths.
"""

from __future__ import annotations

import numpy as np
import pytest

from cvsim_tpu.host import colorconv
from cvsim_tpu.models import restore, tools_np
from cvsim_tpu.native import hostpix

pytestmark = pytest.mark.skipif(hostpix._load() is None,
                                reason="no compiler for libhostpix")


@pytest.mark.parametrize("sh,sw,dh,dw,sub", [
    (480, 704, 480, 720, 2),    # SD upscale, 4:2:0
    (480, 720, 480, 720, 2),    # identity
    (240, 352, 483, 711, 2),    # odd dims both axes
    (486, 712, 480, 480, 2),    # downscale
    (120, 176, 120, 200, 1),    # 4:4:4 chroma (mono fill path)
])
def test_scale_frame_bit_exact(sh, sw, dh, dw, sub):
    rng = np.random.default_rng(sh * 1000 + dw)
    y = rng.integers(0, 256, (sh, sw), np.uint8)
    u = rng.integers(0, 256, (sh // sub, sw // sub), np.uint8)
    v = rng.integers(0, 256, (sh // sub, sw // sub), np.uint8)
    ref = np.asarray(colorconv.scale_frame_to_np(y, u, v, dw, dh))
    got = hostpix.scale_frame_to(y, u, v, dw, dh)
    np.testing.assert_array_equal(got, ref)


def test_rgb_to_yuv_bit_exact():
    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, (480, 720, 3), np.int32)
    yn, un, vn = colorconv.rgb_to_yuv601_np(rgb[..., 0], rgb[..., 1],
                                            rgb[..., 2])
    y2, u2, v2 = hostpix.rgb_to_yuv_planes(rgb)
    np.testing.assert_array_equal(y2, yn.astype(np.uint8))
    np.testing.assert_array_equal(u2, un.astype(np.uint8))
    np.testing.assert_array_equal(v2, vn.astype(np.uint8))


def test_vhsled_dejitter_bit_exact():
    rng = np.random.default_rng(11)
    # dark left edges of random run length -> nonzero per-row shifts,
    # plus fully-dark rows (no 9-run anywhere -> adj = w<<16)
    f = rng.integers(0, 40, (480, 704, 3), np.int32)
    edges = rng.integers(0, 60, 480)
    for r in range(0, 480, 3):
        f[r, edges[r]:, :] = rng.integers(0, 256, (704 - edges[r], 3))
    ref = np.asarray(tools_np.vhsled_dejitter(f))
    got = hostpix.vhsled_dejitter(f)
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("gamma", [None, 2.2])
def test_frameblend_mix_bit_exact(gamma):
    rng = np.random.default_rng(13)
    frames = rng.integers(0, 256, (5, 120, 176, 3), np.int32)
    w16 = [(0, 26000), (1, 19000), (2, 11000), (3, 6000), (4, 3536)]
    gd = ge = None
    if gamma:
        gd, ge = (np.asarray(t) for t in restore.gamma_tables(gamma))
    ref = np.asarray(tools_np.frameblend_mix(frames, w16, gd, ge))
    got_list = hostpix.frameblend_mix(list(frames), w16, gd, ge)
    got_arr = hostpix.frameblend_mix(frames, w16, gd, ge)
    np.testing.assert_array_equal(got_list, ref)
    np.testing.assert_array_equal(got_arr, ref)


@pytest.mark.parametrize("gamma", [None, 2.2])
def test_filmac_bit_exact(gamma):
    rng = np.random.default_rng(17)
    gd = ge = None
    if gamma:
        gd, ge = (np.asarray(t) for t in restore.gamma_tables(gamma))
    state_a = restore.FilmacState()
    state_b = restore.FilmacState()
    for k in range(4):   # level IIR advances across frames
        frame = rng.integers(0, 256, (480, 704, 3), np.int32)
        mn_a, mx_a, st_a = tools_np.filmac_measure(frame, gd)
        mn_b, mx_b, st_b = hostpix.filmac_measure(frame, gd)
        assert (mn_a, mx_a, st_a) == (mn_b, mx_b, st_b)
        restore.filmac_update_levels(state_a, mn_a, mx_a)
        restore.filmac_update_levels(state_b, mn_b, mx_b)
        ref = np.asarray(tools_np.filmac_rescale(frame, state_a, st_a,
                                                 gd, ge))
        got = hostpix.filmac_rescale(frame, state_b, st_b, gd, ge)
        np.testing.assert_array_equal(got, ref)
