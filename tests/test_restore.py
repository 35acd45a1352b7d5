"""Unit tests for the restore/conversion tools (frameblend, filmac, vhsled)
against hand-computed reference semantics."""

import numpy as np
import jax.numpy as jnp

from cvsim_tpu.models import restore


def test_frameblend_weights_simple_overlap():
    # frames at source times 0.0, 0.8, 1.6 (source slower than output):
    # output frame [0,1) overlaps [0.0,0.8) fully (0.8) and [0.8,1.6) by 0.2
    w16, cutoff = restore.frameblend_weights([0.0, 0.8, 1.6], 0.0)
    assert cutoff == 0
    ws = dict(w16)
    assert abs(ws[0] / 0x10000 - 0.8) < 1e-4
    assert abs(ws[1] / 0x10000 - 0.2) < 1e-4


def test_frameblend_weights_fallback_single():
    w16, _ = restore.frameblend_weights([5.0], 0.0)
    assert w16 == [(0, 0x10000)]


def test_frameblend_squelch_near_rate():
    # interval 1.005 output frames: within 1% -> squelch toward frame 0
    w16, _ = restore.frameblend_weights([0.0, 1.005], 0.0, squelch=True)
    ws = dict(w16)
    assert ws[0] >= int(0.99 * 0x10000)


def test_frameblend_mix_weighted_average():
    f0 = np.full((4, 8, 3), 100, np.int64)
    f1 = np.full((4, 8, 3), 200, np.int64)
    out = np.asarray(restore.frameblend_mix(
        np.stack([f0, f1]), [(0, 0x8000), (1, 0x8000)]))
    # (100*0.5 + 200*0.5) = 150 exactly in 16.16
    assert np.all(out == 149) or np.all(out == 150)


def test_frameblend_gamma_tables_roundtrip():
    dec, enc = restore.gamma_tables(2.2)
    # encode(decode(x)) ~ x for mid-range values
    for x in (0, 32, 128, 200, 255):
        assert abs(int(enc[int(dec[x])]) - x) <= 1


def test_filmac_levels_asymmetric_smoothing():
    st = restore.FilmacState()
    restore.filmac_update_levels(st, 100, 1000)
    assert (st.minv, st.maxv) == (100, 1000)
    # max rises fast (avg/2)
    restore.filmac_update_levels(st, 100, 2000)
    assert st.maxv == (1000 + 2000) // 2
    # max falls slow (4:1)
    prev = st.maxv
    restore.filmac_update_levels(st, 100, 500)
    assert st.maxv == (prev * 4 + 500) // 5
    # min falls fast
    prev_min = st.minv
    restore.filmac_update_levels(st, 20, 500)
    assert st.minv == (prev_min + 20) // 2


def test_filmac_rescale_stretches():
    rng = np.random.default_rng(0)
    rgb = rng.integers(100, 151, (130, 140, 3)).astype(np.int64)
    minv, maxv, scaleto = restore.filmac_measure(rgb)
    st = restore.FilmacState()
    restore.filmac_update_levels(st, minv, maxv)
    out = np.asarray(restore.filmac_rescale(rgb, st, scaleto))
    assert out.max() - out.min() > (rgb.max() - rgb.min())


def test_filmac_measure_max_extends_past_maxx():
    """The reference's block scan guards x+sx only against the frame width
    (filmac.cpp:904), so the per-pixel max sees columns past maxx up to the
    last block's end: a 720-wide frame (maxx=648, last block 620..747) must
    include a highlight at column 700."""
    rgb = np.full((16, 720, 3), 120, np.int64)
    base_max = restore.filmac_measure(rgb)[1]
    lit = rgb.copy()
    lit[4, 700] = 255
    assert restore.filmac_measure(lit)[1] == max(base_max, 255 << 16)
    # but a highlight left of minx (col 50) stays invisible
    lit2 = rgb.copy()
    lit2[4, 50] = 255
    assert restore.filmac_measure(lit2)[1] == base_max


def test_vhsled_blackish_blue_quirk():
    """The reference compares every channel of p against the BLUE channel of
    the line's first pixel (the c >>= 8 typo). A row whose first pixel has a
    bright blue channel makes everything 'blackish' -> no shift."""
    h, w = 16, 64
    rgb = np.zeros((h, w, 3), np.int64)
    rgb[:, 0, 2] = 240          # first-pixel blue is bright
    rgb[:, 10:, :] = 200        # bright content would otherwise trigger
    out = np.asarray(restore.vhsled_dejitter(rgb))
    np.testing.assert_array_equal(out, rgb)   # nothing shifts

    rgb2 = np.zeros((h, w, 3), np.int64)
    rgb2[:, 12:, :] = 200       # ref blue = 0 -> content is non-blackish
    out2 = np.asarray(restore.vhsled_dejitter(rgb2))
    # margin of 12 detected and shifted away
    edges = np.argmax(out2[:, :, 0] > 100, axis=1)
    assert edges.max() <= 1, edges


def test_vhsled_no_shift_beyond_half_width():
    h, w = 16, 64
    rgb = np.zeros((h, w, 3), np.int64)
    rgb[:, 40:, :] = 200        # margin 40 >= w/2 -> leave untouched
    out = np.asarray(restore.vhsled_dejitter(rgb))
    np.testing.assert_array_equal(out, rgb)
