"""Cross-validate golden/ref_scalar.py against the REFERENCE'S OWN compiled
DSP (golden/ref_extract.py builds it from /root/reference at test time).

This breaks the round-1 circularity: engines were proven against the oracle,
but the oracle itself was only ever the author's reading of the C++. Here
the actual reference functions run on random fields and must agree with the
oracle bit-for-bit on every deterministic stage (noise stages excluded: they
consume libc rand(), which the rebuild replaces by design — SURVEY §4).

Skipped when /root/reference or g++ is unavailable (e.g. end-user installs).

Known reference quirk handled here (discovered by this harness):
`composite_ntsc_to_yuv` (ffmpeg_to_composite.cpp:495) reads `Y[x+2]` past
the row end for the last two columns — with linesize == width that is the
NEXT row's (opposite field's) first two pixels. The oracle instead pads 16
(luma black). Gen-1 tests therefore pin every row's first two luma columns
to 16 so both readings coincide; test_gen1_row_end_quirk documents the
divergence explicitly on unconstrained input.
"""

from __future__ import annotations

import zlib

import numpy as np
import pytest

from golden import ref_extract, ref_scalar as ref

pytestmark = pytest.mark.skipif(
    not ref_extract.available(),
    reason="reference tree or g++ not available")

H, W = 24, 64           # small frame: scalar oracle is per-pixel Python
VHS_TABLE = {           # speed -> (luma_cut, chroma_cut, delay_g1, delay_g2)
    0: (2400000.0, 320000.0, 4, 9),
    1: (1900000.0, 300000.0, 5, 12),
    2: (1400000.0, 280000.0, 6, 14),
}


def _rand_rgb(seed, h=H, w=W):
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3)).astype(np.uint8)


def _rand_yuv(seed, h=H, w=W, pin16=True):
    rng = np.random.default_rng(seed)
    y = rng.integers(16, 236, size=(h, w)).astype(np.uint8)
    u = rng.integers(16, 241, size=(h, w // 2)).astype(np.uint8)
    v = rng.integers(16, 241, size=(h, w // 2)).astype(np.uint8)
    if pin16:
        y[:, :2] = 16   # see module docstring: row-end read quirk
    return y, u, v


# ------------------------------------------------------------------- gen-2

def _oracle_gen2(rgb, field, fieldno, cfg):
    """Mirror ffmpeg_ntsc.cpp composite_layer's stage order on field rows."""
    rows = rgb[field::2].astype(np.int64)
    l, w, _ = rows.shape
    y = np.zeros((l, w), np.int64)
    i = np.zeros((l, w), np.int64)
    q = np.zeros((l, w), np.int64)
    for li in range(l):
        for x in range(w):
            r, g, b = (int(rows[li, x, 0]), int(rows[li, x, 1]),
                       int(rows[li, x, 2]))
            y[li, x], i[li, x], q[li, x] = ref.rgb_to_yiq(r, g, b)

    ps = cfg.get("scp", 180)
    po = cfg.get("scpo", 0)
    amp = cfg.get("amp", 50)
    amp_back = cfg.get("amp_back", 50)
    if cfg.get("in_lowpass", True):
        i, q = ref.composite_lowpass_yiq(i, q)
    y, i, q = ref.chroma_into_luma_yiq(y, i, q, fieldno, field, amp, ps, po)
    if cfg.get("preemphasis", 0):
        y = ref.preemphasis_yiq(y, cfg["preemphasis"],
                                cfg.get("preemphasis_cut", 1000000.0))
    if cfg.get("hs", False):
        y = ref.head_switching(y, field, cfg["hs_point"], cfg["hs_phase"],
                               0.0, ntsc=cfg.get("ntsc", True), fill=0)
    y, i, q = ref.chroma_from_luma_yiq(y, i, q, fieldno, field, amp_back,
                                       ps, po)
    if cfg.get("vhs", False):
        luma_cut, chroma_cut, _, delay = VHS_TABLE[cfg.get("speed", 0)]
        y = ref.vhs_luma_lowpass_yiq(y, luma_cut)
        i, q = ref.vhs_chroma_lowpass_yiq(i, q, chroma_cut, delay)
        if cfg.get("vblend", True) and cfg.get("ntsc", True):
            # vhs_chroma_vert_blend && output_ntsc (ffmpeg_ntsc.cpp:1843)
            i, q = ref.vhs_chroma_vert_blend_yiq(i, q)
        y = ref.vhs_sharpen_yiq(y, luma_cut, cfg.get("sharpen", 1.5))
        if not cfg.get("svideo", False):
            y, i, q = ref.chroma_into_luma_yiq(y, i, q, fieldno, field,
                                               amp, ps, po)
            y, i, q = ref.chroma_from_luma_yiq(y, i, q, fieldno, field,
                                               amp, ps, po)
    if cfg.get("out_lowpass", True):
        i, q = ref.composite_lowpass_yiq(
            i, q, lite=cfg.get("out_lowpass_lite", True))

    out = rgb.copy()
    for li in range(l):
        for x in range(w):
            out[field + 2 * li, x] = ref.yiq_to_rgb(
                int(y[li, x]), int(i[li, x]), int(q[li, x]))
    return out


GEN2_CASES = [
    ("defaults", 0, 0, {}),
    ("field1_fieldno3", 1, 3, {}),
    ("phase90", 0, 5, {"scp": 90, "scpo": 1}),
    ("phase270_no_in_lp", 1, 2, {"scp": 270, "in_lowpass": False}),
    ("preemphasis", 0, 1, {"preemphasis": 4.0, "preemphasis_cut": 800000.0}),
    ("vhs_sp", 0, 7, {"vhs": True, "speed": 0}),
    ("vhs_ep_svideo_novblend", 1, 4,
     {"vhs": True, "speed": 2, "svideo": True, "vblend": False,
      "sharpen": 2.0, "out_lowpass_lite": False}),
    # the bar is on-raster for this 24-line frame only for
    # point in ~[0.0838, 0.1295): y = 2*(p/twidth) + field - 44 < 24
    ("head_switching", 0, 6,
     {"hs": True, "hs_point": 0.1, "hs_phase": 0.17,
      "hs_phase_noise": 0.0}),
    # negative phase with a VISIBLE bar: C fmod is sign-preserving and the
    # (unsigned int) cast wraps — x comes from the wrapped residue; a
    # positive-mod bug would shift the bar by a different amount
    ("head_switching_negative_phase", 0, 6,
     {"hs": True, "hs_point": 0.1, "hs_phase": -0.005,
      "hs_phase_noise": 0.0}),
    ("amps", 0, 2, {"amp": 40, "amp_back": 60}),
    # ---- PAL gen-2 (ffmpeg_ntsc.cpp:1661-1675: 312.5-line head-switch
    # raster, y -= (312-288)*2; :1843: vblend gated on output_ntsc). The
    # subcarrier phase tables have no PAL branch in gen-2, so these two
    # stages are the whole PAL surface. int(0.1*312.5)=31 -> bar row
    # 62+field-48 = 14+field, on-raster for the 24-line frame.
    ("pal_head_switching", 0, 4,
     {"ntsc": False, "hs": True, "hs_point": 0.1, "hs_phase": 0.17,
      "hs_phase_noise": 0.0}),
    ("pal_vhs_lp_vblend_gated", 1, 5,
     {"ntsc": False, "vhs": True, "speed": 1}),
]


@pytest.mark.parametrize("name,field,fieldno,cfg",
                         GEN2_CASES, ids=[c[0] for c in GEN2_CASES])
def test_gen2_composite_layer_matches_oracle(name, field, fieldno, cfg):
    rgb = _rand_rgb(zlib.crc32(name.encode()) & 0xFFFF)
    got = ref_extract.run_gen2(rgb, field, fieldno, **cfg)
    want = _oracle_gen2(rgb, field, fieldno, cfg)
    np.testing.assert_array_equal(got[field::2], want[field::2], err_msg=name)


# ------------------------------------------------------------------- gen-1

def _oracle_gen1(y, u, v, field, fieldno, cfg):
    """Mirror ffmpeg_to_composite.cpp composite_video_process's order on
    field rows ([L, W] luma, [L, W/2] chroma, u8 semantics)."""
    wy = y[field::2].astype(np.int64)
    wu = u[field::2].astype(np.int64)
    wv = v[field::2].astype(np.int64)
    ps = cfg.get("scp", 180)
    po = cfg.get("scpo", 0)
    ntsc = cfg.get("ntsc", True)
    amp = cfg.get("amp", 50)
    amp_back = cfg.get("amp_back", 50)

    if cfg.get("in_lowpass", True):
        wu, wv = ref.chroma_lowpass_yuv(wu, wv, ntsc=ntsc)
    wy, wu, wv = ref.yuv_to_ntsc(wy, wu, wv, fieldno, field, amp, ps, po,
                                 ntsc=ntsc,
                                 nocolor=cfg.get("nocolor_subcarrier", False))
    if cfg.get("preemphasis", 0):
        wy = ref.preemphasis_yuv(wy, cfg["preemphasis"],
                                 cfg.get("preemphasis_cut", 1000000.0))
    if cfg.get("hs", False):
        wy = ref.head_switching(wy, field, cfg["hs_phase"], cfg["hs_phase"],
                                0.0, ntsc=ntsc, fill=16)
    if not cfg.get("nocolor_subcarrier", False):
        wy, wu, wv = ref.ntsc_to_yuv(
            wy, wu, wv, fieldno, field, amp_back, ps, po, ntsc=ntsc,
            nocolor_after_sep=cfg.get("nocolor_after", False))
    if cfg.get("vhs", False):
        luma_cut, chroma_cut, delay, _ = VHS_TABLE[cfg.get("speed", 0)]
        wy = ref.vhs_luma_lowpass_yuv(wy, luma_cut)
        wu, wv = ref.vhs_chroma_lowpass_yuv(wu, wv, chroma_cut, delay)
        if cfg.get("vblend", True) and ntsc:
            wu, wv = ref.vhs_chroma_vert_blend_yuv(wu, wv)
        wy = ref.vhs_sharpen_luma_yuv(wy, luma_cut, cfg.get("sharpen", 1.5))
        wu, wv = ref.vhs_sharpen_chroma_yuv(
            wu, wv, chroma_cut, cfg.get("sharpen_chroma", 0.85))
        if not cfg.get("svideo", False):
            wy, wu, wv = ref.yuv_to_ntsc(wy, wu, wv, fieldno, field, amp,
                                         ps, po, ntsc=ntsc)
            wy, wu, wv = ref.ntsc_to_yuv(wy, wu, wv, fieldno, field, amp,
                                         ps, po, ntsc=ntsc)
    for _ in range(cfg.get("yc_recombine", 0)):
        wy, wu, wv = ref.yuv_to_ntsc(wy, wu, wv, fieldno, field, amp,
                                     ps, po, ntsc=ntsc)
        wy, wu, wv = ref.ntsc_to_yuv(wy, wu, wv, fieldno, field, amp,
                                     ps, po, ntsc=ntsc)
    if cfg.get("out_lowpass", True):
        wu, wv = ref.chroma_lowpass_yuv(wu, wv, ntsc=ntsc)
    elif cfg.get("out_lowpass_lite", True):
        wu, wv = ref.chroma_lowpass_yuv(wu, wv, ntsc=ntsc, lite=True)

    oy, ou, ov = y.copy(), u.copy(), v.copy()
    oy[field::2] = wy.astype(np.uint8)
    ou[field::2] = wu.astype(np.uint8)
    ov[field::2] = wv.astype(np.uint8)
    return oy, ou, ov


GEN1_CASES = [
    ("defaults", 0, 0, {}),
    ("field1", 1, 5, {}),
    ("phase90_amps", 0, 3, {"scp": 90, "amp": 40, "amp_back": 60}),
    ("preemphasis_no_in_lp", 1, 1,
     {"preemphasis": 2.5, "preemphasis_cut": 900000.0, "in_lowpass": False}),
    ("vhs_sp", 0, 2, {"vhs": True, "speed": 0}),
    ("vhs_ep_svideo", 1, 6,
     {"vhs": True, "speed": 2, "svideo": True, "vblend": False}),
    # on-raster for H=24 only for phase in ~[0.0838, 0.1295) (see GEN2)
    ("head_switching", 0, 4,
     {"hs": True, "hs_phase": 0.1, "hs_phase_noise": 0.0}),
    ("yc_recombine_outlite", 0, 1,
     {"yc_recombine": 2, "out_lowpass": False, "out_lowpass_lite": True}),
    # ---- PAL (ffmpeg_to_composite.cpp:456-459 xi=(fieldno+y)&3; :366-431
    # PAL chroma lowpass single-branch; :859 vblend NTSC-only gate; :682-691
    # 312.5-line head-switch raster) ----
    ("pal_defaults", 0, 3, {"ntsc": False}),
    ("pal_field1_amps", 1, 2, {"ntsc": False, "amp": 45, "amp_back": 55}),
    # vblend left True: the reference gates it off for PAL — pinned here
    ("pal_vhs_lp_vblend_gated", 0, 5,
     {"ntsc": False, "vhs": True, "speed": 1}),
    # on-raster for the PAL raster: yy = 2*int(p*312.5/1)*... - 48 + parity;
    # phase 0.1 lands the bar at row 14 of this 24-line frame
    ("pal_head_switching", 0, 4,
     {"ntsc": False, "hs": True, "hs_phase": 0.1, "hs_phase_noise": 0.0}),
    ("pal_yc_recombine", 1, 7, {"ntsc": False, "yc_recombine": 1}),
]


@pytest.mark.parametrize("name,field,fieldno,cfg",
                         GEN1_CASES, ids=[c[0] for c in GEN1_CASES])
def test_gen1_composite_video_process_matches_oracle(name, field, fieldno,
                                                     cfg):
    y, u, v = _rand_yuv(zlib.crc32(name.encode()) & 0xFFFF)
    run_cfg = dict(cfg)
    run_cfg.setdefault("hs_phase_noise", 0.0)   # keep rand() out of the loop
    gy, gu, gv = ref_extract.run_gen1(y, u, v, field, fieldno, **run_cfg)
    wy, wu, wv = _oracle_gen1(y, u, v, field, fieldno, cfg)
    np.testing.assert_array_equal(gy[field::2], wy[field::2], err_msg=name)
    np.testing.assert_array_equal(gu[field::2], wu[field::2], err_msg=name)
    np.testing.assert_array_equal(gv[field::2], wv[field::2], err_msg=name)


def test_gen1_row_end_quirk():
    """Document the Y[x+2] row-end overread (module docstring): with the
    next row's first luma pixels != 16, the reference's output differs from
    the oracle's pad-16 model only in a bounded tail of each row."""
    y, u, v = _rand_yuv(99, pin16=False)
    y[:, :2] = 200   # make the bleed visible
    gy, gu, gv = ref_extract.run_gen1(y, u, v, 0, 0, hs_phase_noise=0.0)
    wy, wu, wv = _oracle_gen1(y, u, v, 0, 0, {})
    dy = np.argwhere(gy[0::2] != wy[0::2])
    du = np.argwhere(gu[0::2] != wu[0::2])
    assert dy.size or du.size, "expected the overread to be visible"
    # luma diffs confined to the last 2+delay columns (box blur window +
    # out-lowpass delay); chroma to the trailing half-res columns
    assert dy[:, 1].min() >= W - 8
    if du.size:
        assert du[:, 1].min() >= W // 2 - 8


def test_gen1_black_key_pair_chroma_order():
    """The odd sample of a pair must be keyed against the chroma AFTER the
    even sample's keying replaced it (black_key wchroma order, :989-990) —
    crafted so the decisions differ: even keyed (Y=16, U=V=128), filter
    chroma far from neutral, odd Y=35 near threshold."""
    from cvsim_tpu.models import yuv422
    import jax.numpy as jnp

    h, w = 2, 8
    y = np.full((h, w), 200, np.uint8); y[0, 0] = 16; y[0, 1] = 35
    u = np.full((h, w // 2), 128, np.uint8)
    v = np.full((h, w // 2), 128, np.uint8)
    fy = np.full((h, w), 99, np.uint8)
    fu = np.full((h, w // 2), 20, np.uint8)
    fv = np.full((h, w // 2), 20, np.uint8)
    level = 12
    got = ref_extract.run_gen1_blackkey(y, u, v, fy, fu, fv, 0, 0, level)
    (oy, ou, ov), _ = yuv422.black_key_feedback(
        jnp.asarray(y[0::2], jnp.int32), jnp.asarray(u[0::2], jnp.int32),
        jnp.asarray(v[0::2], jnp.int32), jnp.asarray(fy[0::2], jnp.int32),
        jnp.asarray(fu[0::2], jnp.int32), jnp.asarray(fv[0::2], jnp.int32),
        level)
    assert np.asarray(oy)[0, 0] == 99     # even keyed
    assert np.asarray(oy)[0, 1] == 35     # odd NOT keyed (sees filter chroma)
    np.testing.assert_array_equal(got[0][0::2], np.asarray(oy, np.uint8))
    np.testing.assert_array_equal(got[1][0::2], np.asarray(ou, np.uint8))
    np.testing.assert_array_equal(got[2][0::2], np.asarray(ov, np.uint8))


def test_gen1_black_key_feedback_matches_oracle():
    from cvsim_tpu.models import yuv422
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    y, u, v = _rand_yuv(3, pin16=False)
    # bias a band toward the key threshold so pair-order effects fire:
    # dark luma + neutral chroma keys the even sample, and odd samples sit
    # near the boundary where the replaced filter chroma flips the decision
    y[:, : y.shape[1] // 2] = rng.integers(16, 48, (y.shape[0],
                                                    y.shape[1] // 2))
    u[:, : u.shape[1] // 2] = rng.integers(120, 137, (u.shape[0],
                                                      u.shape[1] // 2))
    v[:, : v.shape[1] // 2] = rng.integers(120, 137, (v.shape[0],
                                                      v.shape[1] // 2))
    fy = rng.integers(0, 256, size=y.shape).astype(np.uint8)
    fu = rng.integers(0, 256, size=u.shape).astype(np.uint8)
    fv = rng.integers(0, 256, size=v.shape).astype(np.uint8)
    level = 12
    got = ref_extract.run_gen1_blackkey(y, u, v, fy, fu, fv, 0, 0, level)
    (oy, ou, ov), (nfy, nfu, nfv) = yuv422.black_key_feedback(
        jnp.asarray(y[0::2], jnp.int32), jnp.asarray(u[0::2], jnp.int32),
        jnp.asarray(v[0::2], jnp.int32), jnp.asarray(fy[0::2], jnp.int32),
        jnp.asarray(fu[0::2], jnp.int32), jnp.asarray(fv[0::2], jnp.int32),
        level)
    np.testing.assert_array_equal(got[0][0::2], np.asarray(oy, np.uint8))
    np.testing.assert_array_equal(got[1][0::2], np.asarray(ou, np.uint8))
    np.testing.assert_array_equal(got[2][0::2], np.asarray(ov, np.uint8))
    np.testing.assert_array_equal(got[3][0::2], np.asarray(nfy, np.uint8))
    np.testing.assert_array_equal(got[4][0::2], np.asarray(nfu, np.uint8))
    np.testing.assert_array_equal(got[5][0::2], np.asarray(nfv, np.uint8))


def test_gen2_head_switch_negative_point_tall_raster():
    """hs_point=-0.01 must produce NO bar (the unsigned-cast wrap puts the
    switch line off-raster). A positive-mod reading would land the bar near
    row 475 of a 480-line frame, so the tall raster makes the distinction
    observable — pinned against the compiled reference."""
    rgb = _rand_rgb(101, h=480, w=W)
    cfg = {"hs": True, "hs_point": -0.01, "hs_phase": 0.17,
           "hs_phase_noise": 0.0}
    got = ref_extract.run_gen2(rgb, 0, 3, **cfg)
    want = _oracle_gen2(rgb, 0, 3, cfg)
    np.testing.assert_array_equal(got[0::2], want[0::2])


# ------------------------------------------------------------------- audio

AUDIO_CASES = [
    # (name, channels, rate, cfg-for-ref, kwargs-for-oracle)
    ("hifi_stereo_defaults", 2, 44100, {}, {}),
    ("hifi_no_emphasis", 2, 44100,
     {"preemph": False, "deemph": False},
     {"preemph": False, "deemph": False}),
    ("linear_sp_mono", 1, 44100,
     {"hifi": False, "highpass": 100.0, "lowpass": 10000.0},
     {"vhs_hifi": False, "highpass_hz": 100.0, "lowpass_hz": 10000.0,
      "pre_cut": 8000.0}),
    ("linear_ep_mono", 1, 44100,
     {"hifi": False, "highpass": 100.0, "lowpass": 4000.0},
     {"vhs_hifi": False, "highpass_hz": 100.0, "lowpass_hz": 4000.0,
      "pre_cut": 8000.0}),
    # PAL buzz timing: hsync 15625 Hz, 625 lines, vpulse<12, hpulse 4.0us
    ("linear_pal_stereo", 2, 48000,
     {"hifi": False, "ntsc": False, "highpass": 100.0, "lowpass": 10000.0},
     {"vhs_hifi": False, "ntsc": False, "highpass_hz": 100.0,
      "lowpass_hz": 10000.0, "pre_cut": 8000.0}),
    # loud buzz + hot input drives the +-1.0 analog clip
    ("linear_loud_buzz_clip", 1, 22050,
     {"hifi": False, "buzz_db": -6.0, "highpass": 100.0, "lowpass": 10000.0},
     {"vhs_hifi": False, "buzz_db": -6.0, "highpass_hz": 100.0,
      "lowpass_hz": 10000.0, "pre_cut": 8000.0}),
    # boost off, asymmetric emphasis (pre on / de off)
    ("linear_boost_off_pre_only", 2, 44100,
     {"hifi": False, "boost": 0.0, "deemph": False,
      "highpass": 100.0, "lowpass": 7000.0},
     {"vhs_hifi": False, "high_boost": 0.0, "deemph": False,
      "highpass_hz": 100.0, "lowpass_hz": 7000.0, "pre_cut": 8000.0}),
]


@pytest.mark.parametrize("name,channels,rate,rcfg,ocfg", AUDIO_CASES,
                         ids=[c[0] for c in AUDIO_CASES])
def test_audio_chain_matches_reference(name, channels, rate, rcfg, ocfg):
    """composite_audio_process (ffmpeg_to_composite.cpp:558-627) compiled
    from the reference vs the scalar oracle, bit-exact on int16 output.
    hiss_db=-300 truncates output_audio_hiss_level to 0 (:1629), keeping
    libc rand() out of the loop; everything else is deterministic doubles,
    including the interleaved-stream pre/deemphasis quirk and the
    16x-oversampled sync buzz."""
    rng = np.random.default_rng(zlib.crc32(name.encode()) & 0xFFFF)
    loud = 30000 if "clip" in name else 24000
    s = rng.integers(-loud, loud, size=(512, channels)).astype(np.int16)
    got = ref_extract.run_audio(s, rate, hiss_db=-300.0, **rcfg)
    okw = dict(ocfg)
    okw.setdefault("highpass_hz", 20.0)
    okw.setdefault("lowpass_hz", 20000.0)
    want = ref.audio_chain_scalar(
        s.astype(np.int64), rate, channels,
        okw.pop("lowpass_hz"), okw.pop("highpass_hz"), hiss_level=0, **okw)
    np.testing.assert_array_equal(got.astype(np.int64), want, err_msg=name)


CASSETTE_PRESETS = {   # ffmpeg_cassette.cpp:521-556: lowpass, highpass, waver, tilt
    0: (16000.0, 100.0, 0.55, 3.5),
    1: (14000.0, 100.0, 0.6, 6.0),
    2: (10000.0, 100.0, 0.5, 3.0),
    3: (16000.0, 20.0, 0.75, 10.0),
    4: (16000.0, 20.0, 0.25, 1.1),
}

CASSETTE_CASES = [
    # (name, channels, rate, preset-or-None, mono, extra-ref, extra-oracle)
    ("cassette_defaults", 2, 44100, None, False, {}, {}),
    ("cassette_preset0", 2, 44100, 0, False, {}, {}),
    ("cassette_preset1_mono", 2, 44100, 1, True, {}, {}),
    ("cassette_preset2_mono", 2, 48000, 2, True, {}, {}),
    ("cassette_preset3_worst", 2, 44100, 3, False, {}, {}),
    ("cassette_preset4_best", 2, 22050, 4, False, {}, {}),
    ("cassette_no_emphasis", 2, 44100, 0, False,
     {"preemph": False, "deemph": False},
     {"preemph": False, "deemph": False}),
    ("cassette_1ch", 1, 44100, 2, False, {}, {}),
]


@pytest.mark.parametrize("name,channels,rate,preset,mono,rcfg,ocfg",
                         CASSETTE_CASES, ids=[c[0] for c in CASSETTE_CASES])
def test_cassette_chain_matches_reference(name, channels, rate, preset, mono,
                                          rcfg, ocfg):
    """ffmpeg_cassette.cpp composite_audio_process (:334-416) compiled from
    the reference vs the scalar oracle, bit-exact on int16 output: the
    per-sample-rebuilt triangular head-tilt FIR with sinusoidal waver and
    per-channel +-lr_delay skew, the 4 kHz pre/deemphasis (interleaved-stream
    quirk), the mono downmix's truncating (a+b)/2, all 5 presets."""
    rng = np.random.default_rng(zlib.crc32(name.encode()) & 0xFFFF)
    s = rng.integers(-24000, 24000, size=(400, channels)).astype(np.int16)
    lowpass, highpass, waver, tilt = (
        CASSETTE_PRESETS[preset] if preset is not None
        else (20000.0, 20.0, 0.5, 0.2))
    got = ref_extract.run_cassette(
        s, rate, hiss_db=-300.0, lowpass=lowpass, highpass=highpass,
        waver=waver, head_tilt=tilt, mono=mono, **rcfg)
    want = ref.cassette_chain_scalar(
        s.astype(np.int64), rate, channels, lowpass, highpass,
        head_tilt=tilt, head_tilt_waver=waver, pre_cut=4000.0,
        hiss_level=0, mono_downmix=mono, **ocfg)
    np.testing.assert_array_equal(got.astype(np.int64), want, err_msg=name)


# -------------------------------------------------------------- pixel tools

def _rand_rgb_pair(seed, h=32, w=48):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8),
            rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8))


@pytest.mark.parametrize("thr", [1, 3, 7])
def test_posterize_matches_reference(thr):
    """ffmpeg_posterize.cpp:789-813: bitwise AND mask — both the jax op and
    the host-numpy twin, bit-exact."""
    from cvsim_tpu.models import tools, tools_np

    rgb, _ = _rand_rgb_pair(thr)
    got = ref_extract.run_posterize(rgb, thr)
    np.testing.assert_array_equal(
        got, np.asarray(tools.posterize(rgb, thr), np.uint8))
    np.testing.assert_array_equal(got, tools_np.posterize(rgb, thr))


def test_colormap_matches_reference():
    """ffmpeg_colormap.cpp:785-822: 256-entry LUT from the map's middle
    scanline, indexed by the green channel."""
    from cvsim_tpu.models import tools, tools_np

    map_rgb, rgb = _rand_rgb_pair(7, h=20, w=100)   # map width != 256
    got = ref_extract.run_colormap(map_rgb, rgb)
    lut = tools.take_colormap(map_rgb)
    np.testing.assert_array_equal(
        got, np.asarray(tools.colormap_apply(rgb, lut), np.uint8))
    np.testing.assert_array_equal(
        got, tools_np.colormap_apply(rgb, lut).astype(np.uint8))


COLORKEY_CASES = [
    ("basic", {"color": (0, 255, 0), "threshhold": 90}),
    ("invert", {"color": (10, 200, 30), "threshhold": 120, "invert": True}),
    ("fade", {"color": (0, 255, 0), "threshhold": 90, "fade": 64}),
    ("xdivr", {"color": (0, 255, 0), "threshhold": 90, "xdivr": 5}),
    ("xdivr_fade_inv", {"color": (200, 40, 40), "threshhold": 150,
                        "xdivr": 3, "fade": 128, "invert": True}),
]


@pytest.mark.parametrize("name,kw", COLORKEY_CASES,
                         ids=[c[0] for c in COLORKEY_CASES])
def test_colorkey_matches_reference(name, kw):
    """ffmpeg_colorkey.cpp:832-887: |dR|+|dG|+|dB| key vs threshold with
    -inv/-f fade/-xd held decisions (noise off: rand())."""
    from cvsim_tpu.models import tools, tools_np
    import jax

    dst, src = _rand_rgb_pair(zlib.crc32(name.encode()) & 0xFFFF)
    # make keying actually fire: paint regions near the key color
    src[4:12, 6:30] = np.asarray(kw["color"], np.uint8)
    src[5:9, 8:20] += 3   # near-key jitter straddles the threshold
    r, g, b = kw["color"]
    packed = (r << 16) | (g << 8) | b
    got = ref_extract.run_colorkey(
        dst, src, color=packed, threshhold=kw["threshhold"],
        invert=kw.get("invert", False), fade=kw.get("fade", 0),
        xdivr=kw.get("xdivr", 1))
    key = jax.random.PRNGKey(0)
    jout = tools.colorkey_apply(
        dst.astype(np.int32), src.astype(np.int32), key, color=kw["color"],
        threshhold=kw["threshhold"], invert=kw.get("invert", False),
        noisekey=0, fade=kw.get("fade", 0), xdivr=kw.get("xdivr", 1))
    np.testing.assert_array_equal(got, np.asarray(jout, np.uint8),
                                  err_msg=name)
    nout = tools_np.colorkey_apply(
        dst.astype(np.int64), src.astype(np.int64), key, color=kw["color"],
        threshhold=kw["threshhold"], invert=kw.get("invert", False),
        noisekey=0, fade=kw.get("fade", 0), xdivr=kw.get("xdivr", 1))
    np.testing.assert_array_equal(got, nout.astype(np.uint8), err_msg=name)


@pytest.mark.parametrize("field,delay,newlevel",
                         [(0, 1, 128), (7, 3, 40), (11, 2, 255), (5, 1, 0)])
def test_average_delay_matches_reference(field, delay, newlevel):
    """ffmpeg_average_delay.cpp:801-838: temporal blend with the ordered
    dither ((x^y)+field/delay)&3."""
    from cvsim_tpu.models import tools, tools_np

    dst, src = _rand_rgb_pair(field * 31 + delay)
    got = ref_extract.run_average_delay(dst, src, field, delay, newlevel)
    jout = tools.average_delay_blend(
        dst.astype(np.int32), src.astype(np.int32), field,
        newlevel=newlevel, delay=delay)
    np.testing.assert_array_equal(got, np.asarray(jout, np.uint8))
    nout = tools_np.average_delay_blend(
        dst.astype(np.int64), src.astype(np.int64), field,
        newlevel=newlevel, delay=delay)
    np.testing.assert_array_equal(got, nout.astype(np.uint8))


# ----------------------------------------------------------- restore tools

def _vhs_capture_frame(seed, h=40, w=64):
    """Synthesize a jittered VHS capture: per line, a dark left margin of
    varying width (blackish vs the line's first pixel) then bright content."""
    rng = np.random.default_rng(seed)
    f = rng.integers(0, 12, size=(h, w, 3)).astype(np.uint8)   # blackish base
    for y in range(h):
        m = max(0, int(4 + 6 * np.sin(y * 0.7)) + int(rng.integers(0, 3)))
        if y % 11 == 10:
            continue                    # an all-blackish line: no 9-run
        f[y, m:] = rng.integers(60, 256, size=(w - m, 3))
    return f


@pytest.mark.parametrize("name,frame", [
    ("jitter", _vhs_capture_frame(3)),
    ("random", _rand_rgb(17, h=32, w=48)),
    ("tiny", _rand_rgb(23, h=6, w=32)),        # h<9: box smoothing inert
], ids=["jitter", "random", "tiny"])
def test_vhsled_matches_reference(name, frame):
    """ffmpeg_vhsled.cpp:866-928: first 9-run of non-blackish pixels per line
    (blackish compares every channel against the first pixel's BLUE byte —
    the un-shifted `r` at :686), 9-line box smoothing, left shift with the
    original tail kept."""
    from cvsim_tpu.models import restore, tools_np

    got = ref_extract.run_vhsled(frame)
    jout = restore.vhsled_dejitter(frame)
    np.testing.assert_array_equal(got, np.asarray(jout, np.uint8),
                                  err_msg=name)
    nout = tools_np.vhsled_dejitter(frame)
    np.testing.assert_array_equal(got, nout.astype(np.uint8), err_msg=name)


FRAMEBLEND_CASES = [
    # (name, frame_t spacing per source frame, current, kwargs)
    ("basic", 0.8, 0, {}),
    ("mid", 0.8, 2, {}),
    ("framealt2", 0.45, 2, {"framealt": 2}),
    ("ffa", 0.45, 2, {"framealt": 2, "fullframealt": True}),
    ("squelch", 0.995, 0, {"squelch": True}),      # sq=0.25 rescale branch
    ("squelch_hard", 1.0005, 0, {"squelch": True}),  # sq<=0.01 hard cut
    ("gamma", 0.8, 1, {"gamma": 2.2}),
    ("fallback", None, 0, {}),                     # no overlap -> cutoff frame
]


@pytest.mark.parametrize("name,spacing,current,kw", FRAMEBLEND_CASES,
                         ids=[c[0] for c in FRAMEBLEND_CASES])
def test_frameblend_matches_reference(name, spacing, current, kw):
    """frameblend.cpp:929-1081: overlap-weighted temporal cross-blend in
    16.16 fixed point, -fa/-ffa alternate-frame stepping, near-rate squelch,
    gamma-linear blend through the 256->8192 LUTs."""
    from cvsim_tpu.models import restore, tools_np

    k = 6
    rng = np.random.default_rng(zlib.crc32(name.encode()) & 0xFFFF)
    frames = rng.integers(0, 256, size=(k, 20, 24, 3)).astype(np.uint8)
    if spacing is None:
        frame_t = [5.0 + i for i in range(k)]      # all past [0,1): fallback
    else:
        frame_t = [i * spacing for i in range(k)]
    gamma = kw.pop("gamma", -1.0)
    got = ref_extract.run_frameblend(frames, frame_t, current,
                                     gamma=gamma, **kw)
    gdec = genc = None
    if gamma > 1:
        gdec, genc = restore.gamma_tables(gamma)
    w16, _cutoff = restore.frameblend_weights(frame_t, current, **kw)
    used = frames[[i for i, _ in w16]]
    jout = restore.frameblend_mix(used, w16, gdec, genc)
    np.testing.assert_array_equal(got, np.asarray(jout, np.uint8),
                                  err_msg=name)
    nout = tools_np.frameblend_mix(used, w16, gdec, genc)
    np.testing.assert_array_equal(got, nout.astype(np.uint8), err_msg=name)


@pytest.mark.parametrize("name,h,w,gamma", [
    ("plain_multiblock", 150, 200, -1.0),   # 2x2 block grid, x-clip at w
    ("plain_small", 40, 100, -1.0),
    ("gamma", 40, 200, 2.2),
], ids=["plain_multiblock", "plain_small", "gamma"])
def test_filmac_matches_reference(name, h, w, gamma):
    """filmac.cpp:857-1009: per-frame 128x128 block scan (block-mean of the
    channel-min, per-pixel channel-max that reads past maxx to the last
    block's end), asymmetric temporal level IIR carried across frames,
    16.16 linear rescale; optional gamma-linear domain."""
    from cvsim_tpu.models import restore, tools_np

    rng = np.random.default_rng(zlib.crc32(name.encode()) & 0xFFFF)
    # brightness ramps up then down so both IIR branches (fast avg/2 and
    # slow 4:1) fire for min and max
    seq = np.stack([
        np.clip(rng.integers(0, 256, size=(h, w, 3)) * s // 256, lo, 255)
        for s, lo in ((140, 20), (255, 0), (90, 40), (200, 10))
    ]).astype(np.uint8)
    got = ref_extract.run_filmac(seq, gamma)

    gdec = genc = None
    if gamma > 1:
        gdec, genc = restore.gamma_tables(gamma)
    st_j = restore.FilmacState()
    st_n = restore.FilmacState()
    for fi in range(seq.shape[0]):
        minv, maxv, scaleto = restore.filmac_measure(seq[fi], gdec)
        restore.filmac_update_levels(st_j, minv, maxv)
        jout = restore.filmac_rescale(seq[fi], st_j, scaleto, gdec, genc)
        np.testing.assert_array_equal(
            got[fi], np.asarray(jout, np.uint8), err_msg=f"{name} jax f{fi}")

        minv2, maxv2, scaleto2 = tools_np.filmac_measure(seq[fi], gdec)
        assert (minv2, maxv2, scaleto2) == (minv, maxv, scaleto), name
        restore.filmac_update_levels(st_n, minv2, maxv2)
        nout = tools_np.filmac_rescale(seq[fi], st_n, scaleto2, gdec, genc)
        np.testing.assert_array_equal(
            got[fi], nout.astype(np.uint8), err_msg=f"{name} np f{fi}")


# ------------------------------------------------------------- scanimate

@pytest.mark.parametrize("fieldno,field,ntsc", [
    (10, 0, True),     # effect 0: trapezoid
    (190, 1, True),    # effect 1: vertical rotate
    (370, 0, True),    # effect 2: vertical stretch
    (550, 1, True),    # effect 3: sin diffuse
    (25, 0, False),    # monochrome camera: ystep=1, y0=0
], ids=["trapezoid", "vrotate", "vstretch", "diffuse", "mono"])
def test_scanimate_matches_reference(fieldno, field, ntsc):
    """ffmpeg_scanimate.cpp:894-974: CRT phosphor-dot re-render — warp
    effects cycling every 180 fields, cone-falloff dot splat with integer
    truncation per dot, >>PRECISION pack, rows below `field` keeping the
    previous canvas.

    The production splat runs float32 (device path); the reference is
    double. Dot values are trunc(fv*255), so a 1-ulp fv difference at an
    integer boundary flips a single count: tolerance is max diff 1 with
    <0.1% of pixels differing (measured ~0.02%). Bit-exactness of the
    splat itself is pinned separately in test_scanimate_splat.py."""
    from cvsim_tpu.models import tools
    import jax.numpy as jnp

    rng = np.random.default_rng(fieldno)
    src = rng.integers(0, 256, (64, 96, 3)).astype(np.uint8)
    ref_out = ref_extract.run_scanimate(src, 144, 192, field, fieldno, ntsc)
    raster = np.asarray(tools.scanimate_field(
        jnp.asarray(src, jnp.int32), 144, 192, field, fieldno,
        input_ntsc=ntsc))
    exp = np.full((144, 192, 3), 0x20, np.int64)
    exp[field:] = np.clip(raster, 0, 255)[field:, :, None]
    d = np.abs(ref_out.astype(np.int64) - exp)
    assert d.max() <= 1, d.max()
    assert (d > 0).mean() <= 1e-3, (d > 0).mean()
    # the canvas quirk rows must be untouched exactly
    np.testing.assert_array_equal(ref_out[:field], exp[:field])


# ------------------------------------------------------------- raw28ntsc

def _raw28_rl():
    from cvsim_tpu.models.raw28 import RawTiming, rate_preset
    return RawTiming(rate_preset("ntsc28")).raw_length


def _raw28_capture_clean(n_fields=4, seed=42):
    """Clean NTSC-ish capture: 12 serration pulses then 262 lines of
    hsync + ramp + 8-sample chroma ripple + small noise."""
    rl = _raw28_rl()
    rng = np.random.default_rng(seed)
    out = []
    hsync_len = int(rl * 0.09)
    for _ in range(n_fields):
        for _ in range(12):
            half = np.full(rl // 2, 70, np.uint8)
            half[: int(rl * 0.05)] = 10
            out.append(half)
        for line in range(262):
            row = np.full(rl, 70, np.uint8)
            row[:hsync_len] = 10
            a0 = hsync_len + int(rl * 0.06)
            n = rl - a0 - 8
            x = np.arange(n)
            seg = (80 + 150 * x / n + 12 * np.sin(2 * np.pi * x / 8 + line)
                   + rng.integers(-3, 4, n))
            row[a0:a0 + n] = np.clip(seg, 0, 255).astype(np.uint8)
            out.append(row)
    return np.concatenate(out)


def _raw28_capture_jittery(n_fields=4, seed=3):
    """Line-length jitter (+-6 samples), slow DC drift, gaussian noise:
    stresses the per-line re-lock, fractional pacing, DC tracker, AGC."""
    rl = _raw28_rl()
    rng = np.random.default_rng(seed)
    out = []
    hsync_len = int(rl * 0.09)
    t = 0
    for _ in range(n_fields):
        for _ in range(12):
            half = np.full(rl // 2, 70, np.uint8)
            half[: int(rl * 0.05)] = 10
            out.append(half)
        for line in range(262):
            ll = rl + int(rng.integers(-6, 7))
            drift = 8.0 * np.sin(2 * np.pi * (t / (rl * 262 * 2.0)))
            t += ll
            row = np.full(ll, 70, np.float64)
            row[:hsync_len] = 10
            a0 = hsync_len + int(rl * 0.06)
            n = ll - a0 - 8
            x = np.arange(n)
            row[a0:a0 + n] = (80 + 110 * x / n
                              + 14 * np.sin(2 * np.pi * x / 8 + 0.3 * line))
            row += drift + rng.normal(0, 2.0, ll)
            out.append(np.clip(row, 0, 255).astype(np.uint8))
    return np.concatenate(out)


RAW28_CASES = [
    ("clean", "clean", ()),
    ("jittery", "jittery", ()),
    ("noequ", "clean", ("noequ",)),
    ("nowequ", "clean", ("nowequ",)),
    ("nosc", "clean", ("nosc",)),
    ("showsc", "clean", ("showsc",)),
    ("marksig", "clean", ("marksig",)),
    ("nosig", "clean", ("nosig",)),
]


@pytest.mark.parametrize("name,capkind,flags", RAW28_CASES,
                         ids=[c[0] for c in RAW28_CASES])
def test_raw28_matches_reference(name, capkind, flags):
    """ffmpeg_raw28ntsc.cpp full decode loop (:625-850, :1012-1034):
    3-pole DC-normalized sync detection, vsync hunt with equalization-pulse
    AGC, per-line hsync re-lock with fractional scanline pacing, float64
    double-truncation equalization, 8x-fsc Y/C separation INCLUDING the
    static int_chroma[] tail leaking across scanlines and fields, and the
    lock+240H read-cursor pacing. Three full fields, bit-exact."""
    from cvsim_tpu.models.raw28 import Raw28Decoder, rate_preset

    cap = (_raw28_capture_clean() if capkind == "clean"
           else _raw28_capture_jittery())
    ref_frames = ref_extract.run_raw28(cap, 3, *flags)
    assert ref_frames.shape[0] == 3
    # reference output is gray triplets
    np.testing.assert_array_equal(ref_frames[..., 0], ref_frames[..., 1])

    kw = {}
    if "noequ" in flags:
        kw["equalize"] = False
    if "nowequ" in flags:
        kw["wp_equalize"] = False
    if "nosig" in flags:
        kw["disable_sync"] = True
    if "nosc" in flags:
        kw["separate_chroma"] = False
    if "showsc" in flags:
        kw["show_subcarrier"] = True
    if "marksig" in flags:
        kw["mark_sync"] = True
    dec = Raw28Decoder(rate_preset("ntsc28"), width=1820, height=262, **kw)
    dec.feed(cap)
    for k in range(3):
        mine = dec.decode_field()
        assert mine is not None, f"{name}: decoder starved at field {k}"
        np.testing.assert_array_equal(
            ref_frames[k][..., 0], mine, err_msg=f"{name} field {k}")
