"""Raw composite decoder tests: synthetic NTSC-ish capture -> locked,
level-calibrated field output; native vs Python DC tracker equivalence."""

import numpy as np
import pytest

from cvsim_tpu.models.raw28 import (
    AGCState,
    Raw28Decoder,
    RawTiming,
    hunt_vsync,
    rate_preset,
    runs_below,
)


RATE = rate_preset("ntsc28")
T = RawTiming(RATE)
RL = T.raw_length

SYNC_TIP = 10
BLANK = 70
WHITE = 230


def synth_capture(n_fields=3, ramp=True):
    """Synthesize a raw composite capture: per field, 12 serration pulses
    (equalization-length) then 262 scanlines of hsync + ramp video.

    Pulse widths are slightly wider than broadcast spec because the decoder's
    3-pole detector lowpass erodes below-threshold run lengths by ~30 samples
    (real captures have analog rise times that offset this)."""
    out = []
    hsync_len = int(RL * 0.09)
    for _ in range(n_fields):
        # vertical blanking: 12 half-line serration pulses (~0.05H low)
        for _ in range(12):
            half = np.full(RL // 2, BLANK, np.uint8)
            half[: int(RL * 0.05)] = SYNC_TIP
            out.append(half)
        for line in range(262):
            row = np.full(RL, BLANK, np.uint8)
            row[:hsync_len] = SYNC_TIP
            active0 = hsync_len + int(RL * 0.06)
            n_active = RL - active0 - 8
            if ramp:
                row[active0:active0 + n_active] = np.linspace(
                    BLANK + 10, WHITE, n_active).astype(np.uint8)
            out.append(row)
    return np.concatenate(out)


def test_runs_below():
    dc = np.array([100, 5, 5, 100, 100, 3, 3, 3, 100], np.uint8)
    s, e = runs_below(dc, 24)
    np.testing.assert_array_equal(s, [1, 5])
    np.testing.assert_array_equal(e, [3, 8])


def test_tracker_native_matches_python():
    from cvsim_tpu.native import HsyncDcTracker

    sig = synth_capture(1)[: RL * 40]
    t1 = HsyncDcTracker(RATE, T.one_scanline_time, T.one_frame_time)
    if t1._native is None:
        pytest.skip("native tracker unavailable in this environment")
    r1, d1 = t1.process(sig)

    t2 = HsyncDcTracker(RATE, T.one_scanline_time, T.one_frame_time)
    t2._native = None
    t2._init_python()
    r2, d2 = t2.process(sig[: RL * 4])  # python path is slow; small slice
    np.testing.assert_array_equal(r1[: RL * 4], r2)
    diff = np.abs(d1[: RL * 4].astype(int) - d2.astype(int))
    assert diff.max() <= 1


def test_decoder_locks_and_recovers_ramp():
    dec = Raw28Decoder(RATE, width=720, height=240)
    dec.feed(synth_capture(4))
    fields = []
    while True:
        f = dec.decode_field()
        if f is None:
            break
        fields.append(f)
    assert len(fields) >= 2
    f = fields[1]  # let AGC settle on the first field
    assert f.shape == (240, 720)
    # active area should show a monotonic ramp on most lines
    mid = f[100, :]
    active = mid[250:700].astype(int)
    assert active[-1] > active[0] + 60, (active[0], active[-1])
    # AGC should have pulled levels toward the synth blank/white
    assert abs(dec.agc.blank_level - BLANK) < 40
    assert dec.agc.white_level > 150


def test_decoder_nosync_mode():
    dec = Raw28Decoder(RATE, width=720, height=240, disable_sync=True)
    dec.feed(synth_capture(2))
    f = dec.decode_field()
    assert f is not None and f.shape == (240, 720)


def test_vsync_hunt_on_synth():
    sig = synth_capture(1)
    from cvsim_tpu.native import HsyncDcTracker
    tr = HsyncDcTracker(RATE, T.one_scanline_time, T.one_frame_time)
    raw, dc = tr.process(sig)
    agc = AGCState()
    lock = hunt_vsync(dc, raw, RL, agc)
    assert lock is not None
    # lock should land shortly after the 12 serration pulses
    assert lock < RL * 20


def synth_color_capture(n_fields=3, u0=20.0, v0=-12.0, burst_amp=15.0):
    """Synthetic capture with colorburst + constant (U,V) color. Carrier is
    exactly 8 samples/cycle; phase is counted from the line start so the
    burst and active color share one reference."""
    out = []
    hsync_len = int(RL * 0.09)
    p = np.arange(RL)
    cu = np.cos(2 * np.pi * p / 8)
    sv = np.sin(2 * np.pi * p / 8)
    bs, be = int(RL * 0.095), int(RL * 0.14)
    a0 = int(RL * 0.18)
    for _ in range(n_fields):
        for _ in range(12):
            half = np.full(RL // 2, BLANK, np.float64)
            half[: int(RL * 0.05)] = SYNC_TIP
            out.append(half)
        for line in range(262):
            row = np.full(RL, BLANK, np.float64)
            row[:hsync_len] = SYNC_TIP
            # burst on the -U axis
            row[bs:be] += -burst_amp * cu[bs:be]
            # active: mid luma + constant color
            row[a0:RL - 8] = (BLANK + 80
                              + u0 * cu[a0:RL - 8] + v0 * sv[a0:RL - 8])
            out.append(row)
    return np.clip(np.concatenate(out), 0, 255).astype(np.uint8)


def test_color_decode_recovers_uv():
    """Beyond-reference feature: burst-locked QAM color decode (the
    reference's color path is unfinished; it renders B/W)."""
    from cvsim_tpu.models.raw28 import Raw28Decoder

    u0, v0 = 20.0, -12.0
    dec = Raw28Decoder(RATE, width=720, height=240, decode_color=True)
    dec.feed(synth_color_capture(4, u0=u0, v0=v0))
    results = []
    while True:
        r = dec.decode_field()
        if r is None:
            break
        results.append(r)
    assert len(results) >= 2
    luma, (u, v) = results[1]
    # equalization scales raw units by 255/(white - blank)
    scale = 255.0 / (dec.agc.white_level - dec.agc.blank_level)
    mid_u = u[100, 450:650].mean()
    mid_v = v[100, 450:650].mean()
    exp_u, exp_v = u0 * scale, v0 * scale
    assert abs(mid_u - exp_u) < 0.3 * abs(exp_u) + 3, (mid_u, exp_u)
    assert abs(mid_v - exp_v) < 0.3 * abs(exp_v) + 3, (mid_v, exp_v)
    # luma in the active area is flat (carrier cancelled)
    act = luma[100, 450:650].astype(int)
    assert act.std() < 6, act.std()


def test_mark_sync_paints_pulses():
    from cvsim_tpu.models.raw28 import Raw28Decoder

    dec = Raw28Decoder(RATE, width=720, height=240, mark_sync=True,
                       disable_sync=True)
    dec.feed(synth_capture(2))
    f = dec.decode_field()
    assert f is not None
    # hsync region (leftmost columns of each line) rendered near white
    assert (f[:, :20] > 200).mean() > 0.5


def test_chroma_shift_head_keeps_preshift_values():
    """The renormalizing backward shift (ffmpeg_raw28ntsc.cpp:749-751)
    writes x+16 only: columns 0..15 keep the pre-shift denoised UNDIVIDED
    chroma — so chroma[k] ~ 4*chroma[k+16] at the head, and the head is not
    zero-filled."""
    from cvsim_tpu.models.raw28 import decode_lines

    rng = np.random.default_rng(7)
    x = np.arange(RL + 16)
    carrier = (60 * np.sin(2 * np.pi * x / 8)).astype(np.int32) + 128
    line = np.clip(carrier + rng.integers(-3, 4, RL + 16), 0, 255)
    _, chroma, _ = decode_lines(line[None, :], 0.0, 255.0, raw_len=RL,
                                equalize=False, full_chroma=True)
    ch = np.asarray(chroma)[0]
    assert np.abs(ch[:16]).max() > 0
    np.testing.assert_array_less(np.abs(ch[:16] - 4 * ch[16:32]), 4)
