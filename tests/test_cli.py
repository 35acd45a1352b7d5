"""End-to-end CLI tests: tiny clips through each tool on the CPU mesh."""

import io
import os
from fractions import Fraction

import numpy as np
import pytest

from cvsim_tpu.cli.main import main
from cvsim_tpu.host import wavio, y4m


W, H, FRAMES = 128, 96, 4


def make_clip(path, frames=FRAMES, w=W, h=H, colorspace="420jpeg", seed=0):
    rng = np.random.default_rng(seed)
    hdr = y4m.Y4MHeader(width=w, height=h, fps=Fraction(30000, 1001),
                        colorspace=colorspace)
    with open(path, "wb") as f:
        wr = y4m.Y4MWriter(f, hdr)
        for k in range(frames):
            y = np.full((h, w), 16, np.uint8)
            y[:, (k * 8) % w:(k * 8) % w + 16] = 200   # moving bar
            if colorspace == "422":
                u = rng.integers(100, 156, (h, w // 2), dtype=np.uint8)
                v = rng.integers(100, 156, (h, w // 2), dtype=np.uint8)
            else:
                u = rng.integers(100, 156, (h // 2, w // 2), dtype=np.uint8)
                v = rng.integers(100, 156, (h // 2, w // 2), dtype=np.uint8)
            wr.write(y, u, v)
    return path


def read_all(path):
    with open(path, "rb") as f:
        r = y4m.Y4MReader(f)
        return r.header, list(r)


def test_to_composite_end_to_end(tmp_path):
    src = make_clip(str(tmp_path / "in.y4m"))
    out = str(tmp_path / "out.y4m")
    rc = main(["to-composite", "-i", src, "-o", out,
               "-width", str(W), "-noise", "0"])
    assert rc == 0
    hdr, frames = read_all(out)
    assert hdr.width == W and hdr.height == 480
    assert hdr.fps == Fraction(60000, 1001)
    assert len(frames) == 8  # 4 frames -> 8 fields (bob, progressive)
    # composite artifacts present but structure preserved
    y0 = frames[0][0]
    assert y0.mean() > 10


def test_to_composite_vhs_interlaced(tmp_path):
    src = make_clip(str(tmp_path / "in.y4m"))
    out = str(tmp_path / "out.y4m")
    rc = main(["to-composite", "-i", src, "-o", out, "-width", str(W),
               "-vhs", "-vhs-speed", "ep", "-vi", "-seed", "3"])
    assert rc == 0
    hdr, frames = read_all(out)
    assert hdr.fps == Fraction(30000, 1001)   # interlaced = frame rate
    assert len(frames) == 4


def test_ntsc_tool(tmp_path):
    src = make_clip(str(tmp_path / "in.y4m"))
    out = str(tmp_path / "out.y4m")
    rc = main(["ntsc", "-i", src, "-o", out, "-width", str(W), "-noise", "0"])
    assert rc == 0
    hdr, frames = read_all(out)
    assert len(frames) == 8


def test_posterize(tmp_path):
    src = make_clip(str(tmp_path / "in.y4m"))
    out = str(tmp_path / "out.y4m")
    rc = main(["posterize", "-i", src, "-o", out, "-width", str(W),
               "-threshhold", "3"])
    assert rc == 0
    hdr, frames = read_all(out)
    assert len(frames) == 8


def test_colorkey_and_average_delay(tmp_path):
    src = make_clip(str(tmp_path / "in.y4m"))
    out = str(tmp_path / "k.y4m")
    rc = main(["colorkey", "-i", src, "-o", out, "-width", str(W),
               "-color", "0x101010", "-threshhold", "40", "-f", "16", "-d", "4"])
    assert rc == 0
    _, frames = read_all(out)
    assert len(frames) == 8

    out2 = str(tmp_path / "a.y4m")
    rc = main(["average-delay", "-i", src, "-o", out2, "-width", str(W),
               "-d", "2", "-n", "64"])
    assert rc == 0
    _, frames2 = read_all(out2)
    assert len(frames2) == 8


def test_colormap(tmp_path):
    mp = make_clip(str(tmp_path / "map.y4m"), frames=1, seed=5)
    src = make_clip(str(tmp_path / "in.y4m"))
    out = str(tmp_path / "out.y4m")
    rc = main(["colormap", "-i", mp, "-i", src, "-o", out, "-width", str(W)])
    assert rc == 0
    _, frames = read_all(out)
    assert len(frames) == 8


def test_scanimate(tmp_path):
    src = make_clip(str(tmp_path / "in.y4m"), frames=2, w=64, h=48)
    out = str(tmp_path / "out.y4m")
    rc = main(["scanimate", "-i", src, "-o", out, "-width", "64"])
    assert rc == 0
    _, frames = read_all(out)
    assert len(frames) >= 2
    # phosphor rendering produces nonzero raster
    assert frames[0][0].max() > 0


def test_cassette_cli(tmp_path):
    t = np.arange(8000)
    sine = (9000 * np.sin(2 * np.pi * 880 * t / 44100)).astype(np.int16)
    inp = str(tmp_path / "in.wav")
    outp = str(tmp_path / "out.wav")
    wavio.write_wav(inp, np.stack([sine, sine], -1), 44100)
    rc = main(["cassette", "-i", inp, "-o", outp, "-preset", "2", "-mono"])
    assert rc == 0
    got, rate = wavio.read_wav(outp)
    assert rate == 44100 and len(got) == 8000
    assert np.abs(got).max() > 100   # signal survived
    np.testing.assert_array_equal(got[:, 0], got[:, 1])  # mono downmix


def test_audio_pts_gap_pad_fill(tmp_path):
    """-audio-pts-in closes PTS gaps with silence on the A/V master clock
    (ffmpeg_to_composite.cpp:1892-1915): two 2000-sample packets with a
    1000-sample gap between them come out 5000 samples long with the gap
    silent; a small backward jitter (< rate/30) is held, not duplicated."""
    from cvsim_tpu.host.pipeline import _audio_pad_fill

    t = np.arange(4000)
    sine = (9000 * np.sin(2 * np.pi * 440 * t / 44100)).astype(np.int16)
    ain = str(tmp_path / "a.wav")
    aout = str(tmp_path / "ao.wav")
    wavio.write_wav(ain, np.stack([sine, sine], -1), 44100)
    log = tmp_path / "apts.txt"
    # pkt0 at sample 0 (2000 samples), pkt1 at 3000 -> 1000-sample gap,
    # pkt2 claims pts 3900 (backward jitter vs counter 4000 -> held)
    log.write_text("0 2000\n3000 1000\n3900 1000\n")
    rc = main(["to-composite", "-audio-in", ain, "-audio-out", aout,
               "-audio-pts-in", str(log), "-vhs-hifi", "0"])
    assert rc == 0
    got, rate = wavio.read_wav(aout)
    assert len(got) == 5000

    # engine-level: the inserted region is exactly silence pre-chain
    padded = _audio_pad_fill(
        np.stack([sine, sine], -1).astype(np.int64),
        [(0, 2000), (3000, 1000), (3900, 1000)], 44100)
    assert padded.shape[0] == 5000
    np.testing.assert_array_equal(padded[2000:3000], 0)
    np.testing.assert_array_equal(padded[:2000], np.stack([sine, sine], -1)[:2000])
    np.testing.assert_array_equal(padded[3000:], np.stack([sine, sine], -1)[2000:])


def test_to_composite_audio_sidecar(tmp_path):
    t = np.arange(6000)
    sine = (9000 * np.sin(2 * np.pi * 440 * t / 44100)).astype(np.int16)
    ain = str(tmp_path / "a.wav")
    aout = str(tmp_path / "ao.wav")
    wavio.write_wav(ain, np.stack([sine, sine], -1), 44100)
    rc = main(["to-composite", "-audio-in", ain, "-audio-out", aout,
               "-vhs-hifi", "0"])
    assert rc == 0
    got, rate = wavio.read_wav(aout)
    assert len(got) == 6000
    assert got.shape[1] == 1   # linear VHS audio goes mono


def test_frameblend(tmp_path):
    src = make_clip(str(tmp_path / "in.y4m"), frames=6)
    out = str(tmp_path / "out.y4m")
    rc = main(["frameblend", "-i", src, "-o", out, "-width", str(W),
               "-or", "30000/1001", "-sqnr"])
    assert rc == 0
    _, frames = read_all(out)
    assert len(frames) >= 5


def test_filmac(tmp_path):
    src = make_clip(str(tmp_path / "in.y4m"))
    out = str(tmp_path / "out.y4m")
    rc = main(["filmac", "-i", src, "-o", out, "-width", str(W),
               "-gamma", "vga"])
    assert rc == 0
    _, frames = read_all(out)
    # one output frame per input frame (filmac.cpp:842-851) — the
    # reference never duplicates frames to the field rate
    assert len(frames) == 4
    # AGC should stretch contrast: output luma range wider than input's
    y = frames[-1][0].astype(int)
    assert y.max() - y.min() >= 150


def test_vhsled(tmp_path):
    # frame with a black left margin that varies per line
    from cvsim_tpu.host import y4m as y4mmod
    from fractions import Fraction as Fr
    hdr = y4mmod.Y4MHeader(width=W, height=H, fps=Fr(30000, 1001))
    src = str(tmp_path / "in.y4m")
    rng = np.random.default_rng(0)
    with open(src, "wb") as f:
        wr = y4mmod.Y4MWriter(f, hdr)
        for _ in range(2):
            y = np.full((H, W), 16, np.uint8)
            for row in range(H):
                margin = 12 + (row % 5)
                y[row, margin:] = 180
            u = np.full((H // 2, W // 2), 128, np.uint8)
            wr.write(y, u, u)
    out = str(tmp_path / "out.y4m")
    rc = main(["vhsled", "-i", src, "-o", out, "-width", str(W)])
    assert rc == 0
    _, frames = read_all(out)
    assert len(frames) == 2     # 1:1 with input (ffmpeg_vhsled.cpp:851-861)
    # after de-jitter the bright edge should be aligned across rows
    y = frames[0][0].astype(int)
    edges = np.argmax(y > 100, axis=1)
    mid = edges[8:-8]
    assert mid.std() <= 2.0, mid.std()


def test_normalize_ts(tmp_path):
    src = make_clip(str(tmp_path / "in.y4m"))
    out = str(tmp_path / "out.y4m")
    rc = main(["normalize-ts", "-i", src, "-o", out])
    assert rc == 0
    _, frames = read_all(out)
    assert len(frames) == FRAMES


def test_normalize_ts_packet_log(tmp_path):
    """The PTS-repair engine must be load-bearing through the TOOL path: a
    backward/forward-jumping two-stream packet log comes out monotonic per
    stream (normalize_ts.cpp:438-467 semantics)."""
    src = make_clip(str(tmp_path / "in.y4m"))
    out = str(tmp_path / "out.y4m")
    log = tmp_path / "pts.txt"
    # stream 0: backward jump at 3000 -> lifted; then a 100000-tick forward
    # jump -> clamped to maxfwd. stream 1 interleaved with its own jump.
    log.write_text(
        "0 1000\n1 10\n0 2000\n1 20\n0 3000\n1 5\n0 1500\n0 2500\n"
        "0 103000\n0 104000\n1 30\n0 none\n")
    norm = tmp_path / "pts_norm.txt"
    rc = main(["normalize-ts", "-i", src, "-o", out,
               "-pts-in", str(log), "-pts-out", str(norm), "-maxfwd", "4000"])
    assert rc == 0
    lines = [l.split() for l in norm.read_text().splitlines()]
    per_stream = {}
    for sidx, pts in lines:
        per_stream.setdefault(sidx, []).append(
            None if pts == "none" else int(pts))
    # a no-PTS packet round-trips as 'none' (the documented token), so the
    # normalized log is itself valid -pts-in input
    assert per_stream["0"] == [1000, 2000, 3000, 3000, 4000, 8000, 9000,
                               None]
    assert per_stream["1"] == [10, 20, 20, 45]
    rc = main(["normalize-ts", "-i", src, "-o", out,
               "-pts-in", str(norm), "-pts-out", str(tmp_path / "n2.txt")])
    assert rc == 0
    _, frames = read_all(out)
    assert len(frames) == FRAMES


def test_raw28ntsc_cli(tmp_path):
    from tests.test_raw28 import synth_capture
    raw = str(tmp_path / "cap.raw")
    synth_capture(3).tofile(raw)
    out = str(tmp_path / "tv.y4m")
    rc = main(["raw28ntsc", "-i", raw, "-o", out])
    assert rc == 0
    hdr, frames = read_all(out)
    assert len(frames) >= 1
    assert frames[0][0].max() > 100  # picture content recovered


def test_interlaced_source_field_selection(tmp_path):
    """Interlaced Y4M input ('It'): each output field must come from the
    matching source field (pts_delta flip, ffmpeg_to_composite.cpp:1033-1048).
    Top/bottom source fields carry distinct luma so mixing is detectable."""
    hdr = y4m.Y4MHeader(width=W, height=480, fps=Fraction(30000, 1001),
                        interlacing="t")
    src = str(tmp_path / "in.y4m")
    with open(src, "wb") as f:
        wr = y4m.Y4MWriter(f, hdr)
        for _ in range(2):
            y = np.zeros((480, W), np.uint8)
            y[0::2] = 60    # top field
            y[1::2] = 190   # bottom field
            u = np.full((240, W // 2), 128, np.uint8)
            wr.write(y, u, u)
    out = str(tmp_path / "out.y4m")
    rc = main(["to-composite", "-i", src, "-o", out, "-width", str(W),
               "-nocomp"])
    assert rc == 0
    _, frames = read_all(out)
    # bob output: fields alternate; each output frame should be dominated by
    # ONE source field's level, not a mix
    means = [f[0].mean() for f in frames]
    lo = sum(1 for m in means if m < 100)
    hi = sum(1 for m in means if m > 150)
    assert lo >= 1 and hi >= 1, means
    assert lo + hi == len(means), means


def test_bkey_feedback_cli(tmp_path):
    src = make_clip(str(tmp_path / "in.y4m"))
    out = str(tmp_path / "out.y4m")
    rc = main(["to-composite", "-i", src, "-o", out, "-width", str(W),
               "-noise", "0", "-bkey-feedback", "20"])
    assert rc == 0
    _, frames = read_all(out)
    assert len(frames) == 8


def test_two_generation_dub(tmp_path):
    """BASELINE config 4: VHS EP output re-processed (generation loss)."""
    src = make_clip(str(tmp_path / "in.y4m"))
    gen1 = str(tmp_path / "gen1.y4m")
    gen2 = str(tmp_path / "gen2.y4m")
    args = ["-width", str(W), "-vhs-speed", "ep", "-seed", "1", "-vi"]
    assert main(["to-composite", "-i", src, "-o", gen1] + args) == 0
    assert main(["to-composite", "-i", gen1, "-o", gen2] + args) == 0
    _, f1 = read_all(gen1)
    _, f2 = read_all(gen2)
    assert len(f2) == len(f1)
    # generation loss: second pass diverges further from the first
    d = np.abs(f2[1][0].astype(int) - f1[1][0].astype(int)).mean()
    assert d > 1.0


def test_ntsc_multi_input(tmp_path):
    a = make_clip(str(tmp_path / "a.y4m"), frames=3, seed=1)
    b = make_clip(str(tmp_path / "b.y4m"), frames=3, seed=2)
    out = str(tmp_path / "out.y4m")
    rc = main(["ntsc", "-i", a, "-i", b, "-o", out, "-width", str(W),
               "-noise", "0", "-d", "2"])
    assert rc == 0
    _, frames = read_all(out)
    assert len(frames) >= 5


def test_raw28ntsc_color_cli(tmp_path):
    from tests.test_raw28 import synth_color_capture
    raw = str(tmp_path / "cap.raw")
    synth_color_capture(3).tofile(raw)
    out = str(tmp_path / "tv.y4m")
    rc = main(["raw28ntsc", "-i", raw, "-o", out, "-color"])
    assert rc == 0
    _, frames = read_all(out)
    assert len(frames) >= 1
    # chroma planes deviate from neutral in the colored region
    u = frames[-1][1].astype(int)
    assert np.abs(u[100, 150:300] - 128).mean() > 4


def test_to_composite_pal(tmp_path):
    src = make_clip(str(tmp_path / "in.y4m"))
    out = str(tmp_path / "out.y4m")
    rc = main(["to-composite", "-i", src, "-o", out, "-tvstd", "pal",
               "-width", str(W), "-noise", "0"])
    assert rc == 0
    hdr, frames = read_all(out)
    assert hdr.height == 576
    assert hdr.fps == Fraction(50, 1)
    # 4 frames at 29.97fps -> round(4/29.97*50)=7 PAL fields
    # (av_rescale AV_ROUND_NEAR_INF semantics; round(6.673)=7)
    assert len(frames) == 7


def test_to_composite_422_input_and_output(tmp_path):
    src = make_clip(str(tmp_path / "in.y4m"), colorspace="422")
    out = str(tmp_path / "out.y4m")
    rc = main(["to-composite", "-i", src, "-o", out, "-width", str(W),
               "-422", "-noise", "0"])
    assert rc == 0
    hdr, frames = read_all(out)
    assert hdr.colorspace == "422"
    assert frames[0][1].shape == (480, W // 2)


def test_bkey_state_carries_across_batches(tmp_path):
    """Black-key filter planes must carry across GOP batches: gop=4 and
    gop=8 runs over the same 8 fields produce identical output (noise off
    so the only cross-batch state is the feedback frame)."""
    from cvsim_tpu.host.pipeline import CompositePipeline
    from cvsim_tpu.presets import parse_composite_flags

    src = make_clip(str(tmp_path / "in.y4m"))
    st = parse_composite_flags(
        ["-width", str(W), "-noise", "0", "-bkey-feedback", "20"])
    outs = {}
    for gop in (4, 8):
        cfg = st.to_run_config(gen1=True)
        pipe = CompositePipeline(cfg, gop=gop, progress=False)
        out = str(tmp_path / f"out{gop}.y4m")
        with open(src, "rb") as fin, open(out, "wb") as fout:
            pipe.run_video(y4m.Y4MReader(fin), fout)
        outs[gop] = read_all(out)[1]
    assert len(outs[4]) == len(outs[8]) == 8
    for f4, f8 in zip(outs[4], outs[8]):
        np.testing.assert_array_equal(f4[0], f8[0])
        np.testing.assert_array_equal(f4[1], f8[1])


def test_bkey_padded_batches_do_not_advance_carry(tmp_path):
    """Early-flushed batches (59.94p source: one field per frame overflows
    the frame slots, so every batch pads) must match a batch size that
    never pads mid-stream. Two mechanisms protect this: black_key_feedback
    is idempotent on a repeated field (filter := keyed output), AND
    _bkey_scan freezes the carry on padded slots outright (meta `valid`),
    so the invariant survives any future padding-semantics change."""
    from cvsim_tpu.host.pipeline import CompositePipeline
    from cvsim_tpu.presets import parse_composite_flags

    src = str(tmp_path / "in.y4m")
    hdr = y4m.Y4MHeader(width=W, height=H, fps=Fraction(60000, 1001),
                        colorspace="420jpeg")
    rng = np.random.default_rng(2)
    with open(src, "wb") as f:
        wr = y4m.Y4MWriter(f, hdr)
        for k in range(12):
            wr.write(rng.integers(16, 236, (H, W), dtype=np.uint8),
                     rng.integers(100, 156, (H // 2, W // 2), dtype=np.uint8),
                     rng.integers(100, 156, (H // 2, W // 2), dtype=np.uint8))
    outs = {}
    for gop in (2, 8):   # gop=8 -> max_frames=6 -> early flush + padding
        st = parse_composite_flags(
            ["-width", str(W), "-noise", "0", "-bkey-feedback", "20"])
        pipe = CompositePipeline(st.to_run_config(gen1=True), gop=gop,
                                 progress=False)
        out = str(tmp_path / f"b{gop}.y4m")
        with open(src, "rb") as fin, open(out, "wb") as fout:
            pipe.run_video(y4m.Y4MReader(fin), fout)
        outs[gop] = read_all(out)[1]
    assert len(outs[2]) == len(outs[8])
    for f2, f8 in zip(outs[2], outs[8]):
        np.testing.assert_array_equal(f2[0], f8[0])
        np.testing.assert_array_equal(f2[1], f8[1])


def test_transcode_window(tmp_path):
    src = make_clip(str(tmp_path / "in.y4m"), frames=8)
    out = str(tmp_path / "out.y4m")
    # 8 frames at 29.97fps ~ 0.267s; window [0.1, 0.2] keeps ~3 frames
    rc = main(["to-composite", "-i", src, "-o", out, "-width", str(W),
               "-noise", "0", "-ss", "0.1", "-se", "0.2"])
    assert rc == 0
    _, frames = read_all(out)
    assert 2 <= len(frames) <= 8
    full = str(tmp_path / "full.y4m")
    rc = main(["to-composite", "-i", src, "-o", full, "-width", str(W),
               "-noise", "0"])
    _, all_frames = read_all(full)
    assert len(frames) < len(all_frames)


def test_output_gop_invariant_with_noise(tmp_path):
    """Content-addressed noise: CLI output is identical regardless of the
    internal GOP batch size, even with all stochastic stages on."""
    from cvsim_tpu.host.pipeline import CompositePipeline
    from cvsim_tpu.presets import parse_composite_flags

    src = make_clip(str(tmp_path / "in.y4m"))
    st = parse_composite_flags(
        ["-width", str(W), "-vhs", "-vhs-speed", "ep", "-seed", "5"])
    outs = {}
    for gop in (3, 8):
        cfg = st.to_run_config(gen1=True)
        pipe = CompositePipeline(cfg, gop=gop, progress=False)
        out = str(tmp_path / f"g{gop}.y4m")
        with open(src, "rb") as fin, open(out, "wb") as fout:
            pipe.run_video(y4m.Y4MReader(fin), fout)
        outs[gop] = read_all(out)[1]
    for f3, f8 in zip(outs[3], outs[8]):
        np.testing.assert_array_equal(f3[0], f8[0])
        np.testing.assert_array_equal(f3[1], f8[1])
        np.testing.assert_array_equal(f3[2], f8[2])


def test_colorkey_noise_streaks_span_xdivr_groups():
    """A noisekey punch-through overrides the HELD decision variable, so it
    persists to the end of its xdivr group (ffmpeg_colorkey.cpp:852-864):
    within every group, the keyed mask is a suffix — and multi-pixel
    streaks exist (the 'older equipment' look), not just 1-pixel specks."""
    import jax
    from cvsim_tpu.models.tools import colorkey_apply

    h, w, xd = 16, 64, 4
    src = np.full((h, w, 3), 200, np.int32)
    dst = np.zeros((h, w, 3), np.int32)
    out = np.asarray(colorkey_apply(
        dst, src, jax.random.PRNGKey(5), color=(200, 200, 200),
        threshhold=100, noisekey=3000, xdivr=xd))
    keyed = (out[..., 0] == 200).reshape(h, w // xd, xd)
    assert keyed.any() and not keyed.all()
    # suffix property: keyed never turns off within a group
    assert not (np.diff(keyed.astype(int), axis=-1) < 0).any()
    # and some hit propagated (streak longer than a single pixel)
    assert (keyed.sum(axis=-1) >= 2).any()


def test_colorkey_multi_input_layering(tmp_path):
    """Two layers with per-input key settings: later -i settings apply only
    to that input (reference InputFile semantics)."""
    a = make_clip(str(tmp_path / "a.y4m"), seed=1)
    b = make_clip(str(tmp_path / "b.y4m"), seed=2)
    out = str(tmp_path / "out.y4m")
    rc = main(["colorkey",
               "-i", a, "-color", "0x101010", "-threshhold", "40",
               "-i", b, "-threshhold", "200",   # second layer keys less
               "-o", out, "-width", str(W)])
    assert rc == 0
    _, frames = read_all(out)
    assert len(frames) == 8


def test_average_delay_multi_input(tmp_path):
    a = make_clip(str(tmp_path / "a.y4m"), seed=3)
    b = make_clip(str(tmp_path / "b.y4m"), seed=4)
    out = str(tmp_path / "out.y4m")
    rc = main(["average-delay", "-i", a, "-n", "64", "-i", b, "-n", "200",
               "-o", out, "-width", str(W), "-d", "2"])
    assert rc == 0
    _, frames = read_all(out)
    assert len(frames) == 8


def test_cli_validation_and_defaults(tmp_path):
    """Round-2 CLI parity fixes: -i without -o errors (reference :1633);
    posterize without -threshhold defaults to 3 (not an all-black mask);
    audio-only ntsc works without -o."""
    src = make_clip(str(tmp_path / "in.y4m"))
    assert main(["to-composite", "-i", src]) == 1

    out = str(tmp_path / "p.y4m")
    assert main(["posterize", "-i", src, "-o", out, "-width", str(W)]) == 0
    _, frames = read_all(out)
    assert frames[0][0].max() > 0          # default threshhold 3, not 0

    t = np.arange(3000)
    sine = (9000 * np.sin(2 * np.pi * 440 * t / 44100)).astype(np.int16)
    ain = str(tmp_path / "a.wav")
    wavio.write_wav(ain, np.stack([sine, sine], -1), 44100)
    aout = str(tmp_path / "ao.wav")
    assert main(["ntsc", "-audio-in", ain, "-audio-out", aout]) == 0
    got, _ = wavio.read_wav(aout)
    assert len(got) == 3000


def test_ntsc_transcode_window(tmp_path):
    """-ss/-se on the gen-2 engine (extension; the gen-2 reference has no
    window): video honors the same window the shared audio path applies,
    with the field clock rebased to zero at the window start (gen-1
    semantics, pipeline.py read_loop)."""
    src = make_clip(str(tmp_path / "in.y4m"), frames=8)
    out = str(tmp_path / "out.y4m")
    rc = main(["ntsc", "-i", src, "-o", out, "-width", str(W),
               "-noise", "0", "-ss", "0.1", "-se", "0.2"])
    assert rc == 0
    _, frames = read_all(out)
    full = str(tmp_path / "full.y4m")
    assert main(["ntsc", "-i", src, "-o", full, "-width", str(W),
                 "-noise", "0"]) == 0
    _, all_frames = read_all(full)
    # ~0.1s of 59.94 fields/s
    assert 4 <= len(frames) <= 8 and len(frames) < len(all_frames)
    # deterministic: the windowed run reproduces byte-identically
    out2 = str(tmp_path / "out2.y4m")
    assert main(["ntsc", "-i", src, "-o", out2, "-width", str(W),
                 "-noise", "0", "-ss", "0.1", "-se", "0.2"]) == 0
    with open(out, "rb") as f1, open(out2, "rb") as f2:
        assert f1.read() == f2.read()


def test_audio_pad_fill_skips_durationless_log():
    """A packet log with no usable durations (every n == 0) must not shove
    the entire real stream behind pts-worth of silence — gap fill is
    skipped and the samples pass through unchanged."""
    from cvsim_tpu.host.pipeline import _audio_pad_fill

    s = np.arange(4000, dtype=np.int64)[:, None]
    out = _audio_pad_fill(s, [(0, 0), (2000, 0), (3900, 0)], 44100)
    np.testing.assert_array_equal(out, s)


def test_audio_without_mux_target_skips(tmp_path, capfd):
    """-audio-in with a container -o but no video stage: the processed WAV
    has nowhere to go (the container is written by the video encoder) —
    say so and do nothing, instead of processing into a temp file that is
    then deleted."""
    t = np.arange(2000)
    sine = (9000 * np.sin(2 * np.pi * 440 * t / 44100)).astype(np.int16)
    ain = str(tmp_path / "a.wav")
    wavio.write_wav(ain, np.stack([sine, sine], -1), 44100)
    out = str(tmp_path / "out.mp4")
    rc = main(["to-composite", "-audio-in", ain, "-o", out])
    assert rc == 0
    assert not os.path.exists(out)
    assert "skipping audio" in capfd.readouterr().err


def test_tool_missing_io_is_friendly(tmp_path):
    """Missing -i/-o surfaces as a usage message (ValueError -> rc 1), not
    an IndexError traceback."""
    out = str(tmp_path / "x.y4m")
    assert main(["normalize-ts", "-o", out]) == 1
    assert main(["normalize-ts", "-i", out]) == 1
    assert main(["posterize", "-o", out]) == 1
    assert main(["posterize", "-i", out]) == 1


def test_tool_finalize_does_not_mask_root_cause():
    """_finalizing: an encoder that exits nonzero on the truncated stream
    (secondary error) must not mask the loop's own exception."""
    import pytest
    from cvsim_tpu.cli.tools import _finalizing

    def bad_finalize():
        raise RuntimeError("container encoder exited with 1")

    with pytest.raises(ValueError, match="root cause"):
        with _finalizing(bad_finalize):
            raise ValueError("root cause")
    # no exception in the body: finalize's own failure must surface
    with pytest.raises(RuntimeError, match="encoder exited"):
        with _finalizing(bad_finalize):
            pass


def test_wav_write_atomic(tmp_path):
    """write_wav is tmp+rename (checkpoint resume skips audio when the WAV
    exists, so a half-written file must never be observable)."""
    p = str(tmp_path / "a.wav")
    wavio.write_wav(p, np.zeros((10, 1), np.int16), 44100)
    assert os.path.exists(p) and not os.path.exists(p + ".tmp")
    got, rate = wavio.read_wav(p)
    assert rate == 44100 and len(got) == 10


def test_vhsled_underscan_and_or(tmp_path):
    """The InputFile tools' -underscan renders the image at (100-u)% size
    centered on black (ffmpeg_vhsled.cpp:307-331); -or ("n:d" form,
    :516-544) only changes the reference's pts *units*, never the frame
    cadence (one output frame per input frame, :851-861) — so the output
    keeps the input rate even with -or 60000:1001; -gamma is accepted
    (dead flag in the reference: its gamma tables have no callers in
    vhsled)."""
    src = make_clip(str(tmp_path / "in.y4m"), frames=2)
    out = str(tmp_path / "out.y4m")
    rc = main(["vhsled", "-i", src, "-o", out, "-width", str(W),
               "-underscan", "20", "-or", "60000:1001", "-gamma", "vga"])
    assert rc == 0
    hdr, frames = read_all(out)
    assert hdr.fps == Fraction(30000, 1001)     # input cadence preserved
    assert len(frames) == 2
    y0 = frames[0][0]
    h, w = y0.shape
    # 10% top/bottom borders are black (RGB 0 -> studio Y 16); left/right
    # are NOT asserted: the dejitter shifts lines left past the black
    # margin underscan creates (that is the tool's function)
    assert y0[: h // 10].max() <= 16 and y0[-(h // 10):].max() <= 16
    assert y0[h // 2].max() > 50


def test_frameblend_underscan(tmp_path):
    src = make_clip(str(tmp_path / "in.y4m"), frames=4)
    out = str(tmp_path / "out.y4m")
    rc = main(["frameblend", "-i", src, "-o", out, "-width", str(W),
               "-or", "30", "-underscan", "30"])
    assert rc == 0
    _, frames = read_all(out)
    y0 = frames[0][0]
    assert y0[: y0.shape[0] // 8].max() <= 16 and y0.max() > 50


def test_host_tools_never_import_jax(tmp_path):
    """The host-numpy sibling tools are one-shot CLI processes at the
    reference's I/O-bound cost class; the ~2 s jax import must stay off
    their path (VERDICT r3 #6). Runs them in a sitecustomize-free
    subprocess (this host's sitecustomize pre-imports jax into every
    interpreter) and asserts no jax module was ever loaded."""
    import subprocess
    import sys

    import numpy as np_mod

    site_dir = os.path.dirname(os.path.dirname(np_mod.__file__))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = make_clip(str(tmp_path / "in.y4m"), frames=2)
    script = f"""
import sys
sys.path.insert(0, {site_dir!r})
sys.path.insert(0, {repo!r})
from cvsim_tpu.cli.main import main
tools = [
    ["posterize", "-i", {src!r}, "-o", {str(tmp_path / 'o1.y4m')!r}],
    ["vhsled", "-i", {src!r}, "-o", {str(tmp_path / 'o2.y4m')!r}],
    ["filmac", "-i", {src!r}, "-o", {str(tmp_path / 'o3.y4m')!r}],
    ["frameblend", "-i", {src!r}, "-o", {str(tmp_path / 'o4.y4m')!r},
     "-or", "24"],
    ["average-delay", "-i", {src!r}, "-o", {str(tmp_path / 'o5.y4m')!r}],
    ["colormap", "-i", {src!r}, "-i", {src!r},
     "-o", {str(tmp_path / 'o6.y4m')!r}],
    ["colorkey", "-i", {src!r}, "-i", {src!r},
     "-o", {str(tmp_path / 'o7.y4m')!r}, "-color", "0x101010"],
    ["normalize-ts", "-i", {src!r}, "-o", {str(tmp_path / 'o8.y4m')!r}],
]
for argv in tools:
    rc = main(argv)
    assert rc == 0, (argv, rc)
bad = [m for m in sys.modules if m == "jax" or m.startswith("jax.")]
assert not bad, bad[:5]
print("JAXFREE-OK")
"""
    r = subprocess.run([sys.executable, "-S", "-c", script],
                       capture_output=True, text=True, timeout=300,
                       env={k: v for k, v in os.environ.items()
                            if k != "PYTHONSTARTUP"})
    assert r.returncode == 0, r.stderr[-2000:]
    assert "JAXFREE-OK" in r.stdout


def test_every_tool_prints_help():
    """Every reference tool prints a flag list and exits nonzero on -h
    (parse_argv help() + return 1); ours match across the family."""
    import contextlib

    for tool in ("to-composite", "ntsc", "cassette", "posterize", "vhsled",
                 "raw28ntsc", "normalize-ts", "colorkey", "colormap",
                 "scanimate", "average-delay", "frameblend", "filmac"):
        err, out = io.StringIO(), io.StringIO()
        with contextlib.redirect_stderr(err), contextlib.redirect_stdout(out):
            try:
                rc = main([tool, "-h"])
            except SystemExit as e:
                rc = e.code
        assert rc == 1, tool
        assert len(err.getvalue() + out.getvalue()) > 60, tool
