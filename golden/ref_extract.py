"""Cross-validation harness: compile the REFERENCE'S OWN DSP code and run it.

Round-1 verdict: every "exact parity" claim in this repo chained back to
golden/ref_scalar.py, a hand-port by the same author — a shared misreading
of the C++ would be invisible to every test. This module closes that loop by
compiling the reference's actual DSP functions (which are pure over int/u8
planes; they need only width/height from AVFrame) into standalone binaries
and comparing them against the oracle on random fields.

Nothing from the reference is checked into this repo: the C++ text is read
from /root/reference (or $CVSIM_REFERENCE) AT TEST TIME, spliced between an
original stub prologue (20-line AVFrame stand-in, the globals the functions
reference, libc includes) and an original driver main() that speaks raw
planes over stdin/stdout. If the reference tree is absent the harness
reports unavailable and tests skip.

Extracted units:
- gen-2 (ffmpeg_ntsc.cpp): LowpassFilter + RGB_to_YIQ .. composite_layer
  (:74-106, :1375-1921) — the whole per-field YIQ chain, driven as
  RGB in -> RGB out.
- gen-1 (ffmpeg_to_composite.cpp): LowpassFilter + clamps +
  composite_video_chroma_lowpass .. composite_ntsc_to_yuv and
  composite_video_process .. black_key_feedback (:99-131, :335-553,
  :629-999) — the per-field YUV 4:2:2 chain plus black-key, driven as
  Y/U/V planes in -> planes out.
- audio (ffmpeg_to_composite.cpp): dBFS + LowpassFilter + the
  HiLoPair/HiLoPass/HiLoSample/HiLoComboPass filter-bank classes +
  composite_audio_process (:76-83, :99-228, :344-351, :555-627), with an
  original driver that mirrors main()'s filter wiring (:2126-2162) and
  hiss-level derivation (:1629); driven as s16le interleaved in -> out.
  Drive with hiss_db very negative (level truncates to 0): hiss consumes
  libc rand().

Noise stages call libc rand(); the harness is meant for the deterministic
stages, so drive it with noise/chroma_noise/chroma_phase_noise/chroma_loss
= 0 and hs_phase_noise = 0 (head-switch stays deterministic then — the
rand() draw is inside `if (phase_noise != 0)`).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import subprocess
import tempfile

import numpy as np

REF_DIR = os.environ.get("CVSIM_REFERENCE", "/root/reference")
_CACHE_DIR = os.path.join(tempfile.gettempdir(), "cvsim_ref_extract")


def available() -> bool:
    return (os.path.isfile(os.path.join(REF_DIR, "ffmpeg_ntsc.cpp"))
            and os.path.isfile(os.path.join(REF_DIR, "ffmpeg_to_composite.cpp"))
            and shutil.which("g++") is not None)


def _slice_between(text: str, start: str, end: str) -> str:
    i = text.index(start)
    j = text.index(end, i)
    return text[i:j]


# --------------------------------------------------------------------- stubs

_COMMON_PROLOGUE = r"""
// Original stub prologue (cvsim_tpu cross-validation harness). The extracted
// reference functions only touch width/height/linesize/data of AVFrame.
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cstdint>
#include <cmath>
#include <string>
#include <algorithm>
using namespace std;

struct AVFrame {
    int width;
    int height;
    int linesize[4];
    unsigned char *data[4];
    int interlaced_frame;
    int top_field_first;
};
struct InputFile {};

enum { VHS_SP = 0, VHS_LP, VHS_EP };

// globals the extracted functions read (reference defaults; overridden by
// key=value argv)
int video_scanline_phase_shift = 180;
int video_scanline_phase_shift_offset = 0;
bool output_ntsc = true;
bool output_pal = false;
double composite_preemphasis = 0;
double composite_preemphasis_cut = 1000000;
double vhs_out_sharpen = 1.5;
double vhs_out_sharpen_chroma = 0.85;
bool vhs_head_switching = false;
double vhs_head_switching_point = 1.0 - ((4.5 + 0.01) / 262.5);
double vhs_head_switching_phase = ((1.0 - 0.01) / 262.5);
double vhs_head_switching_phase_noise = 0;
bool composite_in_chroma_lowpass = true;
bool composite_out_chroma_lowpass = true;
bool composite_out_chroma_lowpass_lite = true;
int video_yc_recombine = 0;
int video_chroma_noise = 0;
int video_chroma_phase_noise = 0;
int video_chroma_loss = 0;
int video_noise = 0;
int subcarrier_amplitude = 50;
int subcarrier_amplitude_back = 50;
bool emulating_vhs = false;
bool nocolor_subcarrier = false;
bool nocolor_subcarrier_after_yc_sep = false;
bool vhs_chroma_vert_blend = true;
bool vhs_svideo_out = false;
int output_vhs_tape_speed = VHS_SP;
int black_key_level_feedback = -1;
"""

_APPLY_KV = r"""
static void apply_kv(const char *k, const char *v) {
    double d = atof(v);
    long n = atol(v);
    if (!strcmp(k, "scp")) video_scanline_phase_shift = (int)n;
    else if (!strcmp(k, "scpo")) video_scanline_phase_shift_offset = (int)n;
    else if (!strcmp(k, "ntsc")) { output_ntsc = n != 0; output_pal = n == 0; }
    else if (!strcmp(k, "preemphasis")) composite_preemphasis = d;
    else if (!strcmp(k, "preemphasis_cut")) composite_preemphasis_cut = d;
    else if (!strcmp(k, "sharpen")) vhs_out_sharpen = d;
    else if (!strcmp(k, "sharpen_chroma")) vhs_out_sharpen_chroma = d;
    else if (!strcmp(k, "hs")) vhs_head_switching = n != 0;
    else if (!strcmp(k, "hs_point")) vhs_head_switching_point = d;
    else if (!strcmp(k, "hs_phase")) vhs_head_switching_phase = d;
    else if (!strcmp(k, "hs_phase_noise")) vhs_head_switching_phase_noise = d;
    else if (!strcmp(k, "in_lowpass")) composite_in_chroma_lowpass = n != 0;
    else if (!strcmp(k, "out_lowpass")) composite_out_chroma_lowpass = n != 0;
    else if (!strcmp(k, "out_lowpass_lite")) composite_out_chroma_lowpass_lite = n != 0;
    else if (!strcmp(k, "yc_recombine")) video_yc_recombine = (int)n;
    else if (!strcmp(k, "chroma_noise")) video_chroma_noise = (int)n;
    else if (!strcmp(k, "chroma_phase_noise")) video_chroma_phase_noise = (int)n;
    else if (!strcmp(k, "chroma_loss")) video_chroma_loss = (int)n;
    else if (!strcmp(k, "noise")) video_noise = (int)n;
    else if (!strcmp(k, "amp")) subcarrier_amplitude = (int)n;
    else if (!strcmp(k, "amp_back")) subcarrier_amplitude_back = (int)n;
    else if (!strcmp(k, "vhs")) emulating_vhs = n != 0;
    else if (!strcmp(k, "nocolor_subcarrier")) nocolor_subcarrier = n != 0;
    else if (!strcmp(k, "nocolor_after")) nocolor_subcarrier_after_yc_sep = n != 0;
    else if (!strcmp(k, "vblend")) vhs_chroma_vert_blend = n != 0;
    else if (!strcmp(k, "svideo")) vhs_svideo_out = n != 0;
    else if (!strcmp(k, "speed")) output_vhs_tape_speed = (int)n;
    else if (!strcmp(k, "bkey")) black_key_level_feedback = (int)n;
    else { fprintf(stderr, "unknown key %s\n", k); exit(2); }
}

static void parse_args(int argc, char **argv, int first) {
    for (int i = first; i < argc; i++) {
        char *eq = strchr(argv[i], '=');
        if (!eq) { fprintf(stderr, "bad arg %s\n", argv[i]); exit(2); }
        *eq = 0;
        apply_kv(argv[i], eq + 1);
    }
}

static void read_exact(void *p, size_t n) {
    if (fread(p, 1, n, stdin) != n) { fprintf(stderr, "short read\n"); exit(3); }
}
"""

_GEN2_MAIN = r"""
int main(int argc, char **argv) {
    // argv: w h field fieldno key=val...   stdin: w*h*3 RGB u8
    // stdout: w*h*3 RGB u8 (rows y=field,+2 processed; others source copy)
    int w = atoi(argv[1]), h = atoi(argv[2]);
    int field = atoi(argv[3]);
    unsigned long long fieldno = strtoull(argv[4], NULL, 10);
    parse_args(argc, argv, 5);

    unsigned char *rgb = new unsigned char[(size_t)w * h * 3];
    read_exact(rgb, (size_t)w * h * 3);
    unsigned char *sbuf = new unsigned char[(size_t)w * h * 4];
    unsigned char *dbuf = new unsigned char[(size_t)w * h * 4];
    for (long k = 0; k < (long)w * h; k++) {
        uint32_t px = ((uint32_t)rgb[k*3] << 16) | ((uint32_t)rgb[k*3+1] << 8)
                      | (uint32_t)rgb[k*3+2];
        ((uint32_t*)sbuf)[k] = px;
        ((uint32_t*)dbuf)[k] = px;
    }
    AVFrame src = {w, h, {w*4,0,0,0}, {sbuf,0,0,0}, 0, 0};
    AVFrame dst = {w, h, {w*4,0,0,0}, {dbuf,0,0,0}, 0, 0};
    InputFile inf;
    composite_layer(&dst, &src, inf, field, fieldno);
    for (long k = 0; k < (long)w * h; k++) {
        uint32_t px = ((uint32_t*)dbuf)[k];
        rgb[k*3]   = (px >> 16) & 0xFF;
        rgb[k*3+1] = (px >> 8) & 0xFF;
        rgb[k*3+2] = px & 0xFF;
    }
    fwrite(rgb, 1, (size_t)w * h * 3, stdout);
    return 0;
}
"""

_GEN1_MAIN = r"""
int main(int argc, char **argv) {
    // argv: mode w h field fieldno key=val...
    //   mode "process": stdin Y[w*h] U[(w/2)*h] V[(w/2)*h] -> same out
    //   mode "blackkey": stdin dst planes then flt planes -> dst planes,
    //                    then flt planes (updated persistent filter frame)
    const char *mode = argv[1];
    int w = atoi(argv[2]), h = atoi(argv[3]);
    int field = atoi(argv[4]);
    unsigned long long fieldno = strtoull(argv[5], NULL, 10);
    parse_args(argc, argv, 6);

    size_t ny = (size_t)w * h, nc = (size_t)(w/2) * h;
    // +16 slack filled with 16 (luma black): composite_ntsc_to_yuv reads
    // Y[x+2] past the LAST row's end — in the real tool that lands in
    // AVFrame alignment padding (unspecified); pin it to the oracle's
    // pad-16 model so the comparison is deterministic.
    unsigned char *y = new unsigned char[ny + 16];
    unsigned char *u = new unsigned char[nc + 16];
    unsigned char *v = new unsigned char[nc + 16];
    memset(y + ny, 16, 16); memset(u + nc, 16, 16); memset(v + nc, 16, 16);
    read_exact(y, ny); read_exact(u, nc); read_exact(v, nc);
    AVFrame dst = {w, h, {w, w/2, w/2, 0}, {y, u, v, 0}, 0, 0};
    if (!strcmp(mode, "process")) {
        composite_video_process(&dst, field, fieldno);
    } else if (!strcmp(mode, "blackkey")) {
        unsigned char *fy = new unsigned char[ny];
        unsigned char *fu = new unsigned char[nc];
        unsigned char *fv = new unsigned char[nc];
        read_exact(fy, ny); read_exact(fu, nc); read_exact(fv, nc);
        AVFrame flt = {w, h, {w, w/2, w/2, 0}, {fy, fu, fv, 0}, 0, 0};
        black_key_feedback(&dst, &flt, field, fieldno);
        fwrite(y, 1, ny, stdout); fwrite(u, 1, nc, stdout);
        fwrite(v, 1, nc, stdout);
        fwrite(fy, 1, ny, stdout); fwrite(fu, 1, nc, stdout);
        fwrite(fv, 1, nc, stdout);
        return 0;
    } else {
        fprintf(stderr, "bad mode %s\n", mode); return 2;
    }
    fwrite(y, 1, ny, stdout); fwrite(u, 1, nc, stdout);
    fwrite(v, 1, nc, stdout);
    return 0;
}
"""


_AUDIO_PROLOGUE = r"""
#include <vector>
#include <cassert>
"""

# Globals composite_audio_process reads that main() normally wires up; the
# class slice ends right before the reference's own declarations of these
# (ffmpeg_to_composite.cpp:230-234, :297-313, :325), so re-declare them
# with the reference defaults.
_AUDIO_GLOBALS = r"""
HiLoComboPass audio_hilopass;
LowpassFilter audio_linear_preemphasis_pre[2];
LowpassFilter audio_linear_preemphasis_post[2];
int output_audio_channels = 2;
int output_audio_rate = 44100;
double output_audio_hiss_db = -72;
double output_audio_linear_buzz = -42;
double output_audio_highpass = 20;
double output_audio_lowpass = 20000;
double vhs_linear_high_boost = 0.25;
bool output_vhs_hifi = true;
bool emulating_preemphasis = true;
bool emulating_deemphasis = true;
int output_audio_hiss_level = 0;

static void audio_apply_kv(const char *k, const char *v) {
    double d = atof(v);
    long n = atol(v);
    if (!strcmp(k, "ntsc")) { output_ntsc = n != 0; output_pal = n == 0; }
    else if (!strcmp(k, "hifi")) output_vhs_hifi = n != 0;
    else if (!strcmp(k, "buzz_db")) output_audio_linear_buzz = d;
    else if (!strcmp(k, "hiss_db")) output_audio_hiss_db = d;
    else if (!strcmp(k, "boost")) vhs_linear_high_boost = d;
    else if (!strcmp(k, "preemph")) emulating_preemphasis = n != 0;
    else if (!strcmp(k, "deemph")) emulating_deemphasis = n != 0;
    else if (!strcmp(k, "highpass")) output_audio_highpass = d;
    else if (!strcmp(k, "lowpass")) output_audio_lowpass = d;
    else { fprintf(stderr, "unknown key %s\n", k); exit(2); }
}
"""

_AUDIO_MAIN = r"""
int main(int argc, char **argv) {
    // argv: channels rate nsamples key=val...
    // stdin: s16le interleaved; stdout: s16le interleaved (processed)
    output_audio_channels = atoi(argv[1]);
    output_audio_rate = atoi(argv[2]);
    long n = atol(argv[3]);
    for (int i = 4; i < argc; i++) {
        char *eq = strchr(argv[i], '=');
        if (!eq) { fprintf(stderr, "bad arg %s\n", argv[i]); exit(2); }
        *eq = 0;
        audio_apply_kv(argv[i], eq + 1);
    }
    // mirror main()'s audio filter wiring (ffmpeg_to_composite.cpp:2126-2162)
    audio_hilopass.setChannels(output_audio_channels);
    audio_hilopass.setRate(output_audio_rate);
    audio_hilopass.setCutoff(output_audio_lowpass, output_audio_highpass);
    audio_hilopass.setPasses(6);
    audio_hilopass.init();
    for (unsigned int i = 0; i < 2; i++)
        audio_post_vhs_boost[i].setFilter(output_audio_rate, 10000);
    double emph_cut = output_vhs_hifi ? 16000 : 8000;   // :2139-2162
    if (emulating_preemphasis)
        for (int i = 0; i < output_audio_channels; i++)
            audio_linear_preemphasis_pre[i].setFilter(
                output_audio_rate, emph_cut);
    if (emulating_deemphasis)
        for (int i = 0; i < output_audio_channels; i++)
            audio_linear_preemphasis_post[i].setFilter(
                output_audio_rate, emph_cut);
    output_audio_hiss_level = dBFS(output_audio_hiss_db) * 5000;  // :1629

    int16_t *buf = new int16_t[(size_t)n * output_audio_channels];
    read_exact(buf, (size_t)n * output_audio_channels * 2);
    composite_audio_process(buf, (unsigned int)n);
    fwrite(buf, 2, (size_t)n * output_audio_channels, stdout);
    return 0;
}
"""


# ----------------------------------------------------------------- compilers

def _compose_gen2() -> str:
    text = open(os.path.join(REF_DIR, "ffmpeg_ntsc.cpp")).read()
    lowpass = _slice_between(text, "class LowpassFilter", "class HiLoPair")
    chain = _slice_between(text, "void RGB_to_YIQ", "int main(")
    return "\n".join([_COMMON_PROLOGUE, lowpass, chain, _APPLY_KV, _GEN2_MAIN])


def _compose_gen1() -> str:
    text = open(os.path.join(REF_DIR, "ffmpeg_to_composite.cpp")).read()
    lowpass = _slice_between(text, "class LowpassFilter", "class HiLoPair")
    clamps = _slice_between(text, "static inline int clampu8",
                            "void composite_video_chroma_lowpass")
    front = _slice_between(text, "void composite_video_chroma_lowpass",
                           "void composite_audio_process")
    back = _slice_between(text, "void composite_video_process",
                          "void render_field")
    return "\n".join([_COMMON_PROLOGUE, lowpass, clamps, front, back,
                      _APPLY_KV, _GEN1_MAIN])


# --------------------------------------------------------------- pixel tools
#
# The sibling tools' composite_layer functions are tiny pure per-pixel
# kernels over ARGB uint32 frames; each gets its own stub InputFile with
# exactly the fields the kernel reads, and a driver speaking RGB24 planes
# over stdin/stdout (packed to/from the uint32 layout the kernels assume).

_PIXEL_PROLOGUE = r"""
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cstdint>
#include <cmath>
using namespace std;

struct AVFrame {
    int width;
    int height;
    int linesize[4];
    unsigned char *data[4];
};

static void read_exact(void *p, size_t n) {
    if (fread(p, 1, n, stdin) != n) { fprintf(stderr, "short read\n"); exit(3); }
}

static unsigned char *read_rgb_frame(int w, int h, uint32_t **outbuf) {
    unsigned char *rgb = new unsigned char[(size_t)w * h * 3];
    read_exact(rgb, (size_t)w * h * 3);
    uint32_t *buf = new uint32_t[(size_t)w * h];
    for (long k = 0; k < (long)w * h; k++)
        buf[k] = ((uint32_t)rgb[k*3] << 16) | ((uint32_t)rgb[k*3+1] << 8)
                 | (uint32_t)rgb[k*3+2];
    *outbuf = buf;
    return rgb;
}

static void write_rgb_frame(int w, int h, const uint32_t *buf,
                            unsigned char *rgb) {
    for (long k = 0; k < (long)w * h; k++) {
        rgb[k*3]   = (buf[k] >> 16) & 0xFF;
        rgb[k*3+1] = (buf[k] >> 8) & 0xFF;
        rgb[k*3+2] = buf[k] & 0xFF;
    }
    fwrite(rgb, 1, (size_t)w * h * 3, stdout);
}
"""

_POSTERIZE_STUB = r"""
struct InputFile { int threshhold; };
"""

_POSTERIZE_MAIN = r"""
int main(int argc, char **argv) {
    // argv: w h threshhold   stdin: src RGB24   stdout: RGB24
    int w = atoi(argv[1]), h = atoi(argv[2]);
    InputFile inf; inf.threshhold = atoi(argv[3]);
    uint32_t *sbuf; unsigned char *rgb = read_rgb_frame(w, h, &sbuf);
    uint32_t *dbuf = new uint32_t[(size_t)w * h];
    AVFrame src = {w, h, {w*4,0,0,0}, {(unsigned char*)sbuf,0,0,0}};
    AVFrame dst = {w, h, {w*4,0,0,0}, {(unsigned char*)dbuf,0,0,0}};
    composite_layer(&dst, &src, inf);
    write_rgb_frame(w, h, dbuf, rgb);
    return 0;
}
"""

_COLORMAP_STUB = r"""
struct InputFile {};
uint32_t colormap[256];
"""

_COLORMAP_MAIN = r"""
int main(int argc, char **argv) {
    // argv: w h mw mh   stdin: map RGB24 then src RGB24   stdout: RGB24
    int w = atoi(argv[1]), h = atoi(argv[2]);
    int mw = atoi(argv[3]), mh = atoi(argv[4]);
    InputFile inf;
    uint32_t *mbuf; unsigned char *mrgb = read_rgb_frame(mw, mh, &mbuf);
    AVFrame mapf = {mw, mh, {mw*4,0,0,0}, {(unsigned char*)mbuf,0,0,0}};
    take_colormap(&mapf, inf);
    uint32_t *sbuf; unsigned char *rgb = read_rgb_frame(w, h, &sbuf);
    uint32_t *dbuf = new uint32_t[(size_t)w * h];
    AVFrame src = {w, h, {w*4,0,0,0}, {(unsigned char*)sbuf,0,0,0}};
    AVFrame dst = {w, h, {w*4,0,0,0}, {(unsigned char*)dbuf,0,0,0}};
    composite_layer(&dst, &src, inf);
    write_rgb_frame(w, h, dbuf, rgb);
    return 0;
}
"""

_COLORKEY_STUB = r"""
struct InputFile {
    uint32_t color;
    int threshhold;
    unsigned int fade;
    unsigned int xdivr;
    bool invert;
    unsigned int noisekey;
};
"""

_COLORKEY_MAIN = r"""
int main(int argc, char **argv) {
    // argv: w h color thr inv noisekey fade xdivr
    // stdin: dst (canvas) RGB24 then src RGB24   stdout: keyed canvas RGB24
    int w = atoi(argv[1]), h = atoi(argv[2]);
    InputFile inf;
    inf.color = (uint32_t)strtoul(argv[3], NULL, 0);
    inf.threshhold = atoi(argv[4]);
    inf.invert = atoi(argv[5]) != 0;
    inf.noisekey = (unsigned int)atoi(argv[6]);
    inf.fade = (unsigned int)atoi(argv[7]);
    inf.xdivr = (unsigned int)atoi(argv[8]);
    uint32_t *dbuf; unsigned char *rgb = read_rgb_frame(w, h, &dbuf);
    uint32_t *sbuf; unsigned char *rgb2 = read_rgb_frame(w, h, &sbuf);
    AVFrame src = {w, h, {w*4,0,0,0}, {(unsigned char*)sbuf,0,0,0}};
    AVFrame dst = {w, h, {w*4,0,0,0}, {(unsigned char*)dbuf,0,0,0}};
    composite_layer(&dst, &src, inf);
    write_rgb_frame(w, h, dbuf, rgb);
    return 0;
}
"""

_AVGDELAY_STUB = r"""
struct InputFile { int newlevel; };
size_t output_avstream_video_frame_delay = 1;
"""

_AVGDELAY_MAIN = r"""
int main(int argc, char **argv) {
    // argv: w h field delay newlevel
    // stdin: dst (delayed) RGB24 then src RGB24   stdout: blended RGB24
    int w = atoi(argv[1]), h = atoi(argv[2]);
    unsigned long long field = strtoull(argv[3], NULL, 10);
    output_avstream_video_frame_delay = (size_t)atol(argv[4]);
    InputFile inf; inf.newlevel = atoi(argv[5]);
    uint32_t *dbuf; unsigned char *rgb = read_rgb_frame(w, h, &dbuf);
    uint32_t *sbuf; unsigned char *rgb2 = read_rgb_frame(w, h, &sbuf);
    AVFrame src = {w, h, {w*4,0,0,0}, {(unsigned char*)sbuf,0,0,0}};
    AVFrame dst = {w, h, {w*4,0,0,0}, {(unsigned char*)dbuf,0,0,0}};
    composite_layer(&dst, &src, inf, field);
    write_rgb_frame(w, h, dbuf, rgb);
    return 0;
}
"""


def _compose_pixel(src_name: str, stub: str, main_code: str,
                   start: str = "// This code assumes ARGB") -> str:
    text = open(os.path.join(REF_DIR, src_name)).read()
    kernel = _slice_between(text, start, "int main(")
    return "\n".join([_PIXEL_PROLOGUE, stub, kernel, main_code])


# vhsled / frameblend / filmac keep their per-frame logic inline in main()'s
# demux loop rather than in named functions; the composers below slice that
# loop body verbatim (markers are the block's first statement and the
# `...->pts = current` line that follows it) and embed it in an original
# driver that sets up the same locals/globals the block reads.

_VHSLED_STUB = r"""
#include <cassert>
struct InputFileStub { AVFrame *input_avstream_video_frame_rgb; };
InputFileStub input_file;
AVFrame *output_avstream_video_frame;
"""

_VHSLED_MAIN_HEAD = r"""
int main(int argc, char **argv) {
    // argv: w h   stdin: src RGB24   stdout: de-jittered RGB24
    int w = atoi(argv[1]), h = atoi(argv[2]);
    uint32_t *ibuf; unsigned char *rgb = read_rgb_frame(w, h, &ibuf);
    uint32_t *obuf = new uint32_t[(size_t)w * h];
    AVFrame inf = {w, h, {w*4,0,0,0}, {(unsigned char*)ibuf,0,0,0}};
    AVFrame outf = {w, h, {w*4,0,0,0}, {(unsigned char*)obuf,0,0,0}};
    input_file.input_avstream_video_frame_rgb = &inf;
    output_avstream_video_frame = &outf;
"""

_VHSLED_MAIN_TAIL = r"""
    write_rgb_frame(w, h, obuf, rgb);
    return 0;
}
"""


def _compose_vhsled() -> str:
    text = open(os.path.join(REF_DIR, "ffmpeg_vhsled.cpp")).read()
    blackish = _slice_between(text, "bool blackish", "int main(")
    block = _slice_between(text, "int32_t *adj = new int32_t",
                           "output_avstream_video_frame->pts")
    return "\n".join([_PIXEL_PROLOGUE, _VHSLED_STUB, blackish,
                      _VHSLED_MAIN_HEAD, block, _VHSLED_MAIN_TAIL])


_FRAMEBLEND_STUB = r"""
#include <vector>
#include <utility>
#include <cassert>
#include <algorithm>

bool squelch_frameblend_near_match = false;
bool fullframealt = false;
int framealt = 1;
double gamma_correction = -1;
int output_width = -1;
int output_height = -1;
struct InputFileStub { AVFrame *input_avstream_video_frame_rgb; };
InputFileStub input_file;
AVFrame *output_avstream_video_frame;
"""

_FRAMEBLEND_MAIN_HEAD = r"""
int main(int argc, char **argv) {
    // argv: w h current framealt fullframealt squelch gamma nframes t0 t1...
    //   (frame_t values as C hex-float strings for exact doubles)
    // stdin: nframes RGB24 frames   stdout: one blended RGB24 frame
    int w = atoi(argv[1]), h = atoi(argv[2]);
    output_width = w; output_height = h;
    unsigned long long current = strtoull(argv[3], NULL, 10);
    framealt = atoi(argv[4]);
    fullframealt = atoi(argv[5]) != 0;
    squelch_frameblend_near_match = atoi(argv[6]) != 0;
    gamma_correction = atof(argv[7]);
    int nframes = atoi(argv[8]);
    std::vector<uint32_t*> frames;
    std::vector<double> frame_t;
    unsigned char *rgb = NULL;
    for (int i = 0; i < nframes; i++) {
        uint32_t *buf; rgb = read_rgb_frame(w, h, &buf);
        frames.push_back(buf);
        frame_t.push_back(strtod(argv[9 + i], NULL));
    }
    uint32_t *obuf = new uint32_t[(size_t)w * h];
    AVFrame inf = {w, h, {w*4,0,0,0}, {NULL,0,0,0}};
    AVFrame outf = {w, h, {w*4,0,0,0}, {(unsigned char*)obuf,0,0,0}};
    input_file.input_avstream_video_frame_rgb = &inf;
    output_avstream_video_frame = &outf;
"""

_FRAMEBLEND_MAIN_TAIL = r"""
    write_rgb_frame(w, h, obuf, rgb);
    return 0;
}
"""


def _compose_frameblend() -> str:
    text = open(os.path.join(REF_DIR, "frameblend.cpp")).read()
    helpers = _slice_between(text, "int clamp255", "int main(")
    block = _slice_between(text,
                           "/* cross-blending weights for this frame period */",
                           "output_avstream_video_frame->pts")
    return "\n".join([_PIXEL_PROLOGUE, _FRAMEBLEND_STUB, helpers,
                      _FRAMEBLEND_MAIN_HEAD, block, _FRAMEBLEND_MAIN_TAIL])


_FILMAC_STUB = r"""
#include <vector>
#include <cassert>
#include <algorithm>

double gamma_correction = -1;
int output_width = -1;
int output_height = -1;
struct InputFileStub { AVFrame *input_avstream_video_frame_rgb; };
InputFileStub input_file;
AVFrame *output_avstream_video_frame;
"""

_FILMAC_MAIN_HEAD = r"""
int main(int argc, char **argv) {
    // argv: w h gamma nframes   stdin: nframes RGB24   stdout: nframes RGB24
    // (multi-frame: final_minv/final_maxv carry the asymmetric temporal IIR)
    int w = atoi(argv[1]), h = atoi(argv[2]);
    output_width = w; output_height = h;
    gamma_correction = atof(argv[3]);
    int nframes = atoi(argv[4]);
    long final_minv = -1, final_maxv = -1;
    bool final_init = false;
    uint32_t *obuf = new uint32_t[(size_t)w * h];
    AVFrame outf = {w, h, {w*4,0,0,0}, {(unsigned char*)obuf,0,0,0}};
    output_avstream_video_frame = &outf;
    for (int fr = 0; fr < nframes; fr++) {
        uint32_t *ibuf; unsigned char *rgb = read_rgb_frame(w, h, &ibuf);
        std::vector<uint32_t*> frames;
        frames.push_back(ibuf);
        AVFrame inf = {w, h, {w*4,0,0,0}, {(unsigned char*)ibuf,0,0,0}};
        input_file.input_avstream_video_frame_rgb = &inf;
"""

_FILMAC_MAIN_TAIL = r"""
        write_rgb_frame(w, h, obuf, rgb);
        delete[] ibuf;
        delete[] rgb;
    }
    return 0;
}
"""


def _compose_filmac() -> str:
    text = open(os.path.join(REF_DIR, "filmac.cpp")).read()
    helpers = _slice_between(text, "int clamp255", "int main(")
    block = _slice_between(text, "long *lframe = new long[",
                           "output_avstream_video_frame->pts")
    return "\n".join([_PIXEL_PROLOGUE, _FILMAC_STUB, helpers,
                      _FILMAC_MAIN_HEAD, block, _FILMAC_MAIN_TAIL])


_CASSETTE_GLOBALS = r"""
HiLoComboPass audio_hilopass;
LowpassFilter audio_linear_preemphasis_pre[2];
LowpassFilter audio_linear_preemphasis_post[2];
int output_audio_channels = 2;
int output_audio_rate = 44100;
double output_audio_hiss_db = -72;
double output_audio_highpass = 20;
double output_audio_lowpass = 20000;
bool emulating_preemphasis = true;
bool emulating_deemphasis = true;
int output_audio_hiss_level = 0;
"""

_CASSETTE_MAIN = r"""
static void cassette_apply_kv(const char *k, const char *v) {
    double d = atof(v);
    long n = atol(v);
    if (!strcmp(k, "hiss_db")) output_audio_hiss_db = d;
    else if (!strcmp(k, "preemph")) emulating_preemphasis = n != 0;
    else if (!strcmp(k, "deemph")) emulating_deemphasis = n != 0;
    else if (!strcmp(k, "highpass")) output_audio_highpass = d;
    else if (!strcmp(k, "lowpass")) output_audio_lowpass = d;
    else if (!strcmp(k, "head_tilt")) head_tilt = d;
    else if (!strcmp(k, "waver")) head_tilt_waver = d;
    else if (!strcmp(k, "mono")) mono_downmix = n != 0;
    else { fprintf(stderr, "unknown key %s\n", k); exit(2); }
}

int main(int argc, char **argv) {
    // argv: channels rate nsamples key=val...
    // stdin: s16le interleaved; stdout: s16le interleaved (processed)
    output_audio_channels = atoi(argv[1]);
    output_audio_rate = atoi(argv[2]);
    long n = atol(argv[3]);
    for (int i = 4; i < argc; i++) {
        char *eq = strchr(argv[i], '=');
        if (!eq) { fprintf(stderr, "bad arg %s\n", argv[i]); exit(2); }
        *eq = 0;
        cassette_apply_kv(argv[i], eq + 1);
    }
    // mirror main()'s audio filter wiring (ffmpeg_cassette.cpp:864-880)
    audio_hilopass.setChannels(output_audio_channels);
    audio_hilopass.setRate(output_audio_rate);
    audio_hilopass.setCutoff(output_audio_lowpass, output_audio_highpass);
    audio_hilopass.setPasses(6);
    audio_hilopass.init();
    if (emulating_preemphasis)
        for (int i = 0; i < output_audio_channels; i++)
            audio_linear_preemphasis_pre[i].setFilter(output_audio_rate, 4000);
    if (emulating_deemphasis)
        for (int i = 0; i < output_audio_channels; i++)
            audio_linear_preemphasis_post[i].setFilter(
                output_audio_rate, 4000);
    output_audio_hiss_level = (int)(dBFS(output_audio_hiss_db) * 5000);

    int16_t *buf = new int16_t[(size_t)n * output_audio_channels];
    read_exact(buf, (size_t)n * output_audio_channels * 2);
    composite_audio_process(buf, (unsigned int)n);
    fwrite(buf, 2, (size_t)n * output_audio_channels, stdout);
    return 0;
}
"""


def _compose_cassette() -> str:
    text = open(os.path.join(REF_DIR, "ffmpeg_cassette.cpp")).read()
    dbfs = _slice_between(text, "double dBFS", "// lowpass filter")
    lowpass = _slice_between(text, "class LowpassFilter", "class HiLoPair")
    hilo = _slice_between(text, "class HiLoPair", "HiLoComboPass\t")
    # clamps + ConvolutionMap + head-tilt globals + composite_audio_process
    # are contiguous (:258-416)
    proc = _slice_between(text, "static inline int clampu8",
                          "static void help")
    return "\n".join([_COMMON_PROLOGUE, _AUDIO_PROLOGUE, dbfs, lowpass, hilo,
                      _CASSETTE_GLOBALS, _APPLY_KV, proc, _CASSETTE_MAIN])


def _compose_audio() -> str:
    text = open(os.path.join(REF_DIR, "ffmpeg_to_composite.cpp")).read()
    dbfs = _slice_between(text, "double dBFS", "// lowpass filter")
    lowpass = _slice_between(text, "class LowpassFilter", "class HiLoPair")
    hilo = _slice_between(text, "class HiLoPair", "HiLoComboPass\t")
    clamps = _slice_between(text, "static inline int clampu8",
                            "void composite_video_chroma_lowpass")
    audio = _slice_between(text, "static unsigned long long audio_proc_count",
                           "void composite_video_process")
    return "\n".join([_COMMON_PROLOGUE, _AUDIO_PROLOGUE, dbfs, lowpass, hilo,
                      _AUDIO_GLOBALS, clamps, _APPLY_KV, audio, _AUDIO_MAIN])


def _build(tag: str, source: str) -> str:
    os.makedirs(_CACHE_DIR, exist_ok=True)
    digest = hashlib.sha256(source.encode()).hexdigest()[:16]
    exe = os.path.join(_CACHE_DIR, f"{tag}_{digest}")
    if not os.path.exists(exe):
        src_path = exe + ".cpp"
        with open(src_path, "w") as f:
            f.write(source)
        subprocess.run(
            ["g++", "-O2", "-w", "-o", exe, src_path], check=True,
            capture_output=True, text=True)
    return exe


def gen2_exe() -> str:
    return _build("ref_gen2", _compose_gen2())


def gen1_exe() -> str:
    return _build("ref_gen1", _compose_gen1())


def audio_exe() -> str:
    return _build("ref_audio", _compose_audio())


def cassette_exe() -> str:
    return _build("ref_cassette", _compose_cassette())


def posterize_exe() -> str:
    return _build("ref_posterize", _compose_pixel(
        "ffmpeg_posterize.cpp", _POSTERIZE_STUB, _POSTERIZE_MAIN))


def colormap_exe() -> str:
    return _build("ref_colormap", _compose_pixel(
        "ffmpeg_colormap.cpp", _COLORMAP_STUB, _COLORMAP_MAIN,
        start="void take_colormap"))


def colorkey_exe() -> str:
    return _build("ref_colorkey", _compose_pixel(
        "ffmpeg_colorkey.cpp", _COLORKEY_STUB, _COLORKEY_MAIN))


def average_delay_exe() -> str:
    return _build("ref_average_delay", _compose_pixel(
        "ffmpeg_average_delay.cpp", _AVGDELAY_STUB, _AVGDELAY_MAIN))


def vhsled_exe() -> str:
    return _build("ref_vhsled", _compose_vhsled())


def frameblend_exe() -> str:
    return _build("ref_frameblend", _compose_frameblend())


def filmac_exe() -> str:
    return _build("ref_filmac", _compose_filmac())


# --------------------------------------------------------------- whole binary
# The three modern-API reference tools (Makefile.am:5-8) compile UNMODIFIED
# against this host's FFmpeg 5.x dev libraries (they use the send/receive
# API, ffmpeg_vhsled.cpp:599-606). Building the actual binaries — not stage
# excerpts — enables container-in/container-out golden A/B runs
# (tests/test_ref_binary_e2e.py) and real reference-binary baseline timings.

_BINARY_TOOLS = ("ffmpeg_vhsled", "frameblend", "filmac")


def ffmpeg_libs_available() -> bool:
    """True when the FFmpeg dev libraries the reference links are present."""
    if shutil.which("pkg-config") is None or shutil.which("g++") is None:
        return False
    r = subprocess.run(
        ["pkg-config", "--exists", "libavcodec", "libavformat", "libavutil",
         "libswscale", "libswresample"], capture_output=True)
    return r.returncode == 0


def binary_exe(tool: str) -> str:
    """Build the unmodified reference tool binary from REF_DIR, cached by
    source digest like the stage excerpts."""
    assert tool in _BINARY_TOOLS, tool
    src_path = os.path.join(REF_DIR, f"{tool}.cpp")
    source = open(src_path).read()
    os.makedirs(_CACHE_DIR, exist_ok=True)
    digest = hashlib.sha256(source.encode()).hexdigest()[:16]
    exe = os.path.join(_CACHE_DIR, f"bin_{tool}_{digest}")
    if not os.path.exists(exe):
        flags = subprocess.run(
            ["pkg-config", "--cflags", "--libs", "libavcodec", "libavformat",
             "libavutil", "libswscale", "libswresample"],
            check=True, capture_output=True, text=True).stdout.split()
        subprocess.run(
            ["g++", "-O2", "-w", "-o", exe, src_path] + flags + ["-lm"],
            check=True, capture_output=True, text=True)
    return exe


_SCANIMATE_STUB = r"""
#include <cassert>
struct InputFile { int dummy; };
bool input_ntsc = false;
"""

_SCANIMATE_MAIN = r"""
int main(int argc, char **argv) {
    // argv: sw sh dw dh field fieldno input_ntsc
    // stdin: src RGB24   stdout: dst RGB24 (canvas prefilled 0x202020 so
    // the rows-below-`field` keep-previous quirk at :964 is observable)
    int sw = atoi(argv[1]), sh = atoi(argv[2]);
    int dw = atoi(argv[3]), dh = atoi(argv[4]);
    unsigned int field = (unsigned int)atoi(argv[5]);
    unsigned long long fieldno = strtoull(argv[6], NULL, 10);
    input_ntsc = atoi(argv[7]) != 0;
    uint32_t *ibuf; unsigned char *rgb = read_rgb_frame(sw, sh, &ibuf);
    uint32_t *obuf = new uint32_t[(size_t)dw * dh];
    for (long k = 0; k < (long)dw * dh; k++) obuf[k] = 0xFF202020UL;
    AVFrame inf = {sw, sh, {sw*4,0,0,0}, {(unsigned char*)ibuf,0,0,0}};
    AVFrame outf = {dw, dh, {dw*4,0,0,0}, {(unsigned char*)obuf,0,0,0}};
    InputFile fin;
    composite_layer(&outf, &inf, fin, field, fieldno);
    unsigned char *orgb = new unsigned char[(size_t)dw * dh * 3];
    write_rgb_frame(dw, dh, obuf, orgb);
    return 0;
}
"""


def _compose_scanimate() -> str:
    # PRECISION const + phosphor_dot + pixelstep + scanimate_modify_raster
    # + composite_layer (ffmpeg_scanimate.cpp:815-974) in one slice
    text = open(os.path.join(REF_DIR, "ffmpeg_scanimate.cpp")).read()
    kernel = _slice_between(text, "const unsigned int PRECISION", "int main(")
    return "\n".join([_PIXEL_PROLOGUE, _SCANIMATE_STUB, kernel,
                      _SCANIMATE_MAIN])


def scanimate_exe() -> str:
    return _build("ref_scanimate", _compose_scanimate())


_RAW28_STUB = r"""
#include <vector>
#include <list>
#include <string>
#include <cassert>
#include <climits>
#include <unistd.h>
#include <fcntl.h>

struct AVRational { int num, den; };
#define RGBTRIPLET(r,g,b) (((uint32_t)(r) << 16) + ((uint32_t)(g) << 8) + ((uint32_t)(b) << 0))
"""

_RAW28_MAIN = r"""
int main(int argc, char **argv) {
    // argv: nfields [flags: marksig noequ nowequ nosig nosc showsc]
    // stdin: raw 8-bit composite samples at 28.636 MHz
    // stdout: nfields RGB24 frames of output_width x output_height
    int nfields = atoi(argv[1]);
    for (int a = 2; a < argc; a++) {
        if (!strcmp(argv[a], "marksig")) mark_sync = true;
        else if (!strcmp(argv[a], "noequ")) disable_equalization = true;
        else if (!strcmp(argv[a], "nowequ")) disable_wp_equ = true;
        else if (!strcmp(argv[a], "nosig")) disable_sync = true;
        else if (!strcmp(argv[a], "nosc")) disable_subcarrier = true;
        else if (!strcmp(argv[a], "showsc")) show_subcarrier = true;
    }
    NTSC28MHz();
    compute_NTSC();
    // preset_NTSC (:392-398)
    output_field_rate.num = 60000; output_field_rate.den = 1001;
    output_height = 262;
    output_width = (one_scanline_raw_length + 1) & (~1);
    // hsync DC detect setup, verbatim from main (:905-911)
    hsync_dc_detect_delay.resize((size_t)((one_scanline_time * 0.075 * 0.75) * 0.5));
    hsync_dc_detect_delay_i = hsync_dc_detect_delay.begin();
    for (size_t i=0;i < hsync_dc_detect_passes;i++) {
        hsync_dc_detect[i].setFilter(sample_rate,sample_rate / (one_scanline_time * 0.075 * 0.75));
        for (size_t j=0;j < one_frame_time;j++) hsync_dc_detect[i].lowpass(128);
    }
    src_composite.push_back("-");
    if (!open_src()) { fprintf(stderr, "open_src failed\n"); return 1; }

    uint32_t *obuf = new uint32_t[(size_t)output_width * output_height];
    unsigned char *orgb = new unsigned char[(size_t)output_width * output_height * 3];
    AVFrame outf = {output_width, output_height, {output_width*4,0,0,0},
                    {(unsigned char*)obuf,0,0,0}};
    // main render loop shape (:1012-1034) without the encoder
    for (long long current = 0; current < nfields; current++) {
        lazy_flush_src();
        refill_src();
        if (count_src() < (one_scanline_raw_length*256)) {
            close_src();
            break;
        }
        memset(obuf, 0, sizeof(uint32_t)*(size_t)output_width*output_height);
        composite_layer(&outf, (unsigned int)((current & 1) ^ 1),
                        (unsigned long long)current);
        write_rgb_frame(output_width, output_height, obuf, orgb);
    }
    close_src();
    return 0;
}
"""


def _compose_raw28() -> str:
    text = open(os.path.join(REF_DIR, "ffmpeg_raw28ntsc.cpp")).read()
    lowpass = _slice_between(text, "class LowpassFilter", "class HiLoPair")
    machinery = _slice_between(text, "std::list<string>           src_composite",
                               "#define RGBTRIPLET")
    decoder = _slice_between(
        text, "// From cxadc you can't assume specific sample values",
        "int main(")
    return "\n".join([_PIXEL_PROLOGUE, _RAW28_STUB, lowpass, machinery,
                      decoder, _RAW28_MAIN])


def raw28_exe() -> str:
    return _build("ref_raw28", _compose_raw28())


# ------------------------------------------------------------------- drivers

def _kv_args(cfg: dict) -> list[str]:
    return [f"{k}={int(v) if isinstance(v, bool) else v}"
            for k, v in cfg.items()]


def run_gen2(rgb: np.ndarray, field: int, fieldno: int, **cfg) -> np.ndarray:
    """Run the reference composite_layer on an RGB frame [H, W, 3] u8.
    Returns the full frame; only rows y = field, field+2, ... are processed."""
    h, w, _ = rgb.shape
    exe = gen2_exe()
    out = subprocess.run(
        [exe, str(w), str(h), str(field), str(fieldno)] + _kv_args(cfg),
        input=np.ascontiguousarray(rgb, np.uint8).tobytes(),
        stdout=subprocess.PIPE, check=True)
    return np.frombuffer(out.stdout, np.uint8).reshape(h, w, 3).copy()


def run_gen1(y: np.ndarray, u: np.ndarray, v: np.ndarray, field: int,
             fieldno: int, **cfg):
    """Run the reference composite_video_process on 4:2:2 planes
    (y [H, W], u/v [H, W/2], all u8). Returns processed (y, u, v)."""
    h, w = y.shape
    exe = gen1_exe()
    blob = (np.ascontiguousarray(y, np.uint8).tobytes()
            + np.ascontiguousarray(u, np.uint8).tobytes()
            + np.ascontiguousarray(v, np.uint8).tobytes())
    out = subprocess.run(
        [exe, "process", str(w), str(h), str(field), str(fieldno)]
        + _kv_args(cfg),
        input=blob, stdout=subprocess.PIPE, check=True)
    buf = np.frombuffer(out.stdout, np.uint8)
    ny, nc = h * w, h * (w // 2)
    return (buf[:ny].reshape(h, w).copy(),
            buf[ny:ny + nc].reshape(h, w // 2).copy(),
            buf[ny + nc:].reshape(h, w // 2).copy())


def run_audio(samples: np.ndarray, rate: int, **cfg) -> np.ndarray:
    """Run the reference composite_audio_process on [N, C] int16 interleaved
    samples. cfg keys: ntsc, hifi, buzz_db, hiss_db, boost, preemph, deemph,
    highpass, lowpass. Pass hiss_db <= -300 (level truncates to 0): hiss
    consumes libc rand() and is excluded from deterministic crosschecks."""
    n, c = samples.shape
    exe = audio_exe()
    out = subprocess.run(
        [exe, str(c), str(rate), str(n)] + _kv_args(cfg),
        input=np.ascontiguousarray(samples, np.int16).tobytes(),
        stdout=subprocess.PIPE, check=True)
    return np.frombuffer(out.stdout, np.int16).reshape(n, c).copy()


def _rgb_bytes(a: np.ndarray) -> bytes:
    return np.ascontiguousarray(a, np.uint8).tobytes()


def _rgb_from(stdout: bytes, h: int, w: int) -> np.ndarray:
    return np.frombuffer(stdout, np.uint8).reshape(h, w, 3).copy()


def run_posterize(rgb: np.ndarray, threshhold: int) -> np.ndarray:
    h, w, _ = rgb.shape
    out = subprocess.run(
        [posterize_exe(), str(w), str(h), str(threshhold)],
        input=_rgb_bytes(rgb), stdout=subprocess.PIPE, check=True)
    return _rgb_from(out.stdout, h, w)


def run_colormap(map_rgb: np.ndarray, rgb: np.ndarray) -> np.ndarray:
    mh, mw, _ = map_rgb.shape
    h, w, _ = rgb.shape
    out = subprocess.run(
        [colormap_exe(), str(w), str(h), str(mw), str(mh)],
        input=_rgb_bytes(map_rgb) + _rgb_bytes(rgb),
        stdout=subprocess.PIPE, check=True)
    return _rgb_from(out.stdout, h, w)


def run_colorkey(dst: np.ndarray, src: np.ndarray, *, color: int,
                 threshhold: int, invert: bool = False, noisekey: int = 0,
                 fade: int = 0, xdivr: int = 1) -> np.ndarray:
    """dst = persistent canvas, src = keyed layer. noisekey must be 0 for
    deterministic crosschecks (it consumes libc rand())."""
    h, w, _ = src.shape
    out = subprocess.run(
        [colorkey_exe(), str(w), str(h), str(color), str(threshhold),
         str(int(invert)), str(noisekey), str(fade), str(xdivr)],
        input=_rgb_bytes(dst) + _rgb_bytes(src),
        stdout=subprocess.PIPE, check=True)
    return _rgb_from(out.stdout, h, w)


def run_average_delay(dst: np.ndarray, src: np.ndarray, field: int,
                      delay: int, newlevel: int) -> np.ndarray:
    h, w, _ = src.shape
    out = subprocess.run(
        [average_delay_exe(), str(w), str(h), str(field), str(delay),
         str(newlevel)],
        input=_rgb_bytes(dst) + _rgb_bytes(src),
        stdout=subprocess.PIPE, check=True)
    return _rgb_from(out.stdout, h, w)


def run_vhsled(rgb: np.ndarray) -> np.ndarray:
    h, w, _ = rgb.shape
    out = subprocess.run(
        [vhsled_exe(), str(w), str(h)], input=_rgb_bytes(rgb),
        stdout=subprocess.PIPE, check=True)
    return _rgb_from(out.stdout, h, w)


def run_frameblend(frames: np.ndarray, frame_t, current: int, *,
                   framealt: int = 1, fullframealt: bool = False,
                   squelch: bool = False, gamma: float = -1.0) -> np.ndarray:
    """frames: [K, H, W, 3] u8; frame_t: K doubles (passed as hex floats for
    exact parse). Returns the blended output frame for [current, current+1)."""
    k, h, w, _ = frames.shape
    ts = [float(t).hex() for t in frame_t]
    out = subprocess.run(
        [frameblend_exe(), str(w), str(h), str(current), str(framealt),
         str(int(fullframealt)), str(int(squelch)), repr(gamma), str(k)] + ts,
        input=b"".join(_rgb_bytes(f) for f in frames),
        stdout=subprocess.PIPE, check=True)
    return _rgb_from(out.stdout, h, w)


def run_filmac(frames: np.ndarray, gamma: float = -1.0) -> np.ndarray:
    """frames: [K, H, W, 3] u8 sequence (the level IIR carries across
    frames). Returns [K, H, W, 3] rescaled frames."""
    k, h, w, _ = frames.shape
    out = subprocess.run(
        [filmac_exe(), str(w), str(h), repr(gamma), str(k)],
        input=b"".join(_rgb_bytes(f) for f in frames),
        stdout=subprocess.PIPE, check=True)
    return np.frombuffer(out.stdout, np.uint8).reshape(k, h, w, 3).copy()


def run_scanimate(src: np.ndarray, dst_h: int, dst_w: int, field: int,
                  fieldno: int, input_ntsc: bool = True) -> np.ndarray:
    """Run the reference ffmpeg_scanimate composite_layer (:894-974) on one
    [H, W, 3] u8 source frame; returns the [dst_h, dst_w, 3] phosphor
    raster (rows below `field` keep the 0x20 canvas)."""
    h, w, _ = src.shape
    out = subprocess.run(
        [scanimate_exe(), str(w), str(h), str(dst_w), str(dst_h),
         str(field), str(fieldno), str(int(input_ntsc))],
        input=_rgb_bytes(src), stdout=subprocess.PIPE, check=True)
    return _rgb_from(out.stdout, dst_h, dst_w)


def run_raw28(samples: np.ndarray, nfields: int, *flags: str):
    """Run the reference ffmpeg_raw28ntsc decoder (:855-1034 loop shape) on
    a raw uint8 28.6MHz composite sample stream. Returns uint8
    [K, 262, W, 3] where W = (one_scanline_raw_length+1)&~1 = 1820 and
    K <= nfields (the loop stops when fewer than 256 scanlines remain)."""
    out = subprocess.run(
        [raw28_exe(), str(nfields), *flags],
        input=np.ascontiguousarray(samples, np.uint8).tobytes(),
        stdout=subprocess.PIPE, check=True)
    w, h = 1820, 262
    frame_bytes = w * h * 3
    k = len(out.stdout) // frame_bytes
    return np.frombuffer(out.stdout[:k * frame_bytes],
                         np.uint8).reshape(k, h, w, 3).copy()


def run_cassette(samples: np.ndarray, rate: int, **cfg) -> np.ndarray:
    """Run the reference ffmpeg_cassette composite_audio_process (:334-416)
    on [N, C] int16 interleaved samples. cfg keys: head_tilt, waver, mono,
    preemph, deemph, highpass, lowpass, hiss_db (pass <= -300: rand())."""
    n, c = samples.shape
    exe = cassette_exe()
    out = subprocess.run(
        [exe, str(c), str(rate), str(n)] + _kv_args(cfg),
        input=np.ascontiguousarray(samples, np.int16).tobytes(),
        stdout=subprocess.PIPE, check=True)
    return np.frombuffer(out.stdout, np.int16).reshape(n, c).copy()


def run_gen1_blackkey(y, u, v, fy, fu, fv, field: int, fieldno: int,
                      level: int):
    """Run the reference black_key_feedback; returns
    (y, u, v, filt_y, filt_u, filt_v) after keying + filter-frame update."""
    h, w = y.shape
    exe = gen1_exe()
    planes = [y, u, v, fy, fu, fv]
    blob = b"".join(np.ascontiguousarray(p, np.uint8).tobytes()
                    for p in planes)
    out = subprocess.run(
        [exe, "blackkey", str(w), str(h), str(field), str(fieldno),
         f"bkey={level}"],
        input=blob, stdout=subprocess.PIPE, check=True)
    buf = np.frombuffer(out.stdout, np.uint8)
    ny, nc = h * w, h * (w // 2)
    sizes = [ny, nc, nc, ny, nc, nc]
    shapes = [(h, w), (h, w // 2), (h, w // 2)] * 2
    res, pos = [], 0
    for n, shp in zip(sizes, shapes):
        res.append(buf[pos:pos + n].reshape(shp).copy())
        pos += n
    return tuple(res)
