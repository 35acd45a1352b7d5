// Native host-pixel kernels for the restore / sibling tools' per-frame CLI
// loops (ffmpeg_vhsled.cpp:866-928, frameblend.cpp:1032-1081,
// filmac.cpp:886-1009, and the frame_copy_scale role of
// ffmpeg_ntsc.cpp:544-607).
//
// Each function is the BIT-EXACT twin of a numpy implementation
// (host/colorconv.py scale_frame_to_np / rgb_to_yuv601_np,
// models/tools_np.py) — same float32 operation order, round-half-to-even
// via rintf (numpy round), numpy floor-division semantics where the numpy
// twin uses `//` on possibly-negative int64.  tests/test_hostpix.py asserts
// element-for-element equality on random frames.  Compile WITHOUT
// -ffast-math and WITH -ffp-contract=off: FMA contraction would change the
// f32 results.

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>

extern "C" {

// ------------------------------------------------------------------ helpers

static inline int32_t clip_round_255(float x) {
  float r = rintf(x);                    // numpy round: half-to-even
  if (r < 0.0f) return 0;
  if (r > 255.0f) return 255;
  return (int32_t)r;
}

static inline int64_t floordiv64(int64_t a, int64_t b) {
  // numpy // on int64 (b > 0 in every caller)
  int64_t q = a / b;
  if ((a % b) != 0 && ((a < 0) != (b < 0))) q--;
  return q;
}

// Grow-only per-thread scratch: a fresh malloc/free of the multi-MB frame
// temporaries per call returns the pages to the OS each time (mmap-backed)
// and re-faults them on the next frame — ~8 ms/frame of soft page faults
// in the CLI loops.
static void *scratch(int slot, size_t bytes) {
  static thread_local void *bufs[4] = {nullptr, nullptr, nullptr, nullptr};
  static thread_local size_t caps[4] = {0, 0, 0, 0};
  if (caps[slot] < bytes) {
    free(bufs[slot]);
    bufs[slot] = malloc(bytes);
    caps[slot] = bytes;
  }
  return bufs[slot];
}

// ------------------------------------------------- yuv -> rgb + scale fused
// scale_frame_to_np: chroma repeat-upsample, yuv_to_rgb601_np at source
// resolution, horizontal f32 lerp, vertical f32 lerp.  hx*/vx*/hf/vf are
// host/batching.hscale_consts arrays (passed in so the constants are the
// same float64->float32 values the numpy/jax paths use); has_h/has_v are 0
// for identity (src == dst) axes, matching hscale_consts returning None.
void cvsim_scale_frame(const uint8_t *y, const uint8_t *u, const uint8_t *v,
                       long sh, long sw, long ch, long cw,
                       long dh, long dw,
                       const int64_t *hx0, const int64_t *hx1,
                       const float *hf, int has_h,
                       const int64_t *vx0, const int64_t *vx1,
                       const float *vf, int has_v,
                       int32_t *out) {
  const float cy = (float)(255.0 / 219.0);
  const float crv = (float)(1.402 * (255.0 / 224.0));
  const float cgu = (float)(0.344136 * (255.0 / 224.0));
  const float cgv = (float)(0.714136 * (255.0 / 224.0));
  const float cbu = (float)(1.772 * (255.0 / 224.0));
  const long ky = sh / ch, kx = sw / cw;

  int32_t *rgb = (int32_t *)scratch(0, (size_t)sh * sw * 3 * sizeof(int32_t));
  float *urow = (float *)scratch(2, 2 * sw * sizeof(float));
  float *vrow = urow + sw;
  long prev_crow = -1;
  for (long r = 0; r < sh; r++) {
    const uint8_t *yr = y + r * sw;
    long crow = r / ky;
    if (crow != prev_crow) {   // expand the chroma row once per ky rows
      const uint8_t *ur = u + crow * cw, *vr = v + crow * cw;
      for (long cx = 0; cx < cw; cx++) {
        float uf = (float)ur[cx] - 128.0f, vf_ = (float)vr[cx] - 128.0f;
        for (long j = 0; j < kx; j++) {
          urow[cx * kx + j] = uf;
          vrow[cx * kx + j] = vf_;
        }
      }
      prev_crow = crow;
    }
    int32_t *o = rgb + r * sw * 3;
    for (long x = 0; x < sw; x++) {
      float yf = ((float)yr[x] - 16.0f) * cy;
      float uf = urow[x], vf_ = vrow[x];
      o[x * 3 + 0] = clip_round_255(yf + crv * vf_);
      o[x * 3 + 1] = clip_round_255((yf - cgu * uf) - cgv * vf_);
      o[x * 3 + 2] = clip_round_255(yf + cbu * uf);
    }
  }

  // horizontal pass: int32 -> f32 lerp -> rint -> int32
  int32_t *mid;
  if (has_h) {
    mid = (int32_t *)scratch(1, (size_t)sh * dw * 3 * sizeof(int32_t));
    for (long r = 0; r < sh; r++) {
      const int32_t *p = rgb + r * sw * 3;
      int32_t *o = mid + r * dw * 3;
      for (long x = 0; x < dw; x++) {
        const int32_t *s0 = p + hx0[x] * 3, *s1 = p + hx1[x] * 3;
        float f = hf[x];
        for (int c = 0; c < 3; c++) {
          float a = (float)s0[c];
          o[x * 3 + c] = (int32_t)rintf(a + ((float)s1[c] - a) * f);
        }
      }
    }
  } else {
    mid = rgb;   // dw == sw
  }

  // vertical pass
  if (has_v) {
    for (long r = 0; r < dh; r++) {
      const int32_t *s0 = mid + vx0[r] * dw * 3;
      const int32_t *s1 = mid + vx1[r] * dw * 3;
      float f = vf[r];
      int32_t *o = out + r * dw * 3;
      for (long k = 0; k < dw * 3; k++) {
        float a = (float)s0[k];
        o[k] = (int32_t)rintf(a + ((float)s1[k] - a) * f);
      }
    }
  } else {
    memcpy(out, mid, (size_t)dh * dw * 3 * sizeof(int32_t));
  }
}

// ------------------------------------------------------------- rgb -> yuv
// rgb_to_yuv601_np on an int32 interleaved RGB frame, full-resolution
// uint8 planes out (the caller subsamples chroma by slicing).
void cvsim_rgb_to_yuv(const int32_t *rgb, long h, long w,
                      uint8_t *yo, uint8_t *uo, uint8_t *vo) {
  const float k601 = (float)(219.0 / 255.0);
  const float kc = (float)(224.0 / 255.0);
  for (long i = 0; i < h * w; i++) {
    float rf = (float)rgb[i * 3 + 0];
    float gf = (float)rgb[i * 3 + 1];
    float bf = (float)rgb[i * 3 + 2];
    float yl = (0.299f * rf + 0.587f * gf) + 0.114f * bf;
    yo[i] = (uint8_t)clip_round_255(yl * k601 + 16.0f);
    uo[i] = (uint8_t)clip_round_255((bf - yl) / 1.772f * kc + 128.0f);
    vo[i] = (uint8_t)clip_round_255((rf - yl) / 1.402f * kc + 128.0f);
  }
}

// ---------------------------------------------------------------- vhsled
// tools_np.vhsled_dejitter: per-row left-edge jitter estimate (first run
// of 9 consecutive "non-blackish vs the row's first-pixel blue" pixels,
// ffmpeg_vhsled.cpp:866-928 incl. the blue-channel quirk), 9-row 16.16
// smoothing for interior rows, then a per-row left roll that keeps the
// original tail.  rgb int32 interleaved, in place on `out` (copy of in).
void cvsim_vhsled_dejitter(const int32_t *f, long h, long w, int32_t *out) {
  int64_t *adj = (int64_t *)malloc(h * sizeof(int64_t));
  for (long r = 0; r < h; r++) {
    const int32_t *row = f + r * w * 3;
    int32_t ref_blue = row[2];
    long start = -1;
    int run = 0;
    for (long x = 0; x < w; x++) {
      int nb = (row[x * 3 + 0] - ref_blue >= 16)
            || (row[x * 3 + 1] - ref_blue >= 16)
            || (row[x * 3 + 2] - ref_blue >= 16);
      if (nb) {
        if (++run == 9) { start = x - 8; break; }
      } else {
        run = 0;
      }
    }
    adj[r] = (start >= 0 ? start : w) << 16;
  }

  memcpy(out, f, (size_t)h * w * 3 * sizeof(int32_t));
  for (long r = 0; r < h; r++) {
    int64_t a = adj[r];
    if (r >= 4 && r < h - 4) {
      int64_t s = 0;
      for (long k = -4; k <= 4; k++) s += adj[r + k];
      a = (s + 5) / 9;              // operands >= 0: trunc == floor
    }
    int64_t x = (a + 0x8000) >> 16;
    if (x < 0) x = 0;
    long shift = (x >= w / 2) ? 0 : (long)x;
    if (shift > 0)
      memmove(out + r * w * 3, f + (r * w + shift) * 3,
              (size_t)(w - shift) * 3 * sizeof(int32_t));
  }
  free(adj);
}

// -------------------------------------------------------------- frameblend
// tools_np.frameblend_mix: int64 16.16 weighted sum of k frames, optional
// gamma LUTs (decode int64[256] -> 16.16-ish domain, encode int64[8193]
// -> 0..255).  Takes an array of per-frame pointers (no stacked copy) and
// accumulates frame-major so each pass streams one contiguous frame.
void cvsim_frameblend_mix(const int32_t **frames, long k, long h, long w,
                          const int64_t *w16,
                          const int64_t *gdec, const int64_t *genc,
                          int32_t *out) {
  long n = h * w * 3;
  int64_t *acc = (int64_t *)scratch(0, (size_t)n * sizeof(int64_t));
  for (long j = 0; j < k; j++) {
    const int32_t *f = frames[j];
    int64_t wj = w16[j];
    // fold the gamma decode into a per-frame weighted LUT: w*gdec[pv] is a
    // pure function of the 0..255 input value
    int64_t lut[256];
    if (gdec) {
      for (int pv = 0; pv < 256; pv++) lut[pv] = wj * gdec[pv];
    }
    if (j == 0) {
      if (gdec) for (long i = 0; i < n; i++) acc[i] = lut[f[i]];
      else      for (long i = 0; i < n; i++) acc[i] = wj * f[i];
    } else {
      if (gdec) for (long i = 0; i < n; i++) acc[i] += lut[f[i]];
      else      for (long i = 0; i < n; i++) acc[i] += wj * f[i];
    }
  }
  for (long i = 0; i < n; i++) {
    int64_t a = acc[i] >> 16;
    if (genc) {
      int64_t idx = a < 0 ? 0 : (a > 8192 ? 8192 : a);
      a = genc[idx];
    }
    out[i] = (int32_t)(a < 0 ? 0 : (a > 255 ? 255 : a));
  }
}

// ------------------------------------------------------------------ filmac
// tools_np.filmac_measure: per-pixel channel min/max << 16 (after optional
// gamma decode), block-mean minima over 128x128 blocks of the [minx,maxx)
// band, max over the x-clipped band.  Returns minv/maxv via pointers.
void cvsim_filmac_measure(const int32_t *rgb, long h, long w,
                          const int64_t *gdec,
                          int64_t *minv_out, int64_t *maxv_out) {
  int64_t scaleto = gdec ? (int64_t)0x10000 * 8192 : (int64_t)0x10000 * 256;
  long minx = (w * 15) / 100, maxx = (w * 90) / 100;
  int64_t minv = scaleto * 6 / 10;
  int64_t maxv = scaleto * 4 / 10;
  const long bl = 128;
  long xe = minx + ((maxx - minx + bl - 1) / bl) * bl;
  if (xe > w) xe = w;

  int64_t *pmin = (int64_t *)scratch(3, (size_t)h * w * sizeof(int64_t));
  for (long i = 0; i < h * w; i++) {
    int64_t a = rgb[i * 3], b = rgb[i * 3 + 1], c = rgb[i * 3 + 2];
    if (gdec) { a = gdec[a]; b = gdec[b]; c = gdec[c]; }
    int64_t mn = a < b ? a : b; mn = mn < c ? mn : c;
    int64_t mx = a > b ? a : b; mx = mx > c ? mx : c;
    pmin[i] = mn << 16;
    long x = i % w;
    if (x >= minx && x < xe) {
      int64_t pmax = mx << 16;
      if (pmax > maxv) maxv = pmax;
    }
  }

  for (long y0 = 0; y0 < h; y0 += bl) {
    long y1 = y0 + bl < h ? y0 + bl : h;
    for (long x0 = minx; x0 < maxx; x0 += bl) {
      long x1 = x0 + bl < w ? x0 + bl : w;
      int64_t s = 0;
      long grd = (y1 - y0) * (x1 - x0);
      for (long yy = y0; yy < y1; yy++)
        for (long xx = x0; xx < x1; xx++) s += pmin[yy * w + xx];
      int64_t m = (s + grd / 2) / grd;   // operands >= 0
      if (m < minv) minv = m;
    }
  }
  if (minv == maxv) maxv += 1;
  *minv_out = minv;
  *maxv_out = maxv;
}

// tools_np.filmac_rescale: (v<<16 - minv) * scaleto // span with numpy
// floor division (operand can be negative), clamp to int32, >>16, >=0,
// optional gamma encode, clip 0..255.
void cvsim_filmac_rescale(const int32_t *rgb, long h, long w,
                          int64_t minv, int64_t maxv, int64_t scaleto,
                          const int64_t *gdec, const int64_t *genc,
                          int32_t *out) {
  int64_t span = maxv - minv;
  if (span < 1) span = 1;
  // LUT over the 256 (or 8193 post-gamma-decode) input values: the rescale
  // is per-value, so precompute instead of per-pixel 64-bit divides
  long nvals = 256;
  int32_t lut[256];
  for (long pv = 0; pv < nvals; pv++) {
    int64_t base = gdec ? gdec[pv] : pv;
    int64_t v = floordiv64(((base << 16) - minv) * scaleto, span);
    if (v < -0x7FFFFFFFLL) v = -0x7FFFFFFFLL;
    if (v > 0x7FFFFFFFLL) v = 0x7FFFFFFFLL;
    v >>= 16;
    if (v < 0) v = 0;
    if (genc) {
      int64_t idx = v > 8192 ? 8192 : v;
      v = genc[idx];
    }
    lut[pv] = (int32_t)(v < 0 ? 0 : (v > 255 ? 255 : v));
  }
  long n = h * w * 3;
  for (long i = 0; i < n; i++) out[i] = lut[rgb[i]];
}

}  // extern "C"
