"""Device ops for the sibling pixel tools.

Each function is a pure, jittable transform over RGB frames [H, W, 3] (or a
batch [B, H, W, 3]); stateful tools (delay rings, feedback canvases) thread
their state explicitly.

Reference semantics:
- posterize       ffmpeg_posterize.cpp:789-813 (bitwise AND mask, not
                  levels+rescale — rationale comment :2-5)
- colormap        ffmpeg_colormap.cpp:785-822 (256-entry LUT from the middle
                  scanline of a map image, indexed by the green channel)
- colorkey        ffmpeg_colorkey.cpp:832-887 (|dR|+|dG|+|dB| threshold vs a
                  key color, -inv, -noise punch-through, -xd horizontal
                  subsampled decisions, -f fade for feedback trails)
- average_delay   ffmpeg_average_delay.cpp:801-838 (temporal blend with
                  ordered dither ((x^y)+efield)&3)
- scanimate       ffmpeg_scanimate.cpp:817-985 (CRT phosphor-dot re-render
                  with 4 cycling raster-warp effects)
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from cvsim_tpu.ops.cmath import c_div


# ------------------------------------------------------------------ posterize

def posterize(rgb, threshhold: int):
    """out = channel & ((0xFF << (8 - thr)) & 0xFF)."""
    shr = 8 - threshhold
    mask = (0xFF << shr) & 0xFF
    return jnp.asarray(rgb, jnp.int32) & mask


# ------------------------------------------------------------------- colormap

def take_colormap(map_rgb) -> np.ndarray:
    """Build the 256-entry LUT from the middle scanline of a map image
    (take_colormap, ffmpeg_colormap.cpp:785-799). Host-side numpy."""
    map_rgb = np.asarray(map_rgb)
    h, w, _ = map_rgb.shape
    row = map_rgb[h // 2]
    idx = (np.arange(256) * w) // 256
    return row[idx].astype(np.int32)  # [256, 3]


def colormap_apply(rgb, lut):
    """Map the green channel through the LUT (ffmpeg_colormap.cpp:802-822)."""
    g = jnp.asarray(rgb, jnp.int32)[..., 1]
    return jnp.take(jnp.asarray(lut, jnp.int32), g, axis=0)


# ------------------------------------------------------------------- colorkey

def colorkey_apply(dst, src, key, *, color: tuple, threshhold: int,
                   invert: bool = False, noisekey: int = 0, fade: int = 0,
                   xdivr: int = 1):
    """One layer of retro color keying over a persistent canvas.

    dst, src: int32 [H, W, 3]. Returns the new canvas (which is also the
    output frame — the delay ring lives in the caller).
    """
    dst = jnp.asarray(dst, jnp.int32)
    src = jnp.asarray(src, jnp.int32)
    kc = jnp.asarray(color, jnp.int32)
    d = jnp.abs(src - kc).sum(axis=-1)  # [H, W]

    if xdivr > 1:
        # decision made on every xdivr'th pixel and held ("older equipment")
        w = d.shape[-1]
        held = d[..., (np.arange(w) // xdivr) * xdivr]
        d = held

    if noisekey > 0:
        r = jax.random.randint(key, d.shape, 0, 20001)
        d = jnp.where(r < noisekey, 0xFFFF, d)

    if fade != 0:
        dst = (dst * (256 - fade)) >> 8

    if invert:
        keyed = d < threshhold
    else:
        keyed = d >= threshhold
    return jnp.where(keyed[..., None], src, dst)


# -------------------------------------------------------------- average_delay

def average_delay_blend(dst, src, field: int, *, newlevel: int, delay: int):
    """out = (src*n + dst*(256-n) + dither) >> 8 with ordered dither
    (((x^y)+efield)&3)*255/3 (ffmpeg_average_delay.cpp:817-838)."""
    dst = jnp.asarray(dst, jnp.int32)
    src = jnp.asarray(src, jnp.int32)
    h, w = dst.shape[:2]
    efield = field // delay
    xs = np.arange(w)[None, :]
    ys = np.arange(h)[:, None]
    dither = c_div((((jnp.asarray(xs ^ ys, jnp.int32) + efield) & 3) * 255), 3)
    acc = src * newlevel + dst * (256 - newlevel) + dither[..., None]
    return acc >> 8


# ----------------------------------------------------------------- scanimate

def _scanimate_warp(sx, sy, signal, fieldno, frame_t):
    """The 4 cycling built-in effects (scanimate_modify_raster,
    ffmpeg_scanimate.cpp:859-894). Vectorized over the dot arrays."""
    effect_idx = fieldno // (60 * 3)
    ef_field = fieldno - effect_idx * (60 * 3)
    effect = effect_idx % 4
    two_pi = 2.0 * jnp.pi

    def trapezoid(sx, sy, sig):
        ef_t = ef_field / (60.0 * 3.0)
        k = (((sy + 1.0) / 2.0) * (1.0 - ef_t)) + ef_t
        return sx * k, sy, sig * k

    def vrotate(sx, sy, sig):
        ef_t = ef_field / (60.0 * 3.0)
        return sx, sy * (1.0 - ef_t * 2.0), sig * jnp.abs(1.0 - ef_t * 2.0)

    def vstretch(sx, sy, sig):
        ef_t = ef_field / (60.0 * 3.0)
        return sx, sy * (1.0 + ef_t * 12.0), sig

    def diffuse(sx, sy, sig):
        ef_t = jnp.sin(ef_field * two_pi / 59.94)
        return (sx + jnp.sin(frame_t * two_pi * 6) * ef_t * 0.1,
                sy + jnp.cos(frame_t * two_pi * 6) * ef_t * 0.1, sig)

    return jax.lax.switch(effect.astype(jnp.int32),
                          [trapezoid, vrotate, vstretch, diffuse],
                          sx, sy, signal)


def scanimate_field(src_rgb, dst_h: int, dst_w: int, field: int, fieldno,
                    input_ntsc: bool = False, precision: int = 1):
    """Re-render a source frame as CRT phosphor dots at warped positions
    (composite_layer, ffmpeg_scanimate.cpp:894-985).

    Returns a grayscale int32 [dst_h, dst_w] raster (>>precision, clamped at
    255 by the caller's RGB packing).
    """
    src = jnp.asarray(src_rgb, jnp.int32)
    src_h, src_w = src.shape[:2]
    ystep = 2 if input_ntsc else 1
    y0 = field if input_ntsc else 0

    ys = np.arange(y0, src_h, ystep)
    xs = np.arange(src_w << precision)
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    n = yy.size
    yy = yy.reshape(-1)
    xx = xx.reshape(-1)

    sx = (xx * 2.0) / (src_w << precision) - 1.0
    sy = (yy * 2.0) / src_h - 1.0
    sy = sy + ((xx * float(ystep)) / (src_w << precision)) / src_h  # CRT slant

    if input_ntsc:
        dot_radius = (dst_h * 2.05) / src_h
    else:
        dot_radius = (dst_h * 1.05) / src_h

    g = src[yy, xx >> precision, 1].astype(jnp.float32) / 255.0
    frame_t = (yy * src_w * (1 << precision) + xx).astype(np.float64) / (
        src_w * src_h * (1 << precision))

    sigscal = (dst_w / src_w) * (dst_h / src_h) * 0.9
    sxj = jnp.asarray(sx, jnp.float32)
    syj = jnp.asarray(sy, jnp.float32)
    sxj, syj, sig = _scanimate_warp(sxj, syj, g, jnp.asarray(fieldno),
                                    jnp.asarray(frame_t, jnp.float32))
    radius = jnp.maximum(jnp.float32(dot_radius), 1.2)
    sig = jnp.clip(sig * sigscal, 0.0, 32.0) / radius

    # screen coords
    px = (sxj + 1.0) * dst_w / 2.0
    py = (syj + 1.0) * dst_h / 2.0

    # splat each dot over a fixed stamp around its center (cone falloff,
    # additive). stamp size covers ceil(2*radius)+2.
    r_int = int(np.ceil(float(dot_radius if dot_radius > 1.2 else 1.2)))
    offs = np.arange(-r_int, r_int + 2)
    raster = jnp.zeros((dst_h * dst_w,), jnp.int32)
    base_x = jnp.floor(px).astype(jnp.int32)
    base_y = jnp.floor(py).astype(jnp.int32)
    for dy in offs:
        for dx in offs:
            ix = base_x + dx
            iy = base_y + dy
            ddx = ix.astype(jnp.float32) - px
            ddy = iy.astype(jnp.float32) - py
            fv = sig * ((radius - jnp.sqrt(ddx * ddx + ddy * ddy)) / radius)
            val = (fv * 255.0).astype(jnp.int32)
            ok = (fv > 0) & (ix >= 0) & (ix < dst_w) & (iy >= 0) & (iy < dst_h)
            flat = jnp.where(ok, iy * dst_w + ix, 0)
            raster = raster.at[flat].add(jnp.where(ok, val, 0))
    return (raster >> precision).reshape(dst_h, dst_w)


def scanimate_pack(raster):
    """Clamp the accumulated raster and expand to gray RGB
    (ffmpeg_scanimate.cpp:966-973)."""
    v = jnp.clip(raster, 0, 255).astype(jnp.int32)
    return jnp.stack([v, v, v], axis=-1)
