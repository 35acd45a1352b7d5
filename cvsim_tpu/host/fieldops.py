"""Field rendering and frame packing (reference L4).

- render_field: the custom vertical scaler with 8-bit fractional
  interpolation, 4:2:0-vs-4:2:2 chroma siting and interlaced source field
  selection (ffmpeg_to_composite.cpp:1001-1129). The reference rolls its own
  because "libswscale does NOT do proper 4:2:0 to 4:2:2 interlaced
  conversion" (:1711-1714).
- bob/interlace packers (output_frame, :1131-1250).

Implemented as vectorized index math over the output-line axis; runs under
jit (row gathers over the tiny line axis only).
"""

from __future__ import annotations

import numpy as np

# jax import is lazy (inside the device functions): batching.py pulls
# render_field_indices from here on the jax-free sibling-tool CLI path


def _field_rows(dst_height: int, parity: int) -> np.ndarray:
    return np.arange(parity, dst_height, 2)


def render_field_indices(
    dst_height: int,
    src_height: int,
    chroma_height: int,
    parity: int,
    *,
    src_interlaced: bool = False,
    src_top_field_first: bool = True,
    pts_delta: int = 0,
    ticks_per_frame: int = 2,
):
    """Compute (luma_idx1, luma_idx2, luma_frac, chroma_idx1, chroma_idx2,
    chroma_frac) numpy arrays for one field's output rows — the index math of
    render_field (ffmpeg_to_composite.cpp:1019-1086)."""
    ys = _field_rows(dst_height, parity)
    sy_fix = (ys * 0x100 * src_height) // dst_height
    syf = sy_fix & 0xFF
    sy = sy_fix >> 8

    is420 = chroma_height != src_height
    csy = sy.copy()
    csyf = syf.copy()
    if is420:
        csyf = np.where((csy & 1) == 0, 0, csyf)
        csy >>= 1

    if src_interlaced:
        which = 0 if src_top_field_first else 1
        if pts_delta >= ticks_per_frame // 2:
            which ^= 1
        if which == 0:
            sy = sy + 1
            even = (sy & 1) == 0
            syf = np.where(even, 0, syf)
            sy = np.where(even, sy, sy - 1)
            csy = csy + 1
            ceven = (csy & 1) == 0
            csyf = np.where(ceven, 0, csyf)
            csy = np.where(ceven, csy, csy - 1)
        else:
            odd_fix = (sy & 1) == 0
            syf = np.where(odd_fix, 0, syf)
            sy = np.where(odd_fix, sy + 1, sy)
            codd_fix = (csy & 1) == 0
            csyf = np.where(codd_fix, 0, csyf)
            csy = np.where(codd_fix, csy + 1, csy)
        over = sy >= (src_height - 2)
        sy = np.where(over, src_height - 2, sy)
        syf = np.where(over, 0, syf)
        sy2 = sy + 2
        cover = csy >= (chroma_height - 2)
        csy = np.where(cover, chroma_height - 2, csy)
        csyf = np.where(cover, 0, csyf)
        csy2 = csy + 1
    else:
        over = sy >= (src_height - 1)
        sy = np.where(over, src_height - 1, sy)
        syf = np.where(over, 0, syf)
        sy2 = sy + 1
        cover = csy >= (chroma_height - 1)
        csy = np.where(cover, chroma_height - 1, csy)
        csyf = np.where(cover, 0, csyf)
        csy2 = csy + 1

    if not is420:
        # the reference's non-420 blend loop (:1109-1126) indexes ALL three
        # planes with the LUMA rows — csy/csy2/csyf are computed but only
        # consumed on the 420 path (:1102-1107). In particular interlaced
        # 4:2:2 chroma steps by 2 (same field), not 1.
        csy, csy2, csyf = sy, sy2, syf
    return sy, sy2, syf, csy, csy2, csyf


def _interp_rows(plane, i1, i2, frac):
    """d = s1 + ((s2 - s1) * frac >> 8), exactly as the reference's 8-bit
    interpolation (:1098-1099)."""
    import jax.numpy as jnp

    p = jnp.asarray(plane, jnp.int32)
    s1 = jnp.take(p, jnp.asarray(i1), axis=0)
    s2 = jnp.take(p, jnp.asarray(i2), axis=0)
    f = jnp.asarray(frac, jnp.int32)[:, None]
    return s1 + (((s2 - s1) * f) >> 8)


def render_field(
    y_src, u_src, v_src,
    dst_height: int,
    parity: int,
    *,
    src_interlaced: bool = False,
    src_top_field_first: bool = True,
    pts_delta: int = 0,
    ticks_per_frame: int = 2,
):
    """Render one field's [L, W] (and chroma [L, Wc]) planes from a source
    frame, reproducing render_field's vertical scaling. The source chroma may
    be 4:2:0 (Hc = H/2) or 4:2:2 (Hc = H); output is always field lines of a
    4:2:2 raster."""
    src_h = y_src.shape[0]
    chroma_h = u_src.shape[0]
    sy, sy2, syf, csy, csy2, csyf = render_field_indices(
        dst_height, src_h, chroma_h, parity,
        src_interlaced=src_interlaced,
        src_top_field_first=src_top_field_first,
        pts_delta=pts_delta, ticks_per_frame=ticks_per_frame)
    y = _interp_rows(y_src, sy, sy2, syf)
    u = _interp_rows(u_src, csy, csy2, csyf)
    v = _interp_rows(v_src, csy, csy2, csyf)
    return y, u, v


# ------------------------------------------------------------------ packers

def bob_rows(height: int, parity: int, interlaced_output: bool = False) -> np.ndarray:
    """Row selection of the bob filter (output_frame, :1178-1235):
    field=1 -> 1,1,3,3,5..., field=0 -> 0,2,2,4,4...; rows beyond the frame
    step back two."""
    ys = np.arange(height)
    if interlaced_output:
        sy = ys
    elif parity:
        sy = ys | 1
    else:
        sy = (ys + 1) & ~1
    return np.where(sy >= height, sy - 2, sy)


def pack_bob_420(y_422, u_422, v_422, parity: int):
    """Full-rate progressive bob output in 4:2:0 (the reference default,
    :1198-1235): duplicate the active field's rows, then take every other
    chroma row."""
    import jax.numpy as jnp

    h = y_422.shape[0]
    rows = bob_rows(h, parity)
    y = jnp.take(jnp.asarray(y_422), jnp.asarray(rows), axis=0)
    u = jnp.take(jnp.asarray(u_422), jnp.asarray(rows[0::2]), axis=0)
    v = jnp.take(jnp.asarray(v_422), jnp.asarray(rows[0::2]), axis=0)
    return y, u, v


def pack_interlaced_420(y_422, u_422, v_422):
    """Interlaced 4:2:0 output (-vi, :1215-1224): chroma rows interleave the
    two fields' chroma: cy = (y&1) + ((y&~3)>>1) for rows with (y&2)==0."""
    import jax.numpy as jnp

    h = y_422.shape[0]
    ys = np.arange(0, h, 1)
    sel = ys[(ys & 2) == 0]
    cy = (sel & 1) + ((sel & ~3) >> 1)
    u = jnp.zeros((h // 2, u_422.shape[1]), jnp.int32)
    v = jnp.zeros((h // 2, v_422.shape[1]), jnp.int32)
    u = u.at[jnp.asarray(cy)].set(jnp.take(jnp.asarray(u_422), jnp.asarray(sel), axis=0))
    v = v.at[jnp.asarray(cy)].set(jnp.take(jnp.asarray(v_422), jnp.asarray(sel), axis=0))
    return jnp.asarray(y_422), u, v


def interleave_fields(top, bottom):
    """[L, W] x 2 -> [2L, W] frame (top rows at even indices)."""
    import jax.numpy as jnp

    l, w = top.shape[-2:]
    out = jnp.empty(top.shape[:-2] + (2 * l, w), top.dtype)
    out = out.at[..., 0::2, :].set(top)
    out = out.at[..., 1::2, :].set(bottom)
    return out


def split_fields(frame):
    """[H, W] -> (top [H/2, W], bottom [H/2, W])."""
    return frame[..., 0::2, :], frame[..., 1::2, :]
