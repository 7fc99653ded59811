"""Sixel 256-color quantization + Floyd-Steinberg dithering.

The reference delegates this to libsixel with
``sixel_dither_new(256)`` + ``sixel_dither_initialize(..., SIXEL_LARGE_LUM,
SIXEL_REP_AVERAGE_COLORS, SIXEL_QUALITY_AUTO)`` + ``sixel_encode``
(ref src/sixel-canvas.cc:134-148). Here both halves are native:

* **Median-cut palette** (host, numpy): netpbm-style median cut as in
  libsixel's quant.c — box choice by pixel count, split axis by
  luminosity-weighted spread (LARGE_LUM), split at the frequency median,
  representative = unweighted mean of the box's distinct colors
  (REP_AVERAGE_COLORS).

* **Floyd-Steinberg dither** (device): FS error diffusion is a serial
  recurrence — pixel (y,x) receives error from (y,x-1), (y-1,x-1),
  (y-1,x), (y-1,x+1) with weights 7/16, 1/16, 5/16, 3/16. TPU-native
  formulation: skew the image to S[y, t] with t = x + 2y; then every
  antidiagonal t is data-independent and the recurrence becomes a
  ``lax.scan`` over skewed columns, vectorized over all rows and the
  whole frame batch on the VPU, with the nearest-palette search as a
  [rows, 256] distance matmul per step on the MXU. Sequential steps drop
  from H*W to W + 2H.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Luminosity proportions used by LARGE_LUM axis choice (netpbm/libsixel).
_LUM = np.array([0.2989, 0.5866, 0.1145], dtype=np.float64)


# --------------------------------------------------------------------------
# Palette construction (host)
# --------------------------------------------------------------------------

def median_cut_palette(pixels: np.ndarray, n_colors: int = 256) -> np.ndarray:
    """Build an [n, 3] uint8 palette from [..., 3] uint8 pixels."""
    flat = pixels.reshape(-1, 3)
    colors, counts = np.unique(
        flat.view([("", "u1"), ("", "u1"), ("", "u1")]).reshape(-1),
        return_counts=True)
    colors = colors.view(np.uint8).reshape(-1, 3).astype(np.int64)

    if len(colors) <= n_colors:
        pal = np.zeros((max(len(colors), 1), 3), dtype=np.uint8)
        pal[: len(colors)] = colors
        return pal

    # box: (indices into colors,)
    boxes = [np.arange(len(colors))]
    while len(boxes) < n_colors:
        # split the box with the most pixels (sum of counts)
        sums = [counts[b].sum() for b in boxes]
        order = int(np.argmax(sums))
        box = boxes[order]
        if len(box) == 1:
            # largest box unsplittable: pick largest splittable
            splittable = [i for i, b in enumerate(boxes) if len(b) > 1]
            if not splittable:
                break
            order = max(splittable, key=lambda i: counts[boxes[i]].sum())
            box = boxes[order]

        # LARGE_LUM: dimension with largest luminosity-weighted spread
        spreads = (colors[box].max(axis=0) - colors[box].min(axis=0)) * _LUM
        dim = int(np.argmax(spreads))

        # sort by that component and split at the frequency median
        srt = box[np.argsort(colors[box, dim], kind="stable")]
        csum = np.cumsum(counts[srt])
        half = csum[-1] / 2.0
        cut = int(np.searchsorted(csum, half)) + 1
        cut = min(max(cut, 1), len(srt) - 1)
        boxes[order] = srt[:cut]
        boxes.append(srt[cut:])

    pal = np.zeros((n_colors, 3), dtype=np.uint8)
    for i, box in enumerate(boxes):
        # REP_AVERAGE_COLORS: unweighted mean of distinct colors
        pal[i] = (colors[box].sum(axis=0) / len(box) + 0.5).astype(np.uint8)
    return pal[: len(boxes)]


# --------------------------------------------------------------------------
# Nearest-color (no dither) and FS dither
# --------------------------------------------------------------------------

def _palette_tables(palette: np.ndarray):
    p = palette.astype(np.float32)
    return jnp.asarray(p), jnp.asarray((p * p).sum(axis=1))


@functools.partial(jax.jit, static_argnames=())
def nearest_indices(frames_rgb: jax.Array, palette: jax.Array) -> jax.Array:
    """argmin_c ||pix - pal_c||^2 via the |p|^2 - 2 p.c + |c|^2 matmul."""
    x = frames_rgb.astype(jnp.float32)
    p = palette.astype(jnp.float32)                       # [N,3]
    dots = jnp.einsum("...c,nc->...n", x, p,
                      preferred_element_type=jnp.float32)  # MXU
    d = (p * p).sum(axis=1) - 2.0 * dots
    return jnp.argmin(d, axis=-1).astype(jnp.int32)


def fs_dither_reference(rgb: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """Scalar host reference of the FS recurrence (for tests and as the
    semantics spec of the device kernel). rgb: [H, W, 3] uint8."""
    h, w, _ = rgb.shape
    pal = palette.astype(np.float32)
    buf = rgb.astype(np.float32)
    out = np.zeros((h, w), dtype=np.int32)
    for y in range(h):
        for x in range(w):
            v = np.clip(buf[y, x], 0.0, 255.0)
            idx = int(((pal - v) ** 2).sum(axis=1).argmin())
            out[y, x] = idx
            err = v - pal[idx]
            if x + 1 < w:
                buf[y, x + 1] += err * (7.0 / 16.0)
            if y + 1 < h:
                if x > 0:
                    buf[y + 1, x - 1] += err * (3.0 / 16.0)
                buf[y + 1, x] += err * (5.0 / 16.0)
                if x + 1 < w:
                    buf[y + 1, x + 1] += err * (1.0 / 16.0)
    return out


@functools.partial(jax.jit, static_argnames=("h", "w"))
def _fs_dither_impl(frames_rgb: jax.Array, palette: jax.Array,
                    pal_sq: jax.Array, h: int, w: int) -> jax.Array:
    """Wavefront FS dither. frames_rgb: [B, H, W, 3] uint8.
    Returns [B, H, W] int32 palette indices."""
    b = frames_rgb.shape[0]
    n_steps = w + 2 * (h - 1)
    x = frames_rgb.astype(jnp.float32)

    # Skew: S[b, y, t] = I[b, y, t - 2y]; build via per-row roll.
    pad = jnp.zeros((b, h, n_steps - w, 3), jnp.float32)
    skewed = jnp.concatenate([x, pad], axis=2)           # [B,H,T,3]
    shifts = 2 * jnp.arange(h)
    skewed = jax.vmap(
        lambda row, s: jnp.roll(row, s, axis=1),
        in_axes=(1, 0), out_axes=1)(skewed, shifts)

    valid = (
        (jax.lax.broadcasted_iota(jnp.int32, (h, n_steps), 1)
         - 2 * jax.lax.broadcasted_iota(jnp.int32, (h, n_steps), 0))
    )
    valid = jnp.logical_and(valid >= 0, valid < w)        # [H,T]

    pal = palette.astype(jnp.float32)                     # [N,3]

    def step(carry, inputs):
        # carry: error columns e1 (t-1), e2 (t-2), e3 (t-3): [B,H,3]
        e1, e2, e3 = carry
        col, mask = inputs                                # [B,H,3], [H]
        # error flowing into wavefront t:
        #  same row   (y, x-1)   -> e1[y]      * 7/16
        #  row above  (y-1, x+1) -> e1[y-1]    * 3/16
        #  row above  (y-1, x)   -> e2[y-1]    * 5/16
        #  row above  (y-1, x-1) -> e3[y-1]    * 1/16
        up = lambda e: jnp.concatenate(
            [jnp.zeros_like(e[:, :1]), e[:, :-1]], axis=1)
        incoming = (e1 * (7.0 / 16.0) + up(e1) * (3.0 / 16.0)
                    + up(e2) * (5.0 / 16.0) + up(e3) * (1.0 / 16.0))
        v = jnp.clip(col + incoming, 0.0, 255.0)
        dots = jnp.einsum("bhc,nc->bhn", v, pal,
                          preferred_element_type=jnp.float32)
        d = pal_sq - 2.0 * dots
        idx = jnp.argmin(d, axis=-1)                      # [B,H]
        err = v - pal[idx]
        err = jnp.where(mask[None, :, None], err, 0.0)
        return (err, e1, e2), (idx, v)

    zeros = jnp.zeros((b, h, 3), jnp.float32)
    cols = jnp.moveaxis(skewed, 2, 0)                     # [T,B,H,3]
    (_, _, _), (idx_sk, _) = jax.lax.scan(
        step, (zeros, zeros, zeros), (cols, valid.T))

    # Unskew: I_idx[b, y, x] = idx_sk[x + 2y, b, y]
    idx_sk = jnp.moveaxis(idx_sk, 0, 2)                   # [B,H,T]
    idx_un = jax.vmap(
        lambda row, s: jnp.roll(row, -s, axis=1),
        in_axes=(1, 0), out_axes=1)(idx_sk, shifts)
    return idx_un[:, :, :w].astype(jnp.int32)


def fs_dither(frames_rgb, palette: np.ndarray) -> np.ndarray:
    """[B, H, W, 3] uint8 + [N,3] palette -> [B, H, W] int32 indices."""
    frames_rgb = np.asarray(frames_rgb)
    b, h, w, _ = frames_rgb.shape
    pal_j, pal_sq = _palette_tables(palette)
    if jax.default_backend() == "cpu":
        # CPU backend contracts FMAs (see resize.py); scan is also slow
        # there. Use a vectorized numpy mirror of the same wavefront.
        return _fs_dither_np(frames_rgb, palette)
    out = _fs_dither_impl(jnp.asarray(frames_rgb), pal_j, pal_sq, h, w)
    return np.asarray(out)


def _fs_dither_np(frames_rgb: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """Numpy mirror of the wavefront kernel (row-major equivalent)."""
    out = np.zeros(frames_rgb.shape[:3], dtype=np.int32)
    for i, frame in enumerate(frames_rgb):
        out[i] = fs_dither_reference(frame[..., :3], palette)
    return out
