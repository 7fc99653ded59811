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

_SAMPLE_LIMIT = 1 << 18  # like libsixel's quality-based sampling


def median_cut_palette(pixels: np.ndarray, n_colors: int = 256) -> np.ndarray:
    """Build an [n, 3] uint8 palette from [..., 3] uint8 pixels."""
    flat = pixels.reshape(-1, 3)
    if len(flat) > _SAMPLE_LIMIT:
        # deterministic stride sampling (libsixel samples large inputs
        # under SIXEL_QUALITY_AUTO as well)
        stride = int(np.ceil(len(flat) / _SAMPLE_LIMIT))
        flat = flat[::stride]

    packed = (flat[:, 0].astype(np.int64) << 16 |
              flat[:, 1].astype(np.int64) << 8 | flat[:, 2])
    keys, counts = np.unique(packed, return_counts=True)
    colors = np.stack([(keys >> 16) & 0xFF, (keys >> 8) & 0xFF,
                       keys & 0xFF], axis=1)

    if len(colors) <= n_colors:
        pal = np.zeros((max(len(colors), 1), 3), dtype=np.uint8)
        pal[: len(colors)] = colors
        return pal

    # boxes: list of (index array, pixel total); totals kept incrementally
    boxes = [(np.arange(len(colors)), int(counts.sum()))]
    while len(boxes) < n_colors:
        # split the splittable box with the most pixels
        order = -1
        best_total = -1
        for i, (b, total) in enumerate(boxes):
            if len(b) > 1 and total > best_total:
                order, best_total = i, total
        if order < 0:
            break
        box, _ = boxes[order]

        # LARGE_LUM: dimension with largest luminosity-weighted spread
        spreads = (colors[box].max(axis=0) - colors[box].min(axis=0)) * _LUM
        dim = int(np.argmax(spreads))

        # sort by that component and split at the frequency median
        srt = box[np.argsort(colors[box, dim], kind="stable")]
        csum = np.cumsum(counts[srt])
        half = csum[-1] / 2.0
        cut = int(np.searchsorted(csum, half)) + 1
        cut = min(max(cut, 1), len(srt) - 1)
        left_total = int(csum[cut - 1])
        boxes[order] = (srt[:cut], left_total)
        boxes.append((srt[cut:], int(csum[-1]) - left_total))

    pal = np.zeros((n_colors, 3), dtype=np.uint8)
    for i, (box, _) in enumerate(boxes):
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


def _skew(x: jax.Array, h: int, w: int, t_len: int) -> jax.Array:
    """S[..., y, t] = x[..., y, t - 2y] as pure layout ops (no gather):
    pad rows to stride t_len+2, then reinterpret with stride t_len —
    each row lands shifted by 2 relative to the previous one."""
    lead = x.shape[:-2]  # [..., H, W]
    x = jnp.pad(x, [(0, 0)] * len(lead) + [(0, 0), (0, t_len + 2 - w)])
    x = x.reshape(lead + (h * (t_len + 2),))
    x = x[..., : h * t_len]
    return x.reshape(lead + (h, t_len))


def _unskew(s: jax.Array, h: int, w: int, t_len: int) -> jax.Array:
    """Inverse of _skew: out[..., y, x] = s[..., y, x + 2y]."""
    lead = s.shape[:-2]
    flat = s.reshape(lead + (h * t_len,))
    flat = jnp.pad(flat, [(0, 0)] * len(lead) + [(0, 2 * h)])
    return flat.reshape(lead + (h, t_len + 2))[..., :w]


def _wavefront_scan(frames_rgb: jax.Array, h: int, w: int, quantize):
    """Shared FS wavefront driver over antidiagonals t = x + 2y.

    The frame is skewed (layout-only pad/reshape) so each scan step
    consumes one ready-made column; ``quantize(v [B,H,3] f32) ->
    (idx [B,H] i32, color [B,H,3] f32)`` is the palette search.
    Returns [B, H, W] int32 indices."""
    b = frames_rgb.shape[0]
    n_steps = w + 2 * (h - 1)

    # [B,3,H,W] -> skew -> [T,B,3,H] scan input (uint8, layout ops only).
    chan_first = jnp.moveaxis(frames_rgb, -1, 1)
    skewed = _skew(chan_first, h, w, n_steps)             # [B,3,H,T]
    cols = jnp.transpose(skewed, (3, 0, 1, 2))            # [T,B,3,H]

    ys = jax.lax.broadcasted_iota(jnp.int32, (h, n_steps), 0)
    ts = jax.lax.broadcasted_iota(jnp.int32, (h, n_steps), 1)
    xs = ts - 2 * ys
    valid = jnp.logical_and(xs >= 0, xs < w)              # [H,T]

    def step(carry, inputs):
        # carry: error wavefronts for t-1, t-2, t-3: [B,H,3]
        e1, e2, e3 = carry
        col_u8, mask = inputs                             # [B,3,H], [H]
        col = jnp.moveaxis(col_u8, 1, -1).astype(jnp.float32)  # [B,H,3]

        # error flowing into wavefront t:
        #  same row   (y, x-1)   -> e1[y]   * 7/16
        #  row above  (y-1, x+1) -> e1[y-1] * 3/16
        #  row above  (y-1, x)   -> e2[y-1] * 5/16
        #  row above  (y-1, x-1) -> e3[y-1] * 1/16
        # The three row-above terms are mixed first so only one shift is
        # needed (the scalar reference scatters with yet another addition
        # order, so this association is equally faithful).
        up = lambda e: jnp.concatenate(
            [jnp.zeros_like(e[:, :1]), e[:, :-1]], axis=1)
        mix = (e1 * (3.0 / 16.0) + e2 * (5.0 / 16.0) + e3 * (1.0 / 16.0))
        incoming = e1 * (7.0 / 16.0) + up(mix)
        v = jnp.clip(col + incoming, 0.0, 255.0)
        idx, chosen = quantize(v)                         # [B,H], [B,H,3]
        err = v - chosen
        err = jnp.where(mask[None, :, None], err, 0.0)
        return (err, e1, e2), idx.astype(jnp.uint8)

    zeros = jnp.zeros((b, h, 3), jnp.float32)
    _, idx_sk = jax.lax.scan(step, (zeros, zeros, zeros),
                             (cols, jnp.transpose(valid)))

    # idx_sk: [T,B,H] -> [B,H,T] -> unskew -> [B,H,W]
    idx_sk = jnp.transpose(idx_sk, (1, 2, 0))
    return _unskew(idx_sk, h, w, n_steps).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("h", "w"))
def _fs_dither_impl(frames_rgb: jax.Array, palette: jax.Array,
                    pal_sq: jax.Array, h: int, w: int) -> jax.Array:
    """Exact-nearest wavefront FS dither. frames_rgb: [B, H, W, 3] uint8.
    Returns [B, H, W] int32 palette indices."""
    pal = palette.astype(jnp.float32)

    def quantize(v):
        dots = jnp.einsum("bhc,nc->bhn", v, pal,
                          preferred_element_type=jnp.float32)
        idx = jnp.argmin(pal_sq - 2.0 * dots, axis=-1).astype(jnp.int32)
        return idx, pal[idx]

    return _wavefront_scan(frames_rgb[..., :3], h, w, quantize)


def fs_dither(frames_rgb, palette: np.ndarray) -> np.ndarray:
    """[B, H, W, 3] uint8 + [N,3] palette -> [B, H, W] int32 indices."""
    frames_rgb = np.asarray(frames_rgb)
    b, h, w, _ = frames_rgb.shape
    pal_j, pal_sq = _palette_tables(palette)
    from timg_tpu.ops.backend import dispatch_platform
    if dispatch_platform() == "cpu":
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


# --------------------------------------------------------------------------
# Cube-palette fast path: a fixed 6x7x6 RGB cube (252 colors), the same
# class as libsixel's builtin XTERM256 palette mode. Nearest-color search
# is pure per-channel arithmetic -- no table lookups inside the
# recurrence, so every FS step is a handful of VPU ops. This is the
# steady-state video configuration.
# --------------------------------------------------------------------------

_CUBE_LEVELS = (6, 7, 6)


# cube_palette lives in ops/sixel_np.py (pure numpy, no jax import for
# the one-shot host path); re-exported here for API continuity.
from timg_tpu.ops.sixel_np import cube_palette  # noqa: E402,F401


@functools.partial(jax.jit, static_argnames=("h", "w"))
def _fs_dither_cube_impl(frames_rgb: jax.Array, h: int, w: int) -> jax.Array:
    lr, lg, lb = _CUBE_LEVELS
    steps = jnp.asarray([(lr - 1) / 255.0, (lg - 1) / 255.0,
                         (lb - 1) / 255.0], jnp.float32)
    inv_steps = jnp.asarray([255.0 / (lr - 1), 255.0 / (lg - 1),
                             255.0 / (lb - 1)], jnp.float32)

    def quantize(v):
        q = jnp.round(v * steps)                         # [B,H,3] levels
        chosen = jnp.round(q * inv_steps)                # palette colors
        qi = q.astype(jnp.int32)
        idx = (qi[..., 0] * lg + qi[..., 1]) * lb + qi[..., 2]
        return idx, chosen

    return _wavefront_scan(frames_rgb[..., :3], h, w, quantize)


def fs_dither_cube(frames_rgb) -> jax.Array:
    """FS dither against the fixed cube palette. Device array of indices."""
    frames_rgb = jnp.asarray(frames_rgb)
    _, h, w = frames_rgb.shape[:3]
    from timg_tpu.ops.backend import dispatch_platform
    if dispatch_platform() == "tpu":
        # fused all-Pallas pipeline (bit-identical with the scan;
        # tests assert it)
        from timg_tpu.ops.sixel_pallas3 import fs_dither_cube_fused
        if frames_rgb.shape[-1] == 4:
            return fs_dither_cube_fused(frames_rgb, h, w)
        from timg_tpu.ops.sixel_pallas import fs_dither_cube_pallas
        return fs_dither_cube_pallas(frames_rgb, h, w)
    return _fs_dither_cube_impl(frames_rgb[..., :3], h, w)


# --------------------------------------------------------------------------
# Adaptive tree quantizer: balanced median-cut descent.
#
# The exact-nearest adaptive path costs a [rows, 256] distance matmul +
# argmin per wavefront step -- unusable at video rate (and a flat
# 15-bit LUT cannot be gathered on TPU: lane gathers cap at 128
# entries per op). Instead the palette is built as a *balanced*
# depth-8 median-cut tree; quantization is 8 packed table lookups of
# <=128 entries (one per level) plus one leaf lookup -- each a native
# TPU lane-gather. Same quantizer class as classic median-cut
# encoders: assignment by box membership, palette entry = box average
# (libsixel REP_AVERAGE_COLORS analog, ref sixel-canvas.cc:139-142);
# the luminosity-weighted split axis matches SIXEL_LARGE_LUM.
# --------------------------------------------------------------------------

TREE_DEPTH = 8


# median_cut_tree lives in ops/sixel_np.py (pure numpy, jax-free).
from timg_tpu.ops.sixel_np import median_cut_tree  # noqa: E402,F401


def tree_descend_np(rgb: np.ndarray, levels: np.ndarray) -> np.ndarray:
    """Vectorized descent: rgb [..., 3] (rounded ints) -> leaf node ids."""
    v = np.asarray(rgb)
    node = np.zeros(v.shape[:-1], np.int32)
    for d in range(TREE_DEPTH):
        word = levels[d][node]
        axis = word >> 8
        thr = word & 0xFF
        comp = np.take_along_axis(
            v, axis[..., None], axis=-1)[..., 0]
        node = node * 2 + (comp > thr).astype(np.int32)
    return node


def fs_dither_tree_reference(rgb: np.ndarray, palette: np.ndarray,
                             levels: np.ndarray,
                             leaves: np.ndarray) -> np.ndarray:
    """Scalar host reference of FS + tree-descent quantization (the
    semantics spec of the device kernels). rgb: [H, W, 3] uint8."""
    h, w, _ = rgb.shape
    buf = rgb.astype(np.float32)
    out = np.zeros((h, w), dtype=np.int32)
    for y in range(h):
        for x in range(w):
            v = np.clip(buf[y, x], 0.0, 255.0)
            vq = np.round(v)
            node = 0
            for d in range(TREE_DEPTH):
                word = int(levels[d, node])
                axis, thr = word >> 8, word & 0xFF
                node = node * 2 + (1 if vq[axis] > thr else 0)
            leaf = int(leaves[node])
            idx = (leaf >> 24) & 0xFF
            color = np.array([(leaf >> 16) & 0xFF, (leaf >> 8) & 0xFF,
                              leaf & 0xFF], np.float32)
            out[y, x] = idx
            err = v - color
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
def _fs_dither_tree_impl(frames_rgb: jax.Array, levels: jax.Array,
                         leaves: jax.Array, h: int, w: int) -> jax.Array:
    """Wavefront FS with balanced median-cut tree descent.
    frames_rgb: [B, H, W, 3] uint8 -> [B, H, W] int32 indices."""

    def quantize(v):                                      # [B,H,3] f32
        vq = jnp.round(v)
        node = jnp.zeros(v.shape[:-1], jnp.int32)
        for d in range(TREE_DEPTH):
            word = jnp.take(levels[d], node, axis=0)
            axis = word >> 8
            thr = (word & 0xFF).astype(jnp.float32)
            comp = jnp.where(axis == 0, vq[..., 0],
                             jnp.where(axis == 1, vq[..., 1],
                                       vq[..., 2]))
            node = node * 2 + (comp > thr).astype(jnp.int32)
        leaf = jnp.take(leaves, node, axis=0)
        idx = (leaf >> 24) & 0xFF
        color = jnp.stack(
            [((leaf >> 16) & 0xFF).astype(jnp.float32),
             ((leaf >> 8) & 0xFF).astype(jnp.float32),
             (leaf & 0xFF).astype(jnp.float32)], axis=-1)
        return idx, color

    return _wavefront_scan(frames_rgb[..., :3], h, w, quantize)


def fs_dither_tree(frames_rgb, levels, leaves) -> np.ndarray:
    """[B, H, W, 3] uint8 + median_cut_tree tables -> [B,H,W] i32."""
    frames_rgb = np.asarray(frames_rgb)
    b, h, w = frames_rgb.shape[:3]
    out = _fs_dither_tree_impl(
        jnp.asarray(frames_rgb), jnp.asarray(levels),
        jnp.asarray(leaves), h, w)
    return np.asarray(out)
