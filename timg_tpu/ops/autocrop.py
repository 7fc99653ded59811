"""Auto-crop: uniform-border detection on device.

Behavioral spec: the reference delegates to GraphicsMagick's
``Magick::Image::trim()`` (ref graphics-magick-source.cc:231-241): rows
and columns equal to the corner color are removed from the edges. This is
the one pixel op the reference outsources entirely — here it is a pair of
row/column uniformity reductions on the VPU returning the crop rectangle;
the host slices (slicing must be host-side since the result shape is
data-dependent).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

_trim_bounds_jit = None


def _trim_bounds(frame):
    """[H, W, 4] uint8 -> int32[4] (y0, y1, x0, x1) exclusive bounds.
    Keeps everything when the frame is fully uniform.  jax import is
    lazy: the one-shot host path must not pay it."""
    global _trim_bounds_jit
    if _trim_bounds_jit is None:
        import jax

        _trim_bounds_jit = jax.jit(_trim_bounds_impl)
    return _trim_bounds_jit(frame)


def _trim_bounds_impl(frame):
    import jax.numpy as jnp

    corner = frame[0, 0]
    same = jnp.all(frame == corner, axis=-1)          # [H, W]
    row_keep = ~jnp.all(same, axis=1)                 # [H]
    col_keep = ~jnp.all(same, axis=0)                 # [W]

    h = frame.shape[0]
    w = frame.shape[1]
    ys = jnp.arange(h)
    xs = jnp.arange(w)
    any_row = jnp.any(row_keep)
    any_col = jnp.any(col_keep)
    y0 = jnp.where(any_row, jnp.min(jnp.where(row_keep, ys, h)), 0)
    y1 = jnp.where(any_row, jnp.max(jnp.where(row_keep, ys, -1)) + 1, h)
    x0 = jnp.where(any_col, jnp.min(jnp.where(col_keep, xs, w)), 0)
    x1 = jnp.where(any_col, jnp.max(jnp.where(col_keep, xs, -1)) + 1, w)
    return jnp.stack([y0, y1, x0, x1]).astype(jnp.int32)


def _trim_bounds_np(frame: np.ndarray) -> Tuple[int, int, int, int]:
    """Numpy mirror of _trim_bounds (pure integer/boolean reductions,
    so trivially identical)."""
    corner = frame[0, 0]
    same = (frame == corner).all(axis=-1)
    row_keep = ~same.all(axis=1)
    col_keep = ~same.all(axis=0)
    h, w = frame.shape[:2]
    if not row_keep.any() or not col_keep.any():
        return 0, h, 0, w
    (ys,) = np.nonzero(row_keep)
    (xs,) = np.nonzero(col_keep)
    return int(ys[0]), int(ys[-1]) + 1, int(xs[0]), int(xs[-1]) + 1


def trim_rect(frame: np.ndarray) -> Tuple[int, int, int, int]:
    """Crop rectangle (y0, y1, x0, x1) of the non-uniform-border content."""
    from timg_tpu.ops.backend import prefer_host, use_numpy

    # per-still one-shot reduction: host unless the device is forced
    # (a fresh per-shape XLA compile dwarfs the reduction cost)
    if prefer_host(1) or use_numpy():
        return _trim_bounds_np(frame)
    y0, y1, x0, x1 = (int(v) for v in np.asarray(_trim_bounds(frame)))
    return y0, y1, x0, x1


def auto_crop(frame: np.ndarray, crop_border: int = 0) -> np.ndarray:
    """Optional pre-crop of crop_border pixels, then trim
    (ref display-options.h:62-64, timg.cc:652-657)."""
    h, w = frame.shape[:2]
    if crop_border > 0 and h > 2 * crop_border and w > 2 * crop_border:
        frame = frame[crop_border:h - crop_border,
                      crop_border:w - crop_border]
    y0, y1, x0, x1 = trim_rect(frame)
    return frame[y0:y1, x0:x1]
