"""Batched separable image resampling for TPU.

TPU-first design: a separable resize is two small dense matmuls
``out = Wh @ img @ Ww^T`` over precomputed tap-weight matrices, which XLA
maps straight onto the MXU and fuses with surrounding elementwise work.
This replaces the reference's host-side strategy objects
(``SWSImageScaler``/``STBImageScaler``, ref src/image-scaler.cc:45-98)
with one batched device function.

Tap semantics reproduce the reference's STB scaler configuration
(ref src/image-scaler.cc:29-33: box filter upsample override, Mitchell
downsample default; third_party/stb/stb_image_resize2.h):

* sample grid: in_center_of_out = (out + 0.5) / scale   (gather upsample),
  out_center_of_in = (in + 0.5) * scale                 (scatter downsample);
* downsample coefficients are kernel(x_out_space, scale) * scale;
* rows renormalized to sum exactly 1 (double accumulation);
* EDGE_CLAMP: out-of-range taps folded onto the edge pixels;
* u8 pixels scaled to [0, 1] floats, "fancy alpha" weighting: both the
  plain and the alpha-premultiplied color streams are filtered, and the
  unweighted stream is used wherever filtered alpha underflows, so fully
  transparent regions keep their color (stb_image_resize2.h:4081-4294);
* encode: round(v * 255 + 0.5), clamp.

sws-compatible bilinear ("triangle") is also provided for video-path
configs (ref video-source.cc uses swscale SWS_BILINEAR).
"""

from __future__ import annotations

import functools
import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_SMALL_FLOAT = float(np.float32(1.0) / (1 << 20) ** 6)  # stbir__small_float


# --------------------------------------------------------------------------
# Filter kernels (float32 semantics; ref stb_image_resize2.h:2845-2958)
# --------------------------------------------------------------------------

def _filter_box(x: np.ndarray, scale: np.ndarray) -> np.ndarray:
    """stbir__filter_trapezoid (STBIR_FILTER_BOX); needs scale <= 1."""
    x = np.abs(x)
    halfscale = scale / 2
    t = np.float32(0.5) + halfscale
    r = np.float32(0.5) - halfscale
    out = np.where(x >= t, np.float32(0), (t - x) / scale)
    return np.where(x <= r, np.float32(1), out).astype(np.float32)


def _filter_triangle(x: np.ndarray, scale: np.ndarray) -> np.ndarray:
    x = np.abs(x)
    return np.where(x <= 1.0, np.float32(1) - x, np.float32(0)).astype(np.float32)


def _filter_mitchell(x: np.ndarray, scale: np.ndarray) -> np.ndarray:
    x = np.abs(x).astype(np.float32)
    near = (np.float32(16) + x * x * (np.float32(21) * x - np.float32(36))) / np.float32(18)
    far = (np.float32(32) + x * (np.float32(-60) + x * (np.float32(36) - np.float32(7) * x))) / np.float32(18)
    out = np.where(x < 1.0, near, np.where(x < 2.0, far, np.float32(0)))
    return out.astype(np.float32)


def _filter_catmullrom(x: np.ndarray, scale: np.ndarray) -> np.ndarray:
    x = np.abs(x).astype(np.float32)
    near = np.float32(1) - x * x * (np.float32(2.5) - np.float32(1.5) * x)
    far = np.float32(2) - x * (np.float32(4) + x * (np.float32(0.5) * x - np.float32(2.5)))
    out = np.where(x < 1.0, near, np.where(x < 2.0, far, np.float32(0)))
    return out.astype(np.float32)


_FILTERS: dict[str, Tuple[Callable, Callable]] = {
    # name -> (kernel(x, scale), support(scale))
    "box": (_filter_box, lambda s: 0.5 + s / 2.0),
    "triangle": (_filter_triangle, lambda s: 1.0),
    "mitchell": (_filter_mitchell, lambda s: 2.0),
    "catmull-rom": (_filter_catmullrom, lambda s: 2.0),
}

# The reference's STB scaler configuration (image-scaler.cc:29-33).
STB_UPSAMPLE_FILTER = "box"
STB_DOWNSAMPLE_FILTER = "mitchell"


@functools.lru_cache(maxsize=256)
def resample_weights(
    in_size: int,
    out_size: int,
    upsample_filter: str = STB_UPSAMPLE_FILTER,
    downsample_filter: str = STB_DOWNSAMPLE_FILTER,
) -> np.ndarray:
    """Dense [out_size, in_size] float32 tap matrix, rows summing to 1.

    Reproduces stb_image_resize2 gather coefficients with EDGE_CLAMP
    (stb_image_resize2.h:3242-3327 upsample, :3382-3463 downsample,
    :3466-3635 renormalize + edge fold).
    """
    scale = np.float32(out_size) / np.float32(in_size)
    inv_scale = np.float32(in_size) / np.float32(out_size)
    upsample = float(scale) >= (1.0 - _SMALL_FLOAT)
    kernel, support_fn = _FILTERS[upsample_filter if upsample else downsample_filter]

    w = np.zeros((out_size, in_size), dtype=np.float64)
    out_centers = (np.arange(out_size, dtype=np.float32) + np.float32(0.5))

    if upsample:
        # Gather: out_pixels_radius = support(inv_scale) * scale
        # (stb:3891); in-range bounds per stbir__calculate_in_pixel_range.
        support = np.float32(support_fn(float(inv_scale)))
        out_radius = support * scale
        for o in range(out_size):
            oc = np.float32(out_centers[o])
            in_center_of_out = oc * inv_scale
            lo = int(math.floor(float((oc - out_radius) * inv_scale) + 0.5))
            hi = int(math.floor(float((oc + out_radius) * inv_scale) - 0.5))
            hi = max(hi, lo)
            for i in range(lo, hi + 1):
                x = np.float32(in_center_of_out) - (np.float32(i) + np.float32(0.5))
                c = np.float32(kernel(np.float32(x), inv_scale))
                if abs(c) < _SMALL_FLOAT:
                    continue
                w[o, np.clip(i, 0, in_size - 1)] += float(c)
    else:
        # Scatter: iterate input pixels exactly as
        # stbir__calculate_coefficients_for_gather_downsample (stb:3382).
        support = np.float32(support_fn(float(scale)))
        in_radius = support * inv_scale
        # stb iterates input pixels beyond the edges by the filter margin;
        # EDGE_CLAMP then folds those taps onto the edge pixels (stb:3569).
        margin = int(math.ceil(float(support) * 2.0 / float(scale)))
        for i in range(-margin, in_size + margin):
            ic = np.float32(i) + np.float32(0.5)
            out_center_of_in = ic * scale
            out_first = int(math.floor(float((ic - in_radius) * scale) + 0.5))
            out_last = int(math.floor(float((ic + in_radius) * scale) - 0.5))
            out_first = max(out_first, 0)
            out_last = min(out_last, out_size - 1)
            for o in range(out_first, out_last + 1):
                x = np.float32(out_centers[o]) - out_center_of_in
                c = np.float32(kernel(np.float32(x), scale)) * scale
                if abs(c) < _SMALL_FLOAT:
                    continue
                w[o, np.clip(i, 0, in_size - 1)] += float(c)

    # Renormalize rows to 1 (stb does this in double, then stores float).
    sums = w.sum(axis=1, keepdims=True)
    sums[np.abs(sums) < _SMALL_FLOAT] = 1.0
    w = w / sums
    return w.astype(np.float32)


# --------------------------------------------------------------------------
# Device op
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("alpha_weighted",))
def _resize_impl(
    frames: jax.Array,  # [B, H, W, 4] uint8
    w_h: jax.Array,     # [H_out, H] float32
    w_w: jax.Array,     # [W_out, W] float32
    alpha_weighted: bool = True,
) -> jax.Array:
    x = frames.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
    if alpha_weighted:
        # "fancy alpha": filter plain + premultiplied streams together.
        a = x[..., 3:4]
        x = jnp.concatenate([x, x[..., :3] * a], axis=-1)  # [B,H,W,7]

    # Two MXU matmuls over the spatial axes.
    x = jnp.einsum("oh,bhwc->bowc", w_h, x, preferred_element_type=jnp.float32)
    x = jnp.einsum("ow,bhwc->bhoc", w_w, x, preferred_element_type=jnp.float32)

    if alpha_weighted:
        alpha = x[..., 3:4]
        unweighted = x[..., :3]
        premult = x[..., 4:7]
        safe = jnp.maximum(alpha, jnp.float32(_SMALL_FLOAT))
        rgb = jnp.where(alpha < _SMALL_FLOAT, unweighted, premult / safe)
        x = jnp.concatenate([rgb, alpha], axis=-1)

    out = jnp.clip(x * jnp.float32(255.0) + jnp.float32(0.5), 0.0, 255.0)
    return out.astype(jnp.uint8)


def resize_batch(
    frames: jax.Array,
    out_h: int,
    out_w: int,
    *,
    upsample_filter: str = STB_UPSAMPLE_FILTER,
    downsample_filter: str = STB_DOWNSAMPLE_FILTER,
    alpha_weighted: bool = True,
) -> jax.Array:
    """Resize a uint8 RGBA batch [B, H, W, 4] to [B, out_h, out_w, 4]."""
    _, in_h, in_w, _ = frames.shape
    w_h = jnp.asarray(resample_weights(in_h, out_h, upsample_filter, downsample_filter))
    w_w = jnp.asarray(resample_weights(in_w, out_w, upsample_filter, downsample_filter))
    return _resize_impl(frames, w_h, w_w, alpha_weighted=alpha_weighted)
