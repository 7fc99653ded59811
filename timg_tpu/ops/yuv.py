"""Device-side YUV 4:2:0 -> RGBA conversion (pure integer fixed point).

The reference converts every decoded video frame to RGBA on the host
with swscale before doing anything else (ref src/video-source.cc:59-89,
352-354).  TPU-first, that conversion belongs on the device: raw 4:2:0
planes are 1.5 bytes/pixel over the host->device link instead of 4, and
the VPU converts them for free relative to the link time.  The CLI video
path ships Y/U/V planes and runs this op fused (one jit) with the
resize.

All arithmetic is int32 fixed point (BT.601 coefficients, 16-bit
precision), so results are bit-identical across every backend -- the
strict-numpy mirror below is the same formula, and the TPU-vs-CPU CLI
byte-identity drives hold without any float determinism caveats.

Chroma upsampling is the standard interstitial (MPEG-1 siting) 2x
bilinear with exact integer rounding:

    out[2i]   = (3*c[i] + c[i-1] + 2) >> 2      (c[-1] edge-clamped)
    out[2i+1] = (3*c[i] + c[i+1] + 2) >> 2      (c[n]  edge-clamped)

applied separably in both dimensions, which matches the quality class
of swscale's bilinear chroma scaler without inheriting its
implementation-defined fixed-point pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# BT.601 coefficients in 16-bit fixed point.
#   limited range: R = 255/219*(Y-16) + 255/224*1.402*(V-128) ...
#   full range:    R = Y + 1.402*(V-128) ...
_LIM = dict(cy=76309,                      # 255/219 * 65536
            crv=104597,                    # 255/224 * 1.402 * 65536
            cgu=25675, cgv=53279,          # 255/224 * {0.344136, 0.714136}
            cbu=132201)                    # 255/224 * 1.772 * 65536
_FULL = dict(cy=65536, crv=91881, cgu=22554, cgv=46802, cbu=116130)


def _upsample2_axis_np(c: np.ndarray, axis: int, out_size: int) -> np.ndarray:
    prev = np.concatenate([np.take(c, [0], axis),
                           np.delete(c, -1, axis)], axis)
    nxt = np.concatenate([np.delete(c, 0, axis),
                          np.take(c, [-1], axis)], axis)
    even = (3 * c + prev + 2) >> 2
    odd = (3 * c + nxt + 2) >> 2
    out = np.stack([even, odd], axis=axis + 1)
    shape = list(c.shape)
    shape[axis] *= 2
    out = out.reshape(shape)
    return np.take(out, range(out_size), axis)


def _convert_np(y: np.ndarray, u: np.ndarray, v: np.ndarray,
                full_range: bool) -> np.ndarray:
    k = _FULL if full_range else _LIM
    yc = y.astype(np.int32) - (0 if full_range else 16)
    d = u.astype(np.int32) - 128
    e = v.astype(np.int32) - 128
    half = 1 << 15

    def fin(x):
        return np.clip((x + half) >> 16, 0, 255)

    r = fin(k["cy"] * yc + k["crv"] * e)
    g = fin(k["cy"] * yc - k["cgu"] * d - k["cgv"] * e)
    b = fin(k["cy"] * yc + k["cbu"] * d)
    return r | (g << 8) | (b << 16) | np.int32(-(1 << 24))


def yuv420_to_rgba_words_np(y: np.ndarray, u: np.ndarray, v: np.ndarray,
                            full_range: bool) -> np.ndarray:
    """Strict mirror: [B,H,W] y + [B,ceil(H/2),ceil(W/2)] u/v uint8 ->
    [B,H,W] int32 RGBA-packed words (alpha 255)."""
    h, w = y.shape[-2:]
    u32 = u.astype(np.int32)
    v32 = v.astype(np.int32)
    uu = _upsample2_axis_np(_upsample2_axis_np(u32, y.ndim - 2, h),
                            y.ndim - 1, w)
    vv = _upsample2_axis_np(_upsample2_axis_np(v32, y.ndim - 2, h),
                            y.ndim - 1, w)
    return _convert_np(y, uu, vv, full_range)


def _upsample2_axis(c: jax.Array, axis: int, out_size: int) -> jax.Array:
    prev = jnp.concatenate([jax.lax.slice_in_dim(c, 0, 1, axis=axis),
                            jax.lax.slice_in_dim(c, 0, c.shape[axis] - 1,
                                                 axis=axis)], axis)
    nxt = jnp.concatenate([jax.lax.slice_in_dim(c, 1, c.shape[axis],
                                                axis=axis),
                           jax.lax.slice_in_dim(c, c.shape[axis] - 1,
                                                c.shape[axis], axis=axis)],
                          axis)
    even = (3 * c + prev + 2) >> 2
    odd = (3 * c + nxt + 2) >> 2
    out = jnp.stack([even, odd], axis=axis + 1)
    shape = list(c.shape)
    shape[axis] *= 2
    out = out.reshape(shape)
    return jax.lax.slice_in_dim(out, 0, out_size, axis=axis)


@functools.partial(jax.jit, static_argnames=("full_range",))
def yuv420_to_rgba_words(y: jax.Array, u: jax.Array, v: jax.Array,
                         full_range: bool) -> jax.Array:
    """[B,H,W] y + [B,ceil(H/2),ceil(W/2)] u/v uint8 -> [B,H,W] int32
    RGBA-packed words (alpha 255).  Integer-exact across backends."""
    h, w = y.shape[-2], y.shape[-1]
    k = _FULL if full_range else _LIM
    u32 = u.astype(jnp.int32)
    v32 = v.astype(jnp.int32)
    uu = _upsample2_axis(_upsample2_axis(u32, y.ndim - 2, h), y.ndim - 1, w)
    vv = _upsample2_axis(_upsample2_axis(v32, y.ndim - 2, h), y.ndim - 1, w)
    yc = y.astype(jnp.int32) - (0 if full_range else 16)
    d = uu - 128
    e = vv - 128
    half = 1 << 15

    def fin(x):
        return jnp.clip((x + half) >> 16, 0, 255)

    r = fin(k["cy"] * yc + k["crv"] * e)
    g = fin(k["cy"] * yc - k["cgu"] * d - k["cgv"] * e)
    b = fin(k["cy"] * yc + k["cbu"] * d)
    return r | (g << 8) | (b << 16) | jnp.int32(-(1 << 24))
