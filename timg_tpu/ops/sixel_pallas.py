"""Pallas TPU kernel for the Floyd-Steinberg wavefront (cube palette).

The lax.scan formulation (ops/sixel.py) pays ~24 us of fixed cost per
wavefront step (per-iteration HBM dynamic-slice DMAs), which dominates
the actual VPU work by ~20x. This kernel removes it:

* the error wavefronts live in VMEM scratch across the whole frame batch;
* the skewed column stream is blocked K columns per grid step, so Mosaic
  double-buffers ~1 MB DMAs instead of issuing 2700 tiny ones;
* the K-column recurrence is a static unrolled loop of pure VPU ops
  (the cube-palette quantizer is arithmetic only - no table lookups).

Layouts: columns [T, 3, B, Hp] uint8, valid mask [T, Hp], output
indices [T, B, Hp] uint8, with Hp = H padded to the 128-lane tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from timg_tpu.ops.sixel import _CUBE_LEVELS, _skew, _unskew

_K = 16  # wavefront columns per grid step


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(cols_ref, valid_ref, out_ref, err_ref):
    from jax.experimental import pallas as pl

    from jax.experimental.pallas import tpu as pltpu

    lr, lg, lb = _CUBE_LEVELS
    levels = (lr, lg, lb)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        err_ref[...] = jnp.zeros_like(err_ref)

    shape = err_ref.shape[2:]  # [B, Hp]
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, dimension=1)

    def up(e):
        # error from the row above: shift +1 along the row axis (lanes),
        # zero-filling row 0
        rolled = pltpu.roll(e, shift=1, axis=1)
        return jnp.where(lane == 0, jnp.float32(0.0), rolled)

    for k in range(_K):
        mask = valid_ref[k] != 0                       # [1, Hp]
        idx = None
        new_err = []
        olds = []
        for c in range(3):
            n = levels[c]
            scale = jnp.float32((n - 1) / 255.0)
            inv_scale = jnp.float32(255.0 / (n - 1))
            # Mosaic lacks a direct u8->f32 cast; hop through int32.
            col = cols_ref[k, c].astype(jnp.int32).astype(jnp.float32)
            e1 = err_ref[0, c]
            e2 = err_ref[1, c]
            e3 = err_ref[2, c]
            olds.append((e1, e2))
            incoming = (e1 * (7.0 / 16.0) + up(e1) * (3.0 / 16.0)
                        + up(e2) * (5.0 / 16.0) + up(e3) * (1.0 / 16.0))
            v = jnp.clip(col + incoming, 0.0, 255.0)
            q = jnp.round(v * scale)
            chosen = jnp.round(q * inv_scale)
            new_err.append(jnp.where(mask, v - chosen, jnp.float32(0.0)))
            qi = q.astype(jnp.int32)
            idx = qi if idx is None else idx * n + qi
        out_ref[k] = idx.astype(jnp.uint8)
        for c in range(3):
            err_ref[2, c] = olds[c][1]
            err_ref[1, c] = olds[c][0]
            err_ref[0, c] = new_err[c]


@functools.partial(jax.jit, static_argnames=("h", "w"))
def fs_dither_cube_pallas(frames_rgb: jax.Array, h: int, w: int) -> jax.Array:
    """[B, H, W, >=3] uint8 -> [B, H, W] int32 cube-palette FS indices."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = frames_rgb.shape[0]
    hp = _round_up(h, 128)
    t_len = _round_up(w + 2 * (h - 1), _K)

    x = frames_rgb[..., :3]
    if hp != h:
        x = jnp.pad(x, ((0, 0), (0, hp - h), (0, 0), (0, 0)))
    planar = jnp.transpose(jnp.moveaxis(x, -1, 1), (1, 0, 2, 3))  # [3,B,Hp,W]
    skewed = _skew(planar, hp, w, t_len)                   # [3,B,Hp,T]
    cols = jnp.transpose(skewed, (3, 0, 1, 2))             # [T,3,B,Hp]

    ys = jax.lax.broadcasted_iota(jnp.int32, (t_len, hp), 1)
    ts = jax.lax.broadcasted_iota(jnp.int32, (t_len, hp), 0)
    xs = ts - 2 * ys
    valid = jnp.logical_and(
        jnp.logical_and(xs >= 0, xs < w), ys < h).astype(jnp.uint8)
    valid = valid[:, None, :]  # [T, 1, Hp]: keep refs 2-D inside Mosaic

    grid = (t_len // _K,)
    idx_sk = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_K, 3, b, hp), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_K, 1, hp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_K, b, hp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_len, b, hp), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((3, 3, b, hp), jnp.float32)],
    )(cols, valid)

    idx_bht = jnp.transpose(idx_sk, (1, 2, 0))             # [B,Hp,T]
    out = _unskew(idx_bht, hp, w, t_len)[:, :h]
    return out.astype(jnp.int32)
