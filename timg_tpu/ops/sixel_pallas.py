"""Pallas TPU kernel for the Floyd-Steinberg wavefront (cube palette).

The lax.scan formulation (ops/sixel.py) pays a fixed ~24 us per
wavefront step (per-iteration HBM slice DMAs + kernel dispatch), which
dominates the actual VPU work ~20x. This kernel removes it:

* error wavefronts live in VMEM scratch for the whole frame batch;
* the skewed column stream is blocked K columns per grid step so Mosaic
  double-buffers ~MB DMAs instead of issuing ~2700 tiny ones;
* all three color channels are folded into single [3B, Hp] vector ops
  (channel-dependent quantizer constants materialized once per kernel
  via row-index selects), minimizing per-op overhead;
* the K-column recurrence is a statically unrolled loop of pure VPU ops
  (the cube-palette quantizer is arithmetic only — no table lookups).

Throughput scales with batch: per-column op count is fixed (~20 vector
ops), so larger B widens each op until the VPU is math-bound.
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


def _make_kernel(b: int, hp: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    lr, lg, lb = _CUBE_LEVELS

    def kernel(cols_ref, valid_ref, out_ref, err_ref):
        # refs: cols [K, 3B, Hp] u8; valid [K, 1, Hp] u8;
        # out [K, 3B?]. out is [K, B, Hp] u8; err scratch [3, 3B, Hp] f32.
        @pl.when(pl.program_id(0) == 0)
        def _init():
            err_ref[...] = jnp.zeros_like(err_ref)

        rows = jax.lax.broadcasted_iota(jnp.int32, (3 * b, hp), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (3 * b, hp), 1)

        def chan_const(v0, v1, v2):
            return jnp.where(rows < b, jnp.float32(v0),
                             jnp.where(rows < 2 * b, jnp.float32(v1),
                                       jnp.float32(v2)))

        scale = chan_const((lr - 1) / 255.0, (lg - 1) / 255.0,
                           (lb - 1) / 255.0)
        inv_scale = chan_const(255.0 / (lr - 1), 255.0 / (lg - 1),
                               255.0 / (lb - 1))

        def up(e):
            rolled = pltpu.roll(e, shift=1, axis=1)
            return jnp.where(lane == 0, jnp.float32(0.0), rolled)

        # Carries stay SSA values across the unrolled column loop;
        # scratch is only touched at block entry/exit (per-column scratch
        # rotation would copy 3x the wavefront per column).
        e1 = err_ref[0]
        e2 = err_ref[1]
        e3 = err_ref[2]
        for k in range(_K):
            mask = valid_ref[k] != 0                        # [1, Hp]
            col = cols_ref[k].astype(jnp.int32).astype(jnp.float32)
            mix = (e1 * (3.0 / 16.0) + e2 * (5.0 / 16.0)
                   + e3 * (1.0 / 16.0))
            incoming = e1 * (7.0 / 16.0) + up(mix)
            v = jnp.clip(col + incoming, 0.0, 255.0)
            q = jnp.round(v * scale)
            chosen = jnp.round(q * inv_scale)
            err = jnp.where(mask, v - chosen, jnp.float32(0.0))
            qi = q.astype(jnp.int32)
            idx = (qi[0:b] * lg + qi[b:2 * b]) * lb + qi[2 * b:3 * b]
            out_ref[k] = idx.astype(jnp.uint8)              # [B, Hp]
            e1, e2, e3 = err, e1, e2
        err_ref[0] = e1
        err_ref[1] = e2
        err_ref[2] = e3

    return kernel


@functools.partial(jax.jit, static_argnames=("h", "w", "interpret"))
def fs_dither_cube_pallas(frames_rgb: jax.Array, h: int, w: int,
                          interpret: bool = False) -> jax.Array:
    """[B, H, W, >=3] uint8 -> [B, H, W] int32 cube-palette FS indices.

    Bit-identical with the lax.scan formulation (ops/sixel.py
    _fs_dither_cube_impl), verified in tests."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = frames_rgb.shape[0]
    hp = _round_up(h, 128)
    t_len = _round_up(w + 2 * (h - 1), _K)

    x = frames_rgb[..., :3]
    if hp != h:
        x = jnp.pad(x, ((0, 0), (0, hp - h), (0, 0), (0, 0)))
    planar = jnp.transpose(jnp.moveaxis(x, -1, 1), (1, 0, 2, 3))  # [3,B,Hp,W]
    flat = planar.reshape(3 * b, hp, w)
    skewed = _skew(flat, hp, w, t_len)                      # [3B,Hp,T]
    cols = jnp.transpose(skewed, (2, 0, 1))                 # [T,3B,Hp]

    ys = jax.lax.broadcasted_iota(jnp.int32, (t_len, hp), 1)
    ts = jax.lax.broadcasted_iota(jnp.int32, (t_len, hp), 0)
    xs = ts - 2 * ys
    valid = jnp.logical_and(
        jnp.logical_and(xs >= 0, xs < w), ys < h).astype(jnp.uint8)
    valid = valid[:, None, :]  # [T, 1, Hp]: keep refs 2-D inside Mosaic

    grid = (t_len // _K,)
    idx_sk = pl.pallas_call(
        _make_kernel(b, hp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_K, 3 * b, hp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_K, 1, hp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_K, b, hp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_len, b, hp), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((3, 3 * b, hp), jnp.float32)],
        interpret=interpret,
    )(cols, valid)

    idx_bht = jnp.transpose(idx_sk, (1, 2, 0))              # [B,Hp,T]
    out = _unskew(idx_bht, hp, w, t_len)[:, :h]
    return out.astype(jnp.int32)
