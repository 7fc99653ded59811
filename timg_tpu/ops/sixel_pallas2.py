"""Packed-word Pallas FS dither (cube palette), transpose-optimized.

The v1 kernel (sixel_pallas.py) is fast but its planar u8 skew/transpose
wrappers dominate: TPU relayouts are *byte*-granular for u8 planes. Here
every transpose moves 32-bit words instead:

* input pixels stay RGBA-interleaved and are bitcast to one i32 word per
  pixel before the skew/transpose ([T, B, Hp] i32);
* the kernel unpacks r/g/b with shifts/masks (VPU int ops), runs the
  same FS recurrence per channel, and packs FOUR consecutive column
  index planes into one i32 word;
* the output transpose is then [T/4, B, Hp] i32, and the final unskew
  sees consecutive T bytes again after a free bitcast.

Bit-identical with the scan/v1 formulations (tests assert it).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from timg_tpu.ops.sixel import _CUBE_LEVELS, _skew, _unskew

def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_k(b: int, hp: int) -> int:
    """Wavefront columns per grid step (multiple of 4), sized so the
    double-buffered i32 blocks + f32 scratch stay inside VMEM (with
    headroom for Mosaic's own buffering)."""
    budget = 9 * 1024 * 1024 - 9 * b * hp * 4  # minus scratch
    per_col = b * hp * 4 * 2 + b * hp * 4 * 2 // 4  # in x2 + out x2 /4
    for k in (16, 8, 4):
        if k * per_col <= budget:
            return k
    return 0  # caller must split the batch


def _make_kernel(b: int, hp: int, _K: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    lr, lg, lb = _CUBE_LEVELS
    levels = (lr, lg, lb)

    def kernel(cols_ref, valid_ref, out_ref, err_ref):
        # cols [K, B, Hp] i32 (packed rgba); valid [K, 1, Hp] u8 (hmm i32);
        # out [K/4, B, Hp] i32 (4 packed index planes);
        # err scratch [9, B, Hp] f32: (e1,e2,e3) x (r,g,b).
        @pl.when(pl.program_id(0) == 0)
        def _init():
            err_ref[...] = jnp.zeros_like(err_ref)

        lane = jax.lax.broadcasted_iota(jnp.int32, (b, hp), 1)

        def up(e):
            rolled = pltpu.roll(e, shift=1, axis=1)
            return jnp.where(lane == 0, jnp.float32(0.0), rolled)

        # carries as SSA values: [channel][age]
        e1 = [err_ref[c] for c in range(3)]
        e2 = [err_ref[3 + c] for c in range(3)]
        e3 = [err_ref[6 + c] for c in range(3)]

        packed = None
        for k in range(_K):
            mask = valid_ref[k] != 0                       # [1, Hp]
            word = cols_ref[k]                             # [B, Hp] i32
            idx = None
            new_e = []
            for c in range(3):
                n = levels[c]
                chan = (word >> (8 * c)) & 0xFF
                col = chan.astype(jnp.float32)
                mix = (e1[c] * (3.0 / 16.0) + e2[c] * (5.0 / 16.0)
                       + e3[c] * (1.0 / 16.0))
                incoming = e1[c] * (7.0 / 16.0) + up(mix)
                v = jnp.clip(col + incoming, 0.0, 255.0)
                q = jnp.round(v * jnp.float32((n - 1) / 255.0))
                chosen = jnp.round(q * jnp.float32(255.0 / (n - 1)))
                new_e.append(jnp.where(mask, v - chosen, jnp.float32(0.0)))
                qi = q.astype(jnp.int32)
                idx = qi if idx is None else idx * n + qi
            e3, e2, e1 = e2, e1, new_e
            shift = 8 * (k % 4)
            packed = idx << shift if k % 4 == 0 else packed | (idx << shift)
            if k % 4 == 3:
                out_ref[k // 4] = packed
        for c in range(3):
            err_ref[c] = e1[c]
            err_ref[3 + c] = e2[c]
            err_ref[6 + c] = e3[c]

    return kernel


@functools.partial(jax.jit, static_argnames=("h", "w", "interpret"))
def fs_dither_cube_packed(frames_rgba: jax.Array, h: int, w: int,
                          interpret: bool = False) -> jax.Array:
    """[B, H, W, 4] uint8 -> [B, H, W] int32 cube-palette FS indices."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = frames_rgba.shape[0]
    hp = _round_up(h, 128)
    _K = _pick_k(b, hp)
    if _K == 0:
        # batch too large for VMEM-resident wavefronts: split it
        half = b // 2
        return jnp.concatenate([
            fs_dither_cube_packed(frames_rgba[:half], h, w,
                                  interpret=interpret),
            fs_dither_cube_packed(frames_rgba[half:], h, w,
                                  interpret=interpret),
        ], axis=0)
    t_len = _round_up(w + 2 * (h - 1), _K * 4)

    x = frames_rgba
    if x.shape[-1] != 4:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, 4 - x.shape[-1])])
    if hp != h:
        x = jnp.pad(x, ((0, 0), (0, hp - h), (0, 0), (0, 0)))
    words = jax.lax.bitcast_convert_type(x, jnp.int32)     # [B, Hp, W]
    skewed = _skew(words, hp, w, t_len)                    # [B, Hp, T]
    cols = jnp.transpose(skewed, (2, 0, 1))                # [T, B, Hp] i32

    ys = jax.lax.broadcasted_iota(jnp.int32, (t_len, hp), 1)
    ts = jax.lax.broadcasted_iota(jnp.int32, (t_len, hp), 0)
    xs = ts - 2 * ys
    valid = jnp.logical_and(
        jnp.logical_and(xs >= 0, xs < w), ys < h).astype(jnp.int32)
    valid = valid[:, None, :]

    grid = (t_len // _K,)
    packed = pl.pallas_call(
        _make_kernel(b, hp, _K),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_K, b, hp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_K, 1, hp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_K // 4, b, hp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_len // 4, b, hp), jnp.int32),
        scratch_shapes=[pltpu.VMEM((9, b, hp), jnp.float32)],
        interpret=interpret,
    )(cols, valid)

    # [T/4, B, Hp] i32 -> word transpose -> bytes along T again
    packed_bht = jnp.transpose(packed, (1, 2, 0))          # [B, Hp, T/4]
    bytes_bht = jax.lax.bitcast_convert_type(
        packed_bht, jnp.uint8)                             # [B, Hp, T/4, 4]
    idx_bht = bytes_bht.reshape(b, hp, t_len)
    out = _unskew(idx_bht, hp, w, t_len)[:, :h]
    return out.astype(jnp.int32)
