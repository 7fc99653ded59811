"""Single-kernel Pallas video resize: words in, words out.

The XLA formulations of the lean video resize leave 3-4x on the table:
dense band-matrix einsums burn MXU flops on zeros, the blocked-band
einsum variants lose it back to operand relayouts, and every
inter-pass intermediate round-trips HBM. This kernel owns the whole
layout instead:

* grid = (batch, output column strip of 256); the input window for a
  strip (stride*256 + filter support columns, all rows) is fetched by
  a manual double-buffered DMA at an arbitrary per-strip offset
  (scalar-prefetched), so input traffic is ~1.0x instead of the 3x a
  3-BlockSpec halo would cost;
* channels unpacked from RGBA-packed i32 words with shifts (no
  channel-minor arrays anywhere);
* vertical pass: one MXU matmul per 128-output-row tile against a
  transposed banded tap matrix [128, win_v] (exploiting the band cuts
  flops by in/win vs dense);
* horizontal pass: one MXU matmul [out_h, win_w] x [win_w, 256] with
  the per-strip tap matrix streamed as a gridded input (edge strips
  get their own folded matrices);
* results packed back to RGBA words in-register and written through a
  pipelined output block.

Tap weights are the stb-derived packed_taps shared with the exact
path (reference src/image-scaler.cc:29-33); matmul f32 accumulation
replaces the reference's chain order (video path parity is not
stb-bound: the reference resizes video with swscale bilinear,
reference src/video-source.cc:352-354).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from timg_tpu.ops.resize_np import (STB_DOWNSAMPLE_FILTER,
                                    STB_UPSAMPLE_FILTER, packed_taps)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.lru_cache(maxsize=64)
def _axis_plan(in_size: int, out_size: int, tile: int, horizontal: bool,
               win_align: int, start_align: int = 1):
    """Banded per-tile tap plan: (starts [K], win, tiles [K, win, tile]).

    Tile k of ``tile`` outputs reads input window [starts[k],
    starts[k]+win); folded/clamped edge taps follow the packed_taps
    conventions. Zero columns pad the last partial tile. With
    ``start_align``, window starts are rounded down to the alignment
    (Mosaic HBM memref slices must be lane-tile aligned)."""
    up, down = STB_UPSAMPLE_FILTER, STB_DOWNSAMPLE_FILTER
    starts, coeffs = packed_taps(in_size, out_size, up, down, horizontal)
    ntaps = coeffs.shape[1]
    k_tiles = -(-out_size // tile)

    s_k = np.zeros(k_tiles, np.int64)
    his = np.zeros(k_tiles, np.int64)
    for k in range(k_tiles):
        rows = range(k * tile, min((k + 1) * tile, out_size))
        lo = min(int(starts[o]) for o in rows)
        his[k] = max(int(starts[o]) + ntaps for o in rows)
        s_k[k] = max(min(lo, in_size - 1), 0)
    s_k = (s_k // start_align) * start_align
    width = int((his - s_k).max())
    win = min(_round_up(width, win_align), in_size)
    # Clamp starts into bounds, re-align, and widen the window until
    # every tile's taps are covered (the aligned clamp can otherwise
    # push a window below its tile's rows when in_size is not a
    # start_align multiple).
    while True:
        s_k = np.minimum(s_k, max(in_size - win, 0))
        s_k = np.maximum(s_k, 0)
        s_k = (s_k // start_align) * start_align
        need = int((np.minimum(his, in_size) - s_k).max())
        if need <= win or win >= in_size:
            break
        win = min(_round_up(need, win_align), in_size)

    tiles = np.zeros((k_tiles, win, tile), np.float32)
    for o in range(out_size):
        k, j = divmod(o, tile)
        for t in range(ntaps):
            c = coeffs[o, t]
            if c != 0.0:
                i = min(max(int(starts[o]) + t, 0), in_size - 1)
                li = min(max(i - int(s_k[k]), 0), win - 1)
                tiles[k, li, j] += c
    return s_k, win, tiles


def _vmem_estimate(h, w, oh, ow, win_w, win_v, rt):
    ohp = _round_up(oh, 128)
    return (2 * h * win_w * 4            # window slots (i32)
            + ohp * win_w * 4            # v-pass result (f32 value)
            + rt * 128 * win_v * 2       # mv tiles (bf16)
            + 2 * win_w * 256 * 2        # mw block (bf16, dbl buffered)
            + 2 * oh * 256 * 4           # out block (i32)
            + h * win_w * 4)             # unpack temps


def _make_kernel(h, w, oh, oh_pad, ow_pad, win_w, win_v, rt, sv,
                 n_steps, kq):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(s_ref, words_hbm, mv_ref, mw_ref, out_ref,
               win_scratch, sem):
        j = pl.program_id(0)
        q = pl.program_id(1)
        lin = j * kq + q

        def dma(slot, b_idx, q_idx):
            # Window starts are aligned host-side; multiple_of lets
            # Mosaic prove the lane-dim slice is tile-divisible.
            start = pl.multiple_of(s_ref[q_idx], 128)
            return pltpu.make_async_copy(
                words_hbm.at[b_idx, :, pl.ds(start, win_w)],
                win_scratch.at[slot],
                sem.at[slot],
            )

        @pl.when(lin == 0)
        def _warm():
            dma(0, j, q).start()

        slot = lin % 2

        @pl.when(lin + 1 < n_steps)
        def _prefetch():
            nq = jnp.where(q + 1 < kq, q + 1, 0)
            nj = jnp.where(q + 1 < kq, j, j + 1)
            dma((lin + 1) % 2, nj, nq).start()

        dma(slot, j, q).wait()
        window = win_scratch[slot]                        # [H, win_w] i32

        packed = None
        for c in range(3):
            plane = ((window >> (8 * c)) & 0xFF).astype(jnp.bfloat16)
            vparts = []
            for r in range(rt):
                seg = plane[sv[r]:sv[r] + win_v]          # [win_v, win_w]
                vparts.append(jax.lax.dot_general(
                    mv_ref[r], seg,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))  # [128, win_w]
            v = jnp.concatenate(vparts, axis=0)[:oh]      # [OH, win_w]
            hpass = jax.lax.dot_general(
                v.astype(jnp.bfloat16), mw_ref[0],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # [OH, 256]
            vi = jnp.clip(hpass + jnp.float32(0.5),
                          0.0, 255.0).astype(jnp.int32)
            packed = vi if c == 0 else packed | (vi << (8 * c))
        packed = packed | jnp.int32(-(1 << 24))
        if oh_pad != oh:
            packed = jnp.pad(packed, ((0, oh_pad - oh), (0, 0)))
        out_ref[0] = packed

    return kernel


@functools.partial(jax.jit, static_argnames=("out_h", "out_w",
                                             "interpret", "out_h_pad",
                                             "out_w_pad"))
def resize_video_words_pallas(words: jax.Array, out_h: int, out_w: int,
                              interpret: bool = False,
                              out_h_pad: int = 0,
                              out_w_pad: int = 0) -> jax.Array:
    """[B, H, W] i32 RGBA words -> [B, out_h, out_w] i32 words.

    With ``out_h_pad``/``out_w_pad`` the result is [B, out_h_pad,
    out_w_pad] with zero rows below out_h and the natural strip
    padding right of out_w (downstream dither kernels want 128-row /
    128-col aligned planes; emitting them here skips a 0.5 GB pad
    copy per 128-frame 720p batch)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w = words.shape
    s_w, win_w, tiles_w = _axis_plan(w, out_w, 256, True, 128,
                                     start_align=128)
    s_v, win_v, tiles_v = _axis_plan(h, out_h, 128, False, 16)
    rt = tiles_v.shape[0]
    kq = tiles_w.shape[0]
    ow_pad = kq * 256
    oh_pad = out_h
    if out_h_pad:
        if out_h_pad < out_h or out_h_pad % 8:
            raise ValueError("out_h_pad must be >= out_h, 8-aligned")
        oh_pad = out_h_pad
    if out_w_pad and out_w_pad != ow_pad:
        raise ValueError(f"out_w_pad must be the strip width {ow_pad}")
    sv = tuple(int(x) for x in s_v)
    # transposed vertical tiles: [rt, 128, win_v]
    mv = jnp.asarray(np.ascontiguousarray(
        tiles_v.transpose(0, 2, 1)), jnp.bfloat16)
    mw = jnp.asarray(tiles_w, jnp.bfloat16)               # [kq, win_w, 256]
    starts = jnp.asarray(s_w, jnp.int32)

    n_steps = b * kq
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, kq),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),         # words in HBM
            pl.BlockSpec((rt, 128, win_v), lambda j, q, s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, win_w, 256), lambda j, q, s: (q, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, oh_pad, 256),
                               lambda j, q, s: (j, 0, q),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, h, win_w), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _make_kernel(h, w, out_h, oh_pad, ow_pad, win_w, win_v, rt, sv,
                     n_steps, kq),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, oh_pad, ow_pad), jnp.int32),
        interpret=interpret,
    )(starts, words, mv, mw)
    if out_h_pad or out_w_pad:
        return out
    if ow_pad != out_w:
        out = out[:, :, :out_w]
    return out


def fits_pallas(h: int, w: int, out_h: int, out_w: int) -> bool:
    """Whether the strip kernel's VMEM footprint fits comfortably."""
    if w % 128 != 0:
        return False
    try:
        s_w, win_w, tiles_w = _axis_plan(w, out_w, 256, True, 128,
                                         start_align=128)
        s_v, win_v, tiles_v = _axis_plan(h, out_h, 128, False, 16)
    except Exception:
        return False
    est = _vmem_estimate(h, w, out_h, out_w, win_w, win_v,
                         tiles_v.shape[0])
    return est < 13 * 1024 * 1024


def _make_tiled_kernel(h, w, oh, oh_pad, ow_pad, win_w, win_v, rt, kq,
                       n_steps):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(sw_ref, sv_ref, words_hbm, mv_ref, mw_ref, out_ref,
               win_scratch, sem):
        j = pl.program_id(0)
        q = pl.program_id(1)
        r = pl.program_id(2)
        lin = (j * kq + q) * rt + r

        def dma(slot, b_idx, q_idx, r_idx):
            cs = pl.multiple_of(sw_ref[q_idx], 128)
            rs = pl.multiple_of(sv_ref[r_idx], 8)
            return pltpu.make_async_copy(
                words_hbm.at[b_idx, pl.ds(rs, win_v), pl.ds(cs, win_w)],
                win_scratch.at[slot],
                sem.at[slot],
            )

        @pl.when(lin == 0)
        def _warm():
            dma(0, j, q, r).start()

        slot = lin % 2

        @pl.when(lin + 1 < n_steps)
        def _prefetch():
            nr = jnp.where(r + 1 < rt, r + 1, 0)
            q1 = jnp.where(r + 1 < rt, q, q + 1)
            nq = jnp.where(q1 < kq, q1, 0)
            nj = jnp.where(q1 < kq, j, j + 1)
            dma((lin + 1) % 2, nj, nq, nr).start()

        dma(slot, j, q, r).wait()
        window = win_scratch[slot]                 # [win_v, win_w] i32

        packed = None
        for c in range(3):
            plane = ((window >> (8 * c)) & 0xFF).astype(jnp.bfloat16)
            v = jax.lax.dot_general(
                mv_ref[0], plane,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # [128, win_w]
            hpass = jax.lax.dot_general(
                v.astype(jnp.bfloat16), mw_ref[0],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # [128, 256]
            vi = jnp.clip(hpass + jnp.float32(0.5),
                          0.0, 255.0).astype(jnp.int32)
            packed = vi if c == 0 else packed | (vi << (8 * c))
        packed = packed | jnp.int32(-(1 << 24))
        if oh_pad != oh:
            # honor the pad_to contract: rows beyond out_h are zero
            rows = (r * 128
                    + jax.lax.broadcasted_iota(jnp.int32, (128, 256), 0))
            packed = jnp.where(rows < oh, packed, 0)
        out_ref[0] = packed

    return kernel


@functools.partial(jax.jit, static_argnames=("out_h", "out_w",
                                             "interpret", "out_h_pad",
                                             "out_w_pad"))
def resize_video_words_pallas_tiled(words: jax.Array, out_h: int,
                                    out_w: int, interpret: bool = False,
                                    out_h_pad: int = 0,
                                    out_w_pad: int = 0) -> jax.Array:
    """Row-tiled strip resize for inputs whose full-height window does
    not fit VMEM (4K-class). Each grid step DMAs only the [win_v,
    win_w] input window its 128-row output tile needs; the vertical
    tap matrix is per-row-tile (128-aligned outputs), streamed like
    the horizontal one. Pad rows (beyond out_h) are zeroed, matching
    resize_video_words's pad_to contract."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w = words.shape
    s_w, win_w, tiles_w = _axis_plan(w, out_w, 256, True, 128,
                                     start_align=128)
    s_v, win_v, tiles_v = _axis_plan(h, out_h, 128, False, 8,
                                     start_align=8)
    rt = tiles_v.shape[0]
    kq = tiles_w.shape[0]
    ow_pad = kq * 256
    oh_pad = rt * 128
    if out_h_pad and (out_h_pad != oh_pad):
        raise ValueError(f"out_h_pad must be the tile height {oh_pad}")
    if out_w_pad and out_w_pad != ow_pad:
        raise ValueError(f"out_w_pad must be the strip width {ow_pad}")
    # per-tile transposed vertical matrices [rt, 128, win_v]
    mv = jnp.asarray(np.ascontiguousarray(
        tiles_v.transpose(0, 2, 1)), jnp.bfloat16)
    mw = jnp.asarray(tiles_w, jnp.bfloat16)       # [kq, win_w, 256]
    starts_w = jnp.asarray(s_w, jnp.int32)
    starts_v = jnp.asarray(s_v, jnp.int32)

    n_steps = b * kq * rt
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, kq, rt),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 128, win_v), lambda j, q, r, sw, sv:
                         (r, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, win_w, 256), lambda j, q, r, sw, sv:
                         (q, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 128, 256),
                               lambda j, q, r, sw, sv: (j, r, q),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, win_v, win_w), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _make_tiled_kernel(h, w, out_h, oh_pad, ow_pad, win_w, win_v,
                           rt, kq, n_steps),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, oh_pad, ow_pad), jnp.int32),
        interpret=interpret,
    )(starts_w, starts_v, words, mv, mw)
    if out_h_pad or out_w_pad:
        return out
    return out[:, :out_h, :out_w]


def fits_pallas_tiled(h: int, w: int, out_h: int, out_w: int) -> bool:
    """VMEM check for the row-tiled variant."""
    if w % 128 != 0:
        return False
    try:
        _, win_w, tw = _axis_plan(w, out_w, 256, True, 128,
                                  start_align=128)
        _, win_v, tv = _axis_plan(h, out_h, 128, False, 8,
                                  start_align=8)
    except Exception:
        return False
    est = (2 * win_v * win_w * 4          # window slots
           + 2 * 128 * win_v * 2          # mv blocks (dbl buffered)
           + 2 * win_w * 256 * 2          # mw blocks
           + 2 * 128 * 256 * 4            # out blocks
           + 3 * win_v * win_w * 4)       # unpack temps
    return est < 13 * 1024 * 1024
