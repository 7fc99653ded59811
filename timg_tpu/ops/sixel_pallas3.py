"""All-Pallas FS dither pipeline (cube palette): skew, wavefront and
transposes without any XLA relayout pass.

The superseded v2 kernel (removed; see git history) was fast
(~4.5 ms/128x720p on v5e) but
its *surroundings* are not: producing its [T, B, Hp] wavefront input
from [B, Hp, W] frames costs an XLA pad/reshape skew (~56 ms) plus an
HBM transpose, an order of magnitude more than the dither itself. Here
the whole layout pipeline is Pallas:

1. ``_skewT``: one kernel fuses the *fine* skew and the transpose.
   The wavefront needs S[t, b, y] = img[b, y, t - 2y]. Decompose
   2y = 256*(y//128) + 2*(y%128). The fine part (<= 254) is applied
   in-VMEM by a 7-step barrel shifter (conditional ``pltpu.roll`` per
   sublane row); the block is then word-transposed. Output
   F[u, b, y] = img[b, y, u - 2*(y%128)], shape [Wf, B, Hp].
2. The FS kernel absorbs the *coarse* part through its input specs:
   one BlockSpec per 128-row block r, whose index map is shifted by
   256r/K blocks (clamped; clamped reads alias valid blocks and are
   masked by the wavefront validity test, which still uses the global
   x = t - 2y).
3. ``_transpose_bwd`` returns the packed index planes to [B, Hp, T/4]
   with the same word-transpose trick, and ``_unskewT`` inverts the
   skew at word granularity (barrel shift left by (y%128)//2 words,
   half-word blend for odd rows, coarse 2*(y//128) word-blocks in the
   input index maps).

Bit-identical with the v1/v2 formulations (tests assert it).

Reference for behavior: libsixel-class 256-color dithering as used by
the reference's sixel canvas (reference src/sixel-canvas.cc:134-148).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from timg_tpu.ops.sixel import _CUBE_LEVELS


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


_SKEW_BLK = 768  # skew output block; wf must be a multiple


def _skewT(words: jax.Array, wf: int, interpret: bool = False
           ) -> jax.Array:
    """[B, Hp, Wp] i32 -> F [Wf, B, Hp] i32 with
    F[u, b, y] = words[b, y, u - 2*(y % 128)] (garbage outside, callers
    mask). Wf >= Wp + 256, multiple of the _SKEW_BLK output block.

    Wide output blocks amortize the 256-col barrel-shift halo: 768
    cols per step from a 1024-col window cost 1.33x input read and
    barrel-shift work per output column (vs 1.67x at 384 and 3x for
    naive 128-col blocking).  The ~24 MB VMEM footprint needs the
    per-kernel limit raised above the 16 MB default via
    CompilerParams (v5e has 128 MB)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, hp, wp = words.shape
    pmax = wp // 128 - 1
    bb = 8
    blk = _SKEW_BLK
    nin = blk // 128 + 2
    win = blk + 256

    def kernel(*refs):
        in_refs, out_ref = refs[:nin], refs[nin]
        cat = jnp.concatenate([r[...] for r in in_refs],
                              axis=2)                      # [bb,128,win]
        yloc = jax.lax.broadcasted_iota(jnp.int32, (bb, 128, win), 1)
        for bit in range(7):
            shift = 2 << bit
            mask = ((yloc >> bit) & 1) == 1
            cat = jnp.where(mask, pltpu.roll(cat, shift=shift, axis=2),
                            cat)
        fine = cat[:, :, 256:win]                          # [bb,128,blk]
        out_ref[...] = jnp.transpose(
            fine.reshape(bb * 128, blk), (1, 0)).reshape(blk, bb, 128)

    def in_spec(off):
        return pl.BlockSpec(
            (bb, 128, 128),
            lambda j, rb, p, off=off: (
                j, rb, jnp.clip((blk // 128) * p + off - 2, 0, pmax)),
            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(b // bb, hp // 128, wf // blk),
        in_specs=[in_spec(off) for off in range(nin)],
        out_specs=pl.BlockSpec((blk, bb, 128),
                               lambda j, rb, p: (p, j, rb),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((wf, b, hp), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*([words] * nin))


def _transpose_bwd(packed: jax.Array, interpret: bool = False) -> jax.Array:
    """[T4, B, Hp] i32 -> [B, Hp, T4] i32 (word transpose)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t4, b, hp = packed.shape
    bb = 8

    def kernel(in_ref, out_ref):
        blk = in_ref[...].reshape(128, bb * 128)
        out_ref[...] = jnp.transpose(blk, (1, 0)).reshape(bb, 128, 128)

    return pl.pallas_call(
        kernel,
        grid=(b // bb, hp // 128, t4 // 128),
        in_specs=[pl.BlockSpec((128, bb, 128),
                               lambda j, rb, i: (i, j, rb),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bb, 128, 128),
                               lambda j, rb, i: (j, rb, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp, t4), jnp.int32),
        interpret=interpret,
    )(packed)


def _unskewT(packed_bht: jax.Array, wp: int,
             interpret: bool = False) -> jax.Array:
    """[B, Hp, T4] packed-index words -> [B, Hp, Wp/4] words with
    out[b, y, m].bytes == idx[b, y, 4m:4m+4], i.e. the inverse skew
    idx[b, y, x] = bytes[b, y, x + 2y].

    The word shift y//2 splits into 128*(rb//2) word-blocks absorbed by
    the input index maps and an in-VMEM 7-step barrel shift left by
    64*(rb&1) + (y%128)//2 words, plus a half-word blend for odd rows
    (the 2-byte remainder of an odd 2y)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, hp, t4 = packed_bht.shape
    wp4 = wp // 4
    nblk = t4 // 128 - 1
    # input window per (j, rb) step: whole output row plus the maximum
    # barrel displacement (64*(rb&1) + 63 words) plus the odd-row spill
    n_in = -(-(wp4 + 129) // 128)
    win = n_in * 128
    # batch block: adapt to the 16 MB scoped-VMEM budget (4K rows blow
    # it at bb=8; the trailing block dims stay (128, wp4) so a smaller
    # leading dim is always legal)
    bb = 8
    while bb > 1 and 2 * bb * 128 * (win + wp4) * 4 > 12 * 1024 * 1024:
        bb //= 2

    def kernel(*refs):
        in_refs = refs[:n_in]
        out_ref = refs[n_in]
        rb = pl.program_id(1)
        cat = jnp.concatenate([r[...] for r in in_refs],
                              axis=2)                      # [bb,128,win]
        yl = jax.lax.broadcasted_iota(jnp.int32, (bb, 128, win), 1)
        s = (yl >> 1) + 64 * (rb & 1)
        for bit in range(7):
            sh = 1 << bit
            cond = ((s >> bit) & 1) == 1
            cat = jnp.where(
                cond, pltpu.roll(cat, shift=win - sh, axis=2), cat)
        nxt = pltpu.roll(cat, shift=win - 1, axis=2)
        blend = jax.lax.shift_right_logical(cat, 16) | (nxt << 16)
        fixed = jnp.where((yl & 1) == 1, blend, cat)
        out_ref[...] = fixed[:, :, 0:wp4]

    def in_spec(c):
        return pl.BlockSpec(
            (bb, 128, 128),
            lambda j, rb, c=c: (
                j, rb, jnp.clip(rb // 2 + c, 0, nblk)),
            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(b // bb, hp // 128),
        in_specs=[in_spec(c) for c in range(n_in)],
        out_specs=pl.BlockSpec((bb, 128, wp4),
                               lambda j, rb: (j, rb, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp4), jnp.int32),
        interpret=interpret,
    )(*([packed_bht] * n_in))


def _make_wavefront_kernel(b: int, hp: int, K: int, h: int, w: int,
                           n_tables: int, make_quantize):
    """Row-block-skipping FS wavefront driver (shared by the cube and
    tree quantizers).

    The [b, hp] wavefront arrays of the original formulation waste
    ~45% of the VPU work: at any step t only rows with 0 <= t-2y < w
    carry valid pixels, but whole-array ops compute every row block.
    Here the kernel body runs **per 128-row block** under a
    ``pl.when`` activity guard -- a block only computes during the
    step range that can touch it (plus 3 drain steps so the e1/e2/e3
    carries settle to zero before the guard closes).  The only value
    crossing block boundaries is the rolled 3/16-5/16-1/16 error mix
    entering the block's first row; it rides in a small VMEM scratch
    (``bnd_ref[rb, c, :, k]``, written by block rb at step k, lane 0
    of the rolled mix) which is zeroed whenever the producer block is
    inactive.  Values and association order are exactly those of the
    whole-array kernel, so output stays bit-identical (tests assert
    it).

    ``make_quantize(table_refs)`` returns ``quantize(vs) ->
    (idx, colors)`` over [b, 128] arrays (quantizers needing rounded
    values compute them themselves -- the cube path never does, so the
    driver must not spend the 3 rounds/step); refs order: nrb inputs,
    n_tables tables, out, err scratch, bnd scratch."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nrb = hp // 128

    def kernel(*refs):
        in_refs = refs[:nrb]
        table_refs = refs[nrb:nrb + n_tables]
        out_ref = refs[nrb + n_tables]
        err_ref = refs[nrb + n_tables + 1]
        bnd_ref = refs[nrb + n_tables + 2]

        @pl.when(pl.program_id(0) == 0)
        def _init():
            err_ref[...] = jnp.zeros_like(err_ref)

        quantize = make_quantize(table_refs)
        t0 = pl.program_id(0) * K
        yloc = jax.lax.broadcasted_iota(jnp.int32, (b, 128), 1)

        for rb in range(nrb):
            y_lo = 128 * rb
            if y_lo >= h:
                continue  # rows entirely beyond the image: no work,
                # no consumer (the next block is beyond h too)
            y_max = min(y_lo + 127, h - 1)
            sl = slice(y_lo, y_lo + 128)
            active = jnp.logical_and(t0 + K - 1 >= 2 * y_lo,
                                     t0 <= w - 1 + 2 * y_max + 3)

            @pl.when(jnp.logical_not(active))
            def _quiet(rb=rb):
                # consumers read zeros while this block is inactive
                bnd_ref[rb] = jnp.zeros_like(bnd_ref[rb])

            @pl.when(active)
            def _block(rb=rb, y_lo=y_lo, y_max=y_max, sl=sl):
                ys = y_lo + yloc
                yloc3 = jax.lax.broadcasted_iota(
                    jnp.int32, (3, b, 128), 2)
                # error carries ride channel-packed [3, b, 128]: the
                # whole FS propagation (mix/roll/boundary/incoming/
                # clip) runs as single stacked VPU ops instead of 3x
                # per-channel op issues -- same per-lane arithmetic,
                # bit-identical output
                e1 = err_ref[0:3, :, sl]
                e2 = err_ref[3:6, :, sl]
                e3 = err_ref[6:9, :, sl]
                packed = None
                for k in range(K):
                    t = t0 + k
                    xs = t - 2 * ys
                    mask = jnp.logical_and(xs >= 0, xs < w)
                    if y_max == h - 1 and y_lo + 127 >= h:
                        mask = jnp.logical_and(mask, ys < h)
                    word = in_refs[rb][k]
                    cols3 = jnp.stack(
                        [((word >> (8 * c)) & 0xFF) for c in range(3)]
                    ).astype(jnp.float32)
                    mix = (e1 * (3.0 / 16.0) + e2 * (5.0 / 16.0)
                           + e3 * (1.0 / 16.0))
                    rolled = pltpu.roll(mix, shift=1, axis=2)
                    # lane 0 of the rolled mix = the boundary value
                    # the next block's first row consumes
                    bnd_ref[rb, :, :, k:k + 1] = rolled[:, :, 0:1]
                    if rb == 0:
                        upmix = jnp.where(yloc3 == 0,
                                          jnp.float32(0.0), rolled)
                    else:
                        row0 = jnp.broadcast_to(
                            bnd_ref[rb - 1, :, :, k:k + 1],
                            (3, b, 128))
                        upmix = jnp.where(yloc3 == 0, row0, rolled)
                    v3 = jnp.clip(cols3 + (e1 * (7.0 / 16.0) + upmix),
                                  0.0, 255.0)
                    idx, colors = quantize([v3[0], v3[1], v3[2]])
                    new_e = jnp.where(
                        mask[None], v3 - jnp.stack(colors),
                        jnp.float32(0.0))
                    e3, e2, e1 = e2, e1, new_e
                    shift = 8 * (k % 4)
                    packed = (idx << shift if k % 4 == 0
                              else packed | (idx << shift))
                    if k % 4 == 3:
                        out_ref[k // 4, :, sl] = packed
                err_ref[0:3, :, sl] = e1
                err_ref[3:6, :, sl] = e2
                err_ref[6:9, :, sl] = e3

    return kernel


def _make_fs_kernel(b: int, hp: int, K: int, h: int, w: int, wf: int):
    lr, lg, lb = _CUBE_LEVELS
    levels = (lr, lg, lb)

    def make_quantize(_tables):
        def quantize(vs):
            idx = None
            colors = []
            for c in range(3):
                n = levels[c]
                q = jnp.round(vs[c] * jnp.float32((n - 1) / 255.0))
                colors.append(jnp.round(q * jnp.float32(255.0 / (n - 1))))
                qi = q.astype(jnp.int32)
                idx = qi if idx is None else idx * n + qi
            return idx, colors
        return quantize

    return _make_wavefront_kernel(b, hp, K, h, w, 0, make_quantize)


@functools.partial(jax.jit, static_argnames=("h", "w", "interpret",
                                             "out_u8", "out_padded"))
def fs_dither_cube_fused(frames_rgba: jax.Array, h: int, w: int,
                         interpret: bool = False,
                         out_u8: bool = False,
                         out_padded: bool = False) -> jax.Array:
    """[B, H, W, 4] uint8 (or [B, H, W] i32 RGBA words) -> [B, H, W]
    cube-palette FS indices (int32, or uint8 with ``out_u8``). All
    layout work in Pallas.

    The word input may arrive *pre-padded* to [B8, Hp, Wp] (batch
    multiple of 8, dims multiples of 128, h/w give the valid extent;
    pad content is arbitrary -- the wavefront masks it). The producer
    (resize_pallas with out_h_pad/out_w_pad) emits that layout
    directly, skipping a 0.5 GB XLA pad here. With ``out_padded`` the
    result stays [B8, Hp, Wp] uint8 (row pitch Wp); the host sixel
    assembler consumes pitched planes, skipping the slice copy."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K = 8   # 16 was tried: ~2x compile time (>14 min through the
            # tunnel, Mosaic unrolls K*nrb step bodies) for an
            # expected ~2% win -- not worth the first-run latency
    b0 = frames_rgba.shape[0]
    b = _round_up(b0, 8)
    hp = _round_up(h, 128)
    wp = _round_up(w, 128)

    x = frames_rgba
    if x.ndim == 4:
        if x.shape[-1] != 4:
            x = jnp.pad(x, [(0, 0)] * 3 + [(0, 4 - x.shape[-1])])
        x = jax.lax.bitcast_convert_type(x, jnp.int32)     # [B, H, W]
    if x.shape[1] >= h and x.shape[1] % 128 == 0 \
            and x.shape[2] >= w and x.shape[2] % 128 == 0 \
            and x.shape[0] % 8 == 0:
        b, hp, wp = x.shape                                # pre-padded
    else:
        pad_b, pad_h, pad_w = b - b0, hp - h, wp - w
        if pad_b or pad_h or pad_w:
            x = jnp.pad(x, ((0, pad_b), (0, pad_h), (0, pad_w)))
    wf = _round_up(wp + 256, _SKEW_BLK)
    t_len = _round_up(w + 2 * (h - 1), 512)
    words = x                                              # [B, Hp, Wp]

    cols = _skewT(words, wf, interpret=interpret)          # [Wf, B, Hp]

    nrb = hp // 128

    def in_spec(r):
        return pl.BlockSpec(
            (K, b, 128),
            lambda i, r=r: (jnp.clip(i - (256 // K) * r, 0,
                                     wf // K - 1), 0, r),
            memory_space=pltpu.VMEM)

    packed = pl.pallas_call(
        _make_fs_kernel(b, hp, K, h, w, wf),
        grid=(t_len // K,),
        in_specs=[in_spec(r) for r in range(nrb)],
        out_specs=pl.BlockSpec((K // 4, b, hp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_len // 4, b, hp), jnp.int32),
        scratch_shapes=[pltpu.VMEM((9, b, hp), jnp.float32),
                        pltpu.VMEM((hp // 128, 3, b, K), jnp.float32)],
        interpret=interpret,
    )(*([cols] * nrb))

    packed_bht = _transpose_bwd(packed, interpret=interpret)
    words = _unskewT(packed_bht, wp, interpret=interpret)  # [B, Hp, Wp/4]
    idx = jax.lax.bitcast_convert_type(words, jnp.uint8).reshape(
        b, hp, wp)
    out = idx if out_padded else idx[:b0, :h, :w]
    return out if out_u8 else out.astype(jnp.int32)


def _make_wavefront_kernel_int(b: int, hp: int, K: int, h: int, w: int,
                               n_tables: int, make_quantize):
    """Integer-FS wavefront driver: libsixel's exact error arithmetic
    (ref src/sixel-canvas.cc:134-148 -> libsixel quant.c
    sixel_quant_apply_palette; scalar spec:
    ops/libsixel_quant.apply_palette_bucket_table).

    Differences from the f32 driver (_make_wavefront_kernel):

    * carries are raw integer *offsets* (pixel - palette color), not
      pre-weighted error mixes — libsixel truncates each neighbor
      contribution separately (``offset * num / 16`` with C
      truncation toward zero) and clamps the target to [0, 255] after
      *every* write, so the four incoming contributions must fold in
      source-raster order with a clamp between each add:
      upper-left (1/16) -> up (5/16) -> upper-right (3/16) ->
      left (7/16);
    * all arithmetic is int32; no rounding anywhere.

    Wavefront mapping of the carries (same aging as the f32 driver,
    verified bit-identical against the raster-scan C mirror): at a
    pixel's step, o1 = offsets one step old (same-row left neighbor,
    7/16 unrolled; upper-right 3/16 rolled), o2 = two steps (up, 5/16
    rolled), o3 = three steps (upper-left, 1/16 rolled)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nrb = hp // 128

    def trunc16(off, num):
        q = off * num
        aq = jax.lax.shift_right_logical(jnp.abs(q), 4)
        return jnp.where(q < 0, -aq, aq)

    def kernel(*refs):
        in_refs = refs[:nrb]
        table_refs = refs[nrb:nrb + n_tables]
        out_ref = refs[nrb + n_tables]
        err_ref = refs[nrb + n_tables + 1]
        bnd_ref = refs[nrb + n_tables + 2]

        @pl.when(pl.program_id(0) == 0)
        def _init():
            err_ref[...] = jnp.zeros_like(err_ref)

        quantize, diff_mask = make_quantize(table_refs)
        t0 = pl.program_id(0) * K
        yloc = jax.lax.broadcasted_iota(jnp.int32, (b, 128), 1)

        for rb in range(nrb):
            y_lo = 128 * rb
            if y_lo >= h:
                continue
            y_max = min(y_lo + 127, h - 1)
            sl = slice(y_lo, y_lo + 128)
            active = jnp.logical_and(t0 + K - 1 >= 2 * y_lo,
                                     t0 <= w - 1 + 2 * y_max + 3)

            @pl.when(jnp.logical_not(active))
            def _quiet(rb=rb):
                bnd_ref[rb] = jnp.zeros_like(bnd_ref[rb])

            @pl.when(active)
            def _block(rb=rb, y_lo=y_lo, y_max=y_max, sl=sl):
                dmask = diff_mask()  # [1, b, 128] bool: frame diffuses
                ys = y_lo + yloc
                yloc3 = jax.lax.broadcasted_iota(
                    jnp.int32, (3, b, 128), 2)
                o1 = err_ref[0:3, :, sl]
                o2 = err_ref[3:6, :, sl]
                o3 = err_ref[6:9, :, sl]
                packed = None
                for k in range(K):
                    t = t0 + k
                    xs = t - 2 * ys
                    mask = jnp.logical_and(xs >= 0, xs < w)
                    if y_max == h - 1 and y_lo + 127 >= h:
                        mask = jnp.logical_and(mask, ys < h)
                    word = in_refs[rb][k]
                    cols3 = jnp.stack(
                        [((word >> (8 * c)) & 0xFF) for c in range(3)])
                    r1 = pltpu.roll(o1, shift=1, axis=2)
                    r2 = pltpu.roll(o2, shift=1, axis=2)
                    r3 = pltpu.roll(o3, shift=1, axis=2)
                    bnd_ref[rb, 0:3, :, k:k + 1] = r1[:, :, 0:1]
                    bnd_ref[rb, 3:6, :, k:k + 1] = r2[:, :, 0:1]
                    bnd_ref[rb, 6:9, :, k:k + 1] = r3[:, :, 0:1]
                    if rb == 0:
                        zero = jnp.int32(0)
                        u1 = jnp.where(yloc3 == 0, zero, r1)
                        u2 = jnp.where(yloc3 == 0, zero, r2)
                        u3 = jnp.where(yloc3 == 0, zero, r3)
                    else:
                        def row0(lo, hi, k=k, rb=rb):
                            return jnp.broadcast_to(
                                bnd_ref[rb - 1, lo:hi, :, k:k + 1],
                                (3, b, 128))
                        u1 = jnp.where(yloc3 == 0, row0(0, 3), r1)
                        u2 = jnp.where(yloc3 == 0, row0(3, 6), r2)
                        u3 = jnp.where(yloc3 == 0, row0(6, 9), r3)
                    # source-raster fold with clamp-on-store per write
                    v3 = jnp.clip(cols3 + trunc16(u3, 1), 0, 255)
                    v3 = jnp.clip(v3 + trunc16(u2, 5), 0, 255)
                    v3 = jnp.clip(v3 + trunc16(u1, 3), 0, 255)
                    v3 = jnp.clip(v3 + trunc16(o1, 7), 0, 255)
                    idx, colors = quantize([v3[0], v3[1], v3[2]])
                    new_o = jnp.where(
                        jnp.logical_and(mask[None], dmask),
                        v3 - jnp.stack(colors), 0)
                    o3, o2, o1 = o2, o1, new_o
                    shift = 8 * (k % 4)
                    packed = (idx << shift if k % 4 == 0
                              else packed | (idx << shift))
                    if k % 4 == 3:
                        out_ref[k // 4, :, sl] = packed
                err_ref[0:3, :, sl] = o1
                err_ref[3:6, :, sl] = o2
                err_ref[6:9, :, sl] = o3

    return kernel


def _make_fs_table_kernel(b: int, hp: int, K: int, h: int, w: int):
    """Quantizer for the libsixel device path: 15-bit bucket key ->
    prefilled nearest-index table (per-frame, like the reference's
    per-frame sixel_dither_new: 32768 u8 entries packed [64, b, 128]
    i32 words) + per-frame palette lookup ([2, b, 128] packed 0xRRGGBB
    words).

    The 32768-entry lookup decomposes as row = key>>9 (64 sublane
    rows), lane = (key>>2) & 127, byte = key & 3: ONE [64*b, 128]
    2D lane-gather fetches every row's candidate word aligned to the
    output positions, then a masked-or selects each lane's row.
    (Measured on v5e-1 vs the r3 fori-loop of 64 masked per-row
    gathers: 2.05x faster at identical results — the bulk cost is the
    single big gather; Mosaic has no >128-entry or sublane-axis
    dynamic gather, so a flat 15-bit lookup remains impossible.)"""

    def make_quantize(table_refs):
        bucket_ref, pal_ref, diff_ref = table_refs

        def gather_row(tb, lanes):
            # tb: [b, 128] (this frame-batch's row); lanes: [b, 128]
            return jnp.take_along_axis(tb, lanes, axis=1)

        def diff_mask():
            # per-frame diffuse flags [1, b, 128] (libsixel disables
            # diffusion when a frame has <= reqcolors distinct buckets)
            return (diff_ref[...] > 0)

        def quantize(vs):
            v0, v1, v2 = vs  # int32, already clamped to [0, 255]
            key = ((jax.lax.shift_right_logical(v0, 3) << 10)
                   | (jax.lax.shift_right_logical(v1, 3) << 5)
                   | jax.lax.shift_right_logical(v2, 3))
            word_key = jax.lax.shift_right_logical(key, 2)
            row = jax.lax.shift_right_logical(word_key, 7)
            lane = word_key & 127
            byte = key & 3

            tab = bucket_ref[...].reshape(64 * b, 128)
            lanes64 = jnp.tile(lane, (64, 1))
            g = jnp.take_along_axis(tab, lanes64, axis=1).reshape(
                64, b, 128)
            # row select as a log2 bisection tree: the r4 fold was a
            # 64-deep or-chain (serial dependency); six halving selects
            # keyed on row's bits touch the same element count with a
            # depth-6 chain.  (r5 experiment for the ROADMAP "libsixel
            # device mode" record; byte-identical by construction.)
            for bit in (5, 4, 3, 2, 1, 0):
                half = 1 << bit
                g = jnp.where((row & half) != 0, g[half:2 * half],
                              g[:half])
            word = g[0]
            idx = jax.lax.shift_right_logical(
                word, 8 * byte) & 0xFF
            palw = jnp.where(idx < 128,
                             gather_row(pal_ref[0], idx),
                             gather_row(pal_ref[1], idx - 128))
            colors = [(jax.lax.shift_right_logical(palw, sh)) & 0xFF
                      for sh in (16, 8, 0)]
            return idx, colors
        return quantize, diff_mask

    return _make_wavefront_kernel_int(b, hp, K, h, w, 3, make_quantize)


@functools.partial(jax.jit, static_argnames=("h", "w", "interpret",
                                             "out_u8", "out_padded"))
def fs_dither_table_fused(frames_rgba: jax.Array, table_words: jax.Array,
                          pal_words: jax.Array, diff_words: jax.Array,
                          h: int, w: int,
                          interpret: bool = False,
                          out_u8: bool = False,
                          out_padded: bool = False) -> jax.Array:
    """libsixel-mode FS dither (integer semantics + prefilled bucket
    table), all-Pallas: same layout pipeline as fs_dither_cube_fused.
    ``table_words``: [64, B, 128] i32 (per-frame 32768-u8 tables packed
    LE); ``pal_words``: [2, B, 128] i32 0xRRGGBB per-frame palette
    words; ``diff_words``: [1, B, 128] i32 per-frame diffuse flags
    (0 = palette-only, libsixel's <=reqcolors rule).  B padded to the
    frames' batch multiple with repeats of the last entry.  See
    ops/libsixel_quant.py for the semantics spec and the deviation
    analysis vs quant.c's raster-order cache."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K = 8
    b0 = frames_rgba.shape[0]
    b = _round_up(b0, 8)
    hp = _round_up(h, 128)
    wp = _round_up(w, 128)

    x = frames_rgba
    if x.ndim == 4:
        if x.shape[-1] != 4:
            x = jnp.pad(x, [(0, 0)] * 3 + [(0, 4 - x.shape[-1])])
        x = jax.lax.bitcast_convert_type(x, jnp.int32)
    if x.shape[1] >= h and x.shape[1] % 128 == 0 \
            and x.shape[2] >= w and x.shape[2] % 128 == 0 \
            and x.shape[0] % 8 == 0:
        b, hp, wp = x.shape
    else:
        pad_b, pad_h, pad_w = b - b0, hp - h, wp - w
        if pad_b or pad_h or pad_w:
            x = jnp.pad(x, ((0, pad_b), (0, pad_h), (0, pad_w)))
    if table_words.shape[1] < b:  # pad per-frame tables to the batch
        padn = b - table_words.shape[1]
        table_words = jnp.concatenate(
            [table_words, jnp.repeat(table_words[:, -1:], padn, axis=1)],
            axis=1)
        pal_words = jnp.concatenate(
            [pal_words, jnp.repeat(pal_words[:, -1:], padn, axis=1)],
            axis=1)
        diff_words = jnp.concatenate(
            [diff_words, jnp.repeat(diff_words[:, -1:], padn, axis=1)],
            axis=1)
    wf = _round_up(wp + 256, _SKEW_BLK)
    t_len = _round_up(w + 2 * (h - 1), 512)

    cols = _skewT(x, wf, interpret=interpret)

    nrb = hp // 128

    def in_spec(r):
        return pl.BlockSpec(
            (K, b, 128),
            lambda i, r=r: (jnp.clip(i - (256 // K) * r, 0,
                                     wf // K - 1), 0, r),
            memory_space=pltpu.VMEM)

    packed = pl.pallas_call(
        _make_fs_table_kernel(b, hp, K, h, w),
        grid=(t_len // K,),
        in_specs=([in_spec(r) for r in range(nrb)]
                  + [pl.BlockSpec((64, b, 128), lambda i: (0, 0, 0),
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((2, b, 128), lambda i: (0, 0, 0),
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((1, b, 128), lambda i: (0, 0, 0),
                                  memory_space=pltpu.VMEM)]),
        out_specs=pl.BlockSpec((K // 4, b, hp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_len // 4, b, hp), jnp.int32),
        scratch_shapes=[pltpu.VMEM((9, b, hp), jnp.int32),
                        pltpu.VMEM((hp // 128, 9, b, K), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*([cols] * nrb), table_words, pal_words, diff_words)

    packed_bht = _transpose_bwd(packed, interpret=interpret)
    words_out = _unskewT(packed_bht, wp, interpret=interpret)
    idx = jax.lax.bitcast_convert_type(words_out, jnp.uint8).reshape(
        b, hp, wp)
    out = idx if out_padded else idx[:b0, :h, :w]
    return out if out_u8 else out.astype(jnp.int32)


def pack_libsixel_tables(tables, palettes, diffuses=None):
    """Host packing: per-frame (u8[B, 32768] bucket tables,
    [B, n, 3] u8 palettes, diffuse flags) -> ([64, B, 128] i32
    LE-packed table words, [2, B, 128] i32 0xRRGGBB palette words,
    [1, B, 128] i32 diffuse flags).  1-frame inputs may be passed
    unbatched; diffuses defaults to all-on."""
    import numpy as np

    t = np.ascontiguousarray(tables, dtype=np.uint8)
    if t.ndim == 1:
        t = t[None]
    bsz = t.shape[0]
    tw = t.view(np.int32).reshape(bsz, 64, 128).transpose(1, 0, 2).copy()
    pals = palettes if isinstance(palettes, (list, tuple)) \
        else [palettes] if np.asarray(palettes).ndim == 2 else palettes
    palw = np.zeros((bsz, 256), dtype=np.int64)
    for i in range(bsz):
        p = np.asarray(pals[i], dtype=np.int64)
        palw[i, :len(p)] = (p[:, 0] << 16) | (p[:, 1] << 8) | p[:, 2]
    palw = palw.astype(np.int32).reshape(bsz, 2, 128).transpose(
        1, 0, 2).copy()
    if diffuses is None:
        dw = np.ones((1, bsz, 128), dtype=np.int32)
    else:
        d = np.asarray(diffuses, dtype=np.int32).reshape(bsz)
        dw = np.broadcast_to(d[None, :, None], (1, bsz, 128)).copy()
    return tw, palw, dw


# 15-bit bucket base colors (bits << 3), the lookup keys' reconstruction.
def _bucket_bases():
    import numpy as np
    bkt = np.arange(1 << 15)
    return np.stack([(bkt >> 10 & 0x1F) << 3, (bkt >> 5 & 0x1F) << 3,
                     (bkt & 0x1F) << 3], axis=1).astype(np.int32)


@jax.jit
def build_bucket_tables_device(pals: jax.Array) -> jax.Array:
    """Device-side bucket-table build: [B, 256, 3] i32 palettes (tail
    entries replicated with the first color is fine -- strict-< argmin
    keeps the lowest index) -> [B, 32768] u8 nearest-index tables.

    One [32768, 3] x [3, 256] i32 contraction + first-min argmin per
    frame, mapped over the batch (materializing [B, 32768, 256] at
    once would be gigabytes). Integer math: exact, matches the C
    builder bit-for-bit (tests assert)."""
    base = jnp.asarray(_bucket_bases())  # [32768, 3]

    def one(pal):
        d = (base[:, None, :].astype(jnp.int32)
             - pal[None, :, :].astype(jnp.int32))
        dist = (d * d).sum(axis=2)  # [32768, 256]
        return jnp.argmin(dist, axis=1).astype(jnp.uint8)

    return jax.lax.map(one, pals)


def _quad_tables(levels: jax.Array, depth: int) -> jax.Array:
    """Fold the binary level tables into quaternary ones.

    levels[d, node] packs (axis << 8 | thr) for the binary tree.  Two
    binary levels collapse into one 4-way level whose table word packs
    the parent split and both child splits --
    [a0:2][t0:8][a1:2][t1:8][a2:2][t2:8] (30 bits) -- so one lane-gather
    per 4-way level replaces two.  The partition (and therefore every
    output index) is identical to the binary descent; only the search
    shape changes.  Returns [depth//2, 128] i32 (level q has 4**q nodes,
    q <= 3 -> all tables fit one 128-lane gather)."""
    qts = []
    for q in range(depth // 2):
        n = 4 ** q
        p = levels[2 * q, :n]
        l1 = levels[2 * q + 1]
        le = l1[0:2 * n:2]
        lo = l1[1:2 * n:2]
        word = (((p >> 8) << 28) | ((p & 0xFF) << 20)
                | ((le >> 8) << 18) | ((le & 0xFF) << 10)
                | ((lo >> 8) << 8) | (lo & 0xFF))
        qts.append(jnp.zeros(128, jnp.int32).at[:n].set(word))
    return jnp.stack(qts)


def _make_fs_tree_kernel(b: int, hp: int, K: int, h: int, w: int,
                         wf: int, depth: int):
    """FS kernel with balanced median-cut tree descent (adaptive
    palette at video rate): per pixel, ``depth//2`` packed lane-gathers
    over quaternary level tables (see _quad_tables) + one leaf-word
    lookup, instead of the cube's arithmetic quantization. Tables ride
    in VMEM; gathers are native 128-lane TPU lane-gathers (the per-rb
    wavefront arrays are exactly gather-width)."""

    def make_quantize(table_refs):
        levels_ref, leaves_ref = table_refs

        def gather(table_row, node):
            # table_row: [128] i32; node: [b, 128] i32 -> [b, 128] i32
            tb = jnp.broadcast_to(table_row[None, :], (b, 128))
            return jnp.take_along_axis(tb, node, axis=1)

        def quantize(vs):
            vqs = [jnp.round(v) for v in vs]

            def sel(axis):
                return jnp.where(axis == 0, vqs[0],
                                 jnp.where(axis == 1, vqs[1], vqs[2]))

            node = jnp.zeros((b, 128), jnp.int32)
            for q in range(depth // 2):
                wrd = gather(levels_ref[q], node)
                b0 = (sel((wrd >> 28) & 3)
                      > ((wrd >> 20) & 0xFF).astype(jnp.float32)
                      ).astype(jnp.int32)
                axis1 = jnp.where(b0 == 1, (wrd >> 8) & 3,
                                  (wrd >> 18) & 3)
                thr1 = jnp.where(b0 == 1, wrd & 0xFF,
                                 (wrd >> 10) & 0xFF).astype(jnp.float32)
                b1 = (sel(axis1) > thr1).astype(jnp.int32)
                node = node * 4 + b0 * 2 + b1
            leaf = jnp.where(node < 128,
                             gather(leaves_ref[0], node),
                             gather(leaves_ref[1], node - 128))
            idx = (leaf >> 24) & 0xFF
            colors = [((leaf >> sh) & 0xFF).astype(jnp.float32)
                      for sh in (16, 8, 0)]
            return idx, colors
        return quantize

    return _make_wavefront_kernel(b, hp, K, h, w, 2, make_quantize)


@functools.partial(jax.jit, static_argnames=("h", "w", "interpret",
                                             "out_u8", "out_padded"))
def fs_dither_tree_fused(frames_rgba: jax.Array, levels: jax.Array,
                         leaves: jax.Array, h: int, w: int,
                         interpret: bool = False,
                         out_u8: bool = False,
                         out_padded: bool = False) -> jax.Array:
    """Adaptive (median-cut tree) FS dither, all-Pallas: same layout
    pipeline as fs_dither_cube_fused with the tree-descent kernel.
    ``levels`` [depth,128] i32 and ``leaves`` [256] i32 come from
    sixel.median_cut_tree."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from timg_tpu.ops.sixel import TREE_DEPTH

    K = 8   # descent temporaries are heavier than the cube's; the
            # default 16 MB scoped-VMEM cap would force K=4, so the
            # pallas_call raises the limit (v5e has 128 MB) to keep
            # the cube path's grid-iteration count
    b0 = frames_rgba.shape[0]
    b = _round_up(b0, 8)
    hp = _round_up(h, 128)
    wp = _round_up(w, 128)

    x = frames_rgba
    if x.ndim == 4:
        if x.shape[-1] != 4:
            x = jnp.pad(x, [(0, 0)] * 3 + [(0, 4 - x.shape[-1])])
        x = jax.lax.bitcast_convert_type(x, jnp.int32)
    if x.shape[1] >= h and x.shape[1] % 128 == 0 \
            and x.shape[2] >= w and x.shape[2] % 128 == 0 \
            and x.shape[0] % 8 == 0:
        b, hp, wp = x.shape
    else:
        pad_b, pad_h, pad_w = b - b0, hp - h, wp - w
        if pad_b or pad_h or pad_w:
            x = jnp.pad(x, ((0, pad_b), (0, pad_h), (0, pad_w)))
    wf = _round_up(wp + 256, _SKEW_BLK)
    t_len = _round_up(w + 2 * (h - 1), 512)
    words = x

    cols = _skewT(words, wf, interpret=interpret)

    nrb = hp // 128

    def in_spec(r):
        return pl.BlockSpec(
            (K, b, 128),
            lambda i, r=r: (jnp.clip(i - (256 // K) * r, 0,
                                     wf // K - 1), 0, r),
            memory_space=pltpu.VMEM)

    leaves2 = leaves.reshape(2, 128)
    quads = _quad_tables(levels, TREE_DEPTH)
    packed = pl.pallas_call(
        _make_fs_tree_kernel(b, hp, K, h, w, wf, TREE_DEPTH),
        grid=(t_len // K,),
        in_specs=([in_spec(r) for r in range(nrb)]
                  + [pl.BlockSpec((TREE_DEPTH // 2, 128),
                                  lambda i: (0, 0),
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((2, 128), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)]),
        out_specs=pl.BlockSpec((K // 4, b, hp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_len // 4, b, hp), jnp.int32),
        scratch_shapes=[pltpu.VMEM((9, b, hp), jnp.float32),
                        pltpu.VMEM((hp // 128, 3, b, K), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*([cols] * nrb), quads, leaves2)

    packed_bht = _transpose_bwd(packed, interpret=interpret)
    words_out = _unskewT(packed_bht, wp, interpret=interpret)
    idx = jax.lax.bitcast_convert_type(words_out, jnp.uint8).reshape(
        b, hp, wp)
    out = idx if out_padded else idx[:b0, :h, :w]
    return out if out_u8 else out.astype(jnp.int32)
