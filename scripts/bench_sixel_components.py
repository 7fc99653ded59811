#!/usr/bin/env python3
"""Per-kernel timing of the fused sixel dither pipeline at the bench
config (128 x 720p out of 1080p), on the current backend.

Times each stage of fs_dither_cube_fused / fs_dither_tree_fused in
isolation with the fori-loop method bench.py uses (distinct staged
inputs defeat CSE; a scalar fetch forces completion), so kernel work
can be attributed before optimizing.  Prints one JSON object.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

B, H, W = 128, 720, 1280
ITERS = 8


def timed(jax, jnp, np, fn, pool):
    @jax.jit
    def run(p0, p1, n):
        def body(k, s):
            out = jax.lax.switch(k % 2, [lambda: fn(p0), lambda: fn(p1)])
            return s + out.reshape(-1)[0].astype(jnp.int32) + k
        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    np.asarray(run(*pool, 1))
    t0 = time.perf_counter()
    np.asarray(run(*pool, ITERS))
    el = time.perf_counter() - t0
    t1 = time.perf_counter()
    np.asarray(run(*pool, 0))
    rtt = time.perf_counter() - t1
    return (el - rtt) / ITERS * 1e3        # ms per batch


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from timg_tpu.cli import _setup_compile_cache
    _setup_compile_cache()

    from timg_tpu.ops import sixel as sixel_op
    from timg_tpu.ops import sixel_pallas3 as sp

    rng = np.random.default_rng(11)
    hp, wp = 768, 1280
    wf = sp._round_up(wp + 256, sp._SKEW_BLK)
    t_len = sp._round_up(W + 2 * (H - 1), 512)

    words_pool = [jax.device_put(rng.integers(
        -2**31, 2**31, (B, hp, wp), dtype=np.int32)) for _ in range(2)]
    cols_pool = [jax.device_put(rng.integers(
        -2**31, 2**31, (wf, B, hp), dtype=np.int32)) for _ in range(2)]
    packed_pool = [jax.device_put(rng.integers(
        -2**31, 2**31, (t_len // 4, B, hp), dtype=np.int32))
        for _ in range(2)]
    bht_pool = [jax.device_put(rng.integers(
        -2**31, 2**31, (B, hp, t_len // 4), dtype=np.int32))
        for _ in range(2)]

    sample = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
    _, levels_np, leaves_np = sixel_op.median_cut_tree(sample)
    levels = jnp.asarray(levels_np)
    leaves = jnp.asarray(leaves_np)

    from timg_tpu.ops import resize as resize_op

    in_pool = [jax.device_put(rng.integers(
        -2**31, 2**31, (B, 1080, 1920), dtype=np.int32))
        for _ in range(2)]
    pad_to = resize_op.padded_plane_dims(H, W)

    res = {}
    res["resize_ms"] = round(timed(
        jax, jnp, np,
        lambda x: resize_op.resize_video_words(x, H, W, pad_to=pad_to),
        in_pool), 2)
    res["skewT_ms"] = round(timed(
        jax, jnp, np, lambda x: sp._skewT(x, wf), words_pool), 2)
    res["transpose_bwd_ms"] = round(timed(
        jax, jnp, np, sp._transpose_bwd, packed_pool), 2)
    res["unskewT_ms"] = round(timed(
        jax, jnp, np, lambda x: sp._unskewT(x, wp), bht_pool), 2)
    res["full_cube_ms"] = round(timed(
        jax, jnp, np,
        lambda x: sp.fs_dither_cube_fused(x, H, W, out_u8=True,
                                          out_padded=True),
        words_pool), 2)
    res["full_tree_ms"] = round(timed(
        jax, jnp, np,
        lambda x: sp.fs_dither_tree_fused(x, levels, leaves, H, W,
                                          out_u8=True, out_padded=True),
        words_pool), 2)
    layout = (res["skewT_ms"] + res["transpose_bwd_ms"]
              + res["unskewT_ms"])
    res["layout_ms"] = round(layout, 2)
    res["fs_kernel_cube_ms"] = round(res["full_cube_ms"] - layout, 2)
    res["fs_kernel_tree_ms"] = round(res["full_tree_ms"] - layout, 2)
    res["backend"] = jax.default_backend()
    print(json.dumps(res))


if __name__ == "__main__":
    main()
