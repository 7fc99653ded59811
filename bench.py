#!/usr/bin/env python3
"""Headline benchmark: 1080p frames/sec/chip through resize -> 256-color
FS dither -> sixel index planes (device pipeline; the compact index
plane is what the host byte assembler consumes).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is against the driver-set north-star target of 5000
1080p frames/s/chip (BASELINE.json; the reference publishes no numbers).

Measurement method: the whole run is ONE jitted program -- a
lax.fori_loop whose body processes a batch selected by the loop index
from a pre-staged pool (distinct data defeats CSE; the loop carry
serializes iterations) -- followed by a single scalar fetch. This
forces real device execution even where async dispatch / tunnel
plumbing makes `block_until_ready` unreliable as a completion signal.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TARGET_FPS = 5000.0  # BASELINE.json north star, TPU v5e-1

# Steady-state video loop config: 1080p input, typical large sixel
# terminal canvas output.
IN_H, IN_W = 1080, 1920
OUT_H, OUT_W = 720, 1280
BATCH = 128
POOL = 2          # distinct staged input batches
ITERS = 8         # loop iterations (alternating over the pool)


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    # Persistent compile cache: the driver re-runs this in fresh
    # processes; kernel compiles through a dev tunnel can cost minutes.
    from timg_tpu.cli import _setup_compile_cache
    _setup_compile_cache()

    from timg_tpu.ops import resize as resize_op
    from timg_tpu.ops.sixel_pallas3 import fs_dither_cube_fused

    rng = np.random.default_rng(42)
    pool = rng.integers(0, 256, (POOL, BATCH, IN_H, IN_W, 4),
                        dtype=np.uint8)
    pool[..., 3] = 255
    # Stage as RGBA-packed i32 words: free host-side reinterpretation
    # (identical bytes over PCIe; the video source stages the same
    # way), where a device-side u8->i32 bitcast would be a full
    # relayout copy on TPU.
    pool = pool.view(np.int32).reshape(POOL, BATCH, IN_H, IN_W)

    pad_to = resize_op.padded_plane_dims(OUT_H, OUT_W)

    def pipeline(batch):
        # steady-state video config: opaque lean resize (the reference's
        # video path is swscale bilinear; ours is MXU-matmul resampling
        # on planar bf16) + FS dither against the fixed 6x7x6 cube
        # palette (libsixel builtin-palette class) in the fused
        # all-Pallas pipeline; frames stay RGBA-packed i32 words
        # throughout -- no channel-minor layouts, and the 128-aligned
        # padded plane layout flows straight from the resize kernel to
        # the dither to the pitched host assembler (no pad/slice
        # copies). The adaptive median-cut palette path is the
        # still-image default.
        words = resize_op.resize_video_words(batch, OUT_H, OUT_W,
                                             pad_to=pad_to)
        return fs_dither_cube_fused(words, OUT_H, OUT_W, out_u8=True,
                                    out_padded=True)

    @jax.jit
    def run(p0, p1, iters):
        def body(k, s):
            idx = jax.lax.switch(k % POOL, [lambda: pipeline(p0),
                                            lambda: pipeline(p1)])
            return s + idx[0, 0, 0].astype(jnp.int32) + k
        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

    pool_dev = [jax.device_put(pool[i]) for i in range(POOL)]

    # Warmup / compile (1 iteration), forced by the scalar fetch.
    np.asarray(run(*pool_dev, 1))

    t0 = time.perf_counter()
    np.asarray(run(*pool_dev, ITERS))
    elapsed = time.perf_counter() - t0

    # Subtract the dispatch+fetch round trip measured on a trivial
    # program (dev-environment tunnels add ~25 ms; ~0 on a real host).
    t1 = time.perf_counter()
    np.asarray(run(*pool_dev, 0))
    rtt = time.perf_counter() - t1
    elapsed = max(elapsed - rtt, 1e-9)

    fps = BATCH * ITERS / elapsed
    print(json.dumps({
        "metric": "1080p_frames_per_sec_resize_dither_sixel",
        "value": round(fps, 1),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / TARGET_FPS, 3),
    }))


if __name__ == "__main__":
    main()
