#!/usr/bin/env python3
"""Secondary benchmark: 1080p video -> quarter-block path (config #5
block-mode analog). Two numbers:

* device fps: resize (words) -> 2x2 glyph argmin planes, one jitted
  loop on the TPU (the per-frame device work of block-mode video);
* host emit fps: the C ANSI emitter consuming precomputed planes
  (single thread; the CLI overlaps it with device work).

The official headline (bench.py) stays the sixel pipeline; this script
documents the block-mode story for ROADMAP/README.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IN_H, IN_W = 1080, 1920
OUT_H, OUT_W = 192, 320     # 160x96 cells, a large quarter-block canvas
BATCH, POOL, ITERS = 128, 2, 8


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from timg_tpu.ops import blocks as blocks_op
    from timg_tpu.ops import resize as resize_op

    rng = np.random.default_rng(7)
    pool = rng.integers(0, 256, (POOL, BATCH, IN_H, IN_W, 4),
                        dtype=np.uint8)
    pool[..., 3] = 255
    pool_w = pool.view(np.int32).reshape(POOL, BATCH, IN_H, IN_W)

    def pipeline(batch):
        words = resize_op.resize_video_words(batch, OUT_H, OUT_W)
        frames = jax.lax.bitcast_convert_type(words, jnp.uint8)
        return blocks_op.quarter_blocks(frames)

    @jax.jit
    def run(p0, p1, iters):
        def body(k, s):
            g, fg, bg = jax.lax.switch(
                k % POOL, [lambda: pipeline(p0), lambda: pipeline(p1)])
            return s + g[0, 0, 0] + k
        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

    pools = [jax.device_put(pool_w[i]) for i in range(POOL)]
    np.asarray(run(*pools, 1))
    t0 = time.perf_counter()
    np.asarray(run(*pools, ITERS))
    el = time.perf_counter() - t0
    t1 = time.perf_counter()
    np.asarray(run(*pools, 0))
    el = max(el - (time.perf_counter() - t1), 1e-9)
    dev_fps = BATCH * ITERS / el
    print(f"device resize->quarter planes: {dev_fps:.0f} frames/s/chip")

    # Host emitter throughput on real planes.
    from timg_tpu.render.ansi import UnicodeBlockCanvas

    frames = np.asarray(jax.lax.bitcast_convert_type(
        resize_op.resize_video_words(pools[0][:8], OUT_H, OUT_W),
        jnp.uint8))
    g, fg, bg = (np.asarray(x) for x in blocks_op.quarter_blocks(
        jnp.asarray(frames)))

    sent = []

    class Seq:
        def write_buffer(self, block, seq_type, end_of_frame_ms=0.0):
            sent.append(len(block))

    from timg_tpu.render.plane_cache import BLOCK_PLANES

    canvas = UnicodeBlockCanvas(Seq(), use_quarter=True)
    n_emit = 64
    frame_objs = [frames[i % 8] for i in range(n_emit)]
    t0 = time.perf_counter()
    for i, fr in enumerate(frame_objs):
        BLOCK_PLANES.put(fr, (fr, g[i % 8], fg[i % 8], bg[i % 8],
                              frame_objs[i - 1] if i else None, None))
        canvas.send(0, -OUT_H if i else 0, fr,
                    seq_type=None, end_of_frame_ms=0.0)
    el = time.perf_counter() - t0
    print(f"host ANSI emit ({OUT_W//2}x{OUT_H//2} cells, with diff): "
          f"{n_emit/el:.0f} frames/s/thread, "
          f"{sum(sent)/el/1e6:.0f} MB/s")


if __name__ == "__main__":
    main()
