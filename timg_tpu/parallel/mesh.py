"""Multi-chip sharding of the frame pipeline.

The reference's parallelism is host-thread based (decode pool, encode
pool, writer thread; ref src/thread-pool.h, timg.cc:946-968). The
TPU-native equivalents are:

* **data parallelism** — the frame batch axis [B, ...] sharded over the
  ``data`` mesh axis: every chip processes a slice of the frames of a
  video window / contact-sheet grid;
* **spatial parallelism** — the image height axis sharded over the
  ``space`` mesh axis for very large frames (4K+): the separable resize
  only needs a bounded halo of input rows, which XLA GSPMD materializes
  as collective-permute halo exchanges on ICI automatically.

TP/PP/EP have no analog here (no weight tensors, no experts — the
reference is a viewer, see SURVEY.md §2.4); we deliberately do not
invent them.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from timg_tpu.ops import pipeline


def make_mesh(n_devices: Optional[int] = None,
              data: Optional[int] = None) -> Mesh:
    """Create a ('data', 'space') mesh over the first n devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if data is None:
        # favor data parallelism; space gets the rest
        data = 1
        for cand in range(int(np.sqrt(n)), 0, -1):
            if n % cand == 0:
                data = n // cand
                break
    space = n // data
    dev_array = np.array(devices[: data * space]).reshape(data, space)
    return Mesh(dev_array, axis_names=("data", "space"))


def sharded_quarter_pipeline(mesh: Mesh, out_h: int, out_w: int,
                             use_upper_half_block: bool = False):
    """jit the quarter pipeline with batch+height sharding over `mesh`.

    Input [B, H, W, 4] is sharded (data, space, -, -); glyph/fg/bg planes
    come back sharded the same way. GSPMD inserts the halo exchanges the
    vertical resize taps need across the ``space`` axis.
    """
    in_sharding = NamedSharding(mesh, P("data", "space", None, None))
    plane_sharding = NamedSharding(mesh, P("data", "space", None))
    color_sharding = NamedSharding(mesh, P("data", "space", None, None))

    def fn(frames):
        return pipeline.quarter_pipeline(
            frames, out_h, out_w,
            bg_color=(0, 0, 0, 255),
            use_upper_half_block=use_upper_half_block)

    return jax.jit(
        fn,
        in_shardings=(in_sharding,),
        out_shardings=(plane_sharding, color_sharding, color_sharding),
    )


def sharded_video_sixel_pipeline(mesh: Mesh, out_h: int, out_w: int,
                                 yuv: bool = False,
                                 full_range: bool = True):
    """jit the flagship video path (words -> resize -> cube FS dither ->
    index planes) with the frame batch sharded over the ``data`` axis.

    Every frame is independent through resize and dithering, so this is
    pure data parallelism: each chip runs the full per-shard Pallas
    pipeline on its slice; no cross-chip collectives are needed (the
    classic contact-sheet/video-window fan-out, ref SURVEY §2.4).
    Pallas kernels do not auto-partition under GSPMD, so the per-shard
    body runs under shard_map.

    With ``yuv`` the input is the CLI video transport's (y, u, v) raw
    4:2:0 plane triple (1.5 B/px over each chip's host link) and the
    BT.601 conversion runs per shard on device (ops/yuv.py);
    ``full_range`` carries the stream's sample range (pix_info bit 1
    in the CLI transport -- limited-range MPEG video must not be
    decoded as full-range or blacks wash out).
    """
    from timg_tpu.ops.resize import resize_video_words

    from timg_tpu.ops.sixel_pallas3 import fs_dither_cube_fused

    from timg_tpu.ops.backend import dispatch_platform
    interpret = dispatch_platform() != "tpu"

    def per_shard(*args):
        if yuv:
            from timg_tpu.ops.yuv import yuv420_to_rgba_words
            words = yuv420_to_rgba_words(*args, full_range)
        else:
            (words,) = args
        resized = resize_video_words(words, out_h, out_w)
        return fs_dither_cube_fused(resized, out_h, out_w,
                                    out_u8=True, interpret=interpret)

    n_in = 3 if yuv else 1
    fn = jax.shard_map(per_shard, mesh=mesh,
                       in_specs=tuple([P("data", None, None)] * n_in),
                       out_specs=P("data", None, None),
                       check_vma=False)  # pallas out_shapes carry no vma
    return jax.jit(fn)
