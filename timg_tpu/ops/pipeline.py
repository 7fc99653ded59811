"""Fused per-protocol device pipelines.

One jit-compiled program per (geometry, protocol) pair covering the whole
post-decode data plane: resize -> alpha compose -> protocol encode planes.
This is the unit the CLI, the benchmark, and the multi-chip path share.
The reference performs these as separate serial CPU passes per frame
(stb-image-source.cc:42-68 + unicode-block-canvas.cc Send); here a whole
frame batch flows through one XLA program.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from timg_tpu.ops import blocks as blocks_op
from timg_tpu.ops import compose as compose_op
from timg_tpu.ops import resize as resize_op


def quarter_pipeline(
    frames: jax.Array,          # [B, H, W, 4] uint8
    out_h: int,
    out_w: int,
    bg_color: Optional[Tuple[int, int, int, int]] = None,
    pattern_color: Optional[Tuple[int, int, int, int]] = None,
    pattern_w: int = 2,
    pattern_h: int = 1,
    use_upper_half_block: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """resize -> compose -> 2x2 glyph argmin. Returns (glyph, fg, bg) planes.

    out_h is padded to even rows (odd-height empty-line shift is applied
    host-side before calling; here we require even dims)."""
    x = resize_op.resize_batch(frames, out_h, out_w)
    if bg_color is not None and bg_color[3] != 0:
        x = compose_op.alpha_compose_background(
            x,
            jnp.asarray(np.array(bg_color, dtype=np.uint8)),
            jnp.asarray(np.array(pattern_color or (0, 0, 0, 0), dtype=np.uint8)),
            pattern_w=pattern_w,
            pattern_h=pattern_h,
        )
    return blocks_op.quarter_blocks(x, use_upper_half_block=use_upper_half_block)


def half_pipeline(
    frames: jax.Array,
    out_h: int,
    out_w: int,
    bg_color: Optional[Tuple[int, int, int, int]] = None,
    pattern_color: Optional[Tuple[int, int, int, int]] = None,
    pattern_w: int = 1,
    pattern_h: int = 1,
    use_upper_half_block: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    x = resize_op.resize_batch(frames, out_h, out_w)
    if bg_color is not None and bg_color[3] != 0:
        x = compose_op.alpha_compose_background(
            x,
            jnp.asarray(np.array(bg_color, dtype=np.uint8)),
            jnp.asarray(np.array(pattern_color or (0, 0, 0, 0), dtype=np.uint8)),
            pattern_w=pattern_w,
            pattern_h=pattern_h,
        )
    return blocks_op.half_blocks(x, use_upper_half_block=use_upper_half_block)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_compose(frames: jax.Array, out_h: int, out_w: int,
                   bg_color: jax.Array, pattern_color: jax.Array) -> jax.Array:
    """Shared front half for the pixel-direct protocols (sixel/kitty/iterm2)."""
    x = resize_op.resize_batch(frames, out_h, out_w)
    return compose_op.alpha_compose_background(x, bg_color, pattern_color)
