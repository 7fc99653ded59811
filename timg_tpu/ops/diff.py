"""Inter-frame cell diffing on device.

Behavioral spec: ref src/unicode-block-canvas.cc:129-152 — a cell is
skipped when all its pixels equal the backing store of the previous
frame. For batched animation windows the equality masks of consecutive
frames are one reduction over the whole window (the mask for frame i is
computed against frame i-1); the first frame of a window diffs against
the previous window's last frame host-side.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("cell_w",))
def window_cell_diff(padded: jax.Array, cell_w: int) -> jax.Array:
    """padded: [B, H, W, 4] uint8 (H even). Returns eq [B-1, H/2, W/cell_w]
    bool: eq[i] compares frame i+1 against frame i per 2 x cell_w cell."""
    b, h, w, _ = padded.shape
    cells = padded.reshape(b, h // 2, 2, w // cell_w, cell_w, 4)
    return jnp.all(cells[1:] == cells[:-1], axis=(2, 4, 5))
