"""Linear-space alpha composition and checkerboard fill (device).

Behavioral spec: ref src/framebuffer.cc:108-150 (AlphaComposeBackground) and
src/framebuffer.h:138-174 (LinearColor). The reference approximates gamma 2.2
with x^2: linearize c -> c*c (float), blend
``(c*a + bg*(255-a)) / 255``, repack with sqrtf truncated to uint8.

The reference walks pixels serially and skips opaque ones; on TPU this is a
pure elementwise select over the batch, fused by XLA into whatever follows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from timg_tpu.ops.exact import floor_sqrt_255, rn_div


def _linearize(c: jax.Array) -> jax.Array:
    f = c.astype(jnp.float32)
    return f * f


def _repack(linear_rgb: jax.Array) -> jax.Array:
    """gamma(): sqrtf, clamp top at 255, C float->uint8 cast truncation
    (ref framebuffer.h:169-172).  trunc(min(sqrtf, 255)) == floor(sqrt)
    on the blend value lattice; exact on TPU via ops/exact.py."""
    return floor_sqrt_255(linear_rgb).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("pattern_w", "pattern_h", "start_row"))
def alpha_compose_background(
    frames: jax.Array,        # [B, H, W, 4] uint8
    bg_color: jax.Array,      # [4] uint8 (alpha==0 -> no-op)
    pattern_color: jax.Array,  # [4] uint8 (alpha==0 -> solid bg only)
    pattern_w: int = 1,
    pattern_h: int = 1,
    start_row: int = 0,
) -> jax.Array:
    """Blend transparent pixels against bg (or bg/pattern checkerboard).

    ref framebuffer.cc:108-150. Pixels with a == 255 are untouched; pattern
    cell selection is ``((x // pw) + (y // ph)) % 2``.
    """
    b, h, w, _ = frames.shape
    a = frames[..., 3:4].astype(jnp.float32)

    use_pattern = jnp.logical_and(
        pattern_color[3] != 0,
        jnp.any(pattern_color != bg_color),
    )
    if pattern_w <= 0 or pattern_h <= 0:
        use_pattern = jnp.asarray(False)

    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    pw = max(pattern_w, 1)
    ph = max(pattern_h, 1)
    checker = ((xs // pw) + (ys // ph)) % 2  # [H, W]

    bg_lin = _linearize(bg_color[:3])           # [3]
    pat_lin = _linearize(pattern_color[:3])     # [3]
    chosen_bg = jnp.where(
        jnp.logical_and(use_pattern, checker[..., None] == 1),
        pat_lin,
        bg_lin,
    )  # [H, W, 3]

    src_lin = _linearize(frames[..., :3])        # [B, H, W, 3]
    inv = jnp.float32(255.0) - a
    # correctly-rounded /255 on TPU (div is approximate there)
    blended = rn_div(src_lin * a + chosen_bg[None] * inv, jnp.float32(255.0))
    blended_u8 = _repack(blended)

    opaque = frames[..., 3:4] == 255
    row_active = (ys[..., None] >= start_row)  # start_row optimization hook
    do_blend = jnp.logical_and(~opaque, row_active[None])
    # Skip everything if bg itself is transparent (ref :121).
    do_blend = jnp.logical_and(do_blend, bg_color[3] != 0)

    rgb = jnp.where(do_blend, blended_u8, frames[..., :3])
    alpha = jnp.where(do_blend[..., 0], jnp.uint8(255), frames[..., 3])
    return jnp.concatenate([rgb, alpha[..., None]], axis=-1)
