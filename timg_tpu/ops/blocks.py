"""Unicode half/quarter block glyph + color selection (device).

The hottest kernel of the block-output path. For every 2x2 (quarter) or
1x2 (half) pixel cell it picks a block glyph plus foreground/background
colors minimizing summed linear-color distance.

Behavioral spec: ref src/unicode-block-canvas.cc:154-227 (FindBestGlyph),
src/framebuffer.h:138-200 (LinearColor / avd). Float32 arithmetic mirrors
the reference's C float evaluation order so results (incl. ties and the
``d < 1`` early-exit) are bit-identical after repack.

The reference evaluates cells serially per scanline pair; here the argmin
over the 8 glyph candidates is evaluated for *all* cells of a whole frame
batch at once on the VPU — an embarrassingly parallel map that XLA fuses
with the resize/compose producers.

Glyph ids (ref unicode-block-canvas.cc:54-65):
  0 background, 1 top-left, 2 top-right, 3 bot-left, 4 bot-right,
  5 left-bar, 6 diagonal, 7 lower-half, 8 upper-half.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from timg_tpu.ops.exact import floor_sqrt_255, rn_div

GLYPHS = [" ", "▘", "▝", "▖", "▗",
          "▌", "▚", "▄", "▀"]
BACKGROUND, TOP_LEFT, TOP_RIGHT, BOT_LEFT, BOT_RIGHT = 0, 1, 2, 3, 4
LEFT_BAR, DIAGONAL, LOWER_BLOCK, UPPER_BLOCK = 5, 6, 7, 8

_TRANSPARENT_THRESHOLD = 0x60  # is_transparent(): a < 0x60 (ref :154)


def _lin(c_u8: jax.Array) -> jax.Array:
    """LinearColor: rgb -> c*c in float32, alpha passes through (ref h:142)."""
    f = c_u8.astype(jnp.float32)
    return jnp.concatenate([f[..., :3] * f[..., :3], f[..., 3:4]], axis=-1)


def _dist(a: jax.Array, b: jax.Array) -> jax.Array:
    """Quadratic rgb distance, reference evaluation order (ref h:145-148)."""
    d = b[..., :3] - a[..., :3]
    return (d[..., 0] * d[..., 0] + d[..., 1] * d[..., 1]) + d[..., 2] * d[..., 2]


def _avd(*values: jax.Array):
    """Average the linear colors and sum distances to the average, adding in
    the reference's operand order (ref framebuffer.h:177-194)."""
    acc = values[0]
    for v in values[1:]:
        acc = acc + v
    # acc is integer-valued (< 2^18); reference divides in f32, correctly
    # rounded.  TPU div is approximate, so /2 and /4 become exact dyadic
    # multiplies and /3 goes through the exact division (ops/exact.py).
    n = len(values)
    if n in (2, 4):
        avg = acc * jnp.float32(1.0 / n)
    else:
        avg = rn_div(acc, jnp.float32(n))
    total = _dist(avg, values[0])
    for v in values[1:]:
        total = total + _dist(avg, v)
    return avg, total


def _repack(lin: jax.Array) -> jax.Array:
    """LinearColor::repack (ref h:150-152, 169-172): sqrtf + truncation.

    trunc(min(sqrtf(v), 255)) == floor(sqrt(v)) for our averages (see
    ops/exact.py), computed exactly on TPU via integer correction."""
    rgb = floor_sqrt_255(lin[..., :3])
    a = lin[..., 3:4]
    return jnp.concatenate([rgb, a], axis=-1).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("use_upper_half_block",))
def quarter_blocks(
    frames: jax.Array,  # [B, H, W, 4] uint8; H, W even
    use_upper_half_block: bool = False,
):
    """Per-2x2-cell glyph choice. Returns (glyph[B,h,w], fg[B,h,w,4],
    bg[B,h,w,4]) with h=H//2, w=W//2. ref unicode-block-canvas.cc:162-227."""
    b, h, w, _ = frames.shape
    cells = frames.reshape(b, h // 2, 2, w // 2, 2, 4)
    tl_u8 = cells[:, :, 0, :, 0]
    tr_u8 = cells[:, :, 0, :, 1]
    bl_u8 = cells[:, :, 1, :, 0]
    br_u8 = cells[:, :, 1, :, 1]

    tl, tr, bl, br = _lin(tl_u8), _lin(tr_u8), _lin(bl_u8), _lin(br_u8)

    # --- 8 candidates, reference switch order (ref :207-218) ---
    cand_fg = []
    cand_bg = []
    costs = []

    avg4, d4 = _avd(tl, tr, bl, br)
    cand_bg.append(avg4); cand_fg.append(avg4); costs.append(d4)        # 0 bg

    for fg_pix, rest in ((tl, (tr, bl, br)), (tr, (tl, bl, br)),
                         (bl, (tl, tr, br)), (br, (tl, tr, bl))):
        avg3, d3 = _avd(*rest)
        cand_bg.append(avg3); cand_fg.append(fg_pix); costs.append(d3)  # 1-4

    bg_lb, d_bg = _avd(tr, br)
    fg_lb, d_fg = _avd(tl, bl)
    cand_bg.append(bg_lb); cand_fg.append(fg_lb); costs.append(d_bg + d_fg)  # 5

    bg_dg, d_bg = _avd(tr, bl)
    fg_dg, d_fg = _avd(tl, br)
    cand_bg.append(bg_dg); cand_fg.append(fg_dg); costs.append(d_bg + d_fg)  # 6

    if use_upper_half_block:  # b == 7 resolves per user pref (ref :203-206)
        bg_hb, d_bg = _avd(bl, br)
        fg_hb, d_fg = _avd(tl, tr)
        half_glyph = UPPER_BLOCK
    else:
        bg_hb, d_bg = _avd(tl, tr)
        fg_hb, d_fg = _avd(bl, br)
        half_glyph = LOWER_BLOCK
    cand_bg.append(bg_hb); cand_fg.append(fg_hb); costs.append(d_bg + d_fg)  # 7

    cost = jnp.stack(costs, axis=-1)          # [B,h,w,8]
    fg_all = jnp.stack(cand_fg, axis=-2)      # [B,h,w,8,4]
    bg_all = jnp.stack(cand_bg, axis=-2)

    # Loop semantics (ref :198-225): scan in order, keep strictly-better,
    # stop at the first new-best with d < 1.
    run_min = jnp.concatenate(
        [jnp.full(cost.shape[:-1] + (1,), 1e12, cost.dtype),
         jax.lax.cummin(cost, axis=cost.ndim - 1)[..., :-1]],
        axis=-1,
    )  # exclusive prefix min, seeded with best_distance = 1e12
    breaks = jnp.logical_and(cost < run_min, cost < 1.0)
    has_break = jnp.any(breaks, axis=-1)
    break_idx = jnp.argmax(breaks, axis=-1)
    chosen = jnp.where(has_break, break_idx, jnp.argmin(cost, axis=-1))

    take = functools.partial(jnp.take_along_axis, axis=-2)
    idx = chosen[..., None, None]
    fg_lin = take(fg_all, idx)[..., 0, :]
    bg_lin = take(bg_all, idx)[..., 0, :]
    glyph = jnp.where(chosen == 7, jnp.int32(half_glyph), chosen.astype(jnp.int32))

    fg = _repack(fg_lin)
    bg = _repack(bg_lin)

    # --- transparency special cases override (ref :182-191) ---
    t_tl = tl_u8[..., 3] < _TRANSPARENT_THRESHOLD
    t_tr = tr_u8[..., 3] < _TRANSPARENT_THRESHOLD
    t_bl = bl_u8[..., 3] < _TRANSPARENT_THRESHOLD
    t_br = br_u8[..., 3] < _TRANSPARENT_THRESHOLD
    top_t = jnp.logical_and(t_tl, t_tr)
    bot_t = jnp.logical_and(t_bl, t_br)
    all_t = jnp.logical_and(top_t, bot_t)

    avg_bot = _repack(_avd(bl, br)[0])
    avg_top = _repack(_avd(tl, tr)[0])

    def sel(mask, a, b_):
        return jnp.where(mask[..., None] if a.ndim > mask.ndim else mask, a, b_)

    # bottom-transparent: upper block showing top average (ref :189-191)
    glyph = sel(bot_t, jnp.full_like(glyph, UPPER_BLOCK), glyph)
    fg = sel(bot_t, avg_top, fg)
    bg = sel(bot_t, bl_u8, bg)
    # top-transparent: lower block showing bottom average (ref :186-188)
    glyph = sel(top_t, jnp.full_like(glyph, LOWER_BLOCK), glyph)
    fg = sel(top_t, avg_bot, fg)
    bg = sel(top_t, tl_u8, bg)
    # everything transparent (ref :182-185)
    glyph = sel(all_t, jnp.zeros_like(glyph), glyph)
    fg = sel(all_t, bl_u8, fg)
    bg = sel(all_t, tl_u8, bg)

    return glyph, fg, bg


@functools.partial(jax.jit, static_argnames=("use_upper_half_block",))
def half_blocks(
    frames: jax.Array,  # [B, H, W, 4] uint8; H even
    use_upper_half_block: bool = False,
):
    """Per-1x2-cell choice (ref unicode-block-canvas.cc:165-171).

    Returns (glyph[B,h,W], fg, bg) with h=H//2. No color math: colors are
    the raw pixels."""
    b, h, w, _ = frames.shape
    cells = frames.reshape(b, h // 2, 2, w, 4)
    top = cells[:, :, 0]
    bottom = cells[:, :, 1]

    equal = jnp.all(top == bottom, axis=-1)
    both_t = jnp.logical_and(
        top[..., 3] < _TRANSPARENT_THRESHOLD,
        bottom[..., 3] < _TRANSPARENT_THRESHOLD,
    )
    is_bg = jnp.logical_or(equal, both_t)

    if use_upper_half_block:
        glyph_val, fg_px, bg_px = UPPER_BLOCK, top, bottom
    else:
        glyph_val, fg_px, bg_px = LOWER_BLOCK, bottom, top

    glyph = jnp.where(is_bg, jnp.int32(BACKGROUND), jnp.int32(glyph_val))
    fg = jnp.where(is_bg[..., None], top, fg_px)
    bg = jnp.where(is_bg[..., None], bottom, bg_px)
    return glyph, fg, bg
