"""Strict numpy mirrors of the block/compose device ops for the CPU path.

Two reasons these exist (the resize op has its own mirror in resize.py):

* **Bit-exactness**: the XLA *CPU* backend contracts mul+add into FMAs
  inside fusions, breaking float32 parity with the reference; numpy does
  not. The TPU backend does not contract (verified) and uses the jitted
  ops directly.
* **Interactive latency**: `timg-tpu one-image.jpg` on a CPU-only host
  should not pay jax import + jit compile (~3 s); the numpy mirrors keep
  the one-shot path in plain numpy (ref concern: SURVEY §7 "batch wins
  must not regress the interactive case").

Semantics are identical to ops/blocks.py and ops/compose.py; the shared
test suite asserts equality.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

_T = 0x60  # is_transparent threshold


def _lin(c: np.ndarray) -> np.ndarray:
    f = c.astype(np.float32)
    out = f.copy()
    out[..., :3] = f[..., :3] * f[..., :3]
    return out


def _dist(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    d = b[..., :3] - a[..., :3]
    return (d[..., 0] * d[..., 0] + d[..., 1] * d[..., 1]) + d[..., 2] * d[..., 2]


def _avd(*values):
    acc = values[0].copy()
    for v in values[1:]:
        acc = acc + v
    avg = acc / np.float32(len(values))
    total = _dist(avg, values[0])
    for v in values[1:]:
        total = total + _dist(avg, v)
    return avg, total


def _repack(lin: np.ndarray) -> np.ndarray:
    rgb = np.minimum(np.sqrt(lin[..., :3]), np.float32(255.0))
    return np.concatenate([rgb, lin[..., 3:4]], axis=-1).astype(np.uint8)


def quarter_blocks_np(frames: np.ndarray, use_upper_half_block: bool = False):
    """numpy mirror of ops.blocks.quarter_blocks."""
    b, h, w, _ = frames.shape
    cells = frames.reshape(b, h // 2, 2, w // 2, 2, 4)
    tl_u8, tr_u8 = cells[:, :, 0, :, 0], cells[:, :, 0, :, 1]
    bl_u8, br_u8 = cells[:, :, 1, :, 0], cells[:, :, 1, :, 1]
    tl, tr, bl, br = _lin(tl_u8), _lin(tr_u8), _lin(bl_u8), _lin(br_u8)

    cand_fg, cand_bg, costs = [], [], []
    avg4, d4 = _avd(tl, tr, bl, br)
    cand_bg.append(avg4); cand_fg.append(avg4); costs.append(d4)
    for fg_pix, rest in ((tl, (tr, bl, br)), (tr, (tl, bl, br)),
                         (bl, (tl, tr, br)), (br, (tl, tr, bl))):
        avg3, d3 = _avd(*rest)
        cand_bg.append(avg3); cand_fg.append(fg_pix); costs.append(d3)
    bg5, d5b = _avd(tr, br); fg5, d5f = _avd(tl, bl)
    cand_bg.append(bg5); cand_fg.append(fg5); costs.append(d5b + d5f)
    bg6, d6b = _avd(tr, bl); fg6, d6f = _avd(tl, br)
    cand_bg.append(bg6); cand_fg.append(fg6); costs.append(d6b + d6f)
    if use_upper_half_block:
        bg7, d7b = _avd(bl, br); fg7, d7f = _avd(tl, tr)
        half_glyph = 8
    else:
        bg7, d7b = _avd(tl, tr); fg7, d7f = _avd(bl, br)
        half_glyph = 7
    cand_bg.append(bg7); cand_fg.append(fg7); costs.append(d7b + d7f)

    cost = np.stack(costs, axis=-1)
    fg_all = np.stack(cand_fg, axis=-2)
    bg_all = np.stack(cand_bg, axis=-2)

    run_min = np.concatenate(
        [np.full(cost.shape[:-1] + (1,), 1e12, cost.dtype),
         np.minimum.accumulate(cost, axis=-1)[..., :-1]], axis=-1)
    breaks = np.logical_and(cost < run_min, cost < 1.0)
    has_break = breaks.any(axis=-1)
    break_idx = breaks.argmax(axis=-1)
    chosen = np.where(has_break, break_idx, cost.argmin(axis=-1))

    idx = chosen[..., None, None]
    fg_lin = np.take_along_axis(fg_all, idx, axis=-2)[..., 0, :]
    bg_lin = np.take_along_axis(bg_all, idx, axis=-2)[..., 0, :]
    glyph = np.where(chosen == 7, half_glyph, chosen).astype(np.int32)
    fg = _repack(fg_lin)
    bg = _repack(bg_lin)

    t_tl, t_tr = tl_u8[..., 3] < _T, tr_u8[..., 3] < _T
    t_bl, t_br = bl_u8[..., 3] < _T, br_u8[..., 3] < _T
    top_t = np.logical_and(t_tl, t_tr)
    bot_t = np.logical_and(t_bl, t_br)
    all_t = np.logical_and(top_t, bot_t)

    avg_bot = _repack(_avd(bl, br)[0])
    avg_top = _repack(_avd(tl, tr)[0])

    def sel(mask, a, b_):
        m = mask[..., None] if a.ndim > mask.ndim else mask
        return np.where(m, a, b_)

    glyph = sel(bot_t, np.full_like(glyph, 8), glyph)
    fg = sel(bot_t, avg_top, fg)
    bg = sel(bot_t, bl_u8, bg)
    glyph = sel(top_t, np.full_like(glyph, 7), glyph)
    fg = sel(top_t, avg_bot, fg)
    bg = sel(top_t, tl_u8, bg)
    glyph = sel(all_t, np.zeros_like(glyph), glyph)
    fg = sel(all_t, bl_u8, fg)
    bg = sel(all_t, tl_u8, bg)
    return glyph, fg, bg


def half_blocks_np(frames: np.ndarray, use_upper_half_block: bool = False):
    """numpy mirror of ops.blocks.half_blocks."""
    b, h, w, _ = frames.shape
    cells = frames.reshape(b, h // 2, 2, w, 4)
    top, bottom = cells[:, :, 0], cells[:, :, 1]
    equal = np.all(top == bottom, axis=-1)
    both_t = np.logical_and(top[..., 3] < _T, bottom[..., 3] < _T)
    is_bg = np.logical_or(equal, both_t)
    if use_upper_half_block:
        glyph_val, fg_px, bg_px = 8, top, bottom
    else:
        glyph_val, fg_px, bg_px = 7, bottom, top
    glyph = np.where(is_bg, 0, glyph_val).astype(np.int32)
    fg = np.where(is_bg[..., None], top, fg_px)
    bg = np.where(is_bg[..., None], bottom, bg_px)
    return glyph, fg, bg


def alpha_compose_background_np(
    frames: np.ndarray,
    bg_color: np.ndarray,
    pattern_color: np.ndarray,
    pattern_w: int = 1,
    pattern_h: int = 1,
    start_row: int = 0,
) -> np.ndarray:
    """numpy mirror of ops.compose.alpha_compose_background."""
    b, h, w, _ = frames.shape
    a = frames[..., 3:4].astype(np.float32)
    use_pattern = (pattern_color[3] != 0 and
                   np.any(pattern_color != bg_color) and
                   pattern_w > 0 and pattern_h > 0)
    ys, xs = np.mgrid[0:h, 0:w]
    pw, ph = max(pattern_w, 1), max(pattern_h, 1)
    checker = ((xs // pw) + (ys // ph)) % 2

    def lin(c):
        f = c[:3].astype(np.float32)
        return f * f

    chosen_bg = np.where(
        np.logical_and(use_pattern, checker[..., None] == 1),
        lin(pattern_color), lin(bg_color))
    src_lin = frames[..., :3].astype(np.float32) ** 2
    inv = np.float32(255.0) - a
    blended = (src_lin * a + chosen_bg[None] * inv) / np.float32(255.0)
    blended_u8 = np.minimum(np.sqrt(blended), np.float32(255.0)).astype(np.uint8)

    opaque = frames[..., 3:4] == 255
    row_active = (ys[..., None] >= start_row)
    do_blend = np.logical_and(~opaque, row_active[None])
    do_blend = np.logical_and(do_blend, bg_color[3] != 0)
    rgb = np.where(do_blend, blended_u8, frames[..., :3])
    alpha = np.where(do_blend[..., 0], np.uint8(255), frames[..., 3])
    return np.concatenate([rgb, alpha[..., None]], axis=-1)
