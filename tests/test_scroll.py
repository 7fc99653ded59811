"""Scroll-mode tests against a scalar model of the reference behavior
(ref graphics-magick-source.cc:328-399). The minimal reference build has
no scroll (it lives in the GraphicsMagick source), so this is spec-based.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from timg_tpu.options import DisplayOptions
from timg_tpu.sources.scroll import scroll_frames, send_scroll_frames


def scalar_scroll_frame(img, display_w, display_h, dx, dy, cycle_pos):
    """Direct transcription of the documented wraparound math."""
    img_h, img_w = img.shape[:2]
    x_steps = 1 if dx == 0 else (img_w // abs(dx) if img_w % abs(dx) == 0
                                 else img_w)
    y_steps = 1 if dy == 0 else (img_h // abs(dy) if img_h % abs(dy) == 0
                                 else img_h)
    cycle = x_steps * y_steps // math.gcd(x_steps, y_steps)
    x_init = (img_w - display_w - dx * cycle) if dx < 0 else 0
    y_init = (img_h - display_h - dy * cycle) if dy < 0 else 0
    out = np.zeros((display_h, display_w, img.shape[2]), img.dtype)
    for y in range(display_h):
        for x in range(display_w):
            out[y, x] = img[(y_init + dy * cycle_pos + y) % img_h,
                            (x_init + dx * cycle_pos + x) % img_w]
    return out


@pytest.mark.parametrize("dx,dy", [(1, 0), (-1, 0), (0, 1), (2, -1), (3, 2)])
def test_scroll_frames_match_scalar(dx, dy):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (12, 18, 4), dtype=np.uint8)
    dw, dh = 10, 8
    got = scroll_frames(img, dw, dh, dx, dy, start=0, count=5)
    for k in range(5):
        want = scalar_scroll_frame(img, dw, dh, dx, dy, k)
        assert np.array_equal(got[k], want), (dx, dy, k)


def test_send_scroll_frames_cycle_length():
    img = np.zeros((8, 12, 4), dtype=np.uint8)
    opts = DisplayOptions()
    opts.width, opts.height = 10, 8
    opts.scroll_dx, opts.scroll_dy = 1, 0
    opts.scroll_delay_ms = 1.0
    frames = []
    send_scroll_frames(img, opts, float("inf"), 1, lambda: False,
                       lambda dx, dy, fb, seq, t: frames.append((dy, seq)))
    # one loop = cycle_steps + 1 frames (ref :380: <=)
    assert len(frames) == 13
    assert frames[0][0] == 0 and frames[1][0] == -8


@pytest.mark.parametrize("dither", ["adaptive", "cube"])
def test_scroll_sixel_primed_batch_identical(dither):
    """Scroll windows primed with sixel planes must render
    byte-identically to the per-frame canvas path."""
    from timg_tpu.options import SixelOptions
    from timg_tpu.render.sequencer import SeqType  # noqa: F401
    from timg_tpu.render.sixel_render import SixelCanvas

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (18, 24, 4), dtype=np.uint8)
    img[..., 3] = 255

    def run(batched):
        sent = []

        class FakeSequencer:
            def write_buffer(self, block, seq_type, end_of_frame_ms=0.0):
                sent.append(block)

        opts = DisplayOptions()
        opts.width, opts.height = 16, 12
        opts.cell_x_px, opts.cell_y_px = 8, 6
        opts.scroll_dx, opts.scroll_dy = 1, 0
        opts.scroll_delay_ms = 1.0
        opts.bgcolor_getter = lambda: (0, 0, 0, 255)
        if batched:
            opts.sixel_batch_dither = dither
        canvas = SixelCanvas(FakeSequencer(), SixelOptions(), opts,
                             dither=dither)
        send_scroll_frames(
            img, opts, duration_ms=40.0, loops=1,
            interrupt=lambda: False,
            sink=lambda dx, dy, fb, seq, t: canvas.send(dx, dy, fb,
                                                        seq, t))
        return sent

    plain = run(batched=False)
    primed = run(batched=True)
    assert len(plain) == len(primed) > 5
    assert plain == primed
