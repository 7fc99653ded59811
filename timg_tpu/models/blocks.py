"""Unicode block protocol models (half / quarter)."""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from timg_tpu.options import RGBA


class _BlockModel:
    use_quarter = True

    def __init__(self, out_h: int, out_w: int,
                 bg_color: Optional[RGBA] = (0, 0, 0, 255),
                 use_upper_half_block: bool = False,
                 use_256_color: bool = False):
        if out_h % 2:
            out_h += 1  # block cells are 2 pixels tall
        if self.use_quarter and out_w % 2:
            out_w += 1
        self.out_h, self.out_w = out_h, out_w
        self.bg_color = bg_color
        self.use_upper_half_block = use_upper_half_block
        self.use_256_color = use_256_color

    def process_batch(self, frames: np.ndarray
                      ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """[B,H,W,4] uint8 -> (glyph, fg, bg) planes, one device dispatch."""
        from timg_tpu.ops import pipeline

        fn = (pipeline.quarter_pipeline if self.use_quarter
              else pipeline.half_pipeline)
        glyph, fg, bg = fn(frames, self.out_h, self.out_w,
                           bg_color=self.bg_color,
                           use_upper_half_block=self.use_upper_half_block)
        return np.asarray(glyph), np.asarray(fg), np.asarray(bg)

    def render_batch(self, frames: np.ndarray) -> List[bytes]:
        """[B,H,W,4] -> per-frame ANSI escape payloads (no cursor moves)."""
        from timg_tpu.render.ansi import _emit_frame_native, _native_lib
        from timg_tpu.render.ansi import UnicodeBlockCanvas

        glyph, fg, bg = self.process_batch(frames)
        native = _native_lib()
        out = []
        for i in range(len(glyph)):
            if native is not None:
                out.append(_emit_frame_native(
                    native, glyph[i], fg[i], bg[i], None, 0,
                    self.use_256_color))
            else:
                canvas = UnicodeBlockCanvas.__new__(UnicodeBlockCanvas)
                canvas.use_256_color = self.use_256_color
                out.append(canvas._emit_frame_py(
                    glyph[i], fg[i], bg[i], None, 0))
        return out


class QuarterBlockModel(_BlockModel):
    use_quarter = True


class HalfBlockModel(_BlockModel):
    use_quarter = False
