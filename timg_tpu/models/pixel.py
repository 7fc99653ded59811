"""Pixel-direct protocol models (sixel / kitty / iterm2)."""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from timg_tpu.options import RGBA


class _PixelModel:
    def __init__(self, out_h: int, out_w: int,
                 bg_color: Optional[RGBA] = (0, 0, 0, 255),
                 compress_level: int = 1):
        self.out_h, self.out_w = out_h, out_w
        self.bg_color = bg_color
        self.compress_level = compress_level

    def _resized(self, frames: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        from timg_tpu.ops.pipeline import resize_compose

        bg = np.array(self.bg_color or (0, 0, 0, 0), dtype=np.uint8)
        return np.asarray(resize_compose(
            jnp.asarray(frames), self.out_h, self.out_w,
            jnp.asarray(bg), jnp.asarray(np.zeros(4, np.uint8))))

    def _resized_yuv(self, y: np.ndarray, u: np.ndarray, v: np.ndarray,
                     full_range: bool) -> np.ndarray:
        """Raw 4:2:0 planes -> resized RGBA frames, conversion on
        device (the video-rate transport: 1.5 B/px over the link;
        see ops/yuv.py).  Opaque by construction, so no compose."""
        from timg_tpu.sources.video_source import _get_yuv_jit

        return np.asarray(_get_yuv_jit()(
            np.asarray(y), np.asarray(u), np.asarray(v),
            self.out_h, self.out_w, bool(full_range)))


class SixelModel(_PixelModel):
    def __init__(self, *args, dither: str = "adaptive",
                 adaptive_reuse: bool = False, **kw):
        """``adaptive_reuse``: build the median-cut palette once from
        the first frame seen and reuse it across frames and batches --
        the CLI video path's semantics (ref sixel-canvas analog:
        palette per animation, not per frame), and the right mode for
        video-rate serving where a fresh 6-gather tree per frame costs
        more than it buys."""
        super().__init__(*args, **kw)
        self.dither = dither  # "adaptive" | "cube"
        self.adaptive_reuse = adaptive_reuse
        self._quantizer = None

    def reset_palette(self) -> None:
        """Drop the reused adaptive palette (e.g. at a scene cut or a
        new animation start, like the CLI does)."""
        self._quantizer = None

    def render_batch(self, frames: np.ndarray) -> List[bytes]:
        return self._render_resized(self._resized(frames))

    def render_batch_yuv(self, y: np.ndarray, u: np.ndarray,
                         v: np.ndarray,
                         full_range: bool = True) -> List[bytes]:
        """[B,H,W] y + [B,ceil(H/2),ceil(W/2)] u/v uint8 planes (e.g.
        straight from a video decoder) -> sixel streams.  Ships 2.67x
        fewer bytes to the device than RGBA input."""
        return self._render_resized(self._resized_yuv(y, u, v,
                                                      full_range))

    def _render_resized(self, x: np.ndarray) -> List[bytes]:
        from timg_tpu.ops import sixel as sixel_op
        from timg_tpu.render.sixel_render import encode_sixel_stream

        if self.dither == "cube":
            palette = sixel_op.cube_palette()
            indices = np.asarray(sixel_op.fs_dither_cube(x[..., :3]))
            return [encode_sixel_stream(idx, palette) for idx in indices]
        if self.adaptive_reuse:
            if self._quantizer is None:
                self._quantizer = sixel_op.median_cut_tree(x[0, ..., :3])
            palette, levels, leaves = self._quantizer
            indices = np.asarray(sixel_op.fs_dither_tree(
                x[..., :3], levels, leaves))      # one batched dispatch
            return [encode_sixel_stream(idx, palette) for idx in indices]
        out = []
        for frame in x:
            palette, levels, leaves = sixel_op.median_cut_tree(
                frame[..., :3])
            idx = sixel_op.fs_dither_tree(frame[None, ..., :3],
                                          levels, leaves)[0]
            out.append(encode_sixel_stream(idx, palette))
        return out


class KittyModel(_PixelModel):
    def render_batch(self, frames: np.ndarray) -> List[bytes]:
        import base64

        from timg_tpu.render.png import encode_png

        out = []
        for i, frame in enumerate(self._resized(frames)):
            png = encode_png(frame, self.compress_level, with_alpha=True)
            payload = bytearray(b"\033_Ga=T,i=%d,q=2,f=100,m=0;" % (i + 1))
            payload += base64.b64encode(png)
            payload += b"\033\\"
            out.append(bytes(payload))
        return out


class ITerm2Model(_PixelModel):
    def render_batch(self, frames: np.ndarray) -> List[bytes]:
        import base64

        from timg_tpu.render.png import encode_png

        out = []
        for frame in self._resized(frames):
            png = encode_png(frame, self.compress_level, with_alpha=True)
            h, w = frame.shape[:2]
            head = b"\033]1337;File=size=%d;width=%dpx;height=%dpx;inline=1:" \
                % (len(png), w, h)
            out.append(head + base64.b64encode(png) + b"\007")
        return out
