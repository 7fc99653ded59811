"""Video source: libav host decode feeding batched device processing.

Behavioral spec: ref src/video-source.cc. Demux/decode happen in the
native helper (timg_native.cc); frames are converted to RGBA at *native*
resolution and resized/composed on device in windows of several frames
per dispatch (the reference scales each frame serially on host with
sws_scale, :352-354). Pacing semantics are the reference's: dy=-height
reposition per frame, AnimationFrame timestamps at k/fps
(:356-360), rewind-and-loop via seek (:302-307), "videos loop once"
default handled by the CLI, frame_offset skip (:342-347).
"""

from __future__ import annotations

import ctypes
import sys
from typing import Callable, List

import numpy as np

from timg_tpu.geometry import calc_scale_to_fit
from timg_tpu.options import NOT_INITIALIZED, DisplayOptions
from timg_tpu.render.sequencer import SeqType
from timg_tpu.sources.base import FrameSink, ImageSource

_WINDOW = 8  # frames per device dispatch


class VideoSource(ImageSource):
    def __init__(self, filename: str):
        super().__init__(filename)
        self.decoder_name = "video"
        self._handle = None
        self._lib = None
        self._options: DisplayOptions | None = None
        self._frame_offset = 0
        self._frame_count = -1
        self._fps = 25.0
        self._target = (0, 0)
        self._is_apng_like = False
        self._sixel_state: dict = {}  # adaptive palette across windows

    def load_and_scale(self, options: DisplayOptions, frame_offset: int,
                       frame_count: int) -> bool:
        from timg_tpu.native import runtime

        lib = runtime.load()
        if lib is None:
            return False
        path = "/dev/stdin" if self.filename == "-" else self.filename
        handle = lib.timg_video_open(path.encode())
        if not handle:
            return False
        w = ctypes.c_int()
        h = ctypes.c_int()
        fps = ctypes.c_double()
        lib.timg_video_info(handle, ctypes.byref(w), ctypes.byref(h),
                            ctypes.byref(fps))
        self._lib = lib
        self._handle = handle
        self.orig_width, self.orig_height = w.value, h.value
        self._fps = fps.value or 25.0
        self._options = options
        self._frame_offset = frame_offset
        self._frame_count = frame_count

        if options.auto_crop:  # ref video-source.cc:221-234
            print("timg: no auto-crop for video", file=sys.stderr)

        lower = self.filename.lower()
        self._is_apng_like = lower.endswith((".png", ".apng", ".gif"))
        # transparency only considered for certain suffixes
        # (ref video-source.cc:140-150)
        self._transparent_suffix = lower.endswith(
            (".png", ".gif", ".qoi", ".apng", ".svg")) or lower == "-"

        tw, th, _ = calc_scale_to_fit(self.orig_width, self.orig_height,
                                      options)
        self._target = (tw, th)
        self.indentation = (
            int((options.width - tw) / 2)
            if options.center_horizontally else 0
        )
        return True

    def is_animation_before_frame_limit(self) -> bool:
        return True

    def _maybe_transparent(self) -> bool:
        return getattr(self, "_transparent_suffix", False)

    def default_loops(self) -> int:
        """Videos loop once, APNG forever (ref video-source.cc:277-285)."""
        return -1 if self._is_apng_like else 1

    def __del__(self):
        if self._handle and self._lib:
            self._lib.timg_video_close(self._handle)
            self._handle = None

    def _process_window(self, raw: List[np.ndarray]) -> List[np.ndarray]:
        """One batched device dispatch: resize + compose."""
        import jax.numpy as jnp

        from timg_tpu.ops.compose import alpha_compose_background
        from timg_tpu.ops.resize import resize_batch

        opts = self._options
        tw, th = self._target
        arr = np.stack(raw)
        if self._maybe_transparent():
            x = resize_batch(jnp.asarray(arr), th, tw)
            result = np.asarray(x)
        else:
            # opaque codecs: lean resize (the reference's video path uses
            # swscale bilinear here, ref video-source.cc:352, so the
            # stb-exact pipeline isn't the parity target). Frames are
            # staged to the device as RGBA-packed i32 words -- a free
            # reinterpretation on host, where a device-side u8->i32
            # bitcast would be a full relayout copy on TPU.
            from timg_tpu.ops.resize import resize_video_words
            words = jnp.asarray(
                arr.view(np.int32).reshape(arr.shape[:3]))
            out = np.asarray(resize_video_words(words, th, tw))
            result = out.view(np.uint8).reshape(out.shape + (4,))
        if opts.bgcolor_getter is not None and (result[..., 3] != 255).any():
            bg = opts.bgcolor_getter()
            if bg[3] != 0:
                result = np.asarray(alpha_compose_background(
                    jnp.asarray(result),
                    jnp.asarray(np.array(bg, np.uint8)),
                    jnp.asarray(np.array(opts.bg_pattern_color, np.uint8)),
                    pattern_w=opts.pattern_size * opts.cell_x_px,
                    pattern_h=opts.pattern_size * opts.cell_y_px // 2,
                ))
        frames = list(result)
        from timg_tpu.render.plane_cache import (prime_block_planes,
                                                 prime_sixel_planes)
        prime_block_planes(frames, opts)
        prime_sixel_planes(frames, opts, self._sixel_state)
        return frames

    def send_frames(self, duration_ms: float, loops: int,
                    interrupt: Callable[[], bool], sink: FrameSink) -> None:
        lib, handle = self._lib, self._handle
        if handle is None:
            return
        opts = self._options
        tw, th = self._target
        frame_ms = 1000.0 / self._fps
        nbytes = self.orig_width * self.orig_height * 4
        buf = ctypes.create_string_buffer(nbytes)

        if loops == NOT_INITIALIZED:
            loops = self.default_loops()
        loop_forever = loops < 0

        time_ms = 0.0
        is_first = True
        last_height = -1
        k = 0
        while (loop_forever or k < loops) and not interrupt() \
                and time_ms < duration_ms:
            if k > 0 and not lib.timg_video_rewind(handle):
                break
            frames_seen = 0
            emitted = 0
            pending: List[np.ndarray] = []

            def flush():
                nonlocal time_ms, is_first, last_height
                if not pending:
                    return
                for frame in self._process_window(pending):
                    time_ms += frame_ms
                    dy = -last_height if last_height > 0 else 0
                    seq = (SeqType.START_OF_ANIMATION if is_first
                           else SeqType.ANIMATION_FRAME)
                    sink(self.indentation, dy, frame, seq,
                         min(time_ms, duration_ms))
                    last_height = frame.shape[0]
                    is_first = False
                pending.clear()

            while not interrupt():
                ret = lib.timg_video_read_frame(handle, buf)
                if ret != 1:
                    break
                frames_seen += 1
                if frames_seen <= self._frame_offset:  # ref :342-347
                    continue
                if self._frame_count >= 0 and emitted >= self._frame_count:
                    break
                emitted += 1
                frame = np.frombuffer(buf, np.uint8, nbytes).reshape(
                    self.orig_height, self.orig_width, 4).copy()
                pending.append(frame)
                if len(pending) >= _WINDOW:
                    flush()
                if time_ms > duration_ms:
                    break
            flush()
            if emitted == 0:
                break
            k += 1
