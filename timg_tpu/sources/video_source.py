"""Video source: libav host decode feeding batched device processing.

Behavioral spec: ref src/video-source.cc. Demux/decode happen in the
native helper (timg_native.cc); frames are resized/composed on device in
windows of several frames per dispatch (the reference scales each frame
serially on host with sws_scale, :352-354). Pacing semantics are the
reference's: dy=-height reposition per frame, AnimationFrame timestamps
at k/fps (:356-360), rewind-and-loop via seek (:302-307), "videos loop
once" default handled by the CLI, frame_offset skip (:342-347).

TPU-first transport: when the decoded stream is 8-bit 4:2:0 (the
overwhelmingly common case) the raw Y/U/V planes ship to the device at
1.5 bytes/pixel and the BT.601 conversion runs there (ops/yuv.py),
replacing the reference's host-side swscale YUV->RGBA leg entirely --
2.67x less host->device traffic and zero host conversion CPU.  Other
pixel formats (and ``TIMG_TPU_VIDEO_RGBA=1`` for A/B testing) fall back
to host sws conversion exactly like the reference.
"""

from __future__ import annotations

import ctypes
import os
import sys
from typing import Callable, List

import numpy as np

from timg_tpu.geometry import calc_scale_to_fit
from timg_tpu.options import NOT_INITIALIZED, DisplayOptions
from timg_tpu.render.sequencer import SeqType
from timg_tpu.sources.base import FrameSink, ImageSource

_WINDOW = 8  # frames per device dispatch

_yuv_jit = None


def _get_yuv_jit():
    """Jitted fused YUV420 -> RGBA -> resize, built once (a per-window
    closure would re-trace every dispatch)."""
    global _yuv_jit
    if _yuv_jit is None:
        import functools

        import jax
        import jax.numpy as jnp

        from timg_tpu.ops.resize import resize_video_words
        from timg_tpu.ops.yuv import yuv420_to_rgba_words

        @functools.partial(jax.jit,
                           static_argnames=("th", "tw", "full_range"))
        def convert_resize(y, u, v, th, tw, full_range):
            words = yuv420_to_rgba_words(y, u, v, full_range)
            words = resize_video_words(words, th, tw)
            return jax.lax.bitcast_convert_type(words, jnp.uint8)

        _yuv_jit = convert_resize
    return _yuv_jit


_sws_jit = None


def _get_sws_jit():
    """Jitted device swscale-bitexact convert+resize (ops/sws_resize.py):
    one fused dispatch per window, byte-equal to libswscale
    SWS_BILINEAR|SWS_BITEXACT (ref video-source.cc:352-354)."""
    global _sws_jit
    if _sws_jit is None:
        import functools

        import jax
        import jax.numpy as jnp

        from timg_tpu.ops.sws_resize import sws_yuv420_to_rgba_words

        @functools.partial(jax.jit,
                           static_argnames=("th", "tw", "full_range"))
        def convert_resize(y, u, v, th, tw, full_range):
            words = sws_yuv420_to_rgba_words(y, u, v, th, tw, full_range)
            return jax.lax.bitcast_convert_type(words, jnp.uint8)

        _sws_jit = convert_resize
    return _sws_jit


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

        # Raw-plane transport: 4:2:0 streams ship YUV planes to the
        # device (1.5 B/px) with BT.601 conversion on the TPU instead of
        # host sws (see module docstring).  Transparent-capable suffixes
        # keep the RGBA path (4:2:0 carries no alpha, but their RGBA
        # compose path is the tested one).
        self._full_range = False
        self._use_yuv = False
        self._sws_device = False
        # --resample=sws: the reference's exact video leg -- decode +
        # swscale SWS_BILINEAR straight to display size in one host
        # call per frame (ref video-source.cc:59-89 + :352-354); no
        # device resize, no YUV transport.
        resample = getattr(options, "resample", "auto")
        self._use_sws = (resample == "sws"
                         and hasattr(lib, "timg_video_read_frame_scaled"))
        if hasattr(lib, "timg_video_pix_info") \
                and not self._use_sws \
                and not self._maybe_transparent() \
                and not os.environ.get("TIMG_TPU_VIDEO_RGBA"):
            info = lib.timg_video_pix_info(handle)
            self._use_yuv = bool(info & 1)
            self._full_range = bool(info & 2)

        tw, th, _ = calc_scale_to_fit(self.orig_width, self.orig_height,
                                      options)
        self._target = (tw, th)
        if resample == "sws-bitexact":
            # Device swscale: keeps the 1.5 B/px YUV transport while
            # producing libswscale's SWS_BITEXACT bytes on the TPU
            # (ops/sws_resize.py).  Geometries the kernel does not
            # model (odd display width, non-4:2:0, transparent
            # suffixes) fall back to the host sws leg.
            from timg_tpu.ops import sws_resize
            if self._use_yuv and sws_resize.supports(tw):
                self._sws_device = True
            elif hasattr(lib, "timg_video_read_frame_scaled"):
                self._use_sws = True
                self._use_yuv = False
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

    def _process_window(self, raw: List, kind: str = "rgba"
                        ) -> List[np.ndarray]:
        """One batched device dispatch: [convert +] resize + compose.

        ``kind`` "rgba": raw = list of [H,W,4] u8 frames.  "yuv": raw =
        list of (y, u, v) plane triples; conversion and resize fuse into
        one jitted dispatch, so the only host->device traffic is the
        1.5 B/px planes."""
        import jax.numpy as jnp

        from timg_tpu.ops.compose import alpha_compose_background
        from timg_tpu.ops.resize import resize_batch

        from timg_tpu.parallel import auto

        opts = self._options
        tw, th = self._target
        if kind == "scaled":
            # --resample=sws: frames arrive already at display size
            # (host swscale); only compose + plane priming remain.
            result = np.stack(raw)
        elif kind == "yuv" and getattr(self, "_sws_device", False):
            # --resample=sws-bitexact: device swscale kernel
            # (ops/sws_resize.py) slotted into the same device-resident
            # window transport as the lean path, so the exact-swscale
            # mode pays no extra host traffic.
            ys = np.stack([f[0] for f in raw])
            us = np.stack([f[1] for f in raw])
            vs = np.stack([f[2] for f in raw])
            full_range = self._full_range
            from timg_tpu.render.plane_cache import (
                prime_block_video_device, prime_pixel_video_device,
                prime_sixel_video_device)
            fast = prime_sixel_video_device(
                ys, us, vs, th, tw, full_range, opts,
                self._sixel_state, resample="sws")
            if fast is None:
                fast = prime_block_video_device(
                    ys, us, vs, th, tw, full_range, opts,
                    self._sixel_state, resample="sws")
            if fast is None:
                fast = prime_pixel_video_device(
                    ys, us, vs, th, tw, full_range, opts, resample="sws")
            if fast is not None:
                return fast

            def _sws_shard(y, u, v):
                import jax

                from timg_tpu.ops.sws_resize import (
                    sws_yuv420_to_rgba_words)
                words = sws_yuv420_to_rgba_words(y, u, v, th, tw,
                                                 full_range)
                return jax.lax.bitcast_convert_type(words, jnp.uint8)

            result = auto.shard_batch_call(
                ("video_sws", ys.shape[-1], ys.shape[-2], th, tw,
                 full_range), _sws_shard, [ys, us, vs])
            if result is None:
                result = np.asarray(_get_sws_jit()(
                    ys, us, vs, th, tw, full_range))
        elif kind == "yuv":
            ys = np.stack([f[0] for f in raw])
            us = np.stack([f[1] for f in raw])
            vs = np.stack([f[2] for f in raw])
            # Sixel sessions: fused device window (convert + resize +
            # dither + run transport without ever fetching RGBA frames
            # — the legacy flow shipped ~4 B/px down AND back up per
            # window; see plane_cache.prime_sixel_video_device).
            from timg_tpu.render.plane_cache import (
                prime_block_video_device, prime_pixel_video_device,
                prime_sixel_video_device)
            fast = prime_sixel_video_device(
                ys, us, vs, th, tw, self._full_range, opts,
                self._sixel_state)
            if fast is None:
                # block sessions: same device-resident flow, fetching
                # glyph/fg/bg planes + diff masks instead of frames
                fast = prime_block_video_device(
                    ys, us, vs, th, tw, self._full_range, opts,
                    self._sixel_state)
            if fast is None:
                # pixel-direct (kitty/iTerm2) sessions: convert+resize
                # stay on device; each frame's RGBA D2H happens lazily
                # inside the canvas encode pool (overlapping deflate)
                fast = prime_pixel_video_device(
                    ys, us, vs, th, tw, self._full_range, opts)
            if fast is not None:
                return fast
            # Multi-chip: pure data parallelism over the frame axis
            # (every frame is independent through convert+resize);
            # single-device returns None and the plain jit runs
            # (parallel/auto.py).
            full_range = self._full_range

            def _yuv_shard(y, u, v):
                import jax

                from timg_tpu.ops.resize import resize_video_words
                from timg_tpu.ops.yuv import yuv420_to_rgba_words
                words = yuv420_to_rgba_words(y, u, v, full_range)
                words = resize_video_words(words, th, tw)
                return jax.lax.bitcast_convert_type(words, jnp.uint8)

            result = auto.shard_batch_call(
                ("video_yuv", th, tw, full_range), _yuv_shard,
                [ys, us, vs])
            if result is None:
                result = np.asarray(_get_yuv_jit()(
                    ys, us, vs, th, tw, self._full_range))
        elif self._maybe_transparent():
            arr = np.stack(raw)
            result = auto.shard_batch_call(
                ("video_resize_batch", th, tw),
                lambda b: resize_batch(b, th, tw), [arr])
            if result is None and os.environ.get(
                    "TIMG_TPU_VIDEO_DEVICE_WINDOW", "1") != "0":
                # Device-resident window for transparent codecs
                # (VERDICT r4 #8): the resized frames stay on device; a
                # scalar probe reports whether any pixel is transparent
                # (preserving the reference's lazy bg query,
                # framebuffer.cc:113-121) and the compose runs on the
                # RESIDENT frames — the legacy flow paid D2H + H2D +
                # D2H of 4 B/px per window here.
                resized = resize_batch(jnp.asarray(arr), th, tw)
                composed = False
                if opts.bgcolor_getter is not None and bool(np.asarray(
                        (resized[..., 3] != 255).any())):
                    bg = opts.bgcolor_getter()
                    if bg[3] != 0:
                        resized = alpha_compose_background(
                            resized,
                            jnp.asarray(np.array(bg, np.uint8)),
                            jnp.asarray(np.array(opts.bg_pattern_color,
                                                 np.uint8)),
                            pattern_w=opts.pattern_size * opts.cell_x_px,
                            pattern_h=(opts.pattern_size
                                       * opts.cell_y_px // 2))
                        composed = True
                result = np.asarray(resized)       # single final D2H
                if composed:
                    return self._prime_and_list(result, opts)
            elif result is None:
                result = np.asarray(resize_batch(jnp.asarray(arr), th, tw))
        else:
            arr = np.stack(raw)
            # opaque codecs: lean resize (the reference's video path uses
            # swscale bilinear here, ref video-source.cc:352, so the
            # stb-exact pipeline isn't the parity target). Frames are
            # staged to the device as RGBA-packed i32 words -- a free
            # reinterpretation on host, where a device-side u8->i32
            # bitcast would be a full relayout copy on TPU.
            from timg_tpu.ops.resize import resize_video_words
            words_np = arr.view(np.int32).reshape(arr.shape[:3])
            out = auto.shard_batch_call(
                ("video_resize_words", th, tw),
                lambda w_: resize_video_words(w_, th, tw), [words_np])
            if out is None:
                out = np.asarray(resize_video_words(
                    jnp.asarray(words_np), th, tw))
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
        return self._prime_and_list(result, opts)

    def _prime_and_list(self, result, opts) -> List[np.ndarray]:
        frames = list(result)
        from timg_tpu.render.plane_cache import (prime_block_planes,
                                                 prime_sixel_planes)
        # sustained: the same window geometry repeats for the whole
        # stream, so the device compile amortizes (ops/backend.py)
        prime_block_planes(frames, opts, sustained=True)
        prime_sixel_planes(frames, opts, self._sixel_state,
                           sustained=True)
        return frames

    def send_frames(self, duration_ms: float, loops: int,
                    interrupt: Callable[[], bool], sink: FrameSink) -> None:
        lib, handle = self._lib, self._handle
        if handle is None:
            return
        opts = self._options
        frame_ms = 1000.0 / self._fps
        w, h = self.orig_width, self.orig_height
        nbytes = w * h * 4
        buf = ctypes.create_string_buffer(nbytes)
        use_yuv = getattr(self, "_use_yuv", False)
        use_sws = getattr(self, "_use_sws", False)
        ybuf = ubuf = vbuf = sbuf = None
        cw = ch = 0
        tw, th = self._target
        if use_sws:
            sbuf = ctypes.create_string_buffer(max(tw * th * 4, 4))
        elif use_yuv:
            cw, ch = (w + 1) // 2, (h + 1) // 2
            ybuf = ctypes.create_string_buffer(w * h)
            ubuf = ctypes.create_string_buffer(cw * ch)
            vbuf = ctypes.create_string_buffer(cw * ch)

        if loops == NOT_INITIALIZED:
            loops = self.default_loops()
        loop_forever = loops < 0

        # Window pipeline: decode of window k+1 overlaps the device
        # processing + emission of window k (one lookahead slot; the
        # bounded write queue provides end-to-end backpressure like the
        # reference's depth-4 queue, ref timg.cc:972 /
        # buffered-write-sequencer.cc:91-146).  Byte-identical to the
        # serial order: the duration cutoff runs on a decode-side clock
        # (sched_ms) that equals the serial path's post-flush time.
        # TIMG_TPU_NO_OVERLAP=1 restores the serial dispatch.
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor
        overlap = not os.environ.get("TIMG_TPU_NO_OVERLAP")
        proc_pool = ThreadPoolExecutor(max_workers=1) if overlap else None
        windows: deque = deque()

        time_ms = 0.0      # emission clock (sink timestamps)
        sched_ms = 0.0     # decode-side clock (duration cutoff)
        is_first = True
        last_height = -1

        def emit(frames):
            nonlocal time_ms, is_first, last_height
            for frame in frames:
                time_ms += frame_ms
                dy = -last_height if last_height > 0 else 0
                seq = (SeqType.START_OF_ANIMATION if is_first
                       else SeqType.ANIMATION_FRAME)
                sink(self.indentation, dy, frame, seq,
                     min(time_ms, duration_ms))
                last_height = frame.shape[0]
                is_first = False

        try:
            k = 0
            while (loop_forever or k < loops) and not interrupt() \
                    and sched_ms < duration_ms:
                if k > 0 and not lib.timg_video_rewind(handle):
                    break
                frames_seen = 0
                emitted = 0
                pending: List = []
                pending_kind = "rgba"

                def flush(drain: bool = False):
                    nonlocal sched_ms
                    if pending:
                        batch, kind = list(pending), pending_kind
                        pending.clear()
                        sched_ms += len(batch) * frame_ms
                        if proc_pool is not None:
                            windows.append(proc_pool.submit(
                                self._process_window, batch, kind))
                        else:
                            emit(self._process_window(batch, kind))
                    while windows and (drain or len(windows) > 1):
                        emit(windows.popleft().result())

                while not interrupt():
                    if use_sws:
                        ret = lib.timg_video_read_frame_scaled(
                            handle, sbuf, tw, th)
                    elif use_yuv:
                        ret = lib.timg_video_read_frame_yuv(
                            handle, ybuf, ubuf, vbuf, buf)
                    else:
                        ret = lib.timg_video_read_frame(handle, buf)
                    if ret <= 0:
                        break
                    frames_seen += 1
                    if frames_seen <= self._frame_offset:  # ref :342-347
                        continue
                    if self._frame_count >= 0 \
                            and emitted >= self._frame_count:
                        break
                    emitted += 1
                    if use_sws:
                        item = np.frombuffer(
                            sbuf, np.uint8, tw * th * 4).reshape(
                                th, tw, 4).copy()
                        kind = "scaled"
                    elif ret == 1 and use_yuv:
                        item = (np.frombuffer(ybuf, np.uint8,
                                              w * h).reshape(h, w).copy(),
                                np.frombuffer(ubuf, np.uint8,
                                              cw * ch).reshape(ch,
                                                               cw).copy(),
                                np.frombuffer(vbuf, np.uint8,
                                              cw * ch).reshape(ch,
                                                               cw).copy())
                        kind = "yuv"
                    else:
                        # ret == 2: mid-stream non-4:2:0 frame, native
                        # helper sws-converted it to RGBA as fallback
                        item = np.frombuffer(buf, np.uint8,
                                             nbytes).reshape(h, w,
                                                             4).copy()
                        kind = "rgba"
                    if pending and kind != pending_kind:
                        flush()       # homogeneous device windows only
                    pending_kind = kind
                    pending.append(item)
                    if len(pending) >= _WINDOW:
                        flush()
                    if sched_ms > duration_ms:
                        break
                flush(drain=True)
                if emitted == 0:
                    break
                k += 1
        finally:
            if proc_pool is not None:
                proc_pool.shutdown(wait=True)
