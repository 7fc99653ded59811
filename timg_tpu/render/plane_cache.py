"""Bounded cache carrying device-computed planes from sources to canvases.

Sources process whole animation/video windows in one device dispatch
(resize+compose+glyph planes batched); the canvas consumes per-frame. To
avoid threading new types through the sink contract, the planes ride in
a small id-keyed cache: the source primes it per frame array, the canvas
pops. Strong references to the key arrays keep ids stable; FIFO bounded.
"""

from __future__ import annotations

import os
from collections import OrderedDict
from typing import Any, Optional

import numpy as np

from timg_tpu.utils import get_bool_env

_MAX = 64

def _dispatch_platform():
    from timg_tpu.ops.backend import dispatch_platform
    return dispatch_platform()



class PlaneCache:
    def __init__(self) -> None:
        self._entries: OrderedDict[int, tuple] = OrderedDict()

    def put(self, frame: np.ndarray, value: Any) -> None:
        self._entries[id(frame)] = (frame, value)
        while len(self._entries) > _MAX:
            self._entries.popitem(last=False)

    def pop(self, frame: np.ndarray) -> Optional[Any]:
        # get-semantics: animations loop over the same frame objects
        entry = self._entries.get(id(frame))
        if entry is None:
            return None
        # The id-keying is sound only because entries hold a strong ref
        # to the key array (an id cannot be reused *while cached*).
        # Enforce that invariant instead of trusting it: an identity
        # mismatch means an id was reused after an eviction freed the
        # original -- treat as a miss rather than serving stale planes.
        if entry[0] is not frame:
            del self._entries[id(frame)]
            return None
        return entry[1]


BLOCK_PLANES = PlaneCache()
SIXEL_PLANES = PlaneCache()


class DeviceFrame:
    """Placeholder for a device-resident video frame.

    The sustained sixel video path keeps pixels on device end-to-end
    (YUV convert -> resize -> dither -> run transport); the sink/canvas
    contract only needs a per-frame object with a shape — and, on a
    plane-cache miss, the pixels.  This materializes them lazily (one
    device fetch for that frame only), so the common path never ships
    full RGBA frames over the link."""

    __slots__ = ("_words", "_i", "_th", "_y0", "shape", "dtype", "_cache")

    def __init__(self, words_dev, i: int, th: int, tw: int, y0: int = 0):
        self._words = words_dev      # [B, >=y0+th, tw] i32 device array
        self._i = i
        self._th = th
        self._y0 = y0                # first row (odd-height pad offset)
        self.shape = (th, tw, 4)
        self.dtype = np.dtype(np.uint8)
        self._cache = None

    @property
    def ndim(self) -> int:
        return 3

    def __array__(self, dtype=None, copy=None):
        if self._cache is None:
            w = np.asarray(
                self._words[self._i, self._y0:self._y0 + self._th])
            self._cache = w.view(np.uint8).reshape(self.shape)
        a = self._cache
        if dtype is not None and np.dtype(dtype) != a.dtype:
            a = a.astype(dtype)
        return a

    def __getitem__(self, key):
        return self.__array__()[key]

    def reshape(self, *shape):
        # the ANSI canvas's host-diff fallback reshapes prev/cur padded
        # frames when a device-computed mask is unavailable
        return self.__array__().reshape(*shape)


_VIDEO_JITS: dict = {}


def _video_stage_jit(key, builder):
    fn = _VIDEO_JITS.get(key)
    if fn is None:
        fn = _VIDEO_JITS[key] = builder()
    return fn


def prime_sixel_video_device(ys, us, vs, th: int, tw: int,
                             full_range: bool, options, state: dict,
                             resample: str = "lean"):
    """Fused device window for opaque 4:2:0 video in sixel sessions.

    Replaces the fetch-RGBA-then-reupload round trip (2 x ~4 B/px over
    the host link per window) with a device-resident flow: one dispatch
    converts+resizes and exposes (a) quant.c's exact histogram sample
    sequence (ops/libsixel_quant.sample_stride — ~74 KB/frame instead
    of the 3.7 MB frame) for host-side per-frame palettes, and (b) the
    sixel-padded word planes feeding the dither + run-transport
    dispatches.  Frames return as DeviceFrame placeholders; the stream
    is byte-identical to the legacy path (tests/test_video_device_window).

    Returns the placeholder frame list, or None when the fast path
    does not apply (host mode, multi-device session, unknown mode) —
    callers then run the legacy fetch path.  TIMG_TPU_VIDEO_DEVICE_
    WINDOW=0 disables it for A/B comparison."""
    mode = getattr(options, "sixel_batch_dither", None)
    if mode not in ("cube", "adaptive", "libsixel"):
        return None
    if os.environ.get("TIMG_TPU_VIDEO_DEVICE_WINDOW", "1") == "0":
        return None
    from timg_tpu.ops.backend import prefer_host, use_numpy
    if prefer_host(len(ys), sustained=True) or use_numpy():
        return None
    from timg_tpu.parallel import auto
    if auto.configured_devices() > 1:
        return None  # sharded sessions keep the legacy window path
    import jax
    import jax.numpy as jnp

    from timg_tpu.ops import libsixel_quant as lsq
    from timg_tpu.ops.sixel_runs import fetch_planes_or_runs

    b = ys.shape[0]
    padded_h = th + 5 - (th + 5) % 6
    bg = options.bgcolor_getter() if options.bgcolor_getter else None
    bg_word = 0
    if padded_h > th and bg is not None and bg[3] != 0:
        bg_word = (int(bg[0]) | (int(bg[1]) << 8) | (int(bg[2]) << 16)
                   | (255 << 24))
        if bg_word >= 1 << 31:     # RGBA word with alpha set: wrap to
            bg_word -= 1 << 32     # the signed i32 the planes carry
    # palettes sample the sixel-PADDED frame, like the legacy path
    # (the bg strip rows are part of what libsixel would see)
    stride = lsq.sample_stride(padded_h * tw)

    def build_resize():
        from timg_tpu.ops.resize import resize_video_words
        from timg_tpu.ops.sws_resize import sws_yuv420_to_rgba_words
        from timg_tpu.ops.yuv import yuv420_to_rgba_words

        @jax.jit
        def fn(y, u, v):
            if resample == "sws":
                # --resample=sws-bitexact: swscale's exact arithmetic
                # on device (ops/sws_resize.py)
                words = sws_yuv420_to_rgba_words(y, u, v, th, tw,
                                                 full_range)
            else:
                words = yuv420_to_rgba_words(y, u, v, full_range)
                words = resize_video_words(words, th, tw)
            if padded_h > th:
                pad = jnp.full((words.shape[0], padded_h - th, tw),
                               np.int32(bg_word), jnp.int32)
                words = jnp.concatenate([words, pad], axis=1)
            samples = words.reshape(words.shape[0], -1)[:, ::stride]
            return words, samples
        return fn

    resize_fn = _video_stage_jit(
        ("resize", th, tw, full_range, padded_h, bg_word, stride,
         resample), build_resize)
    words_dev, samples_dev = resize_fn(ys, us, vs)

    interpret = _dispatch_platform() != "tpu"
    if mode == "libsixel":
        samples = np.asarray(samples_dev)
        rgb = np.stack([samples & 0xFF, (samples >> 8) & 0xFF,
                        (samples >> 16) & 0xFF], axis=-1).astype(np.uint8)
        pals, diffs = [], []
        for i in range(b):
            pal, diffuse = lsq.make_palette_from_samples(rgb[i])
            pals.append(pal)
            diffs.append(bool(diffuse))
        pals256 = np.stack([
            np.vstack([p, np.repeat(p[:1], 256 - len(p), 0)]).astype(
                np.int32) for p in pals])
        diffs_np = np.asarray(diffs, np.int32)

        def build_dither():
            from timg_tpu.ops.sixel_pallas3 import (
                build_bucket_tables_device, fs_dither_table_fused)

            @jax.jit
            def fn(words, pals_, diffs_):
                bb = words.shape[0]
                tables = build_bucket_tables_device(pals_)
                tw_ = jax.lax.bitcast_convert_type(
                    tables.reshape(bb, 8192, 4), jnp.int32).reshape(
                        bb, 64, 128).transpose(1, 0, 2)
                palw = ((pals_[:, :, 0] << 16) | (pals_[:, :, 1] << 8)
                        | pals_[:, :, 2]).astype(jnp.int32).reshape(
                            bb, 2, 128).transpose(1, 0, 2)
                dww = jnp.broadcast_to(
                    diffs_[None, :, None], (1, bb, 128)).astype(jnp.int32)
                return fs_dither_table_fused(
                    words, tw_, palw, dww, padded_h, tw,
                    interpret=interpret, out_u8=True)
            return fn

        dither_fn = _video_stage_jit(
            ("dither_libsixel", padded_h, tw, interpret), build_dither)
        planes_dev = dither_fn(words_dev, jnp.asarray(pals256),
                               jnp.asarray(diffs_np))
        entries = fetch_planes_or_runs(planes_dev, b, padded_h, tw)
        frames = [DeviceFrame(words_dev, i, th, tw) for i in range(b)]
        for i, frame in enumerate(frames):
            SIXEL_PLANES.put(frame, (entries[i], pals[i], None))
        return frames

    if mode == "cube":
        def build_cube():
            from timg_tpu.ops.sixel_pallas3 import fs_dither_cube_fused

            @jax.jit
            def fn(words):
                return fs_dither_cube_fused(words, padded_h, tw,
                                            out_u8=True,
                                            interpret=interpret)
            return fn

        dither_fn = _video_stage_jit(("dither_cube", padded_h, tw,
                                      interpret), build_cube)
        planes_dev = dither_fn(words_dev)
        entries = fetch_planes_or_runs(planes_dev, b, padded_h, tw)
        frames = [DeviceFrame(words_dev, i, th, tw) for i in range(b)]
        for i, frame in enumerate(frames):
            SIXEL_PLANES.put(frame, (entries[i], None, None))
        return frames

    # adaptive: one median-cut tree per animation segment, built from
    # the full first frame (byte-identity with the legacy path; one
    # 4 B/px fetch per segment, amortized across every window)
    quantizer = state.get("quantizer")
    if quantizer is None:
        from timg_tpu.ops.sixel_np import median_cut_tree
        first = np.asarray(words_dev[0, :padded_h])
        first_rgba = first.view(np.uint8).reshape(padded_h, tw, 4)
        quantizer = median_cut_tree(first_rgba[..., :3])
        state["quantizer"] = quantizer
    palette, levels, leaves = quantizer

    def build_tree():
        from timg_tpu.ops.sixel_pallas3 import fs_dither_tree_fused

        @jax.jit
        def fn(words, levels_, leaves_):
            return fs_dither_tree_fused(words, levels_, leaves_,
                                        padded_h, tw, out_u8=True,
                                        interpret=interpret)
        return fn

    dither_fn = _video_stage_jit(("dither_tree", padded_h, tw,
                                  interpret), build_tree)
    planes_dev = dither_fn(words_dev, jnp.asarray(np.asarray(levels)),
                           jnp.asarray(np.asarray(leaves)))
    entries = fetch_planes_or_runs(planes_dev, b, padded_h, tw)
    frames = [DeviceFrame(words_dev, i, th, tw) for i in range(b)]
    for i, frame in enumerate(frames):
        SIXEL_PLANES.put(frame, (entries[i], palette, quantizer))
    return frames


def prime_pixel_video_device(ys, us, vs, th: int, tw: int,
                             full_range: bool, options,
                             resample: str = "lean"):
    """Device-resident window for opaque 4:2:0 video in pixel-direct
    (kitty/iTerm2) sessions.

    The PNG encode is inherently host-side (the reference runs it per
    frame on host threads, ref kitty-canvas.cc:126-236), but the
    convert + resize legs ride the same device window transport as the
    sixel/block paths: one fused dispatch per window, frames returned
    as DeviceFrame placeholders.  Each frame's RGBA crosses the link
    lazily — DeviceFrame.__array__ runs *inside the canvas encode-pool
    worker* — so the window's D2H overlaps the other workers' deflate
    and the next window's decode/dispatch instead of blocking the
    pipeline up front.  Byte-identical to the eager flow (same device
    arithmetic, same bytes fetched; tests/test_video_device_window).

    Returns the placeholder frame list, or None when the fast path does
    not apply (non-pixel session, host mode, multi-device, disabled)."""
    if getattr(options, "sixel_batch_dither", None) is not None \
            or options.cell_y_px == 2:
        return None  # sixel/block sessions have their own device windows
    if os.environ.get("TIMG_TPU_VIDEO_DEVICE_WINDOW", "1") == "0":
        return None
    from timg_tpu.ops.backend import prefer_host, use_numpy
    if prefer_host(len(ys), sustained=True) or use_numpy():
        return None
    from timg_tpu.parallel import auto
    if auto.configured_devices() > 1:
        return None
    import jax

    def build():
        from timg_tpu.ops.resize import resize_video_words
        from timg_tpu.ops.sws_resize import sws_yuv420_to_rgba_words
        from timg_tpu.ops.yuv import yuv420_to_rgba_words

        @jax.jit
        def fn(y, u, v):
            if resample == "sws":
                # --resample=sws-bitexact (ops/sws_resize.py)
                return sws_yuv420_to_rgba_words(y, u, v, th, tw,
                                                full_range)
            words = yuv420_to_rgba_words(y, u, v, full_range)
            return resize_video_words(words, th, tw)
        return fn

    fn = _video_stage_jit(("pixel", th, tw, full_range, resample), build)
    words_dev = fn(ys, us, vs)
    return [DeviceFrame(words_dev, i, th, tw)
            for i in range(ys.shape[0])]


def pad_odd_height(frames: np.ndarray, use_upper_half_block: bool
                   ) -> np.ndarray:
    """Batched odd-height empty-line shift (ref unicode-block-canvas.cc
    :356-365): blank row goes on top for lower-block use, bottom for
    upper-block use."""
    if frames.shape[1] % 2 == 0:
        return frames
    empty = np.zeros((frames.shape[0], 1) + frames.shape[2:], frames.dtype)
    if not use_upper_half_block:
        return np.concatenate([empty, frames], axis=1)
    return np.concatenate([frames, empty], axis=1)


def prime_sixel_planes(frames: list, options, state: dict,
                       sustained: bool = False) -> None:
    """Batched sixel dither for an animation/video window: one device
    dispatch computes the index planes the canvas would otherwise
    produce frame-by-frame (bit-identical -- same strip padding, same
    palette rules: cube, or adaptive median-cut built once per
    animation and reused, ref sixel-canvas.cc:109-148 analog).

    ``state`` is owned by the source and carries the adaptive palette
    across windows/loops (the canvas refreshes at animation starts
    from the same first frame, so reuse stays byte-identical)."""
    mode = getattr(options, "sixel_batch_dither", None)
    if not frames or mode not in ("cube", "adaptive", "libsixel"):
        return
    if mode == "libsixel" and len(frames) == 1 and not sustained:
        # one-shot stills keep the reference-exact cached quantizer in
        # the canvas (sixel_render._enqueue_libsixel); only sustained
        # streams / multi-frame animations take the batched
        # bucket-table path (see ops/libsixel_quant.py for the
        # cache-vs-table analysis)
        return
    from timg_tpu.ops.backend import prefer_host, use_numpy

    # One-shot windows (short animations) run the bit-exact numpy
    # wavefront mirrors; sustained callers (video/scroll: fixed window
    # geometry reused stream-long) amortize the compile on device.
    host_mode = prefer_host(len(frames), sustained) or use_numpy()
    if not host_mode:
        import jax

    h, w = frames[0].shape[:2]
    padded_h = h + 5 - (h + 5) % 6                 # round up to sixel 6
    batch = np.zeros((len(frames), padded_h, w, 4), np.uint8)
    batch[:, :h] = np.stack(frames)
    if padded_h > h and options.bgcolor_getter is not None:
        bg = options.bgcolor_getter()
        if bg[3] != 0:
            batch[:, h:, :, :3] = bg[:3]
            batch[:, h:, :, 3] = 255

    from timg_tpu.parallel import auto

    quantizer = None
    if mode == "libsixel":
        _prime_libsixel(frames, batch, host_mode, options)
        return
    if mode == "cube":
        palette = None
        if host_mode:
            from timg_tpu.ops.sixel_np import fs_dither_cube_np
            indices = fs_dither_cube_np(batch).astype(np.uint8)
        elif _dispatch_platform() == "tpu":
            from timg_tpu.ops.sixel_pallas3 import fs_dither_cube_fused

            def _cube_shard(words_):
                b_, h_, w_ = words_.shape
                return fs_dither_cube_fused(words_, h_, w_, out_u8=True,
                                            out_padded=True)

            words_np = batch.view(np.int32).reshape(batch.shape[:3])
            full = auto.shard_batch_call(("sixel_cube_pallas",),
                                         _cube_shard, [words_np],
                                         fetch=False)
            if full is None:
                full = fs_dither_cube_fused(
                    jax.numpy.asarray(words_np), padded_h, w,
                    out_u8=True, out_padded=True)
            # run-transport decision, else pitched views into the
            # padded device planes (the C assembler takes a row pitch,
            # so no repack is needed)
            from timg_tpu.ops.sixel_runs import fetch_planes_or_runs
            indices = fetch_planes_or_runs(full, len(frames), padded_h, w)
        else:
            from timg_tpu.ops import sixel as sixel_op
            indices = auto.shard_batch_call(
                ("sixel_cube_jax",), sixel_op.fs_dither_cube, [batch])
            if indices is None:
                indices = np.asarray(sixel_op.fs_dither_cube(batch))
            indices = indices.astype(np.uint8)
    else:
        quantizer = state.get("quantizer")
        if quantizer is None:
            from timg_tpu.ops.sixel_np import median_cut_tree
            quantizer = median_cut_tree(batch[0, ..., :3])
            state["quantizer"] = quantizer
        palette, levels, leaves = quantizer
        if host_mode:
            from timg_tpu.ops.sixel_np import fs_dither_tree_np
            indices = fs_dither_tree_np(
                batch[..., :3], levels, leaves).astype(np.uint8)
        elif _dispatch_platform() == "tpu":
            from timg_tpu.ops.sixel_pallas3 import fs_dither_tree_fused

            def _tree_shard(words_, levels_, leaves_):
                b_, h_, w_ = words_.shape
                return fs_dither_tree_fused(words_, levels_, leaves_,
                                            h_, w_, out_u8=True,
                                            out_padded=True)

            words_np = batch.view(np.int32).reshape(batch.shape[:3])
            full = auto.shard_batch_call(
                ("sixel_tree_pallas",), _tree_shard, [words_np],
                rep_args=[np.asarray(levels), np.asarray(leaves)],
                fetch=False)
            if full is None:
                full = fs_dither_tree_fused(
                    jax.numpy.asarray(words_np),
                    jax.numpy.asarray(levels),
                    jax.numpy.asarray(leaves), padded_h, w, out_u8=True,
                    out_padded=True)
            from timg_tpu.ops.sixel_runs import fetch_planes_or_runs
            indices = fetch_planes_or_runs(full, len(frames), padded_h, w)
        else:
            from timg_tpu.ops import sixel as sixel_op

            def _tree_jax_shard(b_, lv, lf):
                # the public wrapper np.asarray()s its input, which a
                # shard_map tracer cannot survive; call the impl
                bb, hh, ww = b_.shape[:3]
                return sixel_op._fs_dither_tree_impl(
                    b_[..., :3], lv, lf, hh, ww)

            indices = auto.shard_batch_call(
                ("sixel_tree_jax",), _tree_jax_shard,
                [batch], rep_args=[np.asarray(levels), np.asarray(leaves)])
            if indices is None:
                indices = np.asarray(sixel_op.fs_dither_tree(
                    batch[..., :3], levels, leaves))
            indices = indices.astype(np.uint8)

    for i, frame in enumerate(frames):
        SIXEL_PLANES.put(frame, (indices[i], palette, quantizer))


def _prime_libsixel(frames: list, batch: np.ndarray, host_mode: bool,
                    options) -> None:
    """libsixel-mode window dispatch: per-frame palettes on host (the
    18,383-sample histogram + mediancut of quant.c, exactly as the
    reference drives it per frame, ref sixel-canvas.cc:134-148), then
    the bucket-table integer-FS apply — the device wavefront kernel
    (ops/sixel_pallas3.fs_dither_table_fused) or its strict C mirror
    (timg_native.cc:timg_libsixel_apply_table) on the host path; both
    are byte-identical (tests/test_libsixel.py).  See
    ops/libsixel_quant.py for the table-vs-cache semantics analysis."""
    from timg_tpu.native import runtime as native_rt

    pals, diffs = [], []
    for i in range(len(frames)):
        res = native_rt.libsixel_palette(batch[i])
        if res is None:
            from timg_tpu.ops import libsixel_quant as lsq
            res = lsq.make_palette(batch[i][..., :3])
        pals.append(res[0])
        diffs.append(bool(res[1]))

    if host_mode:
        rows = []
        for i in range(len(frames)):
            table = native_rt.libsixel_build_table(pals[i])
            if table is not None:
                idx = native_rt.libsixel_apply_table(
                    batch[i], table, pals[i], diffs[i])
            else:  # no native helper: scalar oracle (tests only)
                from timg_tpu.ops import libsixel_quant as lsq
                table = lsq.build_bucket_table(pals[i])
                idx = lsq.apply_palette_bucket_table(
                    batch[i][..., :3], table, pals[i],
                    diffs[i]).astype(np.uint8)
            rows.append(idx)
        indices = np.stack(rows)
    else:
        import jax

        from timg_tpu.ops.sixel_pallas3 import (
            build_bucket_tables_device, fs_dither_table_fused,
            pack_libsixel_tables)
        from timg_tpu.parallel import auto

        pals256 = np.stack([
            np.vstack([p, np.repeat(p[:1], 256 - len(p), 0)]).astype(
                np.int32) for p in pals])
        h, w = batch.shape[1:3]
        words_np = batch.view(np.int32).reshape(batch.shape[:3])

        def _shard(words_, pals_, diffs_):
            import jax.numpy as jnp
            bb = words_.shape[0]
            tables = build_bucket_tables_device(pals_)
            tw = jax.lax.bitcast_convert_type(
                tables.reshape(bb, 8192, 4), jnp.int32).reshape(
                    bb, 64, 128).transpose(1, 0, 2)
            palw = ((pals_[:, :, 0] << 16) | (pals_[:, :, 1] << 8)
                    | pals_[:, :, 2]).astype(jnp.int32).reshape(
                        bb, 2, 128).transpose(1, 0, 2)
            dww = jnp.broadcast_to(
                diffs_[None, :, None], (1, bb, 128)).astype(jnp.int32)
            return fs_dither_table_fused(words_, tw, palw, dww, h, w,
                                         interpret=(_dispatch_platform()
                                                    != "tpu"),
                                         out_u8=True)

        diffs_np = np.asarray(diffs, np.int32)
        full = auto.shard_batch_call(("libsixel_table",), _shard,
                                     [words_np, pals256, diffs_np],
                                     fetch=False)
        if full is None:
            full = _shard(
                jax.numpy.asarray(words_np), jax.numpy.asarray(pals256),
                jax.numpy.asarray(diffs_np))
        # Transport decision: compact column runs when they beat the
        # raw plane on the link (ops/sixel_runs.py) — per-frame entries
        # are either [h, w] planes or SixelRuns; the canvas dispatches.
        from timg_tpu.ops.sixel_runs import fetch_planes_or_runs
        indices = fetch_planes_or_runs(full, len(frames), h, w)

    for i, frame in enumerate(frames):
        SIXEL_PLANES.put(frame, (indices[i], pals[i], None))


def prime_block_video_device(ys, us, vs, th: int, tw: int,
                             full_range: bool, options, state: dict,
                             resample: str = "lean"):
    """Fused device window for opaque 4:2:0 video in BLOCK sessions
    (the half/quarter analog of prime_sixel_video_device): convert +
    resize + glyph argmin + inter-frame cell diffs in device dispatches,
    fetching only the glyph/fg/bg planes and diff masks (~9 B/cell)
    instead of round-tripping full RGBA frames.  The previous window's
    last frame rides along in ``state`` so even the window-boundary
    diff is device-computed.  Returns placeholder frames or None
    (callers fall back to the legacy fetch path)."""
    if options.cell_x_px > 2 or options.cell_y_px != 2:
        return None
    if os.environ.get("TIMG_TPU_VIDEO_DEVICE_WINDOW", "1") == "0":
        return None
    if options.cell_x_px == 2 and tw % 2:
        return None  # odd-width quarter frames: per-frame canvas path
    from timg_tpu.ops.backend import prefer_host, use_numpy
    if prefer_host(len(ys), sustained=True) or use_numpy():
        return None
    from timg_tpu.parallel import auto
    if auto.configured_devices() > 1:
        return None
    import jax
    import jax.numpy as jnp

    b = ys.shape[0]
    use_upper = get_bool_env("TIMG_USE_UPPER_BLOCK")
    odd = th % 2
    ph = th + odd
    quarter = options.cell_x_px == 2

    def build():
        from timg_tpu.ops import blocks as blocks_op
        from timg_tpu.ops.diff import window_cell_diff
        from timg_tpu.ops.resize import resize_video_words
        from timg_tpu.ops.sws_resize import sws_yuv420_to_rgba_words
        from timg_tpu.ops.yuv import yuv420_to_rgba_words

        fn_blocks = (blocks_op.quarter_blocks if quarter
                     else blocks_op.half_blocks)

        @jax.jit
        def fn(y, u, v, prev_tail):
            if resample == "sws":
                # --resample=sws-bitexact (ops/sws_resize.py)
                words = sws_yuv420_to_rgba_words(y, u, v, th, tw,
                                                 full_range)
            else:
                words = yuv420_to_rgba_words(y, u, v, full_range)
                words = resize_video_words(words, th, tw)
            if odd:
                blank = jnp.zeros((words.shape[0], 1, tw), jnp.int32)
                pair = ([words, blank] if use_upper else [blank, words])
                padded_words = jnp.concatenate(pair, axis=1)
            else:
                padded_words = words
            batch = jax.lax.bitcast_convert_type(padded_words, jnp.uint8)
            glyph, fg, bg = fn_blocks(batch,
                                      use_upper_half_block=use_upper)
            prev_u8 = jax.lax.bitcast_convert_type(prev_tail, jnp.uint8)
            eq = window_cell_diff(
                jnp.concatenate([prev_u8, batch], axis=0),
                options.cell_x_px)
            return padded_words, glyph, fg, bg, eq
        return fn

    fn = _video_stage_jit(("blocks", th, tw, full_range, quarter,
                           use_upper, odd, resample), build)
    prev_words = state.get("block_tail_words")
    has_prev = prev_words is not None
    if not has_prev:
        prev_words = jnp.zeros((1, ph, tw), jnp.int32)
    padded_words, glyph_d, fg_d, bg_d, eq_d = fn(ys, us, vs, prev_words)
    glyph = np.asarray(glyph_d)
    fg = np.asarray(fg_d)
    bg = np.asarray(bg_d)
    eq = np.asarray(eq_d)  # [b] masks: eq[i] = frame i vs frame i-1/tail

    y0 = 1 if (odd and not use_upper) else 0  # blank row on top
    frames = [DeviceFrame(padded_words, i, th, tw, y0) for i in range(b)]
    padded_ph = [DeviceFrame(padded_words, i, ph, tw) for i in range(b)]
    prev_obj = state.get("block_tail_obj") if has_prev else None
    prevs = [prev_obj] + padded_ph[:-1]
    eqs = [eq[0] if has_prev else None] + list(eq[1:])
    for i, frame in enumerate(frames):
        BLOCK_PLANES.put(frame, (padded_ph[i], glyph[i], fg[i], bg[i],
                                 prevs[i], eqs[i]))
    state["block_tail_words"] = padded_words[-1:]
    state["block_tail_obj"] = padded_ph[-1]
    return frames


def prime_block_planes(frames: list, options,
                       sustained: bool = False) -> None:
    """If the session renders block modes (cell geometry 1x2 / 2x2),
    precompute glyph planes for a frame window in one device dispatch and
    park them for the canvas."""
    if not frames or options.cell_x_px > 2 or options.cell_y_px != 2:
        return
    from timg_tpu.ops.backend import prefer_host, use_numpy

    numpy_mode = prefer_host(len(frames), sustained) or use_numpy()
    use_upper = get_bool_env("TIMG_USE_UPPER_BLOCK")
    batch = pad_odd_height(np.stack(frames), use_upper)
    if options.cell_x_px == 2 and batch.shape[2] % 2:
        return  # odd width: let the canvas handle frame-by-frame
    if numpy_mode:
        from timg_tpu.ops import cpu_mirror
        fn = (cpu_mirror.quarter_blocks_np if options.cell_x_px == 2
              else cpu_mirror.half_blocks_np)
        glyph, fg, bg = fn(batch, use_upper_half_block=use_upper)
    else:
        from timg_tpu.ops import blocks as blocks_op
        from timg_tpu.parallel import auto
        fn = (blocks_op.quarter_blocks if options.cell_x_px == 2
              else blocks_op.half_blocks)
        sharded = auto.shard_batch_call(
            ("blocks", options.cell_x_px, use_upper),
            lambda b: fn(b, use_upper_half_block=use_upper), [batch])
        if sharded is not None:
            glyph, fg, bg = sharded
        else:
            glyph, fg, bg = fn(batch, use_upper_half_block=use_upper)
    glyph, fg, bg = np.asarray(glyph), np.asarray(fg), np.asarray(bg)

    # Diff masks between consecutive window frames (ops/diff.py on
    # device; plain numpy on the CPU path); the canvas uses them when
    # its previous frame is the window neighbor.
    eqs = [None]
    if len(frames) > 1:
        if numpy_mode:
            n = options.cell_x_px
            b, h2, w = batch.shape[:3]
            cells = batch.reshape(b, h2 // 2, 2, w // n, n, 4)
            eq_batch = np.all(cells[1:] == cells[:-1], axis=(2, 4, 5))
        else:
            from timg_tpu.ops.diff import window_cell_diff
            eq_batch = np.asarray(window_cell_diff(batch, options.cell_x_px))
        eqs += list(eq_batch)

    # One view object per row, shared between frame i's "padded" slot
    # and frame i+1's "prev" slot: the canvas validates the cached diff
    # mask with an identity check (`cached_prev is self._prev_padded`,
    # ansi.py), and numpy basic indexing creates a NEW view object each
    # time -- two separate `batch[i]` expressions would never compare
    # identical and the device-computed masks would be dead weight.
    views = [batch[i] for i in range(len(frames))]
    prev = [None] + views[:-1]
    for i, frame in enumerate(frames):
        BLOCK_PLANES.put(
            frame, (views[i], glyph[i], fg[i], bg[i], prev[i], eqs[i]))
