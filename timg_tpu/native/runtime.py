"""ctypes loader for the native runtime (builds on first use)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
# Overridable for sanitizer builds (make tsan -> libtimg_native_tsan.so)
_SO = os.environ.get("TIMG_NATIVE_LIB",
                     os.path.join(_DIR, "libtimg_native.so"))
_lib: Optional[ctypes.CDLL] = None
_tried = False
_load_lock = threading.Lock()


def load() -> Optional[ctypes.CDLL]:
    """Load (building if necessary) the native library; None if unavailable.

    Thread-safe: concurrent first calls from encode-pool threads must
    not observe the tried flag before the handle is published (the
    fallbacks are byte-compatible, but a silent mixed-path run hides
    the fast path; same race class as png._load_libdeflate)."""
    global _lib, _tried
    if _tried:
        return _lib
    with _load_lock:
        return _load_locked()


def _load_locked() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    lib = _open_and_bind()
    # publish the handle BEFORE the tried flag: the unlocked fast path
    # in load() reads _tried without the lock, so flag-first ordering
    # would let a racing thread observe tried=True with a None handle
    _lib = lib
    _tried = True
    return _lib


def load_still() -> Optional[ctypes.CDLL]:
    """Load the libav-free still library (libtimg_still.so).

    The one-shot fastpath (fast.py) uses this: dlopen of the full
    runtime pulls libav's ~130-library dependency chain (~50 ms), which
    would dominate the interactive latency budget (BASELINE.md #1).
    Falls back to the full library when the still build is absent."""
    global _still_lib, _still_tried
    if _still_tried:
        return _still_lib if _still_lib is not None else load()
    with _load_lock:
        if not _still_tried:
            so = os.path.join(_DIR, "libtimg_still.so")
            lib = None
            if not os.path.exists(so) and "TIMG_NATIVE_LIB" not in os.environ:
                _make()
            if os.path.exists(so):
                try:
                    lib = _bind(ctypes.CDLL(so))
                except OSError:
                    lib = None
            _still_lib = lib
            _still_tried = True
    return _still_lib if _still_lib is not None else load()


_still_lib: Optional[ctypes.CDLL] = None
_still_tried = False


def _make() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR, "-s", "all"], check=True,
                       capture_output=True, timeout=180)
        return True
    except Exception:
        return False


def _open_and_bind() -> Optional[ctypes.CDLL]:
    if not os.path.exists(_SO):
        if "TIMG_NATIVE_LIB" in os.environ:
            # custom lib (e.g. the tsan build) must already exist;
            # building the default target would not produce it
            return None
        if not _make():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    return _bind(lib)


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    if hasattr(lib, "timg_video_open"):  # absent in libtimg_still.so
        lib.timg_video_open.restype = ctypes.c_void_p
        lib.timg_video_open.argtypes = [ctypes.c_char_p]
        lib.timg_video_info.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_double)]
        lib.timg_video_read_frame.restype = ctypes.c_int
        lib.timg_video_read_frame.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p]
        lib.timg_video_rewind.restype = ctypes.c_int
        lib.timg_video_rewind.argtypes = [ctypes.c_void_p]
        if hasattr(lib, "timg_video_read_frame_yuv"):  # older .so
            lib.timg_video_pix_info.restype = ctypes.c_int
            lib.timg_video_pix_info.argtypes = [ctypes.c_void_p]
            lib.timg_video_read_frame_yuv.restype = ctypes.c_int
            lib.timg_video_read_frame_yuv.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p,
                ctypes.c_char_p, ctypes.c_char_p]
        lib.timg_video_close.argtypes = [ctypes.c_void_p]
        lib.timg_video_version.restype = ctypes.c_char_p
        if hasattr(lib, "timg_video_read_frame_scaled"):  # older .so
            lib.timg_video_read_frame_scaled.restype = ctypes.c_int
            lib.timg_video_read_frame_scaled.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
                ctypes.c_int]
            lib.timg_sws_scale_rgba.restype = ctypes.c_int
            lib.timg_sws_scale_rgba.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_void_p]
            lib.timg_sws_scale_yuv420.restype = ctypes.c_int
            lib.timg_sws_scale_yuv420.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_void_p]
    lib.timg_ansi_emit.restype = ctypes.c_long
    lib.timg_ansi_emit.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p]
    lib.timg_sixel_encode.restype = ctypes.c_long
    lib.timg_sixel_encode.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_char_p]
    if hasattr(lib, "timg_sixel_encode_runs"):  # absent in older .so
        lib.timg_sixel_encode_runs.restype = ctypes.c_long
        lib.timg_sixel_encode_runs.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_char_p]
    if hasattr(lib, "timg_png_sub_filter"):  # absent in older .so
        lib.timg_png_sub_filter.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p]
    if hasattr(lib, "timg_resize_polyphase"):  # absent in older .so
        lib.timg_resize_polyphase.restype = ctypes.c_long
        lib.timg_resize_polyphase.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_int, ctypes.c_int]
    if hasattr(lib, "timg_libsixel_quant"):
        lib.timg_libsixel_quant.restype = ctypes.c_int
        lib.timg_libsixel_quant.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_long,
            ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p]
    if hasattr(lib, "timg_libsixel_palette"):  # absent in older .so
        lib.timg_libsixel_palette.restype = ctypes.c_int
        lib.timg_libsixel_palette.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_long,
            ctypes.c_int, ctypes.c_void_p]
        lib.timg_libsixel_build_table.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p]
        lib.timg_libsixel_apply_table.restype = ctypes.c_int
        lib.timg_libsixel_apply_table.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_long,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_void_p]
    if hasattr(lib, "timg_png_decode"):  # still pipeline (timg_still.cc)
        c_int_p = ctypes.POINTER(ctypes.c_int)
        lib.timg_png_decode.restype = ctypes.c_long
        lib.timg_png_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_void_p), c_int_p, c_int_p, c_int_p]
        lib.timg_buf_free.argtypes = [ctypes.c_void_p]
        lib.timg_calc_scale.restype = ctypes.c_int
        lib.timg_calc_scale.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            c_int_p, c_int_p]
        lib.timg_build_taps.restype = ctypes.c_int
        lib.timg_build_taps.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_void_p)]
        lib.timg_plan_passes.restype = ctypes.c_int
        lib.timg_plan_passes.argtypes = [ctypes.c_int] * 5
        lib.timg_has_translucency.restype = ctypes.c_long
        lib.timg_has_translucency.argtypes = [ctypes.c_void_p, ctypes.c_long]
        lib.timg_alpha_over_bg.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_char_p,
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int]
        for fn in (lib.timg_quarter_blocks, lib.timg_half_blocks):
            fn.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        lib.timg_resize_nearest.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int]
    return lib


def libsixel_quant(frame_rgba, reqcolors: int = 256):
    """libsixel-faithful per-frame quantization via the C helper.

    frame_rgba: [H, W, 4] (or [H, W, 3]) uint8.  Returns
    (indices [H, W] uint8, palette [ncolors, 3] uint8) or None when the
    native library is unavailable (callers fall back to the Python
    oracle in ops/libsixel_quant.py).
    """
    import numpy as np

    lib = load()
    if lib is None or not hasattr(lib, "timg_libsixel_quant"):
        return None
    frame = np.asarray(frame_rgba)
    h, w = frame.shape[:2]
    if frame.shape[2] == 3 or frame.strides[1] != 4:
        rgba = np.zeros((h, w, 4), dtype=np.uint8)
        rgba[..., : frame.shape[2]] = frame[..., :4]
        frame = rgba
    pitch = frame.strides[0]
    pal = np.zeros((reqcolors, 3), dtype=np.uint8)
    idx = np.zeros((h, w), dtype=np.uint8)
    rc = lib.timg_libsixel_quant(frame.ctypes.data, h, w, pitch,
                                 reqcolors, pal.ctypes.data,
                                 idx.ctypes.data)
    if rc < 0:
        return None
    ncolors = rc & 0xFFFF
    return idx, pal[:ncolors]


def libsixel_palette(frame_rgba, reqcolors: int = 256):
    """Per-frame libsixel palette (histogram + mediancut) via C.

    Returns (palette [ncolors,3] uint8, diffuse bool) or None when the
    native library is unavailable."""
    import numpy as np

    lib = load()
    if lib is None or not hasattr(lib, "timg_libsixel_palette"):
        return None
    frame = np.ascontiguousarray(frame_rgba, dtype=np.uint8)
    h, w = frame.shape[:2]
    if frame.shape[2] != 4:
        rgba = np.zeros((h, w, 4), dtype=np.uint8)
        rgba[..., :frame.shape[2]] = frame
        frame = rgba
    pal = np.zeros((reqcolors, 3), dtype=np.uint8)
    rc = lib.timg_libsixel_palette(frame.ctypes.data, h, w,
                                   frame.strides[0], reqcolors,
                                   pal.ctypes.data)
    if rc < 0:
        return None
    return pal[:rc & 0xFFFF], bool(rc >> 16)


def libsixel_build_table(palette):
    """32768-entry bucket -> nearest-palette-index table (see
    timg_native.cc:timg_libsixel_build_table)."""
    import numpy as np

    lib = load()
    if lib is None or not hasattr(lib, "timg_libsixel_build_table"):
        return None
    pal = np.ascontiguousarray(palette, dtype=np.uint8)
    table = np.empty(1 << 15, dtype=np.uint8)
    lib.timg_libsixel_build_table(pal.ctypes.data, len(pal),
                                  table.ctypes.data)
    return table


def libsixel_apply_table(frame_rgba, table, palette, diffuse: bool):
    """Bucket-table FS apply (strict CPU mirror of the device kernel).
    Returns [H, W] uint8 indices or None when unavailable."""
    import numpy as np

    lib = load()
    if lib is None or not hasattr(lib, "timg_libsixel_apply_table"):
        return None
    frame = np.ascontiguousarray(frame_rgba, dtype=np.uint8)
    h, w = frame.shape[:2]
    if frame.shape[2] != 4:
        rgba = np.zeros((h, w, 4), dtype=np.uint8)
        rgba[..., :frame.shape[2]] = frame
        frame = rgba
    table = np.ascontiguousarray(table, dtype=np.uint8)
    pal = np.ascontiguousarray(palette, dtype=np.uint8)
    idx = np.empty((h, w), dtype=np.uint8)
    rc = lib.timg_libsixel_apply_table(
        frame.ctypes.data, h, w, frame.strides[0], table.ctypes.data,
        pal.ctypes.data, int(diffuse), idx.ctypes.data)
    if rc != 0:
        return None
    return idx


def resize_polyphase(frames, out_h: int, out_w: int, starts_v, coeffs_v,
                     starts_h, coeffs_h, vertical_first: bool,
                     alpha_weighted: bool):
    """Native polyphase resize (bit-exact mirror of resize_np's numpy
    executor — see timg_native.cc:timg_resize_polyphase).  frames:
    [B, H, W, 4] uint8 contiguous.  Returns [B, out_h, out_w, 4] uint8
    or None when the native library is unavailable."""
    import numpy as np

    lib = load()
    if lib is None or not hasattr(lib, "timg_resize_polyphase"):
        return None
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    b, in_h, in_w, _ = frames.shape
    starts_v = np.ascontiguousarray(starts_v, dtype=np.int32)
    coeffs_v = np.ascontiguousarray(coeffs_v, dtype=np.float32)
    starts_h = np.ascontiguousarray(starts_h, dtype=np.int32)
    coeffs_h = np.ascontiguousarray(coeffs_h, dtype=np.float32)
    out = np.empty((b, out_h, out_w, 4), dtype=np.uint8)
    rc = lib.timg_resize_polyphase(
        frames.ctypes.data, b, in_h, in_w, out.ctypes.data, out_h, out_w,
        starts_v.ctypes.data, coeffs_v.ctypes.data, coeffs_v.shape[1],
        starts_h.ctypes.data, coeffs_h.ctypes.data, coeffs_h.shape[1],
        int(vertical_first), int(alpha_weighted))
    if rc != 0:
        return None
    return out


def sws_scale_rgba(rgba, out_h: int, out_w: int, bitexact: bool = False):
    """swscale SWS_BILINEAR RGBA resize through the real libswscale (the
    reference's SWS ImageScaler, ref image-scaler.cc:45-73). Returns
    [out_h, out_w, 4] uint8 or None when unavailable."""
    import numpy as np

    lib = load()
    if lib is None or not hasattr(lib, "timg_sws_scale_rgba"):
        return None
    rgba = np.ascontiguousarray(rgba, dtype=np.uint8)
    h, w = rgba.shape[:2]
    out = np.empty((out_h, out_w, 4), dtype=np.uint8)
    rc = lib.timg_sws_scale_rgba(rgba.ctypes.data, w, h, out_w, out_h,
                                 int(bitexact), out.ctypes.data)
    return out if rc == 0 else None


def sws_scale_yuv420(y, u, v, out_h: int, out_w: int, full_range: bool,
                     bitexact: bool = False):
    """swscale SWS_BILINEAR YUV420->RGBA scaled conversion in one call
    (the reference's video leg, ref video-source.cc:59-89 + :352-354).
    Returns [out_h, out_w, 4] uint8 or None when unavailable."""
    import numpy as np

    lib = load()
    if lib is None or not hasattr(lib, "timg_sws_scale_yuv420"):
        return None
    y = np.ascontiguousarray(y, dtype=np.uint8)
    u = np.ascontiguousarray(u, dtype=np.uint8)
    v = np.ascontiguousarray(v, dtype=np.uint8)
    h, w = y.shape
    out = np.empty((out_h, out_w, 4), dtype=np.uint8)
    rc = lib.timg_sws_scale_yuv420(
        y.ctypes.data, u.ctypes.data, v.ctypes.data, w, h,
        int(full_range), out_w, out_h, int(bitexact), out.ctypes.data)
    return out if rc == 0 else None


def describe() -> str:
    lib = load()
    if lib is None:
        return "unavailable"
    desc = lib.timg_video_version().decode() + "; ansi emitter"
    if hasattr(lib, "timg_video_device_capture_available"):
        # ref prints "; avdevice <version>" when built with it
        # (timg-print-version analog of video-source.cc:120-122)
        if lib.timg_video_device_capture_available():
            desc += "; avdevice (v4l2 capture)"
    return desc
