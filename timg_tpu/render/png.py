"""Fast PNG writer: fixed Sub filter + zlib via libdeflate.

Behavioral spec: ref src/timg-png.cc. Minimal writer: IHDR (8-bit,
color type 2/6), one IDAT compressed with libdeflate at the configured
level, filter type 1 (Sub) on every row with the first pixel raw.
libdeflate is loaded via ctypes (same library the reference links), so
the deflate byte stream matches the reference's at equal levels; python
zlib is the fallback.

The Sub-filter delta (cur - prev per row) is plain elementwise math and
can be produced device-side for large frames; assembly stays on host.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import struct
import threading
import zlib
from typing import Optional

import numpy as np

_libdeflate = None
_checked = False
_load_lock = threading.Lock()


def _load_libdeflate() -> Optional[ctypes.CDLL]:
    """Thread-safe one-time loader.  Kitty/iTerm2 animation frames
    compress concurrently in the pool; setting the checked flag before
    the handle is ready would make racing threads silently take the
    zlib fallback, whose deflate bytes differ from libdeflate's --
    frames of one animation would then mix compressors (caught by the
    kitty animation parity test vs the reference binary)."""
    global _libdeflate, _checked
    if _checked:
        return _libdeflate
    with _load_lock:
        if _checked:
            return _libdeflate
        name = ctypes.util.find_library("deflate") or "libdeflate.so.0"
        try:
            lib = ctypes.CDLL(name)
            lib.libdeflate_alloc_compressor.restype = ctypes.c_void_p
            lib.libdeflate_alloc_compressor.argtypes = [ctypes.c_int]
            lib.libdeflate_zlib_compress.restype = ctypes.c_size_t
            lib.libdeflate_zlib_compress.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
                ctypes.c_char_p, ctypes.c_size_t]
            lib.libdeflate_free_compressor.argtypes = [ctypes.c_void_p]
            lib.libdeflate_zlib_compress_bound.restype = ctypes.c_size_t
            lib.libdeflate_zlib_compress_bound.argtypes = [
                ctypes.c_void_p, ctypes.c_size_t]
            _libdeflate = lib
        except OSError:
            _libdeflate = None
        _checked = True
    return _libdeflate


def _zlib_compress(data: bytes, level: int) -> bytes:
    lib = _load_libdeflate()
    if lib is not None:
        comp = lib.libdeflate_alloc_compressor(level)
        if comp:
            try:
                bound = lib.libdeflate_zlib_compress_bound(comp, len(data))
                out = ctypes.create_string_buffer(bound)
                n = lib.libdeflate_zlib_compress(comp, data, len(data),
                                                 out, bound)
                if n:
                    return out.raw[:n]
            finally:
                lib.libdeflate_free_compressor(comp)
    return zlib.compress(data, min(max(level, 0), 9))


def _chunk(chunk_type: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(chunk_type + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + chunk_type + payload + \
        struct.pack(">I", crc)


def sub_filter_rows(frame: np.ndarray, with_alpha: bool) -> bytes:
    """Per-row: filter byte 1, first pixel raw, then cur-prev deltas
    (ref timg-png.cc:124-134). Note the reference copies 4 bytes for the
    first pixel but only advances 3 in RGB mode, so the alpha of pixel 0
    is overwritten by the next delta -- i.e. plain RGB of pixel 0."""
    h, w = frame.shape[:2]
    channels = 4 if with_alpha else 3

    from timg_tpu.native import runtime
    lib = runtime.load()
    if lib is not None and hasattr(lib, "timg_png_sub_filter") \
            and frame.shape[2] == 4:
        import ctypes
        src = np.ascontiguousarray(frame)
        out = ctypes.create_string_buffer(h * (1 + w * channels))
        lib.timg_png_sub_filter(src.ctypes.data, h, w, channels, out)
        return out.raw
    px = frame[..., :channels].astype(np.uint8)
    delta = px.copy()
    delta[:, 1:] = px[:, 1:] - px[:, :-1]  # uint8 wraparound == C behavior
    rows = np.concatenate(
        [np.full((h, 1), 1, dtype=np.uint8),
         delta.reshape(h, w * channels)], axis=1)
    return rows.tobytes()


def encode_png(frame: np.ndarray, compression_level: int = 1,
               with_alpha: bool = False) -> bytes:
    """frame: [H, W, 4] uint8 -> PNG bytes (ref timg-png.cc:90-152)."""
    h, w = frame.shape[:2]
    raw = sub_filter_rows(np.ascontiguousarray(frame), with_alpha)
    idat = _zlib_compress(raw, compression_level)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6 if with_alpha else 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", idat) + _chunk(b"IEND", b""))
