"""Fast PNG writer: fixed Sub filter + zlib via libdeflate.

Behavioral spec: ref src/timg-png.cc. Minimal writer: IHDR (8-bit,
color type 2/6), one IDAT compressed with libdeflate at the configured
level, filter type 1 (Sub) on every row with the first pixel raw.
libdeflate is loaded via ctypes (same library the reference links), so
the deflate byte stream matches the reference's at equal levels; python
zlib is the fallback.

The Sub-filter delta (cur - prev per row) is plain elementwise math and
can be produced device-side for large frames; assembly stays on host.

The numpy-free core (loader, compression, chunking) lives in
render/png_core.py, shared with the one-shot fastpath.
"""

from __future__ import annotations

import struct

import numpy as np

from timg_tpu.render.png_core import (chunk as _chunk,  # noqa: F401
                                      load_libdeflate as _load_libdeflate,
                                      zlib_compress as _zlib_compress)


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
