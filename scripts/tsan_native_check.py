#!/usr/bin/env python3
"""ThreadSanitizer smoke test for the native helper (SURVEY §5: run the
host-native code under TSan, which the reference never did).

Exercises the concurrency the CLI actually creates: multiple threads
encoding sixel streams and emitting ANSI concurrently (per-canvas
compression pools), plus concurrent independent video decoders (decode
fan-out). Build the lib with `make -C timg_tpu/native tsan` and run
with TIMG_NATIVE_LIB pointing at libtimg_native_tsan.so; TSan reports
go to stderr and make the process exit nonzero (halt_on_error=1
recommended via TSAN_OPTIONS).
"""

import ctypes
import os
import sys
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from timg_tpu.native import runtime  # noqa: E402


def main() -> int:
    lib = runtime.load()
    if lib is None:
        print("native helper unavailable", file=sys.stderr)
        return 2
    rng = np.random.default_rng(0)
    h, w = 60, 120
    errors = []

    def sixel_worker(seed):
        r = np.random.default_rng(seed)
        idx = np.ascontiguousarray(
            r.integers(0, 256, (h, w), dtype=np.uint8))
        pal = np.ascontiguousarray(
            r.integers(0, 256, (256, 3), dtype=np.uint8))
        buf = ctypes.create_string_buffer((h // 6 + 1) * 256 * (w + 12)
                                          + 256 * 20 + 256)
        for _ in range(50):
            n = lib.timg_sixel_encode(idx.ctypes.data, h, w, w,
                                      pal.ctypes.data, 256, buf)
            if n <= 0:
                errors.append("sixel encode failed")

    def video_worker(path):
        handle = lib.timg_video_open(path.encode())
        if not handle:
            errors.append("video open failed")
            return
        wv = ctypes.c_int()
        hv = ctypes.c_int()
        fps = ctypes.c_double()
        lib.timg_video_info(handle, ctypes.byref(wv), ctypes.byref(hv),
                            ctypes.byref(fps))
        frame = ctypes.create_string_buffer(wv.value * hv.value * 4)
        while lib.timg_video_read_frame(handle, frame) > 0:
            pass
        lib.timg_video_close(handle)

    # y4m fixture
    import tempfile
    path = os.path.join(tempfile.gettempdir(), "tsan_check.y4m")
    with open(path, "wb") as f:
        f.write(b"YUV4MPEG2 W64 H48 F25:1 Ip A1:1 C420jpeg\n")
        for i in range(5):
            f.write(b"FRAME\n")
            f.write(np.full((48, 64), 16 + i, np.uint8).tobytes())
            f.write(np.full((24, 32), 128, np.uint8).tobytes())
            f.write(np.full((24, 32), 128, np.uint8).tobytes())

    threads = [threading.Thread(target=sixel_worker, args=(s,))
               for s in range(4)]
    threads += [threading.Thread(target=video_worker, args=(path,))
                for _ in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    os.unlink(path)
    if errors:
        print("\n".join(errors), file=sys.stderr)
        return 1
    print("tsan smoke ok (check stderr for TSan reports)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
