#!/usr/bin/env python3
"""AddressSanitizer sweep for the native helper's untrusted-input
parsers (SURVEY §5 sanitizer discipline; the reference never ran ASan
and our edge sweep found a real heap overflow in its canvas buffer
sizing, see ROADMAP "tiny-image-with-title").

Drives the C entry points that consume attacker-controlled bytes —
PNG decode, the libsixel quantizer, the sixel/ANSI assemblers, the
polyphase resize — over valid inputs, truncations, fixed-seed bit-flip
mutations and garbage, under an ASan build:

    make -C timg_tpu/native asan
    LD_PRELOAD=$(gcc -print-file-name=libasan.so) \\
    TIMG_NATIVE_LIB=$PWD/timg_tpu/native/libtimg_native_asan.so \\
    ASAN_OPTIONS=halt_on_error=1:detect_leaks=0 \\
    python scripts/asan_native_check.py

ASan reports abort the process; exit 0 = clean.
"""

import ctypes
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from timg_tpu.native import runtime  # noqa: E402


def _png_cases():
    from tests.corpus import build_corpus

    corpus = build_corpus(os.path.join(tempfile.gettempdir(),
                                       "timg_tpu_corpus"))
    rng = np.random.default_rng(99)
    cases = []
    for path in corpus.values():
        if not path.endswith(".png"):
            continue
        data = open(path, "rb").read()
        cases.append(data)
        for frac in (0.1, 0.3, 0.6, 0.9, 0.99):
            cases.append(data[:int(len(data) * frac)])
        for _ in range(6):  # bit-flip mutations past the magic
            mut = bytearray(data)
            for pos in rng.integers(8, len(data), 8):
                mut[pos] ^= 1 << int(rng.integers(0, 8))
            cases.append(bytes(mut))
    cases.append(b"")
    cases.append(b"\x89PNG\r\n\x1a\n")
    cases.append(b"\x89PNG\r\n\x1a\n"
                 + bytes(rng.integers(0, 256, 4096, dtype=np.uint8)))
    # absurd IHDR dims (bounded-allocation check)
    ihdr = (b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDR"
            + b"\x7f\xff\xff\xff\x7f\xff\xff\xff\x08\x06\x00\x00\x00"
            + b"\x00" * 4)
    cases.append(ihdr)
    return cases


def main() -> int:
    lib = runtime.load()
    if lib is None:
        print("native helper unavailable", file=sys.stderr)
        return 2

    n_ok = n_rej = 0
    for data in _png_cases():
        out = ctypes.c_void_p()
        w = ctypes.c_int()
        h = ctypes.c_int()
        flags = ctypes.c_int()
        rc = lib.timg_png_decode(data, len(data), ctypes.byref(out),
                                 ctypes.byref(w), ctypes.byref(h),
                                 ctypes.byref(flags))
        if rc == 0:
            n_ok += 1
            lib.timg_buf_free(out)
        else:
            n_rej += 1
    print(f"png decode: {n_ok} decoded, {n_rej} rejected, no ASan report")

    rng = np.random.default_rng(7)
    for (height, width) in ((1, 1), (1, 127), (127, 1), (6, 6), (37, 53),
                            (720, 2)):
        frame = np.ascontiguousarray(
            rng.integers(0, 256, (height, width, 4), dtype=np.uint8))
        res = runtime.libsixel_quant(frame)
        assert res is not None
        indices, palette = res
        from timg_tpu.render.sixel_render import encode_sixel_stream
        stream = encode_sixel_stream(indices, palette)
        assert stream.startswith(b"\033Pq")
        pal = runtime.libsixel_palette(frame)
        assert pal is not None
        table = runtime.libsixel_build_table(pal[0])
        idx2 = runtime.libsixel_apply_table(frame, table, pal[0], pal[1])
        assert idx2 is not None
    print("libsixel quant/assemble edge shapes: clean")

    # ANSI emitter on degenerate plane shapes.
    for (hc, wc) in ((1, 1), (1, 200), (200, 1)):
        glyph = np.ascontiguousarray(
            rng.integers(0, 9, (hc, wc), dtype=np.int32))
        fg = np.ascontiguousarray(
            rng.integers(0, 256, (hc, wc, 4), dtype=np.uint8))
        bg = np.ascontiguousarray(
            rng.integers(0, 256, (hc, wc, 4), dtype=np.uint8))
        cap = hc * (wc * 48 + 24) + 64
        buf = ctypes.create_string_buffer(cap)
        n = lib.timg_ansi_emit(glyph.ctypes.data, fg.ctypes.data,
                               bg.ctypes.data, None, hc, wc, 3, 0, buf)
        assert 0 <= n <= cap
    print("ansi emitter edge shapes: clean")
    return 0


if __name__ == "__main__":
    sys.exit(main())
