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
    PYTHONMALLOC=malloc \\
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

    # Video demux/decode + raw-plane transport on edge and corrupt
    # inputs (odd dims force the RGBA fallback; truncation/garbage
    # exercise open/decode error paths; rewind after EOF).
    if hasattr(lib, "timg_video_open"):
        d = tempfile.mkdtemp(prefix="vasan")

        def y4m(path, w, h, n, mangle=None):
            buf = bytearray(
                ("YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C420jpeg\n"
                 % (w, h)).encode())
            for _ in range(n):
                buf += b"FRAME\n"
                buf += rng.integers(0, 256, (h, w),
                                    dtype=np.uint8).tobytes()
                for _c in range(2):
                    buf += rng.integers(
                        0, 256, (max(h // 2, 1), max(w // 2, 1)),
                        dtype=np.uint8).tobytes()
            if mangle == "trunc":
                buf = buf[:len(buf) // 2]
            elif mangle == "flip":
                for pos in rng.integers(10, len(buf), 40):
                    buf[pos] ^= 0xFF
            open(path, "wb").write(bytes(buf))

        vids = []
        for i, (w, h, n, m) in enumerate(
                [(2, 2, 3, None), (64, 2, 4, None), (2, 64, 4, None),
                 (32, 24, 3, "trunc"), (32, 24, 3, "flip"),
                 (3, 3, 2, None)]):
            p = os.path.join(d, f"v{i}.y4m")
            y4m(p, w, h, n, m)
            vids.append(p)
        p = os.path.join(d, "g.y4m")
        open(p, "wb").write(b"YUV4MPEG2 " + bytes(
            rng.integers(0, 256, 500, dtype=np.uint8)))
        vids.append(p)

        # Hostile MP4/MKV containers (no encoder exists in this image,
        # so these are hand-built box/EBML structures + mutations: they
        # exercise avformat's probe/open/demux error paths; the
        # decode-side SPS-resize FSM needs a real H.264 stream and
        # stays covered by the unit suite's y4m cases only).
        import struct as _st

        def box(typ, payload=b""):
            return _st.pack(">I", 8 + len(payload)) + typ + payload

        ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2mp41")
        mp4s = [
            ftyp,                                     # header only
            ftyp + box(b"moov"),                      # empty moov
            ftyp + _st.pack(">I", 0xFFFFFFFF) + b"moov",   # absurd size
            ftyp + _st.pack(">I", 3) + b"moov",            # size < 8
            ftyp + box(b"moov", box(b"trak", box(b"mdia")) * 4),
            ftyp + box(b"mdat", bytes(64)) + box(b"moov", box(
                b"mvhd", bytes(100))),
            ftyp + _st.pack(">I", 1) + b"mdat"
            + _st.pack(">Q", 1 << 62),                # 64-bit size bomb
        ]
        ebml = b"\x1a\x45\xdf\xa3"
        mkvs = [
            ebml,                                     # magic only
            ebml + b"\x93\x42\x82\x88matroska",       # tiny header
            ebml + bytes(rng.integers(0, 256, 600, dtype=np.uint8)),
            b"\x1a\x45\xdf\xa3\x01\xff\xff\xff\xff\xff\xff\xff",  # vint bomb
        ]
        for i, blob in enumerate(mp4s):
            p = os.path.join(d, f"m{i}.mp4")
            open(p, "wb").write(blob)
            vids.append(p)
            mut = bytearray(blob)
            for pos in rng.integers(4, max(len(blob), 5),
                                    min(8, len(blob) - 4)):
                mut[pos] ^= 0xFF
            p2 = os.path.join(d, f"m{i}f.mp4")
            open(p2, "wb").write(bytes(mut))
            vids.append(p2)
        for i, blob in enumerate(mkvs):
            p = os.path.join(d, f"k{i}.mkv")
            open(p, "wb").write(blob)
            vids.append(p)

        for p in vids:
            handle = lib.timg_video_open(p.encode())
            if not handle:
                continue
            w = ctypes.c_int()
            h = ctypes.c_int()
            fps = ctypes.c_double()
            lib.timg_video_info(handle, ctypes.byref(w), ctypes.byref(h),
                                ctypes.byref(fps))
            wd, ht = w.value, h.value
            if 0 < wd < 10000 and 0 < ht < 10000:
                buf = ctypes.create_string_buffer(wd * ht * 4)
                yb = ctypes.create_string_buffer(wd * ht)
                cb = ctypes.create_string_buffer(
                    ((wd + 1) // 2) * ((ht + 1) // 2))
                db = ctypes.create_string_buffer(
                    ((wd + 1) // 2) * ((ht + 1) // 2))
                use_yuv = lib.timg_video_pix_info(handle) == 1
                errs = 0
                for _ in range(10):
                    rc = (lib.timg_video_read_frame_yuv(handle, yb, cb,
                                                        db, buf)
                          if use_yuv
                          else lib.timg_video_read_frame(handle, buf))
                    if rc == 0:
                        break
                    if rc < 0:
                        errs += 1
                        if errs > 3:
                            break
                lib.timg_video_rewind(handle)
                lib.timg_video_read_frame(handle, buf)
            lib.timg_video_close(handle)
        print("video edge/corrupt inputs: clean")

    # Run-records sixel assembler on hostile records (normally device-
    # produced; the C side must reject malformed structures, not walk
    # off the arena: non-monotonic x, x past w, counts over w).
    if hasattr(lib, "timg_sixel_encode_runs"):
        pal = np.ascontiguousarray(
            rng.integers(0, 256, (256, 3), dtype=np.uint8))
        for trial in range(60):
            h = int(rng.integers(1, 40))
            w = int(rng.integers(1, 50))
            nb = (h + 5) // 6
            counts = rng.integers(0, w + 3, nb).astype(np.int32)
            total = int(counts.sum())
            recs = np.ascontiguousarray(rng.integers(
                -2**31, 2**31, (max(total, 1), 2),
                dtype=np.int64).astype(np.int32))
            cap = nb * 256 * (w + 12) + 256 * 20 + 256
            buf = ctypes.create_string_buffer(cap)
            n = lib.timg_sixel_encode_runs(
                recs.ctypes.data, np.ascontiguousarray(counts).ctypes.data,
                h, w, pal.ctypes.data, 256, buf)
            assert n == -1 or 0 <= n <= cap
        # and well-formed records still assemble
        from timg_tpu.ops.sixel_runs import compact_runs_np
        plane = np.ascontiguousarray(
            rng.integers(0, 256, (37, 41), dtype=np.uint8))
        runs = compact_runs_np(plane, 37, 41)
        recs = np.ascontiguousarray(runs.records)
        bc = np.ascontiguousarray(runs.band_counts)
        cap = 7 * 256 * (41 + 12) + 256 * 20 + 256
        buf = ctypes.create_string_buffer(cap)
        n = lib.timg_sixel_encode_runs(recs.ctypes.data, bc.ctypes.data,
                                       37, 41, pal.ctypes.data, 256, buf)
        assert n > 0
        print("sixel run-records assembler hostile sweep: clean")

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
    rc = main()
    sys.stdout.flush()
    # Skip interpreter finalization: CPython shutdown under an ASan
    # preload false-positives (bad-free inside Py_FinalizeEx, pure
    # libpython frames — none of our code on the stack). Run with
    # PYTHONMALLOC=malloc so in-run allocations route through ASan.
    os._exit(rc)
