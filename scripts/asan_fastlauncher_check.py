#!/usr/bin/env python3
"""AddressSanitizer sweep for the pure-C one-shot launcher.

Everything timg_fast_main.cc parses is attacker-controlled: argv, env
values, scripted-terminal query responses, filelist contents and PNG
bytes.  This drives the ASan build (make -C timg_tpu/native fast-asan
-> timg_tpu/native/timg-fast-asan) over hostile variants of each
surface under a pty whose master feeds garbage/truncated/oversized
escape replies.  ASan reports abort the child with a distinctive exit;
clean runs must exit with a documented CLI code (0-5).

The binary's bail path execs ../../timg-tpu; the sweep sets
TIMG_FAST_ASAN_NO_FALLBACK is not needed -- instead argv0's directory
has no timg-tpu, so exec falls to python3 -S with no script and the
child exits 2 fast.  What matters here is the C parsing that runs
BEFORE any fallback.

Run:
    make -C timg_tpu/native fast-asan
    ASAN_OPTIONS=halt_on_error=1:detect_leaks=0 \\
    python scripts/asan_fastlauncher_check.py
Exit 0 = clean.
"""

import fcntl
import os
import pty
import random
import struct
import subprocess
import sys
import tempfile
import termios
import threading

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BIN = os.path.join(REPO, "timg_tpu", "native", "timg-fast-asan")
sys.path.insert(0, REPO)

OK_CODES = {0, 1, 2, 3, 4, 5}


def run_pty(args, responder, env=None, timeout=60):
    """Run the binary with std fds on a pty; master answers every read
    with responder(data) bytes.  Returns (exitcode, stderr_tail)."""
    master, slave = pty.openpty()
    fcntl.ioctl(slave, termios.TIOCSWINSZ,
                struct.pack("HHHH", 24, 80, 640, 384))

    captured = bytearray()

    def pump():
        try:
            while True:
                data = os.read(master, 4096)
                if not data:
                    return
                captured.extend(data)
                reply = responder(data)
                if reply:
                    os.write(master, reply)
        except OSError:
            return

    t = threading.Thread(target=pump, daemon=True)
    t.start()
    e = dict(env if env is not None else os.environ)
    e.setdefault("ASAN_OPTIONS", "halt_on_error=1:detect_leaks=0")
    try:
        r = subprocess.run([BIN, *args], stdin=slave, stdout=slave,
                           stderr=subprocess.PIPE, env=e, timeout=timeout)
        return r.returncode, r.stderr[-800:]
    finally:
        os.close(slave)
        os.close(master)


def check(rc, err, what):
    text = err.decode("latin-1", "replace")
    if "AddressSanitizer" in text or "runtime error" in text:
        print(f"ASAN REPORT in {what}:\n{text}")
        sys.exit(1)
    if rc not in OK_CODES and rc < 128:
        # exec-fallback children may exit 2 (no launcher script found
        # next to the asan binary); signals (>=128) indicate a crash.
        print(f"unexpected exit {rc} in {what}: {text[:200]}")
        sys.exit(1)
    if rc >= 128:
        print(f"CRASH (signal {rc - 128}) in {what}: {text[:400]}")
        sys.exit(1)


def main() -> int:
    if not os.path.exists(BIN):
        subprocess.run(["make", "-C",
                        os.path.join(REPO, "timg_tpu", "native"), "-s",
                        "fast-asan"], check=True, timeout=300)
    from tests.corpus import build_corpus
    corpus = build_corpus(os.path.join(tempfile.gettempdir(),
                                       "timg_tpu_corpus"))
    img = corpus["noise_64x48.png"]
    env = {k: v for k, v in os.environ.items()
           if not k.startswith("TIMG_")}
    env["TERM"] = "xterm-256color"
    rng = random.Random(7)

    # --- hostile terminal responses against every query path ---------
    hostile_replies = [
        b"",
        b"\033[",                                # truncated CSI
        b"\033[6;99999999999999999;3t",          # huge cell size
        b"\033[6;;t\033[6;1;1t",
        b"\033]11;rgb:" + b"f" * 4096 + b"\\",   # oversized component
        b"\033]11;rgb:1/2/3\033\\",
        b"\033P>|" + bytes(rng.randrange(256) for _ in range(512)) +
        b"\033\\\033[0n",
        b"\033[?" + b";4" * 2000 + b"c",         # giant DA1
        b"\033[0n" * 100,
        bytes(rng.randrange(1, 256) for _ in range(2048)),
        b"\033[>q\033]11;?" * 50,                # echo the queries back
    ]
    for i, reply in enumerate(hostile_replies):
        def responder(data, reply=reply):
            return reply
        # auto-detect (no -p) exercises CSI >q + DA1 + cell-size;
        # -b auto exercises OSC 11.
        rc, err = run_pty(["-g20x10", "--debug-no-frame-delay", img],
                          responder, env=env)
        check(rc, err, f"hostile tty #{i} (auto)")
        rc, err = run_pty(["-ps", "-g20x10", "-b", "auto",
                           "--debug-no-frame-delay", img],
                          responder, env=env)
        check(rc, err, f"hostile tty #{i} (sixel bg auto)")

    # --- hostile argv -------------------------------------------------
    hostile_argv = [
        ["-g" + "9" * 300 + "x" + "9" * 300, img],
        ["-p", "q" * 5000, img],
        ["--title=" + "%f" * 2000, "-g20x10", img],
        ["--pattern-size", "99999999", "-g20x10", "-pq", "-b", "black",
         img],
        ["-b", "rgb(" + "9" * 200 + ",1,2)", "-pq", "-g20x10", img],
        ["-b", "#" + "a" * 500, "-pq", "-g20x10", img],
        ["-w", "1e309", "-pq", "-g20x10", "-b", "black", img],
        ["-t", "-1e309", "-pq", "-g20x10", "-b", "black", img],
        ["--clear=" + "e" * 4000, "-pq", "-g20x10", img],
        ["--" + "a" * 3000, img],
        ["-" + "".join(rng.choice("pqbgowtcfFCWUEIav") for _ in
                       range(40)), img, img],
        [img] * 200 + ["-pq", "-g10x5", "-b", "black"],
        ["-pq", "-g20x10", "-b", "black", "\xff\xfe bad \x01 name.png"],
    ]
    for i, args in enumerate(hostile_argv):
        rc, err = run_pty(args, lambda d: b"", env=env)
        check(rc, err, f"hostile argv #{i}")

    # --- hostile filelists -------------------------------------------
    with tempfile.TemporaryDirectory() as td:
        lists = [
            b"\x00" * 1000,
            bytes(rng.randrange(256) for _ in range(4096)),
            (img + "\n").encode() * 500,
            b"/" * 4000 + b"\n",
            b"a\rb\rc\r",                      # CR-separated
            ("x" * 10000 + "\n").encode(),
        ]
        for i, content in enumerate(lists):
            p = os.path.join(td, f"l{i}")
            with open(p, "wb") as f:
                f.write(content)
            rc, err = run_pty(["-pq", "-g20x10", "-b", "black", "-f", p],
                              lambda d: b"", env=env)
            check(rc, err, f"hostile filelist #{i}")
            rc, err = run_pty(["-pq", "-g20x10", "-b", "black", "-F", p],
                              lambda d: b"", env=env)
            check(rc, err, f"hostile rel filelist #{i}")

    # --- hostile env values ------------------------------------------
    for name, val in [
        ("TIMG_PIXELATION", "\xff" * 100),
        ("TIMG_DEFAULT_TITLE", "%" * 5000),
        ("TIMG_FONT_WIDTH_CORRECT", "nan"),
        ("TIMG_FONT_WIDTH_CORRECT", "9" * 400),
        ("TIMG_SIXEL_NEWLINE_WORKAROUND", "-" + "9" * 100),
        ("TIMG_USE_UPPER_BLOCK", "\xffyes\xff"),
    ]:
        e = dict(env)
        e[name] = val
        args = ["-g20x10", "-b", "black", img]
        if name != "TIMG_PIXELATION":
            args.insert(0, "-pq")
        if name == "TIMG_DEFAULT_TITLE":
            args.append("--title")
        rc, err = run_pty(args, lambda d: b"", env=e)
        check(rc, err, f"hostile env {name}")

    # --- malformed JPEGs through the dlopen'd decoder ----------------
    try:
        import io
        import numpy as np
        from PIL import Image
        buf = io.BytesIO()
        arr = np.random.default_rng(4).integers(
            0, 256, (60, 80, 3), dtype=np.uint8)
        Image.fromarray(arr).save(buf, format="JPEG", quality=70)
        jdata = buf.getvalue()
    except ImportError:
        jdata = None
    if jdata:
        with tempfile.TemporaryDirectory() as td:
            jcases = [jdata[:k] for k in (4, 20, len(jdata) // 2,
                                          len(jdata) - 2)]
            for t in range(12):
                mut = bytearray(jdata)
                for pos in [rng.randrange(2, len(jdata))
                            for _ in range(10)]:
                    mut[pos] ^= 1 << rng.randrange(8)
                jcases.append(bytes(mut))
            jcases.append(jdata[:3] + b"\xe1\x7f\xff" + b"Exif\0\0" +
                          b"II*\0" + b"\xff" * 200)   # hostile EXIF
            jcases.append(jdata[:3] + b"\xe2\x00\x08MPF\0" + jdata[2:])
            for i, blob in enumerate(jcases):
                p = os.path.join(td, f"j{i}.jpg")
                with open(p, "wb") as f:
                    f.write(blob)
                rc, err = run_pty(["-pq", "-g20x10", "-b", "black", p],
                                  lambda d: b"", env=env)
                check(rc, err, f"malformed jpeg #{i}")

    # --- malformed GIFs through the spec decoder ---------------------
    try:
        import io as _io
        import numpy as _np
        from PIL import Image as _Image
        _buf = _io.BytesIO()
        _arr = _np.random.default_rng(6).integers(
            0, 64, (40, 50), dtype=_np.uint8)
        _im = _Image.fromarray(_arr, "P")
        _im.putpalette(bytes(range(192)))
        _im.save(_buf, format="GIF", transparency=3)
        gdata = _buf.getvalue()
        _buf2 = _io.BytesIO()
        _frames = [_Image.fromarray(_np.random.default_rng(s).integers(
            0, 256, (20, 26, 3), dtype=_np.uint8), "RGB")
            for s in range(4)]
        _frames[0].save(_buf2, format="GIF", save_all=True,
                        append_images=_frames[1:], duration=30,
                        disposal=2, loop=0)
        gadata = _buf2.getvalue()
    except ImportError:
        gdata = gadata = None
    if gdata:
        with tempfile.TemporaryDirectory() as td:
            gcases = [gdata[:k] for k in (6, 13, 20, len(gdata) // 2,
                                          len(gdata) - 1)]
            for t in range(14):
                mut = bytearray(gdata)
                for pos in [rng.randrange(6, len(gdata))
                            for _ in range(8)]:
                    mut[pos] ^= 1 << rng.randrange(8)
                gcases.append(bytes(mut))
            # hostile LZW: giant code sizes / truncated sub-blocks
            gcases.append(gdata[:13] + b"\x2c" + b"\x00" * 8 +
                          b"\x40\x00\x0c\xff" + b"\xff" * 64)
            gcases.append(b"GIF89a\xff\xff\xff\xff\x80\x00\x00" +
                          b"\x00" * 770)
            # animated stream mutations (disposal/extent/LZW hostility
            # through the multi-frame compositor)
            for t in range(10):
                mut = bytearray(gadata)
                for pos in [rng.randrange(6, len(gadata))
                            for _ in range(8)]:
                    mut[pos] ^= 1 << rng.randrange(8)
                gcases.append(bytes(mut))
            gcases.extend(gadata[:k] for k in (len(gadata) // 3,
                                               len(gadata) - 2))
            for i, blob in enumerate(gcases):
                p = os.path.join(td, f"g{i}.gif")
                with open(p, "wb") as f:
                    f.write(blob)
                # bounded: a mutation that still parses as an animation
                # would otherwise loop forever (reference semantics)
                rc, err = run_pty(["-pq", "-g20x10", "-b", "black",
                                   "--loops=2", "--debug-no-frame-delay",
                                   p],
                                  lambda d: b"", env=env)
                check(rc, err, f"malformed gif #{i}")

    # --- malformed BMPs through the spec decoder ---------------------
    try:
        import io as _io2
        import numpy as _np2
        from PIL import Image as _Image2
        _b = _io2.BytesIO()
        _Image2.fromarray(_np2.random.default_rng(5).integers(
            0, 256, (24, 36, 3), dtype=_np2.uint8), "RGB").save(
            _b, format="BMP")
        bdata = _b.getvalue()
    except ImportError:
        bdata = None
    if bdata:
        with tempfile.TemporaryDirectory() as td:
            bcases = [bdata[:k] for k in (2, 14, 54, len(bdata) - 3)]
            for t in range(10):
                mut = bytearray(bdata)
                for pos in [rng.randrange(2, len(bdata))
                            for _ in range(8)]:
                    mut[pos] ^= 1 << rng.randrange(8)
                bcases.append(bytes(mut))
            # hostile header fields: giant offsets/dims/colors_used
            bcases.append(b"BM" + b"\xff" * 60)
            # w*h >= 2^63 overflow-to-negative guard bypass (the r3
            # advisor repro): 2.5 KB file claiming a ~9-exapixel 8bpp
            # image whose w*h*4 wrapped malloc to a tiny allocation.
            import struct as _struct
            _hdr = (b"BM" + _struct.pack("<IHHI", 2500, 0, 0, 54 + 1024))
            _dib = _struct.pack(
                "<IiiHHIIiiII", 40,
                3037096712 - (1 << 32), 3036904291 - (1 << 32),
                1, 8, 0, 0, 0, 0, 256, 0)
            bcases.append(_hdr + _dib + bytes(1024) + bytes(1400))
            for i, blob in enumerate(bcases):
                p = os.path.join(td, f"b{i}.bmp")
                with open(p, "wb") as f:
                    f.write(blob)
                rc, err = run_pty(["-pq", "-g20x10", "-b", "black", p],
                                  lambda d: b"", env=env)
                check(rc, err, f"malformed bmp #{i}")

    # --- malformed PNGs through the launcher gate --------------------
    data = open(img, "rb").read()
    with tempfile.TemporaryDirectory() as td:
        cases = []
        for frac in (0.05, 0.3, 0.7, 0.97):
            cases.append(data[:int(len(data) * frac)])
        for _ in range(10):
            mut = bytearray(data)
            for pos in [rng.randrange(8, len(data)) for _ in range(12)]:
                mut[pos] ^= 1 << rng.randrange(8)
            cases.append(bytes(mut))
        cases.append(data[:8] + b"\x00" * 64)
        for i, blob in enumerate(cases):
            p = os.path.join(td, f"m{i}.png")
            with open(p, "wb") as f:
                f.write(blob)
            rc, err = run_pty(["-pq", "-g20x10", "-b", "black", p],
                              lambda d: b"", env=env)
            check(rc, err, f"malformed png #{i}")

    print("asan fastlauncher sweep: clean")
    return 0


if __name__ == "__main__":
    sys.exit(main())
