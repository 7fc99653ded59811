"""Pixel-direct protocol tests: iterm2 byte parity, kitty parity modulo
time-based image ids, sixel structural/roundtrip checks."""

from __future__ import annotations

import os
import re
import subprocess
import tempfile

import numpy as np
import pytest

from tests.conftest import REFERENCE_BINARY, has_reference
from tests.corpus import build_corpus
from tests.test_golden import CORPUS_DIR, run_ours, _CLEAN_ENV


@pytest.fixture(scope="session")
def corpus():
    return build_corpus(CORPUS_DIR)


needs_reference = pytest.mark.skipif(
    not has_reference(), reason="reference binary not built")


def _run_ref(args, files):
    with tempfile.NamedTemporaryFile(suffix=".out", delete=False) as tf:
        out = tf.name
    try:
        subprocess.run([REFERENCE_BINARY, *args, "-o", out, *files],
                       env=_CLEAN_ENV, capture_output=True, timeout=120)
        with open(out, "rb") as f:
            return f.read()
    finally:
        os.unlink(out)


# 80x24 cells, 640x384 px -> 8x16 px cells (a plausible terminal)
_PTY_WINSIZE = (24, 80, 640, 384)


def _with_scripted_pty(fn, answers, winsize=_PTY_WINSIZE):
    """Run fn(slave_fd) with a pty whose master answers escape queries:
    answers = {trigger_bytes: reply_bytes} (shared scaffolding for the
    reference-vs-ours parity tests below)."""
    import fcntl
    import pty
    import struct
    import termios
    import threading

    master, slave = pty.openpty()
    if winsize is not None:
        fcntl.ioctl(slave, termios.TIOCSWINSZ,
                    struct.pack("HHHH", *winsize))

    def pump():
        try:
            while True:
                data = os.read(master, 4096)
                if not data:
                    return
                for trigger, reply in answers.items():
                    if trigger in data:
                        os.write(master, reply)
        except OSError:
            return

    threading.Thread(target=pump, daemon=True).start()
    try:
        return fn(slave)
    finally:
        os.close(slave)
        os.close(master)


def _pty_ref(args, files, answers, tmp_path, winsize=_PTY_WINSIZE,
             env=None):
    """Reference binary under a scripted pty -> output bytes."""
    out_path = str(tmp_path / "ref.out")

    def run(slave):
        subprocess.run([REFERENCE_BINARY, *args, "-o", out_path, *files],
                       env=env or _CLEAN_ENV, stdin=slave, stdout=slave,
                       stderr=slave, timeout=120)
        with open(out_path, "rb") as f:
            return f.read()

    return _with_scripted_pty(run, answers, winsize)


def _pty_ours(args, files, answers, winsize=_PTY_WINSIZE):
    """Our CLI (in-process) with stdout on a scripted pty -> bytes."""

    def run(slave):
        saved = os.dup(1)
        try:
            os.dup2(slave, 1)
            return run_ours(args, files)
        finally:
            os.dup2(saved, 1)
            os.close(saved)

    return _with_scripted_pty(run, answers, winsize)


_KITTY_TTY = {b"\033[>q": b"\033P>|kitty(0.26.5)\033\\\033[0n",
              b"\033]11;?": b"\033]11;rgb:0000/0000/0000\033\\"}


@needs_reference
@pytest.mark.parametrize("image,extra", [
    ("noise_64x48.png", []),
    ("gradient_320x200.png", []),
    ("alpha_80x100.png", []),          # RGBA32 path (-b auto -> none)
    ("noise_512x512.png", ["--compress=6"]),
    ("noise_64x48.png", ["--compress=0"]),
    ("noise_64x48.png", ["--compress=9"]),
    ("noise_64x48.png", ["-b", "white"]),  # RGB24 path
])
def test_iterm2_bit_identical(corpus, image, extra):
    args = ["--debug-no-frame-delay", "-g40x20", "-pi", *extra]
    assert _run_ref(args, [corpus[image]]) == run_ours(args, [corpus[image]])


@needs_reference
@pytest.mark.parametrize("image", ["noise_64x48.png", "alpha_80x100.png"])
def test_kitty_identical_modulo_id(corpus, image):
    args = ["--debug-no-frame-delay", "-g40x20", "-pk"]
    ref = re.sub(rb"i=\d+", b"i=ID", _run_ref(args, [corpus[image]]))
    ours = re.sub(rb"i=\d+", b"i=ID", run_ours(args, [corpus[image]]))
    assert ref == ours


def test_kitty_animation_flipflop_ids():
    """Animations must reuse two alternating ids (ref kitty-canvas.cc:157-167).

    (The CLI clamps pixel modes to one frame without tty cell size, ref
    timg.cc:742-767, so this drives the canvas directly.)"""
    from timg_tpu.options import DisplayOptions
    from timg_tpu.render.kitty import KittyCanvas
    from timg_tpu.render.sequencer import SeqType

    sent = []

    class FakeSequencer:
        def write_buffer(self, block, seq_type, end_of_frame_ms=0.0):
            sent.append(block)

    opts = DisplayOptions()
    opts.cell_x_px, opts.cell_y_px = 8, 16
    canvas = KittyCanvas(FakeSequencer(), False, opts)
    frame = np.zeros((16, 16, 4), dtype=np.uint8)
    canvas.send(0, 0, frame, SeqType.START_OF_ANIMATION)
    for _ in range(3):
        canvas.send(0, -16, frame, SeqType.ANIMATION_FRAME)
    ids = [int(re.search(rb"Ga=T,i=(\d+)", b).group(1)) for b in sent]
    # ref :157-167: start uses id A (reserving A+1), frames alternate
    # A+1, A, A+1, ...
    assert ids == [ids[0], ids[0] + 1, ids[0], ids[0] + 1]


def test_sixel_roundtrip():
    from timg_tpu.ops.sixel import fs_dither, median_cut_palette
    from timg_tpu.render.sixel_render import (decode_sixel_stream,
                                              encode_sixel_stream)

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    pal = median_cut_palette(img)
    idx = fs_dither(img[None], pal)[0]
    stream = encode_sixel_stream(idx, pal)
    _, idx2, pal2 = decode_sixel_stream(stream)
    assert np.array_equal(idx2[:24, :40], idx)


def test_sixel_palette_few_colors():
    from timg_tpu.ops.sixel import median_cut_palette

    img = np.zeros((10, 10, 3), dtype=np.uint8)
    img[5:] = (255, 0, 0)
    pal = median_cut_palette(img)
    assert len(pal) == 2
    assert {tuple(c) for c in pal} == {(0, 0, 0), (255, 0, 0)}


def test_sixel_median_cut_dominant_colors():
    from timg_tpu.ops.sixel import median_cut_palette, nearest_indices
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    pal = median_cut_palette(img, 256)
    assert pal.shape == (256, 3)
    idx = np.asarray(nearest_indices(jnp.asarray(img), jnp.asarray(pal)))
    # quantization error should be modest for 256 colors
    err = np.abs(pal[idx].astype(int) - img.astype(int)).mean()
    assert err < 24, err


def test_fs_dither_device_matches_reference():
    """Wavefront kernel == scalar reference recurrence."""
    from timg_tpu.ops.sixel import (_fs_dither_impl, _palette_tables,
                                    fs_dither_reference, median_cut_palette)
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (20, 31, 3), dtype=np.uint8)
    pal = median_cut_palette(img, 64)
    want = fs_dither_reference(img, pal)
    pal_j, pal_sq = _palette_tables(pal)
    got = np.asarray(_fs_dither_impl(jnp.asarray(img[None]), pal_j, pal_sq,
                                     20, 31))[0]
    # identical up to float tie-breaks in the distance computation
    agree = (got == want).mean()
    assert agree > 0.99, agree


def test_sixel_cli_runs(corpus):
    out = run_ours(["--debug-no-frame-delay", "-g40x20", "-ps", "-b", "black"],
                   [corpus["noise_64x48.png"]])
    assert out.startswith(b"\033[?25l")
    assert b"\033P" in out and b"\033\\" in out


@pytest.mark.parametrize("dither", ["adaptive", "cube"])
def test_gif_sixel_primed_batch_identical(tmp_path, dither):
    """Animated-image sixel windows primed at load time must render
    byte-identically to the per-frame canvas path."""
    from PIL import Image

    from timg_tpu.options import DisplayOptions, SixelOptions
    from timg_tpu.render.sixel_render import SixelCanvas
    from timg_tpu.sources.pil_source import PILSource

    rng = np.random.default_rng(3)
    frames = [Image.fromarray(
        rng.integers(0, 256, (40, 52, 3), dtype=np.uint8), "RGB")
        for _ in range(5)]
    path = str(tmp_path / "anim.gif")
    frames[0].save(path, save_all=True, append_images=frames[1:],
                   duration=40, loop=0)

    def run(batched):
        sent = []

        class FakeSequencer:
            def write_buffer(self, block, seq_type, end_of_frame_ms=0.0):
                sent.append(block)

        opts = DisplayOptions()
        opts.width, opts.height = 48, 36
        opts.cell_x_px, opts.cell_y_px = 8, 16
        opts.bgcolor_getter = lambda: (0, 0, 0, 255)
        if batched:
            opts.sixel_batch_dither = dither
        src = PILSource(path)
        assert src.load_and_scale(opts, 0, -1)
        canvas = SixelCanvas(FakeSequencer(), SixelOptions(),
                             opts, dither=dither)
        src.send_frames(float("inf"), 1, lambda: False,
                        lambda dx, dy, fb, seq, t: canvas.send(
                            dx, dy, fb, seq, t))
        return sent

    plain = run(batched=False)
    primed = run(batched=True)
    assert len(plain) == len(primed) == 5
    assert plain == primed


def test_c_sixel_assembler_matches_python_spec():
    """The C stream assembler must be byte-identical to the Python
    spec implementation across palette sizes and content shapes
    (random noise = RLE worst case, flat runs, sparse colors)."""
    from timg_tpu.native import runtime
    from timg_tpu.render.sixel_render import (encode_sixel_stream,
                                              encode_sixel_stream_py)

    if runtime.load() is None:
        pytest.skip("native helper unavailable")
    rng = np.random.default_rng(8)
    cases = []
    for (h, w, ncol) in [(13, 37, 256), (24, 64, 16), (30, 41, 255),
                         (6, 8, 2), (61, 100, 256)]:
        idx = rng.integers(0, ncol, (h, w)).astype(np.int32)
        cases.append((idx, rng.integers(0, 256, (ncol, 3),
                                        dtype=np.uint8)))
    flat = np.zeros((18, 50), np.int32)
    flat[6:12] = 3
    cases.append((flat, rng.integers(0, 256, (8, 3), dtype=np.uint8)))
    for idx, pal in cases:
        c_bytes = encode_sixel_stream(idx, pal)
        py_bytes = encode_sixel_stream_py(idx, pal)
        assert c_bytes == py_bytes, (idx.shape, len(pal))


def test_c_sixel_assembler_pitched_view():
    """A strided row view (padded device plane) must assemble
    byte-identically to a contiguous copy -- the C assembler consumes
    the row pitch directly, no repack."""
    from timg_tpu.native import runtime
    from timg_tpu.render.sixel_render import encode_sixel_stream

    if runtime.load() is None:
        pytest.skip("native helper unavailable")
    rng = np.random.default_rng(9)
    full = rng.integers(0, 256, (2, 128, 256), dtype=np.uint8)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    view = full[1, :30, :41]            # pitch 256 != width 41
    assert view.strides[0] == 256 and not view.flags["C_CONTIGUOUS"]
    got = encode_sixel_stream(view, pal)
    want = encode_sixel_stream(np.ascontiguousarray(view), pal)
    assert got == want


def test_kitty_tmux_passthrough_and_placeholders():
    """Kitty through tmux: passthrough-wrapped graphics (doubled ESC
    inside \\ePtmux; ...\\e\\\\) + unicode placeholder tiles carrying
    the image id in SGR and row/col diacritics
    (ref kitty-canvas.cc:55-111, 260-344)."""
    from timg_tpu.options import DisplayOptions
    from timg_tpu.render.kitty import _ROWCOL, KittyCanvas
    from timg_tpu.render.sequencer import SeqType

    sent = []

    class FakeSequencer:
        def write_buffer(self, block, seq_type, end_of_frame_ms=0.0):
            sent.append(block)

    opts = DisplayOptions()
    opts.cell_x_px, opts.cell_y_px = 8, 16
    canvas = KittyCanvas(FakeSequencer(), tmux_passthrough_needed=True,
                         options=opts)
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, (32, 40, 4), dtype=np.uint8)
    frame[..., 3] = 255
    canvas.send(0, 0, frame, SeqType.FRAME_IMMEDIATE)
    out = sent[-1]
    if hasattr(out, "result"):
        out = out.result()

    assert out.count(b"\033Ptmux;") >= 1
    # doubled ESC for the wrapped APC introducer + terminator
    assert b"\033\033_Ga=T," in out
    assert b"\033\033\\" in out
    assert b",U=1,c=5,r=2" in out          # 40/8 cols, 32/16 rows
    # placeholder block: U+10EEEE tiles (the kitty spec placeholder;
    # the reference emits these bytes too, kitty-canvas.cc:69) with
    # row 0 / col 0 diacritics
    tile0 = ("\U0010EEEE" + chr(_ROWCOL[0]) + chr(_ROWCOL[0])).encode()
    assert tile0 in out
    # image id rides in the 38:2:r:g:b SGR before the tiles
    import re
    m = re.search(rb"\033\[38:2:(\d+):(\d+):(\d+)m", out)
    assert m is not None
    ident = (int(m.group(1)) << 16) | (int(m.group(2)) << 8) \
        | int(m.group(3))
    assert b"i=%d," % ident in out or b"i=%d;" % ident in out \
        or (b"a=T,i=" in out)


def test_kitty_tmux_passthrough_end_to_end(tmp_path, monkeypatch):
    """Full CLI drive under a stubbed tmux: the passthrough enable
    command runs (`tmux set -p allow-passthrough on`, ref
    kitty-canvas.cc:83-111) and the output stream is \\ePtmux;-wrapped
    with unicode-placeholder tiles."""
    import os
    import subprocess

    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(4)
    png = tmp_path / "img.png"
    Image.fromarray(rng.integers(0, 255, (32, 48, 3),
                                 dtype=np.uint8)).save(png)

    log = tmp_path / "tmux_calls.log"
    stub = tmp_path / "tmux"
    stub.write_text("#!/bin/sh\necho \"$@\" >> %s\nexit 0\n" % log)
    stub.chmod(0o755)
    monkeypatch.setenv("PATH", f"{tmp_path}:{os.environ['PATH']}")
    monkeypatch.setenv("TMUX", "/tmp/fake-sock,1,0")
    monkeypatch.setenv("TERM", "tmux-256color")

    from tests.test_golden import run_ours

    out = run_ours(["-pk", "-g40x20", "-b", "black",
                    "--debug-no-frame-delay"], [str(png)])
    assert b"\033Ptmux;" in out
    # placeholder tiles: the row/column diacritic rendering emits the
    # U+10EEEE placeholder char for every cell
    assert "\U0010EEEE".encode() in out
    assert log.exists()
    assert "set -p allow-passthrough on" in log.read_text()


@needs_reference
def test_kitty_tmux_placeholders_match_reference(corpus, tmp_path,
                                                 monkeypatch):
    """tmux-mode kitty output vs the reference binary, modulo the
    time-seeded image id.  The reference learns about tmux only from
    the CSI >q response (term-query.cc:308), so it runs under a
    scripted pty that answers the version query with a tmux string;
    ours detects the same via the TMUX env.  The id rides in three
    places: the i= field, the SGR 38:2:r:g:b foreground carrying its
    low 3 bytes, and an optional per-tile diacritic carrying the top
    byte -- all normalized on both sides.  This is the test class that
    catches placeholder-codepoint mistakes (the spec char is U+10EEEE;
    the reference's comment says otherwise but its bytes agree)."""
    stub = tmp_path / "tmux"
    stub.write_text("#!/bin/sh\nexit 0\n")
    stub.chmod(0o755)

    args = ["--debug-no-frame-delay", "-g40x20", "-pk", "-b", "black"]
    files = [corpus["noise_64x48.png"]]
    answers = {b"\033[>q": b"\033P>|tmux 3.3a\033\\\033[0n"}

    env = {**_CLEAN_ENV,
           "PATH": f"{tmp_path}:{os.environ.get('PATH', '')}"}
    env.pop("TMUX", None)
    ref = _pty_ref(args, files, answers, tmp_path, winsize=None, env=env)
    assert b"Ptmux;" in ref, "reference did not enter tmux mode"

    monkeypatch.setenv("PATH", f"{tmp_path}:{os.environ.get('PATH', '')}")
    monkeypatch.setenv("TMUX", "/tmp/fake-sock,1,0")
    monkeypatch.setenv("TERM", "tmux-256color")
    ours = run_ours(args, files)

    def norm(raw: bytes) -> str:
        s = raw.decode("utf-8", errors="replace")
        s = re.sub(r"i=\d+", "i=ID", s)
        s = re.sub(r"\x1b\[38:2:\d+:\d+:\d+m", "\x1b[38:2:IDm", s)
        # tile = placeholder + row + col (+ msb diacritic): drop the
        # id-dependent third diacritic, keep row/col
        return re.sub("(\U0010EEEE..)(.)?", r"\1", s)

    assert norm(ref) == norm(ours)


@needs_reference
def test_bg_auto_matches_reference_via_pty(corpus, tmp_path):
    """`-b auto` asks the terminal for its background (OSC 11, ref
    term-query.cc:165-224) and composes transparent pixels on the
    answer.  Both the reference binary and our CLI run under a
    scripted pty answering rgb:8000/4000/c000; the quarter-block
    streams must be byte-identical."""
    args = ["--debug-no-frame-delay", "-g40x20", "-pq", "-b", "auto"]
    files = [corpus["alpha_80x100.png"]]
    answers = {b"\033]11;?": b"\033]11;rgb:8000/4000/c000\033\\",
               b"\033[>q": b"\033[0n"}

    ref = _pty_ref(args, files, answers, tmp_path, winsize=None)
    ours = _pty_ours(args, files, answers, winsize=None)
    assert b"\033[38;2;" in ref  # sanity: SGR colors present
    assert ref == ours


@needs_reference
@pytest.mark.parametrize("term_answer,norm_id", [
    (b"\033P>|kitty(0.26.5)\033\\\033[0n", True),    # auto -> kitty
    (b"\033P>|ghostty 1.0.1\033\\\033[0n", True),    # auto -> kitty
    (b"\033P>|iTerm2 3.4.19\033\\\033[0n", False),   # auto -> iterm2
    (b"\033P>|Konsole 22.12.3\033\\\033[0n", False),  # auto -> iterm2
    (b"\033P>|WezTerm 20230712\033\\\033[0n", False),  # auto -> iterm2
    # WindowsTerminal: sixel quirks flagged but no protocol; the DA1
    # probe (answered without ';4') leaves it at quarter blocks
    (b"\033P>|WindowsTerminal 1.22\033\\\033[0n", False),
    (b"\033[0n", False),                             # unknown -> quarter
])
def test_auto_pixelation_sieve_matches_reference(corpus, tmp_path,
                                                 term_answer, norm_id):
    """The full startup sieve with NO -g / NO -p (ref timg.cc:726-854):
    terminal size from the pty winsize (incl. pixel dims -> cell
    geometry + width stretch), graphics protocol auto-detection from
    the scripted CSI >q answer (response table of ref
    term-query.cc:277-318), geometry default rows-2.  Both binaries
    see the same scripted terminal; streams must match (modulo the
    time-seeded kitty image id)."""
    args = ["--debug-no-frame-delay", "-b", "black"]
    files = [corpus["gradient_320x200.png"]]
    answers = {b"\033[>q": term_answer,
               b"\033[c": b"\033[?61;22c",  # DA1 probe: no sixel cap
               b"\033]11;?": b"\033]11;rgb:0000/0000/0000\033\\"}

    ref = _pty_ref(args, files, answers, tmp_path)
    ours = _pty_ours(args, files, answers)
    if norm_id:
        ref = re.sub(rb"i=\d+", b"i=ID", ref)
        ours = re.sub(rb"i=\d+", b"i=ID", ours)
    assert ref == ours


@pytest.mark.parametrize("term_answer,expect_after", [
    # foot: sixel + broken-cursor quirk -> '\n' frame terminator
    (b"\033P>|foot(1.16.2)\033\\\033[0n", b"\n"),
    # mlterm: sixel, default cursor placement -> '\r'
    (b"\033P>|mlterm 3.9.3\033\\\033[0n", b"\r"),
])
def test_auto_sieve_sixel_terminals(corpus, term_answer, expect_after):
    """foot/mlterm answer sets drive the auto-sieve to sixel with the
    per-terminal cursor quirk (ref term-query.cc:296-305; quirk use
    ref sixel-canvas.cc:66-79).  Ours-only: the minimal reference
    build has no sixel canvas and falls back to quarter blocks there
    (ref timg.cc:783-788 #else branch), a capability difference, so
    byte parity is asserted for the shared subset above instead."""
    args = ["--debug-no-frame-delay", "-b", "black"]
    files = [corpus["noise_64x48.png"]]
    answers = {b"\033[>q": term_answer,
               b"\033]11;?": b"\033]11;rgb:0000/0000/0000\033\\"}

    out = _pty_ours(args, files, answers)
    assert out.count(b"\033Pq") == 1          # sixel DCS stream
    assert b"\033\\" + expect_after in out    # quirk-selected terminator


@needs_reference
@pytest.mark.parametrize("extra_args,image", [
    (["--loops=1"], "anim_32x24.gif"),        # animation: flip-flop ids
    (["--grid=2x1", "--title"], "noise_64x48.png"),  # grid + titles
])
def test_kitty_flows_match_reference(corpus, tmp_path, extra_args, image):
    """Kitty animation (two alternating ids, cursor repositioning
    between frames, ref kitty-canvas.cc:143-172) and kitty grid+title
    layout vs the reference binary under the same scripted kitty
    terminal, modulo the time-seeded ids."""
    args = ["--debug-no-frame-delay", "-b", "black", *extra_args]
    files = [corpus[image], corpus[image]] if "grid" in extra_args[0] \
        else [corpus[image]]

    ref = _pty_ref(args, files, _KITTY_TTY, tmp_path)
    ours = _pty_ours(args, files, _KITTY_TTY)

    def norm(raw):
        # normalize ids but keep their equality structure (flip-flop
        # animations must alternate between exactly two ids)
        ids = {}

        def sub(m):
            v = m.group(1)
            ids.setdefault(v, b"ID%d" % len(ids))
            return b"i=" + ids[v]

        return re.sub(rb"i=(\d+)", sub, raw)

    assert norm(ref) == norm(ours)


@needs_reference
def test_cell_size_fallback_query_matches_reference(corpus, tmp_path):
    """Winsize reports 0x0 pixels -> both sides fall back to the
    CSI 16t cell-size query (ref term-query.cc:347-366,399) before the
    auto sieve; with the scripted 8x16 answer the kitty streams must
    match byte-for-byte (modulo id)."""
    args = ["--debug-no-frame-delay", "-b", "black"]
    files = [corpus["gradient_320x200.png"]]
    answers = {**_KITTY_TTY, b"\033[16t": b"\033[6;16;8t"}

    # pixel dims ZERO: forces the CSI 16t fallback
    winsize = (24, 80, 0, 0)
    ref = _pty_ref(args, files, answers, tmp_path, winsize=winsize)
    ours = _pty_ours(args, files, answers, winsize=winsize)
    ref = re.sub(rb"i=\d+", b"i=ID", ref)
    ours = re.sub(rb"i=\d+", b"i=ID", ours)
    assert ref and ref == ours
