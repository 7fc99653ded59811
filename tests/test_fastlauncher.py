"""Parity suite for the pure-C one-shot launcher (timg-tpu-fast).

The binary (timg_tpu/native/timg_fast_main.cc) must be *observationally
identical* to the python launcher (./timg-tpu) for EVERY invocation:
inside its envelope it renders natively and must byte-match; outside it
execs ./timg-tpu, so equality holds by construction.  These tests
compare (output bytes, stderr, exit code) across both launchers over
the same matrices test_fastpath_cli.py uses for fast-vs-full, plus the
terminal auto-detection path under scripted ptys (the riskiest mirror:
timg_fast_main.cc reimplements term.py's query engine in C).
"""

from __future__ import annotations

import os
import re
import random
import subprocess
import sys

import pytest

from tests.corpus import build_corpus

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BINARY = os.path.join(REPO, "timg-tpu-fast")
PY_LAUNCHER = os.path.join(REPO, "timg-tpu")

_CLEAN_ENV = {k: v for k, v in os.environ.items()
              if not k.startswith("TIMG_")}
_CLEAN_ENV.pop("TERM_PROGRAM", None)
_CLEAN_ENV["TERM"] = "xterm-256color"


@pytest.fixture(scope="module")
def binary():
    r = subprocess.run(["make", "-C",
                        os.path.join(REPO, "timg_tpu", "native"), "-s",
                        "fast"], capture_output=True, timeout=300)
    if r.returncode != 0 or not os.path.exists(BINARY):
        pytest.skip("cannot build timg-tpu-fast: %s" %
                    r.stderr.decode()[-200:])
    return BINARY


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    return build_corpus(str(tmp_path_factory.mktemp("corpus")))


def _norm(data: bytes) -> bytes:
    # kitty image ids are time-seeded (ref kitty-canvas.cc:48-53);
    # compare modulo id like the reference-parity kitty tests.
    return re.sub(rb"i=\d+", b"i=ID", data)


def _norm_err(err: bytes) -> bytes:
    # library log lines carry timestamps (jax's axon platform warning);
    # drop them -- the CLI's own stderr has none.
    return b"\n".join(l for l in err.splitlines()
                      if b"WARNING:" not in l and b"INFO:" not in l)


def _both(binary, args, files, tmp_path, env=None):
    env = dict(env or _CLEAN_ENV)
    out_c = str(tmp_path / "c.out")
    out_py = str(tmp_path / "py.out")
    rc = subprocess.run([binary, *args, "-o", out_c, *files], env=env,
                        capture_output=True, timeout=600)
    rp = subprocess.run([PY_LAUNCHER, *args, "-o", out_py, *files],
                        env=env, capture_output=True, timeout=600)
    bc = open(out_c, "rb").read() if os.path.exists(out_c) else b""
    bp = open(out_py, "rb").read() if os.path.exists(out_py) else b""
    return (rc.returncode, _norm(bc), _norm_err(rc.stderr)), \
           (rp.returncode, _norm(bp), _norm_err(rp.stderr))


# ---------------------------------------------------------------------
# In-envelope matrix: every mode and the block-path option surface.
# ---------------------------------------------------------------------
MATRIX = [
    ["-pq", "-g80x24", "--debug-no-frame-delay", "-b", "black"],
    ["-ph", "-g40x20", "-b", "#336699"],
    ["-pq", "-g40x20", "-b", "teal", "--color8"],
    ["-pq", "-g40x20", "-b", "none"],
    ["-pq", "-g40x20", "-b", "rgb(10, 20, 30)"],
    ["-pq", "-g40x20", "-b", "rgb(0x80,0x10,0xff)"],
    ["-pq", "-g40x20", "-a", "-W", "-U"],
    ["-pq", "-g40x20", "--upscale=i", "-b", "black"],
    ["-pq", "-g40x20", "-b", "black", "--title", "-C"],
    ["-pq", "-g40x20", "-b", "black", "--title=%b %wx%h (%D)"],
    ["-pq", "-g40x20", "-b", "black", "--title", "--title", "--title"],
    ["-ph", "-g40x20", "-B", "gray", "--pattern-size", "2"],
    ["-pq", "-g40x20", "-b", "black", "--clear"],
    ["-pq", "-g40x20", "-b", "black", "--clear=every"],
    ["-pq", "-g40x20", "-b", "black", "-E"],
    ["-pq", "-g40x20", "-b", "black", "-t", "0"],
    ["-pq", "-g40x20", "-b", "black", "--rotate", "off"],
    ["-ps", "-g40x20", "-b", "black"],
    ["-ps", "-g40x20", "-b", "none"],
    ["-pi", "-g40x20"],
    ["-pi", "-g40x20", "-b", "white", "--compress=6"],
    ["-pk", "-g40x20"],
    ["-pk", "-g40x20", "-b", "black", "--compress=0"],
    ["-pq", "-g39x19", "-b", "black", "-C"],   # odd geometry + center
]


@pytest.mark.parametrize("flags", MATRIX,
                         ids=[" ".join(m) for m in MATRIX])
def test_matrix_matches_python_launcher(binary, corpus, flags, tmp_path):
    files = [corpus["noise_512x512.png"], corpus["alpha_80x100.png"]]
    c, py = _both(binary, flags, files, tmp_path)
    assert c == py


def test_multifile_and_missing(binary, corpus, tmp_path):
    files = ["/nonexistent.png", corpus["noise_64x48.png"], "/tmp",
             corpus["gradient_320x200.png"]]
    c, py = _both(binary, ["-pq", "-g40x20", "-b", "black"], files,
                  tmp_path)
    assert c == py
    assert c[0] == 1


def test_error_paths(binary, corpus, tmp_path):
    img = corpus["noise_64x48.png"]
    for args, files in [
        (["-pq", "-g40x20"], []),             # no files -> exit 1
        (["-pq", "-gbogus"], [img]),          # invalid size -> exit 2
        (["-pq", "-g40x20", "--clear=x"], [img]),   # exit 2
        (["-pq", "-g40x20", "--rotate=x"], [img]),  # exit 2
        (["-pq", "-g0x0"], [img]),            # unusual size -> exit 3
        (["-pq", "-g", "-W"], [img]),   # argparse "expected one argument"
        (["-pq", "-g40x20", "-b"], [img]),          # same, at argv end
        (["-pq", "-g40x20", "-w", "-1", "-b", "black"], [img]),  # neg value
        (["-pq", "-g40x20", "--center=x", "-b", "black"], [img]),
        (["-pq", "-g40x20", "--color8=1", "-b", "black"], [img]),
    ]:
        c, py = _both(binary, args, files, tmp_path)
        assert c == py, (args, c, py)


def test_filelist_inputs(binary, corpus, tmp_path):
    img = corpus["noise_64x48.png"]
    listing = tmp_path / "list.txt"
    listing.write_text(os.path.basename(img) + "\n\n" +
                       corpus["gradient_320x200.png"] + "\n")
    # -F resolves relative entries against the filelist's directory --
    # build one that lives next to the image.
    rel_listing = os.path.join(os.path.dirname(img), "rel.lst")
    with open(rel_listing, "w") as f:
        f.write(os.path.basename(img) + "\n")
    try:
        c, py = _both(binary,
                      ["-pq", "-g40x20", "-b", "black", "-F", rel_listing],
                      [], tmp_path)
        assert c == py
        c, py = _both(binary,
                      ["-pq", "-g40x20", "-b", "black", "-f",
                       "/nonexistent.lst"], [], tmp_path)
        assert c == py
        assert c[0] == 5
    finally:
        os.unlink(rel_listing)


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    """JPEG envelope corpus: baseline/progressive/grayscale/quality
    variants, a draft-triggering large image, EXIF orientation 1 and 6,
    CMYK -- the C decoder must byte-match PIL (it dlopens Pillow's own
    bundled libjpeg) or bail (orientation != 1, CMYK, MPO)."""
    import numpy as np
    from PIL import Image

    tmp = tmp_path_factory.mktemp("jpegs")
    rng = np.random.default_rng(2)
    smooth = (np.linspace(0, 255, 640)[None, :, None] *
              np.ones((480, 1, 3))).astype(np.uint8)
    noise = rng.integers(0, 256, (120, 160, 3), dtype=np.uint8)
    out = {}

    def mk(name, img, **kw):
        p = str(tmp / name)
        img.save(p, **kw)
        out[name] = p

    mk("smooth_q85.jpg", Image.fromarray(smooth), quality=85)
    mk("noise_q50.jpg", Image.fromarray(noise), quality=50)
    mk("prog.jpg", Image.fromarray(smooth), quality=70, progressive=True)
    mk("gray.jpg", Image.fromarray(
        rng.integers(0, 256, (100, 130), dtype=np.uint8)), quality=80)
    mk("big_draft.jpg", Image.fromarray(
        rng.integers(0, 256, (1200, 1600, 3), dtype=np.uint8)), quality=60)
    mk("subs0.jpg", Image.fromarray(smooth), quality=90, subsampling=0)
    img = Image.fromarray(noise)
    ex = img.getexif()
    ex[0x0112] = 6
    mk("exif6.jpg", img, exif=ex)          # bail -> python transposes
    ex[0x0112] = 1
    mk("exif1.jpg", img, exif=ex)
    mk("cmyk.jpg", Image.fromarray(noise).convert("CMYK"))  # bail
    return out


@pytest.mark.parametrize("flags", [
    ["-pq", "-g80x24", "-b", "black"],
    ["-pi", "-g40x20"],
    ["-ps", "-g40x20", "-b", "black"],
    ["-pq", "-g80x24", "-b", "black", "--title"],
    ["-pq", "-g80x24", "-b", "black", "--rotate", "off"],
])
def test_jpeg_matches_python_launcher(binary, jpegs, flags, tmp_path):
    for name, path in sorted(jpegs.items()):
        c, py = _both(binary, flags + ["--debug-no-frame-delay"], [path],
                      tmp_path)
        assert c == py, (name, flags)


@pytest.fixture(scope="module")
def gifs(tmp_path_factory):
    """GIF-still envelope corpus: palettes of every size class,
    transparency (incl. index 0), interlace, RGB/L-saved quantized,
    degenerate geometry, plus an animation (bails, python renders)."""
    import numpy as np
    from PIL import Image

    tmp = tmp_path_factory.mktemp("gifs")
    rng = np.random.default_rng(9)
    out = {}

    def save(name, im, **kw):
        p = str(tmp / name)
        im.save(p, **kw)
        out[name] = p

    for i, (h, w, nc) in enumerate([(40, 52, 256), (23, 31, 16), (8, 8, 2),
                                    (1, 1, 2), (200, 3, 128)]):
        arr = rng.integers(0, nc, (h, w)).astype(np.uint8)
        im = Image.fromarray(arr, "P")
        im.putpalette(bytes(rng.integers(0, 256, nc * 3).astype(np.uint8)))
        save(f"p{i}.gif", im)
    arr = rng.integers(0, 16, (30, 40)).astype(np.uint8)
    im = Image.fromarray(arr, "P")
    im.putpalette(bytes(range(48)))
    save("trans.gif", im, transparency=7)
    save("trans0.gif", im, transparency=0)
    save("inter.gif", im, interlace=True)
    save("rgb.gif", Image.fromarray(
        rng.integers(0, 256, (33, 47, 3), dtype=np.uint8), "RGB"))
    save("gray.gif", Image.fromarray(
        rng.integers(0, 256, (25, 25), dtype=np.uint8), "L"))
    frames = [Image.fromarray(
        rng.integers(0, 256, (16, 16, 3), dtype=np.uint8), "RGB")
        for _ in range(3)]
    p = str(tmp / "anim.gif")
    frames[0].save(p, save_all=True, append_images=frames[1:], duration=30,
                   loop=0)
    out["anim.gif"] = p
    return out


@pytest.mark.parametrize("flags", [
    ["-pq", "-g40x20", "-b", "black"],
    ["-pq", "-g40x20", "-b", "none"],
    ["-pi", "-g40x20"],
    ["-ps", "-g30x15", "-b", "#223344", "--title"],
])
def test_gif_matches_python_launcher(binary, gifs, flags, tmp_path):
    for name, path in sorted(gifs.items()):
        c, py = _both(binary, flags + ["--debug-no-frame-delay",
                                       "--loops=1"], [path], tmp_path)
        assert c == py, (name, flags)


@pytest.fixture(scope="module")
def grid_media(tmp_path_factory):
    import numpy as np
    from PIL import Image

    tmp = tmp_path_factory.mktemp("grid")
    rng = np.random.default_rng(11)
    jpgs = []
    for i in range(8):
        p = str(tmp / f"img{i}.jpg")
        Image.fromarray(rng.integers(0, 256, (480, 640, 3),
                                     dtype=np.uint8), "RGB").save(
            p, quality=80)
        jpgs.append(p)
    png = str(tmp / "odd.png")
    Image.fromarray(rng.integers(0, 256, (123, 77, 4),
                                 dtype=np.uint8), "RGBA").save(png)
    return jpgs, png


@pytest.mark.parametrize("flags,n", [
    (["-ph", "--grid=4x2", "--title", "-g160x48", "-b", "black"], 8),
    (["-pq", "--grid=3", "-g120x40", "-b", "black"], 7),
    (["-ph", "--grid=2x2", "-g80x24", "-b", "black", "--title", "-C"], 4),
    (["-ph", "--grid=1x2", "-g80x24", "-b", "black", "--title"], 2),
    (["-pq", "--grid=5x1", "-g100x20", "-b", "none"], 6),
    (["-ph", "--grid=4x2", "--title", "-g161x49", "-b", "#446688",
      "-C"], 8),
])
def test_grid_matches_full_cli(binary, grid_media, flags, n, tmp_path):
    """BASELINE config #2 class: multi-column contact sheets must be
    byte-identical to the full CLI's MultiColumnRenderer (which is
    golden-pinned against the reference binary)."""
    jpgs, png = grid_media
    files = (jpgs + [png])[:n]
    c, py = _both(binary, flags + ["--debug-no-frame-delay"], files,
                  tmp_path)
    assert c == py


def test_grid_missing_files_skip_columns(binary, grid_media, tmp_path):
    """Failed sources never advance the grid column (cli skips None
    sources before the renderer sees them)."""
    jpgs, png = grid_media
    files = [jpgs[0], "/nonexistent.png", png, jpgs[1]]
    c, py = _both(binary, ["-pq", "--grid=2", "-g80x24", "-b", "black",
                           "--debug-no-frame-delay"], files, tmp_path)
    assert c == py
    assert c[0] == 1


@pytest.mark.parametrize("term,mode", [
    ("kitty", "-pk"), ("iterm2", "-pi"), ("xterm-sixel", "-ps"),
])
def test_pixel_grid_under_pty(binary, grid_media, term, mode, tmp_path):
    """Pixel-direct contact sheets (known cell size): per-canvas cell
    rounding in the renderer's headline/row moves, canvas-side cursor
    moves, per-cell PNG/sixel bodies -- byte-identical to the full
    CLI under the same scripted terminal."""
    jpgs, png = grid_media
    files = jpgs[:4] + [png]
    for flags in ([mode, "--grid=2x2", "-g40x20"],
                  [mode, "--grid=3", "-g60x20", "--title", "-b",
                   "black"]):
        args = flags + ["--debug-no-frame-delay"]
        rc_c, out_c = _pty_launcher(binary, args, files, _TERMS[term],
                                    str(tmp_path / "c.bin"), _CLEAN_ENV)
        rc_p, out_p = _pty_launcher(PY_LAUNCHER, args, files,
                                    _TERMS[term],
                                    str(tmp_path / "p.bin"), _CLEAN_ENV)
        assert (rc_c, out_c) == (rc_p, out_p), (term, flags)
        assert out_c


def test_grid_bails_delegate(binary, grid_media, tmp_path):
    """Out-of-envelope grids (pixel-direct, bad spec) delegate to the
    python launcher with identical results."""
    jpgs, _ = grid_media
    for flags in (["-pi", "--grid=2x2", "-g80x24"],
                  ["-pq", "--grid=bogus", "-g80x24"],
                  ["-pq", "--grid=0", "-g80x24"]):
        c, py = _both(binary, flags + ["--debug-no-frame-delay"],
                      jpgs[:4], tmp_path)
        assert c == py, flags


@pytest.fixture(scope="module")
def anim_gifs(tmp_path_factory):
    """GIF animation corpus: RGB full-frame saves, P-mode with shared
    palette + transparency, disposal methods 1/2/3, per-frame delays,
    static frames (empty block diffs)."""
    import numpy as np
    from PIL import Image

    tmp = tmp_path_factory.mktemp("anim")
    rng = np.random.default_rng(21)
    out = {}

    def mk(name, frames, **kw):
        p = str(tmp / name)
        frames[0].save(p, save_all=True, append_images=frames[1:], **kw)
        out[name] = p

    fr = [Image.fromarray(rng.integers(0, 256, (24, 32, 3),
                                       dtype=np.uint8), "RGB")
          for _ in range(4)]
    mk("basic.gif", fr, duration=30, loop=0)
    mk("slowfast.gif", fr, duration=[500, 5, 20, 1000], loop=0)
    pal = bytes(rng.integers(0, 256, 48).astype(np.uint8))
    pf = []
    for _ in range(4):
        im = Image.fromarray(rng.integers(0, 16, (20, 28)).astype(
            np.uint8), "P")
        im.putpalette(pal)
        pf.append(im)
    mk("ptrans_d2.gif", pf, duration=40, loop=0, transparency=3,
       disposal=2)
    mk("ptrans_d1.gif", pf, duration=40, loop=0, transparency=3,
       disposal=1)
    mk("p_d3.gif", pf, duration=40, loop=0, disposal=3)
    same = [Image.fromarray(np.full((16, 24, 3), 128, np.uint8), "RGB")
            for _ in range(3)]
    mk("static.gif", same, duration=25, loop=0)
    return out


@pytest.mark.parametrize("flags", [
    ["-pq", "-g40x20", "-b", "black", "--loops=2"],
    ["-ph", "-g40x20", "-b", "black", "--loops=1", "-C"],
    ["-pk", "-g40x20", "--loops=2"],          # no tty: one-frame path
    ["-pq", "-g40x20", "-b", "black", "-t", "0.12"],
    ["-pq", "-g40x20", "-b", "none", "--loops=2", "--title"],
    # sixel animations run the bucket-table pipeline (the same frames
    # the batched device path produces); iterm2 per-frame OSC PNG
    ["-ps", "-g40x20", "-b", "black", "--loops=2"],
    ["-ps", "-g40x20", "-b", "none", "--loops=1", "--title"],
    ["-pi", "-g40x20", "--loops=2"],
])
def test_gif_animation_matches_python(binary, anim_gifs, flags, tmp_path):
    """Native GIF animations (Pillow-equivalent disposal compositing,
    send_frames pacing, block diffs) must byte-match the full CLI."""
    for name, path in sorted(anim_gifs.items()):
        c, py = _both(binary, flags + ["--debug-no-frame-delay"], [path],
                      tmp_path)
        assert c == py, (name, flags)


@pytest.mark.parametrize("term,mode", [
    ("xterm-sixel", "-ps"),
    ("iterm2", "-pi"),
])
def test_pixel_animations_under_pty(binary, anim_gifs, term, mode,
                                    tmp_path):
    """With a known cell size, sixel animations run the bucket-table
    pipeline and iTerm2 per-frame OSC PNGs natively -- byte-identical
    to the full CLI under the same scripted terminal."""
    answers = _TERMS[term]
    args = [mode, "-g40x20", "--loops=2", "--debug-no-frame-delay",
            "-b", "black"]
    for name in ("basic.gif", "ptrans_d2.gif"):
        files = [anim_gifs[name]]
        rc_c, out_c = _pty_launcher(binary, args, files, answers,
                                    str(tmp_path / "c.bin"), _CLEAN_ENV)
        rc_p, out_p = _pty_launcher(PY_LAUNCHER, args, files, answers,
                                    str(tmp_path / "p.bin"), _CLEAN_ENV)
        assert (rc_c, out_c) == (rc_p, out_p), name
        assert out_c


def test_kitty_animation_under_pty(binary, anim_gifs, tmp_path):
    """With a known cell size and a kitty terminal, animations render
    natively with flip-flop ids -- byte-identical modulo id (config #4
    class; reference ~5 ms, the python path ~800 ms)."""
    answers = _TERMS["kitty"]
    args = ["-pk", "-g40x20", "--loops=3", "--debug-no-frame-delay",
            "-b", "black"]
    for name in ("basic.gif", "ptrans_d2.gif", "static.gif"):
        files = [anim_gifs[name]]
        rc_c, out_c = _pty_launcher(binary, args, files, answers,
                                    str(tmp_path / "c.bin"), _CLEAN_ENV)
        rc_p, out_p = _pty_launcher(PY_LAUNCHER, args, files, answers,
                                    str(tmp_path / "p.bin"), _CLEAN_ENV)
        assert (rc_c, out_c) == (rc_p, out_p), name
        assert out_c


@pytest.mark.parametrize("flags", [
    ["-pq", "-g40x20", "-b", "black", "--scroll", "-t", "0.4"],
    ["-pq", "-g40x20", "-b", "black", "--scroll=20", "-d", "2:1", "-t",
     "0.3"],
    ["-ph", "-g40x20", "-b", "black", "--scroll", "-d", "-3:0",
     "--loops=1"],
    ["-pq", "-g40x20", "-b", "black", "--scroll", "-d", "0:2",
     "--loops=1"],
    ["-pq", "-g40x20", "-b", "black", "--scroll", "-d", "0:0", "-t",
     "0.1"],                                   # warns, shows still
    ["-pq", "-g40x20", "-b", "black", "--scroll", "-d", "bogus"],  # 2
    ["-pq", "-g30x10", "-b", "none", "--scroll", "-d", "5:3",
     "--loops=1", "--title"],
])
def test_scroll_matches_python_launcher(binary, corpus, flags, tmp_path):
    """Scroll pans (wraparound crops, LCM cycle, negative-direction
    start alignment, scroll.py's pre-frame budget check and raw frame
    times) must byte-match the full CLI."""
    for name in ("gradient_320x200.png", "noise_64x48.png"):
        c, py = _both(binary, flags + ["--debug-no-frame-delay"],
                      [corpus[name]], tmp_path)
        assert c == py, (name, flags)


def test_bmp_matches_python_launcher(binary, tmp_path_factory, tmp_path):
    """BMP stills: 24-bit BGR, grayscale and palette 8-bit decode in C
    (PIL raw-tile mirror); 32-bit BGRA delegates (fast.py's BGRX
    rewire owns it)."""
    import numpy as np
    from PIL import Image

    tmp = tmp_path_factory.mktemp("bmp")
    rng = np.random.default_rng(8)
    files = []

    def mk(name, im):
        p = str(tmp / name)
        im.save(p)
        files.append(p)

    mk("rgb.bmp", Image.fromarray(rng.integers(0, 256, (33, 47, 3),
                                               dtype=np.uint8), "RGB"))
    mk("gray.bmp", Image.fromarray(rng.integers(0, 256, (20, 30),
                                                dtype=np.uint8), "L"))
    pimg = Image.fromarray(rng.integers(0, 16, (20, 30)).astype(np.uint8),
                           "P")
    pimg.putpalette(bytes(rng.integers(0, 256, 48).astype(np.uint8)))
    mk("pal.bmp", pimg)
    mk("rgba32.bmp", Image.fromarray(rng.integers(0, 256, (20, 20, 4),
                                                  dtype=np.uint8),
                                     "RGBA"))  # 32-bit: delegates
    for flags in (["-pq", "-g40x20", "-b", "black"], ["-pi", "-g40x20"]):
        for f in files:
            c, py = _both(binary, flags + ["--debug-no-frame-delay"],
                          [f], tmp_path)
            assert c == py, (f, flags)


def test_mixed_stills_and_animations(binary, corpus, anim_gifs, jpegs,
                                     tmp_path):
    """One invocation mixing a PNG still, an animation, a JPEG and a
    missing file: per-source canvas state (block diff boundaries,
    cursor prefixes, error order) must match the full CLI."""
    files = [corpus["noise_64x48.png"], anim_gifs["basic.gif"],
             "/nonexistent.png", jpegs["smooth_q85.jpg"]]
    c, py = _both(binary, ["-pq", "-g40x20", "-b", "black", "--loops=2",
                           "--debug-no-frame-delay"], files, tmp_path)
    assert c == py
    assert c[0] == 1


def test_fallback_paths_delegate(binary, corpus, tmp_path):
    """Out-of-envelope invocations exec the python launcher: identical
    output, exercised here for a PIL-decoded GIF still and an explicit
    numpy-path env."""
    from PIL import Image
    import numpy as np
    gif = str(tmp_path / "g.gif")
    rng = np.random.default_rng(3)
    Image.fromarray(rng.integers(0, 256, (24, 32, 3), dtype=np.uint8),
                    "RGB").save(gif)
    c, py = _both(binary, ["-pq", "-g40x20", "-b", "black"], [gif],
                  tmp_path)
    assert c == py
    env = dict(_CLEAN_ENV, TIMG_TPU_FORCE_NUMPY="1",
               JAX_PLATFORMS="cpu")
    c, py = _both(binary, ["-pq", "-g20x10", "-b", "black"],
                  [corpus["noise_64x48.png"]], tmp_path, env=env)
    assert c == py


def test_env_knobs(binary, corpus, tmp_path):
    img = corpus["alpha_80x100.png"]
    for extra_env in (
        {"TIMG_USE_UPPER_BLOCK": "on"},
        {"TIMG_PIXELATION": "h"},
        {"TIMG_FONT_WIDTH_CORRECT": "0.75"},
        {"TIMG_DEFAULT_TITLE": "%b!"},
    ):
        env = dict(_CLEAN_ENV, **extra_env)
        args = ["-g40x20", "-b", "black"]
        if "TIMG_PIXELATION" not in extra_env:
            args.insert(0, "-pq")
        if "TIMG_DEFAULT_TITLE" in extra_env:
            args.append("--title")
        c, py = _both(binary, args, [img], tmp_path, env=env)
        assert c == py, extra_env


def test_resize_exec_knob_parity(binary, corpus, tmp_path):
    """TIMG_TPU_RESIZE_EXEC selects the vertical-first executor
    (blocked scatter by default, tiled gather for A/B); every value
    must produce identical bytes.  -g80x48 on the 512x512 image is a
    vertical-first geometry (plan_passes -> True), so the knob's two
    code paths really run; -U adds the upsample branch."""
    img = corpus["noise_512x512.png"]
    small = corpus["noise_64x48.png"]
    for args, src in (
        (["-pq", "-g80x48", "-b", "black"], img),
        (["-pk", "-g80x48", "-b", "black"], img),
        (["-pq", "-g80x48", "-b", "black", "-U"], small),
    ):
        outs = {}
        for exec_name in ("", "scatter", "gather"):
            env = dict(_CLEAN_ENV)
            if exec_name:
                env["TIMG_TPU_RESIZE_EXEC"] = exec_name
            out = os.path.join(str(tmp_path),
                               "knob_%s_%s" % (exec_name or "default",
                                               args[1][2:]))
            r = subprocess.run([binary, *args, "--debug-no-frame-delay",
                                "-o", out, src], env=env,
                               capture_output=True, timeout=60)
            assert r.returncode == 0, (exec_name, r.stderr[-300:])
            with open(out, "rb") as f:
                outs[exec_name or "default"] = _norm(f.read())
        assert outs["default"] == outs["scatter"] == outs["gather"], args


FUZZ_POOL = [
    ["-pq"], ["-ph"], ["-ps"], ["-pi"], ["--color8"],
    ["-b", "red"], ["-b", "none"], ["-b", "#357"],  # #357 warns -> full
    ["-B", "#334455"], ["--pattern-size", "2"],
    ["--title"], ["--title=%b %wx%h"], ["-W"], ["--center"], ["-U"],
    ["--upscale=i"], ["--rotate", "off"], ["--compress=5"], ["--clear"],
    ["-E"], ["-a"], ["-w", "0"], ["-t", "5"], ["--loops=2"], ["-I"],
    ["--threads", "2"],
]


def test_random_flag_combinations(binary, corpus, tmp_path):
    rng = random.Random(11)
    files = [corpus["noise_64x48.png"], corpus["alpha_80x100.png"]]
    for trial in range(14):
        flags = []
        for f in rng.sample(FUZZ_POOL, rng.randint(1, 4)):
            flags.extend(f)
        flags += ["-g40x12", "--debug-no-frame-delay"]
        c, py = _both(binary, flags,
                      [rng.choice(files)], tmp_path)
        assert c == py, flags


# ---------------------------------------------------------------------
# Terminal auto-detection under scripted ptys: the C query engine must
# resolve the same pixelation and emit the same bytes as term.py.
# ---------------------------------------------------------------------
_PTY_WINSIZE = (24, 80, 640, 384)  # 8x16 px cells


def _pty_launcher(cmd, args, files, answers, out_path, env,
                  winsize=_PTY_WINSIZE):
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
        r = subprocess.run([cmd, *args, "-o", out_path, *files], env=env,
                           stdin=slave, stdout=slave, stderr=slave,
                           timeout=600)
        rc = r.returncode
    finally:
        os.close(slave)
        os.close(master)
    data = open(out_path, "rb").read() if os.path.exists(out_path) else b""
    return rc, _norm(data)


_TERMS = {
    "kitty": {b"\033[>q": b"\033P>|kitty(0.26.5)\033\\\033[0n",
              b"\033]11;?": b"\033]11;rgb:0000/0000/0000\033\\"},
    "iterm2": {b"\033[>q": b"\033P>|iTerm2 3.4.19\033\\\033[0n",
               b"\033]11;?": b"\033]11;rgb:1111/2222/3333\033\\"},
    "xterm-sixel": {b"\033[>q": b"\033P>|XTerm(380)\033\\\033[0n",
                    b"\033[c": b"\033[?64;1;2;4;6;9;15;16;17;18;21;22c",
                    b"\033]11;?": b"\033]11;rgb:0000/0000/0000\033\\"},
    "dumb": {b"\033[>q": b"\033[0n"},
    "foot": {b"\033[>q": b"\033P>|foot(1.16.2)\033\\\033[0n",
             b"\033]11;?": b"\033]11;rgb:0000/0000/0000\033\\"},
    "wezterm": {b"\033[>q":
                b"\033P>|WezTerm 20230712-072601-f4abf8fd\033\\\033[0n",
                b"\033]11;?": b"\033]11;rgb:0000/0000/0000\033\\"},
}


@pytest.mark.parametrize("term", sorted(_TERMS))
def test_auto_sieve_matches_python(binary, corpus, term, tmp_path):
    """No -p: both launchers run the CSI >q / DA1 sieve against the same
    scripted terminal and must land on identical bytes (incl. the
    OSC 11 bg auto query for the alpha image)."""
    answers = _TERMS[term]
    files = [corpus["alpha_80x100.png"]]
    args = ["--debug-no-frame-delay", "-g30x15"]
    rc_c, out_c = _pty_launcher(binary, args, files, answers,
                                str(tmp_path / "c.bin"), _CLEAN_ENV)
    rc_p, out_p = _pty_launcher(PY_LAUNCHER, args, files, answers,
                                str(tmp_path / "p.bin"), _CLEAN_ENV)
    assert (rc_c, out_c) == (rc_p, out_p)
    assert out_c  # something was rendered


def test_css3_table_in_sync():
    """css3_colors.inc regenerates byte-identically from the python
    table (scripts/gen_css3_inc.py --check)."""
    r = subprocess.run([sys.executable,
                        os.path.join(REPO, "scripts", "gen_css3_inc.py"),
                        "--check"], capture_output=True, timeout=60)
    assert r.returncode == 0, "css3_colors.inc is stale; rerun the script"
