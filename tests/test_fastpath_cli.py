"""End-to-end parity of the one-shot fastpath vs the full CLI.

For every invocation inside the fastpath envelope, fast.try_fast_main
must produce byte-identical output, identical stderr and the same exit
code as cli.main; for everything outside, it must bail (None) without
emitting a byte. The launcher (./timg-tpu) integration is covered by a
couple of subprocess cases (slow: full interpreter startup each).
"""

import io
import os
import sys
import tempfile

import numpy as np
import pytest

from tests.corpus import build_corpus
from timg_tpu import fast
from timg_tpu.cli import main as cli_main
from timg_tpu.native import runtime

pytestmark = pytest.mark.skipif(
    runtime.load_still() is None
    or not hasattr(runtime.load_still(), "timg_png_decode"),
    reason="native still pipeline unavailable")

CORPUS = build_corpus(os.path.join(tempfile.gettempdir(),
                                   "timg_tpu_corpus"))


@pytest.fixture(autouse=True)
def _clean_env(monkeypatch):
    for var in ("TIMG_TPU_NO_FASTPATH", "TIMG_TPU_FORCE_NUMPY",
                "TIMG_TPU_FORCE_DEVICE", "TIMG_PIXELATION",
                "TIMG_USE_UPPER_BLOCK", "TIMG_DEFAULT_TITLE",
                "TIMG_FONT_WIDTH_CORRECT"):
        monkeypatch.delenv(var, raising=False)


def _run_both(argv, tmp_path, capsys):
    f_fast = str(tmp_path / "fast.out")
    f_full = str(tmp_path / "full.out")
    rc_fast = fast.try_fast_main(argv + ["-o", f_fast])
    err_fast = capsys.readouterr().err
    assert rc_fast is not None, f"unexpected bail for {argv}"
    os.environ["TIMG_TPU_FORCE_NUMPY"] = "1"
    try:
        rc_full = cli_main(argv + ["-o", f_full])
    finally:
        del os.environ["TIMG_TPU_FORCE_NUMPY"]
    err_full = capsys.readouterr().err
    with open(f_fast, "rb") as f:
        out_fast = f.read()
    with open(f_full, "rb") as f:
        out_full = f.read()
    assert rc_fast == rc_full, f"exit code mismatch for {argv}"
    assert err_fast == err_full, f"stderr mismatch for {argv}"
    assert out_fast == out_full, (
        f"output mismatch for {argv}: {len(out_fast)} vs {len(out_full)}")


BASE = ["--debug-no-frame-delay"]

MATRIX = [
    # (extra flags, corpus files)
    (["-pq", "-g80x24", "-b", "black"], ["noise_512x512.png"]),
    (["-ph", "-g80x24", "-b", "black"], ["noise_512x512.png"]),
    (["-pq", "-g40x12", "-b", "none"], ["gradient_320x200.png"]),
    (["-pq", "-g80x24", "-b", "black"], ["noise_33x27.png"]),   # odd dims
    (["-ph", "-g80x24", "-b", "black"], ["noise_33x27.png"]),
    (["-pq", "-g80x24", "-b", "#336699"], ["alpha_80x100.png"]),
    (["-pq", "-g80x24", "-b", "gray", "-B", "white"],
     ["alpha_80x100.png"]),  # checkerboard
    (["-pq", "-g80x24", "-b", "white", "-B", "silver",
      "--pattern-size", "3"], ["alpha_band_60x40.png"]),
    (["-pq", "-g80x24", "-b", "rgb(10, 20, 30)"], ["alpha_band_60x40.png"]),
    (["-pq", "-g80x24", "-b", "black"], ["tiny_8x6.png"]),      # no upscale
    (["-pq", "-g80x24", "-b", "black", "-U"], ["tiny_8x6.png"]),
    (["-pq", "-g80x24", "-b", "black", "--upscale=i"], ["tiny_8x6.png"]),
    (["-pq", "-g80x24", "-b", "black", "-U", "-U"], ["tiny_8x6.png"]),
    (["-pq", "-g80x24", "-b", "black", "-W"], ["gray_50x40.png"]),
    (["-pq", "-g80x24", "-b", "black", "-C"], ["noise_64x48.png"]),
    (["-pq", "-g80x24", "-b", "black", "-a"], ["noise_512x512.png"]),
    (["-pq", "-g80x24", "-b", "black", "--color8"],
     ["gradient_320x200.png"]),
    (["-pq", "-g80x24", "-b", "black", "--title"], ["noise_64x48.png"]),
    (["-pq", "-g80x24", "-b", "black", "--title=%b %wx%h %D", "-C"],
     ["noise_64x48.png"]),
    (["-pq", "-g80x24", "-b", "black", "--clear"], ["noise_64x48.png"]),
    (["-pq", "-g80x24", "-b", "black", "--clear=every"],
     ["noise_64x48.png", "gray_50x40.png"]),
    (["-pq", "-g80x24", "-b", "black"],
     ["noise_64x48.png", "alpha_80x100.png", "tiny_8x6.png"]),
    (["-pq", "-g80x24", "-b", "black", "-E"], ["noise_64x48.png"]),
    (["-pq", "-g80x24", "-b", "black", "-t", "0"], ["noise_64x48.png"]),
    (["-pq", "-g80x24", "-b", "black", "-t", "5"], ["noise_64x48.png"]),
    (["-pq", "-g11x7", "-b", "black"], ["noise_512x512.png"]),  # tiny grid
    (["-ph", "-g200x60", "-b", "black", "-U"], ["gradient_320x200.png"]),
    (["-pq", "-g80x24", "-b", "black", "--rotate", "off"],
     ["noise_64x48.png"]),
    (["-pq", "-g80x24", "-b", "black", "--loops=3"], ["noise_64x48.png"]),
]


@pytest.mark.parametrize("flags,files", MATRIX,
                         ids=[" ".join(m[0]) + ":" + ",".join(m[1])
                              for m in MATRIX])
def test_fast_matches_full(flags, files, tmp_path, capsys):
    argv = BASE + flags + [CORPUS[f] for f in files]
    _run_both(argv, tmp_path, capsys)


def test_fast_env_matrix(tmp_path, capsys, monkeypatch):
    monkeypatch.setenv("TIMG_USE_UPPER_BLOCK", "1")
    _run_both(BASE + ["-pq", "-g80x24", "-b", "black",
                      CORPUS["noise_33x27.png"]], tmp_path, capsys)
    monkeypatch.delenv("TIMG_USE_UPPER_BLOCK")
    monkeypatch.setenv("TIMG_PIXELATION", "h")
    _run_both(BASE + ["-g80x24", "-b", "black",
                      CORPUS["noise_64x48.png"]], tmp_path, capsys)
    monkeypatch.delenv("TIMG_PIXELATION")
    monkeypatch.setenv("TIMG_DEFAULT_TITLE", "** %b **")
    _run_both(BASE + ["-pq", "-g80x24", "-b", "black", "--title",
                      CORPUS["noise_64x48.png"]], tmp_path, capsys)


def test_fast_missing_file_error_parity(tmp_path, capsys):
    argv = BASE + ["-pq", "-g80x24", "-b", "black",
                   str(tmp_path / "nope.png")]
    _run_both(argv, tmp_path, capsys)


def test_fast_missing_and_good_mix(tmp_path, capsys):
    argv = BASE + ["-pq", "-g80x24", "-b", "black",
                   str(tmp_path / "nope.png"), CORPUS["noise_64x48.png"]]
    _run_both(argv, tmp_path, capsys)


def test_fast_directory_input(tmp_path, capsys):
    d = tmp_path / "adir.png"
    d.mkdir()
    argv = BASE + ["-pq", "-g80x24", "-b", "black", str(d)]
    _run_both(argv, tmp_path, capsys)


def test_fast_filelist(tmp_path, capsys):
    fl = tmp_path / "list.txt"
    fl.write_text(CORPUS["noise_64x48.png"] + "\n"
                  + CORPUS["gray_50x40.png"] + "\n")
    argv = BASE + ["-pq", "-g80x24", "-b", "black", "-f", str(fl)]
    _run_both(argv, tmp_path, capsys)


def test_fast_geometry_error_parity(tmp_path, capsys):
    # -g parses but is absurd -> "unusual size" + exit 3 on both paths.
    argv = ["-pq", "-g0x0", "-b", "black", CORPUS["noise_64x48.png"]]
    _run_both(argv, tmp_path, capsys)


def _expect_bail(argv, monkeypatch=None):
    rc = fast.try_fast_main(argv)
    assert rc is None, f"expected bail for {argv}"


def test_fast_bails_outside_envelope(tmp_path, monkeypatch):
    img = CORPUS["noise_64x48.png"]
    base = ["-pq", "-g80x24", "-b", "black"]
    _expect_bail(base + ["--grid=2", img, img])
    _expect_bail(base + ["--verbose", img])
    _expect_bail(base + ["--scroll", img])
    _expect_bail(base + ["--auto-crop", img])
    _expect_bail(base + ["--frames", "2", img])
    _expect_bail(base + ["--frame-offset", "1", img])
    _expect_bail(base + ["-V", img])
    _expect_bail(base + ["--version"])
    _expect_bail(base + ["--help"])
    # sixel with the non-default dithers runs the numpy/device quantizers
    _expect_bail(["-ps", "--dither=cube", "-g80x24", img])
    _expect_bail(["-ps", "--dither=adaptive", "-g80x24", img])
    _expect_bail(base + [CORPUS["gray16_48x32.png"]])  # 16-bit subset
    # non-PNG input (JPEG header)
    jpg = tmp_path / "x.jpg"
    jpg.write_bytes(b"\xff\xd8\xff\xe0" + b"0" * 64)
    _expect_bail(base + [str(jpg)])
    # warn-y flag values must bail before printing
    _expect_bail(base + ["--upscale=x", img])
    _expect_bail(["-p", "zebra", "-g80x24", img])
    _expect_bail(["-pq", "-g80x24", "-b", "notacolor", img])
    _expect_bail(["-pq", "-g80x24", "-B", "notacolor", img])
    # force-backend envs route to the full path
    monkeypatch.setenv("TIMG_TPU_FORCE_NUMPY", "1")
    _expect_bail(base + [img])
    monkeypatch.delenv("TIMG_TPU_FORCE_NUMPY")
    monkeypatch.setenv("TIMG_TPU_NO_FASTPATH", "1")
    _expect_bail(base + [img])


def test_fast_bails_without_writing(tmp_path):
    """A bail must leave no partial output even with -o given."""
    out = tmp_path / "o.bin"
    rc = fast.try_fast_main(
        ["-pq", "-g80x24", "-b", "black", "-o", str(out),
         CORPUS["gray16_48x32.png"]])
    assert rc is None
    assert out.read_bytes() == b""  # truncated-open only; no content


def test_fast_parameter_error_exit_codes(capsys):
    rc = fast.try_fast_main(["-pq", "-gzzz", "-b", "black", "x.png"])
    assert rc == 2
    capsys.readouterr()
    rc = fast.try_fast_main(["-pq", "-g80x24", "--clear=bogus", "x.png"])
    assert rc == 2
    capsys.readouterr()
    rc = fast.try_fast_main(["-pq", "-g80x24", "--rotate=x", "x.png"])
    assert rc == 2
    capsys.readouterr()


def test_launcher_subprocess_fast_and_full(tmp_path):
    """./timg-tpu boots slim, renders eligible PNGs natively, and
    re-execs the full path for everything else."""
    import subprocess
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    launcher = os.path.join(repo, "timg-tpu")
    img = CORPUS["alpha_80x100.png"]
    argv = ["-pq", "-g60x20", "--debug-no-frame-delay", "-b", "teal",
            "--title", "-C", img]
    env = {k: v for k, v in os.environ.items()
           if not k.startswith("TIMG_")}
    f1, f2 = str(tmp_path / "a"), str(tmp_path / "b")
    r1 = subprocess.run([launcher, *argv, "-o", f1], env=env,
                        capture_output=True, timeout=120)
    r2 = subprocess.run(
        [launcher, *argv, "-o", f2],
        env=dict(env, TIMG_TPU_NO_FASTPATH="1", TIMG_TPU_FORCE_NUMPY="1"),
        capture_output=True, timeout=600)
    assert r1.returncode == r2.returncode == 0, (r1.stderr, r2.stderr)
    with open(f1, "rb") as f:
        b1 = f.read()
    with open(f2, "rb") as f:
        b2 = f.read()
    assert b1 == b2 and b1
    assert r1.stderr == r2.stderr == b""


def test_launcher_python_invocation(tmp_path):
    """`python timg-tpu` (site already up) still works via fast.main."""
    import subprocess
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    launcher = os.path.join(repo, "timg-tpu")
    img = CORPUS["noise_64x48.png"]
    f1 = str(tmp_path / "c")
    env = {k: v for k, v in os.environ.items()
           if not k.startswith("TIMG_")}
    r = subprocess.run(
        [sys.executable, launcher, "-pq", "-g40x12", "-b", "black",
         "--debug-no-frame-delay", img, "-o", f1],
        env=env, capture_output=True, timeout=600)
    assert r.returncode == 0, r.stderr
    with open(f1, "rb") as f:
        assert f.read()


# ---------------------------------------------------------------------------
# PIL medium path: JPEG/GIF/BMP/WebP stills (decode parity by
# construction — the fastpath uses PIL itself; the pixel work is C)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def pil_stills(tmp_path_factory):
    from PIL import Image
    d = tmp_path_factory.mktemp("pilstills")
    rng = np.random.default_rng(21)
    out = {}
    rgb = rng.integers(0, 256, (90, 130, 3), dtype=np.uint8)
    p = str(d / "photo.jpg")
    Image.fromarray(rgb).save(p, quality=88)
    out["jpg"] = p
    # large JPEG: exercises the DCT-domain draft() leg
    big = rng.integers(0, 256, (700, 900, 3), dtype=np.uint8)
    p = str(d / "big.jpg")
    Image.fromarray(big).save(p, quality=85)
    out["bigjpg"] = p
    # EXIF-rotated JPEG
    p = str(d / "rot.jpg")
    img = Image.fromarray(rgb)
    exif = img.getexif()
    exif[0x0112] = 6  # rotate 270
    img.save(p, quality=88, exif=exif)
    out["exifjpg"] = p
    p = str(d / "still.gif")
    Image.fromarray(rgb).quantize(colors=60).save(p)
    out["gif"] = p
    p = str(d / "x.bmp")
    Image.fromarray(rgb).save(p)
    out["bmp"] = p
    p = str(d / "x.webp")
    Image.fromarray(rgb).save(p, lossless=True)
    out["webp"] = p
    # animated GIF: outside the envelope
    frames = [Image.fromarray(rng.integers(0, 256, (20, 24, 3),
                                           dtype=np.uint8)).quantize(32)
              for _ in range(3)]
    p = str(d / "anim.gif")
    frames[0].save(p, save_all=True, append_images=frames[1:],
                   duration=50)
    out["animgif"] = p
    return out


@pytest.mark.parametrize("key", ["jpg", "bigjpg", "exifjpg", "gif",
                                 "bmp", "webp"])
def test_fast_pil_stills_match_full(key, pil_stills, tmp_path, capsys):
    argv = BASE + ["-pq", "-g80x24", "-b", "black", pil_stills[key]]
    _run_both(argv, tmp_path, capsys)


def test_fast_pil_still_rotate_off(pil_stills, tmp_path, capsys):
    argv = BASE + ["-pq", "-g80x24", "-b", "black", "--rotate", "off",
                   pil_stills["exifjpg"]]
    _run_both(argv, tmp_path, capsys)


def test_fast_pil_mixed_with_png(pil_stills, tmp_path, capsys):
    argv = BASE + ["-pq", "-g80x24", "-b", "black", "--title",
                   CORPUS["noise_64x48.png"], pil_stills["jpg"]]
    _run_both(argv, tmp_path, capsys)


def test_fast_bails_on_animated_gif(pil_stills):
    rc = fast.try_fast_main(
        BASE + ["-pq", "-g80x24", "-b", "black", pil_stills["animgif"]])
    assert rc is None


# ---------------------------------------------------------------------------
# iTerm2 fastpath (pixel-direct; PNG via the numpy-free png_core)
# ---------------------------------------------------------------------------

ITERM_MATRIX = [
    (["-pi", "-g60x20", "-b", "black"], ["noise_64x48.png"]),
    (["-pi", "-g60x20", "-b", "auto"], ["alpha_80x100.png"]),   # ->none
    (["-pi", "-g60x20", "-b", "none"], ["alpha_80x100.png"]),   # RGBA png
    (["-pi", "-g60x20", "-b", "#224466"], ["alpha_80x100.png"]),  # compose
    (["-pi", "-g60x20", "-b", "black", "--compress=6"],
     ["noise_512x512.png"]),
    (["-pi", "-g60x20", "-b", "black", "--compress=0"],
     ["noise_64x48.png"]),
    (["-pi", "-g60x20", "-b", "black", "--title", "-C"],
     ["gradient_320x200.png"]),
    (["-pi", "-g60x20", "-b", "black"],
     ["noise_64x48.png", "gray_50x40.png"]),
]


@pytest.mark.parametrize("flags,files", ITERM_MATRIX,
                         ids=[" ".join(m[0]) + ":" + ",".join(m[1])
                              for m in ITERM_MATRIX])
def test_fast_iterm2_matches_full(flags, files, tmp_path, capsys):
    argv = BASE + flags + [CORPUS[f] for f in files]
    _run_both(argv, tmp_path, capsys)


def test_fast_iterm2_jpeg(pil_stills, tmp_path, capsys):
    argv = BASE + ["-pi", "-g60x20", "-b", "black", pil_stills["jpg"]]
    _run_both(argv, tmp_path, capsys)


def test_fast_auto_sieve_pixel_direct(tmp_path, capsys, monkeypatch,
                                      pinned_kitty_ids):
    """Auto-detection resolving to each pixel-direct protocol stays in
    the fastpath (kitty inside tmux bails: passthrough needs the full
    canvas)."""
    from timg_tpu import term

    class TS:
        cols, rows = 82, 26
        font_width_px, font_height_px = 8, 16

    class GI:
        preferred_graphics = "iterm2"
        in_tmux = False
        from timg_tpu.options import SixelOptions
        sixel = SixelOptions()

    monkeypatch.setattr(term, "determine_term_size", lambda: TS())
    monkeypatch.setattr(term, "query_supported_graphics_protocol",
                        lambda: GI())
    argv = BASE + ["-b", "black", CORPUS["noise_64x48.png"]]
    _run_both(argv, tmp_path, capsys)

    for proto in ("kitty", "sixel"):
        GI.preferred_graphics = proto
        _run_both(argv, tmp_path, capsys)

    GI.preferred_graphics = "kitty"
    GI.in_tmux = True
    assert fast.try_fast_main(argv + ["-o", os.devnull]) is None


# ---------------------------------------------------------------------------
# Kitty fastpath (APC chunked PNG; ids are time-seeded so parity runs
# pin both modules' id state)
# ---------------------------------------------------------------------------

@pytest.fixture
def pinned_kitty_ids(monkeypatch):
    from timg_tpu.render import kitty
    monkeypatch.setattr(kitty, "_id_start", 400000)
    monkeypatch.setattr(kitty, "_id_counter", 0)
    monkeypatch.setattr(fast, "_kitty_id_start", 400000)
    monkeypatch.setattr(fast, "_kitty_id_counter", 0)


KITTY_MATRIX = [
    (["-pk", "-g60x20", "-b", "black"], ["noise_64x48.png"]),
    (["-pk", "-g60x20", "-b", "auto"], ["alpha_80x100.png"]),   # ->none
    (["-pk", "-g60x20", "-b", "none"], ["alpha_80x100.png"]),   # RGBA png
    (["-pk", "-g60x20", "-b", "#224466"], ["alpha_80x100.png"]),
    (["-pk", "-g60x20", "-b", "black", "--compress=6"],
     ["noise_512x512.png"]),                          # multi-chunk APC
    (["-pk", "-g60x20", "-b", "black", "--title", "-C"],
     ["gradient_320x200.png"]),
    (["-pk", "-g60x20", "-b", "black"],
     ["noise_64x48.png", "gray_50x40.png"]),
]


@pytest.mark.parametrize("flags,files", KITTY_MATRIX,
                         ids=[" ".join(m[0]) + ":" + ",".join(m[1])
                              for m in KITTY_MATRIX])
def test_fast_kitty_matches_full(flags, files, tmp_path, capsys,
                                 pinned_kitty_ids):
    argv = BASE + flags + [CORPUS[f] for f in files]
    _run_both(argv, tmp_path, capsys)


# ---------------------------------------------------------------------------
# Sixel fastpath (reference-exact libsixel quant.c + C RLE assembly)
# ---------------------------------------------------------------------------

SIXEL_MATRIX = [
    (["-ps", "-g60x20", "-b", "black"], ["noise_64x48.png"]),
    (["-ps", "-g60x20", "-b", "black"], ["gradient_320x200.png"]),
    # 80x100 -> height % 6 != 0: exercises the composed pad strip
    (["-ps", "-g60x20", "-b", "#336699"], ["alpha_80x100.png"]),
    (["-ps", "-g60x20", "-b", "none"], ["alpha_80x100.png"]),  # zero pad
    (["-ps", "-g60x20", "-b", "black", "--title", "-C"],
     ["gradient_320x200.png"]),
    (["-ps", "-g60x20", "-b", "black"],
     ["noise_64x48.png", "gray_50x40.png"]),
]


@pytest.mark.parametrize("flags,files", SIXEL_MATRIX,
                         ids=[" ".join(m[0]) + ":" + ",".join(m[1])
                              for m in SIXEL_MATRIX])
def test_fast_sixel_matches_full(flags, files, tmp_path, capsys):
    argv = BASE + flags + [CORPUS[f] for f in files]
    _run_both(argv, tmp_path, capsys)


def test_fast_sixel_jpeg(pil_stills, tmp_path, capsys):
    argv = BASE + ["-ps", "-g60x20", "-b", "black", pil_stills["jpg"]]
    _run_both(argv, tmp_path, capsys)


def test_fast_kitty_jpeg(pil_stills, tmp_path, capsys, pinned_kitty_ids):
    argv = BASE + ["-pk", "-g60x20", "-b", "black", pil_stills["jpg"]]
    _run_both(argv, tmp_path, capsys)


# ---------------------------------------------------------------------------
# Randomized parity fuzz: any combination the fastpath accepts must be
# byte-identical to the full path (generalizes the fixed matrices)
# ---------------------------------------------------------------------------

_FUZZ_POOL = [
    ["-pq"], ["-ph"], ["-ps"], ["-pk"], ["-pi"],
    ["-b", "black"], ["-b", "none"], ["-b", "#334455"], ["-b", "auto"],
    ["-B", "gray"], ["--pattern-size", "3"],
    ["--title"], ["--title=%b %wx%h %D"], ["-C"], ["-W"], ["-U"],
    ["--upscale=i"], ["-a"], ["--rotate", "off"], ["--color8"],
    ["--compress=4"], ["--clear"], ["-E"], ["-w", "0"],
]


def test_fast_fuzz_parity(tmp_path, capsys, monkeypatch):
    import random

    from timg_tpu.render import kitty

    random.seed(23)
    images = [CORPUS[k] for k in ("noise_64x48.png", "alpha_80x100.png",
                                  "gradient_320x200.png", "tiny_8x6.png",
                                  "gray_50x40.png")]
    n_ran = 0
    for i in range(40):
        argv = ["--debug-no-frame-delay",
                "-g", random.choice(["80x24", "40x12", "23x9"])]
        for f in random.sample(_FUZZ_POOL, random.randint(1, 4)):
            argv += f
        argv += random.sample(images, random.randint(1, 2))
        for mod, names in ((kitty, ("_id_start", "_id_counter")),
                           (fast, ("_kitty_id_start", "_kitty_id_counter"))):
            monkeypatch.setattr(mod, names[0], 7000 + i * 8)
            monkeypatch.setattr(mod, names[1], 0)
        f_fast = str(tmp_path / f"f{i}")
        f_full = str(tmp_path / f"g{i}")
        rc_fast = fast.try_fast_main(argv + ["-o", f_fast])
        err_fast = capsys.readouterr().err
        if rc_fast is None:
            continue  # outside the envelope: full path takes over
        n_ran += 1
        os.environ["TIMG_TPU_FORCE_NUMPY"] = "1"
        try:
            rc_full = cli_main(argv + ["-o", f_full])
        finally:
            del os.environ["TIMG_TPU_FORCE_NUMPY"]
        err_full = capsys.readouterr().err
        with open(f_fast, "rb") as f:
            out_fast = f.read()
        with open(f_full, "rb") as f:
            out_full = f.read()
        assert (rc_fast, err_fast) == (rc_full, err_full), argv
        assert out_fast == out_full, argv
    assert n_ran >= 15  # the sweep must actually exercise the fastpath
