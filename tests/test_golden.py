"""Byte-parity golden tests against the reference timg binary.

The reference binary (built from /root/reference with the stb/qoi minimal
feature set) is invoked with pinned geometry and --debug-no-frame-delay;
its escape-byte stream is compared byte-for-byte with ours.
"""

from __future__ import annotations

import os
import subprocess
import tempfile

import pytest

from tests.conftest import REFERENCE_BINARY, has_reference
from tests.corpus import build_corpus

CORPUS_DIR = os.path.join(tempfile.gettempdir(), "timg_tpu_corpus")

pytestmark = pytest.mark.skipif(
    not has_reference(), reason="reference binary not built")


@pytest.fixture(scope="session")
def corpus():
    return build_corpus(CORPUS_DIR)


_CLEAN_ENV = {
    k: v for k, v in os.environ.items() if not k.startswith("TIMG_")
}


def run_reference(args, files):
    with tempfile.NamedTemporaryFile(suffix=".out", delete=False) as tf:
        out = tf.name
    try:
        subprocess.run(
            [REFERENCE_BINARY, *args, "-o", out, *files],
            env=_CLEAN_ENV, capture_output=True, timeout=120, check=False)
        with open(out, "rb") as f:
            return f.read()
    finally:
        os.unlink(out)


# VERDICT r4 #9: the whole golden corpus also runs through a resident
# --serve session (one boot per pytest session) to catch env/cwd/state
# leakage classes; the autouse `via` fixture below flips this switch.
_VIA = "direct"
_SERVER_SOCKET = None


def run_ours(args, files):
    from timg_tpu import serve as serve_mod
    from timg_tpu.cli import main

    with tempfile.NamedTemporaryFile(suffix=".out", delete=False) as tf:
        out = tf.name
    saved = {k: os.environ.pop(k) for k in list(os.environ)
             if k.startswith("TIMG_")}
    try:
        if _VIA == "served" and _SERVER_SOCKET:
            rc = serve_mod.request([*args, "-o", out, *files],
                                   socket_path=_SERVER_SOCKET)
            assert rc is not None, "resident server did not serve"
        else:
            rc = main([*args, "-o", out, *files])
        assert rc in (0, 1), f"unexpected exit code {rc}"
        with open(out, "rb") as f:
            return f.read()
    finally:
        os.environ.update(saved)
        os.unlink(out)


@pytest.fixture(scope="session")
def _golden_server(tmp_path_factory):
    import threading

    from timg_tpu import serve as serve_mod

    sock = str(tmp_path_factory.mktemp("srv") / "golden.sock")
    ready = threading.Event()
    t = threading.Thread(
        target=lambda: serve_mod.serve(sock, ready_callback=ready.set),
        daemon=True)
    t.start()
    assert ready.wait(timeout=120), "golden serve session did not boot"
    yield sock


@pytest.fixture(params=["direct", "served"], autouse=True)
def via(request):
    """Every golden case runs twice: direct in-process, and through the
    resident --serve session (same bytes required)."""
    global _VIA, _SERVER_SOCKET
    if request.param == "served":
        _SERVER_SOCKET = request.getfixturevalue("_golden_server")
    _VIA = request.param
    yield request.param
    _VIA = "direct"


def assert_parity(args, files):
    ref = run_reference(args, files)
    ours = run_ours(args, files)
    if ref != ours:
        # Find first divergence for a useful failure message.
        n = next((i for i, (a, b) in enumerate(zip(ref, ours)) if a != b),
                 min(len(ref), len(ours)))
        ctx_r = ref[max(0, n - 50):n + 50]
        ctx_o = ours[max(0, n - 50):n + 50]
        pytest.fail(
            f"escape streams differ at byte {n} "
            f"(ref {len(ref)}B, ours {len(ours)}B)\nref: {ctx_r!r}\n"
            f"our: {ctx_o!r}")


BASE = ["--debug-no-frame-delay"]


@pytest.mark.parametrize("image", [
    "noise_64x48.png", "noise_33x27.png", "noise_512x512.png",
    "gradient_320x200.png", "gray_50x40.png", "tiny_8x6.png",
])
@pytest.mark.parametrize("pix", ["-pq", "-ph"])
def test_block_modes_bit_identical(corpus, image, pix):
    assert_parity([*BASE, "-g40x20", pix, "-b", "black"], [corpus[image]])


@pytest.mark.parametrize("image", ["alpha_80x100.png", "alpha_band_60x40.png"])
@pytest.mark.parametrize("bg", ["black", "white", "#336699", "none"])
def test_alpha_compose_parity(corpus, image, bg):
    assert_parity([*BASE, "-g30x15", "-pq", "-b", bg], [corpus[image]])


def test_checkerboard_pattern(corpus):
    assert_parity(
        [*BASE, "-g30x15", "-pq", "-b", "gray", "-B", "lightgray"],
        [corpus["alpha_80x100.png"]])


def test_pattern_size(corpus):
    assert_parity(
        [*BASE, "-g30x15", "-pq", "-b", "gray", "-B", "navy",
         "--pattern-size=3"], [corpus["alpha_80x100.png"]])


@pytest.mark.parametrize("pix", ["-pq", "-ph"])
def test_color8(corpus, pix):
    assert_parity([*BASE, "-g40x20", pix, "--color8", "-b", "black"],
                  [corpus["gradient_320x200.png"]])


def test_upscale(corpus):
    assert_parity([*BASE, "-g40x20", "-pq", "-U", "-b", "black"],
                  [corpus["tiny_8x6.png"]])


def test_upscale_integer(corpus):
    assert_parity([*BASE, "-g40x20", "-pq", "--upscale=i", "-b", "black"],
                  [corpus["tiny_8x6.png"]])


def test_fit_width(corpus):
    assert_parity([*BASE, "-g30x10", "-pq", "-W", "-b", "black"],
                  [corpus["noise_64x48.png"]])


def test_center(corpus):
    assert_parity([*BASE, "-g40x20", "-pq", "-C", "-b", "black"],
                  [corpus["noise_64x48.png"]])


def test_geometry_partial(corpus):
    assert_parity([*BASE, "-g20x12", "-ph", "-b", "black"],
                  [corpus["noise_64x48.png"]])


def test_multiple_images(corpus):
    assert_parity([*BASE, "-g40x20", "-pq", "-b", "black"],
                  [corpus["noise_64x48.png"], corpus["gradient_320x200.png"]])


def test_grid(corpus):
    assert_parity(
        [*BASE, "-g60x30", "--grid=2", "-pq", "-b", "black"],
        [corpus["noise_64x48.png"], corpus["gradient_320x200.png"],
         corpus["gray_50x40.png"], corpus["tiny_8x6.png"]])


def test_grid_with_titles(corpus):
    assert_parity(
        [*BASE, "-g60x30", "--grid=2x2", "--title", "-pq", "-b", "black"],
        [corpus["noise_64x48.png"], corpus["gradient_320x200.png"],
         corpus["gray_50x40.png"], corpus["tiny_8x6.png"]])


def test_title_format(corpus):
    assert_parity(
        [*BASE, "-g40x20", "--title=%b %wx%h", "-pq", "-b", "black"],
        [corpus["noise_64x48.png"]])


def test_animation_diffing(corpus):
    """GIF playback exercises inter-frame diff output."""
    assert_parity(
        [*BASE, "-g40x20", "-pq", "-b", "black", "--loops=2"],
        [corpus["anim_32x24.gif"]])


def test_animation_frames_limit(corpus):
    assert_parity(
        [*BASE, "-g40x20", "-pq", "-b", "black", "--frames=2", "--loops=1"],
        [corpus["anim_32x24.gif"]])


def test_half_upper_block_env(corpus):
    ref = subprocess.run(
        [REFERENCE_BINARY, *BASE, "-g40x20", "-ph", "-b", "black",
         "-o", "/dev/stdout", corpus["noise_33x27.png"]],
        env={**_CLEAN_ENV, "TIMG_USE_UPPER_BLOCK": "1"},
        capture_output=True, timeout=60).stdout

    from timg_tpu.cli import main
    import tempfile as tf_
    with tf_.NamedTemporaryFile(suffix=".out", delete=False) as tf:
        out = tf.name
    os.environ["TIMG_USE_UPPER_BLOCK"] = "1"
    try:
        main([*BASE, "-g40x20", "-ph", "-b", "black", "-o", out,
              corpus["noise_33x27.png"]])
        with open(out, "rb") as f:
            ours = f.read()
    finally:
        del os.environ["TIMG_USE_UPPER_BLOCK"]
        os.unlink(out)
    assert ref == ours


@pytest.mark.parametrize("extra", [
    ["-U"],                  # plain toggle: must not eat the filename
    ["--title"],             # bare optional_argument before a filename
    ["--title", "--title"],  # --title toggles (timg.cc:667-670)
    ["-U", "-U"],            # -U toggles too (timg.cc:641-650)
    ["--upscale=i"],
    ["--auto-crop"],
    ["--compress"],          # bare --compress means level 1
    ["--loops"],             # bare --loops: next token stays a filename
    ["-w", "abc"],           # atof semantics: garbage wait parses as 0
], ids=lambda e: " ".join(e))
def test_getopt_optional_argument_semantics(corpus, extra):
    """getopt optional_argument parity (ref timg.cc:495-519): these
    flags take a value only when '='-attached; a separate following
    token is a filename.  Byte-compared against the reference binary
    parsing the identical argv."""
    assert_parity([*BASE, "-g40x20", "-pq", "-b", "black", *extra],
                  [corpus["noise_64x48.png"]])


_GOLDEN_FUZZ_POOL = [
    # parity-safe flags only: -a is a no-op in the minimal stb
    # reference build and JPEG decode differs by design (see ROADMAP)
    ["-ph"], ["-pq"],
    ["-b", "teal"], ["-b", "none"], ["-b", "#a0b0c0"],
    ["-B", "#223344"], ["--pattern-size", "2"],
    ["-U"], ["--upscale=i"], ["-W"], ["-C"], ["--color8"],
    ["--title"], ["--title=%b %wx%h"], ["--clear"],
    ["--grid=2"], ["--grid=3x2"],
    ["--frames=2"], ["--frame-offset=1"],
]


def test_golden_fuzz_random_flag_combos(corpus):
    """Randomized flag-combination byte parity vs the reference binary
    (fixed seed): generalizes the enumerated cases above across the
    whole parity-safe flag surface, including combinations no fixed
    case covers (e.g. grid+checkerboard+color8+upscale)."""
    import random

    random.seed(31)
    images = ["noise_64x48.png", "noise_33x27.png", "gradient_320x200.png",
              "alpha_80x100.png", "tiny_8x6.png", "gray_50x40.png",
              "anim_32x24.gif"]
    for _ in range(25):
        args = [*BASE, "--loops=1",
                "-g", random.choice(["40x20", "30x15", "17x9"])]
        for f in random.sample(_GOLDEN_FUZZ_POOL, random.randint(1, 5)):
            args += f
        pool = images
        if "--frame-offset=1" in args:
            # documented deviation: the minimal stb reference build
            # ignores --frame-offset for GIF animations (the parameter
            # is unused in stb-image-source.cc:87); we follow the
            # full-GM build (gm-source.cc:220-222). See ROADMAP.
            pool = [k for k in images if not k.endswith(".gif")]
        files = [corpus[k] for k in
                 random.sample(pool, random.randint(1, 3))]
        assert_parity(args, files)


def test_degenerate_one_px_wide_grid_cell(corpus):
    """1-px-wide quarter targets (e.g. --grid=4 in a 9-cell terminal):
    the reference's AppendDoubleRow<2> reads one pixel past the row
    (unicode-block-canvas.cc:242-244) — past the LAST row that is the
    never-initialized sws scratch row (framebuffer.cc:56-63), so the
    reference binary's bytes here are genuinely nondeterministic
    (observed 4 distinct outputs in 5 runs). We replicate the
    deterministic part (next row's first pixel) and read zero where the
    reference reads garbage (ansi.widen_odd_quarter). This pins: no
    crash, deterministic output, reference-matching structure."""
    import re

    args = [*BASE, "--loops=1", "-g", "9x5", "--grid=4", "--title",
            "--frames=1", "-b", "none", "--frame-offset=2"]
    files = [corpus["tiny_8x6.png"], corpus["noise_33x27.png"]]
    ours1 = run_ours(args, files)
    ours2 = run_ours(args, files)
    assert ours1 == ours2 and ours1  # deterministic, non-empty
    ref = run_reference(args, files)
    strip = re.compile(rb"[0-9]+")
    assert strip.sub(b"#", ref) == strip.sub(b"#", ours1)


def test_tiny_image_with_title_where_reference_crashes(corpus, tmp_path):
    """Upstream bug found by the edge sweep: the reference sizes its
    emission buffer from the pixel content only
    (unicode-block-canvas.cc:405-425 RequestBuffers) but copies the
    title prefix into the same buffer (terminal-canvas.cc:49-58), so a
    tiny image with a title overflows the heap — the reference binary
    aborts with "malloc(): corrupted top size" (reproducible 3/3) on a
    2x2 image at -ph --title. We size correctly; pin no-crash and
    deterministic output."""
    import numpy as np
    from PIL import Image

    p = str(tmp_path / "two_2x2_with_a_reasonably_long_name.png")
    rng = np.random.default_rng(5)
    Image.fromarray(rng.integers(0, 256, (2, 2, 3), dtype=np.uint8)).save(p)
    args = [*BASE, "--loops=1", "-g40x20", "-ph", "-b", "black", "--title"]
    ours1 = run_ours(args, [p])
    ours2 = run_ours(args, [p])
    assert ours1 == ours2 and len(ours1) > 50
    # title rendered (the %f path is trimmed to "...tail" at 40 cells)
    assert os.path.basename(p).encode()[-20:] in ours1
