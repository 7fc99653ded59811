"""CLI flag-surface tests (parsing refinements, ref timg.cc sieve)."""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pytest
from PIL import Image

from timg_tpu.cli import main


@pytest.fixture(scope="module")
def img():
    path = os.path.join(tempfile.gettempdir(), "timg_cli_test.png")
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 256, (30, 40, 3), dtype=np.uint8)).save(path)
    yield path
    os.unlink(path)


def _run(args, img_path):
    with tempfile.NamedTemporaryFile(suffix=".out", delete=False) as tf:
        out = tf.name
    try:
        rc = main([*args, "--debug-no-frame-delay", "-o", out, img_path])
        with open(out, "rb") as f:
            return rc, f.read()
    finally:
        os.unlink(out)


def test_partial_geometry_width_only(img):
    rc, out = _run(["-g20x10", "-pq", "-b", "black"], img)
    assert rc == 0 and out


def test_partial_geometry_x_height(img):
    # 'x10' leaves width from terminal (absent -> invalid -> exit 3)
    rc = main(["-gx10", "-pq", img])
    assert rc == 3


def test_bad_rotate(img):
    assert main(["--rotate=sideways", img]) == 2


def test_bad_grid(img):
    assert main(["--grid=abc", img]) == 2


def test_unknown_pixelation_warns_but_continues(img, capsys):
    rc, out = _run(["-g20x10", "-pz", "-b", "black"], img)
    assert rc == 0  # falls back to default pixelation


def test_grid_single_number(img):
    rc, out = _run(["-g40x20", "--grid=2", "-pq", "-b", "black"], img)
    assert rc == 0 and out


def test_loops_legacy_c_flag(img):
    rc, out = _run(["-g20x10", "-c", "1", "-pq", "-b", "black"], img)
    assert rc == 0


def test_threads_flag(img):
    rc, out = _run(["-g20x10", "--threads=2", "-pq", "-b", "black"], img)
    assert rc == 0


def test_title_format_escapes(img):
    rc, out = _run(["-g40x20", "--title=%b %w %h %D %%", "-pq",
                    "-b", "black"], img)
    assert rc == 0
    assert b"timg_cli_test.png 40 30" in out


def test_duration_zero_note(img, capsys):
    rc, out = _run(["-g20x10", "-t", "0", "-pq", "-b", "black"], img)
    assert rc == 0


def test_env_pixelation(img, monkeypatch):
    monkeypatch.setenv("TIMG_PIXELATION", "h")
    rc, out = _run(["-g20x10", "-b", "black"], img)
    assert rc == 0
    # half-block glyphs, not quarter
    assert "▄".encode() in out or b"\033[" in out


def test_no_files():
    assert main(["-g20x10"]) == 1


def test_sigint_mid_animation_resets_terminal(tmp_path):
    """SIGINT during an endlessly-looping animation: the process exits
    promptly, the cursor is restored on stdout (ControlWrites still
    flush, ref buffered-write-sequencer.cc:108-111), and the terminal
    reset sequence goes to stderr (ref timg.cc:998-1005)."""
    import signal
    import subprocess
    import sys
    import time

    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(0)
    gif = str(tmp_path / "loop.gif")
    frames = [Image.fromarray(
        rng.integers(0, 256, (16, 20, 3), dtype=np.uint8), "RGB")
        for _ in range(4)]
    frames[0].save(gif, save_all=True, append_images=frames[1:],
                   duration=50, loop=0)
    out = str(tmp_path / "o.bin")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        "import os,sys;"
        "os.environ['TIMG_TPU_FORCE_NUMPY']='1';"
        f"sys.path.insert(0,{repo!r});"
        "from timg_tpu.cli import main;"
        f"sys.exit(main(['-pq','-g20x10','-b','black','-o',{out!r},"
        f"{gif!r}]))"
    )
    proc = subprocess.Popen([sys.executable, "-c", code],
                            stderr=subprocess.PIPE)
    # wait until frames are actually flowing (cold start under a
    # loaded machine can exceed any fixed sleep)
    deadline = time.time() + 30
    while time.time() < deadline:
        if os.path.exists(out) and os.path.getsize(out) > 2048:
            break
        time.sleep(0.25)
    else:
        raise AssertionError("animation never started")
    time.sleep(0.3)                   # mid-frame is fine; mid-loop better
    proc.send_signal(signal.SIGINT)
    try:
        rc = proc.wait(timeout=30)
    except subprocess.TimeoutExpired:
        proc.kill()
        raise AssertionError("CLI did not exit after SIGINT")
    stderr = proc.stderr.read()
    assert rc == 0, rc
    data = open(out, "rb").read()
    assert b"\033[?25h" in data[-64:]      # cursor restored at the end
    assert b"\033[0m\033[" in stderr       # terminal reset on stderr


def test_jpeg_draft_downscale_keeps_true_dims():
    """Large JPEGs decode at a DCT scale factor >= target (role of ref
    jpeg-source.cc:184-195) while titles keep the file's dimensions."""
    import tempfile as tf

    from timg_tpu.options import DisplayOptions
    from timg_tpu.sources.pil_source import PILSource

    rng = np.random.default_rng(6)
    big = rng.integers(0, 256, (512, 768, 3)).astype(np.uint8)
    with tf.TemporaryDirectory() as td:
        path = os.path.join(td, "big.jpg")
        Image.fromarray(big).save(path, quality=90)
        opts = DisplayOptions()
        opts.width, opts.height = 96, 64
        src = PILSource(path)
        assert src.load_and_scale(opts, 0, -1)
        # true dimensions survive for %w/%h (ref FormatFromParameters)
        assert (src.orig_width, src.orig_height) == (768, 512)
        assert "768x512" in src.format_title("%wx%h")
        # and the draft actually engaged (decoded below full size)
        assert src._true_orig == (768, 512)
        # output is at the computed target, not the draft size
        assert src.frames[0].frame.shape[1] <= 96


def test_jpeg_small_no_draft():
    """Small JPEGs (scale factor < 2) decode at full resolution."""
    import tempfile as tf

    from timg_tpu.options import DisplayOptions
    from timg_tpu.sources.pil_source import PILSource

    rng = np.random.default_rng(6)
    img_a = rng.integers(0, 256, (60, 80, 3)).astype(np.uint8)
    with tf.TemporaryDirectory() as td:
        path = os.path.join(td, "small.jpg")
        Image.fromarray(img_a).save(path)
        opts = DisplayOptions()
        opts.width, opts.height = 64, 48
        src = PILSource(path)
        assert src.load_and_scale(opts, 0, -1)
        assert getattr(src, "_true_orig", None) is None
