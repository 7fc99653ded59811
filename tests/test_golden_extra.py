"""Additional golden byte-parity coverage: clear-screen, frame offsets,
filelists, QOI decode, stdin, exit codes."""

from __future__ import annotations

import os
import struct
import subprocess
import tempfile

import numpy as np
import pytest

from tests.conftest import REFERENCE_BINARY, has_reference
from tests.corpus import build_corpus
from tests.test_golden import (CORPUS_DIR, _CLEAN_ENV, assert_parity,
                               run_ours, run_reference)

pytestmark = pytest.mark.skipif(
    not has_reference(), reason="reference binary not built")


@pytest.fixture(scope="session")
def corpus():
    return build_corpus(CORPUS_DIR)


BASE = ["--debug-no-frame-delay"]


def test_clear_before_first(corpus):
    assert_parity([*BASE, "-g40x20", "-pq", "-b", "black", "--clear"],
                  [corpus["noise_64x48.png"], corpus["gray_50x40.png"]])


def test_clear_every(corpus):
    assert_parity([*BASE, "-g40x20", "-pq", "-b", "black", "--clear=every"],
                  [corpus["noise_64x48.png"], corpus["gray_50x40.png"]])


def test_frame_offset_gif(corpus, tmp_path):
    """--frame-offset on animations follows the full-featured reference
    (GraphicsMagick source honors it, gm-source.cc:220-223; the minimal
    stb build ignores it, so this is a self-consistency check): output
    with offset=2 equals output of a GIF missing its first 2 frames."""
    from PIL import Image, ImageSequence

    img = Image.open(corpus["anim_32x24.gif"])
    frames = [f.convert("RGBA") for f in ImageSequence.Iterator(img)]
    trimmed = str(tmp_path / "trimmed.gif")
    frames[2].convert("RGB").save(
        trimmed, save_all=True,
        append_images=[f.convert("RGB") for f in frames[3:]],
        duration=100, loop=0)

    args = [*BASE, "-g40x20", "-pq", "-b", "black", "--loops=1"]
    with_offset = run_ours([*args, "--frame-offset=2"],
                           [corpus["anim_32x24.gif"]])
    trimmed_out = run_ours(args, [trimmed])
    assert with_offset == trimmed_out


def test_no_hide_cursor(corpus):
    assert_parity([*BASE, "-g40x20", "-pq", "-b", "black", "-E"],
                  [corpus["noise_64x48.png"]])


def test_filelist(corpus, tmp_path):
    listfile = tmp_path / "list.txt"
    listfile.write_text(f"{corpus['noise_64x48.png']}\n"
                        f"{corpus['gray_50x40.png']}\n")
    assert_parity([*BASE, "-g40x20", "-pq", "-b", "black",
                   "-f", str(listfile)], [])


def _write_qoi(path: str, rgba: np.ndarray) -> None:
    """Minimal valid QOI: header + QOI_OP_RGBA per pixel + end marker."""
    h, w = rgba.shape[:2]
    out = bytearray(b"qoif")
    out += struct.pack(">IIBB", w, h, 4, 0)
    for px in rgba.reshape(-1, 4):
        out += bytes([0xFF, px[0], px[1], px[2], px[3]])
    out += b"\x00" * 7 + b"\x01"
    with open(path, "wb") as f:
        f.write(out)


def test_qoi_decode_parity(tmp_path):
    rng = np.random.default_rng(8)
    rgba = rng.integers(0, 256, (30, 44, 4), dtype=np.uint8)
    rgba[..., 3] = 255
    path = str(tmp_path / "img.qoi")
    _write_qoi(path, rgba)
    assert_parity([*BASE, "-g40x20", "-pq", "-b", "black"], [path])


def test_qoi_decoder_roundtrip(tmp_path):
    from timg_tpu.sources.qoi_source import decode_qoi

    rng = np.random.default_rng(9)
    rgba = rng.integers(0, 4, (10, 12, 4), dtype=np.uint8) * 60
    rgba[..., 3] = 255
    path = str(tmp_path / "x.qoi")
    _write_qoi(path, rgba)
    with open(path, "rb") as f:
        got = decode_qoi(f.read())
    assert np.array_equal(got, rgba)


def test_stdin_image(corpus):
    with open(corpus["noise_64x48.png"], "rb") as f:
        data = f.read()
    ref = subprocess.run(
        [REFERENCE_BINARY, *BASE, "-g40x20", "-pq", "-b", "black",
         "-o", "/dev/stdout", "-"],
        input=data, env=_CLEAN_ENV, capture_output=True).stdout
    ours = subprocess.run(
        ["python", os.path.join(os.path.dirname(REFERENCE_BINARY),
                                "..", "..", "timg-tpu"),
         *BASE, "-g40x20", "-pq", "-b", "black", "-o", "/dev/stdout", "-"],
        input=data, env={**_CLEAN_ENV,
                         "JAX_PLATFORMS": "cpu"},
        capture_output=True).stdout
    assert ref == ours


def test_exit_code_missing_file():
    from timg_tpu.cli import main

    assert main(["--debug-no-frame-delay", "-g20x10",
                 "/nonexistent/file.png"]) == 1


def test_exit_code_mixed_good_and_undecodable(tmp_path, corpus):
    """A readable-but-undecodable file is a read error (exit 1) even
    when another file succeeds and the failure is silent — the
    reference sets kImageReadError on every null Create result and
    only *queues* non-empty messages (timg.cc:960-963)."""
    from timg_tpu.cli import main

    junk = tmp_path / "junk.dat"
    junk.write_bytes(b"not an image at all" * 10)
    with tempfile.NamedTemporaryFile() as tf:
        rc = main(["--debug-no-frame-delay", "-g20x10", "-pq",
                   "-b", "black", "-o", tf.name,
                   corpus["noise_64x48.png"], str(junk)])
    assert rc == 1


def test_error_summary_at_exactly_four(tmp_path, capsys):
    """The reference prints '... total of N errors' already when its
    show-budget of 4 is exhausted, i.e. at exactly 4 (timg.cc:993-999)."""
    from timg_tpu.cli import main

    missing = [str(tmp_path / f"nope{i}.png") for i in range(4)]
    rc = main(["--debug-no-frame-delay", "-g20x10", "-o", "/dev/null",
               *missing])
    assert rc == 1
    err = capsys.readouterr().err
    assert "total of 4 errors" in err
    # three errors: all shown, no summary line
    rc = main(["--debug-no-frame-delay", "-g20x10", "-o", "/dev/null",
               *missing[:3]])
    assert rc == 1
    assert "total of" not in capsys.readouterr().err


def test_cell_size_warning_for_animation(tmp_path, capsys, corpus):
    """Unknown cell size + pixel protocol + animation: the reference
    warns at the end of the run (timg.cc:742-767, 1105-1116)."""
    from PIL import Image

    from timg_tpu.cli import main

    gif = tmp_path / "a.gif"
    frames = [Image.new("RGB", (16, 12), (i * 60, 0, 0)) for i in range(3)]
    frames[0].save(gif, save_all=True, append_images=frames[1:],
                   duration=30, loop=0)
    rc = main(["--debug-no-frame-delay", "-g20x10", "-pk", "-b", "black",
               "--loops=1", "-o", "/dev/null", str(gif)])
    assert rc == 0
    err = capsys.readouterr().err
    assert "Terminal does not support pixel size query" in err
    assert "kitty graphics" in err
    # still image: no warning
    main(["--debug-no-frame-delay", "-g20x10", "-pk", "-b", "black",
          "-o", "/dev/null", corpus["noise_64x48.png"]])
    assert "pixel size query" not in capsys.readouterr().err


def test_exit_code_bad_geometry():
    from timg_tpu.cli import main

    assert main(["-gabc", "/tmp/x.png"]) == 2


def test_exit_code_success(corpus):
    from timg_tpu.cli import main

    with tempfile.NamedTemporaryFile() as tf:
        assert main(["--debug-no-frame-delay", "-g20x10", "-pq",
                     "-b", "black", "-o", tf.name,
                     corpus["noise_64x48.png"]]) == 0


def test_exit_code_missing_filelist(tmp_path):
    """-f with an unreadable filelist -> EXIT_FILELIST_PROBLEM (5)."""
    from timg_tpu.cli import main

    rc = main(["-g20x10", "-f", str(tmp_path / "nope.txt")])
    assert rc == 5


def test_exit_code_unwritable_output(tmp_path, corpus):
    """-o into a nonexistent directory -> EXIT_CANT_OPEN_OUTPUT (4)."""
    from timg_tpu.cli import main

    rc = main(["-g20x10", "-o", str(tmp_path / "no" / "dir" / "x.bin"),
               corpus["noise_64x48.png"]])
    assert rc == 4


def test_gray16_png_parity(corpus):
    """16-bit grayscale PNG: stb reduces 16->8 with v>>8
    (stbi__convert_16_to_8); PIL's convert() would clip at 255 and
    white out the image -- _to_rgba mirrors stb."""
    from tests.test_golden import assert_parity

    assert_parity(["--debug-no-frame-delay", "-g40x20", "-pq",
                   "-b", "black"], [corpus["gray16_48x32.png"]])


def test_bmp_alpha_parity(corpus):
    """32-bit BMP: stb reads the 4th byte as alpha (opaque only when
    the whole plane is zero); PIL's BGRX raw mode would drop it.
    _to_rgba re-wires the decoder to BGRA -- byte parity with the
    reference binary proves it."""
    from tests.test_golden import assert_parity

    assert_parity(["--debug-no-frame-delay", "-g40x20", "-pq",
                   "-b", "black"], [corpus["alpha_40x30.bmp"]])
    assert_parity(["--debug-no-frame-delay", "-g40x20", "-pq",
                   "-b", "#204060"], [corpus["alpha_40x30.bmp"]])


def test_stb_longtail_formats_parity(tmp_path):
    """TGA / binary PNM decode byte-identically to the reference's stb
    fallback (stb_image.h tga/pnm loaders); lossless raw formats, so
    PIL and stb must agree exactly."""
    from PIL import Image

    rng = np.random.default_rng(7)
    a = rng.integers(0, 256, (40, 52, 3), dtype=np.uint8)
    files = []
    for name, img, mode in [("t.tga", a, "RGB"), ("t.ppm", a, "RGB"),
                            ("t.pgm", a[:, :, 0], "L")]:
        p = str(tmp_path / name)
        Image.fromarray(img, mode).save(p)
        files.append(p)
    assert_parity([*BASE, "-g40x20", "-pq", "-b", "black"], files)
