"""Dormant real-library integration suite (VERDICT r3 #4).

Every binding in this build is validated against mock ABIs or our own
oracles because the real libraries are absent in this image.  These
tests close that loop the moment an environment provides them: each is
marked ``real_lib(<name>)`` and auto-skips otherwise.  Run the matrix
with ``pytest tests/test_real_libs.py -m real_lib -rs``.

The big one is libsixel: the north-star claim "bit-identical sixel
streams" currently rests on our quant.c reimplementation
(ops/libsixel_quant.py, C mirror in timg_native.cc) being faithful to
libsixel's algorithm (ref src/sixel-canvas.cc:134-148 pins the exact
settings: 256 colors, SIXEL_LARGE_LUM, SIXEL_REP_AVERAGE_COLORS,
SIXEL_QUALITY_AUTO).  test_real_libsixel_stream_byte_identity performs
the actual byte diff.  If it ever fails, tests/test_libsixel_vectors.py
localizes which quant.c stage diverged.
"""

import ctypes
import os
import shutil
import subprocess

import numpy as np
import pytest

pytestmark = []


def _load_first(*names):
    for n in names:
        try:
            return ctypes.CDLL(n)
        except OSError:
            continue
    raise OSError("none of %r loadable" % (names,))


# libsixel constants (sixel.h, stable public ABI; the reference uses
# exactly these, ref sixel-canvas.cc:139-142)
SIXEL_PIXELFORMAT_RGBA8888 = 0x11
SIXEL_LARGE_LUM = 0x02
SIXEL_REP_AVERAGE_COLORS = 0x02
SIXEL_QUALITY_AUTO = 0x00


@pytest.mark.real_lib("libsixel")
def test_real_libsixel_stream_byte_identity():
    """Our quantizer + assembler vs the real libsixel encoder, driven
    exactly as the reference drives it (sixel_dither_new(256) +
    sixel_dither_initialize(LARGE_LUM, REP_AVERAGE_COLORS, AUTO) +
    sixel_encode, ref sixel-canvas.cc:134-148): the DCS payloads must
    be byte-identical."""
    lib = _load_first("libsixel.so.1", "libsixel.so")
    lib.sixel_output_new.restype = ctypes.c_int
    lib.sixel_dither_new.restype = ctypes.c_int
    WRITE_FN = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_char_p,
                                ctypes.c_int, ctypes.c_void_p)
    chunks = []

    @WRITE_FN
    def write_cb(data, size, _priv):
        chunks.append(ctypes.string_at(data, size))
        return size

    from timg_tpu.ops import libsixel_quant as lsq
    from timg_tpu.render.sixel_render import encode_sixel_stream

    rng = np.random.default_rng(0)
    for case in range(4):
        h, w = (24, 36) if case % 2 else (30, 30)
        fb = np.zeros((h, w, 4), np.uint8)
        if case < 2:  # flat + edge content
            fb[..., 0] = 40
            fb[..., 1] = 180
            fb[h // 2:, :, 2] = 220
        else:         # noisy content
            fb[..., :3] = rng.integers(0, 256, (h, w, 3))
        fb[..., 3] = 255

        chunks.clear()
        out = ctypes.c_void_p()
        assert lib.sixel_output_new(ctypes.byref(out), write_cb, None,
                                    None) == 0
        dither = ctypes.c_void_p()
        assert lib.sixel_dither_new(ctypes.byref(dither), 256, None) == 0
        buf = np.ascontiguousarray(fb)
        assert lib.sixel_dither_initialize(
            dither, buf.ctypes.data, w, h, SIXEL_PIXELFORMAT_RGBA8888,
            SIXEL_LARGE_LUM, SIXEL_REP_AVERAGE_COLORS,
            SIXEL_QUALITY_AUTO) == 0
        assert lib.sixel_encode(buf.ctypes.data, w, h, 0, dither,
                                out) == 0
        lib.sixel_dither_destroy(dither)
        lib.sixel_output_destroy(out)
        real = b"".join(chunks)

        indices, palette = lsq.quantize_reference(fb)
        ours = encode_sixel_stream(indices, palette)
        assert ours == real, (
            f"case {case}: first divergence at byte "
            f"{next((i for i, (a, b) in enumerate(zip(ours, real)) if a != b), min(len(ours), len(real)))}"
            f" (ours {len(ours)}B, real {len(real)}B) — use "
            "tests/test_libsixel_vectors.py to localize the quant.c "
            "stage")


@pytest.mark.real_lib("poppler")
def test_real_poppler_renders_pdf(tmp_path):
    """PDFSource against the real poppler-glib (binding today validated
    only against tests/mock_poppler.c; ref pdf-image-source.cc:57-141)."""
    from timg_tpu.options import DisplayOptions
    from timg_tpu.sources.pdf_source import PDFSource

    pdf = tmp_path / "t.pdf"
    pdf.write_bytes(
        b"%PDF-1.4\n"
        b"1 0 obj<</Type/Catalog/Pages 2 0 R>>endobj\n"
        b"2 0 obj<</Type/Pages/Kids[3 0 R]/Count 1>>endobj\n"
        b"3 0 obj<</Type/Page/Parent 2 0 R/MediaBox[0 0 72 72]"
        b"/Contents 4 0 R>>endobj\n"
        b"4 0 obj<</Length 44>>stream\n"
        b"0 0 1 rg 10 10 50 50 re f\n"
        b"endstream endobj\n"
        b"trailer<</Root 1 0 R>>\n%%EOF\n")
    opts = DisplayOptions()
    opts.width, opts.height = 40, 40
    src = PDFSource(str(pdf))
    assert src.load_and_scale(opts, 0, -1)
    frames = []
    src.send_frames(1e9, 1, lambda: False,
                    lambda x, dy, fb, seq, t: frames.append(fb))
    assert frames and frames[0].shape[2] == 4
    # white background painted (ref pdf-image-source.cc:104-106), blue
    # rectangle rendered somewhere
    assert (frames[0][..., 3] == 255).all()


@pytest.mark.real_lib("openslide")
def test_real_openslide_error_path():
    """Binding loads the real library and handles a non-slide file
    gracefully (ref openslide-source.cc:88-131)."""
    from timg_tpu.options import DisplayOptions
    from timg_tpu.sources.openslide_source import OpenSlideSource

    opts = DisplayOptions()
    opts.width, opts.height = 20, 20
    src = OpenSlideSource("/etc/hostname")
    assert src.load_and_scale(opts, 0, -1) is False


@pytest.mark.real_lib("gs")
def test_real_gs_renders_ps(tmp_path):
    """PSSource with a real ghostscript (the delegate today is
    mock-tested; GM's PS coder shells out the same way)."""
    from timg_tpu.options import DisplayOptions
    from timg_tpu.sources.ps_source import PSSource

    ps = tmp_path / "t.ps"
    ps.write_bytes(b"%!PS-Adobe-3.0 EPSF-3.0\n"
                   b"%%BoundingBox: 0 0 72 72\n"
                   b"1 0 0 setrgbcolor 10 10 50 50 rectfill showpage\n")
    opts = DisplayOptions()
    opts.width, opts.height = 40, 40
    src = PSSource(str(ps))
    assert src.load_and_scale(opts, 0, -1)


@pytest.mark.real_lib("tmux")
def test_real_tmux_passthrough(tmp_path):
    """Kitty output inside a real tmux: the passthrough-wrapped APC
    stream reaches the output and allow-passthrough got enabled
    (ref kitty-canvas.cc:83-111)."""
    from PIL import Image

    rng = np.random.default_rng(2)
    png = tmp_path / "x.png"
    Image.fromarray(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8),
                    "RGB").save(png)
    out = tmp_path / "tmux.out"
    sess = f"timgtest{os.getpid()}"
    subprocess.run(["tmux", "new-session", "-d", "-s", sess], check=True)
    try:
        cmd = (f"cd /root/repo && TERM=xterm-kitty ./timg-tpu -pk "
               f"-g20x10 -b black --debug-no-frame-delay "
               f"-o {out} {png}; tmux wait -S done{sess}")
        subprocess.run(["tmux", "send-keys", "-t", sess, cmd, "Enter"],
                       check=True)
        subprocess.run(["tmux", "wait", f"done{sess}"], timeout=120,
                       check=True)
        data = out.read_bytes()
        assert b"\033Ptmux;" in data  # passthrough wrapping engaged
    finally:
        subprocess.run(["tmux", "kill-session", "-t", sess], check=False)
