"""PDF source binding tests against a mock poppler-glib ABI.

poppler-glib is absent in this environment (the reference would be
configured without WITH_POPPLER), so the ctypes binding body
(ref src/pdf-image-source.cc:43-141 semantics) is exercised against
tests/mock_poppler.c — a tiny .so implementing the five poppler symbols
the binding uses, rendering deterministic shapes through the *real*
cairo so the scale/translate/white-paint/channel-swap path runs for
real.
"""

from __future__ import annotations

import os
import subprocess
import tempfile

import numpy as np
import pytest

from timg_tpu.options import DisplayOptions


def _have_cairo_and_gobject() -> bool:
    import ctypes
    try:
        ctypes.CDLL("libcairo.so.2")
        ctypes.CDLL("libgobject-2.0.so.0")
        return True
    except OSError:
        return False


@pytest.fixture(scope="module")
def mock_lib(tmp_path_factory):
    if not _have_cairo_and_gobject():
        pytest.skip("cairo/gobject unavailable")
    src = os.path.join(os.path.dirname(__file__), "mock_poppler.c")
    so = str(tmp_path_factory.mktemp("poppler") / "libpoppler_mock.so")
    subprocess.run(["gcc", "-shared", "-fPIC", src, "-o", so,
                    "-l:libcairo.so.2"], check=True)
    return so


@pytest.fixture()
def pdf_source_with_mock(mock_lib, monkeypatch):
    import timg_tpu.sources.pdf_source as mod

    monkeypatch.setenv("TIMG_POPPLER_GLIB_LIB", mock_lib)
    monkeypatch.setattr(mod, "_tried", False)
    monkeypatch.setattr(mod, "_libs", None)
    yield mod
    mod._tried = False
    mod._libs = None


@pytest.fixture()
def fake_pdf(tmp_path):
    p = tmp_path / "doc.pdf"
    p.write_bytes(b"%PDF-1.4 mock")
    return str(p)


def _opts(w=200, h=100):
    opts = DisplayOptions()
    opts.width, opts.height = w, h
    return opts


def test_pages_render_scaled_with_white_background(pdf_source_with_mock,
                                                   fake_pdf):
    src = pdf_source_with_mock.PDFSource(fake_pdf)
    assert src.load_and_scale(_opts(100, 100), 0, -1)
    assert src.max_frames == 3          # all mock pages
    assert (src.orig_width, src.orig_height) == (200, 100)
    frame = src.frames[0].frame
    # 200x100 page fit into 100x100 -> 100x50, opaque
    assert frame.shape == (50, 100, 4)
    assert (frame[..., 3] == 255).all()
    # left half blue on white right half (scaled by 0.5)
    assert tuple(frame[30, 30, :3]) == (0, 0, 255)
    assert tuple(frame[30, 80, :3]) == (255, 255, 255)
    # red square at origin scaled to 10x10
    assert tuple(frame[4, 4, :3]) == (255, 0, 0)


def test_page_range_from_frame_offset_and_count(pdf_source_with_mock,
                                                fake_pdf):
    src = pdf_source_with_mock.PDFSource(fake_pdf)
    assert src.load_and_scale(_opts(), 1, 1)
    assert src.max_frames == 1
    src2 = pdf_source_with_mock.PDFSource(fake_pdf)
    assert src2.load_and_scale(_opts(), 2, -1)
    assert src2.max_frames == 1  # pages 2..end


def test_auto_crop_uses_bounding_box(pdf_source_with_mock, fake_pdf):
    opts = _opts(100, 100)
    opts.auto_crop = True
    src = pdf_source_with_mock.PDFSource(fake_pdf)
    assert src.load_and_scale(opts, 0, -1)
    # mock bbox is 100x50 at (50,25): red origin square is outside it
    assert (src.orig_width, src.orig_height) == (100, 50)
    frame = src.frames[0].frame
    assert frame.shape == (50, 100, 4)
    assert tuple(frame[4, 4, :3]) == (0, 0, 255)   # blue, no red square
    assert tuple(frame[25, 75, :3]) == (255, 255, 255)


def test_pages_sent_as_immediate_frames(pdf_source_with_mock, fake_pdf):
    from timg_tpu.render.sequencer import SeqType

    src = pdf_source_with_mock.PDFSource(fake_pdf)
    assert src.load_and_scale(_opts(), 0, -1)
    assert not src.is_animation_before_frame_limit()
    sent = []
    src.send_frames(1e9, -1, lambda: False,
                    lambda dx, dy, f, seq, t: sent.append((dx, dy, seq)))
    # every page exactly once even with loops=-1, all immediate, stacked
    assert len(sent) == 3
    assert all(s == (0, 0, SeqType.FRAME_IMMEDIATE) for s in sent)


def test_non_pdf_and_bad_pdf_fall_through(pdf_source_with_mock, tmp_path):
    src = pdf_source_with_mock.PDFSource(str(tmp_path / "x.png"))
    assert src.load_and_scale(_opts(), 0, -1) is False
    bad = tmp_path / "bad.pdf"
    bad.write_bytes(b"not a pdf")
    src2 = pdf_source_with_mock.PDFSource(str(bad))
    assert src2.load_and_scale(_opts(), 0, -1) is False


def test_gated_hint_without_poppler(monkeypatch, tmp_path):
    import timg_tpu.sources.pdf_source as mod

    monkeypatch.setenv("TIMG_POPPLER_GLIB_LIB", "/nonexistent.so")
    monkeypatch.setattr(mod, "_tried", False)
    monkeypatch.setattr(mod, "_libs", None)
    p = tmp_path / "doc.pdf"
    p.write_bytes(b"%PDF-1.4")
    src = mod.PDFSource(str(p))
    with pytest.raises(RuntimeError, match="poppler-glib"):
        src.load_and_scale(_opts(), 0, -1)
    mod._tried = False
    mod._libs = None


def test_cli_renders_pdf_through_mock(pdf_source_with_mock, fake_pdf):
    from timg_tpu.cli import main

    with tempfile.NamedTemporaryFile(suffix=".out", delete=False) as tf:
        out = tf.name
    try:
        rc = main(["-g40x20", "-pq", "-b", "black",
                   "--debug-no-frame-delay", "-o", out, fake_pdf])
        assert rc == 0
        data = open(out, "rb").read()
        assert data.count(b"\033[0m\n") >= 3  # three stacked pages
    finally:
        os.unlink(out)
