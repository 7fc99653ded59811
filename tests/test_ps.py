"""PostScript source tests against a mock ghostscript delegate.

The environment has no gs binary (mirroring a GM build without the gs
delegate), so the gating diagnostic is the live path; the rendering
path is exercised with a fake `gs` executable that records its argv
and emits deterministic PNG pages, validating the subprocess contract
(device/dpi/output-pattern flags, EPSCrop for .eps), multi-page
stacking, and --frame-offset/--frames subsetting.
"""

import os
import stat
import sys

import numpy as np
import pytest

from timg_tpu.options import DisplayOptions
from timg_tpu.sources import ps_source
from timg_tpu.sources.ps_source import PSSource, _page_size_points

PS_BODY = (b"%!PS-Adobe-3.0\n"
           b"%%BoundingBox: 0 0 200 100\n"
           b"%%Pages: 2\n"
           b"showpage\nshowpage\n")


def _options(**kw):
    opts = DisplayOptions()
    opts.width = 160
    opts.height = 96
    opts.cell_x_px = 2
    opts.cell_y_px = 2
    for k, v in kw.items():
        setattr(opts, k, v)
    return opts


@pytest.fixture()
def fake_gs(tmp_path, monkeypatch):
    """A gs stand-in: writes its argv to gs_args.txt and renders two
    solid-color pages sized from the requested dpi and the 200x100 pt
    BoundingBox (so the supersampling contract is observable)."""
    argfile = tmp_path / "gs_args.txt"
    script = tmp_path / "gs"
    script.write_text(f"""#!{sys.executable}
import sys
open({str(argfile)!r}, "w").write("\\n".join(sys.argv[1:]))
out = dpi = None
for a in sys.argv[1:]:
    if a.startswith("-sOutputFile="):
        out = a[len("-sOutputFile="):]
    if a.startswith("-r"):
        dpi = float(a[2:])
import numpy as np
from PIL import Image
w, h = round(200 * dpi / 72.0), round(100 * dpi / 72.0)
for page, lum in ((1, 40), (2, 200)):
    arr = np.full((h, w, 3), lum, dtype=np.uint8)
    Image.fromarray(arr).save(out % page)
""")
    script.chmod(script.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setattr(ps_source, "find_gs", lambda: str(script))
    return argfile


@pytest.fixture()
def ps_file(tmp_path):
    p = tmp_path / "doc.ps"
    p.write_bytes(PS_BODY)
    return str(p)


def test_gated_diagnostic_without_gs(ps_file, monkeypatch):
    monkeypatch.setattr(ps_source, "find_gs", lambda: None)
    src = PSSource(ps_file)
    with pytest.raises(RuntimeError, match="ghostscript"):
        src.load_and_scale(_options(), 0, -1)


def test_factory_surfaces_gs_hint(ps_file, monkeypatch):
    monkeypatch.setattr(ps_source, "find_gs", lambda: None)
    from timg_tpu.sources.base import create_source
    src, err = create_source(ps_file, _options())
    assert src is None
    assert "ghostscript" in err


def test_bounding_box_parse(ps_file, tmp_path):
    assert _page_size_points(ps_file) == (200.0, 100.0)
    nobox = tmp_path / "n.ps"
    nobox.write_bytes(b"%!PS\nshowpage\n")
    assert _page_size_points(str(nobox)) == (612.0, 792.0)
    bad = tmp_path / "b.ps"
    bad.write_bytes(b"%!PS\n%%BoundingBox: 10 10 5 5\n")
    assert _page_size_points(str(bad)) == (612.0, 792.0)


def test_two_pages_render_stacked(ps_file, fake_gs):
    src = PSSource(ps_file)
    assert src.load_and_scale(_options(), 0, -1)
    assert len(src.frames) == 2
    assert src.orig_width == 200 and src.orig_height == 100
    # 200x100pt page into a 160x96 box -> 160x80 target
    assert src.frames[0].frame.shape[:2] == (80, 160)
    # page luminances survive the resize (solid pages)
    assert int(src.frames[0].frame[0, 0, 0]) == 40
    assert int(src.frames[1].frame[0, 0, 0]) == 200
    assert not src.is_animation_before_frame_limit()
    sent = []
    src.send_frames(float("inf"), 1, lambda: False,
                    lambda dx, dy, fr, seq, eof: sent.append((dx, dy, seq)))
    from timg_tpu.render.sequencer import SeqType
    assert [s[2] for s in sent] == [SeqType.FRAME_IMMEDIATE] * 2
    assert all(s[1] == 0 for s in sent)  # stacked, never repositioned

    args = fake_gs.read_text().splitlines()
    assert "-sDEVICE=png16m" in args
    assert "-dSAFER" in args
    assert not any(a == "-dEPSCrop" for a in args)  # .ps, not .eps
    # 160/200 and 96/100 both < 1 -> no supersampling: 72 dpi
    assert any(a == "-r72" for a in args)


def test_frame_offset_and_count(ps_file, fake_gs):
    src = PSSource(ps_file)
    assert src.load_and_scale(_options(), 1, -1)
    assert len(src.frames) == 1
    assert int(src.frames[0].frame[0, 0, 0]) == 200  # page 2

    src = PSSource(ps_file)
    assert src.load_and_scale(_options(), 0, 1)
    assert len(src.frames) == 1
    assert int(src.frames[0].frame[0, 0, 0]) == 40  # page 1 only


def test_eps_adds_epscrop_and_supersamples(tmp_path, fake_gs):
    p = tmp_path / "fig.eps"
    p.write_bytes(PS_BODY)
    opts = _options()
    opts.width, opts.height = 800, 400  # > page pts: supersample
    opts.upscale = True
    src = PSSource(str(p))
    assert src.load_and_scale(opts, 0, -1)
    args = fake_gs.read_text().splitlines()
    assert "-dEPSCrop" in args
    # 800/200 = 4x -> 288 dpi
    assert any(a == "-r288" for a in args)
    assert src.frames[0].frame.shape[:2] == (400, 800)


def test_rejects_non_dsc_and_wrong_suffix(tmp_path):
    bineps = tmp_path / "x.eps"
    bineps.write_bytes(b"\xc5\xd0\xd3\xc6" + b"\x00" * 30)  # DOS EPS
    assert not PSSource(str(bineps)).load_and_scale(_options(), 0, -1)
    png = tmp_path / "y.png"
    png.write_bytes(b"\x89PNG\r\n\x1a\n")
    assert not PSSource(str(png)).load_and_scale(_options(), 0, -1)
