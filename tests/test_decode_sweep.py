"""Decoder long-tail sweep (VERDICT r2 #6).

Two parts:

* multipage-TIFF semantics pinned to the reference's actual rule:
  GraphicsMagick's multi-image blacklist is exactly {.ico, .pdf, .ps,
  .txt} (ref src/graphics-magick-source.cc:196-198), so a multipage
  TIFF *is* ``could_be_animation`` and plays as a coalesced animation
  with the sub-centisecond -> 100 ms delay rule (ref :79-82).
  Mixed-size pages follow GM's coalesceImages: every page composites
  onto the FIRST page's canvas at (0,0), each over the previous
  result (ref :208-213; pil_source._coalesce_frames).

* a format-fuzz sweep: every suffix both our build and the minimal
  reference build (stb decode) can read is generated via PIL and the
  quarter-block streams byte-compared, catching silent decode
  divergence anywhere in the long tail. JPEG is excluded with cause
  (stb's own IDCT vs libjpeg-turbo differ by +-1 LSB; see ROADMAP).
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from PIL import Image

from tests.conftest import has_reference
from tests.test_golden import run_ours, run_reference


@pytest.fixture()
def multipage_tiff(tmp_path):
    rng = np.random.default_rng(6)
    pages = [Image.fromarray(
        rng.integers(0, 256, (20, 30, 3), dtype=np.uint8))
        for _ in range(4)]
    p = str(tmp_path / "pages.tiff")
    pages[0].save(p, save_all=True, append_images=pages[1:])
    return p


def test_multipage_tiff_is_animation(multipage_tiff):
    """TIFF is not in the GM multi-image blacklist -> animation with
    100 ms per page (ref graphics-magick-source.cc:196-214, :79-82)."""
    from timg_tpu.options import DisplayOptions
    from timg_tpu.sources.pil_source import PILSource

    opts = DisplayOptions(width=60, height=40, cell_x_px=2, cell_y_px=2,
                          width_stretch=2.0)
    src = PILSource(multipage_tiff)
    assert src.load_and_scale(opts, 0, -1)
    assert len(src.frames) == 4
    assert all(f.delay_ms == 100.0 for f in src.frames)
    assert src.is_animation_before_frame_limit()
    assert not src.multi_image  # .ico-style stacking is blacklist-only


def test_multipage_tiff_cli_frame_limits(multipage_tiff):
    """--frames / --frame-offset apply to TIFF pages like any
    animation (one repositioning cursor-up per extra frame)."""
    base = ["--debug-no-frame-delay", "-pq", "-g40x20", "-b", "black",
            "--loops=1"]
    out_all = run_ours(base, [multipage_tiff])
    assert out_all.count(b"\033[") > 0
    # 4 frames: 3 cursor-up repositions between animation frames
    import re
    assert len(re.findall(rb"\033\[\d+A", out_all)) == 3
    out_two = run_ours(base + ["--frames=2"], [multipage_tiff])
    assert len(re.findall(rb"\033\[\d+A", out_two)) == 1
    out_off = run_ours(base + ["--frame-offset=3"], [multipage_tiff])
    assert len(re.findall(rb"\033\[\d+A", out_off)) == 0


def test_mixed_size_tiff_coalesces(tmp_path):
    """GM coalesceImages semantics for mixed-size pages: first-page
    canvas, later pages composited at (0,0) over the previous result
    (ref graphics-magick-source.cc:208-213)."""
    from timg_tpu.options import DisplayOptions
    from timg_tpu.sources.pil_source import PILSource, _coalesce_frames

    # unit semantics: opaque small page over a solid first page
    first = np.full((40, 60, 4), (200, 10, 10, 255), dtype=np.uint8)
    small = np.full((20, 30, 4), (10, 10, 200, 255), dtype=np.uint8)
    out = _coalesce_frames([first, small])
    assert out[0].shape == out[1].shape == (40, 60, 4)
    assert (out[1][:20, :30] == (10, 10, 200, 255)).all()   # pasted
    assert (out[1][20:, :] == (200, 10, 10, 255)).all()     # remnants
    assert (out[1][:20, 30:] == (200, 10, 10, 255)).all()
    # translucent page: Over operator, not a paste
    translucent = np.full((20, 30, 4), (0, 0, 0, 128), dtype=np.uint8)
    blended = _coalesce_frames([first, translucent])[1]
    assert (blended[:20, :30, 0] < 200).all()
    assert (blended[:20, :30, 3] == 255).all()

    # through PILSource: every frame lands on the first page's canvas
    pages = [Image.fromarray(first[..., :3]),
             Image.fromarray(small[..., :3])]
    p = str(tmp_path / "mixed.tiff")
    pages[0].save(p, save_all=True, append_images=pages[1:])
    opts = DisplayOptions(width=60, height=40, cell_x_px=1, cell_y_px=1,
                          width_stretch=1.0)
    src = PILSource(p)
    assert src.load_and_scale(opts, 0, -1)
    assert len(src.frames) == 2
    assert src.orig_width == 60 and src.orig_height == 40
    shapes = {f.frame.shape[:2] for f in src.frames}
    assert len(shapes) == 1  # one shared canvas geometry


def test_ico_remains_stacked(tmp_path):
    """Counter-case: .ico is blacklisted -> independent stacked images
    (no repositioning), per the same reference rule."""
    import re
    rng = np.random.default_rng(8)
    imgs = [Image.fromarray(
        rng.integers(0, 256, (s, s, 3), dtype=np.uint8))
        for s in (16, 32)]
    p = str(tmp_path / "multi.ico")
    imgs[0].save(p, sizes=[(16, 16), (32, 32)], append_images=imgs[1:])
    out = run_ours(["--debug-no-frame-delay", "-pq", "-g40x20",
                    "-b", "black"], [p])
    assert not re.findall(rb"\033\[\d+A", out)


# ---------------------------------------------------------------------------
# Suffix fuzz sweep vs the reference binary
# ---------------------------------------------------------------------------

def _gen_images(tmp_path):
    """(name, path) for every format both builds decode, PIL-written."""
    rng = np.random.default_rng(31)
    rgb = rng.integers(0, 256, (33, 47, 3), dtype=np.uint8)
    rgba = rng.integers(0, 256, (21, 26, 4), dtype=np.uint8)
    gray = rng.integers(0, 256, (18, 29), dtype=np.uint8)
    out = []

    def save(name, img, **kw):
        p = str(tmp_path / name)
        img.save(p, **kw)
        out.append((name, p))

    save("rgb.png", Image.fromarray(rgb))
    save("rgba.png", Image.fromarray(rgba))
    save("gray.png", Image.fromarray(gray))
    save("pal.png", Image.fromarray(rgb).quantize(colors=40))
    save("rgb.bmp", Image.fromarray(rgb))
    save("gray.bmp", Image.fromarray(gray).convert("L"))
    save("rgb.tga", Image.fromarray(rgb))
    save("rgba.tga", Image.fromarray(rgba))
    save("rgb.ppm", Image.fromarray(rgb))
    save("gray.pgm", Image.fromarray(gray))
    save("still.gif", Image.fromarray(rgb).quantize(colors=64))
    return out


@pytest.mark.skipif(not has_reference(), reason="reference not built")
def test_suffix_sweep_byte_parity(tmp_path):
    """Every PIL-written format stb can read: quarter-block streams
    must be byte-identical (silent-divergence fuzz)."""
    args = ["--debug-no-frame-delay", "-pq", "-g40x20", "-b", "black"]
    failures = []
    for name, path in _gen_images(tmp_path):
        ref = run_reference(args, [path])
        ours = run_ours(args, [path])
        if not ref:
            failures.append(f"{name}: reference produced no output")
        elif ref != ours:
            n = next((i for i, (a, b) in enumerate(zip(ref, ours))
                      if a != b), min(len(ref), len(ours)))
            failures.append(f"{name}: diverges at byte {n} "
                            f"({len(ref)} vs {len(ours)} bytes)")
    assert not failures, "\n".join(failures)


@pytest.mark.skipif(not has_reference(), reason="reference not built")
def test_animated_gif_sweep_byte_parity(tmp_path):
    """Animated GIF with per-frame delays and disposal: full animation
    stream parity (decode + delays + repositioning)."""
    rng = np.random.default_rng(5)
    frames = [Image.fromarray(
        rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)).quantize(64)
        for _ in range(3)]
    p = str(tmp_path / "anim.gif")
    frames[0].save(p, save_all=True, append_images=frames[1:],
                   duration=40, loop=0)
    args = ["--debug-no-frame-delay", "-pq", "-g40x20", "-b", "black",
            "--loops=1"]
    assert run_reference(args, [p]) == run_ours(args, [p])


def test_truncated_gif_salvages_intact_frames(tmp_path):
    """A GIF truncated mid-animation renders the frames that decode
    intact (the stb reference stops at the first failed
    stbi__gif_load_next and shows what it got, stb-image-source.cc:
    119-139). Byte parity with stb is not possible for the *partially*
    decoded frame (stb zero-fills the missing LZW tail; PIL refuses
    the frame) — documented deviation; the intact-frame salvage is
    pinned here."""
    from timg_tpu.options import DisplayOptions
    from timg_tpu.sources.pil_source import PILSource

    rng = np.random.default_rng(3)
    frames = [Image.fromarray(
        rng.integers(0, 256, (20, 24, 3), dtype=np.uint8))
        for _ in range(3)]
    full = str(tmp_path / "a.gif")
    frames[0].save(full, save_all=True, append_images=frames[1:],
                   duration=30)
    data = open(full, "rb").read()
    trunc = str(tmp_path / "t.gif")
    with open(trunc, "wb") as f:
        f.write(data[:int(len(data) * 0.6)])

    opts = DisplayOptions(width=60, height=40, cell_x_px=2, cell_y_px=2,
                          width_stretch=2.0)
    src = PILSource(trunc)
    assert src.load_and_scale(opts, 0, -1)
    assert 1 <= len(src.frames) < 3  # salvaged the intact prefix


def test_malformed_qoi_and_svg_reject_cleanly(tmp_path):
    """Malformed container inputs must be rejected without crashes or
    unbounded allocations (the absurd-dims QOI header advertises a
    64-exabyte image)."""
    import struct

    from timg_tpu.options import DisplayOptions
    from timg_tpu.sources.qoi_source import QOISource

    opts = DisplayOptions(width=40, height=30, cell_x_px=2, cell_y_px=2,
                          width_stretch=2.0)
    rng = np.random.default_rng(13)

    def qoi_header(w, h, ch=4, cs=0):
        return b"qoif" + struct.pack(">IIBB", w, h, ch, cs)

    cases = [
        b"qoif",
        qoi_header(0, 0),
        qoi_header(10, 10),
        qoi_header(10, 10) + bytes(rng.integers(0, 256, 20,
                                                dtype=np.uint8)),
        qoi_header(0xFFFFFFFF, 0xFFFFFFFF) + b"\x00" * 64,
        qoi_header(4, 4, 9, 9) + b"\x00" * 64,
    ]
    for i, data in enumerate(cases):
        p = str(tmp_path / f"q{i}.qoi")
        open(p, "wb").write(data)
        try:
            assert not QOISource(p).load_and_scale(opts, 0, -1)
        except MemoryError:
            raise AssertionError(f"unbounded allocation for case {i}")
        except Exception:
            pass  # clean rejection

    try:
        from timg_tpu.sources.svg_source import SVGSource, _load
    except ImportError:
        return
    if _load() is None:
        return  # librsvg absent: gated
    svgs = [
        b"<svg",
        b"<svg xmlns='http://www.w3.org/2000/svg' width='1e30'"
        b" height='1e30'/>",
        b"<svg>" + bytes(rng.integers(32, 127, 3000,
                                      dtype=np.uint8)) + b"</svg>",
    ]
    for i, data in enumerate(svgs):
        p = str(tmp_path / f"s{i}.svg")
        open(p, "wb").write(data)
        try:
            SVGSource(p).load_and_scale(opts, 0, -1)
        except (ValueError, OSError, RuntimeError):
            pass  # clean rejection
