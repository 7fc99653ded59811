"""SVG source tests (librsvg/cairo via ctypes)."""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pytest

from timg_tpu.sources.svg_source import _load, render_svg, svg_intrinsic_size

pytestmark = pytest.mark.skipif(_load() is None,
                                reason="librsvg/cairo unavailable")

_SVG = """<svg xmlns="http://www.w3.org/2000/svg" width="100" height="80">
  <rect width="100" height="80" fill="#336699"/>
  <circle cx="50" cy="40" r="30" fill="#ffcc00"/>
</svg>"""


@pytest.fixture(scope="module")
def svg_file():
    with tempfile.NamedTemporaryFile(suffix=".svg", delete=False,
                                     mode="w") as f:
        f.write(_SVG)
    yield f.name
    os.unlink(f.name)


def test_intrinsic_size(svg_file):
    assert svg_intrinsic_size(svg_file) == (100, 80)


def test_render(svg_file):
    rgba = render_svg(svg_file, 100, 80)
    assert rgba.shape == (80, 100, 4)
    assert tuple(rgba[0, 0]) == (0x33, 0x66, 0x99, 255)   # corner: rect
    assert tuple(rgba[40, 50, :3]) == (0xFF, 0xCC, 0x00)  # center: circle


def test_render_stretched(svg_file):
    rgba = render_svg(svg_file, 200, 80, intrinsic=(100, 80))
    assert rgba.shape == (80, 200, 4)
    # 2x horizontal stretch: left edge still rect color, center circle
    assert tuple(rgba[0, 0]) == (0x33, 0x66, 0x99, 255)
    assert tuple(rgba[40, 100, :3]) == (0xFF, 0xCC, 0x00)


def test_source_through_cli(svg_file):
    from tests.test_golden import run_ours

    out = run_ours(["--debug-no-frame-delay", "-g20x10", "-pq",
                    "-b", "black"], [svg_file])
    assert b"48;2;51;102;153" in out
