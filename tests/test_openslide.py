"""OpenSlide source validation against a mock libopenslide ABI.

libopenslide is absent here (the reference gates on WITH_OPENSLIDE,
ref CMakeLists.txt:18); tests/mock_openslide.c implements the nine
bound symbols with a deterministic 3-level pyramid so the reference
strategy (ref src/openslide-source.cc:88-131) — thumbnail preference,
best-level selection, whole-level read_region, ARGB unpremultiply —
executes for real through the ctypes binding.
"""

from __future__ import annotations

import os
import subprocess

import numpy as np
import pytest

from timg_tpu.options import DisplayOptions


@pytest.fixture(scope="module")
def mock_lib(tmp_path_factory):
    src = os.path.join(os.path.dirname(__file__), "mock_openslide.c")
    so = str(tmp_path_factory.mktemp("openslide") / "libopenslide_mock.so")
    subprocess.run(["gcc", "-shared", "-fPIC", src, "-o", so], check=True)
    return so


@pytest.fixture()
def slide_env(mock_lib, monkeypatch):
    import timg_tpu.sources.openslide_source as mod

    monkeypatch.setenv("TIMG_OPENSLIDE_LIB", mock_lib)
    mod._lib.cache_clear()
    yield mod
    mod._lib.cache_clear()


@pytest.fixture()
def slide(tmp_path):
    p = tmp_path / "scan.svs"
    p.write_bytes(b"MOCKSLIDE")
    return str(p)


def _opts(w, h):
    opts = DisplayOptions()
    opts.width, opts.height = w, h
    return opts


def test_thumbnail_preferred_when_large_enough(slide_env, slide):
    src = slide_env.OpenSlideSource(slide)
    # target 200x100 <= thumbnail 300x150 -> thumbnail path
    assert src.load_and_scale(_opts(200, 100), 0, -1)
    assert (src.orig_width, src.orig_height) == (4000, 2000)
    frame = src.frames[0].frame
    assert frame.shape == (100, 200, 4)
    # thumbnail marker: opaque blue left half
    assert tuple(frame[50, 20, :3]) == (0, 0, 200)
    # premultiplied half-alpha right half unpremultiplies to ~0xFF
    assert frame[50, 180, 3] == 128
    assert frame[50, 180, 0] >= 254


def test_level_selection_when_thumbnail_too_small(slide_env, slide):
    src = slide_env.OpenSlideSource(slide)
    # target 800x400 > thumbnail 300x150 -> read_region at best level.
    # downsample = 4000/800 = 5 -> best level with ds<=5 is level 1
    # (ds 4); red channel encodes the level (1*60).
    assert src.load_and_scale(_opts(800, 400), 0, -1)
    frame = src.frames[0].frame
    assert frame.shape == (400, 800, 4)
    assert frame[200, 400, 0] == 60  # level 1 marker survives resize
    # green x-gradient scales with position
    assert frame[200, 780, 1] > frame[200, 20, 1] + 150


def test_full_level0_for_huge_targets(slide_env, slide):
    src = slide_env.OpenSlideSource(slide)
    # downsample < 4 -> level 0 (red marker 0)
    assert src.load_and_scale(_opts(1600, 800), 0, -1)
    assert src.frames[0].frame[100, 100, 0] == 0


def test_error_slide_is_skipped(slide_env, tmp_path):
    bad = tmp_path / "bad.svs"
    bad.write_bytes(b"BADSLIDE\x00")
    src = slide_env.OpenSlideSource(str(bad))
    assert src.load_and_scale(_opts(100, 50), 0, -1) is False


def test_factory_routes_slides_first(slide_env, slide):
    from timg_tpu.sources.base import create_source

    src, err = create_source(slide, _opts(200, 100))
    assert err == ""
    assert src is not None and src.decoder_name == "openslide"
