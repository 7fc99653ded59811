"""Library-API (models) tests."""

from __future__ import annotations

import numpy as np
import pytest

import timg_tpu.models as models


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(2)
    return rng.integers(0, 256, (3, 40, 60, 4), dtype=np.uint8)


def test_registry():
    assert models.available() == ["half", "iterm2", "kitty", "quarter",
                                  "sixel"]


def test_quarter_model(frames):
    m = models.get("quarter")(out_h=20, out_w=30)
    payloads = m.render_batch(frames)
    assert len(payloads) == 3
    assert all(p.startswith(b"\033[") for p in payloads)
    # 10 double-rows -> 10 line terminations
    assert payloads[0].count(b"\033[0m\n") == 10


def test_half_model(frames):
    m = models.get("half")(out_h=20, out_w=30)
    payloads = m.render_batch(frames)
    assert all(b"\xe2\x96" in p for p in payloads)  # block glyphs


def test_sixel_model_cube(frames):
    from timg_tpu.render.sixel_render import decode_sixel_stream

    m = models.get("sixel")(out_h=18, out_w=30, dither="cube")
    payloads = m.render_batch(frames)
    rgb, idx, pal = decode_sixel_stream(payloads[0])
    assert idx.shape[1] == 30


def test_kitty_iterm2_models(frames):
    for name, marker in (("kitty", b"\033_Ga=T"), ("iterm2", b"\033]1337")):
        m = models.get(name)(out_h=16, out_w=24)
        payloads = m.render_batch(frames)
        assert all(p.startswith(marker) for p in payloads)
