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


def test_sixel_model_yuv_transport():
    """render_batch_yuv: 4:2:0 planes in, sixel streams out, matching
    render_batch on the equivalently converted RGBA frames."""
    from timg_tpu.ops.yuv import yuv420_to_rgba_words_np

    rng = np.random.default_rng(9)
    h, w = 40, 60
    y = rng.integers(0, 256, (2, h, w), dtype=np.uint8)
    u = rng.integers(0, 256, (2, h // 2, w // 2), dtype=np.uint8)
    v = rng.integers(0, 256, (2, h // 2, w // 2), dtype=np.uint8)

    # identity size: the YUV path uses the lean video resize while
    # render_batch uses the stb-exact one, so only the no-resize case
    # is pixel-identical between them
    m = models.get("sixel")(h, w, dither="cube")
    got = m.render_batch_yuv(y, u, v, full_range=True)
    assert len(got) == 2 and all(s.startswith(b"\033Pq") for s in got)

    words = yuv420_to_rgba_words_np(y, u, v, True)
    rgba = words.view(np.uint8).reshape(2, h, w, 4)
    want = m.render_batch(rgba)
    assert got == want

    # resizing variant still produces well-formed streams
    m2 = models.get("sixel")(24, 36, dither="adaptive")
    streams = m2.render_batch_yuv(y, u, v, full_range=True)
    assert len(streams) == 2
    assert all(s.startswith(b"\033Pq") and s.endswith(b"\033\\")
               for s in streams)


def test_sixel_model_adaptive_reuse():
    """adaptive_reuse builds the palette once (CLI video semantics):
    same palette header across batches, one batched dither dispatch,
    and reset_palette() rebuilds from the next frame."""
    rng = np.random.default_rng(21)
    a = rng.integers(0, 255, (2, 24, 32, 4), dtype=np.uint8)
    b = rng.integers(0, 255, (2, 24, 32, 4), dtype=np.uint8)
    a[..., 3] = b[..., 3] = 255

    m = models.get("sixel")(24, 32, dither="adaptive", adaptive_reuse=True)
    sa = m.render_batch(a)
    sb = m.render_batch(b)

    # all frames of both batches share the first frame's palette
    pal_defs = [s.split(b"#")[1:257] for s in sa + sb]
    assert all(p == pal_defs[0] for p in pal_defs[1:])

    m.reset_palette()
    sb2 = m.render_batch(b)
    # after reset the palette comes from b's first frame: differs from
    # the a-derived palette with overwhelming probability
    assert sb2[0].split(b"#")[1:257] != pal_defs[0]

    # per-frame mode (default) rebuilds per frame: palettes differ
    m2 = models.get("sixel")(24, 32, dither="adaptive")
    s2 = m2.render_batch(a)
    assert s2[0].split(b"#")[1:257] != s2[1].split(b"#")[1:257]
