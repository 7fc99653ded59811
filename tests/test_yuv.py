"""YUV 4:2:0 device conversion op (ops/yuv.py) and the raw-plane video
transport (sources/video_source.py)."""

from __future__ import annotations

import numpy as np
import pytest

from timg_tpu.ops.yuv import yuv420_to_rgba_words, yuv420_to_rgba_words_np


def _unpack(words):
    w = np.asarray(words).astype(np.uint32)
    return np.stack([(w >> 0) & 0xFF, (w >> 8) & 0xFF,
                     (w >> 16) & 0xFF, (w >> 24) & 0xFF], axis=-1)


@pytest.mark.parametrize("full_range", [True, False])
@pytest.mark.parametrize("h,w", [(48, 64), (47, 63), (2, 2), (17, 129)])
def test_device_matches_mirror(full_range, h, w):
    rng = np.random.default_rng(h * 100 + w + full_range)
    ch, cw = (h + 1) // 2, (w + 1) // 2
    y = rng.integers(0, 256, (3, h, w), dtype=np.uint8)
    u = rng.integers(0, 256, (3, ch, cw), dtype=np.uint8)
    v = rng.integers(0, 256, (3, ch, cw), dtype=np.uint8)
    dev = np.asarray(yuv420_to_rgba_words(y, u, v, full_range))
    ref = yuv420_to_rgba_words_np(y, u, v, full_range)
    np.testing.assert_array_equal(dev, ref)


def test_gray_full_range():
    """Neutral chroma + full range: RGB == Y exactly."""
    y = np.arange(256, dtype=np.uint8).reshape(1, 16, 16)
    u = np.full((1, 8, 8), 128, np.uint8)
    v = np.full((1, 8, 8), 128, np.uint8)
    rgba = _unpack(yuv420_to_rgba_words_np(y, u, v, True))
    np.testing.assert_array_equal(rgba[..., 0], y)
    np.testing.assert_array_equal(rgba[..., 1], y)
    np.testing.assert_array_equal(rgba[..., 2], y)
    assert (rgba[..., 3] == 255).all()


def test_limited_range_endpoints():
    """Limited range: Y=16 -> 0, Y=235 -> 255, clamped outside."""
    y = np.array([[[0, 16, 235, 255]]], np.uint8).repeat(2, 1)
    u = np.full((1, 1, 2), 128, np.uint8)
    v = np.full((1, 1, 2), 128, np.uint8)
    rgba = _unpack(yuv420_to_rgba_words_np(y, u, v, False))
    np.testing.assert_array_equal(rgba[0, 0, :, 0], [0, 0, 255, 255])
    np.testing.assert_array_equal(rgba[0, 0, :, 1], [0, 0, 255, 255])


def test_constant_chroma_upsample_is_constant():
    """Interstitial upsampling of a constant plane stays constant, so a
    solid-color frame converts to a solid color."""
    y = np.full((1, 10, 14), 90, np.uint8)
    u = np.full((1, 5, 7), 200, np.uint8)
    v = np.full((1, 5, 7), 60, np.uint8)
    rgba = _unpack(yuv420_to_rgba_words_np(y, u, v, True))
    for c in range(3):
        assert (rgba[..., c] == rgba[0, 0, 0, c]).all()


def test_primary_colors_full_range():
    """BT.601 primaries land on the expected RGB corners (+-2 LSB of
    fixed-point rounding)."""
    # (y, u, v) for pure red/green/blue at full range
    cases = {(76, 85, 255): (255, 0, 0),
             (150, 44, 21): (0, 255, 0),
             (29, 255, 107): (0, 0, 255)}
    for (yy, uu, vv), want in cases.items():
        y = np.full((1, 2, 2), yy, np.uint8)
        u = np.full((1, 1, 1), uu, np.uint8)
        v = np.full((1, 1, 1), vv, np.uint8)
        got = _unpack(yuv420_to_rgba_words_np(y, u, v, True))[0, 0, 0, :3]
        assert np.abs(got.astype(int) - np.array(want)).max() <= 2, \
            (got, want)


# ---------------------------------------------------------------------------
# Video source transport
# ---------------------------------------------------------------------------

from timg_tpu.native import runtime  # noqa: E402

needs_native = pytest.mark.skipif(runtime.load() is None,
                                  reason="native video helper not built")


@pytest.fixture(scope="module")
def y4m_file(tmp_path_factory):
    w, h, n = 64, 48, 6
    path = tmp_path_factory.mktemp("yuv") / "clip.y4m"
    rng = np.random.default_rng(3)
    # Photo-like content: noisy luma, *smooth* chroma.  Random chroma
    # would make the comparison test below meaningless -- sws and our
    # interstitial upsampler have different siting phases, and the
    # difference scales with local chroma contrast.
    yy, xx = np.mgrid[0:h // 2, 0:w // 2]
    with open(path, "wb") as f:
        f.write(b"YUV4MPEG2 W64 H48 F25:1 Ip A1:1 C420jpeg\n")
        for i in range(n):
            f.write(b"FRAME\n")
            f.write(rng.integers(0, 256, (h, w), dtype=np.uint8).tobytes())
            f.write((64 + 2 * xx + 3 * i).astype(np.uint8).tobytes())
            f.write((200 - 3 * yy - 2 * i).astype(np.uint8).tobytes())
    return str(path)


def _collect_frames(y4m, monkeypatch, force_rgba: bool):
    from timg_tpu.options import DisplayOptions
    from timg_tpu.sources.video_source import VideoSource

    if force_rgba:
        monkeypatch.setenv("TIMG_TPU_VIDEO_RGBA", "1")
    else:
        monkeypatch.delenv("TIMG_TPU_VIDEO_RGBA", raising=False)
    opts = DisplayOptions()
    opts.width, opts.height = 80, 40
    opts.cell_x_px = opts.cell_y_px = 2
    opts.bgcolor_getter = lambda: (0, 0, 0, 255)
    src = VideoSource(y4m)
    assert src.load_and_scale(opts, 0, -1)
    frames = []
    src.send_frames(float("inf"), 1, lambda: False,
                    lambda dx, dy, fb, seq, t: frames.append(fb))
    return src, frames


@needs_native
def test_yuv_transport_selected(y4m_file, monkeypatch):
    src, frames = _collect_frames(y4m_file, monkeypatch, force_rgba=False)
    assert src._use_yuv
    # this libav build reports UNSPECIFIED range for y4m C420jpeg (the
    # sws path therefore also runs limited-range); both transports
    # follow the library's signal, keeping them consistent
    assert not src._full_range
    assert len(frames) == 6
    assert frames[0].dtype == np.uint8 and frames[0].shape[-1] == 4


@needs_native
def test_yuv_transport_matches_sws_path(y4m_file, monkeypatch):
    """Raw-plane transport + device BT.601 vs host swscale: same frames
    within a couple of LSBs (different but equivalent fixed-point
    pipelines; a systematic offset would mean a range/coefficient bug)."""
    _, ours = _collect_frames(y4m_file, monkeypatch, force_rgba=False)
    _, sws = _collect_frames(y4m_file, monkeypatch, force_rgba=True)
    assert len(ours) == len(sws)
    for a, b in zip(ours, sws):
        assert a.shape == b.shape
        diff = np.abs(a.astype(int) - b.astype(int))
        assert diff.max() <= 6, diff.max()
        assert diff.mean() < 1.0
