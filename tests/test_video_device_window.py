"""Device-resident sixel video windows (round 4).

The legacy video flow fetched resized RGBA frames to host and then
re-uploaded them for dithering — 2x ~4 B/px of link traffic per window.
prime_sixel_video_device keeps pixels on device end-to-end; these tests
pin byte identity against the legacy path (TIMG_TPU_VIDEO_DEVICE_WINDOW
=0) across all three dither modes, and the lazy DeviceFrame contract.
"""

import os

import numpy as np
import pytest

pytest.importorskip("jax")


def _y4m(tmp_path, w=64, h=48, n=5):
    p = tmp_path / "v.y4m"
    rng = np.random.default_rng(9)
    with open(p, "wb") as f:
        f.write(("YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C420jpeg\n"
                 % (w, h)).encode())
        for i in range(n):
            y = np.full((h, w), 70 + 15 * i, np.uint8)
            y[:, w // 3:] = 180 - 10 * i
            y[10:30, 10:40] = rng.integers(16, 236, (20, 30),
                                           dtype=np.uint8)
            f.write(b"FRAME\n")
            f.write(y.tobytes())
            f.write(np.full((h // 2, w // 2), 115, np.uint8).tobytes())
            f.write(np.full((h // 2, w // 2), 135, np.uint8).tobytes())
    return str(p)


def _run_cli_pty(argv, out_path, monkeypatch, device_window: bool):
    from tests.test_protocols import _with_scripted_pty
    from timg_tpu.cli import main as cli_main

    monkeypatch.setenv("TIMG_TPU_FORCE_DEVICE", "1")
    monkeypatch.setenv("TIMG_TPU_VIDEO_DEVICE_WINDOW",
                       "1" if device_window else "0")

    def inner(slave):
        saved = os.dup(1)
        try:
            os.dup2(slave, 1)
            rc = cli_main(argv + ["-o", str(out_path)])
        finally:
            os.dup2(saved, 1)
            os.close(saved)
        assert rc == 0
        return out_path.read_bytes()

    return _with_scripted_pty(inner, {})


@pytest.mark.parametrize("dither", ["libsixel", "cube", "adaptive"])
def test_device_window_byte_identity(dither, tmp_path, monkeypatch):
    y4m = _y4m(tmp_path)
    argv = ["--debug-no-frame-delay", "-g40x20", "-ps", "-b", "black",
            "--loops=1", f"--dither={dither}", y4m]
    fast = _run_cli_pty(argv, tmp_path / "fast.out", monkeypatch, True)
    legacy = _run_cli_pty(argv, tmp_path / "legacy.out", monkeypatch,
                          False)
    assert fast == legacy
    assert fast.count(b"\033Pq") == 5


def test_device_window_engages(tmp_path, monkeypatch):
    """The fast path actually runs (DeviceFrame placeholders reach the
    sink) and pixels materialize lazily with correct content."""
    from timg_tpu.options import DisplayOptions
    from timg_tpu.render import plane_cache

    monkeypatch.setenv("TIMG_TPU_FORCE_DEVICE", "1")
    monkeypatch.delenv("TIMG_TPU_VIDEO_DEVICE_WINDOW", raising=False)
    rng = np.random.default_rng(3)
    b, h, w = 3, 24, 32
    ys = rng.integers(16, 236, (b, h, w), dtype=np.uint8)
    us = np.full((b, h // 2, w // 2), 110, np.uint8)
    vs = np.full((b, h // 2, w // 2), 150, np.uint8)
    opts = DisplayOptions()
    opts.sixel_batch_dither = "cube"
    opts.bgcolor_getter = lambda: (0, 0, 0, 255)
    frames = plane_cache.prime_sixel_video_device(
        ys, us, vs, 12, 16, True, opts, {})
    assert frames is not None and len(frames) == b
    f0 = frames[0]
    assert isinstance(f0, plane_cache.DeviceFrame)
    assert f0.shape == (12, 16, 4)
    primed = plane_cache.SIXEL_PLANES.pop(f0)
    assert primed is not None
    # lazy materialization: correct alpha + plausible pixels
    arr = np.asarray(f0)
    assert arr.shape == (12, 16, 4)
    assert (arr[..., 3] == 255).all()
    # __getitem__ contract used by canvas fallbacks
    np.testing.assert_array_equal(f0[2:5], arr[2:5])


def test_device_window_pad_rows_opaque_bg(monkeypatch):
    """Sixel pad rows with an opaque background: the bg RGBA word has
    alpha<<24 set, which overflows a naive np.int32() (found by a live
    -g80x24 run; regression).  The padded rows must carry the bg."""
    from timg_tpu.options import DisplayOptions
    from timg_tpu.render import plane_cache

    monkeypatch.setenv("TIMG_TPU_FORCE_DEVICE", "1")
    monkeypatch.delenv("TIMG_TPU_VIDEO_DEVICE_WINDOW", raising=False)
    b, h, w = 2, 20, 32
    th = 10   # padded_h = 12 > th: the pad branch runs
    ys = np.full((b, h, w), 120, np.uint8)
    us = np.full((b, h // 2, w // 2), 128, np.uint8)
    vs = np.full((b, h // 2, w // 2), 128, np.uint8)
    opts = DisplayOptions()
    opts.sixel_batch_dither = "cube"
    opts.bgcolor_getter = lambda: (0, 0, 0, 255)   # alpha 255 -> bit 31
    frames = plane_cache.prime_sixel_video_device(
        ys, us, vs, th, w, True, opts, {})
    assert frames is not None and len(frames) == b
    assert np.asarray(frames[0]).shape == (th, w, 4)


def test_device_window_disabled_uses_legacy(tmp_path, monkeypatch):
    from timg_tpu.options import DisplayOptions
    from timg_tpu.render import plane_cache

    monkeypatch.setenv("TIMG_TPU_VIDEO_DEVICE_WINDOW", "0")
    opts = DisplayOptions()
    opts.sixel_batch_dither = "cube"
    assert plane_cache.prime_sixel_video_device(
        np.zeros((1, 12, 16), np.uint8), np.zeros((1, 6, 8), np.uint8),
        np.zeros((1, 6, 8), np.uint8), 12, 16, True, opts, {}) is None


def _run_cli_file(argv, out_path, monkeypatch, device_window: bool):
    from timg_tpu.cli import main as cli_main

    monkeypatch.setenv("TIMG_TPU_FORCE_DEVICE", "1")
    monkeypatch.setenv("TIMG_TPU_VIDEO_DEVICE_WINDOW",
                       "1" if device_window else "0")
    rc = cli_main(argv + ["-o", str(out_path)])
    assert rc == 0
    return out_path.read_bytes()


@pytest.mark.parametrize("mode,geometry", [
    ("-pq", "-g40x20"),
    ("-ph", "-g40x20"),
    ("-pq", "-g41x21"),   # odd output height: blank-row pad path
])
def test_block_device_window_byte_identity(mode, geometry, tmp_path,
                                           monkeypatch):
    """Block-mode video through the device window == legacy path,
    including the window-boundary diffs carried via the device tail
    (13 frames = two windows; diffs across the 8-frame boundary)."""
    y4m = _y4m(tmp_path, n=13)
    argv = ["--debug-no-frame-delay", geometry, mode, "-b", "black",
            "--loops=1", y4m]
    fast = _run_cli_file(argv, tmp_path / "bfast.out", monkeypatch, True)
    legacy = _run_cli_file(argv, tmp_path / "blegacy.out", monkeypatch,
                           False)
    assert fast == legacy
    assert fast


def test_block_device_window_multi_loop(tmp_path, monkeypatch):
    """Looping rewinds keep the carried tail consistent."""
    y4m = _y4m(tmp_path, n=4)
    argv = ["--debug-no-frame-delay", "-g40x20", "-pq", "-b", "black",
            "--loops=3", y4m]
    fast = _run_cli_file(argv, tmp_path / "l1.out", monkeypatch, True)
    legacy = _run_cli_file(argv, tmp_path / "l2.out", monkeypatch, False)
    assert fast == legacy


def test_deviceframe_reshape_fallback(monkeypatch):
    """The ANSI canvas's host-diff fallback reshapes padded frames when
    no device diff mask applies (e.g. a skipped prime); DeviceFrame
    must materialize transparently there."""
    import jax.numpy as jnp

    from timg_tpu.render.plane_cache import DeviceFrame

    words = jnp.arange(2 * 4 * 6, dtype=jnp.int32).reshape(2, 4, 6)
    f = DeviceFrame(words, 1, 4, 6)
    r = f.reshape(2, 2, 6, 1, 4)
    np.testing.assert_array_equal(r, np.asarray(f).reshape(2, 2, 6, 1, 4))


def test_block_device_window_geometry_change_mid_stream(tmp_path,
                                                        monkeypatch):
    """Two videos of different sizes back-to-back: the second source's
    first frame cannot diff against the first's last (shape mismatch)
    and must take the full-emit path identically in both flows."""
    from timg_tpu.cli import main as cli_main

    y1 = _y4m(tmp_path, w=64, h=48, n=3)
    os.rename(y1, str(tmp_path / "a.y4m"))
    y2 = _y4m(tmp_path, w=48, h=36, n=3)
    os.rename(y2, str(tmp_path / "b.y4m"))
    argv = ["--debug-no-frame-delay", "-g40x20", "-pq", "-b", "black",
            "--loops=1", str(tmp_path / "a.y4m"), str(tmp_path / "b.y4m")]
    outs = {}
    for dw in ("1", "0"):
        monkeypatch.setenv("TIMG_TPU_FORCE_DEVICE", "1")
        monkeypatch.setenv("TIMG_TPU_VIDEO_DEVICE_WINDOW", dw)
        out = tmp_path / f"g{dw}.out"
        assert cli_main(argv + ["-o", str(out)]) == 0
        outs[dw] = out.read_bytes()
    assert outs["1"] == outs["0"]


def test_verbose_reports_transport_stats(tmp_path, monkeypatch, capsys):
    """--verbose surfaces the device->host transport accounting for
    sustained sixel sessions — and only the traffic of THIS run (serve
    mode reuses the process, so the counters are snapshotted)."""
    y4m = _y4m(tmp_path)
    argv = ["--debug-no-frame-delay", "-g40x20", "-ps", "-b", "black",
            "--loops=1", "--dither=cube", "--verbose", y4m]
    _run_cli_pty(argv, tmp_path / "v.out", monkeypatch, True)
    err = capsys.readouterr().err
    assert "Device->host sixel transport:" in err
    line = [ln for ln in err.splitlines()
            if ln.startswith("Device->host sixel transport:")][0]
    assert " 0.0x)" not in line  # a real ratio was computed

    # A second run reports its own traffic, not the accumulated total.
    _run_cli_pty(argv, tmp_path / "v2.out", monkeypatch, True)
    err2 = capsys.readouterr().err
    line2 = [ln for ln in err2.splitlines()
             if ln.startswith("Device->host sixel transport:")][0]
    assert line2 == line


def test_verbose_still_keeps_reference_text(tmp_path, monkeypatch, capsys):
    """One-shot stills never print the TPU-extra transport line: their
    verbose output stays reference-shaped (ref timg.cc:1007-1104)."""
    from PIL import Image

    from timg_tpu.cli import main as cli_main

    png = tmp_path / "s.png"
    Image.new("RGB", (32, 24), (10, 120, 200)).save(png)
    monkeypatch.setenv("TIMG_TPU_FORCE_NUMPY", "1")
    rc = cli_main(["--debug-no-frame-delay", "-g40x20", "-pq",
                   "-b", "black", "--verbose", str(png),
                   "-o", str(tmp_path / "s.out")])
    assert rc == 0
    assert "Device->host sixel transport:" not in capsys.readouterr().err


def _apng(tmp_path, w=48, h=36, n=4):
    """Animated PNG with real transparency (the transparent-codec video
    path: resize + on-device bg compose)."""
    from PIL import Image

    rng = np.random.default_rng(21)
    p = tmp_path / "anim.png"
    frames = []
    for i in range(n):
        a = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
        a[:, : w // 3, 3] = 0          # fully transparent stripe
        a[h // 3:, :, 3] = 255         # opaque lower block
        frames.append(Image.fromarray(a, "RGBA"))
    frames[0].save(p, save_all=True, append_images=frames[1:],
                   duration=40, loop=0)
    return str(p)


def _pin_kitty_ids(monkeypatch):
    """Kitty image ids are time-seeded once and count across in-process
    runs; pin them so two cli_main invocations emit identical bytes."""
    from timg_tpu.render import kitty
    monkeypatch.setattr(kitty, "_id_start", 400000)
    monkeypatch.setattr(kitty, "_id_counter", 0)


@pytest.mark.parametrize("mode", ["-pk", "-pi", "-pq"])
def test_pixel_video_transparent_compose_byte_identity(mode, tmp_path,
                                                       monkeypatch):
    """VERDICT r4 #8: kitty/iTerm2 (and block) video rows in the window
    A/B matrix.  The transparent-codec path now composes the background
    on the device-resident window (single final D2H); bytes must equal
    the legacy fetch-compose-refetch flow."""
    apng = _apng(tmp_path)
    argv = ["--debug-no-frame-delay", "-g40x20", mode, "-b", "gray",
            "--loops=1", apng]
    _pin_kitty_ids(monkeypatch)
    fast = _run_cli_pty(argv, tmp_path / "fast.out", monkeypatch, True)
    _pin_kitty_ids(monkeypatch)
    legacy = _run_cli_pty(argv, tmp_path / "legacy.out", monkeypatch,
                          False)
    assert fast == legacy, mode
    assert fast  # stream non-empty


def test_pixel_video_device_window_engages(monkeypatch):
    """kitty/iTerm2 sessions get DeviceFrame placeholders (VERDICT r4
    #8): convert+resize stay on device and the RGBA D2H is deferred to
    encode time; pixels match the eager fused jit bit-for-bit."""
    from timg_tpu.options import DisplayOptions
    from timg_tpu.render import plane_cache
    from timg_tpu.sources.video_source import _get_yuv_jit

    monkeypatch.setenv("TIMG_TPU_FORCE_DEVICE", "1")
    monkeypatch.delenv("TIMG_TPU_VIDEO_DEVICE_WINDOW", raising=False)
    rng = np.random.default_rng(5)
    b, h, w = 3, 24, 32
    ys = rng.integers(16, 236, (b, h, w), dtype=np.uint8)
    us = np.full((b, h // 2, w // 2), 110, np.uint8)
    vs = np.full((b, h // 2, w // 2), 150, np.uint8)
    opts = DisplayOptions()
    opts.cell_x_px, opts.cell_y_px = 9, 18   # pixel-direct session
    frames = plane_cache.prime_pixel_video_device(
        ys, us, vs, 12, 16, True, opts)
    assert frames is not None and len(frames) == b
    assert all(isinstance(f, plane_cache.DeviceFrame) for f in frames)
    eager = np.asarray(_get_yuv_jit()(ys, us, vs, 12, 16, True))
    for i, f in enumerate(frames):
        np.testing.assert_array_equal(np.asarray(f), eager[i])

    # gates: sixel and block sessions keep their own device windows
    sopts = DisplayOptions()
    sopts.cell_x_px, sopts.cell_y_px = 9, 18
    sopts.sixel_batch_dither = "cube"
    assert plane_cache.prime_pixel_video_device(
        ys, us, vs, 12, 16, True, sopts) is None
    bopts = DisplayOptions()
    bopts.cell_x_px, bopts.cell_y_px = 2, 2
    assert plane_cache.prime_pixel_video_device(
        ys, us, vs, 12, 16, True, bopts) is None


@pytest.mark.parametrize("mode", ["-pk", "-pi"])
def test_pixel_video_yuv_byte_identity(mode, tmp_path, monkeypatch):
    """kitty/iTerm2 on 4:2:0 video: device window on/off byte parity
    (the YUV convert+resize runs on device either way; the row pins the
    pixel-protocol tail of the matrix)."""
    y4m = _y4m(tmp_path)
    argv = ["--debug-no-frame-delay", "-g40x20", mode, "-b", "black",
            "--loops=1", y4m]
    _pin_kitty_ids(monkeypatch)
    fast = _run_cli_pty(argv, tmp_path / "fast.out", monkeypatch, True)
    _pin_kitty_ids(monkeypatch)
    legacy = _run_cli_pty(argv, tmp_path / "legacy.out", monkeypatch,
                          False)
    assert fast == legacy, mode
    assert fast
