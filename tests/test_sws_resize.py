"""Device swscale-bitexact kernel (--resample=sws-bitexact).

Pins the remaining links of the VERDICT r3 #3 chain

    TPU kernel (ops/sws_resize.py)  ==  numpy mirror
        ==  scalar model (ops/sws_model.py)  [== libswscale bitexact,
                                              tests/test_sws_model.py]

plus the VideoSource wiring: the device path activates for even display
widths on 4:2:0 streams and its emitted frames byte-match the scalar
model applied to the raw planes (ref src/video-source.cc:352-354,
image-scaler.cc:45-73).
"""

import os
import tempfile

import numpy as np
import pytest

from timg_tpu.ops import sws_model, sws_resize


def _planes(rng, sw, sh, n=3):
    ch, cw = (sh + 1) // 2, (sw + 1) // 2
    return (rng.integers(0, 256, (n, sh, sw), np.uint8),
            rng.integers(0, 256, (n, ch, cw), np.uint8),
            rng.integers(0, 256, (n, ch, cw), np.uint8))


GEOS = [
    (64, 48, 32, 24),    # 2x downscale (packed2 template)
    (32, 24, 64, 48),    # 2x upscale
    (64, 48, 64, 24),    # vertical-only
    (64, 48, 32, 48),    # horizontal-only
    (37, 23, 22, 37),    # odd source dims
    (129, 47, 48, 96),   # prime-ish
    (16, 4, 200, 4),     # extreme aspect (packedX template)
    # odd dst_w (full-chroma) + equal-size (unscaled converter)
    (64, 48, 31, 24),    # full_2 template
    (64, 48, 33, 48),    # full_1 template
    (32, 24, 65, 48),    # odd upscale (int32-wrap coverage)
    (64, 48, 64, 48),    # unscaled special converter (even dst_h)
    (63, 47, 63, 47),    # odd-height equal size -> scaled path
    (64, 47, 64, 47),    # even-w odd-h equal size -> scaled path
]


@pytest.mark.parametrize("sw,sh,dw,dh", GEOS)
@pytest.mark.parametrize("full", [False, True])
def test_numpy_mirror_matches_scalar_model(sw, sh, dw, dh, full):
    rng = np.random.default_rng(sw * 100 + dw + full)
    ys, us, vs = _planes(rng, sw, sh)
    got = sws_resize.sws_yuv420_to_rgba_words_np(ys, us, vs, dh, dw, full)
    assert got.dtype == np.int32 and got.shape == (3, dh, dw)
    rgba = got.view(np.uint8).reshape(3, dh, dw, 4)
    for i in range(3):
        want = sws_model.sws_bilinear_yuv420_to_rgba(
            ys[i], us[i], vs[i], dh, dw, full)
        np.testing.assert_array_equal(rgba[i], want)


@pytest.mark.parametrize("sw,sh,dw,dh", GEOS[:4] + GEOS[-4:])
def test_jax_kernel_matches_numpy_mirror(sw, sh, dw, dh):
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    for full in (False, True):
        ys, us, vs = _planes(rng, sw, sh)
        want = sws_resize.sws_yuv420_to_rgba_words_np(ys, us, vs, dh, dw,
                                                      full)
        got = np.asarray(sws_resize.sws_yuv420_to_rgba_words(
            jnp.asarray(ys), jnp.asarray(us), jnp.asarray(vs), dh, dw,
            full))
        np.testing.assert_array_equal(got, want)


def test_plan_layout_selection():
    assert sws_resize.supports(32) and sws_resize.supports(33)
    assert sws_resize.Plan(16, 16, 15, 16, False).full_chroma
    assert not sws_resize.Plan(16, 16, 14, 16, False).full_chroma
    assert sws_resize.Plan(16, 16, 16, 16, False).unscaled


# --- VideoSource wiring ----------------------------------------------------

def _y4m(path, w=64, h=48, n=5):
    rng = np.random.default_rng(5)
    with open(path, "wb") as f:
        f.write(("YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C420jpeg\n"
                 % (w, h)).encode())
        ch, cw = (h + 1) // 2, (w + 1) // 2  # 4:2:0 chroma ceil-dims
        for _ in range(n):
            f.write(b"FRAME\n")
            f.write(rng.integers(0, 256, (h, w), np.uint8).tobytes())
            f.write(rng.integers(0, 256, (ch, cw), np.uint8).tobytes())
            f.write(rng.integers(0, 256, (ch, cw), np.uint8).tobytes())


def _collect_raw_planes(path, n):
    """Raw 4:2:0 planes straight from the decoder (the kernel's input)."""
    import ctypes

    from timg_tpu.native import runtime

    lib = runtime.load()
    h1 = lib.timg_video_open(path.encode())
    assert h1
    w = ctypes.c_int()
    h = ctypes.c_int()
    fps = ctypes.c_double()
    lib.timg_video_info(h1, ctypes.byref(w), ctypes.byref(h),
                        ctypes.byref(fps))
    w, h = w.value, h.value
    cw, ch = (w + 1) // 2, (h + 1) // 2
    ybuf = ctypes.create_string_buffer(w * h)
    ubuf = ctypes.create_string_buffer(cw * ch)
    vbuf = ctypes.create_string_buffer(cw * ch)
    rbuf = ctypes.create_string_buffer(w * h * 4)
    info = lib.timg_video_pix_info(h1)
    out = []
    try:
        for _ in range(n):
            assert lib.timg_video_read_frame_yuv(h1, ybuf, ubuf, vbuf,
                                                 rbuf) == 1
            out.append((
                np.frombuffer(ybuf, np.uint8, w * h).reshape(h, w).copy(),
                np.frombuffer(ubuf, np.uint8, cw * ch).reshape(ch,
                                                               cw).copy(),
                np.frombuffer(vbuf, np.uint8, cw * ch).reshape(ch,
                                                               cw).copy()))
    finally:
        lib.timg_video_close(h1)
    return out, bool(info & 2)


def test_video_source_sws_bitexact_path():
    from timg_tpu.native import runtime
    from timg_tpu.options import DisplayOptions
    from timg_tpu.sources.video_source import VideoSource

    if runtime.load() is None:
        pytest.skip("native video helper not built")

    path = os.path.join(tempfile.gettempdir(), "timg_sws_bitexact.y4m")
    _y4m(path)
    try:
        opts = DisplayOptions()
        opts.width, opts.height = 16, 24
        opts.cell_x_px = opts.cell_y_px = 2
        opts.bgcolor_getter = lambda: (0, 0, 0, 255)
        opts.resample = "sws-bitexact"
        src = VideoSource(path)
        assert src.load_and_scale(opts, 0, -1)
        tw, th = src._target
        assert src._sws_device, (tw, th)
        assert tw % 2 == 0

        frames = []
        src.send_frames(float("inf"), 1, lambda: False,
                        lambda dx, dy, fb, seq, t: frames.append(fb))
        assert len(frames) == 5

        planes, full = _collect_raw_planes(path, 5)
        for fb, (y, u, v) in zip(frames, planes):
            want = sws_model.sws_bilinear_yuv420_to_rgba(y, u, v, th, tw,
                                                         full)
            np.testing.assert_array_equal(np.asarray(fb), want)
    finally:
        os.unlink(path)


def test_video_source_sws_bitexact_odd_width_on_device():
    """Odd display widths run the device kernel too (full-chroma layout
    since r4; the r5 odd-height routing fix closed the last gap), and
    the emitted frames byte-match the scalar model."""
    from timg_tpu.native import runtime
    from timg_tpu.options import DisplayOptions
    from timg_tpu.sources.video_source import VideoSource

    lib = runtime.load()
    if lib is None or not hasattr(lib, "timg_video_read_frame_scaled"):
        pytest.skip("native video helper unavailable")

    path = os.path.join(tempfile.gettempdir(), "timg_sws_odd.y4m")
    _y4m(path, w=63, h=48)
    try:
        opts = DisplayOptions()
        # 1px cells (pixel-protocol geometry) so an odd width survives
        # the floor-to-cell step: 63x48 into 21x480 -> 21x16.
        opts.width, opts.height = 21, 480
        opts.cell_x_px = opts.cell_y_px = 1
        opts.bgcolor_getter = lambda: (0, 0, 0, 255)
        opts.resample = "sws-bitexact"
        src = VideoSource(path)
        assert src.load_and_scale(opts, 0, -1)
        tw, th = src._target
        assert tw % 2 == 1, tw
        assert src._sws_device

        frames = []
        src.send_frames(float("inf"), 1, lambda: False,
                        lambda dx, dy, fb, seq, t: frames.append(fb))
        assert len(frames) == 5

        planes, full = _collect_raw_planes(path, 5)
        for fb, (y, u, v) in zip(frames, planes):
            want = sws_model.sws_bilinear_yuv420_to_rgba(y, u, v, th, tw,
                                                         full)
            np.testing.assert_array_equal(np.asarray(fb), want)
    finally:
        os.unlink(path)


def test_sws_device_window_byte_identity(tmp_path, monkeypatch):
    """--resample=sws-bitexact rides the device-resident window: the
    fast path (window on) is byte-identical to the plain batched jit
    (window off), and both differ from the lean default resample
    (proving the swscale kernel is actually in the flow)."""
    from timg_tpu.native import runtime

    if runtime.load() is None:
        pytest.skip("native video helper not built")
    from tests.test_video_device_window import _run_cli_pty, _y4m

    y4m = _y4m(tmp_path)
    for mode in ("-ps", "-pq"):
        argv = ["--debug-no-frame-delay", "-g40x20", mode, "-b", "black",
                "--loops=1", "--resample=sws-bitexact", y4m]
        fast = _run_cli_pty(argv, tmp_path / "fast.out", monkeypatch,
                            True)
        legacy = _run_cli_pty(argv, tmp_path / "legacy.out", monkeypatch,
                              False)
        assert fast == legacy, mode
        lean = _run_cli_pty(
            ["--debug-no-frame-delay", "-g40x20", mode, "-b", "black",
             "--loops=1", y4m], tmp_path / "lean.out", monkeypatch, True)
        assert fast != lean, mode
