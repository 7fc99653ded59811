"""--resample=sws: the reference's swscale video leg (VERDICT r3 #3).

The full reference build resizes video frames host-side with swscale
SWS_BILINEAR in the same call that converts YUV->RGBA
(ref src/video-source.cc:59-89 CreateSWSContext + :352-354, and
image-scaler.cc:45-73 for the RGBA ImageScaler).  Our native helper
links the same libswscale; `--resample=sws` routes video frames through
an identical context, so parity with such a reference build holds by
construction.  These tests pin the wiring: the scaled read equals a
standalone sws call with the reference's context settings, the CLI
plumbing reaches the video source, and output streams stay
deterministic.
"""

import os
import tempfile

import numpy as np
import pytest

from timg_tpu.native import runtime


def _lib_or_skip():
    lib = runtime.load()
    if lib is None or not hasattr(lib, "timg_video_read_frame_scaled"):
        pytest.skip("native video helper unavailable")
    return lib


def _write_y4m(path, w=64, h=48, n=4, full=True):
    rng = np.random.default_rng(3)
    with open(path, "wb") as f:
        f.write(("YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C420%s\n"
                 % (w, h, "jpeg" if full else "mpeg2")).encode())
        for i in range(n):
            f.write(b"FRAME\n")
            f.write(rng.integers(16, 236, (h, w), np.uint8).tobytes())
            f.write(rng.integers(60, 200, (h // 2, w // 2),
                                 np.uint8).tobytes())
            f.write(rng.integers(60, 200, (h // 2, w // 2),
                                 np.uint8).tobytes())


def test_scaled_read_matches_standalone_sws(tmp_path):
    """timg_video_read_frame_scaled == sws_scale_yuv420 on the same
    planes with the same range handling (context-settings parity).
    The stream's own reported range is the ground truth (y4m chroma
    tags denote siting, not range, under libav)."""
    import ctypes

    lib = _lib_or_skip()
    p = str(tmp_path / "v.y4m")
    w, h, tw, th = 64, 48, 30, 20
    _write_y4m(p, w, h, 3)

    h1 = lib.timg_video_open(p.encode())
    h2 = lib.timg_video_open(p.encode())
    assert h1 and h2
    try:
        info = lib.timg_video_pix_info(h1)
        full_range = bool(info & 2)
        sbuf = ctypes.create_string_buffer(tw * th * 4)
        ybuf = ctypes.create_string_buffer(w * h)
        ubuf = ctypes.create_string_buffer((w // 2) * (h // 2))
        vbuf = ctypes.create_string_buffer((w // 2) * (h // 2))
        rbuf = ctypes.create_string_buffer(w * h * 4)
        for _ in range(3):
            assert lib.timg_video_read_frame_scaled(h1, sbuf, tw, th) == 1
            got = np.frombuffer(sbuf, np.uint8,
                                tw * th * 4).reshape(th, tw, 4).copy()
            assert lib.timg_video_read_frame_yuv(h2, ybuf, ubuf, vbuf,
                                                 rbuf) == 1
            y = np.frombuffer(ybuf, np.uint8, w * h).reshape(h, w)
            u = np.frombuffer(ubuf, np.uint8,
                              (w // 2) * (h // 2)).reshape(h // 2, w // 2)
            v = np.frombuffer(vbuf, np.uint8,
                              (w // 2) * (h // 2)).reshape(h // 2, w // 2)
            want = runtime.sws_scale_yuv420(y, u, v, th, tw, full_range)
            np.testing.assert_array_equal(got, want)
    finally:
        lib.timg_video_close(h1)
        lib.timg_video_close(h2)


def test_sws_scale_rgba_identity_at_same_size():
    """1:1 RGBA->RGBA goes through sws's unscaled converter: identity
    bytes (sanity for the ImageScaler-role entry)."""
    _lib_or_skip()
    rng = np.random.default_rng(1)
    rgba = rng.integers(0, 256, (17, 23, 4), np.uint8)
    out = runtime.sws_scale_rgba(rgba, 17, 23)
    np.testing.assert_array_equal(out, rgba)


def test_sws_deterministic_and_bitexact_flag():
    _lib_or_skip()
    rng = np.random.default_rng(2)
    y = rng.integers(0, 256, (48, 64), np.uint8)
    u = rng.integers(0, 256, (24, 32), np.uint8)
    v = rng.integers(0, 256, (24, 32), np.uint8)
    a = runtime.sws_scale_yuv420(y, u, v, 20, 30, True)
    b = runtime.sws_scale_yuv420(y, u, v, 20, 30, True)
    np.testing.assert_array_equal(a, b)
    # SWS_BITEXACT selects the platform-independent C algorithm; the
    # reference does not set it, so its bytes are CPU-dispatch-
    # dependent -- the flag exists as the device-parity target.
    c = runtime.sws_scale_yuv420(y, u, v, 20, 30, True, bitexact=True)
    assert c is not None and c.shape == a.shape


def test_cli_resample_sws_video(tmp_path):
    """-pq video with --resample=sws: valid deterministic stream with
    the same frame count as the device path."""
    from tests.test_golden import run_ours

    _lib_or_skip()
    p = str(tmp_path / "v.y4m")
    _write_y4m(p, 64, 48, 4)
    base = ["--debug-no-frame-delay", "-g40x12", "-pq", "-b", "black",
            "--loops=1"]
    sws1 = run_ours(base + ["--resample=sws"], [p])
    sws2 = run_ours(base + ["--resample=sws"], [p])
    auto = run_ours(base, [p])
    assert sws1 == sws2
    assert sws1  # non-empty
    # same frame structure: equal count of cursor-up repositions
    assert sws1.count(b"\033[6A") == auto.count(b"\033[6A")


def test_options_plumbing():
    from timg_tpu.args import build_arg_parser as build_parser

    args = build_parser().parse_args(["--resample=sws", "x.png"])
    assert args.resample == "sws"
    assert build_parser().parse_args(["x.png"]).resample == "auto"
