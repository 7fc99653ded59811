"""Video source end-to-end tests (y4m input: libav-decodable without an
encoder)."""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pytest

from timg_tpu.native import runtime

pytestmark = pytest.mark.skipif(runtime.load() is None,
                                reason="native video helper not built")


@pytest.fixture(scope="module")
def y4m_file():
    w, h, n = 64, 48, 10
    path = os.path.join(tempfile.gettempdir(), "timg_tpu_test.y4m")
    with open(path, "wb") as f:
        f.write(b"YUV4MPEG2 W64 H48 F25:1 Ip A1:1 C420jpeg\n")
        for i in range(n):
            f.write(b"FRAME\n")
            y = np.full((h, w), 16 + i * 20, np.uint8)
            y[:, : i * 6] = 200
            u = np.full((h // 2, w // 2), 128, np.uint8)
            v = np.full((h // 2, w // 2), 128 + i * 10, np.uint8)
            f.write(y.tobytes())
            f.write(u.tobytes())
            f.write(v.tobytes())
    yield path
    os.unlink(path)


def _load(y4m_file, **opt_overrides):
    from timg_tpu.options import DisplayOptions
    from timg_tpu.sources.video_source import VideoSource

    opts = DisplayOptions()
    opts.width, opts.height = 80, 40
    opts.cell_x_px = opts.cell_y_px = 2
    opts.bgcolor_getter = lambda: (0, 0, 0, 255)
    for k, v in opt_overrides.items():
        setattr(opts, k, v)
    src = VideoSource(y4m_file)
    assert src.load_and_scale(opts, opt_overrides.get("_offset", 0),
                              opt_overrides.get("_count", -1))
    return src


def test_video_metadata(y4m_file):
    src = _load(y4m_file)
    assert (src.orig_width, src.orig_height) == (64, 48)
    assert src._fps == 25.0
    assert src.decoder_name == "video"


def test_video_frames_and_pacing(y4m_file):
    from timg_tpu.render.sequencer import SeqType

    src = _load(y4m_file)
    frames = []
    src.send_frames(float("inf"), 1, lambda: False,
                    lambda dx, dy, fb, seq, t: frames.append((dy, seq, t)))
    assert len(frames) == 10
    assert frames[0][1] == SeqType.START_OF_ANIMATION
    assert all(f[1] == SeqType.ANIMATION_FRAME for f in frames[1:])
    # 25 fps -> 40ms steps
    assert abs(frames[0][2] - 40.0) < 1e-6
    assert abs(frames[-1][2] - 400.0) < 1e-6
    # reposition by previous height after the first frame
    assert frames[0][0] == 0 and frames[1][0] < 0


def test_video_loops(y4m_file):
    src = _load(y4m_file)
    frames = []
    src.send_frames(float("inf"), 3, lambda: False,
                    lambda *a: frames.append(a))
    assert len(frames) == 30


def test_video_frame_offset_and_count(y4m_file):
    src = _load(y4m_file)
    src._frame_offset = 4
    src._frame_count = 3
    frames = []
    src.send_frames(float("inf"), 1, lambda: False,
                    lambda *a: frames.append(a))
    assert len(frames) == 3


def test_video_through_cli(y4m_file):
    from tests.test_golden import run_ours

    import re

    out = run_ours(["--debug-no-frame-delay", "-g40x20", "-pq",
                    "-b", "black", "--loops=1"], [y4m_file])
    # 10 frames of block output with animation repositioning
    assert out.count(b"\033[0m\n") >= 10
    assert re.search(rb"\033\[\d+A", out)  # cursor-up between frames


def test_video_sixel_cli(y4m_file):
    """Without tty cell size the CLI clamps pixel modes to one frame
    (ref timg.cc:742-767) — one sixel stream."""
    from tests.test_golden import run_ours

    out = run_ours(["--debug-no-frame-delay", "-g40x20", "-ps",
                    "-b", "black", "--loops=1"], [y4m_file])
    assert out.count(b"\033Pq") == 1
    assert b"\033\\" in out


@pytest.mark.parametrize("dither", ["adaptive", "cube"])
def test_video_sixel_canvas_animation(y4m_file, dither):
    """Multi-frame sixel with palette reuse, driving the canvas directly."""
    from timg_tpu.options import DisplayOptions, SixelOptions
    from timg_tpu.render.sequencer import SeqType
    from timg_tpu.render.sixel_render import SixelCanvas

    sent = []

    class FakeSequencer:
        def write_buffer(self, block, seq_type, end_of_frame_ms=0.0):
            sent.append(block)

    opts = DisplayOptions()
    opts.cell_x_px, opts.cell_y_px = 8, 16
    opts.bgcolor_getter = lambda: (0, 0, 0, 255)
    canvas = SixelCanvas(FakeSequencer(), SixelOptions(), opts,
                         dither=dither)

    src = _load(y4m_file)
    src.send_frames(float("inf"), 1, lambda: False,
                    lambda dx, dy, fb, seq, t: canvas.send(dx, dy, fb,
                                                           seq, t))
    assert len(sent) == 10
    assert all(b"\033Pq" in s for s in sent)


@pytest.mark.parametrize("dither", ["adaptive", "cube"])
def test_video_sixel_primed_batch_identical(y4m_file, dither):
    """The batched primed-plane path (one device dispatch per window,
    wired when DisplayOptions.sixel_batch_dither is set) must produce
    byte-identical streams to the per-frame canvas path."""
    from timg_tpu.options import DisplayOptions, SixelOptions
    from timg_tpu.render.sixel_render import SixelCanvas

    import unittest.mock as mock

    from timg_tpu.ops import sixel_np as sixel_mirror

    def run(batched):
        sent = []

        class FakeSequencer:
            def write_buffer(self, block, seq_type, end_of_frame_ms=0.0):
                sent.append(block)

        opts_over = {}
        if batched:
            opts_over["sixel_batch_dither"] = dither
        src = _load(y4m_file, **opts_over)
        opts = DisplayOptions()
        opts.cell_x_px, opts.cell_y_px = 8, 16
        opts.bgcolor_getter = lambda: (0, 0, 0, 255)
        canvas = SixelCanvas(FakeSequencer(), SixelOptions(), opts,
                             dither=dither)
        # On this CPU test backend both paths route to the numpy
        # wavefront mirrors (ops/backend.py prefer_host/use_numpy).
        name = ("fs_dither_tree_np" if dither == "adaptive"
                else "fs_dither_cube_np")
        with mock.patch.object(sixel_mirror, name,
                               side_effect=getattr(sixel_mirror,
                                                   name)) as spy:
            src.send_frames(float("inf"), 1, lambda: False,
                            lambda dx, dy, fb, seq, t: canvas.send(
                                dx, dy, fb, seq, t))
        return sent, spy.call_count

    plain, n_plain = run(batched=False)
    primed, n_primed = run(batched=True)
    assert len(plain) == len(primed) == 10
    assert plain == primed
    # per-frame dither calls collapse into batched window dispatches
    assert n_plain == 10
    assert 1 <= n_primed <= 2  # 10 frames / window of 8 (batched, not zero)


def test_video_from_stdin_dash_V(y4m_file):
    """`timg -V -` reads a video from stdin (ref video-source.cc maps
    '-' to /dev/stdin; '-V' skips image probing, ref timg.cc)."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data = open(y4m_file, "rb").read()
    code = (
        "import os,sys;"
        "os.environ['JAX_PLATFORMS']='cpu';"
        f"sys.path.insert(0,{repo!r});"
        "import jax;jax.config.update('jax_platforms','cpu');"
        "from timg_tpu.cli import main;"
        "sys.exit(main(['-V','-pq','-g40x20','--debug-no-frame-delay',"
        "'-b','black','--loops=1','-o',sys.argv[1],'-']))"
    )
    out_path = y4m_file + ".stdout"
    res = subprocess.run([sys.executable, "-c", code, out_path],
                         input=data, capture_output=True, timeout=240)
    assert res.returncode == 0, res.stderr[-800:]
    out = open(out_path, "rb").read()
    os.unlink(out_path)
    assert out.count(b"\033[0m\n") >= 10  # all 10 frames rendered


def test_apng_reroutes_to_video_source():
    """Animated PNGs are sniffed (acTL) and rerouted to the video
    decoder with its loop-forever default (ref image-source.cc:297-326,
    graphics-magick-source.cc:160-164, video-source.cc:277-285)."""
    from PIL import Image

    from timg_tpu.options import DisplayOptions
    from timg_tpu.sources.base import create_source, looks_like_apng
    from timg_tpu.sources.video_source import VideoSource

    rng = np.random.default_rng(2)
    frames = [Image.fromarray(rng.integers(0, 256, (24, 32, 3))
                              .astype(np.uint8)) for _ in range(3)]
    with tempfile.TemporaryDirectory() as td:
        apng = os.path.join(td, "anim.png")
        frames[0].save(apng, save_all=True, append_images=frames[1:],
                       duration=100, loop=0)
        still = os.path.join(td, "still.png")
        frames[0].save(still)

        assert looks_like_apng(apng)
        assert not looks_like_apng(still)

        opts = DisplayOptions(width=64, height=48)
        src, err = create_source(apng, opts)
        assert err == ""
        assert isinstance(src, VideoSource)
        assert src.default_loops() == -1  # APNG loops forever

        src2, _ = create_source(still, opts)
        assert not isinstance(src2, VideoSource)


def test_v4l2_gate_reports_availability():
    """Device capture is a runtime gate: avdevice registers when its
    library exists (ref video-source.cc:100-102 HAVE_AVDEVICE); absent,
    /dev/video paths fail with the normal source-factory diagnostics."""
    lib = runtime.load()
    assert hasattr(lib, "timg_video_device_capture_available")
    avail = lib.timg_video_device_capture_available()
    assert avail in (0, 1)
    if not avail:
        # graceful: open of a device path returns null, no crash
        assert lib.timg_video_open(b"/dev/video0") is None
    assert ("avdevice" in runtime.describe()) == bool(avail)


def test_overlap_pipeline_byte_identical(y4m_file):
    """The lookahead window pipeline (decode overlaps device work;
    send_frames) must produce the exact serial stream, including with
    a duration cutoff mid-stream (the decode-side sched_ms clock must
    reproduce the serial path's post-flush cutoff decisions)."""
    from tests.test_golden import run_ours

    for extra in ([], ["-t", "0.2"], ["--frames=5"], ["--loops=2"]):
        args = ["--debug-no-frame-delay", "-g40x20", "-pq", "-b", "black",
                "--loops=1"] + extra
        if "--loops=2" in extra:
            args.remove("--loops=1")
        overlapped = run_ours(args, [y4m_file])
        os.environ["TIMG_TPU_NO_OVERLAP"] = "1"
        try:
            serial = run_ours(args, [y4m_file])
        finally:
            del os.environ["TIMG_TPU_NO_OVERLAP"]
        assert overlapped == serial, extra
        assert overlapped
