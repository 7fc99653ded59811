"""Unit tests: geometry math, color parsing, utils, PNG writer, sequencer."""

from __future__ import annotations

import io
import os
import struct
import threading
import time
import zlib

import numpy as np
import pytest

from timg_tpu.colors import as_256_term_color, parse_color
from timg_tpu.geometry import calc_scale_to_fit
from timg_tpu.options import DisplayOptions
from timg_tpu.utils import (get_bool_env, get_float_env, get_int_env,
                            human_readable_byte_value)


def _opts(**kw):
    o = DisplayOptions()
    o.width, o.height = kw.pop("width", 100), kw.pop("height", 60)
    for k, v in kw.items():
        setattr(o, k, v)
    return o


class TestGeometry:
    def test_no_upscale_small_image(self):
        # image smaller than screen, no upscale: keep size (ref :74-86)
        assert calc_scale_to_fit(50, 30, _opts()) == (50, 30, False)

    def test_quarter_width_doubling(self):
        o = _opts(cell_x_px=2, cell_y_px=2)
        assert calc_scale_to_fit(50, 30, o) == (100, 30, True)

    def test_downscale_smaller_fraction(self):
        # 200x120 into 100x60: fraction 0.5 both -> 100x60
        assert calc_scale_to_fit(200, 120, _opts()) == (100, 60, True)

    def test_fill_width_overflows_height(self):
        o = _opts(fill_width=True)
        w, h, _ = calc_scale_to_fit(200, 400, o)
        assert w == 100 and h == 200

    def test_fill_height_overflows_width(self):
        o = _opts(fill_height=True)
        w, h, _ = calc_scale_to_fit(400, 120, o)
        assert h == 60 and w == 200

    def test_stretch_clamped(self):
        o = _opts(width_stretch=100.0, upscale=True)
        w, h, _ = calc_scale_to_fit(100, 60, o)
        # clamp to 5.0: width /= 5 -> 20 wide space; scale 0.2
        assert (w, h) == (100, 12)

    def test_block_mode_cell_floor(self):
        o = _opts(cell_x_px=2, cell_y_px=2, upscale=True, width=99,
                  height=59)
        w, h, _ = calc_scale_to_fit(33, 17, o)
        assert w % 2 == 0 and h % 2 == 0

    def test_never_zero(self):
        o = _opts(width=1, height=1)
        assert calc_scale_to_fit(10000, 3, o)[0] >= 1

    def test_upscale_integer(self):
        o = _opts(upscale=True, upscale_integer=True, width=100, height=64)
        w, h, _ = calc_scale_to_fit(10, 6, o)
        # integer factor: floor(min(100/10, 64/6)) = 10 -> but height
        # limits: floor(10.66)=10 in w, floor(10.66) in h -> 10
        assert w % 10 == 0 and h % 6 == 0

    def test_rotated_fit(self):
        o = _opts(width_stretch=2.0)
        normal = calc_scale_to_fit(200, 120, o)
        rotated = calc_scale_to_fit(200, 120, o, fit_in_rotated=True)
        assert normal != rotated


class TestColors:
    def test_hex(self):
        assert parse_color("#336699") == (0x33, 0x66, 0x99, 0xFF)

    def test_rgb(self):
        assert parse_color("rgb(1, 2, 3)") == (1, 2, 3, 0xFF)

    def test_rgb_hex(self):
        assert parse_color("rgb(0xff, 0x80, 0x00)") == (255, 128, 0, 0xFF)

    def test_named(self):
        assert parse_color("red") == (255, 0, 0, 0xFF)
        assert parse_color("MediumAquaMarine") == (0x66, 0xCD, 0xAA, 0xFF)

    def test_none_and_garbage(self):
        assert parse_color("none") == (0, 0, 0, 0)
        assert parse_color(None) == (0, 0, 0, 0)
        assert parse_color("notacolor!") == (0, 0, 0, 0)

    def test_clamping(self):
        assert parse_color("rgb(300, 2, 3)") == (255, 2, 3, 0xFF)

    def test_256_gray_ramp(self):
        assert as_256_term_color(0, 0, 0) == 232
        assert as_256_term_color(255, 255, 255) == 255

    def test_256_cube(self):
        assert as_256_term_color(255, 0, 0) == 16 + 36 * 5
        assert as_256_term_color(0, 0, 255) == 16 + 5


class TestUtils:
    def test_bool_env(self, monkeypatch):
        monkeypatch.setenv("T_X", "on")
        assert get_bool_env("T_X")
        monkeypatch.setenv("T_X", "0")
        assert not get_bool_env("T_X")
        monkeypatch.setenv("T_X", "yes")
        assert get_bool_env("T_X")
        monkeypatch.delenv("T_X")
        assert get_bool_env("T_X", True)

    def test_float_env(self, monkeypatch):
        monkeypatch.setenv("T_F", "1.5")
        assert get_float_env("T_F", 0.0) == 1.5
        monkeypatch.setenv("T_F", "xxx")
        assert get_float_env("T_F", 2.0) == 2.0

    def test_int_env(self, monkeypatch):
        monkeypatch.setenv("T_I", "42")
        assert get_int_env("T_I", 0) == 42

    def test_human_readable(self):
        assert human_readable_byte_value(500) == "500.0 Bytes"
        assert "KiB" in human_readable_byte_value(100 * 1024)
        assert "MiB" in human_readable_byte_value(100 << 20)
        assert "GiB" in human_readable_byte_value(100 << 30)


class TestPNG:
    def test_roundtrip_rgb(self):
        from PIL import Image

        from timg_tpu.render.png import encode_png

        rng = np.random.default_rng(0)
        frame = rng.integers(0, 256, (20, 30, 4), dtype=np.uint8)
        png = encode_png(frame, 1, with_alpha=False)
        img = np.asarray(Image.open(io.BytesIO(png)))
        assert img.shape == (20, 30, 3)
        assert np.array_equal(img, frame[..., :3])

    def test_roundtrip_rgba(self):
        from PIL import Image

        from timg_tpu.render.png import encode_png

        rng = np.random.default_rng(1)
        frame = rng.integers(0, 256, (15, 25, 4), dtype=np.uint8)
        png = encode_png(frame, 6, with_alpha=True)
        img = np.asarray(Image.open(io.BytesIO(png)))
        assert np.array_equal(img, frame)


class TestSequencer:
    def test_order_and_stats(self, tmp_path):
        from timg_tpu.render.sequencer import BufferedWriteSequencer, SeqType

        out = tmp_path / "seq.out"
        fd = os.open(out, os.O_WRONLY | os.O_CREAT, 0o644)
        seq = BufferedWriteSequencer(fd, debug_no_frame_delay=True)
        for i in range(10):
            seq.write_buffer(b"%d;" % i, SeqType.FRAME_IMMEDIATE)
        seq.shutdown()
        os.close(fd)
        assert out.read_bytes() == b"".join(b"%d;" % i for i in range(10))
        assert seq.frames_total == 10
        assert seq.bytes_total == 20

    def test_animation_pacing(self, tmp_path):
        from timg_tpu.render.sequencer import BufferedWriteSequencer, SeqType

        fd = os.open(tmp_path / "x", os.O_WRONLY | os.O_CREAT, 0o644)
        seq = BufferedWriteSequencer(fd)
        start = time.monotonic()
        seq.write_buffer(b"a", SeqType.START_OF_ANIMATION, 0.0)
        for i in range(3):
            seq.write_buffer(b"b", SeqType.ANIMATION_FRAME, (i + 1) * 30.0)
        seq.shutdown()
        os.close(fd)
        elapsed = time.monotonic() - start
        assert elapsed >= 0.055  # at least ~2 frame delays honored

    def test_broken_pipe_does_not_deadlock(self):
        """`timg ... | head` closes the read end mid-stream: os.write
        raises where the reference's write() returns -1 and its loop
        just stops (buffered-write-sequencer.cc:58-68). The writer
        thread must survive, keep draining past the 4-slot bound, and
        shutdown() must return (regression: it deadlocked)."""
        from timg_tpu.render.sequencer import BufferedWriteSequencer, SeqType

        r, w = os.pipe()
        os.close(r)  # every write now raises BrokenPipeError
        seq = BufferedWriteSequencer(w, debug_no_frame_delay=True)
        for i in range(12):  # 3x the queue bound
            seq.write_buffer(b"x" * 64, SeqType.FRAME_IMMEDIATE)
        done = threading.Event()
        threading.Thread(target=lambda: (seq.shutdown(), done.set()),
                         daemon=True).start()
        assert done.wait(timeout=10.0), "shutdown() deadlocked"
        os.close(w)

    def test_failed_encode_future_is_dropped(self, tmp_path):
        """An exception inside an async encode future must drop that
        frame, not kill the writer thread."""
        from concurrent.futures import ThreadPoolExecutor

        from timg_tpu.render.sequencer import BufferedWriteSequencer, SeqType

        out = tmp_path / "z"
        fd = os.open(out, os.O_WRONLY | os.O_CREAT, 0o644)
        seq = BufferedWriteSequencer(fd, debug_no_frame_delay=True)
        with ThreadPoolExecutor(1) as pool:
            boom = pool.submit(lambda: (_ for _ in ()).throw(RuntimeError()))
            seq.write_buffer(boom, SeqType.FRAME_IMMEDIATE)
            seq.write_buffer(b"after", SeqType.FRAME_IMMEDIATE)
            seq.shutdown()
        os.close(fd)
        assert out.read_bytes() == b"after"

    def test_control_write_after_interrupt(self, tmp_path):
        from timg_tpu.render.sequencer import BufferedWriteSequencer, SeqType

        out = tmp_path / "y"
        fd = os.open(out, os.O_WRONLY | os.O_CREAT, 0o644)
        seq = BufferedWriteSequencer(fd, debug_no_frame_delay=True,
                                     interrupt_flag=lambda: True)
        seq.write_buffer(b"frame", SeqType.FRAME_IMMEDIATE)
        seq.write_buffer(b"ctrl", SeqType.CONTROL_WRITE)
        seq.shutdown()
        os.close(fd)
        # frames discarded after interrupt; control writes still go out
        assert out.read_bytes() == b"ctrl"


class TestNativeEmitter:
    def test_native_matches_python(self):
        """The C ANSI emitter must produce identical bytes to the
        parity-tested Python emitter across random planes."""
        from timg_tpu.render.ansi import (UnicodeBlockCanvas,
                                          _emit_frame_native, _native_lib)

        lib = _native_lib()
        if lib is None:
            pytest.skip("native library not built")
        rng = np.random.default_rng(12)
        for use_256 in (False, True):
            for trial in range(4):
                h, w = 12, 25
                glyph = rng.integers(0, 9, (h, w)).astype(np.int32)
                fg = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
                bg = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
                eq = (rng.integers(0, 2, (h, w), dtype=np.uint8)
                      if trial % 2 else None)
                canvas = UnicodeBlockCanvas.__new__(UnicodeBlockCanvas)
                canvas.use_256_color = use_256
                want = canvas._emit_frame_py(glyph, fg, bg, eq, indent=3)
                got = _emit_frame_native(lib, glyph, fg, bg, eq, 3, use_256)
                assert got == want, (use_256, trial)


class TestPrimedDiffMasks:
    """The device-computed window diff masks must actually reach the
    canvas: its validity gate is an identity check on the prev-frame
    plane, so the cache must store ONE view object per row (regression:
    two separate `batch[i]` indexing expressions are distinct objects
    and silently disabled every cached mask on the video hot path)."""

    def _prime(self):
        from timg_tpu.options import DisplayOptions
        from timg_tpu.render.plane_cache import (BLOCK_PLANES,
                                                 prime_block_planes)

        rng = np.random.default_rng(5)
        f0 = rng.integers(0, 256, (8, 10, 4), dtype=np.uint8)
        f1 = rng.integers(0, 256, (8, 10, 4), dtype=np.uint8)
        opts = DisplayOptions()
        opts.cell_x_px = opts.cell_y_px = 2
        prime_block_planes([f0, f1], opts)
        return BLOCK_PLANES, f0, f1

    def test_prev_slot_is_the_same_object(self):
        cache, f0, f1 = self._prime()
        e0, e1 = cache.pop(f0), cache.pop(f1)
        assert e1[4] is e0[0]       # the identity ansi.py checks
        assert e1[5] is not None    # a mask was computed for frame 1

    def test_cached_mask_is_consumed_not_recomputed(self):
        from timg_tpu.render.ansi import UnicodeBlockCanvas
        from timg_tpu.render.sequencer import SeqType

        cache, f0, f1 = self._prime()
        # Poison frame 1's mask to all-equal: if the canvas consumes the
        # cached mask it emits an empty diff; if it recomputes on host
        # (frames differ everywhere) it emits a full frame.
        e1 = cache.pop(f1)
        cache.put(f1, e1[:5] + (np.ones_like(np.asarray(e1[5]), bool),))

        writes = []

        class FakeSeq:
            def write_buffer(self, data, *a, **k):
                writes.append(bytes(data))

        canvas = UnicodeBlockCanvas(FakeSeq(), use_quarter=True)
        canvas.send(0, 0, f0, SeqType.START_OF_ANIMATION)
        canvas.send(0, -8, f1, SeqType.ANIMATION_FRAME)
        assert writes[-1] == b""


class TestOpenSlideSource:
    def test_gated_hint_for_slide_suffix(self, tmp_path):
        import pytest

        from timg_tpu.sources.openslide_source import OpenSlideSource, _lib
        from timg_tpu.options import DisplayOptions

        p = tmp_path / "x.svs"
        p.write_bytes(b"\x00" * 16)
        src = OpenSlideSource(str(p))
        opts = DisplayOptions()
        opts.width, opts.height = 80, 48
        if _lib() is None:
            with pytest.raises(RuntimeError, match="libopenslide"):
                src.load_and_scale(opts, 0, -1)
        else:  # lib present: corrupt file is just skipped
            assert src.load_and_scale(opts, 0, -1) is False

    def test_non_slide_falls_through(self, tmp_path):
        from timg_tpu.sources.openslide_source import OpenSlideSource
        from timg_tpu.options import DisplayOptions

        p = tmp_path / "x.png"
        p.write_bytes(b"\x89PNG\r\n\x1a\n" + b"\x00" * 8)
        opts = DisplayOptions()
        opts.width, opts.height = 80, 48
        assert OpenSlideSource(str(p)).load_and_scale(opts, 0, -1) is False

    def test_argb_conversion_unpremultiply(self):
        import numpy as np

        from timg_tpu.sources.openslide_source import _argb_to_rgba

        # premultiplied half-alpha red + opaque green + transparent
        words = np.array([
            (128 << 24) | (64 << 16),          # a=128, r_pre=64 -> r=127
            (255 << 24) | (200 << 8),          # opaque g=200
            0,                                  # fully transparent
        ], np.uint32)
        out = _argb_to_rgba(words, 1, 3)
        assert out.shape == (1, 3, 4)
        assert tuple(out[0, 0]) == (128, 0, 0, 128) or \
            tuple(out[0, 0]) == (127, 0, 0, 128)
        assert tuple(out[0, 1]) == (0, 200, 0, 255)
        assert tuple(out[0, 2]) == (0, 0, 0, 0)


class TestTlsBuffers:
    """Thread-local C-assembler buffer reuse (sixel_render._tls_buffer)."""

    def test_reuse_and_growth(self):
        import ctypes

        from timg_tpu.render.sixel_render import _tls_buffer

        b1 = _tls_buffer(1024)
        b2 = _tls_buffer(512)     # smaller: same object back
        assert b1 is b2
        b3 = _tls_buffer(ctypes.sizeof(b1) + 1)  # grows
        assert ctypes.sizeof(b3) > ctypes.sizeof(b1)

    def test_threads_are_isolated(self):
        from timg_tpu.render.sixel_render import _tls_buffer

        main_buf = _tls_buffer(2048)
        seen = {}

        def worker():
            seen["buf"] = _tls_buffer(2048)

        t = threading.Thread(target=worker)
        t.start()
        t.join()
        assert seen["buf"] is not main_buf


class TestExifJpeg:
    """EXIF orientation vs the JPEG draft fast path (ref
    jpeg-source.cc:63-82,184-195)."""

    def _opts(self):
        from timg_tpu.options import DisplayOptions

        opts = DisplayOptions()
        opts.width, opts.height = 40, 40
        opts.cell_x_px = opts.cell_y_px = 2
        opts.bgcolor_getter = lambda: (0, 0, 0, 255)
        return opts

    def _jpeg(self, tmp_path, w, h, orientation):
        from PIL import Image

        img = Image.new("RGB", (w, h), (200, 30, 30))
        path = str(tmp_path / f"o{orientation}.jpg")
        exif = Image.Exif()
        exif[0x0112] = orientation
        img.save(path, exif=exif.tobytes())
        return path

    def test_orientation_6_reports_rotated_dims(self, tmp_path):
        """A portrait-via-EXIF JPEG must report post-rotation dims --
        recording pre-rotation size would swap the target aspect."""
        from timg_tpu.sources.pil_source import PILSource

        path = self._jpeg(tmp_path, 60, 30, orientation=6)
        src = PILSource(path)
        assert src.load_and_scale(self._opts(), 0, -1)
        assert (src.orig_width, src.orig_height) == (30, 60)
        frame = src.frames[0].frame
        assert frame.shape[0] > frame.shape[1]  # portrait stays portrait

    def test_drafted_decode_reports_true_dims(self, tmp_path):
        """The DCT draft fast path decodes small but must report the
        file's real dimensions for %w/%h titles."""
        from timg_tpu.sources.pil_source import PILSource

        path = self._jpeg(tmp_path, 640, 320, orientation=1)
        src = PILSource(path)
        assert src.load_and_scale(self._opts(), 0, -1)
        assert (src.orig_width, src.orig_height) == (640, 320)


class TestIcoMultiImage:
    """Multi-resolution .ico containers show every contained image,
    stacked and independently scaled, never as an animation (ref
    graphics-magick-source.cc:193-214 blacklist + per-image loop)."""

    def _opts(self, center=False):
        from timg_tpu.options import DisplayOptions

        opts = DisplayOptions()
        opts.width, opts.height = 80, 48
        opts.cell_x_px = opts.cell_y_px = 2
        opts.center_horizontally = center
        opts.bgcolor_getter = lambda: (0, 0, 0, 255)
        return opts

    def _ico(self, tmp_path, sizes=((16, 16), (32, 32), (64, 64))):
        from PIL import Image

        p = tmp_path / "multi.ico"
        Image.new("RGB", (64, 64), (200, 30, 30)).save(
            p, format="ICO", sizes=list(sizes))
        return str(p)

    def test_every_contained_image_shown(self, tmp_path):
        from timg_tpu.render.sequencer import SeqType
        from timg_tpu.sources.pil_source import PILSource

        src = PILSource(self._ico(tmp_path))
        assert src.load_and_scale(self._opts(), 0, -1)
        assert len(src.frames) == 3 and src.multi_image
        assert not src.is_animation_before_frame_limit()
        # each image scaled to fit independently -> distinct sizes
        assert len({f.frame.shape for f in src.frames}) == 3
        sent = []
        src.send_frames(1e9, -1, lambda: False,
                        lambda *a: sent.append(a))
        # immediate stacked frames: dy stays 0, no animation seq types
        assert len(sent) == 3
        assert all(a[1] == 0 and a[3] == SeqType.FRAME_IMMEDIATE
                   for a in sent)

    def test_frame_offset_and_count(self, tmp_path):
        from timg_tpu.sources.pil_source import PILSource

        path = self._ico(tmp_path)
        src = PILSource(path)
        assert src.load_and_scale(self._opts(), 1, -1)
        assert len(src.frames) == 2  # offset drops the first image
        # offset beyond the end keeps the last image (gm-source.cc:221)
        src = PILSource(path)
        assert src.load_and_scale(self._opts(), 99, -1)
        assert len(src.frames) == 1
        # count truncates before the offset erase (gm-source.cc:204-207)
        src = PILSource(path)
        assert src.load_and_scale(self._opts(), 0, 2)
        assert len(src.frames) == 2 and src.max_frames == 2

    def test_per_frame_centering(self, tmp_path):
        from timg_tpu.sources.pil_source import PILSource

        src = PILSource(self._ico(tmp_path))
        assert src.load_and_scale(self._opts(center=True), 0, -1)
        indents = [f.indentation for f in src.frames]
        # different widths -> different centering indents per frame
        assert len(set(indents)) > 1
        sent = []
        src.send_frames(1e9, -1, lambda: False,
                        lambda *a: sent.append(a[0]))
        assert sent == indents

    def test_cli_end_to_end(self, tmp_path):
        from tests.test_golden import run_ours

        path = self._ico(tmp_path)
        out = run_ours(["-g40x20", "-pq", "-b", "black",
                        "--debug-no-frame-delay"], [path])
        single = run_ours(["-g40x20", "-pq", "-b", "black",
                           "--debug-no-frame-delay", "--frames=1"], [path])
        assert out and single and len(out) > len(single)


class TestTextSource:
    """Plain-text rendering (role of the full-GM reference's TXT coder;
    the minimal stb build errors on .txt)."""

    def _opts(self):
        from timg_tpu.options import DisplayOptions

        opts = DisplayOptions()
        opts.width, opts.height = 80, 48
        opts.cell_x_px = opts.cell_y_px = 2
        opts.bgcolor_getter = lambda: (255, 255, 255, 255)
        return opts

    def test_renders_text_file(self, tmp_path):
        from timg_tpu.sources.text_source import TextSource

        p = tmp_path / "notes.txt"
        p.write_text("hello timg\nsecond line\n")
        src = TextSource(str(p))
        assert src.load_and_scale(self._opts(), 0, -1)
        frame = src.frames[0].frame
        assert frame.ndim == 3 and frame.shape[2] == 4
        # dark glyph pixels on the white page
        assert (frame[..., :3] < 128).any()

    def test_suffix_gate_and_binary_reject(self, tmp_path):
        from timg_tpu.sources.text_source import TextSource

        img = tmp_path / "x.png"
        img.write_bytes(b"\x89PNG\r\n")
        assert not TextSource(str(img)).load_and_scale(self._opts(), 0, -1)
        binf = tmp_path / "x.txt"
        binf.write_bytes(b"ab\0cd")
        assert not TextSource(str(binf)).load_and_scale(self._opts(), 0, -1)

    def test_cli_end_to_end(self, tmp_path):
        from tests.test_golden import run_ours

        p = tmp_path / "cli.txt"
        p.write_text("end to end\n")
        out = run_ours(["-g40x20", "-pq", "-b", "white",
                        "--debug-no-frame-delay"], [str(p)])
        assert out and b"\033[" in out

    def test_scroll_pans_text_page(self, tmp_path):
        """--scroll pans a rendered text page like any other image
        (reference TXT pages go through GM SendFrames -> Scroll,
        gm-source.cc:288-291); regression: TextSource used to fall
        through to the static base send_frames."""
        from timg_tpu.sources.text_source import TextSource

        p = tmp_path / "scroll.txt"
        p.write_text("pan me\n" * 4)
        opts = self._opts()
        opts.scroll_animation = True
        opts.scroll_dx, opts.scroll_dy = 1, 0
        src = TextSource(str(p))
        assert src.load_and_scale(opts, 0, -1)
        sent = []
        src.send_frames(400.0, 1,
                        lambda: False,
                        lambda *a: sent.append(a))
        assert len(sent) > 1  # panning frames, not one static page


class TestSixelNumpyMirror:
    """ops/sixel_np.py wavefront mirrors are bit-identical to the jax
    scan formulation (which the Pallas TPU kernels are in turn asserted
    bit-identical to), and the one-shot routing heuristic behaves."""

    def test_cube_mirror_matches_scan(self):
        import numpy as np

        from timg_tpu.ops import sixel as sixel_op
        from timg_tpu.ops import sixel_np

        rng = np.random.default_rng(1)
        for (b, h, w) in [(1, 30, 40), (2, 17, 23), (3, 7, 5)]:
            fb = rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8)
            assert np.array_equal(np.asarray(sixel_op.fs_dither_cube(fb)),
                                  sixel_np.fs_dither_cube_np(fb))

    def test_tree_mirror_matches_scan(self):
        import numpy as np

        from timg_tpu.ops import sixel as sixel_op
        from timg_tpu.ops import sixel_np

        rng = np.random.default_rng(2)
        fb = rng.integers(0, 256, (2, 24, 31, 3), dtype=np.uint8)
        _, levels, leaves = sixel_np.median_cut_tree(fb[0])
        assert np.array_equal(
            np.asarray(sixel_op.fs_dither_tree(fb, levels, leaves)),
            sixel_np.fs_dither_tree_np(fb, levels, leaves))

    def test_gradient_mirror_matches_scan(self):
        import numpy as np

        from timg_tpu.ops import sixel as sixel_op
        from timg_tpu.ops import sixel_np

        gx = np.linspace(0, 255, 80)[None, :].repeat(54, 0)
        gy = np.linspace(0, 255, 54)[:, None].repeat(80, 1)
        fb = np.stack([gx, gy, gx[:, ::-1]], -1).astype(np.uint8)[None]
        assert np.array_equal(np.asarray(sixel_op.fs_dither_cube(fb)),
                              sixel_np.fs_dither_cube_np(fb))

    def test_prefer_host_heuristic(self, monkeypatch):
        from timg_tpu.ops.backend import prefer_host

        monkeypatch.delenv("TIMG_TPU_FORCE_DEVICE", raising=False)
        monkeypatch.delenv("TIMG_TPU_DEVICE_MIN_BATCH", raising=False)
        assert prefer_host(1)
        assert prefer_host(63)
        assert not prefer_host(64)
        assert not prefer_host(1, sustained=True)
        monkeypatch.setenv("TIMG_TPU_FORCE_DEVICE", "1")
        assert not prefer_host(1)
        monkeypatch.delenv("TIMG_TPU_FORCE_DEVICE")
        monkeypatch.setenv("TIMG_TPU_DEVICE_MIN_BATCH", "4")
        assert prefer_host(3)
        assert not prefer_host(4)
        monkeypatch.setenv("TIMG_TPU_DEVICE_MIN_BATCH", "junk")
        assert prefer_host(1)

    def test_trim_bounds_mirror(self):
        import numpy as np

        from timg_tpu.ops.autocrop import _trim_bounds, _trim_bounds_np

        rng = np.random.default_rng(3)
        for _ in range(5):
            f = np.zeros((12, 15, 4), np.uint8)
            y0, y1 = sorted(rng.integers(0, 12, 2))
            x0, x1 = sorted(rng.integers(0, 15, 2))
            f[y0:y1 + 1, x0:x1 + 1] = rng.integers(1, 255)
            dev = tuple(int(v) for v in np.asarray(_trim_bounds(f)))
            assert dev == _trim_bounds_np(f)
        uniform = np.full((6, 7, 4), 9, np.uint8)
        assert _trim_bounds_np(uniform) == (0, 6, 0, 7)
