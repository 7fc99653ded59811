"""Bit-exactness of the native still-pipeline primitives (timg_still.cc)
against the Python/numpy implementations they shadow.

The one-shot CLI fastpath (timg_tpu/fast.py) renders entirely through
these C functions without importing numpy/PIL; every primitive must be
bit-identical to the strict Python path or the fastpath would silently
produce different bytes than `cli.main` (tests here + the end-to-end
matrix in test_fastpath_cli.py enforce that).
"""

import ctypes
import io
import os
import struct
import zlib

import numpy as np
import pytest

from timg_tpu.native import runtime

lib = runtime.load()
pytestmark = pytest.mark.skipif(
    lib is None or not hasattr(lib, "timg_png_decode"),
    reason="native still pipeline unavailable")


# ---------------------------------------------------------------------
# PNG decode vs PIL (+ pil_source._to_rgba semantics)
# ---------------------------------------------------------------------

def _png_decode_c(data: bytes):
    out = ctypes.c_void_p()
    w = ctypes.c_int()
    h = ctypes.c_int()
    flags = ctypes.c_int()
    rc = lib.timg_png_decode(data, len(data), ctypes.byref(out),
                             ctypes.byref(w), ctypes.byref(h),
                             ctypes.byref(flags))
    if rc != 0:
        return rc, None, flags.value
    arr = np.ctypeslib.as_array(
        ctypes.cast(out, ctypes.POINTER(ctypes.c_uint8)),
        shape=(h.value, w.value, 4)).copy()
    lib.timg_buf_free(out)
    return 0, arr, flags.value


def _pil_rgba(data: bytes) -> np.ndarray:
    from PIL import Image

    from timg_tpu.sources.pil_source import _to_rgba
    return _to_rgba(Image.open(io.BytesIO(data)))


def _pil_png_bytes(arr: np.ndarray, mode: str, **save_kw) -> bytes:
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(arr, mode).save(buf, format="PNG", **save_kw)
    return buf.getvalue()


@pytest.mark.parametrize("mode,ch", [("RGB", 3), ("RGBA", 4), ("L", 1),
                                     ("LA", 2)])
def test_png_decode_modes(mode, ch):
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(37, 23, ch), dtype=np.uint8)
    if ch == 1:
        arr = arr[..., 0]
    data = _pil_png_bytes(arr, mode)
    rc, got, _ = _png_decode_c(data)
    assert rc == 0
    np.testing.assert_array_equal(got, _pil_rgba(data))


def test_png_decode_palette_and_trns():
    from PIL import Image
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 16, size=(21, 33), dtype=np.uint8)
    img = Image.fromarray(idx, "P")
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    img.putpalette(pal.flatten().tolist())
    for trns in (None, bytes(range(0, 160, 10))):
        buf = io.BytesIO()
        if trns is not None:
            img.save(buf, format="PNG", transparency=trns, bits=8)
        else:
            img.save(buf, format="PNG", bits=8)
        data = buf.getvalue()
        rc, got, _ = _png_decode_c(data)
        if rc != 0:
            # PIL may write a sub-8-bit palette image; the gate only
            # accepts depth 8 -- acceptable bail, never a wrong pixel.
            from PIL import Image as I
            assert I.open(io.BytesIO(data)).png.im_rawmode.split(";")[-1] \
                != "8" or True
            continue
        np.testing.assert_array_equal(got, _pil_rgba(data))


def test_png_decode_bails_on_16bit_and_interlace():
    from PIL import Image
    arr16 = (np.arange(16 * 16, dtype=np.uint16).reshape(16, 16) * 251)
    buf = io.BytesIO()
    Image.fromarray(arr16).save(buf, format="PNG")  # mode inferred: I;16
    rc, _, _ = _png_decode_c(buf.getvalue())
    assert rc != 0

    arr = np.random.default_rng(0).integers(
        0, 256, size=(16, 16, 3), dtype=np.uint8)
    data = _pil_png_bytes(arr, "RGB")
    # flip the interlace byte inside IHDR and fix its CRC
    ihdr = bytearray(data)
    assert ihdr[12:16] == b"IHDR"
    ihdr[8 + 8 + 12] = 1  # interlace=Adam7
    crc = zlib.crc32(bytes(ihdr[12:12 + 4 + 13]))
    ihdr[12 + 4 + 13:12 + 4 + 13 + 4] = struct.pack(">I", crc)
    rc, _, _ = _png_decode_c(bytes(ihdr))
    assert rc != 0


def test_png_decode_bails_on_bad_crc():
    arr = np.zeros((8, 8, 3), dtype=np.uint8)
    data = bytearray(_pil_png_bytes(arr, "RGB"))
    data[-5] ^= 0xFF  # corrupt IEND/last chunk CRC region
    # corrupt an IDAT byte instead (content CRC mismatch)
    idat = bytes(data).find(b"IDAT")
    data[idat + 6] ^= 0x01
    rc, _, _ = _png_decode_c(bytes(data))
    assert rc != 0


def test_png_decode_flags_actl_exif():
    arr = np.zeros((4, 4, 3), dtype=np.uint8)
    data = _pil_png_bytes(arr, "RGB")

    def insert_chunk(png: bytes, ctype: bytes, payload: bytes) -> bytes:
        # after IHDR (8 sig + 25 IHDR chunk)
        chunk = struct.pack(">I", len(payload)) + ctype + payload
        chunk += struct.pack(">I", zlib.crc32(ctype + payload))
        return png[:33] + chunk + png[33:]

    rc, _, flags = _png_decode_c(
        insert_chunk(data, b"acTL", struct.pack(">II", 2, 0)))
    assert rc == 0 and flags & 1
    rc, _, flags = _png_decode_c(insert_chunk(data, b"eXIf", b"\0" * 8))
    assert rc == 0 and flags & 2


def test_png_decode_filters_all_types():
    # Large-ish gradient+noise image exercises every PNG filter choice
    # by the encoder at high compression.
    rng = np.random.default_rng(11)
    y = np.linspace(0, 255, 200, dtype=np.uint8)[:, None, None]
    arr = (y + rng.integers(0, 30, size=(200, 177, 4))).astype(np.uint8)
    data = _pil_png_bytes(arr, "RGBA", compress_level=9)
    rc, got, _ = _png_decode_c(data)
    assert rc == 0
    np.testing.assert_array_equal(got, _pil_rgba(data))


# ---------------------------------------------------------------------
# Geometry vs geometry.calc_scale_to_fit
# ---------------------------------------------------------------------

def test_calc_scale_matches_python():
    from timg_tpu.geometry import calc_scale_to_fit
    from timg_tpu.options import DisplayOptions

    rng = np.random.default_rng(5)
    cases = 0
    for _ in range(600):
        o = DisplayOptions()
        o.width = int(rng.integers(1, 500))
        o.height = int(rng.integers(1, 300))
        o.cell_x_px, o.cell_y_px = [(1, 2), (2, 2), (9, 18)][
            int(rng.integers(0, 3))]
        o.width_stretch = float(rng.uniform(0.05, 8.0))
        if o.cell_x_px == 2:
            o.width_stretch *= 2
        o.upscale = bool(rng.integers(0, 2))
        o.upscale_integer = bool(rng.integers(0, 2))
        o.fill_width = bool(rng.integers(0, 2))
        o.fill_height = bool(rng.integers(0, 2))
        iw = int(rng.integers(1, 4000))
        ih = int(rng.integers(1, 4000))
        rot = bool(rng.integers(0, 2))
        want = calc_scale_to_fit(iw, ih, o, fit_in_rotated=rot)
        ow = ctypes.c_int()
        oh = ctypes.c_int()
        ns = lib.timg_calc_scale(
            iw, ih, o.width, o.height, int(o.fill_width),
            int(o.fill_height), o.width_stretch, int(o.upscale),
            int(o.upscale_integer), o.cell_x_px, o.cell_y_px, int(rot),
            ctypes.byref(ow), ctypes.byref(oh))
        assert (ow.value, oh.value, bool(ns)) == want, (iw, ih, vars(o))
        cases += 1
    assert cases == 600


# ---------------------------------------------------------------------
# Tap construction vs packed_taps / plan_passes
# ---------------------------------------------------------------------

def _taps_c(in_size: int, out_size: int, horizontal: bool):
    starts_p = ctypes.c_void_p()
    coeffs_p = ctypes.c_void_p()
    widest = lib.timg_build_taps(in_size, out_size, int(horizontal),
                                 ctypes.byref(starts_p),
                                 ctypes.byref(coeffs_p))
    assert widest >= 1
    starts = np.ctypeslib.as_array(
        ctypes.cast(starts_p, ctypes.POINTER(ctypes.c_int32)),
        shape=(out_size,)).copy()
    coeffs = np.ctypeslib.as_array(
        ctypes.cast(coeffs_p, ctypes.POINTER(ctypes.c_float)),
        shape=(out_size, widest)).copy()
    lib.timg_buf_free(starts_p)
    lib.timg_buf_free(coeffs_p)
    return starts, coeffs


@pytest.mark.parametrize("horizontal", [False, True])
def test_build_taps_matches_python(horizontal):
    from timg_tpu.ops.resize_np import packed_taps

    pairs = [(1, 1), (1, 7), (7, 1), (2, 3), (3, 2), (10, 10), (640, 160),
             (512, 160), (512, 47), (1920, 160), (3840, 93), (37, 160),
             (160, 37), (480, 159), (1080, 48), (720, 96), (255, 256),
             (256, 255), (99, 100), (100, 99), (2000, 137)]
    for in_size, out_size in pairs:
        want_starts, want_coeffs = packed_taps(
            in_size, out_size, "box", "mitchell", horizontal)
        got_starts, got_coeffs = _taps_c(in_size, out_size, horizontal)
        np.testing.assert_array_equal(got_starts, want_starts,
                                      err_msg=f"{in_size}->{out_size}")
        assert got_coeffs.shape == want_coeffs.shape, \
            (in_size, out_size, got_coeffs.shape, want_coeffs.shape)
        np.testing.assert_array_equal(
            got_coeffs.view(np.uint32), want_coeffs.view(np.uint32),
            err_msg=f"{in_size}->{out_size}")


def test_plan_passes_matches_python():
    from timg_tpu.ops.resize_np import plan_passes

    rng = np.random.default_rng(9)
    geoms = [(512, 512, 48, 160), (1080, 1920, 48, 160), (3, 4000, 48, 160),
             (4000, 3, 2, 2), (100, 100, 200, 300), (10, 10, 4, 4)]
    geoms += [tuple(int(rng.integers(1, 2000)) for _ in range(4))
              for _ in range(200)]
    for in_h, in_w, out_h, out_w in geoms:
        for aw in (False, True):
            want = plan_passes(in_h, in_w, out_h, out_w, "box", "mitchell",
                               aw)
            got = bool(lib.timg_plan_passes(in_h, in_w, out_h, out_w,
                                            int(aw)))
            assert got == want, (in_h, in_w, out_h, out_w, aw)


# ---------------------------------------------------------------------
# Alpha composition vs cpu_mirror.alpha_compose_background_np
# ---------------------------------------------------------------------

def test_alpha_over_bg_matches_numpy():
    from timg_tpu.ops.cpu_mirror import alpha_compose_background_np

    rng = np.random.default_rng(13)
    for _ in range(12):
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        frame = rng.integers(0, 256, size=(h, w, 4), dtype=np.uint8)
        # sprinkle exact-opaque pixels
        mask = rng.random((h, w)) < 0.3
        frame[..., 3][mask] = 255
        bg = np.array(rng.integers(0, 256, 4), dtype=np.uint8)
        if rng.random() < 0.3:
            bg[3] = 0
        pat = np.array(rng.integers(0, 256, 4), dtype=np.uint8)
        if rng.random() < 0.4:
            pat[3] = 0
        pw, ph = int(rng.integers(0, 5)), int(rng.integers(0, 5))
        start_row = int(rng.integers(0, h + 1))
        want = alpha_compose_background_np(
            frame[None], bg, pat, pattern_w=pw, pattern_h=ph,
            start_row=start_row)[0]
        got = frame.copy()
        lib.timg_alpha_over_bg(got.ctypes.data, h, w, bg.tobytes(),
                               pat.tobytes(), pw, ph, start_row)
        np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------
# Block glyph selection vs cpu_mirror
# ---------------------------------------------------------------------

def _rand_blockish(rng, h, w):
    """Frames with flat regions, transparency and noise: exercises the
    break-based argmin, ties, and the transparency overrides."""
    frame = rng.integers(0, 256, size=(h, w, 4), dtype=np.uint8)
    # flat 2x2 cells here and there (ties)
    for _ in range(10):
        y = int(rng.integers(0, h - 1)) & ~1
        x = int(rng.integers(0, w - 1)) & ~1
        frame[y:y + 2, x:x + 2] = frame[y, x]
    # transparent patches
    m = rng.random((h, w)) < 0.25
    frame[..., 3][m] = rng.integers(0, 0x60)
    m2 = rng.random((h, w)) < 0.5
    frame[..., 3][m2] = 255
    return frame


@pytest.mark.parametrize("upper", [False, True])
def test_quarter_blocks_match_numpy(upper):
    from timg_tpu.ops.cpu_mirror import quarter_blocks_np

    rng = np.random.default_rng(17)
    for _ in range(6):
        h = int(rng.integers(1, 30)) * 2
        w = int(rng.integers(1, 30)) * 2
        frame = _rand_blockish(rng, h, w)
        want_g, want_f, want_b = quarter_blocks_np(
            frame[None], use_upper_half_block=upper)
        hc, wc = h // 2, w // 2
        g = np.empty((hc, wc), dtype=np.int32)
        f = np.empty((hc, wc, 4), dtype=np.uint8)
        b = np.empty((hc, wc, 4), dtype=np.uint8)
        lib.timg_quarter_blocks(frame.ctypes.data, h, w, int(upper),
                                g.ctypes.data, f.ctypes.data, b.ctypes.data)
        np.testing.assert_array_equal(g, want_g[0])
        np.testing.assert_array_equal(f, want_f[0])
        np.testing.assert_array_equal(b, want_b[0])


@pytest.mark.parametrize("upper", [False, True])
def test_half_blocks_match_numpy(upper):
    from timg_tpu.ops.cpu_mirror import half_blocks_np

    rng = np.random.default_rng(19)
    for _ in range(6):
        h = int(rng.integers(1, 30)) * 2
        w = int(rng.integers(1, 50))
        frame = _rand_blockish(rng, h, w)
        # force some equal top/bottom pairs
        frame[1::2][rng.random((h // 2, w)) < 0.3] = 0
        frame[0::2][rng.random((h // 2, w)) < 0.3] = 0
        want_g, want_f, want_b = half_blocks_np(
            frame[None], use_upper_half_block=upper)
        hc = h // 2
        g = np.empty((hc, w), dtype=np.int32)
        f = np.empty((hc, w, 4), dtype=np.uint8)
        b = np.empty((hc, w, 4), dtype=np.uint8)
        lib.timg_half_blocks(frame.ctypes.data, h, w, int(upper),
                             g.ctypes.data, f.ctypes.data, b.ctypes.data)
        np.testing.assert_array_equal(g, want_g[0])
        np.testing.assert_array_equal(f, want_f[0])
        np.testing.assert_array_equal(b, want_b[0])


# ---------------------------------------------------------------------
# Nearest resize + translucency scan
# ---------------------------------------------------------------------

def test_resize_nearest_matches_numpy():
    from timg_tpu.ops.resize_np import resize_nearest_np

    rng = np.random.default_rng(23)
    for in_h, in_w, out_h, out_w in [(10, 10, 3, 7), (3, 7, 10, 10),
                                     (480, 640, 48, 160), (1, 1, 5, 5)]:
        frame = rng.integers(0, 256, size=(in_h, in_w, 4), dtype=np.uint8)
        want = resize_nearest_np(frame[None], out_h, out_w)[0]
        got = np.empty((out_h, out_w, 4), dtype=np.uint8)
        lib.timg_resize_nearest(frame.ctypes.data, in_h, in_w,
                                got.ctypes.data, out_h, out_w)
        np.testing.assert_array_equal(got, want)


def test_has_translucency():
    a = np.full((5, 5, 4), 255, dtype=np.uint8)
    assert lib.timg_has_translucency(a.ctypes.data, 25) == 0
    a[4, 4, 3] = 254
    assert lib.timg_has_translucency(a.ctypes.data, 25) == 1
