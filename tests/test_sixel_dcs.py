"""Device-side sixel DCS emission (ops/sixel_dcs.py).

Pins the zero-host-assembly transport chain byte-for-byte:

    device (jit) == numpy mirror == native timg_sixel_encode

across geometry (partial bands, odd dims, 1-column, tall/wide),
content (random, flat, gradients, out-of-palette indices), and palette
sizes 1..256.  VERDICT r4 #4: this transport removes the measured
7.8 ms/frame host assembly leg (the splice is 1 join of band slices).
Ref anchor: src/sixel-canvas.cc:128-154 (the stage the reference runs
on host threads).
"""

import ctypes

import numpy as np
import pytest

from timg_tpu.ops import sixel_dcs


def _native():
    from timg_tpu.native import runtime
    lib = runtime.load()
    if lib is None or not hasattr(lib, "timg_sixel_encode"):
        pytest.skip("native assembler unavailable")
    return lib


def c_encode(lib, plane, h, w, palette):
    n_colors = len(palette) // 3
    nb = (h + 5) // 6
    cap = nb * max(n_colors, 1) * (w + 12) + n_colors * 20 + 256
    buf = ctypes.create_string_buffer(cap)
    pal = np.ascontiguousarray(palette, np.uint8)
    plane = np.ascontiguousarray(plane)
    n = lib.timg_sixel_encode(plane.ctypes.data, h, w, plane.strides[0],
                              pal.ctypes.data, n_colors, buf)
    return ctypes.string_at(buf, n)


def _content(rng, h, w, ncol, cls):
    if cls == 0:      # random incl. out-of-palette indices
        return rng.integers(0, min(ncol + 2, 256), (h, w), np.uint8)
    if cls == 1:      # flat
        return np.full((h, w), rng.integers(0, ncol), np.uint8)
    if cls == 2:      # gradient (long runs)
        return ((np.add.outer(np.arange(h), np.arange(w)) // 7)
                % ncol).astype(np.uint8)
    # vertical stripes (column runs, all-six-rows-equal columns)
    return (np.arange(w)[None].repeat(h, 0) % ncol).astype(np.uint8)


GEOS = [(12, 16, 4), (13, 17, 8), (6, 40, 3), (5, 9, 2), (24, 64, 16),
        (31, 45, 30), (1, 1, 1), (3, 200, 5), (48, 7, 256)]


@pytest.mark.parametrize("h,w,ncol", GEOS)
def test_mirror_matches_native(h, w, ncol):
    lib = _native()
    rng = np.random.default_rng(h * 100 + w + ncol)
    palette = rng.integers(0, 256, ncol * 3, np.uint8)
    for cls in range(4):
        plane = _content(rng, h, w, ncol, cls)
        bands, lens, ovf = sixel_dcs.encode_np(plane, h, w, ncol,
                                               color_cap=64)
        if ovf:
            assert ncol > 64  # only large palettes can overflow the cap
            continue
        got = sixel_dcs.splice_host(bands, lens, h, w, palette)
        want = c_encode(lib, plane, h, w, palette)
        assert got == want, (h, w, ncol, cls)


@pytest.mark.parametrize("h,w,ncol", GEOS[:6])
def test_device_matches_mirror(h, w, ncol):
    import jax
    import jax.numpy as jnp

    enc = jax.jit(sixel_dcs.encode_device, static_argnums=(1, 2, 3, 4, 5))
    rng = np.random.default_rng(7 + h + w)
    for cls in range(4):
        plane = _content(rng, h, w, ncol, cls)
        bands_np, lens_np, ovf = sixel_dcs.encode_np(plane, h, w, ncol, 64)
        assert not ovf
        cap = int(lens_np.max()) + 9
        bands_d, lens_d, counts = enc(jnp.asarray(plane), h, w, ncol,
                                      64, cap)
        np.testing.assert_array_equal(np.asarray(lens_d), lens_np)
        bands_d = np.asarray(bands_d)
        for b in range(len(lens_np)):
            np.testing.assert_array_equal(bands_d[b, :lens_np[b]],
                                          bands_np[b, :lens_np[b]])


def test_device_full_chain_720p_class():
    """Mid-size dithered-like plane: device splice == native bytes, and
    the padded ship size beats the plane transport."""
    import jax
    import jax.numpy as jnp

    lib = _native()
    rng = np.random.default_rng(11)
    h, w, ncol = 96, 320, 64
    # gradient + dither-ish noise: the e2e bench content class
    base = (np.add.outer(np.arange(h), np.arange(w)) * ncol
            // (h + w)).astype(np.int32)
    plane = np.clip(base + rng.integers(-1, 2, (h, w)), 0,
                    ncol - 1).astype(np.uint8)
    palette = rng.integers(0, 256, ncol * 3, np.uint8)

    lens, counts = jax.jit(sixel_dcs.band_lens_device,
                           static_argnums=(1, 2, 3, 4))(
        jnp.asarray(plane), h, w, ncol, 64)
    assert int(np.asarray(counts).max()) <= 64
    cap = (int(np.asarray(lens).max()) + 255) // 256 * 256
    enc = jax.jit(sixel_dcs.encode_device, static_argnums=(1, 2, 3, 4, 5))
    bands, lens_d, _ = enc(jnp.asarray(plane), h, w, ncol, 64, cap)
    got = sixel_dcs.splice_host(np.asarray(bands), np.asarray(lens_d),
                                h, w, palette)
    want = c_encode(lib, plane, h, w, palette)
    assert got == want
    nb = (h + 5) // 6
    assert nb * cap < h * w  # ships smaller than the index plane


def test_overflow_reported():
    """More distinct colors per band than color_cap -> overflow flag
    (callers fall back to the plane transport)."""
    rng = np.random.default_rng(0)
    plane = rng.permutation(256).astype(np.uint8).reshape(4, 64)
    _, _, ovf = sixel_dcs.encode_np(plane, 4, 64, 256, color_cap=64)
    assert ovf


def test_splice_framing_matches_native_header():
    """Empty-ish plane: header/palette/ST framing is byte-exact."""
    lib = _native()
    plane = np.zeros((6, 8), np.uint8)
    palette = np.array([10, 20, 30], np.uint8)  # one color
    bands, lens, ovf = sixel_dcs.encode_np(plane, 6, 8, 1, 64)
    got = sixel_dcs.splice_host(bands, lens, 6, 8, palette)
    want = c_encode(lib, plane, 6, 8, palette)
    assert got == want


# --- transport + CLI wiring -------------------------------------------------

def test_transport_returns_dcs_entries(monkeypatch):
    """fetch_planes_or_runs ships SixelDcs for dense dithered content
    when forced, and the canvas encoder reproduces the plane bytes."""
    import jax.numpy as jnp

    from timg_tpu.ops.sixel_runs import STATS, fetch_planes_or_runs
    from timg_tpu.render.sixel_render import (encode_sixel_stream,
                                              encode_sixel_stream_dcs)

    rng = np.random.default_rng(2)
    b, h, w, ncol = 3, 36, 48, 40
    base = (np.add.outer(np.arange(h), np.arange(w)) * ncol
            // (h + w)).astype(np.int32)
    planes = np.stack([
        np.clip(base + rng.integers(-1, 2, (h, w)), 0,
                ncol - 1).astype(np.uint8) for _ in range(b)])
    palette = rng.integers(0, 256, (ncol, 3), np.uint8)

    monkeypatch.setenv("TIMG_TPU_SIXEL_TRANSPORT", "dcs")
    before = STATS["frames_dcs"]
    entries = fetch_planes_or_runs(jnp.asarray(planes), b, h, w)
    assert STATS["frames_dcs"] == before + b
    for i, e in enumerate(entries):
        assert isinstance(e, sixel_dcs.SixelDcs)
        got = encode_sixel_stream_dcs(e, palette)
        want = encode_sixel_stream(planes[i], palette)
        assert got == want


def test_transport_auto_falls_back_on_color_overflow(monkeypatch):
    """>COLOR_CAP distinct colors in a band -> plane transport."""
    import jax.numpy as jnp

    from timg_tpu.ops.sixel_runs import fetch_planes_or_runs

    rng = np.random.default_rng(4)
    # every band has ~192 distinct colors -> overflow; also defeats the
    # run transport (every column distinct)
    planes = rng.permuted(
        np.tile(np.arange(256, dtype=np.uint8), (2, 12, 2)), axis=-1)
    monkeypatch.setenv("TIMG_TPU_SIXEL_TRANSPORT", "dcs")
    entries = fetch_planes_or_runs(jnp.asarray(planes), 2, 12, 512)
    assert all(isinstance(e, np.ndarray) for e in entries)


def test_cli_dcs_transport_byte_identity(tmp_path, monkeypatch):
    """-ps video through TIMG_TPU_SIXEL_TRANSPORT=dcs emits the same
    bytes as the plane transport, for all three dither modes."""
    from tests.test_video_device_window import _run_cli_pty, _y4m

    y4m = _y4m(tmp_path)
    for dither in ("libsixel", "cube", "adaptive"):
        argv = ["--debug-no-frame-delay", "-g40x20", "-ps", "-b",
                "black", "--loops=1", f"--dither={dither}", y4m]
        monkeypatch.setenv("TIMG_TPU_SIXEL_TRANSPORT", "dcs")
        dcs = _run_cli_pty(argv, tmp_path / "dcs.out", monkeypatch, True)
        monkeypatch.setenv("TIMG_TPU_SIXEL_TRANSPORT", "plane")
        plane = _run_cli_pty(argv, tmp_path / "plane.out", monkeypatch,
                             True)
        monkeypatch.delenv("TIMG_TPU_SIXEL_TRANSPORT")
        assert dcs == plane, dither
        assert dcs.count(b"\033Pq") == 5


def test_auto_dcs_session_verdict(monkeypatch):
    """auto mode races one warm DCS emit+fetch against the raw-plane
    fetch on the first qualifying window and sticks with the winner
    (measured on the dev tunnel: a DCS body 1.07x the plane size cost
    ~10x the fetch time; on a PCIe host DCS wins by deleting the host
    assembly leg).  Forced mode ignores the verdict."""
    import jax.numpy as jnp

    from timg_tpu.ops import sixel_runs

    # checkerboard: column runs are all length 1 (runs transport
    # loses), only 2 colors per band and short RLE (DCS body buckets
    # well under the plane size) -- the auto path's DCS zone
    # (large enough that the DCS body beats bucket_cap's 512-byte
    # band floor against the plane size)
    b, h, w = 2, 60, 400
    base = (np.add.outer(np.arange(h), np.arange(w)) % 2).astype(
        np.uint8)
    planes = np.stack([base ^ (i % 2) for i in range(b)])
    dev = jnp.asarray(planes)

    monkeypatch.setenv("TIMG_TPU_SIXEL_TRANSPORT", "auto")

    # pinned verdict False: auto never ships DCS (runs/plane only)
    monkeypatch.setattr(sixel_runs, "_DCS_FASTER", False)
    for e in sixel_runs.fetch_planes_or_runs(dev, b, h, w):
        assert not isinstance(e, sixel_dcs.SixelDcs)

    # pinned verdict True: auto may ship DCS on qualifying content
    # (this content qualifies: dense, few colors per band, runs lose)
    monkeypatch.setattr(sixel_runs, "_DCS_FASTER", True)
    kinds = {type(e).__name__
             for e in sixel_runs.fetch_planes_or_runs(dev, b, h, w)}
    assert kinds == {"SixelDcs"}

    # un-judged session: the first qualifying auto window records a
    # verdict (either way -- it is a timing race on this host)
    monkeypatch.setattr(sixel_runs, "_DCS_FASTER", None)
    sixel_runs.fetch_planes_or_runs(dev, b, h, w)
    assert sixel_runs._DCS_FASTER is not None

    # forced dcs ignores a False verdict
    monkeypatch.setenv("TIMG_TPU_SIXEL_TRANSPORT", "dcs")
    monkeypatch.setattr(sixel_runs, "_DCS_FASTER", False)
    for e in sixel_runs.fetch_planes_or_runs(dev, b, h, w):
        assert isinstance(e, sixel_dcs.SixelDcs)
