"""Column-run transport: device compaction (ops/sixel_runs.py) and the
native records assembler (timg_native.cc:timg_sixel_encode_runs) must be
lossless and byte-identical to the plane path.

Role in the reference: libsixel's encoder RLEs per-color band rows on
the host after quantization (ref src/sixel-canvas.cc:128-154); the
TPU-native design compresses equivalently *before* the device->host
transfer so sustained sixel streams ship run records instead of planes.
"""

import numpy as np
import pytest

from timg_tpu.ops import sixel_runs as sr
from timg_tpu.render.sixel_render import (encode_sixel_stream,
                                          encode_sixel_stream_runs,
                                          encode_sixel_stream_py)


def _planes_cases():
    rng = np.random.default_rng(42)
    cases = []
    # flat/UI-like: few colors, long runs
    p = np.zeros((36, 40), np.uint8)
    p[:, 10:20] = 3
    p[7:20, 25:] = 250
    cases.append(("flat", p, 36, 40))
    # noise: worst case, run per column
    cases.append(("noise", rng.integers(0, 256, (30, 33), np.uint8),
                  30, 33))
    # partial last band (h % 6 != 0)
    cases.append(("partial", rng.integers(0, 8, (23, 17), np.uint8),
                  23, 17))
    # single band, single column
    cases.append(("tiny", rng.integers(0, 4, (6, 1), np.uint8), 6, 1))
    # one row (h < 6)
    cases.append(("one-row", rng.integers(0, 5, (1, 9), np.uint8), 1, 9))
    # padded plane: valid region smaller than the array
    big = rng.integers(0, 16, (64, 128), np.uint8)
    cases.append(("padded", big, 18, 40))
    return cases


@pytest.mark.parametrize("name,plane,h,w",
                         _planes_cases(), ids=lambda c: c if isinstance(
                             c, str) else "")
def test_numpy_roundtrip(name, plane, h, w):
    runs = sr.compact_runs_np(plane, h, w)
    assert runs.band_counts.sum() == len(runs.records)
    out = sr.expand_runs_np(runs)
    np.testing.assert_array_equal(out, plane[:h, :w])


@pytest.mark.parametrize("name,plane,h,w",
                         _planes_cases(), ids=lambda c: c if isinstance(
                             c, str) else "")
def test_device_matches_numpy(name, plane, h, w):
    import jax.numpy as jnp

    batch = np.stack([plane, np.roll(plane, 3, axis=1)])
    cap = sr.default_cap(h, w)
    import jax
    records, band_counts = jax.jit(
        sr.compact_runs, static_argnums=(1, 2, 3))(
            jnp.asarray(batch), h, w, cap)
    counts = jax.jit(sr.run_counts, static_argnums=(1, 2))(
        jnp.asarray(batch), h, w)
    records, band_counts = np.asarray(records), np.asarray(band_counts)
    counts = np.asarray(counts)
    for i in range(2):
        ref = sr.compact_runs_np(batch[i], h, w)
        n = int(counts[i])
        assert n == ref.band_counts.sum() == band_counts[i].sum()
        if n <= cap:
            np.testing.assert_array_equal(records[i, :n], ref.records)
        np.testing.assert_array_equal(band_counts[i], ref.band_counts)


@pytest.mark.parametrize("name,plane,h,w",
                         _planes_cases(), ids=lambda c: c if isinstance(
                             c, str) else "")
def test_records_assembler_byte_identity(name, plane, h, w):
    rng = np.random.default_rng(7)
    palette = rng.integers(0, 256, (256, 3), np.uint8)
    runs = sr.compact_runs_np(plane, h, w)
    want = encode_sixel_stream(np.ascontiguousarray(plane[:h, :w]),
                               palette)
    got = encode_sixel_stream_runs(runs, palette)
    assert got == want


def test_small_palette_drops_high_indices():
    """Plane indices >= n_colors are silently dropped by the plane
    assembler's emission loop; the records assembler must match."""
    rng = np.random.default_rng(3)
    plane = rng.integers(0, 256, (12, 20), np.uint8)
    palette = rng.integers(0, 256, (16, 3), np.uint8)
    runs = sr.compact_runs_np(plane, 12, 20)
    assert (encode_sixel_stream_runs(runs, palette)
            == encode_sixel_stream(plane, palette)
            == encode_sixel_stream_py(plane, palette))


def test_python_fallback_matches_native():
    """encode_sixel_stream_runs python fallback (expand + plane path)
    must agree with the native records assembler."""
    from timg_tpu.native import runtime

    lib = runtime.load()
    if lib is None or not hasattr(lib, "timg_sixel_encode_runs"):
        pytest.skip("native helper unavailable")
    rng = np.random.default_rng(11)
    plane = rng.integers(0, 64, (18, 30), np.uint8)
    palette = rng.integers(0, 256, (64, 3), np.uint8)
    runs = sr.compact_runs_np(plane, 18, 30)
    native = encode_sixel_stream_runs(runs, palette)
    fallback = encode_sixel_stream(sr.expand_runs_np(runs), palette)
    assert native == fallback


def test_merged_adjacent_runs():
    """Adjacent column runs that differ in one row but share a color's
    bits in others must merge into a single RLE token (byte identity
    depends on maximal-run semantics)."""
    plane = np.zeros((6, 12), np.uint8)
    plane[0, :] = 5          # color 5 spans all columns in row 0
    plane[1, 6:] = 9         # column change at x=6
    palette = np.zeros((16, 3), np.uint8)
    palette[:, 0] = np.arange(16, dtype=np.uint8) * 16
    runs = sr.compact_runs_np(plane, 6, 12)
    assert runs.band_counts[0] == 2
    assert (encode_sixel_stream_runs(runs, palette)
            == encode_sixel_stream(plane, palette))


def test_fuzz_byte_identity():
    rng = np.random.default_rng(0)
    for trial in range(40):
        h = int(rng.integers(1, 40))
        w = int(rng.integers(1, 60))
        ncol = int(rng.integers(2, 257))
        # mix flat patches and noise for realistic run structure
        plane = rng.integers(0, ncol, (h, w)).astype(np.uint8)
        if trial % 2:
            plane[:, : w // 2] = plane[0, 0]
        palette = rng.integers(0, 256, (ncol, 3), np.uint8)
        runs = sr.compact_runs_np(plane, h, w)
        np.testing.assert_array_equal(sr.expand_runs_np(runs), plane)
        assert (encode_sixel_stream_runs(runs, palette)
                == encode_sixel_stream(plane, palette)), (h, w, ncol)


# ---------------------------------------------------------------------------
# Transport wiring (plane_cache -> canvas)
# ---------------------------------------------------------------------------

def _flat_frames(n=4, h=24, w=30):
    """Compressible frames: few flat colors => adaptive palettes hit
    exactly and the dithered planes collapse to a handful of runs."""
    frames = []
    for i in range(n):
        f = np.zeros((h, w, 4), np.uint8)
        f[..., 0] = 40 + 10 * i
        f[..., 1] = 200
        f[:, w // 2:, 2] = 180
        f[..., 3] = 255
        frames.append(f)
    return frames


def _prime(frames, transport, monkeypatch):
    from timg_tpu.options import DisplayOptions
    from timg_tpu.render.plane_cache import (SIXEL_PLANES,
                                             prime_sixel_planes)

    # FORCE_DEVICE pins the routed dispatch to the jax path so the
    # device-branch transport logic runs on the CPU backend too.
    monkeypatch.setenv("TIMG_TPU_FORCE_DEVICE", "1")
    monkeypatch.setenv("TIMG_TPU_SIXEL_TRANSPORT", transport)
    opts = DisplayOptions()
    opts.sixel_batch_dither = "libsixel"
    opts.bgcolor_getter = lambda: (0, 0, 0, 255)
    prime_sixel_planes(frames, opts, {}, sustained=True)
    out = []
    for f in frames:
        primed = SIXEL_PLANES.pop(f)
        assert primed is not None
        out.append(primed)
    return out


def test_prime_transport_runs_matches_plane(monkeypatch):
    frames = _flat_frames()
    plane_entries = _prime([f.copy() for f in frames], "plane",
                           monkeypatch)
    runs_entries = _prime([f.copy() for f in frames], "runs", monkeypatch)
    for (pi, ppal, _), (ri, rpal, _) in zip(plane_entries, runs_entries):
        assert isinstance(ri, sr.SixelRuns)
        np.testing.assert_array_equal(ppal, rpal)
        np.testing.assert_array_equal(sr.expand_runs_np(ri),
                                      np.asarray(pi))
        assert (encode_sixel_stream_runs(ri, rpal)
                == encode_sixel_stream(np.asarray(pi), ppal))


def test_prime_transport_auto_policy(monkeypatch):
    # flat content: auto picks run records
    for entry in _prime(_flat_frames(), "auto", monkeypatch):
        assert isinstance(entry[0], sr.SixelRuns)
    # per-pixel noise: auto keeps the raw plane (runs would be larger)
    rng = np.random.default_rng(5)
    noisy = [rng.integers(0, 256, (24, 30, 4), dtype=np.uint8)
             for _ in range(3)]
    for f in noisy:
        f[..., 3] = 255
    for entry in _prime(noisy, "auto", monkeypatch):
        assert isinstance(entry[0], np.ndarray)


def test_cli_video_sixel_transport_byte_identity(tmp_path, monkeypatch):
    """-ps video through the CLI (sustained multi-frame window): run
    transport and plane transport must produce identical escape
    streams.  Needs a pty with pixel dimensions: sixel animations are
    gated on a known cell size (reference parity)."""
    import os

    from tests.test_protocols import _with_scripted_pty
    from timg_tpu.cli import main as cli_main

    y4m = tmp_path / "v.y4m"
    w, h, n = 64, 48, 4
    with open(y4m, "wb") as f:
        f.write(("YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C420jpeg\n"
                 % (w, h)).encode())
        for i in range(n):
            f.write(b"FRAME\n")
            y = np.full((h, w), 60 + 20 * i, np.uint8)
            y[:, w // 2:] = 200 - 10 * i
            f.write(y.tobytes())
            f.write(np.full((h // 2, w // 2), 110, np.uint8).tobytes())
            f.write(np.full((h // 2, w // 2), 140, np.uint8).tobytes())
    monkeypatch.setenv("TIMG_TPU_FORCE_DEVICE", "1")

    def run(transport):
        monkeypatch.setenv("TIMG_TPU_SIXEL_TRANSPORT", transport)
        out = tmp_path / f"out.{transport}"

        def inner(slave):
            saved = os.dup(1)
            try:
                os.dup2(slave, 1)
                rc = cli_main(["--debug-no-frame-delay", "-g40x20",
                               "-ps", "-b", "black", "--loops=1",
                               "-o", str(out), str(y4m)])
            finally:
                os.dup2(saved, 1)
                os.close(saved)
            assert rc == 0
            return out.read_bytes()

        return _with_scripted_pty(inner, {})

    outs = {t: run(t) for t in ("plane", "runs", "auto")}
    assert outs["plane"] == outs["runs"] == outs["auto"]
    assert outs["plane"].count(b"\033Pq") == n
