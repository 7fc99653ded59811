"""libsixel-quantizer fidelity suite.

Pins the production `--dither=libsixel` path (C, timg_native.cc
timg_libsixel_quant) byte-for-byte against the scalar oracle
(ops/libsixel_quant.py) — the same oracle discipline as the stb resize
suite — and quantifies the documented deviations of the fast TPU modes
(tree box-membership vs exact nearest-neighbor; libsixel's first-touch
lookup cache).  Reference settings: sixel_dither_new(256) +
SIXEL_LARGE_LUM / SIXEL_REP_AVERAGE_COLORS / SIXEL_QUALITY_AUTO
(ref src/sixel-canvas.cc:134-148).
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pytest

from timg_tpu.native import runtime
from timg_tpu.ops import libsixel_quant as lsq
from timg_tpu.ops import sixel as sixel_op


def _images():
    rng = np.random.default_rng(42)
    out = []
    # pure noise, >256 buckets (mediancut + FS path)
    out.append(("noise", rng.integers(0, 256, (40, 57, 3)).astype(np.uint8)))
    # smooth gradient + noise (typical photo statistics)
    y, x = np.mgrid[0:48, 0:64]
    grad = np.stack([x * 4, y * 5, (x + y) * 2], axis=-1)
    noisy = np.clip(grad + rng.normal(0, 12, grad.shape), 0,
                    255).astype(np.uint8)
    out.append(("gradient", noisy))
    # few colors: origcolors <= 256 -> palette passthrough, no dithering
    flat = np.zeros((30, 41, 3), np.uint8)
    flat[:, :20] = (200, 30, 90)
    flat[15:, 20:] = (10, 250, 60)
    out.append(("flat", flat))
    # tiny (the 6-pixel small-image sampling step dominates)
    out.append(("tiny", rng.integers(0, 256, (6, 9, 3)).astype(np.uint8)))
    # single row / single column edges of the diffusion guards
    out.append(("row", rng.integers(0, 256, (1, 50, 3)).astype(np.uint8)))
    out.append(("col", rng.integers(0, 256, (50, 1, 3)).astype(np.uint8)))
    return out


@pytest.fixture(scope="module")
def native_lib():
    lib = runtime.load()
    if lib is None or not hasattr(lib, "timg_libsixel_quant"):
        pytest.skip("native helper unavailable")
    return lib


# ---------------------------------------------------------------------------
# Production C path == scalar oracle, bit for bit
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name,img", _images(), ids=[n for n, _ in _images()])
def test_c_matches_oracle(native_lib, name, img):
    idx_o, pal_o = lsq.quantize_reference(img)
    res = runtime.libsixel_quant(img)
    assert res is not None
    idx_c, pal_c = res
    np.testing.assert_array_equal(pal_c, pal_o)
    np.testing.assert_array_equal(idx_c.astype(np.int32), idx_o)


def test_c_matches_oracle_rgba_pitch(native_lib):
    """RGBA input with a row pitch (strided view) matches the oracle."""
    rng = np.random.default_rng(3)
    rgba = rng.integers(0, 256, (33, 70, 4)).astype(np.uint8)
    view = rgba[:, :48]  # non-contiguous rows: pitch > w*4
    idx_o, pal_o = lsq.quantize_reference(view)
    idx_c, pal_c = runtime.libsixel_quant(view)
    np.testing.assert_array_equal(pal_c, pal_o)
    np.testing.assert_array_equal(idx_c.astype(np.int32), idx_o)


# ---------------------------------------------------------------------------
# Pinned semantics of the oracle itself
# ---------------------------------------------------------------------------

def test_histogram_buckets_and_first_seen_order():
    # 18 pixels; the small-input rule samples every 6th -> 0, 6, 12
    img = np.zeros((1, 18, 3), np.uint8)
    img[0, 0] = (255, 0, 0)
    img[0, 6] = (7, 7, 7)     # bucket (0,0,0)
    img[0, 12] = (250, 3, 2)  # same bucket as pixel 0
    colors, counts = lsq.compute_histogram(img)
    # 5-bit buckets reconstructed as <<3: 255->248, 250->248, 7->0
    np.testing.assert_array_equal(colors, [[248, 0, 0], [0, 0, 0]])
    np.testing.assert_array_equal(counts, [2, 1])


def test_small_image_six_pixel_sampling():
    """Inputs under max_sample pixels are sampled every 6th pixel
    (libsixel computeHistogram's small-input step)."""
    img = (np.arange(36, dtype=np.int32).reshape(1, 12, 3) * 7).astype(
        np.uint8)
    colors, _ = lsq.compute_histogram(img)
    # pixels 0 and 6 only
    expect = (np.stack([img[0, 0], img[0, 6]]).astype(np.int32) // 8) * 8
    np.testing.assert_array_equal(colors, expect)


def test_large_image_sampling_step():
    """Inputs over max_sample pixels use step = npix // 18383."""
    h, w = 200, 100  # 20000 px > 18383
    img = np.zeros((h, w, 3), np.uint8)
    img.reshape(-1, 3)[::2] = 255  # alternate black / white
    colors, counts = lsq.compute_histogram(img)
    # step = 20000 // 18383 * 1 = 1 pixel -> both colors, 10000 each
    assert len(colors) == 2 and counts.sum() == 20000


def test_few_colors_disable_diffusion():
    img = np.zeros((20, 20, 3), np.uint8)
    img[10:] = (100, 150, 200)
    palette, diffuse = lsq.make_palette(img)
    assert not diffuse
    # palette is the raw buckets <<3 (multiples of 8)
    assert (palette % 8 == 0).all()
    np.testing.assert_array_equal(palette, [[0, 0, 0], [96, 144, 200]])


def test_rep_average_colors_floor_division():
    """Representative = unweighted mean of distinct colors, floored."""
    # Construct >256 distinct buckets from two clusters so mediancut runs.
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
    colors, counts = lsq.compute_histogram(img)
    assert len(colors) > 256
    pal = lsq.median_cut(colors, counts, 256)
    assert pal.shape == (256, 3)
    # every entry must be expressible as floor(mean of multiples of 8)
    # -> value * n == sum of multiples of 8 for some n; weak but real
    # invariant: entries cannot exceed 248 (max bucket color)
    assert pal.max() <= 248


def test_median_split_prefers_luminosity_axis():
    """Green spread outweighs an equal red spread (0.5866 vs 0.2989)."""
    colors = np.array([[0, 0, 0], [248, 0, 0], [0, 248, 0]], np.int32)
    counts = np.array([1, 1, 1], np.int64)
    pal = lsq.median_cut(colors, counts, 2)
    # split axis = green; stable sort keeps [(0,0,0),(248,0,0),(0,248,0)].
    # The median loop stops once lowersum >= sum/2 (1 >= 3//2), so the
    # cut is after the first color: {(0,0,0)} and the other two averaged.
    got = {tuple(v) for v in pal[:2].tolist()}
    assert got == {(0, 0, 0), (124, 124, 0)}


def test_fs_truncation_toward_zero():
    assert lsq._trunc_div(-5, 7, 16) == -2  # C: -35/16 == -2, not -3
    assert lsq._trunc_div(5, 7, 16) == 2
    assert lsq._trunc_div(-3, 1, 16) == 0


def test_cache_first_touch_semantics():
    """All pixels in one 5-bit bucket reuse the first pixel's index."""
    # palette entries 8 and 16; pixels 15 and 9 share bucket 1
    pal = np.array([[8, 8, 8], [16, 16, 16]], np.uint8)
    img = np.array([[[15, 15, 15], [9, 9, 9]]], np.uint8)
    idx = lsq.apply_palette_reference(img, pal, diffuse=False,
                                      use_cache=True)
    # NN(15)=16 (idx 1) cached; 9 would be NN 8 but reuses 1
    np.testing.assert_array_equal(idx, [[1, 1]])
    idx_nc = lsq.apply_palette_reference(img, pal, diffuse=False,
                                         use_cache=False)
    np.testing.assert_array_equal(idx_nc, [[1, 0]])


# ---------------------------------------------------------------------------
# Quantified deviations (committed evidence for VERDICT items)
# ---------------------------------------------------------------------------

def _render_mse(rgb, palette, indices):
    return float(((rgb.astype(np.float64)
                   - palette[indices].astype(np.float64)) ** 2).mean())


def test_cache_vs_exact_nn_divergence_bounded():
    """libsixel's first-touch cache vs exact NN: bounded index churn and
    near-equal rendered error (documents the deviation of the TPU
    libsixel mode, which cannot reproduce raster-order cache state)."""
    rng = np.random.default_rng(5)
    y, x = np.mgrid[0:40, 0:60]
    img = np.clip(np.stack([x * 4, y * 6, 255 - x * 3], -1)
                  + rng.normal(0, 10, (40, 60, 3)), 0, 255).astype(np.uint8)
    pal, diffuse = lsq.make_palette(img)
    assert diffuse
    cached = lsq.apply_palette_reference(img, pal, True, use_cache=True)
    exact = lsq.apply_palette_reference(img, pal, True, use_cache=False)
    frac_diff = float((cached != exact).mean())
    mse_c = _render_mse(img, pal.astype(np.int32), cached)
    mse_e = _render_mse(img, pal.astype(np.int32), exact)
    assert frac_diff < 0.60          # same quantizer class
    assert mse_c <= mse_e * 1.6 + 8  # cache costs little rendered error


def test_tree_vs_exact_nn_error_bound():
    """Adaptive tree dither (the CLI default): committed quality bounds
    for box-membership descent vs exact NN and vs the libsixel pipeline.

    Measured (this corpus): photo-like noise (sigma=3) -> tree ~1.25x
    exact-NN MSE and *at or below* libsixel's own rendered MSE; heavy
    noise (sigma=14) -> tree up to ~1.5x exact-NN.  These asserts pin
    those envelopes so a quantizer regression is caught."""
    rng = np.random.default_rng(11)
    y, x = np.mgrid[0:48, 0:64]

    def run(noise):
        img = np.clip(np.stack([x * 3 + 20, y * 4, (x + y) * 2], -1)
                      + rng.normal(0, noise, (48, 64, 3)),
                      0, 255).astype(np.uint8)
        palette, levels, leaves = sixel_op.median_cut_tree(img)
        tree_idx = sixel_op.fs_dither_tree_reference(img, palette, levels,
                                                     leaves)
        exact_idx = sixel_op.fs_dither_reference(img, palette)
        pal_ls, diffuse = lsq.make_palette(img)
        ls_idx = lsq.apply_palette_reference(img, pal_ls, diffuse)
        return (_render_mse(img, palette.astype(np.int32), tree_idx),
                _render_mse(img, palette.astype(np.int32), exact_idx),
                _render_mse(img, pal_ls.astype(np.int32), ls_idx))

    tree, exact, libsix = run(3)     # photo-like statistics
    assert tree <= exact * 1.35 + 2, (tree, exact)
    assert tree <= libsix * 1.05 + 2, (tree, libsix)  # >= reference quality
    tree, exact, libsix = run(14)    # adversarial noise
    assert tree <= exact * 1.55 + 4, (tree, exact)


# ---------------------------------------------------------------------------
# CLI plumbing
# ---------------------------------------------------------------------------

def test_cli_dither_libsixel_roundtrip():
    from PIL import Image

    from timg_tpu.cli import main
    from timg_tpu.render.sixel_render import decode_sixel_stream

    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (24, 36, 3)).astype(np.uint8)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "in.png")
        Image.fromarray(img).save(path)
        out = os.path.join(td, "out.sixel")
        rc = main(["-g40x30", "-ps", "--dither=libsixel", "-b", "black",
                   "--debug-no-frame-delay", "-o", out, path])
        assert rc == 0
        data = open(out, "rb").read()
        start = data.index(b"\033P")
        end = data.index(b"\033\\") + 2
        _, idx_plane, pal = decode_sixel_stream(data[start:end])
        assert idx_plane.shape[1] == 36  # fits: shown 1:1, no upscale
        assert len(pal) >= 2


# ---------------------------------------------------------------------------
# Bucket-table mode (the video-capable device semantics; see
# ops/libsixel_quant.py for the table-vs-cache analysis)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name,img", _images())
def test_c_table_apply_matches_oracle(native_lib, name, img):
    rgba = np.dstack([img, np.full(img.shape[:2], 255, np.uint8)])
    pal, diffuse = runtime.libsixel_palette(rgba)
    t_c = runtime.libsixel_build_table(pal)
    t_py = lsq.build_bucket_table(pal)
    np.testing.assert_array_equal(t_c, t_py, err_msg=name)
    idx_c = runtime.libsixel_apply_table(rgba, t_c, pal, diffuse)
    idx_py = lsq.apply_palette_bucket_table(img, t_py, pal, diffuse)
    np.testing.assert_array_equal(idx_c, idx_py.astype(np.uint8),
                                  err_msg=name)


def test_c_palette_matches_full_quant(native_lib):
    """timg_libsixel_palette == the palette timg_libsixel_quant builds."""
    for name, img in _images():
        rgba = np.dstack([img, np.full(img.shape[:2], 255, np.uint8)])
        pal_only, diffuse = runtime.libsixel_palette(rgba)
        full = runtime.libsixel_quant(rgba)
        assert full is not None
        _, pal_full = full
        np.testing.assert_array_equal(pal_only, pal_full, err_msg=name)


def test_device_table_build_matches_c(native_lib):
    import jax.numpy as jnp

    from timg_tpu.ops.sixel_pallas3 import build_bucket_tables_device
    rng = np.random.default_rng(3)
    pals = rng.integers(0, 256, (3, 256, 3), dtype=np.int64).astype(
        np.int32)
    got = np.asarray(build_bucket_tables_device(jnp.asarray(pals)))
    for i in range(3):
        want = runtime.libsixel_build_table(pals[i].astype(np.uint8))
        np.testing.assert_array_equal(got[i], want)


def test_table_kernel_interpret_matches_c(native_lib):
    """fs_dither_table_fused (interpret) == the C mirror, including a
    no-diffuse frame in the batch (per-frame diffuse flags)."""
    import jax.numpy as jnp

    from timg_tpu.ops.sixel_pallas3 import (fs_dither_table_fused,
                                            pack_libsixel_tables)
    rng = np.random.default_rng(5)
    h, w = 37, 53  # big enough that 6-px sampling exceeds 256 buckets
    y, x = np.mgrid[0:h, 0:w]
    noisy = np.clip(np.stack([(x * 255 // w), (y * 255 // h),
                              ((x + y) * 113) % 256], -1).astype(np.int32)
                    + rng.integers(-20, 20, (h, w, 3)), 0,
                    255).astype(np.uint8)
    flat = (np.stack([x // 14, y // 10, (x + y) // 20], -1)
            % 2 * 200).astype(np.uint8)
    frames, pals, tables, diffs, wants = [], [], [], [], []
    for f in (noisy, flat, noisy[::-1].copy()):
        rgba = np.dstack([f, np.full((h, w), 255, np.uint8)])
        frames.append(rgba)
        pal, diffuse = runtime.libsixel_palette(rgba)
        t = runtime.libsixel_build_table(pal)
        wants.append(runtime.libsixel_apply_table(rgba, t, pal, diffuse))
        pals.append(pal)
        tables.append(t)
        diffs.append(diffuse)
    assert diffs[0] and not diffs[1]  # the batch mixes both modes
    tw, pw, dw = pack_libsixel_tables(np.stack(tables), pals, diffs)
    out = np.asarray(fs_dither_table_fused(
        jnp.asarray(np.stack(frames)), jnp.asarray(tw), jnp.asarray(pw),
        jnp.asarray(dw), h, w, interpret=True))
    for i in range(3):
        np.testing.assert_array_equal(out[i], wants[i],
                                      err_msg=f"frame {i}")


def test_prime_libsixel_window_matches_per_frame(native_lib, monkeypatch):
    """plane_cache's batched libsixel priming == per-frame C apply."""
    from timg_tpu.options import DisplayOptions
    from timg_tpu.render.plane_cache import SIXEL_PLANES, prime_sixel_planes

    monkeypatch.delenv("TIMG_TPU_FORCE_DEVICE", raising=False)
    rng = np.random.default_rng(9)
    h, w = 24, 30  # multiple of 6: no pad strip in the comparison
    frames = [rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
              for _ in range(4)]
    for f in frames:
        f[..., 3] = 255
    opts = DisplayOptions()
    opts.sixel_batch_dither = "libsixel"
    opts.bgcolor_getter = lambda: (0, 0, 0, 255)
    prime_sixel_planes(frames, opts, {}, sustained=True)
    for f in frames:
        primed = SIXEL_PLANES.pop(f)
        assert primed is not None
        indices, palette, _ = primed
        pal, diffuse = runtime.libsixel_palette(f)
        np.testing.assert_array_equal(palette, pal)
        table = runtime.libsixel_build_table(pal)
        want = runtime.libsixel_apply_table(f, table, pal, diffuse)
        np.testing.assert_array_equal(np.asarray(indices), want)


def test_prime_libsixel_skips_one_shot_stills(native_lib):
    """Single non-sustained frames keep the canvas's reference-exact
    cached path (no table priming)."""
    from timg_tpu.options import DisplayOptions
    from timg_tpu.render.plane_cache import SIXEL_PLANES, prime_sixel_planes

    rng = np.random.default_rng(11)
    frames = [rng.integers(0, 256, (12, 18, 4), dtype=np.uint8)]
    opts = DisplayOptions()
    opts.sixel_batch_dither = "libsixel"
    prime_sixel_planes(frames, opts, {})
    assert SIXEL_PLANES.pop(frames[0]) is None


def test_cli_video_libsixel_default(tmp_path):
    """-ps with the default dither (libsixel) renders video via the
    table pipeline; deterministic across runs."""
    from tests.test_golden import run_ours

    y4m = tmp_path / "v.y4m"
    w, h, n = 64, 48, 4
    rng = np.random.default_rng(2)
    with open(y4m, "wb") as f:
        f.write(("YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C420jpeg\n"
                 % (w, h)).encode())
        for i in range(n):
            f.write(b"FRAME\n")
            f.write(rng.integers(16, 235, (h, w), dtype=np.uint8).tobytes())
            f.write(np.full((h // 2, w // 2), 128, np.uint8).tobytes())
            f.write(np.full((h // 2, w // 2), 128, np.uint8).tobytes())
    args = ["--debug-no-frame-delay", "-g40x20", "-ps", "-b", "black",
            "--loops=1"]
    out1 = run_ours(args, [str(y4m)])
    out2 = run_ours(args, [str(y4m)])
    assert out1 == out2
    assert out1.count(b"\033Pq") >= 1


def _dither_cli_run(tmp_path, y4m, dither, monkeypatch, floor=None):
    """CLI -ps video under a scripted pty (sixel animations need a
    known cell size); returns the output stream bytes."""
    import os as _os

    from tests.test_protocols import _with_scripted_pty
    from timg_tpu.cli import main as cli_main

    if floor is not None:
        monkeypatch.setenv("TIMG_TPU_LIBSIXEL_FLOOR_FPS", str(floor))
    else:
        monkeypatch.delenv("TIMG_TPU_LIBSIXEL_FLOOR_FPS", raising=False)
    out = tmp_path / f"out.{dither}.{floor}"

    def inner(slave):
        saved = _os.dup(1)
        try:
            _os.dup2(slave, 1)
            rc = cli_main(["--debug-no-frame-delay", "-g40x20", "-ps",
                           "-b", "black", "--loops=1",
                           f"--dither={dither}", "-o", str(out),
                           str(y4m)])
        finally:
            _os.dup2(saved, 1)
            _os.close(saved)
        assert rc == 0
        return out.read_bytes()

    return _with_scripted_pty(inner, {})


def test_dither_auto_policy(tmp_path, monkeypatch):
    """--dither=auto: videos below the libsixel device floor keep the
    reference-exact libsixel mode; above it, the session resolves to
    the adaptive path -- byte-identical to the explicit flags either
    way (VERDICT r3 #2 measured-floor policy)."""
    y4m = tmp_path / "v.y4m"
    w, h, n = 64, 48, 3
    rng = np.random.default_rng(4)
    with open(y4m, "wb") as f:
        f.write(("YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C420jpeg\n"
                 % (w, h)).encode())
        for i in range(n):
            f.write(b"FRAME\n")
            f.write(rng.integers(16, 236, (h, w), np.uint8).tobytes())
            f.write(np.full((h // 2, w // 2), 120, np.uint8).tobytes())
            f.write(np.full((h // 2, w // 2), 130, np.uint8).tobytes())

    # 25 fps stream, floor 1700: auto == libsixel
    auto_lo = _dither_cli_run(tmp_path, y4m, "auto", monkeypatch)
    libsixel = _dither_cli_run(tmp_path, y4m, "libsixel", monkeypatch)
    assert auto_lo == libsixel
    # floor forced below the stream rate: auto == adaptive
    auto_hi = _dither_cli_run(tmp_path, y4m, "auto", monkeypatch, floor=10)
    adaptive = _dither_cli_run(tmp_path, y4m, "adaptive", monkeypatch)
    assert auto_hi == adaptive
    assert auto_hi != auto_lo  # the policy actually switched modes


def test_dither_auto_still_stays_libsixel(tmp_path, monkeypatch):
    from PIL import Image

    from tests.test_golden import run_ours

    rng = np.random.default_rng(5)
    png = tmp_path / "x.png"
    Image.fromarray(rng.integers(0, 256, (32, 40, 3), dtype=np.uint8),
                    "RGB").save(png)
    base = ["--debug-no-frame-delay", "-g40x20", "-ps", "-b", "black"]
    assert (run_ours(base + ["--dither=auto"], [str(png)])
            == run_ours(base + ["--dither=libsixel"], [str(png)]))
