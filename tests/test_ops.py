"""Device-op tests: resize vs the stb oracle, compose math, glyph argmin
vs a scalar model, autocrop, skew/unskew."""

from __future__ import annotations

import math
import os
import subprocess

import numpy as np
import pytest

STB_ORACLE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".refbuild", "stb_oracle")


def _stb_resize(img: np.ndarray, ow: int, oh: int) -> np.ndarray:
    res = subprocess.run(
        [STB_ORACLE, str(img.shape[1]), str(img.shape[0]), str(ow), str(oh)],
        input=img.tobytes(), capture_output=True, timeout=60)
    return np.frombuffer(res.stdout, np.uint8).reshape(oh, ow, 4)


@pytest.mark.skipif(not os.path.exists(STB_ORACLE),
                    reason="stb oracle not built")
@pytest.mark.parametrize("in_wh,out_wh", [
    ((512, 512), (80, 40)),    # rational polyphase downscale
    ((320, 200), (80, 24)),    # vertical-first
    ((320, 200), (80, 25)),
    ((64, 48), (128, 48)),     # box 2x upsample
    ((64, 48), (100, 70)),     # box non-integer upsample
    ((33, 27), (20, 10)),      # odd sizes
    ((1920, 1080), (160, 48)), # big downscale
])
def test_resize_bit_exact_vs_stb(in_wh, out_wh):
    from timg_tpu.ops.resize import resize_batch

    (iw, ih), (ow, oh) = in_wh, out_wh
    rng = np.random.default_rng(iw * 7919 + ih)
    img = rng.integers(0, 256, (ih, iw, 4), dtype=np.uint8)
    want = _stb_resize(img, ow, oh)
    got = np.asarray(resize_batch(img[None], oh, ow))[0]
    assert np.array_equal(got, want), \
        f"{(np.abs(got.astype(int)-want.astype(int))).max()} max diff"


@pytest.mark.skipif(not os.path.exists(STB_ORACLE),
                    reason="stb oracle not built")
def test_resize_alpha_weighting_vs_stb():
    from timg_tpu.ops.resize import resize_batch

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (60, 90, 4), dtype=np.uint8)
    img[:20, :, 3] = 0  # fully transparent band
    want = _stb_resize(img, 45, 30)
    got = np.asarray(resize_batch(img[None], 30, 45))[0]
    assert np.array_equal(got, want)


def test_compose_scalar_model():
    """ref framebuffer.cc:108-150 / framebuffer.h:138-174."""
    import jax.numpy as jnp

    from timg_tpu.ops.compose import alpha_compose_background

    rng = np.random.default_rng(1)
    frame = rng.integers(0, 256, (10, 12, 4), dtype=np.uint8)
    bg = np.array([80, 120, 200, 255], np.uint8)
    pat = np.array([40, 40, 40, 255], np.uint8)
    got = np.asarray(alpha_compose_background(
        jnp.asarray(frame[None]), jnp.asarray(bg), jnp.asarray(pat),
        pattern_w=2, pattern_h=3))[0]

    def lin(c):
        return np.float32(c) * np.float32(c)

    for y in range(10):
        for x in range(12):
            r, g, b, a = (int(v) for v in frame[y, x])
            if a == 255:
                assert tuple(got[y, x]) == (r, g, b, a)
                continue
            chosen = pat if ((x // 2) + (y // 3)) % 2 == 1 else bg
            exp = []
            for ch in range(3):
                v = (lin(frame[y, x, ch]) * np.float32(a)
                     + lin(chosen[ch]) * np.float32(255 - a)) / np.float32(255)
                exp.append(min(int(np.sqrt(v)), 255))
            assert tuple(got[y, x, :3]) == tuple(exp), (y, x)
            assert got[y, x, 3] == 255


def test_quarter_blocks_scalar_model():
    """Glyph argmin == direct transcription of FindBestGlyph (ref
    unicode-block-canvas.cc:162-227)."""
    from timg_tpu.ops.blocks import quarter_blocks

    rng = np.random.default_rng(3)
    frame = rng.integers(0, 256, (8, 10, 4), dtype=np.uint8)
    frame[..., 3] = 255
    glyph, fg, bg = (np.asarray(p)[0] for p in quarter_blocks(frame[None]))

    def lin(c):
        return np.array([np.float32(c[0]) * c[0], np.float32(c[1]) * c[1],
                         np.float32(c[2]) * c[2], np.float32(c[3])])

    def avd(vals):
        acc = vals[0].copy()
        for v in vals[1:]:
            acc = acc + v
        avg = acc / np.float32(len(vals))
        d = np.float32(0)
        for v in vals:
            dd = v[:3] - avg[:3]
            d = d + ((dd[0] * dd[0] + dd[1] * dd[1]) + dd[2] * dd[2])
        return avg, d

    for cy in range(4):
        for cx in range(5):
            tl = lin(frame[cy * 2, cx * 2])
            tr = lin(frame[cy * 2, cx * 2 + 1])
            bl = lin(frame[cy * 2 + 1, cx * 2])
            br = lin(frame[cy * 2 + 1, cx * 2 + 1])
            best, best_d, chosen = None, np.float32(1e12), 0
            cands = []
            a4, d4 = avd([tl, tr, bl, br]); cands.append((d4, a4, a4))
            for fgv, rest in ((tl, [tr, bl, br]), (tr, [tl, bl, br]),
                              (bl, [tl, tr, br]), (br, [tl, tr, bl])):
                a3, d3 = avd(rest); cands.append((d3, fgv, a3))
            b5, d5b = avd([tr, br]); f5, d5f = avd([tl, bl])
            cands.append((d5b + d5f, f5, b5))
            b6, d6b = avd([tr, bl]); f6, d6f = avd([tl, br])
            cands.append((d6b + d6f, f6, b6))
            b7, d7b = avd([tl, tr]); f7, d7f = avd([bl, br])
            cands.append((d7b + d7f, f7, b7))
            for i, (d, f, b) in enumerate(cands):
                if d < best_d:
                    best, chosen = (f, b), (7 if i == 7 else i)
                    if d < 1:
                        break
                    best_d = d
            assert glyph[cy, cx] == chosen, (cy, cx, glyph[cy, cx], chosen)
            exp_fg = [min(int(np.sqrt(v)), 255) for v in best[0][:3]]
            exp_bg = [min(int(np.sqrt(v)), 255) for v in best[1][:3]]
            assert list(fg[cy, cx][:3]) == exp_fg
            assert list(bg[cy, cx][:3]) == exp_bg


def test_autocrop():
    from timg_tpu.ops.autocrop import auto_crop, trim_rect

    img = np.full((30, 40, 4), 77, np.uint8)
    img[10:20, 15:25] = (1, 2, 3, 255)
    assert trim_rect(img) == (10, 20, 15, 25)
    cropped = auto_crop(img)
    assert cropped.shape == (10, 10, 4)
    # fully uniform: keep everything
    flat = np.full((5, 6, 4), 9, np.uint8)
    assert auto_crop(flat).shape == (5, 6, 4)
    # pre-crop border
    assert auto_crop(img, crop_border=5).shape == (10, 10, 4)


def test_skew_roundtrip():
    import jax.numpy as jnp

    from timg_tpu.ops.sixel import _skew, _unskew

    rng = np.random.default_rng(4)
    h, w = 7, 11
    t_len = w + 2 * (h - 1)
    x = jnp.asarray(rng.integers(0, 256, (2, h, w), np.uint8))
    s = _skew(x, h, w, t_len)
    # verify S[y, x+2y] == x[y, x]
    s_np = np.asarray(s)
    x_np = np.asarray(x)
    for y in range(h):
        for xx in range(w):
            assert s_np[0, y, xx + 2 * y] == x_np[0, y, xx]
    back = np.asarray(_unskew(s, h, w, t_len))
    assert np.array_equal(back, x_np)


def test_pallas_fs_kernel_interpret_matches_scan():
    """The Pallas FS kernel (interpret mode on CPU) must match the
    lax.scan cube-dither formulation bit-for-bit."""
    import jax.numpy as jnp

    from timg_tpu.ops.sixel import fs_dither_cube
    from timg_tpu.ops.sixel_pallas import fs_dither_cube_pallas

    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (2, 18, 25, 3), dtype=np.uint8)
    want = np.asarray(fs_dither_cube(img))
    got = np.asarray(fs_dither_cube_pallas(jnp.asarray(img), 18, 25,
                                           interpret=True))
    assert np.array_equal(got, want)


def test_fused_pallas_fs_pipeline_interpret_matches_scan():
    """The all-Pallas fused pipeline (barrel-shift skew + coarse-shifted
    input specs + word transposes) must match the lax.scan cube-dither
    formulation bit-for-bit, including non-multiple-of-128 shapes and
    odd batch sizes."""
    import jax.numpy as jnp

    from timg_tpu.ops.sixel import fs_dither_cube
    from timg_tpu.ops.sixel_pallas3 import fs_dither_cube_fused

    for b, h, w in [(2, 18, 25), (3, 130, 200), (1, 128, 128)]:
        rng = np.random.default_rng(b)
        img = rng.integers(0, 256, (b, h, w, 4), dtype=np.uint8)
        img[..., 3] = 255
        want = np.asarray(fs_dither_cube(img))
        got = np.asarray(fs_dither_cube_fused(jnp.asarray(img), h, w,
                                              interpret=True))
        assert np.array_equal(got, want), (b, h, w)
        got8 = np.asarray(fs_dither_cube_fused(jnp.asarray(img), h, w,
                                               interpret=True,
                                               out_u8=True))
        assert got8.dtype == np.uint8
        assert np.array_equal(got8, want.astype(np.uint8))


def test_polyphase_matches_gather_path():
    """The strided-slice polyphase formulation must equal the gather
    formulation exactly (same values, same accumulation order)."""
    import jax.numpy as jnp

    from timg_tpu.ops import resize as rop

    for in_size, out_size in [(1080, 720), (1920, 1280), (512, 80),
                              (200, 24), (48, 96), (64, 100)]:
        starts, coeffs = rop.packed_taps(
            in_size, out_size, "box", "mitchell", True)
        rng = np.random.default_rng(in_size)
        x = jnp.asarray(rng.random((4, in_size, 3), dtype=np.float32))

        plan = rop._phase_plan(starts, coeffs, in_size)
        got = np.asarray(rop._apply_axis(x, 1, starts, coeffs, True))

        # force the gather path
        idx = jnp.asarray(starts)
        cf = jnp.asarray(coeffs)
        x_m = jnp.moveaxis(x, 1, 0)
        cshape = (-1,) + (1,) * (x_m.ndim - 1)
        want = rop._accumulate(
            lambda t: jnp.take(x_m, idx + t, axis=0) * cf[:, t].reshape(cshape),
            coeffs.shape[1], True)
        want = np.asarray(jnp.moveaxis(want, 0, 1))
        assert np.array_equal(got, want), (in_size, out_size, plan)


def test_resize_video_close_to_exact():
    """The lean video resize must stay within dither-level error of the
    exact stb path."""
    import jax.numpy as jnp

    from timg_tpu.ops.resize import resize_batch_video
    from timg_tpu.ops.resize_np import resize_batch_np

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (2, 108, 192, 4), dtype=np.uint8)
    img[..., 3] = 255
    exact = resize_batch_np(img, 72, 128)
    lean = np.asarray(resize_batch_video(jnp.asarray(img), 72, 128))
    assert lean.shape == exact.shape
    diff = np.abs(lean[..., :3].astype(int) - exact[..., :3].astype(int))
    assert diff.mean() < 1.5, diff.mean()
    assert (lean[..., 3] == 255).all()


def test_pallas_video_resize_interpret_matches_fallback():
    """The single-kernel Pallas video resize (manual-DMA strip kernel)
    must be bit-identical to the vertical-first banded einsum
    formulation it replaces (the kernel is always vertical-first; the
    einsum fallback picks the cheaper order per shape, which only
    changes f32 rounding at exact-.5 ties)."""
    import unittest.mock as mock

    import jax
    import jax.numpy as jnp

    from timg_tpu.ops import resize as rop
    from timg_tpu.ops import resize_pallas

    rng = np.random.default_rng(11)
    for (h, w, oh, ow) in [(108, 256, 72, 160), (96, 128, 192, 256),
                           (270, 384, 135, 240)]:
        assert resize_pallas.fits_pallas(h, w, oh, ow)
        fr = rng.integers(0, 256, (2, h, w, 4), dtype=np.uint8)
        fr[..., 3] = 255
        words = jax.lax.bitcast_convert_type(jnp.asarray(fr), jnp.int32)
        got = np.asarray(resize_pallas.resize_video_words_pallas(
            words, oh, ow, interpret=True))
        with mock.patch.object(rop, "plan_passes",
                               lambda *a, **k: True):
            want = np.asarray(jax.jit(
                rop.resize_video_words.__wrapped__,
                static_argnums=(1, 2))(words, oh, ow))
        assert np.array_equal(got, want), (h, w, oh, ow)


def test_padded_plane_flow_interpret():
    """resize(pad_to=...) -> fused dither(out_padded) must equal the
    unpadded flow on the valid region: the padded plane layout flows
    from the resize kernel through the dither with no pad/slice
    copies, and the pitched region beyond (h, w) is ignored."""
    import jax
    import jax.numpy as jnp

    from timg_tpu.ops import resize as rop
    from timg_tpu.ops.sixel_pallas3 import fs_dither_cube_fused

    h, w, oh, ow = 270, 384, 135, 240
    pad_to = rop.padded_plane_dims(oh, ow)
    assert pad_to == (256, 256)
    rng = np.random.default_rng(5)
    fr = rng.integers(0, 256, (8, h, w, 4), dtype=np.uint8)
    fr[..., 3] = 255
    words = jax.lax.bitcast_convert_type(jnp.asarray(fr), jnp.int32)

    padded = rop.resize_video_words(words, oh, ow, pad_to=pad_to)
    assert padded.shape == (8, 256, 256)
    plain = rop.resize_video_words(words, oh, ow)
    assert np.array_equal(np.asarray(padded)[:, :oh, :ow],
                          np.asarray(plain))

    got = np.asarray(fs_dither_cube_fused(
        padded, oh, ow, interpret=True, out_u8=True, out_padded=True))
    assert got.shape == (8, 256, 256)
    want = np.asarray(fs_dither_cube_fused(
        plain, oh, ow, interpret=True, out_u8=True))
    assert np.array_equal(got[:, :oh, :ow], want)


def test_pallas_resize_padded_output_interpret():
    """out_h_pad/out_w_pad on the strip kernel: valid region identical
    to the unpadded call, pad rows zero."""
    import jax
    import jax.numpy as jnp

    from timg_tpu.ops import resize_pallas

    h, w, oh, ow = 270, 384, 135, 240
    rng = np.random.default_rng(9)
    fr = rng.integers(0, 256, (2, h, w, 4), dtype=np.uint8)
    fr[..., 3] = 255
    words = jax.lax.bitcast_convert_type(jnp.asarray(fr), jnp.int32)
    plain = np.asarray(resize_pallas.resize_video_words_pallas(
        words, oh, ow, interpret=True))
    padded = np.asarray(resize_pallas.resize_video_words_pallas(
        words, oh, ow, interpret=True, out_h_pad=256, out_w_pad=256))
    assert padded.shape == (2, 256, 256)
    assert np.array_equal(padded[:, :oh, :ow], plain)
    assert (padded[:, oh:, :] == 0).all()


def test_fused_fs_wide_raster_small_batch_blocks():
    """Wide rasters (4K-class widths) shrink the unskew batch block to
    fit scoped VMEM (bb<8); the result must stay bit-identical to the
    scan formulation."""
    import jax.numpy as jnp

    from timg_tpu.ops.sixel import fs_dither_cube
    from timg_tpu.ops.sixel_pallas3 import fs_dither_cube_fused

    rng = np.random.default_rng(12)
    b, h, w = 2, 12, 2816  # wp4+win crosses the bb=8 VMEM threshold
    img = rng.integers(0, 256, (b, h, w, 4), dtype=np.uint8)
    img[..., 3] = 255
    want = np.asarray(fs_dither_cube(img))
    got = np.asarray(fs_dither_cube_fused(jnp.asarray(img), h, w,
                                          interpret=True))
    assert np.array_equal(got, want)


def test_pallas_tiled_resize_interpret_matches_fallback():
    """The row-tiled strip resize (bounded VMEM windows for 4K-class
    inputs) must be bit-identical to the vertical-first einsum
    formulation, including non-128-multiple heights where the aligned
    window clamp needs the widen-until-covered loop."""
    import unittest.mock as mock

    import jax
    import jax.numpy as jnp

    from timg_tpu.ops import resize as rop
    from timg_tpu.ops import resize_pallas

    rng = np.random.default_rng(13)
    for (h, w, oh, ow) in [(270, 384, 135, 240), (96, 128, 192, 256),
                           (540, 1024, 270, 512)]:
        assert resize_pallas.fits_pallas_tiled(h, w, oh, ow)
        fr = rng.integers(0, 256, (2, h, w, 4), dtype=np.uint8)
        fr[..., 3] = 255
        words = jax.lax.bitcast_convert_type(jnp.asarray(fr), jnp.int32)
        got = np.asarray(resize_pallas.resize_video_words_pallas_tiled(
            words, oh, ow, interpret=True))
        with mock.patch.object(rop, "plan_passes",
                               lambda *a, **k: True):
            want = np.asarray(jax.jit(
                rop.resize_video_words.__wrapped__,
                static_argnums=(1, 2))(words, oh, ow))
        assert np.array_equal(got, want), (h, w, oh, ow)


def test_fused_tree_dither_interpret_matches_reference():
    """The adaptive tree-descent pipeline: scalar reference spec ==
    wavefront scan == fused all-Pallas kernel (interpret), including
    the vectorized descent helper."""
    import jax
    import jax.numpy as jnp

    from timg_tpu.ops.sixel import (fs_dither_tree,
                                    fs_dither_tree_reference,
                                    median_cut_tree, tree_descend_np)
    from timg_tpu.ops.sixel_pallas3 import fs_dither_tree_fused

    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (2, 30, 41, 4), dtype=np.uint8)
    img[..., 3] = 255
    pal, levels, leaves = median_cut_tree(img[..., :3])

    # descent helper agrees with a scalar walk on raw pixels
    node = tree_descend_np(img[0, ..., :3].astype(np.int32), levels)
    y, x = 7, 13
    n = 0
    for d in range(levels.shape[0]):
        word = int(levels[d, n])
        n = n * 2 + (1 if img[0, y, x, word >> 8] > (word & 0xFF) else 0)
    assert node[y, x] == n

    want = np.stack([fs_dither_tree_reference(f, pal, levels, leaves)
                     for f in img[..., :3]])
    scan = fs_dither_tree(img[..., :3], levels, leaves)
    assert np.array_equal(scan, want)
    fused = np.asarray(fs_dither_tree_fused(
        jnp.asarray(img), jnp.asarray(levels), jnp.asarray(leaves),
        30, 41, interpret=True))
    assert np.array_equal(fused, want)


def test_pallas_tiled_resize_pad_rows_zero():
    """pad_to contract on the tiled kernel: rows beyond out_h are 0."""
    import jax
    import jax.numpy as jnp

    from timg_tpu.ops import resize_pallas

    rng = np.random.default_rng(14)
    fr = rng.integers(0, 256, (2, 270, 384, 4), dtype=np.uint8)
    fr[..., 3] = 255
    words = jax.lax.bitcast_convert_type(jnp.asarray(fr), jnp.int32)
    out = np.asarray(resize_pallas.resize_video_words_pallas_tiled(
        words, 135, 240, interpret=True, out_h_pad=256, out_w_pad=256))
    plain = np.asarray(resize_pallas.resize_video_words_pallas_tiled(
        words, 135, 240, interpret=True))
    assert np.array_equal(out[:, :135, :240], plain)
    assert (out[:, 135:, :] == 0).all()


def test_resize_nearest_matches_gm_sample_model():
    """-a nearest resampling: device == numpy == a scalar model of
    GraphicsMagick SampleImage (floor((i+0.5)*in/out) source index,
    ref graphics-magick-source.cc:248-254)."""
    import numpy as np

    from timg_tpu.ops.resize import resize_nearest
    from timg_tpu.ops.resize_np import resize_nearest_np

    rng = np.random.default_rng(8)
    frames = rng.integers(0, 255, (2, 13, 29, 4), dtype=np.uint8)
    for oh, ow in [(7, 11), (26, 58), (13, 29), (1, 1)]:
        got_np = resize_nearest_np(frames, oh, ow)
        got_dev = np.asarray(resize_nearest(frames, oh, ow))
        np.testing.assert_array_equal(got_np, got_dev)
        # scalar model
        want = np.empty((2, oh, ow, 4), np.uint8)
        for y in range(oh):
            sy = min(int((y + 0.5) * 13 / oh), 12)
            for x in range(ow):
                sx = min(int((x + 0.5) * 29 / ow), 28)
                want[:, y, x] = frames[:, sy, sx]
        np.testing.assert_array_equal(got_np, want)


def test_cli_no_antialias_flag(tmp_path):
    """-a produces nearest-resampled output (differs from the default
    filtered path, same geometry)."""
    import numpy as np
    from PIL import Image

    from tests.test_golden import run_ours

    rng = np.random.default_rng(3)
    p = tmp_path / "img.png"
    Image.fromarray(rng.integers(0, 255, (64, 96, 3),
                                 dtype=np.uint8)).save(p)
    base = run_ours(["-g40x20", "-pq", "-b", "black",
                     "--debug-no-frame-delay"], [str(p)])
    sampled = run_ours(["-g40x20", "-pq", "-b", "black", "-a",
                        "--debug-no-frame-delay"], [str(p)])
    assert base and sampled and base != sampled
    # same cell geometry: same number of lines
    assert base.count(b"\n") == sampled.count(b"\n")
