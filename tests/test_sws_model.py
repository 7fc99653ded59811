"""sws_model: scalar SWS_BILINEAR|SWS_BITEXACT yuv420p->RGBA model.

Pins the scalar model byte-for-byte against the real libswscale
(through ``timg_sws_scale_yuv420(..., bitexact=1)``) across scaled,
unscaled, upscale/downscale, both color ranges, and edge geometries.
The device kernel (ops/sws_resize.py) is pinned against this model, so
these tests anchor the whole device == scalar == libswscale chain
(VERDICT r3 #3; ref src/video-source.cc:352-354, image-scaler.cc:45-73).
"""

import numpy as np
import pytest

from timg_tpu.ops import sws_model


def _oracle():
    from timg_tpu.native import runtime
    lib = runtime.load()
    if lib is None or not hasattr(lib, "timg_sws_scale_yuv420"):
        pytest.skip("native sws oracle unavailable")
    return runtime


def _planes(rng, sw, sh, cls=0):
    ch, cw = (sh + 1) // 2, (sw + 1) // 2
    if cls == 1:  # flat
        return (np.full((sh, sw), int(rng.integers(0, 256)), np.uint8),
                np.full((ch, cw), int(rng.integers(0, 256)), np.uint8),
                np.full((ch, cw), int(rng.integers(0, 256)), np.uint8))
    if cls == 2:  # gradients
        y = (np.add.outer(np.arange(sh), np.arange(sw)) % 256).astype(
            np.uint8)
        u = (np.add.outer(np.arange(ch) * 3, np.arange(cw)) % 256).astype(
            np.uint8)
        return y, u, 255 - u
    if cls == 3:  # extremes (exercises clipping + table headroom)
        return (rng.choice([0, 255], (sh, sw)).astype(np.uint8),
                rng.choice([0, 255], (ch, cw)).astype(np.uint8),
                rng.choice([0, 255], (ch, cw)).astype(np.uint8))
    return (rng.integers(0, 256, (sh, sw), np.uint8),
            rng.integers(0, 256, (ch, cw), np.uint8),
            rng.integers(0, 256, (ch, cw), np.uint8))


GEOS = [
    (64, 48, 32, 24),    # 2x downscale
    (64, 48, 48, 36),    # 4/3 downscale
    (32, 24, 64, 48),    # 2x upscale
    (64, 48, 64, 24),    # vertical-only
    (64, 48, 32, 48),    # horizontal-only
    (64, 48, 64, 48),    # unscaled special converter
    (37, 23, 22, 37),    # odd source dims, up+down mix
    (129, 47, 48, 96),   # prime-ish sizes
    (16, 4, 200, 3),     # extreme aspect change
    # odd dst_w: the SWS_FULL_CHR_H_INT path (full-width chroma +
    # yuv2rgb_write_full with int32-wraparound semantics)
    (64, 48, 31, 24),    # full_2 template
    (64, 48, 33, 48),    # full_1 template (vertical unscaled luma)
    (32, 24, 65, 48),    # odd upscale
    (16, 4, 201, 3),     # odd extreme aspect (full_X template)
    # equal-size parity matrix: the unscaled special converter is gated
    # on EVEN dst height (ff_get_unscaled_swscale's !(dstH & 1)); odd
    # heights run the scaled pipeline with identity filters.
    (63, 47, 63, 47),    # odd equal size -> scaled path (full chroma)
    (64, 47, 64, 47),    # even-w odd-h equal -> scaled packed path
    (63, 48, 63, 48),    # odd-w even-h equal -> unscaled converter
]


@pytest.mark.parametrize("sw,sh,dw,dh", GEOS)
@pytest.mark.parametrize("full", [False, True])
def test_model_matches_libswscale(sw, sh, dw, dh, full):
    runtime = _oracle()
    rng = np.random.default_rng(sw * 1000 + dw + full)
    for cls in range(4):
        y, u, v = _planes(rng, sw, sh, cls)
        want = runtime.sws_scale_yuv420(y, u, v, dh, dw, full,
                                        bitexact=True)
        got = sws_model.sws_bilinear_yuv420_to_rgba(y, u, v, dh, dw, full)
        np.testing.assert_array_equal(got, want)


def test_model_random_geometry_sweep():
    runtime = _oracle()
    rng = np.random.default_rng(7)
    for t in range(12):
        sw = int(rng.integers(8, 160))
        sh = int(rng.integers(4, 120))
        dw = int(rng.integers(3, 160))  # both parities: pair-chroma
        dh = int(rng.integers(3, 100))  # and full-chroma paths
        full = bool(rng.integers(0, 2))
        y, u, v = _planes(rng, sw, sh, t % 4)
        want = runtime.sws_scale_yuv420(y, u, v, dh, dw, full,
                                        bitexact=True)
        got = sws_model.sws_bilinear_yuv420_to_rgba(y, u, v, dh, dw, full)
        np.testing.assert_array_equal(got, want)


def test_filter_coefficients_normalized():
    """Horizontal filters sum to 1<<14 per output pixel (the hScale
    contract: 255 in -> 255 out), vertical to 1<<12."""
    for x_inc, sw, dw in ((2 << 16, 8, 4), ((32 << 16) // 48, 32, 48)):
        pos, coef = sws_model.init_filter(x_inc, sw, dw, 4, 1 << 14)
        s = coef.sum(axis=1)
        assert (s == 1 << 14).all(), s
        assert (pos >= 0).all() and (pos + coef.shape[1] <= sw).all()


def test_unscaled_converter_identity_gray():
    """mpeg range: gray ramp through the unscaled converter matches the
    recovered table law."""
    y = np.tile(np.arange(256, dtype=np.uint8), (2, 1))
    u = np.full((1, 128), 128, np.uint8)
    out = sws_model.unscaled_yuv420_to_rgba(y, u, u, False)
    c = sws_model.MPEG_UNSCALED
    f = np.clip((c["a0"] + np.arange(256, dtype=np.int64) * c["cy"]) >> 16,
                0, 255)
    np.testing.assert_array_equal(out[0, :, 0], f)
    np.testing.assert_array_equal(out[0, :, 1], f)
    np.testing.assert_array_equal(out[0, :, 2], f)
