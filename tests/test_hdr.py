"""Radiance HDR decode: stb-exact LDR conversion + byte parity with the
reference binary's stb fallback (ref stb_image.h:7159-7287,1885-1911)."""

from __future__ import annotations

import os
import subprocess

import numpy as np
import pytest

from timg_tpu.sources.hdr_source import decode_hdr

from tests.conftest import REFERENCE_BINARY, has_reference


def _header(w: int, h: int) -> bytes:
    return (b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n"
            + ("-Y %d +X %d\n" % (h, w)).encode())


def _random_rgbe(w: int, h: int, seed: int = 5) -> np.ndarray:
    rng = np.random.default_rng(seed)
    rgbe = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
    # keep exponents in a sane photographic range, with some zero
    # (black) pixels to hit the e==0 branch
    rgbe[..., 3] = rng.integers(120, 140, (h, w), dtype=np.uint8)
    black = rng.random((h, w)) < 0.05
    rgbe[black, 3] = 0
    return rgbe


def _encode_flat(rgbe: np.ndarray) -> bytes:
    h, w = rgbe.shape[:2]
    return _header(w, h) + rgbe.tobytes()


def _encode_rle(rgbe: np.ndarray) -> bytes:
    """Adaptive-RLE scanlines: 0x02 0x02 hi lo + 4 per-component
    streams of runs (0x80+n, value) and literals (n, bytes)."""
    h, w = rgbe.shape[:2]
    assert 8 <= w < 32768
    out = [_header(w, h)]
    for j in range(h):
        out.append(bytes([2, 2, (w >> 8) & 0xFF, w & 0xFF]))
        for k in range(4):
            comp = rgbe[j, :, k]
            i = 0
            while i < w:
                run = 1
                while i + run < w and run < 127 and comp[i + run] == comp[i]:
                    run += 1
                if run >= 4:
                    out.append(bytes([128 + run, int(comp[i])]))
                    i += run
                else:
                    lit = i
                    while (lit < w and lit - i < 128
                           and not (lit + 3 < w
                                    and comp[lit] == comp[lit + 1]
                                    == comp[lit + 2] == comp[lit + 3])):
                        lit += 1
                    out.append(bytes([lit - i]) + comp[i:lit].tobytes())
                    i = lit
    return b"".join(out)


def test_rle_matches_flat_decode():
    rgbe = _random_rgbe(40, 24)
    # force some runs so the RLE path actually emits runs
    rgbe[:, 8:20] = rgbe[:, 8:9]
    flat = decode_hdr(_encode_flat(rgbe))
    rle = decode_hdr(_encode_rle(rgbe))
    assert np.array_equal(flat, rle)
    assert flat.shape == (24, 40, 4)
    assert (flat[..., 3] == 255).all()


def test_black_pixels_and_gamma_monotone():
    rgbe = np.zeros((4, 20, 4), dtype=np.uint8)
    rgbe[0, :, :3] = 200
    rgbe[0, :, 3] = 128  # mantissa/256 scale: 200/256 -> mid gray
    out = decode_hdr(_encode_flat(rgbe))
    assert (out[1:, :, :3] == 0).all()          # e==0 rows are black
    # stb: trunc(pow(200*2^-8, 1/2.2f)*255+0.5)
    expect = int(np.float32(np.power(
        np.float64(np.float32(200 * 2.0 ** -8)),
        np.float64(np.float32(1 / 2.2)))) * np.float32(255)
        + np.float32(0.5))
    assert (out[0, :, :3] == expect).all()


def test_non_rle_first_row_falls_back_to_flat():
    # stb_image.h:7234-7245: an RLE-width image whose first scanline
    # does not start 2,2,len is (re)decoded as flat data, with those
    # four bytes consumed as pixel zero.
    rgbe = _random_rgbe(16, 6, seed=9)
    rgbe[0, 0] = (10, 20, 30, 130)  # c1 != 2 -> triggers the fallback
    data = _header(16, 6) + rgbe.tobytes()
    out = decode_hdr(data)
    assert np.array_equal(out, decode_hdr(_encode_flat(rgbe)))


def test_rejects_bad_inputs():
    with pytest.raises(ValueError):
        decode_hdr(b"not an hdr")
    with pytest.raises(ValueError):
        decode_hdr(b"#?RADIANCE\nFORMAT=wrong\n\n-Y 2 +X 2\n" + b"\0" * 16)
    with pytest.raises(ValueError):
        decode_hdr(_header(40, 4))  # truncated RLE body


@pytest.mark.skipif(not has_reference(),
                    reason="reference binary not built")
@pytest.mark.parametrize("layout", ["flat", "rle"])
def test_golden_vs_reference(tmp_path, layout):
    from tests.test_golden import assert_parity

    w, h = (6, 30) if layout == "flat" else (48, 30)  # w<8 forces flat
    rgbe = _random_rgbe(w, h, seed=3)
    rgbe[:, w // 3:2 * w // 3] = rgbe[:, w // 3:w // 3 + 1]
    data = _encode_flat(rgbe) if layout == "flat" else _encode_rle(rgbe)
    path = str(tmp_path / "t.hdr")
    with open(path, "wb") as f:
        f.write(data)
    assert_parity(["-g40x20", "-pq", "-b", "black"], [path])
