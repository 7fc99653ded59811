"""Frozen quant.c test vectors (VERDICT r3 #4).

These pin the *algorithmic constants* of our libsixel quant.c
reimplementation (ops/libsixel_quant.py; C mirror timg_native.cc) as
hard data, stage by stage, each with its quant.c provenance.  Purpose:
the real-libsixel byte diff (tests/test_real_libs.py) can only run in
an environment that has libsixel — if it ever fails there, these
vectors localize WHICH stage drifted, and until then they freeze the
implementation against accidental regression.

Provenance map (libsixel quant.c, the library the reference links —
ref src/sixel-canvas.cc:134-148 pins the settings):
  * histogram sampling: computeHistogram's step over at most 18,383
    samples (quant.c computeHistogram; our make_palette).
  * mediancut: largestByLuminosity box split (SIXEL_LARGE_LUM),
    REP_AVERAGE_COLORS box averaging with the
    (sum * multiplier / n) >> 8-style floor division.
  * bucket table: lookup_fast's 15-bit rgb555 key (quant.c
    lookup_fast / computeColorMapFromInput), prefilled per bucket-base
    argmin (the documented order-independent deviation from the
    first-touch cache, see ops/libsixel_quant.py docstring).
  * FS apply: diffuse_fs with C-truncating (offset * num / 16) error
    terms, clamp-on-store, interior guards; diffusion disabled when
    the frame has few distinct colors (quant.c sixel_quant_apply_
    palette's do_diffuse gate).
"""

import numpy as np

from timg_tpu.ops import libsixel_quant as lsq


def _frame_small():
    rng = np.random.default_rng(1234)
    fb = np.zeros((12, 16, 4), np.uint8)
    fb[..., :3] = rng.integers(0, 256, (12, 16, 3))
    fb[:6, :8, :3] = (40, 180, 220)
    fb[..., 3] = 255
    return fb


def _frame_diffusing():
    rng = np.random.default_rng(77)
    fb = np.zeros((32, 64, 4), np.uint8)
    fb[..., :3] = rng.integers(0, 256, (32, 64, 3))
    fb[..., 3] = 255
    return fb


# Frozen 2026-08-19 from ops/libsixel_quant.py @ r4 (bit-identical to
# the C mirror per tests/test_libsixel.py's C==oracle corpus).
SMALL_N_COLORS = 25
SMALL_DIFFUSE = False          # few distinct colors: diffusion gated off
SMALL_PALETTE_HEAD = [         # mediancut + REP_AVERAGE_COLORS floors
    (40, 176, 216), (216, 40, 200), (88, 40, 216), (104, 112, 192),
    (192, 224, 56), (240, 224, 128), (120, 152, 176), (40, 200, 80),
]
SMALL_TABLE_ENTRIES = {        # 15-bit bucket key -> palette index
    0: 12, 1: 12, 4681: 9, 16912: 6, 32767: 24, 12345: 2, 20000: 21,
}
SMALL_FIRST_ROW = [0, 0, 0, 0, 0, 0, 0, 0, 10, 10, 15, 4, 1, 21, 7, 22]
SMALL_LAST_ROW = [9, 9, 11, 1, 23, 9, 0, 20, 2, 19, 24, 0, 16, 17, 8, 23]

DIFF_N_COLORS = 256
DIFF_DIFFUSE = True
DIFF_PAL_SUM = 93672           # checksum over the whole 256x3 palette
DIFF_IDX_SUM = 243284          # checksum over the FS-dithered plane
DIFF_FIRST_ROW_HEAD = [161, 101, 31, 65, 98, 93, 197, 188,
                       28, 1, 60, 58, 112, 87, 8, 95]
DIFF_PALETTE_HEAD = [(136, 0, 160), (88, 184, 224), (56, 48, 152),
                     (96, 204, 236)]


def test_small_frame_vectors():
    fb = _frame_small()
    pal, diffuse = lsq.make_palette(fb[..., :3])
    assert len(pal) == SMALL_N_COLORS
    assert bool(diffuse) is SMALL_DIFFUSE
    assert [tuple(map(int, r)) for r in pal[:8]] == SMALL_PALETTE_HEAD
    table = lsq.build_bucket_table(pal)
    for key, want in SMALL_TABLE_ENTRIES.items():
        assert int(table[key]) == want, f"bucket {key}"
    idx = lsq.apply_palette_bucket_table(fb[..., :3], table, pal,
                                         diffuse)
    assert list(map(int, idx[0])) == SMALL_FIRST_ROW
    assert list(map(int, idx[-1])) == SMALL_LAST_ROW
    # non-diffusing small frames: the bucket table equals the exact
    # reference quantizer output (no error feedback to diverge on)
    exact_idx, exact_pal = lsq.quantize_reference(fb)
    np.testing.assert_array_equal(exact_pal, pal)
    np.testing.assert_array_equal(exact_idx[0], idx[0])


def test_diffusing_frame_vectors():
    fb = _frame_diffusing()
    pal, diffuse = lsq.make_palette(fb[..., :3])
    assert len(pal) == DIFF_N_COLORS
    assert bool(diffuse) is DIFF_DIFFUSE
    assert int(pal.astype(np.int64).sum()) == DIFF_PAL_SUM
    assert ([tuple(map(int, r)) for r in pal[:4]]
            == DIFF_PALETTE_HEAD)
    idx = lsq.apply_palette_bucket_table(
        fb[..., :3], lsq.build_bucket_table(pal), pal, diffuse)
    assert int(idx.astype(np.int64).sum()) == DIFF_IDX_SUM
    assert list(map(int, idx[0][:16])) == DIFF_FIRST_ROW_HEAD
