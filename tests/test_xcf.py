"""GIMP XCF decoder (sources/xcf.py).

Synthesizes spec-conformant XCF files (both the 32-bit-offset v2 and
the 64-bit-offset v11 layouts, raw and RLE tile encodings) and checks
the flattened composite against float reference math.
"""

import struct

import numpy as np
import pytest

from timg_tpu.sources.xcf import decode_xcf

_TILE = 64


class _B:
    def __init__(self, wide):
        self.b = bytearray()
        self.wide = wide

    def u32(self, v):
        self.b += struct.pack(">I", v)

    def i32(self, v):
        self.b += struct.pack(">i", v)

    def off_slot(self):
        pos = len(self.b)
        self.b += bytes(8 if self.wide else 4)
        return pos

    def patch(self, pos, v):
        struct.pack_into(">Q" if self.wide else ">I", self.b, pos, v)

    def string(self, s):
        enc = s.encode() + b"\0"
        self.u32(len(enc))
        self.b += enc

    def prop(self, ptype, payload):
        self.u32(ptype)
        self.u32(len(payload))
        self.b += payload


def _rle_encode(plane: np.ndarray) -> bytes:
    out = bytearray()
    data = plane.reshape(-1)
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and data[i + run] == data[i] and run < 65535:
            run += 1
        if run <= 127:
            out += bytes([run - 1, data[i]])
        else:
            out += bytes([127, run >> 8, run & 0xFF, data[i]])
        i += run
    return bytes(out)


def write_xcf(layers, width, height, base_type=0, version=2,
              compression=1, colormap=None):
    """layers: bottom-last list of dicts with keys pix [h,w,c] uint8,
    type, ox, oy, opacity, visible (defaults applied)."""
    wide = version >= 11
    b = _B(wide)
    b.b += b"gimp xcf "
    b.b += b"file\0" if version == 0 else ("v%03d\0" % version).encode()
    b.u32(width)
    b.u32(height)
    b.u32(base_type)
    if version >= 4:
        b.u32(150)  # 8-bit gamma precision
    b.prop(17, bytes([compression]))  # PROP_COMPRESSION
    if colormap is not None:
        payload = struct.pack(">I", len(colormap)) + bytes(
            int(v) for v in np.asarray(colormap).reshape(-1))
        b.prop(1, payload)  # PROP_COLORMAP
    b.prop(0, b"")  # PROP_END

    layer_slots = [b.off_slot() for _ in layers]
    b.off_slot()  # layer list terminator (stays 0)
    b.off_slot()  # channel list terminator (stays 0)

    for slot, lay in zip(layer_slots, layers):
        pix = np.asarray(lay["pix"], np.uint8)
        lh, lw, bpp = pix.shape
        b.patch(slot, len(b.b))
        b.u32(lw)
        b.u32(lh)
        b.u32(lay.get("type", 1))
        b.string(lay.get("name", "layer"))
        b.prop(6, struct.pack(">I", lay.get("opacity", 255)))
        b.prop(8, struct.pack(">I", 1 if lay.get("visible", True) else 0))
        b.prop(15, struct.pack(">ii", lay.get("ox", 0), lay.get("oy", 0)))
        if "mask" in lay:
            b.prop(11, struct.pack(">I",
                                   1 if lay.get("apply_mask", True) else 0))
        b.prop(0, b"")
        hier_slot = b.off_slot()
        mask_slot = b.off_slot()  # layer mask (0 when absent)

        def write_hierarchy(slot, plane):
            ph, pw, pbpp = plane.shape
            b.patch(slot, len(b.b))
            b.u32(pw)
            b.u32(ph)
            b.u32(pbpp)
            level_slot = b.off_slot()
            b.off_slot()  # level list terminator

            b.patch(level_slot, len(b.b))
            b.u32(pw)
            b.u32(ph)
            tiles_x = (pw + _TILE - 1) // _TILE
            tiles_y = (ph + _TILE - 1) // _TILE
            tile_slots = [b.off_slot() for _ in range(tiles_x * tiles_y)]
            b.off_slot()  # tile list terminator
            for ti, tslot in enumerate(tile_slots):
                ty, tx = divmod(ti, tiles_x)
                tile = plane[ty * _TILE:(ty + 1) * _TILE,
                             tx * _TILE:(tx + 1) * _TILE]
                b.patch(tslot, len(b.b))
                if compression == 0:
                    b.b += tile.tobytes()
                else:
                    for c in range(pbpp):
                        b.b += _rle_encode(tile[..., c])

        write_hierarchy(hier_slot, pix)
        if "mask" in lay:
            mask = np.asarray(lay["mask"], np.uint8)
            b.patch(mask_slot, len(b.b))
            b.u32(mask.shape[1])
            b.u32(mask.shape[0])
            b.string("mask")
            b.prop(0, b"")
            mh_slot = b.off_slot()
            write_hierarchy(mh_slot, mask[..., None])
    return bytes(b.b)


@pytest.mark.parametrize("version", [2, 11])
@pytest.mark.parametrize("compression", [0, 1])
def test_single_rgb_layer(version, compression):
    rng = np.random.default_rng(1)
    pix = rng.integers(0, 256, (70, 90, 3), dtype=np.uint8)  # >1 tile
    data = write_xcf([{"pix": pix, "type": 0}], 90, 70,
                     version=version, compression=compression)
    out = decode_xcf(data)
    np.testing.assert_array_equal(out[..., :3], pix)
    assert (out[..., 3] == 255).all()


def test_rle_runs_roundtrip():
    # long runs (>127) exercise the long-run opcode
    pix = np.zeros((130, 5, 3), np.uint8)
    pix[:, :, 0] = 200
    pix[64:, :, 1] = 7
    out = decode_xcf(write_xcf([{"pix": pix, "type": 0}], 5, 130))
    np.testing.assert_array_equal(out[..., :3], pix)


def test_two_layers_alpha_offsets_opacity():
    base = np.full((40, 60, 3), 100, np.uint8)
    top = np.zeros((10, 20, 4), np.uint8)
    top[..., 0] = 250
    top[..., 3] = 255
    data = write_xcf(
        [  # file order: top layer first
            {"pix": top, "type": 1, "ox": 5, "oy": 8, "opacity": 128},
            {"pix": base, "type": 0},
        ], 60, 40)
    out = decode_xcf(data)
    # outside the top layer: base shows through
    np.testing.assert_array_equal(out[0, 0, :3], (100, 100, 100))
    # inside: over() with opacity 128/255
    a = 255 * (128 / 255.0)
    exp_r = round((250 * a / 255.0) + 100 * (1 - a / 255.0))
    assert abs(int(out[10, 10, 0]) - exp_r) <= 1
    assert out[10, 10, 3] == 255


def test_invisible_layer_skipped():
    base = np.full((8, 8, 3), 30, np.uint8)
    top = np.full((8, 8, 3), 200, np.uint8)
    data = write_xcf(
        [{"pix": top, "type": 0, "visible": False},
         {"pix": base, "type": 0}], 8, 8)
    np.testing.assert_array_equal(decode_xcf(data)[..., 0], 30)


def test_gray_and_graya():
    g = np.arange(64, dtype=np.uint8).reshape(8, 8, 1)
    out = decode_xcf(write_xcf([{"pix": g, "type": 2}], 8, 8,
                               base_type=1))
    np.testing.assert_array_equal(out[..., 0], g[..., 0])
    np.testing.assert_array_equal(out[..., 1], g[..., 0])

    ga = np.dstack([g[..., 0], np.full((8, 8), 255, np.uint8)])
    out = decode_xcf(write_xcf([{"pix": ga, "type": 3}], 8, 8,
                               base_type=1))
    np.testing.assert_array_equal(out[..., 0], g[..., 0])


def test_indexed_with_colormap():
    rng = np.random.default_rng(3)
    cmap = rng.integers(0, 256, (5, 3), dtype=np.uint8)
    idx = rng.integers(0, 5, (12, 9, 1), dtype=np.uint8)
    out = decode_xcf(write_xcf([{"pix": idx, "type": 4}], 9, 12,
                               base_type=2, colormap=cmap))
    np.testing.assert_array_equal(out[..., :3], cmap[idx[..., 0]])


def test_partial_edge_tiles():
    rng = np.random.default_rng(4)
    pix = rng.integers(0, 256, (65, 129, 3), dtype=np.uint8)
    out = decode_xcf(write_xcf([{"pix": pix, "type": 0}], 129, 65))
    np.testing.assert_array_equal(out[..., :3], pix)


def test_high_precision_raises_gated():
    pix = np.zeros((4, 4, 3), np.uint8)
    data = bytearray(write_xcf([{"pix": pix, "type": 0}], 4, 4,
                               version=4))
    struct.pack_into(">I", data, 26, 300)  # 16-bit precision code
    with pytest.raises(RuntimeError, match="precision"):
        decode_xcf(bytes(data))


def test_zlib_compression_raises_gated():
    pix = np.zeros((4, 4, 3), np.uint8)
    with pytest.raises(RuntimeError, match="zlib"):
        decode_xcf(write_xcf([{"pix": pix, "type": 0}], 4, 4,
                             compression=2))


def test_garbage_raises_value_error():
    with pytest.raises(ValueError):
        decode_xcf(b"gimp xcf v002\0" + bytes(8))
    with pytest.raises(ValueError):
        decode_xcf(b"not an xcf at all" + bytes(50))


def test_factory_routes_xcf(tmp_path):
    from timg_tpu.options import DisplayOptions
    from timg_tpu.sources.base import create_source

    rng = np.random.default_rng(5)
    pix = rng.integers(0, 256, (30, 40, 3), dtype=np.uint8)
    p = tmp_path / "img.xcf"
    p.write_bytes(write_xcf([{"pix": pix, "type": 0}], 40, 30))
    opts = DisplayOptions()
    opts.width, opts.height = 40, 24
    src, err = create_source(str(p), opts)
    assert src is not None, err
    assert src.decoder_name == "xcf"
    assert (src.orig_width, src.orig_height) == (40, 30)


def test_layer_mask_applied():
    """A layer mask multiplies into the layer's coverage; GIMP and
    GM's xcf coder both apply it (PROP_APPLY_MASK default on)."""
    base = np.full((8, 8, 3), 100, np.uint8)
    top = np.full((8, 8, 3), 200, np.uint8)
    mask = np.zeros((8, 8), np.uint8)
    mask[:, 4:] = 255  # right half visible
    data = write_xcf(
        [{"pix": top, "type": 0, "mask": mask},
         {"pix": base, "type": 0}], 8, 8)
    out = decode_xcf(data)
    assert out[0, 2, 0] == 100   # masked-out: base shows
    assert out[0, 6, 0] == 200   # mask-visible: top shows


def test_layer_mask_not_applied_when_flag_off():
    base = np.full((8, 8, 3), 100, np.uint8)
    top = np.full((8, 8, 3), 200, np.uint8)
    mask = np.zeros((8, 8), np.uint8)
    data = write_xcf(
        [{"pix": top, "type": 0, "mask": mask, "apply_mask": False},
         {"pix": base, "type": 0}], 8, 8)
    assert (decode_xcf(data)[..., 0] == 200).all()


def test_partial_mask_coverage_blends():
    base = np.full((4, 4, 3), 0, np.uint8)
    top = np.full((4, 4, 3), 200, np.uint8)
    mask = np.full((4, 4), 128, np.uint8)
    out = decode_xcf(write_xcf(
        [{"pix": top, "type": 0, "mask": mask},
         {"pix": base, "type": 0}], 4, 4))
    assert abs(int(out[0, 0, 0]) - round(200 * 128 / 255)) <= 1
