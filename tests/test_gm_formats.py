"""Native GM-long-tail decoders (sources/gm_formats.py).

The reference decodes these through GraphicsMagick's coder registry
(ref graphics-magick-source.cc:156-282); no GM exists in this image,
so each test synthesizes a spec-conformant file and checks the decoded
pixels against the values it wrote.
"""

import os
import struct
import subprocess
import sys

import numpy as np
import pytest

from timg_tpu.sources.gm_formats import (decode_cineon, decode_dpx,
                                         decode_miff, decode_xwd)


# --------------------------------------------------------------------------
# writers
# --------------------------------------------------------------------------

def write_dpx(rgb, bits=10, packing=1, endian=">", descriptor=None,
              eol_pad=0):
    """Minimal spec-conformant DPX: generic header + image info +
    element 0, data at offset 2048."""
    h, w, c = rgb.shape
    if descriptor is None:
        descriptor = {1: 6, 3: 50, 4: 51}[c]
    offset = 2048
    hdr = bytearray(offset)
    hdr[0:4] = b"SDPX" if endian == ">" else b"XPDS"
    struct.pack_into(endian + "I", hdr, 4, offset)
    hdr[8:16] = b"V2.0\0\0\0\0"
    struct.pack_into(endian + "H", hdr, 768, 0)  # orientation
    struct.pack_into(endian + "H", hdr, 770, 1)  # n elements
    struct.pack_into(endian + "I", hdr, 772, w)
    struct.pack_into(endian + "I", hdr, 776, h)
    hdr[800] = descriptor
    hdr[803] = bits
    struct.pack_into(endian + "H", hdr, 804, packing)
    struct.pack_into(endian + "H", hdr, 806, 0)  # encoding: none
    struct.pack_into(endian + "I", hdr, 808, offset)
    struct.pack_into(endian + "I", hdr, 812, eol_pad)

    payload = bytearray()
    flat = rgb.reshape(h, w * c)
    if bits == 10 and packing in (1, 2):
        shifts = (22, 12, 2) if packing == 1 else (20, 10, 0)
        for y in range(h):
            row = flat[y]
            words = []
            for i in range(0, len(row), 3):
                grp = list(row[i:i + 3]) + [0, 0]
                word = sum(int(grp[k]) << shifts[k] for k in range(3))
                words.append(word)
            payload += struct.pack(endian + f"{len(words)}I", *words)
            payload += bytes(((eol_pad + 3) // 4) * 4)
    elif bits == 12 and packing in (1, 2):
        for y in range(h):
            vals = [(int(v) << 4) if packing == 1 else int(v)
                    for v in flat[y]]
            payload += struct.pack(endian + f"{len(vals)}H", *vals)
            payload += bytes(((eol_pad + 1) // 2) * 2)
    elif bits == 8:
        for y in range(h):
            payload += bytes(int(v) for v in flat[y]) + bytes(eol_pad)
    elif bits == 16:
        for y in range(h):
            payload += struct.pack(endian + f"{w * c}H",
                                   *[int(v) for v in flat[y]])
            payload += bytes(((eol_pad + 1) // 2) * 2)
    else:
        raise AssertionError
    return bytes(hdr) + bytes(payload)


def write_cineon(rgb, bits=10, packing=5):
    h, w, c = rgb.shape
    offset = 1024
    hdr = bytearray(offset)
    hdr[0:4] = b"\x80\x2a\x5f\xd7"
    struct.pack_into(">I", hdr, 4, offset)
    hdr[192] = 0  # orientation
    hdr[193] = c  # channels
    for ch in range(c):
        base = 196 + 28 * ch
        hdr[base + 0] = 0
        hdr[base + 1] = ch + 1
        hdr[base + 2] = bits
        struct.pack_into(">I", hdr, base + 4, w)
        struct.pack_into(">I", hdr, base + 8, h)
    hdr[680] = 0  # pixel interleave
    hdr[681] = packing
    struct.pack_into(">I", hdr, 684, 0)  # eol pad

    payload = bytearray()
    flat = rgb.reshape(h, w * c)
    if bits == 10 and packing == 5:
        for y in range(h):
            row = flat[y]
            for i in range(0, len(row), 3):
                grp = list(row[i:i + 3]) + [0, 0]
                word = (int(grp[0]) << 22) | (int(grp[1]) << 12) \
                    | (int(grp[2]) << 2)
                payload += struct.pack(">I", word)
    elif bits == 8 and packing == 0:
        for y in range(h):
            payload += bytes(int(v) for v in flat[y])
    else:
        raise AssertionError
    return bytes(hdr) + bytes(payload)


def write_xwd(rgb=None, indices=None, cmap=None, bpp=32, byte_order=1):
    if rgb is not None:
        h, w = rgb.shape[:2]
        ncolors = 0
    else:
        h, w = indices.shape
        ncolors = len(cmap)
    name = b"test\0"
    header_size = 100 + len(name)
    if bpp == 32:
        bpl = w * 4
        masks = (0xFF0000, 0x00FF00, 0x0000FF)
    elif bpp == 24:
        bpl = w * 3
        masks = (0xFF0000, 0x00FF00, 0x0000FF)
    elif bpp == 16:
        bpl = w * 2
        masks = (0xF800, 0x07E0, 0x001F)
    else:
        bpl = w
        masks = (0, 0, 0)
    hdr = struct.pack(
        ">25I", header_size, 7, 2, 24 if bpp != 8 else 8, w, h, 0,
        byte_order, 32, 1, 32, bpp, bpl, 4 if bpp != 8 else 3,
        *masks, 8, ncolors, ncolors, w, h, 0, 0, 0)
    out = bytearray(hdr + name)
    for i in range(ncolors):
        r, g, b = cmap[i]
        out += struct.pack(">IHHHBB", i, int(r) << 8, int(g) << 8,
                           int(b) << 8, 7, 0)
    pbo = ">" if byte_order == 1 else "<"
    if bpp == 32:
        pix = ((rgb[..., 0].astype(np.uint32) << 16)
               | (rgb[..., 1].astype(np.uint32) << 8)
               | rgb[..., 2].astype(np.uint32))
        out += pix.astype(np.dtype(pbo + "u4")).tobytes()
    elif bpp == 24:
        seq = rgb if byte_order == 1 else rgb[..., ::-1]
        out += seq.astype(np.uint8).tobytes()
    elif bpp == 16:
        pix = (((rgb[..., 0].astype(np.uint32) >> 3) << 11)
               | ((rgb[..., 1].astype(np.uint32) >> 2) << 5)
               | (rgb[..., 2].astype(np.uint32) >> 3))
        out += pix.astype(np.dtype(pbo + "u2")).tobytes()
    else:
        out += indices.astype(np.uint8).tobytes()
    return bytes(out)


def write_miff(samples, klass="DirectClass", depth=8, matte=False,
               compression="None", cmap=None, rle=False):
    """samples: DirectClass [H,W,C] code values; PseudoClass [H,W]
    indices with cmap [N,3]."""
    h, w = samples.shape[:2]
    head = (f"id=ImageMagick  version=1.0\nclass={klass}  "
            f"colors={0 if cmap is None else len(cmap)}  "
            f"matte={'True' if matte else 'False'}\n"
            f"columns={w}  rows={h}  depth={depth}\n"
            f"compression={compression}\n"
            "{a comment with class=Bogus inside}\n\f\n:")
    out = bytearray(head.encode())

    def sample_bytes(v):
        return (struct.pack(">H", int(v)) if depth == 16
                else bytes([int(v)]))

    if cmap is not None:
        for r, g, b in cmap:
            out += sample_bytes(r) + sample_bytes(g) + sample_bytes(b)
        flat = samples.reshape(-1)
        if rle:
            i = 0
            while i < len(flat):
                run = 1
                while (run < 256 and i + run < len(flat)
                       and flat[i + run] == flat[i]):
                    run += 1
                out += bytes([int(flat[i]), run - 1])
                i += run
        else:
            out += bytes(int(v) for v in flat)
    else:
        flat = samples.reshape(-1, samples.shape[2])
        if rle:
            i = 0
            while i < len(flat):
                run = 1
                while (run < 256 and i + run < len(flat)
                       and (flat[i + run] == flat[i]).all()):
                    run += 1
                for v in flat[i]:
                    out += sample_bytes(v)
                out += bytes([run - 1])
                i += run
        else:
            for px in flat:
                for v in px:
                    out += sample_bytes(v)
    return bytes(out)


# --------------------------------------------------------------------------
# DPX
# --------------------------------------------------------------------------

def _scale(v, bits):
    m = (1 << bits) - 1
    return ((v.astype(np.uint32) * 255 + m // 2) // m).astype(np.uint8)


@pytest.mark.parametrize("endian", [">", "<"])
@pytest.mark.parametrize("packing", [1, 2])
def test_dpx_10bit_filled(endian, packing):
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 1024, (7, 5, 3), dtype=np.uint16)
    out = decode_dpx(write_dpx(rgb, bits=10, packing=packing,
                               endian=endian))
    assert out.shape == (7, 5, 4)
    np.testing.assert_array_equal(out[..., :3], _scale(rgb, 10))
    assert (out[..., 3] == 255).all()


def test_dpx_10bit_luma_and_eol_pad():
    rng = np.random.default_rng(2)
    y = rng.integers(0, 1024, (4, 7, 1), dtype=np.uint16)
    out = decode_dpx(write_dpx(y, bits=10, packing=1, eol_pad=4))
    np.testing.assert_array_equal(out[..., 0], _scale(y[..., 0], 10))
    np.testing.assert_array_equal(out[..., 0], out[..., 1])


@pytest.mark.parametrize("bits", [8, 12, 16])
def test_dpx_other_depths(bits):
    rng = np.random.default_rng(bits)
    rgb = rng.integers(0, 1 << bits, (6, 4, 3), dtype=np.uint16)
    out = decode_dpx(write_dpx(rgb, bits=bits,
                               packing=0 if bits in (8, 16) else 1))
    np.testing.assert_array_equal(out[..., :3], _scale(rgb, bits))


def test_dpx_rgba_alpha_preserved():
    rng = np.random.default_rng(4)
    rgba = rng.integers(0, 1024, (3, 6, 4), dtype=np.uint16)
    out = decode_dpx(write_dpx(rgba, bits=10, packing=1))
    np.testing.assert_array_equal(out, _scale(rgba, 10))


def test_dpx_garbage_raises():
    with pytest.raises(ValueError):
        decode_dpx(b"SDPX" + bytes(100))
    with pytest.raises(ValueError):
        decode_dpx(b"JUNK" + bytes(2048))


# --------------------------------------------------------------------------
# Cineon
# --------------------------------------------------------------------------

def test_cineon_10bit():
    rng = np.random.default_rng(5)
    rgb = rng.integers(0, 1024, (5, 9, 3), dtype=np.uint16)
    out = decode_cineon(write_cineon(rgb))
    np.testing.assert_array_equal(out[..., :3], _scale(rgb, 10))


def test_cineon_8bit_gray():
    rng = np.random.default_rng(6)
    y = rng.integers(0, 256, (4, 4, 1), dtype=np.uint16)
    out = decode_cineon(write_cineon(y, bits=8, packing=0))
    np.testing.assert_array_equal(out[..., 0], y[..., 0].astype(np.uint8))


# --------------------------------------------------------------------------
# XWD
# --------------------------------------------------------------------------

@pytest.mark.parametrize("bpp", [24, 32])
@pytest.mark.parametrize("byte_order", [0, 1])
def test_xwd_truecolor(bpp, byte_order):
    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    out = decode_xwd(write_xwd(rgb=rgb, bpp=bpp, byte_order=byte_order))
    np.testing.assert_array_equal(out[..., :3], rgb)


def test_xwd_16bpp_565():
    rng = np.random.default_rng(8)
    rgb = rng.integers(0, 256, (3, 7, 3), dtype=np.uint8)
    out = decode_xwd(write_xwd(rgb=rgb, bpp=16))
    # 5/6-bit channels with bit replication: max error is the dropped
    # low bits
    assert np.abs(out[..., :3].astype(int) - rgb.astype(int)).max() <= 8


def test_xwd_8bpp_colormap():
    rng = np.random.default_rng(9)
    cmap = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (5, 8), dtype=np.uint8)
    out = decode_xwd(write_xwd(indices=idx, cmap=cmap, bpp=8))
    np.testing.assert_array_equal(out[..., :3], cmap[idx])


# --------------------------------------------------------------------------
# MIFF
# --------------------------------------------------------------------------

@pytest.mark.parametrize("rle", [False, True])
@pytest.mark.parametrize("depth", [8, 16])
def test_miff_directclass(depth, rle):
    rng = np.random.default_rng(10)
    # runs of equal pixels so RLE actually exercises run>1
    base = rng.integers(0, 1 << depth, (4, 3, 3), dtype=np.uint32)
    rgb = np.repeat(base, 3, axis=1)  # [4, 9, 3]
    out = decode_miff(write_miff(
        rgb, depth=depth, rle=rle,
        compression="RLE" if rle else "None"))
    np.testing.assert_array_equal(out[..., :3], _scale(rgb, depth))
    assert (out[..., 3] == 255).all()


def test_miff_matte_is_opacity():
    # MIFF's 4th sample is OPACITY: 0 = fully opaque
    px = np.zeros((1, 2, 4), np.uint32)
    px[0, 0] = (10, 20, 30, 0)     # opaque
    px[0, 1] = (40, 50, 60, 255)   # transparent
    out = decode_miff(write_miff(px, matte=True))
    assert out[0, 0, 3] == 255
    assert out[0, 1, 3] == 0
    np.testing.assert_array_equal(out[0, 0, :3], (10, 20, 30))


@pytest.mark.parametrize("rle", [False, True])
def test_miff_pseudoclass(rle):
    rng = np.random.default_rng(11)
    cmap = rng.integers(0, 256, (7, 3), dtype=np.uint32)
    idx = np.repeat(rng.integers(0, 7, (3, 4), dtype=np.uint8), 2, axis=1)
    out = decode_miff(write_miff(
        idx, klass="PseudoClass", cmap=cmap, rle=rle,
        compression="RLE" if rle else "None"))
    np.testing.assert_array_equal(out[..., :3],
                                  cmap.astype(np.uint8)[idx])


def test_miff_zip_raises_gated_diagnostic():
    rgb = np.zeros((2, 2, 3), np.uint32)
    data = write_miff(rgb).replace(b"compression=None",
                                   b"compression=Zip")
    with pytest.raises(RuntimeError, match="Zip"):
        decode_miff(data)


# --------------------------------------------------------------------------
# factory + CLI integration
# --------------------------------------------------------------------------

def test_factory_routes_dpx(tmp_path):
    from timg_tpu.options import DisplayOptions
    from timg_tpu.sources.base import create_source

    rng = np.random.default_rng(12)
    rgb = rng.integers(0, 1024, (40, 60, 3), dtype=np.uint16)
    p = tmp_path / "img.dpx"
    p.write_bytes(write_dpx(rgb))
    opts = DisplayOptions()
    opts.width, opts.height = 40, 24
    src, err = create_source(str(p), opts)
    assert src is not None, err
    assert src.decoder_name == "dpx"
    assert (src.orig_width, src.orig_height) == (60, 40)


def test_cli_renders_miff_end_to_end(tmp_path):
    rng = np.random.default_rng(13)
    rgb = rng.integers(0, 256, (30, 40, 3), dtype=np.uint32)
    p = tmp_path / "img.miff"
    p.write_bytes(write_miff(rgb))
    out = tmp_path / "out.bin"
    env = {k: v for k, v in os.environ.items()
           if not k.startswith("TIMG_")}
    r = subprocess.run(
        [sys.executable, "-m", "timg_tpu.cli", "-g20x10", "-pq",
         "-b", "black", "--debug-no-frame-delay", "-o", str(out), str(p)],
        env=env, capture_output=True, timeout=120, cwd="/root/repo")
    assert r.returncode == 0, r.stderr.decode()
    assert out.stat().st_size > 0


def test_broken_dpx_stays_reference_silent(tmp_path):
    """Garbage with a now-decodable suffix keeps the reference's
    silent exit-1 (same class as a broken .pcx)."""
    p = tmp_path / "broken.dpx"
    p.write_bytes(b"\x01\x02GARBAGE" + bytes(64))
    env = {k: v for k, v in os.environ.items()
           if not k.startswith("TIMG_")}
    r = subprocess.run(
        [sys.executable, "-m", "timg_tpu.cli", "-g20x10", "-pq",
         "-b", "black", "-o", os.devnull, str(p)],
        env=env, capture_output=True, timeout=120, cwd="/root/repo")
    assert r.returncode == 1
    assert "not supported" not in r.stderr.decode()


# --------------------------------------------------------------------------
# hostile headers must not drive output allocation
# --------------------------------------------------------------------------

def test_memory_bomb_headers_rejected():
    """A tiny file whose header claims a huge image must raise before
    allocating output planes (pixel reads are file-size-bounded via
    np.frombuffer; output planes are header-sized)."""
    from timg_tpu.sources.xcf import decode_xcf

    hdr = bytearray(2048)
    hdr[0:4] = b"SDPX"
    struct.pack_into(">I", hdr, 4, 2048)
    struct.pack_into(">H", hdr, 770, 1)
    struct.pack_into(">I", hdr, 772, 60000)
    struct.pack_into(">I", hdr, 776, 60000)
    hdr[800] = 50
    hdr[803] = 10
    struct.pack_into(">H", hdr, 804, 1)
    struct.pack_into(">I", hdr, 808, 2048)
    with pytest.raises(ValueError, match="too large"):
        decode_dpx(bytes(hdr))

    miff = (b"id=ImageMagick\ncolumns=60000 rows=60000 depth=8\n"
            b"class=DirectClass\ncompression=RLE\n:" + bytes(8))
    with pytest.raises(ValueError, match="too large"):
        decode_miff(miff)

    xcf = (b"gimp xcf v002\0" + struct.pack(">III", 60000, 60000, 0)
           + bytes(64))
    with pytest.raises(ValueError, match="too large"):
        decode_xcf(xcf)


# --------------------------------------------------------------------------
# RLA (Wavefront)
# --------------------------------------------------------------------------

def write_rla(rgba, matte=True):
    """Classic 8-bit integer RLA: 740-byte header, bottom-to-top
    scanlines, per-channel signed-count RLE."""
    h, w = rgba.shape[:2]
    num_chan = 3
    num_matte = 1 if matte else 0
    hdr = bytearray(740)
    struct.pack_into(">14h", hdr, 0, 0, w - 1, 0, h - 1,
                     0, w - 1, 0, h - 1, 0, 0, num_chan, num_matte,
                     0, -2)
    struct.pack_into(">h", hdr, 658, 8)  # chan_bits (after the 658-byte text fields)

    def rle(plane):
        out = bytearray()
        i = 0
        n = len(plane)
        while i < n:
            run = 1
            while i + run < n and plane[i + run] == plane[i] and run < 128:
                run += 1
            if run >= 2:
                out += bytes([run - 1, plane[i]])
                i += run
            else:
                lit = 1
                while (i + lit < n and lit < 127
                       and (i + lit + 1 >= n
                            or plane[i + lit] != plane[i + lit + 1])):
                    lit += 1
                out += bytes([256 - lit]) + bytes(
                    int(v) for v in plane[i:i + lit])
                i += lit
        return bytes(out)

    body = bytearray()
    offsets = []
    base = 740 + 4 * h
    for row in range(h):
        offsets.append(base + len(body))
        y = h - 1 - row  # bottom-to-top
        for c in range(num_chan + num_matte):
            enc = rle(rgba[y, :, c])
            body += struct.pack(">H", len(enc)) + enc
    table = struct.pack(">%di" % h, *offsets)
    return bytes(hdr) + table + bytes(body)


@pytest.mark.parametrize("matte", [False, True])
def test_rla_roundtrip(matte):
    from timg_tpu.sources.gm_formats import decode_rla

    rng = np.random.default_rng(21)
    # runs + noise mix exercises both RLE opcode classes
    rgba = rng.integers(0, 256, (9, 33, 4), dtype=np.uint8)
    rgba[:, 5:15] = 77
    out = decode_rla(write_rla(rgba, matte=matte))
    np.testing.assert_array_equal(out[..., :3], rgba[..., :3])
    if matte:
        np.testing.assert_array_equal(out[..., 3], rgba[..., 3])
    else:
        assert (out[..., 3] == 255).all()


def test_rla_garbage_raises():
    from timg_tpu.sources.gm_formats import decode_rla

    with pytest.raises(ValueError):
        decode_rla(bytes(800))


def test_mutation_fuzz_no_crash():
    """Byte-mutated and truncated variants of every format must either
    decode to an array or raise ValueError/RuntimeError -- never crash,
    hang, or allocate unboundedly (the CLI treats both error classes
    as a normal failed source)."""
    from timg_tpu.sources.gm_formats import decode_rla
    from timg_tpu.sources.xcf import decode_xcf
    from tests.test_xcf import write_xcf

    rng = np.random.default_rng(99)
    px10 = rng.integers(0, 1024, (20, 30, 3), dtype=np.uint16)
    px8 = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
    pxu = rng.integers(0, 256, (20, 30, 3), dtype=np.uint32)
    rgba = rng.integers(0, 256, (20, 30, 4), dtype=np.uint8)
    corpora = [
        (decode_dpx, write_dpx(px10)),
        (decode_cineon, write_cineon(px10)),
        (decode_xwd, write_xwd(rgb=px8)),
        (decode_miff, write_miff(pxu, rle=True, compression="RLE")),
        (decode_rla, write_rla(rgba)),
        (decode_xcf, write_xcf([{"pix": px8, "type": 0}], 30, 20)),
    ]
    for decoder, good in corpora:
        data = bytearray(good)
        for trial in range(120):
            mut = bytearray(data)
            kind = trial % 3
            if kind == 0:  # single byte flip
                i = int(rng.integers(0, len(mut)))
                mut[i] ^= int(rng.integers(1, 256))
            elif kind == 1:  # truncation
                mut = mut[:int(rng.integers(1, len(mut)))]
            else:  # 4-byte garbage splice
                i = int(rng.integers(0, max(1, len(mut) - 4)))
                mut[i:i + 4] = rng.integers(0, 256, 4,
                                            dtype=np.uint8).tobytes()
            try:
                out = decoder(bytes(mut))
                assert isinstance(out, np.ndarray)
            except (ValueError, RuntimeError, struct.error, IndexError,
                    KeyError, OverflowError, ZeroDivisionError,
                    UnicodeDecodeError):
                pass


def test_dpx_abgr_descriptor_52():
    """Descriptor 52 stores components in A,B,G,R order (SMPTE 268M);
    the decoder must reverse them."""
    rng = np.random.default_rng(30)
    rgba = rng.integers(0, 1024, (4, 6, 4), dtype=np.uint16)
    abgr = rgba[..., ::-1].copy()
    out = decode_dpx(write_dpx(abgr, bits=10, packing=1, descriptor=52))
    np.testing.assert_array_equal(out, _scale(rgba, 10))


def test_miff_rle_overrun_rejected():
    """An RLE run extending past the pixel count is malformed, not a
    silently clipped decode (same contract as the RLA/XCF decoders)."""
    head = (b"id=ImageMagick\nclass=DirectClass  matte=False\n"
            b"columns=4  rows=1  depth=8\ncompression=RLE\n:")
    # one packet: pixel (1,2,3) repeated 256 times > 4 pixels
    with pytest.raises(ValueError, match="overrun"):
        decode_miff(head + bytes([1, 2, 3, 255]))
