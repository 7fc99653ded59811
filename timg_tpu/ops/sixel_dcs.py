"""Device-side sixel DCS byte emission (the zero-host-assembly transport).

VERDICT r4 #4: the measured e2e legs put host sixel assembly at
7.8 ms/frame on this 1-CPU host against 1.45 ms of device time — on
non-tunnel hardware that host leg caps the pipeline at ~128 fps.  The
run-record transport (ops/sixel_runs.py) already removes the host works
for flat/film content; this module removes it for the dense/dithered
case by emitting the final DCS payload bytes ON DEVICE, so the host
only writes the header/palette and splices per-band byte slices with
'-' separators (120 memcpys/frame).

Byte-identity contract: for a given index plane and palette size, the
spliced output equals ``timg_sixel_encode`` (native/timg_native.cc:161,
itself pinned against the reference's sixel stream semantics, ref
src/sixel-canvas.cc:128-154) byte for byte.  tests/test_sixel_dcs.py
pins device == numpy mirror == native C across a geometry/content
matrix.

Algorithm (dense, sort-free; per frame):

1. per-band color presence over the first ``n_colors`` palette slots;
   compact the ≤``color_cap`` present colors per band with one tiny
   [nb, 256] sort (bands whose presence exceeds the cap are reported so
   the caller falls back to the plane transport for that frame).
2. dense per-band mask rows M[nb, C, w] (u8 sixel bits 0..63) built by
   6 compare-accumulate passes against the compacted color list.
3. dense RLE: run starts at x=0 or byte change; run length from the
   next start (reverse min-scan); the trailing run is dropped when its
   value is 0 (absent-color rows thereby vanish entirely — their x=0
   cell IS the trailing zero run).
4. every emitted byte belongs to exactly one run-start cell: the x=0
   cell of a content row also carries the row header ('$' separator +
   '#<color>'), interior cells carry '!<len><char>' / repeated chars.
   Cell byte lengths -> per-band exclusive cumsum -> band-relative
   offsets; per-band byte totals size the padded output.
5. emission: one global jnp.repeat maps output bytes -> cells; gathers
   of the cell fields + pure elementwise digit math produce the byte
   values into [nb, cap] padded band buffers.

The '-' band separators, DCS prefix ("\\033Pq\\"1;1;W;H"), palette
registrations, and ST suffix stay host-side (they're per-frame
constants); ``splice_host`` reproduces the exact native framing.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

_BIG = np.int32(2 ** 30)


class SixelDcs(NamedTuple):
    """Host-side device-emitted DCS body of one frame: padded per-band
    byte buffers + lengths.  ``splice_host`` turns it into the full
    stream.  Invariant: the index plane held only values < the palette
    length (true for every device dither: indices address palette
    slots), since the device emitter was sized with n_colors=256."""
    bands: np.ndarray      # [nb, cap] u8 (zero-padded tails)
    band_lens: np.ndarray  # [nb] i32
    h: int
    w: int

# Template layout per cell (byte positions within the cell's emission):
#   [optional '$'][optional '#' + color digits][run bytes]
# run bytes: len > 3 -> '!' + len digits + char;  len <= 3 -> char * len.
# Max cell bytes: 1 + 4 + 6 = 11 (color <= 255 -> 3 digits, len <= 9999).


def _digits(v: np.ndarray) -> np.ndarray:
    """Decimal digit count of non-negative ints (0 -> 1)."""
    v = np.asarray(v)
    return np.where(v >= 1000, 4,
                    np.where(v >= 100, 3, np.where(v >= 10, 2, 1)))


def plan_np(plane: np.ndarray, h: int, w: int, n_colors: int,
            color_cap: int):
    """Numpy mirror of the device planning pass.

    plane: [>=h, >=w] u8.  Returns (clist [nb, C] i32 with -1 padding,
    overflow bool, M [nb, C, w] u8) — the compacted per-band color
    lists and dense mask rows.
    """
    nb = (h + 5) // 6
    x = np.full((nb * 6, w), 256, np.int32)  # pad sentinel: matches no color
    x[:h] = plane[:h, :w]
    bands = x.reshape(nb, 6, w)

    # presence over palette colors only (out-of-palette indices drop)
    colors = np.arange(256, dtype=np.int32)
    present = np.zeros((nb, 256), bool)
    for r in range(6):
        present |= (bands[:, r, :, None] == colors[None, None, :]).any(1)
    present[:, n_colors:] = False

    counts = present.sum(1)
    overflow = bool((counts > color_cap).any())

    # compact: ascending color order, -1 padded (tiny per-band sort)
    key = np.where(present, colors[None, :], _BIG)
    key.sort(axis=1)
    clist = np.where(key[:, :color_cap] >= _BIG, -1,
                     key[:, :color_cap]).astype(np.int32)

    # dense mask rows against the compacted list
    C = color_cap
    M = np.zeros((nb, C, w), np.uint8)
    for r in range(6):
        eq = bands[:, None, r, :] == clist[:, :, None]
        M |= (eq.astype(np.uint8) << r)
    return clist, overflow, M


def layout_np(clist: np.ndarray, M: np.ndarray, w: int):
    """Numpy mirror of the RLE + byte-layout pass.

    Returns (cell fields dict, band_lens [nb] i32).  Cells are the
    dense [nb, C, w] grid; only run-start cells have nonzero length.
    """
    nb, C, _ = M.shape
    Mi = M.astype(np.int32)
    start = np.ones((nb, C, w), bool)
    start[:, :, 1:] = Mi[:, :, 1:] != Mi[:, :, :-1]

    xs = np.arange(w, dtype=np.int32)
    nxt = np.where(start, xs[None, None, :], _BIG)
    # next run start strictly after x (reverse exclusive min-scan)
    nxt = np.concatenate([nxt[:, :, 1:],
                          np.full((nb, C, 1), w, np.int32)], axis=2)
    nxt = np.minimum.accumulate(nxt[:, :, ::-1], axis=2)[:, :, ::-1]
    nxt = np.minimum(nxt, w)
    run_len = np.where(start, nxt - xs[None, None, :], 0)

    # trailing zero run dropped (absent rows vanish: their x=0 cell is it)
    trailing_zero = start & (Mi == 0) & (nxt >= w)
    emit_run = start & ~trailing_zero

    run_bytes = np.where(emit_run,
                         np.where(run_len > 3, 2 + _digits(run_len),
                                  run_len), 0)

    # headers fold into x=0 of content rows
    content = (M != 0).any(axis=2)                       # [nb, C]
    # '$' before every content row except the band's first
    first_content = np.zeros_like(content)
    for b in range(nb):
        idx = np.where(content[b])[0]
        if len(idx):
            first_content[b, idx[0]] = True
    dollar = content & ~first_content
    hdr_bytes = np.where(content,
                         1 + _digits(np.maximum(clist, 0))
                         + dollar.astype(np.int32), 0)    # '#'+digits(+'$')

    cell_bytes = run_bytes.copy()
    cell_bytes[:, :, 0] += hdr_bytes
    flat = cell_bytes.reshape(nb, -1)
    offs = np.zeros_like(flat)
    np.cumsum(flat[:, :-1], axis=1, out=offs[:, 1:])
    band_lens = offs[:, -1] + flat[:, -1]
    return dict(start=start, run_len=run_len, emit_run=emit_run,
                value=np.where(start, Mi, 0), cell_bytes=cell_bytes,
                offsets=offs.reshape(nb, C, w), hdr_bytes=hdr_bytes,
                dollar=dollar, content=content), band_lens.astype(np.int32)


def _cell_byte_np(k, color, value, run_len, hdr_len, has_dollar):
    """Byte at position k of one cell's emission (scalar mirror)."""
    if k < hdr_len:
        if has_dollar:
            if k == 0:
                return ord('$')
            k -= 1
        if k == 0:
            return ord('#')
        d = k - 1
        nd = len(str(color))
        return ord(str(color)[d]) if d < nd else 0
    k -= hdr_len
    ch = 0x3F + value
    if run_len > 3:
        if k == 0:
            return ord('!')
        s = str(run_len)
        if k - 1 < len(s):
            return ord(s[k - 1])
        return ch
    return ch


def emit_np(clist: np.ndarray, fields: dict, band_lens: np.ndarray,
            cap: int) -> np.ndarray:
    """Numpy mirror of the emission gather: [nb, cap] u8 padded bands."""
    nb, C, w = fields["start"].shape
    out = np.zeros((nb, cap), np.uint8)
    for b in range(nb):
        pos = 0
        for ci in range(C):
            color = int(clist[b, ci])
            if color < 0:
                continue
            hdr = int(fields["hdr_bytes"][b, ci])
            for x in range(w):
                n = int(fields["cell_bytes"][b, ci, x])
                if not n:
                    continue
                h0 = hdr if x == 0 else 0
                for k in range(n):
                    out[b, pos + k] = _cell_byte_np(
                        k, color, int(fields["value"][b, ci, x]),
                        int(fields["run_len"][b, ci, x]), h0,
                        bool(fields["dollar"][b, ci]))
                pos += n
        assert pos == int(band_lens[b]), (b, pos, int(band_lens[b]))
    return out


def encode_np(plane: np.ndarray, h: int, w: int, n_colors: int,
              color_cap: int = 64):
    """Full numpy mirror: plane -> (bands [nb, cap] u8, band_lens,
    overflow).  The mirror is slow (test oracle only)."""
    clist, overflow, M = plan_np(plane, h, w, n_colors, color_cap)
    if overflow:
        return None, None, True
    fields, band_lens = layout_np(clist, M, w)
    cap = int(band_lens.max()) if band_lens.size else 0
    return emit_np(clist, fields, band_lens, max(cap, 1)), band_lens, False


def splice_host(bands: np.ndarray, band_lens: np.ndarray, h: int, w: int,
                palette: np.ndarray) -> bytes:
    """Host splice: DCS prefix + palette + per-band slices joined with
    '-' + ST.  Byte-identical framing to timg_sixel_encode."""
    head = [b'\033Pq"1;1;%d;%d' % (w, h)]
    pal = palette.reshape(-1, 3)
    for i, (r, g, b) in enumerate(pal):
        head.append(b"#%d;2;%d;%d;%d" % (i, (int(r) * 100 + 127) // 255,
                                         (int(g) * 100 + 127) // 255,
                                         (int(b) * 100 + 127) // 255))
    mv = memoryview(np.ascontiguousarray(bands)).cast("B")
    cap = bands.shape[1] if bands.ndim == 2 else 0
    body = b"-".join(mv[i * cap:i * cap + int(band_lens[i])]
                     for i in range(bands.shape[0]))
    return b"".join(head) + body + b"\033\\"


# ---------------------------------------------------------------------------
# device implementation (jax.numpy; jit at call site)
# ---------------------------------------------------------------------------

def plan_device(plane, h: int, w: int, n_colors: int, color_cap: int):
    """Device planning pass for ONE frame's [>=h, >=w] u8 plane.

    Returns (clist [nb, C] i32, counts [nb] i32, M [nb, C, w] u8).
    Caller checks counts.max() > color_cap for the plane fallback.
    """
    import jax.numpy as jnp

    nb = (h + 5) // 6
    x = plane[:h, :w].astype(jnp.int32)
    pad = nb * 6 - h
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)), constant_values=256)
    bands = x.reshape(nb, 6, w)

    colors = jnp.arange(256, dtype=jnp.int32)
    present = jnp.zeros((nb, 256), bool)
    for r in range(6):
        present |= (bands[:, r, :, None] == colors[None, None, :]).any(1)
    present = present & (colors[None, :] < n_colors)
    counts = present.sum(1).astype(jnp.int32)

    key = jnp.sort(jnp.where(present, colors[None, :], _BIG), axis=1)
    clist = jnp.where(key[:, :color_cap] >= _BIG, -1,
                      key[:, :color_cap]).astype(jnp.int32)

    M = jnp.zeros((nb, color_cap, w), jnp.uint8)
    for r in range(6):
        eq = bands[:, None, r, :] == clist[:, :, None]
        M = M | (eq.astype(jnp.uint8) << r)
    return clist, counts, M


def layout_device(clist, M, w: int):
    """Device RLE + byte layout. Returns (fields tuple, band_lens)."""
    import jax.numpy as jnp
    from jax import lax

    nb, C, _ = M.shape
    Mi = M.astype(jnp.int32)
    xs = jnp.arange(w, dtype=jnp.int32)
    start = jnp.concatenate(
        [jnp.ones((nb, C, 1), bool), Mi[:, :, 1:] != Mi[:, :, :-1]],
        axis=2)

    nxt = jnp.where(start, xs[None, None, :], _BIG)
    nxt = jnp.concatenate([nxt[:, :, 1:],
                           jnp.full((nb, C, 1), w, jnp.int32)], axis=2)
    nxt = lax.cummin(nxt, axis=2, reverse=True)
    nxt = jnp.minimum(nxt, w)
    run_len = jnp.where(start, nxt - xs[None, None, :], 0)

    trailing_zero = start & (Mi == 0) & (nxt >= w)
    emit_run = start & ~trailing_zero

    def digits(v):
        return jnp.where(v >= 1000, 4,
                         jnp.where(v >= 100, 3, jnp.where(v >= 10, 2, 1)))

    run_bytes = jnp.where(emit_run,
                          jnp.where(run_len > 3, 2 + digits(run_len),
                                    run_len), 0)

    content = (M != 0).any(axis=2)                        # [nb, C]
    # first content row per band: cummax over row index
    seen_before = jnp.concatenate(
        [jnp.zeros((nb, 1), bool),
         jnp.cumsum(content, axis=1)[:, :-1] > 0], axis=1)
    dollar = content & seen_before
    hdr_bytes = jnp.where(content,
                          1 + digits(jnp.maximum(clist, 0))
                          + dollar.astype(jnp.int32), 0)

    cell_bytes = run_bytes.at[:, :, 0].add(hdr_bytes)
    flat = cell_bytes.reshape(nb, -1)
    csum = jnp.cumsum(flat, axis=1)
    offs = (csum - flat).reshape(nb, C, w)
    band_lens = csum[:, -1].astype(jnp.int32)
    value = jnp.where(start, Mi, 0)
    return (value, run_len, cell_bytes, offs, hdr_bytes, dollar,
            jnp.maximum(clist, 0)), band_lens


def emit_device(fields, band_lens, w: int, cap: int):
    """Device emission at static per-band byte capacity ``cap``.

    Returns [nb, cap] u8 padded band buffers (zero-padded tails).
    """
    import jax.numpy as jnp

    value, run_len, cell_bytes, offs, hdr_bytes, dollar, colors = fields
    nb, C, _ = value.shape
    ncell = C * w

    # map output bytes -> cells: one global repeat with a per-band pad
    # cell (id = ncell + b) absorbing the slack up to cap.
    flat_bytes = cell_bytes.reshape(nb, ncell)
    pad_lens = (cap - band_lens).astype(jnp.int32)
    lens_all = jnp.concatenate([flat_bytes, pad_lens[:, None]],
                               axis=1).reshape(-1)
    ids_all = jnp.arange(nb * (ncell + 1), dtype=jnp.int32)
    cell_of_byte = jnp.repeat(ids_all, lens_all,
                              total_repeat_length=nb * cap)
    band_of_byte = cell_of_byte // (ncell + 1)
    cid = cell_of_byte % (ncell + 1)
    is_pad = cid >= ncell
    ci = jnp.minimum(cid, ncell - 1) // w
    xx = jnp.minimum(cid, ncell - 1) % w

    def g(a):
        return a[band_of_byte, ci, xx]

    def g2(a):
        return a[band_of_byte, ci]

    j = jnp.arange(nb * cap, dtype=jnp.int32)
    k = j % cap - g(offs)                      # byte index within cell
    v = g(value)
    rl = g(run_len)
    hdr = jnp.where(xx == 0, g2(hdr_bytes), 0)
    dol = g2(dollar) & (xx == 0)
    col = g2(colors)

    # header bytes: ['$']['#'][color digits]
    kh = k - dol.astype(jnp.int32)             # position past '$'
    cd = jnp.where(col >= 100, 3, jnp.where(col >= 10, 2, 1))
    dpow = cd - kh                             # 0 => last digit (10^0)
    pow10 = jnp.where(dpow <= 0, 1, jnp.where(dpow == 1, 10, 100))
    hdr_byte = jnp.where(
        (k == 0) & dol, ord('$'),
        jnp.where(kh == 0, ord('#'),
                  ord('0') + (col // pow10) % 10))

    # run bytes: ['!'][len digits][char] or repeated char
    kr = k - hdr
    ch = 0x3F + v
    ld = jnp.where(rl >= 1000, 4,
                   jnp.where(rl >= 100, 3, jnp.where(rl >= 10, 2, 1)))
    rp = ld - kr                               # 0 => last digit (10^0)
    p10 = jnp.where(rp <= 0, 1,
                    jnp.where(rp == 1, 10, jnp.where(rp == 2, 100, 1000)))
    run_byte = jnp.where(
        rl > 3,
        jnp.where(kr == 0, ord('!'),
                  jnp.where(kr <= ld, ord('0') + (rl // p10) % 10, ch)),
        ch)

    byte = jnp.where(k < hdr, hdr_byte, run_byte)
    byte = jnp.where(is_pad, 0, byte)
    return byte.astype(jnp.uint8).reshape(nb, cap)


def encode_device(plane, h: int, w: int, n_colors: int,
                  color_cap: int, cap: int):
    """Single-frame device encode at static band capacity ``cap``.

    Returns (bands [nb, cap] u8, band_lens [nb] i32, counts [nb] i32).
    jit at call site (h/w/n_colors/color_cap/cap static).
    """
    clist, counts, M = plan_device(plane, h, w, n_colors, color_cap)
    fields, band_lens = layout_device(clist, M, w)
    bands = emit_device(fields, band_lens, w, cap)
    return bands, band_lens, counts


def band_lens_device(plane, h: int, w: int, n_colors: int,
                     color_cap: int):
    """Cheap sizing pass: (band_lens [nb], counts [nb]) for the
    transport decision and capacity bucketing."""
    clist, counts, M = plan_device(plane, h, w, n_colors, color_cap)
    _, band_lens = layout_device(clist, M, w)
    return band_lens, counts


# ---------------------------------------------------------------------------
# batched transport entry points (vmap over frames; jit-cached)
# ---------------------------------------------------------------------------

COLOR_CAP = 64  # per-band distinct-color budget; beyond it -> plane

_JITS: dict = {}


def batch_band_lens(planes, n_frames: int, h: int, w: int):
    """[B, >=h, >=w] u8 planes -> (band_lens [B, nb], counts [B, nb])."""
    import jax

    fn = _JITS.get("lens")
    if fn is None:
        fn = _JITS["lens"] = jax.jit(
            jax.vmap(band_lens_device,
                     in_axes=(0, None, None, None, None)),
            static_argnums=(1, 2, 3, 4))
    return fn(planes[:n_frames], h, w, 256, COLOR_CAP)


def batch_encode(planes, n_frames: int, h: int, w: int, cap: int):
    """[B, >=h, >=w] u8 planes -> (bands [B, nb, cap] u8,
    band_lens [B, nb] i32).  ``cap`` static (bucket before calling)."""
    import jax

    fn = _JITS.get("enc")
    if fn is None:
        fn = _JITS["enc"] = jax.jit(
            jax.vmap(encode_device,
                     in_axes=(0, None, None, None, None, None)),
            static_argnums=(1, 2, 3, 4, 5))
    bands, lens, _ = fn(planes[:n_frames], h, w, 256, COLOR_CAP, cap)
    return bands, lens


def bucket_cap(max_band_bytes: int) -> int:
    """Round the band byte capacity up to a power of two (>=512) so the
    emit program compiles O(log) distinct shapes per geometry."""
    c = 512
    while c < max_band_bytes:
        c *= 2
    return c
