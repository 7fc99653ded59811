"""Device-side sixel column-run compaction (the compact D2H transport).

Why this exists (measured, see ROADMAP "run transport"): the sixel video
path fetches FS-dithered index planes from the device (~1 B/px).  The
reference's own stream (libsixel's encoder, ref src/sixel-canvas.cc:
128-154) run-length-encodes per-color band rows, which compresses 30-70x
on flat/UI/film content under adaptive palettes -- exact palette hits
produce zero dither error, so whole columns repeat -- but ~1x on noisy
photo content where FS dithering decorrelates every pixel.  This module
computes the equivalent compression *before* the transfer: per sixel
band (6 rows), adjacent equal columns collapse into one 8-byte run
record, so D2H carries ~run-count bytes instead of h*w.  The CLI picks
the transport per window from the device-computed run counts (the raw
plane stays the fallback for incompressible frames).

The run records are lossless: expanding them reproduces the index plane
bit-for-bit, and the native assembler (timg_native.cc:
timg_sixel_encode_runs) emits the byte-identical DCS stream directly
from the records without materializing the plane.

Record layout (2 x int32 little-endian words per run):
  word0 = c0 | c1<<8 | c2<<16 | c3<<24     (band rows 0-3 palette idx)
  word1 = c4 | c5<<8 | x<<16               (rows 4-5, start column)
Rows past the image height (h % 6 pad of the last band) are zeroed.
Records are ordered band-major then by x; per-band counts ship
alongside ([nb] int32 per frame), so run lengths are next.x - x (the
band's last run extends to w).

Compaction strategy: adjacent-column change masks are dense VPU ops;
the gather of the sparse run starts uses `jax.lax.sort` keyed on the
flat position (measured 0.27 ms/frame at 720p on v5e-1 -- XLA's
scatter lowering costs ~6.4 ms/frame for the same compaction, and
searchsorted+gather ~10 ms/frame).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

_BIG = np.int32(2 ** 30)


class SixelRuns(NamedTuple):
    """Host-side compact representation of one frame's index plane."""
    records: np.ndarray      # [n, 2] int32 (only the first sum(counts) used)
    band_counts: np.ndarray  # [nb] int32
    h: int
    w: int


def _column_words_jnp(planes, h: int, w: int):
    """[B, >=h, >=w] u8 planes -> per-band column words [B, nb, w] i32."""
    import jax.numpy as jnp

    nb = (h + 5) // 6
    x = planes[:, :h, :w].astype(jnp.int32)
    pad = nb * 6 - h
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    r = x.reshape(x.shape[0], nb, 6, w)
    w0 = (r[:, :, 0] | (r[:, :, 1] << 8) | (r[:, :, 2] << 16)
          | (r[:, :, 3] << 24))
    w1 = r[:, :, 4] | (r[:, :, 5] << 8)
    return w0, w1


def _start_mask_jnp(w0, w1):
    import jax.numpy as jnp

    change = (w0[:, :, 1:] != w0[:, :, :-1]) | (w1[:, :, 1:] != w1[:, :, :-1])
    ones = jnp.ones(w0.shape[:2] + (1,), bool)
    return jnp.concatenate([ones, change], axis=2)   # [B, nb, w]


def run_counts(planes, h: int, w: int):
    """Total column-run count per frame, [B] int32 (device op).

    Cheap dense pass used for the transport decision; jit at call site
    (callers fold it into their own jits or wrap it)."""
    w0, w1 = _column_words_jnp(planes, h, w)
    return _start_mask_jnp(w0, w1).sum(axis=(1, 2), dtype=np.int32)


def compact_runs(planes, h: int, w: int, cap: int):
    """Compact column runs of [B,>=h,>=w] u8 planes (device op).

    Returns (records [B, cap, 2] i32, band_counts [B, nb] i32).  Frames
    with more than ``cap`` runs overflow silently (records truncated);
    callers must check band_counts sums and fall back to the plane
    transport for those frames.  jit at call site."""
    import jax
    import jax.numpy as jnp

    if w >= (1 << 15):
        raise ValueError("run transport requires w < 32768")
    w0, w1 = _column_words_jnp(planes, h, w)
    b = w0.shape[0]
    start = _start_mask_jnp(w0, w1)
    flat = start.reshape(b, -1)
    pos = jax.lax.broadcasted_iota(jnp.int32, flat.shape, 1)
    key = jnp.where(flat, pos, _BIG)
    xcoord = jax.lax.broadcasted_iota(jnp.int32, start.shape[1:], 1)
    rec1 = (w1 | (xcoord[None] << 16)).reshape(b, -1)
    _, r0s, r1s = jax.lax.sort((key, w0.reshape(b, -1), rec1), num_keys=1)
    records = jnp.stack([r0s[:, :cap], r1s[:, :cap]], axis=-1)
    band_counts = start.sum(axis=2, dtype=jnp.int32)
    return records, band_counts


def default_cap(h: int, w: int) -> int:
    """Record capacity bounding the transport at half the plane bytes
    (8 B/record), padded to the lane width for clean slicing."""
    cap = max((h * w) // 16, 256)
    return (cap + 127) // 128 * 128


_JITS: dict = {}


def run_counts_jit(planes, h: int, w: int):
    """jitted run_counts (cached wrapper; h/w static)."""
    import jax

    fn = _JITS.get("counts")
    if fn is None:
        fn = _JITS["counts"] = jax.jit(run_counts, static_argnums=(1, 2))
    return fn(planes, h, w)


def compact_runs_jit(planes, h: int, w: int, cap: int):
    """jitted compact_runs (cached wrapper; h/w/cap static)."""
    import jax

    fn = _JITS.get("compact")
    if fn is None:
        fn = _JITS["compact"] = jax.jit(compact_runs,
                                        static_argnums=(1, 2, 3))
    return fn(planes, h, w, cap)


def _bucket(n: int, cap: int) -> int:
    """Round a record count up to a power-of-two slice length so the
    D2H slice program compiles O(log cap) distinct shapes."""
    b = 128
    while b < n:
        b *= 2
    return min(b, cap)


# Transport accounting (frames moved, bytes shipped vs the plane-
# equivalent bytes); read by --verbose stats and the bench harness.
STATS = {"frames_runs": 0, "frames_plane": 0, "frames_dcs": 0,
         "bytes_shipped": 0, "bytes_plane_equiv": 0}

# Session-sticky DCS verdict: None = not yet A/B-timed; True/False
# after the first qualifying window races the DCS fetch against the
# raw-plane fetch.  Byte-size alone misjudges thin links (measured on
# the dev tunnel: a DCS body 1.07x the plane size cost ~10x the plane
# fetch time -- the lens->cap sync adds a full round trip and the
# emission kernels run long on dense content), while on a fast PCIe
# host DCS wins by deleting the host assembly leg.  One timed A/B per
# session settles it for the link actually in use.
_DCS_FASTER = None


def fetch_planes_or_runs(planes_dev, n_frames: int, h: int, w: int):
    """Transport decision for device-resident dither planes.

    Fetches raw [h, w] planes (one list entry per frame), SixelRuns
    records, or device-emitted SixelDcs bytes — whichever costs least:
    the run records win 17-120x on flat/UI/film content under adaptive
    palettes (measured; see module docstring); on dense/dithered
    content the device-emitted DCS body (ops/sixel_dcs.py) ships
    slightly UNDER plane size and removes the host assembly leg
    entirely (VERDICT r4 #4: 7.8 ms/frame -> a band splice).  The raw
    plane remains the fallback (per-band distinct colors beyond the
    emitter's cap, or pathological content where padding inflates the
    DCS body).  Policy knob: TIMG_TPU_SIXEL_TRANSPORT = auto (default)
    | plane | runs | dcs.
    """
    import os

    import numpy as np

    mode = os.environ.get("TIMG_TPU_SIXEL_TRANSPORT", "auto")
    if mode not in ("auto", "plane", "runs", "dcs"):
        mode = "auto"
    nb = (h + 5) // 6
    if mode in ("auto", "runs") and w < (1 << 15):
        counts = np.asarray(run_counts_jit(planes_dev, h, w))[:n_frames]
        cap = default_cap(h, w)
        rec_bytes = 8 * int(counts.sum()) + 4 * nb * n_frames
        use_runs = (int(counts.max()) <= cap
                    and (mode == "runs"
                         or 2 * rec_bytes <= h * w * n_frames))
        if use_runs:
            records, band_counts = compact_runs_jit(planes_dev, h, w, cap)
            keep = _bucket(int(counts.max()), cap)
            records = np.asarray(records[:n_frames, :keep])
            band_counts = np.asarray(band_counts[:n_frames])
            STATS["frames_runs"] += n_frames
            STATS["bytes_shipped"] += (records.nbytes
                                       + band_counts.nbytes)
            STATS["bytes_plane_equiv"] += h * w * n_frames
            return [SixelRuns(records[i, :counts[i]], band_counts[i],
                              h, w)
                    for i in range(n_frames)]
    global _DCS_FASTER
    if mode in ("auto", "dcs") and (_DCS_FASTER is not False
                                    or mode == "dcs"):
        import time as time_mod

        from timg_tpu.ops import sixel_dcs

        lens, ccounts = sixel_dcs.batch_band_lens(planes_dev, n_frames,
                                                  h, w)
        lens = np.asarray(lens)
        ccounts = np.asarray(ccounts)
        cap = sixel_dcs.bucket_cap(int(lens.max()) if lens.size else 1)
        ship = nb * cap * n_frames
        use_dcs = (int(ccounts.max()) <= sixel_dcs.COLOR_CAP
                   and (mode == "dcs" or ship <= h * w * n_frames))
        if use_dcs:
            bands, lens_d = sixel_dcs.batch_encode(planes_dev, n_frames,
                                                   h, w, cap)
            bands = np.asarray(bands)
            lens_d = np.asarray(lens_d)
            if mode == "auto" and _DCS_FASTER is None:
                # First qualifying window: race a WARM DCS emit+fetch
                # + band splice (the call above already paid the
                # compile) against the raw-plane fetch + C assembly --
                # BOTH legs of each transport, since DCS's whole win is
                # deleting the host assembly (a fetch-only race would
                # systematically pick plane on fast links).  Assembly
                # is timed on frame 0 with a dummy palette (palette
                # values only affect the header registrations) and
                # scaled to the window.  Sticks for the session; costs
                # one duplicate fetch of each kind, once.
                from timg_tpu.ops.sixel_dcs import splice_host
                from timg_tpu.render.sixel_render import (
                    encode_sixel_stream)

                pal_dummy = np.zeros((256, 3), np.uint8)
                t0 = time_mod.perf_counter()
                b2, l2 = sixel_dcs.batch_encode(planes_dev, n_frames,
                                                h, w, cap)
                b2h, l2h = np.asarray(b2), np.asarray(l2)
                t_fetch = time_mod.perf_counter() - t0
                t0 = time_mod.perf_counter()
                splice_host(b2h[0], l2h[0], h, w, pal_dummy)
                t_dcs = (t_fetch
                         + (time_mod.perf_counter() - t0) * n_frames)
                t0 = time_mod.perf_counter()
                planes_h = np.asarray(planes_dev)
                t_fetch = time_mod.perf_counter() - t0
                t0 = time_mod.perf_counter()
                encode_sixel_stream(planes_h[0, :h, :w], pal_dummy)
                t_plane = (t_fetch
                           + (time_mod.perf_counter() - t0) * n_frames)
                _DCS_FASTER = t_dcs <= t_plane
                if not _DCS_FASTER:
                    use_dcs = False
            if use_dcs:
                STATS["frames_dcs"] += n_frames
                STATS["bytes_shipped"] += bands.nbytes + lens_d.nbytes
                STATS["bytes_plane_equiv"] += h * w * n_frames
                return [sixel_dcs.SixelDcs(bands[i], lens_d[i], h, w)
                        for i in range(n_frames)]
    full = np.asarray(planes_dev)
    STATS["frames_plane"] += n_frames
    STATS["bytes_shipped"] += h * w * n_frames
    STATS["bytes_plane_equiv"] += h * w * n_frames
    return [full[i, :h, :w] for i in range(n_frames)]


# ---------------------------------------------------------------------------
# numpy mirrors (strict bit-for-bit; used by the CPU path and as the
# test oracle for the device op and the native assembler)
# ---------------------------------------------------------------------------

def column_words_np(plane: np.ndarray, h: int, w: int):
    nb = (h + 5) // 6
    x = np.zeros((nb * 6, w), np.uint32)
    x[:h] = plane[:h, :w]
    r = x.reshape(nb, 6, w)
    w0 = r[:, 0] | (r[:, 1] << 8) | (r[:, 2] << 16) | (r[:, 3] << 24)
    w1 = r[:, 4] | (r[:, 5] << 8)
    return w0.view(np.int32), w1.view(np.int32)


def compact_runs_np(plane: np.ndarray, h: int, w: int) -> SixelRuns:
    """Reference compaction of one [>=h, >=w] u8 plane."""
    w0, w1 = column_words_np(plane, h, w)
    change = (w0[:, 1:] != w0[:, :-1]) | (w1[:, 1:] != w1[:, :-1])
    start = np.concatenate(
        [np.ones((w0.shape[0], 1), bool), change], axis=1)
    band_counts = start.sum(axis=1).astype(np.int32)
    xcoord = np.broadcast_to(np.arange(w, dtype=np.int32), start.shape)
    rec1 = (w1.view(np.uint32)
            | (xcoord.astype(np.uint32) << 16)).view(np.int32)
    records = np.stack([w0[start], rec1[start]], axis=-1)
    return SixelRuns(records.astype(np.int32), band_counts, h, w)


def expand_runs_np(runs: SixelRuns) -> np.ndarray:
    """Inverse of compact_runs_np: records -> [h, w] u8 plane (pad rows
    of the last partial band are reconstructed as 0)."""
    h, w = runs.h, runs.w
    nb = (h + 5) // 6
    plane = np.zeros((nb * 6, w), np.uint8)
    rec = runs.records.view(np.uint32).reshape(-1, 2)
    k = 0
    for band in range(nb):
        n = int(runs.band_counts[band])
        xs = [int(rec[k + i, 1] >> 16) for i in range(n)] + [w]
        for i in range(n):
            r0, r1 = int(rec[k + i, 0]), int(rec[k + i, 1])
            col = [(r0 >> (8 * j)) & 0xFF for j in range(4)] + \
                  [r1 & 0xFF, (r1 >> 8) & 0xFF]
            for j in range(6):
                plane[band * 6 + j, xs[i]:xs[i + 1]] = col[j]
        k += n
    return plane[:h]
