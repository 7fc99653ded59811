#!/usr/bin/env python3
"""Headline benchmark: 1080p frames/sec/chip through resize -> 256-color
FS dither -> sixel index planes.

Prints ONE JSON line.  The headline metric/value/vs_baseline fields keep
the driver contract (device pipeline, cube palette); the "extra" object
carries the other driver-requested numbers:

* ``adaptive_fps`` -- the same device pipeline with the *default* CLI
  dither (balanced median-cut tree descent), so the recorded artifact
  covers what `timg-tpu -ps photo.jpg` actually runs.
* ``e2e_sustained_fps`` -- the honest end-to-end number with the host
  legs in: host frame pool -> H2D staging of packed words -> device
  resize+dither -> D2H index planes -> pooled C sixel assembly -> write
  to /dev/null, double-buffered like the depth-4 write queue (ref
  buffered-write-sequencer.cc:91-146, video-source.cc:313-365).
* ``e2e_bottleneck`` + per-leg timings naming where the e2e time goes
  (link bandwidth vs kernels vs assembler).

vs_baseline is against the driver-set north-star target of 5000
1080p frames/s/chip (BASELINE.json; the reference publishes no numbers).

Measurement method for the device-only numbers: the whole run is ONE
jitted program -- a lax.fori_loop whose body processes a batch selected
by the loop index from a pre-staged pool (distinct data defeats CSE; the
loop carry serializes iterations) -- followed by a single scalar fetch.
This forces real device execution even where async dispatch / tunnel
plumbing makes `block_until_ready` unreliable as a completion signal.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TARGET_FPS = 5000.0  # BASELINE.json north star, TPU v5e-1

# Steady-state video loop config: 1080p input, typical large sixel
# terminal canvas output.
IN_H, IN_W = 1080, 1920
OUT_H, OUT_W = 720, 1280
BATCH = 128
POOL = 2          # distinct staged input batches
ITERS = 8         # loop iterations (alternating over the pool)

# End-to-end config: smaller batches so the staging pipeline has
# several windows in flight (the CLI's video window size class).
E2E_BATCH = 32
E2E_BATCHES = 10


def _device_fps(jax, jnp, np, pipeline, pool_dev, iters=ITERS,
                repeats=None):
    """fori-loop over the staged pool; returns (median frames/s,
    spread) over ``repeats`` timed samples (compile paid once).

    The tunnel to the dev chip adds ±20% run-to-run noise
    (ROADMAP "bench reproducibility"); medianing several samples
    inside one process makes the recorded artifact stable without
    re-paying compiles."""
    if repeats is None:
        # 15 timed medians (VERDICT r4 #5: 3-5 samples left a 23% spread
        # on the recorded artifact; each sample is ~0.2 s of device time
        # so the wall cost of 15 is seconds).
        repeats = int(os.environ.get("TIMG_TPU_BENCH_REPEATS", "15"))

    @jax.jit
    def run(p0, p1, n):
        def body(k, s):
            idx = jax.lax.switch(k % POOL, [lambda: pipeline(p0),
                                            lambda: pipeline(p1)])
            return s + idx[0, 0, 0].astype(jnp.int32) + k
        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    np.asarray(run(*pool_dev, 1))          # warmup / compile
    samples = []
    for _ in range(max(1, repeats)):
        t0 = time.perf_counter()
        np.asarray(run(*pool_dev, iters))
        elapsed = time.perf_counter() - t0
        t1 = time.perf_counter()
        np.asarray(run(*pool_dev, 0))      # dispatch+fetch round trip
        rtt = time.perf_counter() - t1
        # A tunnel hiccup can make the rtt probe slower than the timed
        # run itself; cap the correction at half the elapsed time so a
        # single bad probe can't produce a nonsense sample (r4: one
        # such sample recorded a 1e8 "spread").
        samples.append(BATCH * iters / max(elapsed - rtt, 0.5 * elapsed))
    samples.sort()
    med = samples[len(samples) // 2] if len(samples) % 2 else \
        0.5 * (samples[len(samples) // 2 - 1] + samples[len(samples) // 2])
    spread = (samples[-1] - samples[0]) / med if med else 0.0
    return med, round(spread, 3), (round(samples[0], 1),
                                   round(samples[-1], 1))


def _bench_e2e(jax, np, resize_op, fs_dither_cube_fused):
    """Sustained pipeline with the host legs in.  Returns (fps, legs).

    Transport is the CLI video path's: raw YUV 4:2:0 planes over the
    host->device link (1.5 B/px, 2.67x less than RGBA words) with the
    BT.601 conversion fused device-side (ops/yuv.py) -- the TPU-native
    replacement for the reference's host swscale leg (ref
    video-source.cc:352-354)."""
    import ctypes
    from concurrent.futures import ThreadPoolExecutor

    from timg_tpu.native import runtime
    from timg_tpu.ops import sixel as sixel_op
    from timg_tpu.ops.yuv import yuv420_to_rgba_words

    lib = runtime.load()
    if lib is None:
        # native helper unavailable: the device metrics above already
        # satisfy the driver contract; skip the host-leg benchmark
        # instead of crashing without printing the JSON line
        return None, {"error": "native helper not built"}, "unavailable"
    rng = np.random.default_rng(7)
    # Photo-like frames (gradients + mild luma noise, smooth chroma):
    # noise is a pathological sixel workload (every palette color in
    # every band, ~3x the output bytes) that no video produces; the
    # e2e number should reflect the representative case.
    ch, cw = IN_H // 2, IN_W // 2
    yy, xx = np.mgrid[0:IN_H, 0:IN_W]
    ybase = ((xx + yy) * 255 // (IN_W + IN_H)).astype(np.float32)
    cyy, cxx = np.mgrid[0:ch, 0:cw]
    host_pool = []
    for p in range(3):
        yp = np.clip(ybase[None] + rng.normal(p * 3, 6,
                                              (E2E_BATCH, IN_H, IN_W)),
                     0, 255).astype(np.uint8)
        up = np.broadcast_to((64 + cxx * 128 // cw + 2 * p
                              ).astype(np.uint8), (E2E_BATCH, ch, cw)).copy()
        vp = np.broadcast_to((192 - cyy * 128 // ch - 2 * p
                              ).astype(np.uint8), (E2E_BATCH, ch, cw)).copy()
        host_pool.append((yp, up, vp))
    pad_to = resize_op.padded_plane_dims(OUT_H, OUT_W)
    palette = np.ascontiguousarray(sixel_op.cube_palette(), dtype=np.uint8)

    @jax.jit
    def dev(planes):
        y, u, v = planes
        words = yuv420_to_rgba_words(y, u, v, True)
        words = resize_op.resize_video_words(words, OUT_H, OUT_W,
                                             pad_to=pad_to)
        out = fs_dither_cube_fused(words, OUT_H, OUT_W, out_u8=True,
                                   out_padded=True)
        # fetch only valid rows: the 128-row padding is 6% of D2H on
        # a link-bound host (row pitch stays the padded width)
        return out[:, :OUT_H]

    devnull = open(os.devnull, "wb")

    def assemble_planes(planes_host):
        """Pooled C sixel assembly of one batch from raw index planes
        (the r4 architecture; kept as the measured comparison leg)."""
        from timg_tpu.render.sixel_render import _tls_buffer

        pitch = planes_host.strides[1]
        n_bands = (OUT_H + 5) // 6
        cap = n_bands * len(palette) * (OUT_W + 12) + len(palette) * 20 + 256

        def one(i):
            frame = planes_host[i]
            buf = _tls_buffer(cap)
            n = lib.timg_sixel_encode(frame.ctypes.data, OUT_H, OUT_W,
                                      pitch, palette.ctypes.data,
                                      len(palette), buf)
            return ctypes.string_at(buf, n)
        for fut in [pool_exec.submit(one, i) for i in range(E2E_BATCH)]:
            devnull.write(fut.result())

    # r5 transport: the device emits the final DCS body bytes
    # (ops/sixel_dcs.py); the host splice is a join of band slices.
    from timg_tpu.ops import sixel_dcs as dcs_op
    pal3 = palette.reshape(-1, 3)

    def fetch_dcs(out_dev):
        """Transport leg: device sizing + emission + D2H of the padded
        band buffers (replaces the raw-plane D2H)."""
        lens, _ = dcs_op.batch_band_lens(out_dev, E2E_BATCH, OUT_H, OUT_W)
        cap = dcs_op.bucket_cap(int(np.asarray(lens).max()))
        bands, lens_d = dcs_op.batch_encode(out_dev, E2E_BATCH, OUT_H,
                                            OUT_W, cap)
        return np.asarray(bands), np.asarray(lens_d)

    def assemble_dcs(bands, lens_d):
        """Host splice of device-emitted DCS bytes + write."""
        for i in range(E2E_BATCH):
            devnull.write(dcs_op.splice_host(bands[i], lens_d[i],
                                             OUT_H, OUT_W, pal3))

    import queue as queue_mod
    import threading

    with ThreadPoolExecutor(max_workers=os.cpu_count() or 4) as pool_exec:
        # Warmup: compile + touch every leg once.  One byte-identity
        # spot check keeps the transport honest: spliced device bytes
        # == the C plane assembler's output.
        warm = dev(jax.device_put(host_pool[0]))
        wb, wl = fetch_dcs(warm)
        warm_host = np.asarray(warm)
        from timg_tpu.render.sixel_render import encode_sixel_stream
        spliced = dcs_op.splice_host(wb[0], wl[0], OUT_H, OUT_W, pal3)
        plane_bytes = encode_sixel_stream(warm_host[0], pal3)
        if spliced != plane_bytes:
            return None, {"error": "dcs transport byte mismatch"}, "bug"
        assemble_dcs(wb, wl)
        assemble_planes(warm_host)

        # Transport policy mirrors the CLI's auto choice: time one
        # warm batch through each transport and pipeline the faster
        # one.  (On noise-heavy content the padded DCS buffers exceed
        # the raw plane and the lens->cap sync costs an extra round
        # trip; on coherent content DCS wins.  Production makes the
        # same per-window call -- ops/sixel_runs.py.)  Each side is
        # timed on a FRESH device output: np.asarray on `warm` would
        # return the host copy jax cached at the byte-identity check
        # above and measure ~0 for the plane D2H leg.
        warm2 = jax.block_until_ready(dev(jax.device_put(host_pool[1])))
        t0 = time.perf_counter()
        wb, wl = fetch_dcs(warm2)
        assemble_dcs(wb, wl)
        t_dcs = time.perf_counter() - t0
        warm3 = jax.block_until_ready(dev(jax.device_put(host_pool[2])))
        t0 = time.perf_counter()
        assemble_planes(np.asarray(warm3))
        t_plane = time.perf_counter() - t0
        use_dcs = t_dcs <= t_plane

        # Pipelined run: a dedicated uploader thread stages + dispatches
        # windows (H2D overlaps the consumer's D2H + assembly; jax
        # releases the GIL during transfers), bounded at depth 2 like
        # the reference's write queue class. Each leg records
        # (start, end) spans so overlap is *measured*, not asserted.
        spans = {"h2d": [], "d2h": [], "assemble": []}
        ready: queue_mod.Queue = queue_mod.Queue(maxsize=2)

        def uploader():
            for k in range(E2E_BATCHES):
                t0 = time.perf_counter()
                out = dev(jax.device_put(host_pool[k % 3]))
                jax.block_until_ready(out)  # staged + computed
                spans["h2d"].append((t0, time.perf_counter()))
                ready.put(out)
            ready.put(None)

        t_start = time.perf_counter()
        up_thread = threading.Thread(target=uploader, daemon=True)
        up_thread.start()
        while True:
            out = ready.get()
            if out is None:
                break
            t0 = time.perf_counter()
            if use_dcs:
                bands, lens_d = fetch_dcs(out)      # device emit + D2H
                t1 = time.perf_counter()
                assemble_dcs(bands, lens_d)         # host band splice
            else:
                host_planes = np.asarray(out)       # raw-plane D2H
                t1 = time.perf_counter()
                assemble_planes(host_planes)        # pooled C assembly
            t2 = time.perf_counter()
            spans["d2h"].append((t0, t1))
            spans["assemble"].append((t1, t2))
        up_thread.join()
        elapsed = time.perf_counter() - t_start
    fps = E2E_BATCH * E2E_BATCHES / elapsed

    # Overlap efficiency: how much leg time ran concurrently. 1.0 =
    # fully serial; >1 = overlap (sum of busy leg time / wall clock).
    leg_sum = sum(e - s for leg in spans.values() for (s, e) in leg)
    overlap = {
        "legs_busy_s": round(leg_sum, 2),
        "wall_s": round(elapsed, 2),
        "overlap_factor": round(leg_sum / max(elapsed, 1e-9), 2),
        # first three windows' spans, relative ms (the timeline proof)
        "timeline_ms": {
            leg: [[round((s - t_start) * 1e3), round((e - t_start) * 1e3)]
                  for (s, e) in spans[leg][:3]]
            for leg in spans
        },
    }

    # Leg attribution (serial re-measurement of each stage).
    legs = {}
    t = time.perf_counter()
    for k in range(3):
        jax.block_until_ready(jax.device_put(host_pool[k]))
    legs["h2d_ms_per_frame"] = round(
        (time.perf_counter() - t) / (3 * E2E_BATCH) * 1e3, 3)
    dev_in = jax.block_until_ready(jax.device_put(host_pool[0]))
    jax.block_until_ready(dev(dev_in))
    t = time.perf_counter()
    out = jax.block_until_ready(dev(dev_in))
    legs["device_ms_per_frame"] = round(
        (time.perf_counter() - t) / E2E_BATCH * 1e3, 3)
    t = time.perf_counter()
    bands, lens_d = fetch_dcs(out)
    legs["d2h_ms_per_frame"] = round(
        (time.perf_counter() - t) / E2E_BATCH * 1e3, 3)
    t = time.perf_counter()
    assemble_dcs(bands, lens_d)
    legs["assemble_ms_per_frame"] = round(
        (time.perf_counter() - t) / E2E_BATCH * 1e3, 3)
    legs["dcs_bytes_per_frame"] = round(bands.nbytes / E2E_BATCH)
    # comparison rows: the r4 raw-plane D2H + pooled C plane assembly
    t = time.perf_counter()
    host_planes = np.asarray(out)
    legs["d2h_plane_ms_per_frame"] = round(
        (time.perf_counter() - t) / E2E_BATCH * 1e3, 3)
    with ThreadPoolExecutor(max_workers=os.cpu_count() or 4) as pool_exec:
        t = time.perf_counter()
        assemble_planes(host_planes)
        legs["assemble_plane_ms_per_frame"] = round(
            (time.perf_counter() - t) / E2E_BATCH * 1e3, 3)
    devnull.close()
    frame_mb = IN_H * IN_W * 1.5 / 1e6      # YUV 4:2:0 transport
    legs["h2d_mb_per_s"] = round(
        frame_mb / max(legs["h2d_ms_per_frame"], 1e-6) * 1e3, 1)
    legs["transport"] = ("yuv420 in / dcs out" if use_dcs
                         else "yuv420 in / plane out")
    legs["host_cpus"] = os.cpu_count()
    legs["overlap"] = overlap
    # bottleneck reflects the transport the run actually used; the
    # other transport's rows stay as the measured comparison.
    d2h_used = legs["d2h_ms_per_frame" if use_dcs
                    else "d2h_plane_ms_per_frame"]
    asm_used = legs["assemble_ms_per_frame" if use_dcs
                    else "assemble_plane_ms_per_frame"]
    bottleneck = max(
        ("h2d", legs["h2d_ms_per_frame"]),
        ("device", legs["device_ms_per_frame"]),
        ("d2h", d2h_used),
        ("assemble", asm_used),
        key=lambda kv: kv[1])[0]
    return fps, legs, bottleneck


def _bench_e2e_film(jax, np):
    """Film-class end-to-end: the actual CLI video path (y4m decode ->
    H2D -> device resize + libsixel-mode dither -> run-transport D2H ->
    native assembly -> write), driven in-process under a scripted pty.

    Real video has flat/smooth regions where adaptive palettes hit
    exactly and FS dithering goes quiet; the device-side column-run
    transport (ops/sixel_runs.py) ships those frames 10-100x smaller
    than index planes.  The noise-class e2e above is the worst case
    (runs lose; the transport auto-falls back to planes); this leg
    records the representative case plus the measured transport ratio.
    """
    import fcntl
    import pty as pty_mod
    import struct
    import tempfile
    import termios
    import threading

    from timg_tpu.cli import main as cli_main
    from timg_tpu.ops import sixel_runs

    n_frames = 48
    y4m = tempfile.NamedTemporaryFile(suffix=".y4m", delete=False)
    try:
        y4m.write(("YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C420jpeg\n"
                   % (IN_W, IN_H)).encode())
        ybase = np.linspace(20, 235, IN_W, dtype=np.uint8)[None, :] \
            .repeat(IN_H, 0)
        u = np.full((IN_H // 2, IN_W // 2), 110, np.uint8).tobytes()
        v = np.full((IN_H // 2, IN_W // 2), 140, np.uint8).tobytes()
        for i in range(n_frames):
            y = ybase.copy()
            # moving flat "object" + a slow pan: real inter-frame change
            y0 = 100 + i * 8
            y[y0:y0 + 400, 300 + i * 12:900 + i * 12] = 40
            y4m.write(b"FRAME\n")
            y4m.write(y.tobytes())
            y4m.write(u)
            y4m.write(v)
        y4m.close()

        for k in sixel_runs.STATS:
            sixel_runs.STATS[k] = 0
        master, slave = pty_mod.openpty()
        fcntl.ioctl(slave, termios.TIOCSWINSZ,
                    struct.pack("HHHH", 48, 160, 1280, 768))

        def drain():
            try:
                while os.read(master, 4096):
                    pass
            except OSError:
                pass

        threading.Thread(target=drain, daemon=True).start()
        saved = os.dup(1)
        argv = ["--debug-no-frame-delay", "-g160x48", "-ps", "-b",
                "black", "--loops=1", "-o", os.devnull, y4m.name]
        try:
            os.dup2(slave, 1)
            cli_main(argv)              # warm: compile + caches
            t0 = time.perf_counter()
            rc = cli_main(argv)
            elapsed = time.perf_counter() - t0
        finally:
            os.dup2(saved, 1)
            os.close(saved)
            os.close(slave)
            os.close(master)
        if rc != 0:
            return {"error": f"cli rc={rc}"}
        s = sixel_runs.STATS
        frames = s["frames_runs"] + s["frames_plane"]
        return {
            "fps": round(n_frames / elapsed, 1),
            "transport_frames_runs": s["frames_runs"],
            "transport_frames_plane": s["frames_plane"],
            "d2h_bytes_per_frame": (round(s["bytes_shipped"] / frames)
                                    if frames else None),
            "plane_bytes_per_frame": (round(s["bytes_plane_equiv"]
                                            / frames) if frames else None),
            "d2h_reduction": (round(s["bytes_plane_equiv"]
                                    / max(s["bytes_shipped"], 1), 1)
                              if frames else None),
            "note": "full CLI video path incl. y4m decode, 1080p->-ps "
                    "libsixel default, transport=auto",
        }
    finally:
        os.unlink(y4m.name)


def main() -> None:
    import threading

    # Watchdog: a wedged device tunnel (observed in r5: dispatches
    # block forever with ~0 CPU) would otherwise hang the bench and
    # the round records nothing.  If the run hasn't finished within
    # the budget, emit the one-line JSON contract with value 0 and an
    # error field, then hard-exit -- an honest artifact beats a hang.
    _done = threading.Event()
    _budget = float(os.environ.get("TIMG_TPU_BENCH_WATCHDOG_S", "1500"))

    def _watchdog():
        if not _done.wait(_budget):
            print(json.dumps({
                "metric": "1080p_frames_per_sec_resize_dither_sixel",
                "value": 0.0,
                "unit": "frames/s/chip",
                "vs_baseline": 0.0,
                "error": "watchdog: no result after %.0fs -- device "
                         "tunnel unresponsive; see ROADMAP r5 tunnel "
                         "wedge note" % _budget}), flush=True)
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()

    import jax
    import jax.numpy as jnp
    import numpy as np

    # Persistent compile cache: the driver re-runs this in fresh
    # processes; kernel compiles through a dev tunnel can cost minutes.
    from timg_tpu.cli import _setup_compile_cache
    _setup_compile_cache()

    from timg_tpu.ops import resize as resize_op
    from timg_tpu.ops import sixel as sixel_op
    from timg_tpu.ops.sixel_pallas3 import (fs_dither_cube_fused,
                                            fs_dither_tree_fused)

    rng = np.random.default_rng(42)
    pool = rng.integers(0, 256, (POOL, BATCH, IN_H, IN_W, 4),
                        dtype=np.uint8)
    pool[..., 3] = 255
    # Stage as RGBA-packed i32 words: free host-side reinterpretation
    # (identical bytes over PCIe; the video source stages the same
    # way), where a device-side u8->i32 bitcast would be a full
    # relayout copy on TPU.
    pool = pool.view(np.int32).reshape(POOL, BATCH, IN_H, IN_W)

    pad_to = resize_op.padded_plane_dims(OUT_H, OUT_W)

    def pipeline_cube(batch):
        # steady-state video config: opaque lean resize (the reference's
        # video path is swscale bilinear; ours is MXU-matmul resampling
        # on planar bf16) + FS dither against the fixed 6x7x6 cube
        # palette (libsixel builtin-palette class) in the fused
        # all-Pallas pipeline; frames stay RGBA-packed i32 words
        # throughout -- no channel-minor layouts, and the 128-aligned
        # padded plane layout flows straight from the resize kernel to
        # the dither to the pitched host assembler (no pad/slice
        # copies).
        words = resize_op.resize_video_words(batch, OUT_H, OUT_W,
                                             pad_to=pad_to)
        return fs_dither_cube_fused(words, OUT_H, OUT_W, out_u8=True,
                                    out_padded=True)

    # Adaptive (median-cut tree) palette: built host-side per segment
    # like the CLI, reused across the window -- the CLI default path.
    sample = rng.integers(0, 256, (OUT_H, OUT_W, 3), dtype=np.uint8)
    _, levels_np, leaves_np = sixel_op.median_cut_tree(sample)
    levels = jnp.asarray(levels_np)
    leaves = jnp.asarray(leaves_np)

    def pipeline_tree(batch):
        words = resize_op.resize_video_words(batch, OUT_H, OUT_W,
                                             pad_to=pad_to)
        return fs_dither_tree_fused(words, levels, leaves, OUT_H, OUT_W,
                                    out_u8=True, out_padded=True)

    # libsixel mode (the CLI default): per-frame palette built host-side
    # (quant.c mediancut, ~2 ms/frame, parallel with decode in the CLI)
    # -> integer-FS bucket-table kernel.  The 32768-entry per-pixel
    # table gather costs ~6x the cube's arithmetic quantizer (gather-
    # bound; see ROADMAP "libsixel device mode"), so this mode has its
    # own number.
    from timg_tpu.native import runtime as _native_rt
    from timg_tpu.ops.sixel_pallas3 import (fs_dither_table_fused,
                                            pack_libsixel_tables)
    libsixel_fps = None
    _pal_res = _native_rt.libsixel_palette(sample)
    if _pal_res is not None:
        _pal, _diff = _pal_res
        _tbl = _native_rt.libsixel_build_table(_pal)
        _tw, _pw, _dw = pack_libsixel_tables(
            np.repeat(_tbl[None], BATCH, 0),
            [_pal] * BATCH, [_diff] * BATCH)
        _twd, _pwd, _dwd = (jnp.asarray(_tw), jnp.asarray(_pw),
                            jnp.asarray(_dw))

        def pipeline_libsixel(batch):
            words = resize_op.resize_video_words(batch, OUT_H, OUT_W,
                                                 pad_to=pad_to)
            return fs_dither_table_fused(words, _twd, _pwd, _dwd,
                                         OUT_H, OUT_W, out_u8=True,
                                         out_padded=True)

    pool_dev = [jax.device_put(pool[i]) for i in range(POOL)]

    fps, fps_spread, fps_band = _device_fps(jax, jnp, np, pipeline_cube,
                                            pool_dev)
    adaptive_fps, adaptive_spread, adaptive_band = _device_fps(
        jax, jnp, np, pipeline_tree, pool_dev)
    if _pal_res is not None:
        libsixel_fps, _, _ = _device_fps(jax, jnp, np, pipeline_libsixel,
                                         pool_dev)
    del pool_dev
    e2e_fps, legs, bottleneck = _bench_e2e(jax, np, resize_op,
                                           fs_dither_cube_fused)
    e2e_film = _bench_e2e_film(jax, np)

    print(json.dumps({
        "metric": "1080p_frames_per_sec_resize_dither_sixel",
        "value": round(fps, 1),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / TARGET_FPS, 3),
        "extra": {
            "headline_spread": fps_spread,
            "headline_band": fps_band,
            # the CLI-default mode is the primary pass/fail number
            # (VERDICT r4 #5): users get the adaptive median-cut path.
            "primary": "adaptive_fps",
            "adaptive_fps": round(adaptive_fps, 1),
            "adaptive_spread": adaptive_spread,
            "adaptive_band": adaptive_band,
            "adaptive_vs_baseline": round(adaptive_fps / TARGET_FPS, 3),
            "libsixel_fps": (round(libsixel_fps, 1)
                             if libsixel_fps is not None else None),
            "libsixel_vs_baseline": (round(libsixel_fps / TARGET_FPS, 3)
                                     if libsixel_fps is not None
                                     else None),
            "e2e_sustained_fps": (round(e2e_fps, 1)
                                  if e2e_fps is not None else None),
            "e2e_vs_baseline": (round(e2e_fps / TARGET_FPS, 3)
                                if e2e_fps is not None else None),
            "e2e_bottleneck": bottleneck,
            "e2e_legs": legs,
            "e2e_film": e2e_film,
        },
    }))
    _done.set()


if __name__ == "__main__":
    main()
