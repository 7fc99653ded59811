#!/usr/bin/env python3
"""One-shot CLI latency vs the reference (BASELINE.md configs #1-#5).

SURVEY §7 warns batch wins must not regress `timg one-image.jpg`; the
reference's measured one-shot wall-clock for 512x512 PNG -> quarter
blocks at 80x24 cells is 9.5 ms (BASELINE.md, process startup
included).  This measures our CLI the same way — full subprocess
wall-clock, N runs — on:

* the numpy-mirror path (TIMG_TPU_FORCE_NUMPY=1): the honest
  interactive one-shot configuration;
* the TPU path with a warmed persistent compile cache (one discarded
  warmup run compiles/caches; the timed runs still pay jax import +
  dispatch);
* the reference binary, re-measured on the same machine for a
  same-day comparison.

The harness is tiered (VERDICT r4 #3: the monolithic run exceeded 10
minutes through the device tunnel and lost all progress on kill):

* ``--tier=host``   — every row that stays on the host CPU (the C
  launcher, python fastpath, reference binary, 4K stills, grids,
  animations, served host path).  Minutes of wall.
* ``--tier=device`` — the tunnel-bound rows (TPU warm-cache one-shot,
  1080p60 sustained video, served device still).  Each subprocess pays
  jax import + device attach (~10 s) through the dev tunnel.
* ``--tier=all``    — both (default).

Rows are emitted incrementally: after every completed row the full
JSON-so-far is rewritten to ``--out PATH`` (and a progress line goes
to stderr), so a killed run still leaves a usable artifact.

Record the round artifact with e.g.::

    python scripts/latency_check.py --tier=all --out LATENCY_r05.json
"""

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REF = os.path.join(REPO, ".refbuild", "src", "timg")
RUNS = 12

_T0 = time.time()


def measure(cmd, env, warmup=1, runs=RUNS):
    import shlex
    print(f"[lat {time.time() - _T0:7.1f}s] measuring: "
          + " ".join(shlex.quote(c) for c in cmd[:4]), file=sys.stderr,
          flush=True)
    try:
        for _ in range(warmup):
            subprocess.run(cmd, env=env, capture_output=True, timeout=600)
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            r = subprocess.run(cmd, env=env, capture_output=True,
                               timeout=600)
            times.append((time.perf_counter() - t0) * 1e3)
            if r.returncode != 0:
                return None, r.stderr.decode()[-300:]
    except subprocess.TimeoutExpired:
        # A wedged device tunnel manifests here; the caller records an
        # error row and the harness moves on to the next row.
        return None, "timeout: no completion within 600 s"
    return times, ""


class Emitter:
    """Accumulates rows; rewrites the artifact after every one.

    An existing artifact at ``out_path`` is loaded and updated in
    place, so ``--tier=host`` and a later ``--tier=device`` run compose
    into one file (each tier refreshes only its own rows).
    """

    def __init__(self, out_path):
        self.out = {}
        self.path = out_path
        if out_path and os.path.exists(out_path):
            try:
                with open(out_path) as f:
                    self.out = json.load(f)
            except Exception:
                self.out = {}

    def __setitem__(self, key, value):
        self.out[key] = value
        print(f"[lat {time.time() - _T0:7.1f}s] row {key}: "
              + json.dumps(value)[:120], file=sys.stderr, flush=True)
        if self.path:
            tmp = self.path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(self.out, f, indent=1)
                f.write("\n")
            os.replace(tmp, self.path)

    def med_row(self, key, times):
        self[key] = {"median": round(statistics.median(times), 1),
                     "min": round(min(times), 1)}


def _media_dir():
    gdir = os.path.join(tempfile.gettempdir(), "timg_tpu_lat_media")
    os.makedirs(gdir, exist_ok=True)
    return gdir


def _anim_gif():
    import numpy as np
    from PIL import Image
    gif = os.path.join(_media_dir(), "anim4.gif")
    if not os.path.exists(gif):
        rng = np.random.default_rng(11)
        frames = [Image.fromarray(rng.integers(0, 256, (24, 32, 3),
                                               dtype=np.uint8), "RGB")
                  for _ in range(4)]
        frames[0].save(gif, save_all=True, append_images=frames[1:],
                       duration=30, loop=0)
    return gif


def host_tier(out, args, img, base_env, native):
    # Python interpreter startup in this environment (sitecustomize
    # preimports jax + registers the PJRT plugin in *every* process):
    # pure environment overhead the C++ reference does not pay, reported
    # separately so the framework cost is comparable.
    times, _ = measure([sys.executable, "-c", ""], base_env)
    if times:
        out["python_startup_overhead_ms"] = round(
            statistics.median(times), 1)

    # In-process latency: main() on a warm interpreter -- the
    # framework's own decode+resize+argmin+emit cost (numpy path).
    os.environ["TIMG_TPU_FORCE_NUMPY"] = "1"
    from timg_tpu.cli import main as cli_main
    cli_main(args)  # warm imports
    inproc = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        cli_main(args)
        inproc.append((time.perf_counter() - t0) * 1e3)
    del os.environ["TIMG_TPU_FORCE_NUMPY"]
    out.med_row("inprocess_numpy_ms", inproc)

    # The shipped one-shot path: ./timg-tpu-fast is pure C (argument
    # parse, tty queries, PNG decode, resize, blocks, emit -- zero
    # python on the happy path; timg_fast_main.cc).  THE number to
    # compare against the reference binary's 9.5 ms.
    if os.path.exists(native):
        times, err = measure([native, *args], base_env)
        if times:
            out.med_row("native_launcher_ms", times)
        else:
            out["native_launcher_error"] = err

    # The python launcher (./timg-tpu boots `python -S`, renders through
    # the native still pipeline via ctypes): the fallback one-shot cost.
    times, err = measure([os.path.join(REPO, "timg-tpu"), *args], base_env)
    if times:
        out.med_row("fastpath_ms", times)
    else:
        out["fastpath_error"] = err

    env = dict(base_env, TIMG_TPU_FORCE_NUMPY="1")
    times, err = measure([os.path.join(REPO, "timg-tpu"), *args], env)
    if times:
        out.med_row("numpy_path_ms", times)
    else:
        out["numpy_path_error"] = err

    if os.path.exists(REF):
        times, err = measure([REF, *args], base_env)
        if times:
            out.med_row("reference_remeasured_ms", times)

    # Pixel-direct one-shots (all three run the native fastpath since
    # round 3: iTerm2/kitty emit C-sub-filtered PNG, sixel runs the
    # reference-exact libsixel quant.c + C RLE assembly).
    for mode in ("sixel", "kitty", "iterm2"):
        margs = [f"-p{mode[0]}", "-g80x24", "--debug-no-frame-delay",
                 "-b", "black", "-o", "/dev/null", img]
        if os.path.exists(native):
            times, _ = measure([native, *margs], base_env)
            if times:
                out.med_row(f"native_{mode}_ms", times)
        times, err = measure([os.path.join(REPO, "timg-tpu"), *margs],
                             base_env)
        if times:
            out.med_row(f"fastpath_{mode}_ms", times)
        if os.path.exists(REF):
            times, _ = measure([REF, *margs], base_env)
            if times:
                out.med_row(f"reference_{mode}_ms", times)

    # BASELINE config #2: 4x2 grid of 640x480 JPEGs with titles (-ph),
    # and config #4: animated 4-frame GIF x3 loops -- both render
    # natively in the C launcher since round 3.
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(11)
    gdir = _media_dir()
    jpgs = []
    for i in range(8):
        p = os.path.join(gdir, f"g{i}.jpg")
        if not os.path.exists(p):
            Image.fromarray(rng.integers(0, 256, (480, 640, 3),
                                         dtype=np.uint8),
                            "RGB").save(p, quality=80)
        jpgs.append(p)
    gif = _anim_gif()
    grid_args = ["-ph", "--grid=4x2", "--title", "-g160x48", "-b",
                 "black", "--debug-no-frame-delay", "-o", "/dev/null",
                 *jpgs]
    anim_args = ["-pq", "--loops=3", "-g80x24", "-b", "black",
                 "--debug-no-frame-delay", "-o", "/dev/null", gif]
    for key, cfg_args in (("grid_4x2_jpeg", grid_args),
                          ("anim_gif_x3_pq", anim_args)):
        if os.path.exists(native):
            times, _ = measure([native, *cfg_args], base_env)
            if times:
                out.med_row(f"native_{key}_ms", times)
        if os.path.exists(REF):
            times, _ = measure([REF, *cfg_args], base_env)
            if times:
                out.med_row(f"reference_{key}_ms", times)

    # BASELINE config #3: 4K still, all five modes (VERDICT r3 #9 —
    # the reference anchor is 4K -> -pq 160x48 = 191.5 ms; the minimal
    # reference build lacks libsixel so its -ps/-pk/-pi rows are the
    # anchor only where honest).
    p4k = os.path.join(gdir, "photo4k.png")
    if not os.path.exists(p4k):
        rng = np.random.default_rng(3)
        w4, h4 = 3840, 2160
        im = np.empty((h4, w4, 3), np.uint8)
        im[..., 0] = np.linspace(0, 255, w4, dtype=np.uint8)[None]
        im[..., 1] = np.linspace(0, 255, h4, dtype=np.uint8)[:, None]
        im[..., 2] = 96
        im[400:1000, 800:3000] += rng.integers(
            0, 40, (600, 2200, 3), dtype=np.uint8)
        Image.fromarray(im, "RGB").save(p4k, compress_level=1)
    for mode in ("q", "h", "s", "k", "i"):
        margs = [f"-p{mode}", "-g160x48", "--debug-no-frame-delay",
                 "-b", "black", "-o", "/dev/null", p4k]
        if os.path.exists(native):
            times, _ = measure([native, *margs], base_env, runs=6)
            if times:
                out.med_row(f"native_4k_p{mode}_ms", times)
        if os.path.exists(REF):
            times, _ = measure([REF, *margs], base_env, runs=6)
            if times:
                out.med_row(f"reference_4k_p{mode}_ms", times)
                if mode == "s":
                    row = dict(out.out[f"reference_4k_p{mode}_ms"])
                    row["note"] = ("minimal reference build lacks "
                                   "libsixel: it warns on -ps and "
                                   "renders its default block mode -- "
                                   "not a sixel anchor")
                    out[f"reference_4k_p{mode}_ms"] = row

    # Serve mode, host path (VERDICT r3 #6): one-shot latency against a
    # resident --serve process — the former python-boot fallback case
    # (GIF animation forced off the C launcher's native envelope via
    # --frames).
    if os.path.exists(native):
        with _serve_session(base_env) as (sock, senv):
            if sock:
                sargs = ["-pq", "--loops=1", "--frames", "3", "-g80x24",
                         "-b", "black", "--debug-no-frame-delay", "-o",
                         "/dev/null", gif]
                times, _ = measure([native, *sargs], senv, warmup=2)
                if times:
                    out.med_row("serve_hostpath_anim_ms", times)
            else:
                out["serve_error"] = "serve socket never appeared"


class _serve_session:
    """Boots a resident --serve process; yields (socket, env)."""

    def __init__(self, base_env):
        self.base_env = base_env
        self.proc = None

    def __enter__(self):
        sock = os.path.join(tempfile.mkdtemp(prefix="timg_lat_srv"),
                            "s.sock")
        senv = dict(self.base_env, TIMG_TPU_SERVE_SOCKET=sock)
        self.proc = subprocess.Popen([os.path.join(REPO, "timg-tpu"),
                                      "--serve"], env=senv,
                                     stdout=subprocess.DEVNULL,
                                     stderr=subprocess.DEVNULL)
        deadline = time.time() + 120
        while not os.path.exists(sock) and time.time() < deadline \
                and self.proc.poll() is None:
            time.sleep(0.1)
        return (sock if os.path.exists(sock) else None), senv

    def __exit__(self, *exc):
        if self.proc:
            self.proc.terminate()
            try:
                self.proc.wait(timeout=10)
            except Exception:
                self.proc.kill()
        return False


def device_tier(out, args, base_env, native):
    # Disable the wedge liveness probe for every row of this tier: a
    # degraded tunnel would otherwise silently reroute the sustained
    # rows to host mirrors and record a host number under a device
    # label.  With the probe off a wedge surfaces as measure()'s 600 s
    # subprocess timeout -> an explicit *_error row (rows emit
    # incrementally, so completed rows survive).
    base_env = dict(base_env, TIMG_TPU_DEVICE_PROBE_TIMEOUT_S="0")
    # 5 runs, not 12: each TPU subprocess pays the full jax import +
    # device attach through the dev tunnel (~10 s), and the median
    # stabilizes well before 12 samples.
    tpu_env = dict(base_env, TIMG_TPU_FORCE_DEVICE="1")
    times, err = measure([os.path.join(REPO, "timg-tpu"), *args], tpu_env,
                         warmup=2, runs=5)
    if times:
        out.med_row("tpu_warm_cache_ms", times)
    else:
        out["tpu_path_error"] = err

    # BASELINE config #5 anchor: sustained 1080p60 block-mode loop
    # (the minimal reference build lacks libav, so this row is
    # ours-only: frames/s through the full CLI incl. y4m decode).
    import numpy as np
    y4m = os.path.join(_media_dir(), "v1080p60.y4m")
    n_frames = 60
    if not os.path.exists(y4m):
        w9, h9 = 1920, 1080
        ybase = np.linspace(20, 235, w9, dtype=np.uint8)[None] \
            .repeat(h9, 0)
        u = np.full((h9 // 2, w9 // 2), 112, np.uint8).tobytes()
        v = np.full((h9 // 2, w9 // 2), 140, np.uint8).tobytes()
        with open(y4m, "wb") as f:
            f.write(("YUV4MPEG2 W%d H%d F60:1 Ip A1:1 C420jpeg\n"
                     % (w9, h9)).encode())
            for i in range(n_frames):
                yy = ybase.copy()
                yy[100 + i * 8:400 + i * 8, 200 + i * 10:900 + i * 10] = 50
                f.write(b"FRAME\n")
                f.write(yy.tobytes())
                f.write(u)
                f.write(v)
    vargs = ["-pq", "-g160x48", "--debug-no-frame-delay", "-b",
             "black", "--loops=1", "-o", "/dev/null", y4m]
    times, err = measure([os.path.join(REPO, "timg-tpu"), *vargs],
                         base_env, warmup=1, runs=3)
    if times:
        med = statistics.median(times)
        out["video_1080p60_pq_sustained"] = {
            "wall_ms_median": round(med, 1),
            "frames": n_frames,
            "fps": round(n_frames / (med / 1e3), 1),
            "note": "full CLI incl. y4m decode + process startup; "
                    "minimal reference build lacks libav (anchor: "
                    "config #3 per-frame cost)"}
    else:
        out["video_1080p60_error"] = err

    # Serve mode, device path: a resident session keeps the compiled
    # TPU executables warm across one-shot invocations.
    if os.path.exists(native):
        with _serve_session(base_env) as (sock, senv):
            if sock:
                dev_env = dict(senv, TIMG_TPU_FORCE_DEVICE="1")
                times, _ = measure([native, *args], dev_env, warmup=2,
                                   runs=6)
                if times:
                    out["serve_device_still_ms"] = {
                        "median": round(statistics.median(times), 1),
                        "min": round(min(times), 1),
                        "note": "bounded by per-dispatch tunnel RTT on "
                                "this host; cold equivalent is "
                                "tpu_warm_cache_ms"}
            else:
                out["serve_device_error"] = "serve socket never appeared"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", choices=("host", "device", "all"),
                    default="all")
    ap.add_argument("--out", default=None,
                    help="artifact path, rewritten after every row")
    ns = ap.parse_args()

    from tests.corpus import build_corpus

    corpus = build_corpus(os.path.join(tempfile.gettempdir(),
                                       "timg_tpu_corpus"))
    img = corpus["noise_512x512.png"]
    args = ["-pq", "-g80x24", "--debug-no-frame-delay", "-b", "black",
            "-o", "/dev/null", img]
    base_env = {k: v for k, v in os.environ.items()
                if not k.startswith("TIMG_")}

    out = Emitter(ns.out)
    out["config"] = "512x512 PNG -> -pq 80x24 (BASELINE.md #1)"
    out["runs"] = RUNS
    out["reference_baseline_ms"] = 9.5
    prev_tier = out.out.get("tier")
    out["tier"] = (ns.tier if prev_tier in (None, ns.tier) else "all")

    native = os.path.join(REPO, "timg-tpu-fast")
    if not os.path.exists(native):
        subprocess.run(["make", "-C",
                        os.path.join(REPO, "timg_tpu", "native"), "-s",
                        "fast"], capture_output=True, timeout=300)

    if ns.tier in ("host", "all"):
        host_tier(out, args, img, base_env, native)
    if ns.tier in ("device", "all"):
        device_tier(out, args, base_env, native)

    print(json.dumps(out.out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
