"""Kitty/iTerm2 (PNG) encode-leg benchmark — the host-bound path.

The kitty and iTerm2 canvases are PNG-over-escape protocols (ref
kitty-canvas.cc:178-235, iterm2-canvas.cc:55-77): every frame is
Sub-filtered, deflate-compressed (libdeflate level 1 by default, ref
display-options.h:52), base64'd and framed.  Unlike the sixel/block
paths there is no device leg to accelerate — the byte format *is* the
cost — so this path is host-CPU-bound in our build exactly as in the
reference (same libdeflate, same level, byte-identical stream, proven
by the iTerm2 golden parity suite).

This script quantifies the per-leg split so the bottleneck claim is
measured, not asserted: sub-filter (C fast path), deflate, base64,
kitty chunk framing.  Prints one JSON line.

Run: python scripts/bench_kitty.py [--frames N]
"""

from __future__ import annotations

import argparse
import base64
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from timg_tpu.render.png import encode_png, sub_filter_rows, _zlib_compress


def synth_frame(h: int, w: int, seed: int) -> np.ndarray:
    """Photo-like content: smooth gradients + band-limited noise.
    Compression cost depends on entropy, so all-zero frames would
    flatter the deflate leg by ~4x."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (np.sin(xx / 37.0) * 60 + np.cos(yy / 53.0) * 60 + 128)
    noise = rng.normal(0, 14, (h // 8 + 1, w // 8 + 1))
    noise = np.kron(noise, np.ones((8, 8)))[:h, :w]
    frame = np.stack([
        np.clip(base + noise, 0, 255),
        np.clip(base * 0.8 + noise + 20, 0, 255),
        np.clip(255 - base + noise, 0, 255),
        np.full((h, w), 255.0),
    ], axis=-1).astype(np.uint8)
    return frame


def bench_leg(fn, frames, reps: int) -> float:
    # warmup
    fn(frames[0])
    t0 = time.perf_counter()
    n = 0
    for _ in range(reps):
        for f in frames:
            fn(f)
            n += 1
    return (time.perf_counter() - t0) / n


def kitty_chunks(b64: bytes) -> bytes:
    out = bytearray()
    chunk = 4096
    for i in range(0, len(b64), chunk):
        more = 1 if i + chunk < len(b64) else 0
        out += b"\033_Ga=T,q=2,f=100,m=%d;" % more + b64[i:i + chunk] \
            + b"\033\\"
    return bytes(out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    results = {}
    for label, (h, w) in {"720p": (720, 1280), "1080p": (1080, 1920)}.items():
        frames = [synth_frame(h, w, s) for s in range(args.frames)]
        filtered = [sub_filter_rows(f, with_alpha=True) for f in frames]
        deflated = [_zlib_compress(d, 1) for d in filtered]
        b64s = [base64.b64encode(d) for d in deflated]

        t_filter = bench_leg(lambda f: sub_filter_rows(f, with_alpha=True),
                             frames, args.reps)
        t_deflate = bench_leg(lambda d: _zlib_compress(d, 1),
                              filtered, args.reps)
        t_b64 = bench_leg(base64.b64encode, deflated, args.reps)
        t_chunks = bench_leg(kitty_chunks, b64s, args.reps)
        t_full = bench_leg(
            lambda f: kitty_chunks(base64.b64encode(
                encode_png(f, 1, with_alpha=True))),
            frames, max(1, args.reps // 2))

        ratio = sum(len(d) for d in deflated) / sum(len(f) for f in filtered)
        results[label] = {
            "sub_filter_ms": round(t_filter * 1e3, 2),
            "deflate_ms": round(t_deflate * 1e3, 2),
            "base64_ms": round(t_b64 * 1e3, 2),
            "chunk_frame_ms": round(t_chunks * 1e3, 2),
            "full_encode_ms": round(t_full * 1e3, 2),
            "full_encode_fps": round(1.0 / t_full, 1),
            "deflate_ratio": round(ratio, 3),
            "deflate_share": round(t_deflate / t_full, 3),
        }

    import os
    print(json.dumps({
        "metric": "kitty_png_encode_legs",
        "host_cpus": os.cpu_count(),
        "compression_level": 1,
        **results,
    }))


if __name__ == "__main__":
    main()
