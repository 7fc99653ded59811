#!/usr/bin/env python3
"""On-TPU parity check: runs golden configs with the *device* ops (not
the CPU numpy mirrors) and byte-compares against the reference binary.

The regular test suite runs on the CPU backend where strict numpy
mirrors guarantee parity; this script validates that the jitted TPU
path produces the same escape bytes (the TPU backend does not contract
FMAs, so it should).

Usage: python scripts/tpu_parity_check.py   (needs the TPU visible)
"""

import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".refbuild", "src", "timg")

CASES = [
    ["-g40x20", "-pq", "-b", "black"],
    ["-g40x20", "-ph", "-b", "black"],
    ["-g30x15", "-pq", "-b", "#336699"],
    ["-g40x20", "-pq", "--color8", "-b", "black"],
    ["-g40x20", "-pi"],
]


def main() -> int:
    import jax

    backend = jax.default_backend()
    print(f"backend: {backend}")
    if backend == "cpu":
        print("warning: running on CPU; this validates the mirrors, "
              "not the device path")

    from tests.corpus import build_corpus

    corpus = build_corpus(os.path.join(tempfile.gettempdir(),
                                       "timg_tpu_corpus"))
    images = ["noise_64x48.png", "noise_512x512.png", "gradient_320x200.png",
              "alpha_80x100.png"]
    env = {k: v for k, v in os.environ.items() if not k.startswith("TIMG_")}

    # the point of this check is the DEVICE path: disable the one-shot
    # host-routing heuristic (ops/backend.py prefer_host)
    os.environ["TIMG_TPU_FORCE_DEVICE"] = "1"

    from timg_tpu.cli import main as cli_main

    failures = 0
    for case in CASES:
        for image in images:
            path = corpus[image]
            with tempfile.NamedTemporaryFile(suffix=".ref") as rf, \
                    tempfile.NamedTemporaryFile(suffix=".our") as of:
                subprocess.run(
                    [REF, "--debug-no-frame-delay", *case, "-o", rf.name,
                     path], env=env, capture_output=True, timeout=120)
                cli_main(["--debug-no-frame-delay", *case, "-o", of.name,
                          path])
                ref = open(rf.name, "rb").read()
                ours = open(of.name, "rb").read()
            tag = f"{' '.join(case)} {image}"
            if ref == ours:
                print(f"  OK  {tag}")
            else:
                n = next((i for i, (a, b) in enumerate(zip(ref, ours))
                          if a != b), min(len(ref), len(ours)))
                print(f"FAIL  {tag}: diff at byte {n} "
                      f"({len(ref)}B vs {len(ours)}B)")
                failures += 1
    print("PARITY OK" if failures == 0 else f"{failures} FAILURES")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
