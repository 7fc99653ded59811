"""Randomized CLI robustness sweep: fixed-seed combinations over the
whole flag surface must never crash and must exit 0/1/2 (ref timg
exit-code contract, src/timg.cc:98-106)."""

from __future__ import annotations

import os
import random
import tempfile

import numpy as np
import pytest

FLAG_POOL = [
    ["-pq"], ["-ph"], ["-ps"], ["-pk"], ["-pi"], ["--color8"],
    ["-b", "red"], ["-b", "none"], ["-B", "#334455"],
    ["--pattern-size", "2"], ["--grid", "2x2"], ["--grid", "3"],
    ["--title"], ["--title=%b %wx%h"], ["-W"], ["--center"], ["-U"],
    ["--upscale=i"], ["--auto-crop"], ["--auto-crop=3"],
    ["--rotate", "exif"], ["--rotate", "off"], ["--frames", "2"],
    ["--frame-offset", "1"], ["--loops=2"], ["--compress=5"],
    ["--threads", "2"], ["--clear"], ["-F"], ["-E"], ["--fit-width"],
    ["--dither", "cube"], ["--dither", "libsixel"], ["--scroll"],
    ["--delta-move", "2:1"], ["-a"], ["-w", "0"],
]


@pytest.fixture(scope="module")
def media(tmp_path_factory):
    from PIL import Image

    tmp = tmp_path_factory.mktemp("fuzz")
    rng = np.random.default_rng(0)
    img1 = str(tmp / "a.png")
    Image.fromarray(rng.integers(0, 256, (40, 52, 4), dtype=np.uint8),
                    "RGBA").save(img1)
    gif = str(tmp / "c.gif")
    frames = [Image.fromarray(
        rng.integers(0, 256, (24, 32, 3), dtype=np.uint8), "RGB")
        for _ in range(3)]
    frames[0].save(gif, save_all=True, append_images=frames[1:],
                   duration=30, loop=0)
    txt = str(tmp / "d.txt")
    with open(txt, "w") as f:
        f.write("fuzz text\nsecond line\n")
    ico = str(tmp / "f.ico")
    Image.fromarray(rng.integers(0, 256, (48, 48, 3), dtype=np.uint8),
                    "RGB").save(ico, format="ICO",
                                sizes=[(16, 16), (32, 32), (48, 48)])
    y4m = str(tmp / "e.y4m")
    with open(y4m, "wb") as f:
        f.write(b"YUV4MPEG2 W32 H24 F25:1 Ip A1:1 C420jpeg\n")
        for i in range(2):
            f.write(b"FRAME\n")
            f.write(rng.integers(0, 256, (24, 32), dtype=np.uint8).tobytes())
            f.write(rng.integers(0, 256, (12, 16), dtype=np.uint8).tobytes())
            f.write(rng.integers(0, 256, (12, 16), dtype=np.uint8).tobytes())
    return [img1, gif, txt, y4m, ico]


def test_cli_flag_combination_sweep(media, tmp_path):
    from timg_tpu.cli import main

    random.seed(11)
    out = str(tmp_path / "o.bin")
    for i in range(20):
        # -t bounds runaway animations (single GIFs loop forever by
        # design, ref timg.cc:896-900); debug mode makes it virtual.
        flags = ["-g", random.choice(["20x10", "40x20", "7x5"]),
                 "--debug-no-frame-delay", "-t", "1"]
        for f in random.sample(FLAG_POOL, random.randint(1, 5)):
            flags += f
        files = random.sample(media, random.randint(1, 2))
        argv = flags + ["-o", out] + files
        try:
            rc = main(argv)
        except SystemExit as e:
            rc = e.code
        assert rc in (0, 1, 2), (argv, rc)
