#!/usr/bin/env python3
"""Embedding timg-tpu as a library: render frames to terminal protocol
byte streams without the CLI.

Run: python examples/api_demo.py  (writes escape streams to stdout
counts; pipe a stream to a compatible terminal to display it.)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    from timg_tpu.models import get

    rng = np.random.default_rng(0)
    # four 200x320 RGBA frames (e.g. decoded video window)
    frames = rng.integers(0, 256, (4, 200, 320, 4), dtype=np.uint8)
    frames[..., 3] = 255

    # quarter-block ANSI at an 80x24-cell terminal
    quarter = get("quarter")(out_h=48, out_w=160)
    streams = quarter.render_batch(frames)
    print(f"quarter: {len(streams)} frames, "
          f"{sum(map(len, streams))} bytes total")

    # sixel with the fixed cube palette (fast video path)
    sixel = get("sixel")(out_h=48, out_w=160, dither="cube")
    streams = sixel.render_batch(frames)
    print(f"sixel  : {len(streams)} frames, "
          f"{sum(map(len, streams))} bytes total")

    # kitty graphics (PNG + base64 chunks)
    kitty = get("kitty")(out_h=48, out_w=160)
    streams = kitty.render_batch(frames)
    print(f"kitty  : {len(streams)} frames, "
          f"{sum(map(len, streams))} bytes total")


if __name__ == "__main__":
    main()
