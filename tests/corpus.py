"""Deterministic golden-test image corpus."""

from __future__ import annotations

import os

import numpy as np
from PIL import Image


def build_corpus(directory: str) -> dict:
    """Create deterministic test images; returns name -> path."""
    os.makedirs(directory, exist_ok=True)
    rng = np.random.default_rng(1234)
    out = {}

    def save(name: str, arr: np.ndarray, mode="RGB", fmt="PNG"):
        path = os.path.join(directory, name)
        if not os.path.exists(path):
            Image.fromarray(arr, mode).save(path, format=fmt)
        out[name] = path

    # Small RGB noise (smaller than typical canvas; exercises quarter 2x).
    save("noise_64x48.png", rng.integers(0, 256, (48, 64, 3), dtype=np.uint8))
    # Odd dimensions (odd-height empty-line shift).
    save("noise_33x27.png", rng.integers(0, 256, (27, 33, 3), dtype=np.uint8))
    # Larger than canvas: Mitchell downscale.
    save("noise_512x512.png", rng.integers(0, 256, (512, 512, 3), dtype=np.uint8))
    # Gradient (smooth colors: exercises color elision runs).
    y, x = np.mgrid[0:200, 0:320]
    grad = np.stack([(x * 255 // 320), (y * 255 // 200),
                     ((x + y) * 255 // 520)], axis=-1).astype(np.uint8)
    save("gradient_320x200.png", grad)
    # Alpha gradient + checkerboard-ish alpha pattern.
    h, w = 100, 80
    y, x = np.mgrid[0:h, 0:w]
    rgba = np.stack([
        (x * 255 // w), (y * 255 // h), ((x + y) * 255 // (w + h)),
        np.where((x // 8 + y // 8) % 2 == 0, 255, 96),
    ], axis=-1).astype(np.uint8)
    save("alpha_80x100.png", rgba, mode="RGBA")
    # Fully transparent region.
    rgba2 = rng.integers(0, 256, (40, 60, 4), dtype=np.uint8)
    rgba2[:10, :, 3] = 0
    rgba2[10:, :, 3] = 255
    save("alpha_band_60x40.png", rgba2, mode="RGBA")
    # Tiny image (upscale cases).
    save("tiny_8x6.png", rng.integers(0, 256, (6, 8, 3), dtype=np.uint8))
    # Flat color with colored border (auto-crop).
    bordered = np.full((60, 90, 3), 200, dtype=np.uint8)
    bordered[20:40, 30:60] = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
    save("bordered_90x60.png", bordered)
    # Grayscale png.
    save("gray_50x40.png",
         rng.integers(0, 256, (40, 50), dtype=np.uint8), mode="L")
    # 16-bit grayscale png (stb reduces to the high byte; PIL's naive
    # convert() clips -- regression corpus for the _to_rgba path).
    p16 = os.path.join(directory, "gray16_48x32.png")
    if not os.path.exists(p16):
        g16 = rng.integers(0, 65536, (32, 48)).astype(np.uint16)
        Image.frombytes("I;16", (48, 32), g16.tobytes()).save(p16)
    out["gray16_48x32.png"] = p16
    # 32-bit BMP with a real alpha plane (stb reads the 4th byte as
    # alpha; PIL's default raw mode drops it -- regression corpus).
    pbmp = os.path.join(directory, "alpha_40x30.bmp")
    if not os.path.exists(pbmp):
        rgba = np.dstack([
            rng.integers(0, 256, (30, 40, 3), dtype=np.uint8),
            rng.integers(0, 256, (30, 40), dtype=np.uint8)])
        Image.fromarray(rgba, "RGBA").save(pbmp)
    out["alpha_40x30.bmp"] = pbmp
    # Animated GIF, 4 frames.
    gif_path = os.path.join(directory, "anim_32x24.gif")
    if not os.path.exists(gif_path):
        frames = []
        base = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
        for i in range(4):
            f = base.copy()
            f[:, : 8 * (i + 1)] = (255 - i * 60, i * 60, 128)
            frames.append(Image.fromarray(f))
        frames[0].save(gif_path, save_all=True, append_images=frames[1:],
                       duration=100, loop=0)
    out["anim_32x24.gif"] = gif_path
    return out
