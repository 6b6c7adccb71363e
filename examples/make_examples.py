#!/usr/bin/env python3
"""Generate synthetic example images (no external assets needed).

The reference ships camera photos (examples/test_images); this repo keeps
binary assets out of git and generates deterministic scenes instead.
"""

import os

import numpy as np


def make_scene(w=768, h=576, seed=0):
    rng = np.random.default_rng(seed)
    img = np.full((h, w, 3), 180, np.uint8)
    # sky/ground gradient
    for y in range(h):
        img[y, :, 2] = np.uint8(200 - 80 * y / h)
        img[y, :, 0] = np.uint8(120 + 60 * y / h)
    # random colored rectangles + ellipses ("objects")
    for _ in range(6):
        x0, y0 = rng.integers(0, w - 120), rng.integers(0, h - 120)
        bw, bh = rng.integers(60, 200), rng.integers(60, 160)
        color = rng.integers(30, 255, 3)
        img[y0:y0 + bh, x0:x0 + bw] = color
    yy, xx = np.mgrid[0:h, 0:w]
    for _ in range(3):
        cx, cy = rng.integers(100, w - 100), rng.integers(100, h - 100)
        r = rng.integers(30, 90)
        mask = (xx - cx) ** 2 + (yy - cy) ** 2 < r ** 2
        img[mask] = rng.integers(30, 255, 3)
    return img


def main():
    from PIL import Image
    here = os.path.dirname(os.path.abspath(__file__))
    for i in range(3):
        Image.fromarray(make_scene(seed=i)).save(
            os.path.join(here, f"scene{i}.png"))
    # a small one for fast tests
    Image.fromarray(make_scene(w=216, h=216, seed=7)).save(
        os.path.join(here, "small.png"))
    # the canonical checked-in demo input (the repo's "dog.jpg"): lossless
    # PNG so quantized inference is reproducible bit-for-bit everywhere
    Image.fromarray(make_scene(w=768, h=576, seed=42)).save(
        os.path.join(here, "demo.png"))
    print("examples written")


if __name__ == "__main__":
    main()
