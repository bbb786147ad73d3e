"""Pixel-array transforms (pure numpy, no Spark, no codec libraries).

Operates on the (h, w, c) uint8 arrays produced by `kernels.png.decode_png`;
used by `operators.multimodal.resize_images` to give the multimodal column
a real decode → transform → re-encode path in this container.
"""
from __future__ import annotations

import numpy as np


def resize_nearest(img: np.ndarray, height: int, width: int) -> np.ndarray:
    """(h, w, c) → (height, width, c) by nearest-neighbor sampling."""
    h, w = img.shape[:2]
    rows = np.minimum((np.arange(height) + 0.5) * h / height, h - 1).astype(np.int64)
    cols = np.minimum((np.arange(width) + 0.5) * w / width, w - 1).astype(np.int64)
    return img[rows][:, cols]


def resize_bilinear(img: np.ndarray, height: int, width: int) -> np.ndarray:
    """(h, w, c) uint8 → (height, width, c) uint8 by bilinear interpolation
    with half-pixel centers (align_corners=False convention), fully
    vectorized: two gathers + two lerps."""
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        return np.zeros((height, width) + img.shape[2:], dtype=img.dtype)
    src = img.astype(np.float64)
    ys = np.clip((np.arange(height) + 0.5) * h / height - 0.5, 0, h - 1)
    xs = np.clip((np.arange(width) + 0.5) * w / width - 0.5, 0, w - 1)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    top = src[y0][:, x0] * (1 - wx) + src[y0][:, x1] * wx
    bot = src[y1][:, x0] * (1 - wx) + src[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.rint(out), 0, 255).astype(img.dtype)
