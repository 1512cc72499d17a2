"""Synthetic test images.

The reference downloads its classic test image over HTTP
(reference: test/utilstest.py); this environment has no network, so parity
tests run on reproducible synthetic scenes with rich multi-scale structure
(Gaussian blobs over smoothed noise) that produce stable SIFT keypoints.
"""

from __future__ import annotations

import numpy as np


def synthetic_scene(shape=(512, 512), n_blobs: int = 60, seed: int = 0) -> np.ndarray:
    """Smoothed-noise background + Gaussian blobs at a range of scales."""
    rng = np.random.default_rng(seed)
    h, w = shape
    # low-frequency background: upsampled coarse noise
    coarse = rng.normal(size=(h // 16 + 2, w // 16 + 2))
    ys = np.linspace(0, coarse.shape[0] - 1.001, h)
    xs = np.linspace(0, coarse.shape[1] - 1.001, w)
    y0 = ys.astype(int)
    x0 = xs.astype(int)
    fy = (ys - y0)[:, None]
    fx = (xs - x0)[None, :]
    bg = (
        coarse[np.ix_(y0, x0)] * (1 - fy) * (1 - fx)
        + coarse[np.ix_(y0 + 1, x0)] * fy * (1 - fx)
        + coarse[np.ix_(y0, x0 + 1)] * (1 - fy) * fx
        + coarse[np.ix_(y0 + 1, x0 + 1)] * fy * fx
    )
    img = 30.0 * bg
    rr, cc = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    for _ in range(n_blobs):
        cy, cx = rng.uniform(0.1, 0.9) * h, rng.uniform(0.1, 0.9) * w
        sig = rng.uniform(2.0, 14.0)
        amp = rng.uniform(60.0, 160.0) * rng.choice([-1.0, 1.0])
        img = img + amp * np.exp(-((rr - cy) ** 2 + (cc - cx) ** 2) / (2 * sig**2))
    img -= img.min()
    img *= 255.0 / max(img.max(), 1e-9)
    return img.astype(np.float32)


def transformed_pair(shape=(256, 256), seed: int = 1, dx: float = 7.0, dy: float = -4.0):
    """A scene and its translated copy (for matching / alignment tests)."""
    h, w = shape
    big = synthetic_scene((h + 64, w + 64), seed=seed)
    y0, x0 = 32, 32
    a = big[y0 : y0 + h, x0 : x0 + w]
    b = big[int(y0 + dy) : int(y0 + dy) + h, int(x0 + dx) : int(x0 + dx) + w]
    return a.copy(), b.copy()
