"""Bilinear affine warp (reference: openCL/transform.cl::transform).

XLA gather-based inverse warp: out[r,c] = img[M @ (r,c) + offset] with
bilinear interpolation and a fill value outside the source image — the
vmapped `map_coordinates` equivalent noted in SURVEY.md §2.2.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def affine_warp_jax(
    img: jnp.ndarray, matrix: jnp.ndarray, offset: jnp.ndarray, fill: float = 0.0
) -> jnp.ndarray:
    H, W = img.shape
    rr = jnp.arange(H, dtype=jnp.float32)[:, None]
    cc = jnp.arange(W, dtype=jnp.float32)[None, :]
    m = matrix.astype(jnp.float32)
    off = offset.astype(jnp.float32)
    sr = m[0, 0] * rr + m[0, 1] * cc + off[0]
    sc = m[1, 0] * rr + m[1, 1] * cc + off[1]
    r0 = jnp.floor(sr)
    c0 = jnp.floor(sc)
    fr = sr - r0
    fc = sc - c0
    valid = (sr >= 0) & (sr <= H - 1) & (sc >= 0) & (sc <= W - 1)
    r0i = jnp.clip(r0.astype(jnp.int32), 0, H - 1)
    r1i = jnp.clip(r0.astype(jnp.int32) + 1, 0, H - 1)
    c0i = jnp.clip(c0.astype(jnp.int32), 0, W - 1)
    c1i = jnp.clip(c0.astype(jnp.int32) + 1, 0, W - 1)
    out = (
        img[r0i, c0i] * (1 - fr) * (1 - fc)
        + img[r1i, c0i] * fr * (1 - fc)
        + img[r0i, c1i] * (1 - fr) * fc
        + img[r1i, c1i] * fr * fc
    )
    return jnp.where(valid, out, fill).astype(jnp.float32)
