"""Pose estimation from 2D-3D correspondences (PnP).

Two pieces, both static-shape and jittable:
  * `pnp_refine` — pose-only robust LM (Huber) from an initial guess; this is
    the video-tracking workhorse (previous frame's pose is the init).
  * `ransac_pnp` — hypotheses from perturbed LM restarts scored by inlier
    count, for when the init is unreliable.

New subsystem per BASELINE.json config 4 (sequential registration); no
reference counterpart.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .geometry import pose_retract, project


def _residuals_pose(K, R, t, X, uv):
    p, z = project(K, R, t, X)
    return p - uv, z


def _solve6(A, b):
    """Solve 6x6 SPD system via jnp.linalg.solve (tiny, fine on VPU)."""
    return jnp.linalg.solve(A + 1e-8 * jnp.eye(6), b)


@partial(jax.jit, static_argnames=("iters", "huber_px"))
def pnp_refine(
    K: jnp.ndarray,
    R0: jnp.ndarray,
    t0: jnp.ndarray,
    X: jnp.ndarray,      # (N,3)
    uv: jnp.ndarray,     # (N,2)
    w: jnp.ndarray,      # (N,) 0/1
    iters: int = 10,
    huber_px: float = 3.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pose-only LM.  Returns (R, t, rms_px_on_inliers)."""

    from .geometry import project_jacobians

    def step(carry, _):
        R, t, lam = carry
        r, z = _residuals_pose(K, R, t, X, uv)
        nrm = jnp.sqrt(jnp.sum(r * r, axis=-1) + 1e-12)
        wr = w * (z > 1e-6) * jnp.minimum(1.0, huber_px / nrm)
        J, _ = project_jacobians(K, R, t, X)  # (N,2,6) closed-form
        JT = jnp.swapaxes(J, 1, 2)
        H = jnp.einsum("nij,njk->ik", JT * wr[:, None, None], J)
        g = -jnp.einsum("nij,nj->i", JT * wr[:, None, None], r)
        H = H + lam * jnp.diag(jnp.diag(H))
        xi = _solve6(H, g)
        R2, t2 = pose_retract(R, t, xi)
        c_old = jnp.sum(wr * jnp.sum(r * r, -1))
        r2, _ = _residuals_pose(K, R2, t2, X, uv)
        c_new = jnp.sum(wr * jnp.sum(r2 * r2, -1))
        acc = c_new < c_old
        R = jnp.where(acc, R2, R)
        t = jnp.where(acc, t2, t)
        lam = jnp.where(acc, lam * 0.5, lam * 4.0)
        return (R, t, lam), None

    (R, t, _), _ = lax.scan(step, (R0, t0, jnp.float32(1e-3)), None, length=iters)
    r, z = _residuals_pose(K, R, t, X, uv)
    nrm2 = jnp.sum(r * r, axis=-1)
    inl = w * (z > 1e-6) * (nrm2 < huber_px**2)
    rms = jnp.sqrt(jnp.sum(inl * nrm2) / jnp.maximum(jnp.sum(inl), 1.0))
    return R, t, rms


@partial(jax.jit, static_argnames=("n_hypo", "iters", "thresh_px"))
def ransac_pnp(
    key: jax.Array,
    K: jnp.ndarray,
    R0: jnp.ndarray,
    t0: jnp.ndarray,
    X: jnp.ndarray,
    uv: jnp.ndarray,
    w: jnp.ndarray,
    n_hypo: int = 16,
    iters: int = 8,
    thresh_px: float = 4.0,
):
    """Robust PnP: LM restarts from jittered inits + minimal random subsets,
    scored by inlier count; winner refined on its inliers.

    Returns (R, t, inliers, n_inliers).
    """
    n = X.shape[0]
    keys = jax.random.split(key, n_hypo)

    def hypo(k):
        k1, k2 = jax.random.split(k)
        xi = jax.random.normal(k1, (6,)) * jnp.array([0.05, 0.05, 0.05, 0.2, 0.2, 0.2])
        Rj, tj = pose_retract(R0, t0, xi)
        # subset weights: ~12 random correspondences
        g = jax.random.gumbel(k2, (n,))
        g = jnp.where(w > 0, g, -jnp.inf)
        _, idx = lax.top_k(g, 12)
        ws = jnp.zeros((n,)).at[idx].set(1.0) * w
        R, t, _ = pnp_refine(K, Rj, tj, X, uv, ws, iters=iters)
        r, z = _residuals_pose(K, R, t, X, uv)
        inl = (w > 0) & (z > 1e-6) & (jnp.sum(r * r, -1) < thresh_px**2)
        return R, t, jnp.sum(inl)

    Rs, ts, scores = jax.vmap(hypo)(keys)
    # also score the plain init-based refine on all points
    Ra, ta, _ = pnp_refine(K, R0, t0, X, uv, w, iters=iters)
    ra, za = _residuals_pose(K, Ra, ta, X, uv)
    inl_a = (w > 0) & (za > 1e-6) & (jnp.sum(ra * ra, -1) < thresh_px**2)
    best = jnp.argmax(scores)
    use_a = jnp.sum(inl_a) >= scores[best]
    Rb = jnp.where(use_a, Ra, Rs[best])
    tb = jnp.where(use_a, ta, ts[best])
    # final refine on the winner's inliers
    rb, zb = _residuals_pose(K, Rb, tb, X, uv)
    inl = (w > 0) & (zb > 1e-6) & (jnp.sum(rb * rb, -1) < thresh_px**2)
    R, t, _ = pnp_refine(K, Rb, tb, X, uv, inl.astype(jnp.float32), iters=iters)
    r, z = _residuals_pose(K, R, t, X, uv)
    inl = (w > 0) & (z > 1e-6) & (jnp.sum(r * r, -1) < thresh_px**2)
    return R, t, inl, jnp.sum(inl)
