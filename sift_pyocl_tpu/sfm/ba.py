"""Sparse bundle adjustment: Levenberg-Marquardt with a matrix-free
Schur-complement CG solve.

New subsystem — the distributed backend BASELINE.json specifies ("sparse
bundle adjustment with a Schur-complement reduction, keyframes and map blocks
sharded, camera/point reduction via ICI collectives").  No reference
counterpart (SURVEY.md §2.3).

TPU-first design:
  * Observation-major layout: (M,) arrays of (cam_id, pt_id, uv, weight) with
    static capacity and 0-weight padding.
  * Per-observation 2x6 / 2x3 Jacobian blocks in closed form
    (geometry.project_jacobians) — checked against jacfwd in the tests.
  * Point (V) blocks: batched closed-form 3x3 inverses, always local.
  * The reduced camera system S = U_damped - W V^-1 W^T is never assembled:
    CG applies it matrix-free with two segment_sums and two gathers per
    matvec — all MXU/VPU friendly, and every camera-side reduction is a
    single `psum` away from the multi-host version.
  * `axis_name` switches the same code between single-device and
    shard_map-distributed execution: observations and points are sharded,
    cameras are replicated, and exactly the camera-side reductions
    (U, g_c, CG matvec accumulator, cost, residual stats) cross the mesh.

Robustness: Huber IRLS weights re-evaluated each LM iteration.
Gauge: arbitrary cameras can be frozen via `fixed` mask (projected CG).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .geometry import pose_retract, project


class BAParams(NamedTuple):
    """Optimization parameters (the pytree being optimized)."""

    Rs: jnp.ndarray   # (C,3,3)
    ts: jnp.ndarray   # (C,3)
    X: jnp.ndarray    # (P,3)


class BAObs(NamedTuple):
    """Static-capacity observation table (sharded along M when distributed)."""

    uv: jnp.ndarray   # (M,2) f32 pixel measurements
    cam: jnp.ndarray  # (M,) int32
    pt: jnp.ndarray   # (M,) int32 (LOCAL point index when sharded)
    w: jnp.ndarray    # (M,) f32, 0 = padding


def _psum(x, axis_name):
    return lax.psum(x, axis_name) if axis_name is not None else x


def residuals(params: BAParams, obs: BAObs, K) -> jnp.ndarray:
    """(M,2) reprojection residuals."""
    R = params.Rs[obs.cam]
    t = params.ts[obs.cam]
    X = params.X[obs.pt]
    p, _ = jax.vmap(lambda R_, t_, X_: project(K, R_, t_, X_))(R, t, X)
    return p - obs.uv


def robust_weights(r: jnp.ndarray, w: jnp.ndarray, huber_px: float) -> jnp.ndarray:
    """Huber IRLS weights on the residual norm."""
    nrm = jnp.sqrt(jnp.sum(r * r, axis=-1) + 1e-12)
    return w * jnp.minimum(1.0, huber_px / nrm)


def robust_cost(r: jnp.ndarray, w: jnp.ndarray, huber_px: float, axis_name=None):
    """Sum of Huber losses (the true objective used for accept/reject)."""
    n2 = jnp.sum(r * r, axis=-1)
    nrm = jnp.sqrt(n2 + 1e-12)
    quad = 0.5 * n2
    lin = huber_px * (nrm - 0.5 * huber_px)
    cost = jnp.sum(w * jnp.where(nrm <= huber_px, quad, lin))
    return _psum(cost, axis_name)


def _jac_blocks(params: BAParams, obs: BAObs, K):
    """Per-observation Jacobians: (M,2,6) wrt camera tangent, (M,2,3) wrt point.

    Closed-form (geometry.project_jacobians) — the earlier per-observation
    `jacfwd` formulation traced se3_exp with 9 tangents per observation and
    dominated the BA build cost at VO shapes."""
    from .geometry import project_jacobians

    return project_jacobians(
        K, params.Rs[obs.cam], params.ts[obs.cam], params.X[obs.pt]
    )


def _inv3(A: jnp.ndarray) -> jnp.ndarray:
    """Batched closed-form 3x3 inverse (adjugate / det)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    det = jnp.where(jnp.abs(det) > 1e-20, det, 1e-20)
    adj = jnp.stack(
        [
            jnp.stack([A11, A12, A13], -1),
            jnp.stack([A21, A22, A23], -1),
            jnp.stack([A31, A32, A33], -1),
        ],
        -2,
    )
    return adj / det[..., None, None]


class _System(NamedTuple):
    U: jnp.ndarray      # (C,6,6) damped camera blocks (already psum'd)
    Vinv: jnp.ndarray   # (P,3,3) inverted damped point blocks (local)
    W: jnp.ndarray      # (M,6,3) cross blocks (local)
    g_c: jnp.ndarray    # (C,6)   camera gradient (psum'd)
    g_p: jnp.ndarray    # (P,3)   point gradient (local)


def build_system(
    params: BAParams,
    obs: BAObs,
    K,
    lam: jnp.ndarray,
    huber_px: float,
    n_points: int,
    axis_name=None,
) -> Tuple[_System, jnp.ndarray]:
    """Weighted, damped normal-equation blocks; returns (system, robust cost)."""
    r = residuals(params, obs, K)
    wq = robust_weights(r, obs.w, huber_px)
    cost = robust_cost(r, obs.w, huber_px, axis_name)
    Jc, Jp = _jac_blocks(params, obs, K)
    n_cams = params.Rs.shape[0]

    JcT = jnp.swapaxes(Jc, 1, 2)  # (M,6,2)
    JpT = jnp.swapaxes(Jp, 1, 2)  # (M,3,2)
    wq_ = wq[:, None, None]
    Um = wq_ * (JcT @ Jc)                 # (M,6,6)
    Vm = wq_ * (JpT @ Jp)                 # (M,3,3)
    W = wq_ * (JcT @ Jp)                  # (M,6,3)
    gcm = -(wq[:, None] * jnp.einsum("mij,mj->mi", JcT, r))  # (M,6)
    gpm = -(wq[:, None] * jnp.einsum("mij,mj->mi", JpT, r))  # (M,3)

    U = jax.ops.segment_sum(Um, obs.cam, num_segments=n_cams)
    g_c = jax.ops.segment_sum(gcm, obs.cam, num_segments=n_cams)
    U = _psum(U, axis_name)
    g_c = _psum(g_c, axis_name)
    V = jax.ops.segment_sum(Vm, obs.pt, num_segments=n_points)
    g_p = jax.ops.segment_sum(gpm, obs.pt, num_segments=n_points)

    eye6 = jnp.eye(6)
    eye3 = jnp.eye(3)
    # Marquardt damping: lam * (diag + small identity floor)
    U = U + lam * (eye6 * jnp.diagonal(U, axis1=1, axis2=2)[:, :, None] * eye6 + 1e-8 * eye6)
    V = V + lam * (eye3 * jnp.diagonal(V, axis1=1, axis2=2)[:, :, None] * eye3 + 1e-8 * eye3)
    return _System(U, _inv3(V), W, g_c, g_p), cost


def _schur_matvec(sys: _System, obs: BAObs, x: jnp.ndarray, free: jnp.ndarray,
                  n_points: int, axis_name=None) -> jnp.ndarray:
    """Apply S = U - W V^-1 W^T to x (C,6) without assembling S."""
    x = x * free[:, None]
    u = jnp.einsum("mij,mi->mj", sys.W, x[obs.cam])          # (M,3) = W^T x
    q = jax.ops.segment_sum(u, obs.pt, num_segments=n_points)  # (P,3)
    y = jnp.einsum("pij,pj->pi", sys.Vinv, q)                 # (P,3)
    z = jnp.einsum("mij,mj->mi", sys.W, y[obs.pt])            # (M,6)
    acc = jax.ops.segment_sum(z, obs.cam, num_segments=x.shape[0])
    acc = _psum(acc, axis_name)
    Ux = jnp.einsum("cij,cj->ci", sys.U, x)
    return (Ux - acc) * free[:, None]


def _cg(matvec, b, iters: int):
    """Fixed-iteration conjugate gradients (b and x are (C,6) pytrees-as-arrays)."""
    x0 = jnp.zeros_like(b)
    r0 = b
    p0 = r0
    rs0 = jnp.sum(r0 * r0)

    def body(_, st):
        x, r, p, rs = st
        Ap = matvec(p)
        denom = jnp.sum(p * Ap)
        alpha = rs / jnp.where(jnp.abs(denom) > 1e-20, denom, 1e-20)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = jnp.sum(r * r)
        beta = rs_new / jnp.where(rs > 1e-20, rs, 1e-20)
        p = r + beta * p
        return (x, r, p, rs_new)

    x, _, _, _ = lax.fori_loop(0, iters, body, (x0, r0, p0, rs0))
    return x


def solve_step(
    sys: _System, obs: BAObs, free: jnp.ndarray, n_points: int,
    cg_iters: int = 30, axis_name=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One damped step: camera updates (C,6) and point updates (P,3)."""
    # Schur RHS: b = g_c - W V^-1 g_p   (camera side, reduced over shards)
    y = jnp.einsum("pij,pj->pi", sys.Vinv, sys.g_p)           # (P,3)
    z = jnp.einsum("mij,mj->mi", sys.W, y[obs.pt])            # (M,6)
    red = jax.ops.segment_sum(z, obs.cam, num_segments=sys.g_c.shape[0])
    red = _psum(red, axis_name)
    b = (sys.g_c - red) * free[:, None]
    mv = lambda x: _schur_matvec(sys, obs, x, free, n_points, axis_name)
    dc = _cg(mv, b, cg_iters)
    # back-substitute points: dp = V^-1 (g_p - W^T dc)
    u = jnp.einsum("mij,mi->mj", sys.W, dc[obs.cam])          # (M,3)
    q = jax.ops.segment_sum(u, obs.pt, num_segments=n_points)
    dp = jnp.einsum("pij,pj->pi", sys.Vinv, sys.g_p - q)
    return dc, dp


def apply_step(params: BAParams, dc: jnp.ndarray, dp: jnp.ndarray) -> BAParams:
    Rs, ts = jax.vmap(pose_retract)(params.Rs, params.ts, dc)
    return BAParams(Rs, ts, params.X + dp)


@partial(
    jax.jit,
    static_argnames=("huber_px", "cg_iters", "n_points", "axis_name"),
)
def lm_iteration(
    params: BAParams,
    obs: BAObs,
    K: jnp.ndarray,
    lam: jnp.ndarray,
    free: jnp.ndarray,
    huber_px: float = 2.0,
    cg_iters: int = 30,
    n_points: int = 0,
    axis_name=None,
):
    """One accept/reject LM iteration.  Returns (params, lam, cost, accepted)."""
    nP = n_points or params.X.shape[0]
    sys, cost = build_system(params, obs, K, lam, huber_px, nP, axis_name)
    dc, dp = solve_step(sys, obs, free, nP, cg_iters, axis_name)
    cand = apply_step(params, dc, dp)
    r_new = residuals(cand, obs, K)
    new_cost = robust_cost(r_new, obs.w, huber_px, axis_name)
    accept = new_cost < cost
    params = jax.tree.map(
        lambda a, b: jnp.where(accept, a, b), cand, params
    )
    lam = jnp.where(accept, jnp.maximum(lam * 0.4, 1e-9), jnp.minimum(lam * 4.0, 1e6))
    return params, lam, cost, accept


def run_ba(
    params: BAParams,
    obs: BAObs,
    K,
    fixed_cams=(0,),
    iters: int = 20,
    huber_px: float = 2.0,
    cg_iters: int = 30,
    lam0: float = 1e-3,
    verbose: bool = False,
):
    """Host-driven LM loop (single device).  Returns (params, costs)."""
    C = params.Rs.shape[0]
    free = jnp.ones((C,), jnp.float32).at[jnp.array(fixed_cams)].set(0.0)
    lam = jnp.float32(lam0)
    costs = []
    for it in range(iters):
        params, lam, cost, acc = lm_iteration(
            params, obs, K, lam, free,
            huber_px=huber_px, cg_iters=cg_iters, n_points=params.X.shape[0],
        )
        costs.append(float(cost))
        if verbose:
            print(f"  LM it {it}: cost {float(cost):.4f} lam {float(lam):.2e} acc {bool(acc)}")
    return params, costs
