"""Multi-view geometry primitives in JAX.

New subsystem — no reference counterpart (SURVEY.md §2.3: the reference's
closest thing is LinearAlign's 2-view affine fit).  Spec comes from
BASELINE.json north_star: two-view geometry (essential/homography),
triangulation, pose utilities feeding the pose graph and bundle adjustment.

Conventions:
  * Image points are (u, v) = (col, row) pixel coordinates.
  * Pose (R, t): x_cam = R @ x_world + t  (world-to-camera).
  * Intrinsics K = [[fx, 0, cx], [0, fy, cy], [0, 0, 1]].
  * se(3) tangent vectors xi = (omega, upsilon), applied multiplicatively on
    the left: pose' = exp(xi) * pose.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


# ----------------------------------------------------------------------------
# SO(3) / SE(3)
# ----------------------------------------------------------------------------

def hat(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator: (3,) -> (3,3) skew-symmetric."""
    wx, wy, wz = w[0], w[1], w[2]
    z = jnp.zeros_like(wx)
    return jnp.array([[z, -wz, wy], [wz, z, -wx], [-wy, wx, z]])


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: so(3) (3,) -> SO(3) (3,3), stable near zero."""
    theta2 = jnp.dot(w, w)
    theta = jnp.sqrt(theta2 + 1e-32)
    W = hat(w)
    # sin(x)/x and (1-cos x)/x^2 with Taylor guards
    a = jnp.where(theta2 > 1e-12, jnp.sin(theta) / theta, 1.0 - theta2 / 6.0)
    b = jnp.where(
        theta2 > 1e-12, (1.0 - jnp.cos(theta)) / theta2, 0.5 - theta2 / 24.0
    )
    return jnp.eye(3) + a * W + b * (W @ W)


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """SO(3) -> so(3) (3,), smooth and AD-safe near the identity.

    atan2 formulation: w = sin(theta)*axis from the skew part, theta =
    atan2(|w|, (tr-1)/2); the theta/sin(theta) factor uses a Taylor branch
    for small angles so jacfwd through a converged residual stays finite
    (arccos has an infinite gradient at 1, which NaN'd pose-graph GN).
    Degrades near theta = pi (sin -> 0), which optimization residuals never
    approach.
    """
    w = 0.5 * jnp.array(
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]]
    )
    s2 = jnp.dot(w, w)
    s = jnp.sqrt(s2 + 1e-32)
    c = 0.5 * (jnp.trace(R) - 1.0)
    safe = s > 1e-6
    theta = jnp.arctan2(s, c)
    scale = jnp.where(
        safe,
        theta / jnp.where(safe, s, 1.0),
        1.0 + (1.0 - jnp.minimum(c, 1.0)) / 3.0,  # theta/sin ~ 1 + theta^2/6
    )
    return w * scale


def se3_exp(xi: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """se(3) (6,) = (omega, upsilon) -> (R, t)."""
    w, u = xi[:3], xi[3:]
    theta2 = jnp.dot(w, w)
    theta = jnp.sqrt(theta2 + 1e-32)
    W = hat(w)
    R = so3_exp(w)
    b = jnp.where(theta2 > 1e-12, (1.0 - jnp.cos(theta)) / theta2, 0.5 - theta2 / 24.0)
    c = jnp.where(
        theta2 > 1e-12, (theta - jnp.sin(theta)) / (theta2 * theta), 1.0 / 6.0 - theta2 / 120.0
    )
    V = jnp.eye(3) + b * W + c * (W @ W)
    return R, V @ u


def pose_compose(Ra, ta, Rb, tb):
    """(Ra,ta) ∘ (Rb,tb): first apply b, then a."""
    return Ra @ Rb, Ra @ tb + ta


def pose_inverse(R, t):
    return R.T, -(R.T @ t)


def pose_retract(R, t, xi):
    """Left-multiplicative update: exp(xi) ∘ (R, t)."""
    dR, dt = se3_exp(xi)
    return pose_compose(dR, dt, R, t)


# ----------------------------------------------------------------------------
# Projection
# ----------------------------------------------------------------------------

def project(K: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray, X: jnp.ndarray):
    """Project world point(s) X (..., 3) -> pixel (u, v) (..., 2) and depth."""
    Xc = X @ R.T + t
    z = Xc[..., 2]
    zs = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    u = K[0, 0] * Xc[..., 0] / zs + K[0, 2]
    v = K[1, 1] * Xc[..., 1] / zs + K[1, 2]
    return jnp.stack([u, v], axis=-1), z


def project_jacobians(K: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray,
                      X: jnp.ndarray):
    """Analytic Jacobians of the reprojection residual at the current pose.

    For r(xi, dX) = project(K, pose_retract(R, t, xi), X + dX) - uv the
    derivatives at (xi, dX) = 0 are closed-form (left-multiplicative
    perturbation: Xc' = exp(w) Xc + u  =>  dXc/dw = -[Xc]x, dXc/du = I,
    dXc/dX = R), so there is no need for per-observation `jax.jacfwd` —
    which traces the whole se3_exp chain with 9 tangents per observation
    and dominated the BA system-build cost.

    Batched over leading dims of X (R, t broadcast or batched alike).
    Returns (Jc (..., 2, 6) wrt xi = (omega, upsilon), Jp (..., 2, 3) wrt X).
    Matches jacfwd of the residual bit-for-bit up to float association
    (tests/test_ba.py::test_analytic_jacobians_match_jacfwd).
    """
    Xc = jnp.einsum("...ij,...j->...i", R, X) + t
    x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    zs = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    iz = 1.0 / zs
    fx_iz = K[0, 0] * iz
    fy_iz = K[1, 1] * iz
    zero = jnp.zeros_like(x)
    # A = d(u,v)/dXc  (..., 2, 3)
    A = jnp.stack(
        [
            jnp.stack([fx_iz, zero, -fx_iz * x * iz], -1),
            jnp.stack([zero, fy_iz, -fy_iz * y * iz], -1),
        ],
        -2,
    )
    # dXc/domega = -[Xc]x
    neg_hat = jnp.stack(
        [
            jnp.stack([zero, z, -y], -1),
            jnp.stack([-z, zero, x], -1),
            jnp.stack([y, -x, zero], -1),
        ],
        -2,
    )
    Jw = A @ neg_hat                             # (..., 2, 3)
    Jc = jnp.concatenate([Jw, A], axis=-1)       # (..., 2, 6)
    Jp = A @ R                                   # (..., 2, 3)
    return Jc, Jp


def backproject(K: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Pixel (..., 2) -> normalized camera ray (..., 3) with z=1."""
    x = (uv[..., 0] - K[0, 2]) / K[0, 0]
    y = (uv[..., 1] - K[1, 2]) / K[1, 1]
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


# ----------------------------------------------------------------------------
# Triangulation
# ----------------------------------------------------------------------------

def _solve3_batched(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched 3x3 solve via the adjugate (..., 3, 3) @ x = (..., 3)."""
    a11, a12, a13 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a21, a22, a23 = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    a31, a32, a33 = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    c11 = a22 * a33 - a23 * a32
    c12 = a13 * a32 - a12 * a33
    c13 = a12 * a23 - a13 * a22
    c21 = a23 * a31 - a21 * a33
    c22 = a11 * a33 - a13 * a31
    c23 = a13 * a21 - a11 * a23
    c31 = a21 * a32 - a22 * a31
    c32 = a12 * a31 - a11 * a32
    c33 = a11 * a22 - a12 * a21
    det = a11 * c11 + a12 * c21 + a13 * c31
    det = jnp.where(jnp.abs(det) > 1e-20, det, 1e-20)
    x0 = c11 * b[..., 0] + c12 * b[..., 1] + c13 * b[..., 2]
    x1 = c21 * b[..., 0] + c22 * b[..., 1] + c23 * b[..., 2]
    x2 = c31 * b[..., 0] + c32 * b[..., 1] + c33 * b[..., 2]
    return jnp.stack([x0, x1, x2], axis=-1) / det[..., None]


def triangulate_two_view(K1, R1, t1, K2, R2, t2, uv1, uv2):
    """Linear triangulation of correspondences (N,2)+(N,2) -> (N,3).

    Inhomogeneous least squares (w = 1): the four DLT rows B X = b are
    solved via closed-form 3x3 normal equations.  The earlier homogeneous
    formulation (smallest eigenvector of the 4x4 A^T A per point) cost a
    vmapped iterative `eigh` inside the fused VO step — ~1 ms at VO shapes;
    this form is a handful of elementwise ops.  Degenerate/far points give
    large |X| instead of a clean point at infinity; callers already gate on
    cheirality/depth, which rejects both.

    Also returns the per-point depths in both cameras for cheirality tests.
    """
    P1 = K1 @ jnp.concatenate([R1, t1[:, None]], axis=1)  # (3,4)
    P2 = K2 @ jnp.concatenate([R2, t2[:, None]], axis=1)

    rows = jnp.stack(
        [
            uv1[:, 0, None] * P1[2] - P1[0],
            uv1[:, 1, None] * P1[2] - P1[1],
            uv2[:, 0, None] * P2[2] - P2[0],
            uv2[:, 1, None] * P2[2] - P2[1],
        ],
        axis=1,
    )                                           # (N, 4, 4)
    B = rows[:, :, :3]
    b = -rows[:, :, 3]
    BtB = jnp.einsum("nij,nik->njk", B, B)
    BtB = BtB + 1e-12 * jnp.eye(3)
    Btb = jnp.einsum("nij,ni->nj", B, b)
    X = _solve3_batched(BtB, Btb)
    _, z1 = project(K1, R1, t1, X)
    _, z2 = project(K2, R2, t2, X)
    return X, z1, z2


# ----------------------------------------------------------------------------
# Essential matrix (8-point) and decomposition
# ----------------------------------------------------------------------------

def _normalize_points(pts: jnp.ndarray, w: jnp.ndarray):
    """Hartley normalization with weights w (0/1 mask); returns (pts_n, T)."""
    wsum = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(pts * w[:, None], axis=0) / wsum
    d = jnp.sqrt(jnp.sum((pts - mean) ** 2, axis=1) + 1e-12)
    scale = jnp.sqrt(2.0) / jnp.maximum(jnp.sum(d * w) / wsum, 1e-12)
    T = jnp.array(
        [
            [scale, 0.0, -scale * mean[0]],
            [0.0, scale, -scale * mean[1]],
            [0.0, 0.0, 1.0],
        ]
    )
    pn = (pts - mean) * scale
    return pn, T


def fit_fundamental_8pt(uv1: jnp.ndarray, uv2: jnp.ndarray, w: jnp.ndarray):
    """Weighted 8-point fundamental/essential fit on (N,2) correspondences.

    w is a 0/1 weight vector (selects the minimal sample or inlier set —
    static shapes for RANSAC).  Returns F with ||F||=1, rank-2 enforced.
    """
    p1, T1 = _normalize_points(uv1, w)
    p2, T2 = _normalize_points(uv2, w)
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, jnp.ones_like(x1)],
        axis=1,
    )  # (N, 9)
    Aw = A * w[:, None]
    _, V = jnp.linalg.eigh(Aw.T @ Aw)
    F = V[:, 0].reshape(3, 3)
    # rank-2 projection
    U, S, Vt = jnp.linalg.svd(F)
    F = (U * jnp.array([S[0], S[1], 0.0])) @ Vt
    F = T2.T @ F @ T1
    return F / jnp.maximum(jnp.linalg.norm(F), 1e-12)


def essential_from_fundamental(F: jnp.ndarray, K1: jnp.ndarray, K2: jnp.ndarray):
    E = K2.T @ F @ K1
    # project onto essential manifold: singular values (1,1,0)
    U, S, Vt = jnp.linalg.svd(E)
    return (U * jnp.array([1.0, 1.0, 0.0])) @ Vt


def decompose_essential(E: jnp.ndarray):
    """E -> 4 candidate (R, t) with |t|=1.  Returns (4,3,3) R and (4,3) t."""
    U, _, Vt = jnp.linalg.svd(E)
    # ensure proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def choose_pose(Rs, ts, K1, K2, uv1, uv2, w):
    """Pick the (R,t) candidate with most points in front of both cameras."""
    I = jnp.eye(3)
    z = jnp.zeros(3)

    def score(R, t):
        X, z1, z2 = triangulate_two_view(K1, I, z, K2, R, t, uv1, uv2)
        return jnp.sum(((z1 > 0) & (z2 > 0)) * w)

    scores = jax.vmap(score)(Rs, ts)
    best = jnp.argmax(scores)
    return Rs[best], ts[best], scores[best]


def sampson_error_F(F: jnp.ndarray, uv1: jnp.ndarray, uv2: jnp.ndarray):
    """First-order geometric (Sampson) error of x2' F x1 per correspondence."""
    ones = jnp.ones((uv1.shape[0], 1))
    x1 = jnp.concatenate([uv1, ones], axis=1)  # (N,3)
    x2 = jnp.concatenate([uv2, ones], axis=1)
    Fx1 = x1 @ F.T        # (N,3)  = F @ x1
    Ftx2 = x2 @ F          # (N,3)  = F^T @ x2
    num = jnp.sum(x2 * Fx1, axis=1) ** 2
    den = Fx1[:, 0] ** 2 + Fx1[:, 1] ** 2 + Ftx2[:, 0] ** 2 + Ftx2[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


# ----------------------------------------------------------------------------
# Homography (4-point DLT)
# ----------------------------------------------------------------------------

def fit_homography(uv1: jnp.ndarray, uv2: jnp.ndarray, w: jnp.ndarray):
    """Weighted DLT homography uv2 ~ H uv1 on (N,2); returns (3,3), H[2,2]=1."""
    p1, T1 = _normalize_points(uv1, w)
    p2, T2 = _normalize_points(uv2, w)
    x, y = p1[:, 0], p1[:, 1]
    u, v = p2[:, 0], p2[:, 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    r1 = jnp.stack([x, y, one, zero, zero, zero, -u * x, -u * y, -u], axis=1)
    r2 = jnp.stack([zero, zero, zero, x, y, one, -v * x, -v * y, -v], axis=1)
    A = jnp.concatenate([r1 * w[:, None], r2 * w[:, None]], axis=0)  # (2N,9)
    _, V = jnp.linalg.eigh(A.T @ A)
    H = V[:, 0].reshape(3, 3)
    H = jnp.linalg.inv(T2) @ H @ T1
    return H / jnp.where(jnp.abs(H[2, 2]) > 1e-12, H[2, 2], 1e-12)


def homography_error(H: jnp.ndarray, uv1: jnp.ndarray, uv2: jnp.ndarray):
    """Symmetric-free forward transfer error |H x1 - x2|^2 per point."""
    ones = jnp.ones((uv1.shape[0], 1))
    x1 = jnp.concatenate([uv1, ones], axis=1)
    p = x1 @ H.T
    p = p[:, :2] / jnp.where(jnp.abs(p[:, 2:3]) > 1e-12, p[:, 2:3], 1e-12)
    return jnp.sum((p - uv2) ** 2, axis=1)
