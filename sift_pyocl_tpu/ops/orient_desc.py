"""Orientation assignment and 128-d descriptor as batched XLA ops.

TPU-native replacement for the reference's per-keypoint histogram kernels
(reference: openCL/orientation_cpu.cl / orientation_gpu.cl and the three
keypoints_{cpu,gpu1,gpu2}.cl::descriptor variants — SURVEY.md §2.2).  The
reference picks one of several workgroup-size variants at runtime; on TPU there
is a single formulation:

  * Per keypoint, a static-size window of the octave's gradient field is
    gathered with `dynamic_slice` (zero-padded magnitude outside the image,
    which reproduces the reference's out-of-image skip).
  * The orientation histogram is a masked weighted one-hot reduction (36 bins).
  * The descriptor's trilinear scatter is re-expressed as three separable
    per-dimension weight matrices wr (P,4), wc (P,4), wo (P,8) and contracted
    on the MXU:  desc[rc, o] = (wr ⊗ wc)^T @ (gauss·mag · wo)  — an exact
    rewrite of trilinear scatter-add because relu(1-|bin-i|) equals the
    interpolation weight of each adjacent bin and 0 elsewhere.
  * Keypoints are processed in chunks (`lax.map(..., batch_size=...)`) to
    bound the materialized window memory.

Secondary orientation peaks spawn duplicate keypoints; the static-shape idiom
is an (cap, max_ori) angle matrix with validity, re-compacted before the
descriptor stage (replaces the reference's atomic append of new keypoints).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..config import SiftConfig
from ..oracle import DESC_GRID, DESC_ORI, MAG_FACTOR, N_ORI_BINS
from .detect import RefinedKeypoints


class OrientedKeypoints(NamedTuple):
    """Compacted keypoints with assigned orientations (octave-local coords)."""

    s_int: jnp.ndarray   # (dcap,) int32 integer scale index (gradient plane)
    fs: jnp.ndarray      # (dcap,) f32
    fr: jnp.ndarray      # (dcap,) f32
    fc: jnp.ndarray      # (dcap,) f32
    angle: jnp.ndarray   # (dcap,) f32 in (-pi, pi]
    valid: jnp.ndarray   # (dcap,) bool
    count: jnp.ndarray   # () int32 true number of oriented keypoints


def gradient_jax(img: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Central-difference gradient mag/ori with clamped edges (oracle.gradient)."""
    p = jnp.pad(img, 1, mode="edge")
    dx = p[1:-1, 2:] - p[1:-1, :-2]
    dy = p[2:, 1:-1] - p[:-2, 1:-1]
    mag = 0.5 * jnp.sqrt(dx * dx + dy * dy)
    ori = jnp.arctan2(dy, dx)
    return mag, ori


def gradient_planes(blurs: jnp.ndarray, cfg: SiftConfig):
    """Gradient mag/ori for the scale planes used by detection (s = 1..scales).

    Returns (scales, H, W) mag and ori stacks; plane index = s_int - 1.
    """
    mags, oris = [], []
    for s in range(1, cfg.scales + 1):
        m, o = gradient_jax(blurs[s])
        mags.append(m)
        oris.append(o)
    return jnp.stack(mags), jnp.stack(oris)


def _ori_window_size(cfg: SiftConfig) -> int:
    """Static orientation window: covers radius floor(4.5*sigma_max)."""
    sigma_max = cfg.init_sigma * 2.0 ** ((cfg.scales + 1.5) / cfg.scales)
    need = 2 * int(4.5 * sigma_max) + 3
    return max(cfg.ori_window, (need + 7) // 8 * 8)


def _desc_window_size(cfg: SiftConfig) -> int:
    """Static descriptor window: covers radius ~ 10.61*sigma_max."""
    sigma_max = cfg.init_sigma * 2.0 ** ((cfg.scales + 1.5) / cfg.scales)
    return _desc_window_for_sigma(cfg, sigma_max)


def _desc_window_for_sigma(cfg: SiftConfig, sigma: float) -> int:
    """Window size covering the descriptor radius for keypoints of octave-
    local sigma <= `sigma` (same formula as _desc_window_size; used to give
    small-sigma keypoints a smaller fused-kernel launch — most keypoints sit
    at the low scales and need nothing near the sigma_max window)."""
    rad = math.sqrt(2.0) * MAG_FACTOR * sigma * (DESC_GRID + 1) / 2.0
    need = 2 * int(rad + 0.5) + 3
    return max(cfg.desc_window, (need + 7) // 8 * 8)


def _gather_window(plane_stack, s_idx, r0, c0, win, pad_value):
    """Gather a (win, win) window centered at integer (r0, c0) from plane s_idx.

    plane_stack: (S, H, W); out-of-image samples take pad_value.
    """
    S, H, W = plane_stack.shape
    half = win // 2
    padded = jnp.pad(
        plane_stack,
        ((0, 0), (half, half), (half, half)),
        mode="constant",
        constant_values=pad_value,
    )
    start_r = r0  # padded coords: r0 - half + half
    start_c = c0
    plane = lax.dynamic_index_in_dim(padded, s_idx, axis=0, keepdims=False)
    return lax.dynamic_slice(plane, (start_r, start_c), (win, win))


def assign_orientations(
    mags: jnp.ndarray,
    oris: jnp.ndarray,
    kps: RefinedKeypoints,
    cfg: SiftConfig,
    dcap: int,
    max_ori: int = 2,
    chunk: int = 128,
) -> OrientedKeypoints:
    """36-bin orientation histogram per keypoint (orientation_*.cl).

    Numerics follow oracle.orientation exactly: integer radius floor(4.5*s),
    inclusion d2 < radius^2 + 0.5, Gaussian weight sigma_w = 1.5*s, 6 rounds
    of circular 3-tap smoothing, peaks >= 0.8*max that are local maxima,
    parabolic refinement.  Up to `max_ori` strongest peaks per keypoint
    (dominant first) are kept, then compacted to capacity `dcap`.
    """
    win = _ori_window_size(cfg)
    half = win // 2
    sigma_oct = cfg.init_sigma * 2.0 ** (kps.fs / cfg.scales)

    def one_kp(s_int, fr, fc, sig, valid):
        r0 = jnp.round(fr).astype(jnp.int32)
        c0 = jnp.round(fc).astype(jnp.int32)
        magw = _gather_window(mags, s_int - 1, r0, c0, win, 0.0)
        oriw = _gather_window(oris, s_int - 1, r0, c0, win, 0.0)
        rr = (jnp.arange(win, dtype=jnp.float32) - half)[:, None] + (
            r0.astype(jnp.float32) - fr
        )
        cc = (jnp.arange(win, dtype=jnp.float32) - half)[None, :] + (
            c0.astype(jnp.float32) - fc
        )
        d2 = rr * rr + cc * cc
        sig_w = 1.5 * sig
        radius = jnp.floor(3.0 * sig_w)
        inside = d2 < radius * radius + 0.5
        w = jnp.exp(-d2 / (2.0 * sig_w * sig_w)) * magw * inside
        b = jnp.floor(N_ORI_BINS * (oriw + np.pi) / (2 * np.pi)).astype(jnp.int32)
        b = jnp.clip(b, 0, N_ORI_BINS - 1)
        onehot = jax.nn.one_hot(b.reshape(-1), N_ORI_BINS, dtype=jnp.float32)
        hist = onehot.T @ w.reshape(-1)
        for _ in range(6):
            hist = (jnp.roll(hist, 1) + hist + jnp.roll(hist, -1)) / 3.0
        hmax = jnp.max(hist)
        left = jnp.roll(hist, 1)
        right = jnp.roll(hist, -1)
        is_peak = (hist >= 0.8 * hmax) & (hist > left) & (hist > right) & (hmax > 0)
        scores = jnp.where(is_peak, hist, -jnp.inf)
        top_vals, top_bins = lax.top_k(scores, max_ori)
        ok = jnp.isfinite(top_vals) & valid
        l = left[top_bins]
        rgt = right[top_bins]
        h = hist[top_bins]
        denom = l - 2.0 * h + rgt
        off = jnp.where(denom != 0, 0.5 * (l - rgt) / jnp.where(denom != 0, denom, 1.0), 0.0)
        ang = 2 * np.pi * (top_bins.astype(jnp.float32) + 0.5 + off) / N_ORI_BINS - np.pi
        ang = jnp.where(ang > np.pi, ang - 2 * np.pi, ang)
        ang = jnp.where(ang <= -np.pi, ang + 2 * np.pi, ang)
        return ang, ok

    angs, oks = lax.map(
        lambda t: one_kp(*t),
        (kps.s_int, kps.fr, kps.fc, sigma_oct, kps.valid),
        batch_size=chunk,
    )
    # expand each keypoint into max_ori slots and re-compact to dcap
    cap = kps.fr.shape[0]
    flat_ok = oks.reshape(-1)
    count = jnp.sum(flat_ok.astype(jnp.int32))
    (sel,) = jnp.nonzero(flat_ok, size=dcap, fill_value=-1)
    valid = sel >= 0
    sel = jnp.maximum(sel, 0)
    kp_idx = sel // max_ori
    return OrientedKeypoints(
        s_int=kps.s_int[kp_idx],
        fs=kps.fs[kp_idx],
        fr=kps.fr[kp_idx],
        fc=kps.fc[kp_idx],
        angle=angs.reshape(-1)[sel],
        valid=valid,
        count=count,
    )


def smooth_orientation_hist(hist: jnp.ndarray) -> jnp.ndarray:
    """Six rounds of circular 3-tap box smoothing along the last axis."""
    for _ in range(6):
        hist = (
            jnp.roll(hist, 1, axis=-1) + hist + jnp.roll(hist, -1, axis=-1)
        ) / 3.0
    return hist


def orientation_peaks_from_hist(
    hist: jnp.ndarray,
    kps: RefinedKeypoints,
    cfg: SiftConfig,
    dcap: int,
    max_ori: int = 2,
) -> OrientedKeypoints:
    """Vectorized peak finding + duplicate expansion from (cap, 36) histograms.

    Same numerics as the tail of `assign_orientations` (smoothing, >=0.8*max
    local maxima, parabolic refinement, up to `max_ori` angles per keypoint,
    compaction to `dcap`).  Used by the Pallas path where the histogram is
    produced by ops.pallas.window.orientation_hist_pallas.
    """
    hist = smooth_orientation_hist(hist)
    hmax = jnp.max(hist, axis=-1, keepdims=True)
    left = jnp.roll(hist, 1, axis=-1)
    right = jnp.roll(hist, -1, axis=-1)
    is_peak = (hist >= 0.8 * hmax) & (hist > left) & (hist > right) & (hmax > 0)
    scores = jnp.where(is_peak, hist, -jnp.inf)
    top_vals, top_bins = lax.top_k(scores, max_ori)          # (cap, max_ori)
    ok = jnp.isfinite(top_vals) & kps.valid[:, None]
    l = jnp.take_along_axis(left, top_bins, axis=-1)
    rgt = jnp.take_along_axis(right, top_bins, axis=-1)
    h = jnp.take_along_axis(hist, top_bins, axis=-1)
    denom = l - 2.0 * h + rgt
    off = jnp.where(
        denom != 0, 0.5 * (l - rgt) / jnp.where(denom != 0, denom, 1.0), 0.0
    )
    ang = (
        2 * np.pi * (top_bins.astype(jnp.float32) + 0.5 + off) / N_ORI_BINS
        - np.pi
    )
    ang = jnp.where(ang > np.pi, ang - 2 * np.pi, ang)
    ang = jnp.where(ang <= -np.pi, ang + 2 * np.pi, ang)

    flat_ok = ok.reshape(-1)
    count = jnp.sum(flat_ok.astype(jnp.int32))
    (sel,) = jnp.nonzero(flat_ok, size=dcap, fill_value=-1)
    valid = sel >= 0
    sel = jnp.maximum(sel, 0)
    kp_idx = sel // max_ori
    return OrientedKeypoints(
        s_int=kps.s_int[kp_idx],
        fs=kps.fs[kp_idx],
        fr=kps.fr[kp_idx],
        fc=kps.fc[kp_idx],
        angle=ang.reshape(-1)[sel],
        valid=valid,
        count=count,
    )


def quantize_descriptors(raw: jnp.ndarray) -> jnp.ndarray:
    """(N, 128) raw histograms -> uint8: normalize, clip 0.2, renorm, x512."""
    n = jnp.sqrt(jnp.sum(raw * raw, axis=-1, keepdims=True))
    v = jnp.where(n > 0, raw / jnp.where(n > 0, n, 1.0), raw)
    v = jnp.minimum(v, 0.2)
    n = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    v = jnp.where(n > 0, v / jnp.where(n > 0, n, 1.0), v)
    return jnp.minimum(512.0 * v, 255.0).astype(jnp.uint8)


def orientation_peaks_dense(
    hist: jnp.ndarray,
    kps: RefinedKeypoints,
    cfg: SiftConfig,
    max_ori: int = 2,
) -> OrientedKeypoints:
    """Scatter-free variant of `orientation_peaks_from_hist`: duplicate
    slots stay DENSE — slot cap*o+i is keypoint i's o-th orientation, with a
    validity mask instead of nonzero compaction (XLA nonzero + the index
    gathers cost ~0.5 ms per octave on TPU; tile/reshape are free).
    """
    hist = smooth_orientation_hist(hist)
    hmax = jnp.max(hist, axis=-1, keepdims=True)
    left = jnp.roll(hist, 1, axis=-1)
    right = jnp.roll(hist, -1, axis=-1)
    is_peak = (hist >= 0.8 * hmax) & (hist > left) & (hist > right) & (hmax > 0)
    scores = jnp.where(is_peak, hist, -jnp.inf)
    top_vals, top_bins = lax.top_k(scores, max_ori)          # (cap, max_ori)
    ok = jnp.isfinite(top_vals) & kps.valid[:, None]
    l = jnp.take_along_axis(left, top_bins, axis=-1)
    rgt = jnp.take_along_axis(right, top_bins, axis=-1)
    h = jnp.take_along_axis(hist, top_bins, axis=-1)
    denom = l - 2.0 * h + rgt
    off = jnp.where(
        denom != 0, 0.5 * (l - rgt) / jnp.where(denom != 0, denom, 1.0), 0.0
    )
    ang = (
        2 * np.pi * (top_bins.astype(jnp.float32) + 0.5 + off) / N_ORI_BINS
        - np.pi
    )
    ang = jnp.where(ang > np.pi, ang - 2 * np.pi, ang)
    ang = jnp.where(ang <= -np.pi, ang + 2 * np.pi, ang)

    def rep(x):
        return jnp.concatenate([x] * max_ori, axis=0)

    cap = hist.shape[0]
    return OrientedKeypoints(
        s_int=rep(kps.s_int),
        fs=rep(kps.fs),
        fr=rep(kps.fr),
        fc=rep(kps.fc),
        angle=ang.T.reshape(-1),            # slot cap*o + i
        valid=ok.T.reshape(-1),
        count=jnp.sum(ok.astype(jnp.int32)),
    )


def assign_orientations_pallas(
    mag_p: jnp.ndarray,
    ori_p: jnp.ndarray,
    kps: RefinedKeypoints,
    cfg: SiftConfig,
    dcap: int = 0,
    max_ori: int = 2,
    interpret: bool = False,
) -> OrientedKeypoints:
    """Pallas-backed orientation assignment (mag_p/ori_p pre-padded).

    Returns DENSE duplicate slots of size max_ori*cap (dcap is ignored —
    kept for signature compatibility with the XLA path)."""
    from .pallas.window import orientation_hist_pallas

    win = _ori_window_size(cfg)
    sigma_oct = cfg.init_sigma * 2.0 ** (kps.fs / cfg.scales)
    hist = orientation_hist_pallas(
        mag_p, ori_p, kps.s_int, kps.fr, kps.fc, sigma_oct, kps.valid,
        win=win, interpret=interpret,
    )
    return orientation_peaks_dense(hist, kps, cfg, max_ori)


def compute_descriptors_pallas(
    mag_p: jnp.ndarray,
    ori_p: jnp.ndarray,
    okps: OrientedKeypoints,
    cfg: SiftConfig,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas-backed descriptor computation (mag_p/ori_p pre-padded)."""
    from .pallas.window import descriptor_hist_pallas

    win = _desc_window_size(cfg)
    sigma_oct = cfg.init_sigma * 2.0 ** (okps.fs / cfg.scales)
    raw = descriptor_hist_pallas(
        mag_p, ori_p, okps.s_int, okps.fr, okps.fc, sigma_oct, okps.angle,
        okps.valid, win=win, interpret=interpret,
    )
    return quantize_descriptors(raw)


def compute_descriptors(
    mags: jnp.ndarray,
    oris: jnp.ndarray,
    okps: OrientedKeypoints,
    cfg: SiftConfig,
    chunk: int = 64,
) -> jnp.ndarray:
    """128-d descriptors for oriented keypoints (keypoints_*.cl::descriptor).

    Returns (dcap, 128) uint8.  Numerics follow oracle.descriptor: spacing
    3*sigma, Gaussian window sigma = 2 (half of DESC_GRID), trilinear weights,
    normalize -> clip 0.2 -> renormalize -> u8 = min(255, 512*v).
    """
    win = _desc_window_size(cfg)
    half = win // 2
    P = win * win
    sigma_oct = cfg.init_sigma * 2.0 ** (okps.fs / cfg.scales)

    rgrid = jnp.arange(DESC_GRID, dtype=jnp.float32)
    ogrid = jnp.arange(DESC_ORI, dtype=jnp.float32)

    def one_kp(s_int, fr, fc, sig, angle):
        r0 = jnp.round(fr).astype(jnp.int32)
        c0 = jnp.round(fc).astype(jnp.int32)
        magw = _gather_window(mags, s_int - 1, r0, c0, win, 0.0).reshape(P)
        oriw = _gather_window(oris, s_int - 1, r0, c0, win, 0.0).reshape(P)
        dr = ((jnp.arange(win, dtype=jnp.float32) - half)[:, None] + (r0.astype(jnp.float32) - fr))
        dc = ((jnp.arange(win, dtype=jnp.float32) - half)[None, :] + (c0.astype(jnp.float32) - fc))
        dr = jnp.broadcast_to(dr, (win, win)).reshape(P)
        dc = jnp.broadcast_to(dc, (win, win)).reshape(P)
        spacing = MAG_FACTOR * sig
        cos_t = jnp.cos(angle)
        sin_t = jnp.sin(angle)
        # canonical frame u = R(+angle) @ d — see oracle.descriptor for the
        # convention derivation (R(-angle) doubles rotation, r4 fix)
        rrot = (cos_t * dr - sin_t * dc) / spacing
        crot = (sin_t * dr + cos_t * dc) / spacing
        rbin = rrot + DESC_GRID / 2.0 - 0.5
        cbin = crot + DESC_GRID / 2.0 - 0.5
        inside = (rbin > -1.0) & (rbin < DESC_GRID) & (cbin > -1.0) & (cbin < DESC_GRID)
        gw = jnp.exp(-(rrot * rrot + crot * crot) / (2.0 * (0.5 * DESC_GRID) ** 2))
        m = gw * magw * inside  # (P,)
        obin = (oriw - angle) * (DESC_ORI / (2 * np.pi))
        obin = jnp.mod(obin, DESC_ORI)
        # separable trilinear weights: relu(1-|bin - i|), circular for ori
        wr = jnp.maximum(0.0, 1.0 - jnp.abs(rbin[:, None] - rgrid[None, :]))  # (P,4)
        wc = jnp.maximum(0.0, 1.0 - jnp.abs(cbin[:, None] - rgrid[None, :]))  # (P,4)
        do = jnp.abs(obin[:, None] - ogrid[None, :])
        do = jnp.minimum(do, DESC_ORI - do)
        wo = jnp.maximum(0.0, 1.0 - do)                                       # (P,8)
        A = (wr[:, :, None] * wc[:, None, :]).reshape(P, DESC_GRID * DESC_GRID)
        B = m[:, None] * wo
        hist = A.T @ B  # (16, 8) on the MXU
        v = hist.reshape(-1)
        n = jnp.sqrt(jnp.sum(v * v))
        v = jnp.where(n > 0, v / jnp.where(n > 0, n, 1.0), v)
        v = jnp.minimum(v, 0.2)
        n = jnp.sqrt(jnp.sum(v * v))
        v = jnp.where(n > 0, v / jnp.where(n > 0, n, 1.0), v)
        return jnp.minimum(512.0 * v, 255.0).astype(jnp.uint8)

    desc = lax.map(
        lambda t: one_kp(*t),
        (okps.s_int, okps.fr, okps.fc, sigma_oct, okps.angle),
        batch_size=chunk,
    )
    return desc


def orient_and_describe_fused_pallas(
    mag_p: jnp.ndarray,
    ori_p: jnp.ndarray,
    kps: RefinedKeypoints,
    cfg: SiftConfig,
    max_ori: int = 2,
    interpret: bool = False,
) -> Tuple[OrientedKeypoints, jnp.ndarray]:
    """Fused Pallas path: ONE kernel computes orientations AND descriptors,
    sharing one window DMA pair per keypoint (round-2 perf; replaces the
    assign_orientations_pallas -> compute_descriptors_pallas pair which
    fetched the same neighborhoods twice and ran a dense duplicate-slot
    grid).  Duplicate slots are i*max_ori + o (keypoint-major).

    Returns (OrientedKeypoints over cap*max_ori dense slots, desc u8)."""
    from .pallas.window import orient_desc_fused_pallas

    win = _desc_window_size(cfg)
    sigma_oct = cfg.init_sigma * 2.0 ** (kps.fs / cfg.scales)
    ang, ok, raw = orient_desc_fused_pallas(
        mag_p, ori_p, kps.s_int, kps.fr, kps.fc, sigma_oct, kps.valid,
        win=win, max_ori=max_ori, interpret=interpret,
    )
    cap = kps.fr.shape[0]

    def rep(x):
        return jnp.repeat(x, max_ori, axis=0)       # slot i*max_ori + o

    okps = OrientedKeypoints(
        s_int=rep(kps.s_int),
        fs=rep(kps.fs),
        fr=rep(kps.fr),
        fc=rep(kps.fc),
        angle=ang.reshape(-1),
        valid=ok.reshape(-1),
        count=jnp.sum(ok.astype(jnp.int32)),
    )
    desc = quantize_descriptors(raw.reshape(cap * max_ori, 128))
    return okps, desc
