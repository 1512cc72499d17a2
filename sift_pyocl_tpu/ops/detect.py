"""DoG extrema detection, compaction and subpixel refinement as XLA ops.

TPU-native replacement for the reference's detection kernels
(reference: openCL/image.cl::{local_maxmin, compact, interp_keypoint},
SURVEY.md §2.2).  The reference appends candidates with atomic counters and
reads the counter back to the host per scale (the hot-loop sync noted in
SURVEY.md §3.2); here the whole DoG stack is scanned with one vectorized
26-neighbor comparison, and candidates are compacted into a *static-capacity*
buffer with `jnp.nonzero(size=...)` — no atomics, no host sync, fully jittable.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..config import SiftConfig


class Candidates(NamedTuple):
    """Static-capacity candidate buffer for one octave."""

    s: jnp.ndarray       # (cap,) int32 scale index in [1, scales]
    r: jnp.ndarray       # (cap,) int32 row
    c: jnp.ndarray       # (cap,) int32 col
    valid: jnp.ndarray   # (cap,) bool
    count: jnp.ndarray   # () int32 true number of extrema (may exceed cap)


class RefinedKeypoints(NamedTuple):
    """Refined keypoints for one octave (octave-local coordinates)."""

    s_int: jnp.ndarray   # (cap,) int32 original integer scale index
    fs: jnp.ndarray      # (cap,) f32 refined scale coordinate
    fr: jnp.ndarray      # (cap,) f32 refined row
    fc: jnp.ndarray      # (cap,) f32 refined col
    peak: jnp.ndarray    # (cap,) f32 interpolated DoG value
    valid: jnp.ndarray   # (cap,) bool


def extrema_mask(dogs: jnp.ndarray, cfg: SiftConfig, octave: int,
                 variant: str = "stencil") -> jnp.ndarray:
    """Boolean mask (scales, H-2bd, W-2bd) of accepted extrema candidates.

    Conditions as in oracle.local_maxmin: strict 26-neighbor max/min,
    |v| > 0.8*peak_thresh, spatial-Hessian edge rejection, border margin.

    variant "stencil" (default): 26 shifted compares, fused by XLA into one
    stencil loop with no intermediates.  "pools": shared separable 3-max/min
    pools (52 -> ~18 vector ops; exact — max of maxes is the max of the
    union, so `v > max(neighbors)` is `v > every neighbor` for non-NaN
    floats) — but XLA materializes the pool intermediates (~24 MB per
    octave-0 stage), and on-chip it measured ~0.2 ms SLOWER at 1080p than
    the fused stencil; kept as a documented-rejected variant.
    """
    S, H, W = dogs.shape
    bd = cfg.border_dist
    # octsize<=1 rule (see oracle.local_maxmin): edge_thresh1 for octave 0,
    # and for octave 1 too when double_im_size (octsize ladder starts at 0.5)
    octsize = 2.0 ** (octave - 1) if cfg.double_im_size else 2.0 ** octave
    eth = cfg.edge_thresh1 if octsize <= 1.0 else cfg.edge_thresh

    v = dogs[1 : S - 1, bd : H - bd, bd : W - bd]
    strong = jnp.abs(v) > 0.8 * cfg.peak_thresh

    if variant == "pools":
        def nb_extreme(op):
            # mh[s, r, c] = op over dogs[s, r, c-1:c+2]  -> (S, H, W-2)
            mh = op(dogs[:, :, :-2], op(dogs[:, :, 1:-1], dogs[:, :, 2:]))
            # m33[s, r, c] = op over the 3x3 window centered (r+1, c+1)
            m33 = op(mh[:, :-2], op(mh[:, 1:-1], mh[:, 2:]))  # (S,H-2,W-2)
            c33 = m33[:, bd - 1 : H - bd - 1, bd - 1 : W - bd - 1]
            # adjacent scales contribute their full 3x3 windows
            inter = op(c33[: S - 2], c33[2:])
            # in-plane 8 neighbors: rows above/below via mh, plus left/right
            mhc = mh[1 : S - 1, :, bd - 1 : W - bd - 1]
            above = mhc[:, bd - 1 : H - bd - 1]
            below = mhc[:, bd + 1 : H - bd + 1]
            lr = op(
                dogs[1 : S - 1, bd : H - bd, bd - 1 : W - bd - 1],
                dogs[1 : S - 1, bd : H - bd, bd + 1 : W - bd + 1],
            )
            return op(inter, op(op(above, below), lr))

        is_max = v > nb_extreme(jnp.maximum)
        is_min = v < nb_extreme(jnp.minimum)
    else:
        is_max = jnp.ones_like(strong)
        is_min = jnp.ones_like(strong)
        for ds in (-1, 0, 1):
            for dr in (-1, 0, 1):
                for dc in (-1, 0, 1):
                    if ds == 0 and dr == 0 and dc == 0:
                        continue
                    nb = dogs[
                        1 + ds : S - 1 + ds,
                        bd + dr : H - bd + dr,
                        bd + dc : W - bd + dc,
                    ]
                    is_max = is_max & (v > nb)
                    is_min = is_min & (v < nb)
    cand = strong & (is_max | is_min)

    # edge rejection on the 2x2 spatial Hessian of each DoG slice
    d = dogs[1 : S - 1]
    ctr = d[:, bd : H - bd, bd : W - bd]
    hxx = d[:, bd : H - bd, bd - 1 : W - bd - 1] + d[:, bd : H - bd, bd + 1 : W - bd + 1] - 2 * ctr
    hyy = d[:, bd - 1 : H - bd - 1, bd : W - bd] + d[:, bd + 1 : H - bd + 1, bd : W - bd] - 2 * ctr
    hxy = 0.25 * (
        d[:, bd + 1 : H - bd + 1, bd + 1 : W - bd + 1]
        - d[:, bd + 1 : H - bd + 1, bd - 1 : W - bd - 1]
        - d[:, bd - 1 : H - bd - 1, bd + 1 : W - bd + 1]
        + d[:, bd - 1 : H - bd - 1, bd - 1 : W - bd - 1]
    )
    det = hxx * hyy - hxy * hxy
    tr = hxx + hyy
    not_edge = (det > 0) & (det >= eth * tr * tr)
    return cand & not_edge


def compact_extrema(mask: jnp.ndarray, cfg: SiftConfig, cap: int) -> Candidates:
    """Stream-compact the extrema mask into a static-capacity index buffer.

    Replaces the reference's atomic-append + counter-readback + compact kernel
    (image.cl::compact) with `nonzero(size=cap)`.
    """
    Sm, Hm, Wm = mask.shape  # margins already removed
    bd = cfg.border_dist
    flat = mask.reshape(-1)
    count = jnp.sum(flat.astype(jnp.int32))
    (idx,) = jnp.nonzero(flat, size=cap, fill_value=-1)
    valid = idx >= 0
    idx = jnp.maximum(idx, 0)
    s = idx // (Hm * Wm) + 1
    rem = idx % (Hm * Wm)
    r = rem // Wm + bd
    c = rem % Wm + bd
    return Candidates(
        s.astype(jnp.int32), r.astype(jnp.int32), c.astype(jnp.int32), valid, count
    )


def _grad_hess_3x3x3(cube: jnp.ndarray):
    """3-D gradient and Hessian from a 3x3x3 DoG neighborhood (center 1,1,1)."""
    d = cube
    g = jnp.stack(
        [
            0.5 * (d[2, 1, 1] - d[0, 1, 1]),
            0.5 * (d[1, 2, 1] - d[1, 0, 1]),
            0.5 * (d[1, 1, 2] - d[1, 1, 0]),
        ]
    )
    ctr = d[1, 1, 1]
    hss = d[2, 1, 1] + d[0, 1, 1] - 2 * ctr
    hrr = d[1, 2, 1] + d[1, 0, 1] - 2 * ctr
    hcc = d[1, 1, 2] + d[1, 1, 0] - 2 * ctr
    hsr = 0.25 * (d[2, 2, 1] - d[2, 0, 1] - d[0, 2, 1] + d[0, 0, 1])
    hsc = 0.25 * (d[2, 1, 2] - d[2, 1, 0] - d[0, 1, 2] + d[0, 1, 0])
    hrc = 0.25 * (d[1, 2, 2] - d[1, 2, 0] - d[1, 0, 2] + d[1, 0, 0])
    H = jnp.array(
        [[hss, hsr, hsc], [hsr, hrr, hrc], [hsc, hrc, hcc]], dtype=cube.dtype
    )
    return g, H


def _solve3(H: jnp.ndarray, b: jnp.ndarray):
    """Solve H x = b for 3x3 symmetric H via the adjugate (vmap/TPU friendly).

    Returns (x, ok) where ok=False for (near-)singular systems — the analog of
    the oracle's LinAlgError rejection.
    """
    a, bb, cc = H[0, 0], H[0, 1], H[0, 2]
    d, e = H[1, 1], H[1, 2]
    f = H[2, 2]
    det = a * (d * f - e * e) - bb * (bb * f - e * cc) + cc * (bb * e - d * cc)
    adj = jnp.array(
        [
            [d * f - e * e, cc * e - bb * f, bb * e - cc * d],
            [e * cc - bb * f, a * f - cc * cc, bb * cc - a * e],
            [bb * e - d * cc, cc * bb - a * e, a * d - bb * bb],
        ],
        dtype=H.dtype,
    )
    ok = jnp.abs(det) > 1e-30
    safe_det = jnp.where(ok, det, 1.0)
    return (adj @ b) / safe_det, ok


def refine_candidates(
    dogs: jnp.ndarray, cands: Candidates, cfg: SiftConfig
) -> RefinedKeypoints:
    """Batched iterative 3-D quadratic refinement (image.cl::interp_keypoint).

    Mirrors oracle.interp_keypoint: up to cfg.max_interp_moves re-centering
    steps (move a pixel when |offset| > 0.6 and the move stays inside the
    border), then a final solve; accept iff |peak| > peak_thresh and all
    offset components are within 1.5.
    """
    S, H, W = dogs.shape
    bd = cfg.border_dist

    def one(s, r, c):
        def gather_solve(r_, c_):
            cube = lax.dynamic_slice(dogs, (s - 1, r_ - 1, c_ - 1), (3, 3, 3))
            g, Hm = _grad_hess_3x3x3(cube)
            off, ok = _solve3(Hm, -g)
            return cube, g, off, ok

        def body(_, state):
            r_, c_ = state
            _, _, off, _ = gather_solve(r_, c_)
            converged = (jnp.abs(off[1]) <= 0.6) & (jnp.abs(off[2]) <= 0.6)
            dr = jnp.where(off[1] > 0.6, 1, jnp.where(off[1] < -0.6, -1, 0))
            dc = jnp.where(off[2] > 0.6, 1, jnp.where(off[2] < -0.6, -1, 0))
            # clamp moves inside the border (oracle move rule)
            dr = jnp.where((dr > 0) & (r_ + 1 >= H - bd), 0, dr)
            dr = jnp.where((dr < 0) & (r_ - 1 < bd), 0, dr)
            dc = jnp.where((dc > 0) & (c_ + 1 >= W - bd), 0, dc)
            dc = jnp.where((dc < 0) & (c_ - 1 < bd), 0, dc)
            r_ = jnp.where(converged, r_, r_ + dr)
            c_ = jnp.where(converged, c_, c_ + dc)
            return (r_, c_)

        r_f, c_f = lax.fori_loop(0, cfg.max_interp_moves, body, (r, c))
        cube, g, off, ok = gather_solve(r_f, c_f)
        peak = cube[1, 1, 1] + 0.5 * jnp.dot(g, off)
        accept = (
            ok
            & (jnp.abs(peak) > cfg.peak_thresh)
            & jnp.all(jnp.abs(off) <= 1.5)
        )
        return (
            s,
            s.astype(jnp.float32) + off[0],
            r_f.astype(jnp.float32) + off[1],
            c_f.astype(jnp.float32) + off[2],
            peak,
            accept,
        )

    s_i, fs, fr, fc, peak, acc = jax.vmap(one)(cands.s, cands.r, cands.c)
    return RefinedKeypoints(s_i, fs, fr, fc, peak, acc & cands.valid)


def detect_octave(
    dogs: jnp.ndarray, cfg: SiftConfig, octave: int, cap: int
) -> RefinedKeypoints:
    """Full detection for one octave: extrema -> compact -> refine."""
    mask = extrema_mask(dogs, cfg, octave)
    cands = compact_extrema(mask, cfg, cap)
    return refine_candidates(dogs, cands, cfg)


def decode_compacted(octave_dogs, masks, caps, row_starts, idx_all, written,
                     bd: int):
    """Compacted flat mask indices -> atlas-refine candidate arrays.

    Maps each octave's slice of `idx_all` (compact_masks_multi output, flat
    row-major indices into its (S-2, H-2bd, W-2bd) mask) to per-candidate
    (scale, atlas row, col) plus the octave's border-clamp bounds.  Shared
    by detect_all_octaves_pallas and the refine microbench
    (tools/ab_refine.py) so the benchmark always feeds the production
    decode.  Returns (s, r_atlas, c, valid, rlo, rhi, clo, chi), each
    (sum(caps),).
    """
    s_l, r_l, c_l, v_l = [], [], [], []
    rlo_l, rhi_l, clo_l, chi_l = [], [], [], []
    off = 0
    for o, (dogs, mask, cap) in enumerate(zip(octave_dogs, masks, caps)):
        S, H, W = dogs.shape
        Sm, Hm, Wm = mask.shape
        idx = lax.dynamic_slice(idx_all, (off,), (cap,))
        off += cap
        valid = jnp.arange(cap, dtype=jnp.int32) < written[o]
        idx = jnp.where(valid, idx, 0)
        s_l.append((idx // (Hm * Wm) + 1).astype(jnp.int32))
        rem = idx % (Hm * Wm)
        r_l.append((rem // Wm + bd + row_starts[o]).astype(jnp.int32))
        c_l.append((rem % Wm + bd).astype(jnp.int32))
        v_l.append(valid)
        rlo_l.append(jnp.full((cap,), row_starts[o] + bd, jnp.int32))
        rhi_l.append(jnp.full((cap,), row_starts[o] + H - bd, jnp.int32))
        clo_l.append(jnp.full((cap,), bd, jnp.int32))
        chi_l.append(jnp.full((cap,), W - bd, jnp.int32))
    return (jnp.concatenate(s_l), jnp.concatenate(r_l),
            jnp.concatenate(c_l), jnp.concatenate(v_l),
            jnp.concatenate(rlo_l), jnp.concatenate(rhi_l),
            jnp.concatenate(clo_l), jnp.concatenate(chi_l))


def detect_all_octaves_pallas(
    octave_dogs, cfg: SiftConfig, caps, interpret: bool = False,
    oct_ids=None, masks=None,
):
    """Detection for ALL octaves with ONE compaction launch.

    octave_dogs: list of per-octave DoG stacks; caps: per-octave candidate
    capacities.  Same numerics as per-octave `detect_octave_pallas`; the
    seven per-octave compact launches (~0.13 ms each of pure launch
    overhead at 1080p) collapse into one multi-cursor kernel
    (ops.pallas.compact.compact_masks_multi), and the seven refine
    launches into ONE atlas launch: every octave's padded DoG stack lives
    in one (S, sum H_o, Wmax) array with per-candidate row offsets and
    clamp bounds (ops.pallas.refine.refine_atlas_pallas) — offset
    arithmetic instead of the per-ref @pl.when branching that measured
    0.4 ms slower.  Returns a list of (RefinedKeypoints, extrema_count).
    """
    from .pallas.compact import compact_masks_multi
    from .pallas.refine import build_dog_atlas, refine_atlas_pallas

    bd = cfg.border_dist
    if oct_ids is None:
        oct_ids = list(range(len(octave_dogs)))
    atlas, row_starts = build_dog_atlas(octave_dogs)
    if masks is not None:
        # fused in-ladder masks (ops.pallas.ladder{0,}.py mask_cfg path);
        # octaves whose ladder did not run fall back to the XLA stencil
        masks = [m if m is not None else extrema_mask(d, cfg, o)
                 for m, o, d in zip(masks, oct_ids, octave_dogs)]
    elif cfg.mask_backend == "pallas":
        from .pallas.maskk import extrema_masks_atlas_pallas

        masks = extrema_masks_atlas_pallas(
            atlas, row_starts, [d.shape for d in octave_dogs], cfg,
            interpret=interpret, oct_ids=oct_ids,
        )
    else:
        masks = [extrema_mask(d, cfg, o)
                 for o, d in zip(oct_ids, octave_dogs)]
    idx_all, written, total = compact_masks_multi(
        masks, list(caps), interpret=interpret
    )
    s_cat, r_cat, c_cat, v_cat, rlo, rhi, clo, chi = decode_compacted(
        octave_dogs, masks, caps, row_starts, idx_all, written, bd
    )
    offs = [sum(caps[:o]) for o in range(len(caps))]
    s_l = [s_cat[off : off + cap] for off, cap in zip(offs, caps)]
    v_l = [v_cat[off : off + cap] for off, cap in zip(offs, caps)]
    fs, fr_a, fc, peak, acc = refine_atlas_pallas(
        atlas, s_cat, r_cat, c_cat, v_cat, rlo, rhi, clo, chi,
        peak_thresh=cfg.peak_thresh, max_moves=cfg.max_interp_moves,
        interpret=interpret,
    )
    out = []
    off = 0
    for o, cap in enumerate(caps):
        sl = slice(off, off + cap)
        kps = RefinedKeypoints(
            s_int=s_l[o],
            fs=fs[sl],
            fr=fr_a[sl] - row_starts[o],
            fc=fc[sl],
            peak=peak[sl],
            valid=(acc[sl] > 0) & v_l[o],
        )
        out.append((kps, total[o]))
        off += cap
    return out


def detect_octave_pallas(
    dogs: jnp.ndarray, cfg: SiftConfig, octave: int, cap: int,
    interpret: bool = False,
) -> Tuple[RefinedKeypoints, jnp.ndarray]:
    """Pallas detection path: kernel compaction + kernel refinement.

    Same numerics as `detect_octave` (oracle.local_maxmin/interp_keypoint);
    the XLA `nonzero` and vmapped-gather refinement are replaced by
    ops.pallas.{compact,refine} kernels (SURVEY.md §2.2 image.cl rows).
    Returns (keypoints, true_extrema_count).
    """
    from .pallas.compact import compact_mask_pallas
    from .pallas.refine import pad_dogs, refine_pallas

    S, H, W = dogs.shape
    bd = cfg.border_dist
    mask = extrema_mask(dogs, cfg, octave)
    Sm, Hm, Wm = mask.shape
    idx, written, total = compact_mask_pallas(mask, cap, interpret=interpret)
    valid = jnp.arange(cap, dtype=jnp.int32) < written
    idx = jnp.where(valid, idx, 0)
    s = (idx // (Hm * Wm) + 1).astype(jnp.int32)
    rem = idx % (Hm * Wm)
    r = (rem // Wm + bd).astype(jnp.int32)
    c = (rem % Wm + bd).astype(jnp.int32)
    fs, fr, fc, peak, acc = refine_pallas(
        pad_dogs(dogs), s, r, c, valid,
        H=H, W=W, bd=bd, peak_thresh=cfg.peak_thresh,
        max_moves=cfg.max_interp_moves, interpret=interpret,
    )
    kps = RefinedKeypoints(
        s_int=s, fs=fs, fr=fr, fc=fc, peak=peak,
        valid=(acc > 0) & valid,
    )
    return kps, total
