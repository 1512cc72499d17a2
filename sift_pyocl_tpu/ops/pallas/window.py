"""Per-keypoint window kernels: orientation histogram and descriptor.

TPU-native replacement for the reference's per-keypoint histogram kernels
(reference: openCL/orientation_{cpu,gpu}.cl and the three
keypoints_{cpu,gpu1,gpu2}.cl::descriptor variants — SURVEY.md §2.2).  The XLA
formulation (vmapped dynamic_slice window gathers) lowers to row-at-a-time
gathers and dominates the frame time (~1 s at 1080p); here each keypoint
costs two aligned DMAs plus dense VPU math on a VMEM-resident window.

Kernel structure (one grid step = KP_BLOCK=16 keypoints, which satisfies the
(8,128) output-tile constraint and overlaps the 2*KP_BLOCK window DMAs;
16 measured better than 8 — per-step overhead, not per-keypoint compute,
dominates):

  * gradient mag/ori planes are zero-padded once per octave (pad value 0
    reproduces the reference's out-of-image skip);
  * all 2*KP_BLOCK DMAs start up-front (skipped for invalid slots), each an
    aligned (ROWS_F, 256) block — TPU DMA slice starts must be 8/128-aligned,
    so the block is rolled by the residual afterwards to put the true window
    at the origin (no unaligned slicing anywhere);
  * a fori_loop walks the 8 keypoints (loop-carried (8, N) accumulator keeps
    the Mosaic VMEM stack at one iteration's temporaries);
  * histogram math is masked dense arithmetic over the (WIN, 128) block;
    scalar bin sums are assembled into rows with iota selects (scalar stores
    to VMEM are unsupported).

Numerics mirror ops.orient_desc.{assign_orientations,compute_descriptors}
exactly; the smoothing/peak/quantization tails stay in XLA where they are
cheap and vectorized.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...oracle import DESC_GRID, DESC_ORI, MAG_FACTOR, N_ORI_BINS

PAD_R, PAD_C = 80, 256  # gradient-plane padding per side (covers WIN<=128)
KP_BLOCK = 16           # keypoints per grid step


def pad_grad_planes(mags: jnp.ndarray, oris: jnp.ndarray):
    """Zero-pad (S,H,W) gradient planes for aligned keypoint window fetches."""
    pad = ((0, 0), (PAD_R, PAD_R), (PAD_C, PAD_C))
    return jnp.pad(mags, pad), jnp.pad(oris, pad)


def build_grad_atlas(mag_list, ori_list):
    """Stack every octave's (S, H_o, W_o) gradient planes into ONE padded
    atlas (S, sum_o(H_o + 2 PAD_R), Wmax + 2 PAD_C).

    Returns (mag_atlas, ori_atlas, row_starts): octave o's unpadded origin
    sits at atlas row row_starts[o] + PAD_R.  Folding the octave offset into
    the keypoint row coordinate lets the SINGLE-octave fused kernel serve
    all octaves in one launch with zero in-kernel octave branching (the
    earlier multi-ref kernel predicated 4 DMA descriptors x n_octaves per
    keypoint).  Total copy bytes match the per-octave pad_grad_planes calls
    it replaces.
    """
    wmax = max(m.shape[2] for m in mag_list)
    mb, ob, row_starts = [], [], []
    off = 0
    for m, o in zip(mag_list, ori_list):
        S, H, W = m.shape
        pad = ((0, 0), (PAD_R, PAD_R), (PAD_C, wmax - W + PAD_C))
        mb.append(jnp.pad(m, pad))
        ob.append(jnp.pad(o, pad))
        row_starts.append(off)
        off += H + 2 * PAD_R
    return (
        jnp.concatenate(mb, axis=1),
        jnp.concatenate(ob, axis=1),
        row_starts,
    )


def _window_copy(plane_hbm, s_idx, rstart_p, cstart_p, rows_f, dest, sem):
    """Async copy descriptor for the aligned (rows_f, 256) block containing
    the window whose top-left (padded coords) is (rstart_p, cstart_p)."""
    ra = pl.multiple_of((rstart_p // 8) * 8, 8)
    ca = pl.multiple_of((cstart_p // 128) * 128, 128)
    return pltpu.make_async_copy(
        plane_hbm.at[s_idx, pl.ds(ra, rows_f), pl.ds(ca, 256)], dest, sem
    )


def _align_window(block, rstart_p, cstart_p, win):
    """Roll the fetched block so the window occupies [:win, :128]."""
    rres = rstart_p - (rstart_p // 8) * 8
    cres = cstart_p - (cstart_p // 128) * 128
    x = pltpu.roll(block, (block.shape[0] - rres) % block.shape[0], 0)
    x = pltpu.roll(x, (256 - cres) % 256, 1)
    return x[0:win, 0:128]


def _select_row(acc, j, row):
    """acc[j, :] <- row, expressed as an iota select (no dynamic stores)."""
    ridx = lax.broadcasted_iota(jnp.int32, acc.shape, 0)
    return jnp.where(ridx == j, row, acc)


def _scalar_row(scalars_and_idx, width):
    """Assemble [(idx, scalar), ...] into a (1, width) row via iota selects."""
    lane = lax.broadcasted_iota(jnp.int32, (1, width), 1)
    acc = jnp.zeros((1, width), jnp.float32)
    for idx, v in scalars_and_idx:
        acc = jnp.where(lane == idx, v, acc)
    return acc


def _start_window_dmas(valid_ref, s_ref, rs_ref, cs_ref, mag_hbm, ori_hbm,
                       magw, oriw, sems, i, rows_f):
    for j in range(KP_BLOCK):
        k = i * KP_BLOCK + j

        @pl.when(valid_ref[k] > 0)
        def _(j=j, k=k):
            _window_copy(mag_hbm, s_ref[k], rs_ref[k] + PAD_R,
                         cs_ref[k] + PAD_C, rows_f, magw.at[j],
                         sems.at[j, 0]).start()
            _window_copy(ori_hbm, s_ref[k], rs_ref[k] + PAD_R,
                         cs_ref[k] + PAD_C, rows_f, oriw.at[j],
                         sems.at[j, 1]).start()


def _wait_windows(s_ref, rs_ref, cs_ref, mag_hbm, ori_hbm, magw, oriw, sems,
                  j, k, rows_f, win):
    """Wait both DMAs of keypoint j and return origin-aligned windows."""
    rs = rs_ref[k] + PAD_R
    cs = cs_ref[k] + PAD_C
    _window_copy(mag_hbm, s_ref[k], rs, cs, rows_f, magw.at[j],
                 sems.at[j, 0]).wait()
    _window_copy(ori_hbm, s_ref[k], rs, cs, rows_f, oriw.at[j],
                 sems.at[j, 1]).wait()
    mw = _align_window(magw[j], rs, cs, win)
    ow = _align_window(oriw[j], rs, cs, win)
    return mw, ow


# ---------------------------------------------------------------------------
# Orientation histogram kernel
# ---------------------------------------------------------------------------

def _ori_kernel(s_ref, rs_ref, cs_ref, valid_ref, fr_ref, fc_ref, sig_ref,
                mag_hbm, ori_hbm, out_ref, magw, oriw, sems, *,
                win: int, rows_f: int):
    i = pl.program_id(0)
    _start_window_dmas(valid_ref, s_ref, rs_ref, cs_ref, mag_hbm, ori_hbm,
                       magw, oriw, sems, i, rows_f)

    def body(j, acc):
        k = i * KP_BLOCK + j

        def compute(acc):
            mw, ow = _wait_windows(s_ref, rs_ref, cs_ref, mag_hbm, ori_hbm,
                                   magw, oriw, sems, j, k, rows_f, win)
            fr = fr_ref[k]
            fc = fc_ref[k]
            sig = sig_ref[k]
            rr = lax.broadcasted_iota(jnp.int32, (win, 128), 0).astype(
                jnp.float32) + (rs_ref[k].astype(jnp.float32) - fr)
            cc = lax.broadcasted_iota(jnp.int32, (win, 128), 1).astype(
                jnp.float32) + (cs_ref[k].astype(jnp.float32) - fc)
            lane_ok = lax.broadcasted_iota(jnp.int32, (win, 128), 1) < win
            d2 = rr * rr + cc * cc
            sig_w = 1.5 * sig
            radius = jnp.floor(3.0 * sig_w)
            inside = (d2 < radius * radius + 0.5) & lane_ok
            w = jnp.exp(-d2 / (2.0 * sig_w * sig_w)) * mw * inside
            b = jnp.floor(
                N_ORI_BINS * (ow + np.float32(np.pi)) / np.float32(2 * np.pi)
            ).astype(jnp.int32)
            b = jnp.clip(b, 0, N_ORI_BINS - 1)
            vals = [(kk, jnp.sum(jnp.where(b == kk, w, 0.0)))
                    for kk in range(N_ORI_BINS)]
            return _select_row(acc, j, _scalar_row(vals, N_ORI_BINS))

        return lax.cond(valid_ref[k] > 0, compute, lambda a: a, acc)

    out_ref[:] = lax.fori_loop(
        0, KP_BLOCK, body, jnp.zeros((KP_BLOCK, N_ORI_BINS), jnp.float32)
    )


@functools.partial(jax.jit, static_argnames=("win", "interpret"))
def orientation_hist_pallas(
    mag_p: jnp.ndarray,
    ori_p: jnp.ndarray,
    s_int: jnp.ndarray,
    fr: jnp.ndarray,
    fc: jnp.ndarray,
    sigma: jnp.ndarray,
    valid: jnp.ndarray,
    win: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """36-bin gradient-orientation histograms, one row per keypoint slot.

    mag_p/ori_p: pad_grad_planes output (S, H+2PAD_R, W+2PAD_C).
    Returns (cap, 36) f32 (zeros for invalid slots).
    """
    cap = s_int.shape[0]
    # win <= 128 is a hard kernel limit: _align_window keeps lanes [0:128]
    # and the fetched block spans 256 lanes (residual < 128 + win <= 256).
    assert cap % KP_BLOCK == 0 and win <= 128
    rows_f = win + 8
    half = win // 2
    r0 = jnp.round(fr).astype(jnp.int32)
    c0 = jnp.round(fc).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(cap // KP_BLOCK,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (KP_BLOCK, N_ORI_BINS), lambda i, *_: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((KP_BLOCK, rows_f, 256), jnp.float32),
            pltpu.VMEM((KP_BLOCK, rows_f, 256), jnp.float32),
            pltpu.SemaphoreType.DMA((KP_BLOCK, 2)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_ori_kernel, win=win, rows_f=rows_f),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((cap, N_ORI_BINS), jnp.float32),
        interpret=interpret,
    )(
        (s_int - 1).astype(jnp.int32),
        (r0 - half).astype(jnp.int32),
        (c0 - half).astype(jnp.int32),
        valid.astype(jnp.int32),
        fr.astype(jnp.float32),
        fc.astype(jnp.float32),
        sigma.astype(jnp.float32),
        mag_p,
        ori_p,
    )


# ---------------------------------------------------------------------------
# Descriptor kernel
# ---------------------------------------------------------------------------

def _desc_kernel(s_ref, rs_ref, cs_ref, valid_ref, fr_ref, fc_ref, sig_ref,
                 ang_ref, mag_hbm, ori_hbm, out_ref, magw, oriw, sems, *,
                 win: int, rows_f: int):
    i = pl.program_id(0)
    _start_window_dmas(valid_ref, s_ref, rs_ref, cs_ref, mag_hbm, ori_hbm,
                       magw, oriw, sems, i, rows_f)

    def body(j, acc):
        k = i * KP_BLOCK + j

        def compute(acc):
            mw, ow = _wait_windows(s_ref, rs_ref, cs_ref, mag_hbm, ori_hbm,
                                   magw, oriw, sems, j, k, rows_f, win)
            fr = fr_ref[k]
            fc = fc_ref[k]
            sig = sig_ref[k]
            angle = ang_ref[k]
            dr = lax.broadcasted_iota(jnp.int32, (win, 128), 0).astype(
                jnp.float32) + (rs_ref[k].astype(jnp.float32) - fr)
            dc = lax.broadcasted_iota(jnp.int32, (win, 128), 1).astype(
                jnp.float32) + (cs_ref[k].astype(jnp.float32) - fc)
            lane_ok = lax.broadcasted_iota(jnp.int32, (win, 128), 1) < win
            spacing = np.float32(MAG_FACTOR) * sig
            cos_t = jnp.cos(angle)
            sin_t = jnp.sin(angle)
            # u = R(+angle) @ d, matching oracle.descriptor (r4 rotation fix)
            rrot = (cos_t * dr - sin_t * dc) / spacing
            crot = (sin_t * dr + cos_t * dc) / spacing
            rbin = rrot + np.float32(DESC_GRID / 2.0 - 0.5)
            cbin = crot + np.float32(DESC_GRID / 2.0 - 0.5)
            inside = (
                (rbin > -1.0) & (rbin < DESC_GRID)
                & (cbin > -1.0) & (cbin < DESC_GRID)
                & lane_ok
            )
            gw = jnp.exp(
                -(rrot * rrot + crot * crot)
                / np.float32(2.0 * (0.5 * DESC_GRID) ** 2)
            )
            m = gw * mw * inside
            obin = (ow - angle) * np.float32(DESC_ORI / (2 * np.pi))
            obin = obin - jnp.floor(obin / DESC_ORI) * DESC_ORI  # mod 8
            Cs = []
            for o in range(DESC_ORI):
                do = jnp.abs(obin - o)
                do = jnp.minimum(do, DESC_ORI - do)
                Cs.append(m * jnp.maximum(0.0, 1.0 - do))
            vals = []
            for ri in range(DESC_GRID):
                wr = jnp.maximum(0.0, 1.0 - jnp.abs(rbin - ri))
                for cj in range(DESC_GRID):
                    wrc = wr * jnp.maximum(0.0, 1.0 - jnp.abs(cbin - cj))
                    for o in range(DESC_ORI):
                        idx = (ri * DESC_GRID + cj) * DESC_ORI + o
                        vals.append((idx, jnp.sum(wrc * Cs[o])))
            return _select_row(acc, j, _scalar_row(vals, 128))

        return lax.cond(valid_ref[k] > 0, compute, lambda a: a, acc)

    out_ref[:] = lax.fori_loop(
        0, KP_BLOCK, body, jnp.zeros((KP_BLOCK, 128), jnp.float32)
    )


@functools.partial(jax.jit, static_argnames=("win", "interpret"))
def descriptor_hist_pallas(
    mag_p: jnp.ndarray,
    ori_p: jnp.ndarray,
    s_int: jnp.ndarray,
    fr: jnp.ndarray,
    fc: jnp.ndarray,
    sigma: jnp.ndarray,
    angle: jnp.ndarray,
    valid: jnp.ndarray,
    win: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Raw (unnormalized) 128-bin descriptor histograms per keypoint slot.

    Returns (dcap, 128) f32; normalization/clip/quantization happen in XLA
    (ops.orient_desc.quantize_descriptors).
    """
    cap = s_int.shape[0]
    # win <= 128: same hard limit as orientation_hist_pallas (see above).
    assert cap % KP_BLOCK == 0 and win <= 128
    rows_f = win + 8
    half = win // 2
    r0 = jnp.round(fr).astype(jnp.int32)
    c0 = jnp.round(fc).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(cap // KP_BLOCK,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (KP_BLOCK, 128), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((KP_BLOCK, rows_f, 256), jnp.float32),
            pltpu.VMEM((KP_BLOCK, rows_f, 256), jnp.float32),
            pltpu.SemaphoreType.DMA((KP_BLOCK, 2)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_desc_kernel, win=win, rows_f=rows_f),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((cap, 128), jnp.float32),
        interpret=interpret,
    )(
        (s_int - 1).astype(jnp.int32),
        (r0 - half).astype(jnp.int32),
        (c0 - half).astype(jnp.int32),
        valid.astype(jnp.int32),
        fr.astype(jnp.float32),
        fc.astype(jnp.float32),
        sigma.astype(jnp.float32),
        angle.astype(jnp.float32),
        mag_p,
        ori_p,
    )


# ---------------------------------------------------------------------------
# Fused orientation + descriptor kernel (round-2 perf: ONE window DMA pair
# per keypoint serves both histograms, and the orientation smoothing /
# peak-finding / parabolic-refinement tail runs IN-KERNEL as matmuls against
# constant circulant matrices — no second kernel launch over dense duplicate
# slots, no XLA tail between the stages.  Reference: this fuses
# orientation_{cpu,gpu}.cl + keypoints_*.cl::descriptor into one pass.)
# ---------------------------------------------------------------------------


def _ori_tail_constants(max_ori: int) -> np.ndarray:
    """(3, 128, 128) f32: [S6 smoothing, left-shift, right-shift] circulant
    matrices over the 36 orientation bins (zero outside), so the orientation
    tail (6 rounds of circular 3-tap smoothing + neighbor access) becomes
    three (1,128)x(128,128) matmuls in-kernel."""
    n = N_ORI_BINS
    S = np.zeros((128, 128), np.float64)
    for j in range(n):
        for dk in (-1, 0, 1):
            S[j, (j + dk) % n] += 1.0 / 3.0
    S6 = np.linalg.matrix_power(S, 6)
    PL = np.zeros((128, 128), np.float64)   # left[k] = h[(k-1) % 36]
    PR = np.zeros((128, 128), np.float64)   # right[k] = h[(k+1) % 36]
    for j in range(n):
        PL[j, (j + 1) % n] = 1.0
        PR[j, (j - 1) % n] = 1.0
    return np.stack([S6, PL, PR]).astype(np.float32)


def _lane_scalar(row, idx, width=128):
    """row (1, width): value at lane `idx` (dynamic) as a scalar."""
    lane = lax.broadcasted_iota(jnp.int32, (1, width), 1)
    return jnp.sum(jnp.where(lane == idx, row, 0.0))


def _kp_hist_row(mw, ow, fro, fco, sig, *, win, reduce_mode="scalar"):
    """Per-keypoint 36-bin orientation histogram as a (1, 128) row (lanes
    [0, 36)).  `fro`/`fco` are the keypoint's subpixel offsets from the
    window origin (fr - rs, fc - cs) in OCTAVE-LOCAL coordinates — keeping
    them separate from the (possibly atlas-offset) DMA row preserves exact
    f32 coordinates when one launch serves every octave.

    reduce_mode "scalar" (default): each bin is a full (win,128) masked
    scalar sum, assembled with iota selects.  "colsum" (tried round 3,
    measured SLOWER — kept as a documented-rejected variant): each bin
    lane-reduces to a (win,1) column placed into a (win,128) matrix and one
    ones(1,win) @ M matmul finishes all bins.  On-chip interleaved A/B at
    1080p: frontend 5.90 ms (scalar) vs 7.62 ms (colsum) — the per-bin
    (win,128) iota-select assembly costs more than the deep scalar
    reductions it replaces; Mosaic's full-window reductions are fast.
    f32 sums reassociate between modes (ulp-level differences)."""
    rr = lax.broadcasted_iota(jnp.int32, (win, 128), 0).astype(
        jnp.float32) - fro
    cc = lax.broadcasted_iota(jnp.int32, (win, 128), 1).astype(
        jnp.float32) - fco
    lane_ok = lax.broadcasted_iota(jnp.int32, (win, 128), 1) < win

    d2 = rr * rr + cc * cc
    sig_w = 1.5 * sig
    radius = jnp.floor(3.0 * sig_w)
    inside_o = (d2 < radius * radius + 0.5) & lane_ok
    wgt = jnp.exp(-d2 / (2.0 * sig_w * sig_w)) * mw * inside_o
    b = jnp.floor(
        N_ORI_BINS * (ow + np.float32(np.pi)) / np.float32(2 * np.pi)
    ).astype(jnp.int32)
    b = jnp.clip(b, 0, N_ORI_BINS - 1)
    if reduce_mode == "colsum":
        lane = lax.broadcasted_iota(jnp.int32, (win, 128), 1)
        M = jnp.zeros((win, 128), jnp.float32)
        for kk in range(N_ORI_BINS):
            col = jnp.sum(jnp.where(b == kk, wgt, 0.0), axis=1,
                          keepdims=True)
            M = jnp.where(lane == kk, col, M)
        return jnp.dot(jnp.ones((1, win), jnp.float32), M,
                       preferred_element_type=jnp.float32)
    hvals = [(kk, jnp.sum(jnp.where(b == kk, wgt, 0.0)))
             for kk in range(N_ORI_BINS)]
    return _scalar_row(hvals, 128)


def _block_ori_tail(H, validcol, C_ref, max_ori: int):
    """Block-vectorized orientation tail: smoothing / peak / parabolic
    refinement for ALL keypoints of the block at once.

    Round-2 perf: this used to run per keypoint inside the fori_loop — a
    serial chain of 3 tiny (1,128) matmuls plus ~6 scalar reductions per
    orientation, 16x over.  Row-wise it is 3 MXU matmuls and a handful of
    axis-1 reductions total; each row's dot products and reductions see the
    same values in the same order, so the results are bit-identical to the
    per-keypoint formulation.

    H: (B, 128) histograms (rows of invalid slots must be zero).
    validcol: (B, 1) f32 1/0 slot-validity (zeroes the aux packing of
    invalid slots exactly like the old skipped-slot behavior).
    Returns (ANG (B, max_ori), OKF (B, max_ori) f32 1/0).
    """
    B = H.shape[0]
    HS = jnp.dot(H, C_ref[0], preferred_element_type=jnp.float32)
    LEFT = jnp.dot(HS, C_ref[1], preferred_element_type=jnp.float32)
    RIGHT = jnp.dot(HS, C_ref[2], preferred_element_type=jnp.float32)
    lane = lax.broadcasted_iota(jnp.int32, (B, 128), 1)
    vlane = lane < N_ORI_BINS
    ninf = jnp.float32(-jnp.inf)
    hmax = jnp.max(jnp.where(vlane, HS, ninf), axis=1, keepdims=True)
    is_peak = (
        (HS >= 0.8 * hmax) & (HS > LEFT) & (HS > RIGHT)
        & (hmax > 0) & vlane
    )
    score = jnp.where(is_peak, HS, ninf)
    angs, oks = [], []
    for _o in range(max_ori):
        m = jnp.max(score, axis=1, keepdims=True)
        bsel = jnp.min(jnp.where(score == m, lane, 999), axis=1,
                       keepdims=True)  # tie: min index
        okk = jnp.isfinite(m)
        sel = lane == bsel
        l = jnp.sum(jnp.where(sel, LEFT, 0.0), axis=1, keepdims=True)
        rg = jnp.sum(jnp.where(sel, RIGHT, 0.0), axis=1, keepdims=True)
        h = jnp.sum(jnp.where(sel, HS, 0.0), axis=1, keepdims=True)
        denom = l - 2.0 * h + rg
        off = jnp.where(
            denom != 0.0,
            0.5 * (l - rg) / jnp.where(denom != 0.0, denom, 1.0),
            0.0,
        )
        ang = (
            np.float32(2 * np.pi)
            * (bsel.astype(jnp.float32) + 0.5 + off)
            / N_ORI_BINS
            - np.float32(np.pi)
        )
        ang = jnp.where(ang > np.float32(np.pi),
                        ang - np.float32(2 * np.pi), ang)
        ang = jnp.where(ang <= np.float32(-np.pi),
                        ang + np.float32(2 * np.pi), ang)
        angs.append(ang * validcol)
        oks.append(okk.astype(jnp.float32) * validcol)
        score = jnp.where(sel, ninf, score)
    return (
        jnp.concatenate(angs, axis=1),
        jnp.concatenate(oks, axis=1),
    )


def _kp_descriptor(mw, ow, fro, fco, sig, angle, drow, *, win, max_ori,
                   o: int, reduce_mode="scalar"):
    """Accumulate keypoint slot `o`'s raw 128-bin descriptor into drow
    (1, max_ori*128) at lane offset o*128.

    reduce_mode as in _kp_hist_row: "scalar" = 128 serial full-window
    scalar sums; "colsum" = 128 lane-reductions into a (win,128) matrix
    finished by one ones(1,win) @ M matmul (ulp-level reassociation)."""
    DW = max_ori * 128
    rr = lax.broadcasted_iota(jnp.int32, (win, 128), 0).astype(
        jnp.float32) - fro
    cc = lax.broadcasted_iota(jnp.int32, (win, 128), 1).astype(
        jnp.float32) - fco
    lane_ok = lax.broadcasted_iota(jnp.int32, (win, 128), 1) < win
    spacing_base = np.float32(MAG_FACTOR) * sig
    cos_t = jnp.cos(angle)
    sin_t = jnp.sin(angle)
    # u = R(+angle) @ d, matching oracle.descriptor (r4 rotation fix)
    rrot = (cos_t * rr - sin_t * cc) / spacing_base
    crot = (sin_t * rr + cos_t * cc) / spacing_base
    rbin = rrot + np.float32(DESC_GRID / 2.0 - 0.5)
    cbin = crot + np.float32(DESC_GRID / 2.0 - 0.5)
    inside = (
        (rbin > -1.0) & (rbin < DESC_GRID)
        & (cbin > -1.0) & (cbin < DESC_GRID)
        & lane_ok
    )
    gw = jnp.exp(
        -(rrot * rrot + crot * crot)
        / np.float32(2.0 * (0.5 * DESC_GRID) ** 2)
    )
    mm = gw * mw * inside
    obin = (ow - angle) * np.float32(DESC_ORI / (2 * np.pi))
    obin = obin - jnp.floor(obin / DESC_ORI) * DESC_ORI
    Cs = []
    for oo in range(DESC_ORI):
        do = jnp.abs(obin - oo)
        do = jnp.minimum(do, DESC_ORI - do)
        Cs.append(mm * jnp.maximum(0.0, 1.0 - do))
    if reduce_mode == "colsum":
        lane = lax.broadcasted_iota(jnp.int32, (win, 128), 1)
        M = jnp.zeros((win, 128), jnp.float32)
        for ri in range(DESC_GRID):
            wr = jnp.maximum(0.0, 1.0 - jnp.abs(rbin - ri))
            for cj in range(DESC_GRID):
                wrc = wr * jnp.maximum(0.0, 1.0 - jnp.abs(cbin - cj))
                for oo in range(DESC_ORI):
                    bin_ = (ri * DESC_GRID + cj) * DESC_ORI + oo
                    col = jnp.sum(wrc * Cs[oo], axis=1, keepdims=True)
                    M = jnp.where(lane == bin_, col, M)
        row = jnp.dot(jnp.ones((1, win), jnp.float32), M,
                      preferred_element_type=jnp.float32)
        parts = [jnp.zeros((1, 128), jnp.float32)] * max_ori
        parts[o] = row
        return drow + jnp.concatenate(parts, axis=1)
    vals = []
    for ri in range(DESC_GRID):
        wr = jnp.maximum(0.0, 1.0 - jnp.abs(rbin - ri))
        for cj in range(DESC_GRID):
            wrc = wr * jnp.maximum(0.0, 1.0 - jnp.abs(cbin - cj))
            for oo in range(DESC_ORI):
                idx = o * 128 + (ri * DESC_GRID + cj) * DESC_ORI + oo
                vals.append((idx, jnp.sum(wrc * Cs[oo])))
    return drow + _scalar_row(vals, DW)



def _fused_kernel(s_ref, rs_ref, cs_ref, valid_ref, fro_ref, fco_ref, sig_ref,
                  C_ref, mag_hbm, ori_hbm, aux_ref, desc_ref,
                  magw, oriw, sems, *, win: int, rows_f: int, max_ori: int,
                  reduce_mode: str = "scalar"):
    i = pl.program_id(0)
    DW = max_ori * 128
    # block-level skip: capacity tails are fully-invalid blocks — one branch
    # instead of per-slot DMA predicates and conds
    anyv = valid_ref[i * KP_BLOCK] > 0
    for j in range(1, KP_BLOCK):
        anyv = anyv | (valid_ref[i * KP_BLOCK + j] > 0)

    @pl.when(jnp.logical_not(anyv))
    def _():
        aux_ref[:] = jnp.zeros((KP_BLOCK, 128), jnp.float32)
        desc_ref[:] = jnp.zeros((KP_BLOCK, DW), jnp.float32)

    @pl.when(anyv)
    def _():
        _start_window_dmas(valid_ref, s_ref, rs_ref, cs_ref, mag_hbm,
                           ori_hbm, magw, oriw, sems, i, rows_f)

        # Phase A: per-keypoint dense histograms (windows stay in scratch).
        def hist_body(j, H):
            k = i * KP_BLOCK + j

            def compute(H):
                mw, ow = _wait_windows(s_ref, rs_ref, cs_ref, mag_hbm,
                                       ori_hbm, magw, oriw, sems, j, k,
                                       rows_f, win)
                hrow = _kp_hist_row(mw, ow, fro_ref[k], fco_ref[k],
                                    sig_ref[k], win=win,
                                    reduce_mode=reduce_mode)
                return _select_row(H, j, hrow)

            return lax.cond(valid_ref[k] > 0, compute, lambda H: H, H)

        H = lax.fori_loop(
            0, KP_BLOCK, hist_body, jnp.zeros((KP_BLOCK, 128), jnp.float32)
        )

        # Phase B: block-vectorized smoothing/peak/parabolic tail.
        rowi1 = lax.broadcasted_iota(jnp.int32, (KP_BLOCK, 1), 0)
        vv = jnp.zeros((KP_BLOCK, 1), jnp.float32)
        for j in range(KP_BLOCK):
            vj = jnp.where(valid_ref[i * KP_BLOCK + j] > 0, 1.0, 0.0)
            vv = jnp.where(rowi1 == j, vj, vv)
        ANG, OKF = _block_ori_tail(H, vv, C_ref, max_ori)

        lane = lax.broadcasted_iota(jnp.int32, (KP_BLOCK, 128), 1)
        aux = jnp.zeros((KP_BLOCK, 128), jnp.float32)
        for o in range(max_ori):
            aux = jnp.where(lane == o, ANG[:, o:o + 1], aux)
            aux = jnp.where(lane == 8 + o, OKF[:, o:o + 1], aux)
        aux_ref[:] = aux

        # Phase C: per-(keypoint, orientation) descriptors; windows are
        # re-aligned from the scratch blocks (already DMA'd and waited).
        rowi = lax.broadcasted_iota(jnp.int32, (KP_BLOCK, max_ori), 0)
        coli = lax.broadcasted_iota(jnp.int32, (KP_BLOCK, max_ori), 1)

        def desc_body(j, desc_acc):
            k = i * KP_BLOCK + j

            def compute(desc_acc):
                rs = rs_ref[k] + PAD_R
                cs = cs_ref[k] + PAD_C
                mw = _align_window(magw[j], rs, cs, win)
                ow = _align_window(oriw[j], rs, cs, win)
                drow = jnp.zeros((1, DW), jnp.float32)
                for o in range(max_ori):
                    sel = (rowi == j) & (coli == o)
                    ang_jo = jnp.sum(jnp.where(sel, ANG, 0.0))
                    ok_jo = jnp.sum(jnp.where(sel, OKF, 0.0)) > 0.5
                    drow = lax.cond(
                        ok_jo,
                        functools.partial(
                            _kp_descriptor, mw, ow, fro_ref[k], fco_ref[k],
                            sig_ref[k], ang_jo, win=win, max_ori=max_ori,
                            o=o, reduce_mode=reduce_mode,
                        ),
                        lambda d: d,
                        drow,
                    )
                return _select_row(desc_acc, j, drow)

            return lax.cond(valid_ref[k] > 0, compute,
                            lambda d: d, desc_acc)

        desc_ref[:] = lax.fori_loop(
            0, KP_BLOCK, desc_body, jnp.zeros((KP_BLOCK, DW), jnp.float32)
        )


@functools.partial(
    jax.jit, static_argnames=("win", "max_ori", "interpret", "reduce_mode")
)
def orient_desc_fused_pallas(
    mag_p: jnp.ndarray,
    ori_p: jnp.ndarray,
    s_int: jnp.ndarray,
    fr: jnp.ndarray,
    fc: jnp.ndarray,
    sigma: jnp.ndarray,
    valid: jnp.ndarray,
    win: int,
    max_ori: int = 2,
    interpret: bool = False,
    row_off=None,
    reduce_mode: str = "scalar",
):
    """Fused orientation assignment + raw descriptors.

    Returns (angles (cap, max_ori) f32, ok (cap, max_ori) bool,
             desc_raw (cap, max_ori, 128) f32) — slot (i, o) is keypoint i's
    o-th orientation.  `win` must be the DESC window size (covers the
    orientation radius).  Numerics match assign_orientations +
    compute_descriptors up to f32 summation-order ulps.

    `row_off` (cap,) int32, optional: per-keypoint row offset added ONLY to
    the DMA row — lets one launch serve every octave when mag_p/ori_p is a
    build_grad_atlas stack (fr/fc stay octave-local, so subpixel coordinate
    math is bit-identical to the per-octave launches).
    """
    cap = s_int.shape[0]
    # max_ori <= 8: the aux row packs angles in lanes [0,8) and ok flags in
    # [8,8+max_ori)
    assert cap % KP_BLOCK == 0 and win <= 128 and max_ori <= 8
    rows_f = win + 8
    half = win // 2
    r0 = jnp.round(fr).astype(jnp.int32)
    c0 = jnp.round(fc).astype(jnp.int32)
    DW = max_ori * 128
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(cap // KP_BLOCK,),
        in_specs=[
            pl.BlockSpec((3, 128, 128), lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((KP_BLOCK, 128), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KP_BLOCK, DW), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((KP_BLOCK, rows_f, 256), jnp.float32),
            pltpu.VMEM((KP_BLOCK, rows_f, 256), jnp.float32),
            pltpu.SemaphoreType.DMA((KP_BLOCK, 2)),
        ],
    )
    rs = r0 - half
    rs_dma = rs if row_off is None else rs + row_off.astype(jnp.int32)
    aux, desc = pl.pallas_call(
        functools.partial(
            _fused_kernel, win=win, rows_f=rows_f, max_ori=max_ori,
            reduce_mode=reduce_mode,
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((cap, 128), jnp.float32),
            jax.ShapeDtypeStruct((cap, DW), jnp.float32),
        ),
        interpret=interpret,
    )(
        (s_int - 1).astype(jnp.int32),
        rs_dma.astype(jnp.int32),
        (c0 - half).astype(jnp.int32),
        valid.astype(jnp.int32),
        # octave-local subpixel offsets from the window origin (exact f32)
        (fr - rs).astype(jnp.float32),
        (fc - (c0 - half)).astype(jnp.float32),
        sigma.astype(jnp.float32),
        jnp.asarray(_ori_tail_constants(max_ori)),
        mag_p,
        ori_p,
    )
    angles = aux[:, :max_ori]
    ok = aux[:, 8 : 8 + max_ori] > 0.5
    return angles, ok, desc.reshape(cap, max_ori, 128)

