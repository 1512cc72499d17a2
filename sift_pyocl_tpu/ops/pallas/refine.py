"""Iterative subpixel keypoint refinement as a Pallas TPU kernel.

TPU-native replacement for the reference's interpolation kernel
(reference: openCL/image.cl::interp_keypoint — SURVEY.md §2.2).  The XLA
formulation (vmapped dynamic_slice of 3x3x3 cubes per candidate, 5 move
iterations) lowers to row-at-a-time gathers and costs ~70 ms/frame at 1080p;
here each candidate costs one 3-plane DMA plus vector math:

  * DMA a (3, 24, 256) DoG window around the candidate (aligned origin — TPU
    DMA slice starts must be 8/128-aligned, the residual is carried as a
    local coordinate offset);
  * compute gradient/Hessian/offset/peak planes DENSELY over the window with
    static `pltpu.roll` shifts (the 3x3x3 stencil becomes ~45 VPU ops);
  * run the <=5 re-centering moves as scalar iterations, reading the dense
    offset planes at the current position via a dynamic single-row ref
    slice + (1, COLS) lane one-hot (TPU has no unaligned scalar VMEM
    loads; the planes are staged once into a small VMEM scratch so each
    read touches one row instead of the whole window);
  * write per-candidate results to SMEM outputs.

Numerics match ops.detect.refine_candidates / oracle.interp_keypoint: move
while |offset| > 0.6 (clamped inside the border), accept iff the final solve
succeeds, |peak| > peak_thresh and all |offset| <= 1.5.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, COLS = 24, 256   # window block (covers +-6 px moves + 8/128 residuals)
PAD_R, PAD_C = 24, 256  # DoG stack padding (rows, cols) on each side


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def pad_dogs(dogs: jnp.ndarray) -> jnp.ndarray:
    """Zero-pad the (S,H,W) DoG stack for aligned window fetches."""
    return jnp.pad(dogs, ((0, 0), (PAD_R, PAD_R), (PAD_C, PAD_C)))


def _at_row(pln, p, rr, cc):
    """Scalar read pln[p, rr, cc] from a VMEM scratch ref: dynamic-slice ONE
    row (refs support dynamic sublane starts), then a (1, COLS) lane one-hot
    reduction.  ~24x fewer vreg ops than the dense full-plane `_at`, which
    dominated this kernel's per-candidate cost (measured: the move loop +
    final sampling were ~half the refine time at 12 full-plane one-hots per
    candidate)."""
    row = pln[p, pl.ds(rr, 1), :]
    oh = lax.broadcasted_iota(jnp.int32, (1, COLS), 1) == cc
    return jnp.sum(jnp.where(oh, row, 0.0))


KP_BLOCK = 16  # candidates per grid step (amortizes step overhead, overlaps
               # DMA; 16 measured better than 8 — per-step overhead, not
               # per-candidate compute, dominates this kernel)


def _window_copy(dogs_hbm, s, r, c, dest, sem):
    """Async copy of the (3, ROWS, COLS) aligned DoG window for (s, r, c)."""
    rp = r - 6 + PAD_R
    cp = c - 6 + PAD_C
    ra = pl.multiple_of((rp // 8) * 8, 8)
    ca = pl.multiple_of((cp // 128) * 128, 128)
    return pltpu.make_async_copy(
        dogs_hbm.at[pl.ds(s - 1, 3), pl.ds(ra, ROWS), pl.ds(ca, COLS)],
        dest, sem,
    )


def _db_start_block(valid_ref, s_ref, r_ref, c_ref, dogs_hbm, win, sems, b):
    """Start block b's window DMAs into double buffer b % 2 (valid slots
    only — per-octave validity is a prefix, so invalid slots never have a
    matching wait)."""
    buf = b % 2
    for j in range(KP_BLOCK):
        k = b * KP_BLOCK + j

        @pl.when(valid_ref[k] > 0)
        def _(j=j, k=k):
            _window_copy(dogs_hbm, s_ref[k], r_ref[k], c_ref[k],
                         win.at[buf, j], sems.at[buf, j]).start()


def _db_prologue(valid_ref, s_ref, r_ref, c_ref, dogs_hbm, win, sems, i):
    """Cross-step DMA pipelining: block i's windows were started during step
    i-1 (into buffer i % 2); this prologue starts block i+1's into the other
    buffer so its HBM latency hides behind block i's compute.  Step 0 starts
    its own block first and eats the latency once per launch.  Grid steps
    run sequentially, so buffer (i+1) % 2 — last read by step i-1 — is free."""
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        _db_start_block(valid_ref, s_ref, r_ref, c_ref, dogs_hbm, win,
                        sems, jnp.int32(0))

    @pl.when(i + 1 < n)
    def _():
        _db_start_block(valid_ref, s_ref, r_ref, c_ref, dogs_hbm, win,
                        sems, i + 1)


def _refine_blocks(i, s_ref, r_ref, c_ref, valid_ref, bounds, dogs_hbm,
                   fs_out, fr_out, fc_out, peak_out, acc_out,
                   win, sems, pln, *, peak_thresh, max_moves):
    """Shared refine body of `_kernel` / `_kernel_atlas` (their only real
    difference is where the border clamps come from): double-buffer DMA
    prologue, block-level skip, per-candidate dense stencil + early-exit
    move loop.  `bounds(k)` -> (rlo, rhi, clo, chi) clamp bounds in the
    DMA'd array's row coordinates — static image bounds for the per-octave
    kernel, per-candidate prefetched scalars for the atlas kernel."""
    buf = i % 2
    _db_prologue(valid_ref, s_ref, r_ref, c_ref, dogs_hbm, win, sems, i)
    # block-level skip: capacity tails are fully-invalid blocks (per-octave
    # validity is a prefix) — one branch instead of per-slot conds
    anyv = valid_ref[i * KP_BLOCK] > 0
    for j in range(1, KP_BLOCK):
        anyv = anyv | (valid_ref[i * KP_BLOCK + j] > 0)

    @pl.when(jnp.logical_not(anyv))
    def _():
        for j in range(KP_BLOCK):
            k = i * KP_BLOCK + j
            fs_out[k] = 0.0
            fr_out[k] = 0.0
            fc_out[k] = 0.0
            peak_out[k] = 0.0
            acc_out[k] = 0

    def body(j, carry):
        k = i * KP_BLOCK + j
        ok_slot = valid_ref[k] > 0

        @pl.when(jnp.logical_not(ok_slot))
        def _():
            fs_out[k] = 0.0
            fr_out[k] = 0.0
            fc_out[k] = 0.0
            peak_out[k] = 0.0
            acc_out[k] = 0

        @pl.when(ok_slot)
        def _():
            _one(j, k)

        return carry

    def _one(j, k):
        s = s_ref[k]
        r = r_ref[k]
        c = c_ref[k]
        rlo, rhi, clo, chi = bounds(k)
        _window_copy(dogs_hbm, s, r, c, win.at[buf, j],
                     sems.at[buf, j]).wait()
        # local coords of the candidate center inside the window
        rp = r - 6 + PAD_R
        cp = c - 6 + PAD_C
        lr0 = rp - (rp // 8) * 8 + 6
        lc0 = cp - (cp // 128) * 128 + 6

        w0 = win[buf, j, 0]
        w1 = win[buf, j, 1]
        w2 = win[buf, j, 2]

        def sh(x, dr, dc):
            # pltpu.roll requires non-negative shifts; -d == size - d
            y = x
            if dr:
                y = pltpu.roll(y, (-dr) % ROWS, 0)
            if dc:
                y = pltpu.roll(y, (-dc) % COLS, 1)
            return y

        gs = 0.5 * (w2 - w0)
        gr = 0.5 * (sh(w1, 1, 0) - sh(w1, -1, 0))
        gc = 0.5 * (sh(w1, 0, 1) - sh(w1, 0, -1))
        hss = w2 + w0 - 2.0 * w1
        hrr = sh(w1, 1, 0) + sh(w1, -1, 0) - 2.0 * w1
        hcc = sh(w1, 0, 1) + sh(w1, 0, -1) - 2.0 * w1
        hsr = 0.25 * ((sh(w2, 1, 0) - sh(w2, -1, 0)) - (sh(w0, 1, 0) - sh(w0, -1, 0)))
        hsc = 0.25 * ((sh(w2, 0, 1) - sh(w2, 0, -1)) - (sh(w0, 0, 1) - sh(w0, 0, -1)))
        hrc = 0.25 * (sh(w1, 1, 1) - sh(w1, 1, -1) - sh(w1, -1, 1) + sh(w1, -1, -1))

        a, b_, c_, d_, e_, f_ = hss, hsr, hsc, hrr, hrc, hcc
        det = a * (d_ * f_ - e_ * e_) - b_ * (b_ * f_ - e_ * c_) + c_ * (
            b_ * e_ - d_ * c_
        )
        solv = jnp.abs(det) > 1e-30
        inv = jnp.where(solv, 1.0 / jnp.where(solv, det, 1.0), 0.0)
        # adjugate rows (symmetric H), applied to -g
        offs = -((d_ * f_ - e_ * e_) * gs + (c_ * e_ - b_ * f_) * gr
                 + (b_ * e_ - c_ * d_) * gc) * inv
        offr = -((e_ * c_ - b_ * f_) * gs + (a * f_ - c_ * c_) * gr
                 + (b_ * c_ - a * e_) * gc) * inv
        offc = -((b_ * e_ - d_ * c_) * gs + (c_ * b_ - a * e_) * gr
                 + (a * d_ - b_ * b_) * gc) * inv
        peak = w1 + 0.5 * (gs * offs + gr * offr + gc * offc)
        pln[0] = offs
        pln[1] = offr
        pln[2] = offc
        pln[3] = peak
        pln[4] = jnp.where(solv, 1.0, 0.0)

        def move_cond(st):
            # early exit: a converged candidate re-samples the SAME position
            # forever (lr, lc never change), so leaving the loop is
            # bit-identical to running out max_moves — and the serial move
            # chain is THE kernel cost (measured 0.34 ms per iteration at
            # 1080p: 2.5 ms at max_moves=5, 0.8 ms at 0); most candidates
            # converge immediately
            i_, lr, lc, done = st
            return jnp.logical_not(done) & (i_ < max_moves)

        def move(st):
            i_, lr, lc, _ = st
            o_r = _at_row(pln, 1, lr, lc)
            o_c = _at_row(pln, 2, lr, lc)
            converged = (jnp.abs(o_r) <= 0.6) & (jnp.abs(o_c) <= 0.6)
            dr = jnp.where(o_r > 0.6, 1, jnp.where(o_r < -0.6, -1, 0))
            dc = jnp.where(o_c > 0.6, 1, jnp.where(o_c < -0.6, -1, 0))
            ar = r + (lr - lr0)
            ac = c + (lc - lc0)
            dr = jnp.where((dr > 0) & (ar + 1 >= rhi), 0, dr)
            dr = jnp.where((dr < 0) & (ar - 1 < rlo), 0, dr)
            dc = jnp.where((dc > 0) & (ac + 1 >= chi), 0, dc)
            dc = jnp.where((dc < 0) & (ac - 1 < clo), 0, dc)
            lr = jnp.where(converged, lr, lr + dr)
            lc = jnp.where(converged, lc, lc + dc)
            return (i_ + 1, lr, lc, converged)

        _, lr, lc, _ = lax.while_loop(
            move_cond, move, (jnp.int32(0), lr0, lc0, jnp.bool_(False))
        )
        v_s = _at_row(pln, 0, lr, lc)
        v_r = _at_row(pln, 1, lr, lc)
        v_c = _at_row(pln, 2, lr, lc)
        v_p = _at_row(pln, 3, lr, lc)
        v_ok = _at_row(pln, 4, lr, lc)
        accept = (
            (v_ok > 0)
            & (jnp.abs(v_p) > peak_thresh)
            & (jnp.abs(v_s) <= 1.5)
            & (jnp.abs(v_r) <= 1.5)
            & (jnp.abs(v_c) <= 1.5)
        )
        fs_out[k] = s.astype(jnp.float32) + v_s
        fr_out[k] = (r + (lr - lr0)).astype(jnp.float32) + v_r
        fc_out[k] = (c + (lc - lc0)).astype(jnp.float32) + v_c
        peak_out[k] = v_p
        acc_out[k] = accept.astype(jnp.int32)

    @pl.when(anyv)
    def _():
        lax.fori_loop(0, KP_BLOCK, body, 0)


def _kernel(s_ref, r_ref, c_ref, valid_ref, dogs_hbm,
            fs_out, fr_out, fc_out, peak_out, acc_out,
            win, sems, pln, *, H, W, bd, peak_thresh, max_moves):
    """Per-octave refine kernel: static (H, W, bd) border clamps."""
    _refine_blocks(
        pl.program_id(0), s_ref, r_ref, c_ref, valid_ref,
        lambda k: (bd, H - bd, bd, W - bd), dogs_hbm,
        fs_out, fr_out, fc_out, peak_out, acc_out, win, sems, pln,
        peak_thresh=peak_thresh, max_moves=max_moves,
    )


def _kernel_atlas(s_ref, r_ref, c_ref, valid_ref, rlo_ref, rhi_ref,
                  clo_ref, chi_ref, dogs_hbm,
                  fs_out, fr_out, fc_out, peak_out, acc_out,
                  win, sems, pln, *, peak_thresh, max_moves):
    """Atlas variant of `_kernel`: all octaves' padded DoG stacks live in ONE
    (S, sum_o(H_o + 2 PAD_R), Wmax + 2 PAD_C) array; per-candidate rows are
    pre-offset into the atlas and the border clamps arrive as per-candidate
    [rlo, rhi) / [clo, chi) bounds.  One launch refines every octave — the
    per-octave formulation paid ~0.13 ms of launch overhead per octave, and
    the earlier branched multi-ref attempt lost to @pl.when dispatch."""
    _refine_blocks(
        pl.program_id(0), s_ref, r_ref, c_ref, valid_ref,
        lambda k: (rlo_ref[k], rhi_ref[k], clo_ref[k], chi_ref[k]), dogs_hbm,
        fs_out, fr_out, fc_out, peak_out, acc_out, win, sems, pln,
        peak_thresh=peak_thresh, max_moves=max_moves,
    )


MASK_STRIP = 32  # extrema-mask kernel strip height (32 keeps the
                 # Mosaic VMEM stack—scratch + live stencil temporaries—
                 # under the 16 MB scoped limit at 1080p atlas width); octave blocks are
                 # rounded to this so every strip lies in ONE octave block


def build_dog_atlas(octave_dogs):
    """Stack per-octave (S, H_o, W_o) DoG stacks into one padded atlas.

    Returns (atlas (S, Ha, Wmax + 2 PAD_C), row_starts) — octave o's
    unpadded origin sits at atlas row row_starts[o] + PAD_R.  Replaces the
    per-octave `pad_dogs` copies with one concatenation of the same total
    bytes, enabling the single-launch atlas refine.  Each octave block's
    height is rounded up to MASK_STRIP (zero rows) and 8 extra rows close
    the atlas, so the extrema-mask kernel's strips are octave-pure and its
    row-halo fetches stay in bounds."""
    wmax = max(d.shape[2] for d in octave_dogs)
    blocks = []
    row_starts = []
    off = 0
    for d in octave_dogs:
        S, H, W = d.shape
        hb = _round_up(H + 2 * PAD_R, MASK_STRIP)
        blocks.append(jnp.pad(
            d,
            ((0, 0), (PAD_R, hb - H - PAD_R), (PAD_C, wmax - W + PAD_C)),
        ))
        row_starts.append(off)
        off += hb
    blocks.append(jnp.zeros(
        (octave_dogs[0].shape[0], 8, blocks[0].shape[2]),
        octave_dogs[0].dtype,
    ))
    return jnp.concatenate(blocks, axis=1), row_starts


@functools.partial(
    jax.jit, static_argnames=("peak_thresh", "max_moves", "interpret"),
)
def refine_atlas_pallas(
    atlas: jnp.ndarray,
    s: jnp.ndarray,
    r_atlas: jnp.ndarray,
    c: jnp.ndarray,
    valid: jnp.ndarray,
    rlo: jnp.ndarray,
    rhi: jnp.ndarray,
    clo: jnp.ndarray,
    chi: jnp.ndarray,
    peak_thresh: float,
    max_moves: int = 5,
    interpret: bool = False,
):
    """Single-launch refinement of candidates from EVERY octave.

    r_atlas = r + row_starts[octave]; [rlo, rhi) / [clo, chi) are the border
    clamp bounds in the same coordinates (atlas rows / octave cols).
    Returns (fs, fr_atlas, fc, peak, accept) — caller subtracts row_starts.
    """
    cap = s.shape[0]
    assert cap % KP_BLOCK == 0
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(cap // KP_BLOCK,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=tuple(
            pl.BlockSpec(memory_space=pltpu.SMEM) for _ in range(5)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, KP_BLOCK, 3, ROWS, COLS), jnp.float32),
            pltpu.SemaphoreType.DMA((2, KP_BLOCK)),
            pltpu.VMEM((5, ROWS, COLS), jnp.float32),
        ],
    )
    outs = pl.pallas_call(
        functools.partial(
            _kernel_atlas,
            peak_thresh=float(peak_thresh),
            max_moves=max_moves,
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((cap,), jnp.float32),
            jax.ShapeDtypeStruct((cap,), jnp.float32),
            jax.ShapeDtypeStruct((cap,), jnp.float32),
            jax.ShapeDtypeStruct((cap,), jnp.float32),
            jax.ShapeDtypeStruct((cap,), jnp.int32),
        ),
        interpret=interpret,
    )(s.astype(jnp.int32), r_atlas.astype(jnp.int32), c.astype(jnp.int32),
      valid.astype(jnp.int32), rlo.astype(jnp.int32), rhi.astype(jnp.int32),
      clo.astype(jnp.int32), chi.astype(jnp.int32), atlas)
    return outs


@functools.partial(
    jax.jit,
    static_argnames=("H", "W", "bd", "peak_thresh", "max_moves", "interpret"),
)
def refine_pallas(
    dogs_padded: jnp.ndarray,
    s: jnp.ndarray,
    r: jnp.ndarray,
    c: jnp.ndarray,
    valid: jnp.ndarray,
    H: int,
    W: int,
    bd: int,
    peak_thresh: float,
    max_moves: int = 5,
    interpret: bool = False,
):
    """Refine candidates; returns (fs, fr, fc, peak, accept) each (cap,)."""
    cap = s.shape[0]
    assert cap % KP_BLOCK == 0
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(cap // KP_BLOCK,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=tuple(
            pl.BlockSpec(memory_space=pltpu.SMEM) for _ in range(5)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, KP_BLOCK, 3, ROWS, COLS), jnp.float32),
            pltpu.SemaphoreType.DMA((2, KP_BLOCK)),
            pltpu.VMEM((5, ROWS, COLS), jnp.float32),
        ],
    )
    outs = pl.pallas_call(
        functools.partial(
            _kernel,
            H=H, W=W, bd=bd,
            peak_thresh=float(peak_thresh),
            max_moves=max_moves,
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((cap,), jnp.float32),
            jax.ShapeDtypeStruct((cap,), jnp.float32),
            jax.ShapeDtypeStruct((cap,), jnp.float32),
            jax.ShapeDtypeStruct((cap,), jnp.float32),
            jax.ShapeDtypeStruct((cap,), jnp.int32),
        ),
        interpret=interpret,
    )(s.astype(jnp.int32), r.astype(jnp.int32), c.astype(jnp.int32),
      valid.astype(jnp.int32), dogs_padded)
    return outs

