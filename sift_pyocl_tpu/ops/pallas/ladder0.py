"""Octave-0 blur ladder + DoG as ONE Pallas launch over column strips.

Round-2 perf: octave 0 previously ran as ~6 separate full-plane blur
launches (ops/pallas/conv.py per level) plus XLA DoG subtractions.  Octave 0
does not fit in VMEM whole (unlike octaves >= 1, handled by ladder.py), so
this kernel processes it in column strips: the grid walks strips of 512
output columns with 128-column margins; within one grid step the FULL level
ladder (pre-blur to init_sigma + scales+2 increments) runs in VMEM, emitting
each blur level and DoG plane straight to HBM.

Conv style follows conv.py — taps are STATIC constants and every tap is an
in-place ref accumulation over a static slice (`dst[...] += src[shifted] *
t_k`), which Mosaic vectorizes and keeps one slab-temporary live at a time.
(A first version used pltpu.roll inside fori_loops with SMEM tap reads and
measured 3-4x SLOWER than the launches it replaced.)

Layout: the image sits at buffer offset (MR, SM).  Border exactness
(oracle.blur clamp-to-edge per level):
  * rows: margins [0, MR) / [MR+H, Hb) are re-replicated from the true edge
    rows before every pass;
  * interior strip columns: margins hold REAL neighbor data from the padded
    base fetch; each level consumes cumulative tap support (sum of halves
    ~50 << SM=128), so strip-interior outputs stay exact with no
    inter-strip exchange;
  * global left/right edge strips: the true edge COLUMN is re-replicated
    into the margin before every level (clamp-to-edge must extend the
    CURRENT level, not a blur of the replicated previous level).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MR = 16      # row margin each side (>= max tap half-width)
SW = 512     # strip output width
SM = 128     # strip column margin each side
SB = SW + 2 * SM


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(base_hbm, *refs, H, W, Hp8, Hb, n_strips, taps_all, mask_cfg):
    s = pl.program_id(0)
    if mask_cfg is not None:
        (blur_out, dog_out, mask_out, b0, b1, b2, d0, d1, d2, mbuf,
         sem, osem, msem) = refs
        dbufs = [d0, d1, d2]
    else:
        blur_out, dog_out, b0, b1, b2, sem, osem = refs
    bufs = [b0, b1, b2]
    n_levels = len(taps_all)
    last_w = W - (n_strips - 1) * SW        # true cols in the last strip

    cpy = pltpu.make_async_copy(
        base_hbm.at[pl.ds(0, Hp8), pl.ds(s * SW, SB)],
        b0.at[pl.ds(MR, Hp8), pl.ds(0, SB)], sem,
    )
    cpy.start()
    cpy.wait()

    def edge_fix(ref):
        # rows: [0, MR) <- top edge row, [MR+H, Hb) <- bottom edge row
        ref[0:MR, 0:SB] = jnp.broadcast_to(ref[MR : MR + 1, 0:SB], (MR, SB))
        ref[MR + H : Hb, 0:SB] = jnp.broadcast_to(
            ref[MR + H - 1 : MR + H, 0:SB], (Hb - MR - H, SB)
        )
        # global edges: re-replicate the true edge COLUMN into the margin
        @pl.when(s == 0)
        def _():
            ref[0:Hb, 0:SM] = jnp.broadcast_to(
                ref[0:Hb, SM : SM + 1], (Hb, SM)
            )

        @pl.when(s == n_strips - 1)
        def _():
            e = SM + last_w
            ref[0:Hb, e:SB] = jnp.broadcast_to(
                ref[0:Hb, e - 1 : e], (Hb, SB - e)
            )

    def conv_h(src, dst, taps):
        half = (len(taps) - 1) // 2
        w = SB - 2 * half
        dst[0:Hb, half : SB - half] = src[0:Hb, 0:w] * taps[0]
        for k in range(1, len(taps)):
            dst[0:Hb, half : SB - half] += src[0:Hb, k : k + w] * taps[k]

    def conv_v(src, dst, taps):
        half = (len(taps) - 1) // 2
        h = Hb - 2 * half
        dst[half : Hb - half, 0:SB] = src[0:h, 0:SB] * taps[0]
        for k in range(1, len(taps)):
            dst[half : Hb - half, 0:SB] += src[k : k + h, 0:SB] * taps[k]

    def emit(ref, out, lvl_idx):
        cp = pltpu.make_async_copy(
            ref.at[pl.ds(MR, Hp8), pl.ds(SM, SW)],
            out.at[lvl_idx, pl.ds(0, Hp8), pl.ds(s * SW, SW)], osem,
        )
        cp.start()
        cp.wait()

    def compute_mask(sd):
        """Extrema mask plane for DoG scale sd (oracle.local_maxmin numerics,
        bit-identical to ops.detect.extrema_mask on the same DoG values: the
        three scale planes sit in the dbufs ring, already resident in VMEM —
        the whole point of fusing here is skipping the HBM re-read an XLA
        mask stage would do).  Rows/cols outside [bd, dim-bd) are garbage
        (margins are edge replicas); the caller slices them off."""
        peak_thresh, eth = mask_cfg
        D0, D1, D2 = (dbufs[(sd - 1) % 3], dbufs[sd % 3], dbufs[(sd + 1) % 3])
        CH = next(c for c in (64, 32, 16, 8) if Hp8 % c == 0)

        def chunk(rb, _):
            lb = pl.multiple_of(rb * CH + (MR - 8), 8)
            rows = []
            for D in (D0, D1, D2):
                x = D[pl.ds(lb, CH + 16), 0:SB]
                rows.append((x[7 : 7 + CH], x[8 : 8 + CH], x[9 : 9 + CH]))
            va = rows[1][1][:, SM : SM + SW]
            strong = jnp.abs(va) > jnp.float32(0.8 * peak_thresh)
            ismax = strong
            ismin = strong
            for pi, triple in enumerate(rows):
                for ri, xr in enumerate(triple):
                    for dc in (-1, 0, 1):
                        if pi == 1 and ri == 1 and dc == 0:
                            continue
                        nb = xr[:, SM + dc : SM + dc + SW]
                        ismax = ismax & (va > nb)
                        ismin = ismin & (va < nb)
            xa, xc, xb = rows[1]
            ctr = va
            hxx = xc[:, SM - 1 : SM - 1 + SW] + xc[:, SM + 1 : SM + 1 + SW] - 2 * ctr
            hyy = xa[:, SM : SM + SW] + xb[:, SM : SM + SW] - 2 * ctr
            hxy = 0.25 * (
                xb[:, SM + 1 : SM + 1 + SW]
                - xb[:, SM - 1 : SM - 1 + SW]
                - xa[:, SM + 1 : SM + 1 + SW]
                + xa[:, SM - 1 : SM - 1 + SW]
            )
            det = hxx * hyy - hxy * hxy
            tr = hxx + hyy
            not_edge = (det > 0) & (det >= jnp.float32(eth) * tr * tr)
            m = (ismax | ismin) & not_edge
            mbuf[pl.ds(pl.multiple_of(rb * CH, 8), CH), 0:SW] = m.astype(
                jnp.int8
            )
            return 0

        lax.fori_loop(0, Hp8 // CH, chunk, 0)
        cp = pltpu.make_async_copy(
            mbuf.at[pl.ds(0, Hp8), pl.ds(0, SW)],
            mask_out.at[sd - 1, pl.ds(0, Hp8), pl.ds(s * SW, SW)], msem,
        )
        cp.start()
        cp.wait()

    # level 0 = pre-blur of the base to init_sigma
    cur, htmp, nxt = 0, 1, 2
    for lvl in range(n_levels):
        taps = taps_all[lvl]
        edge_fix(bufs[cur])
        conv_h(bufs[cur], bufs[htmp], taps)
        edge_fix(bufs[htmp])
        conv_v(bufs[htmp], bufs[nxt], taps)
        emit(bufs[nxt], blur_out, lvl)
        if lvl >= 1:
            a, b = bufs[nxt], bufs[cur]
            d = dbufs[(lvl - 1) % 3] if mask_cfg is not None else bufs[htmp]
            d[0:Hb, 0:SB] = a[0:Hb, 0:SB] - b[0:Hb, 0:SB]
            emit(d, dog_out, lvl - 1)
            if mask_cfg is not None and lvl >= 3:
                compute_mask(lvl - 2)
        cur, nxt = nxt, cur


@functools.partial(jax.jit, static_argnames=("cfg_key", "interpret"))
def _run(base_pad, cfg_key, interpret):
    (H, W, taps_all, mask_cfg) = cfg_key
    Hp8 = _round_up(H, 8)
    Hb = _round_up(MR + H + MR, 8)
    n_strips = -(-W // SW)
    Wp = n_strips * SW
    n_levels = len(taps_all)
    out_shapes = [
        jax.ShapeDtypeStruct((n_levels, Hp8, Wp), jnp.float32),
        jax.ShapeDtypeStruct((n_levels - 1, Hp8, Wp), jnp.float32),
    ]
    scratch = [
        pltpu.VMEM((Hb, SB), jnp.float32),
        pltpu.VMEM((Hb, SB), jnp.float32),
        pltpu.VMEM((Hb, SB), jnp.float32),
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA(()),
    ]
    if mask_cfg is not None:
        out_shapes.append(
            jax.ShapeDtypeStruct((n_levels - 3, Hp8, Wp), jnp.int8)
        )
        scratch = scratch[:3] + [
            pltpu.VMEM((Hb, SB), jnp.float32),
            pltpu.VMEM((Hb, SB), jnp.float32),
            pltpu.VMEM((Hb, SB), jnp.float32),
            pltpu.VMEM((Hp8, SW), jnp.int8),
        ] + scratch[3:] + [pltpu.SemaphoreType.DMA(())]
    outs = pl.pallas_call(
        functools.partial(
            _kernel, H=H, W=W, Hp8=Hp8, Hb=Hb, n_strips=n_strips,
            taps_all=taps_all, mask_cfg=mask_cfg,
        ),
        grid=(n_strips,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=tuple(pl.BlockSpec(memory_space=pl.ANY)
                        for _ in out_shapes),
        out_shape=tuple(out_shapes),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=sum(2 * 2 * len(t) * Hb * SB for t in taps_all) * n_strips,
            bytes_accessed=4 * n_strips * (Hp8 * SB + 11 * Hp8 * SW),
            transcendentals=0,
        ),
        # the 3 extra DoG ring buffers of the fused mask push scratch past
        # Mosaic's default 16 MB scoped-VMEM cap (v5e has 128 MB physical)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(base_pad)
    return outs


def octave0_ladder_supported(pre_sigma: float,
                             increments: Sequence[float]) -> bool:
    """True iff the strip geometry covers these sigmas (max tap half-width
    within the row margin, cumulative support within the column margin).
    Callers route unsupported configs (large init_sigma) to the per-level
    conv path, which pads for any sigma."""
    from .conv import blur_taps

    halves = [(len(blur_taps(s)) - 1) // 2
              for s in [pre_sigma] + list(increments)]
    return max(halves) <= MR and sum(halves) <= SM


def octave0_ladder(
    normalized: jnp.ndarray,
    pre_sigma: float,
    increments: Sequence[float],
    interpret: bool = False,
    mask_cfg: Tuple[float, float] = None,
) -> Tuple[jnp.ndarray, ...]:
    """Blur stack (S+3,H,W) and DoG stack (S+2,H,W) of octave 0, one launch.

    normalized: the [0,255] f32 image (already doubled if DoubleImSize);
    pre_sigma: the sigma of the pre-blur to init_sigma (level 0);
    increments: per-level sigma increments (len = scales+2).
    mask_cfg: optional (peak_thresh, edge_thresh) — when given, the extrema
    mask (oracle.local_maxmin) is computed IN-KERNEL from the VMEM-resident
    DoG strips and returned as a third value, an (S, H, W) int8 stack whose
    border rows/cols are garbage (slice [bd:-bd] before use).
    """
    from .conv import blur_taps

    H, W = normalized.shape
    taps_all = tuple(
        [blur_taps(pre_sigma)] + [blur_taps(sg) for sg in increments]
    )
    assert max((len(t) - 1) // 2 for t in taps_all) <= MR
    assert sum((len(t) - 1) // 2 for t in taps_all) <= SM
    n_strips = -(-W // SW)
    Hp8 = _round_up(H, 8)
    # padded base: [SM cols of left edge | image | edge fill]
    Wpad = SM + n_strips * SW + SM
    base_pad = jnp.pad(
        normalized,
        ((0, Hp8 - H), (SM, Wpad - SM - W)),
        mode="edge",
    )
    cfg_key = (H, W, taps_all, mask_cfg)
    outs = _run(base_pad, cfg_key, interpret)
    blurs, dogs = outs[0], outs[1]
    if mask_cfg is not None:
        return blurs[:, :H, :W], dogs[:, :H, :W], outs[2][:, :H, :W]
    return blurs[:, :H, :W], dogs[:, :H, :W]
