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


def _kernel(base_hbm, blur_out, dog_out, b0, b1, b2, sem, osem, *,
            H, W, Hp8, Hb, n_strips, taps_all):
    s = pl.program_id(0)
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
            d = bufs[htmp]
            d[0:Hb, 0:SB] = a[0:Hb, 0:SB] - b[0:Hb, 0:SB]
            emit(d, dog_out, lvl - 1)
        cur, nxt = nxt, cur


@functools.partial(jax.jit, static_argnames=("cfg_key", "interpret"))
def _run(base_pad, cfg_key, interpret):
    (H, W, taps_all) = cfg_key
    Hp8 = _round_up(H, 8)
    Hb = _round_up(MR + H + MR, 8)
    n_strips = -(-W // SW)
    Wp = n_strips * SW
    n_levels = len(taps_all)
    outs = pl.pallas_call(
        functools.partial(
            _kernel, H=H, W=W, Hp8=Hp8, Hb=Hb, n_strips=n_strips,
            taps_all=taps_all,
        ),
        grid=(n_strips,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_levels, Hp8, Wp), jnp.float32),
            jax.ShapeDtypeStruct((n_levels - 1, Hp8, Wp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((Hb, SB), jnp.float32),
            pltpu.VMEM((Hb, SB), jnp.float32),
            pltpu.VMEM((Hb, SB), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=sum(2 * 2 * len(t) * Hb * SB for t in taps_all) * n_strips,
            bytes_accessed=4 * n_strips * (Hp8 * SB + 11 * Hp8 * SW),
            transcendentals=0,
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
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Blur stack (S+3,H,W) and DoG stack (S+2,H,W) of octave 0, one launch.

    normalized: the [0,255] f32 image (already doubled if DoubleImSize);
    pre_sigma: the sigma of the pre-blur to init_sigma (level 0);
    increments: per-level sigma increments (len = scales+2).
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
    cfg_key = (H, W, taps_all)
    blurs, dogs = _run(base_pad, cfg_key, interpret)
    return blurs[:, :H, :W], dogs[:, :H, :W]
