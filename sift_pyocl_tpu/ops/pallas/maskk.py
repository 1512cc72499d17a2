"""DoG extrema-mask (local_maxmin) as a single Pallas TPU launch.

TPU-native replacement for the detection mask stage (reference:
openCL/image.cl::local_maxmin — SURVEY.md §2.2).  The XLA formulation
(ops.detect.extrema_mask) is a 27-operand stencil over the DoG stack —
26 shifted neighbor comparisons plus a 2x2-Hessian edge test — which XLA
lowers to several materialized full-plane passes; this kernel makes ONE
pass: each grid step DMAs a row strip of the DoG atlas (all scale planes)
into VMEM, evaluates every term as static shifted slices / lane rolls on
VMEM data, and writes the strip's mask rows.

Operates on the `build_dog_atlas` layout, so one launch serves every
octave: octave blocks are MASK_STRIP-aligned (see build_dog_atlas), making
each strip octave-pure; per-strip scalars carry the octave's border-valid
row/col window and its edge threshold (the octsize<=1 rule resolves per
octave at trace time).

Strip geometry: strip i fetches atlas rows [56i-8, 56i+64) (strip 0:
[0, 72)) so the +-1-row stencil halo is always resident; every strip
computes local rows [8, 64) and writes atlas mask rows [56i, 56i+56)
(strip 0 writes [8, 56) — atlas rows [0, 8) are octave-0 top padding,
PAD_R > 8, and are never read downstream).

Numerics mirror ops.detect.extrema_mask exactly: strict 26-neighbor
max/min, |v| > 0.8*peak_thresh, det > 0 and det >= eth*tr^2 on the spatial
Hessian, border_dist margin.  Comparisons only — identical accepts by
construction on identical inputs.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .refine import MASK_STRIP, PAD_C, PAD_R

FETCH_ROWS = MASK_STRIP + 16   # strip + 8-aligned halo above and below
LR0 = 8                        # local row of the strip's first output row


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _mask_kernel(rlo_ref, rhi_ref, clo_ref, chi_ref, eth_ref, atlas_hbm,
                 out_ref, buf, osc, sem, osem, *, S: int, Wa: int,
                 strong_thresh: float):
    i = pl.program_id(0)
    start = jnp.maximum(i * MASK_STRIP - LR0, 0)
    start = pl.multiple_of(start, 8)
    cpy = pltpu.make_async_copy(
        atlas_hbm.at[:, pl.ds(start, FETCH_ROWS), :], buf, sem
    )
    cpy.start()
    cpy.wait()
    rlo = rlo_ref[i]
    rhi = rhi_ref[i]
    clo = clo_ref[i]
    chi = chi_ref[i]
    eth = eth_ref[i]

    # atlas row / col ids of the computed interior block (start is dynamic,
    # so this covers both the strip-0 and the general fetch window).  All
    # neighbor accesses are STATIC shifted slices over the interior columns
    # [1, Wa-1) — the Mosaic-fast idiom (ladder0 lesson).  Measured: v1
    # lane rolls 2.9 ms, this static-slice form ~2.7 ms, XLA stencil
    # ~0.4 ms at 1080p — the strip fetch DMA (full atlas re-read with
    # halo), not the compare tree, dominates; kept for tuning, default
    # stays XLA (config.mask_backend).  Columns 0 and Wa-1 are atlas
    # padding (PAD_C >= 256 > border_dist), outside the border window.
    Wi = Wa - 2
    rr = lax.broadcasted_iota(jnp.int32, (MASK_STRIP, Wi), 0) + (start + LR0)
    cc = lax.broadcasted_iota(jnp.int32, (MASK_STRIP, Wi), 1) + 1
    inbound = (rr >= rlo) & (rr < rhi) & (cc >= clo) & (cc < chi)

    def nb(s, dr, dc):
        return buf[
            s, LR0 + dr : LR0 + dr + MASK_STRIP, 1 + dc : 1 + dc + Wi
        ]

    for p in range(S - 2):
        s = p + 1
        v = nb(s, 0, 0)
        strong = jnp.abs(v) > strong_thresh
        is_max = strong
        is_min = strong
        for ds_ in (-1, 0, 1):
            for dr in (-1, 0, 1):
                for dc in (-1, 0, 1):
                    if ds_ == 0 and dr == 0 and dc == 0:
                        continue
                    n = nb(s + ds_, dr, dc)
                    is_max = is_max & (v > n)
                    is_min = is_min & (v < n)
        cand = is_max | is_min
        # 2x2 spatial Hessian edge rejection (same op order as
        # ops.detect.extrema_mask: hxx along cols, hyy along rows)
        hxx = nb(s, 0, -1) + nb(s, 0, 1) - 2 * v
        hyy = nb(s, -1, 0) + nb(s, 1, 0) - 2 * v
        hxy = 0.25 * (
            nb(s, 1, 1) - nb(s, 1, -1) - nb(s, -1, 1) + nb(s, -1, -1)
        )
        det = hxx * hyy - hxy * hxy
        tr = hxx + hyy
        not_edge = (det > 0) & (det >= eth * tr * tr)
        osc[p, :, 0:1] = jnp.zeros((MASK_STRIP, 1), jnp.float32)
        osc[p, :, Wa - 1 : Wa] = jnp.zeros((MASK_STRIP, 1), jnp.float32)
        osc[p, :, 1 : Wa - 1] = jnp.where(
            cand & not_edge & inbound, 1.0, 0.0
        ).astype(jnp.float32)

    @pl.when(i == 0)
    def _():
        # atlas rows [8, 56): local osc rows [0, 48)
        c0 = pltpu.make_async_copy(
            osc.at[:, pl.ds(0, MASK_STRIP - LR0), :],
            out_ref.at[:, pl.ds(LR0, MASK_STRIP - LR0), :],
            osem,
        )
        c0.start()
        c0.wait()

    @pl.when(i > 0)
    def _():
        c1 = pltpu.make_async_copy(
            osc, out_ref.at[:, pl.ds(i * MASK_STRIP, MASK_STRIP), :], osem
        )
        c1.start()
        c1.wait()


@functools.partial(
    jax.jit,
    static_argnames=("geom", "peak_thresh", "interpret"),
)
def _mask_atlas_call(
    atlas: jnp.ndarray,
    geom: Tuple,            # ((row_start, H, W, eth, bd), ...) per octave
    peak_thresh: float,
    interpret: bool = False,
) -> jnp.ndarray:
    S, Ha, Wa = atlas.shape
    n_strips = (Ha - 8) // MASK_STRIP
    rlo = np.zeros(n_strips, np.int32)
    rhi = np.zeros(n_strips, np.int32)
    clo = np.zeros(n_strips, np.int32)
    chi = np.zeros(n_strips, np.int32)
    eth = np.zeros(n_strips, np.float32)
    for rs, H, W, et, bd in geom:
        lo, hi = rs + PAD_R + bd, rs + PAD_R + H - bd
        top = min((rs + _round_up(H + 2 * PAD_R, MASK_STRIP))
                  // MASK_STRIP, n_strips)
        for i in range(rs // MASK_STRIP, top):
            rlo[i] = lo
            rhi[i] = hi
            clo[i] = PAD_C + bd
            chi[i] = PAD_C + W - bd
            eth[i] = et
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_strips,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((S, FETCH_ROWS, Wa), jnp.float32),
            pltpu.VMEM((S - 2, MASK_STRIP, Wa), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _mask_kernel, S=S, Wa=Wa,
            strong_thresh=float(0.8 * peak_thresh),
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (S - 2, n_strips * MASK_STRIP, Wa), jnp.float32
        ),
        interpret=interpret,
    )(
        jnp.asarray(rlo), jnp.asarray(rhi), jnp.asarray(clo),
        jnp.asarray(chi), jnp.asarray(eth), atlas,
    )


def extrema_masks_atlas_pallas(
    atlas: jnp.ndarray,
    row_starts: Sequence[int],
    octave_shapes: Sequence[Tuple[int, int, int]],
    cfg,
    interpret: bool = False,
    oct_ids: Sequence[int] = None,
) -> List[jnp.ndarray]:
    """Per-octave extrema masks from the DoG atlas, ONE kernel launch.

    atlas/row_starts: `build_dog_atlas` output; octave_shapes: the original
    per-octave (S, H, W).  Returns a list of (S-2, H-2bd, W-2bd) bool masks
    identical to ops.detect.extrema_mask per octave.  `oct_ids` maps each
    entry to its true octave index (batched frontend: entries repeat per
    frame); default = enumerate order.
    """
    bd = int(cfg.border_dist)
    if oct_ids is None:
        oct_ids = range(len(octave_shapes))
    geom = []
    for o, (rs, (S, H, W)) in zip(oct_ids, zip(row_starts, octave_shapes)):
        octsize = 2.0 ** (o - 1) if cfg.double_im_size else 2.0 ** o
        et = cfg.edge_thresh1 if octsize <= 1.0 else cfg.edge_thresh
        geom.append((int(rs), int(H), int(W), float(et), bd))
    amask = _mask_atlas_call(
        atlas, tuple(geom), float(cfg.peak_thresh), interpret=interpret
    )
    out = []
    for rs, H, W, _et, _bd in geom:
        out.append(
            amask[
                :, rs + PAD_R + bd : rs + PAD_R + H - bd,
                PAD_C + bd : PAD_C + W - bd,
            ] > 0.5
        )
    return out
