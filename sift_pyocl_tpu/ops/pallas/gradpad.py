"""Fused gradient + padded-atlas kernel.

TPU-native fusion of oracle.gradient (central-difference magnitude /
orientation with clamped edges — the input side of the reference's
orientation/descriptor kernels, reference: openCL/orientation_gpu.cl
gradient lookups) with the gradient-plane atlas layout of
ops/pallas/window.py.

The XLA formulation materializes unpadded (scales, H, W) mag/ori per octave
(gradient_planes) and then copies them into the padded atlas
(window.build_grad_atlas) — at 1080p that is ~400 MB of avoidable HBM
traffic.  This kernel reads each blur plane ONCE and writes mag/ori straight
into the atlas layout:

  * grid = (scales, atlas row-tiles); each step produces one full-width
    (TR, Wmax + 2 PAD_C) tile of both outputs;
  * a row-tile maps to (octave, local rows) via prefetched per-tile arrays;
    per-octave dispatch is one predicated branch per grid STEP (cheap),
    unlike per-keypoint branching;
  * blur stacks arrive pre-aligned to (8-mult rows, 128-mult cols) — an
    identity for the large octaves, a few-KB zero-pad for the small ones —
    so every DMA slice is static-shaped and in-bounds; the source block is
    placed at dest column PAD_C so output lanes line up with image columns
    and only a row roll is needed;
  * clamped-edge differences and the zero padding are expressed with global
    row/col iota masks — bit-identical to gradient_jax + jnp.pad.

Octave blocks start at multiples of TR (a multiple of 8), so the window
kernels' aligned DMAs work unchanged against this atlas.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .window import PAD_C, PAD_R

TR = 40          # atlas rows per grid step (multiple of 8)
ROWS_F = TR + 16  # fetched blur rows (halo + 8-alignment slack both sides)

# atan(t)/t as a degree-8 polynomial in t^2 on t in [0,1]; max f32 error
# 1 ulp (fit: Chebyshev on 2e5 samples, evaluated in f32 Horner)
_ATAN_COEF = (
    0.9999999880828048, -0.33333120781002346, 0.19993716142684706,
    -0.14213196196924144, 0.10681421032869046, -0.0759680986713322,
    0.043855599054352386, -0.016827448528019175, 0.0030499680693706565,
)


def _atan2(y, x):
    """f32 atan2 from mul/add/div only (Mosaic TC has no atan2 primitive).

    |t| = min/max folds the argument into [0, 1]; the polynomial gives
    atan(t) to 1 ulp; three quadrant selects recover the full range with
    jnp.arctan2's edge conventions (atan2(0, -x) = pi, atan2(0, 0) = 0).
    Total error ~2 f32 ulps — orientation feeds 10-degree histogram bins,
    so this is far below bin noise.  Used in interpret mode too, keeping
    CPU tests numerically identical to the Mosaic path.
    """
    ax, ay = jnp.abs(x), jnp.abs(y)
    mx, mn = jnp.maximum(ax, ay), jnp.minimum(ax, ay)
    t = mn / jnp.where(mx == 0.0, 1.0, mx)
    s = t * t
    acc = jnp.full_like(s, np.float32(_ATAN_COEF[-1]))
    for c in _ATAN_COEF[-2::-1]:
        acc = acc * s + np.float32(c)
    p = acc * t
    r = jnp.where(ay > ax, np.float32(np.pi / 2) - p, p)
    r = jnp.where(x < 0.0, np.float32(np.pi) - r, r)
    return jnp.where(y < 0.0, -r, r)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def atlas_geometry(shapes):
    """Row layout for octave image shapes [(H_o, W_o), ...].

    Returns (row_starts, atlas_rows, wmax) with every block TR-aligned and
    >= H_o + 2*PAD_R tall (window/refine DMAs never cross blocks)."""
    row_starts = []
    off = 0
    for h, _w in shapes:
        row_starts.append(off)
        off += _round_up(h + 2 * PAD_R, TR)
    wmax = max(w for _h, w in shapes)
    return row_starts, off, wmax


def _kernel(oct_ref, lr0_ref, *refs, shapes, shapes_al, wp):
    n_oct = len(shapes)
    blur_refs = refs[:n_oct]
    mag_ref, ori_ref = refs[n_oct : n_oct + 2]
    scratch, sem = refs[n_oct + 2 :]
    s = pl.program_id(0)
    t = pl.program_id(1)
    oo_id = oct_ref[t]
    lr0 = lr0_ref[t]

    for o, ((H, W), (H8, W128)) in enumerate(zip(shapes, shapes_al)):
        inside_tile = (lr0 < H) & (lr0 + TR > 0)
        # per-octave compute width: small octaves only touch lanes
        # [0, W128 + 2*PAD_C) — computing the full atlas width for every
        # octave measured ~0.3 ms of pure masked-zero work at 1080p.
        # Exactly one branch per (octave, inside) fires per step, so the
        # pair below covers every output lane exactly once (no
        # unconditional full-width zero-fill + overwrite).
        wl = min(W128 + 2 * PAD_C, wp)

        @pl.when((oo_id == o) & jnp.logical_not(inside_tile))
        def _():
            # pure-padding tile of this octave's block: the window/refine
            # kernels DMA halo rows from here — must be zero
            mag_ref[0] = jnp.zeros((TR, wp), jnp.float32)
            ori_ref[0] = jnp.zeros((TR, wp), jnp.float32)

        @pl.when((oo_id == o) & inside_tile)
        def _(o=o, H=H, W=W, H8=H8, W128=W128, wl=wl):
            if wl < wp:
                mag_ref[0, 0:TR, wl:wp] = jnp.zeros((TR, wp - wl),
                                                    jnp.float32)
                ori_ref[0, 0:TR, wl:wp] = jnp.zeros((TR, wp - wl),
                                                    jnp.float32)
            rows = lax.broadcasted_iota(jnp.int32, (TR, wl), 0) + lr0
            cols = lax.broadcasted_iota(jnp.int32, (TR, wl), 1) - PAD_C
            ra = jnp.clip(((lr0 - 8) // 8) * 8, 0, H8 - ROWS_F)
            ra = pl.multiple_of(ra, 8)
            cp = pltpu.make_async_copy(
                blur_refs[o].at[s + 1, pl.ds(ra, ROWS_F), pl.ds(0, W128)],
                scratch.at[pl.ds(0, ROWS_F), pl.ds(PAD_C, W128)],
                sem,
            )
            cp.start()
            cp.wait()
            # roll so row i of the block == image row lr0 + i (i in [0, TR));
            # wrapped rows/cols fall outside the interior mask
            p = pltpu.roll(
                scratch[0:ROWS_F, 0:wl],
                (ROWS_F - (lr0 - ra) % ROWS_F) % ROWS_F, 0,
            )
            up = pltpu.roll(p, 1, 0)           # row i -> image row lr0+i-1
            dn = pltpu.roll(p, ROWS_F - 1, 0)  # row i -> image row lr0+i+1
            lf = pltpu.roll(p, 1, 1)           # col j -> image col j-1
            rt = pltpu.roll(p, wl - 1, 1)
            pT = p[0:TR]
            upT = jnp.where(rows == 0, pT, up[0:TR])
            dnT = jnp.where(rows == H - 1, pT, dn[0:TR])
            lfT = jnp.where(cols == 0, pT, lf[0:TR])
            rtT = jnp.where(cols == W - 1, pT, rt[0:TR])
            dx = rtT - lfT
            dy = dnT - upT
            interior = (rows >= 0) & (rows < H) & (cols >= 0) & (cols < W)
            mag_ref[0, 0:TR, 0:wl] = jnp.where(
                interior, 0.5 * jnp.sqrt(dx * dx + dy * dy), 0.0
            )
            ori_ref[0, 0:TR, 0:wl] = jnp.where(interior, _atan2(dy, dx), 0.0)


@functools.partial(jax.jit, static_argnames=("scales", "interpret"))
def grad_atlas_pallas(blur_list, scales: int, interpret: bool = False):
    """Gradient mag/ori atlases for all octaves in one launch.

    blur_list: per-octave (scales+3, H_o, W_o) blur stacks.  Returns
    (mag_atlas, ori_atlas, row_starts) shaped like
    window.build_grad_atlas(gradient_planes(...)) and matching it up to f32
    fusion ulps (tests/test_pallas.py::test_grad_atlas_kernel_parity); note
    the row blocks here are TR-aligned, so row_starts differ from
    build_grad_atlas's tight packing.
    """
    shapes = tuple((int(b.shape[1]), int(b.shape[2])) for b in blur_list)
    shapes_al = tuple(
        (max(_round_up(h, 8), ROWS_F), _round_up(w, 128)) for h, w in shapes
    )
    blur_al = [
        jnp.pad(b, ((0, 0), (0, h8 - h), (0, w128 - w)))
        if (h8, w128) != (h, w) else b
        for b, (h, w), (h8, w128) in zip(blur_list, shapes, shapes_al)
    ]
    row_starts, atlas_rows, wmax = atlas_geometry(shapes)
    wp = _round_up(wmax + 2 * PAD_C, 128)
    n_tiles = atlas_rows // TR
    oct_of_tile = np.zeros((n_tiles,), np.int32)
    lr0_of_tile = np.zeros((n_tiles,), np.int32)
    for o, (h, _w) in enumerate(shapes):
        b0 = row_starts[o] // TR
        b1 = (row_starts[o] + _round_up(h + 2 * PAD_R, TR)) // TR
        for t in range(b0, b1):
            oct_of_tile[t] = o
            lr0_of_tile[t] = t * TR - row_starts[o] - PAD_R
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(scales, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(blur_list),
        out_specs=(
            pl.BlockSpec((1, TR, wp), lambda s, t, *_: (s, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TR, wp), lambda s, t, *_: (s, t, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((ROWS_F, wp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    mag, ori = pl.pallas_call(
        functools.partial(_kernel, shapes=shapes, shapes_al=shapes_al, wp=wp),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((scales, atlas_rows, wp), jnp.float32),
            jax.ShapeDtypeStruct((scales, atlas_rows, wp), jnp.float32),
        ),
        interpret=interpret,
    )(jnp.asarray(oct_of_tile), jnp.asarray(lr0_of_tile), *blur_al)
    return mag, ori, row_starts
