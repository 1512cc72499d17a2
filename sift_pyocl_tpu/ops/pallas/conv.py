"""Fused separable-Gaussian convolution as a Pallas TPU kernel.

TPU-native replacement for the reference's convolution kernels
(reference: openCL/convolution.cl::{horizontal,vertical}_convolution —
SURVEY.md §2.2 row 1: "fused Pallas separable-Gaussian pyramid kernel").

Why a hand kernel beats the XLA conv here: the pyramid is single-channel, so
`conv_general_dilated` cannot feed the MXU (no contraction dimension to tile)
and falls back to generic windowed reductions with an HBM round-trip between
the horizontal and the vertical pass.  This kernel keeps an image tile in
VMEM and applies BOTH 1-D passes before writing back:

    HBM (edge-padded img) --DMA--> VMEM tile (TR+2h rows, TC+2h cols)
        horizontal: K static-shift multiply-adds on the VPU (taps are
        trace-time constants, loop fully unrolled)
        vertical:   K static-shift multiply-adds over the tile rows
    VMEM out tile (TR, TC) --auto--> HBM

The grid walks (row strips x column tiles); each tile re-reads a 2*half halo.
Mosaic constraints that shaped this design (measured on v5e):
  * dynamic lane-dim slice starts must be 128-aligned -> tap shifts must be
    STATIC slices (unrolled Python loop);
  * every unrolled shifted temporary stays live on the Mosaic stack, so the
    tile width bounds peak VMEM at ~K * 4 * rows * TC bytes -> column tiling
    keeps that under the 16 MB budget for any Gaussian the ladder uses.
Borders are clamp-to-edge like the reference, implemented by edge-padding
once in XLA (fused with the producer) so the kernel has zero branches.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _tile_kernel(src_hbm, out_ref, tile, acc, sem, *, taps: Tuple[float, ...],
                 tr: int, tc: int, rows_al: int, cols_al: int):
    """One grid step: blur the (tr, tc) output tile at (i*tr, j*tc)."""
    half = (len(taps) - 1) // 2
    i = pl.program_id(0)
    j = pl.program_id(1)
    cp = pltpu.make_async_copy(
        src_hbm.at[pl.ds(i * tr, rows_al), pl.ds(j * tc, cols_al)], tile, sem
    )
    cp.start()
    cp.wait()
    # horizontal pass (static unrolled shifts, VPU)
    acc[:] = tile[:, 0:tc] * taps[0]
    for k in range(1, len(taps)):
        acc[:] += tile[:, k : k + tc] * taps[k]
    # vertical pass on the horizontally-filtered tile
    out_ref[:] = acc[0:tr, :] * taps[0]
    for k in range(1, len(taps)):
        out_ref[:] += acc[k : k + tr, :] * taps[k]


@functools.partial(
    jax.jit, static_argnames=("taps", "tile_rows", "tile_cols", "interpret")
)
def separable_blur_pallas(
    img: jnp.ndarray,
    taps: Tuple[float, ...],
    tile_rows: int = 256,
    tile_cols: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Separable 1-D correlation (H then V) with clamp-to-edge borders.

    Exact same numerics as ops.pyramid.conv1d_clamp_jax applied twice
    (symmetric Gaussian taps, so correlation == convolution).

    img: (H, W) float32.  taps: static tuple of filter weights (odd length).
    """
    assert img.ndim == 2 and len(taps) % 2 == 1
    H, W = img.shape
    K = len(taps)
    half = (K - 1) // 2
    tr = max(8, min(tile_rows, _round_up(H, 8)))
    tc = max(128, min(tile_cols, _round_up(W, 128)))
    Hp = _round_up(H, tr)
    Wp = _round_up(W, tc)
    # DMA slice shapes must be sublane(8)/lane(128)-aligned; over-read is
    # edge padding, harmless.
    rows_al = _round_up(tr + 2 * half, 8)
    cols_al = _round_up(tc + 2 * half, 128)
    padded = jnp.pad(
        img,
        (
            (half, (rows_al - tr - half) + (Hp - H)),
            (half, (cols_al - tc - half) + (Wp - W)),
        ),
        mode="edge",
    )
    grid = (Hp // tr, Wp // tc)
    out = pl.pallas_call(
        functools.partial(
            _tile_kernel,
            taps=tuple(float(t) for t in taps),
            tr=tr,
            tc=tc,
            rows_al=rows_al,
            cols_al=cols_al,
        ),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (tr, tc), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rows_al, cols_al), jnp.float32),
            pltpu.VMEM((rows_al, tc), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * K * Hp * Wp,
            bytes_accessed=4 * (grid[0] * grid[1] * rows_al * cols_al + Hp * Wp),
            transcendentals=0,
        ),
        interpret=interpret,
    )(padded)
    return out[:H, :W]


def blur_taps(sigma: float) -> Tuple[float, ...]:
    """Static Gaussian taps for `sigma` (oracle.gaussian_kernel as a tuple)."""
    from ...oracle import gaussian_kernel

    return tuple(float(t) for t in np.asarray(gaussian_kernel(sigma)))
