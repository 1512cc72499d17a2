"""Fused best-2 descriptor matching as a Pallas TPU kernel.

TPU-native replacement for the reference's brute-force matching kernels
(reference: openCL/matching_gpu.cl::matching — SURVEY.md §2.2), fast L2
mode.  The XLA formulation (ops/match.py::_best2_l2) materializes the full
(N1, N2) f32 distance matrix in HBM and reads it three times (min, argmin,
masked second min) — ~280 MB of traffic at VO shapes (8448x2048).  Here each
grid step computes one (TILE1, N2) distance tile on the MXU with the
descriptor set-2 panel resident in VMEM, and reduces best / second-best /
argbest in-register before anything touches HBM.  Outputs are three (N1,)
vectors — the distance matrix never exists in memory.

Numerics and tie-breaking match _best2_l2 exactly: squared-L2 via
||a||^2 + ||b||^2 - 2ab in f32, invalid columns = +inf, argmin = first
occurrence (lowest index), second-best excludes the argmin column only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 128            # query rows per inner sub-tile (bounds the live dist tile)
TILE1 = 1024         # query rows per grid step (8 sub-tiles -> (8,128) blocks;
                     # Mosaic requires output block sublanes divisible by 8)
MAX_N2 = 8192        # resident set-2 panel bound (128*N2*4 B <= 4 MiB VMEM)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(a_ref, bt_ref, nb_ref, v2_ref, d1_ref, d2_ref, i1_ref):
    bt = bt_ref[:]                                 # (128, N2) f32, resident
    n2 = bt.shape[1]
    big = jnp.int32(2**30)
    rows8 = lax.broadcasted_iota(jnp.int32, (TILE1 // SUB, SUB), 0)
    d1o = jnp.zeros((TILE1 // SUB, SUB), jnp.float32)
    d2o = jnp.zeros((TILE1 // SUB, SUB), jnp.float32)
    i1o = jnp.zeros((TILE1 // SUB, SUB), jnp.int32)
    for sub in range(TILE1 // SUB):
        a = a_ref[sub * SUB : (sub + 1) * SUB, :]  # (SUB, 128)
        ab = jnp.dot(a, bt, preferred_element_type=jnp.float32)   # MXU
        na = jnp.sum(a * a, axis=1, keepdims=True)
        dist = na + nb_ref[:] - 2.0 * ab           # (SUB, N2)
        dist = jnp.where(v2_ref[:] > 0, jnp.maximum(dist, 0.0), jnp.inf)
        d1 = jnp.min(dist, axis=1)                 # (SUB,)
        col = lax.broadcasted_iota(jnp.int32, dist.shape, 1)
        i1 = jnp.min(jnp.where(dist == d1[:, None], col, big), axis=1)
        d2 = jnp.min(jnp.where(col == i1[:, None], jnp.inf, dist), axis=1)
        d1o = jnp.where(rows8 == sub, d1[None, :], d1o)
        d2o = jnp.where(rows8 == sub, d2[None, :], d2o)
        i1o = jnp.where(rows8 == sub, i1[None, :], i1o)
    d1_ref[:] = d1o
    d2_ref[:] = d2o
    i1_ref[:] = i1o


@functools.partial(jax.jit, static_argnames=("interpret",))
def best2_l2_pallas(desc1: jnp.ndarray, desc2: jnp.ndarray,
                    valid2: jnp.ndarray, interpret: bool = False):
    """(best, second-best, argbest) of squared-L2 distances per desc1 row.

    desc1 (N1,128) u8/f32, desc2 (N2,128) u8/f32, valid2 (N2,) bool.
    Returns (d1 (N1,) f32, d2 (N1,) f32, i1 (N1,) int32) — drop-in for
    ops.match._best2_l2 (parity: tests/test_match.py).
    """
    n1, d = desc1.shape
    n2 = desc2.shape[0]
    assert d == 128 and n2 <= MAX_N2
    n1p = _round_up(max(n1, TILE1), TILE1)
    n2p = _round_up(max(n2, 128), 128)
    a = jnp.zeros((n1p, 128), jnp.float32).at[:n1].set(
        desc1.astype(jnp.float32))
    bt = jnp.zeros((128, n2p), jnp.float32).at[:, :n2].set(
        desc2.astype(jnp.float32).T)
    nb = jnp.zeros((1, n2p), jnp.float32).at[0, :n2].set(
        jnp.sum(desc2.astype(jnp.float32) ** 2, axis=1))
    v2 = jnp.zeros((1, n2p), jnp.float32).at[0, :n2].set(
        valid2.astype(jnp.float32))

    grid = n1p // TILE1
    rows = TILE1 // SUB
    d1, d2, i1 = pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TILE1, 128), lambda i: (i, 0)),
            pl.BlockSpec((128, n2p), lambda i: (0, 0)),   # resident panel
            pl.BlockSpec((1, n2p), lambda i: (0, 0)),
            pl.BlockSpec((1, n2p), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((rows, SUB), lambda i: (i, 0)),
            pl.BlockSpec((rows, SUB), lambda i: (i, 0)),
            pl.BlockSpec((rows, SUB), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n1p // SUB, SUB), jnp.float32),
            jax.ShapeDtypeStruct((n1p // SUB, SUB), jnp.float32),
            jax.ShapeDtypeStruct((n1p // SUB, SUB), jnp.int32),
        ],
        interpret=interpret,
    )(a, bt, nb, v2)
    return (
        d1.reshape(-1)[:n1],
        d2.reshape(-1)[:n1],
        i1.reshape(-1)[:n1],
    )
