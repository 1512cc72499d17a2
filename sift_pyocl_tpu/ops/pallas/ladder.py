"""Fused whole-pyramid ladder kernel for the small octaves.

TPU-native replacement for the reference's per-scale convolution round trips
(reference: openCL/convolution.cl + algebra.cl::combine + preprocess.cl::shrink
over the octave loop of sift-src/plan.py::_one_octave — SURVEY.md §3.2).

Motivation (measured on v5e): one Pallas launch costs ~0.27 ms on this
platform, and octaves >= 1 need 5 blurs each — launch overhead dominates
(octave 0's five tiled blurs cost 0.8 ms; the remaining ~25 launches cost
~7 ms of almost pure overhead).  Every octave >= 1 of a 1080p frame fits in
VMEM, so this kernel computes ALL of them in ONE launch:

  per octave: 5 x (edge-replicate margins -> horizontal pass -> vertical
  pass) with dynamic-shift rolls; DoG as an in-VMEM subtraction staged
  through the idle pass buffer; 2x downsampling on the MXU via 0/1
  selection matmuls (Mosaic has no strided slices; a selection matmul is
  exact — each output is a single 1.0*x term — and costs microseconds);
  blur/DoG planes are DMA'd straight to HBM outputs.

Borders follow the oracle exactly: each level's input is edge-replicated
into the margin before convolving, which reproduces clamp-to-edge per level
(identical to blurring the full image with edge padding).  Buffers are sized
for the largest small octave; smaller octaves compute on static sub-slices
so the vector work shrinks 4x per octave.

Buffer rotation: levels ping-pong between bufs[0] and bufs[2] with bufs[1]
holding the horizontal pass; level L lands in bufs[2] for odd L, bufs[0]
for even L (base = level 0 starts in bufs[0]).  The next octave's base is
downsampled EARLY — in the iteration that produces level `scales` — because
that buffer is overwritten two levels later.
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

MR = 16    # row margin (>= max tap half-width 13)
MC = 128   # lane margin (DMA/lane alignment)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _geometry(h1: int, w1: int, n_oct: int):
    """Static per-octave sizes: (H, W, Hp8, Wp128, Hb, Wb) with halving.

    The image sits at the buffer origin; the single tail margin region holds
    BOTH edge pads: rows [H, H+MR) replicate the bottom edge (reads past the
    end) and rows [Hb-MR, Hb) replicate the top edge (negative reads arrive
    there via roll wrap-around).  Same for lanes.  This keeps every DMA
    origin (0, 0)-aligned and minimizes VMEM.
    """
    geo = []
    h, w = h1, w1
    for _ in range(n_oct):
        geo.append((
            h, w, _round_up(h, 8), _round_up(w, 128),
            _round_up(h + 2 * MR, 8), _round_up(w + 2 * MR, 128),
        ))
        # ceil halving: matches img[::2, ::2] / oracle.shrink2 at odd dims
        h, w = (h + 1) // 2, (w + 1) // 2
    return geo


def _kernel(taps_ref, base_hbm, *refs, geo, tap_offsets, tap_sizes,
            n_levels, scales, ds_mode="shrink", mask_cfg=None):
    n_oct = len(geo)
    per = 3 if mask_cfg is not None else 2
    outs = refs[: per * n_oct]          # blur_o, dog_o[, mask_o] interleaved
    if mask_cfg is not None:
        (b0, b1, b2, nextbase, d0, d1, d2, mbuf,
         sem, osem, msem) = refs[per * n_oct :]
        dring = [d0, d1, d2]
    else:
        b0, b1, b2, nextbase = refs[per * n_oct : per * n_oct + 4]
        sem, osem = refs[per * n_oct + 4 :]
    bufs = [b0, b1, b2]

    # first small octave's base -> bufs[0] at the buffer origin (the 2x
    # downsample from octave 0 happens in XLA as exact selection matmuls —
    # see ops.pyramid.downsample2; strided slices are the pathological op)
    cpy = pltpu.make_async_copy(
        base_hbm, b0.at[pl.ds(0, geo[0][2]), pl.ds(0, geo[0][3])], sem
    )
    cpy.start()
    cpy.wait()

    for o, (H, W, Hp8, Wp128, Hb, Wb) in enumerate(geo):

        def edge_replicate(ref, H=H, W=W, Hb=Hb, Wb=Wb):
            # margin-region writes only (a full-plane where-chain would keep
            # ~9 plane-sized temporaries live on the Mosaic stack and OOM).
            # [H, Hb-MR) <- bottom edge (direct over-reads);
            # [Hb-MR, Hb) <- top edge (negative reads wrap around via roll).
            ref[H : Hb - MR, 0:Wb] = jnp.broadcast_to(
                ref[H - 1 : H, 0:Wb], (Hb - MR - H, Wb)
            )
            ref[Hb - MR : Hb, 0:Wb] = jnp.broadcast_to(
                ref[0:1, 0:Wb], (MR, Wb)
            )
            ref[0:Hb, W : Wb - MR] = jnp.broadcast_to(
                ref[0:Hb, W - 1 : W], (Hb, Wb - MR - W)
            )
            ref[0:Hb, Wb - MR : Wb] = jnp.broadcast_to(
                ref[0:Hb, 0:1], (Hb, MR)
            )

        def conv_pass(src_ref, dst_ref, lvl, axis, Hb=Hb, Wb=Wb):
            # ONE static roll per plane + STATIC unrolled tap slices (the
            # ladder0/maskk lesson: dynamic-shift rolls in fori_loops
            # measured ~9x slower than static slices on Mosaic — this
            # rewrite took the small-octave ladder 1.8 -> 0.65 ms).  With
            # r = roll(x, half), out[c] = sum_k t_k x[c+k-half] becomes
            # sum_k t_k r[c+k]: every read is a static slice; negative
            # reads wrap into the tail margin, which edge_replicate filled
            # with the top/left edge replicas (same trick as before).
            # Output cols/rows [size-2*half, size) go stale, but they lie
            # beyond the true image (size - 2*half >= dim + 2*MR - 2*half
            # > dim + 6) and are rebuilt by edge_replicate or sliced off.
            # Accumulation keeps the OLD tap order (center, then ascending
            # skipping center) so results stay bit-identical.
            off = tap_offsets[lvl]
            K = tap_sizes[lvl]
            half = (K - 1) // 2
            order = [half] + [k for k in range(K) if k != half]
            if axis == 1:
                CH = next(c for c in (64, 32, 16, 8) if Hb % c == 0)
                nch = Hb // CH
                w = Wb - 2 * half

                def row_chunk(rb, _):
                    r0_ = pl.multiple_of(rb * CH, 8)
                    x = src_ref[pl.ds(r0_, CH), 0:Wb]
                    r = pltpu.roll(x, half, 1)
                    # accumulate INTO the dst ref: unrolled value-accumulate
                    # piles chunk temporaries on the Mosaic stack (no
                    # liveness reuse in straight-line code) and OOMs VMEM
                    dst_ref[pl.ds(r0_, CH), 0:w] = (
                        r[:, half : half + w] * taps_ref[off + half]
                    )
                    for k in order[1:]:
                        dst_ref[pl.ds(r0_, CH), 0:w] += (
                            r[:, k : k + w] * taps_ref[off + k]
                        )
                    return 0

                lax.fori_loop(0, nch, row_chunk, 0)
            else:
                CW = next(c for c in (256, 128) if Wb % c == 0)
                ncw = Wb // CW
                h = Hb - 2 * half

                def col_chunk(cb, _):
                    c0_ = pl.multiple_of(cb * CW, 128)
                    x = src_ref[0:Hb, pl.ds(c0_, CW)]
                    r = pltpu.roll(x, half, 0)
                    dst_ref[0:h, pl.ds(c0_, CW)] = (
                        r[half : half + h, :] * taps_ref[off + half]
                    )
                    for k in order[1:]:
                        dst_ref[0:h, pl.ds(c0_, CW)] += (
                            r[k : k + h, :] * taps_ref[off + k]
                        )
                    return 0

                lax.fori_loop(0, ncw, col_chunk, 0)

        def emit(ref, out, s_idx, Hp8=Hp8, Wp128=Wp128):
            cp = pltpu.make_async_copy(
                ref.at[pl.ds(0, Hp8), pl.ds(0, Wp128)], out.at[s_idx], osem
            )
            cp.start()
            cp.wait()

        def downsample(src_ref, o=o, H=H, W=W, Hp8=Hp8, Wp128=Wp128):
            """bufs -> nextbase via selection/averaging matmuls.

            shrink: y[r', c'] = x[2r', 2c'] (0/1 selection); bin: 2x2 mean
            with explicit 0.5/1.0 edge weights (margin rows hold blurred
            margins, NOT exact replicas, so weights must be explicit —
            oracle.bin2 numerics).  Chunked over 128-lane output columns:
            out_chunk = ER @ (x @ EC), keeping every temporary chunk-sized
            (VMEM stack discipline).  Contracts over [0, Hp8) x [0, Wp128)
            only: selections never index past row H / col W, and rows
            [Hb - 2*half, Hb) are stale after the static-slice conv pass
            (0 * NaN would poison the matmul)."""
            HbN, WbN = geo[o + 1][4], geo[o + 1][5]
            HN, WN = geo[o + 1][0], geo[o + 1][1]
            ri = lax.broadcasted_iota(jnp.int32, (HbN, Hp8), 0)
            rj = lax.broadcasted_iota(jnp.int32, (HbN, Hp8), 1)
            if ds_mode == "bin":
                has2 = 2 * ri + 1 < H
                ER = jnp.where(
                    (rj == 2 * ri) & (ri < HN),
                    jnp.where(has2, 0.5, 1.0), 0.0,
                ) + jnp.where((rj == 2 * ri + 1) & (ri < HN) & has2, 0.5, 0.0)
            else:
                ER = ((rj == 2 * ri) & (ri < HN)).astype(jnp.float32)
            for cb in range(WbN // 128):
                ci = lax.broadcasted_iota(jnp.int32, (Wp128, 128), 0)
                cj = lax.broadcasted_iota(jnp.int32, (Wp128, 128), 1) + cb * 128
                if ds_mode == "bin":
                    chas2 = 2 * cj + 1 < W
                    EC = jnp.where(
                        (ci == 2 * cj) & (cj < WN),
                        jnp.where(chas2, 0.5, 1.0), 0.0,
                    ) + jnp.where((ci == 2 * cj + 1) & (cj < WN) & chas2, 0.5, 0.0)
                else:
                    EC = ((ci == 2 * cj) & (cj < WN)).astype(jnp.float32)
                t = jnp.dot(src_ref[0:Hp8, 0:Wp128], EC,
                            preferred_element_type=jnp.float32)  # (Hp8, 128)
                nextbase[0:HbN, cb * 128 : (cb + 1) * 128] = jnp.dot(
                    ER, t, preferred_element_type=jnp.float32
                )

        def compute_mask(sd, mask_out, o=o, H=H, W=W, Hp8=Hp8,
                         Wp128=Wp128, Hb=Hb, Wb=Wb):
            """Extrema mask for DoG scale sd from the VMEM-resident dring
            (oracle.local_maxmin numerics, bit-identical to
            ops.detect.extrema_mask on the same DoG values).  The image sits
            at the buffer ORIGIN here, so row/col -1 neighbors come from a
            1-step pltpu.roll whose wrapped first row/col is garbage — those
            cells lie inside the discarded [0, bd) border."""
            peak_thresh, eths = mask_cfg
            eth = eths[o]
            D0, D1, D2 = (dring[(sd - 1) % 3], dring[sd % 3],
                          dring[(sd + 1) % 3])
            CH = next(c for c in (64, 32, 16, 8) if Hp8 % c == 0)

            def chunk(rb, first):
                # col -1 / +1 neighbors via one ±1 pltpu.roll per plane
                # (Wb == Wp128 on the smallest octaves, so a +1 static
                # slice would run off the buffer); the wrapped first/last
                # columns are garbage inside the discarded [0, bd) border.
                rows = []
                for D in (D0, D1, D2):
                    if first:
                        x = D[pl.ds(0, CH + 16), 0:Wb]
                        xu = pltpu.roll(x, 1, 0)   # xu[i] = x[i-1]
                        sl = (lambda z: z[0:CH], lambda z: z[0:CH],
                              lambda z: z[1 : 1 + CH])
                        srcs = (xu, x, x)
                    else:
                        lb = pl.multiple_of(rb * CH - 8, 8)
                        x = D[pl.ds(lb, CH + 16), 0:Wb]
                        sl = (lambda z: z[7 : 7 + CH],
                              lambda z: z[8 : 8 + CH],
                              lambda z: z[9 : 9 + CH])
                        srcs = (x, x, x)
                    xl = pltpu.roll(x, 1, 1)        # xl[:, j] = x[:, j-1]
                    xr = pltpu.roll(x, Wb - 1, 1)   # xr[:, j] = x[:, j+1]
                    if first:
                        xul = pltpu.roll(xu, 1, 1)
                        xur = pltpu.roll(xu, Wb - 1, 1)
                        srcs_l = (xul, xl, xl)
                        srcs_r = (xur, xr, xr)
                    else:
                        srcs_l = (xl, xl, xl)
                        srcs_r = (xr, xr, xr)
                    trip = tuple(sl[i](srcs[i])[:, 0:Wp128]
                                 for i in range(3))
                    tripl = tuple(sl[i](srcs_l[i])[:, 0:Wp128]
                                  for i in range(3))
                    tripr = tuple(sl[i](srcs_r[i])[:, 0:Wp128]
                                  for i in range(3))
                    rows.append((tripl, trip, tripr))
                va = rows[1][1][1]
                strong = jnp.abs(va) > jnp.float32(0.8 * peak_thresh)
                ismax = strong
                ismin = strong
                for pi, triples in enumerate(rows):
                    for ri in range(3):
                        for ci in range(3):
                            if pi == 1 and ri == 1 and ci == 1:
                                continue
                            nb = triples[ci][ri]
                            ismax = ismax & (va > nb)
                            ismin = ismin & (va < nb)
                (xal, xcl, xbl), (xa, xc, xb), (xar, xcr, xbr) = rows[1]
                ctr = va
                hxx = xcl + xcr - 2 * ctr
                hyy = xa + xb - 2 * ctr
                hxy = 0.25 * (xbr - xbl - xar + xal)
                det = hxx * hyy - hxy * hxy
                tr = hxx + hyy
                not_edge = (det > 0) & (det >= jnp.float32(eth) * tr * tr)
                m = (ismax | ismin) & not_edge
                mbuf[pl.ds(pl.multiple_of(rb * CH, 8), CH), 0:Wp128] = (
                    m.astype(jnp.int8)
                )
                return 0

            chunk(0, True)
            if Hp8 // CH > 1:
                lax.fori_loop(1, Hp8 // CH, lambda rb, _: chunk(rb, False),
                              0)
            cp = pltpu.make_async_copy(
                mbuf.at[pl.ds(0, Hp8), pl.ds(0, Wp128)],
                mask_out.at[sd - 1], msem,
            )
            cp.start()
            cp.wait()

        blur_out = outs[per * o]
        dog_out = outs[per * o + 1]
        emit(bufs[0], blur_out, 0)           # level 0 = octave base
        cur, htmp, nxt = 0, 1, 2
        for lvl in range(n_levels):
            edge_replicate(bufs[cur])
            conv_pass(bufs[cur], bufs[htmp], lvl, 1)   # horizontal
            edge_replicate(bufs[htmp])
            conv_pass(bufs[htmp], bufs[nxt], lvl, 0)   # vertical
            emit(bufs[nxt], blur_out, lvl + 1)
            # DoG staged through the (now idle) horizontal-pass buffer —
            # or the dring ring when the fused mask needs 3 live scales —
            # subtracted in row chunks (VMEM stack discipline)
            dtgt = dring[lvl % 3] if mask_cfg is not None else bufs[htmp]

            def dog_chunk(rb, _, a=bufs[nxt], b=bufs[cur], d=dtgt,
                          Hb=Hb, Wb=Wb):
                r0_ = pl.multiple_of(rb * 8, 8)
                d[pl.ds(r0_, 8), 0:Wb] = (
                    a[pl.ds(r0_, 8), 0:Wb] - b[pl.ds(r0_, 8), 0:Wb]
                )
                return 0

            lax.fori_loop(0, Hb // 8, dog_chunk, 0)
            emit(dtgt, dog_out, lvl)
            if mask_cfg is not None and lvl >= 2:
                compute_mask(lvl - 1, outs[per * o + 2])
            if lvl == scales - 1 and o + 1 < len(geo):
                downsample(bufs[nxt])        # level `scales`, before overwrite
            cur, nxt = nxt, cur

        if o + 1 < len(geo):
            HbN, WbN = geo[o + 1][4], geo[o + 1][5]
            bufs[0][0:HbN, 0:WbN] = nextbase[0:HbN, 0:WbN]


@functools.partial(jax.jit, static_argnames=("cfg_key", "interpret"))
def _run(base1, taps_flat, cfg_key, interpret):
    (h1, w1, n_oct, tap_offsets, tap_sizes, n_levels, scales, ds_mode,
     mask_cfg) = cfg_key
    geo = _geometry(h1, w1, n_oct)
    Hb, Wb = geo[0][4], geo[0][5]
    HbN = geo[1][4] if n_oct > 1 else 8
    WbN = geo[1][5] if n_oct > 1 else 128
    out_shapes = []
    for (H, W, Hp8, Wp128, _, _) in geo:
        out_shapes.append(
            jax.ShapeDtypeStruct((n_levels + 1, Hp8, Wp128), jnp.float32)
        )
        out_shapes.append(
            jax.ShapeDtypeStruct((n_levels, Hp8, Wp128), jnp.float32)
        )
        if mask_cfg is not None:
            out_shapes.append(
                jax.ShapeDtypeStruct((n_levels - 2, Hp8, Wp128), jnp.int8)
            )
    base_pad = jnp.pad(
        base1, ((0, geo[0][2] - h1), (0, geo[0][3] - w1)), mode="edge"
    )
    scratch = [
        pltpu.VMEM((Hb, Wb), jnp.float32),
        pltpu.VMEM((Hb, Wb), jnp.float32),
        pltpu.VMEM((Hb, Wb), jnp.float32),
        pltpu.VMEM((HbN, WbN), jnp.float32),
    ]
    if mask_cfg is not None:
        scratch += [
            pltpu.VMEM((Hb, Wb), jnp.float32),
            pltpu.VMEM((Hb, Wb), jnp.float32),
            pltpu.VMEM((Hb, Wb), jnp.float32),
            pltpu.VMEM((geo[0][2], geo[0][3]), jnp.int8),
        ]
    scratch += [pltpu.SemaphoreType.DMA(()), pltpu.SemaphoreType.DMA(())]
    if mask_cfg is not None:
        scratch.append(pltpu.SemaphoreType.DMA(()))
    outs = pl.pallas_call(
        functools.partial(
            _kernel,
            geo=geo,
            tap_offsets=tap_offsets,
            tap_sizes=tap_sizes,
            n_levels=n_levels,
            scales=scales,
            ds_mode=ds_mode,
            mask_cfg=mask_cfg,
        ),
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=tuple(
            pl.BlockSpec(memory_space=pl.ANY) for _ in out_shapes
        ),
        out_shape=tuple(out_shapes),
        scratch_shapes=scratch,
        # the static-slice conv rewrite sits just past Mosaic's default
        # 16 MB scoped-VMEM limit (scratch ~7 MB + unrolled chunk temps);
        # v5e has 128 MB of physical VMEM — raise the cap instead of
        # shrinking chunks (smaller chunks measured slower)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(taps_flat, base_pad)
    return outs


def small_octaves_ladder(
    base1: jnp.ndarray,
    increments: Sequence[float],
    n_oct: int,
    scales: int,
    ds_mode: str = "shrink",
    interpret: bool = False,
    mask_cfg=None,
) -> List[Tuple[jnp.ndarray, ...]]:
    """Blur/DoG stacks for octaves >= 1 in ONE kernel launch.

    base1: (H1, W1) f32 — the first small octave's base image (octave 0's
    level-`scales` blur, downsampled in XLA via ops.pyramid.downsample2).
    increments: per-level Gaussian sigma increments (len = scales + 2).
    Returns [(blurs (S+3, H, W), dogs (S+2, H, W)), ...] per octave.

    mask_cfg: optional (peak_thresh, (eth_per_octave, ...)) — when given,
    each octave's extrema mask (oracle.local_maxmin) is computed IN-KERNEL
    from the VMEM-resident DoG planes and returned as a third per-octave
    value, an (S, H, W) int8 stack whose border rows/cols are garbage
    (slice [bd:-bd] before use).
    """
    from ...oracle import gaussian_kernel

    taps_list = [gaussian_kernel(s) for s in increments]
    offsets, sizes = [], []
    off = 0
    for t in taps_list:
        offsets.append(off)
        sizes.append(len(t))
        off += len(t)
    taps_flat = jnp.asarray(np.concatenate(taps_list), dtype=jnp.float32)
    h1, w1 = base1.shape
    cfg_key = (
        h1, w1, n_oct, tuple(offsets), tuple(sizes), len(taps_list), scales,
        ds_mode, mask_cfg,
    )
    outs = _run(base1, taps_flat, cfg_key, interpret)
    geo = _geometry(h1, w1, n_oct)
    per = 3 if mask_cfg is not None else 2
    result = []
    for o, (H, W, _, _, _, _) in enumerate(geo):
        blurs = outs[per * o][:, :H, :W]
        dogs = outs[per * o + 1][:, :H, :W]
        if mask_cfg is not None:
            result.append((blurs, dogs, outs[per * o + 2][:, :H, :W]))
        else:
            result.append((blurs, dogs))
    return result
