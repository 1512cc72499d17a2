#!/usr/bin/env python
"""Standalone refine-kernel microbench (tuning aid).

Measures `refine_atlas_pallas` alone, on real candidate data from a 1080p
detect front half, with the chained-slope protocol.  Used for in-process
A/Bs of kernel variants (cross-run deltas drown in ~±0.5 ms platform noise;
findings so far: KP_BLOCK 8->16 helped; swapping full-plane one-hot
sampling for scratch-row sampling was neutral; cross-step double-buffered
window DMAs were neutral — the kernel is bound by per-candidate serial
overhead, not VPU throughput or DMA latency).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sift_pyocl_tpu.utils.benchtool import ab_args, chained_ms


def main():
    args = ab_args(n_hi=9, reps=1)
    import jax.numpy as jnp

    from sift_pyocl_tpu import SiftConfig
    from sift_pyocl_tpu.ops.detect import decode_compacted, extrema_mask
    from sift_pyocl_tpu.ops.pallas.compact import compact_masks_multi
    from sift_pyocl_tpu.ops.pallas import refine as rf
    from sift_pyocl_tpu.models.sift import octave_capacities
    from sift_pyocl_tpu.ops.pyramid import build_scale_space_jax
    from sift_pyocl_tpu.utils.testimage import synthetic_scene

    cfg = SiftConfig()
    shape = tuple(args.shape)
    img = jnp.asarray(synthetic_scene(shape, seed=0), jnp.float32)
    caps = [c for c, _ in octave_capacities(shape, cfg)]

    octs = build_scale_space_jax(img, cfg)
    dogs_l = [d for _, d in octs]
    atlas, row_starts = rf.build_dog_atlas(dogs_l)
    masks = [extrema_mask(d, cfg, o) for o, d in enumerate(dogs_l)]
    idx_all, written, total = compact_masks_multi(masks, caps)
    # the production decode (ops.detect.decode_compacted), so the bench
    # always feeds the kernel exactly what detect_all_octaves_pallas does
    s_cat, r_cat, c_cat, v_cat, rlo, rhi, clo, chi = decode_compacted(
        dogs_l, masks, caps, row_starts, idx_all, written, cfg.border_dist
    )
    v_cat = v_cat.astype(jnp.int32)
    print("valid candidates:", int(v_cat.sum()), "of", int(v_cat.shape[0]),
          flush=True)

    def make_step(mm):
        def step(a):
            fs, fr, fc, peak, acc = rf.refine_atlas_pallas(
                a, s_cat, r_cat, c_cat, v_cat, rlo, rhi, clo, chi,
                peak_thresh=cfg.peak_thresh, max_moves=mm,
            )
            return {"s": [fs.sum(), fr.sum(), fc.sum(), peak.sum(),
                          acc.sum()]}
        return step

    # max_moves sweep: if time scales with the move count, the kernel is
    # bound by the per-candidate SERIAL move loop (scalar dependency chain),
    # not vector throughput or DMA
    for rep in range(2):
        for mm in (5, 1, 0):
            ms = chained_ms(make_step(mm), atlas, n_hi=args.n_hi,
                            reps=args.reps)
            print(f"rep{rep} max_moves={mm}: {ms:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
