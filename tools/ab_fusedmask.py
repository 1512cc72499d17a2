"""Interleaved on-chip A/B of the fused in-ladder extrema mask.

mask_backend="fused" (mask computed inside ladder0/ladder while the DoG
planes are VMEM-resident) vs "xla" (ops.detect.extrema_mask re-reading the
DoG stacks from HBM), timed on the full SIFT frontend AND on the
pyramid->mask->compact sub-chain, in ONE process (the only methodology that
survives the platform's ±0.5 ms cross-run noise).
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sift_pyocl_tpu.utils.benchtool import ab_args, run_ab_rows


def main():
    args = ab_args(n_hi=13)
    import jax.numpy as jnp

    from sift_pyocl_tpu import SiftConfig
    from sift_pyocl_tpu.models.sift import detect_and_describe, octave_capacities
    from sift_pyocl_tpu.ops.detect import extrema_mask
    from sift_pyocl_tpu.ops.pallas.compact import compact_masks_multi
    from sift_pyocl_tpu.ops.pyramid import build_scale_space_and_masks_jax
    from sift_pyocl_tpu.utils.testimage import synthetic_scene

    shape = tuple(args.shape)
    cl = [c for c, _ in octave_capacities(shape, SiftConfig())]
    img = jnp.asarray(synthetic_scene(shape, n_blobs=200, seed=0))

    def subchain(backend):
        cfg = dataclasses.replace(SiftConfig(), mask_backend=backend)

        def step(c):
            octs, masks = build_scale_space_and_masks_jax(c, cfg)
            if masks is None:
                masks = [extrema_mask(d, cfg, o)
                         for o, (_, d) in enumerate(octs)]
            idx, w, tot = compact_masks_multi(masks, cl)
            return [idx.astype(jnp.float32).sum(), w.sum(), tot.sum()]
        return step

    def frontend(backend):
        cfg = dataclasses.replace(SiftConfig(), mask_backend=backend)

        def step(c):
            b = detect_and_describe(c, cfg)
            return [b.x.sum(), b.angle.sum(),
                    b.desc.astype(jnp.float32).sum(), b.valid.sum()]
        return step

    run_ab_rows([
        ("sub_fused", subchain("fused")),
        ("sub_xla", subchain("xla")),
        ("front_fused", frontend("fused")),
        ("front_xla", frontend("xla")),
        ("sub_fused_b", subchain("fused")),
        ("sub_xla_b", subchain("xla")),
        ("front_fused_b", frontend("fused")),
        ("front_xla_b", frontend("xla")),
    ], img, args)


if __name__ == "__main__":
    main()
