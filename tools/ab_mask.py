"""Interleaved on-chip A/B of the extrema-mask formulations.

"stencil" (26 fused shifted compares) vs "pools" (shared separable 3-pools),
timed on the pyramid->mask->compact chain in ONE process.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sift_pyocl_tpu.utils.benchtool import ab_args, run_ab_rows


def main():
    args = ab_args()
    import jax.numpy as jnp

    from sift_pyocl_tpu import SiftConfig
    from sift_pyocl_tpu.models.sift import octave_capacities
    from sift_pyocl_tpu.ops.detect import extrema_mask
    from sift_pyocl_tpu.ops.pallas.compact import compact_masks_multi
    from sift_pyocl_tpu.ops.pyramid import build_scale_space_jax
    from sift_pyocl_tpu.utils.testimage import synthetic_scene

    cfg = SiftConfig()
    shape = tuple(args.shape)
    cl = [c for c, _ in octave_capacities(shape, cfg)]
    img = jnp.asarray(synthetic_scene(shape, n_blobs=200, seed=0))

    def chain(variant):
        def step(c):
            octs = build_scale_space_jax(c, cfg)
            masks = [extrema_mask(d, cfg, o, variant=variant)
                     for o, (_, d) in enumerate(octs)]
            idx, w, tot = compact_masks_multi(masks, cl)
            return [idx.astype(jnp.float32).sum(), w.sum(), tot.sum()]
        return step

    run_ab_rows([("stencil", chain("stencil")), ("pools", chain("pools")),
                 ("stencil_b", chain("stencil")), ("pools_b", chain("pools"))],
                img, args)


if __name__ == "__main__":
    main()
