"""On-chip A/B: compact kernel mask input dtype (f32 vs i8), chain context.

The isolated compact kernel is ~0.3-0.5 ms, but in the production chain the
stage delta is ~1.5 ms — the f32 pad/concat materialization of ~33 MB of
masks is the suspect.  i8 input cuts that 4x.  Both variants timed on the
full pyramid->mask->compact chain, interleaved in one process.
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

    def chain(dtype):
        def step(c):
            octs = build_scale_space_jax(c, cfg)
            masks = [extrema_mask(d, cfg, o) for o, (_, d) in enumerate(octs)]
            idx, w, tot = compact_masks_multi(masks, cl, input_dtype=dtype)
            return [idx.astype(jnp.float32).sum(), w.sum(), tot.sum()]
        return step

    run_ab_rows([("f32", chain("float32")), ("i8", chain("int8")),
                 ("f32_b", chain("float32")), ("i8_b", chain("int8"))],
                img, args)


if __name__ == "__main__":
    main()
