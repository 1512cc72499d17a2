"""On-chip A/B: compact kernel mask input dtype (f32 vs i8), chain context.

The isolated compact kernel is ~0.3-0.5 ms, but in the production chain the
stage delta is ~1.5 ms — the f32 pad/concat materialization of ~33 MB of
masks is the suspect.  i8 input cuts that 4x.  Both variants timed on the
full pyramid->mask->compact chain, interleaved in one process.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, nargs=2, default=[1080, 1920])
    ap.add_argument("--n-hi", type=int, default=17)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from sift_pyocl_tpu import SiftConfig
    from sift_pyocl_tpu.models.sift import octave_capacities
    from sift_pyocl_tpu.ops.detect import extrema_mask
    from sift_pyocl_tpu.ops.pallas.compact import compact_masks_multi
    from sift_pyocl_tpu.ops.pyramid import build_scale_space_jax
    from sift_pyocl_tpu.utils.benchtool import chained_ms
    from sift_pyocl_tpu.utils.testimage import synthetic_scene

    cfg = SiftConfig()
    shape = tuple(args.shape)
    caps = octave_capacities(shape, cfg)
    cl = [c for c, _ in caps]
    img = jnp.asarray(synthetic_scene(shape, n_blobs=200, seed=0))

    def chain(dtype):
        def step(c):
            octs = build_scale_space_jax(c, cfg)
            masks = [extrema_mask(d, cfg, o) for o, (_, d) in enumerate(octs)]
            idx, w, tot = compact_masks_multi(masks, cl, input_dtype=dtype)
            return [idx.astype(jnp.float32).sum(), w.sum(), tot.sum()]
        return step

    out = {}
    for name, fn in [("f32", chain("float32")), ("i8", chain("int8")),
                     ("f32_b", chain("float32")), ("i8_b", chain("int8"))]:
        ms = chained_ms(fn, img, n_hi=args.n_hi, reps=args.reps)
        out[name] = round(ms, 3)
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
