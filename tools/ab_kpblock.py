"""On-chip A/B of the fused orient/desc kernel's KP_BLOCK (16 vs 32).

KP_BLOCK is a module constant; each variant mutates it before tracing a
fresh jit of the frontend stage (trace-time constant, so each variant gets
its own executable).  Run on the chip: python tools/ab_kpblock.py
"""
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sift_pyocl_tpu.utils.benchtool import ab_args, chained_ms


def main():
    args = ab_args(extra=lambda ap: ap.add_argument(
        "--blocks", type=int, nargs="+", default=[16, 32, 8]))
    import jax
    import jax.numpy as jnp

    from sift_pyocl_tpu import SiftConfig
    from sift_pyocl_tpu.models.sift import detect_and_describe
    from sift_pyocl_tpu.ops.pallas import window as W
    from sift_pyocl_tpu.utils.testimage import synthetic_scene

    cfg = SiftConfig()
    img = jnp.asarray(synthetic_scene(tuple(args.shape), n_blobs=200, seed=0))

    def frontend(cfg_):
        def step(c):
            b = detect_and_describe(c, cfg_)
            return [b.x.sum(), b.angle.sum(),
                    b.desc.astype(jnp.float32).sum(), b.valid.sum()]
        return step

    variants = [(f"kp_block_{kb}", kb, cfg) for kb in args.blocks]
    variants.append(("kb16_maxori1", 16, dataclasses.replace(cfg, max_ori=1)))
    out = {}
    for name, kb, cfg_ in variants:
        W.KP_BLOCK = kb
        jax.clear_caches()  # the nested jits key on shapes/statics, not on
        # the module global — force retrace so each variant really compiles
        ms = chained_ms(frontend(cfg_), img, n_hi=args.n_hi, reps=args.reps)
        out[name] = round(ms, 3)
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
