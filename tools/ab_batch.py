"""On-chip probe: single-chip frame-batched SIFT frontend throughput.

detect_and_describe_batched over B frames vs B=1 — one detection launch set
for the whole batch amortizes launch overheads and serial-grid gaps.
(jax.vmap over the pipeline is NOT used: Mosaic cannot batch ANY-space
refs — "Pallas TPU lowering ... memory space ANY only ... trivial
index_map".)  Reports ms/frame per variant.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sift_pyocl_tpu.utils.benchtool import ab_args, chained_ms


def main():
    args = ab_args(n_hi=9, reps=2, extra=lambda ap: ap.add_argument(
        "--batches", type=int, nargs="+", default=[1, 2, 4]))
    import jax.numpy as jnp
    import numpy as np

    from sift_pyocl_tpu import SiftConfig
    from sift_pyocl_tpu.models.sift import detect_and_describe_batched
    from sift_pyocl_tpu.utils.testimage import synthetic_scene

    cfg = SiftConfig()
    shape = tuple(args.shape)
    base = np.asarray(synthetic_scene(shape, n_blobs=200, seed=0))

    out = {}
    for B in args.batches:
        imgs = jnp.asarray(
            np.stack([base + i for i in range(B)]).astype(np.float32))

        def step(c):
            b = detect_and_describe_batched(c, cfg)
            return [b.x.sum(), b.desc.astype(jnp.float32).sum(),
                    b.valid.sum()]

        try:
            ms = chained_ms(step, imgs, n_hi=args.n_hi, reps=args.reps)
            out[f"b{B}_ms_per_frame"] = round(ms / B, 3)
        except Exception as e:  # noqa: BLE001
            out[f"b{B}_ms_per_frame"] = f"FAILED: {type(e).__name__}: {str(e)[:200]}"
        print(json.dumps({f"b{B}": out[f"b{B}_ms_per_frame"]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
