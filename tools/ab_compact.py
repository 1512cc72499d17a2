"""Interleaved on-chip A/B of the multi-octave compact kernel variants.

Isolates compact_masks_multi: masks are computed once, held as bool
constants, and re-derived each chain step via a traced gate (keeps the
XLA prep - astype/pad/concat - inside the loop like production, defeats
hoisting).  All variants run in ONE process so deltas dodge the +-0.5 ms
cross-run noise floor.

Run on the real chip:  python tools/ab_compact.py [--shape 1080 1920]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sift_pyocl_tpu.utils.benchtool import ab_args, run_ab_rows


def main():
    args = ab_args()
    import jax.numpy as jnp
    import numpy as np

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

    octs = build_scale_space_jax(img, cfg)
    masks = [np.asarray(extrema_mask(d, cfg, o)) for o, (_, d) in
             enumerate(octs)]

    # --- static stats ---------------------------------------------------
    tile = 64 * 512
    stats = []
    for o, m in enumerate(masks):
        f = m.reshape(-1)
        nt = -(-f.shape[0] // tile)
        pad = np.zeros(nt * tile, bool)
        pad[: f.shape[0]] = f
        per_tile = pad.reshape(nt, tile).sum(1)
        stats.append({"oct": o, "cand": int(f.sum()), "tiles": int(nt),
                      "nonempty": int((per_tile > 0).sum()),
                      "max_tile": int(per_tile.max())})
    print(json.dumps({"stats": stats, "total_cand":
                      int(sum(s["cand"] for s in stats))}), flush=True)

    masks_c = [jnp.asarray(m) for m in masks]

    def variant(**kw):
        def step(c):
            gate = c[0, 0] > jnp.float32(-1e9)
            ms = [jnp.logical_and(m, gate) for m in masks_c]
            idx, w, tot = compact_masks_multi(ms, cl, **kw)
            return [idx.astype(jnp.float32).sum(), w.sum(), tot.sum()]
        return step

    x0 = jnp.zeros((8, 128), jnp.float32)
    run_ab_rows([
        ("sum", variant(extract_mode="sum")),
        ("rowmm", variant(extract_mode="rowmm")),
        ("rowmm_rows256", variant(extract_mode="rowmm", tile_rows=256)),
        ("sum_rows256", variant(extract_mode="sum", tile_rows=256)),
    ], x0, args)


if __name__ == "__main__":
    main()
