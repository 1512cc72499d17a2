"""Interleaved on-chip A/B of the multi-octave compact kernel variants.

Isolates compact_masks_multi: masks are computed once, held as bool
constants, and re-derived each chain step via a traced gate (keeps the
XLA prep - astype/pad/concat - inside the loop like production, defeats
hoisting).  All variants run in ONE process so deltas dodge the +-0.5 ms
cross-run noise floor.

Run on the real chip:  python tools/ab_compact.py [--shape 1080 1920]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

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
    rows = [
        ("sum", variant(extract_mode="sum")),
        ("rowmm", variant(extract_mode="rowmm")),
        ("rowmm_rows256", variant(extract_mode="rowmm", tile_rows=256)),
        ("sum_rows256", variant(extract_mode="sum", tile_rows=256)),
    ]
    out = {}
    for name, fn in rows:
        ms = chained_ms(fn, x0, n_hi=args.n_hi, reps=args.reps)
        out[name] = round(ms, 3)
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
