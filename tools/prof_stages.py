"""Fine-grained on-chip stage profile of the production SIFT+VO path.

Cumulative chained-slope timings; stage costs are deltas between rows.
Run on the real chip:  python tools/prof_stages.py [--shape 1080 1920]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/.jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, nargs=2, default=[1080, 1920])
    ap.add_argument("--n-hi", type=int, default=9)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--stages", type=str, default="")
    args = ap.parse_args()

    from sift_pyocl_tpu import SiftConfig
    from sift_pyocl_tpu.models.sift import octave_capacities
    from sift_pyocl_tpu.models.vo import VOConfig, vo_init, vo_step
    from sift_pyocl_tpu.utils.benchtool import chained_ms
    from sift_pyocl_tpu.utils.testimage import synthetic_scene

    cfg = SiftConfig()
    shape = tuple(args.shape)
    caps = octave_capacities(shape, cfg)
    img = jnp.asarray(synthetic_scene(shape, n_blobs=200, seed=0))
    K = jnp.asarray([[1000.0, 0, shape[1] / 2],
                     [0, 1000.0, shape[0] / 2], [0, 0, 1.0]], jnp.float32)

    from sift_pyocl_tpu.ops.detect import decode_compacted, extrema_mask
    from sift_pyocl_tpu.ops.pallas.compact import compact_masks_multi
    from sift_pyocl_tpu.ops.pallas.gradpad import grad_atlas_pallas
    from sift_pyocl_tpu.ops.pallas.refine import (build_dog_atlas,
                                                  refine_atlas_pallas)
    from sift_pyocl_tpu.ops.pyramid import build_scale_space_jax
    from sift_pyocl_tpu.models.sift import detect_and_describe
    from sift_pyocl_tpu.ops.match import match_descriptors_dense

    bd = cfg.border_dist
    cl = [c for c, _ in caps]

    def upto(stage):
        def f(c):
            octs = build_scale_space_jax(c, cfg)
            acc = [b.sum() + d.sum() for b, d in octs]
            if stage == "pyramid":
                return acc
            dogs_l = [d for _, d in octs]
            atlas, row_starts = build_dog_atlas(dogs_l)
            masks = [extrema_mask(d, cfg, o) for o, d in enumerate(dogs_l)]
            acc += [m.sum() for m in masks]
            if stage == "mask":
                return acc
            idx_all, written, total = compact_masks_multi(masks, cl)
            acc += [idx_all.sum(), total.sum()]
            if stage == "compact":
                return acc
            s, r, cc, v, rlo, rhi, clo, chi = decode_compacted(
                dogs_l, masks, cl, row_starts, idx_all, written, bd)
            fs, fr_a, fc, peak, accm = refine_atlas_pallas(
                atlas, s, r, cc, v, rlo, rhi, clo, chi,
                peak_thresh=cfg.peak_thresh, max_moves=cfg.max_interp_moves)
            acc += [fs.sum(), fr_a.sum(), accm.sum()]
            if stage == "refine":
                return acc
            mag_a, ori_a, rs2 = grad_atlas_pallas(
                [b for b, _ in octs], cfg.scales)
            acc += [mag_a.sum(), ori_a.sum()]
            return acc
        return f

    def full(c):
        b = detect_and_describe(c, cfg)
        return [b.x.sum(), b.angle.sum(), b.desc.astype(jnp.float32).sum(),
                b.valid.sum()]

    vo = VOConfig()
    st0 = vo_init(img, K, cfg, vo)
    P = vo.window * vo.pts_per_frame

    def front_match(c):
        b = detect_and_describe(c, cfg)
        keep, mid, d, d2 = match_descriptors_dense(
            b.desc, b.valid, st0.Xdesc.reshape(P, 128),
            st0.Xvalid.reshape(P) > 0, metric=vo.match_metric,
            ratio_sq=vo.ratio_sq)
        return [keep.sum(), d.sum(), b.x.sum(),
                b.desc.astype(jnp.float32).sum()]

    def front_pnp(c):
        from sift_pyocl_tpu.sfm.pnp import pnp_refine
        b = detect_and_describe(c, cfg)
        keep, mid, d, d2 = match_descriptors_dense(
            b.desc, b.valid, st0.Xdesc.reshape(P, 128),
            st0.Xvalid.reshape(P) > 0, metric=vo.match_metric,
            ratio_sq=vo.ratio_sq)
        score = jnp.where(keep, -d, -jnp.inf)
        _, sel = jax.lax.approx_max_k(score, vo.pnp_n)
        w_sel = keep[sel].astype(jnp.float32)
        uv_sel = jnp.stack([b.x, b.y], -1)[sel]
        X_sel = st0.X.reshape(P, 3)[mid[sel]]
        R, t, rms = pnp_refine(K, st0.Rs[-1], st0.ts[-1], X_sel, uv_sel,
                               w_sel, iters=vo.pnp_iters,
                               huber_px=vo.huber_px)
        return [t.sum(), rms, keep.sum(), b.x.sum()]

    def vostep(c):
        st2, out = vo_step(st0, c, K, cfg, vo)
        return [out.ba_cost, st2.lam, out.t.sum()]

    # --- isolated sub-stages (cost not chained on the frontend) ---------
    from sift_pyocl_tpu.sfm.ba import BAObs, BAParams, lm_iteration

    def ba_iso(c):
        s = jnp.tanh(c[0, 0] * 1e-9) * 1e-5
        params = BAParams(st0.Rs, st0.ts + s, st0.X.reshape(P, 3))
        cam_ids = jnp.repeat(
            jnp.arange(vo.window, dtype=jnp.int32)[:, None],
            vo.obs_per_frame, axis=1).reshape(-1)
        obs = BAObs(uv=st0.obs_uv.reshape(-1, 2), cam=cam_ids,
                    pt=jnp.maximum(st0.obs_pt.reshape(-1), 0),
                    w=st0.obs_w.reshape(-1))
        free = jnp.arange(vo.window) > 0
        p2, lam2, cost, _ = lm_iteration(
            params, obs, K, st0.lam, free, huber_px=vo.huber_px,
            cg_iters=vo.cg_iters, n_points=P, cam_blocked=True,
            pt_onehot=True, dense_schur=True)
        return [cost, lam2, p2.ts.sum()]

    def match2_iso(c):
        s = jnp.tanh(c[0, 0] * 1e-9)
        d1 = st0.prev_desc[: vo.pts_per_frame]
        v1 = st0.prev_valid[: vo.pts_per_frame] & (s > -2)
        pk, pidx, pd, pd2 = match_descriptors_dense(
            d1, v1, st0.prev_desc, st0.prev_valid,
            metric=vo.match_metric, ratio_sq=vo.ratio_sq)
        return [pk.sum(), pd.sum()]

    rows = [
        ("pyramid", upto("pyramid")),
        ("mask", upto("mask")),
        ("compact", upto("compact")),
        ("refine", upto("refine")),
        ("grad", upto("grad")),
        ("frontend", full),
        ("front_match", front_match),
        ("front_pnp", front_pnp),
        ("vo", vostep),
        ("ba_iso", ba_iso),
        ("match2_iso", match2_iso),
    ]
    want = set(args.stages.split(",")) if args.stages else None
    out = {}
    for name, fn in rows:
        if want and name not in want:
            continue
        ms = chained_ms(fn, img, n_hi=args.n_hi, reps=args.reps)
        out[name] = round(ms, 3)
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
