#!/usr/bin/env python
"""Per-stage on-chip profiler for the VO pipeline (the ONE stage profiler —
tools/prof_stages.py was merged in here, round-4 consolidation).

Measures, with the chained-slope protocol (utils/benchtool.py):
  pyramid          build_scale_space_jax
  grad_pad         pyramid + gradient_planes + pad_grad_planes (all octaves)
  detect           pyramid + detect_all_octaves_pallas
  refine           pyramid + mask + compact + decode + refine_atlas_pallas
  sift             full detect_and_describe
  front_match      sift + descriptor matching vs the VO map
  front_pnp        front_match + top-k select + pnp_refine
  vo               full fused vo_step
  match            descriptor matching at VO shapes (N kp slots vs W*PN map)
  pnp              pnp_refine at VO shapes
  ba               one lm_iteration at VO shapes (synthetic obs)
  ba_iso           one lm_iteration on the REAL vo_init state
  match2_iso       prev-frame self-match at VO shapes

Stage deltas: grad_pad-pyramid = gradient cost, detect-pyramid = detect,
sift-detect ~ orient+desc (approx: sift also includes grad), vo-sift = VO
tail; front_match-sift = match, front_pnp-front_match = select+PnP.
Select subsets with --stages name1,name2.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from sift_pyocl_tpu.utils.benchtool import ab_args


def main():
    args = ab_args(n_hi=9, reps=2)

    import jax
    import jax.numpy as jnp
    from jax import lax

    from sift_pyocl_tpu import SiftConfig
    from sift_pyocl_tpu.models.sift import detect_and_describe, octave_capacities
    from sift_pyocl_tpu.models.vo import VOConfig, vo_init, vo_step
    from sift_pyocl_tpu.ops.detect import detect_all_octaves_pallas
    from sift_pyocl_tpu.ops.match import match_descriptors_dense
    from sift_pyocl_tpu.ops.orient_desc import gradient_planes
    from sift_pyocl_tpu.ops.pallas.window import pad_grad_planes
    from sift_pyocl_tpu.ops.pyramid import build_scale_space_jax
    from sift_pyocl_tpu.sfm.ba import BAObs, BAParams, lm_iteration
    from sift_pyocl_tpu.sfm.pnp import pnp_refine
    from sift_pyocl_tpu.utils.benchtool import chained_ms
    from sift_pyocl_tpu.utils.testimage import synthetic_scene

    cfg = SiftConfig()
    vo = VOConfig()
    shape = tuple(args.shape)
    img = jnp.asarray(synthetic_scene(shape, n_blobs=200, seed=0))
    K = jnp.asarray([[1000.0, 0, shape[1] / 2], [0, 1000.0, shape[0] / 2],
                     [0, 0, 1.0]], jnp.float32)
    caps = octave_capacities(shape, cfg)
    n_slots = sum(c for c, _ in caps) * cfg.max_ori
    W, PN, OBS_F = vo.window, vo.pts_per_frame, vo.obs_per_frame
    P = W * PN

    def st_pyramid(c):
        octs = build_scale_space_jax(c, cfg)
        return {"s": [b.sum() + d.sum() for b, d in octs]}

    def st_ladder0(c):
        # octave-0 strip-ladder alone (the bulk of the pyramid's pixels)
        from sift_pyocl_tpu.ops.pallas.ladder0 import octave0_ladder
        from sift_pyocl_tpu.ops.pyramid import normalize_image_jax
        pre = float(np.sqrt(cfg.init_sigma**2 - cfg.orig_sigma**2))
        blurs0, dogs0 = octave0_ladder(
            normalize_image_jax(c), pre, cfg.sigma_increments())
        return {"s": [blurs0.sum(), dogs0.sum()]}

    def st_smalloct(c):
        # pyramid minus octave 0: downsample + fused small-octave ladder
        from sift_pyocl_tpu.ops.pallas.ladder import small_octaves_ladder
        from sift_pyocl_tpu.ops.pallas.ladder0 import octave0_ladder
        from sift_pyocl_tpu.ops.pyramid import (downsample_octave,
                                                normalize_image_jax)
        pre = float(np.sqrt(cfg.init_sigma**2 - cfg.orig_sigma**2))
        blurs0, _ = octave0_ladder(
            normalize_image_jax(c), pre, cfg.sigma_increments())
        octs = small_octaves_ladder(
            downsample_octave(blurs0[cfg.scales], cfg),
            cfg.sigma_increments(),
            cfg.n_octaves(c.shape) - 1, cfg.scales,
            ds_mode=cfg.downsample_mode)
        return {"s": [b.sum() + d.sum() for b, d in octs]}

    def st_grad_pad(c):
        octs = build_scale_space_jax(c, cfg)
        acc = [d.sum() for _, d in octs]
        for blurs, _ in octs:
            m, o = gradient_planes(blurs, cfg)
            mp, op = pad_grad_planes(m, o)
            acc += [mp.sum(), op.sum()]
        return {"s": acc}

    def st_grad_atlas_xla(c):
        from sift_pyocl_tpu.ops.pallas.window import build_grad_atlas
        octs = build_scale_space_jax(c, cfg)
        acc = [d.sum() for _, d in octs]
        ml, ol = [], []
        for blurs, _ in octs:
            m, o = gradient_planes(blurs, cfg)
            ml.append(m)
            ol.append(o)
        ma, oa, _rs = build_grad_atlas(ml, ol)
        return {"s": acc + [ma.sum(), oa.sum()]}

    def st_grad_atlas(c):
        from sift_pyocl_tpu.ops.pallas.gradpad import grad_atlas_pallas
        octs = build_scale_space_jax(c, cfg)
        acc = [d.sum() for _, d in octs]
        ma, oa, _rs = grad_atlas_pallas(
            [b for b, _ in octs], cfg.scales, interpret=cfg.pallas_interpret)
        return {"s": acc + [ma.sum(), oa.sum()]}

    def st_detect(c):
        octs = build_scale_space_jax(c, cfg)
        acc = [b.sum() for b, _ in octs]
        det = detect_all_octaves_pallas(
            [d for _, d in octs], cfg, [cp for cp, _ in caps],
            interpret=cfg.pallas_interpret)
        acc += [k.fr.sum() + k.valid.sum() for k, _ in det]
        return {"s": acc}

    def st_mask(c):
        from sift_pyocl_tpu.ops.detect import extrema_mask
        octs = build_scale_space_jax(c, cfg)
        acc = [b.sum() for b, _ in octs]
        acc += [extrema_mask(d, cfg, o).sum() for o, (_, d) in enumerate(octs)]
        return {"s": acc}

    def st_compact(c):
        from sift_pyocl_tpu.ops.detect import extrema_mask
        from sift_pyocl_tpu.ops.pallas.compact import compact_masks_multi
        octs = build_scale_space_jax(c, cfg)
        acc = [b.sum() for b, _ in octs]
        masks = [extrema_mask(d, cfg, o) for o, (_, d) in enumerate(octs)]
        idx, wr, tot = compact_masks_multi(
            masks, [cp for cp, _ in caps], interpret=cfg.pallas_interpret)
        return {"s": acc + [idx.sum(), wr.sum(), tot.sum()]}

    def st_compact256(c):
        from sift_pyocl_tpu.ops.detect import extrema_mask
        from sift_pyocl_tpu.ops.pallas.compact import compact_masks_multi
        octs = build_scale_space_jax(c, cfg)
        acc = [b.sum() for b, _ in octs]
        masks = [extrema_mask(d, cfg, o) for o, (_, d) in enumerate(octs)]
        idx, wr, tot = compact_masks_multi(
            masks, [cp for cp, _ in caps], tile_rows=256, max_per_tile=512,
            interpret=cfg.pallas_interpret)
        return {"s": acc + [idx.sum(), wr.sum(), tot.sum()]}

    def st_dogatlas(c):
        from sift_pyocl_tpu.ops.pallas.refine import build_dog_atlas
        octs = build_scale_space_jax(c, cfg)
        acc = [b.sum() for b, _ in octs]
        atlas, _rs = build_dog_atlas([d for _, d in octs])
        return {"s": acc + [atlas.sum()]}

    def st_maskp(c):
        from sift_pyocl_tpu.ops.pallas.maskk import extrema_masks_atlas_pallas
        from sift_pyocl_tpu.ops.pallas.refine import build_dog_atlas
        octs = build_scale_space_jax(c, cfg)
        acc = [b.sum() for b, _ in octs]
        dogs = [d for _, d in octs]
        atlas, rs = build_dog_atlas(dogs)
        masks = extrema_masks_atlas_pallas(
            atlas, rs, [d.shape for d in dogs], cfg,
            interpret=cfg.pallas_interpret)
        return {"s": acc + [m.sum() for m in masks]}

    def st_refine(c):
        # cumulative through subpixel refine on the production kernels
        from sift_pyocl_tpu.ops.detect import decode_compacted, extrema_mask
        from sift_pyocl_tpu.ops.pallas.compact import compact_masks_multi
        from sift_pyocl_tpu.ops.pallas.refine import (build_dog_atlas,
                                                      refine_atlas_pallas)
        octs = build_scale_space_jax(c, cfg)
        acc = [b.sum() for b, _ in octs]
        dogs_l = [d for _, d in octs]
        atlas, row_starts = build_dog_atlas(dogs_l)
        masks = [extrema_mask(d, cfg, o) for o, d in enumerate(dogs_l)]
        cl = [cp for cp, _ in caps]
        idx_all, written, total = compact_masks_multi(masks, cl)
        s, r, cc2, v, rlo, rhi, clo, chi = decode_compacted(
            dogs_l, masks, cl, row_starts, idx_all, written, cfg.border_dist)
        fs, fr_a, fc, peak, accm = refine_atlas_pallas(
            atlas, s, r, cc2, v, rlo, rhi, clo, chi,
            peak_thresh=cfg.peak_thresh, max_moves=cfg.max_interp_moves)
        return {"s": acc + [fs.sum(), fr_a.sum(), accm.sum()]}

    def st_sift(c):
        b = detect_and_describe(c, cfg)
        return {"s": [b.x.sum(), b.angle.sum(),
                      b.desc.astype(jnp.float32).sum(), b.valid.sum()]}

    cfg_gx = SiftConfig(grad_backend="xla")

    def st_sift_gradxla(c):
        b = detect_and_describe(c, cfg_gx)
        return {"s": [b.x.sum(), b.angle.sum(),
                      b.desc.astype(jnp.float32).sum(), b.valid.sum()]}

    cfg_bk = SiftConfig(desc_buckets=2)

    def st_sift_buckets(c):
        b = detect_and_describe(c, cfg_bk)
        return {"s": [b.x.sum(), b.angle.sum(),
                      b.desc.astype(jnp.float32).sum(), b.valid.sum()]}

    st0 = vo_init(img, K, cfg, vo)

    def st_vo(c):
        st2, out = vo_step(st0, c, K, cfg, vo)
        return {"s": [st2.ts.sum(), out.ba_cost, out.rms_px,
                      st2.X.sum(), st2.obs_w.sum()]}

    # --- frontend+tail cumulative rows on the REAL vo_init state ---------
    def st_front_match(c):
        b = detect_and_describe(c, cfg)
        keep, mid, d1, d2 = match_descriptors_dense(
            b.desc, b.valid, st0.Xdesc.reshape(P, 128),
            st0.Xvalid.reshape(P) > 0, metric=vo.match_metric,
            ratio_sq=vo.ratio_sq)
        return {"s": [keep.sum(), d1.sum(), b.x.sum(),
                      b.desc.astype(jnp.float32).sum()]}

    def st_front_pnp(c):
        b = detect_and_describe(c, cfg)
        keep, mid, d1, d2 = match_descriptors_dense(
            b.desc, b.valid, st0.Xdesc.reshape(P, 128),
            st0.Xvalid.reshape(P) > 0, metric=vo.match_metric,
            ratio_sq=vo.ratio_sq)
        score = jnp.where(keep, -d1, -jnp.inf)
        _, sel = jax.lax.approx_max_k(score, vo.pnp_n)
        w_sel = keep[sel].astype(jnp.float32)
        uv_sel = jnp.stack([b.x, b.y], -1)[sel]
        X_sel = st0.X.reshape(P, 3)[mid[sel]]
        R, t, rms = pnp_refine(K, st0.Rs[-1], st0.ts[-1], X_sel, uv_sel,
                               w_sel, iters=vo.pnp_iters,
                               huber_px=vo.huber_px)
        return {"s": [t.sum(), rms, keep.sum(), b.x.sum()]}

    def st_ba_iso(c):
        # one lm_iteration on the real vo_init state (production config)
        s = jnp.tanh(c[0, 0] * 1e-9) * 1e-5
        params = BAParams(st0.Rs, st0.ts + s, st0.X.reshape(P, 3))
        cam_ids = jnp.repeat(
            jnp.arange(W, dtype=jnp.int32)[:, None], OBS_F,
            axis=1).reshape(-1)
        obs = BAObs(uv=st0.obs_uv.reshape(-1, 2), cam=cam_ids,
                    pt=jnp.maximum(st0.obs_pt.reshape(-1), 0),
                    w=st0.obs_w.reshape(-1))
        fr = jnp.arange(W) > 0
        p2, lam2, cost, _ = lm_iteration(
            params, obs, K, st0.lam, fr, huber_px=vo.huber_px,
            cg_iters=vo.cg_iters, n_points=P, cam_blocked=True,
            pt_onehot=True, dense_schur=True)
        return {"s": [cost, lam2, p2.ts.sum()]}

    def st_match2_iso(c):
        s = jnp.tanh(c[0, 0] * 1e-9)
        d1 = st0.prev_desc[: vo.pts_per_frame]
        v1 = st0.prev_valid[: vo.pts_per_frame] & (s > -2)
        pk, pidx, pd, pd2 = match_descriptors_dense(
            d1, v1, st0.prev_desc, st0.prev_valid,
            metric=vo.match_metric, ratio_sq=vo.ratio_sq)
        return {"s": [pk.sum(), pd.sum()]}

    # --- VO tail pieces at real shapes ---
    rng = np.random.default_rng(0)
    desc_q = jnp.asarray(rng.integers(0, 255, (n_slots, 128)), jnp.uint8)
    valid_q = jnp.asarray(rng.uniform(size=n_slots) < 0.3)
    desc_m = jnp.asarray(rng.integers(0, 255, (P, 128)), jnp.uint8)
    valid_m = jnp.asarray(rng.uniform(size=P) < 0.8)

    def st_match(c):
        # data-depend on c so the chain is honest
        d = (desc_q + c[0, 0].astype(jnp.uint8))
        keep, mid, d1, d2 = match_descriptors_dense(
            d, valid_q, desc_m, valid_m, metric=vo.match_metric,
            ratio_sq=vo.ratio_sq)
        return {"s": [keep.sum(), mid.sum(), d1.sum()]}

    X = jnp.asarray(rng.normal(size=(vo.pnp_n, 3)) * 2 + [0, 0, 6], jnp.float32)
    uvp = jnp.asarray(rng.uniform(0, 1000, (vo.pnp_n, 2)), jnp.float32)
    wp = jnp.ones((vo.pnp_n,), jnp.float32)
    R0 = jnp.eye(3, dtype=jnp.float32)
    t0 = jnp.zeros(3, jnp.float32)

    def st_pnp(c):
        R, t, rms = pnp_refine(K, R0, t0, X + c[0, 0] * 1e-9, uvp, wp,
                               iters=vo.pnp_iters, huber_px=vo.huber_px)
        return {"s": [R.sum(), t.sum(), rms]}

    Xb = jnp.asarray(rng.normal(size=(P, 3)) * 2 + [0, 0, 6], jnp.float32)
    Rs = jnp.broadcast_to(R0, (W, 3, 3)).copy()
    ts = jnp.asarray(rng.normal(size=(W, 3)) * 0.1, jnp.float32)
    obs_uv = jnp.asarray(rng.uniform(0, 1000, (W * OBS_F, 2)), jnp.float32)
    obs_cam = jnp.repeat(jnp.arange(W, dtype=jnp.int32), OBS_F)
    obs_pt = jnp.asarray(rng.integers(0, P, W * OBS_F), jnp.int32)
    obs_w = jnp.ones((W * OBS_F,), jnp.float32)
    free = jnp.arange(W) > 0

    def st_ba(c):
        params = BAParams(Rs, ts, Xb + c[0, 0] * 1e-9)
        obs = BAObs(uv=obs_uv, cam=obs_cam, pt=obs_pt, w=obs_w)
        p2, lam2, cost, _ = lm_iteration(
            params, obs, K, jnp.float32(1e-3), free,
            huber_px=vo.huber_px, cg_iters=vo.cg_iters, n_points=P)
        return {"s": [p2.ts.sum(), cost, lam2]}

    def st_ba_opt(c):
        params = BAParams(Rs, ts, Xb + c[0, 0] * 1e-9)
        obs = BAObs(uv=obs_uv, cam=obs_cam, pt=obs_pt, w=obs_w)
        p2, lam2, cost, _ = lm_iteration(
            params, obs, K, jnp.float32(1e-3), free,
            huber_px=vo.huber_px, cg_iters=vo.cg_iters, n_points=P,
            cam_blocked=True, pt_onehot=True)
        return {"s": [p2.ts.sum(), cost, lam2]}

    def st_ba_dense(c):
        params = BAParams(Rs, ts, Xb + c[0, 0] * 1e-9)
        obs = BAObs(uv=obs_uv, cam=obs_cam, pt=obs_pt, w=obs_w)
        p2, lam2, cost, _ = lm_iteration(
            params, obs, K, jnp.float32(1e-3), free,
            huber_px=vo.huber_px, cg_iters=1, n_points=P,
            cam_blocked=True, pt_onehot=True, dense_schur=True)
        return {"s": [p2.ts.sum(), cost, lam2]}

    def st_ba_blk(c):
        params = BAParams(Rs, ts, Xb + c[0, 0] * 1e-9)
        obs = BAObs(uv=obs_uv, cam=obs_cam, pt=obs_pt, w=obs_w)
        p2, lam2, cost, _ = lm_iteration(
            params, obs, K, jnp.float32(1e-3), free,
            huber_px=vo.huber_px, cg_iters=vo.cg_iters, n_points=P,
            cam_blocked=True, pt_onehot=False)
        return {"s": [p2.ts.sum(), cost, lam2]}

    stages = {
        "pyramid": st_pyramid, "ladder0": st_ladder0,
        "smalloct": st_smalloct, "grad_pad": st_grad_pad,
        "grad_atlas_xla": st_grad_atlas_xla, "grad_atlas": st_grad_atlas,
        "detect": st_detect, "mask": st_mask, "compact": st_compact,
        "compact256": st_compact256, "refine": st_refine,
        "dogatlas": st_dogatlas, "maskp": st_maskp,
        "sift": st_sift, "sift_gradxla": st_sift_gradxla,
        "sift_buckets": st_sift_buckets,
        "vo": st_vo, "front_match": st_front_match,
        "front_pnp": st_front_pnp, "ba_iso": st_ba_iso,
        "match2_iso": st_match2_iso,
        "match": st_match, "pnp": st_pnp, "ba": st_ba,
        "ba_opt": st_ba_opt, "ba_blk": st_ba_blk, "ba_dense": st_ba_dense,
    }
    want = args.stages.split(",") if args.stages else list(stages)
    out = {}
    for name in want:
        t0w = time.perf_counter()
        ms = chained_ms(stages[name], img, n_hi=args.n_hi, reps=args.reps)
        out[name] = round(ms, 3)
        print(f"{name}: {ms:.3f} ms (wall {time.perf_counter()-t0w:.0f}s)",
              flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
