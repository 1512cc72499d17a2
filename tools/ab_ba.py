"""Interleaved on-chip A/B of the VO windowed-BA stage internals.

Rows (all at VO shapes, one process):
  build      — build_system only (G one-hot + block reductions)
  dense      — build + solve_step_dense (exact 6Cx6C LU)
  cg         — build + solve_step (matrix-free CG, cg_iters)
  lm_dense   — full lm_iteration dense (the production configuration)
Deltas between rows attribute the cost (G build vs solve vs LM plumbing).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sift_pyocl_tpu.utils.benchtool import ab_args, run_ab_rows


def main():
    args = ab_args()
    import jax.numpy as jnp

    from sift_pyocl_tpu import SiftConfig
    from sift_pyocl_tpu.models.vo import VOConfig, vo_init
    from sift_pyocl_tpu.sfm.ba import (BAObs, BAParams, build_system,
                                       lm_iteration, solve_step,
                                       solve_step_dense)
    from sift_pyocl_tpu.utils.testimage import synthetic_scene

    cfg = SiftConfig()
    vo = VOConfig()
    shape = tuple(args.shape)
    img = jnp.asarray(synthetic_scene(shape, n_blobs=200, seed=0))
    K = jnp.asarray([[1000.0, 0, shape[1] / 2],
                     [0, 1000.0, shape[0] / 2], [0, 0, 1.0]], jnp.float32)
    st0 = vo_init(img, K, cfg, vo)
    P = vo.window * vo.pts_per_frame
    cam_ids = jnp.repeat(
        jnp.arange(vo.window, dtype=jnp.int32)[:, None],
        vo.obs_per_frame, axis=1).reshape(-1)
    free = jnp.arange(vo.window) > 0

    def mk(c):
        s = jnp.tanh(c[0, 0] * 1e-9) * 1e-5
        params = BAParams(st0.Rs, st0.ts + s, st0.X.reshape(P, 3))
        obs = BAObs(uv=st0.obs_uv.reshape(-1, 2), cam=cam_ids,
                    pt=jnp.maximum(st0.obs_pt.reshape(-1), 0),
                    w=st0.obs_w.reshape(-1))
        return params, obs

    def f_build(c):
        params, obs = mk(c)
        sys_, cost = build_system(params, obs, K, st0.lam, vo.huber_px, P,
                                  cam_blocked=True, pt_onehot=True)
        return [cost, sys_.U.sum(), sys_.g_p.sum()]

    def f_dense(c):
        params, obs = mk(c)
        sys_, cost = build_system(params, obs, K, st0.lam, vo.huber_px, P,
                                  cam_blocked=True, pt_onehot=True)
        dc, dp = solve_step_dense(sys_, obs, free, P)
        return [cost, dc.sum(), dp.sum()]

    def f_cg(c):
        params, obs = mk(c)
        sys_, cost = build_system(params, obs, K, st0.lam, vo.huber_px, P,
                                  cam_blocked=True, pt_onehot=True)
        dc, dp = solve_step(sys_, obs, free, P, cg_iters=vo.cg_iters,
                            cam_blocked=True)
        return [cost, dc.sum(), dp.sum()]

    def f_lm(c):
        params, obs = mk(c)
        p2, lam2, cost, _ = lm_iteration(
            params, obs, K, st0.lam, free, huber_px=vo.huber_px,
            cg_iters=vo.cg_iters, n_points=P, cam_blocked=True,
            pt_onehot=True, dense_schur=True)
        return [cost, lam2, p2.ts.sum()]

    run_ab_rows([("build", f_build), ("dense", f_dense), ("cg", f_cg),
                 ("lm_dense", f_lm),
                 ("build_b", f_build), ("dense_b", f_dense), ("cg_b", f_cg),
                 ("lm_dense_b", f_lm)], img, args)


if __name__ == "__main__":
    main()
