"""Interleaved on-chip A/B of the fused orient/desc kernel reduce modes.

Times the production frontend (detect_and_describe) with the fused kernel's
reduce_mode forced to "scalar" vs "colsum", plus isolated fused-stage rows,
all in one process.  Run on the chip: python tools/ab_window.py
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
    from sift_pyocl_tpu.ops.detect import detect_all_octaves_pallas
    from sift_pyocl_tpu.ops.orient_desc import _desc_window_size
    from sift_pyocl_tpu.ops.pallas.gradpad import grad_atlas_pallas
    from sift_pyocl_tpu.ops.pallas.window import orient_desc_fused_pallas
    from sift_pyocl_tpu.ops.pyramid import build_scale_space_jax
    from sift_pyocl_tpu.utils.testimage import synthetic_scene

    cfg = SiftConfig()
    shape = tuple(args.shape)
    caps = octave_capacities(shape, cfg)
    img = jnp.asarray(synthetic_scene(shape, n_blobs=200, seed=0))
    win = _desc_window_size(cfg)

    def fused(mode):
        def step(c):
            octs = build_scale_space_jax(c, cfg)
            detected = detect_all_octaves_pallas(
                [d for _, d in octs], cfg, [cc for cc, _ in caps])
            mag_a, ori_a, row_starts = grad_atlas_pallas(
                [b for b, _ in octs], cfg.scales)
            kps_l = [d[0] for d in detected]
            s_cat = jnp.concatenate([k.s_int for k in kps_l])
            fs_cat = jnp.concatenate([k.fs for k in kps_l])
            fr_cat = jnp.concatenate([k.fr for k in kps_l])
            fc_cat = jnp.concatenate([k.fc for k in kps_l])
            valid_cat = jnp.concatenate([k.valid for k in kps_l])
            row_off = jnp.concatenate([
                jnp.full((caps[o][0],), row_starts[o], jnp.int32)
                for o in range(len(octs))])
            sigma_cat = cfg.init_sigma * 2.0 ** (fs_cat / cfg.scales)
            ang, ok, raw = orient_desc_fused_pallas(
                mag_a, ori_a, s_cat, fr_cat, fc_cat, sigma_cat, valid_cat,
                win=win, max_ori=cfg.max_ori, row_off=row_off,
                reduce_mode=mode)
            return [ang.sum(), ok.sum(), raw.sum(), fr_cat.sum()]
        return step

    run_ab_rows([("scalar", fused("scalar")), ("colsum", fused("colsum"))],
                img, args)


if __name__ == "__main__":
    main()
