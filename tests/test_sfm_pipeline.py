"""End-to-end incremental SfM on a rendered 3-D sequence — BASELINE.json
config 4 at test scale (two-view init + sequential PnP + triangulation + BA),
judged by the ATE criterion of BASELINE.md."""

import numpy as np
import pytest

from sift_pyocl_tpu import SiftConfig
from sift_pyocl_tpu.sfm.evaluate import ate_rmse, camera_centers
from sift_pyocl_tpu.sfm.pipeline import IncrementalSfM
from sift_pyocl_tpu.utils.render3d import render_sequence


@pytest.mark.slow
def test_incremental_sfm_ate():
    K, frames, gtR, gtT = render_sequence(
        n_frames=7, n_points=70, image_size=(320, 240), seed=0, arc_deg=25.0
    )
    sfm = IncrementalSfM(
        K, frames[0].shape, cfg=SiftConfig(kp_per_octave_cap=256), ba_every=6
    )
    res = sfm.run(frames)
    assert res is not None, "bootstrap failed"
    assert len(res.frames_registered) == len(frames)
    assert len(res.points) > 40
    reg = res.frames_registered
    ate = ate_rmse(
        camera_centers(res.Rs, res.ts), camera_centers(gtR[reg], gtT[reg])
    )
    # trajectory radius is 8.0 — demand sub-percent relative ATE
    assert ate < 0.08, ate


@pytest.mark.slow
def test_loop_closure_cuts_ate():
    """VERDICT r1 #3: on an out-and-back (loop) sequence with local-window
    map matching (drift accumulates), the integrated loop-closure pose
    graph measurably cuts ATE before the final BA even runs."""
    from sift_pyocl_tpu.utils.render3d import render_sequence as rs

    K, frames, gtR, gtT = rs(
        n_frames=12, n_points=160, image_size=(320, 240), seed=1,
        arc_deg=50.0, out_and_back=True,
    )
    sfm = IncrementalSfM(
        K, frames[0].shape, cfg=SiftConfig(kp_per_octave_cap=256),
        ba_every=100, map_match_window=3, loop_closure=True,
    )
    res = sfm.run(frames)
    assert res is not None
    reg = res.frames_registered
    assert len(reg) >= 9
    assert sfm.n_loop_edges >= 2
    gt_c = camera_centers(gtR[reg], gtT[reg])
    R0, t0, Rn, tn, _ = sfm._pgo_debug
    ate_pre = ate_rmse(camera_centers(R0, t0), gt_c)
    ate_post = ate_rmse(camera_centers(Rn, tn), gt_c)
    ate_final = ate_rmse(camera_centers(res.Rs, res.ts), gt_c)
    # drift accumulated, the pose graph cut it, final BA polished it
    assert ate_pre > 0.1, ate_pre
    assert ate_post < 0.5 * ate_pre, (ate_pre, ate_post)
    assert ate_final < 0.06, ate_final
