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
