"""End-to-end test of the ATE evaluation CLI: render a sequence to disk as
PGM + TUM ground truth, run `python -m sift_pyocl_tpu.evaluate` logic, and
check the reported ATE (VERDICT r1 #6 — one command, files on disk -> ATE)."""

import json

import numpy as np
import pytest

from sift_pyocl_tpu.evaluate import (
    load_gt_centers,
    main,
    probe_pgm_shape,
    save_sequence,
)
from sift_pyocl_tpu.sfm.evaluate import camera_centers
from sift_pyocl_tpu.utils.render3d import render_sequence


def test_gt_parsers(tmp_path):
    p = tmp_path / "tum.txt"
    p.write_text("# comment\n0.0 1 2 3 0 0 0 1\n1.0 4 5 6 0 0 0 1\n")
    np.testing.assert_allclose(load_gt_centers(p), [[1, 2, 3], [4, 5, 6]])
    p2 = tmp_path / "kitti.txt"
    p2.write_text("1 0 0 9 0 1 0 8 0 0 1 7\n")
    np.testing.assert_allclose(load_gt_centers(p2), [[9, 8, 7]])
    p3 = tmp_path / "xyz.txt"
    p3.write_text("1 2 3\n")
    np.testing.assert_allclose(load_gt_centers(p3), [[1, 2, 3]])


def test_save_and_probe_roundtrip(tmp_path):
    frames = [np.linspace(0, 255, 48 * 64, dtype=np.float32).reshape(48, 64)]
    R = np.eye(3, dtype=np.float32)[None]
    t = np.zeros((1, 3), np.float32)
    out, gt = save_sequence(tmp_path / "seq", frames, R, t)
    pgm = sorted(out.glob("*.pgm"))[0]
    assert probe_pgm_shape(pgm) == (48, 64)
    np.testing.assert_allclose(load_gt_centers(gt), camera_centers(R, t))


@pytest.mark.slow
def test_evaluate_cli_sfm_ate(tmp_path, capsys):
    K, frames, gtR, gtT = render_sequence(
        n_frames=7, n_points=70, image_size=(320, 240), seed=0, arc_deg=25.0
    )
    seq_dir, gt_path = save_sequence(tmp_path / "seq", frames, gtR, gtT)
    rc = main([
        "--frames", str(seq_dir), "--gt", str(gt_path),
        "--mode", "sfm", "--fx", str(float(K[0, 0])),
    ])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rep = json.loads(out)
    assert rc == 0, rep
    assert rep["n_registered"] >= 6
    # PGM u8 quantization costs some accuracy vs the float test (0.08 bound)
    assert rep["ate_rmse"] < 0.15, rep
