"""Keypoint repeatability / descriptor-matching invariance battery.

The reference validated its numerics end-to-end by cross-checking keypoints
against the IPOL `sift.cpp` outputs on real images (SURVEY.md §4); with no
reference mount and no network, the only reference-free end-to-end
validation of SIFT numerics is the classic acceptance test: keypoints must
REPEAT and descriptors must MATCH under known geometric transforms of the
same scene (Lowe 2004 §7; Mikolajczyk & Schmid 2005 protocol).

Protocol: one richly textured synthetic scene on a fixed 256^2 canvas; warp
it with the production affine warp (rotations 15/30/45/90 deg, scale 0.5x /
2x zoom, additive noise); detect with the SAME SiftPlan (one compile);
score
  repeatability — fraction of eligible original keypoints (mapped location
      inside the frame with margin, and inside the warp's source coverage)
      with a detected keypoint within TOL_PX in the transformed image and a
      scale within a factor-1.7 band of the expected scale;
  match precision — fraction of MatchPlan ratio-test matches whose pair is
      geometrically consistent with the known transform (< 3 px).

Thresholds were CALIBRATED on this scene (see PARITY.md "Invariance
battery" table for the measured values) and frozen with a safety margin —
they catch regressions in any pipeline stage, not inter-library parity.
"""

import numpy as np
import pytest

from sift_pyocl_tpu import MatchPlan, SiftPlan
from sift_pyocl_tpu.ops.transform import affine_warp_jax
from sift_pyocl_tpu.utils.testimage import synthetic_scene

SHAPE = (256, 256)
TOL_PX = 2.0          # repeatability localization tolerance
MATCH_TOL_PX = 3.0    # geometric-consistency tolerance for matches
MARGIN = 12.0         # ignore keypoints mapping near the frame border
SCALE_BAND = 1.7      # detected scale must be within this factor of expected

# (name, angle_deg, zoom, noise_sigma, min_repeatability, min_precision,
#  min_eligible, min_matches) — frozen from the 2026-08-20 calibration run
# with ~15% safety margin (measured values in PARITY.md "Invariance battery"
# table: rep 0.89/0.90/0.90/0.99/0.71/0.74/0.97, precision 1.000 everywhere,
# matches 60/55/54/74/39/17/74).  This battery caught the round-1..3
# descriptor rotation-convention bug (R(-a) instead of R(+a): descriptors
# matched at ZERO rate under rotation while repeatability was 0.9).
CASES = [
    ("rot15", 15.0, 1.0, 0.0, 0.75, 0.90, 25, 40),
    ("rot30", 30.0, 1.0, 0.0, 0.75, 0.90, 25, 35),
    ("rot45", 45.0, 1.0, 0.0, 0.75, 0.90, 25, 35),
    ("rot90", 90.0, 1.0, 0.0, 0.85, 0.90, 25, 50),
    ("zoom_out", 0.0, 0.5, 0.0, 0.55, 0.90, 25, 25),
    ("zoom_in", 0.0, 2.0, 0.0, 0.55, 0.90, 10, 12),
    ("noise8", 0.0, 1.0, 8.0, 0.85, 0.90, 25, 50),
]


def _forward_affine(angle_deg: float, zoom: float, shape):
    """Forward map p' = A p + b in (row, col) about the image center."""
    th = np.deg2rad(angle_deg)
    A = zoom * np.array([[np.cos(th), -np.sin(th)],
                         [np.sin(th), np.cos(th)]], np.float64)
    c = np.array([(shape[0] - 1) / 2.0, (shape[1] - 1) / 2.0])
    b = c - A @ c
    return A, b


def _warp(img: np.ndarray, A: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Apply the FORWARD transform (A, b) with the production inverse warp."""
    Ainv = np.linalg.inv(A)
    off = -Ainv @ b
    return np.asarray(affine_warp_jax(img, Ainv.astype(np.float32),
                                      off.astype(np.float32)))


def _kp_rc(kp):
    """Keypoint positions as (N, 2) (row, col): kp.x is column, kp.y row."""
    return np.stack([np.asarray(kp["y"]), np.asarray(kp["x"])], axis=-1)


@pytest.fixture(scope="module")
def scene_and_plan():
    img = synthetic_scene(SHAPE, n_blobs=90, seed=7)
    plan = SiftPlan(SHAPE, "float32")
    kp0 = plan.keypoints(img)
    assert len(kp0) >= 50, "calibration scene must be feature-rich"
    return img, plan, kp0


@pytest.mark.slow
@pytest.mark.parametrize(
    "name,angle,zoom,noise,min_rep,min_prec,min_elig,min_match",
    CASES, ids=[c[0] for c in CASES])
def test_invariance(scene_and_plan, name, angle, zoom, noise,
                    min_rep, min_prec, min_elig, min_match):
    img, plan, kp0 = scene_and_plan
    A, b = _forward_affine(angle, zoom, SHAPE)
    warped = _warp(img, A, b)
    if noise > 0:
        rng = np.random.default_rng(11)
        warped = np.clip(
            warped + rng.normal(0.0, noise, warped.shape), 0, 255
        ).astype(np.float32)
    kp1 = plan.keypoints(warped)
    assert len(kp1) > 0

    # --- repeatability -----------------------------------------------------
    p0 = _kp_rc(kp0)
    mapped = p0 @ A.T + b
    h, w = SHAPE
    inside = ((mapped[:, 0] > MARGIN) & (mapped[:, 0] < h - 1 - MARGIN)
              & (mapped[:, 1] > MARGIN) & (mapped[:, 1] < w - 1 - MARGIN))
    # the warp only covers source pixels that land in-frame; for zoom-in the
    # source coverage is the central 1/zoom region — eligibility already
    # handled because mapped stays in-frame only for covered sources.
    elig = np.where(inside)[0]
    assert len(elig) >= min_elig, f"{name}: too few eligible kps {len(elig)}"

    p1 = _kp_rc(kp1)
    s0 = np.asarray(kp0["scale"])
    s1 = np.asarray(kp1["scale"])
    hits = 0
    for i in elig:
        d = np.hypot(p1[:, 0] - mapped[i, 0], p1[:, 1] - mapped[i, 1])
        near = d < TOL_PX
        if not near.any():
            continue
        exp_s = s0[i] * zoom
        ratio = s1[near] / max(exp_s, 1e-6)
        if ((ratio < SCALE_BAND) & (ratio > 1.0 / SCALE_BAND)).any():
            hits += 1
    rep = hits / len(elig)

    # --- ratio-test match precision ----------------------------------------
    mp = MatchPlan()
    m = mp.match(kp0, kp1)
    prec = 1.0
    n_match = len(m)
    if n_match:
        pa = np.stack([m[:, 0]["y"], m[:, 0]["x"]], -1)
        pb = np.stack([m[:, 1]["y"], m[:, 1]["x"]], -1)
        pa_m = pa @ A.T + b
        good = np.hypot(*(pb - pa_m).T) < MATCH_TOL_PX
        prec = float(good.mean())
    print(f"[invariance] {name}: repeatability {rep:.3f} "
          f"({hits}/{len(elig)}), matches {n_match}, precision {prec:.3f}")

    assert rep >= min_rep, (
        f"{name}: repeatability {rep:.3f} < {min_rep} ({hits}/{len(elig)})")
    assert n_match >= min_match, (
        f"{name}: only {n_match} ratio-test matches (< {min_match})")
    assert prec >= min_prec, (
        f"{name}: match precision {prec:.3f} < {min_prec} over {n_match}")


@pytest.mark.slow
def test_rotation_rotates_keypoint_angles(scene_and_plan):
    """Matched keypoints' orientations must rotate with the image (the
    orientation-assignment analog of repeatability)."""
    img, plan, kp0 = scene_and_plan
    th = np.deg2rad(30.0)
    A, b = _forward_affine(30.0, 1.0, SHAPE)
    kp1 = plan.keypoints(_warp(img, A, b))
    m = MatchPlan().match(kp0, kp1)
    assert len(m) >= 10
    # image rows grow downward: a +th image rotation shifts gradient
    # orientations by -th in the (x, y)-math convention used for angles
    da = np.asarray(m[:, 1]["angle"]) - np.asarray(m[:, 0]["angle"])
    da = np.mod(da + th + np.pi, 2 * np.pi) - np.pi
    frac = float((np.abs(da) < 0.30).mean())
    print(f"[invariance] angle consistency: {frac:.3f} of {len(m)}")
    # calibration measured 1.000; frozen with margin
    assert frac >= 0.90, f"only {frac:.2f} of matches rotate their angle"
