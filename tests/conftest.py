"""Test environment: CPU backend with 8 virtual devices.

Mirrors the reference's single-device unittest strategy (SURVEY.md §4) but on
the CPU backend for determinism and adds an 8-device virtual mesh so the
multi-chip sharding paths (parallel/, sfm distributed BA) are testable without
a pod — per the multi-host test strategy in SURVEY.md §4.
"""

import os

# Force CPU even though the environment's sitecustomize imports jax with
# JAX_PLATFORMS=axon at interpreter start (env edits are too late — only
# jax.config.update works post-import).  Tests must be deterministic and see
# the 8-device virtual mesh.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from sift_pyocl_tpu.config import SiftConfig  # noqa: E402
from sift_pyocl_tpu.utils.testimage import synthetic_scene  # noqa: E402


@pytest.fixture(scope="session")
def small_cfg():
    """Low-capacity config: identical numerics, small compile."""
    return SiftConfig(kp_per_octave_cap=256)


@pytest.fixture(scope="session")
def scene128():
    return synthetic_scene((128, 128), n_blobs=15, seed=0)


@pytest.fixture(scope="session")
def scene160():
    return synthetic_scene((160, 128), n_blobs=20, seed=3)


def match_keypoint_sets(a, b, tol_xy=0.1, tol_s=0.05, tol_a=0.05):
    """Set-based keypoint comparison (reference test strategy, SURVEY.md §4:
    sorted/greedy matching because ordering is nondeterministic upstream).

    Returns (n_matched, mean_desc_l1) for oracle records a vs candidate b.
    """
    used = np.zeros(len(b), bool)
    hits = 0
    desc_l1 = []
    for i in range(len(a)):
        d = np.abs(b["x"] - a["x"][i]) + np.abs(b["y"] - a["y"][i])
        d = np.where(used, np.inf, d)
        if len(d) == 0:
            break
        j = int(np.argmin(d))
        da = abs(b["angle"][j] - a["angle"][i])
        da = min(da, 2 * np.pi - da)
        if (
            d[j] < tol_xy
            and abs(b["scale"][j] - a["scale"][i]) < tol_s
            and da < tol_a
        ):
            used[j] = True
            hits += 1
            desc_l1.append(
                np.abs(
                    b["desc"][j].astype(int) - a["desc"][i].astype(int)
                ).mean()
            )
    return hits, (float(np.mean(desc_l1)) if desc_l1 else 0.0)
