"""SfM backend: two-view geometry, RANSAC, bundle adjustment (single-host and
mesh-sharded).  New subsystem per BASELINE.json; no reference counterpart."""

from .ba import BAObs, BAParams, run_ba, lm_iteration, residuals  # noqa: F401
from .distributed import DistributedBA, partition_problem  # noqa: F401
from .evaluate import ate_rmse, camera_centers, umeyama_align  # noqa: F401
from .ransac import ransac, ransac_homography, ransac_essential_normalized  # noqa: F401
from .twoview import initialize_two_view, TwoViewInit  # noqa: F401
