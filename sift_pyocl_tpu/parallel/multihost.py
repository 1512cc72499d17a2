"""Multi-host bootstrap and mesh construction.

The reference is single-process/single-device (SURVEY.md §3.5); this is the
DCN-facing entry point for pod-slice runs of the distributed BA backend
(sfm/distributed.py) and the frame-parallel video frontend (parallel/video.py).

Collective layout (SURVEY.md §2.3): the BA mesh axis shards map blocks and
observations; camera blocks are replicated and reduced with `psum`, which XLA
routes over ICI within a slice and DCN across hosts.  Failure semantics follow
standard JAX multi-host practice — a lost process fails the job, the
controller restarts it, and state reloads from sfm/checkpoint.py snapshots.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """`jax.distributed.initialize` with env-based defaults; no-op when the
    job is single-process.  Returns (process_index, process_count)."""
    import jax

    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def global_ba_mesh(axis: str = "ba"):
    """1-D mesh over ALL global devices (every host's chips) for the
    sharded BA — `psum` over this axis crosses ICI in-slice and DCN
    across hosts."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))


def frames_x_ba_mesh(n_frames_axis: int, axes=("frames", "ba")):
    """2-D mesh: frame-parallel SIFT frontend on one axis, sharded BA on the
    other (video SfM at pod scale: each frame group feeds keyframes into the
    BA shard that owns its map blocks)."""
    import jax
    from jax.sharding import Mesh

    devs = np.array(jax.devices())
    n = devs.size
    if n % n_frames_axis:
        raise ValueError(f"{n} devices not divisible by {n_frames_axis}")
    return Mesh(devs.reshape(n_frames_axis, n // n_frames_axis), axes)
