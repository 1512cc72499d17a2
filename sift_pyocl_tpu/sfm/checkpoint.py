"""Checkpoint / resume for SfM and VO state.

The reference is a stateless per-image library with nothing to snapshot
(SURVEY.md §5: "Checkpoint/resume: none"); the SfM/VO backend added here is
long-running, so map/pose state gets plain-npz snapshotting (the orbax-grade
needs of a trainer don't apply — state is small and host-resident between
jobs; multi-host jobs snapshot per process and reload under the same mesh).
"""

from __future__ import annotations

from pathlib import Path
from typing import Union

import numpy as np

from .ba import BAParams


def save_ba(path: Union[str, Path], params: BAParams, **extra) -> None:
    """Snapshot BA parameters (+ arbitrary named arrays, e.g. obs tables)."""
    np.savez_compressed(
        path,
        Rs=np.asarray(params.Rs),
        ts=np.asarray(params.ts),
        X=np.asarray(params.X),
        **{k: np.asarray(v) for k, v in extra.items()},
    )


def load_ba(path: Union[str, Path]):
    """Returns (BAParams, dict of extra arrays)."""
    with np.load(path, allow_pickle=False) as z:
        params = BAParams(Rs=z["Rs"], ts=z["ts"], X=z["X"])
        extra = {k: z[k] for k in z.files if k not in ("Rs", "ts", "X")}
    return params, extra


def save_vo(path: Union[str, Path], state) -> None:
    """Snapshot a models.vo.VOState (all leaves are arrays)."""
    np.savez_compressed(
        path, **{k: np.asarray(v) for k, v in state._asdict().items()}
    )


def load_vo(path: Union[str, Path]):
    """Restore a models.vo.VOState from `save_vo` output."""
    import jax.numpy as jnp

    from ..models.vo import VOState

    with np.load(path, allow_pickle=False) as z:
        return VOState(**{k: jnp.asarray(z[k]) for k in z.files})
