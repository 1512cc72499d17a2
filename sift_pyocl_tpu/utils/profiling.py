"""Per-stage timing harness (parity for the reference's event profiling,
reference: sift-src/plan.py::log_profile — SURVEY.md §5).

Under XLA the pipeline is one fused program, so per-kernel event times do
not exist; this reports honest wall-clock per cumulative pipeline stage
using the chained-iteration methodology of utils.benchtool (single-call
timings on this platform are invalidated by async dispatch + memoization).
Stage costs are the deltas between successive cumulative rows.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from .benchtool import chained_ms


def stage_times(plan, image=None, n_hi: int = 9, reps: int = 2) -> Dict[str, float]:
    """Cumulative millisecond timings (each row includes the previous ones):
    pyramid -> +detect -> +orient -> +descriptor(=end_to_end)."""
    from ..models.sift import detect_and_describe, octave_capacities, _resolve_kp_backend
    from ..ops.detect import detect_octave, detect_octave_pallas
    from ..ops.orient_desc import (
        assign_orientations, assign_orientations_pallas,
        compute_descriptors, compute_descriptors_pallas, gradient_planes,
    )
    from ..ops.pallas.window import pad_grad_planes
    from ..ops.pyramid import build_scale_space_jax

    cfg = plan.cfg
    if image is None:
        rng = np.random.default_rng(0)
        image = rng.uniform(0, 255, plan.shape).astype(np.float32)
    img = jnp.asarray(image, dtype=jnp.float32)
    caps = octave_capacities(plan.shape, cfg)
    use_pallas = _resolve_kp_backend(cfg) == "pallas"

    def upto(stage):
        def f(c):
            octs = build_scale_space_jax(c, cfg)
            acc = [b.sum() + d.sum() for b, d in octs]
            if stage == "pyramid":
                return {"s": acc}
            for o, (blurs, dogs) in enumerate(octs):
                if use_pallas:
                    kps, _ = detect_octave_pallas(dogs, cfg, o, caps[o][0])
                else:
                    kps = detect_octave(dogs, cfg, o, caps[o][0])
                acc.append(kps.fr.sum() + kps.valid.sum())
                if stage == "detect":
                    continue
                mags, oris = gradient_planes(blurs, cfg)
                if use_pallas:
                    mp, op = pad_grad_planes(mags, oris)
                    okps = assign_orientations_pallas(mp, op, kps, cfg, caps[o][1])
                else:
                    okps = assign_orientations(mags, oris, kps, cfg, caps[o][1])
                acc.append(okps.angle.sum() + okps.valid.sum())
                if stage == "orient":
                    continue
                if use_pallas:
                    desc = compute_descriptors_pallas(mp, op, okps, cfg)
                else:
                    desc = compute_descriptors(mags, oris, okps, cfg)
                acc.append(desc.astype(jnp.float32).sum())
            return {"s": acc}

        return f

    times = {}
    for stage in ("pyramid", "detect", "orient", "full"):
        key = {"full": "end_to_end_ms"}.get(stage, f"upto_{stage}_ms")
        times[key] = round(
            chained_ms(upto(stage), img, n_hi=n_hi, reps=reps), 3
        )
    return times
