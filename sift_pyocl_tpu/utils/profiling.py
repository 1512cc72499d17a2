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
    """Cumulative millisecond timings (each row includes the previous ones).

    Pallas path stages: pyramid -> +detect -> +orient_desc (one fused
    kernel since round 2) = end_to_end.  XLA path keeps the split
    orient / descriptor rows."""
    from ..models.sift import octave_capacities, _resolve_kp_backend
    from ..ops.detect import detect_octave
    from ..ops.orient_desc import assign_orientations, gradient_planes
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
            from ..models.sift import describe_octaves

            octs = build_scale_space_jax(c, cfg)
            acc = [b.sum() + d.sum() for b, d in octs]
            if stage == "pyramid":
                return {"s": acc}
            if stage == "full":
                # the production path verbatim (3-launch pallas or XLA)
                b = describe_octaves(octs, plan.shape, cfg)
                acc += [b.x.sum(), b.angle.sum(),
                        b.desc.astype(jnp.float32).sum(), b.valid.sum()]
                return {"s": acc}
            if use_pallas:
                from ..ops.detect import (
                    detect_all_octaves_pallas,
                    detect_octave_pallas,
                )

                if cfg.kp_multi_launch:
                    det = detect_all_octaves_pallas(
                        [d for _, d in octs], cfg, [cp for cp, _ in caps],
                        interpret=cfg.pallas_interpret,
                    )
                    acc += [k.fr.sum() + k.valid.sum() for k, _ in det]
                else:
                    for o, (_, dogs) in enumerate(octs):
                        k, _ = detect_octave_pallas(
                            dogs, cfg, o, caps[o][0],
                            interpret=cfg.pallas_interpret,
                        )
                        acc.append(k.fr.sum() + k.valid.sum())
                return {"s": acc}
            for o, (blurs, dogs) in enumerate(octs):
                kps = detect_octave(dogs, cfg, o, caps[o][0])
                acc.append(kps.fr.sum() + kps.valid.sum())
                if stage == "detect":
                    continue
                mags, oris = gradient_planes(blurs, cfg)
                okps = assign_orientations(mags, oris, kps, cfg, caps[o][1])
                acc.append(okps.angle.sum() + okps.valid.sum())
            return {"s": acc}

        return f

    stages = (
        ("pyramid", "detect", "full") if use_pallas
        else ("pyramid", "detect", "orient", "full")
    )
    times = {}
    for stage in stages:
        key = {"full": "end_to_end_ms"}.get(stage, f"upto_{stage}_ms")
        times[key] = round(
            chained_ms(upto(stage), img, n_hi=n_hi, reps=reps), 3
        )
    return times
