"""Per-stage timing harness (parity for the reference's event profiling,
reference: sift-src/plan.py::log_profile — SURVEY.md §5).

Under XLA the pipeline is one fused program, so per-kernel event times do not
exist; this reports wall-clock per pipeline stage by running each stage's
sub-jit with `block_until_ready`, plus the fused end-to-end time.
"""

from __future__ import annotations

import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def _timed(fn, *args, iters: int = 5) -> float:
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def stage_times(plan, image=None, iters: int = 5) -> Dict[str, float]:
    """Millisecond timings for pyramid / detect / orient+desc / end-to-end."""
    from ..ops.detect import detect_octave
    from ..ops.orient_desc import assign_orientations, compute_descriptors, gradient_planes
    from ..ops.pyramid import build_scale_space_jax
    from ..models.sift import octave_capacities

    cfg = plan.cfg
    if image is None:
        rng = np.random.default_rng(0)
        image = rng.uniform(0, 255, plan.shape).astype(np.float32)
    img = jnp.asarray(image, dtype=jnp.float32)

    pyramid = jax.jit(lambda x: build_scale_space_jax(x, cfg))
    octs = pyramid(img)
    caps = octave_capacities(plan.shape, cfg)

    def detect_all(octs):
        return [detect_octave(d, cfg, o, caps[o][0]) for o, (_, d) in enumerate(octs)]

    detect = jax.jit(detect_all)
    kps = detect(octs)

    def orient_desc_all(octs, kps):
        outs = []
        for o, (b, _) in enumerate(octs):
            mags, oris = gradient_planes(b, cfg)
            okps = assign_orientations(mags, oris, kps[o], cfg, caps[o][1])
            outs.append(compute_descriptors(mags, oris, okps, cfg))
        return outs

    od = jax.jit(orient_desc_all)

    times = {
        "pyramid_ms": _timed(pyramid, img, iters=iters) * 1e3,
        "detect_ms": _timed(detect, octs, iters=iters) * 1e3,
        "orient_desc_ms": _timed(od, octs, kps, iters=iters) * 1e3,
        "end_to_end_ms": _timed(plan._fn, img, iters=iters) * 1e3,
    }
    return times
