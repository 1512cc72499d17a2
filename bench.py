#!/usr/bin/env python
"""Benchmark: end-to-end SIFT detect+describe throughput at 1080p on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: BASELINE.md north-star >= 60 frames/s per v5e chip at 1080p
(end-to-end SIFT+matching+BA; this round measures the SIFT frontend —
the dominant per-frame cost — matching+BA join as they fuse in).

Methodology notes (axon platform quirks, measured 2026-08-16):
  * the runtime memoizes (executable, input) pairs, so timing MUST cycle
    distinct input frames;
  * host<->device transfers ride a slow tunnel that is not representative of
    production DMA, so frames are pre-placed on device (a real video pipeline
    overlaps frame DMA with compute) and outputs stay on device;
  * sustained throughput: all iterations enqueued, one block at the end.

Usage: python bench.py [--shape H W] [--iters N] [--quick]
"""

import argparse
import json
import sys
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, nargs=2, default=[1080, 1920])
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--frames", type=int, default=8, help="distinct test frames")
    ap.add_argument("--quick", action="store_true", help="256x256, few iters")
    args = ap.parse_args()
    if args.quick:
        args.shape, args.iters = [256, 256], 16

    import jax
    import jax.numpy as jnp

    from sift_pyocl_tpu import SiftConfig, SiftPlan
    from sift_pyocl_tpu.utils.testimage import synthetic_scene

    shape = tuple(args.shape)
    cfg = SiftConfig()

    t0 = time.perf_counter()
    plan = SiftPlan(shape=shape, config=cfg)
    base = [
        jax.device_put(jnp.asarray(synthetic_scene(shape, n_blobs=200, seed=s)))
        for s in range(args.frames)
    ]
    # every timed iteration gets a UNIQUE device-resident frame (value-distinct,
    # built on device) so runtime memoization cannot shortcut any execution
    perturb = jax.jit(lambda x, c: x + c)
    frames = [
        perturb(base[i % len(base)], jnp.float32(0.001 * (i // len(base))))
        for i in range(args.iters)
    ]
    jax.block_until_ready(frames)
    buf = plan.keypoints_raw(frames[0])
    jax.block_until_ready(buf)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    outs = []
    for i in range(args.iters):
        outs.append(plan.keypoints_raw(frames[i]))
        if len(outs) > 4:  # keep a short in-flight window
            jax.block_until_ready(outs.pop(0))
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / args.iters

    fps = 1.0 / dt
    n_kp = int(np.asarray(buf.valid).sum())
    print(
        json.dumps(
            {
                "metric": f"sift_detect_describe_fps_{shape[0]}x{shape[1]}",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / 60.0, 4),
            }
        )
    )
    print(
        json.dumps(
            {
                "detail": {
                    "device": str(jax.devices()[0]),
                    "ms_per_frame": round(dt * 1e3, 4),
                    "keypoints_frame0": n_kp,
                    "compile_s": round(compile_s, 1),
                    "iters": args.iters,
                    "distinct_frames": len(frames),
                }
            }
        ),
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
