#!/usr/bin/env python
"""Benchmark: end-to-end SIFT detect+describe throughput at 1080p on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: BASELINE.md north-star >= 60 frames/s per v5e chip at 1080p.

Methodology (see sift_pyocl_tpu/utils/benchtool.py — measured axon-platform
quirks): `block_until_ready` does not await real device execution here and
the runtime memoizes (executable, input-value) pairs, so the only honest
measurement chains N iterations with data dependencies inside ONE jitted
fori_loop, feeds fresh input values per call, fetches an output scalar to
host, and reports the slope between a short and a long chain.

Usage: python bench.py [--shape H W] [--quick]
"""

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, nargs=2, default=[1080, 1920])
    ap.add_argument("--quick", action="store_true", help="256x256 fast run")
    ap.add_argument("--n-hi", type=int, default=9)
    args = ap.parse_args()
    if args.quick:
        args.shape = [256, 256]

    import jax
    import jax.numpy as jnp

    from sift_pyocl_tpu import SiftConfig
    from sift_pyocl_tpu.models.sift import detect_and_describe
    from sift_pyocl_tpu.utils.benchtool import chained_ms
    from sift_pyocl_tpu.utils.testimage import synthetic_scene

    shape = tuple(args.shape)
    cfg = SiftConfig()
    img = jnp.asarray(synthetic_scene(shape, n_blobs=200, seed=0))

    def step(c):
        b = detect_and_describe(c, cfg)
        return {
            "x": b.x.sum(), "y": b.y.sum(), "s": b.scale.sum(),
            "a": b.angle.sum(), "d": b.desc.astype(jnp.float32).sum(),
            "v": b.valid.sum(), "c": b.counts.sum(),
        }

    t0 = time.perf_counter()
    ms = chained_ms(step, img, n_hi=args.n_hi, reps=3)
    wall = time.perf_counter() - t0
    fps = 1000.0 / ms

    n_kp = int(jax.device_get(
        detect_and_describe(img, cfg).valid
    ).sum())
    print(
        json.dumps(
            {
                "metric": f"sift_detect_describe_fps_{shape[0]}x{shape[1]}",
                "value": round(fps, 2),
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
                    "ms_per_frame": round(ms, 3),
                    "keypoints_frame0": n_kp,
                    "bench_wall_s": round(wall, 1),
                    "method": "chained fori_loop slope, fresh inputs",
                }
            }
        ),
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
