#!/usr/bin/env python
"""Demo: the fused visual-odometry loop (SIFT + matching + PnP + windowed BA
in one compiled step per frame — the BASELINE.json north-star composition).

Usage: python examples/demo_vo.py [--frames N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from sift_pyocl_tpu import SiftConfig
from sift_pyocl_tpu.models.vo import VOConfig, vo_init, vo_step
from sift_pyocl_tpu.utils.testimage import synthetic_scene


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()

    cfg = SiftConfig(kp_per_octave_cap=512)
    vo = VOConfig(window=6, pts_per_frame=128, obs_per_frame=256,
                  pnp_n=256, pnp_iters=6, cg_iters=6)
    H, W = 256, 256
    pan = synthetic_scene((H + 96, W + 96), n_blobs=60, seed=0)

    def frame_at(i):
        return jnp.asarray(pan[48 : 48 + H, 48 + 3 * i : 48 + 3 * i + W])

    K = jnp.asarray(
        [[300.0, 0, W / 2], [0, 300.0, H / 2], [0, 0, 1.0]], jnp.float32
    )
    state = vo_init(frame_at(0), K, cfg, vo)
    print("frame | keypoints matches  rms(px)   t (world)")
    for i in range(1, args.frames):
        state, out = vo_step(state, frame_at(i), K, cfg, vo)
        t = np.asarray(out.t)
        print(
            f"{i:5d} | {int(out.n_kp):9d} {int(out.n_matches):7d} "
            f"{float(out.rms_px):8.3f}   [{t[0]:+.3f} {t[1]:+.3f} {t[2]:+.3f}]"
        )


if __name__ == "__main__":
    main()
