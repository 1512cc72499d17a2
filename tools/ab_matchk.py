"""Interleaved on-chip A/B of the matchk best-2 reduction (3-pass vs 2-pass).

The 3-pass form reduces each (SUB, N2) distance tile three times (min,
argmin-select, masked second-min); the 2-pass form computes tie-count +
argmin + masked-min in ONE sweep after the d1 pass (bit-identical by case
analysis, parity-tested in tests/test_match.py).  Rows time the isolated
kernel at VO shapes (8448 query slots vs 2048 map slots, ~25% valid).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sift_pyocl_tpu.utils.benchtool import ab_args, run_ab_rows


def main():
    args = ab_args()
    import jax.numpy as jnp
    import numpy as np

    from sift_pyocl_tpu import SiftConfig
    from sift_pyocl_tpu.models.sift import octave_capacities
    from sift_pyocl_tpu.models.vo import VOConfig
    from sift_pyocl_tpu.ops.pallas.matchk import best2_l2_pallas

    cfg = SiftConfig()
    vo = VOConfig()
    shape = tuple(args.shape)
    caps = octave_capacities(shape, cfg)
    n1 = sum(c for c, _ in caps) * cfg.max_ori
    n2 = vo.window * vo.pts_per_frame
    rng = np.random.default_rng(0)
    d1 = jnp.asarray(rng.integers(0, 255, (n1, 128)), jnp.uint8)
    v1 = jnp.asarray(rng.uniform(size=n1) < 0.25)
    d2 = jnp.asarray(rng.integers(0, 255, (n2, 128)), jnp.uint8)
    v2 = jnp.asarray(rng.uniform(size=n2) < 0.8)
    print(f"n1={n1} n2={n2} valid1={int(v1.sum())}", flush=True)

    def variant(two_pass):
        def step(c):
            d = d1 + c[0, 0].astype(jnp.uint8)  # fresh data each iteration
            b1, b2, i1 = best2_l2_pallas(d, d2, v2, v1, two_pass=two_pass)
            return [b1.sum(), b2.sum(), i1.sum()]
        return step

    run_ab_rows([
        ("p3", variant(False)), ("p2", variant(True)),
        ("p3_b", variant(False)), ("p2_b", variant(True)),
    ], jnp.zeros((8, 128), jnp.float32), args)


if __name__ == "__main__":
    main()
