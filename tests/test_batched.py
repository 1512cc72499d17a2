"""Batched frontend: per-frame parity with the single-frame pipeline."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from sift_pyocl_tpu import SiftConfig
from sift_pyocl_tpu.models.sift import (detect_and_describe,
                                        detect_and_describe_batched)
from sift_pyocl_tpu.utils.testimage import synthetic_scene


def test_batched_matches_single_pallas_interpret():
    cfg = dataclasses.replace(SiftConfig(), kp_backend="pallas",
                              pallas_interpret=True)
    imgs = jnp.asarray(np.stack([
        np.asarray(synthetic_scene((160, 160), n_blobs=30, seed=s))
        for s in (3, 7)
    ]))
    bb = detect_and_describe_batched(imgs, cfg)
    assert bb.valid.sum() > 0
    for f in range(2):
        b1 = detect_and_describe(imgs[f], cfg)
        m = np.asarray(b1.valid)
        assert np.array_equal(np.asarray(bb.valid[f]), m), f
        assert np.array_equal(np.asarray(bb.counts[f]),
                              np.asarray(b1.counts)), f
        # x/scale are bit-identical (column/scale math has no row base);
        # y/angle/desc pick up f32 ulps from the batched atlas's larger row
        # bases (refine and the window kernel's fro both subtract the base
        # from a large f32 atlas row): y ~1e-4 px, angle ~1e-5 rad, desc
        # u8 bins +-1 on a small fraction
        for fld in ("x", "scale"):
            got = np.asarray(getattr(bb, fld)[f])[m]
            want = np.asarray(getattr(b1, fld))[m]
            assert np.array_equal(got, want), (f, fld)
        np.testing.assert_allclose(np.asarray(bb.y[f])[m],
                                   np.asarray(b1.y)[m], atol=1e-3)
        np.testing.assert_allclose(np.asarray(bb.angle[f])[m],
                                   np.asarray(b1.angle)[m], atol=1e-4)
        dd = np.abs(np.asarray(bb.desc[f])[m].astype(np.int32)
                    - np.asarray(b1.desc)[m].astype(np.int32))
        assert dd.max() <= 1 and (dd > 0).mean() < 0.01, (f, dd.max())


def test_batched_xla_fallback_path():
    cfg = dataclasses.replace(SiftConfig(), kp_backend="xla")
    imgs = jnp.asarray(np.stack([
        np.asarray(synthetic_scene((128, 128), n_blobs=20, seed=s))
        for s in (1, 2)
    ]))
    bb = detect_and_describe_batched(imgs, cfg)
    b1 = detect_and_describe(imgs[1], cfg)
    assert np.array_equal(np.asarray(bb.valid[1]), np.asarray(b1.valid))
    assert np.array_equal(np.asarray(bb.desc[1]), np.asarray(b1.desc))
