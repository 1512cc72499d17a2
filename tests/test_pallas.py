"""Parity tests for the Pallas TPU kernels (interpret mode on CPU).

Mirrors the reference's kernel-vs-oracle strategy (SURVEY.md §4): every Pallas
kernel is checked against the plain-XLA/NumPy implementation of the same
stage.  On CPU the kernels run under the Pallas interpreter; the same code
compiles with Mosaic on a real TPU (exercised by bench.py / the driver).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sift_pyocl_tpu.ops.pallas.conv import separable_blur_pallas, blur_taps
from sift_pyocl_tpu.ops.pyramid import blur_jax


@pytest.mark.parametrize("shape", [(64, 96), (200, 300)])
@pytest.mark.parametrize("sigma", [1.226, 1.6, 3.09])
def test_separable_blur_pallas_matches_xla(shape, sigma):
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, shape).astype(np.float32))
    got = separable_blur_pallas(
        img, blur_taps(sigma), tile_rows=64, tile_cols=128, interpret=True
    )
    want = blur_jax(img, sigma)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_blur_router_pallas_matches_oracle_numerics():
    from sift_pyocl_tpu import oracle

    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, (96, 128)).astype(np.float32)
    got = separable_blur_pallas(
        jnp.asarray(img), blur_taps(1.6), tile_rows=64, tile_cols=128,
        interpret=True,
    )
    want = oracle.blur(img, 1.6)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3)


def test_compact_mask_pallas_interpret():
    from sift_pyocl_tpu.ops.pallas.compact import compact_mask_pallas

    rng = np.random.default_rng(2)
    mask = rng.uniform(size=(3, 60, 124)) > 0.995
    idx, written, total = compact_mask_pallas(
        jnp.asarray(mask), cap=256, interpret=True
    )
    want = np.nonzero(mask.reshape(-1))[0]
    got = np.asarray(idx)[: int(written)]
    assert int(total) == len(want)
    assert np.array_equal(got, want[: int(written)])  # exact nonzero order


def test_refine_pallas_interpret_matches_xla():
    from sift_pyocl_tpu import SiftConfig
    from sift_pyocl_tpu.ops.pyramid import build_scale_space_jax
    from sift_pyocl_tpu.ops.detect import (
        extrema_mask, compact_extrema, refine_candidates,
    )
    from sift_pyocl_tpu.ops.pallas.refine import pad_dogs, refine_pallas
    from sift_pyocl_tpu.utils.testimage import synthetic_scene

    cfg = SiftConfig()
    img = jnp.asarray(synthetic_scene((96, 128), n_blobs=12, seed=3))
    dogs = build_scale_space_jax(img, cfg)[0][1]
    S, H, W = dogs.shape
    mask = extrema_mask(dogs, cfg, 0)
    cands = compact_extrema(mask, cfg, 64)
    ref = refine_candidates(dogs, cands, cfg)
    fs, fr, fc, peak, acc = refine_pallas(
        pad_dogs(dogs), cands.s, cands.r, cands.c, cands.valid,
        H=H, W=W, bd=cfg.border_dist, peak_thresh=cfg.peak_thresh,
        interpret=True,
    )
    m = np.asarray(cands.valid)
    assert np.array_equal(np.asarray(acc)[m] > 0, np.asarray(ref.valid)[m])
    am = m & (np.asarray(acc) > 0)
    for a, b in [(fs, ref.fs), (fr, ref.fr), (fc, ref.fc), (peak, ref.peak)]:
        if am.sum():
            np.testing.assert_allclose(
                np.asarray(a)[am], np.asarray(b)[am], atol=1e-5
            )


def test_upscale2_matmul_matches_oracle():
    from sift_pyocl_tpu import oracle
    from sift_pyocl_tpu.ops.pyramid import upscale2_jax

    rng = np.random.default_rng(4)
    img = rng.uniform(0, 255, (37, 53)).astype(np.float32)
    got = np.asarray(upscale2_jax(jnp.asarray(img)))
    want = oracle.upscale2(img)
    np.testing.assert_allclose(got, want, atol=1e-3)
