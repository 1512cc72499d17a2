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
