"""Matching ops vs the oracle (reference: test/test_matching.py — SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from sift_pyocl_tpu import MatchPlan
from sift_pyocl_tpu.oracle import KP_DTYPE, match_descriptors, sift_numpy
from sift_pyocl_tpu.ops.match import match_descriptors_jax
from sift_pyocl_tpu.utils.testimage import transformed_pair


@pytest.fixture(scope="module")
def desc_pair():
    rng = np.random.default_rng(0)
    base = rng.integers(0, 90, (80, 128), dtype=np.uint8)
    noisy = np.clip(base.astype(int) + rng.integers(-3, 4, base.shape), 0, 255)
    # shuffle second set so index mapping is nontrivial
    perm = rng.permutation(80)
    return base, noisy[perm].astype(np.uint8), perm


def test_l1_matching_parity(desc_pair):
    d1, d2, _ = desc_pair
    ref = match_descriptors(d1, d2)
    res = match_descriptors_jax(
        jnp.asarray(d1), jnp.ones(len(d1), bool),
        jnp.asarray(d2), jnp.ones(len(d2), bool), metric="L1",
    )
    m = np.asarray(res.valid)
    got = set(zip(np.asarray(res.idx1)[m].tolist(), np.asarray(res.idx2)[m].tolist()))
    assert got == set(map(tuple, ref))
    assert int(res.count) == len(ref)


def test_l1_recovers_permutation(desc_pair):
    d1, d2, perm = desc_pair
    res = match_descriptors_jax(
        jnp.asarray(d1), jnp.ones(len(d1), bool),
        jnp.asarray(d2), jnp.ones(len(d2), bool), metric="L1",
    )
    m = np.asarray(res.valid)
    i1 = np.asarray(res.idx1)[m]
    i2 = np.asarray(res.idx2)[m]
    # matched pairs must agree with the known permutation
    inv = np.argsort(perm)
    assert (i2 == inv[i1]).mean() > 0.95


def test_l2_mode(desc_pair):
    d1, d2, perm = desc_pair
    res = match_descriptors_jax(
        jnp.asarray(d1), jnp.ones(len(d1), bool),
        jnp.asarray(d2), jnp.ones(len(d2), bool), metric="L2",
    )
    m = np.asarray(res.valid)
    inv = np.argsort(perm)
    assert (np.asarray(res.idx2)[m] == inv[np.asarray(res.idx1)[m]]).mean() > 0.95


def test_validity_masks(desc_pair):
    d1, d2, _ = desc_pair
    v2 = np.ones(len(d2), bool)
    v2[:40] = False
    res = match_descriptors_jax(
        jnp.asarray(d1), jnp.ones(len(d1), bool), jnp.asarray(d2), jnp.asarray(v2),
    )
    m = np.asarray(res.valid)
    assert (np.asarray(res.idx2)[m] >= 40).all()


def test_empty_inputs():
    mp = MatchPlan()
    out = mp.match(np.zeros(0, KP_DTYPE), np.zeros(5, KP_DTYPE))
    assert out.shape == (0, 2)


def test_match_plan_translated_scene(small_cfg):
    from sift_pyocl_tpu import SiftPlan

    a, b = transformed_pair((128, 128), seed=1, dx=5, dy=-3)
    pa = SiftPlan(shape=a.shape, config=small_cfg)
    ka, kb = pa.keypoints(a), pa.keypoints(b)
    mp = MatchPlan()
    m = mp.match(ka, kb)
    assert len(m) >= 5
    dx = np.median(m[:, 1]["x"] - m[:, 0]["x"])
    dy = np.median(m[:, 1]["y"] - m[:, 0]["y"])
    assert abs(dx + 5) < 0.5 and abs(dy - 3) < 0.5


def test_pallas_best2_matches_xla(desc_pair):
    """Fused Pallas best-2 kernel (interpret mode) == XLA _best2_l2:
    distances, argmin identity, and tie-breaking."""
    from sift_pyocl_tpu.ops.match import _best2_l2
    from sift_pyocl_tpu.ops.pallas.matchk import best2_l2_pallas

    d1s, d2s, _perm = desc_pair
    rng = np.random.default_rng(3)
    valid2 = jnp.asarray(rng.uniform(size=len(d2s)) < 0.8)
    # plant exact duplicates to exercise tie-breaking
    d2s = np.array(d2s)
    d2s[7] = d2s[3]
    a, b = jnp.asarray(d1s), jnp.asarray(d2s)
    x1, x2, xi = _best2_l2(a, b, valid2)
    for two_pass in (False, True):  # r4: fused 2-pass reduction variant
        p1, p2, pi = best2_l2_pallas(a, b, valid2, interpret=True,
                                     two_pass=two_pass)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(x1), rtol=1e-6)
        np.testing.assert_allclose(
            np.where(np.isinf(p2), 1e30, np.asarray(p2)),
            np.where(np.isinf(np.asarray(x2)), 1e30, np.asarray(x2)),
            rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(pi), np.asarray(xi))


def test_pallas_best2_degenerate():
    """Zero / one valid column rows keep XLA semantics through the kernel."""
    from sift_pyocl_tpu.ops.match import _best2_l2
    from sift_pyocl_tpu.ops.pallas.matchk import best2_l2_pallas

    rng = np.random.default_rng(4)
    a = jnp.asarray(rng.integers(0, 255, (8, 128)), jnp.uint8)
    b = jnp.asarray(rng.integers(0, 255, (16, 128)), jnp.uint8)
    for nvalid in (0, 1):
        v = jnp.asarray(np.arange(16) < nvalid)
        x1, x2, xi = _best2_l2(a, b, v)
        p1, p2, pi = best2_l2_pallas(a, b, v, interpret=True)
        np.testing.assert_array_equal(
            np.isinf(np.asarray(p2)), np.isinf(np.asarray(x2)))
        if nvalid:
            np.testing.assert_allclose(np.asarray(p1), np.asarray(x1), rtol=1e-6)
            np.testing.assert_array_equal(np.asarray(pi), np.asarray(xi))

def test_pallas_best2_valid1_skip(desc_pair):
    """valid1 sub-tile skip: valid rows bit-identical to the full run,
    rows in fully-invalid sub-tiles return zeros (callers gate on valid1)."""
    from sift_pyocl_tpu.ops.pallas.matchk import SUB, best2_l2_pallas

    d1s, d2s, _perm = desc_pair
    rng = np.random.default_rng(5)
    n1 = len(d1s)
    valid2 = jnp.asarray(rng.uniform(size=len(d2s)) < 0.8)
    # valid rows only in the first sub-tile; everything later is skippable
    valid1 = np.zeros(max(n1, 2 * SUB), bool)
    valid1[: min(n1, 40)] = True
    a = jnp.asarray(np.resize(np.array(d1s), (len(valid1), 128)))
    b = jnp.asarray(d2s)
    f1, f2, fi = best2_l2_pallas(a, b, valid2, interpret=True)
    p1, p2, pi = best2_l2_pallas(a, b, valid2, jnp.asarray(valid1),
                                 interpret=True)
    sl = np.flatnonzero(valid1)
    np.testing.assert_array_equal(np.asarray(p1)[sl], np.asarray(f1)[sl])
    np.testing.assert_array_equal(np.asarray(pi)[sl], np.asarray(fi)[sl])
    # a row beyond every valid sub-tile must come back zeroed
    assert float(p1[-1]) == 0.0 and int(pi[-1]) == 0


def test_pallas_best2_bf16_u8_exact(desc_pair):
    """u8 descriptors through the bf16 MXU path == the f32 XLA reduction
    bit-for-bit (u8 values, products and 128-term sums are all exact)."""
    from sift_pyocl_tpu.ops.match import _best2_l2
    from sift_pyocl_tpu.ops.pallas.matchk import best2_l2_pallas

    rng = np.random.default_rng(6)
    a = jnp.asarray(rng.integers(0, 256, (300, 128)), jnp.uint8)
    b = jnp.asarray(rng.integers(0, 256, (200, 128)), jnp.uint8)
    v2 = jnp.asarray(rng.uniform(size=200) < 0.9)
    x1, x2, xi = _best2_l2(a, b, v2)
    p1, p2, pi = best2_l2_pallas(a, b, v2, interpret=True)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(x1))
    np.testing.assert_array_equal(np.asarray(p2), np.asarray(x2))
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(xi))
