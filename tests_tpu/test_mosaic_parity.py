"""Mosaic-compiled Pallas kernels vs the XLA path ON THE CHIP.

Each test mirrors an interpret-mode test from tests/test_pallas.py but with
interpret=False — the compiled behavior (DMA alignment, roll semantics,
SMEM cursors) is what ships; this lane makes BASELINE.md's "bit-identical
on TPU" claim reproducible (VERDICT r1 #5).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from conftest import requires_tpu

pytestmark = [pytest.mark.tpu, requires_tpu]


def test_blur_mosaic_matches_xla():
    from sift_pyocl_tpu.ops.pallas.conv import blur_taps, separable_blur_pallas
    from sift_pyocl_tpu.ops.pyramid import blur_jax

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (200, 300)).astype(np.float32))
    got = np.asarray(separable_blur_pallas(img, blur_taps(1.6)))
    want = np.asarray(blur_jax(img, 1.6))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_compact_mosaic_exact_order():
    from sift_pyocl_tpu.ops.pallas.compact import compact_mask_pallas

    rng = np.random.default_rng(2)
    mask = rng.uniform(size=(3, 60, 124)) > 0.995
    idx, written, total = compact_mask_pallas(jnp.asarray(mask), cap=256)
    want = np.nonzero(mask.reshape(-1))[0]
    got = np.asarray(idx)[: int(written)]
    assert int(total) == len(want)
    assert np.array_equal(got, want[: int(written)])


def test_ladder_mosaic_matches_oracle(scene160):
    from sift_pyocl_tpu import SiftConfig, oracle
    from sift_pyocl_tpu.ops.pyramid import build_scale_space_jax

    cfg = SiftConfig(conv_backend="pallas")
    ref = oracle.build_scale_space(scene160, cfg)
    got = build_scale_space_jax(jnp.asarray(scene160), cfg)
    assert len(ref) == len(got)
    for o, ((rb, rd), (gb, gd)) in enumerate(zip(ref, got)):
        assert rb.shape == np.asarray(gb).shape, f"octave {o}"
        np.testing.assert_allclose(np.asarray(gb), rb, atol=5e-2)
        np.testing.assert_allclose(np.asarray(gd), rd, atol=5e-2)


def test_detect_and_describe_mosaic_matches_xla(scene160):
    """The headline claim: the compiled Pallas pipeline and the XLA pipeline
    agree on keypoint sets with bit-identical descriptors."""
    from sift_pyocl_tpu import SiftConfig
    from sift_pyocl_tpu.models.sift import detect_and_describe
    from sift_pyocl_tpu.oracle import KP_DTYPE

    from conftest import match_keypoint_sets

    def run(**kw):
        cfg = SiftConfig(kp_per_octave_cap=256, **kw)
        buf = detect_and_describe(jnp.asarray(scene160), cfg)
        m = np.asarray(buf.valid)
        out = np.zeros(int(m.sum()), dtype=KP_DTYPE)
        for f in ("x", "y", "scale", "angle", "desc"):
            out[f] = np.asarray(getattr(buf, f))[m]
        return out

    kx = run(kp_backend="xla", conv_backend="xla")
    kp = run(kp_backend="pallas", conv_backend="pallas")
    assert len(kx) > 10
    hits, desc_l1 = match_keypoint_sets(kx, kp)
    assert hits >= 0.95 * len(kx), f"{hits}/{len(kx)}"
    assert desc_l1 < 0.2


def test_best2_mosaic_matches_xla():
    """The fused matcher kernel compiled on the chip == the XLA reduction:
    identical argmins, distances to f32 matmul tolerance."""
    from sift_pyocl_tpu.ops.match import _best2_l2
    from sift_pyocl_tpu.ops.pallas.matchk import best2_l2_pallas

    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.integers(0, 255, (1500, 128)), jnp.uint8)
    b = jnp.asarray(rng.integers(0, 255, (900, 128)), jnp.uint8)
    v2 = jnp.asarray(rng.uniform(size=900) < 0.9)
    x1, x2, xi = _best2_l2(a, b, v2)
    p1, p2, pi = best2_l2_pallas(a, b, v2)
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(xi))
    np.testing.assert_allclose(np.asarray(p1), np.asarray(x1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(x2), rtol=1e-5)
    # valid1 sub-tile skip path (the VO call shape): skipped rows zero,
    # surviving rows identical
    v1 = jnp.asarray(rng.uniform(size=1500) < 0.3)
    s1, s2, si = best2_l2_pallas(a, b, v2, v1)
    v1p = np.zeros(1536, bool)  # pad 1500 -> 12 SUB=128 sub-tiles
    v1p[:1500] = np.asarray(v1)
    keep = np.repeat(np.any(v1p.reshape(12, 128), axis=1), 128)[:1500]
    np.testing.assert_allclose(np.asarray(s1)[keep], np.asarray(x1)[keep],
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(si)[keep], np.asarray(xi)[keep])
    assert np.all(np.asarray(s1)[~keep] == 0.0)
    # fused 2-pass reduction variant (r4 A/B candidate): same results
    t1, t2, ti = best2_l2_pallas(a, b, v2, two_pass=True)
    np.testing.assert_array_equal(np.asarray(ti), np.asarray(xi))
    np.testing.assert_allclose(np.asarray(t1), np.asarray(x1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(x2), rtol=1e-5)


def test_grad_atlas_mosaic_matches_xla(scene160):
    """grad_atlas_pallas compiled on the chip == XLA gradients in every
    octave's region (poly atan2 tolerance), zeros outside."""
    from sift_pyocl_tpu import SiftConfig
    from sift_pyocl_tpu.ops.orient_desc import gradient_planes
    from sift_pyocl_tpu.ops.pallas.gradpad import grad_atlas_pallas
    from sift_pyocl_tpu.ops.pallas.window import PAD_C, PAD_R
    from sift_pyocl_tpu.ops.pyramid import build_scale_space_jax

    cfg = SiftConfig(conv_backend="xla")
    octs = build_scale_space_jax(jnp.asarray(scene160), cfg)
    blur_list = [b for b, _ in octs]
    mag_a, ori_a, row_starts = grad_atlas_pallas(blur_list, cfg.scales)
    mag_np, ori_np = np.asarray(mag_a), np.asarray(ori_a)
    for o, b in enumerate(blur_list):
        mags, oris = gradient_planes(b, cfg)
        S, H, W = mags.shape
        r0 = row_starts[o] + PAD_R
        np.testing.assert_allclose(
            mag_np[:, r0 : r0 + H, PAD_C : PAD_C + W], np.asarray(mags),
            rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(
            ori_np[:, r0 : r0 + H, PAD_C : PAD_C + W], np.asarray(oris),
            rtol=1e-5, atol=1e-5)
        blk = mag_np[:, row_starts[o] : r0 + H + PAD_R].copy()
        blk[:, PAD_R : PAD_R + H, PAD_C : PAD_C + W] = 0.0
        assert np.abs(blk).max() == 0.0


def test_vo_step_mosaic_runs():
    """The fused VO step (flagship model) compiles and runs Mosaic on the
    chip: finite outputs, tracking healthy on a translating scene."""
    import jax
    import numpy as np

    from sift_pyocl_tpu import SiftConfig
    from sift_pyocl_tpu.models.vo import VOConfig, vo_init, vo_step
    from sift_pyocl_tpu.utils.testimage import synthetic_scene

    cfg = SiftConfig(kp_per_octave_cap=256)
    vo = VOConfig(window=4, pts_per_frame=64, obs_per_frame=128,
                  pnp_n=128, pnp_iters=4, cg_iters=4)
    H, W = 160, 160
    base = synthetic_scene((H + 48, W + 48), n_blobs=40, seed=0)
    K = jnp.asarray([[200.0, 0, W / 2], [0, 200.0, H / 2], [0, 0, 1.0]],
                    jnp.float32)

    def frame_at(dx):
        return jnp.asarray(base[24 : 24 + H, 24 + dx : 24 + dx + W])

    st = vo_init(frame_at(0), K, cfg, vo)
    st, out = vo_step(st, frame_at(2), K, cfg, vo)
    jax.block_until_ready(out.t)
    assert bool(out.tracked)
    assert int(out.n_matches) > 10
    assert np.isfinite(float(out.rms_px)) and float(out.rms_px) < 3.0
    assert np.all(np.isfinite(np.asarray(out.t)))


def test_extrema_mask_mosaic_matches_xla(scene160):
    """Mosaic-compiled atlas extrema-mask kernel vs the XLA stencil: exact
    per-octave equality on the chip (mirrors the interpret-mode test)."""
    from sift_pyocl_tpu import SiftConfig
    from sift_pyocl_tpu.ops.detect import extrema_mask
    from sift_pyocl_tpu.ops.pallas.maskk import extrema_masks_atlas_pallas
    from sift_pyocl_tpu.ops.pallas.refine import build_dog_atlas
    from sift_pyocl_tpu.ops.pyramid import build_scale_space_jax

    cfg = SiftConfig()
    octs = build_scale_space_jax(jnp.asarray(scene160), cfg)
    dogs = [d for _, d in octs]
    atlas, rs = build_dog_atlas(dogs)
    got = extrema_masks_atlas_pallas(
        atlas, rs, [d.shape for d in dogs], cfg, interpret=False
    )
    for o, d in enumerate(dogs):
        want = np.asarray(extrema_mask(d, cfg, o))
        np.testing.assert_array_equal(np.asarray(got[o]), want,
                                      err_msg=f"octave {o}")


def test_batched_frontend_mosaic_matches_single(scene160):
    """detect_and_describe_batched on the chip: frame slices match the
    single-frame pipeline (valid/x/scale exact; y/angle within the batched
    atlas's row-base f32 ulps, desc u8 within +-1)."""
    from sift_pyocl_tpu import SiftConfig
    from sift_pyocl_tpu.models.sift import (detect_and_describe,
                                            detect_and_describe_batched)

    cfg = SiftConfig(kp_per_octave_cap=256)
    rng = np.random.default_rng(5)
    imgs = jnp.asarray(np.stack([
        scene160, np.clip(scene160 + rng.normal(0, 4, scene160.shape), 0,
                          255).astype(np.float32)
    ]))
    bb = detect_and_describe_batched(imgs, cfg)
    assert int(np.asarray(bb.valid).sum()) > 10
    for f in range(2):
        b1 = detect_and_describe(imgs[f], cfg)
        m = np.asarray(b1.valid)
        assert np.array_equal(np.asarray(bb.valid[f]), m), f
        for fld in ("x", "scale"):
            assert np.array_equal(np.asarray(getattr(bb, fld)[f])[m],
                                  np.asarray(getattr(b1, fld))[m]), (f, fld)
        np.testing.assert_allclose(np.asarray(bb.y[f])[m],
                                   np.asarray(b1.y)[m], atol=1e-3)
        np.testing.assert_allclose(np.asarray(bb.angle[f])[m],
                                   np.asarray(b1.angle)[m], atol=1e-4)
        dd = np.abs(np.asarray(bb.desc[f])[m].astype(np.int32)
                    - np.asarray(b1.desc)[m].astype(np.int32))
        assert dd.max() <= 1 and (dd > 0).mean() < 0.01, (f, int(dd.max()))


def test_fused_ladder_masks_mosaic_matches_xla(scene160):
    """Mosaic-compiled fused in-ladder extrema masks (mask_backend="fused")
    vs the XLA stencil: exact per-octave equality on the chip."""
    import dataclasses

    from sift_pyocl_tpu import SiftConfig
    from sift_pyocl_tpu.ops.detect import extrema_mask
    from sift_pyocl_tpu.ops.pyramid import build_scale_space_and_masks_jax

    cfg = dataclasses.replace(
        SiftConfig(), conv_backend="pallas", mask_backend="fused",
    )
    octs, masks = build_scale_space_and_masks_jax(jnp.asarray(scene160), cfg)
    assert masks is not None and all(m is not None for m in masks)
    for o, (_, d) in enumerate(octs):
        want = np.asarray(extrema_mask(d, cfg, o))
        np.testing.assert_array_equal(
            np.asarray(masks[o]) != 0, want, err_msg=f"octave {o}"
        )
