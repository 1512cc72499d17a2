import math

from sift_pyocl_tpu.config import SiftConfig, config_from_par, par


def test_reference_defaults():
    cfg = SiftConfig()
    assert cfg.init_sigma == 1.6
    assert cfg.border_dist == 5
    assert cfg.scales == 3
    assert abs(cfg.peak_thresh - 255.0 * 0.04 / 3.0) < 1e-12
    assert cfg.edge_thresh == 0.06
    assert cfg.edge_thresh1 == 0.08
    assert cfg.match_ratio == 0.73
    assert not cfg.double_im_size


def test_sigma_ladder():
    cfg = SiftConfig()
    lad = cfg.sigma_ladder()
    assert len(lad) == cfg.scales + 3
    assert lad[0] == 1.6
    assert abs(lad[cfg.scales] - 3.2) < 1e-12  # doubles after S intervals
    inc = cfg.sigma_increments()
    for s in range(1, len(lad)):
        assert abs(math.sqrt(lad[s - 1] ** 2 + inc[s - 1] ** 2) - lad[s]) < 1e-9


def test_octave_count():
    cfg = SiftConfig()
    assert cfg.n_octaves((512, 512)) == 6   # 512 .. 16 (13 stops)
    assert cfg.n_octaves((16, 16)) == 1
    assert SiftConfig(double_im_size=True).n_octaves((256, 256)) == 6


def test_par_bridge():
    assert par["InitSigma"] == 1.6
    cfg = config_from_par(dict(par, Scales=4, EdgeThresh=0.1))
    assert cfg.scales == 4
    assert cfg.edge_thresh == 0.1
    assert cfg.init_sigma == 1.6


def test_matchplan_padding_buckets():
    """MatchPlan(size=) honors a stable compile footprint (VERDICT r1)."""
    from sift_pyocl_tpu.models.match_align import MatchPlan

    mp = MatchPlan(size=1024)
    import numpy as np
    from sift_pyocl_tpu.oracle import KP_DTYPE

    kp = np.zeros(300, KP_DTYPE)
    d, m, xy = mp._padded(kp, np.ones(300, bool))
    assert d.shape == (512, 128) and m.sum() == 300
    kp2 = np.zeros(900, KP_DTYPE)
    d2, m2, _ = mp._padded(kp2, np.ones(900, bool))
    assert d2.shape == (1024, 128)
    kp3 = np.zeros(1500, KP_DTYPE)
    d3, _, _ = mp._padded(kp3, np.ones(1500, bool))
    assert d3.shape == (2048, 128)  # beyond size: next pow2 bucket


def test_siftplan_memory_precheck():
    """Oversized plans raise at construction, not inside Mosaic
    (reference: plan.py::_calc_memory)."""
    import pytest

    from sift_pyocl_tpu import SiftPlan

    with pytest.raises(MemoryError):
        SiftPlan(shape=(120000, 120000))
    p = SiftPlan(shape=(512, 512))
    assert 0 < p.calc_memory() < (1 << 30)


def test_max_ori_knob():
    """cfg.max_ori threads through both kp backends consistently."""
    import jax.numpy as jnp
    import numpy as np

    from sift_pyocl_tpu import SiftConfig
    from sift_pyocl_tpu.models.sift import detect_and_describe
    from sift_pyocl_tpu.utils.testimage import synthetic_scene

    scene = synthetic_scene((128, 128), n_blobs=15, seed=0)
    for mo in (2, 3):
        bx = detect_and_describe(
            jnp.asarray(scene),
            SiftConfig(kp_per_octave_cap=256, kp_backend="xla",
                       conv_backend="xla", max_ori=mo),
        )
        bp = detect_and_describe(
            jnp.asarray(scene),
            SiftConfig(kp_per_octave_cap=256, kp_backend="pallas",
                       conv_backend="xla", pallas_interpret=True, max_ori=mo),
        )
        assert int(np.asarray(bx.valid).sum()) == int(
            np.asarray(bp.valid).sum()
        ) > 5
