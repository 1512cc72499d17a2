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
