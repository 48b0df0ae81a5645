"""Tests of the pyramid calibration schedule vs globalCalib.cpp semantics."""

import numpy as np

from sdv_loam_tpu.utils.camera import make_pyramid_calib, num_pyr_levels


def test_kitti_level_count():
    # 1200x360: 1200*360=432000 -> halve 3 times to 150x45 (6750 > 5000,
    # but 150 is even & 45 odd -> stops). Sequence: 1200x360,600x180,300x90,150x45
    assert num_pyr_levels(1200, 360) == 4


def test_power_of_two_area_rule():
    # 1024² halves to 64² = 4096 < 5000 at level 5 -> stops there.
    assert num_pyr_levels(1024, 1024) == 5
    # Large enough area to hit the PYR_LEVELS=6 cap.
    assert num_pyr_levels(4096, 4096) == 6


def test_intrinsic_halving():
    c = make_pyramid_calib(1200, 360, 718.856, 718.856, 607.1928, 185.2157)
    assert c.levels == 4
    for lvl in range(1, c.levels):
        assert c.w[lvl] == 1200 >> lvl
        assert c.h[lvl] == 360 >> lvl
        np.testing.assert_allclose(c.fx[lvl], c.fx[0] * 0.5 ** lvl)
        np.testing.assert_allclose(
            c.cx[lvl], (c.cx[0] + 0.5) / (1 << lvl) - 0.5
        )
    Ki = c.Ki(2)
    np.testing.assert_allclose(Ki @ c.K(2), np.eye(3), atol=1e-12)


def test_settings_presets():
    from sdv_loam_tpu.config import Settings, PATTERN_P

    s = Settings.preset_default()
    assert s.desired_point_density == 2000.0 and s.max_frames == 7
    f = Settings.preset_fast()
    assert f.desired_point_density == 800.0 and f.max_frames == 6
    assert PATTERN_P.shape == (8, 2)
    assert (PATTERN_P[4] == [0, 0]).all()
