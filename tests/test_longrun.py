"""Long-run accuracy: 500-frame S-curve, ATE < 1% of path length.

VERDICT r1 item 5: the short E2E tests only exercise first-window-fill; this
drives hundreds of keyframe cycles (marginalization-heavy) over a trajectory
whose curvature changes sign, so yaw drift cannot cancel by symmetry.
Marked slow (several minutes on the CI CPU): run with `pytest -m slow`.
"""

import numpy as np
import pytest

from sdv_loam_tpu.config import Settings
from sdv_loam_tpu.data.synthetic import make_sequence, s_curve_profile
from sdv_loam_tpu.eval.ate import ate_rmse, drift_decomposition
from sdv_loam_tpu.system.full_system import FullSystem


@pytest.mark.slow
def test_500_frame_s_curve():
    n = 500
    prof = s_curve_profile(n, peak=0.006, n_lobes=4)
    seq = make_sequence(n_frames=n, w=640, h=192, fx=384.0, step=0.8,
                        yaw_rate=prof, lidar_stride=2, half_width=12.0)
    s = Settings(desired_immature_density=900, desired_point_density=1200,
                 n_active_cap=2048, n_immature_cap=2048)
    fs = FullSystem(seq.calib, seq.sensor, s)
    for i in range(n):
        img, cloud, ts = seq.get(i)
        fs.add_active_frame(img, cloud, ts)
    assert not fs.is_lost
    est = fs.get_trajectory()
    gt = seq.poses_wc[:len(est)]
    dist = np.linalg.norm(np.diff(gt[:, :3, 3], axis=0), axis=1).sum()
    a = ate_rmse(est, gt)
    dd = drift_decomposition(est, gt)
    print(f"\n[longrun] path {dist:.1f} m  ATE {a:.3f} m "
          f"({100 * a / dist:.2f}%)  drift: {dd}")
    assert a < 0.01 * dist, f"ATE {a:.3f} m over {dist:.1f} m path"
    # with LiDAR depth the scale term must be near zero
    assert abs(dd["scale_drift_pct"]) < 0.5, dd
