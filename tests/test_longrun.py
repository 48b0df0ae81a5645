"""Long-run and sharp-turn accuracy (VERDICT r1 item 5).

The short E2E tests only exercise first-window-fill; these drive hundreds
of keyframe cycles (marginalization-heavy) over trajectories whose
curvature changes sign, so yaw drift cannot cancel by symmetry.

Both use the canyon-following scene (`follow_path=True`): the default
world-fixed corridor degenerates under sustained yaw (the path swings
laterally past the walls — see ROADMAP round-2 findings).

Status (round 3): the runaway drift is fixed — reference-exact FEJ
residual anchoring (`ba_resf_at_fej`), the struct-pose photometric veto
(tol 1.1), and the BA step sanity veto (ROADMAP round-3 findings).
Measured on the real TPU: 400-frame full-scale S-curve (4 lobes,
tools/drift_bisect.py) ATE 1.21 m over ~300 m = 0.40% final, stable
through all lobes. The 500-frame gate runs un-xfailed.

Marked slow (several minutes each on the CI CPU): run with `pytest -m slow`.
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
    seq = make_sequence(n_frames=n, w=1200, h=360, fx=718.856, step=0.8,
                        yaw_rate=prof, lidar_stride=2, half_width=14.0,
                        follow_path=True)
    s = Settings()
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


@pytest.mark.slow
def test_sharp_turn_kitti_scale():
    """A 46-degree turn at full KITTI resolution must stay within 1% ATE
    (KITTI city corners are ~3 deg/frame; this runs 1.15 deg/frame)."""
    n = 40
    seq = make_sequence(n_frames=n, w=1200, h=360, fx=718.856, step=1.0,
                        yaw_rate=0.02, half_width=14.0, follow_path=True,
                        lidar_stride=2)
    fs = FullSystem(seq.calib, seq.sensor, Settings())
    for i in range(n):
        img, cloud, ts = seq.get(i)
        fs.add_active_frame(img, cloud, ts)
    assert not fs.is_lost
    est = fs.get_trajectory()
    gt = seq.poses_wc[:len(est)]
    dist = np.linalg.norm(np.diff(gt[:, :3, 3], axis=0), axis=1).sum()
    a = ate_rmse(est, gt)
    print(f"\n[sharp-turn] path {dist:.1f} m  ATE {a:.3f} m "
          f"({100 * a / dist:.2f}%)")
    assert a < 0.01 * dist, f"ATE {a:.3f} m over {dist:.1f} m"
