"""Default-lane long-horizon drift gate (VERDICT r2 item 7).

Round 2's long-run acceptance test was both `slow`-deselected and xfail, so
the drift regression that gated the round was invisible to every default
test run. This gate runs UN-deselected: 100 straight frames at the small
test geometry — enough keyframe cycles (~50) that the round-2 runaway
(which accelerated superlinearly past ~40 frames and reached 25%+ by
frame 120 at every scale) cannot hide, while staying within a CI-sized
budget (~5 min, compile-shape-shared with the other suites).

Baseline (2026-08-19, round 4: quad-packed gathers + the
computeHistQuantil rounding fix): 0.36-0.76% across selection seeds at
this deliberately weak 320x96 geometry. The round-3 bimodal
photometric-aliasing mode (~4.8%) has not recurred with the current
numerics; the gate is tightened 8% -> 2% (VERDICT r4 item 3) with ~2.6x
headroom over the observed worst case. Tight accuracy numbers live in
the KITTI-scale TPU benchmarks and the slow 500-frame S-curve test.
"""

import numpy as np

from sdv_loam_tpu.config import Settings
from sdv_loam_tpu.data.synthetic import make_sequence
from sdv_loam_tpu.eval.ate import ate_rmse
from sdv_loam_tpu.system.full_system import FullSystem


def test_long_horizon_drift_gate():
    n = 100
    seq = make_sequence(n_frames=n, w=320, h=96, step=0.8, yaw_rate=0.0,
                        lidar_stride=4)
    # closest_view_track=False: the recommended weak-geometry
    # configuration (config.py) — at this deliberately tiny 320x96 scale
    # the window pose error makes tracking-pass patch transfer lossy
    # (measured 0.63% vs 9.0% with it on), while at KITTI scale the same
    # flag carries the BASELINE-protocol win.
    s = Settings(desired_immature_density=600, desired_point_density=800,
                 n_active_cap=2048, n_immature_cap=2048,
                 closest_view_track=False)
    fs = FullSystem(seq.calib, seq.sensor, s)
    for i in range(n):
        img, cloud, ts = seq.get(i)
        fs.add_active_frame(img, cloud, ts)
    assert not fs.is_lost
    est = fs.get_trajectory()
    gt = seq.poses_wc[:len(est)]
    dist = np.linalg.norm(np.diff(gt[:, :3, 3], axis=0), axis=1).sum()
    a = ate_rmse(est, gt)
    print(f"\n[drift-gate] path {dist:.1f} m  ATE {a:.3f} m "
          f"({100 * a / dist:.2f}%)")
    assert a < 0.02 * dist, (
        f"long-horizon drift regressed: ATE {a:.3f} m over {dist:.1f} m "
        f"({100 * a / dist:.1f}%; healthy modes 0.9%/4.8%, runaway 25%+)")
