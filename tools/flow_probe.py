"""Measure the REAL tracker flow / keyframe rate of a candidate bench scene
(CPU, short run) — the host-side tuner (scene_flow_tune.py) estimates flow
from raw LiDAR points, but the keyframe formula runs on SELECTED points,
and per-block adaptive selection keeps low-contrast ground unless its
gradients fall below the histogram floor. This probes the actual pipeline.

Usage: python tools/flow_probe.py <op> <ground_contrast> [n_frames]
"""

import sys

import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

from sdv_loam_tpu.config import Settings
from sdv_loam_tpu.data.synthetic import make_sequence
from sdv_loam_tpu.eval.ate import ate_rmse
from sdv_loam_tpu.system.full_system import FullSystem

op = sys.argv[1] if len(sys.argv) > 1 else "default"
gc = float(sys.argv[2]) if len(sys.argv) > 2 else 0.08
n = int(sys.argv[3]) if len(sys.argv) > 3 else 16

if op == "fast":
    kw = dict(w=424, h=320, fx=245.6, fy=611.8)
    s = Settings.preset_fast()
else:
    kw = dict(w=1200, h=360, fx=718.856)
    s = Settings()

gp = float(sys.argv[4]) if len(sys.argv) > 4 else 0.0
step = float(sys.argv[5]) if len(sys.argv) > 5 else 0.7
seq = make_sequence(n_frames=n, step=step, lidar_stride=2, half_width=16.0,
                    ground_contrast=gc, ground_patches=gp, cy_offset=0.0,
                    follow_path=True, yaw_rate=0.004, seed=7, **kw)
fs = FullSystem(seq.calib, seq.sensor, s)
for i in range(n):
    fs.add_active_frame(*seq.get(i))
est = fs.get_trajectory()
kd = np.array([r[:3] for r in fs.kf_decision_hist])
m = np.asarray(fs.pt_valid, bool)
sensor_frac = float(np.asarray(fs.pt["is_sensor"])[m].mean()) if m.any() else 0
zmed = float(np.median(1.0 / np.clip(
    np.asarray(fs.pt["idepth"])[m], 1e-6, None))) if m.any() else 0
print(f"op={op} gc={gc} gp={gp}: sensor_frac {sensor_frac:.2f} "
      f"z_med {zmed:.1f} wsum mean {kd[:, 0].mean():.2f} "
      f"flow_t {kd[:, 1].mean():.1f}px flow_rt {kd[:, 2].mean():.1f}px "
      f"kf_rate {len(fs.kf_shells) / max(len(est), 1):.2f} "
      f"ATE {ate_rmse(est, seq.poses_wc[:len(est)]):.4f} lost={fs.is_lost}")
