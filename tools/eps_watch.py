"""Accuracy-under-yaw diagnostic (see ROADMAP.md round-2 findings). Run with
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8."""
import sys; sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import jax; jax.config.update('jax_platforms', 'cpu')
import numpy as np
from sdv_loam_tpu.config import Settings
from sdv_loam_tpu.data.synthetic import make_sequence
from sdv_loam_tpu.system.full_system import FullSystem

yaw = 0.02
n = 40
seq = make_sequence(n_frames=n, w=320, h=96, step=0.5, yaw_rate=yaw,
                    half_width=10.0, follow_path=True, lidar_stride=2)
s = Settings(desired_immature_density=600, desired_point_density=800,
             n_active_cap=2048, n_immature_cap=2048)
fs = FullSystem(seq.calib, seq.sensor, s)
for i in range(n):
    img, cloud, ts = seq.get(i)
    fs.add_active_frame(img, cloud, ts)
    if fs.is_lost:
        print("LOST", i); break
    if i >= 4 and i % 3 == 0:
        used = np.array(fs.order)
        e = fs.eps[used]
        # compare each window frame's CURRENT pose to GT (rel to newest)
        T_cw = fs.T_cw
        errs = []
        for sl in used:
            sid = fs.frame_shell_idx[sl]
            Tgt = np.linalg.inv(seq.poses_wc[sid])
            # relative to newest slot, gauge-free comparison
            sln = fs.order[-1]
            sidn = fs.frame_shell_idx[sln]
            rel_est = T_cw[sl] @ np.linalg.inv(T_cw[sln])
            rel_gt = Tgt @ seq.poses_wc[sidn]
            dT = np.linalg.inv(rel_gt) @ rel_est
            errs.append(np.degrees(np.arccos(np.clip((np.trace(dT[:3,:3])-1)/2,-1,1))))
        print(f"f{i:3d}: |eps_rot|max {np.abs(e[:, 3:]).max():.4f} "
              f"|eps_tr|max {np.abs(e[:, :3]).max():.3f} "
              f"win-rel-rot-err(deg) {np.array(errs).round(2)}", flush=True)
