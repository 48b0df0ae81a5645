"""Accuracy-under-yaw diagnostic (see ROADMAP.md round-2 findings). Run with
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8."""
import sys; sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import jax; jax.config.update('jax_platforms', 'cpu')
import numpy as np
from sdv_loam_tpu.config import Settings
from sdv_loam_tpu.data.synthetic import make_sequence
from sdv_loam_tpu.system.full_system import FullSystem

yaw = 0.02
n = 70
seq = make_sequence(n_frames=n, w=320, h=96, step=0.5, yaw_rate=yaw,
                    half_width=10.0, follow_path=True, lidar_stride=2)
s = Settings(desired_immature_density=600, desired_point_density=800,
             n_active_cap=2048, n_immature_cap=2048, use_struct_pose=False)
fs = FullSystem(seq.calib, seq.sensor, s)
for i in range(n):
    img, cloud, ts = seq.get(i)
    fs.add_active_frame(img, cloud, ts)
    if fs.is_lost:
        print("LOST", i); break
    if i >= 2 and i % 4 == 0:
        Tr_est = np.linalg.inv(fs.shells[-2]["T_wc"]) @ fs.shells[-1]["T_wc"]
        Tr_gt = np.linalg.inv(seq.poses_wc[i-1]) @ seq.poses_wc[i]
        dT = np.linalg.inv(Tr_gt) @ Tr_est
        ang = np.degrees(np.arccos(np.clip((np.trace(dT[:3,:3])-1)/2, -1, 1)))
        m = fs.pt_valid
        # yaw component of the error specifically
        print(f"f{i:3d}: rel rot {ang:7.4f} deg  trans {np.linalg.norm(dT[:3,3])*100:6.2f} cm "
              f"act {m.sum():4d} res/pt {fs.res_active[m].sum(1).mean():4.2f} "
              f"rmse {fs.last_coarse_rmse[0]:5.2f}", flush=True)
