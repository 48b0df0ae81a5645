"""Accuracy-under-yaw diagnostic (see ROADMAP.md round-2 findings). Run with
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8."""
import sys; sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import jax; jax.config.update('jax_platforms', 'cpu')
import numpy as np
from sdv_loam_tpu.config import Settings
from sdv_loam_tpu.data.synthetic import make_sequence
from sdv_loam_tpu.system.full_system import FullSystem

def ang(dT):
    return np.degrees(np.arccos(np.clip((np.trace(dT[:3,:3])-1)/2, -1, 1)))

yaw = 0.02
n = 46
# small noise so the const-motion hypothesis is NOT exact GT
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
    if i >= 2:
        sh1, sh0 = fs.shells[-1], fs.shells[-2]
        gt_rel = np.linalg.inv(seq.poses_wc[i-1]) @ seq.poses_wc[i]
        # tracked (pre-BA) relative, using tracked poses on both ends
        tr1 = sh1.get("T_wc_tracked", sh1["T_wc"])
        tr0 = sh0.get("T_wc_tracked", sh0["T_wc"])
        rel_trk = np.linalg.inv(tr0) @ tr1
        rel_ba = np.linalg.inv(sh0["T_wc"]) @ sh1["T_wc"]
        # ABSOLUTE yaw error of the newest pose (est vs gt heading)
        dabs = np.linalg.inv(seq.poses_wc[i]) @ sh1["T_wc"]
        print(f"f{i:3d}: trkRel {ang(np.linalg.inv(gt_rel) @ rel_trk):7.4f} "
              f"baRel {ang(np.linalg.inv(gt_rel) @ rel_ba):7.4f} "
              f"absRot {ang(dabs):7.3f} kf {int(sh1['is_kf'])}", flush=True)
