"""Accuracy-under-yaw diagnostic (see ROADMAP.md round-2 findings). Run with
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8."""
import sys; sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import jax; jax.config.update('jax_platforms', 'cpu')
import numpy as np
from sdv_loam_tpu.config import Settings
from sdv_loam_tpu.data.synthetic import make_sequence
from sdv_loam_tpu.system.full_system import FullSystem
from sdv_loam_tpu.eval.ate import ate_rmse

def run(tag, **kw):
    n = kw.pop("n", 40)
    seq = make_sequence(n_frames=n, w=320, h=96, step=0.8, lidar_stride=2, **kw)
    s = Settings(desired_immature_density=600, desired_point_density=800,
                 n_active_cap=2048, n_immature_cap=2048)
    fs = FullSystem(seq.calib, seq.sensor, s)
    for i in range(n):
        img, cloud, ts = seq.get(i)
        fs.add_active_frame(img, cloud, ts)
        if fs.is_lost:
            print(tag, "LOST at", i); return
    est = fs.get_trajectory(); gt = seq.poses_wc[:len(est)]
    dist = np.linalg.norm(np.diff(gt[:, :3, 3], axis=0), axis=1).sum()
    m = fs.pt_valid
    print(f"{tag}: ATE {ate_rmse(est, gt):.3f} ({100*ate_rmse(est,gt)/dist:.2f}%)"
          f" res/pt {fs.res_active[m].sum(1).mean():.2f}", flush=True)

run("A corridor yaw.004     ", yaw_rate=0.004, half_width=10.0)
run("B canyon   yaw.004     ", yaw_rate=0.004, half_width=10.0, follow_path=True)
run("C canyon   yaw.012     ", yaw_rate=0.012, half_width=10.0, follow_path=True)
run("D corridor yaw.012     ", yaw_rate=0.012, half_width=30.0)
