"""Long-horizon runaway-drift diagnostic (ROADMAP round-2 findings)."""
import sys, os; sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import jax; jax.config.update('jax_platforms', 'cpu')
import numpy as np
from sdv_loam_tpu.config import Settings
from sdv_loam_tpu.data.synthetic import make_sequence
from sdv_loam_tpu.system.full_system import FullSystem
from sdv_loam_tpu.eval.ate import ate_rmse

n = 140
seq = make_sequence(n_frames=n, w=1200, h=360, fx=718.856, step=0.8,
                    yaw_rate=0.0, lidar_stride=2, half_width=14.0)
fs = FullSystem(seq.calib, seq.sensor, Settings())
for i in range(n):
    img, cloud, ts = seq.get(i)
    fs.add_active_frame(img, cloud, ts)
    if fs.is_lost:
        print("LOST", i); break
    if i % 20 == 0 and i:
        est = fs.get_trajectory(); gt = seq.poses_wc[:len(est)]
        m = fs.pt_valid
        sens = fs.pt["is_sensor"][m]
        z = 1.0 / np.maximum(fs.pt["idepth"][m], 1e-9)
        # residuals on sensor vs mono points
        rs = fs.res_active[m & fs.pt["is_sensor"]].sum()
        rm = fs.res_active[m & ~fs.pt["is_sensor"]].sum()
        print(f"f{i:3d}: ate {ate_rmse(est, gt):7.3f} act {m.sum():4d} "
              f"sensor% {100*sens.mean():4.1f} res(sens/mono) {rs}/{rm} "
              f"z med {np.median(z):6.1f} p90 {np.percentile(z, 90):7.1f}",
              flush=True)
        # depth error of sensor points vs GT would need scene raycast; skip
