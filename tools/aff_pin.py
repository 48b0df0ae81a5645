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
    # pin affine states to zero everywhere (reference photometric mode 2)
    fs.aff[:] = 0
    fs.track_ref_aff[:] = 0
    for sh in fs.shells[-2:]:
        sh["aff"][:] = 0
    if fs.is_lost:
        print("LOST", i); break
    if i % 20 == 0 and i:
        est = fs.get_trajectory(); gt = seq.poses_wc[:len(est)]
        m = fs.pt_valid
        print(f"f{i:3d}: ate {ate_rmse(est, gt):7.3f} "
              f"res/pt {fs.res_active[m].sum(1).mean():4.2f} "
              f"feth {fs.fe_th[fs.order[-1]]:8.1f}", flush=True)
