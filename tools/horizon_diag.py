"""Long-horizon runaway-drift diagnostic (ROADMAP round-2 findings)."""
import sys, os; sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import jax; jax.config.update('jax_platforms', 'cpu')
import numpy as np
from sdv_loam_tpu.config import Settings
from sdv_loam_tpu.data.synthetic import make_sequence
from sdv_loam_tpu.system.full_system import FullSystem
from sdv_loam_tpu.eval.ate import ate_rmse

zero_hm = os.environ.get("ZERO_HM") == "1"
n = 140
seq = make_sequence(n_frames=n, w=1200, h=360, fx=718.856, step=0.8,
                    yaw_rate=0.0, lidar_stride=2, half_width=14.0)
fs = FullSystem(seq.calib, seq.sensor, Settings())
for i in range(n):
    img, cloud, ts = seq.get(i)
    fs.add_active_frame(img, cloud, ts)
    if zero_hm:
        fs.HM[:] = 0; fs.bM[:] = 0
    if fs.is_lost:
        print("LOST", i); break
    if i % 15 == 0 and i:
        est = fs.get_trajectory(); gt = seq.poses_wc[:len(est)]
        m = fs.pt_valid
        used = np.array(fs.order)
        print(f"f{i:3d}: ate {ate_rmse(est, gt):7.3f} act {m.sum():4d} "
              f"imm {fs.im_valid.sum():4d} res/pt {fs.res_active[m].sum(1).mean():4.2f} "
              f"feth[new] {fs.fe_th[used[-1]]:9.1f} |HM| {np.abs(fs.HM).max():9.2e} "
              f"aff_a[new] {fs.aff[used[-1],0]:6.3f} "
              f"kf {len(fs.kf_shells):3d}", flush=True)
