"""Tune bench-scene parameters to KITTI flow statistics (VERDICT r4 item 4).

Computes, host-side from ground truth (no pipeline run), the RMS optical
flow of projected LiDAR points between consecutive frames — the quantity
the reference's keyframe formula thresholds (FullSystem.cpp:869-891):

    wsum = (w_t * RMS(flow_t) + w_rt * RMS(flow_rt)) / (w + h),  KF if > 1

Real KITTI runs at ~15-25 px RMS flow and 20-40% keyframe rate; the round-4
bench scene measured 47 px / 60% (VERDICT r4 "what's weak" #3). Usage:

    python tools/scene_flow_tune.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sdv_loam_tpu.data.synthetic import make_sequence  # noqa: E402


def rms_flows(seq, i, walls_only=False):
    """(RMS flow_t, RMS flow_rt) in px between frames i and i+1.

    `walls_only` drops ground returns (LiDAR z within 0.5 m of the road
    plane) — the flow statistic when selection concentrates on building
    fronts (low-contrast asphalt)."""
    cl = seq.get_cloud(i)
    if walls_only:
        cl = cl[cl[:, 2] > -1.0]   # LiDAR z up; sensor ~1.7 m above road
    T_cl = seq.sensor.T_cam_lidar
    pc = cl @ T_cl[:3, :3].T + T_cl[:3, 3]
    c = seq.calib
    fx, fy, cx, cy = c.fx[0], c.fy[0], c.cx[0], c.cy[0]
    ok = pc[:, 2] > 0.5
    pc = pc[ok]
    u0 = fx * pc[:, 0] / pc[:, 2] + cx
    v0 = fy * pc[:, 1] / pc[:, 2] + cy
    inb = (u0 >= 0) & (u0 < c.w[0]) & (v0 >= 0) & (v0 < c.h[0])
    pc, u0, v0 = pc[inb], u0[inb], v0[inb]
    T0, T1 = seq.poses_wc[i], seq.poses_wc[i + 1]
    pw = pc @ T0[:3, :3].T + T0[:3, 3]

    def proj(T, rot_from=None):
        R = (rot_from if rot_from is not None else T)[:3, :3]
        p1 = (pw - T[:3, 3]) @ R   # R^T (pw - t)
        z = np.maximum(p1[:, 2], 0.3)
        return fx * p1[:, 0] / z + cx, fy * p1[:, 1] / z + cy

    u_rt, v_rt = proj(T1)
    u_t, v_t = proj(T1, rot_from=T0)  # translation only (reference flow[0])
    f_rt = np.sqrt(np.mean((u_rt - u0) ** 2 + (v_rt - v0) ** 2))
    f_t = np.sqrt(np.mean((u_t - u0) ** 2 + (v_t - v0) ** 2))
    return f_t, f_rt


def wsum(f_t, f_rt, w, h):
    return (0.04 * 1120 * f_t + 0.02 * 1120 * f_rt) / (w + h)


if __name__ == "__main__":
    n = 16
    for w, h, fx, fy in ((1200, 360, 718.856, None), (424, 320, 245.6, 611.8)):
        for half_width in (16.0, 24.0):
            for step in (0.7, 0.8, 1.0):
                seq = make_sequence(n_frames=n, w=w, h=h, fx=fx, fy=fy,
                                    step=step, cy_offset=0.0,
                                    yaw_rate=0.004, seed=7, lidar_stride=2,
                                    half_width=half_width)
                ft, frt = np.mean([rms_flows(seq, i)
                                   for i in range(4, n - 1)], axis=0)
                fwt, fwrt = np.mean([rms_flows(seq, i, walls_only=True)
                                     for i in range(4, n - 1)], axis=0)
                print(f"w={w} half_width={half_width:5.1f} step={step:.1f}: "
                      f"all {ft:5.1f}px wsum {wsum(ft, frt, w, h):.2f} | "
                      f"walls {fwt:5.1f}px wsum {wsum(fwt, fwrt, w, h):.2f}")
