"""Monocular initializer tests (ops/mono_init.py; the ops/knn consumer).

Reference: src/FullSystem/CoarseInitializer.cpp:50-230 (trackFrame),
687-764 (setFirst), 998-1075 (makeNN).
"""

import numpy as np
import pytest

from sdv_loam_tpu.data.synthetic import make_sequence
from sdv_loam_tpu.ops.mono_init import MonoInitializer
from sdv_loam_tpu.ops.pyramid import make_images


def _pyr(img, levels):
    dI, ag = make_images(np.asarray(img, np.float32), levels)
    return dI, ag


def test_mono_init_snaps_and_recovers_direction():
    """Camera-only bootstrap on the synthetic forward scene: must snap
    once parallax accumulates and recover the translation DIRECTION (the
    monocular gauge leaves scale free, rescale():526-531)."""
    n = 12
    seq = make_sequence(n_frames=n, w=320, h=96, step=0.4, lidar_stride=8)
    ini = MonoInitializer(seq.calib)
    img0, _, _ = seq.get(0)
    dI, ag = _pyr(img0, seq.calib.levels)
    ini.set_first(dI, ag)
    n_sel = [int((p["valid"] & p["is_good"]).sum()) for p in ini.pts]
    assert n_sel[0] >= 100, n_sel

    ready = False
    for i in range(1, n):
        img, _, _ = seq.get(i)
        dI, ag = _pyr(img, seq.calib.levels)
        ready = ini.track_frame(dI)
        if i >= 2:
            assert ini.snapped, f"not snapped by frame {i}"
        if ready:
            break
    assert ready, "initializer never became ready"

    # direction of first->current motion vs GT, up to monocular scale
    T_cw_0 = np.linalg.inv(seq.poses_wc[0])
    T_cw_i = np.linalg.inv(seq.poses_wc[i])
    gt_rel = T_cw_i @ seq.poses_wc[0]          # ref -> new
    est_t = ini.T[:3, 3]
    gt_t = gt_rel[:3, 3]
    cos = float(np.dot(est_t, gt_t)
                / max(np.linalg.norm(est_t) * np.linalg.norm(gt_t), 1e-12))
    assert cos > 0.95, (est_t, gt_t, cos)
    # rotation error small (rotation IS observable monocularly)
    dR = ini.T[:3, :3].T @ gt_rel[:3, :3]
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 2.0, ang

    # gauge-fixed points for the first keyframe
    u, v, idep, scale = ini.level0_points()
    assert len(u) >= 100 and scale > 0
    assert np.isfinite(idep).all() and (idep > 0).all()


def test_full_system_camera_only():
    """FullSystem end-to-end WITHOUT LiDAR: mono bootstrap (cloud=None on
    every frame) must initialize the window from ops/mono_init and keep
    tracking — the camera-only capability extension (module docstring).
    Monocular scale is unobservable: gate the SCALE-ALIGNED trajectory."""
    from sdv_loam_tpu.config import Settings
    from sdv_loam_tpu.system.full_system import FullSystem

    n = 16
    seq = make_sequence(n_frames=n, w=320, h=96, step=0.4, lidar_stride=8)
    # struct pose needs LiDAR sensor points — off in camera-only sessions
    fs = FullSystem(seq.calib, seq.sensor,
                    Settings(use_struct_pose=False, pipelined_frames=False))
    for i in range(n):
        img, _, ts = seq.get(i)
        fs.add_active_frame(img, None, ts)
    assert not fs.is_lost
    assert fs.initialized
    assert len(fs.kf_shells) >= 2
    assert not fs.pt["is_sensor"][fs.pt_valid].any()

    est = fs.get_trajectory()
    gt = seq.poses_wc[:len(est)]
    # compare from the bootstrap-ready frame on (pre-init shells hold
    # identity), with one global scale fitted (monocular gauge)
    k = fs.kf_shells[1]
    e = est[k:, :3, 3] - est[k, :3, 3]
    g = gt[k:, :3, 3] - gt[k, :3, 3]
    s = float((e * g).sum() / max((e * e).sum(), 1e-12))
    assert s > 0, s
    path = np.linalg.norm(np.diff(g, axis=0), axis=1).sum()
    err = np.linalg.norm(s * e - g, axis=1).max()
    assert err < 0.15 * path, (err, path, s)


def test_mono_init_idepth_structure():
    """After convergence the recovered inverse depths must correlate with
    ground truth up to one global scale (structure, not just pose)."""
    n = 10
    seq = make_sequence(n_frames=n, w=320, h=96, step=0.4, lidar_stride=8)
    ini = MonoInitializer(seq.calib)
    img0, _, _ = seq.get(0)
    dI, ag = _pyr(img0, seq.calib.levels)
    ini.set_first(dI, ag)
    for i in range(1, n):
        img, _, _ = seq.get(i)
        dI, ag = _pyr(img, seq.calib.levels)
        if ini.track_frame(dI):
            break

    u, v, idep, _ = ini.level0_points()
    dmap = seq.get_depth(0)
    gt_depth = dmap[np.clip(v.astype(int), 0, dmap.shape[0] - 1),
                    np.clip(u.astype(int), 0, dmap.shape[1] - 1)]
    ok = np.isfinite(gt_depth) & (gt_depth > 0)
    assert ok.sum() >= 50
    corr = np.corrcoef(idep[ok], 1.0 / gt_depth[ok])[0, 1]
    assert corr > 0.7, corr
