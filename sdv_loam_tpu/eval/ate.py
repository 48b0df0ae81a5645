"""Trajectory evaluation: ATE (absolute trajectory error) and RPE.

The reference validates end-to-end by writing KITTI poses and evaluating
externally (SURVEY.md §4); this module provides the evaluator in-tree so the
synthetic-scene end-to-end tests and the benchmark can check accuracy
directly. Umeyama SE(3)/Sim(3) alignment + RMSE of translation, plus
KITTI-style relative pose error over fixed-length segments.
"""

from __future__ import annotations

import numpy as np


def umeyama(src: np.ndarray, dst: np.ndarray, with_scale: bool = False):
    """Least-squares similarity transform aligning src -> dst ((N,3) each).

    Returns (s, R, t) with dst ≈ s R src + t.
    """
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / src.shape[0]
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var_s = (xs ** 2).sum() / src.shape[0]
        s = float(np.trace(np.diag(D) @ S) / var_s)
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def ate_rmse(est_poses: np.ndarray, gt_poses: np.ndarray,
             align_scale: bool = False) -> float:
    """RMSE of translation after SE(3) (or Sim(3)) alignment.

    est_poses, gt_poses: (N, 4, 4) camToWorld.
    """
    pe = est_poses[:, :3, 3]
    pg = gt_poses[:, :3, 3]
    s, R, t = umeyama(pe, pg, with_scale=align_scale)
    aligned = (s * (R @ pe.T)).T + t
    err = np.linalg.norm(aligned - pg, axis=1)
    return float(np.sqrt((err ** 2).mean()))


def rpe(est_poses: np.ndarray, gt_poses: np.ndarray, delta: int = 1):
    """Relative pose error over frame gaps of `delta`.

    Returns (trans_rmse, rot_rmse_rad)."""
    te, re = [], []
    for i in range(len(est_poses) - delta):
        de = np.linalg.inv(est_poses[i]) @ est_poses[i + delta]
        dg = np.linalg.inv(gt_poses[i]) @ gt_poses[i + delta]
        e = np.linalg.inv(dg) @ de
        te.append(np.linalg.norm(e[:3, 3]))
        c = np.clip((np.trace(e[:3, :3]) - 1) / 2, -1, 1)
        re.append(np.arccos(c))
    return float(np.sqrt(np.mean(np.square(te)))), \
        float(np.sqrt(np.mean(np.square(re))))
