"""End-to-end odometry test: full pipeline on the synthetic sequence.

The synthetic scene provides exact ground truth, so this is the equivalent of
the reference's KITTI trajectory replay validation (SURVEY.md §4.1) with a
known answer.
"""

import numpy as np
import pytest

from sdv_loam_tpu.config import Settings
from sdv_loam_tpu.data.synthetic import make_sequence
from sdv_loam_tpu.eval.ate import ate_rmse, rpe
from sdv_loam_tpu.system.full_system import FullSystem


@pytest.fixture(scope="module")
def run_result():
    n_frames = 12
    seq = make_sequence(n_frames=n_frames, w=320, h=96, step=0.8,
                        yaw_rate=0.01, lidar_stride=2)
    # ba_resf_at_fej=False: these fixtures' accuracy bounds are calibrated
    # on the consistent-GN optimizer, which actively cleans tracker noise on
    # this deliberately weak 320x96 geometry. The reference-exact
    # FEJ-anchored default is covered by the KITTI-fixture E2E and the
    # KITTI-scale long-run tests.
    s = Settings(desired_immature_density=600, desired_point_density=800,
                 n_active_cap=2048, n_immature_cap=2048,
                 ba_resf_at_fej=False)
    fs = FullSystem(seq.calib, seq.sensor, s)
    for i in range(n_frames):
        img, cloud, ts = seq.get(i)
        fs.add_active_frame(img, cloud, ts)
    return fs, seq


def test_pipeline_completes(run_result):
    fs, seq = run_result
    assert not fs.is_lost
    assert len(fs.shells) == len(seq)
    assert len(fs.kf_shells) >= 2
    assert fs.pt_valid.sum() > 50


def test_trajectory_accuracy(run_result):
    fs, seq = run_result
    est = fs.get_trajectory()
    gt = seq.poses_wc
    assert np.isfinite(est).all()
    a = ate_rmse(est, gt)
    # ~9.6 m trajectory; ~1% ATE without scale alignment (LiDAR scale).
    # yaw_rate=0.01 is an aggressive-turn scenario whose error varies
    # ±0.03 m with ULP/seed-level perturbations — thresholds sit above that
    # noise band (the tight regression guard is test_window_churn below).
    assert a < 0.12, f"ATE {a}"
    t_rpe, r_rpe = rpe(est, gt)
    assert t_rpe < 0.10, t_rpe
    assert r_rpe < 0.01, r_rpe


def test_kitti_output_roundtrip(run_result, tmp_path):
    from sdv_loam_tpu.io.trajectory import read_kitti, write_kitti
    fs, _ = run_result
    p = tmp_path / "traj.txt"
    write_kitti(str(p), fs.get_trajectory())
    back = read_kitti(str(p))
    np.testing.assert_allclose(back, fs.get_trajectory(), rtol=1e-5, atol=1e-4)


@pytest.fixture(scope="module")
def churn_result():
    """Window-churn run: enough frames that the window overflows repeatedly,
    exercising frame marginalization, HM/bM transport and slot reuse well
    beyond first-window-fill (VERDICT r1 item 10)."""
    n_frames = 28
    seq = make_sequence(n_frames=n_frames, w=320, h=96, step=0.8,
                        yaw_rate=0.004, lidar_stride=2)
    # ba_resf_at_fej=False: these fixtures' accuracy bounds are calibrated
    # on the consistent-GN optimizer, which actively cleans tracker noise on
    # this deliberately weak 320x96 geometry. The reference-exact
    # FEJ-anchored default is covered by the KITTI-fixture E2E and the
    # KITTI-scale long-run tests.
    s = Settings(desired_immature_density=600, desired_point_density=800,
                 n_active_cap=2048, n_immature_cap=2048,
                 ba_resf_at_fej=False)
    fs = FullSystem(seq.calib, seq.sensor, s)
    for i in range(n_frames):
        img, cloud, ts = seq.get(i)
        fs.add_active_frame(img, cloud, ts)
    return fs, seq


def test_window_churn(churn_result):
    fs, seq = churn_result
    assert not fs.is_lost
    n = len(seq)
    est = fs.get_trajectory()
    # several keyframes beyond the window capacity -> marginalization ran
    assert len(fs.kf_shells) >= fs.s.max_frames + 3
    assert len(fs.order) <= fs.s.max_frames + 1
    # HM/bM marginalization prior is populated and finite
    assert np.isfinite(fs.HM).all() and np.isfinite(fs.bM).all()
    assert np.abs(fs.HM).max() > 0
    a = ate_rmse(est, seq.poses_wc[:n])
    dist = np.linalg.norm(np.diff(seq.poses_wc[:n, :3, 3], axis=0),
                          axis=1).sum()
    # The 320x96 / fx=192 test geometry observes forward scale ~4x more
    # weakly than KITTI (radial flow of a forward-step error is r*dt/z —
    # sub-matcher-noise here): ~1% drift is the floor for this image size.
    # KITTI-scale accuracy is asserted by the benchmark (1200x360, fx=718:
    # ~0.15% ATE) and the slow long-run test.
    # Bounds pinned to measured-baseline + ~40-50% margin (recorded so a
    # real regression cannot hide inside a loose bound; ADVICE r2).
    # Measured 2026-08-17 (CPU x64, seed 7, aperiodic oriented texture):
    # ATE 0.148 m (0.0069*dist), t_rpe 0.105, r_rpe 0.0213.
    assert a < 0.010 * dist, f"ATE {a} over {dist} m (baseline 0.148)"
    t_rpe, r_rpe = rpe(est, seq.poses_wc[:n])
    assert t_rpe < 0.15, f"{t_rpe} (baseline 0.105)"
    # rotation RPE at this image size sits at its noise floor and shifts a
    # few thousandths with XLA fusion/retrace reassociation
    assert r_rpe < 0.032, f"{r_rpe} (baseline 0.0213)"
