"""Pipelined frame mode (VERDICT r2 missing #2) + tracking sanity vetoes.

The pipelined driver (`Settings.pipelined_frames`) is the TPU analog of the
reference's tracking/mapping thread overlap (FullSystem.cpp:902-1012): frame
N's track program stays in flight across the add() boundary, frame N+1's
host staging overlaps it, and N's readback + keyframe pipeline run at the
start of N+1. The deferral point is staging->tracking, so the trajectory
must be IDENTICAL to sequential mode — these tests pin that equivalence and
the drain/flush bookkeeping.
"""

import numpy as np
import pytest

from sdv_loam_tpu.config import Settings
from sdv_loam_tpu.data.synthetic import make_sequence
from sdv_loam_tpu.eval.ate import ate_rmse
from sdv_loam_tpu.system.full_system import FullSystem


@pytest.fixture(scope="module")
def scene():
    n = 16
    return n, make_sequence(n_frames=n, w=320, h=96, step=0.8,
                            yaw_rate=0.01, lidar_stride=2)


def _run(scene, **kw):
    n, seq = scene
    s = Settings(desired_immature_density=600, desired_point_density=800,
                 n_active_cap=2048, n_immature_cap=2048, **kw)
    fs = FullSystem(seq.calib, seq.sensor, s)
    for i in range(n):
        img, cloud, ts = seq.get(i)
        fs.add_active_frame(img, cloud, ts)
    fs.flush()
    return fs


def test_pipelined_matches_sequential(scene):
    n, seq = scene
    fs_seq = _run(scene)
    # deferred_kf_readback changes the track staging numerics (device f32
    # pose math) — bit-identity holds only with it off
    fs_pipe = _run(scene, pipelined_frames=True, deferred_kf_readback=False)
    assert not fs_seq.is_lost and not fs_pipe.is_lost
    a = fs_seq.get_trajectory()
    b = fs_pipe.get_trajectory()
    assert a.shape == b.shape == (n, 4, 4)
    # same device programs in the same order on the same inputs -> the
    # trajectories agree to float noise (the mode changes WHEN readbacks
    # happen, not what is computed)
    np.testing.assert_allclose(b, a, atol=1e-5)
    assert len(fs_pipe.kf_shells) == len(fs_seq.kf_shells)


def test_deferred_kf_readback_quality(scene):
    """Deferred kf_opt readback (the production pipelined mode): the
    host never blocks on the BA program; window mirrors/veto lag one
    frame and the next frame tracks against the device-chained post-BA
    state. Trajectory is NOT bit-identical to sequential mode (f32
    device pose staging), but must match ground truth equivalently."""
    n, seq = scene
    fs_seq = _run(scene)
    fs_def = _run(scene, pipelined_frames=True, deferred_kf_readback=True)
    assert not fs_def.is_lost
    gt = seq.poses_wc[:n]
    ate_seq = ate_rmse(fs_seq.get_trajectory(), gt)
    ate_def = ate_rmse(fs_def.get_trajectory(), gt)
    assert ate_def < max(2.0 * ate_seq, 0.02)
    assert len(fs_def.kf_shells) == len(fs_seq.kf_shells)


def test_pipelined_flush_idempotent(scene):
    fs = _run(scene, pipelined_frames=True)
    t1 = fs.get_trajectory()
    fs.flush()
    fs.flush()
    np.testing.assert_array_equal(fs.get_trajectory(), t1)
    assert fs._pending is None


def test_track_step_veto_fires_and_recovers(scene):
    """With an absurdly tight step bound every frame takes the
    constant-velocity fallback; the run must complete (no crash, no LOST)
    and the veto counter must account for the vetoed frames."""
    n, seq = scene
    fs = _run(scene, track_step_veto_m=1e-4, track_step_veto_x=1e-6)
    assert not fs.is_lost
    assert fs.telemetry.counters["track_step_veto"] > 0
    assert len(fs.get_trajectory()) == n


def test_track_step_veto_silent_on_healthy_run(scene):
    """Default thresholds must never fire on a healthy sequence."""
    fs = _run(scene)
    assert fs.telemetry.counters["track_step_veto"] == 0
    # accuracy unchanged by the veto machinery being armed
    n, seq = scene
    a = ate_rmse(fs.get_trajectory(), seq.poses_wc[:n])
    assert a < 0.30, a
