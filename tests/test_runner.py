"""Runner / telemetry / observer tests."""

import json

import numpy as np

from sdv_loam_tpu.config import Settings
from sdv_loam_tpu.data.synthetic import make_sequence
from sdv_loam_tpu.io.observer import JsonlRecorder
from sdv_loam_tpu.system.runner import run_sequence


def test_run_sequence_with_observers(tmp_path):
    seq = make_sequence(n_frames=6, w=256, h=96, step=0.8, lidar_stride=4)
    s = Settings(desired_immature_density=400, desired_point_density=500,
                 n_active_cap=1024, n_immature_cap=1024)
    rec_path = tmp_path / "events.jsonl"
    traj_path = tmp_path / "traj.txt"
    log_path = tmp_path / "log.jsonl"
    rec = JsonlRecorder(str(rec_path))
    fs, summary = run_sequence(seq, s, observers=[rec],
                               result_path=str(traj_path),
                               log_path=str(log_path))
    assert summary["frames"] == 6
    assert summary["keyframes"] >= 2
    assert summary["fps"] > 0
    assert "track" in summary["stages_ms"]
    # trajectory file: 6 rows of 12 floats
    rows = np.loadtxt(str(traj_path))
    assert rows.shape == (6, 12)
    # observer events recorded
    events = [json.loads(l) for l in open(rec_path)]
    kinds = {e["event"] for e in events}
    assert "cam_pose" in kinds and "keyframes" in kinds
    # telemetry log has keyframe lines
    logs = [json.loads(l) for l in open(log_path)]
    assert any(e["kind"] == "keyframe" for e in logs)


def test_cli_synthetic(tmp_path, monkeypatch):
    """The CLI entry point runs a synthetic mini-sequence end to end."""
    import sdv_loam_tpu.run as runmod
    import sdv_loam_tpu.data.synthetic as syn

    orig = syn.make_sequence

    def tiny_sequence(**kw):
        return orig(n_frames=5, w=256, h=96, lidar_stride=4)
    monkeypatch.setattr(syn, "make_sequence", tiny_sequence)
    out = tmp_path / "traj.txt"
    rc = runmod.main(["--synthetic", "5", "--result", str(out),
                      "--preset", "2"])
    assert rc == 0
    rows = np.loadtxt(str(out))
    assert rows.shape == (5, 12)


def test_full_reset_on_init_failure():
    """First frame without LiDAR points -> init_failed -> full reset ->
    system recovers on subsequent frames (main.cpp:510-528 semantics)."""
    from sdv_loam_tpu.system.runner import run_sequence
    seq = make_sequence(n_frames=6, w=256, h=96, step=0.8, lidar_stride=4)

    class Broken:
        calib = seq.calib
        sensor = seq.sensor

        def __len__(self):
            return 6

        def get(self, i):
            img, cloud, ts = seq.get(i)
            if i == 0:  # empty scan kills initialization
                cloud = np.zeros((10, 3), np.float32)
            return img, cloud, ts

    s = Settings(desired_immature_density=400, desired_point_density=500,
                 n_active_cap=1024, n_immature_cap=1024)
    fs, summary = run_sequence(Broken(), s)
    # reset happened (frames 1.. form a fresh system) and tracking recovered
    assert not fs.is_lost
    assert not fs.init_failed
    assert len(fs.kf_shells) >= 2
