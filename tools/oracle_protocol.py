"""Execute the BASELINE accuracy protocol (BASELINE.md:25-27, VERDICT r4
item 2): run the C++ reference oracle and the TPU pipeline on an IDENTICAL
synthetic KITTI fixture and compare trajectories.

The oracle binary (native/oracle/oracle_main) compiles the reference's
complete pipeline and drives it through its own ROS handler chain
(main.cpp:785-858 lidarCloudHandler -> :537-560 imgHandler -> :468-535
process); its trajectory is written by FullSystem::printResult
(FullSystem.cpp:253-281) as KITTI 3x4 camToWorld rows. The TPU side reads
the SAME on-disk fixture through the production KittiSequence reader.

Reports:
  * ATE(ref, GT) and ATE(tpu, GT)   -- each system against ground truth
  * ATE(tpu, ref)                   -- direct trajectory-vs-trajectory
  * the 1%-of-path-length verdict for each

Usage:
  python tools/oracle_protocol.py [n_frames] [--fixture DIR] [--skip-oracle]

The oracle runs only if its trajectory file is missing or stale; the TPU
run uses whatever jax backend the environment provides (CPU: set
JAX_PLATFORMS=cpu; TPU over axon: leave unset).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def ensure_fixture(root: str, n_frames: int) -> dict:
    meta_path = os.path.join(root, "fixture_meta.json")
    if os.path.exists(meta_path):
        meta = json.load(open(meta_path))
        if meta.get("n_frames", 0) >= n_frames:
            return meta
    from sdv_loam_tpu.data.kitti_fixture import write_kitti_fixture
    from sdv_loam_tpu.data.synthetic import make_sequence
    t0 = time.time()
    seq = make_sequence(n_frames=n_frames, w=1200, h=360, fx=718.856,
                        step=0.7, yaw_rate=0.004, seed=7, lidar_stride=2,
                        half_width=16.0, ground_contrast=0.25,
                        cy_offset=0.0, follow_path=True)
    out = write_kitti_fixture(seq, root)
    out["n_frames"] = n_frames
    json.dump(out, open(meta_path, "w"))
    print(f"[protocol] fixture written in {time.time() - t0:.0f}s -> {root}",
          file=sys.stderr)
    return out


def run_oracle(root: str, n_frames: int) -> str:
    res = os.path.join(root, "oracle_result.txt")
    binp = os.path.join(REPO, "native/oracle/oracle_main")
    if not os.path.exists(binp):
        subprocess.run(["make", "-C", os.path.join(REPO, "native/oracle")],
                       check=True)
    t0 = time.time()
    subprocess.run(
        [binp, os.path.join(root, "calib.txt"),
         os.path.join(root, "sensor.txt"), res,
         os.path.join(root, "sequences/00"), str(n_frames), "0", "1"],
        check=True, timeout=14400)
    print(f"[protocol] oracle ran {n_frames} frames in "
          f"{time.time() - t0:.0f}s", file=sys.stderr)
    return res


def run_tpu(root: str, n_frames: int) -> np.ndarray:
    from sdv_loam_tpu.config import Settings
    from sdv_loam_tpu.data.kitti import KittiSequence
    from sdv_loam_tpu.system.full_system import FullSystem
    reader = KittiSequence.open(os.path.join(root, "sequences/00"),
                                os.path.join(root, "calib.txt"),
                                os.path.join(root, "sensor.txt"))
    fs = FullSystem(reader.calib, reader.sensor, Settings())
    t0 = time.time()
    for i in range(min(n_frames, len(reader))):
        fs.add_active_frame(*reader.get(i))
    fs.flush()
    print(f"[protocol] tpu pipeline ran {n_frames} frames in "
          f"{time.time() - t0:.0f}s", file=sys.stderr)
    return np.asarray(fs.get_trajectory())


def load_traj(path: str) -> np.ndarray:
    rows = np.loadtxt(path).reshape(-1, 3, 4)
    T = np.tile(np.eye(4), (rows.shape[0], 1, 1))
    T[:, :3, :] = rows
    return T


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_frames = int(args[0]) if args else 60
    fixture = "/tmp/oracle_fixture"
    if "--fixture" in sys.argv:
        fixture = sys.argv[sys.argv.index("--fixture") + 1]
    ensure_fixture(fixture, n_frames)

    gt = load_traj(os.path.join(fixture, "poses.txt"))[:n_frames]
    res_path = os.path.join(fixture, "oracle_result.txt")
    if "--skip-oracle" not in sys.argv or not os.path.exists(res_path):
        run_oracle(fixture, n_frames)
    ref = load_traj(res_path)

    est = run_tpu(fixture, n_frames)

    from sdv_loam_tpu.eval.ate import ate_rmse
    n = min(len(ref), len(est), len(gt))
    path_len = float(np.linalg.norm(
        np.diff(gt[:n, :3, 3], axis=0), axis=1).sum())
    ate_ref = float(ate_rmse(ref[:n], gt[:n]))
    ate_tpu = float(ate_rmse(est[:n], gt[:n]))
    ate_rel = float(ate_rmse(est[:n], ref[:n]))
    out = {
        "n_frames": n, "path_len_m": round(path_len, 2),
        "ate_ref_vs_gt_m": round(ate_ref, 4),
        "ate_tpu_vs_gt_m": round(ate_tpu, 4),
        "ate_tpu_vs_ref_m": round(ate_rel, 4),
        "ate_ref_pct_of_path": round(100 * ate_ref / path_len, 3),
        "ate_tpu_pct_of_path": round(100 * ate_tpu / path_len, 3),
        "ate_tpu_vs_ref_pct_of_path": round(100 * ate_rel / path_len, 3),
        "within_1pct_of_reference": bool(ate_rel / path_len <= 0.01),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
