"""Benchmark: full-odometry frames/sec per chip at KITTI resolution.

Runs the complete pipeline (LiDAR preprocess, pyramid, tracking ladder,
struct pose, keyframe BA, marginalization) on a procedurally generated
KITTI-like sequence (1200x360, ~1 m/frame @10 Hz, Velodyne-64 scan pattern)
— no dataset is available in this environment, and the synthetic scene gives
exact ground truth for a simultaneous accuracy check.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline relative to the 100 fps/chip target (BASELINE.md).
"""

import json
import os
import sys
import time

import numpy as np


def _setup_cache():
    """Persistent XLA compilation cache: first bench run pays the ~20-40s
    per-kernel remote compiles, later runs start hot."""
    import jax
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/root/.cache/jax_comp_cache")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception as e:  # cache is an optimization only
        print(f"compilation cache unavailable: {e}", file=sys.stderr)


def main():
    _setup_cache()
    from sdv_loam_tpu.config import Settings
    from sdv_loam_tpu.data.synthetic import make_sequence
    from sdv_loam_tpu.eval.ate import ate_rmse
    from sdv_loam_tpu.system.full_system import FullSystem

    n_frames = 40
    warmup_frames = 12
    t_gen = time.perf_counter()
    seq = make_sequence(n_frames=n_frames, w=1200, h=360, fx=718.856,
                        step=1.0, yaw_rate=0.004, lidar_stride=2,
                        half_width=16.0)
    frames = [seq.get(i) for i in range(n_frames)]  # pre-render (host-side)
    print(f"[bench] generated {n_frames} frames in "
          f"{time.perf_counter() - t_gen:.1f}s", file=sys.stderr)

    s = Settings()
    fs = FullSystem(seq.calib, seq.sensor, s)

    # warmup: triggers all jit compilations (init, tracking, KF pipeline)
    for i in range(warmup_frames):
        t1 = time.perf_counter()
        img, cloud, ts = frames[i]
        fs.add_active_frame(img, cloud, ts)
        print(f"[bench] warmup frame {i}: {time.perf_counter() - t1:.1f}s",
              file=sys.stderr)

    t0 = time.perf_counter()
    for i in range(warmup_frames, n_frames):
        img, cloud, ts = frames[i]
        fs.add_active_frame(img, cloud, ts)
    dt = time.perf_counter() - t0
    n_timed = n_frames - warmup_frames
    fps = n_timed / dt

    est = fs.get_trajectory()
    ate = ate_rmse(est, seq.poses_wc[:len(est)])

    print(json.dumps({
        "metric": "synthetic_kitti_frames_per_sec_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 100.0, 4),
        "extra": {"ate_m": round(float(ate), 4), "n_frames": n_timed,
                  "n_keyframes": len(fs.kf_shells), "lost": bool(fs.is_lost)},
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # always emit the one JSON line the driver reads
        import traceback
        traceback.print_exc(file=sys.stderr)
        print(json.dumps({
            "metric": "synthetic_kitti_frames_per_sec_per_chip",
            "value": 0.0, "unit": "frames/s", "vs_baseline": 0.0,
            "extra": {"error": str(e)[:200]},
        }))
