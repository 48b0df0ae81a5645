"""Benchmark: full-odometry frames/sec per chip at KITTI resolution.

Runs the complete pipeline (LiDAR preprocess, pyramid, tracking ladder,
struct pose, keyframe BA, marginalization) on procedurally generated
KITTI-like sequences (1200x360, ~1 m/frame @10 Hz, Velodyne-64 scan pattern)
— no dataset is available in this environment, and the synthetic scene gives
exact ground truth for a simultaneous accuracy check.

Two phases:
  1. single-sequence run (also serves as compile warmup);
  2. B-sequence lockstep run (system.multi.MultiSystem) — the chip's
     throughput axis: B independent odometries share every host sync, so
     aggregate frames/s is the per-chip capacity figure (reference analog:
     one process per sequence on one CPU, SURVEY.md §2.6).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline relative to the 100 fps/chip target (BASELINE.md); the
single-sequence rate and accuracy live in "extra".

Env knobs: SDV_BENCH_B (default 8), SDV_BENCH_FRAMES (default 40),
SDV_BENCH_SINGLE=1 to skip the multi phase.
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
    from sdv_loam_tpu.eval.ate import ate_rmse, drift_decomposition
    from sdv_loam_tpu.system.full_system import FullSystem
    from sdv_loam_tpu.system.multi import MultiSystem

    B = int(os.environ.get("SDV_BENCH_B", "8"))
    n_frames = int(os.environ.get("SDV_BENCH_FRAMES", "40"))
    warmup_frames = 12
    t_gen = time.perf_counter()
    # two distinct scenes/trajectories; B systems alternate between them
    # (rendering is host-side raycasting — the expensive part of setup)
    seq_specs = [dict(yaw_rate=0.004, seed=7), dict(yaw_rate=-0.009, seed=13)]
    seqs, frame_sets = [], []
    for spec in seq_specs:
        seq = make_sequence(n_frames=n_frames, w=1200, h=360, fx=718.856,
                            step=1.0, lidar_stride=2, half_width=16.0, **spec)
        seqs.append(seq)
        frame_sets.append([seq.get(i) for i in range(n_frames)])
    print(f"[bench] generated {len(seqs)}x{n_frames} frames in "
          f"{time.perf_counter() - t_gen:.1f}s", file=sys.stderr)

    # ---------------- phase 1: single sequence (and compile warmup) --------
    # Pipelined frames (default ON; SDV_BENCH_PIPELINED=0 for sequential):
    # overlap host staging with device tracking. Trajectory identical to
    # sequential mode (tests/test_pipelined.py); this is the production
    # mode — the reference likewise benchmarks with its tracking/mapping
    # thread overlap, not linearizeOperation (FullSystem.cpp:902-1012).
    s = Settings(pipelined_frames=os.environ.get(
        "SDV_BENCH_PIPELINED", "1") != "0")
    fs = FullSystem(seqs[0].calib, seqs[0].sensor, s)
    for i in range(warmup_frames):
        t1 = time.perf_counter()
        img, cloud, ts = frame_sets[0][i]
        fs.add_active_frame(img, cloud, ts)
        print(f"[bench] warmup frame {i}: {time.perf_counter() - t1:.1f}s",
              file=sys.stderr)
    from sdv_loam_tpu.io.telemetry import Telemetry
    fs.telemetry = Telemetry()  # steady-state stage stats only (no compiles)
    t0 = time.perf_counter()
    for i in range(warmup_frames, n_frames):
        img, cloud, ts = frame_sets[0][i]
        fs.add_active_frame(img, cloud, ts)
    fs.flush()   # pipelined mode: count the last in-flight frame
    dt_single = time.perf_counter() - t0
    n_timed = n_frames - warmup_frames
    fps_single = n_timed / dt_single
    est = fs.get_trajectory()
    ate = ate_rmse(est, seqs[0].poses_wc[:len(est)])
    drift = drift_decomposition(est, seqs[0].poses_wc[:len(est)])
    n_kf, lost = len(fs.kf_shells), bool(fs.is_lost)
    print(f"[bench] single-seq: {fps_single:.2f} f/s, ATE {ate:.4f} m",
          file=sys.stderr)
    print(f"[bench] drift: {drift}", file=sys.stderr)
    # per-stage host-vs-sync split: where the frame time goes (VERDICT item 7)
    print("[bench] stage table (single-seq):\n" + fs.telemetry.stage_table(),
          file=sys.stderr)
    if fs.track_iters_hist:
        hist = np.stack(fs.track_iters_hist[warmup_frames:])
        print(f"[bench] track LM iters/level mean={hist.mean(0).round(1)} "
              f"max={hist.max(0)}", file=sys.stderr)
    ovf = dict(fs.telemetry.counters)
    del fs  # free device buffers before the fleet run

    kf_rate = n_kf / max(len(est), 1)
    print(f"[bench] kf_rate {kf_rate:.2f}, matcher overflow {ovf}",
          file=sys.stderr)
    if any(v for k, v in ovf.items() if k.startswith("match_overflow")):
        print("[bench] WARNING: matcher lane-cap overflow — residual graph "
              "silently truncated (see models/matcher.py)", file=sys.stderr)
    extra = {"ate_m": round(float(ate), 4), "n_frames": n_timed,
             "n_keyframes": n_kf, "lost": lost, "kf_rate": round(kf_rate, 3),
             "match_overflow": sum(
                 v for k, v in ovf.items() if k.startswith("match_overflow")),
             "fps_single_seq": round(fps_single, 3)}

    if os.environ.get("SDV_BENCH_SINGLE"):
        fps = fps_single
        metric = "synthetic_kitti_frames_per_sec_per_chip"
    else:
        # ------------- phase 2: B-sequence lockstep aggregate --------------
        ms = MultiSystem([FullSystem(seqs[b % len(seqs)].calib,
                                     seqs[b % len(seqs)].sensor, Settings())
                          for b in range(B)])
        for i in range(warmup_frames):  # fleet warmup (syncs, no compiles)
            t1 = time.perf_counter()
            ms.add_frames([frame_sets[b % len(seqs)][i] for b in range(B)])
            print(f"[bench] fleet warmup frame {i}: "
                  f"{time.perf_counter() - t1:.2f}s", file=sys.stderr)
        t0 = time.perf_counter()
        for i in range(warmup_frames, n_frames):
            ms.add_frames([frame_sets[b % len(seqs)][i] for b in range(B)])
        dt_multi = time.perf_counter() - t0
        fps = B * n_timed / dt_multi
        metric = "synthetic_kitti_aggregate_frames_per_sec_per_chip"
        ates = [float(ate_rmse(f.get_trajectory(),
                               seqs[b % len(seqs)].poses_wc))
                for b, f in enumerate(ms.systems)]
        extra.update({
            "B": B, "ate_m_fleet_max": round(max(ates), 4),
            "lost_fleet": sum(f.is_lost for f in ms.systems),
            "fps_per_seq_in_fleet": round(fps / B, 3),
            "scaling_efficiency": round(fps / (B * fps_single), 3),
        })

    print(json.dumps({
        "metric": metric,
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 100.0, 4),
        "extra": extra,
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
