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

Fleet capacity management (VERDICT r3 item 1): B is picked from measured
per-system device bytes vs the chip's HBM budget (utils/hbm.py), and the
fleet phase runs attempts at B, B/2, ..., 2 so an OOM or crash at a large
B degrades to a smaller completed fleet instead of losing the phase.
Each attempt runs in a SUBPROCESS: a TPU ResourceExhausted poisons the
backend for the rest of the process (measured: after a failed B=8, even
B=2 fails in-process but succeeds in a fresh process), so isolation is the
only way the ladder can actually recover. The final JSON line always
reports the best COMPLETED phase — a fleet failure downgrades to the
single-sequence number instead of 0.0.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline relative to the 100 fps/chip target (BASELINE.md); the
single-sequence rate and accuracy live in "extra".

Env knobs: SDV_BENCH_B (default 8), SDV_BENCH_FRAMES (default 40),
SDV_BENCH_SINGLE=1 to skip the multi phase, SDV_HBM_BYTES to override the
HBM budget.
"""

import json
import os
import sys
import time

import numpy as np

# best completed result so far — the catch-all emits this on a crash
RECORD = {
    "metric": "synthetic_kitti_frames_per_sec_per_chip",
    "value": 0.0, "unit": "frames/s", "vs_baseline": 0.0, "extra": {},
}


def _log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


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
        _log(f"compilation cache unavailable: {e}")


def _run_single(seq, frames, warmup_frames, n_frames):
    """Phase 1: one sequence; returns (fps, extra-dict, per_system_bytes)."""
    from sdv_loam_tpu.config import Settings
    from sdv_loam_tpu.eval.ate import ate_rmse, drift_decomposition
    from sdv_loam_tpu.io.telemetry import Telemetry
    from sdv_loam_tpu.system.full_system import FullSystem
    from sdv_loam_tpu.utils import hbm

    # Pipelined frames (default ON; SDV_BENCH_PIPELINED=0 for sequential):
    # overlap host staging with device tracking. Trajectory identical to
    # sequential mode (tests/test_pipelined.py); this is the production
    # mode — the reference likewise benchmarks with its tracking/mapping
    # thread overlap, not linearizeOperation (FullSystem.cpp:902-1012).
    s = Settings(pipelined_frames=os.environ.get(
        "SDV_BENCH_PIPELINED", "1") != "0")
    fs = FullSystem(seq.calib, seq.sensor, s)
    for i in range(warmup_frames):
        t1 = time.perf_counter()
        img, cloud, ts = frames[i]
        fs.add_active_frame(img, cloud, ts)
        _log(f"warmup frame {i}: {time.perf_counter() - t1:.1f}s")
    fs.telemetry = Telemetry()  # steady-state stage stats only (no compiles)
    t0 = time.perf_counter()
    for i in range(warmup_frames, n_frames):
        img, cloud, ts = frames[i]
        fs.add_active_frame(img, cloud, ts)
    fs.flush()   # pipelined mode: count the last in-flight frame
    dt_single = time.perf_counter() - t0
    n_timed = n_frames - warmup_frames
    fps_single = n_timed / dt_single
    est = fs.get_trajectory()
    ate = ate_rmse(est, seq.poses_wc[:len(est)])
    drift = drift_decomposition(est, seq.poses_wc[:len(est)])
    n_kf, lost = len(fs.kf_shells), bool(fs.is_lost)
    sys_bytes = hbm.system_device_bytes(fs)
    _log(f"single-seq: {fps_single:.2f} f/s, ATE {ate:.4f} m")
    _log(f"drift: {drift}")
    _log("stage table (single-seq):\n" + fs.telemetry.stage_table())
    _log(f"per-system device bytes: {sys_bytes / 1e6:.0f} MB "
         f"(live total {hbm.live_device_bytes() / 1e6:.0f} MB, "
         f"budget {hbm.hbm_budget_bytes() / 1e9:.1f} GB)")
    if fs.track_iters_hist:
        hist = np.stack(fs.track_iters_hist[warmup_frames:])
        _log(f"track LM iters/level mean={hist.mean(0).round(1)} "
             f"max={hist.max(0)}")
    if fs.kf_decision_hist:
        kd = np.array([r[:3] for r in fs.kf_decision_hist[warmup_frames:]])
        _log(f"kf decision: wsum mean {kd[:, 0].mean():.2f} "
             f"(threshold 1.0), RMS flow px t {kd[:, 1].mean():.1f} "
             f"rt {kd[:, 2].mean():.1f} — the reference formula "
             f"(FullSystem.cpp:869-891) at this scene's flow")
    ovf = dict(fs.telemetry.counters)
    del fs  # free device buffers before the fleet run

    kf_rate = n_kf / max(len(est), 1)
    _log(f"kf_rate {kf_rate:.2f}, counters {ovf}")
    if any(v for k, v in ovf.items() if k.startswith("match_overflow")):
        _log("WARNING: matcher lane-cap overflow — residual graph "
             "silently truncated (see models/matcher.py)")
    extra = {"ate_m": round(float(ate), 4), "n_frames": n_timed,
             "n_keyframes": n_kf, "lost": lost, "kf_rate": round(kf_rate, 3),
             "match_overflow": sum(
                 v for k, v in ovf.items() if k.startswith("match_overflow")),
             "fps_single_seq": round(fps_single, 3),
             "system_device_mb": round(sys_bytes / 1e6, 1)}
    return fps_single, extra, sys_bytes


def _run_fleet(B, seqs, frame_sets, warmup_frames, n_frames,
               mode="interleaved"):
    """Phase 2 at a fixed B. Returns (aggregate fps, extra-updates).

    `seqs`: list of (calib, sensor, poses_wc) tuples.

    Two fleet compositions (system/multi.py):
      - "interleaved" (default): B pipelined FullSystems round-robined;
        reuses the single-sequence programs phase 1 already compiled —
        zero extra compiles — and each system's host staging hides behind
        the others' in-flight device programs.
      - "lockstep": the vmapped in-program batching (MultiSystem). After
        the round-4 quad-gather content cuts it measured a net LOSS
        (fleet-max while_loop iterations + lockstep staging), and its
        B=8 batch programs OOM the chip at COLD compile, so it is opt-in
        (SDV_BENCH_LOCKSTEP=1)."""
    from sdv_loam_tpu.config import Settings
    from sdv_loam_tpu.eval.ate import ate_rmse
    from sdv_loam_tpu.system.full_system import FullSystem
    from sdv_loam_tpu.system.multi import InterleavedFleet, MultiSystem
    from sdv_loam_tpu.utils import hbm

    n_timed = n_frames - warmup_frames
    systems = [FullSystem(seqs[b % len(seqs)][0], seqs[b % len(seqs)][1],
                          Settings(pipelined_frames=mode == "interleaved"))
               for b in range(B)]
    if mode == "interleaved":
        ms = InterleavedFleet(systems, workers=int(
            os.environ.get("SDV_BENCH_FLEET_WORKERS", "0")))
    else:
        ms = MultiSystem(systems)
    for i in range(warmup_frames):  # fleet warmup (syncs, no compiles)
        t1 = time.perf_counter()
        ms.add_frames([frame_sets[b % len(seqs)][i] for b in range(B)])
        if i in (0, 1, warmup_frames - 1):
            _log(f"fleet warmup frame {i}: {time.perf_counter() - t1:.2f}s")
    _log(f"fleet live device bytes after warmup: "
         f"{hbm.live_device_bytes() / 1e6:.0f} MB")
    t0 = time.perf_counter()
    for i in range(warmup_frames, n_frames):
        ms.add_frames([frame_sets[b % len(seqs)][i] for b in range(B)])
    for f in ms.systems:
        f.flush()
    dt_multi = time.perf_counter() - t0
    fps = B * n_timed / dt_multi
    ates = [float(ate_rmse(f.get_trajectory(),
                           seqs[b % len(seqs)][2][:len(f.get_trajectory())]))
            for b, f in enumerate(ms.systems)]
    return fps, {
        "B": B, "fleet_mode": mode, "ate_m_fleet_max": round(max(ates), 4),
        "lost_fleet": sum(f.is_lost for f in ms.systems),
        "fps_per_seq_in_fleet": round(fps / B, 3),
    }


def _fleet_child(argv):
    """Subprocess entry: one fleet attempt, one JSON line on stdout.

    Isolation is load-bearing: a TPU ResourceExhausted leaves the backend
    unable to run ANY further program in the same process, so each ladder
    attempt gets a fresh process (parent parses the last stdout line)."""
    import pickle
    _setup_cache()
    B, path, warmup_frames, n_frames = (int(argv[0]), argv[1],
                                        int(argv[2]), int(argv[3]))
    mode = argv[4] if len(argv) > 4 else "interleaved"
    with open(path, "rb") as f:
        data = pickle.load(f)
    fps, extra = _run_fleet(B, data["seqs"], data["frame_sets"],
                            warmup_frames, n_frames, mode=mode)
    print(json.dumps({"fps": fps, "extra": extra}))


def _fleet_ladder(B0, seqs, frame_sets, warmup_frames, n_frames, extra):
    """Try the fleet phase over (B, mode) attempts, each in a fresh
    subprocess; halve B per mode down to 2. Returns best aggregate fps or
    None (B0 < 2 means the HBM budget fits no real fleet — skip the phase
    and let the caller report the single-sequence configuration).

    Interleaved attempts run first: they reuse phase 1's compiled
    single-sequence programs (no cold compiles, no vmapped-batch
    compile-time OOM risk). Lockstep (the vmapped in-program batching) is
    opt-in via SDV_BENCH_LOCKSTEP=1 — round-4 measured it a net loss."""
    if B0 < 2:
        return None
    import pickle
    import subprocess
    path = "/tmp/sdv_bench_fleet_frames.pkl"
    with open(path, "wb") as f:
        pickle.dump({"seqs": [(s.calib, s.sensor, s.poses_wc) for s in seqs],
                     "frame_sets": frame_sets}, f)
    modes = ["interleaved"]
    if os.environ.get("SDV_BENCH_LOCKSTEP"):
        modes.append("lockstep")
    sizes = []
    B = B0
    while B >= 2:
        sizes.append(B)
        B //= 2
    # the aggregate-vs-B curve is flat near the top (the chip saturates),
    # so stop a mode after its two largest COMPLETED attempts; failures
    # keep halving so the ladder still recovers a small fleet from OOMs
    attempts = [(B, m) for m in modes for B in sizes]
    done_per_mode = {m: 0 for m in modes}
    best = None
    for B, mode in attempts:
        if done_per_mode[mode] >= 2:
            continue
        t0 = time.perf_counter()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--fleet", str(B),
             path, str(warmup_frames), str(n_frames), mode],
            capture_output=True, text=True, timeout=7200)
        sys.stderr.write(proc.stderr)
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() \
            else ""
        try:
            out = json.loads(line)
            # strict order: a crashed child's catch-all also prints valid
            # JSON (the RECORD template) — read "fps" BEFORE touching extra
            # so that line is treated as a failure, not merged
            fps = out["fps"]
            fextra = out["extra"]
        except (json.JSONDecodeError, KeyError):
            msg = (proc.stderr.strip().splitlines() or ["no stderr"])[-1][:160]
            _log(f"fleet attempt B={B} {mode} failed after "
                 f"{time.perf_counter() - t0:.0f}s: {msg}")
            extra.setdefault("fleet_errors", []).append(
                {"B": B, "mode": mode, "error": msg})
            continue
        done_per_mode[mode] += 1
        _log(f"fleet B={B} {mode}: {fps:.3f} f/s aggregate "
             f"({fextra.get('fps_per_seq_in_fleet')}/seq)")
        extra.setdefault("fleet_tried", []).append(
            {"B": B, "mode": mode, "fps": round(fps, 3)})
        # the aggregate-vs-B curve is not monotone (deeper queues hide more
        # host time but grow the working set), so try both sizes and
        # report the best completed attempt
        if best is None or fps > best[0]:
            best = (fps, fextra)
    if best is None:
        return None
    extra.update(best[1])
    return best[0]


def main():
    _setup_cache()
    from sdv_loam_tpu.data.synthetic import make_sequence
    from sdv_loam_tpu.utils import hbm

    B_req = int(os.environ.get("SDV_BENCH_B", "8"))
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
    _log(f"generated {len(seqs)}x{n_frames} frames in "
         f"{time.perf_counter() - t_gen:.1f}s")

    # ---------------- phase 1: single sequence (and compile warmup) --------
    fps_single, extra, sys_bytes = _run_single(
        seqs[0], frame_sets[0], warmup_frames, n_frames)
    RECORD.update(value=round(fps_single, 3),
                  vs_baseline=round(fps_single / 100.0, 4), extra=extra)

    if os.environ.get("SDV_BENCH_SINGLE"):
        print(json.dumps(RECORD))
        return

    # ------------- phase 2: B-sequence lockstep aggregate ------------------
    # size the fleet from measured bytes, then retry-halve on OOM (each
    # attempt in a fresh subprocess): program temporaries of the vmapped
    # fleet programs are invisible to the client, so the static estimate is
    # a cap, not a guarantee.
    B = hbm.pick_fleet_size(sys_bytes, B_req)
    if B < B_req:
        _log(f"HBM budget caps fleet at B={B} (requested {B_req}, "
             f"{sys_bytes / 1e6:.0f} MB/system)")
    fps = _fleet_ladder(B, seqs, frame_sets, warmup_frames, n_frames, extra)
    if fps is not None:
        extra["scaling_efficiency"] = round(
            fps / (extra["B"] * fps_single), 3)
        # the chip's throughput is the best configuration: with the r4
        # quad-gather content reductions the in-program fleet batching is
        # a net LOSS (B=2 aggregate 2.48 < single 2.76 f/s — fleet-max
        # while_loop iterations + lockstep staging outweigh the amortized
        # per-op floors), so only report the aggregate when it wins
        if fps > fps_single:
            RECORD.update(
                metric="synthetic_kitti_aggregate_frames_per_sec_per_chip",
                value=round(fps, 3), vs_baseline=round(fps / 100.0, 4),
                extra=extra)
        else:
            _log(f"fleet aggregate {fps:.2f} <= single-seq {fps_single:.2f}"
                 " — reporting the single-sequence configuration")
    else:
        _log("fleet phase unavailable — reporting single-sequence result")

    print(json.dumps(RECORD))


if __name__ == "__main__":
    try:
        if len(sys.argv) > 1 and sys.argv[1] == "--fleet":
            _fleet_child(sys.argv[2:])
            sys.exit(0)
        main()
    except Exception as e:  # always emit the one JSON line the driver reads
        import traceback
        traceback.print_exc(file=sys.stderr)
        RECORD["extra"]["error"] = str(e)[:200]
        print(json.dumps(RECORD))
