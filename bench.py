"""Benchmark: full-odometry frames/sec per chip on KITTI-statistical scenes.

Runs the complete pipeline (LiDAR preprocess, pyramid, tracking ladder,
struct pose, keyframe BA, marginalization) on procedurally generated
KITTI-like sequences — no dataset is available in this environment, and the
synthetic scene gives exact ground truth for a simultaneous accuracy check.

Two OPERATING POINTS, mirroring the reference's own preset system
(/root/reference/src/main.cpp:192-241):
  * "default": preset 0 — 2000 active points, 5-7 KF window, 1-6 LM iters,
    full KITTI resolution (1200x360).
  * "fast": preset 2/3 — 800 points, 4-6 KF window, 1-4 iters, 424x320.
    The reference defines this as its 5x-speed mode; gather-bound TPU stage
    cost scales with lane count, so the pool caps shrink with it.

The SCENE is tuned to KITTI flow statistics (VERDICT r4 item 4): ~1 m/frame
at 10 Hz, low-contrast asphalt ground so selection concentrates on building
fronts ~16 m to the side, giving RMS tracking flow ~15-25 px/frame and a
keyframe rate of 0.2-0.4 under the reference's own KF formula
(FullSystem.cpp:869-891) — tuned host-side with tools/scene_flow_tune.py.
kf_rate is reported next to fps so throughput is comparable across rounds.

Per operating point, two phases:
  1. single-sequence run (also compile warmup);
  2. B-sequence fleet run (interleaved pipelined systems by default;
     lockstep vmapped batching via SDV_BENCH_LOCKSTEP=1) — the chip's
     throughput axis: B independent odometries share the chip FIFO, so
     aggregate frames/s is the per-chip capacity figure (reference analog:
     one process per sequence on one CPU, SURVEY.md §2.6).

Fleet capacity management (VERDICT r3 item 1): B is picked from measured
per-system device bytes vs the chip's HBM budget (utils/hbm.py), and the
fleet phase runs attempts at B, B/2, ..., 2 so an OOM or crash at a large
B degrades to a smaller completed fleet instead of losing the phase.
Each attempt runs in a SUBPROCESS: a TPU ResourceExhausted poisons the
backend for the rest of the process, so isolation is the only way the
ladder can actually recover. The final JSON line always reports the best
COMPLETED configuration across operating points.

A GATHER-OP CENSUS (VERDICT r4 item 1c) is printed for the production
programs after the single-seq phase: static gather-op counts from the
optimized HLO times the measured ~0.7 ms streamed per-gather floor, so the
gap between measured stage time and content is attributable.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline relative to the 100 fps/chip target (BASELINE.md); per-point
results live in "extra.operating_points".

Env knobs: SDV_BENCH_B (default 8), SDV_BENCH_FRAMES (default 112),
SDV_BENCH_OP (default/fast/both, default both), SDV_BENCH_SINGLE=1 to skip
fleet phases, SDV_BENCH_CENSUS=0 to skip the census, SDV_HBM_BYTES to
override the HBM budget.
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

WARMUP_FRAMES = 16


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


# ---------------------------------------------------------------------------
# operating points (reference presets, main.cpp:192-241)
# ---------------------------------------------------------------------------

def _op_settings(op):
    from sdv_loam_tpu.config import Settings
    # Pipelined frames (default ON; SDV_BENCH_PIPELINED=0 for sequential):
    # overlap host staging with device tracking; trajectory identical to
    # sequential mode (tests/test_pipelined.py). The reference likewise
    # benchmarks with its tracking/mapping thread overlap.
    pipe = os.environ.get("SDV_BENCH_PIPELINED", "1") != "0"
    if op == "fast":
        return Settings.preset_fast(pipelined_frames=pipe)
    return Settings(pipelined_frames=pipe)


def _op_scene_kwargs(op):
    # cy_offset=0: the test-scene default (-0.12) shows extra near ground,
    # which alone pushes RMS flow ~2x past KITTI statistics (synthetic.py)
    if op == "fast":
        # the reference's fast preset is a NON-proportional resize of
        # 1241x376 KITTI to 424x320 (main.cpp:216-238 via
        # benchmarkSetting_width/height): fx scales by 424/1241,
        # fy by 320/376 (measured without this: RMS flow 93 px,
        # kf_rate 0.65 — nothing like the operating point it mimics)
        return dict(w=424, h=320, fx=245.6, fy=611.8, cy_offset=0.0)
    return dict(w=1200, h=360, fx=718.856, cy_offset=0.0)


def _make_scenes(op, n_frames):
    """Two distinct KITTI-statistical scenes/trajectories (fleet systems
    alternate between them; rendering is host-side raycasting)."""
    from sdv_loam_tpu.data.synthetic import make_sequence
    seq_specs = [dict(yaw_rate=0.004, seed=7), dict(yaw_rate=-0.006, seed=13)]
    seqs, frame_sets = [], []
    for spec in seq_specs:
        # step=0.7 m @10 Hz = 25 km/h (KITTI residential, e.g. seq 00; the
        # oracle fixture uses the same). The flow statistic is dominated by
        # near GROUND ahead (half_width-independent): measured 42 px at
        # step 1.0 through the pipeline vs 28 predicted/25 measured at 0.7
        # (tools/scene_flow_tune.py sweep 2026-08-20).
        seq = make_sequence(n_frames=n_frames, step=0.7, lidar_stride=2,
                            half_width=16.0, ground_contrast=0.25,
                            follow_path=True, **_op_scene_kwargs(op), **spec)
        seqs.append(seq)
        frame_sets.append([seq.get(i) for i in range(n_frames)])
    return seqs, frame_sets


# ---------------------------------------------------------------------------
# gather census
# ---------------------------------------------------------------------------

class _CallRecorder:
    """Keeps ONE (args, kwargs) per production program for post-run
    lowering — the census re-lowers with real arguments and counts gather
    ops in the optimized HLO (compiles hit the in-memory/persistent cache,
    so this costs only the HLO text walk)."""

    def __init__(self):
        self.calls = {}
        self._origs = []

    def install(self):
        import sdv_loam_tpu.ops.frame_step as fsm
        import sdv_loam_tpu.ops.lidar as lm
        import sdv_loam_tpu.system.kf_ops as km
        for mod, name, label in ((fsm, "track_frame_step", "track"),
                                 (lm, "preprocess_scan", "lidar"),
                                 (km, "kf_opt_step", "kf.opt"),
                                 (km, "activate_full", "kf.activate")):
            orig = getattr(mod, name)
            self._origs.append((mod, name, orig))

            def wrap(*a, _o=orig, _l=label, **k):
                self.calls[_l] = (_o, a, k)
                return _o(*a, **k)

            setattr(mod, name, wrap)

    def uninstall(self):
        for mod, name, orig in self._origs:
            setattr(mod, name, orig)
        self._origs = []

    def census(self):
        out = {}
        for label, (fn, a, k) in sorted(self.calls.items()):
            try:
                txt = fn.lower(*a, **k).compile().as_text()
            except Exception as e:
                out[label] = {"error": str(e)[:80]}
                continue
            gathers = txt.count(" gather(") + txt.count("%gather")
            scatters = txt.count(" scatter(") + txt.count("%scatter")
            whiles = txt.count(" while(")
            out[label] = {"gathers": gathers, "scatters": scatters,
                          "whiles": whiles,
                          # measured streamed per-op floor ~0.7 ms when the
                          # op count (not lane count) dominates (CLAUDE.md)
                          "est_gather_floor_ms": round(0.7 * gathers, 1)}
        return out


# ---------------------------------------------------------------------------
# phases
# ---------------------------------------------------------------------------

def _run_single(op, seq, frames, n_frames):
    """Phase 1: one sequence; returns (fps, extra-dict, per_system_bytes)."""
    from sdv_loam_tpu.eval.ate import ate_rmse, drift_decomposition
    from sdv_loam_tpu.io.telemetry import Telemetry
    from sdv_loam_tpu.system.full_system import FullSystem
    from sdv_loam_tpu.utils import hbm

    rec = _CallRecorder()
    if os.environ.get("SDV_BENCH_CENSUS", "1") != "0":
        rec.install()
    fs = FullSystem(seq.calib, seq.sensor, _op_settings(op))
    for i in range(WARMUP_FRAMES):
        t1 = time.perf_counter()
        img, cloud, ts = frames[i]
        fs.add_active_frame(img, cloud, ts)
        if i < 3 or i == WARMUP_FRAMES - 1:
            _log(f"[{op}] warmup frame {i}: {time.perf_counter() - t1:.1f}s")
    fs.telemetry = Telemetry()  # steady-state stage stats only (no compiles)
    t0 = time.perf_counter()
    for i in range(WARMUP_FRAMES, n_frames):
        img, cloud, ts = frames[i]
        fs.add_active_frame(img, cloud, ts)
    fs.flush()   # pipelined mode: count the last in-flight frame
    dt_single = time.perf_counter() - t0
    rec.uninstall()
    n_timed = n_frames - WARMUP_FRAMES
    fps_single = n_timed / dt_single
    est = fs.get_trajectory()
    ate = ate_rmse(est, seq.poses_wc[:len(est)])
    drift = drift_decomposition(est, seq.poses_wc[:len(est)])
    n_kf, lost = len(fs.kf_shells), bool(fs.is_lost)
    sys_bytes = hbm.system_device_bytes(fs)
    _log(f"[{op}] single-seq: {fps_single:.2f} f/s, ATE {ate:.4f} m")
    _log(f"[{op}] drift: {drift}")
    _log(f"[{op}] stage table (single-seq):\n" + fs.telemetry.stage_table())
    _log(f"[{op}] per-system device bytes: {sys_bytes / 1e6:.0f} MB "
         f"(live total {hbm.live_device_bytes() / 1e6:.0f} MB, "
         f"budget {hbm.hbm_budget_bytes() / 1e9:.1f} GB)")
    census = rec.census() if rec.calls else {}
    if census:
        _log(f"[{op}] gather census (static HLO op counts x ~0.7 ms floor): "
             + json.dumps(census))
    if fs.track_iters_hist:
        hist = np.stack(fs.track_iters_hist[WARMUP_FRAMES:])
        _log(f"[{op}] track LM iters/level mean={hist.mean(0).round(1)} "
             f"max={hist.max(0)}")
    kd = None
    if fs.kf_decision_hist:
        kd = np.array([r[:3] for r in fs.kf_decision_hist[WARMUP_FRAMES:]])
        _log(f"[{op}] kf decision: wsum mean {kd[:, 0].mean():.2f} "
             f"(threshold 1.0), RMS flow px t {kd[:, 1].mean():.1f} "
             f"rt {kd[:, 2].mean():.1f} — the reference formula "
             f"(FullSystem.cpp:869-891) at this scene's flow")
    ovf = dict(fs.telemetry.counters)
    del fs  # free device buffers before the fleet run

    kf_rate = n_kf / max(len(est), 1)
    _log(f"[{op}] kf_rate {kf_rate:.2f}, counters {ovf}")
    if any(v for k, v in ovf.items() if k.startswith("match_overflow")):
        _log("WARNING: matcher lane-cap overflow — residual graph "
             "silently truncated (see models/matcher.py)")
    extra = {"ate_m": round(float(ate), 4), "n_frames": n_timed,
             "n_keyframes": n_kf, "lost": lost, "kf_rate": round(kf_rate, 3),
             "rms_flow_px": round(float(kd[:, 1].mean()), 1)
             if kd is not None and len(kd) else None,
             "match_overflow": sum(
                 v for k, v in ovf.items() if k.startswith("match_overflow")),
             "fps_single_seq": round(fps_single, 3),
             "system_device_mb": round(sys_bytes / 1e6, 1),
             "census": census}
    return fps_single, extra, sys_bytes


def _run_fleet(op, B, seqs, frame_sets, n_frames, mode="interleaved"):
    """Phase 2 at a fixed B. Returns (aggregate fps, extra-updates).

    `seqs`: list of (calib, sensor, poses_wc) tuples.

    Two fleet compositions (system/multi.py):
      - "interleaved" (default): B pipelined FullSystems round-robined;
        reuses the single-sequence programs phase 1 already compiled —
        zero extra compiles — and each system's host staging hides behind
        the others' in-flight device programs.
      - "lockstep": the vmapped in-program batching (MultiSystem)."""
    import dataclasses

    from sdv_loam_tpu.eval.ate import ate_rmse
    from sdv_loam_tpu.system.full_system import FullSystem
    from sdv_loam_tpu.system.multi import InterleavedFleet, MultiSystem
    from sdv_loam_tpu.utils import hbm

    n_timed = n_frames - WARMUP_FRAMES
    st = dataclasses.replace(_op_settings(op),
                             pipelined_frames=mode == "interleaved")
    systems = [FullSystem(seqs[b % len(seqs)][0], seqs[b % len(seqs)][1], st)
               for b in range(B)]
    if mode == "interleaved":
        ms = InterleavedFleet(systems, workers=int(
            os.environ.get("SDV_BENCH_FLEET_WORKERS", "0")))
    else:
        ms = MultiSystem(systems)
    for i in range(WARMUP_FRAMES):  # fleet warmup (syncs, no compiles)
        t1 = time.perf_counter()
        ms.add_frames([frame_sets[b % len(seqs)][i] for b in range(B)])
        if i in (0, 1, WARMUP_FRAMES - 1):
            _log(f"fleet warmup frame {i}: {time.perf_counter() - t1:.2f}s")
    _log(f"fleet live device bytes after warmup: "
         f"{hbm.live_device_bytes() / 1e6:.0f} MB")
    t0 = time.perf_counter()
    for i in range(WARMUP_FRAMES, n_frames):
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
    op, B, path, n_frames = argv[0], int(argv[1]), argv[2], int(argv[3])
    mode = argv[4] if len(argv) > 4 else "interleaved"
    with open(path, "rb") as f:
        data = pickle.load(f)
    fps, extra = _run_fleet(op, B, data["seqs"], data["frame_sets"],
                            n_frames, mode=mode)
    print(json.dumps({"fps": fps, "extra": extra}))


def _fleet_ladder(op, B0, seqs, frame_sets, n_frames, extra):
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
    path = f"/tmp/sdv_bench_fleet_frames_{op}.pkl"
    with open(path, "wb") as f:
        pickle.dump({"seqs": [(s.calib, s.sensor, s.poses_wc) for s in seqs],
                     "frame_sets": frame_sets}, f)
    modes = ["interleaved"]
    # Lockstep (vmapped in-program batching) amortizes per-op LAUNCH cost
    # across lanes. At the default op the content is gather-bound and
    # lockstep measured a net loss (round 4); at the FAST op the per-op
    # tensors are ~4x smaller, so launch overhead is a larger fraction and
    # lockstep is worth an attempt. SDV_BENCH_LOCKSTEP=1 forces it
    # everywhere; =0 disables it everywhere.
    ls = os.environ.get("SDV_BENCH_LOCKSTEP")
    if ls == "1" or (op == "fast" and ls != "0"):
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
            [sys.executable, os.path.abspath(__file__), "--fleet", op,
             str(B), path, str(n_frames), mode],
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
        _log(f"[{op}] fleet B={B} {mode}: {fps:.3f} f/s aggregate "
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


def _run_operating_point(op, n_frames, B_req):
    """Full two-phase bench of one operating point. Returns (best fps,
    metric-name suffix, extra)."""
    from sdv_loam_tpu.utils import hbm

    t_gen = time.perf_counter()
    seqs, frame_sets = _make_scenes(op, n_frames)
    _log(f"[{op}] generated {len(seqs)}x{n_frames} frames in "
         f"{time.perf_counter() - t_gen:.1f}s")

    fps_single, extra, sys_bytes = _run_single(
        op, seqs[0], frame_sets[0], n_frames)
    best_fps, metric = fps_single, "frames_per_sec_per_chip"

    if not os.environ.get("SDV_BENCH_SINGLE"):
        B = hbm.pick_fleet_size(sys_bytes, B_req)
        if B < B_req:
            _log(f"[{op}] HBM budget caps fleet at B={B} (requested {B_req},"
                 f" {sys_bytes / 1e6:.0f} MB/system)")
        fps = _fleet_ladder(op, B, seqs, frame_sets, n_frames, extra)
        if fps is not None:
            extra["scaling_efficiency"] = round(
                fps / (extra["B"] * fps_single), 3)
            if fps > fps_single:
                best_fps = fps
                metric = "aggregate_frames_per_sec_per_chip"
            else:
                _log(f"[{op}] fleet aggregate {fps:.2f} <= single-seq "
                     f"{fps_single:.2f} — single-sequence configuration wins")
        else:
            _log(f"[{op}] fleet phase unavailable — single-sequence result")
    return best_fps, metric, extra


def main():
    _setup_cache()
    B_req = int(os.environ.get("SDV_BENCH_B", "8"))
    n_frames = int(os.environ.get("SDV_BENCH_FRAMES", "112"))
    which = os.environ.get("SDV_BENCH_OP", "both")
    ops = ["default", "fast"] if which == "both" else [which]

    points = {}
    for op in ops:
        fps, metric, extra = _run_operating_point(op, n_frames, B_req)
        points[op] = {"fps": round(fps, 3), "metric": metric, **extra}
        # keep the best completed configuration as the headline at every
        # step so a later crash still reports finished work
        if fps > RECORD["value"]:
            RECORD.update(
                metric=f"synthetic_kitti_{op}_preset_{metric}",
                value=round(fps, 3), vs_baseline=round(fps / 100.0, 4))
        RECORD["extra"]["operating_points"] = points
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
