"""Long-horizon drift bisection driver (round-3 gate, VERDICT item 1).

Runs the straight KITTI-scale scene with host-side ablations selected via
ABLATE (comma-separated):
  noba     - max_opt_iterations forced to 0 (poses purely from tracking;
             iters is a traced arg so no recompile)
  nohm     - zero HM/bM after every frame (no marginalization prior)
  feth     - reset fe_th to its initial value after every frame (kills the
             cross-KF threshold ratchet; the within-KF update still runs)
  aff      - pin all affine states to zero every frame
  fmargonly- like nohm but BEFORE the KF uses it?? (not implemented)
Platform: SDV_PLAT=cpu forces CPU; default uses the default backend (TPU
under axon). Frames via N_FRAMES (default 200).

Per-KF diagnostics: ATE so far, BA-vs-tracked pose correction of the newest
frame, residual counts, feth, affine a, matcher stats.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if os.environ.get("SDV_PLAT"):
    jax.config.update('jax_platforms', os.environ["SDV_PLAT"])
import numpy as np
import time
from sdv_loam_tpu.config import Settings
from sdv_loam_tpu.data.synthetic import make_sequence
from sdv_loam_tpu.system.full_system import FullSystem
from sdv_loam_tpu.eval.ate import ate_rmse

ablate = set(filter(None, os.environ.get("ABLATE", "").split(",")))
n = int(os.environ.get("N_FRAMES", "200"))
scene = os.environ.get("SCENE", "straight")
W = int(os.environ.get("W", "1200"))
H = int(os.environ.get("H", "360"))
FX = float(os.environ.get("FX", "718.856"))
_sz = "" if (W, H) == (1200, 360) else f"_{W}x{H}"
if scene == "scurve":
    from sdv_loam_tpu.data.synthetic import s_curve_profile
    prof = s_curve_profile(n, peak=0.006, n_lobes=4)
    seq = make_sequence(n_frames=n, w=W, h=H, fx=FX, step=0.8,
                        yaw_rate=prof, lidar_stride=2, half_width=14.0,
                        follow_path=True)
    _cache = f"/tmp/scurve_seq_{n}{_sz}.npz"
else:
    seq = make_sequence(n_frames=n, w=W, h=H, fx=FX, step=0.8,
                        yaw_rate=0.0, lidar_stride=2, half_width=14.0)
    _cache = f"/tmp/drift_seq_{n}{_sz}.npz"

# disk-cache the rendered frames so ablation runs share one raycast pass
if os.path.exists(_cache):
    _z = np.load(_cache, allow_pickle=True)
    _frames = [(_z[f"img{i}"], _z[f"cld{i}"], float(_z["ts"][i]))
               for i in range(n)]
    print(f"loaded {n} cached frames", flush=True)
else:
    _frames = [seq.get(i) for i in range(n)]
    np.savez(_cache, ts=np.array([f[2] for f in _frames]),
             **{f"img{i}": _frames[i][0] for i in range(n)},
             **{f"cld{i}": _frames[i][1] for i in range(n)})
    print(f"generated+cached {n} frames", flush=True)
seq.get = lambda i: _frames[i]
_kw = {}
if "noba" in ablate:
    _kw["max_opt_iterations"] = 0
if "gate" in ablate:
    _kw["ba_gate_refresh"] = True
if "forceacc" in ablate:
    _kw["force_accept_step"] = True
if "nosp" in ablate:
    _kw["use_struct_pose"] = False
if "spmad" in ablate:
    _kw["struct_pose_mad"] = True
if "cvr" in ablate:
    _kw["closest_view_ref"] = True
if os.environ.get("SPTOL"):
    _kw["struct_pose_e_tol"] = float(os.environ["SPTOL"])
if os.environ.get("DIAGFLOOR"):
    _kw["ba_lm_diag_floor"] = float(os.environ["DIAGFLOOR"])
if os.environ.get("VETO_M"):
    _kw["ba_step_veto_m"] = float(os.environ["VETO_M"])
if os.environ.get("DAMPEDRETRY"):
    _kw["ba_veto_damped_retry"] = float(os.environ["DAMPEDRETRY"])
s = Settings(**_kw)
# checkpoint replay knobs for fast long-run iteration (the 500-frame
# S-curve takes ~25 min on the tunneled TPU; a resume from frame ~390
# replays the collapse regime in ~2 min):
#   CKPT_SAVE=<frame>  save /tmp/<scene>_ckpt_<frame>.npz at that frame
#   CKPT_LOAD=<path>   resume from a saved checkpoint (frame index is
#                      recovered from the checkpoint's shell count)
_ckpt_save = int(os.environ.get("CKPT_SAVE", "-1"))
_ckpt_load = os.environ.get("CKPT_LOAD")
if _ckpt_load:
    from sdv_loam_tpu.system import checkpoint as _ckpt
    fs = _ckpt.load(_ckpt_load, seq.calib, seq.sensor, s)
    _start = len(fs.shells)
    print(f"resumed from {_ckpt_load} at frame {_start}", flush=True)
else:
    fs = FullSystem(seq.calib, seq.sensor, s)
    _start = 0
# NOTE: with noba the first 2-3 KFs still run BA (the window<3/<4 iteration
# boost is hardcoded in _kf_opt_steps) — fine for bisection, drift is later.
feth0 = fs.fe_th.copy()
t0 = time.time()
prev_kf_count = len(fs.kf_shells)
for i in range(_start, n):
    img, cloud, ts = seq.get(i)
    if i == _ckpt_save:
        from sdv_loam_tpu.system import checkpoint as _ckpt
        _cp = f"/tmp/{scene}_ckpt_{i}.npz"
        _ckpt.save(fs, _cp)
        print(f"checkpoint saved: {_cp}", flush=True)
    fs.add_active_frame(img, cloud, ts)
    if "nohm" in ablate:
        fs.HM[:] = 0; fs.bM[:] = 0
    if "feth" in ablate:
        fs.fe_th[:] = feth0
    if "aff" in ablate:
        fs.aff[:] = 0
        fs.track_ref_aff[:] = 0
        for sh in fs.shells[-2:]:
            sh["aff"][:] = 0
    if fs.is_lost:
        print("LOST", i, flush=True); break
    new_kf = len(fs.kf_shells) > prev_kf_count
    prev_kf_count = len(fs.kf_shells)
    if new_kf and i > 1:
        sh = fs.shells[-1]
        d = np.linalg.inv(sh["T_wc_tracked"]) @ sh["T_wc"]
        dt_ba = np.linalg.norm(d[:3, 3])
        dxyz = d[:3, 3]  # BA-vs-tracked translation in the camera frame
        # per-frame forward-step ratio vs GT (scale-drift indicator)
        if len(fs.shells) >= 3:
            est_step = np.linalg.norm(fs.shells[-1]["T_wc"][:3, 3]
                                      - fs.shells[-2]["T_wc"][:3, 3])
            gt_step = np.linalg.norm(seq.poses_wc[i][:3, 3]
                                     - seq.poses_wc[i - 1][:3, 3])
            step_ratio = est_step / max(gt_step, 1e-9)
        else:
            step_ratio = 1.0
        est = fs.get_trajectory(); gt = seq.poses_wc[:len(est)]
        m = fs.pt_valid
        used = np.array(fs.order)
        # struct-pose correction of this frame (photometric -> final tracked)
        dps = np.linalg.inv(sh.get("T_wc_photo", sh["T_wc_tracked"])) \
            @ sh["T_wc_tracked"]
        # track-ref depth-map health: level-0 pool count + median depth vs
        # the GT median depth at the ref KF
        p0 = jax.device_get({k: fs.track_ref[0][k]
                             for k in ("idepth", "valid")}) \
            if fs.track_ref is not None else None
        if p0 is not None and p0["valid"].any():
            zmed = float(np.median(1.0 / np.maximum(
                p0["idepth"][p0["valid"]], 1e-9)))
            nref = int(p0["valid"].sum())
        else:
            zmed, nref = -1.0, 0
        print(f"f{i:3d} kf{len(fs.kf_shells):3d}: ate {ate_rmse(est, gt):8.3f}"
              f" ba_dxyz ({dxyz[0]:+7.4f},{dxyz[1]:+7.4f},{dxyz[2]:+7.4f})"
              f" step/gt {step_ratio:6.4f}"
              f" sp_dz {dps[2, 3]:+7.4f} nm {sh.get('n_matched', -1):4d}"
              f" p1[{'/'.join(map(str, getattr(fs, 'last_match_diag', [])))}]"
              f" p2[{'/'.join(map(str, getattr(fs, 'last_match_diag_p2', [])))}]"
              f" rf[{';'.join(','.join(map(str, r)) for r in getattr(fs, 'last_res_diag', []))}]"
              f" pd[{'/'.join(map(str, getattr(fs, 'last_death_diag', [])))}]"
              f" ref[n {nref:5d} zmed {zmed:5.1f}]"
              f" act {m.sum():4d} im {fs.im_valid.sum():4d}"
              f" sel {getattr(fs, 'last_new_traces', -1):4d}"
              f" pot {fs.pot_state.get('pot', -1):2d}"
              f" veto {fs.telemetry.counters['ba_step_veto']:2d}"
              f" res/pt {fs.res_active[m].sum(1).mean():4.2f}"
              f" feth {fs.fe_th[used[-1]]:7.1f}"
              f" aff_a {fs.aff[used[-1], 0]:6.3f}"
              f" |HM| {np.abs(fs.HM).max():9.2e}"
              f" win_d {getattr(fs, 'last_ba_window_deltas', {})}"
              f" t {time.time()-t0:6.1f}s", flush=True)
est = fs.get_trajectory(); gt = seq.poses_wc[:len(est)]
print(f"FINAL ate {ate_rmse(est, gt):.3f} over {len(est)} frames "
      f"({time.time()-t0:.0f}s) ablate={sorted(ablate)}", flush=True)
