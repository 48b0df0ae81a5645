"""Decompose kf_opt_step's per-KF device time on the real TPU.

Runs a short KITTI-scale synthetic sequence, stashes the args of the last
kf_opt_step call, then times the whole program and its sub-programs with
chained dependent calls (CLAUDE.md timing methodology: stream x=f(x)-style
chains, never independent timeit loops).

Usage:  python tools/kf_microbench.py            (TPU via axon)
        SDV_PLAT=cpu python tools/kf_microbench.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

if os.environ.get("SDV_PLAT"):
    jax.config.update("jax_platforms", os.environ["SDV_PLAT"])
import jax.numpy as jnp
import numpy as np

from sdv_loam_tpu.config import Settings
from sdv_loam_tpu.data.synthetic import make_sequence
from sdv_loam_tpu.system import kf_ops
from sdv_loam_tpu.system.full_system import FullSystem

N_FRAMES = int(os.environ.get("N_FRAMES", "24"))

stash = {}
_real = kf_ops.kf_opt_step


def _wrap(*args, **kw):
    stash["args"] = args
    stash["kw"] = kw
    return _real(*args, **kw)


kf_ops.kf_opt_step = _wrap

seq = make_sequence(n_frames=N_FRAMES, w=1200, h=360, fx=718.856, step=0.8,
                    yaw_rate=0.0, lidar_stride=2, half_width=14.0)
fs = FullSystem(seq.calib, seq.sensor, Settings())
for i in range(N_FRAMES):
    img, cloud, ts = seq.get(i)
    fs.add_active_frame(img, cloud, ts)
print("captured kf_opt_step args; window", len(fs.order), flush=True)
args, kw = stash["args"], stash["kw"]


def chain_time(label, fn, reps=8):
    """Chained streaming: each call consumes a scalar derived from the
    previous result so the device can't dedup or overlap with host."""
    tok = jnp.float32(0.0)
    out = fn(tok)  # compile
    jax.block_until_ready(out)
    t0 = time.time()
    tok = jnp.float32(0.0)
    for _ in range(reps):
        out = fn(tok)
        leaves = [x for x in jax.tree.leaves(out)
                  if hasattr(x, "dtype") and jnp.issubdtype(x.dtype,
                                                            jnp.floating)]
        tok = leaves[0].ravel()[0] * 0.0
    jax.block_until_ready(tok)
    dt = (time.time() - t0) / reps * 1000
    print(f"{label:28s} {dt:8.1f} ms", flush=True)
    return dt


# arg indices in kf_opt_step's positional signature
IDX = {name: i for i, name in enumerate(
    ("T_cw_fej eps calib calib_zero frame_valid frame_prior c_prior aff "
     "exposure HM bM newest frame_energy_th slot_flagged pt_u pt_v "
     "pt_idepth pt_host pt_color pt_weights pt_is_sensor pt_prior pt_valid "
     "pt_type pt_quality pt_idepth_hessian num_good_res res_active "
     "res_state res_is_new matcher_px matcher_valid dI0_stack flat_newest "
     "offs widths heights flat_slots_stack ref_idx_newest ref_idx_multi "
     "multi_target_mask dI_newest_pyr max_iters min_opt_iterations "
     "th_opt_iterations force_accept prior_marg marg_weight_fac "
     "min_good_active_res_for_marg min_good_res_for_marg "
     "min_idepth_h_marg").split())}


def a(name):
    return args[IDX[name]]


def with_iters(it):
    aa = list(args)
    aa[IDX["max_iters"]] = jnp.int32(it)
    return tuple(aa)


# ---- whole program at various iteration counts ----
for it in (0, 1, 6):
    aa = with_iters(it)

    def run(tok, aa=aa):
        aa2 = list(aa)
        aa2[IDX["eps"]] = aa2[IDX["eps"]] + tok
        return _real(*aa2, **kw)

    chain_time(f"kf_opt_step iters={it}", run)

# ---- matcher pass 1 (old hosts -> newest) ----
from sdv_loam_tpu.models.matcher import (reproject_and_match,
                                         reproject_and_match_multi)
from sdv_loam_tpu.utils import se3

F = kw["n_frames"]
w, h = kw["w"], kw["h"]
T_cw = jnp.einsum("fij,fjk->fik", se3.se3_exp(a("eps")), a("T_cw_fej"))
T_wc = se3.inverse(T_cw)
newest = a("newest")
hf = a("pt_valid") & (a("pt_host") != newest)
nf = a("pt_valid") & (a("pt_host") == newest)


def m1(tok):
    return reproject_and_match(
        a("pt_u") + tok, a("pt_v"), a("pt_idepth"), a("pt_host"),
        a("pt_type"), hf, a("pt_quality"), a("pt_is_sensor"),
        T_wc, a("aff"), a("exposure"),
        a("dI0_stack"), a("flat_newest"), a("offs"), a("widths"),
        a("heights"), T_wc[newest], a("aff")[newest], a("exposure")[newest],
        a("calib"), a("ref_idx_newest"), w=w, h=h,
        max_level=kw["max_level"], per_cell=False, lane_cap_frac=0.625)


def m2(tok):
    return reproject_and_match_multi(
        a("pt_u") + tok, a("pt_v"), a("pt_idepth"), a("pt_host"),
        a("pt_type"), nf, a("pt_quality"), a("pt_is_sensor"),
        T_wc, a("aff"), a("exposure"),
        a("dI0_stack"), a("flat_slots_stack"), a("offs"), a("widths"),
        a("heights"), T_wc, a("aff"), a("exposure"), a("calib"),
        a("ref_idx_multi"), w=w, h=h, max_level=kw["max_level"],
        per_cell=False, lane_cap_frac=0.5)


chain_time("matcher pass1", m1)
chain_time("matcher pass2 (multi)", m2)

# ---- ba_core alone ----
from sdv_loam_tpu.models import backend

res_active_v = a("res_active") & a("pt_valid")[:, None]


def ba(tok):
    return backend.ba_core(
        a("T_cw_fej"), a("eps") + tok, a("calib"), a("calib_zero"),
        a("frame_valid"), a("frame_prior"), a("c_prior"), a("aff"),
        a("exposure"), a("HM"), a("bM"), newest, a("frame_energy_th"),
        a("pt_u"), a("pt_v"), a("pt_idepth"), a("pt_host"), a("pt_color"),
        a("pt_weights"), a("pt_is_sensor"), a("pt_prior"), res_active_v,
        a("res_state"), a("matcher_px"), a("matcher_valid"), a("dI0_stack"),
        a("max_iters"), a("min_opt_iterations"), a("th_opt_iterations"),
        a("force_accept"), n_frames=F, w=w, h=h,
        gate_refresh=kw["gate_refresh"], resf_at_fej=kw["resf_at_fej"])


ba_j = jax.jit(ba)
chain_time("ba_core iters=6 (jit)", ba_j)

# ---- track_ref build ----
from sdv_loam_tpu.ops.photometric import build_track_ref, splat_idepth

N = a("pt_u").shape[0]
su = a("pt_u").astype(jnp.int32)
sv = a("pt_v").astype(jnp.int32)


def tr(tok):
    id0, w0 = splat_idepth(su, sv, a("pt_idepth") + tok,
                           jnp.ones_like(a("pt_idepth")), a("pt_valid"),
                           w, h)
    return build_track_ref(args[IDX["dI_newest_pyr"]], id0, w0,
                           kw["levels"], cap=kw.get("track_ref_cap", 16384))


chain_time("splat+build_track_ref", jax.jit(tr))

print("live counts: pts", int(jax.device_get(a("pt_valid").sum())),
      "res", int(jax.device_get(res_active_v.sum())),
      "hf", int(jax.device_get(hf.sum())), "nf",
      int(jax.device_get(nf.sum())), flush=True)
