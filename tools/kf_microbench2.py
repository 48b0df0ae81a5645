"""Decompose kf_opt_step + track_frame_step by timing static-knob variants
of the WHOLE programs (subtraction method — standalone sub-program timings
proved unreliable: XLA optimizes them differently in context).

Variants (each is a one-time compile, persistent-cached):
  kf_opt_step: base / p2_cap=512 / p2_cap=8 / p1_cap=8 / track_ref_cap=8
  track_frame_step: base / n_refine=1 / use_struct_pose=False

Usage: python tools/kf_microbench2.py   (TPU via axon)
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
from sdv_loam_tpu.ops import frame_step as fstep
from sdv_loam_tpu.system import kf_ops
from sdv_loam_tpu.system.full_system import FullSystem

N_FRAMES = int(os.environ.get("N_FRAMES", "24"))

kf_stash = {}
tr_stash = {}
_real_kf = kf_ops.kf_opt_step
_real_tr = fstep.track_frame_step


def _wrap_kf(*args, **kw):
    kf_stash["args"], kf_stash["kw"] = args, kw
    return _real_kf(*args, **kw)


def _wrap_tr(*args, **kw):
    tr_stash["args"], tr_stash["kw"] = args, kw
    return _real_tr(*args, **kw)


kf_ops.kf_opt_step = _wrap_kf
fstep.track_frame_step = _wrap_tr

seq = make_sequence(n_frames=N_FRAMES, w=1200, h=360, fx=718.856, step=0.8,
                    yaw_rate=0.0, lidar_stride=2, half_width=14.0)
fs = FullSystem(seq.calib, seq.sensor, Settings())
for i in range(N_FRAMES):
    img, cloud, ts = seq.get(i)
    fs.add_active_frame(img, cloud, ts)
print("captured; window", len(fs.order), flush=True)


def chain_time(label, fn, reps=8):
    tok = jnp.float32(0.0)
    t0 = time.time()
    out = fn(tok)
    jax.block_until_ready(out)
    print(f"{label:34s} compile+1 {time.time()-t0:6.1f} s", flush=True)
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
    print(f"{label:34s} {dt:8.1f} ms", flush=True)
    return dt


# ---------------- kf_opt_step variants ----------------
args, kw = kf_stash["args"], kf_stash["kw"]
EPS_IDX = 1


def kf_variant(label, **kwo):
    kw2 = dict(kw)
    kw2.update(kwo)

    def run(tok):
        aa = list(args)
        aa[EPS_IDX] = aa[EPS_IDX] + tok
        return _real_kf(*aa, **kw2)

    return chain_time(f"kf {label}", run)


base = kf_variant("base")
p2_512 = kf_variant("p2_cap=512", p2_cap=512)
p2_8 = kf_variant("p2_cap=8", p2_cap=8)
p1_8 = kf_variant("p1_cap=8", p1_cap=8)
tr8 = kf_variant("track_ref_cap=8", track_ref_cap=8)
base2 = kf_variant("base (re-measure)")
print(f"--> pass2 cost ~{base - p2_8:.0f} ms (512: saves {base - p2_512:.0f})"
      f", pass1 ~{base - p1_8:.0f} ms, track_ref ~{base - tr8:.0f} ms"
      f", base drift {base:.0f} -> {base2:.0f} ms",
      flush=True)

# ---------------- track_frame_step variants ----------------
targs, tkw = tr_stash["args"], tr_stash["kw"]
# pools is positional arg 0; perturb aff_last (idx 9) scalar-safe instead
AFF_IDX = 9


def tr_variant(label, **kwo):
    kw2 = dict(tkw)
    kw2.update(kwo)

    def run(tok):
        aa = list(targs)
        aa[AFF_IDX] = aa[AFF_IDX] + tok
        return _real_tr(*aa, **kw2)

    return chain_time(f"tr {label}", run)


tb = tr_variant("base")
t1 = tr_variant("n_refine=1", n_refine=1)
tsp = tr_variant("no struct pose", use_struct_pose=False)
tb2 = tr_variant("base (re-measure)")
print(f"--> refine x3->x1 saves {tb - t1:.0f} ms, struct pose"
      f" ~{tb - tsp:.0f} ms, base drift {tb:.0f} -> {tb2:.0f} ms", flush=True)
