"""Checkpoint / resume of the full odometry state.

The reference has no checkpointing (SURVEY.md §5: "State is in-memory") —
the TPU build adds it cheaply because the entire window state is a set of
fixed-shape tensors. A snapshot captures every pool, the window slots, the
marginalization prior, tracker reference and shell trajectory; `load`
reconstructs a FullSystem that continues bit-where-it-left-off (pyramids are
re-derived from the stored level-0 images).
"""

from __future__ import annotations

import json

import numpy as np
import jax
import jax.numpy as jnp

from sdv_loam_tpu.config import Settings
from sdv_loam_tpu.ops.align import flatten_pyramid
from sdv_loam_tpu.ops.photometric import splat_idepth
from sdv_loam_tpu.ops.pyramid import make_images
from sdv_loam_tpu.system.full_system import FullSystem

_SCALARS = ("first_coarse_rmse", "current_min_act_dist", "ignore_kf",
            "initialized", "is_lost", "init_failed", "track_ref_slot")


def save(fs: FullSystem, path: str) -> None:
    fs.flush()           # finish any pipelined in-flight frame
    fs._sync_immature()  # flush device-resident trace state into the pool
    fs._sync_pool_mirrors()  # matcher store + centers (checkpoint-only pulls)
    data = dict(
        order=np.array(fs.order, np.int64),
        slot_used=fs.slot_used, T_cw_fej=fs.T_cw_fej, eps=fs.eps,
        aff=fs.aff, exposure=fs.exposure, fe_th=fs.fe_th,
        frame_prior=fs.frame_prior, frame_kf_id=fs.frame_kf_id,
        frame_shell_idx=fs.frame_shell_idx, slot_flagged=fs.slot_flagged,
        slot_stats_out=fs.slot_stats_out,
        dI0_stack=np.asarray(fs.dI0_stack[..., 0]),  # intensities only
        pt_valid=fs.pt_valid, res_active=fs.res_active,
        res_state=fs.res_state, res_is_new=fs.res_is_new,
        matcher_px=fs.matcher_px, matcher_valid=fs.matcher_valid,
        centers=fs.centers, im_valid=fs.im_valid, HM=fs.HM, bM=fs.bM,
        K0=fs.K0, last_coarse_rmse=fs.last_coarse_rmse,
        track_ref_aff=fs.track_ref_aff,
        rng_key=np.asarray(jax.random.key_data(fs._rng_key)),
    )
    for k, v in fs.pt.items():
        data[f"pt_{k}"] = v
    for k, v in fs.im.items():
        data[f"im_{k}"] = v
    meta = dict(
        shells=[{k: (v.tolist() if isinstance(v, np.ndarray) else v)
                 for k, v in sh.items()} for sh in fs.shells],
        kf_shells=fs.kf_shells,
        pot=fs.pot_state.get("pot", 3),
        scalars={k: (float(getattr(fs, k)) if not isinstance(getattr(fs, k), bool)
                     else bool(getattr(fs, k))) for k in _SCALARS},
        # tracked-step veto baseline (recent accepted step lengths)
        track_step_hist=[float(x) for x in fs._track_step_hist],
    )
    data["meta_json"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **data)


def load(path: str, calib, sensor, settings: Settings | None = None
         ) -> FullSystem:
    z = np.load(path, allow_pickle=False)
    fs = FullSystem(calib, sensor, settings)
    meta = json.loads(bytes(z["meta_json"]).decode())

    fs.order = [int(x) for x in z["order"]]
    for name in ("slot_used", "T_cw_fej", "eps", "aff", "exposure", "fe_th",
                 "frame_prior", "frame_kf_id", "frame_shell_idx",
                 "slot_flagged", "slot_stats_out", "pt_valid", "res_active",
                 "res_state", "res_is_new", "matcher_px", "matcher_valid",
                 "centers", "im_valid", "HM", "bM", "K0",
                 "last_coarse_rmse", "track_ref_aff"):
        setattr(fs, name, np.array(z[name]))
    for k in fs.pt:
        fs.pt[k] = np.array(z[f"pt_{k}"])
    for k in fs.im:
        fs.im[k] = np.array(z[f"im_{k}"])

    fs.shells = [{k: (np.array(v) if isinstance(v, list) else v)
                  for k, v in sh.items()} for sh in meta["shells"]]
    fs.kf_shells = list(meta["kf_shells"])
    fs.pot_state = {"pot": meta["pot"]}
    fs._track_step_hist = [float(x) for x in meta.get("track_step_hist", [])]
    sc = meta["scalars"]
    fs.first_coarse_rmse = sc["first_coarse_rmse"]
    fs.current_min_act_dist = sc["current_min_act_dist"]
    fs.ignore_kf = bool(sc["ignore_kf"])
    fs.initialized = bool(sc["initialized"])
    fs.is_lost = bool(sc["is_lost"])
    fs.init_failed = bool(sc["init_failed"])
    fs.track_ref_slot = int(sc["track_ref_slot"])
    fs._rng_key = jax.random.wrap_key_data(np.array(z["rng_key"]))

    # rebuild per-slot pyramids (gradients re-derived from intensities)
    intens = z["dI0_stack"]
    for slot in fs.order:
        dI, _ = make_images(jnp.asarray(intens[slot]), fs.levels)
        fs.pyr_slots[slot] = dI
        fs.flat_slots[slot] = flatten_pyramid(dI)
        fs.dI0_stack = fs.dI0_stack.at[slot].set(dI[0])

    # rebuild the coarse tracking reference from the stored window state
    if fs.order and fs.track_ref_slot >= 0 and \
            fs.pyr_slots[fs.track_ref_slot] is not None:
        fs._set_coarse_tracking_ref(fs.track_ref_slot)
    return fs
