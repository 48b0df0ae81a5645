"""Fused keyframe device stages.

Each function here is ONE device program covering a whole keyframe stage
that round 1 ran as several dispatch+readback pairs. Over the remote-TPU
link a host sync costs ~30-100 ms, so the keyframe pipeline's cost is
dominated by the number of `jax.device_get` calls, not FLOPs
(CLAUDE.md perf notes). Stage fusion plan:

  * activate_full — activatePointsMT (FullSystem.cpp:569-723) in one
    program: level-1 distance map from projected actives
    (CoarseDistanceMap::makeDistanceMap, CoarseTracker.cpp:1139-1175),
    eligibility/delete flags, the spread test, and the batched activation
    depth-GN (FullSystemOptPoint.cpp:18-183). One readback per keyframe
    instead of two plus host-side projection math.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from sdv_loam_tpu.ops import trace as trace_ops
from sdv_loam_tpu.ops.distmap import distance_map


@partial(jax.jit, static_argnames=("w", "h", "w1", "h1", "n_frames", "a_cap",
                                   "gn_iters"))
def activate_full(
        # immature pool (M,)
        im_u, im_v, im_idepth_min, im_idepth_max, im_status, im_quality,
        im_pixel_interval, im_host, im_is_sensor, im_color, im_weights,
        im_energy_th, im_my_type, im_valid,
        # active pool (distance-map seeds)
        pt_u, pt_v, pt_idepth, pt_host, pt_valid,
        # frame state
        newest_slot, slot_used, slot_flagged,
        KRKi1, Kt1,                 # (F,3,3)/(F,3) host->newest on LEVEL 1
        R_pair, t_pair, aff_pair,   # (F*F, ...) pair transforms (level 0)
        dI0_stack, K,
        min_act_dist, min_trace_quality, min_idepth_h_act,
        w: int, h: int, w1: int, h1: int, n_frames: int, a_cap: int,
        gn_iters: int = 3):
    """activatePointsMT as one device program.

    Returns dict:
      dead/kill/drop_oob: (M,) immature-pool removal masks (with the same
        semantics as the host logic they replace);
      cand_idx (a_cap,), lane_valid (a_cap,): compacted activation batch;
      success, idepth, inlier_targets: activation GN results per lane.
    """
    F = n_frames
    M = im_u.shape[0]

    # --- level-1 distance map from projected active points (excl. newest) ---
    pm = pt_valid & (pt_host != newest_slot)
    p = jnp.stack([pt_u, pt_v, jnp.ones_like(pt_u)], -1)
    KR = KRKi1[jnp.clip(pt_host, 0, F - 1)]
    Kt = Kt1[jnp.clip(pt_host, 0, F - 1)]
    ptp = jnp.einsum("nij,nj->ni", KR, p) + Kt * pt_idepth[:, None]
    uu = (ptp[:, 0] / ptp[:, 2] + 0.5).astype(jnp.int32)
    vv = (ptp[:, 1] / ptp[:, 2] + 0.5).astype(jnp.int32)
    dmap = distance_map(uu, vv, pm & (uu > 0) & (vv > 0) & (uu < w1)
                        & (vv < h1), w1, h1)

    # --- eligibility (activatePointsMT:605-660) ---
    eligible = im_valid & ~((~im_is_sensor) & (im_host == newest_slot))
    dead = eligible & ((~jnp.isfinite(im_idepth_max))
                       | (im_status == trace_ops.IPS_OUTLIER))
    eligible = eligible & ~dead
    can = ((im_status == trace_ops.IPS_GOOD)
           | (im_status == trace_ops.IPS_SKIPPED)
           | (im_status == trace_ops.IPS_BADCONDITION)
           | (im_status == trace_ops.IPS_OOB))
    can = can & (im_pixel_interval < 8) & (im_quality > min_trace_quality) \
        & ((im_idepth_max + im_idepth_min) > 0)
    cannot = eligible & ~can
    kill = cannot & (slot_flagged[jnp.clip(im_host, 0, F - 1)]
                     | (im_status == trace_ops.IPS_OOB))
    cand = eligible & can

    # --- spread test on the level-1 distance map (:684-719) ---
    mid = 0.5 * (jnp.clip(im_idepth_max, 0, 1e6) + im_idepth_min)
    pim = jnp.stack([im_u, im_v, jnp.ones_like(im_u)], -1)
    KRi = KRKi1[jnp.clip(im_host, 0, F - 1)]
    Kti = Kt1[jnp.clip(im_host, 0, F - 1)]
    ptpi = jnp.einsum("nij,nj->ni", KRi, pim) + Kti * mid[:, None]
    ui = ptpi[:, 0] / ptpi[:, 2]
    vi = ptpi[:, 1] / ptpi[:, 2]
    uii = (ui + 0.5).astype(jnp.int32)
    vii = (vi + 0.5).astype(jnp.int32)
    inb = (uii > 0) & (vii > 0) & (uii < w1) & (vii < h1)
    dist = dmap[jnp.clip(vii, 0, h1 - 1), jnp.clip(uii, 0, w1 - 1)] \
        + (ui - jnp.floor(ui))
    keep = cand & inb & (dist >= min_act_dist * im_my_type)
    drop_oob = cand & ~inb          # out of level-1 bounds -> delete (:714-718)

    # --- compact the activation batch ---
    (cidx,) = jnp.nonzero(keep, size=a_cap, fill_value=M - 1)
    lane_valid = jnp.arange(a_cap) < keep.sum()

    id_init = mid[cidx]
    out = trace_ops.activate_points(
        im_u[cidx], im_v[cidx], id_init, im_color[cidx], im_weights[cidx],
        im_host[cidx], im_is_sensor[cidx], lane_valid, slot_used,
        R_pair, t_pair, aff_pair, dI0_stack, K, im_energy_th[cidx],
        w=w, h=h, n_frames=F, min_idepth_h_act=min_idepth_h_act,
        min_obs=1, gn_iters=gn_iters)

    return dict(dead=dead, kill=kill, drop_oob=drop_oob, keep=keep,
                cand_idx=cidx, lane_valid=lane_valid,
                success=out["success"] & lane_valid, idepth=out["idepth"],
                inlier_targets=out["inlier_targets"])
