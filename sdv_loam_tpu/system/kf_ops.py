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

from sdv_loam_tpu.models import backend
from sdv_loam_tpu.models.matcher import (reproject_and_match,
                                         reproject_and_match_multi)
from sdv_loam_tpu.ops import trace as trace_ops
from sdv_loam_tpu.ops.distmap import distance_map
from sdv_loam_tpu.ops.photometric import build_track_ref, splat_idepth
from sdv_loam_tpu.utils import se3


def _activate_full_impl(
        # immature pool: device-resident dict (IM_FIELDS + im_valid)
        im,
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
    im_u, im_v = im["u"], im["v"]
    im_idepth_min, im_idepth_max = im["idepth_min"], im["idepth_max"]
    im_status, im_quality = im["status"], im["quality"]
    im_pixel_interval, im_host = im["pixel_interval"], im["host"]
    im_is_sensor, im_color, im_weights = im["is_sensor"], im["color"], \
        im["weights"]
    im_energy_th, im_my_type, im_valid = im["energy_th"], im["my_type"], \
        im["im_valid"]
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

    # in-program immature-pool removal (mirrors the host bookkeeping:
    # dead/kill/drop_oob plus every processed activation lane); status is
    # forced OOB at freed rows so chained trace programs skip them
    lanes = jnp.zeros((M,), bool).at[
        jnp.where(lane_valid, cidx, M)].set(True, mode="drop")
    im_valid_new = im_valid & ~(dead | kill | drop_oob) & ~lanes
    im_status_new = jnp.where(im_valid & ~im_valid_new,
                              trace_ops.IPS_OOB, im_status)

    return dict(dead=dead, kill=kill, drop_oob=drop_oob, keep=keep,
                cand_idx=cidx, lane_valid=lane_valid,
                success=out["success"] & lane_valid, idepth=out["idepth"],
                inlier_targets=out["inlier_targets"],
                im_valid=im_valid_new, im_status=im_status_new)


def _kf_opt_step_impl(
        # window state
        T_cw_fej, eps, calib, calib_zero, frame_valid, frame_prior, c_prior,
        aff, exposure, HM, bM, newest, frame_energy_th, slot_flagged,
        # point pool (N,)
        pt_u, pt_v, pt_idepth, pt_host, pt_color, pt_weights, pt_is_sensor,
        pt_prior, pt_valid, pt_type, pt_quality, pt_idepth_hessian,
        num_good_res, res_active, res_state, res_is_new,
        matcher_px, matcher_valid, dI0_stack,
        # matcher inputs
        flat_newest, offs, widths, heights, flat_slots_stack,
        ref_idx_newest, ref_idx_multi, multi_target_mask,
        # newest-frame pyramid (tuple of levels) for the tracking reference
        dI_newest_pyr,
        # LM params
        max_iters, min_opt_iterations, th_opt_iterations, force_accept,
        lm_diag_floor,
        # marg params
        prior_marg, marg_weight_fac, min_good_active_res_for_marg,
        min_good_res_for_marg, min_idepth_h_marg,
        n_frames: int, w: int, h: int, max_level: int, levels: int,
        track_ref_cap=16384, gate_refresh: bool = False,
        resf_at_fej: bool = True, p1_cap: int = 0, p2_cap: int = 0,
        closest_view: bool = False, closest_view_margin=0.0,
        closest_view_sensor_only=False):
    """The whole post-activation keyframe tail as ONE device program:

      matcher refresh (backprojectMap passes, FullSystem.cpp:1105-1131)
      -> windowed LM (FullSystem::optimize)
      -> removeOutliers (FullSystemOptimize.cpp:524-546)
      -> tracking-reference depth splat (makeCoarseDepthL0)
      -> flagPointsForRemoval + marginalizePointsF (FullSystem.cpp:730-820)
      -> frame marginalization of flagged slots (marginalizeFrame).

    Round 1 ran these as 5 separate dispatch+readback pairs per keyframe;
    over the tunneled TPU each readback costs ~30-100 ms, so this fusion is
    the main single-sequence throughput lever (VERDICT r1 item 2).

    Returns one pytree; the host pulls the small control fields and leaves
    the big arrays (track-ref pools, matcher grids) device-resident.
    """
    F = n_frames
    N = pt_u.shape[0]
    fvalid_f = frame_valid.astype(T_cw_fej.dtype)

    # ---- current-state pose stacks for the matcher ----
    T_cw = jnp.einsum("fij,fjk->fik", se3.se3_exp(eps), T_cw_fej)
    T_wc = se3.inverse(T_cw)
    T_wc_newest = T_wc[newest]
    aff_newest = aff[newest]
    exp_newest = exposure[newest]

    # ---- matcher pass 1: ALL old-host points -> newest frame ----
    # per_cell=False: the reference refreshes with one per-cell grid per
    # (host frame, target) pair (makeKeyFrame:1105-1117); a single
    # mixed-host grid starves the residual graph ~F-fold and long-run yaw
    # drift diverges. Matching every point is the batched superset (and
    # supersedes the tracking-time per-cell match cache, which the
    # reference never writes into pt->matcher either: backup=true only in
    # backprojectMap, Reprojector.cpp:161).
    hf = pt_valid & (pt_host != newest)
    fresh = reproject_and_match(
        pt_u, pt_v, pt_idepth, pt_host, pt_type, hf, pt_quality,
        pt_is_sensor,
        T_wc, aff, exposure, dI0_stack, flat_newest, offs, widths, heights,
        T_wc_newest, aff_newest, exp_newest, calib, ref_idx_newest,
        w=w, h=h, max_level=max_level, per_cell=False,
        # host buckets p1_cap to the exact live old-host count; the frac is
        # the fallback for callers without a host mirror
        lane_cap_frac=0.625, lane_cap=p1_cap,
        closest_view=closest_view, frame_valid=frame_valid.astype(bool),
        exclude_slot=newest, closest_view_margin=closest_view_margin,
        closest_view_sensor_only=closest_view_sensor_only)
    upd_fresh = fresh["matched"] & hf
    matcher_px = jnp.where(upd_fresh[:, None, None]
                           & (jnp.arange(F)[None, :, None] == newest),
                           fresh["px"][:, None, :], matcher_px)
    matcher_valid = matcher_valid | (upd_fresh[:, None]
                                     & (jnp.arange(F)[None, :] == newest))

    # ---- matcher pass 2: newest-host points -> each older frame ----
    nf = pt_valid & (pt_host == newest)
    multi = reproject_and_match_multi(
        pt_u, pt_v, pt_idepth, pt_host, pt_type, nf, pt_quality,
        pt_is_sensor,
        T_wc, aff, exposure, dI0_stack, flat_slots_stack, offs, widths,
        heights, T_wc, aff, exposure, calib, ref_idx_multi,
        w=w, h=h, max_level=max_level, per_cell=False,
        closest_view=closest_view, frame_valid=frame_valid.astype(bool),
        exclude_slots=jnp.arange(F, dtype=jnp.int32),
        closest_view_margin=closest_view_margin,
        closest_view_sensor_only=closest_view_sensor_only,
        # host buckets p2_cap to the exact newest-host (activation) count —
        # measured ~150-500 steady state vs the 2048 worst-case burst the
        # frac covers; an undersized static cap silently starved residuals
        # in round 2 (ADVICE r2), so the host bucket always covers the
        # live count exactly
        lane_cap_frac=0.5, lane_cap=p2_cap)
    mm = multi["matched"].swapaxes(0, 1) & nf[:, None] \
        & multi_target_mask[None, :]                       # (N, F)
    mpx = multi["px"].swapaxes(0, 1)                       # (N, F, 2)
    matcher_px = jnp.where(mm[..., None], mpx, matcher_px)
    matcher_valid = matcher_valid | mm
    res_active = res_active | mm
    res_is_new = res_is_new | mm

    # ---- windowed LM ----
    res_active_v = res_active & pt_valid[:, None]
    out, lin_f, pairs_f = backend.ba_core(
        T_cw_fej, eps, calib, calib_zero, frame_valid, frame_prior, c_prior,
        aff, exposure, HM, bM, newest, frame_energy_th,
        pt_u, pt_v, pt_idepth, pt_host, pt_color, pt_weights, pt_is_sensor,
        pt_prior, res_active_v, res_state, matcher_px, matcher_valid,
        dI0_stack, max_iters, min_opt_iterations, th_opt_iterations,
        force_accept, n_frames=F, w=w, h=h, gate_refresh=gate_refresh,
        resf_at_fej=resf_at_fej, lm_diag_floor=lm_diag_floor)
    new_state = out["new_state"]
    idepth_f = out["idepth"]
    Hdd_f = out["Hdd"]
    centers = out["center"]

    # numGoodResiduals bookkeeping (applyRes / FullSystemOptimize.cpp:46)
    good_new = (new_state == backend.RES_IN) & res_is_new
    num_good_res = num_good_res + good_new.sum(axis=1)

    # residual-fate diagnostics (matcher-health forensics, VERDICT r4 #3):
    # of the residuals active entering this KF's BA, how many survived vs
    # died and WHY — geometric (projection OOB), unmatched (no aligner
    # match), or photometric (outlier-gate kill) — split new (inserted
    # this KF) vs old (carried from earlier KFs). Layout (2, 4):
    #   rows: [new, old]; cols: [kept_IN, oob_proj, oob_unmatched, outlier]
    _st_in = new_state == backend.RES_IN
    _st_oob = new_state == backend.RES_OOB
    _st_out = new_state == backend.RES_OUTLIER
    _mv = matcher_valid

    def _fates(sel):
        a = res_active_v & sel
        return jnp.stack([(a & _st_in).sum(), (a & _st_oob & _mv).sum(),
                          (a & _st_oob & ~_mv).sum(), (a & _st_out).sum()])

    res_diag = jnp.stack([_fates(res_is_new), _fates(~res_is_new)])

    # ---- removeOutliers: drop non-IN residuals, then point-less points ----
    keep_res = res_active_v & (new_state == backend.RES_IN)
    matcher_valid = matcher_valid & ~(res_active_v
                                      & (new_state != backend.RES_IN))
    res_active2 = keep_res
    pt_dead_outlier = pt_valid & ~res_active2.any(axis=1)
    pt_valid2 = pt_valid & ~pt_dead_outlier

    # ---- tracking reference (makeCoarseDepthL0) from post-BA state ----
    hdif = 1.0 / jnp.maximum(Hdd_f, 1e-10)
    wgt_splat = jnp.sqrt(1e-3 / (hdif + 1e-12))
    m_new = pt_valid2 & pt_is_sensor & (pt_host == newest)
    m_oth = pt_valid2 & pt_is_sensor & (pt_host != newest) \
        & res_active2[jnp.arange(N), jnp.broadcast_to(newest, (N,))]
    c_new = centers[jnp.arange(N), jnp.broadcast_to(newest, (N,))]  # (N, 3)
    su = jnp.where(m_new, pt_u.astype(jnp.int32),
                   (c_new[:, 0] + 0.5).astype(jnp.int32))
    sv = jnp.where(m_new, pt_v.astype(jnp.int32),
                   (c_new[:, 1] + 0.5).astype(jnp.int32))
    sid = jnp.where(m_new, idepth_f, c_new[:, 2])
    sok = (m_new | m_oth) & (su >= 0) & (su < w) & (sv >= 0) & (sv < h) \
        & (sid > 0)
    id0, w0 = splat_idepth(su, sv, sid, wgt_splat, sok, w, h)
    track_ref = build_track_ref(dI_newest_pyr, id0, w0, levels,
                                cap=track_ref_cap)

    # ---- flagPointsForRemoval (vectorized over old-host points) ----
    n_res = res_active2.sum(axis=1)
    host_old = pt_valid2 & (pt_host != newest) & frame_valid[
        jnp.clip(pt_host, 0, F - 1)]
    bad = host_old & ((idepth_f < 0) | (n_res == 0))
    rest = host_old & ~bad
    newest_ok = res_active2[jnp.arange(N), jnp.broadcast_to(newest, (N,))]
    oob = rest & (slot_flagged[jnp.clip(pt_host, 0, F - 1)]
                  | ((n_res >= min_good_active_res_for_marg)
                     & (num_good_res > min_good_res_for_marg + 10)
                     & (~newest_ok)))
    inlier = (n_res >= min_good_active_res_for_marg) \
        & (num_good_res >= min_good_res_for_marg)
    strong = inlier & (Hdd_f > min_idepth_h_marg)
    marg = oob & strong
    drop = bad | (oob & ~strong)

    # ---- marginalizePointsF on the final linearization ----
    dHM, dbM = backend.marginalize_points(
        lin_f, pt_host, pt_is_sensor, prior_marg, marg,
        out["eps"] * fvalid_f[:, None], jnp.zeros(4, calib.dtype), pairs_f,
        n_frames=F, marg_weight_fac=marg_weight_fac)
    HM2 = HM + dHM
    bM2 = bM + dbM

    pt_dead_marg = drop | marg
    pt_valid3 = pt_valid2 & ~pt_dead_marg
    res_active3 = res_active2 & pt_valid3[:, None]

    # ---- frame marginalization of flagged slots ----
    # drop residuals/points attached to flagged slots first
    res_active3 = res_active3 & ~slot_flagged[None, :]
    matcher_valid = matcher_valid & ~slot_flagged[None, :]
    pt_dead_frame = pt_valid3 & slot_flagged[jnp.clip(pt_host, 0, F - 1)]
    pt_valid4 = pt_valid3 & ~pt_dead_frame

    # point-death causes per KF (matcher-health forensics):
    #   [0] residual-less after removeOutliers
    #   [1] bad (idepth<0 or no residuals at flag time)
    #   [2] flagged-host exits (host frame being marginalized), weak+strong
    #   [3] RETIREMENT exits: enough history but no newest-frame residual
    #       (the visible-but-unmatched early-death channel)
    #   [4] host-frame-marginalization leftovers
    _flag_exit = jnp.array(slot_flagged)[jnp.clip(pt_host, 0, F - 1)]
    death_diag = jnp.stack([
        pt_dead_outlier.sum(), bad.sum(),
        ((drop | marg) & _flag_exit).sum(),
        ((drop | marg) & ~_flag_exit & ~bad).sum(),
        pt_dead_frame.sum()]).astype(jnp.int32)

    def marg_one(slot, carry):
        HMc, bMc = carry
        HMn, bMn = backend.marginalize_frame(
            HMc, bMc, frame_prior[slot], out["eps"][slot], slot, n_frames=F)
        return jax.lax.cond(slot_flagged[slot], lambda: (HMn, bMn),
                            lambda: (HMc, bMc))

    HM3, bM3 = jax.lax.fori_loop(0, F, marg_one, (HM2, bM2))

    # per-slot removal stats (slot_stats_out bookkeeping)
    host_oh = jax.nn.one_hot(jnp.clip(pt_host, 0, F - 1), F,
                             dtype=jnp.int32)
    stats_out = ((pt_dead_outlier | pt_dead_marg)[:, None]
                 * host_oh).sum(axis=0)

    return dict(
        # window state (small)
        eps=out["eps"], calib=out["calib"], T_cw_fej=out["T_cw_fej"],
        feth=out["feth"], energy=out["energy"], rmse=out["rmse"],
        HM=HM3, bM=bM3, stats_out=stats_out,
        # matcher lane-cap truncation counts: [pass1, worst pass-2 target]
        match_overflow=jnp.stack([fresh["overflow"],
                                  multi["overflow"].max()]),
        # pass-1 failure-mode split: [in-bounds, ref-valid, aligned]
        match_diag=fresh["diag"],
        # pass-2 split summed over targets
        match_diag_p2=multi["diag"].sum(axis=0),
        # residual fates through this KF's BA (see _fates above)
        res_diag=res_diag,
        # point-death causes (see death_diag above)
        death_diag=death_diag,
        # pool state
        idepth=idepth_f, new_state=new_state, pt_valid=pt_valid4,
        center=centers,
        num_good_res=num_good_res, idepth_hessian=Hdd_f,
        res_active=res_active3, matcher_px=matcher_px,
        matcher_valid=matcher_valid,
        # deep-log exports (pulled only when settings.log_stuff)
        H_final=out["H_final"], b_final=out["b_final"],
        nullspaces=out["nullspaces"],
        # device-resident consumers
        track_ref=track_ref,
    )


_ACT_STATICS = ("w", "h", "w1", "h1", "n_frames", "a_cap", "gn_iters")

activate_full = partial(jax.jit,
                        static_argnames=_ACT_STATICS)(_activate_full_impl)


@partial(jax.jit, static_argnames=_ACT_STATICS)
def activate_full_batch(args_b, *, w: int, h: int, w1: int, h1: int,
                        n_frames: int, a_cap: int, gn_iters: int = 3):
    """B-sequence fleet activation: vmap of activate_full over a leading
    batch axis (see kf_opt_step_batch for the amortization rationale).

    `args_b`: tuple over B sequences of per-lane positional-arg tuples;
    the stack happens INSIDE the jit so it fuses into the batched program
    instead of dispatching ~20 eager stack ops per round (each eager op is
    its own ~5 ms device program over the tunnel, CLAUDE.md)."""
    args = jax.tree.map(lambda *xs: jnp.stack(xs), *args_b)

    def one(*a):
        return _activate_full_impl(*a, w=w, h=h, w1=w1, h1=h1,
                                   n_frames=n_frames, a_cap=a_cap,
                                   gn_iters=gn_iters)

    return jax.vmap(one)(*args)


_KF_STATICS = ("n_frames", "w", "h", "max_level", "levels", "track_ref_cap",
               "gate_refresh", "resf_at_fej", "p1_cap", "p2_cap",
               "closest_view")

kf_opt_step = partial(jax.jit, static_argnames=_KF_STATICS)(_kf_opt_step_impl)


@partial(jax.jit, static_argnames=_KF_STATICS)
def kf_opt_step_batch(args_b, *,
                      n_frames: int, w: int, h: int, max_level: int,
                      levels: int, track_ref_cap=16384,
                      gate_refresh: bool = False, resf_at_fej: bool = True,
                      p1_cap: int = 0, p2_cap: int = 0,
                      closest_view: bool = False, closest_view_margin=0.0,
                      closest_view_sensor_only=False):
    """B-sequence fleet keyframe tail: vmap of the whole kf_opt_step program
    over a leading batch axis (every traced argument carries one, including
    per-sequence scalars like `newest` and `max_iters`).

    The single-sequence program is dominated by per-gather-op floors in the
    matcher passes and the track-ref rebuild (ROADMAP round-3 perf
    findings: pass2 ~265 + pass1 ~183 + track_ref ~172 ms with ba_core
    itself at 30 ms), so folding B sequences into the SAME ops amortizes
    the dominant cost — the lockstep fleet driver uses this instead of B
    separate programs. Under vmap the LM `lax.while_loop` runs fleet-max
    iterations with converged lanes' carries masked (bit-identical
    results).

    `args_b`: tuple over B sequences of per-lane positional-arg tuples;
    stacking happens INSIDE the jit (one fused program, not ~50 eager
    stack dispatches per round)."""
    args = jax.tree.map(lambda *xs: jnp.stack(xs), *args_b)

    def one(*a):
        return _kf_opt_step_impl(
            *a, n_frames=n_frames, w=w, h=h, max_level=max_level,
            levels=levels, track_ref_cap=track_ref_cap,
            gate_refresh=gate_refresh, resf_at_fej=resf_at_fej,
            p1_cap=p1_cap, p2_cap=p2_cap, closest_view=closest_view,
            closest_view_margin=closest_view_margin,
            closest_view_sensor_only=closest_view_sensor_only)

    return jax.vmap(one)(*args)


POOL_FIELDS = ("u", "v", "idepth", "host", "color", "weights", "is_sensor",
               "prior", "type", "quality")


@jax.jit
def commit_pool_kf(pool, slot, act_rows, act_valid, act_vals, act_res):
    """Apply the between-keyframe host mutations to the DEVICE-resident
    active-point pool in one dispatch (VERDICT r3 item 2: the keyframe
    stage spent ~730 ms/KF re-staging ~40 full pool arrays over the tunnel;
    with the pool device-resident only the new-activation rows travel).

    Mutations covered (bit-equal to FullSystem's host bookkeeping):
      1. residual insertion: every existing valid point gains an active
         RES_IN residual toward the new `slot` (makeKeyFrame:1086-1100);
      2. activation-row insert at `act_rows` (padded; `act_valid` lanes)
         with field values `act_vals` (dict over POOL_FIELDS) and the
         host-computed per-target residual rows `act_res` (R, F).

    `pool`: dict of POOL_FIELDS + num_good_res, idepth_hessian, pt_valid,
    res_active, res_state, res_is_new, matcher_px, matcher_valid.
    """
    N = pool["u"].shape[0]

    # --- 1. residual insertion for existing points (before inserts) ---
    ins = pool["pt_valid"] & (pool["host"] != slot)
    res_active = pool["res_active"].at[:, slot].set(ins)
    res_state = pool["res_state"].at[:, slot].set(backend.RES_IN)
    res_is_new = jnp.zeros_like(pool["res_is_new"]).at[:, slot].set(ins)
    matcher_valid = pool["matcher_valid"].at[:, slot].set(False)

    # --- 2. activation-row inserts ---
    rows = jnp.where(act_valid, act_rows, N)   # drop-mode sentinel
    out = dict(pool)
    for f in act_vals:
        out[f] = pool[f].at[rows].set(act_vals[f], mode="drop")
    out["num_good_res"] = pool["num_good_res"].at[rows].set(0, mode="drop")
    out["pt_valid"] = pool["pt_valid"].at[rows].set(True, mode="drop")
    out["res_active"] = res_active.at[rows].set(act_res, mode="drop")
    out["res_is_new"] = res_is_new.at[rows].set(act_res, mode="drop")
    out["res_state"] = res_state.at[rows].set(backend.RES_IN, mode="drop")
    out["matcher_valid"] = matcher_valid.at[rows].set(False, mode="drop")
    return out


IM_FIELDS = ("u", "v", "idepth_min", "idepth_max", "host", "status",
             "quality", "color", "weights", "gradH", "energy_th",
             "is_sensor", "pixel_interval", "my_type")


@jax.jit
def commit_im_rows(pool, rows, valid, vals):
    """Insert new immature points (makeNewTraces) into the DEVICE-resident
    immature pool: one dispatch, only the new rows travel."""
    M = pool["u"].shape[0]
    r = jnp.where(valid, rows, M)
    out = dict(pool)
    for f in vals:
        out[f] = pool[f].at[r].set(vals[f], mode="drop")
    out["im_valid"] = pool["im_valid"].at[r].set(True, mode="drop")
    return out


@jax.jit
def im_clear_slots(pool, slot_mask):
    """Invalidate immature points hosted at marginalized slots (the host
    bookkeeping loop in _kf_opt_steps); status forced OOB so the chained
    trace programs skip the freed rows."""
    F = slot_mask.shape[0]
    dead = slot_mask[jnp.clip(pool["host"], 0, F - 1)] & pool["im_valid"]
    return dict(pool, im_valid=pool["im_valid"] & ~dead,
                status=jnp.where(dead, trace_ops.IPS_OOB, pool["status"]))
