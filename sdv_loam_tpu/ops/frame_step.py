"""Fused per-frame tracking step — one device program per frame.

Composes the full frame-tracking pipeline of the reference
(FullSystem::trackNewCoarse, FullSystem.cpp:283-517) into a single jit:

  1. batched LM of all pose hypotheses on the coarsest pyramid level
     (the 31-try retry ladder, :341-398);
  2. device-side winner selection (constant-motion hypothesis preferred when
     competitive — the reference tries it first and early-accepts);
  3. full coarse-to-fine photometric refinement of the winner
     (trackNewestCoarse);
  4. Reprojector matching of the window map into the new frame at the
     refined pose (reprojectMap, :483-485);
  5. struct (reprojection) pose LM with Tukey weights
     (structPoseEstimation, :488).

Host reads back one pytree: refined pose, camToWorld after struct pose,
flow indicators, per-level residuals, ok flag, match count.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from sdv_loam_tpu.models.matcher import reproject_and_match
from sdv_loam_tpu.ops.photometric import (aff_transfer, calc_res_gs,
                                          track_coarsest_batch, track_pyramid)
from sdv_loam_tpu.ops.struct_pose import struct_pose_estimate
from sdv_loam_tpu.utils import se3


_TRACK_STATIC = ("coarsest_lvl", "w", "h", "max_level", "n_refine",
                 "use_struct_pose", "struct_pose_mad", "closest_view")


def _track_frame_step_impl(pools, dI_new_pyr, flat_new, offsets, widths,
                           heights,
                           Ks, T_tries, try_exclude, aff_last, ref_aff,
                           exposures,
                           min_res_for_abort, ref_T_wc,
                           pt_u, pt_v, pt_idepth, pt_host, pt_type, pt_valid,
                           pt_quality, pt_is_sensor,
                           T_wc_stack, aff_stack, exposure_stack,
                           dI0_stack, ref_idx_per_point, frame_valid, K0,
                           cutoff_th, huber_th,
                           coarsest_lvl: int, w: int, h: int, max_level: int,
                           n_refine: int = 3, use_struct_pose: bool = True,
                           struct_pose_mad: bool = False,
                           struct_pose_e_tol: float = 1.5,
                           struct_pose_max_dt: float = 0.0,
                           closest_view: bool = False,
                           closest_view_margin=0.0,
                           closest_view_sensor_only=False):
    """Returns dict(T_ref_to_fh, T_wc, aff, res, flow, ok, n_matched,
    best_try) — `try_exclude` masks hypotheses already consumed by a host
    retry (the reference's achievedRes re-track ladder, trackNewCoarse:446)."""
    # 1. batched hypothesis ladder on the coarsest level
    cb = track_coarsest_batch(pools[coarsest_lvl], dI_new_pyr[coarsest_lvl],
                              Ks[coarsest_lvl], T_tries, aff_last, ref_aff,
                              exposures, cutoff_th, huber_th)
    e = jnp.where(cb["n"] > 20, cb["E"] / jnp.maximum(cb["n"], 1), jnp.inf)
    e = jnp.where(jnp.isfinite(e) & (~try_exclude), e, jnp.inf)
    # prefer hypothesis 0 (constant motion) when within 5% of the best
    first = jnp.argmin(e)
    first = jnp.where((e[0] <= e[first] * 1.05) & (~try_exclude[0]), 0, first)

    # 2. full-pyramid refinement of the top candidates in parallel; keep
    # the one with the lowest level-0 residual (the reference's achievedRes
    # bookkeeping across its sequential re-track attempts,
    # trackNewCoarse:429-457). A split refinement (candidates on coarse
    # levels only, winner-only on the fine levels) was tried and REGRESSES
    # rotation RPE ~20% — coarse-level residuals mis-rank candidates — so
    # every candidate descends the full pyramid (split=0).
    _, top = jax.lax.top_k(-e.at[first].set(-jnp.inf), max(n_refine, 1))
    cand_idx = jnp.concatenate([first[None], top[1:]]) if n_refine > 1 \
        else first[None]

    split = 0

    def refine_coarse(T0):
        return track_pyramid(pools, dI_new_pyr, Ks, T0, aff_last, ref_aff,
                             exposures, min_res_for_abort, cutoff_th,
                             huber_th, coarsest_lvl=coarsest_lvl,
                             finest_lvl=split)

    trs = jax.vmap(refine_coarse)(cb["T"][cand_idx])
    score = jnp.where(trs["ok"] & jnp.isfinite(trs["res"][:, split]),
                      trs["res"][:, split], jnp.inf)
    # small bias toward the first (constant-motion-preferred) candidate
    bias = jnp.full((max(n_refine, 1),), 1.02).at[0].set(1.0)
    score = score * bias
    kbest = jnp.argmin(score)
    tr = jax.tree.map(lambda x: x[kbest], trs)
    best = cand_idx[kbest]
    if split > 0:
        fine = track_pyramid(pools, dI_new_pyr, Ks, tr["T"], tr["aff"],
                             ref_aff, exposures, min_res_for_abort,
                             cutoff_th, huber_th, coarsest_lvl=split - 1,
                             finest_lvl=0)
        tr = dict(T=fine["T"], aff=fine["aff"],
                  res=jnp.where(jnp.isnan(fine["res"]), tr["res"],
                                fine["res"]),
                  flow=fine["flow"], ok=tr["ok"] & fine["ok"],
                  lvl_iters=tr["lvl_iters"] + fine["lvl_iters"])
    T_ref2fh = tr["T"]
    T_wc_fh = ref_T_wc @ se3.inverse(T_ref2fh)

    # 3. semi-direct matching of the window map into the new frame
    match = reproject_and_match(
        pt_u, pt_v, pt_idepth, pt_host, pt_type, pt_valid, pt_quality,
        pt_is_sensor, T_wc_stack, aff_stack, exposure_stack, dI0_stack,
        flat_new, offsets, widths, heights,
        T_wc_fh, tr["aff"], exposures[1], K0, ref_idx_per_point,
        w=w, h=h, max_level=max_level, closest_view=closest_view,
        frame_valid=frame_valid, closest_view_margin=closest_view_margin,
        closest_view_sensor_only=closest_view_sensor_only)
    n_matched = match["matched"].sum()

    # 4. struct pose refinement against the matched pixels
    fx, fy, cx, cy = K0[0], K0[1], K0[2], K0[3]
    xn = (pt_u - cx) / fx
    yn = (pt_v - cy) / fy
    pr = jnp.stack([xn, yn, jnp.ones_like(xn)], -1) / \
        jnp.maximum(pt_idepth, 1e-9)[:, None]
    T_wc_h = T_wc_stack[jnp.clip(pt_host, 0, T_wc_stack.shape[0] - 1)]
    pw = jnp.einsum("nij,nj->ni", T_wc_h[:, :3, :3], pr) + T_wc_h[:, :3, 3]
    sp = struct_pose_estimate(T_wc_fh, pw, match["px"], match["matched"],
                              K0, w, h, standardize=struct_pose_mad)
    # Photometric veto of the struct pose: the stage's matched pixels are a
    # derived (self-seeded) measurement; the photometric image alignment is
    # the independent one. Accept the struct correction only if the stage-1
    # energy at the corrected pose stays within `struct_pose_e_tol` of the
    # accepted photometric optimum (evaluated on LEVEL 1, same cutoff and
    # brightness transfer for both poses). Measured on 200 straight
    # KITTI-scale frames (tools/drift_bisect.py round-3 struct-pose pass):
    # without a veto the stage's forward push grows to +1.9 m/frame and the
    # trajectory runs away (ATE 41 m with the reference's raw Tukey, 13 m
    # MAD-standardized, vs 0.99 m stage-off); runaway poses sit meters off
    # the photometric optimum (energy ratio >> tol) while legitimate
    # corrections are near-optimal.
    T_sp = sp["T_cur_to_world"]
    aff_rel = aff_transfer(exposures[0], exposures[1], ref_aff, tr["aff"])
    gate_lvl = 1
    T_ref2sp = se3.mul(se3.inverse(T_sp), ref_T_wc)
    r_fh = calc_res_gs(pools[gate_lvl], dI_new_pyr[gate_lvl], Ks[gate_lvl],
                       se3.mul(se3.inverse(T_wc_fh), ref_T_wc), aff_rel,
                       ref_aff[1], cutoff_th, huber_th)
    r_sp = calc_res_gs(pools[gate_lvl], dI_new_pyr[gate_lvl], Ks[gate_lvl],
                       T_ref2sp, aff_rel, ref_aff[1], cutoff_th, huber_th)
    e_fh = r_fh["E"] / jnp.maximum(r_fh["n"], 1)
    e_sp = r_sp["E"] / jnp.maximum(r_sp["n"], 1)
    sp_ok = (e_sp <= e_fh * (struct_pose_e_tol * struct_pose_e_tol)) \
        & (r_sp["n"] > 0.5 * r_fh["n"])
    # absolute bound on the stage's translation: the energies above are
    # cutoff-CLAMPED, so once the photometric track itself diverges both
    # poses saturate and the ratio test goes blind — a multi-meter struct
    # "correction" can pass it (500-frame S-curve f414: sp_dz -10.9 m
    # accepted with both energies at the clamp). Legitimate corrections
    # are cm-scale (struct_pose_max_dt=0 disables).
    sp_dt = jnp.linalg.norm(T_sp[:3, 3] - T_wc_fh[:3, 3])
    sp_ok = sp_ok & ((struct_pose_max_dt <= 0.0)
                     | (sp_dt <= struct_pose_max_dt))
    # only adopt the struct pose when enough matches constrain it AND the
    # photometric veto passes
    T_wc_out = jnp.where(use_struct_pose & (n_matched >= 10) & sp_ok,
                         T_sp, T_wc_fh)
    T_wc_out = jnp.where(jnp.isfinite(T_wc_out).all(), T_wc_out, T_wc_fh)

    return dict(T_ref_to_fh=T_ref2fh, T_wc=T_wc_out, aff=tr["aff"],
                res=tr["res"], flow=tr["flow"], ok=tr["ok"],
                n_matched=n_matched, best_try=best,
                matched=match["matched"], match_px=match["px"],
                # per-level LM iterations PAID on device: a vmapped
                # while_loop runs every lane until the slowest converges,
                # so cost = max over refine candidates
                lvl_iters=jnp.max(trs["lvl_iters"], axis=0))


track_frame_step = partial(jax.jit, static_argnames=_TRACK_STATIC)(
    _track_frame_step_impl)


@partial(jax.jit, static_argnames=_TRACK_STATIC)
def track_frame_step_batch(args_b, etol_b, mdt_b,
                           coarsest_lvl: int, w: int, h: int, max_level: int,
                           n_refine: int = 3, use_struct_pose: bool = True,
                           struct_pose_mad: bool = False,
                           closest_view: bool = False,
                           closest_view_margin=0.0,
                           closest_view_sensor_only=False):
    """B-sequence fleet tracking: vmap of the whole per-frame track program
    over a leading batch axis (every traced argument carries one, including
    the per-sequence scalar thresholds as (B,) arrays).

    The single-sequence track program is per-gather-op-floor bound, not
    lane bound (ROADMAP round-3 perf findings: halving the track-ref caps
    moved it 204 -> 193 ms), so folding B sequences into the SAME ops
    amortizes the dominant cost — the lockstep fleet driver
    (system.multi.MultiSystem) uses this instead of B separate programs.
    Under vmap the per-level `lax.while_loop`s run until the slowest
    sequence converges; iterations become fleet-max, which is the same
    trade the in-program candidate refinement already makes.

    `args_b`: tuple over B sequences of per-lane positional-arg tuples;
    `etol_b`/`mdt_b`: (B,) per-sequence struct-pose thresholds. Stacking
    happens INSIDE the jit so it fuses into the batched program instead
    of dispatching ~30 eager stack ops per frame round (each eager op is
    its own ~5 ms device program over the tunnel, CLAUDE.md)."""
    args = jax.tree.map(lambda *xs: jnp.stack(xs), *args_b)

    def one(etol_, mdt_, *a):
        return _track_frame_step_impl(
            *a, coarsest_lvl=coarsest_lvl, w=w, h=h, max_level=max_level,
            n_refine=n_refine, use_struct_pose=use_struct_pose,
            struct_pose_mad=struct_pose_mad,
            struct_pose_e_tol=etol_, struct_pose_max_dt=mdt_,
            closest_view=closest_view,
            closest_view_margin=closest_view_margin,
            closest_view_sensor_only=closest_view_sensor_only)

    return jax.vmap(one)(jnp.asarray(etol_b), jnp.asarray(mdt_b), *args)
