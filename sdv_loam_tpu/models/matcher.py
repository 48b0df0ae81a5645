"""Reprojector — map-point reprojection + direct feature alignment.

Reference: src/FullSystem/Reprojector.{h,cpp}.
  * reprojectPoint (:601-616): project every window map point into the target
    frame, bin into a 25-px grid (boundary 8);
  * reprojectCell (:198-236): one match attempt per cell, candidates ordered
    by gradient norm (pointQualityComparator :188-196);
  * findMatchDirect (:238-293): affine warp from the host frame + align2D
    (corners) / align1D (edgelets) on the best search level;
  * reprojectMap (:117-156) for tracking (target = new frame) and
    backprojectMap (:158-186) at KF time to fill PointHessian::matcher.

TPU-native redesign: all points are processed as one batch. Grid binning and
per-cell winner selection use two scatter-min passes (quality then index —
deterministic tie-break, replacing the reference's random_shuffle cell order
which only mattered for its early-exit match cap). All per-cell winners are
aligned in one batched inverse-compositional pass over a flattened target
pyramid. The reference caps matches at 0.8 x immature density to bound CPU
time (:152-155); the batched version matches every cell — strictly more
observations at no wall-clock cost.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from sdv_loam_tpu.ops.align import (align_batch, best_search_level,
                                    quad_from_flat, warp_affine_patches,
                                    warp_matrix_affine)
from sdv_loam_tpu.utils import se3

CELL_SIZE = 25          # Reprojector::initializeGrid (:100)
PROJ_BOUNDARY = 8       # reprojectPoint (:609)
REF_BOUNDARY = 6        # findMatchDirect (:263): halfpatch+2


def _project(T_wc_inv, pts_world, K):
    fx, fy, cx, cy = K[0], K[1], K[2], K[3]
    pf = pts_world @ T_wc_inv[:3, :3].T + T_wc_inv[:3, 3]
    z = pf[:, 2]
    zs = jnp.where(z == 0, 1e-9, z)
    u = fx * pf[:, 0] / zs + cx
    v = fy * pf[:, 1] / zs + cy
    return jnp.stack([u, v], axis=-1), z


@partial(jax.jit, static_argnames=("w", "h", "max_level", "per_cell",
                                   "lane_cap_frac", "lane_cap",
                                   "closest_view"))
def reproject_and_match(pts_u, pts_v, pts_idepth, pts_host, pts_type,
                        pts_valid, pts_quality, pts_is_sensor,
                        T_wc_stack, aff_stack, exposure_stack,
                        dI0_stack, flat_pyr, offsets, widths, heights,
                        T_wc_target, aff_target, exposure_target,
                        K, ref_idx_per_point,
                        w: int, h: int, max_level: int,
                        per_cell: bool = True,
                        lane_cap_frac: float = 1.0,
                        lane_cap: int = 0,
                        closest_view: bool = False,
                        frame_valid=None,
                        exclude_slot=-1,
                        closest_view_margin=0.0,
                        closest_view_sensor_only=False):
    """Match window map points into a target frame.

    `per_cell=True` keeps the reference's one-match-per-25px-cell limit
    (reprojectCell:198-236) — right for the TRACKING pass feeding struct
    pose. The KF matcher refresh must pass `per_cell=False` (align every
    in-bounds point): the reference runs a SEPARATE per-cell grid for each
    (host frame, target) pair (makeKeyFrame:1105-1117), so its per-target
    coverage is ~n_cells * n_frames; a single mixed-host grid starves the
    residual graph ~F-fold (measured: 1.8 residuals/point instead of ~6,
    which let yaw drift diverge on long S-curves). Matching all points is
    the batched superset of the reference's per-pair passes.

    Args:
      pts_*: (N,) point pool — host pixel, inverse depth, host slot, type
        (0 corner / 1 edgelet), validity, quality (= |grad| at host pixel,
        lower preferred per pointQualityComparator).
      T_wc_stack/aff_stack/exposure_stack: (F, ...) window frame states.
      dI0_stack: (F, H, W, 3) level-0 pyramids of window frames.
      flat_pyr/offsets/widths/heights: flattened TARGET pyramid.
      T_wc_target/aff_target/exposure_target: target frame state.
      ref_idx_per_point: (N,) int32 — reference frame slot for the patch
        (normally the host; overridden host-side when the window has <= 2
        frames, findMatchDirect:242-252).

    Returns dict(matched (N,) bool, px (N, 2) level-0 target pixel).
    """
    N = pts_u.shape[0]
    fx, fy, cx, cy = K[0], K[1], K[2], K[3]

    # --- world points from host state ---
    host = jnp.clip(pts_host, 0, T_wc_stack.shape[0] - 1)
    T_wc_h = T_wc_stack[host]
    xn = (pts_u - cx) / fx
    yn = (pts_v - cy) / fy
    p_ref = jnp.stack([xn, yn, jnp.ones_like(xn)], axis=-1) / \
        jnp.maximum(pts_idepth, 1e-9)[:, None]
    pw = jnp.einsum("nij,nj->ni", T_wc_h[:, :3, :3], p_ref) + T_wc_h[:, :3, 3]

    # --- project into target, grid binning (reprojectPoint) ---
    T_tw = se3.inverse(T_wc_target)
    px_t, z_t = _project(T_tw, pw, K)
    pxi = px_t.astype(jnp.int32)
    inb = (pts_valid & (z_t > 0)
           & (pxi[:, 0] >= PROJ_BOUNDARY) & (pxi[:, 0] < w - PROJ_BOUNDARY)
           & (pxi[:, 1] >= PROJ_BOUNDARY) & (pxi[:, 1] < h - PROJ_BOUNDARY))

    n_cols = -(-w // CELL_SIZE)
    n_rows = -(-h // CELL_SIZE)
    n_cells = n_cols * n_rows
    cell = jnp.where(inb, (pxi[:, 1] // CELL_SIZE) * n_cols
                     + (pxi[:, 0] // CELL_SIZE), n_cells)

    if per_cell:
        # winner per cell: min quality, then min index among ties
        BIGQ = jnp.float32(1e30)
        q = jnp.where(inb, pts_quality, BIGQ)
        cell_minq = jnp.full((n_cells + 1,), BIGQ).at[cell].min(q)
        tie = inb & (q == cell_minq[cell])
        idxs = jnp.arange(N, dtype=jnp.int32)
        cell_mini = jnp.full((n_cells + 1,), N, jnp.int32).at[
            jnp.where(tie, cell, n_cells)].min(jnp.where(tie, idxs, N))
        winner = tie & (cell_mini[cell] == idxs)

        # --- compact to the per-cell winner lanes: at most one candidate
        # per grid cell exists, so the expensive warp+align runs on an
        # M = n_cells-sized batch instead of all N points ---
        M = -(-n_cells // 8) * 8
        (cidx,) = jnp.nonzero(winner, size=M, fill_value=0)
        lane_valid = jnp.arange(M) < winner.sum()
        overflow = jnp.int32(0)
    else:
        # every in-bounds point gets a lane (KF matcher refresh), compacted
        # to `cap` lanes: the valid-point count is far below the pool
        # capacity (N=4096 pool, ~2000-2500 live), and align cost scales
        # with lane count. Overflow (more in-bounds points than cap) drops
        # the highest pool indices — they stay unmatched this KF; the count
        # is exported so callers can surface the truncation (telemetry +
        # bench assert; silent starvation caused round 2's yaw-drift bug).
        # absolute lane_cap (host-bucketed to the exact live count) wins
        # over the fraction; align cost is proportional to the cap, and the
        # measured live lane counts sit far below the worst case (e.g. the
        # pass-2 newest-host set is the activation count, ~150-500 steady
        # state vs the 2048 worst-case burst)
        cap = lane_cap if lane_cap > 0 else max(1, int(lane_cap_frac * N))
        cap = min(-(-cap // 8) * 8, N)
        (cidx,) = jnp.nonzero(inb, size=cap, fill_value=0)
        lane_valid = jnp.arange(cap) < inb.sum()
        overflow = jnp.maximum(inb.sum() - cap, 0).astype(jnp.int32)

    pw_c = pw[cidx]
    px_t_c = px_t[cidx]
    type_c = pts_type[cidx]

    # --- findMatchDirect for compacted winners ---
    ref_idx = jnp.clip(ref_idx_per_point, 0, T_wc_stack.shape[0] - 1)[cidx]
    if closest_view:
        # Patch-reference selection by CLOSEST VIEWING DIRECTION to the
        # target (the reference ships this as Reprojector::getCloseViewObs,
        # Reprojector.cpp:295-330, but findMatchDirect never calls it and
        # always warps from pt->host, :238-254 — the root of long-horizon
        # match-acceptance decay: the host patch's appearance diverges from
        # the target view as the camera approaches, VERDICT r4 item 5).
        # SVO semantics: among window frames where the point is visible,
        # pick the one whose viewing ray best aligns with the target's.
        # Cost: F x M projections of plain math — no gathers.
        T_fw = se3.inverse(T_wc_stack)                       # (F,4,4)
        pf_all = jnp.einsum("fij,mj->fmi", T_fw[:, :3, :3], pw_c) \
            + T_fw[:, :3, 3][:, None, :]                     # (F,M,3)
        z_all = pf_all[..., 2]
        zs_all = jnp.where(z_all == 0, 1e-9, z_all)
        u_all = fx * pf_all[..., 0] / zs_all + cx
        v_all = fy * pf_all[..., 1] / zs_all + cy
        vis = ((z_all > 0)
               & (u_all >= REF_BOUNDARY) & (u_all < w - REF_BOUNDARY)
               & (v_all >= REF_BOUNDARY) & (v_all < h - REF_BOUNDARY))
        if frame_valid is not None:
            vis = vis & frame_valid[:, None]
        # never the target itself (KF-refresh targets are window slots): a
        # patch warped from the target into the target "matches" its own
        # projection — a zero-information observation that would pin BA to
        # the current estimate
        vis = vis & (jnp.arange(vis.shape[0])[:, None]
                     != jnp.asarray(exclude_slot))
        c_f = T_wc_stack[:, :3, 3]                           # (F,3)
        d_f = c_f[:, None, :] - pw_c[None, :, :]             # (F,M,3)
        d_f = d_f / jnp.maximum(
            jnp.linalg.norm(d_f, axis=-1, keepdims=True), 1e-9)
        c_t = T_wc_target[:3, 3]
        d_t = c_t[None, :] - pw_c                            # (M,3)
        d_t = d_t / jnp.maximum(
            jnp.linalg.norm(d_t, axis=-1, keepdims=True), 1e-9)
        score = jnp.where(vis, jnp.einsum("fmi,mi->fm", d_f, d_t), -jnp.inf)
        best = jnp.argmax(score, axis=0).astype(ref_idx.dtype)
        any_vis = jnp.max(score, axis=0) > -jnp.inf
        # Switch policy. A non-host reference adds patch-transfer error
        # from window POSE error (the patch lands at the point's
        # projection in the ref frame; only host=ref cancels it exactly)
        # plus idepth error x host->ref baseline for estimated depths.
        # Two traced knobs tune the trade without recompiling:
        # `closest_view_margin` — required view-ray cos improvement over
        # the host; `closest_view_sensor_only` — restrict switching to
        # LiDAR-pinned depths (exact idepth transfer).
        host_score = jnp.take_along_axis(
            score, ref_idx[None, :].astype(jnp.int32), axis=0)[0]
        better = jnp.max(score, axis=0) > host_score + closest_view_margin
        switchable = jnp.where(jnp.asarray(closest_view_sensor_only),
                               pts_is_sensor[cidx], True)
        ref_idx = jnp.where(any_vis & better & switchable, best, ref_idx)
    T_wc_r = T_wc_stack[ref_idx]
    T_rw = se3.inverse(T_wc_r)
    pf_r = jnp.einsum("nij,nj->ni", T_rw[:, :3, :3], pw_c) + T_rw[:, :3, 3]
    z_r = pf_r[:, 2]
    zs = jnp.where(z_r == 0, 1e-9, z_r)
    px_r = jnp.stack([fx * pf_r[:, 0] / zs + cx,
                      fy * pf_r[:, 1] / zs + cy], axis=-1)
    pxi_r = px_r.astype(jnp.int32)
    ref_ok = ((z_r > 0)
              & (pxi_r[:, 0] >= REF_BOUNDARY) & (pxi_r[:, 0] < w - REF_BOUNDARY)
              & (pxi_r[:, 1] >= REF_BOUNDARY) & (pxi_r[:, 1] < h - REF_BOUNDARY))
    cand = lane_valid & ref_ok

    # affine warp + search level (per candidate, vmapped over ref poses)
    T_cur_ref = jnp.einsum("ij,njk->nik", T_tw, T_wc_r)

    def warp_one(pxr, zr, Tcr):
        return warp_matrix_affine(pxr[None], zr[None], K, None, Tcr)[0]

    A = jax.vmap(warp_one)(px_r, z_r, T_cur_ref)
    lvl = best_search_level(A, max_level)
    patches = warp_affine_patches(dI0_stack, ref_idx, px_r, A, lvl)

    # brightness transfer ref -> target
    a_rel = jnp.exp(aff_target[0] - aff_stack[ref_idx, 0]) * \
        jnp.where((exposure_stack[ref_idx] == 0) | (exposure_target == 0), 1.0,
                  exposure_target / exposure_stack[ref_idx])
    b_rel = aff_target[1] - a_rel * aff_stack[ref_idx, 1]

    # level-0 <-> level-L pixel-center mapping for the 2x2-averaged pyramid:
    # p_L = (p_0 - off) / 2^L with off = (2^L - 1)/2. The reference's naive
    # p_0/2^L (findMatchDirect:273,292) biases matches by -off level-0 px on
    # L>0; with the center-correct mapping the alignment is unbiased at every
    # level (measured: -0.5/-1.5 px bias at L1/L2 with the naive mapping).
    scale = (1 << lvl).astype(jnp.float32)
    center_off = 0.5 * (scale - 1.0)
    px_scaled = (px_t_c - center_off[:, None]) / scale[:, None]

    # edgelet direction: host gradient at the ref pixel, pushed through A
    hw_img = dI0_stack.shape[1] * dI0_stack.shape[2]
    flat0 = dI0_stack.reshape(-1, 3)
    gidx = ref_idx * hw_img + pxi_r[:, 1] * dI0_stack.shape[2] + pxi_r[:, 0]
    g = jnp.take(flat0, jnp.clip(gidx, 0, flat0.shape[0] - 1), axis=0)[:, 1:]
    gn = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-9)
    dir_cur = jnp.einsum("nij,nj->ni", A, gn)
    dir_cur = dir_cur / jnp.maximum(jnp.linalg.norm(dir_cur, axis=-1,
                                                    keepdims=True), 1e-9)

    is_edge = type_c == 1
    # quad-pack the target pyramid once per call; every align GN iteration
    # then costs one gather index per sampled pixel (4x, ops/align.py)
    quad_pyr = quad_from_flat(flat_pyr, w, h, max_level + 1)
    px_a, m_c, afail = align_batch(quad_pyr, offsets, widths, heights, lvl,
                                   patches, px_scaled, dir_cur, is_edge,
                                   a_rel, b_rel, cand)
    px_c = px_a * scale[:, None] + center_off[:, None]
    m_c = m_c & cand
    m_c = m_c & jnp.isfinite(px_c).all(axis=-1)

    # scatter back to the full pool layout
    matched = jnp.zeros((N,), bool).at[jnp.where(m_c, cidx, N)].max(
        m_c, mode="drop")
    px_out = jnp.zeros((N, 2), px_c.dtype).at[
        jnp.where(m_c, cidx, N)].set(px_c, mode="drop")
    # failure-mode diagnostics: [projected in-bounds, ref-patch valid,
    # align converged, align walked-OOB, align out-of-iterations] —
    # separates geometric attrition (projection / ref bounds) from the two
    # photometric attrition modes (align divergence vs slow convergence),
    # the signals that classified the long-horizon match collapse
    diag = jnp.concatenate([jnp.stack([inb.sum().astype(jnp.int32),
                                       cand.sum().astype(jnp.int32),
                                       m_c.sum().astype(jnp.int32)]),
                            afail])
    return dict(matched=matched, px=px_out, overflow=overflow, diag=diag)


@partial(jax.jit, static_argnames=("w", "h", "max_level", "per_cell",
                                   "lane_cap_frac", "lane_cap",
                                   "closest_view"))
def reproject_and_match_multi(pts_u, pts_v, pts_idepth, pts_host, pts_type,
                              pts_valid, pts_quality, pts_is_sensor,
                              T_wc_stack, aff_stack, exposure_stack,
                              dI0_stack, flat_pyr_stack, offsets, widths,
                              heights, T_wc_targets, aff_targets,
                              exposure_targets, K, ref_idx_stack,
                              w: int, h: int, max_level: int,
                              per_cell: bool = True,
                              lane_cap_frac: float = 1.0,
                              lane_cap: int = 0,
                              closest_view: bool = False,
                              frame_valid=None,
                              exclude_slots=None,
                              closest_view_margin=0.0,
                              closest_view_sensor_only=False):
    """Match the point pool into SEVERAL target frames in one dispatch.

    vmap of reproject_and_match over the target axis — used by the keyframe
    matcher refresh, which matches the new KF's points into every older
    window frame (makeKeyFrame:1113-1119). flat_pyr_stack: (S, T, 3);
    T_wc_targets: (S, 4, 4); ref_idx_stack: (S, N).
    Returns dict(matched (S, N), px (S, N, 2)).
    """
    if exclude_slots is None:
        exclude_slots = jnp.full((T_wc_targets.shape[0],), -1, jnp.int32)

    def one(flat_pyr, T_t, aff_t, exp_t, ref_idx, excl):
        return reproject_and_match(
            pts_u, pts_v, pts_idepth, pts_host, pts_type, pts_valid,
            pts_quality, pts_is_sensor,
            T_wc_stack, aff_stack, exposure_stack, dI0_stack,
            flat_pyr, offsets, widths, heights, T_t, aff_t, exp_t, K,
            ref_idx, w=w, h=h, max_level=max_level, per_cell=per_cell,
            lane_cap_frac=lane_cap_frac, lane_cap=lane_cap,
            closest_view=closest_view, frame_valid=frame_valid,
            exclude_slot=excl, closest_view_margin=closest_view_margin,
            closest_view_sensor_only=closest_view_sensor_only)

    return jax.vmap(one)(flat_pyr_stack, T_wc_targets, aff_targets,
                         exposure_targets, ref_idx_stack, exclude_slots)
