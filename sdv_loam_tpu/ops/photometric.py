"""Pyramidal photometric Gauss-Newton tracking — the CoarseTracker compute.

Reference: src/FullSystem/CoarseTracker.cpp.
  * makeCoarseDepthL0 (:258-423): splat active-point inverse depths into a
    level-0 map (weight = sqrt(1e-3 / HdiF)), 2x2-sum pyramid, one dilation
    pass (diagonal neighbors on levels 0-1, cross neighbors on 2+),
    normalize, compact to per-level point lists (u, v, idepth, color);
  * calcRes (:486-634): warp each reference point into the new frame,
    bilinear-sample intensity+gradient, huber-weighted energy with cutoff
    saturation, plus optical-flow indicators for the KF decision;
  * calcGSSSE (:427-484): accumulate the 8x8 J^T W J / J^T W r system over
    inlier terms (6-DoF pose [trans, rot] + 2 affine brightness params),
    then diagonal scaling [1,1,1, .5,.5,.5, 10, 1000] (SCALE_XI_*, SCALE_A/B);
  * trackNewestCoarse (:662-838): per-level LM with lambda halving/quadrupling,
    lambda-extrapolation, cutoff doubling while >60% terms saturate, and a
    single repeat of a level that needed cutoff doubling.

TPU-native redesign: the per-level point lists are fixed-capacity pools
(compacted by jnp.nonzero(size=cap)); residual+Hessian evaluation is one
fused batched op (gather + VPU arithmetic + one (8,N)x(N,8) MXU matmul); the
whole LM level loop runs on-device in a lax.while_loop so a full pyramid
track is a single device program with no host round-trips.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from sdv_loam_tpu.utils import se3

# functional equivalents of SCALE_XI_ROT/TRANS, SCALE_A, SCALE_B as applied
# in calcGSSSE:473-483 (indices 0-2 are the translation Jacobian components)
STEP_SCALE = jnp.array([1.0, 1.0, 1.0, 0.5, 0.5, 0.5, 10.0, 1000.0],
                       dtype=jnp.float32)
LAMBDA_EXTRAPOLATION_LIMIT = 0.001


def aff_transfer(exposure_ref, exposure_new, aff_ref, aff_new):
    """AffLight::fromToVecExposure (NumType.h:149-159): brightness transfer
    (a, b) such that I_new ≈ a * I_ref + b."""
    er = jnp.where((exposure_ref == 0) | (exposure_new == 0), 1.0, exposure_ref)
    en = jnp.where((exposure_ref == 0) | (exposure_new == 0), 1.0, exposure_new)
    a = jnp.exp(aff_new[0] - aff_ref[0]) * en / er
    b = aff_new[1] - a * aff_ref[1]
    return jnp.stack([a, b])


# ---------------------------------------------------------------------------
# reference depth-map construction
# ---------------------------------------------------------------------------

def splat_idepth(u, v, idepth, weight, valid, w: int, h: int):
    """Scatter-add inverse depths into level-0 maps (makeCoarseDepthL0:263-291).

    u, v are integer pixel coords (already rounded per the caller's rule).
    """
    idx = jnp.where(valid, v * w + u, w * h)
    acc_i = jnp.zeros((w * h + 1,), jnp.float32).at[idx].add(
        jnp.where(valid, idepth * weight, 0.0))
    acc_w = jnp.zeros((w * h + 1,), jnp.float32).at[idx].add(
        jnp.where(valid, weight, 0.0))
    return acc_i[:w * h].reshape(h, w), acc_w[:w * h].reshape(h, w)


def _sum_pool2(x):
    h, w = x.shape
    return jax.lax.reduce_window(x[: (h // 2) * 2, : (w // 2) * 2], 0.0,
                                 jax.lax.add, (2, 2), (2, 2), "VALID")


def _dilate_once(idepth, weight, diagonal: bool):
    """One hole-filling pass (makeCoarseDepthL0:329-378): empty cells take the
    mean of their filled (diagonal or cross) neighbors; idepth stays an
    unnormalized weighted sum, weight the matching mean of neighbor weights."""
    if diagonal:
        offs = ((1, 1), (-1, -1), (1, -1), (-1, 1))
    else:
        offs = ((0, 1), (0, -1), (1, 0), (-1, 0))

    def shift(x, dy, dx):
        return jnp.roll(x, (-dy, -dx), axis=(0, 1))

    empty = weight <= 0
    s = jnp.zeros_like(idepth)
    num = jnp.zeros_like(idepth)
    cnt = jnp.zeros_like(idepth)
    for dy, dx in offs:
        wn = shift(weight, dy, dx)
        dn = shift(idepth, dy, dx)
        filled = wn > 0
        s = s + jnp.where(filled, dn, 0.0)
        num = num + jnp.where(filled, wn, 0.0)
        cnt = cnt + filled.astype(idepth.dtype)
    new_i = jnp.where(empty & (cnt > 0), s / jnp.maximum(cnt, 1), idepth)
    new_w = jnp.where(empty & (cnt > 0), num / jnp.maximum(cnt, 1), weight)
    return new_i, new_w


@partial(jax.jit, static_argnames=("levels", "cap"))
def build_track_ref(dI_pyr, idepth0, weight0, levels: int,
                    cap: int | tuple = 16384):
    """Build per-level tracking-reference pools from level-0 splat maps.

    Returns a tuple over levels of dicts {u, v, idepth, color, valid} with
    fixed per-level capacity `cap` (int = same for all levels, tuple = per
    level, last entry repeated). When the live count exceeds the capacity
    the good cells are stride-subsampled (every k-th in scan order) rather
    than truncated: row-major truncation would keep only the top image rows
    — a strong spatial bias for an 8-DoF photometric GN. The tracking cost
    of every level is proportional to its capacity (masked lanes still pay
    their gathers), so these caps are the track program's content knob
    (live counts measure 4-6k at KITTI scale vs the old uniform 16384).
    """
    if isinstance(cap, int):
        caps = (cap,) * levels
    else:
        caps = tuple(cap) + (cap[-1],) * (levels - len(cap))
    pools = []
    use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from sdv_loam_tpu.ops.pallas_kernels import dilate_depth_pallas
    idl, wl = idepth0, weight0
    for lvl in range(levels):
        if lvl > 0:
            idl = _sum_pool2(idl)
            wl = _sum_pool2(wl)
        if use_pallas:
            idl, wl = dilate_depth_pallas(idl, wl, diagonal=(lvl < 2))
        else:
            idl, wl = _dilate_once(idl, wl, diagonal=(lvl < 2))
        h, w = idl.shape
        norm_id = jnp.where(wl > 0, idl / jnp.maximum(wl, 1e-12), -1.0)
        color = dI_pyr[lvl][..., 0]
        yy, xx = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
        interior = (xx >= 2) & (xx < w - 2) & (yy >= 2) & (yy < h - 2)
        good = interior & (norm_id > 0) & jnp.isfinite(color)
        c = min(caps[lvl], w * h)
        gf = good.ravel()
        n_all = gf.sum()
        stride = jnp.maximum((n_all + c - 1) // c, 1)
        rank = jnp.cumsum(gf) - 1
        keep = gf & (rank % stride == 0)
        (flat_idx,) = jnp.nonzero(keep, size=c, fill_value=w * h - 1)
        n = keep.sum()
        slot_valid = jnp.arange(c) < n
        pu = (flat_idx % w).astype(jnp.float32)
        pv = (flat_idx // w).astype(jnp.float32)
        pid = norm_id.ravel()[flat_idx]
        pcol = color.ravel()[flat_idx]
        pools.append(dict(u=pu, v=pv, idepth=pid, color=pcol,
                          valid=slot_valid, n=n))
    return tuple(pools)


# ---------------------------------------------------------------------------
# residual + Hessian evaluation (calcRes + calcGSSSE fused)
# ---------------------------------------------------------------------------

def calc_res_gs(pool, dI_new, K, T_ref_to_new, aff_rel, ref_aff_b, cutoff,
                huber_th):
    """Fused residual + 8x8 system evaluation for one level.

    Args:
      pool: dict {u, v, idepth, color, valid} — reference points.
      dI_new: (H, W, 3) target pyramid level.
      K: (4,) [fx, fy, cx, cy] of this level.
      T_ref_to_new: (4, 4).
      aff_rel: (2,) brightness transfer (a, b).
      ref_aff_b: scalar b of the reference frame's aff state (J column 6).
      cutoff: saturation threshold on |residual|.
      huber_th: huber threshold.

    Returns dict(E, n_terms, sat_frac, H (8,8), b (8,), flow_t, flow_rt).
    """
    cutoff = jnp.float32(cutoff)
    huber_th = jnp.float32(huber_th)
    fx, fy, cx, cy = K[0], K[1], K[2], K[3]
    h, w = dI_new.shape[:2]
    u0 = pool["u"]
    v0 = pool["v"]
    idp = pool["idepth"]
    color = pool["color"]
    valid = pool["valid"]

    # normalized ref coords (x K^-1)
    xn = (u0 - cx) / fx
    yn = (v0 - cy) / fy
    R = T_ref_to_new[:3, :3]
    t = T_ref_to_new[:3, 3]
    p = jnp.stack([xn, yn, jnp.ones_like(xn)], axis=-1)
    pt = p @ R.T + t[None, :] * idp[:, None]
    u = pt[:, 0] / pt[:, 2]
    v = pt[:, 1] / pt[:, 2]
    Ku = fx * u + cx
    Kv = fy * v + cy
    new_idepth = idp / pt[:, 2]

    inb = valid & (Ku > 2) & (Kv > 2) & (Ku < w - 3) & (Kv < h - 3) & (new_idepth > 0)
    # quad-packed gather: one index per sampled point (1.7x at 3 channels
    # on the v5e); the pack is a cheap VPU pass per LM iteration
    from sdv_loam_tpu.ops.warp import bilinear_sample_packed, pack_bilinear
    hit, hit_ok = bilinear_sample_packed(pack_bilinear(dI_new), h, w, Ku, Kv)
    inb = inb & hit_ok & jnp.isfinite(hit[:, 0])

    r = hit[:, 0] - (aff_rel[0] * color + aff_rel[1])
    absr = jnp.abs(r)
    hw = jnp.where(absr < huber_th, 1.0, huber_th / jnp.maximum(absr, 1e-12))
    saturated = inb & (absr > cutoff)
    inlier = inb & (absr <= cutoff)

    max_energy = 2.0 * huber_th * cutoff - huber_th * huber_th
    E = jnp.sum(jnp.where(inlier, hw * r * r * (2.0 - hw), 0.0)) + \
        jnp.sum(jnp.where(saturated, max_energy, 0.0))
    n_terms = jnp.sum(inb)
    sat_frac = jnp.sum(saturated) / jnp.maximum(n_terms, 1)

    # Jacobian rows (calcGSSSE:442-462); weight zero outside inliers
    dxf = hit[:, 1] * fx
    dyf = hit[:, 2] * fy
    idn = new_idepth
    J = jnp.stack([
        idn * dxf,
        idn * dyf,
        -idn * (u * dxf + v * dyf),
        -(u * v * dxf + (1.0 + v * v) * dyf),
        u * v * dyf + (1.0 + u * u) * dxf,
        u * dyf - v * dxf,
        aff_rel[0] * (ref_aff_b - color),
        -jnp.ones_like(u),
    ], axis=-1)
    wgt = jnp.where(inlier, hw, 0.0)
    n_in = jnp.maximum(jnp.sum(inlier), 1)
    Jw = J * wgt[:, None]
    Hm = (J.T @ Jw) / n_in
    bv = (Jw.T @ r) / n_in
    S = STEP_SCALE
    Hm = Hm * S[:, None] * S[None, :]
    bv = bv * S

    # flow indicators (calcRes:538-565): every 32nd pool slot
    stride_mask = valid & (jnp.arange(u0.shape[0]) % 32 == 0)
    ptT = p + t[None, :] * idp[:, None]
    ptT2 = p - t[None, :] * idp[:, None]
    pt3 = p @ R.T - t[None, :] * idp[:, None]

    def pix_shift(q):
        uu = fx * (q[:, 0] / q[:, 2]) + cx
        vv = fy * (q[:, 1] / q[:, 2]) + cy
        return (uu - u0) ** 2 + (vv - v0) ** 2

    m = stride_mask
    num = jnp.sum(m) * 2.0
    flow_t = (jnp.sum(jnp.where(m, pix_shift(ptT) + pix_shift(ptT2), 0.0))
              / (num + 0.1))
    flow_rt = (jnp.sum(jnp.where(m, pix_shift(pt) + pix_shift(pt3), 0.0))
               / (num + 0.1))
    return dict(E=E, n=n_terms, sat_frac=sat_frac, H=Hm, b=bv,
                flow_t=flow_t, flow_rt=flow_rt)


def _solve_scaled(H, b, lam):
    """LM-damped solve of the scaled 8x8 system; returns the scaled step."""
    Hl = H + jnp.diag(jnp.diag(H)) * lam
    Hl = Hl + jnp.eye(8, dtype=H.dtype) * 1e-12
    inc = jnp.linalg.solve(Hl, -b)
    extrap = jnp.where(lam < LAMBDA_EXTRAPOLATION_LIMIT,
                       jnp.sqrt(jnp.sqrt(LAMBDA_EXTRAPOLATION_LIMIT / jnp.maximum(lam, 1e-12))),
                       1.0)
    inc = inc * extrap
    inc = jnp.where(jnp.isfinite(inc), inc, 0.0)
    return inc


def track_level(pool, dI_new, K, T0, aff0, ref_aff, exposures, cutoff_base,
                huber_th, max_iters: int):
    """One pyramid level of trackNewestCoarse (:686-818), fully on device.

    Handles the cutoff-doubling pre-loop and the LM iteration loop. Returns
    (T, aff, stats dict, level_cutoff_repeat).
    """

    cutoff_base = jnp.float32(cutoff_base)

    def res(T, aff, cutoff):
        aff_rel = aff_transfer(exposures[0], exposures[1], ref_aff, aff)
        return calc_res_gs(pool, dI_new, K, T, aff_rel, ref_aff[1], cutoff,
                           huber_th)

    # cutoff doubling while > 60% saturated (:694-701)
    def cut_cond(c):
        cutoff_rep, r = c
        return (r["sat_frac"] > 0.6) & (cutoff_rep < 50.0)

    def cut_body(c):
        cutoff_rep, _ = c
        cutoff_rep = cutoff_rep * 2.0
        return cutoff_rep, res(T0, aff0, cutoff_base * cutoff_rep)

    cutoff_rep, r0 = jax.lax.while_loop(
        cut_cond, cut_body, (jnp.float32(1.0), res(T0, aff0, cutoff_base)))
    cutoff = cutoff_base * cutoff_rep

    def lm_cond(carry):
        it, done, *_ = carry
        return (it < max_iters) & (~done)

    def lm_body(carry):
        it, done, T, aff, lam, r = carry
        inc = _solve_scaled(r["H"], r["b"], lam)
        inc_scaled = inc * STEP_SCALE
        T_new = se3.mul(se3.se3_exp(inc_scaled[:6]), T)
        aff_new = aff + inc_scaled[6:]
        r_new = res(T_new, aff_new, cutoff)
        accept = (r_new["E"] / jnp.maximum(r_new["n"], 1)) < \
                 (r["E"] / jnp.maximum(r["n"], 1))
        T = jnp.where(accept, T_new, T)
        aff = jnp.where(accept, aff_new, aff)
        lam = jnp.where(accept, lam * 0.5,
                        jnp.maximum(lam * 4.0, LAMBDA_EXTRAPOLATION_LIMIT))
        r = jax.tree.map(lambda a, b_: jnp.where(accept, b_, a), r, r_new)
        done = ~(jnp.linalg.norm(inc) > 1e-3)
        return it + 1, done, T, aff, lam, r

    carry = (jnp.int32(0), jnp.bool_(False), T0, aff0, jnp.float32(0.01), r0)
    n_it, _, T, aff, lam, r = jax.lax.while_loop(lm_cond, lm_body, carry)
    r = dict(r, n_iters=n_it)
    return T, aff, r, cutoff_rep


@partial(jax.jit, static_argnames=("coarsest_lvl", "finest_lvl", "max_iters"))
def track_pyramid(pools, dI_new_pyr, Ks, T_init, aff_init, ref_aff, exposures,
                  min_res_for_abort, cutoff_th, huber_th,
                  coarsest_lvl: int, finest_lvl: int = 0,
                  max_iters=(10, 20, 50, 50, 50)):
    """Coarse-to-fine track (trackNewestCoarse) in a single device program.

    `finest_lvl` > 0 stops the cascade early — used to refine several pose
    candidates cheaply on the small levels before committing the expensive
    fine levels to the winner only (the reference refines one candidate at a
    time sequentially, trackNewCoarse:341-398).

    Returns dict with final T (ref->new), aff, per-level rmse (over the
    levels run; others NaN), flow indicators from the finest level run,
    ok flag.
    """
    T = T_init
    aff = aff_init
    last_res = jnp.full((5,), jnp.nan, jnp.float32)
    flow = jnp.full((3,), 1000.0, jnp.float32)
    ok = jnp.bool_(True)
    have_repeated = jnp.bool_(False)
    lvl_iters = jnp.zeros((6,), jnp.int32)   # LM iterations run per level

    for lvl in range(coarsest_lvl, finest_lvl - 1, -1):
        def run_level(T, aff, reps):
            return track_level(pools[lvl], dI_new_pyr[lvl], Ks[lvl], T, aff,
                               ref_aff, exposures, cutoff_th * reps, huber_th,
                               max_iters[min(lvl, len(max_iters) - 1)])

        T, aff, r, cutoff_rep = run_level(T, aff, 1.0)

        # single level-repeat when the cutoff was raised (:826-833)
        do_repeat = (cutoff_rep > 1.0) & (~have_repeated)
        have_repeated = have_repeated | do_repeat

        def rep(args):
            T_, aff_ = args
            T2, aff2, r2, _ = run_level(T_, aff_, 1.0)
            return T2, aff2, r2

        T, aff, r = jax.lax.cond(do_repeat, rep, lambda a: (a[0], a[1], r),
                                 (T, aff))

        rmse = jnp.sqrt(r["E"] / jnp.maximum(r["n"], 1))
        last_res = last_res.at[lvl].set(rmse)
        flow = jnp.stack([r["flow_t"], jnp.float32(0.0), r["flow_rt"]])
        ok = ok & ~(rmse > 1.5 * min_res_for_abort[lvl])
        lvl_iters = lvl_iters.at[lvl].add(r["n_iters"])

    # affine sanity bounds (:824-835); affineOptMode > 0 here
    ok = ok & (jnp.abs(aff[0]) <= 1.2) & (jnp.abs(aff[1]) <= 200.0)
    return dict(T=T, aff=aff, res=last_res, flow=flow, ok=ok,
                lvl_iters=lvl_iters)


@partial(jax.jit, static_argnames=("max_iters",))
def track_coarsest_batch(pool, dI_new, K, T_tries, aff_init, ref_aff,
                         exposures, cutoff_th, huber_th, max_iters: int = 10):
    """Evaluate ALL pose hypotheses on the coarsest level in one dispatch.

    TPU-native replacement for the reference's sequential retry ladder
    (FullSystem::trackNewCoarse:341-398 + trackNewestCoarse on the coarsest
    level): every hypothesis is LM-refined on the coarsest pyramid level in
    parallel (vmap); the host then refines only the winner through the full
    pyramid. The reference itself notes failed hypotheses "will only be
    tried on the coarsest level, which is super fast anyway".

    Returns dict(T (B,4,4), E (B,), n (B,)) after the coarsest-level LM.
    """

    def one(T0):
        T, aff, r, _ = track_level(pool, dI_new, K, T0, aff_init, ref_aff,
                                   exposures, cutoff_th, huber_th, max_iters)
        return T, r["E"], r["n"]

    T, E, n = jax.vmap(one)(T_tries)
    return dict(T=T, E=E, n=n)
