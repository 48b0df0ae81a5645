"""Sliding-window bundle-adjustment backend — the EnergyFunctional.

Reference: src/OptimizationBackend/* + src/FullSystem/Residuals.cpp +
FullSystemOptimize.cpp. Semantics implemented here:

  * residual = huber-weighted 2-D reprojection error: the point's center
    pixel projected with the FEJ pair pose and *current* inverse depth minus
    the matcher pixel (Residuals.cpp:196-222); Jacobians (2x6 pose, 2x4
    calib, 2x1 idepth) evaluated at the FEJ pose (Residuals.cpp:93-135);
  * an 8-point photometric pattern energy at the *current* pose serves only
    as outlier gate vs max(host,target) frameEnergyTH plus a minimum
    gradient-mass check wJI2 >= 2 (Residuals.cpp:157-194, 212-222);
  * absolute-state system: per-pair relative blocks transported by the
    adjoints adHost = -Adj(T_th)^T, adTarget = I (EnergyFunctional.cpp:21-71,
    unscaled here — conditioning is handled by the solver preconditioner);
  * Schur complement over point inverse depths, skipping LiDAR/sensor points
    whose depth is pinned (AccumulatedSCHessian.cpp:36-37,
    resubstituteFPt:274-278);
  * marginalization prior (HM, bM) with first-order bM update
    bM + HM * delta (solveSystemF:650-704), point marginalization into
    HM/bM with margWeightFac (marginalizePointsF:514-576), frame
    marginalization by block Schur elimination (marginalizeFrame:434-512 —
    here slot-wise on a fixed (4+6F) layout, no reordering needed);
  * preconditioned solve 1/sqrt(diag+10) + nullspace orthogonalization of
    the step against the 6 gauge + 1 scale directions from iteration >= 2
    (SOLVER_ORTHOGONALIZE_X_LATER, solveSystemF:706-759).

TPU-native: the residual set is a dense (N_points, F_frames) grid with
masks; per-pair accumulation is a one-hot (P=F*F) matmul on the MXU; the
Schur complement is V^T diag(w) V with V the dense (N, 4+6F) per-point
absolute gradient — all fixed shapes, one jit per stage.

State conventions: frame pose variable eps (F, 6) with
T_cw = exp(eps) @ T_cw_fej (left-increment on worldToCam, Sophus [v, w]
tangent) — matching FrameHessian::PRE_worldToCam (HessianBlocks.h:151).
Point idepth has no FEJ (the reference re-zeroes idepth_zero every step,
FullSystemOptimize.cpp:203,228).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from sdv_loam_tpu.config import CPARS, PATTERN_P
from sdv_loam_tpu.utils import se3

# residual states (ResState)
RES_IN = 0
RES_OOB = 1
RES_OUTLIER = 2


# ---------------------------------------------------------------------------
# pair precomputation
# ---------------------------------------------------------------------------

@jax.jit
def make_pairs(T_cw, T_cw_fej, aff, exposure, K):
    """Per (host, target) pair transforms, adjoints and brightness transfer.

    Equivalent of FrameFramePrecalc::set (HessianBlocks.cpp:169-195) +
    EnergyFunctional::setAdjointsF. All (F*F, ...) arrays indexed
    pair = host * F + target.
    """
    F = T_cw.shape[0]
    fx, fy, cx, cy = K[0], K[1], K[2], K[3]
    Km = jnp.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], T_cw.dtype)
    Kim = jnp.array([[1.0 / fx, 0, -cx / fx], [0, 1.0 / fy, -cy / fy],
                     [0, 0, 1.0]], T_cw.dtype)

    hi = jnp.repeat(jnp.arange(F), F)   # host of pair p
    ti = jnp.tile(jnp.arange(F), F)     # target of pair p

    T_th_fej = jnp.einsum("pij,pjk->pik", T_cw_fej[ti],
                          se3.inverse(T_cw_fej)[hi])
    T_th = jnp.einsum("pij,pjk->pik", T_cw[ti], se3.inverse(T_cw)[hi])

    R0 = T_th_fej[:, :3, :3]
    t0 = T_th_fej[:, :3, 3]
    Rc = T_th[:, :3, :3]
    tc = T_th[:, :3, 3]
    KRKi = jnp.einsum("ij,pjk,kl->pil", Km, T_th[:, :3, :3], Kim)
    Kt = jnp.einsum("ij,pj->pi", Km, T_th[:, :3, 3])

    adH = -jnp.swapaxes(se3.adjoint(T_th_fej), -1, -2)
    adT = jnp.broadcast_to(jnp.eye(6, dtype=T_cw.dtype), (F * F, 6, 6))

    er = jnp.where((exposure[hi] == 0) | (exposure[ti] == 0), 1.0, exposure[hi])
    et = jnp.where((exposure[hi] == 0) | (exposure[ti] == 0), 1.0, exposure[ti])
    a_rel = jnp.exp(aff[ti, 0] - aff[hi, 0]) * et / er
    b_rel = aff[ti, 1] - a_rel * aff[hi, 1]
    b0 = aff[hi, 1]  # PRE_b0_mode — host b at its zero point

    return dict(host=hi, target=ti, R0=R0, t0=t0, Rc=Rc, tc=tc,
                KRKi=KRKi, Kt=Kt, adH=adH, adT=adT, aff_a=a_rel,
                aff_b=b_rel, b0=b0)


# ---------------------------------------------------------------------------
# residual linearization (PointFrameResidual::linearize, batched N x F)
# ---------------------------------------------------------------------------

def photometric_gate(pt_u, pt_v, pt_idepth, pt_host, pt_color, pt_weights,
                     pairs, dI0_stack, w: int, h: int,
                     huber_th: float = 6.0):
    """The 8-point pattern outlier-gate energies at the pairs' CURRENT pose
    (Residuals.cpp:157-194). Returns (energy_phot, wJI2), both (N, F).

    Extracted from linearize_residuals so LM drivers can refresh the cached
    gate at an accepted state without a full relinearization."""
    huber_th = jnp.float32(huber_th)
    N = pt_u.shape[0]
    F = dI0_stack.shape[0]
    pair_idx = pt_host[:, None] * F + jnp.arange(F)[None, :]     # (N, F)
    KRKi = pairs["KRKi"][pair_idx]
    Kt = pairs["Kt"][pair_idx]
    a_rel = pairs["aff_a"][pair_idx]
    b_rel = pairs["aff_b"][pair_idx]

    pat = jnp.asarray(PATTERN_P, jnp.float32)
    up = pt_u[:, None] + pat[:, 0]                             # (N, 8)
    vp = pt_v[:, None] + pat[:, 1]
    pix = jnp.stack([up, vp, jnp.ones_like(up)], -1)           # (N, 8, 3)
    ptp2 = jnp.einsum("nfij,npj->nfpi", KRKi, pix) + \
        (Kt * pt_idepth[:, None, None])[:, :, None, :]
    Ku2 = ptp2[..., 0] / ptp2[..., 2]
    Kv2 = ptp2[..., 1] / ptp2[..., 2]
    pat_ok = (Ku2 > 1.1) & (Kv2 > 1.1) & (Ku2 < w - 3) & (Kv2 < h - 3)
    # the reference `break`s at the first failed pattern point: emulate
    # with a cumulative-AND along the pattern axis
    pat_ok = jnp.cumprod(pat_ok.astype(jnp.int8), axis=-1).astype(bool)

    from sdv_loam_tpu.ops.align import _quad_bilinear
    from sdv_loam_tpu.ops.warp import pack_bilinear
    hw_img = dI0_stack.shape[1] * dI0_stack.shape[2]
    # quad-packed gather: one index per sampled pattern point instead of
    # the fused 4-corner gather (1.7x at 3 channels, v5e measured). The
    # pack is a cheap VPU pass over the window stack per call.
    quad = jax.vmap(pack_bilinear)(dI0_stack).reshape(F * hw_img, 12)
    base = (jnp.arange(F) * hw_img)[None, :, None]
    base = jnp.broadcast_to(base, (N, F, 1)).reshape(N * F, 1)
    wv = jnp.full((N * F, 1), dI0_stack.shape[2], jnp.int32)
    Ku2c = jnp.clip(Ku2, 0.0, dI0_stack.shape[2] - 1.01).reshape(N * F, 8)
    Kv2c = jnp.clip(Kv2, 0.0, dI0_stack.shape[1] - 1.01).reshape(N * F, 8)
    hit = _quad_bilinear(quad, base, wv, Ku2c, Kv2c)
    hit = hit.reshape(N, F, 8, 3)

    resp = hit[..., 0] - (a_rel[..., None] * pt_color[:, None, :]
                          + b_rel[..., None])
    wgrad = jnp.sqrt(2500.0 / (2500.0 + hit[..., 1] ** 2
                               + hit[..., 2] ** 2))
    wpat = 0.5 * (wgrad + pt_weights[:, None, :])
    absr = jnp.abs(resp)
    hwp = jnp.where(absr < huber_th, 1.0,
                    huber_th / jnp.maximum(absr, 1e-12))
    e_pat = jnp.where(pat_ok,
                      wpat * wpat * hwp * resp * resp * (2.0 - hwp), 0.0)
    energy_phot = e_pat.sum(-1)
    hws = jnp.where(hwp < 1.0, jnp.sqrt(hwp), hwp) * wpat
    wJI2 = jnp.where(pat_ok,
                     (hws * hit[..., 1]) ** 2 + (hws * hit[..., 2]) ** 2,
                     0.0).sum(-1)
    return energy_phot, wJI2


@partial(jax.jit, static_argnames=("w", "h", "resf_at_fej"))
def linearize_residuals(pt_u, pt_v, pt_idepth, pt_host, pt_color, pt_weights,
                        res_active, res_state, matcher_px, matcher_valid,
                        pairs, dI0_stack, frame_energy_th, K,
                        w: int, h: int, huber_th: float = 6.0,
                        gate=None, resf_at_fej: bool = True):
    """Linearize the dense (N, F) residual grid.

    Args:
      pt_*: (N,) point pool (+ (N,8) color/weights).
      res_active: (N, F) bool — residual exists (host!=target, both valid).
      res_state: (N, F) int8 previous ResState (OOB residuals stay OOB).
      matcher_px/matcher_valid: (N, F, 2)/(N, F) matched pixel per target.
      pairs: make_pairs output.
      dI0_stack: (F, H, W, 3) level-0 pyramids.
      frame_energy_th: (F,) adaptive photometric thresholds.

    Returns dict: resF (N,F,2), Jxi (N,F,2,6), Jc (N,F,2,4), Jd (N,F,2),
      new_state, energy (2-D huber energy per residual),
      energy_phot (outlier-gate energy), center (N,F,3) = (Ku,Kv,new_idepth).

    `resf_at_fej` (default, reference-exact): the measured residual is the
    center pixel projected with the FEJ pair transform and idepth_zero ==
    current idepth (Residuals.cpp:93-96 projects with PRE_RTll_0 and
    idepth_zero_scaled) — POSE-INVARIANT within one window LM. The BA is
    then a damped quasi-Newton pull anchored at each frame's tracked
    insertion pose, with step acceptance governed by the prior/marg
    energies (FullSystemOptimize.cpp:435-444), exactly like the reference.
    `resf_at_fej=False` evaluates the residual at the CURRENT pose — a
    self-consistent Gauss-Newton on the matcher cost. Measured long-horizon
    (tools/drift_bisect.py, 200 straight KITTI-scale frames): the
    consistent mode closes a positive feedback loop through the matcher
    (whose targets are re-seeded from the current estimate each KF) and
    diverges — ATE 62 m @200 with BA-vs-tracked corrections growing to
    3.5 m/KF — while the reference anchoring keeps the matcher pull
    one-shot per insertion.
    """
    huber_th = jnp.float32(huber_th)
    N = pt_u.shape[0]
    F = dI0_stack.shape[0]
    fx, fy, cx, cy = K[0], K[1], K[2], K[3]
    fxi, fyi = 1.0 / fx, 1.0 / fy

    pair_idx = pt_host[:, None] * F + jnp.arange(F)[None, :]     # (N, F)
    R0 = pairs["R0"][pair_idx]
    t0 = pairs["t0"][pair_idx]
    Rc = pairs["Rc"][pair_idx]
    tc = pairs["tc"][pair_idx]

    KliP = jnp.stack([(pt_u - cx) * fxi, (pt_v - cy) * fyi,
                      jnp.ones_like(pt_u)], -1)                   # (N, 3)

    # --- FEJ projection: Jacobian evaluation point AND (default) the
    # measured residual's center pixel (Residuals.cpp:93-96) ---
    ptp = jnp.einsum("nfij,nj->nfi", R0, KliP) + \
        t0 * pt_idepth[:, None, None]
    drescale = 1.0 / ptp[..., 2]
    new_idepth0 = pt_idepth[:, None] * drescale
    u = ptp[..., 0] * drescale
    v = ptp[..., 1] * drescale
    Ku0 = u * fx + cx
    Kv0 = v * fy + cy
    proj_ok_fej = (drescale > 0) & (Ku0 > 1.1) & (Kv0 > 1.1) & \
        (Ku0 < w - 3) & (Kv0 < h - 3)

    if resf_at_fej:
        Ku, Kv = Ku0, Kv0
        new_idepth = new_idepth0
        proj_ok = proj_ok_fej
    else:
        # center projection at the CURRENT pose (consistent-GN variant)
        ptc = jnp.einsum("nfij,nj->nfi", Rc, KliP) + \
            tc * pt_idepth[:, None, None]
        drescale_c = 1.0 / ptc[..., 2]
        new_idepth = pt_idepth[:, None] * drescale_c
        Ku = ptc[..., 0] * drescale_c * fx + cx
        Kv = ptc[..., 1] * drescale_c * fy + cy
        proj_ok = (drescale_c > 0) & (Ku > 1.1) & (Kv > 1.1) & \
            (Ku < w - 3) & (Kv < h - 3) & (drescale > 0)

    oob = (~proj_ok) | (~matcher_valid) | (res_state == RES_OOB) | (~res_active)

    # --- Jacobians at FEJ (Residuals.cpp:99-135), unscaled ---
    dd_x = drescale * (t0[..., 0] - t0[..., 2] * u) * fx
    dd_y = drescale * (t0[..., 1] - t0[..., 2] * v) * fy

    dCx2 = drescale * (R0[..., 2, 0] * u - R0[..., 0, 0])
    dCx3 = fx * drescale * (R0[..., 2, 1] * u - R0[..., 0, 1]) * fyi
    dCx0 = KliP[:, None, 0] * dCx2
    dCx1 = KliP[:, None, 1] * dCx3
    dCy2 = fy * drescale * (R0[..., 2, 0] * v - R0[..., 1, 0]) * fxi
    dCy3 = drescale * (R0[..., 2, 1] * v - R0[..., 1, 1])
    dCy0 = KliP[:, None, 0] * dCy2
    dCy1 = KliP[:, None, 1] * dCy3
    Jc_x = jnp.stack([dCx0 + u, dCx1, dCx2 + 1.0, dCx3], -1)
    Jc_y = jnp.stack([dCy0, dCy1 + v, dCy2, dCy3 + 1.0], -1)

    Jxi_x = jnp.stack([new_idepth0 * fx, jnp.zeros_like(u),
                       -new_idepth0 * u * fx, -u * v * fx,
                       (1 + u * u) * fx, -v * fx], -1)
    Jxi_y = jnp.stack([jnp.zeros_like(u), new_idepth0 * fy,
                       -new_idepth0 * v * fy, -(1 + v * v) * fy,
                       u * v * fy, u * fy], -1)

    # --- photometric outlier gate at current pose (Residuals.cpp:157-194) ---
    # The pattern gathers (N*F*8 bilinear taps x 3 channels) are the single
    # most expensive piece of a linearization on TPU (~115 ms at KITTI
    # shapes, XLA gather ~7 ns/element). Callers iterating an LM loop pass
    # `gate=(energy_phot, wJI2)` from the first linearization to reuse the
    # outlier gate across iterations — a documented deviation from the
    # reference, which re-evaluates the gate every linearizeAll; the gate is
    # a coarse outlier test and the pose moves sub-pixel within one LM, so
    # the gated set is stable (PARITY.md).
    if gate is None:
        energy_phot, wJI2 = photometric_gate(
            pt_u, pt_v, pt_idepth, pt_host, pt_color, pt_weights,
            pairs, dI0_stack, w=w, h=h, huber_th=huber_th)
    else:
        energy_phot, wJI2 = gate

    # --- the 2-D reprojection residual (Residuals.cpp:196-222) ---
    r2 = jnp.stack([Ku, Kv], -1) - matcher_px
    rnorm = jnp.linalg.norm(r2, axis=-1)
    hw2 = jnp.where(rnorm < huber_th, 1.0, huber_th / jnp.maximum(rnorm, 1e-12))
    energy2d = hw2 * (rnorm * rnorm) * (2.0 - hw2)
    hw2s = jnp.where(hw2 < 1.0, jnp.sqrt(hw2), hw2)

    resF = r2 * hw2s[..., None]
    Jxi = jnp.stack([Jxi_x, Jxi_y], axis=2) * hw2s[..., None, None]
    Jc = jnp.stack([Jc_x, Jc_y], axis=2) * hw2s[..., None, None]
    Jd = jnp.stack([dd_x, dd_y], axis=2) * hw2s[..., None]

    th = jnp.maximum(frame_energy_th[pt_host][:, None],
                     frame_energy_th[None, :])
    is_outlier = (energy_phot > th) | (wJI2 < 2.0)
    new_state = jnp.where(oob, RES_OOB,
                          jnp.where(is_outlier, RES_OUTLIER, RES_IN))
    new_state = jnp.where(res_active, new_state, RES_OOB).astype(jnp.int8)

    zero_mask = (new_state == RES_IN)[..., None]
    resF = jnp.where(zero_mask, resF, 0.0)
    Jxi = jnp.where(zero_mask[..., None], Jxi, 0.0)
    Jc = jnp.where(zero_mask[..., None], Jc, 0.0)
    Jd = jnp.where(zero_mask, Jd, 0.0)

    center = jnp.stack([Ku, Kv, new_idepth], -1)
    return dict(resF=resF, Jxi=Jxi, Jc=Jc, Jd=Jd, new_state=new_state,
                energy=jnp.where(proj_ok & matcher_valid & res_active,
                                 energy2d, 0.0),
                energy_phot=energy_phot, wJI2=wJI2, center=center,
                proj_ok=proj_ok)


# ---------------------------------------------------------------------------
# system assembly + Schur + solve
# ---------------------------------------------------------------------------

def _stitch(Hpair, bpair, adH, adT, hi, ti, F, dtype):
    """Transport per-pair (10x10, 10) blocks to the absolute (4+6F) system.

    Hpair layout: [calib(4), relpose(6)]. Mirrors
    AccumulatedTopHessianSSE::stitchDouble (AccumulatedTopHessian.cpp:118-182).
    """
    D = CPARS + 6 * F
    Hcc = Hpair[:, :4, :4]
    Hcx = Hpair[:, :4, 4:]
    Hxx = Hpair[:, 4:, 4:]
    bc = bpair[:, :4]
    bx = bpair[:, 4:]

    H = jnp.zeros((D, D), dtype)
    b = jnp.zeros((D,), dtype)

    H = H.at[:4, :4].add(Hcc.sum(0))
    b = b.at[:4].add(bc.sum(0))

    AH_Hxx = jnp.einsum("pij,pjk->pik", adH, Hxx)
    AT_Hxx = jnp.einsum("pij,pjk->pik", adT, Hxx)
    hh = jnp.einsum("pik,pjk->pij", AH_Hxx, adH)   # AH Hxx AH^T (symmetric)
    tt = jnp.einsum("pik,pjk->pij", AT_Hxx, adT)
    ht = jnp.einsum("pik,pjk->pij", AH_Hxx, adT)
    hc = jnp.einsum("pij,pjk->pik", adH, Hcx.swapaxes(1, 2))  # (p, 6, 4)
    tc = jnp.einsum("pij,pjk->pik", adT, Hcx.swapaxes(1, 2))
    bh = jnp.einsum("pij,pj->pi", adH, bx)
    bt = jnp.einsum("pij,pj->pi", adT, bx)

    # symmetric diagonal-block part
    Hdiag = jnp.zeros((F, F, 6, 6), dtype)
    Hdiag = Hdiag.at[hi, hi].add(hh)
    Hdiag = Hdiag.at[ti, ti].add(tt)
    # one-sided parts, mirrored below (reference stitchDouble:157-166)
    Moff = jnp.zeros((F, F, 6, 6), dtype).at[hi, ti].add(ht)
    Mfc = jnp.zeros((F, 6, 4), dtype)
    Mfc = Mfc.at[hi].add(hc)
    Mfc = Mfc.at[ti].add(tc)
    bf = jnp.zeros((F, 6), dtype)
    bf = bf.at[hi].add(bh)
    bf = bf.at[ti].add(bt)

    Hd_flat = Hdiag.transpose(0, 2, 1, 3).reshape(6 * F, 6 * F)
    Mo_flat = Moff.transpose(0, 2, 1, 3).reshape(6 * F, 6 * F)
    H = H.at[4:, 4:].add(Hd_flat + Mo_flat + Mo_flat.swapaxes(0, 1))
    H = H.at[4:, :4].add(Mfc.reshape(6 * F, 4))
    H = H.at[:4, 4:].add(Mfc.reshape(6 * F, 4).swapaxes(0, 1))
    b = b.at[4:].add(bf.reshape(6 * F))
    return H, b


def pair_deltas(pairs, frame_delta, n_frames):
    """dp per (host, target) pair: dp = d_h^T adH + d_t^T adT (setDeltaF,
    EnergyFunctional.cpp:131-156)."""
    hi = pairs["host"]
    ti = pairs["target"]
    return jnp.einsum("pj,pji->pi", frame_delta[hi], pairs["adH"]) + \
        jnp.einsum("pj,pji->pi", frame_delta[ti], pairs["adT"])


@partial(jax.jit, static_argnames=("n_frames",))
def build_system(lin, pt_host, pt_is_sensor, pt_prior, pairs,
                 frame_delta, c_delta, n_frames: int):
    """Accumulate the absolute H, b and the Schur-complement terms.

    The residual used for the gradient is the first-order FEJ-corrected
    resApprox = resF + Jxi.dp + Jc.dc — the treatment DSO applies to its
    `isLinearized` residuals (AccumulatedTopHessian.cpp:56-63). The reference
    drops this correction for active residuals because its resF is
    (quasi-)evaluated at the FEJ pose (Residuals.cpp:93-96); keeping it makes
    the solve a consistent Gauss-Newton step from the *current* state.

    Returns dict(H_top, b_top, H_sc, b_sc, Hdd, bd, HdiF, Vpt, n_active,
    e_quad).
    """
    F = n_frames
    pair_idx0 = pt_host[:, None] * F + jnp.arange(F)[None, :]
    resF = jnp.where((lin["new_state"] == RES_IN)[..., None],
                     lin["resF"], 0.0)
    Jxi = lin["Jxi"]
    Jc = lin["Jc"]
    Jd = lin["Jd"]
    active = lin["new_state"] == RES_IN
    N = resF.shape[0]
    dtype = resF.dtype
    e_quad = jnp.sum(resF * resF)

    # per-residual geometric Jacobian (2 x 10): [calib, relpose]
    Jgeo = jnp.concatenate([Jc, Jxi], axis=-1)            # (N, F, 2, 10)
    pair_idx = pair_idx0.reshape(-1)
    Jgeo_f = Jgeo.reshape(N * F, 2, 10)
    res_f = resF.reshape(N * F, 2)

    onehot = jax.nn.one_hot(pair_idx, F * F, dtype=dtype)  # (NF, P)
    # H_pair[p] = sum_r Jgeo^T Jgeo ; b_pair[p] = sum_r Jgeo^T res
    outer = jnp.einsum("rai,raj->rij", Jgeo_f, Jgeo_f).reshape(N * F, 100)
    Hpair = jnp.einsum("rp,rk->pk", onehot, outer).reshape(F * F, 10, 10)
    bout = jnp.einsum("rai,ra->ri", Jgeo_f, res_f)
    bpair = jnp.einsum("rp,ri->pi", onehot, bout)

    H_top, b_top = _stitch(Hpair, bpair, pairs["adH"], pairs["adT"],
                           pairs["host"], pairs["target"], F, dtype)

    # --- per-point depth terms ---
    Hdd = jnp.einsum("nfa,nfa->n", Jd, Jd) + pt_prior
    bd = jnp.einsum("nfa,nfa->n", Jd, resF)
    Hcd = jnp.einsum("nfai,nfa->ni", Jc, Jd)              # (N, 4)
    JpJd = jnp.einsum("nfai,nfa->nfi", Jxi, Jd)           # (N, F, 6)

    n_act = active.sum(-1)
    HdiF = jnp.where(n_act > 0, 1.0 / jnp.maximum(Hdd, 1e-10), 0.0)

    # --- dense per-point absolute gradient V (N, 4+6F) ---
    adH_p = pairs["adH"].reshape(F, F, 6, 6)[pt_host]     # (N, F, 6, 6)
    adT_p = pairs["adT"].reshape(F, F, 6, 6)[pt_host]
    vh = jnp.einsum("nfij,nfj->nfi", adH_p, JpJd)          # to host frame
    vt = jnp.einsum("nfij,nfj->nfi", adT_p, JpJd)          # to target frame
    Vf = vt  # target contributions land on frame t
    # host contributions: sum over t of vh lands on frame h
    vh_sum = vh.sum(axis=1)                                # (N, 6)
    host_onehot = jax.nn.one_hot(pt_host, F, dtype=dtype)  # (N, F)
    Vframes = Vf + host_onehot[:, :, None] * vh_sum[:, None, :]
    Vpt = jnp.concatenate([Hcd, Vframes.reshape(N, 6 * F)], axis=-1)

    sc_ok = (~pt_is_sensor) & (n_act > 0)
    wsc = jnp.where(sc_ok, HdiF, 0.0)
    H_sc = jnp.einsum("ni,n,nj->ij", Vpt, wsc, Vpt)
    b_sc = jnp.einsum("ni,n->i", Vpt, wsc * bd)

    return dict(H_top=H_top, b_top=b_top, H_sc=H_sc, b_sc=b_sc,
                Hdd=Hdd, bd=bd, HdiF=HdiF, Vpt=Vpt, n_active=n_act,
                e_quad=e_quad)


def make_nullspaces(T_cw_fej, frame_valid):
    """(D, 7) nullspace matrix: 6 gauge + 1 scale (getNullspaces,
    FullSystemOptimize.cpp:548-588; setStateZero, HessianBlocks.cpp:52-82).

    Per frame the pose columns are Adj(T_cw_fej) (analytic limit of the
    reference's numeric differentiation) and the scale column is
    [t_cw, 0]."""
    F = T_cw_fej.shape[0]
    D = CPARS + 6 * F
    Ad = se3.adjoint(T_cw_fej)                      # (F, 6, 6)
    t = T_cw_fej[:, :3, 3]
    scale_col = jnp.concatenate([t, jnp.zeros_like(t)], -1)  # (F, 6)
    cols = jnp.concatenate([Ad, scale_col[:, :, None]], -1)  # (F, 6, 7)
    cols = cols * frame_valid[:, None, None]
    N = jnp.zeros((D, 7), T_cw_fej.dtype)
    N = N.at[4:, :].set(cols.reshape(6 * F, 7))
    return N


def orthogonalize(vec, Ns):
    """Project `vec` off span(Ns) (EnergyFunctional::orthogonalize:615-648).

    The reference forms the projector N N^+ via SVD with singular values
    below solverModeDelta * max zeroed. The span (and hence the projector)
    is identical under modified Gram-Schmidt with near-dependent columns
    dropped — and MGS is 7 tiny matmul steps instead of a TPU-hostile SVD
    (~18 ms for a 52x7 operand)."""
    norms = jnp.linalg.norm(Ns, axis=0, keepdims=True)
    Nn = Ns / jnp.maximum(norms, 1e-12)
    K = Nn.shape[1]

    def body(Q, j):
        v = Nn[:, j]
        v = v - Q @ (Q.swapaxes(0, 1) @ v)
        nv = jnp.linalg.norm(v)
        q = jnp.where(nv > 1e-5, v / jnp.maximum(nv, 1e-12), 0.0)
        return Q.at[:, j].set(q), None

    Q, _ = jax.lax.scan(body, jnp.zeros_like(Nn), jnp.arange(K))
    return vec - Q @ (Q.swapaxes(0, 1) @ vec)


@partial(jax.jit, static_argnames=("n_frames",))
def solve_system(sys_, HM, bM, delta_stitched, c_prior, c_delta,
                 frame_prior, frame_delta, frame_valid, nullspaces,
                 lam, pt_host, pt_is_sensor, pairs, n_frames: int,
                 orthogonalize_x=True, diag_floor_rel=0.0):
    """Assemble the final system and solve (solveSystemF:650-759) +
    resubstitute idepth steps (resubstituteF:221-282).

    Returns dict(x (D,), dc (4,), dframes (F,6), didepth (N,)).
    """
    F = n_frames
    D = CPARS + 6 * F
    dtype = sys_["H_top"].dtype

    H = sys_["H_top"] - sys_["H_sc"] + HM
    b = sys_["b_top"] - sys_["b_sc"] + (bM + HM @ delta_stitched)

    # priors (stitchDouble usePrior branch)
    H = H.at[jnp.arange(4), jnp.arange(4)].add(c_prior)
    b = b.at[:4].add(c_prior * c_delta)
    fp = frame_prior.reshape(6 * F)
    fd = frame_delta.reshape(6 * F)
    H = H.at[jnp.arange(4, D), jnp.arange(4, D)].add(fp)
    b = b.at[4:].add(fp * fd)

    # inactive slots: identity rows to keep the solve well-posed
    slot_mask = jnp.concatenate(
        [jnp.ones((4,), bool), jnp.repeat(frame_valid, 6)])
    H = jnp.where(slot_mask[:, None] & slot_mask[None, :], H, 0.0)
    H = H.at[jnp.arange(D), jnp.arange(D)].add(jnp.where(slot_mask, 0.0, 1.0))
    b = jnp.where(slot_mask, b, 0.0)

    Hd = H.at[jnp.arange(D), jnp.arange(D)].multiply(1.0 + lam)
    # absolute damping floor (robustness deviation, PARITY.md): a window
    # direction whose residual support has thinned to diag~0 gets NO
    # stiffness from multiplicative LM damping ((1+lam)*0 = 0) and can be
    # flung meters by the marginalization pull in one accepted step (the
    # measured kf116 collapse, ROADMAP round-3). Floor the added damping at
    # lam * rel * mean|diag| over live entries: healthy directions
    # (diag ~ mean) see a ~rel relative change, unconstrained ones become
    # bounded. rel=0 restores the reference-exact multiplicative form
    # (solveSystemF:650-759).
    smf = slot_mask.astype(dtype)
    dmean = jnp.sum(jnp.abs(jnp.diag(H)) * smf) / jnp.maximum(smf.sum(), 1.0)
    Hd = Hd.at[jnp.arange(D), jnp.arange(D)].add(
        lam * diag_floor_rel * dmean * smf)
    SVecI = 1.0 / jnp.sqrt(jnp.abs(jnp.diag(Hd)) + 10.0)
    Hs = Hd * SVecI[:, None] * SVecI[None, :]
    bs = b * SVecI
    x = SVecI * jnp.linalg.solve(Hs + jnp.eye(D, dtype=dtype) * 1e-12, bs)

    x = jnp.where(orthogonalize_x, orthogonalize(x, nullspaces), x)

    dc = -x[:4]
    dframes = -x[4:].reshape(F, 6) * frame_valid[:, None]

    # idepth back-substitution (resubstituteFPt:264-282):
    # b_pt = bd - Hcd.xc - sum_t xAd.JpJd  ==  bd - Vpt.x  with the dense
    # per-point absolute gradient Vpt from build_system.
    b_pt = sys_["bd"] - sys_["Vpt"] @ x
    step = -b_pt * sys_["HdiF"]
    step = jnp.where(pt_is_sensor | (sys_["n_active"] == 0), 0.0, step)
    return dict(x=x, dc=dc, dframes=dframes, didepth=step)


# ---------------------------------------------------------------------------
# energies (for the LM accept/reject decision)
# ---------------------------------------------------------------------------

@jax.jit
def marg_energy(HM, bM, delta_stitched):
    """calcMEnergyF (EnergyFunctional.cpp:284-293)."""
    return delta_stitched @ (2.0 * bM + HM @ delta_stitched)


@jax.jit
def prior_energy(c_prior, c_delta, frame_prior, frame_delta):
    """Prior quadratic terms of calcLEnergyF_MT (EnergyFunctional.cpp:295-350).
    Point-prior terms vanish because idepth deltas re-zero every step."""
    return jnp.sum(c_prior * c_delta * c_delta) + \
        jnp.sum(frame_prior * frame_delta * frame_delta)


# ---------------------------------------------------------------------------
# marginalization
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("n_frames",))
def marginalize_points(lin, pt_host, pt_is_sensor, pt_prior_marg, marg_mask,
                       frame_delta, c_delta, pairs, n_frames: int,
                       marg_weight_fac: float = 0.25):
    """Marginalize flagged points into (dHM, dbM).

    Mirrors EnergyFunctional::marginalizePointsF (:514-576) with mode-2
    accumulation: resApprox = res_toZeroF = resF - J * delta
    (EFResidual::fixLinearizationF, EnergyFunctionalStructs.cpp:46-55).

    Args:
      lin: output of linearize_residuals at the current state.
      pt_prior_marg: (N,) idepth prior already scaled by
        idepth_fix_prior_marg_fac for depth-prior points.
      marg_mask: (N,) points to marginalize.
      frame_delta: (F, 6) eps deltas from FEJ; c_delta: (4,).

    Returns (dHM, dbM) to add to the marginalization prior.
    """
    F = n_frames
    resF = lin["resF"]
    Jxi = lin["Jxi"]
    Jc = lin["Jc"]
    Jd = lin["Jd"]
    active = (lin["new_state"] == RES_IN) & marg_mask[:, None]
    N = resF.shape[0]
    dtype = resF.dtype

    # adHT delta per (host, target) pair: dp = d_h^T adH + d_t^T adT
    hi = pairs["host"]
    ti = pairs["target"]
    dp_pair = jnp.einsum("pj,pji->pi", frame_delta[hi], pairs["adH"]) + \
        jnp.einsum("pj,pji->pi", frame_delta[ti], pairs["adT"])   # (P, 6)
    pair_idx = pt_host[:, None] * F + jnp.arange(F)[None, :]
    dp = dp_pair[pair_idx]                                        # (N, F, 6)

    Jp_delta = jnp.einsum("nfai,nfi->nfa", Jxi, dp) + \
        jnp.einsum("nfai,i->nfa", Jc, c_delta)
    res_tz = resF - Jp_delta
    res_tz = jnp.where(active[..., None], res_tz, 0.0)
    Jxi_m = jnp.where(active[..., None, None], Jxi, 0.0)
    Jc_m = jnp.where(active[..., None, None], Jc, 0.0)
    Jd_m = jnp.where(active[..., None], Jd, 0.0)

    Jgeo = jnp.concatenate([Jc_m, Jxi_m], axis=-1).reshape(N * F, 2, 10)
    res_f = res_tz.reshape(N * F, 2)
    onehot = jax.nn.one_hot(pair_idx.reshape(-1), F * F, dtype=dtype)
    outer = jnp.einsum("rai,raj->rij", Jgeo, Jgeo).reshape(N * F, 100)
    Hpair = jnp.einsum("rp,rk->pk", onehot, outer).reshape(F * F, 10, 10)
    bout = jnp.einsum("rai,ra->ri", Jgeo, res_f)
    bpair = jnp.einsum("rp,ri->pi", onehot, bout)
    H_top, b_top = _stitch(Hpair, bpair, pairs["adH"], pairs["adT"],
                           hi, ti, F, dtype)

    Hdd = jnp.einsum("nfa,nfa->n", Jd_m, Jd_m) + pt_prior_marg
    bd = jnp.einsum("nfa,nfa->n", Jd_m, res_tz)
    Hcd = jnp.einsum("nfai,nfa->ni", Jc_m, Jd_m)
    JpJd = jnp.einsum("nfai,nfa->nfi", Jxi_m, Jd_m)
    n_act = active.sum(-1)
    HdiF = jnp.where(n_act > 0, 1.0 / jnp.maximum(Hdd, 1e-10), 0.0)

    adH_p = pairs["adH"].reshape(F, F, 6, 6)[pt_host]
    adT_p = pairs["adT"].reshape(F, F, 6, 6)[pt_host]
    vh = jnp.einsum("nfij,nfj->nfi", adH_p, JpJd)
    vt = jnp.einsum("nfij,nfj->nfi", adT_p, JpJd)
    host_onehot = jax.nn.one_hot(pt_host, F, dtype=dtype)
    Vframes = vt + host_onehot[:, :, None] * vh.sum(axis=1)[:, None, :]
    Vpt = jnp.concatenate([Hcd, Vframes.reshape(N, 6 * F)], axis=-1)

    sc_ok = marg_mask & (~pt_is_sensor) & (n_act > 0)
    wsc = jnp.where(sc_ok, HdiF, 0.0)
    H_sc = jnp.einsum("ni,n,nj->ij", Vpt, wsc, Vpt)
    b_sc = jnp.einsum("ni,n->i", Vpt, wsc * bd)

    dHM = marg_weight_fac * (H_top - H_sc)
    dbM = marg_weight_fac * (b_top - b_sc)
    return dHM, dbM


@partial(jax.jit, static_argnames=("n_frames",))
def marginalize_frame(HM, bM, frame_prior_slot, frame_delta_slot,
                      slot, n_frames: int):
    """Schur-eliminate one frame slot from the marginalization prior.

    Mirrors EnergyFunctional::marginalizeFrame (:434-512): add the frame's
    prior, precondition with sqrt(|diag|+10), eliminate the 6-dim block,
    then zero the slot (the reference compacts indices instead; our layout
    keeps fixed slots with an occupancy mask).

    `slot` is a TRACED index: one compiled program covers every slot (a
    static slot would recompile per window position — 8 programs over a
    slow link).
    """
    D = HM.shape[0]
    slot = jnp.asarray(slot, jnp.int32)
    kidx = CPARS + 6 * slot + jnp.arange(6)               # the 6 slot rows
    HM = HM.at[kidx, kidx].add(frame_prior_slot)
    bM = bM.at[kidx].add(frame_prior_slot * frame_delta_slot)

    SVec = jnp.sqrt(jnp.abs(jnp.diag(HM)) + 10.0)
    SVecI = 1.0 / SVec
    Hs = HM * SVecI[:, None] * SVecI[None, :]
    bs = bM * SVecI

    Hkk = Hs[kidx][:, kidx]
    Hkk = 0.5 * (Hkk + Hkk.swapaxes(0, 1))
    Hkk_inv = jnp.linalg.inv(Hkk + jnp.eye(6, dtype=HM.dtype) * 1e-10)
    Hkk_inv = 0.5 * (Hkk_inv + Hkk_inv.swapaxes(0, 1))
    C = Hs[:, kidx]                                       # (D, 6)
    Hs_new = Hs - C @ Hkk_inv @ C.swapaxes(0, 1)
    bs_new = bs - C @ (Hkk_inv @ bs[kidx])

    HM_new = Hs_new * SVec[:, None] * SVec[None, :]
    bM_new = bs_new * SVec
    HM_new = 0.5 * (HM_new + HM_new.swapaxes(0, 1))

    # zero the freed slot
    mask = jnp.ones((D,), bool).at[kidx].set(False)
    HM_new = jnp.where(mask[:, None] & mask[None, :], HM_new, 0.0)
    bM_new = jnp.where(mask, bM_new, 0.0)
    return HM_new, bM_new


# ---------------------------------------------------------------------------
# the windowed LM driver (FullSystem::optimize, FullSystemOptimize.cpp:344-502)
# ---------------------------------------------------------------------------

@jax.jit
def frame_energy_quantile(energy_phot, mask, q: float = 0.7):
    """setNewFrameEnergyTH (FullSystemOptimize.cpp:62-97): the q-quantile of
    per-residual photometric energies targeting the newest frame, blended
    with a constant and squared.

    Callers pass only the newest-frame COLUMN ((N,) not the (N, F) grid):
    every other entry is masked out anyway and TPU sorts cost ~0.3 us/row."""
    e = jnp.where(mask, energy_phot, jnp.inf)
    order = jnp.sort(e.ravel())
    n = jnp.sum(mask)
    nth = jnp.clip((q * n).astype(jnp.int32), 0, e.size - 1)
    nth_val = jnp.sqrt(jnp.maximum(order[nth], 0.0))
    th = nth_val * 1.5                        # frameEnergyTHFacMedian
    th = 26.0 * 0.5 + th * 0.5                # frameEnergyTHConstWeight
    th = th * th                              # squared
    fallback = 12.0 * 12.0 * 8.0
    return jnp.where(n > 0, th, fallback)


def stitched_delta(c_delta, eps, frame_valid):
    d = jnp.concatenate([c_delta, (eps * frame_valid[:, None]).reshape(-1)])
    return d


def ba_optimize(win, settings, max_iters: int):
    """Host-driven LM over the window — the reference's optimize() loop.

    `win` is a dict of arrays (see system.window.WindowState.ba_view):
      T_cw_fej (F,4,4), eps (F,6), calib (4,), calib_zero (4,),
      frame_valid (F,), frame_prior (F,6), c_prior (4,),
      aff (F,2), exposure (F,), HM (D,D), bM (D,),
      newest (int), frame_energy_th (F,),
      pt_{u,v,idepth,host,color,weights,is_sensor,prior,valid} ,
      res_active (N,F), res_state (N,F),
      matcher_px (N,F,2), matcher_valid (N,F),
      dI0_stack (F,H,W,3), K_base (4,), w, h.

    Returns the updated dict plus diagnostics. The final fix-linearization
    pass (state refresh + centers) is returned as `lin_final`.
    """
    import numpy as np

    F = win["T_cw_fej"].shape[0]
    w, h = int(win["w"]), int(win["h"])
    newest = int(win["newest"])

    eps = win["eps"]
    calib = win["calib"]
    idepth = win["pt_idepth"]

    def current_pairs(eps_, calib_):
        T_cw = jnp.einsum("fij,fjk->fik", se3.se3_exp(eps_), win["T_cw_fej"])
        K = calib_
        return make_pairs(T_cw, win["T_cw_fej"], win["aff"], win["exposure"],
                          K), T_cw

    resf_at_fej = getattr(settings, "ba_resf_at_fej", True)

    def linearize(eps_, calib_, idepth_, feth, gate=None):
        pairs, T_cw = current_pairs(eps_, calib_)
        lin = linearize_residuals(
            win["pt_u"], win["pt_v"], idepth_, win["pt_host"],
            win["pt_color"], win["pt_weights"], win["res_active"],
            win["res_state"], win["matcher_px"], win["matcher_valid"],
            pairs, win["dI0_stack"], feth, calib_, w=w, h=h, gate=gate,
            resf_at_fej=resf_at_fej)
        return lin, pairs, T_cw

    feth = win["frame_energy_th"]

    def total_energy(lin, pairs_, eps_, calib_):
        # the reference's accept energy sums linearize()'s 2-D energy over
        # ALL non-OOB residuals, outliers included (linearizeAll stats[0],
        # FullSystemOptimize.cpp:23-61) — lin["energy"] has exactly that
        c_delta = calib_ - win["calib_zero"]
        dstt = stitched_delta(c_delta, eps_, win["frame_valid"])
        e_a = jnp.sum(lin["energy"])
        e_m = marg_energy(win["HM"], win["bM"], dstt)
        e_p = prior_energy(win["c_prior"], c_delta, win["frame_prior"],
                           eps_ * win["frame_valid"][:, None])
        return e_a + e_m + e_p

    lin, pairs, _ = linearize(eps, calib, idepth, feth)
    gate0 = (lin["energy_phot"], lin["wJI2"])   # cached gate (see ba_core)
    newest_mask = win["res_active"][:, newest] & \
        (lin["new_state"][:, newest] != RES_OOB)
    feth = feth.at[newest].set(frame_energy_quantile(
        lin["energy_phot"][:, newest], newest_mask))
    lin, pairs, _ = linearize(eps, calib, idepth, feth, gate0)
    E_last = float(total_energy(lin, pairs, eps, calib))

    lam = 1e-1
    nullspaces = make_nullspaces(win["T_cw_fej"], win["frame_valid"].astype(
        win["T_cw_fej"].dtype))

    for it in range(max_iters):
        c_delta = calib - win["calib_zero"]
        sys_ = build_system(lin, win["pt_host"], win["pt_is_sensor"],
                            win["pt_prior"], pairs,
                            eps * win["frame_valid"][:, None], c_delta,
                            n_frames=F)
        dstt = stitched_delta(c_delta, eps, win["frame_valid"])
        sol = solve_system(sys_, win["HM"], win["bM"], dstt,
                           win["c_prior"], c_delta, win["frame_prior"],
                           eps * win["frame_valid"][:, None],
                           win["frame_valid"], nullspaces,
                           jnp.float32(lam), win["pt_host"],
                           win["pt_is_sensor"], pairs, n_frames=F,
                           orthogonalize_x=(it >= 2),
                           diag_floor_rel=getattr(
                               settings, "ba_lm_diag_floor", 0.0))
        eps_new = eps + sol["dframes"]
        calib_new = calib + sol["dc"]
        idepth_new = jnp.where(win["pt_is_sensor"], idepth,
                               idepth + sol["didepth"])

        lin_new, pairs_new, _ = linearize(eps_new, calib_new, idepth_new,
                                          feth, gate0)
        newest_mask = win["res_active"][:, newest] & \
            (lin_new["new_state"][:, newest] != RES_OOB)
        feth = feth.at[newest].set(frame_energy_quantile(
            lin_new["energy_phot"][:, newest], newest_mask))
        E_new = float(total_energy(lin_new, pairs_new, eps_new, calib_new))

        # step-size convergence test (doStepFromBackup:248-250)
        nf = max(1, int(jnp.sum(win["frame_valid"])))
        sumT = float(jnp.sum(sol["dframes"][:, :3] ** 2)) / nf
        sumR = float(jnp.sum(sol["dframes"][:, 3:] ** 2)) / nf
        canbreak = (np.sqrt(sumR) < 0.00005 * settings.th_opt_iterations and
                    np.sqrt(sumT) < 0.00005 * settings.th_opt_iterations)

        if E_new < E_last or settings.force_accept_step:
            eps, calib, idepth = eps_new, calib_new, idepth_new
            lin, pairs = lin_new, pairs_new
            E_last = E_new
            lam *= 0.25
        else:
            lam *= 1e2

        if canbreak and it >= settings.min_opt_iterations:
            break

    # fix the newest frame's eval point (optimize():460-470)
    T_cw = jnp.einsum("fij,fjk->fik", se3.se3_exp(eps), win["T_cw_fej"])
    T_cw_fej = win["T_cw_fej"].at[newest].set(T_cw[newest])
    eps = eps.at[newest].set(0.0)

    # final linearization at the new eval points (linearizeAll(true))
    win_out = dict(win)
    win_out.update(T_cw_fej=T_cw_fej, eps=eps, calib=calib,
                   pt_idepth=idepth, frame_energy_th=feth)
    T_cw_final = jnp.einsum("fij,fjk->fik", se3.se3_exp(eps), T_cw_fej)
    pairs_f = make_pairs(T_cw_final, T_cw_fej, win["aff"], win["exposure"],
                         calib)
    lin_final = linearize_residuals(
        win["pt_u"], win["pt_v"], idepth, win["pt_host"],
        win["pt_color"], win["pt_weights"], win["res_active"],
        win["res_state"], win["matcher_px"], win["matcher_valid"],
        pairs_f, win["dI0_stack"], feth, calib, w=w, h=h,
        resf_at_fej=resf_at_fej)
    win_out["res_state"] = lin_final["new_state"]
    rmse = float(jnp.sqrt(jnp.sum(lin_final["energy"])
                          / jnp.maximum(jnp.sum(lin_final["new_state"]
                                                == RES_IN), 1)))
    return win_out, lin_final, pairs_f, dict(energy=E_last, rmse=rmse)


# ---------------------------------------------------------------------------
# fully-jitted LM driver: one device program per keyframe
# ---------------------------------------------------------------------------

def ba_core(T_cw_fej, eps, calib, calib_zero, frame_valid,
            frame_prior, c_prior, aff, exposure, HM, bM, newest,
            frame_energy_th, pt_u, pt_v, pt_idepth, pt_host,
            pt_color, pt_weights, pt_is_sensor, pt_prior,
            res_active, res_state, matcher_px, matcher_valid,
            dI0_stack, max_iters, min_opt_iterations,
            th_opt_iterations, force_accept,
            n_frames: int, w: int, h: int,
            gate_refresh: bool = False, resf_at_fej: bool = True,
            lm_diag_floor=0.0):
    """The whole windowed LM (FullSystem::optimize) as ONE device program.

    All data-dependent control flow (accept/reject, lambda schedule,
    early break, iteration>=2 step orthogonalization, the adaptive
    newest-frame energy threshold) lives in a lax.while_loop — no host
    round-trips. `newest` and `max_iters` are traced, so one compilation
    covers every keyframe.

    `gate_refresh=True` recomputes the photometric outlier gate at every
    ACCEPTED state (the reference re-gates every linearizeAll,
    Residuals.cpp:157-194; the default caches the initial gate for the
    whole LM — see linearize_residuals).

    Returns (eps, calib, idepth, feth, T_cw_fej_out, new_state, center,
    Hdd, energy, rmse).
    """
    F = n_frames
    fvalid_f = frame_valid.astype(T_cw_fej.dtype)

    def linearize(eps_, calib_, idepth_, feth_, gate=None):
        T_cw = jnp.einsum("fij,fjk->fik", se3.se3_exp(eps_), T_cw_fej)
        pairs = make_pairs(T_cw, T_cw_fej, aff, exposure, calib_)
        lin = linearize_residuals(
            pt_u, pt_v, idepth_, pt_host, pt_color, pt_weights,
            res_active, res_state, matcher_px, matcher_valid,
            pairs, dI0_stack, feth_, calib_, w=w, h=h, gate=gate,
            resf_at_fej=resf_at_fej)
        return lin, pairs

    def update_feth(lin, feth_):
        mask = res_active[:, newest] & (lin["new_state"][:, newest] != RES_OOB)
        return feth_.at[newest].set(
            frame_energy_quantile(lin["energy_phot"][:, newest], mask))

    def total_energy(lin, pairs_, eps_, calib_):
        # reference accept energy: linearize()'s 2-D energy over ALL
        # non-OOB residuals, outliers included (linearizeAll stats[0]) —
        # lin["energy"] carries exactly that mask
        c_delta = calib_ - calib_zero
        dstt = stitched_delta(c_delta, eps_, frame_valid)
        return (jnp.sum(lin["energy"]) + marg_energy(HM, bM, dstt)
                + prior_energy(c_prior, c_delta, frame_prior,
                               eps_ * fvalid_f[:, None]))

    nullspaces = make_nullspaces(T_cw_fej, fvalid_f)

    lin0, pairs0 = linearize(eps, calib, pt_idepth, frame_energy_th)
    # cache the photometric outlier gate for the whole LM (see
    # linearize_residuals: the gate gathers dominate TPU cost; the reference
    # recomputes per iteration but the gated set is stable within one LM)
    gate0 = (lin0["energy_phot"], lin0["wJI2"])
    feth0 = update_feth(lin0, frame_energy_th)
    lin0, pairs0 = linearize(eps, calib, pt_idepth, feth0, gate0)
    E0 = total_energy(lin0, pairs0, eps, calib)

    n_valid_frames = jnp.maximum(jnp.sum(frame_valid), 1)

    def cond(c):
        it, done, *_ = c
        return (it < max_iters) & (~done)

    def body(c):
        (it, done, eps_, calib_, idepth_, feth_, lam, E_last, lin_, pairs_,
         gate_) = c
        c_delta = calib_ - calib_zero
        sys_ = build_system(lin_, pt_host, pt_is_sensor, pt_prior, pairs_,
                            eps_ * fvalid_f[:, None], c_delta, n_frames=F)
        sol = solve_system(sys_, HM, bM,
                           stitched_delta(c_delta, eps_, frame_valid),
                           c_prior, c_delta, frame_prior,
                           eps_ * fvalid_f[:, None], frame_valid, nullspaces,
                           lam, pt_host, pt_is_sensor, pairs_, n_frames=F,
                           orthogonalize_x=(it >= 2),
                           diag_floor_rel=lm_diag_floor)
        eps_n = eps_ + sol["dframes"]
        calib_n = calib_ + sol["dc"]
        idepth_n = jnp.where(pt_is_sensor, idepth_, idepth_ + sol["didepth"])

        lin_n, pairs_n = linearize(eps_n, calib_n, idepth_n, feth_, gate_)
        feth_n = update_feth(lin_n, feth_)
        E_new = total_energy(lin_n, pairs_n, eps_n, calib_n)

        sumT = jnp.sum(sol["dframes"][:, :3] ** 2) / n_valid_frames
        sumR = jnp.sum(sol["dframes"][:, 3:] ** 2) / n_valid_frames
        canbreak = (jnp.sqrt(sumR) < 0.00005 * th_opt_iterations) & \
            (jnp.sqrt(sumT) < 0.00005 * th_opt_iterations)

        accept = (E_new < E_last) | force_accept
        eps_ = jnp.where(accept, eps_n, eps_)
        calib_ = jnp.where(accept, calib_n, calib_)
        idepth_ = jnp.where(accept, idepth_n, idepth_)
        feth_ = jnp.where(accept, feth_n, feth_)
        lin_ = jax.tree.map(lambda a, b: jnp.where(accept, b, a), lin_, lin_n)
        pairs_ = jax.tree.map(lambda a, b: jnp.where(accept, b, a),
                              pairs_, pairs_n)
        E_last = jnp.where(accept, E_new, E_last)
        lam = jnp.where(accept, lam * 0.25, lam * 1e2)
        done = canbreak & (it >= min_opt_iterations)
        if gate_refresh:
            # re-gate at the accepted state (one extra pattern-gather pass
            # per accepted step, not per trial)
            gate_ = jax.lax.cond(
                accept,
                lambda: photometric_gate(pt_u, pt_v, idepth_, pt_host,
                                         pt_color, pt_weights, pairs_,
                                         dI0_stack, w=w, h=h),
                lambda: gate_)
        return (it + 1, done, eps_, calib_, idepth_, feth_, lam, E_last,
                lin_, pairs_, gate_)

    carry = (jnp.int32(0), jnp.bool_(False), eps, calib, pt_idepth, feth0,
             jnp.float32(1e-1), E0, lin0, pairs0, gate0)
    (_, _, eps_f, calib_f, idepth_f, feth_f, _, E_f, _, _, _) = \
        jax.lax.while_loop(cond, body, carry)

    # fix the newest frame's eval point, then final linearization
    T_cw = jnp.einsum("fij,fjk->fik", se3.se3_exp(eps_f), T_cw_fej)
    T_cw_fej_out = T_cw_fej.at[newest].set(T_cw[newest])
    eps_out = eps_f.at[newest].set(0.0)

    T_cw_out = jnp.einsum("fij,fjk->fik", se3.se3_exp(eps_out), T_cw_fej_out)
    pairs_f = make_pairs(T_cw_out, T_cw_fej_out, aff, exposure, calib_f)
    lin_f = linearize_residuals(
        pt_u, pt_v, idepth_f, pt_host, pt_color, pt_weights, res_active,
        res_state, matcher_px, matcher_valid, pairs_f, dI0_stack, feth_f,
        calib_f, w=w, h=h, resf_at_fej=resf_at_fej)
    sys_f = build_system(lin_f, pt_host, pt_is_sensor, pt_prior, pairs_f,
                         eps_out * fvalid_f[:, None], calib_f - calib_zero,
                         n_frames=F)
    rmse = jnp.sqrt(jnp.sum(lin_f["energy"])
                    / jnp.maximum(jnp.sum(lin_f["new_state"] == RES_IN), 1))
    # final assembled system + nullspaces, exported for the deep-log streams
    # (eigen-spectrum / diagonal / nullspace products, FullSystem.cpp:1419-99)
    # — computed lazily by XLA only if the caller actually pulls them.
    H_final = sys_f["H_top"] - sys_f["H_sc"] + HM
    b_final = sys_f["b_top"] - sys_f["b_sc"] + bM
    out = dict(eps=eps_out, calib=calib_f, idepth=idepth_f, feth=feth_f,
               T_cw_fej=T_cw_fej_out, new_state=lin_f["new_state"],
               center=lin_f["center"], Hdd=sys_f["Hdd"], energy=E_f,
               rmse=rmse, H_final=H_final, b_final=b_final,
               nullspaces=make_nullspaces(T_cw_fej_out, fvalid_f))
    return out, lin_f, pairs_f


@partial(jax.jit, static_argnames=("n_frames", "w", "h", "gate_refresh",
                                   "resf_at_fej"))
def ba_optimize_jit(*args, n_frames: int, w: int, h: int,
                    gate_refresh: bool = False, resf_at_fej: bool = True,
                    lm_diag_floor=0.0):
    """jit wrapper over ba_core (kept for direct callers/tests; kf_ops
    composes ba_core into the fused keyframe program)."""
    out, _, _ = ba_core(*args, n_frames=n_frames, w=w, h=h,
                        gate_refresh=gate_refresh, resf_at_fej=resf_at_fej,
                        lm_diag_floor=lm_diag_floor)
    return out


@partial(jax.jit, static_argnames=("n_frames", "w", "h", "resf_at_fej"))
def marginalize_points_full(T_cw_fej, eps, calib, frame_valid, aff, exposure,
                            pt_u, pt_v, pt_idepth, pt_host, pt_color,
                            pt_weights, pt_is_sensor, pt_prior_marg,
                            marg_mask, res_active, res_state, matcher_px,
                            matcher_valid, dI0_stack, frame_energy_th,
                            n_frames: int, w: int, h: int,
                            marg_weight_fac: float = 0.25,
                            resf_at_fej: bool = True):
    """One-dispatch point marginalization: linearize at the current state and
    fold flagged points into (dHM, dbM) (flagPointsForRemoval relinearize +
    marginalizePointsF)."""
    fvalid = frame_valid.astype(T_cw_fej.dtype)
    T_cw = jnp.einsum("fij,fjk->fik", se3.se3_exp(eps), T_cw_fej)
    pairs = make_pairs(T_cw, T_cw_fej, aff, exposure, calib)
    lin = linearize_residuals(pt_u, pt_v, pt_idepth, pt_host, pt_color,
                              pt_weights, res_active, res_state, matcher_px,
                              matcher_valid, pairs, dI0_stack,
                              frame_energy_th, calib, w=w, h=h,
                              resf_at_fej=resf_at_fej)
    return marginalize_points(lin, pt_host, pt_is_sensor, pt_prior_marg,
                              marg_mask, eps * fvalid[:, None],
                              jnp.zeros(4, calib.dtype), pairs,
                              n_frames=n_frames,
                              marg_weight_fac=marg_weight_fac)
