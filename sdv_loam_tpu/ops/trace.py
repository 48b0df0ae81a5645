"""Immature-point epipolar tracing and activation depth-GN.

Reference:
  * ImmaturePoint::ImmaturePoint (ImmaturePoint.cpp:8-35): pattern colors,
    gradient-structure tensor gradH, per-pattern weights
    sqrt(c / (c + |g|^2)) with c = setting_outlierTHSumComponent, and
    energyTH = patternNum * setting_outlierTH;
  * ImmaturePoint::traceOn (ImmaturePoint.cpp:50-352): project the idepth
    interval endpoints, discrete epipolar search (<= 100 steps of the
    8-point pattern energy), quality = 2nd-best/best outside radius 2,
    3-iteration GN subpixel refine along the epipolar direction, then
    updated [idepth_min, idepth_max] from bestU ± errorInPixel;
  * ImmaturePoint::linearizeResidual (ImmaturePoint.cpp:410-476) +
    FullSystem::optimizeImmaturePoint (FullSystemOptPoint.cpp:18-183):
    activation = LM on idepth alone over temporary residuals to every other
    window frame (skipped entirely for LiDAR/sensor points whose depth is
    trusted).

Status codes follow ImmaturePoint.h:20-30. `idepth_max = +inf` encodes the
reference's NaN "not yet bounded" state (mask logic stays total under jit).

TPU-native: the whole pool traces against one target in a single fused
batched op — per-point host transforms are gathered from (F,...) stacks; the
100-step search is a fixed-shape (N, 100, 8) gather + masked reduction.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from sdv_loam_tpu.config import PATTERN_P

# ImmaturePointStatus (ImmaturePoint.h:20-30)
IPS_GOOD = 0
IPS_OOB = 1
IPS_OUTLIER = 2
IPS_SKIPPED = 3
IPS_BADCONDITION = 4
IPS_UNINITIALIZED = 5

# Discrete-search budget. The reference caps at 100 steps
# (ImmaturePoint.cpp:207-212) but the actual step count is bounded by
# maxPixSearch = 0.027*(w+h) (= 43 steps at KITTI 1200x360), so 64 slots
# cover every reachable case with a third less gather work.
TRACE_STEPS = 64


@jax.jit
def pattern_colors(dI0, u, v):
    """Sample the 8-pattern colors + gradH + weights at host pixels
    (ImmaturePoint constructor).

    Returns (color (N,8), weights (N,8), gradH (N,3) as [Gxx, Gxy, Gyy],
    finite (N,), grad_center (N,) = |grad| at the center pixel — the
    Reprojector's point-quality key, Reprojector.cpp:188-196)."""
    from sdv_loam_tpu.ops.warp import gather_patches
    offs = jnp.asarray(PATTERN_P, jnp.float32)
    vals, ok = gather_patches(dI0, u, v, offs)   # (N, 8, 3)
    color = vals[..., 0]
    gx = vals[..., 1]
    gy = vals[..., 2]
    gradH = jnp.stack([jnp.sum(gx * gx, -1), jnp.sum(gx * gy, -1),
                       jnp.sum(gy * gy, -1)], axis=-1)
    c = jnp.float32(50.0 * 50.0)  # setting_outlierTHSumComponent
    weights = jnp.sqrt(c / (c + gx * gx + gy * gy))
    finite = jnp.isfinite(color).all(axis=-1) & ok.all(axis=-1)
    grad_center = jnp.hypot(gx[:, 4], gy[:, 4])  # pattern[4] == (0, 0)
    return color, weights, gradH, finite, grad_center


def _trace_points_impl(u, v, idepth_min, idepth_max, status, quality,
                 color, weights, gradH, energy_th, host_idx,
                 KRKi_stack, Kt_stack, aff_stack,
                 dI_target0,
                 max_pix_search_frac=0.027,
                 huber_th=6.0, *, w: int, h: int):
    """Batched traceOn of the immature pool against one target frame.

    Args:
      u, v, idepth_min, idepth_max, status, quality: (N,) pool state.
      color, weights: (N, 8); gradH: (N, 3); energy_th: (N,).
      host_idx: (N,) slot of each point's host frame.
      KRKi_stack: (F, 3, 3) K R(host->target) K^-1 per host slot.
      Kt_stack: (F, 3) K t(host->target).
      aff_stack: (F, 2) brightness transfer host->target.
      dI_target0: (H, W, 3) target level-0.

    Returns dict with updated idepth_min/max, status, quality, last_uv,
    pixel_interval.
    """
    huber_th = jnp.float32(huber_th)
    N = u.shape[0]
    KRKi = KRKi_stack[host_idx]
    Kt = Kt_stack[host_idx]
    aff = aff_stack[host_idx]
    max_pix_search = (w + h) * max_pix_search_frac

    active = (status != IPS_OOB) & (status != IPS_SKIPPED)

    ones = jnp.ones_like(u)
    pr = jnp.einsum("nij,nj->ni", KRKi, jnp.stack([u, v, ones], -1))
    ptpMin = pr + Kt * idepth_min[:, None]
    uMin = ptpMin[:, 0] / ptpMin[:, 2]
    vMin = ptpMin[:, 1] / ptpMin[:, 2]
    oob = ~((uMin > 4) & (vMin > 4) & (uMin < w - 5) & (vMin < h - 5))

    finite_max = jnp.isfinite(idepth_max)
    id_max_safe = jnp.where(finite_max, idepth_max, 0.01)
    ptpMax = pr + Kt * id_max_safe[:, None]
    uMax0 = ptpMax[:, 0] / ptpMax[:, 2]
    vMax0 = ptpMax[:, 1] / ptpMax[:, 2]

    # finite branch
    dist_f = jnp.hypot(uMin - uMax0, vMin - vMax0)
    oob = oob | (finite_max & ~((uMax0 > 4) & (vMax0 > 4) & (uMax0 < w - 5)
                                & (vMax0 < h - 5)))
    skip = finite_max & (dist_f < 1.5)  # setting_trace_slackInterval

    # infinite branch: direction from projection at idepth 0.01
    ddx = uMax0 - uMin
    ddy = vMax0 - vMin
    dnorm = 1.0 / jnp.maximum(jnp.hypot(ddx, ddy), 1e-12)
    uMax_inf = uMin + max_pix_search * ddx * dnorm
    vMax_inf = vMin + max_pix_search * ddy * dnorm
    oob = oob | (~finite_max & ~((uMax_inf > 4) & (vMax_inf > 4)
                                 & (uMax_inf < w - 5) & (vMax_inf < h - 5)))

    uMax = jnp.where(finite_max, uMax0, uMax_inf)
    vMax = jnp.where(finite_max, vMax0, vMax_inf)
    dist = jnp.where(finite_max, dist_f, max_pix_search)

    # scale sanity (ImmaturePoint.cpp:142-148)
    oob = oob | ~((idepth_min < 0) | ((ptpMin[:, 2] > 0.75)
                                      & (ptpMin[:, 2] < 1.5)))

    dx = uMax - uMin
    dy = vMax - vMin
    a = dx * dx * gradH[:, 0] + 2 * dx * dy * gradH[:, 1] + dy * dy * gradH[:, 2]
    b = dy * dy * gradH[:, 0] - 2 * dx * dy * gradH[:, 1] + dx * dx * gradH[:, 2]
    err_px = 0.2 + 0.2 * (a + b) / jnp.maximum(a, 1e-12)
    badcond = (err_px * 2.0 > dist) & finite_max  # minImprovementFactor = 2
    err_px = jnp.minimum(err_px, 10.0)

    dxn = dx / jnp.maximum(dist, 1e-12)
    dyn = dy / jnp.maximum(dist, 1e-12)
    oob = oob | ~jnp.isfinite(dxn) | ~jnp.isfinite(dyn)

    clipped = dist > max_pix_search
    uMax = jnp.where(clipped, uMin + max_pix_search * dxn, uMax)
    vMax = jnp.where(clipped, vMin + max_pix_search * dyn, vMax)
    dist_c = jnp.where(clipped, max_pix_search, dist)

    n_steps = jnp.minimum((1.9999 + dist_c).astype(jnp.int32), TRACE_STEPS - 1)
    # pattern rotated by the host->target plane rotation (top-left 2x2)
    Rp = KRKi[:, :2, :2]
    pat = jnp.asarray(PATTERN_P, jnp.float32)                # (8, 2)
    rot_pat = jnp.einsum("nij,pj->npi", Rp, pat)             # (N, 8, 2)

    rand_shift = uMin * 1000.0 - jnp.floor(uMin * 1000.0)
    px0 = uMin - rand_shift * dxn
    py0 = vMin - rand_shift * dyn

    steps = jnp.arange(TRACE_STEPS, dtype=jnp.float32)
    sx = px0[:, None] + steps[None, :] * dxn[:, None]        # (N, S)
    sy = py0[:, None] + steps[None, :] * dyn[:, None]
    gx = sx[:, :, None] + rot_pat[:, None, :, 0]             # (N, S, 8)
    gy = sy[:, :, None] + rot_pat[:, None, :, 1]

    # quad-packed gathers (one index per sampled pixel, ops/warp.py): the
    # 64-step search is the pool's biggest gather (N x 64 x 8) — 4x on the
    # intensity pack; the 3-iteration GN below uses the 3-channel pack
    from sdv_loam_tpu.ops.warp import bilinear_sample_packed, pack_bilinear
    ht, wt = dI_target0.shape[:2]
    packed1 = pack_bilinear(dI_target0[..., 0])
    packed3 = pack_bilinear(dI_target0)
    hit, hok = bilinear_sample_packed(packed1, ht, wt, gx, gy)
    res = hit - (aff[:, None, None, 0] * color[:, None, :] + aff[:, None, None, 1])
    absr = jnp.abs(res)
    hw = jnp.where(absr < huber_th, 1.0, huber_th / jnp.maximum(absr, 1e-12))
    e_pat = jnp.where(hok, hw * res * res * (2.0 - hw), 1e5)
    energies = jnp.sum(e_pat, axis=-1)                       # (N, S)
    step_valid = steps[None, :] < n_steps[:, None].astype(jnp.float32)
    energies = jnp.where(step_valid, energies, 1e10)

    best_idx = jnp.argmin(energies, axis=-1)
    best_energy = jnp.take_along_axis(energies, best_idx[:, None], axis=-1)[:, 0]
    bestU = px0 + best_idx.astype(jnp.float32) * dxn
    bestV = py0 + best_idx.astype(jnp.float32) * dyn

    # second best outside radius 2 (setting_minTraceTestRadius)
    far = jnp.abs(steps[None, :] - best_idx[:, None].astype(jnp.float32)) > 2
    second = jnp.min(jnp.where(far & step_valid, energies, 1e10), axis=-1)
    new_quality = second / jnp.maximum(best_energy, 1e-12)
    quality_out = jnp.where((new_quality < quality) | (n_steps > 10),
                            new_quality, quality)

    # GN refine (3 iterations along the epipolar direction)
    def gn_body(_, carry):
        bU, bV, bE, uBak, vBak, stepBack, done = carry
        gxp = bU[:, None] + rot_pat[:, :, 0]
        gyp = bV[:, None] + rot_pat[:, :, 1]
        hit3, ok3 = bilinear_sample_packed(packed3, ht, wt, gxp, gyp)
        r3 = hit3[..., 0] - (aff[:, None, 0] * color + aff[:, None, 1])
        dResdDist = dxn[:, None] * hit3[..., 1] + dyn[:, None] * hit3[..., 2]
        a3 = jnp.abs(r3)
        hw3 = jnp.where(a3 < huber_th, 1.0, huber_th / jnp.maximum(a3, 1e-12))
        Hgn = 1.0 + jnp.sum(jnp.where(ok3, hw3 * dResdDist * dResdDist, 0.0), -1)
        bgn = jnp.sum(jnp.where(ok3, hw3 * r3 * dResdDist, 0.0), -1)
        energy = jnp.sum(jnp.where(ok3, weights * weights * hw3 * r3 * r3
                                   * (2.0 - hw3), 1e5), -1)
        worse = energy > bE
        # worse: halve the previous step from the backup point
        sb_w = stepBack * 0.5
        bU_w = uBak + sb_w * dxn
        bV_w = vBak + sb_w * dyn
        # better: take a clipped GN step
        step = jnp.clip(-bgn / Hgn, -0.5, 0.5)
        step = jnp.where(jnp.isfinite(step), step, 0.0)
        bU_g = bU + step * dxn
        bV_g = bV + step * dyn

        uBak_n = jnp.where(worse, uBak, bU)
        vBak_n = jnp.where(worse, vBak, bV)
        sb_n = jnp.where(worse, sb_w, step)
        bU_n = jnp.where(worse, bU_w, bU_g)
        bV_n = jnp.where(worse, bV_w, bV_g)
        bE_n = jnp.where(worse, bE, energy)
        upd = ~done
        bU = jnp.where(upd, bU_n, bU)
        bV = jnp.where(upd, bV_n, bV)
        bE = jnp.where(upd, bE_n, bE)
        uBak = jnp.where(upd, uBak_n, uBak)
        vBak = jnp.where(upd, vBak_n, vBak)
        stepBack = jnp.where(upd, sb_n, stepBack)
        done = done | (jnp.abs(stepBack) < 0.1)  # setting_trace_GNThreshold
        return bU, bV, bE, uBak, vBak, stepBack, done

    carry = (bestU, bestV, jnp.full_like(bestU, 1e5), bestU, bestV,
             jnp.zeros_like(bestU), jnp.zeros_like(bestU, dtype=bool))
    bestU, bestV, best_energy_gn, *_ = jax.lax.fori_loop(0, 3, gn_body, carry)

    outlier = ~(best_energy_gn < energy_th * 1.2)  # trace_extraSlackOnTH

    # idepth interval update (ImmaturePoint.cpp:322-337)
    use_x = dxn * dxn > dyn * dyn
    eU_lo = bestU - err_px * dxn
    eU_hi = bestU + err_px * dxn
    eV_lo = bestV - err_px * dyn
    eV_hi = bestV + err_px * dyn

    def id_from_u(bu):
        return (pr[:, 2] * bu - pr[:, 0]) / (Kt[:, 0] - Kt[:, 2] * bu)

    def id_from_v(bv):
        return (pr[:, 2] * bv - pr[:, 1]) / (Kt[:, 1] - Kt[:, 2] * bv)

    id_lo = jnp.where(use_x, id_from_u(eU_lo), id_from_v(eV_lo))
    id_hi = jnp.where(use_x, id_from_u(eU_hi), id_from_v(eV_hi))
    new_min = jnp.minimum(id_lo, id_hi)
    new_max = jnp.maximum(id_lo, id_hi)
    bad_interval = (~jnp.isfinite(new_min)) | (~jnp.isfinite(new_max)) | \
        (new_max < 0)

    # --- status resolution, reference precedence ---
    # OOB checked first, then SKIPPED, BADCONDITION, OUTLIER, GOOD.
    new_status = jnp.full_like(status, IPS_GOOD)
    new_status = jnp.where(outlier | bad_interval,
                           jnp.where(status == IPS_OUTLIER, IPS_OOB,
                                     IPS_OUTLIER), new_status)
    new_status = jnp.where(badcond, IPS_BADCONDITION, new_status)
    new_status = jnp.where(skip, IPS_SKIPPED, new_status)
    new_status = jnp.where(oob, IPS_OOB, new_status)

    good = (new_status == IPS_GOOD) & active
    out_min = jnp.where(good, new_min, idepth_min)
    out_max = jnp.where(good, new_max, idepth_max)
    out_status = jnp.where(active, new_status, status)
    out_quality = jnp.where(good, quality_out, quality)
    last_u = jnp.where(good, bestU,
                       jnp.where(active & skip, (uMax + uMin) * 0.5, -1.0))
    last_v = jnp.where(good, bestV,
                       jnp.where(active & skip, (vMax + vMin) * 0.5, -1.0))
    interval = jnp.where(good, 2.0 * err_px,
                         jnp.where(active & skip, dist_f, 0.0))
    return dict(idepth_min=out_min, idepth_max=out_max, status=out_status,
                quality=out_quality, last_u=last_u, last_v=last_v,
                pixel_interval=interval)


# ---------------------------------------------------------------------------
# activation depth-GN
# ---------------------------------------------------------------------------

trace_points = partial(jax.jit,
                       static_argnames=("w", "h"))(_trace_points_impl)


@partial(jax.jit, static_argnames=("w", "h"))
def trace_points_batch(args_b, *, w: int, h: int):
    """B-sequence fleet trace: vmap of trace_points over a leading batch
    axis. `args_b`: tuple over B of per-lane arg tuples (incl. the traced
    max_pix_search_frac / huber_th scalars), stacked INSIDE the jit (one
    fused program instead of per-sequence dispatches + eager stacks)."""
    args = jax.tree.map(lambda *xs: jnp.stack(xs), *args_b)
    return jax.vmap(lambda *a: _trace_points_impl(*a, w=w, h=h))(*args)


def _point_residual_system(u, v, idepth, color, weights, host_idx,
                           R_stack, t_stack, aff_stack, target_idx,
                           quad12, F, K, w, h, energy_th, outlier_slack):
    """One temporary residual (point x target): pattern energy + (Hdd, bd).

    Vectorized translation of ImmaturePoint::linearizeResidual.
    R_stack/t_stack/aff_stack indexed by (host, target) pair id =
    host * F + target. `quad12`: (F*h*w, 12) quad-packed window stack
    (ops/warp.pack_bilinear) — packed ONCE by the caller so the repeated
    per-target/per-iteration gathers cost one index per sample.
    """
    fx, fy, cx, cy = K[0], K[1], K[2], K[3]
    pair = host_idx * F + target_idx
    R = R_stack[pair]
    t = t_stack[pair]
    aff = aff_stack[pair]

    pat = jnp.asarray(PATTERN_P, jnp.float32)
    up = u[:, None] + pat[None, :, 0]
    vp = v[:, None] + pat[None, :, 1]
    KliP = jnp.stack([(up - cx) / fx, (vp - cy) / fy, jnp.ones_like(up)], -1)
    ptp = jnp.einsum("nij,npj->npi", R, KliP) + \
        (t * idepth[:, None])[:, None, :]
    drescale = 1.0 / ptp[..., 2]
    un = ptp[..., 0] * drescale
    vn = ptp[..., 1] * drescale
    Ku = un * fx + cx
    Kv = vn * fy + cy
    ok = (drescale > 0) & (Ku > 1.1) & (Kv > 1.1) & (Ku < w - 3) & (Kv < h - 3)

    from sdv_loam_tpu.ops.align import _quad_bilinear
    base = (target_idx * (w * h))[:, None]
    wv = jnp.full((u.shape[0], 1), w, jnp.int32)
    Kuc = jnp.clip(Ku, 0.0, w - 1.01)
    Kvc = jnp.clip(Kv, 0.0, h - 1.01)
    hit = _quad_bilinear(quad12, base, wv, Kuc, Kvc)

    res = hit[..., 0] - (aff[:, 0:1] * color + aff[:, 1:2])
    absr = jnp.abs(res)
    hw = jnp.where(absr < 6.0, 1.0, 6.0 / jnp.maximum(absr, 1e-12))
    energy = jnp.where(ok, weights * weights * hw * res * res * (2.0 - hw), 0.0)
    all_ok = ok.all(axis=-1)
    e_total = jnp.sum(energy, axis=-1)

    dxI = hit[..., 1] * fx
    dyI = hit[..., 2] * fy
    d_id = (dxI * drescale * (t[:, None, 0] - t[:, None, 2] * un)
            + dyI * drescale * (t[:, None, 1] - t[:, None, 2] * vn))
    hww = hw * weights * weights
    Hdd = jnp.sum(jnp.where(ok, hww * d_id * d_id, 0.0), axis=-1)
    bd = jnp.sum(jnp.where(ok, hww * res * d_id, 0.0), axis=-1)

    is_outlier = e_total > energy_th * outlier_slack
    e_clamped = jnp.minimum(e_total, energy_th * outlier_slack)
    # state: 0 = IN, 1 = OOB, 2 = OUTLIER
    state = jnp.where(~all_ok, 1, jnp.where(is_outlier, 2, 0))
    # OOB contributes nothing (reference returns early with old energy)
    Hdd = jnp.where(all_ok, Hdd, 0.0)
    bd = jnp.where(all_ok, bd, 0.0)
    e_out = jnp.where(all_ok, e_clamped, 0.0)
    return e_out, Hdd, bd, state


@partial(jax.jit, static_argnames=("w", "h", "n_frames"))
def activate_points(u, v, idepth_init, color, weights, host_idx, is_sensor,
                    valid, frame_valid, R_pair, t_pair, aff_pair,
                    dI0_stack, K, energy_th, w: int, h: int, n_frames: int,
                    min_idepth_h_act: float = 100.0, min_obs: int = 1,
                    gn_iters: int = 3):
    """Batched optimizeImmaturePoint (FullSystemOptPoint.cpp:18-183).

    For monocular points: LM on idepth over residuals to all other valid
    frames; for sensor points idepth stays fixed. Returns dict with
    final idepth, success mask, and per-target inlier mask (the residuals to
    materialize on activation).
    """
    N = u.shape[0]
    F = n_frames
    # pack the window stack ONCE; the GN loop re-gathers F x iters times
    from sdv_loam_tpu.ops.warp import pack_bilinear
    quad12 = jax.vmap(pack_bilinear)(dI0_stack).reshape(F * h * w, 12)

    def all_targets_system(idepth):
        es, Hs, bs, states = [], [], [], []
        for tgt in range(F):
            ti = jnp.full((N,), tgt, jnp.int32)
            e, Hdd, bd, st = _point_residual_system(
                u, v, idepth, color, weights, host_idx, R_pair, t_pair,
                aff_pair, ti, quad12, F, K, w, h, energy_th, 1.0)
            use = frame_valid[tgt] & (host_idx != tgt)
            es.append(jnp.where(use, e, 0.0))
            Hs.append(jnp.where(use, Hdd, 0.0))
            bs.append(jnp.where(use, bd, 0.0))
            states.append(jnp.where(use, st, 1))
        return (jnp.stack(es, -1), jnp.stack(Hs, -1), jnp.stack(bs, -1),
                jnp.stack(states, -1))

    e0, H0, b0, st0 = all_targets_system(idepth_init)
    lastE = e0.sum(-1)
    lastH = H0.sum(-1)
    lastb = b0.sum(-1)
    constrained0 = jnp.isfinite(lastE) & (lastH >= min_idepth_h_act)

    def body(_, carry):
        idepth, lastE, lastH, lastb, lam, states, ok, done = carry
        step = (1.0 / (lastH * (1.0 + lam))) * lastb
        new_id = idepth - step
        e1, H1, b1, st1 = all_targets_system(new_id)
        E1 = e1.sum(-1)
        Hs = H1.sum(-1)
        bs = b1.sum(-1)
        ok = ok & jnp.isfinite(lastE) & (Hs >= min_idepth_h_act)
        accept = (E1 < lastE) & ~done
        idepth = jnp.where(accept, new_id, idepth)
        lastE = jnp.where(accept, E1, lastE)
        lastH = jnp.where(accept, Hs, lastH)
        lastb = jnp.where(accept, bs, lastb)
        states = jnp.where(accept[:, None], st1, states)
        lam = jnp.where(accept, lam * 0.5, lam * 5.0)
        done = done | (jnp.abs(step) < 1e-4 * idepth)
        return idepth, lastE, lastH, lastb, lam, states, ok, done

    carry = (idepth_init, lastE, lastH, lastb,
             jnp.full((N,), 0.1, jnp.float32), st0, constrained0,
             jnp.zeros((N,), bool))
    idepth_gn, _, _, _, _, states_gn, ok_gn, _ = jax.lax.fori_loop(
        0, gn_iters, body, carry)

    # sensor points keep their idepth and skip the GN entirely; the reference
    # leaves their temporary residual states at the initial IN
    # (FullSystemOptPoint.cpp:31-33,45), so every valid target is an inlier.
    sensor_states = jnp.where(
        frame_valid[None, :] & (host_idx[:, None] != jnp.arange(F)[None, :]),
        0, 1)
    idepth_out = jnp.where(is_sensor, idepth_init, idepth_gn)
    states_out = jnp.where(is_sensor[:, None], sensor_states, states_gn)
    mono_ok = jnp.where(is_sensor, True, ok_gn & constrained0)

    inlier = states_out == 0
    n_good = inlier.sum(-1)
    success = valid & mono_ok & jnp.isfinite(idepth_out) & \
        (n_good >= min_obs) & (idepth_out > 0)
    return dict(idepth=idepth_out, success=success, inlier_targets=inlier)
