"""Struct (reprojection) pose refinement — stage 2 of frame tracking.

Reference: CoarseTracker::structPoseEstimation (CoarseTracker.cpp:949-1007)
with calcHandb (:889-947), calculateRes (:840-871) and calculateWeight
(:873-887): a 6-DoF LM on normalized-image-plane reprojection residuals of
map points matched into the new frame by the Reprojector, with Tukey
bi-square weights (b = 4.6851).

TPU-native: the whole LM runs on device over a fixed-capacity batch of
(world point, observed pixel) pairs with a validity mask; one jit, no host
round-trips. Note: the reference evaluates calcHandb at the *previous*
accepted pose before committing the new one (an off-by-one in its LM loop);
we evaluate at the accepted pose — mathematically the intended algorithm.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sdv_loam_tpu.utils import se3

TUKEY_B = 4.6851
LAMBDA_EXTRAPOLATION_LIMIT = 0.001


def _tukey(x):
    b2 = TUKEY_B * TUKEY_B
    x2 = x * x
    t = 1.0 - x2 / b2
    return jnp.where(x2 <= b2, t * t, 0.0)


def _residuals(T_wc_inv, pts_world, obs_uv, valid, K, w, h):
    """Normalized-plane residuals + pixel-space energy terms.

    T_wc_inv: world->cur (4,4). Returns (res_n (N,2), pix_energy (N,),
    in-front/in-image mask (N,), cam-frame points (N,3))."""
    fx, fy, cx, cy = K[0], K[1], K[2], K[3]
    R = T_wc_inv[:3, :3]
    t = T_wc_inv[:3, 3]
    pf = pts_world @ R.T + t
    z = pf[:, 2]
    u = pf[:, 0] / z
    v = pf[:, 1] / z
    Ku = u * fx + cx
    Kv = v * fy + cy
    # world2frame bounds (ResidualProjections.h:80-94): wM3G = w-3
    ok = valid & (Ku > 1.1) & (Kv > 1.1) & (Ku < w - 3) & (Kv < h - 3) & (z > 0)
    res_pix = jnp.stack([Ku - obs_uv[:, 0], Kv - obs_uv[:, 1]], axis=-1)
    pix_energy = jnp.where(ok, jnp.sum(res_pix * res_pix, axis=-1), 0.0)
    obs_n = jnp.stack([(obs_uv[:, 0] - cx) / fx, (obs_uv[:, 1] - cy) / fy],
                      axis=-1)
    res_n = jnp.stack([u, v], axis=-1) - obs_n
    return res_n, pix_energy, ok, pf


def _mad_sigma(x, ok):
    """Robust scale 1.4826 * MAD of masked residual norms."""
    xm = jnp.where(ok, x, jnp.nan)
    med = jnp.nanmedian(xm)
    mad = jnp.nanmedian(jnp.where(ok, jnp.abs(x - med), jnp.nan))
    return 1.4826 * mad


def _build_system(res_n, ok, pf, sigma):
    """Tukey-weighted 6x6 normal equations (calcHandb:889-947).

    `sigma` < 0 re-computes the robust (MAD) scale from the CURRENT
    residual set each call (the validated default — freezing it at the
    initial set was tried for speed, two 4k sorts/iteration, and MEASURED
    REGRESSIVE: 400-frame S-curve 1.21 m -> 25.5 m; the per-iteration
    re-MAD tightens the scale as residuals shrink, which the robust stage
    needs). Pass 1.0 to reproduce the reference's raw weighting.
    Standardization matters because Tukey's b=4.6851 is defined for
    unit-scale residuals; without it a
    handful of bad matches can drag the whole 6-DoF solve (observed:
    0.16 m -> 0.8 m pose error on a 22-match frame). The flip side: a
    SELF-CONSISTENT biased cluster (e.g. appearance-biased far-wall
    matches, all shifted outward together) defines the MAD scale and the
    disagreeing well-constrained points get clipped as outliers — an
    accept-the-majority failure mode the reference cannot have, because
    its calculateWeight (CoarseTracker.cpp:873-887) applies b=4.6851 to
    the RAW normalized-plane residual (~1e-3): every weight is 1.0 and
    the stage is plain least squares over ALL matches.
    `standardize=False` reproduces the reference exactly.
    """
    x, y, z = pf[:, 0], pf[:, 1], pf[:, 2]
    iz = 1.0 / jnp.where(z == 0, 1.0, z)
    iz2 = iz * iz
    zero = jnp.zeros_like(iz)
    one = jnp.ones_like(iz)
    # d(u)/d xi, xi = [trans, rot] left-multiplied on world->cur
    Jx = jnp.stack([iz, zero, -x * iz2, -x * y * iz2, one + x * x * iz2,
                    -y * iz], axis=-1)
    Jy = jnp.stack([zero, iz, -y * iz2, -(one + y * y * iz2), x * y * iz2,
                    x * iz], axis=-1)
    rn = jnp.linalg.norm(res_n, axis=-1)
    sigma = jnp.where(sigma < 0, jnp.maximum(_mad_sigma(rn, ok), 1e-5),
                      sigma)
    wgt = jnp.where(ok, _tukey(rn / sigma), 0.0)
    J = jnp.stack([Jx, Jy], axis=1)                  # (N, 2, 6)
    H = jnp.einsum("nai,n,naj->ij", J, wgt, J)
    b = jnp.einsum("nai,n,na->i", J, wgt, res_n)
    return H, b


from functools import partial


@partial(jax.jit, static_argnames=("max_iters", "standardize"))
def struct_pose_estimate(T_cur_to_world, pts_world, obs_uv, valid, K, w, h,
                         max_iters: int = 10, standardize: bool = False):
    """LM refinement of the current frame pose against matched map points.

    Args:
      T_cur_to_world: (4,4) initial camToWorld.
      pts_world: (N, 3) map points in world coords.
      obs_uv: (N, 2) matched pixel per point (Reprojector output).
      valid: (N,) bool.
      K: (4,) [fx, fy, cx, cy] level-0 intrinsics; w, h image size (scalars ok).

    Returns dict(T_cur_to_world, energy (mean px^2), n_inliers).
    """
    T_wc = se3.inverse(T_cur_to_world)

    # robust objective scale frozen at the initial residual set so the
    # accept/reject energy is a consistent function across iterations
    if standardize:
        rn0, _, ok0, _ = _residuals(T_wc, pts_world, obs_uv, valid, K, w, h)
        sigma0 = jnp.maximum(
            _mad_sigma(jnp.linalg.norm(rn0, axis=-1), ok0), 1e-5)
    else:
        sigma0 = jnp.float32(1.0)
    b2_6 = TUKEY_B * TUKEY_B / 6.0

    def _rho(x):
        t = 1.0 - jnp.square(x / TUKEY_B)
        return jnp.where(jnp.abs(x) <= TUKEY_B,
                         b2_6 * (1.0 - t * t * t), b2_6)

    def energy(Twc):
        res_n, _, ok, _ = _residuals(Twc, pts_world, obs_uv, valid, K, w, h)
        rn = jnp.linalg.norm(res_n, axis=-1)
        pe = jnp.where(ok, _rho(rn / sigma0), 0.0)
        n = jnp.sum(ok)
        return jnp.sum(pe) / jnp.maximum(n, 1), n

    def system(Twc):
        res_n, _, ok, pf = _residuals(Twc, pts_world, obs_uv, valid, K, w, h)
        sig = jnp.float32(-1.0) if standardize else jnp.float32(1.0)
        return _build_system(res_n, ok, pf, sig)

    e0, _ = energy(T_wc)

    def cond(c):
        it, done, *_ = c
        return (it < max_iters) & (~done)

    def body(c):
        it, done, Twc, lam, e_old = c
        H, b = system(Twc)
        Hl = H + jnp.diag(jnp.diag(H)) * lam + jnp.eye(6, dtype=H.dtype) * 1e-12
        inc = jnp.linalg.solve(Hl, -b)
        extrap = jnp.where(lam < LAMBDA_EXTRAPOLATION_LIMIT,
                           jnp.sqrt(jnp.sqrt(LAMBDA_EXTRAPOLATION_LIMIT
                                             / jnp.maximum(lam, 1e-12))), 1.0)
        inc = inc * extrap
        inc = jnp.where(jnp.isfinite(inc), inc, 0.0)
        Twc_new = se3.mul(se3.se3_exp(inc), Twc)
        e_new, n_new = energy(Twc_new)
        e_new = jnp.where(n_new == 0, 1e6, e_new)
        accept = e_new < e_old
        Twc = jnp.where(accept, Twc_new, Twc)
        e_old = jnp.where(accept, e_new, e_old)
        lam = jnp.where(accept, lam * 0.5,
                        jnp.maximum(lam * 4.0, LAMBDA_EXTRAPOLATION_LIMIT))
        done = ~(jnp.linalg.norm(inc) > 1e-5)
        return it + 1, done, Twc, lam, e_old

    _, _, T_wc, _, e = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.bool_(False), T_wc, jnp.float32(0.01), e0))
    _, n = energy(T_wc)
    return dict(T_cur_to_world=se3.inverse(T_wc), energy=e, n_inliers=n)
