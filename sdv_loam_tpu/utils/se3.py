"""SE(3) / SO(3) Lie-group operations as pure JAX functions.

Replaces the vendored Sophus library of the reference
(/root/reference/thirdparty/Sophus/sophus/se3.hpp) with batched, jit-friendly
tensor ops. Transforms are stored as (..., 4, 4) homogeneous matrices; tangent
vectors follow the Sophus convention ``xi = [upsilon(3), omega(3)]``
(translation part first), matching how the reference composes pose updates
(e.g. CoarseTracker.cpp:795 ``SE3::exp(inc) * refToNew``).

All functions broadcast over leading batch dimensions and preserve dtype.
Small-angle branches use Taylor expansions selected with `jnp.where` so they
are safe under `jit` and differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(w):
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def _taylor_coeffs(theta2):
    """Return (A, B, C) for Rodrigues: R = I + A·W + B·W²,  V = I + B·W + C·W².

    A = sin(t)/t, B = (1-cos(t))/t², C = (t - sin(t))/t³, with 4th-order
    Taylor fallbacks below _EPS to keep gradients finite at t = 0.
    """
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-30))
    small = theta2 < _EPS
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, 1e-30))
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - a) / jnp.maximum(theta2, 1e-30))
    return a, b, c


def so3_exp(w):
    """(..., 3) rotation vector -> (..., 3, 3) rotation matrix (Rodrigues)."""
    theta2 = jnp.sum(w * w, axis=-1)
    a, b, _ = _taylor_coeffs(theta2)
    W = hat(w)
    W2 = W @ W
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def so3_log(R):
    """(..., 3, 3) rotation matrix -> (..., 3) rotation vector.

    Uses the trace formula with a quaternion-free fallback near pi handled by
    clamping; accurate to ~1e-6 for angles in (0, pi - 1e-3).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    # vee of (R - R^T)/2
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    ) * 0.5
    sin_t = jnp.sin(theta)
    small = theta < 1e-5
    # w = theta / (2 sin theta) * vee(R - R^T); near 0: w ≈ v (1 + theta²/6)
    scale_reg = theta / jnp.maximum(sin_t, 1e-30)
    scale = jnp.where(small, 1.0 + theta * theta / 6.0, scale_reg)
    w_generic = v * scale[..., None]

    # Near pi, (R - R^T) vanishes; recover axis from diagonal of R + I.
    near_pi = theta > jnp.pi - 1e-3
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis2 = jnp.maximum((diag + 1.0) * 0.5, 0.0)
    axis = jnp.sqrt(axis2)
    # Fix signs using off-diagonal sums.
    sx = jnp.where(R[..., 2, 1] - R[..., 1, 2] >= 0, 1.0, -1.0)
    sy = jnp.where(R[..., 0, 2] - R[..., 2, 0] >= 0, 1.0, -1.0)
    sz = jnp.where(R[..., 1, 0] - R[..., 0, 1] >= 0, 1.0, -1.0)
    axis = axis * jnp.stack([sx, sy, sz], axis=-1)
    w_pi = axis * theta[..., None]
    return jnp.where(near_pi[..., None], w_pi, w_generic)


def se3_exp(xi):
    """(..., 6) twist [upsilon, omega] -> (..., 4, 4) transform."""
    v, w = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)
    a, b, c = _taylor_coeffs(theta2)
    W = hat(w)
    W2 = W @ W
    eye = jnp.eye(3, dtype=xi.dtype)
    R = eye + a[..., None, None] * W + b[..., None, None] * W2
    V = eye + b[..., None, None] * W + c[..., None, None] * W2
    t = jnp.einsum("...ij,...j->...i", V, v)
    return _rt_to_mat(R, t)


def se3_log(T):
    """(..., 4, 4) transform -> (..., 6) twist [upsilon, omega]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = so3_log(R)
    theta2 = jnp.sum(w * w, axis=-1)
    a, b, c = _taylor_coeffs(theta2)
    W = hat(w)
    W2 = W @ W
    eye = jnp.eye(3, dtype=T.dtype)
    # V^-1 = I - 1/2 W + (1/theta² )(1 - A/(2B)) W²
    coef_reg = (1.0 - a / jnp.maximum(2.0 * b, 1e-30)) / jnp.maximum(theta2, 1e-30)
    coef = jnp.where(theta2 < _EPS, 1.0 / 12.0 + theta2 / 720.0, coef_reg)
    Vinv = eye - 0.5 * W + coef[..., None, None] * W2
    v = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([v, w], axis=-1)


def _rt_to_mat(R, t):
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.zeros(batch + (1, 4), dtype=R.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def from_rt(R, t):
    """Build (..., 4, 4) transform from rotation (...,3,3) and translation (...,3)."""
    return _rt_to_mat(jnp.asarray(R), jnp.asarray(t))


def identity(dtype=jnp.float32, batch=()):
    return jnp.broadcast_to(jnp.eye(4, dtype=dtype), tuple(batch) + (4, 4))


def inverse(T):
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return _rt_to_mat(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def mul(A, B):
    """Compose transforms: returns A @ B."""
    return A @ B


def apply(T, pts):
    """Transform points: (..., 4, 4) x (..., N, 3) -> (..., N, 3)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]


def adjoint(T):
    """(..., 4, 4) -> (..., 6, 6) adjoint for xi = [v, w] ordering.

    Ad(T) = [[R, hat(t)·R], [0, R]] so that exp(Ad(T)·xi) = T·exp(xi)·T⁻¹.
    Used by the BA backend to transport relative-pose Jacobians to absolute
    frame states (reference: EnergyFunctional::setAdjointsF,
    EnergyFunctional.cpp:21-71).
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    tR = hat(t) @ R
    zeros = jnp.zeros_like(R)
    top = jnp.concatenate([R, tR], axis=-1)
    bottom = jnp.concatenate([zeros, R], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


# ---------------------------------------------------------------------------
# NumPy twins for host-side control math (no device round trips)
# ---------------------------------------------------------------------------

def se3_exp_np(xi):
    """NumPy (..., 6) twist -> (..., 4, 4); same math as se3_exp."""
    import numpy as np
    xi = np.asarray(xi, dtype=np.float64)
    v, w = xi[..., :3], xi[..., 3:]
    theta2 = np.sum(w * w, axis=-1)
    theta = np.sqrt(np.maximum(theta2, 1e-30))
    small = theta2 < _EPS
    with np.errstate(invalid="ignore", divide="ignore"):
        a = np.where(small, 1.0 - theta2 / 6.0, np.sin(theta) / theta)
        b = np.where(small, 0.5 - theta2 / 24.0,
                     (1.0 - np.cos(theta)) / np.maximum(theta2, 1e-30))
        c = np.where(small, 1.0 / 6.0 - theta2 / 120.0,
                     (1.0 - a) / np.maximum(theta2, 1e-30))
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = np.zeros_like(wx)
    W = np.stack([np.stack([z, -wz, wy], -1), np.stack([wz, z, -wx], -1),
                  np.stack([-wy, wx, z], -1)], -2)
    W2 = W @ W
    eye = np.eye(3)
    R = eye + a[..., None, None] * W + b[..., None, None] * W2
    V = eye + b[..., None, None] * W + c[..., None, None] * W2
    t = np.einsum("...ij,...j->...i", V, v)
    out = np.zeros(xi.shape[:-1] + (4, 4))
    out[..., :3, :3] = R
    out[..., :3, 3] = t
    out[..., 3, 3] = 1.0
    return out


def se3_log_np(T):
    """NumPy (..., 4, 4) -> (..., 6); same math as se3_log (generic branch)."""
    import numpy as np
    T = np.asarray(T, dtype=np.float64)
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = np.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = np.arccos(cos_t)
    vee = 0.5 * np.stack([R[..., 2, 1] - R[..., 1, 2],
                          R[..., 0, 2] - R[..., 2, 0],
                          R[..., 1, 0] - R[..., 0, 1]], -1)
    sin_t = np.sin(theta)
    small = theta < 1e-5
    with np.errstate(invalid="ignore", divide="ignore"):
        scale = np.where(small, 1.0 + theta * theta / 6.0,
                         theta / np.maximum(sin_t, 1e-30))
    w = vee * scale[..., None]
    theta2 = np.sum(w * w, axis=-1)
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = np.zeros_like(wx)
    W = np.stack([np.stack([z, -wz, wy], -1), np.stack([wz, z, -wx], -1),
                  np.stack([-wy, wx, z], -1)], -2)
    W2 = W @ W
    with np.errstate(invalid="ignore", divide="ignore"):
        theta_s = np.sqrt(np.maximum(theta2, 1e-30))
        a = np.where(theta2 < _EPS, 1.0 - theta2 / 6.0,
                     np.sin(theta_s) / theta_s)
        b = np.where(theta2 < _EPS, 0.5 - theta2 / 24.0,
                     (1.0 - np.cos(theta_s)) / np.maximum(theta2, 1e-30))
        coef = np.where(theta2 < _EPS, 1.0 / 12.0 + theta2 / 720.0,
                        (1.0 - a / np.maximum(2.0 * b, 1e-30))
                        / np.maximum(theta2, 1e-30))
    Vinv = np.eye(3) - 0.5 * W + coef[..., None, None] * W2
    v = np.einsum("...ij,...j->...i", Vinv, t)
    return np.concatenate([v, w], axis=-1)
