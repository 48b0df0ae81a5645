"""Golden tests of SE3/SO3 Lie ops against NumPy/scipy-free oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from sdv_loam_tpu.utils import se3


def _rand_xi(rng, scale=1.0, n=()):
    return jnp.asarray(rng.standard_normal(tuple(n) + (6,)) * scale)


def test_exp_log_roundtrip():
    rng = np.random.default_rng(0)
    xi = _rand_xi(rng, 0.8, (32,)).astype(jnp.float64)
    T = se3.se3_exp(xi)
    xi2 = se3.se3_log(T)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-9)


def test_exp_small_angle():
    xi = jnp.array([1e-12, -2e-12, 3e-12, 1e-13, -1e-13, 2e-13], dtype=jnp.float64)
    T = se3.se3_exp(xi)
    np.testing.assert_allclose(np.asarray(T[:3, 3]), np.asarray(xi[:3]), atol=1e-15)
    np.testing.assert_allclose(np.asarray(T[:3, :3]), np.eye(3), atol=1e-12)
    # zero exactly
    T0 = se3.se3_exp(jnp.zeros(6, dtype=jnp.float64))
    np.testing.assert_allclose(np.asarray(T0), np.eye(4), atol=0)


def test_rotation_orthonormal():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((16, 3)) * 2.0)
    R = se3.so3_exp(w)
    eye = np.broadcast_to(np.eye(3), (16, 3, 3))
    np.testing.assert_allclose(np.asarray(R @ jnp.swapaxes(R, -1, -2)), eye, atol=1e-6)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), np.ones(16), atol=1e-6)


def test_inverse_compose():
    rng = np.random.default_rng(2)
    T = se3.se3_exp(_rand_xi(rng, 1.0, (8,)).astype(jnp.float64))
    I = se3.mul(T, se3.inverse(T))
    np.testing.assert_allclose(np.asarray(I), np.broadcast_to(np.eye(4), (8, 4, 4)), atol=1e-12)


def test_apply_points():
    rng = np.random.default_rng(3)
    T = se3.se3_exp(_rand_xi(rng, 0.5).astype(jnp.float64))
    pts = jnp.asarray(rng.standard_normal((10, 3)))
    out = se3.apply(T, pts)
    hom = np.concatenate([np.asarray(pts), np.ones((10, 1))], axis=1)
    exp = (np.asarray(T) @ hom.T).T[:, :3]
    np.testing.assert_allclose(np.asarray(out), exp, atol=1e-12)


def test_adjoint_identity():
    """exp(Ad(T) xi) == T exp(xi) T^-1."""
    rng = np.random.default_rng(4)
    T = se3.se3_exp(_rand_xi(rng, 0.7).astype(jnp.float64))
    xi = _rand_xi(rng, 0.01).astype(jnp.float64)
    lhs = se3.se3_exp(se3.adjoint(T) @ xi)
    rhs = se3.mul(se3.mul(T, se3.se3_exp(xi)), se3.inverse(T))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-9)


def test_log_near_pi():
    w = jnp.array([0.0, 0.0, np.pi - 1e-5], dtype=jnp.float64)
    R = se3.so3_exp(w)
    w2 = se3.so3_log(R)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-4)


def test_jit_and_grad():
    xi = jnp.zeros(6, dtype=jnp.float64) + 0.1

    def loss(x):
        T = se3.se3_exp(x)
        return jnp.sum(T[:3, 3] ** 2)

    g = jax.grad(loss)(xi)
    assert np.all(np.isfinite(np.asarray(g)))
    jitted = jax.jit(se3.se3_exp)
    np.testing.assert_allclose(np.asarray(jitted(xi)), np.asarray(se3.se3_exp(xi)), atol=1e-12)
