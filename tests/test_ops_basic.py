"""Tests for pyramid, bilinear warp ops against NumPy oracles."""

import jax.numpy as jnp
import numpy as np

from sdv_loam_tpu.ops.pyramid import make_images
from sdv_loam_tpu.ops.warp import bilinear_sample, gather_patches


def test_pyramid_avgpool_and_gradients():
    rng = np.random.default_rng(0)
    img = rng.random((64, 96)).astype(np.float32) * 255
    dI, ag = make_images(jnp.asarray(img), 3)
    assert len(dI) == 3
    assert dI[0].shape == (64, 96, 3)
    assert dI[1].shape == (32, 48, 3)
    # level1 = exact 2x2 mean
    exp1 = img.reshape(32, 2, 48, 2).mean(axis=(1, 3))
    np.testing.assert_allclose(np.asarray(dI[1][..., 0]), exp1, atol=1e-4)
    # gradient oracle (interior)
    dx = 0.5 * (img[:, 2:] - img[:, :-2])
    np.testing.assert_allclose(np.asarray(dI[0][:, 1:-1, 1]), dx, atol=1e-4)
    dy = 0.5 * (img[2:, :] - img[:-2, :])
    np.testing.assert_allclose(np.asarray(dI[0][1:-1, :, 2]), dy, atol=1e-4)
    # abs grad
    np.testing.assert_allclose(
        np.asarray(ag[0][1:-1, 1:-1]),
        dx[1:-1, :] ** 2 + dy[:, 1:-1] ** 2, atol=1e-3)


def test_bilinear_sample_matches_scipy():
    from scipy.ndimage import map_coordinates
    rng = np.random.default_rng(1)
    img = rng.random((40, 50)).astype(np.float32)
    x = rng.uniform(0, 48.9, 200)
    y = rng.uniform(0, 38.9, 200)
    out, valid = bilinear_sample(jnp.asarray(img), jnp.asarray(x), jnp.asarray(y))
    exp = map_coordinates(img, [y, x], order=1)
    assert np.asarray(valid).all()
    np.testing.assert_allclose(np.asarray(out), exp, atol=1e-5)


def test_bilinear_sample_oob_masked():
    img = jnp.ones((10, 10))
    out, valid = bilinear_sample(img, jnp.array([-1.0, 5.0, 9.5]),
                                 jnp.array([5.0, 20.0, 5.0]))
    assert list(np.asarray(valid)) == [False, False, False]
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_gather_patches_shapes():
    rng = np.random.default_rng(2)
    img = rng.random((30, 30, 3)).astype(np.float32)
    offs = jnp.asarray(np.array([[0, -2], [-1, -1], [0, 0]], np.int32))
    vals, valid = gather_patches(jnp.asarray(img), jnp.array([5.0, 10.0]),
                                 jnp.array([5.0, 10.0]), offs)
    assert vals.shape == (2, 3, 3)
    assert np.asarray(valid).all()
    np.testing.assert_allclose(np.asarray(vals[0, 2]), img[5, 5], atol=1e-6)
