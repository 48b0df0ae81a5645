"""Tests for KNN, image IO, and the matplotlib viewer observer."""

import numpy as np
import jax.numpy as jnp

from sdv_loam_tpu.ops.knn import knn, nearest_cross


def test_knn_matches_bruteforce_oracle():
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((100, 2)).astype(np.float32)
    valid = np.ones(100, bool)
    valid[7] = False
    idx, d2 = knn(jnp.asarray(pts), jnp.asarray(valid), k=5)
    idx = np.asarray(idx)
    d2 = np.asarray(d2)
    # oracle for a few rows
    for i in [0, 3, 50]:
        dd = ((pts[i] - pts) ** 2).sum(1)
        dd[i] = np.inf
        dd[~valid] = np.inf
        exp = np.argsort(dd)[:5]
        np.testing.assert_array_equal(np.sort(idx[i]), np.sort(exp))
    assert 7 not in idx[valid]


def test_nearest_cross():
    a = jnp.asarray(np.array([[0.0, 0.0], [5.0, 5.0]], np.float32))
    b = jnp.asarray(np.array([[1.0, 0.0], [4.0, 5.0], [100.0, 0.0]],
                             np.float32))
    idx, d2 = nearest_cross(a, jnp.ones(2, bool), b, jnp.ones(3, bool))
    np.testing.assert_array_equal(np.asarray(idx), [0, 1])
    np.testing.assert_allclose(np.asarray(d2), [1.0, 1.0])


def test_image_io_roundtrip(tmp_path):
    from sdv_loam_tpu.io.images import colorize_idepth, read_gray, write_image
    rng = np.random.default_rng(1)
    img = (rng.random((32, 48)) * 255).astype(np.uint8)
    p = str(tmp_path / "x.png")
    write_image(p, img)
    back = read_gray(p)
    np.testing.assert_array_equal(back, img)
    col = colorize_idepth(rng.random((16, 16)).astype(np.float32))
    assert col.shape == (16, 16, 3) and col.dtype == np.uint8


def test_viewer_writes_snapshots(tmp_path):
    from sdv_loam_tpu.io.viewer import MatplotlibViewer
    v = MatplotlibViewer(str(tmp_path))
    for i in range(3):
        T = np.eye(4)
        T[2, 3] = i
        v.publish_cam_pose(i, 0.1 * i, T)
    pts = np.random.default_rng(0).standard_normal((50, 3))
    v.publish_keyframes([0], np.eye(4)[None], pts, np.zeros(50, int))
    import os
    assert any(f.endswith(".png") for f in os.listdir(tmp_path))


def test_pallas_distance_transform_matches_jnp():
    """The Pallas stencil kernel must agree with the jnp reference (on CPU
    this exercises the fallback; on TPU CI it exercises the kernel)."""
    import jax.numpy as jnp
    from sdv_loam_tpu.ops.distmap import _relax_jnp
    from sdv_loam_tpu.ops.pallas_kernels import distance_transform_pallas
    rng = np.random.default_rng(5)
    seed = np.full((40, 130), 1000.0, np.float32)
    pts = rng.integers(0, 40, 12), rng.integers(0, 130, 12)
    seed[pts] = 0.0
    a = np.asarray(_relax_jnp(jnp.asarray(seed), 32))
    b = np.asarray(distance_transform_pallas(jnp.asarray(seed), iters=32))
    np.testing.assert_allclose(a, b, atol=1e-5)
    # sanity: chessboard distance from the nearest seed
    ys, xs = np.mgrid[0:40, 0:130]
    exp = np.min(np.maximum(np.abs(ys[..., None] - pts[0][None, None]),
                            np.abs(xs[..., None] - pts[1][None, None])),
                 axis=-1)
    np.testing.assert_allclose(a, np.minimum(exp, 1000.0), atol=1e-5)
