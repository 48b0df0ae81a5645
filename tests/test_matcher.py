"""Reprojector/matcher tests on the synthetic scene."""

import jax.numpy as jnp
import numpy as np

from sdv_loam_tpu.data.synthetic import make_sequence
from sdv_loam_tpu.models.matcher import reproject_and_match
from sdv_loam_tpu.ops.align import flatten_pyramid
from sdv_loam_tpu.ops.pyramid import make_images
from sdv_loam_tpu.utils import se3


def test_match_recovers_projection():
    w, h = 320, 96
    seq = make_sequence(n_frames=2, w=w, h=h, step=0.5, yaw_rate=0.005)
    c = seq.calib
    img0 = seq.get_image(0)
    img1 = seq.get_image(1)
    depth0 = seq.get_depth(0)
    dI0, _ = make_images(jnp.asarray(img0), c.levels)
    dI1, _ = make_images(jnp.asarray(img1), c.levels)

    F = 2
    dI0_stack = jnp.stack([dI0[0], dI1[0]])
    T_wc = jnp.asarray(np.stack([seq.poses_wc[0], seq.poses_wc[1]]), jnp.float32)
    aff = jnp.zeros((F, 2), jnp.float32)
    expo = jnp.ones((F,), jnp.float32)

    rng = np.random.default_rng(0)
    N = 512
    us = rng.integers(10, w - 10, N).astype(np.float32)
    vs = rng.integers(10, h - 10, N).astype(np.float32)
    z = depth0[vs.astype(int), us.astype(int)]
    valid = np.isfinite(z) & (z > 2.0)
    idepth = np.where(valid, 1.0 / np.maximum(z, 1e-3), 0.01)

    flat, offs, ws, hs = flatten_pyramid(dI1)
    # perturb the target pose slightly: matcher must still find the true pixel
    T_wc_t_pert = np.asarray(T_wc[1], np.float64) @ np.asarray(
        se3.se3_exp(jnp.array([0.02, -0.01, 0.03, 0.001, -0.002, 0.001])))

    out = reproject_and_match(
        jnp.asarray(us), jnp.asarray(vs), jnp.asarray(idepth),
        jnp.zeros(N, jnp.int32), jnp.zeros(N, jnp.int32), jnp.asarray(valid),
        jnp.asarray(rng.random(N), jnp.float32), jnp.ones(N, bool),
        T_wc, aff, expo, dI0_stack, flat, offs, ws, hs,
        jnp.asarray(T_wc_t_pert, jnp.float32), jnp.zeros(2, jnp.float32),
        jnp.float32(1.0),
        jnp.asarray([c.fx[0], c.fy[0], c.cx[0], c.cy[0]], jnp.float32),
        jnp.zeros(N, jnp.int32), w=w, h=h, max_level=c.levels - 1)

    matched = np.asarray(out["matched"])
    px = np.asarray(out["px"])
    assert matched.sum() > 30, matched.sum()

    # ground-truth projection into frame 1 (true pose)
    T10 = np.linalg.inv(seq.poses_wc[1]) @ seq.poses_wc[0]
    xn = (us - c.cx[0]) / c.fx[0]
    yn = (vs - c.cy[0]) / c.fy[0]
    pr = np.stack([xn, yn, np.ones_like(xn)], -1) / np.maximum(idepth, 1e-9)[:, None]
    pf = pr @ T10[:3, :3].T + T10[:3, 3]
    gt_u = pf[:, 0] / pf[:, 2] * c.fx[0] + c.cx[0]
    gt_v = pf[:, 1] / pf[:, 2] * c.fy[0] + c.cy[0]

    err = np.hypot(px[matched, 0] - gt_u[matched], px[matched, 1] - gt_v[matched])
    # aligned matches should land sub-pixel from the true projection
    assert np.median(err) < 0.5, np.median(err)


def test_one_match_per_cell():
    w, h = 320, 96
    seq = make_sequence(n_frames=2, w=w, h=h, step=0.5)
    c = seq.calib
    img0 = seq.get_image(0)
    img1 = seq.get_image(1)
    depth0 = seq.get_depth(0)
    dI0, _ = make_images(jnp.asarray(img0), c.levels)
    dI1, _ = make_images(jnp.asarray(img1), c.levels)
    dI0_stack = jnp.stack([dI0[0], dI1[0]])
    T_wc = jnp.asarray(np.stack([seq.poses_wc[0], seq.poses_wc[1]]), jnp.float32)

    rng = np.random.default_rng(1)
    N = 600
    us = rng.uniform(10, w - 10, N).astype(np.float32)
    vs = rng.uniform(10, h - 10, N).astype(np.float32)
    z = depth0[vs.astype(int), us.astype(int)]
    valid = np.isfinite(z)
    idepth = 1.0 / np.maximum(z, 1e-3)
    flat, offs, ws, hs = flatten_pyramid(dI1)
    out = reproject_and_match(
        jnp.asarray(us), jnp.asarray(vs), jnp.asarray(idepth),
        jnp.zeros(N, jnp.int32), jnp.zeros(N, jnp.int32), jnp.asarray(valid),
        jnp.asarray(rng.random(N), jnp.float32), jnp.ones(N, bool),
        T_wc, jnp.zeros((2, 2), jnp.float32), jnp.ones(2, jnp.float32),
        dI0_stack, flat, offs, ws, hs,
        T_wc[1], jnp.zeros(2, jnp.float32), jnp.float32(1.0),
        jnp.asarray([c.fx[0], c.fy[0], c.cx[0], c.cy[0]], jnp.float32),
        jnp.zeros(N, jnp.int32), w=w, h=h, max_level=c.levels - 1)
    matched = np.asarray(out["matched"])
    px = np.asarray(out["px"])
    # one match max per 25px cell (cell computed from the projected pixel)
    n_cols = -(-w // 25)
    cells = (px[matched, 1].astype(int) // 25) * n_cols + \
        px[matched, 0].astype(int) // 25
    # matches may drift slightly across a cell edge after alignment; bin by
    # match position should still be nearly unique
    _, counts = np.unique(cells, return_counts=True)
    assert (counts <= 2).all()
    assert matched.sum() >= 40  # 52 cells total at 320x96


def test_align_batch_matches_split_aligners():
    """The unified corner+edgelet aligner must agree with the split
    align2d_batch / align1d_batch oracles (same math, fused loop)."""
    import jax.numpy as jnp
    from sdv_loam_tpu.ops.align import (align1d_batch, align2d_batch,
                                        align_batch, flatten_pyramid,
                                        quad_from_flat)
    rng = np.random.default_rng(3)
    h, w = 64, 96
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = (np.sin(xx * 0.35) * 40 + np.cos(yy * 0.23) * 40
           + rng.random((h, w)) * 5).astype(np.float32)
    dx = np.zeros_like(img)
    dy = np.zeros_like(img)
    dx[:, 1:-1] = 0.5 * (img[:, 2:] - img[:, :-2])
    dy[1:-1, :] = 0.5 * (img[2:, :] - img[:-2, :])
    dI = np.stack([img, dx, dy], -1)
    flat, offs, ws, hs = flatten_pyramid((jnp.asarray(dI),))

    M = 8
    gt = np.stack([rng.uniform(12, w - 12, M), rng.uniform(12, h - 12, M)],
                  -1).astype(np.float32)
    # reference patches cut from the true location (identity warp)
    patches = np.zeros((M, 10, 10), np.float32)
    for i in range(M):
        for r in range(10):
            for c in range(10):
                u = gt[i, 0] + c - 5
                v = gt[i, 1] + r - 5
                u0, v0 = int(u), int(v)
                au, av = u - u0, v - v0
                patches[i, r, c] = (
                    img[v0, u0] * (1 - au) * (1 - av)
                    + img[v0, u0 + 1] * au * (1 - av)
                    + img[v0 + 1, u0] * (1 - au) * av
                    + img[v0 + 1, u0 + 1] * au * av)
    init = gt + rng.uniform(-1.5, 1.5, (M, 2)).astype(np.float32)
    lvl = jnp.zeros(M, jnp.int32)
    ones = jnp.ones(M, jnp.float32)
    zeros = jnp.zeros(M, jnp.float32)
    valid = jnp.ones(M, bool)
    d = rng.standard_normal((M, 2)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    px2, c2 = align2d_batch(flat, offs, ws, hs, lvl, jnp.asarray(patches),
                            jnp.asarray(init), ones, zeros, valid)
    px1, c1 = align1d_batch(flat, offs, ws, hs, lvl, jnp.asarray(patches),
                            jnp.asarray(init), jnp.asarray(d), ones, zeros,
                            valid)
    quad = quad_from_flat(flat, w, h, 1)
    for is_edge in (np.zeros(M, bool), np.ones(M, bool)):
        pxu, cu, _ = align_batch(quad, offs, ws, hs, lvl, jnp.asarray(patches),
                              jnp.asarray(init), jnp.asarray(d),
                              jnp.asarray(is_edge), ones, zeros, valid)
        exp_px, exp_c = (px1, c1) if is_edge[0] else (px2, c2)
        np.testing.assert_array_equal(np.asarray(cu), np.asarray(exp_c))
        np.testing.assert_allclose(np.asarray(pxu), np.asarray(exp_px),
                                   atol=2e-3)
    # and the corner path actually recovers the ground truth
    ok = np.asarray(c2)
    assert ok.sum() >= M - 2
    np.testing.assert_allclose(np.asarray(px2)[ok], gt[ok], atol=0.1)
