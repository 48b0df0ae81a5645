"""Epipolar trace + activation tests on the synthetic scene."""

import jax.numpy as jnp
import numpy as np

from sdv_loam_tpu.data.synthetic import make_sequence
from sdv_loam_tpu.ops.pyramid import make_images
from sdv_loam_tpu.ops.trace import (IPS_GOOD, IPS_OOB, activate_points,
                                    pattern_colors, trace_points)


def _prep(w=320, h=96, step=0.7, n=256, seed=0):
    seq = make_sequence(n_frames=2, w=w, h=h, step=step, yaw_rate=0.003)
    c = seq.calib
    img0 = seq.get_image(0)
    img1 = seq.get_image(1)
    depth0 = seq.get_depth(0)
    dI0, _ = make_images(jnp.asarray(img0), c.levels)
    dI1, _ = make_images(jnp.asarray(img1), c.levels)
    rng = np.random.default_rng(seed)
    us = rng.integers(12, w - 12, n).astype(np.float32)
    vs = rng.integers(12, h - 12, n).astype(np.float32)
    z = depth0[vs.astype(int), us.astype(int)]
    K = np.array([c.fx[0], c.fy[0], c.cx[0], c.cy[0]], np.float32)
    Km = c.K(0)
    T10 = np.linalg.inv(seq.poses_wc[1]) @ seq.poses_wc[0]
    KRKi = (Km @ T10[:3, :3] @ np.linalg.inv(Km)).astype(np.float32)
    Kt = (Km @ T10[:3, 3]).astype(np.float32)
    return seq, c, dI0, dI1, us, vs, z, K, KRKi, Kt, T10


def test_trace_converges_to_gt_depth():
    seq, c, dI0, dI1, us, vs, z, K, KRKi, Kt, T10 = _prep()
    n = us.shape[0]
    color, weights, gradH, finite, _ = pattern_colors(dI0[0], jnp.asarray(us),
                                                   jnp.asarray(vs))
    # wide prior interval around the true inverse depth
    id_gt = 1.0 / z
    id_min = np.maximum(id_gt * 0.5, 1e-4).astype(np.float32)
    id_max = (id_gt * 2.0).astype(np.float32)
    status = np.full(n, IPS_GOOD, np.int32)
    out = trace_points(
        jnp.asarray(us), jnp.asarray(vs), jnp.asarray(id_min),
        jnp.asarray(id_max), jnp.asarray(status),
        jnp.full(n, 10000.0, jnp.float32), color, weights, gradH,
        jnp.full(n, 8 * 144.0, jnp.float32), jnp.zeros(n, jnp.int32),
        jnp.asarray(KRKi)[None], jnp.asarray(Kt)[None],
        jnp.asarray([[1.0, 0.0]], jnp.float32), dI1[0],
        w=c.w[0], h=c.h[0])
    st = np.asarray(out["status"])
    good = st == IPS_GOOD
    assert good.sum() > n * 0.4, good.sum()
    mid = 0.5 * (np.asarray(out["idepth_min"]) + np.asarray(out["idepth_max"]))
    rel = np.abs(mid[good] - id_gt[good]) / id_gt[good]
    assert np.median(rel) < 0.05, np.median(rel)
    # traced pixel should match the GT projection
    xn = (us - K[2]) / K[0]
    yn = (vs - K[3]) / K[1]
    pr = np.stack([xn, yn, np.ones_like(xn)], -1) * z[:, None]
    pf = pr @ T10[:3, :3].T + T10[:3, 3]
    gt_u = pf[:, 0] / pf[:, 2] * K[0] + K[2]
    gt_v = pf[:, 1] / pf[:, 2] * K[1] + K[3]
    err = np.hypot(np.asarray(out["last_u"])[good] - gt_u[good],
                   np.asarray(out["last_v"])[good] - gt_v[good])
    assert np.median(err) < 1.0, np.median(err)


def test_trace_oob_points_flagged():
    seq, c, dI0, dI1, us, vs, z, K, KRKi, Kt, T10 = _prep()
    n = 8
    # points whose idepth_min projects outside the image -> OOB
    us2 = np.full(n, 6.0, np.float32)
    vs2 = np.full(n, 6.0, np.float32)
    color, weights, gradH, _, _ = pattern_colors(dI0[0], jnp.asarray(us2),
                                              jnp.asarray(vs2))
    out = trace_points(
        jnp.asarray(us2), jnp.asarray(vs2),
        jnp.full(n, 0.9, jnp.float32), jnp.full(n, 1.1, jnp.float32),
        jnp.zeros(n, jnp.int32), jnp.full(n, 10000.0, jnp.float32),
        color, weights, gradH, jnp.full(n, 8 * 144.0, jnp.float32),
        jnp.zeros(n, jnp.int32), jnp.asarray(KRKi)[None],
        jnp.asarray(Kt)[None], jnp.asarray([[1.0, 0.0]], jnp.float32),
        dI1[0], w=c.w[0], h=c.h[0])
    # near the border with large idepth, the scale gate (z in 0.75..1.5 only
    # when idepth_min >= 0) or bounds gate must fire for most
    st = np.asarray(out["status"])
    assert (st != IPS_GOOD).any()


def test_activation_refines_depth():
    seq, c, dI0, dI1, us, vs, z, K, KRKi, Kt, T10 = _prep(n=128)
    n = us.shape[0]
    color, weights, gradH, _, _ = pattern_colors(dI0[0], jnp.asarray(us),
                                              jnp.asarray(vs))
    F = 2
    # pair transforms host->target: pair id = host*F + target
    R_pair = np.tile(np.eye(3, dtype=np.float32), (F * F, 1, 1))
    t_pair = np.zeros((F * F, 3), np.float32)
    R_pair[0 * F + 1] = (T10[:3, :3]).astype(np.float32)
    t_pair[0 * F + 1] = T10[:3, 3].astype(np.float32)
    aff_pair = np.tile(np.array([1.0, 0.0], np.float32), (F * F, 1))
    dI0_stack = jnp.stack([dI0[0], dI1[0]])

    id_gt = (1.0 / z).astype(np.float32)
    id_init = id_gt * 1.15  # 15% off
    out = activate_points(
        jnp.asarray(us), jnp.asarray(vs), jnp.asarray(id_init), color,
        weights, jnp.zeros(n, jnp.int32), jnp.zeros(n, bool),
        jnp.ones(n, bool), jnp.asarray([True, True]),
        jnp.asarray(R_pair), jnp.asarray(t_pair), jnp.asarray(aff_pair),
        dI0_stack, jnp.asarray(K), jnp.full(n, 8 * 144.0, jnp.float32),
        w=c.w[0], h=c.h[0], n_frames=F)
    suc = np.asarray(out["success"])
    idf = np.asarray(out["idepth"])
    assert suc.sum() > 30, suc.sum()
    rel0 = np.abs(id_init - id_gt) / id_gt
    rel1 = np.abs(idf - id_gt) / id_gt
    # GN must reduce the depth error substantially for successful points
    assert np.median(rel1[suc]) < 0.5 * np.median(rel0[suc])


def test_activation_sensor_points_fixed():
    seq, c, dI0, dI1, us, vs, z, K, KRKi, Kt, T10 = _prep(n=32)
    n = us.shape[0]
    color, weights, gradH, _, _ = pattern_colors(dI0[0], jnp.asarray(us),
                                              jnp.asarray(vs))
    F = 2
    R_pair = np.tile(np.eye(3, dtype=np.float32), (F * F, 1, 1))
    t_pair = np.zeros((F * F, 3), np.float32)
    aff_pair = np.tile(np.array([1.0, 0.0], np.float32), (F * F, 1))
    id_init = (1.0 / z).astype(np.float32)
    out = activate_points(
        jnp.asarray(us), jnp.asarray(vs), jnp.asarray(id_init), color,
        weights, jnp.zeros(n, jnp.int32), jnp.ones(n, bool),
        jnp.ones(n, bool), jnp.asarray([True, True]),
        jnp.asarray(R_pair), jnp.asarray(t_pair), jnp.asarray(aff_pair),
        jnp.stack([dI0[0], dI1[0]]), jnp.asarray(K),
        jnp.full(n, 8 * 144.0, jnp.float32), w=c.w[0], h=c.h[0], n_frames=F)
    # sensor depths unchanged, all succeed, all valid targets inliers
    np.testing.assert_array_equal(np.asarray(out["idepth"]), id_init)
    assert np.asarray(out["success"]).all()
    assert np.asarray(out["inlier_targets"])[:, 1].all()
