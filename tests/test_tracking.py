"""Photometric tracker + struct pose tests on the synthetic scene with GT."""

import jax
import jax.numpy as jnp
import numpy as np

from sdv_loam_tpu.data.synthetic import make_sequence
from sdv_loam_tpu.ops.photometric import (build_track_ref, calc_res_gs,
                                          splat_idepth, track_pyramid)
from sdv_loam_tpu.ops.pyramid import make_images
from sdv_loam_tpu.ops.struct_pose import struct_pose_estimate
from sdv_loam_tpu.utils import se3


def _setup(n_pts=1500, w=320, h=96, step=0.6, seed=0):
    seq = make_sequence(n_frames=3, w=w, h=h, step=step, yaw_rate=0.01)
    c = seq.calib
    img0 = seq.get_image(0)
    img1 = seq.get_image(1)
    depth0 = seq.get_depth(0)
    dI0, _ = make_images(jnp.asarray(img0), c.levels)
    dI1, _ = make_images(jnp.asarray(img1), c.levels)
    # sample GT-depth points on a grid (interior)
    rng = np.random.default_rng(seed)
    us = rng.integers(6, w - 6, n_pts)
    vs = rng.integers(6, h - 6, n_pts)
    z = depth0[vs, us]
    ok = np.isfinite(z) & (z > 1.0)
    id0, w0 = splat_idepth(jnp.asarray(us[ok]), jnp.asarray(vs[ok]),
                           jnp.asarray(1.0 / z[ok]),
                           jnp.ones(ok.sum(), jnp.float32),
                           jnp.ones(ok.sum(), bool), w, h)
    pools = build_track_ref(dI0, id0, w0, c.levels, cap=8192)
    Ks = tuple(jnp.asarray([c.fx[l], c.fy[l], c.cx[l], c.cy[l]], jnp.float32)
               for l in range(c.levels))
    T_gt = np.linalg.inv(seq.poses_wc[1]) @ seq.poses_wc[0]  # ref->new
    return seq, pools, dI1, Ks, T_gt, depth0


def test_calc_res_zero_at_gt():
    seq, pools, dI1, Ks, T_gt, _ = _setup()
    r = calc_res_gs(pools[0], dI1[0], Ks[0],
                    jnp.asarray(T_gt, jnp.float32), jnp.array([1.0, 0.0]),
                    0.0, 20.0, 6.0)
    rmse_gt = float(np.sqrt(r["E"] / max(1, int(r["n"]))))
    # at GT pose, photometric error should be tiny (interp noise only)
    assert rmse_gt < 3.0, rmse_gt
    # at a perturbed pose it must be much larger
    T_bad = se3.mul(jnp.asarray(T_gt, jnp.float32),
                    se3.se3_exp(jnp.array([0.3, 0, 0, 0, 0.02, 0], jnp.float32)))
    rb = calc_res_gs(pools[0], dI1[0], Ks[0], T_bad, jnp.array([1.0, 0.0]),
                     0.0, 20.0, 6.0)
    rmse_bad = float(np.sqrt(rb["E"] / max(1, int(rb["n"]))))
    assert rmse_bad > 3 * rmse_gt


def test_track_pyramid_recovers_pose():
    seq, pools, dI1, Ks, T_gt, _ = _setup()
    out = track_pyramid(pools, dI1, Ks,
                        jnp.eye(4, dtype=jnp.float32),
                        jnp.zeros(2, jnp.float32), jnp.zeros(2, jnp.float32),
                        jnp.array([1.0, 1.0], jnp.float32),
                        jnp.full((5,), jnp.inf, jnp.float32),
                        20.0, 6.0, coarsest_lvl=seq.calib.levels - 1)
    assert bool(out["ok"])
    T_est = np.asarray(out["T"], np.float64)
    err = se3.se3_log(jnp.asarray(np.linalg.inv(T_est) @ T_gt))
    terr = float(np.linalg.norm(np.asarray(err[:3])))
    rerr = float(np.linalg.norm(np.asarray(err[3:])))
    # step is 0.6m; require cm-level translation and <0.2deg rotation
    assert terr < 0.02, (terr, rerr)
    assert rerr < 0.004, (terr, rerr)


def test_struct_pose_estimation_recovers_pose():
    seq = make_sequence(n_frames=2, w=320, h=96, step=0.8, yaw_rate=0.01)
    c = seq.calib
    depth1 = seq.get_depth(1)
    rng = np.random.default_rng(1)
    n = 400
    us = rng.uniform(6, 314, n)
    vs = rng.uniform(6, 90, n)
    z = depth1[vs.astype(int), us.astype(int)]
    ok = np.isfinite(z)
    T_wc1 = seq.poses_wc[1]
    # world points = backproject from frame 1 GT
    x3 = (us - c.cx[0]) / c.fx[0] * z
    y3 = (vs - c.cy[0]) / c.fy[0] * z
    pw = (T_wc1[:3, :3] @ np.stack([x3, y3, z])).T + T_wc1[:3, 3]
    # observations: their exact pixels in frame 1 plus small noise
    obs = np.stack([us, vs], -1) + rng.standard_normal((n, 2)) * 0.1
    # init pose: GT perturbed
    T_init = T_wc1 @ np.asarray(
        se3.se3_exp(jnp.array([0.05, -0.03, 0.08, 0.004, -0.006, 0.003])))
    out = struct_pose_estimate(jnp.asarray(T_init, jnp.float32),
                               jnp.asarray(pw, jnp.float32),
                               jnp.asarray(obs, jnp.float32),
                               jnp.asarray(ok),
                               jnp.asarray([c.fx[0], c.fy[0], c.cx[0], c.cy[0]],
                                           jnp.float32),
                               c.w[0], c.h[0])
    T_est = np.asarray(out["T_cur_to_world"], np.float64)
    err = np.asarray(se3.se3_log(jnp.asarray(np.linalg.inv(T_est) @ T_wc1)))
    assert np.linalg.norm(err[:3]) < 0.01
    assert np.linalg.norm(err[3:]) < 0.001
    assert int(out["n_inliers"]) > 300


def test_build_track_ref_pools():
    seq, pools, dI1, Ks, T_gt, depth0 = _setup()
    p0 = pools[0]
    n0 = int(p0["n"])
    assert n0 > 1000
    # pool idepths match GT depth at those pixels (within dilation tolerance)
    us = np.asarray(p0["u"][:200]).astype(int)
    vs = np.asarray(p0["v"][:200]).astype(int)
    idp = np.asarray(p0["idepth"][:200])
    gt = 1.0 / depth0[vs, us]
    rel = np.abs(idp - gt) / gt
    assert np.median(rel) < 0.05
    # higher levels populated too
    assert int(pools[2]["n"]) > 100
