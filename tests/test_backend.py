"""BA backend tests: Jacobian finite differences and full-window convergence
on a synthetic problem with known ground truth."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sdv_loam_tpu.config import CPARS, Settings
from sdv_loam_tpu.data.synthetic import make_sequence
from sdv_loam_tpu.models import backend
from sdv_loam_tpu.ops.pyramid import make_images
from sdv_loam_tpu.utils import se3


def _make_window(n_frames=4, n_pts=256, w=320, h=96, seed=0,
                 pose_noise=0.01, depth_noise=0.05):
    """Synthetic window: GT scene, frames along the trajectory, points from
    frame-0 GT depth, matcher = exact GT projections into each target."""
    seq = make_sequence(n_frames=n_frames, w=w, h=h, step=0.8, yaw_rate=0.006)
    c = seq.calib
    F = n_frames
    rng = np.random.default_rng(seed)

    imgs = [seq.get_image(i) for i in range(F)]
    dI = [make_images(jnp.asarray(im), c.levels)[0] for im in imgs]
    dI0_stack = jnp.stack([d[0] for d in dI])

    depth0 = seq.get_depth(0)
    us = rng.integers(8, w - 8, n_pts).astype(np.float32)
    vs = rng.integers(8, h - 8, n_pts).astype(np.float32)
    z = depth0[vs.astype(int), us.astype(int)]
    valid = np.isfinite(z) & (z > 2.0)
    id_gt = np.where(valid, 1.0 / np.maximum(z, 1e-3), 0.05)

    K = np.array([c.fx[0], c.fy[0], c.cx[0], c.cy[0]], np.float32)
    T_wc_gt = seq.poses_wc[:F]
    T_cw_gt = np.linalg.inv(T_wc_gt)

    # matcher = GT projections of GT points into each target frame
    xn = (us - K[2]) / K[0]
    yn = (vs - K[3]) / K[1]
    p0 = np.stack([xn, yn, np.ones_like(xn)], -1) / id_gt[:, None]
    pw = (T_wc_gt[0, :3, :3] @ p0.T).T + T_wc_gt[0, :3, 3]
    matcher = np.zeros((n_pts, F, 2), np.float32)
    mvalid = np.zeros((n_pts, F), bool)
    for t in range(F):
        pf = (T_cw_gt[t, :3, :3] @ pw.T).T + T_cw_gt[t, :3, 3]
        uu = pf[:, 0] / pf[:, 2] * K[0] + K[2]
        vv = pf[:, 1] / pf[:, 2] * K[1] + K[3]
        ok = valid & (pf[:, 2] > 0.1) & (uu > 3) & (uu < w - 4) & (vv > 3) & (vv < h - 4)
        matcher[:, t, 0] = uu
        matcher[:, t, 1] = vv
        mvalid[:, t] = ok
    mvalid[:, 0] = False  # no residual host->host

    # Perturbed initial state. The perturbation goes into the FEJ poses
    # (eps = 0), matching production: each frame's eval point is its tracked
    # insertion pose and the BA's correction accumulates in eps. (With the
    # reference-exact resf_at_fej residual the active term is measured AT
    # the FEJ, so an eps-only perturbation around a ground-truth FEJ would
    # be invisible to it by design.)
    eps0 = rng.standard_normal((F, 6)) * pose_noise
    eps0[0] = 0.0  # first frame gauge-fixed by prior
    # half the points are LiDAR/sensor points with exact, trusted depth —
    # they pin the scale gauge exactly as in SDV-LOAM
    is_sensor = np.arange(n_pts) % 2 == 0
    idepth0 = np.where(
        is_sensor, id_gt,
        id_gt * (1.0 + rng.standard_normal(n_pts) * depth_noise))

    colors, weights = [], []
    from sdv_loam_tpu.ops.trace import pattern_colors
    col, wgt, _, _, _ = pattern_colors(dI[0][0], jnp.asarray(us), jnp.asarray(vs))

    D = CPARS + 6 * F
    frame_prior = np.zeros((F, 6), np.float32)
    frame_prior[0] = 1e8  # gauge: pin first frame

    T_cw_fej0 = np.asarray(se3.se3_exp(jnp.asarray(eps0))) @ T_cw_gt

    win = dict(
        T_cw_fej=jnp.asarray(T_cw_fej0, jnp.float32),  # FEJ = perturbed
        eps=jnp.zeros((F, 6), jnp.float32),
        calib=jnp.asarray(K), calib_zero=jnp.asarray(K),
        frame_valid=jnp.ones(F, bool),
        frame_prior=jnp.asarray(frame_prior),
        c_prior=jnp.full(4, 2e6, jnp.float32),
        aff=jnp.zeros((F, 2), jnp.float32),
        exposure=jnp.ones(F, jnp.float32),
        HM=jnp.zeros((D, D), jnp.float32), bM=jnp.zeros(D, jnp.float32),
        newest=F - 1,
        frame_energy_th=jnp.full(F, 12.0 * 12.0 * 8.0, jnp.float32),
        pt_u=jnp.asarray(us), pt_v=jnp.asarray(vs),
        pt_idepth=jnp.asarray(idepth0, jnp.float32),
        pt_host=jnp.zeros(n_pts, jnp.int32),
        pt_color=col, pt_weights=wgt,
        pt_is_sensor=jnp.asarray(is_sensor),
        pt_prior=jnp.zeros(n_pts, jnp.float32),
        pt_valid=jnp.asarray(valid),
        res_active=jnp.asarray(mvalid),
        res_state=jnp.zeros((n_pts, F), jnp.int8),
        matcher_px=jnp.asarray(matcher),
        matcher_valid=jnp.asarray(mvalid),
        dI0_stack=dI0_stack, w=w, h=h,
    )
    return win, seq, id_gt, valid, eps0


def test_linearize_zero_residual_at_gt():
    win, seq, id_gt, valid, _ = _make_window(pose_noise=0.0, depth_noise=0.0)
    pairs = backend.make_pairs(win["T_cw_fej"], win["T_cw_fej"], win["aff"],
                               win["exposure"], win["calib"])
    lin = backend.linearize_residuals(
        win["pt_u"], win["pt_v"], jnp.asarray(id_gt, jnp.float32),
        win["pt_host"], win["pt_color"], win["pt_weights"],
        win["res_active"], win["res_state"], win["matcher_px"],
        win["matcher_valid"], pairs, win["dI0_stack"],
        win["frame_energy_th"], win["calib"], w=win["w"], h=win["h"])
    r = np.asarray(lin["resF"])
    st = np.asarray(lin["new_state"])
    act = np.asarray(win["res_active"])
    # at GT everything projects exactly onto the matcher
    inl = (st == backend.RES_IN) & act
    assert inl.sum() > 200
    assert np.abs(r[inl]).max() < 1e-2


def test_linearize_jacobian_fd():
    """Finite-difference check of the idepth Jacobian (unweighted regime)."""
    win, seq, id_gt, valid, _ = _make_window(pose_noise=0.0, depth_noise=0.02)
    pairs = backend.make_pairs(win["T_cw_fej"], win["T_cw_fej"], win["aff"],
                               win["exposure"], win["calib"])

    def res_at(idepth):
        lin = backend.linearize_residuals(
            win["pt_u"], win["pt_v"], idepth, win["pt_host"],
            win["pt_color"], win["pt_weights"], win["res_active"],
            win["res_state"], win["matcher_px"], win["matcher_valid"],
            pairs, win["dI0_stack"], win["frame_energy_th"], win["calib"],
            w=win["w"], h=win["h"])
        return lin

    lin0 = res_at(win["pt_idepth"])
    eps_fd = 1e-4
    lin1 = res_at(win["pt_idepth"] + eps_fd)
    fd = (np.asarray(lin1["resF"]) - np.asarray(lin0["resF"])) / eps_fd
    Jd = np.asarray(lin0["Jd"])
    st = np.asarray(lin0["new_state"])
    m = (st == backend.RES_IN) & (np.asarray(lin1["new_state"]) == backend.RES_IN)
    # the huber weight is ~1 for small residuals; compare where weight is 1
    small = np.linalg.norm(np.asarray(lin0["resF"]), axis=-1) < 5.0
    m = m & small
    assert m.sum() > 100
    rel = np.abs(fd[m] - Jd[m]) / (np.abs(Jd[m]) + 1.0)
    assert np.median(rel) < 0.05


def test_ba_converges_to_gt():
    """Consistent-GN mode (resf_at_fej=False): the optimizer machinery must
    recover ground truth from perturbed insertions — a pure math check of
    Jacobians/solve/Schur. The production default measures the residual at
    the FEJ (reference-exact) and intentionally does NOT have this property
    (see test_ba_fej_anchored_to_insertion)."""
    win, seq, id_gt, valid, eps0 = _make_window(pose_noise=0.01,
                                                depth_noise=0.05)
    # floor off: this is the EXACT-math check (the production damping
    # floor trades tail-convergence speed for robustness to thinned
    # residual graphs; its production behavior is pinned separately by
    # test_ba_converges_with_damping_floor)
    s = Settings(ba_resf_at_fej=False, ba_lm_diag_floor=0.0)
    win_out, lin_final, pairs, diag = backend.ba_optimize(win, s, max_iters=8)
    # compare gauge-invariant relative poses (the step is orthogonalized
    # against the 7 gauge/scale nullspace directions from iteration >= 2,
    # exactly like the reference's SOLVER_ORTHOGONALIZE_X_LATER, so absolute
    # window pose comparisons are gauge-contaminated)
    eps_f = np.asarray(win_out["eps"])
    T_fej = np.asarray(win_out["T_cw_fej"])
    T_cw_gt = np.linalg.inv(seq.poses_wc[:4])
    T_est = [np.asarray(se3.se3_exp(jnp.asarray(eps_f[f]))) @ T_fej[f]
             for f in range(4)]
    for f in range(3):
        rel_est = T_est[f + 1] @ np.linalg.inv(T_est[f])
        rel_gt = T_cw_gt[f + 1] @ np.linalg.inv(T_cw_gt[f])
        err = np.asarray(se3.se3_log(jnp.asarray(rel_est @ np.linalg.inv(rel_gt))))
        # init relative errors are ~0.02 m / 0.01 rad (pose_noise=0.01 on
        # both frames); BA must shrink them substantially
        assert np.linalg.norm(err[:3]) < 8e-3, (f, err)
        assert np.linalg.norm(err[3:]) < 1e-3, (f, err)
    # depths refined toward GT
    idf = np.asarray(win_out["pt_idepth"])
    n_act = np.asarray((np.asarray(win_out["res_state"]) == 0).sum(-1))
    m = valid & (n_act >= 2) & ~np.asarray(win["pt_is_sensor"])
    rel0 = np.abs(np.asarray(win["pt_idepth"]) - id_gt) / id_gt
    rel1 = np.abs(idf - id_gt) / id_gt
    assert np.median(rel1[m]) < 0.3 * np.median(rel0[m])
    assert diag["rmse"] < 1.0


def test_ba_converges_with_damping_floor():
    """The damping-floor knob (ba_lm_diag_floor; regime-dependent tuning,
    default 0 — see config.py) must still recover the window to near-GT
    at its strongest useful setting — only the convergence TAIL may be
    slower than the exact multiplicative form (the floor adds
    lam*rel*mean|diag| stiffness, which bounds thinned directions but
    biases the last fraction of every step)."""
    win, seq, id_gt, valid, eps0 = _make_window(pose_noise=0.01,
                                                depth_noise=0.05)
    s = Settings(ba_resf_at_fej=False, ba_lm_diag_floor=1e-2)
    win_out, _, _, diag = backend.ba_optimize(win, s, max_iters=12)
    eps_f = np.asarray(win_out["eps"])
    T_fej = np.asarray(win_out["T_cw_fej"])
    T_cw_gt = np.linalg.inv(seq.poses_wc[:4])
    T_est = [np.asarray(se3.se3_exp(jnp.asarray(eps_f[f]))) @ T_fej[f]
             for f in range(4)]
    for f in range(3):
        rel_est = T_est[f + 1] @ np.linalg.inv(T_est[f])
        rel_gt = T_cw_gt[f + 1] @ np.linalg.inv(T_cw_gt[f])
        err = np.asarray(se3.se3_log(jnp.asarray(rel_est
                                                 @ np.linalg.inv(rel_gt))))
        # init relative errors ~0.02 m / 0.01 rad; the floored LM must
        # still shrink them (bound 1.5x the exact-math test's)
        assert np.linalg.norm(err[:3]) < 1.2e-2, (f, err)
        assert np.linalg.norm(err[3:]) < 1.5e-3, (f, err)
    assert diag["rmse"] < 1.0


def test_ba_fej_anchored_to_insertion():
    """Reference-exact mode (resf_at_fej=True, the default): the 2-D
    residual is measured at the FEJ pair pose (Residuals.cpp:93-96), so the
    BA is ANCHORED — window poses stay near their insertion values (bounded
    wander, no large excursions) instead of chasing the matcher. This is
    the property that prevents the long-horizon matcher feedback runaway
    (tools/drift_bisect.py)."""
    # Production-realistic: insertion poses accurate (two-stage tracking is
    # mm-level), mono depths noisy. With a badly perturbed FEJ the FEJ-
    # measured residual would push the error into the depths instead — the
    # reference has the same property and relies on its tracker.
    win, seq, id_gt, valid, eps0 = _make_window(pose_noise=0.0005,
                                                depth_noise=0.05)
    s = Settings()  # default: ba_resf_at_fej=True
    win_out, lin_final, pairs, diag = backend.ba_optimize(win, s, max_iters=8)
    eps_f = np.asarray(win_out["eps"])
    # pose wander stays well below the insertion perturbation scale: the
    # newest frame's eps was re-zeroed at its (fixed) eval point, the rest
    # moved at most a few mm/mrad
    F = eps_f.shape[0]
    for f in range(F - 1):
        assert np.linalg.norm(eps_f[f]) < 0.02, (f, eps_f[f])
    # mono depths still refine toward GT (idepth enters the FEJ projection,
    # so depth-GN signal survives the pose anchoring)
    idf = np.asarray(win_out["pt_idepth"])
    n_act = np.asarray((np.asarray(win_out["res_state"]) == 0).sum(-1))
    m = valid & (n_act >= 2) & ~np.asarray(win["pt_is_sensor"])
    rel0 = np.abs(np.asarray(win["pt_idepth"]) - id_gt) / id_gt
    rel1 = np.abs(idf - id_gt) / id_gt
    assert np.median(rel1[m]) < 0.7 * np.median(rel0[m])
    assert np.isfinite(diag["energy"])


def test_sensor_points_depth_pinned():
    win, seq, id_gt, valid, _ = _make_window(pose_noise=0.005,
                                             depth_noise=0.0)
    win["pt_is_sensor"] = jnp.ones_like(win["pt_is_sensor"])
    s = Settings()
    win_out, _, _, _ = backend.ba_optimize(win, s, max_iters=4)
    np.testing.assert_array_equal(np.asarray(win_out["pt_idepth"]),
                                  np.asarray(win["pt_idepth"]))


def test_marginalize_frame_slot():
    F = 4
    D = CPARS + 6 * F
    rng = np.random.default_rng(3)
    A = rng.standard_normal((D, D + 8))
    HM = (A @ A.T).astype(np.float32)
    bM = rng.standard_normal(D).astype(np.float32)
    slot = 1
    HM2, bM2 = backend.marginalize_frame(
        jnp.asarray(HM), jnp.asarray(bM), jnp.zeros(6, jnp.float32),
        jnp.zeros(6, jnp.float32), slot=slot, n_frames=F)
    HM2 = np.asarray(HM2)
    bM2 = np.asarray(bM2)
    io = CPARS + 6 * slot
    # slot zeroed
    assert np.abs(HM2[io:io + 6, :]).max() == 0
    assert np.abs(bM2[io:io + 6]).max() == 0
    # Schur complement oracle on the remaining indices
    keep = np.r_[np.arange(io), np.arange(io + 6, D)]
    Hkk = HM[io:io + 6, io:io + 6]
    Hks = HM[io:io + 6][:, keep]
    oracle = HM[np.ix_(keep, keep)] - Hks.T @ np.linalg.inv(Hkk) @ Hks
    b_oracle = bM[keep] - Hks.T @ np.linalg.inv(Hkk) @ bM[io:io + 6]
    np.testing.assert_allclose(HM2[np.ix_(keep, keep)], oracle, rtol=2e-2,
                               atol=2e-2)
    np.testing.assert_allclose(bM2[keep], b_oracle, rtol=2e-2, atol=5e-2)


def test_ba_host_vs_jit_equivalence():
    """The host-driven LM (ba_optimize, the readable spec) and the one-program
    LM (ba_optimize_jit, the production path) must agree: same window in,
    same state out (VERDICT r1 weak item 6 — one LM driver, one truth)."""
    win, seq, id_gt, valid, _ = _make_window(pose_noise=0.01,
                                             depth_noise=0.05)
    s = Settings()
    iters = 8
    win_host, _, _, _ = backend.ba_optimize(win, s, max_iters=iters)

    out = backend.ba_optimize_jit(
        win["T_cw_fej"], win["eps"], win["calib"], win["calib_zero"],
        win["frame_valid"], win["frame_prior"], win["c_prior"], win["aff"],
        win["exposure"], win["HM"], win["bM"], jnp.int32(win["newest"]),
        win["frame_energy_th"], win["pt_u"], win["pt_v"], win["pt_idepth"],
        win["pt_host"], win["pt_color"], win["pt_weights"],
        win["pt_is_sensor"], win["pt_prior"], win["res_active"],
        win["res_state"], win["matcher_px"], win["matcher_valid"],
        win["dI0_stack"], jnp.int32(iters),
        jnp.int32(s.min_opt_iterations), jnp.float32(s.th_opt_iterations),
        jnp.bool_(s.force_accept_step),
        n_frames=win["T_cw_fej"].shape[0], w=win["w"], h=win["h"],
        lm_diag_floor=s.ba_lm_diag_floor)

    # same final camToWorld per frame (gauge is pinned by the frame-0 prior)
    T_host = np.asarray(se3.se3_exp(win_host["eps"])) @ \
        np.asarray(win_host["T_cw_fej"])
    T_jit = np.asarray(se3.se3_exp(out["eps"])) @ np.asarray(out["T_cw_fej"])
    for f in range(T_host.shape[0]):
        dT = T_host[f] @ np.linalg.inv(T_jit[f])
        err = np.asarray(se3.se3_log(jnp.asarray(dT, jnp.float64)))
        assert np.linalg.norm(err) < 1e-4, (f, err)
    np.testing.assert_allclose(np.asarray(win_host["calib"]),
                               np.asarray(out["calib"]), rtol=1e-5)
    pv = np.asarray(win["pt_valid"])
    np.testing.assert_allclose(np.asarray(win_host["pt_idepth"])[pv],
                               np.asarray(out["idepth"])[pv],
                               rtol=5e-3, atol=5e-5)
    np.testing.assert_array_equal(np.asarray(win_host["res_state"])[pv],
                                  np.asarray(out["new_state"])[pv])
