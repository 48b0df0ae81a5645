"""Additional golden tests: distortion models, brightness transfer,
point marginalization, struct-pose robustness."""

import jax.numpy as jnp
import numpy as np
import pytest

from sdv_loam_tpu.data.calib import load_undistorter


def _write(tmp_path, text):
    p = tmp_path / "c.txt"
    p.write_text(text)
    return str(p)


def test_radtan_undistorter(tmp_path):
    # mild radial distortion; crop should converge and produce valid remaps
    p = _write(tmp_path, "RadTan 450 450 320 240 -0.3 0.1 0.0005 -0.0005\n"
               "640 480\ncrop\n512 384\n")
    und = load_undistorter(p)
    assert und.model == "RadTan"
    assert (und.remap_x >= -1).all()
    valid = und.remap_x >= 0
    assert valid.mean() > 0.99
    # remap center approx maps to source center
    cy, cx = 192, 256
    assert abs(und.remap_x[cy, cx] - 320) < 30
    assert abs(und.remap_y[cy, cx] - 240) < 30


def test_equidistant_undistorter(tmp_path):
    p = _write(tmp_path, "EquiDistant 380 380 320 240 0.1 -0.02 0.003 -0.001\n"
               "640 480\ncrop\n512 384\n")
    und = load_undistorter(p)
    assert und.model == "EquiDistant"
    assert (und.remap_x[und.remap_x >= 0] < 639).all()


def test_fov_legacy_5float(tmp_path):
    # bare 5 floats with nonzero 5th value -> ATAN/FOV model
    p = _write(tmp_path, "0.55 0.8 0.5 0.5 0.9\n640 480\ncrop\n512 384\n")
    und = load_undistorter(p)
    assert und.model == "ATAN"
    # relative intrinsics were rescaled to pixels
    assert und.pars[0] == 0.55 * 640


def test_aff_transfer_roundtrip():
    from sdv_loam_tpu.ops.photometric import aff_transfer
    # same aff, same exposure -> identity transfer
    a = aff_transfer(jnp.float32(1.0), jnp.float32(1.0),
                     jnp.zeros(2), jnp.zeros(2))
    np.testing.assert_allclose(np.asarray(a), [1.0, 0.0], atol=1e-6)
    # exposure doubling -> gain 2
    a = aff_transfer(jnp.float32(0.01), jnp.float32(0.02),
                     jnp.zeros(2), jnp.zeros(2))
    np.testing.assert_allclose(np.asarray(a), [2.0, 0.0], atol=1e-6)
    # zero exposure -> treated as 1 (NumType.h:151-154)
    a = aff_transfer(jnp.float32(0.0), jnp.float32(5.0),
                     jnp.zeros(2), jnp.zeros(2))
    np.testing.assert_allclose(np.asarray(a), [1.0, 0.0], atol=1e-6)


def test_marginalize_points_adds_information():
    """Marginalizing points must add PSD information aligned with the
    frames their residuals constrain."""
    import tests.test_backend as tb
    from sdv_loam_tpu.models import backend

    win, seq, id_gt, valid, _ = tb._make_window(pose_noise=0.0,
                                                depth_noise=0.0)
    F = 4
    marg = np.zeros(256, bool)
    marg[np.nonzero(valid)[0][:60]] = True
    dHM, dbM = backend.marginalize_points_full(
        win["T_cw_fej"], win["eps"] * 0, win["calib"], win["frame_valid"],
        win["aff"], win["exposure"], win["pt_u"], win["pt_v"],
        jnp.asarray(id_gt, jnp.float32), win["pt_host"], win["pt_color"],
        win["pt_weights"], win["pt_is_sensor"],
        jnp.zeros(256, jnp.float32), jnp.asarray(marg),
        win["res_active"], win["res_state"], win["matcher_px"],
        win["matcher_valid"], win["dI0_stack"], win["frame_energy_th"],
        n_frames=F, w=win["w"], h=win["h"])
    dHM = np.asarray(dHM)
    dbM = np.asarray(dbM)
    # symmetric PSD-ish (Schur of PSD is PSD up to numerics)
    np.testing.assert_allclose(dHM, dHM.T, rtol=1e-4, atol=1e-3)
    evs = np.linalg.eigvalsh(0.5 * (dHM + dHM.T))
    assert evs.min() > -1e-2 * max(evs.max(), 1.0)
    # at GT with zero deltas, residuals vanish -> bM ~ 0, HM > 0
    assert np.abs(dbM).max() < 1e-2 * max(np.abs(dHM).max(), 1.0)
    assert np.trace(dHM) > 0


def test_tukey_weight_function():
    """calculateWeight semantics (CoarseTracker.cpp:873-887). Note the
    reference applies it to normalized-plane residual norms, so with
    b = 4.6851 it only clips beyond ~4.7 normalized units — effectively
    inert for in-image pixel errors (a faithfully reproduced quirk)."""
    from sdv_loam_tpu.ops.struct_pose import _tukey
    w0 = float(_tukey(jnp.float32(0.0)))
    assert w0 == 1.0
    wb = float(_tukey(jnp.float32(4.6851)))
    assert wb < 1e-6
    assert float(_tukey(jnp.float32(10.0))) == 0.0
    w_half = float(_tukey(jnp.float32(2.34)))
    assert 0.5 < w_half < 0.6


def test_struct_pose_noise_convergence():
    """With realistic pixel noise the struct pose converges near GT."""
    from sdv_loam_tpu.ops.struct_pose import struct_pose_estimate
    from sdv_loam_tpu.utils import se3
    rng = np.random.default_rng(0)
    n = 300
    fx = 400.0
    K = jnp.asarray([fx, fx, 320.0, 180.0], jnp.float32)
    pw = rng.uniform([-10, -3, 8], [10, 3, 40], (n, 3))
    T_gt = np.eye(4)
    u = pw[:, 0] / pw[:, 2] * fx + 320
    v = pw[:, 1] / pw[:, 2] * fx + 180
    obs = np.stack([u, v], -1) + rng.standard_normal((n, 2)) * 0.3
    inb = (obs[:, 0] > 2) & (obs[:, 0] < 637) & (obs[:, 1] > 2) & (obs[:, 1] < 357)
    T_init = T_gt @ np.asarray(se3.se3_exp(
        jnp.asarray([0.05, -0.04, 0.06, 0.004, -0.003, 0.002])))
    res = struct_pose_estimate(jnp.asarray(T_init, jnp.float32),
                               jnp.asarray(pw, jnp.float32),
                               jnp.asarray(obs, jnp.float32),
                               jnp.asarray(inb), K, 640, 360)
    T_est = np.asarray(res["T_cur_to_world"], np.float64)
    err = np.asarray(se3.se3_log(jnp.asarray(T_est @ np.linalg.inv(T_gt))))
    assert np.linalg.norm(err[:3]) < 5e-3, err
    assert np.linalg.norm(err[3:]) < 5e-4, err


def test_noise_injection():
    """Benchmark noise knobs (Undistort.cpp:361-469 equivalents)."""
    from sdv_loam_tpu.data.noise import (NoisySequence, apply_blur_noise,
                                         apply_photometric_noise)
    from sdv_loam_tpu.data.synthetic import make_sequence
    rng = np.random.default_rng(0)
    img = (rng.random((48, 64)) * 200).astype(np.float32)
    # geometric sampling jitter (applyNoise is a sub-pixel warp of the
    # sampling coordinates, Undistort.cpp:383-396): intensities move but the
    # value range is preserved (bilinear resample = convex combination)
    noisy = apply_photometric_noise(img, 2.0, seed=1)
    assert noisy.shape == img.shape
    assert np.abs(noisy - img).mean() > 0.1
    assert noisy.min() >= img.min() - 1e-3
    assert noisy.max() <= img.max() + 1e-3
    # a pure-translation field stays close to a shifted image: warp, not
    # additive noise
    assert np.array_equal(apply_photometric_noise(img, 0.0), img)
    blurred = apply_blur_noise(img, 1.5, seed=2)
    # blur reduces gradient energy
    ge = lambda a: np.abs(np.diff(a, axis=1)).mean()
    assert ge(blurred) < ge(img)
    # wrapper preserves reader interface
    seq = NoisySequence(make_sequence(n_frames=2, w=128, h=64, lidar_stride=8),
                        var_noise=4.0)
    im, cl, ts = seq.get(0)
    assert im.shape == (64, 128) and cl.shape[1] == 3
