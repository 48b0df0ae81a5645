"""Tests for calib parsing, undistortion, and the synthetic sequence."""

import os

import numpy as np
import pytest

from sdv_loam_tpu.data.calib import load_sensor_calib, load_undistorter
from sdv_loam_tpu.data.synthetic import make_sequence

KITTI_CALIB = """Pinhole 718.856 718.856 607.1928 185.2157 0
1241 376
crop
1200 360
"""

SENSOR = """718.856 718.856 607.1928 185.2157
4.276802385584e-04 -9.999672484946e-01 -8.084491683471e-03 -1.198459927713e-02
-7.210626507497e-03 8.081198471645e-03 -9.999413164504e-01 -5.403984729748e-02
9.999738645903e-01 4.859485810390e-04 -7.206933692422e-03 -2.921968648686e-01
"""


@pytest.fixture
def calib_file(tmp_path):
    p = tmp_path / "calib.txt"
    p.write_text(KITTI_CALIB)
    return str(p)


def test_crop_undistorter_kitti(calib_file):
    und = load_undistorter(calib_file)
    assert und.model == "Pinhole"
    assert (und.out_w, und.out_h) == (1200, 360)
    # crop of a distortion-free pinhole ≈ rescale: focal changes by < 5%
    assert abs(und.K_new[0, 0] / 718.856 - 1.0) < 0.05
    # all remap targets valid & inside the source image
    assert (und.remap_x >= 0).all()
    assert (und.remap_x < 1241 - 1).all()
    assert (und.remap_y < 376 - 1).all()
    # pyramid: 1200x360 -> 4 levels
    assert und.pyramid_calib.levels == 4


def test_undistort_preserves_constant_image(calib_file):
    und = load_undistorter(calib_file)
    img = np.full((376, 1241), 77.0, dtype=np.float32)
    out = und.undistort(img)
    assert out.shape == (360, 1200)
    np.testing.assert_allclose(out, 77.0, atol=1e-4)


def test_none_mode_passthrough(tmp_path):
    p = tmp_path / "c.txt"
    p.write_text("Pinhole 100 100 63.5 47.5 0\n128 96\nnone\n128 96\n")
    und = load_undistorter(str(p))
    assert und.passthrough
    img = np.random.default_rng(0).random((96, 128)).astype(np.float32)
    np.testing.assert_array_equal(und.undistort(img), img)


def test_sensor_file(tmp_path):
    p = tmp_path / "s.txt"
    p.write_text(SENSOR)
    s = load_sensor_calib(str(p))
    # rotation should be orthonormal (KITTI's cam<-velo)
    np.testing.assert_allclose(s.R_cl @ s.R_cl.T, np.eye(3), atol=1e-5)
    assert abs(s.t_cl[2] + 0.292) < 1e-3
    T = s.T_cam_lidar
    assert T.shape == (4, 4) and T[3, 3] == 1.0


def test_synthetic_sequence_geometry():
    seq = make_sequence(n_frames=3, w=160, h=64, lidar_stride=8)
    img, cloud, ts = seq.get(0)
    assert img.shape == (64, 160)
    assert img.max() > 100 and img.min() >= 0
    # LiDAR points: in lidar frame, x forward — most points ahead
    assert cloud.shape[1] == 3 and cloud.shape[0] > 500
    # depth image is positive and finite in lower half (ground visible)
    depth = seq.get_depth(0)
    lower = depth[48:, :]
    assert np.isfinite(lower).all() and (lower > 0).all()

    # Consistency: project lidar points through T_cam_lidar into the camera;
    # their depth must match the rendered depth image at the pixel (same scene).
    T_cl = seq.sensor.T_cam_lidar
    pc = (T_cl[:3, :3] @ cloud.T).T + T_cl[:3, 3]
    front = pc[pc[:, 2] > 1.0]
    c = seq.calib
    u = front[:, 0] / front[:, 2] * c.fx[0] + c.cx[0]
    v = front[:, 1] / front[:, 2] * c.fy[0] + c.cy[0]
    inside = (u >= 1) & (u < c.w[0] - 1) & (v >= 1) & (v < c.h[0] - 1)
    ui = np.round(u[inside]).astype(int)
    vi = np.round(v[inside]).astype(int)
    z = front[inside, 2]
    dz = depth[vi, ui]
    ok = np.isfinite(dz)
    # rounding to nearest pixel => small parallax error near edges; median tight
    rel = np.abs(z[ok] - dz[ok]) / dz[ok]
    assert np.median(rel) < 0.01
    assert inside.sum() > 200


def test_synthetic_photoconsistency():
    """Warping frame 1 into frame 0 via GT depth+pose reproduces intensities."""
    seq = make_sequence(n_frames=2, w=160, h=64)
    img0 = seq.get_image(0)
    img1 = seq.get_image(1)
    depth0 = seq.get_depth(0)
    c = seq.calib
    T01 = np.linalg.inv(seq.poses_wc[1]) @ seq.poses_wc[0]  # cam1 <- cam0
    ys, xs = np.mgrid[8:56, 8:152]
    z = depth0[ys, xs]
    x3 = (xs - c.cx[0]) / c.fx[0] * z
    y3 = (ys - c.cy[0]) / c.fy[0] * z
    p1 = (T01[:3, :3] @ np.stack([x3, y3, z]).reshape(3, -1)).T + T01[:3, 3]
    good = p1[:, 2] > 0.1
    u1 = p1[good, 0] / p1[good, 2] * c.fx[0] + c.cx[0]
    v1 = p1[good, 1] / p1[good, 2] * c.fy[0] + c.cy[0]
    inb = (u1 >= 0) & (u1 < 159) & (v1 >= 0) & (v1 < 63)
    from scipy.ndimage import map_coordinates
    samp = map_coordinates(img1, [v1[inb], u1[inb]], order=1)
    ref = img0[ys, xs].reshape(-1)[good][inb]
    err = np.abs(samp - ref)
    assert np.median(err) < 2.0  # sub-intensity-level photoconsistency
