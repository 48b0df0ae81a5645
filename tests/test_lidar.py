"""LiDAR preprocessing tests: oracles for binning/ground and a Python BFS
oracle for the segmentation semantics (reference main.cpp:658-783)."""

import jax.numpy as jnp
import numpy as np

from sdv_loam_tpu.config import (ANG_BOTTOM, ANG_RES_X, ANG_RES_Y,
                                 GROUND_SCAN_IND, HORIZON_SCAN, N_SCAN,
                                 SEGMENT_ALPHA_X, SEGMENT_ALPHA_Y,
                                 SEGMENT_THETA)
from sdv_loam_tpu.data.synthetic import make_sequence
from sdv_loam_tpu.ops.lidar import (ground_removal, preprocess_scan,
                                    project_point_cloud, segment_cloud)


def _pad(cloud, cap=120000):
    n = cloud.shape[0]
    out = np.zeros((cap, 3), np.float32)
    out[:n] = cloud
    mask = np.zeros(cap, bool)
    mask[:n] = True
    return jnp.asarray(out), jnp.asarray(mask)


def test_range_projection_binning():
    # a point straight ahead (x fwd) at known ring/col
    ring, col = 30, HORIZON_SCAN // 2
    vert = np.deg2rad(ring * ANG_RES_Y - ANG_BOTTOM + 0.5 * ANG_RES_Y)
    r = 10.0
    p = np.array([[r * np.cos(vert), 0.0, r * np.sin(vert)]], np.float32)
    cloud, mask = _pad(p)
    rimg, xyz = project_point_cloud(cloud, mask)
    rimg = np.asarray(rimg)
    assert np.isfinite(rimg[ring, col])
    np.testing.assert_allclose(rimg[ring, col], r, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(xyz[ring, col]), p[0], rtol=1e-5)
    # nearest wins
    p2 = np.concatenate([p, p * 0.5])
    cloud, mask = _pad(p2)
    rimg, _ = project_point_cloud(cloud, mask)
    np.testing.assert_allclose(np.asarray(rimg)[ring, col], r * 0.5, rtol=1e-5)


def test_ground_detection_flat_plane():
    """Points on a z = -1.73 plane must be flagged ground on low rings."""
    rows = np.arange(20)  # low rings hit the ground ahead
    # bin centers (+0.5) so float noise can't push points across ring edges
    vert = np.deg2rad((rows + 0.5) * ANG_RES_Y - ANG_BOTTOM)
    assert (vert < 0).all()
    dist = 1.73 / -np.sin(vert)
    cols = np.arange(800, 1000)
    h = np.deg2rad((HORIZON_SCAN / 2 - cols) * ANG_RES_X + 90.0)
    pts = []
    for r_i, d in zip(rows, dist):
        x = d * np.cos(vert[r_i]) * np.sin(h)
        y = d * np.cos(vert[r_i]) * np.cos(h)
        z = np.full_like(x, -1.73)
        pts.append(np.stack([x, y, z], -1))
    cloud, mask = _pad(np.concatenate(pts).astype(np.float32))
    rimg, xyz = project_point_cloud(cloud, mask)
    g = np.asarray(ground_removal(rimg, xyz))
    # interior rows of the patch should be ground=1
    assert (g[2:18, 820:980] == 1).mean() > 0.9


def _bfs_oracle(rimg):
    """Reference-semantics BFS connected components (labelComponents)."""
    import collections
    lab = np.zeros_like(rimg, dtype=int)
    lab[~np.isfinite(rimg)] = -1
    next_label = 1
    feasible_mask = np.zeros_like(rimg, bool)
    for i in range(N_SCAN):
        for j in range(HORIZON_SCAN):
            if lab[i, j] != 0:
                continue
            q = collections.deque([(i, j)])
            comp = [(i, j)]
            lab[i, j] = next_label
            while q:
                ci, cj = q.popleft()
                for di, dj, alpha in ((-1, 0, SEGMENT_ALPHA_Y), (1, 0, SEGMENT_ALPHA_Y),
                                      (0, -1, SEGMENT_ALPHA_X), (0, 1, SEGMENT_ALPHA_X)):
                    ni = ci + di
                    nj = (cj + dj) % HORIZON_SCAN
                    if ni < 0 or ni >= N_SCAN or lab[ni, nj] != 0:
                        continue
                    d1 = max(rimg[ci, cj], rimg[ni, nj])
                    d2 = min(rimg[ci, cj], rimg[ni, nj])
                    ang = np.arctan2(d2 * np.sin(alpha), d1 - d2 * np.cos(alpha))
                    if ang > SEGMENT_THETA:
                        lab[ni, nj] = next_label
                        comp.append((ni, nj))
                        q.append((ni, nj))
            rows = {c[0] for c in comp}
            ok = len(comp) >= 30 or (len(comp) >= 5 and len(rows) >= 3)
            if ok:
                for c in comp:
                    feasible_mask[c] = True
            next_label += 1
    return feasible_mask


def test_segmentation_matches_bfs_oracle():
    rng = np.random.default_rng(3)
    rimg = np.full((N_SCAN, HORIZON_SCAN), np.inf, np.float32)
    # blob A: large smooth wall -> feasible
    rimg[10:20, 100:200] = 10.0 + rng.random((10, 100)) * 0.01
    # blob B: tiny cluster on one ring -> infeasible
    rimg[40, 300:304] = 5.0
    # blob C: 6 points across 3 rings -> feasible via line rule
    rimg[30, 500:502] = 7.0
    rimg[31, 500:502] = 7.0
    rimg[32, 500:502] = 7.0
    # blob D: wrap-around wall crossing the column seam
    rimg[25:28, 1780:1800] = 9.0
    rimg[25:28, 0:20] = 9.0
    ground = np.zeros((N_SCAN, HORIZON_SCAN), np.int8)
    seg, isg = segment_cloud(jnp.asarray(rimg), jnp.asarray(ground))
    seg = np.asarray(seg)
    oracle = _bfs_oracle(rimg)
    np.testing.assert_array_equal(seg, oracle)
    assert seg[15, 150] and not seg[40, 301] and seg[31, 500]
    assert seg[26, 1790] and seg[26, 10]


def test_full_preprocess_on_synthetic():
    seq = make_sequence(n_frames=1, w=320, h=96, lidar_stride=1)
    img, cloud, _ = seq.get(0)
    c = seq.calib
    cloudj, maskj = _pad(cloud, cap=131072)
    out = preprocess_scan(cloudj, maskj,
                          jnp.asarray(seq.sensor.R_cl), jnp.asarray(seq.sensor.t_cl),
                          c.fx[0], c.fy[0], c.cx[0], c.cy[0], c.w[0], c.h[0])
    depth_map = np.asarray(out["depth_map"])
    n_cand = (depth_map > 0).sum()
    assert n_cand > 300, f"too few projected candidates: {n_cand}"
    # depths must agree with the rendered GT depth image
    gt = seq.get_depth(0)
    vs, us = np.nonzero(depth_map > 0)
    rel = np.abs(depth_map[vs, us] - gt[vs, us]) / gt[vs, us]
    assert np.median(rel) < 0.02
    # scene has walls -> not predominantly ground
    assert float(out["ground_ratio"]) < 0.8
    assert not bool(out["add_feature_point"])
