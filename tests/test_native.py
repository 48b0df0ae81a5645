"""Native C++ staging library tests (skipped if not built)."""

import numpy as np
import pytest

from sdv_loam_tpu.data import native


def _write_bin(tmp_path, name, pts):
    raw = np.zeros((pts.shape[0], 4), np.float32)
    raw[:, :3] = pts
    p = tmp_path / name
    raw.tofile(str(p))
    return str(p)


def test_read_velodyne_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((500, 3)).astype(np.float32) * 20
    pts[10] = np.nan  # must be filtered
    path = _write_bin(tmp_path, "000000.bin", pts)
    out = native.read_velodyne(path)
    assert out.shape == (499, 3)
    np.testing.assert_allclose(out[:10], pts[:10], rtol=1e-6)


def test_undistort_remap_matches_numpy(tmp_path):
    rng = np.random.default_rng(1)
    src = rng.random((48, 64)).astype(np.float32)
    ry, rx = np.mgrid[0:40, 0:56].astype(np.float32)
    rx = rx + 0.37
    ry = ry + 0.21
    rx[0, :5] = -1  # invalid
    out = native.undistort_remap(src, rx, ry)
    # oracle
    from scipy.ndimage import map_coordinates
    exp = map_coordinates(src, [ry, np.maximum(rx, 0)], order=1)
    valid = rx >= 0
    np.testing.assert_allclose(out[valid], exp[valid], atol=1e-5)
    assert (out[~valid] == 0).all()


def test_prefetcher_order(tmp_path):
    rng = np.random.default_rng(2)
    paths = []
    for i in range(5):
        pts = rng.standard_normal((100 + i, 3)).astype(np.float32)
        paths.append(_write_bin(tmp_path, f"{i:06d}.bin", pts))
    pf = native.CloudPrefetcher(paths, max_points=1000, depth=2)
    seen = []
    while True:
        item = pf.next()
        if item is None:
            break
        idx, cloud = item
        seen.append((idx, cloud.shape[0]))
    pf.close()
    assert seen == [(0, 100), (1, 101), (2, 102), (3, 103), (4, 104)]


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_lib_present():
    assert native.available()
