"""PrefetchReader staging: order, equivalence, error surfacing."""

import numpy as np
import pytest

from sdv_loam_tpu.data.prefetch import PrefetchReader
from sdv_loam_tpu.data.synthetic import make_sequence


def test_prefetch_matches_direct():
    seq = make_sequence(n_frames=5, w=160, h=48, lidar_stride=8)
    pf = PrefetchReader(seq, depth=2)
    try:
        for i in range(5):
            img_d, cloud_d, ts_d = seq.get(i)
            img_p, cloud_p, ts_p = pf.get(i)
            np.testing.assert_array_equal(img_p, img_d)
            np.testing.assert_array_equal(cloud_p, cloud_d)
            assert ts_p == ts_d
        assert len(pf) == 5
        assert pf.calib is seq.calib  # metadata passthrough
    finally:
        pf.close()


def test_prefetch_error_surfaces():
    class Broken:
        def __len__(self):
            return 3

        def get(self, i):
            if i == 1:
                raise IOError("corrupt frame")
            return np.zeros((4, 4)), np.zeros((1, 3)), float(i)

    pf = PrefetchReader(Broken(), depth=1)
    try:
        pf.get(0)
        with pytest.raises(IOError):
            pf.get(1)
    finally:
        pf.close()


def test_prefetch_native_cloud_path(tmp_path):
    """Reader exposing velodyne_files routes clouds through the native
    prefetcher (or its fallback) and keeps frame pairing intact."""
    paths = []
    clouds = []
    rng = np.random.default_rng(3)
    for i in range(3):
        pts = rng.standard_normal((50, 4)).astype(np.float32)
        p = tmp_path / f"{i:06d}.bin"
        pts.tofile(p)
        paths.append(str(p))
        clouds.append(pts[:, :3])

    class R:
        velodyne_files = paths
        timestamps = np.arange(3) * 0.1

        def __len__(self):
            return 3

        def get_image(self, i):
            return np.full((4, 4), i, np.float32)

        def get_cloud(self, i):
            from sdv_loam_tpu.data import native
            return native.read_velodyne(paths[i])

        def get(self, i):
            return self.get_image(i), self.get_cloud(i), float(i) * 0.1

    pf = PrefetchReader(R(), depth=2)
    try:
        for i in range(3):
            img, cloud, ts = pf.get(i)
            assert img[0, 0] == i
            np.testing.assert_allclose(cloud, clouds[i], atol=0)
            assert ts == pytest.approx(0.1 * i)
    finally:
        pf.close()
