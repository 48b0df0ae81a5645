"""Exposure/times-file input path (DatasetReader.h:152-275 legacy format).

The reference's legacy reader parses `id stamp exposure` rows, interpolates
zero exposures from neighbors, and feeds the exposure into the photometric
model (ImageAndExposure; AffLight::fromToVecExposure then divides it out of
the brightness transfer). KITTI's own times.txt is stamp-only (exposure
hardwired 1.0)."""

import numpy as np

from sdv_loam_tpu.config import Settings
from sdv_loam_tpu.data.synthetic import make_sequence
from sdv_loam_tpu.eval.ate import ate_rmse
from sdv_loam_tpu.system.full_system import FullSystem


def test_times_file_exposure_parsing(tmp_path):
    """TUM-style 3-column times file: exposures read, zeros interpolated;
    KITTI-style 1-column: all-1.0."""
    from sdv_loam_tpu.data.kitti import KittiSequence

    seq = tmp_path / "sequences" / "00"
    (seq / "image_0").mkdir(parents=True)
    (seq / "velodyne").mkdir()
    try:
        import cv2
    except ImportError:
        import pytest
        pytest.skip("cv2 unavailable")
    for i in range(4):
        cv2.imwrite(str(seq / "image_0" / f"{i:06d}.png"),
                    np.zeros((32, 48), np.uint8))
        np.zeros((8, 4), np.float32).tofile(seq / "velodyne" / f"{i:06d}.bin")
    calib = tmp_path / "calib.txt"
    calib.write_text("Pinhole 30 30 24 16 0\n48 32\nnone\n48 32\n")
    sensor = tmp_path / "sensor.txt"
    sensor.write_text("30 30 24 16\n1 0 0 0\n0 1 0 0\n0 0 1 0\n")

    (seq / "times.txt").write_text(
        "0 0.00 9.8\n1 0.10 0.0\n2 0.20 10.2\n3 0.30 10.4\n")
    r = KittiSequence.open(str(seq), str(calib), str(sensor))
    assert np.allclose(r.exposures, [9.8, 10.0, 10.2, 10.4])
    assert r.get_exposure(1) == 10.0
    assert np.allclose(r.timestamps, [0.0, 0.1, 0.2, 0.3])

    (seq / "times.txt").write_text("0.0\n0.1\n0.2\n0.3\n")
    r = KittiSequence.open(str(seq), str(calib), str(sensor))
    assert np.allclose(r.exposures, 1.0)
    assert np.allclose(r.timestamps, [0.0, 0.1, 0.2, 0.3])


def test_exposure_varying_sequence():
    """A sequence whose images are scaled by a varying known exposure must
    track fine with the exposure fed through (the brightness transfer
    divides the ratio out, AffLight::fromToVecExposure, NumType.h:149-159)
    and carry the values into the window state."""
    n = 10
    seq = make_sequence(n_frames=n, w=320, h=96)
    exps = 10.0 * (1.0 + 0.25 * np.sin(np.arange(n)))
    fs = FullSystem(seq.calib, seq.sensor, Settings())
    for i in range(n):
        img, cloud, ts = seq.get(i)
        scaled = np.clip(img * (exps[i] / 10.0), 0, 255)
        fs.add_active_frame(scaled, cloud, ts, exposure=float(exps[i]))
    fs.flush()
    assert not fs.is_lost
    ate = ate_rmse(fs.get_trajectory(), seq.poses_wc[:n])
    assert ate < 0.1, ate
    # the window's exposure stack holds the fed per-frame values
    used = [fs.exposure[sl] for sl in fs.order]
    assert all(e in exps.astype(np.float32) for e in np.float32(used)), used
