"""Sequence runner — the main-loop / process() equivalent.

Reference: src/main.cpp:468-535 + 894-997 — subscribes image & LiDAR topics,
pairs them by timestamp (±0.01 s), feeds FullSystem, and handles the full
reset when initialization fails within the first 250 frames or an explicit
reset is requested; prints the runtime summary at exit and writes the
KITTI-format trajectory.

Here the ROS transport is replaced by a reader object with `__len__` and
`get(i) -> (image, cloud, timestamp)` (KittiSequence or SyntheticSequence);
frames and scans are strictly 1:1 in KITTI so stamp pairing degenerates to
index pairing (README.md:68-76).
"""

from __future__ import annotations

import numpy as np

from sdv_loam_tpu.config import Settings
from sdv_loam_tpu.io.telemetry import Telemetry
from sdv_loam_tpu.io.trajectory import write_kitti
from sdv_loam_tpu.system.full_system import FullSystem

RESET_FRAME_LIMIT = 250  # main.cpp:510-528


def run_sequence(reader, settings: Settings | None = None,
                 observers=None, result_path: str | None = None,
                 log_path: str | None = None, max_frames: int | None = None,
                 allow_reset: bool = True, prefetch: bool = True):
    """Run the full odometry over a sequence reader.

    With `prefetch` (default), input staging (image decode + undistort remap,
    native velodyne parse) runs on a background thread/the native C++
    prefetcher so it overlaps device compute — the TPU analog of the
    reference's ROS callback queues (main.cpp:537-858).

    Returns (FullSystem, summary dict)."""
    settings = settings or Settings()
    telemetry = Telemetry(log_path=log_path, quiet=settings.debugout_runquiet)
    calib = reader.calib if not hasattr(reader, "undistorter") else \
        reader.undistorter.pyramid_calib
    if prefetch:
        from sdv_loam_tpu.data.prefetch import PrefetchReader
        reader = PrefetchReader(reader)
    fs = FullSystem(calib, reader.sensor, settings, observers=observers,
                    telemetry=telemetry)

    n = len(reader) if max_frames is None else min(max_frames, len(reader))
    i = 0
    while i < n:
        img, cloud, ts = reader.get(i)
        # per-frame exposure from the times file when present
        # (DatasetReader.h:213-217; hardwired 1.0 for plain KITTI input)
        exp = reader.get_exposure(i) if hasattr(reader, "get_exposure") \
            else 1.0
        fs.add_active_frame(np.asarray(img), np.asarray(cloud), float(ts),
                            exposure=exp)

        # full reset: init failure early in the sequence (main.cpp:510-528).
        # Like the reference, the rebuilt system restarts its trajectory
        # (output wrappers are preserved, state is not).
        if allow_reset and (fs.init_failed or
                            (fs.is_lost and len(fs.shells) < RESET_FRAME_LIMIT)):
            print("RESETTING!")
            for ob in (observers or []):
                ob.reset()
            fs = FullSystem(calib, reader.sensor, settings,
                            observers=observers, telemetry=telemetry)
        i += 1

    if prefetch:
        reader.close()
    summary = telemetry.summary()
    summary["lost"] = fs.is_lost
    if settings.log_stuff:
        # frame-lifetime dump (printFrameLifetimes, FullSystem.cpp:1501-1532)
        telemetry.log_lifetimes(fs.shells)
    if not settings.debugout_runquiet:
        print(f"frames: {summary['frames']}  fps: {summary['fps']}  "
              f"ms/frame: {summary['ms_per_frame']}")
    if result_path:
        write_kitti(result_path, fs.get_trajectory())
    for ob in (observers or []):
        ob.join()
    telemetry.close()
    return fs, summary
