"""Lockstep multi-sequence driver: exactness vs single-sequence execution."""

import numpy as np

from sdv_loam_tpu.config import Settings
from sdv_loam_tpu.data.synthetic import make_sequence
from sdv_loam_tpu.system.full_system import FullSystem
from sdv_loam_tpu.system.multi import MultiSystem


def _settings():
    return Settings(desired_immature_density=600, desired_point_density=800,
                    n_active_cap=2048, n_immature_cap=2048)


def test_lockstep_matches_single():
    """Driving B sequences in stage-lockstep must be bit-identical to
    driving each alone: the generator protocol only batches readbacks."""
    n = 8
    seqs = [make_sequence(n_frames=n, w=320, h=96, step=0.8,
                          yaw_rate=yr, lidar_stride=2)
            for yr in (0.004, 0.012)]
    # single-sequence reference runs
    singles = []
    for seq in seqs:
        fs = FullSystem(seq.calib, seq.sensor, _settings())
        for i in range(n):
            img, cloud, ts = seq.get(i)
            fs.add_active_frame(img, cloud, ts)
        singles.append(fs.get_trajectory())

    # lockstep run
    ms = MultiSystem([FullSystem(seq.calib, seq.sensor, _settings())
                      for seq in seqs])
    for i in range(n):
        ms.add_frames([seq.get(i) for seq in seqs])
    for fs, ref in zip(ms.systems, singles):
        np.testing.assert_array_equal(fs.get_trajectory(), ref)
        assert not fs.is_lost


def test_lockstep_ragged_lengths():
    """Sequences of different lengths: finished ones pass None."""
    seqA = make_sequence(n_frames=6, w=320, h=96, step=0.8, lidar_stride=2)
    seqB = make_sequence(n_frames=4, w=320, h=96, step=0.8, lidar_stride=2)
    ms = MultiSystem([FullSystem(seqA.calib, seqA.sensor, _settings()),
                      FullSystem(seqB.calib, seqB.sensor, _settings())])
    for i in range(6):
        ms.add_frames([seqA.get(i), seqB.get(i) if i < 4 else None])
    assert len(ms.systems[0].shells) == 6
    assert len(ms.systems[1].shells) == 4


def test_threaded_host_staging_matches_serial():
    """Advancing the B generators on a thread pool (host-staging overlap)
    must be bit-identical to the serial loop: the systems are independent
    and the driver still resolves every round in lockstep."""
    n = 8
    seqs = [make_sequence(n_frames=n, w=320, h=96, step=0.8,
                          yaw_rate=yr, lidar_stride=2)
            for yr in (0.004, 0.012)]

    def run(workers):
        ms = MultiSystem([FullSystem(seq.calib, seq.sensor, _settings())
                          for seq in seqs], host_workers=workers)
        for i in range(n):
            ms.add_frames([seq.get(i) for seq in seqs])
        return [fs.get_trajectory() for fs in ms.systems]

    ref = run(0)
    out = run(2)
    for a, b in zip(ref, out):
        np.testing.assert_array_equal(b, a)


def test_batched_track_matches_unbatched():
    """The vmapped fleet track program (track_frame_step_batch) must give
    each sequence the same trajectory as per-sequence dispatch (same ops on
    a leading batch axis; only the fleet-max while_loop iteration counts
    can differ, which does not change converged results)."""
    n = 8
    seqs = [make_sequence(n_frames=n, w=320, h=96, step=0.8,
                          yaw_rate=yr, lidar_stride=2)
            for yr in (0.004, 0.012)]

    def run(batch):
        ms = MultiSystem([FullSystem(seq.calib, seq.sensor, _settings())
                          for seq in seqs], batch_track=batch)
        for i in range(n):
            ms.add_frames([seq.get(i) for seq in seqs])
        return [fs.get_trajectory() for fs in ms.systems]

    ref = run(False)
    out = run(True)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(b, a, atol=1e-5)


import pytest


@pytest.mark.parametrize("workers", [0, 2])
def test_interleaved_matches_single(workers):
    """The interleaved fleet (B pipelined systems round-robined) must be
    bit-identical per sequence to running each system alone in pipelined
    mode, in both the serial and the threaded (workers>0) drivers: systems
    share only the device queue, never state (ADVICE r4: the threaded path
    previously ran only under SDV_BENCH_FLEET_WORKERS, untested)."""
    n = 8
    seqs = [make_sequence(n_frames=n, w=320, h=96, step=0.8,
                          yaw_rate=yr, lidar_stride=2)
            for yr in (0.004, 0.012)]

    def _ps():
        return Settings(desired_immature_density=600,
                        desired_point_density=800, n_active_cap=2048,
                        n_immature_cap=2048, pipelined_frames=True)

    singles = []
    for seq in seqs:
        fs = FullSystem(seq.calib, seq.sensor, _ps())
        for i in range(n):
            fs.add_active_frame(*seq.get(i))
        singles.append(fs.get_trajectory())

    from sdv_loam_tpu.system.multi import InterleavedFleet
    fleet = InterleavedFleet([FullSystem(seq.calib, seq.sensor, _ps())
                              for seq in seqs], workers=workers)
    for i in range(n):
        fleet.add_frames([seq.get(i) for seq in seqs])
    fleet.flush()
    for fs, ref in zip(fleet.systems, singles):
        np.testing.assert_array_equal(fs.get_trajectory(), ref)
        assert not fs.is_lost
