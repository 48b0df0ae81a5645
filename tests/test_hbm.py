"""HBM accounting + fleet capacity regression tests (VERDICT r3 item 1).

Round 3's B=8 fleet OOMed the 16 GB v5e because nothing bounded or even
measured per-system device bytes. These tests pin the accounting helpers
and the per-system persistent footprint so capacity regressions surface
on CPU before the chip.
"""

import numpy as np
import pytest

from sdv_loam_tpu.config import Settings
from sdv_loam_tpu.data.synthetic import make_sequence
from sdv_loam_tpu.system.full_system import FullSystem
from sdv_loam_tpu.system.multi import MultiSystem
from sdv_loam_tpu.utils import hbm


def _run(seq, n, settings):
    fs = FullSystem(seq.calib, seq.sensor, settings)
    for i in range(n):
        img, cloud, ts = seq.get(i)
        fs.add_active_frame(img, cloud, ts)
    fs.flush()
    return fs


def test_tree_device_bytes_dedup():
    import jax.numpy as jnp
    a = jnp.zeros((100,), jnp.float32)
    b = jnp.zeros((50,), jnp.float32)
    assert hbm.tree_device_bytes([a, b]) == 600
    # the same buffer referenced twice counts once
    assert hbm.tree_device_bytes([a, a, {"x": a}]) == 400


def test_pick_fleet_size():
    assert hbm.pick_fleet_size(0, 8, budget=10**9) == 8
    # 100 MB/system * factor 4 = 400 MB working set -> 2 fit in 1 GB
    assert hbm.pick_fleet_size(100_000_000, 8, budget=10**9) == 2
    assert hbm.pick_fleet_size(10**12, 8, budget=10**9) == 1  # never 0


def test_system_device_bytes_bounded():
    """Persistent per-system device bytes must stay proportional to the
    analytic window-stack model. The dominant terms at (w, h, F, L):
      dI0_stack        F*h*w*3*4
      _flat_stack      F*T*3*4          (T = flattened pyramid length)
      pyr_slots        F*T*3*4          (per-level tuples, same pixels)
      flat_slots       F*T*3*4
    plus pools/caches. Bound = 1.5x the stack model + 64 MB pool slack —
    a new persistent duplicate of the window imagery blows through it."""
    w, h, levels = 320, 96, 4
    seq = make_sequence(n_frames=10, w=w, h=h, step=0.8, lidar_stride=2)
    s = Settings(desired_immature_density=600, desired_point_density=800,
                 n_active_cap=2048, n_immature_cap=2048)
    fs = _run(seq, 10, s)
    assert not fs.is_lost

    got = hbm.system_device_bytes(fs)
    T = sum((w >> l) * (h >> l) for l in range(levels))
    stacks = fs.F * (h * w * 3 * 4 + 3 * T * 3 * 4)
    bound = int(1.5 * stacks) + 64_000_000
    assert 0 < got < bound, (got, bound)
    # live accounting sees at least this system's buffers
    assert hbm.live_device_bytes() >= got


@pytest.mark.slow
def test_fleet_smoke_kitti_shape():
    """MultiSystem at bench shape (1200x360) for >= 2 KF rounds — the test
    that would have caught round 3's fleet OOM-shaped temporaries blowup
    (VERDICT r3 item 6). CPU-only; asserts completion + bytes accounting."""
    n, B = 8, 2
    seqs = [make_sequence(n_frames=n, w=1200, h=360, fx=718.856, step=1.0,
                          lidar_stride=2, half_width=16.0,
                          yaw_rate=yr, seed=sd)
            for yr, sd in ((0.004, 7), (-0.009, 13))]
    ms = MultiSystem([FullSystem(seq.calib, seq.sensor, Settings())
                      for seq in seqs[:B]])
    for i in range(n):
        ms.add_frames([seq.get(i) for seq in seqs[:B]])
    for fs, seq in zip(ms.systems, seqs):
        assert not fs.is_lost
        assert len(fs.kf_shells) >= 2
        err = np.linalg.norm(fs.get_trajectory()[-1][:3, 3]
                             - seq.poses_wc[n - 1][:3, 3])
        assert err < 0.5
        # bench-scale persistent footprint: the v5e budget must fit
        # B=4 systems plus temporaries headroom (hbm.pick_fleet_size)
        assert hbm.system_device_bytes(fs) < 1_200_000_000
