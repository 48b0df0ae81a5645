"""Eager-dispatch budget: the lockstep fleet driver must not regress into
per-op device dispatches.

Over the tunneled TPU every EAGER jnp op outside jit is its own device
program (~5 ms streamed, CLAUDE.md); round-3 profiling found ~190 of them
per fleet round (argument stacking, result slicing, scalar wrapping) and
removed ~90% by stacking inside the jitted batch wrappers and keeping host
staging numpy-typed. This test counts eager primitive binds during
steady-state lockstep rounds and fails if the budget regresses.
"""

import numpy as np

from sdv_loam_tpu.config import Settings
from sdv_loam_tpu.data.synthetic import make_sequence
from sdv_loam_tpu.system.full_system import FullSystem
from sdv_loam_tpu.system.multi import MultiSystem


def test_fleet_eager_dispatch_budget():
    from jax._src import core as jcore

    B, n = 2, 12
    s = lambda: Settings(desired_immature_density=600,  # noqa: E731
                         desired_point_density=800,
                         n_active_cap=2048, n_immature_cap=2048)
    seqs = [make_sequence(n_frames=n, w=320, h=96, step=0.8, yaw_rate=yr,
                          lidar_stride=2)
            for yr in (0.004, 0.012)]
    ms = MultiSystem([FullSystem(seq.calib, seq.sensor, s())
                      for seq in seqs])
    for i in range(6):
        ms.add_frames([seq.get(i) for seq in seqs])

    count = {"n": 0}
    orig = jcore.EvalTrace.process_primitive

    def counting(self, primitive, args, params):
        count["n"] += 1
        return orig(self, primitive, args, params)

    jcore.EvalTrace.process_primitive = counting
    try:
        for i in range(6, n):
            ms.add_frames([seq.get(i) for seq in seqs])
    finally:
        jcore.EvalTrace.process_primitive = orig

    per_round = count["n"] / (n - 6)
    # measured ~11/round at B=2 after the round-3 eager-op elimination
    # (_next_key random split + the per-KF slot-stack program leftovers);
    # 3x headroom so only a real regression (per-leaf stacking/slicing
    # creeping back) trips it
    assert per_round <= 35, (
        f"eager device dispatches regressed: {per_round:.1f}/round "
        f"(budget 35) — stack/slice inside the jitted batch wrappers, "
        f"keep host staging numpy-typed")
