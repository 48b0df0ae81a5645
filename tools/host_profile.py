"""cProfile the host-side Python of the production frame loop.

Runs a small KITTI-scale synthetic sequence on whatever backend is live
(CPU in tests, TPU under axon) and prints the top host-side costs. Device
execution shows up inside jax dispatch frames; everything else is the
host control cost CLAUDE.md pegs at ~150 ms/frame.

Usage: python tools/host_profile.py [n_frames]
"""
import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 28

from sdv_loam_tpu.config import Settings
from sdv_loam_tpu.data.synthetic import make_sequence
from sdv_loam_tpu.system.full_system import FullSystem

seq = make_sequence(n_frames=N, w=1200, h=360, fx=718.856, step=1.0,
                    lidar_stride=2, half_width=16.0, yaw_rate=0.004, seed=7)
frames = [seq.get(i) for i in range(N)]
fs = FullSystem(seq.calib, seq.sensor, Settings(pipelined_frames=True))

WARM = min(12, N - 8)
for i in range(WARM):
    fs.add_active_frame(*frames[i])

pr = cProfile.Profile()
t0 = time.perf_counter()
pr.enable()
for i in range(WARM, N):
    fs.add_active_frame(*frames[i])
fs.flush()
pr.disable()
dt = time.perf_counter() - t0
n = N - WARM
print(f"{n} frames in {dt:.2f}s = {dt / n * 1000:.0f} ms/frame", flush=True)

s = io.StringIO()
ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
ps.print_stats(45)
print(s.getvalue())
s = io.StringIO()
ps = pstats.Stats(pr, stream=s).sort_stats("tottime")
ps.print_stats(35)
print(s.getvalue())
