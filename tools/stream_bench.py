"""Streamed (chain-method) timings of the per-frame staging programs:
make_images and preprocess_scan, plus sub-part decomposition of the scan
pipeline (sorts vs segmentation sweeps).

Chain method per CLAUDE.md: time device content with dependent chains
(x = f(x)) so programs queue back-to-back; one block at the end. Blocking
round trips (30-100 ms over the axon tunnel) would otherwise fabricate
the numbers.

Usage: python tools/stream_bench.py   (TPU via axon)
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from sdv_loam_tpu.ops import lidar as L
from sdv_loam_tpu.ops.pyramid import make_images

W, H = 1200, 360
NCLOUD = 1 << 17  # bench cloud bucket
REPS = 30


def chain(label, step, x0, reps=REPS):
    """Time reps of x = step(x) streamed; returns ms/call."""
    x = step(x0)
    x = step(x)
    jax.block_until_ready(x)
    t0 = time.time()
    for _ in range(reps):
        x = step(x)
    jax.block_until_ready(x)
    dt = (time.time() - t0) / reps * 1000
    print(f"{label:52s} {dt:8.2f} ms", flush=True)
    return dt


rng = np.random.default_rng(0)
# plausible velodyne-ish cloud: points on walls/ground 2-60 m out
pts = rng.uniform(-40, 40, size=(NCLOUD, 3)).astype(np.float32)
pts[:, 2] = rng.uniform(-2.0, 4.0, size=NCLOUD).astype(np.float32)
cloud0 = jnp.asarray(pts)
mask0 = jnp.ones((NCLOUD,), bool)
R_cl = jnp.eye(3, dtype=jnp.float32)
t_cl = jnp.zeros((3,), jnp.float32)
fx = fy = jnp.float32(700.0)
cx = jnp.float32(W / 2)
cy = jnp.float32(H / 2)

img0 = jnp.asarray(rng.uniform(0, 255, size=(H, W)).astype(np.float32))

# ---- pyramid ----
@partial(jax.jit, static_argnames=("levels",))
def pyr_step(img, levels=6):
    # consume EVERY output so XLA cannot dead-code-eliminate levels
    dI, ag = make_images(img, levels)
    acc = jnp.float32(0)
    for d, a in zip(dI, ag):
        acc = acc + d.sum() + a.sum()
    return dI[0][..., 0] + 1e-12 * acc

chain("make_images (6 levels, 1200x360)", pyr_step, img0)


# ---- full scan pipeline ----
@jax.jit
def scan_step(cloud):
    out = L.preprocess_scan(cloud, mask0, R_cl, t_cl, fx, fy, cx, cy, W, H)
    return cloud + 1e-12 * out["ground_ratio"]

chain("preprocess_scan (full)", scan_step, cloud0)


# ---- sub-parts ----
@jax.jit
def ppc_step(cloud):
    rimg, xyz = L.project_point_cloud(cloud, mask0)
    return cloud + 1e-12 * rimg[0, 0] * 0 + 1e-12 * xyz[0, 0, 0]

chain("  project_point_cloud (131k sort)", ppc_step, cloud0)

rimg0, xyz0 = L.project_point_cloud(cloud0, mask0)
ground0 = L.ground_removal(rimg0, xyz0)
jax.block_until_ready((rimg0, ground0))


def seg_step_n(n):
    @jax.jit
    def f(rimg):
        seg, grd = L.segment_cloud(rimg, ground0, n_iters=n)
        return rimg + 1e-12 * seg[0, 0]
    return f

for n in (24, 8, 2):
    chain(f"  segment_cloud n_iters={n}", seg_step_n(n), rimg0)


@jax.jit
def gr_step(rimg):
    g = L.ground_removal(rimg, xyz0)
    return rimg + 1e-12 * g[0, 0]

chain("  ground_removal", gr_step, rimg0)

seg0, isg0 = L.segment_cloud(rimg0, ground0)
jax.block_until_ready(seg0)


@jax.jit
def p2c_step(xyz):
    out = L.project_to_camera(xyz, seg0, isg0, R_cl, t_cl, fx, fy, cx, cy,
                              W, H)
    return xyz + 1e-12 * out["ground_ratio"]

chain("  project_to_camera (115k sort+splat)", p2c_step, xyz0)
