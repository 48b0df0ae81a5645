"""Half-resolution distance map for activation spreading + Shi-Tomasi score.

Reference:
  * CoarseDistanceMap::makeDistanceMap / growDistBFS
    (CoarseTracker.cpp:1139-1284): project active points to the level-1
    grid, BFS-grow integer distances alternating 4-/8-neighborhoods;
  * FullSystem::shiTomasiScore (FullSystem.cpp:1540-1583): Harris-style
    min-eigenvalue score over an 8x8 box.

TPU-native: the sequential BFS becomes an iterated min-plus relaxation
(chamfer distance transform) — each sweep is 8 shifted minima; ~32 sweeps
cover the distances the activation test cares about (threshold <= 4 * type,
activatePointsMT uses currentMinActDist in [0, 4]).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _relax_jnp(seed: jnp.ndarray, iters: int):
    """Iterated 8-neighborhood min-plus relaxation (jnp reference path)."""
    h1, w1 = seed.shape

    def body(_, d):
        big = 1000.0
        p = jnp.pad(d, 1, constant_values=big)
        m = d
        # 4-neighborhood +1, diagonals +1 (the reference alternates 4/8
        # neighborhoods per BFS ring — both yield +1 per step)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                m = jnp.minimum(m, p[1 + dy:1 + dy + h1, 1 + dx:1 + dx + w1] + 1.0)
        return jnp.minimum(d, m)

    return jax.lax.fori_loop(0, iters, body, seed)


@partial(jax.jit, static_argnames=("w1", "h1", "iters"))
def distance_map(u1, v1, valid, w1: int, h1: int, iters: int = 32):
    """Distance transform seeded at projected active points.

    u1, v1: (N,) level-1 integer pixel coords; valid: (N,).
    Returns (h1, w1) float distances (chamfer-1 metric, like the BFS).
    Uses the VMEM-resident Pallas stencil kernel on TPU backends."""
    idx = jnp.where(valid & (u1 > 0) & (v1 > 0) & (u1 < w1) & (v1 < h1),
                    v1 * w1 + u1, w1 * h1)
    seed = jnp.full((w1 * h1 + 1,), 1000.0, jnp.float32).at[idx].min(
        jnp.where(valid, 0.0, 1000.0))
    d = seed[:w1 * h1].reshape(h1, w1)
    if jax.default_backend() == "tpu":
        from sdv_loam_tpu.ops.pallas_kernels import distance_transform_pallas
        return distance_transform_pallas(d, iters=iters)
    return _relax_jnp(d, iters)


@jax.jit
def shi_tomasi(dI0, u, v):
    """Batched shiTomasiScore at integer pixels (FullSystem.cpp:1540-1583)."""
    h, w = dI0.shape[:2]
    img = dI0[..., 0]
    hb = 4
    ui = u.astype(jnp.int32)
    vi = v.astype(jnp.int32)
    ok = (ui - hb >= 1) & (ui + hb < w - 1) & (vi - hb >= 1) & (vi + hb < h - 1)
    uc = jnp.clip(ui, hb + 1, w - hb - 2)
    vc = jnp.clip(vi, hb + 1, h - hb - 2)

    ys, xs = jnp.meshgrid(jnp.arange(8) - hb, jnp.arange(8) - hb,
                          indexing="ij")
    oy = ys.reshape(-1)
    ox = xs.reshape(-1)
    flat = img.reshape(-1)

    def take(du, dv):
        iy = vc[:, None] + oy[None, :] + dv
        ix = uc[:, None] + ox[None, :] + du
        return jnp.take(flat, iy * w + ix, axis=0)

    dx = take(1, 0) - take(-1, 0)
    dy = take(0, 1) - take(0, -1)
    box_area = 64.0
    dXX = jnp.sum(dx * dx, -1) / (2.0 * box_area)
    dYY = jnp.sum(dy * dy, -1) / (2.0 * box_area)
    dXY = jnp.sum(dx * dy, -1) / (2.0 * box_area)
    tr = dXX + dYY
    disc = jnp.sqrt(jnp.maximum(tr * tr - 4.0 * (dXX * dYY - dXY * dXY), 0.0))
    l1 = 0.5 * (tr - disc)
    l2 = 0.5 * (tr + disc)
    k = 0.04
    score = l1 * l2 - k * (l1 + l2) ** 2
    return jnp.where(ok, score, 0.0)
