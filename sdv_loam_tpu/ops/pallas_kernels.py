"""Pallas TPU kernels for stencil-heavy hot ops.

The gather-dominated stages (warping, alignment) run through XLA's native
gather lowering; the stencil-dominated stages benefit from Pallas because an
iterated stencil can stay resident in VMEM instead of round-tripping HBM per
sweep:

  * chamfer distance transform (CoarseDistanceMap::growDistBFS equivalent,
    CoarseTracker.cpp:1185-1284): 32 min-plus sweeps over the half-res grid
    in one kernel invocation;
  * depth-map dilation sweep (makeCoarseDepthL0:329-378 hole filling).

Each kernel has a jnp reference implementation in its home module
(ops/distmap.py, ops/photometric.py); tests assert bit-level agreement. The
kernels activate on TPU backends and fall back to the jnp path elsewhere
(Pallas CPU lowering is interpret-only).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-only import guard
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _pad_to_tile(x, th, tw, value):
    h, w = x.shape
    hp = -(-h // th) * th
    wp = -(-w // tw) * tw
    return jnp.pad(x, ((0, hp - h), (0, wp - w)), constant_values=value)


def _distmap_kernel(seed_ref, out_ref, iters: int):
    """Iterated 8-neighborhood min-plus relaxation, fully in VMEM."""
    d = seed_ref[:]
    h, w = d.shape
    big = jnp.float32(1000.0)

    def sweep(_, d):
        # shift-and-min over the 8-neighborhood; edges padded with BIG.
        m = d
        # left/right shifts along the lane (W) axis
        l = jnp.concatenate([d[:, 1:], jnp.full((h, 1), big)], axis=1)
        r = jnp.concatenate([jnp.full((h, 1), big), d[:, :-1]], axis=1)
        u = jnp.concatenate([d[1:, :], jnp.full((1, w), big)], axis=0)
        dn = jnp.concatenate([jnp.full((1, w), big), d[:-1, :]], axis=0)
        ul = jnp.concatenate([l[1:, :], jnp.full((1, w), big)], axis=0)
        ur = jnp.concatenate([r[1:, :], jnp.full((1, w), big)], axis=0)
        dl = jnp.concatenate([jnp.full((1, w), big), l[:-1, :]], axis=0)
        dr = jnp.concatenate([jnp.full((1, w), big), r[:-1, :]], axis=0)
        for s in (l, r, u, dn, ul, ur, dl, dr):
            m = jnp.minimum(m, s + 1.0)
        return jnp.minimum(d, m)

    out_ref[:] = jax.lax.fori_loop(0, iters, sweep, d)


@partial(jax.jit, static_argnames=("iters",))
def distance_transform_pallas(seed: jnp.ndarray, iters: int = 32):
    """Chamfer distance transform of a (H, W) seed map (0 at seeds, 1000
    elsewhere) — Pallas on TPU, jnp fallback otherwise."""
    if not (_HAS_PLTPU and jax.default_backend() == "tpu"):
        from sdv_loam_tpu.ops.distmap import _relax_jnp
        return _relax_jnp(seed, iters)
    h, w = seed.shape
    sp = _pad_to_tile(seed.astype(jnp.float32), 8, 128, 1000.0)
    out = pl.pallas_call(
        partial(_distmap_kernel, iters=iters),
        out_shape=jax.ShapeDtypeStruct(sp.shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(sp)
    return out[:h, :w]


def _dilate_kernel(idepth_ref, weight_ref, out_i_ref, out_w_ref,
                   diagonal: bool):
    """One hole-filling pass of the tracking depth map (VMEM stencil)."""
    di = idepth_ref[:]
    wt = weight_ref[:]
    h, w = di.shape
    zero = jnp.float32(0.0)

    def shifts(x, fill):
        l = jnp.concatenate([x[:, 1:], jnp.full((h, 1), fill)], axis=1)
        r = jnp.concatenate([jnp.full((h, 1), fill), x[:, :-1]], axis=1)
        u = jnp.concatenate([x[1:, :], jnp.full((1, w), fill)], axis=0)
        d = jnp.concatenate([jnp.full((1, w), fill), x[:-1, :]], axis=0)
        if diagonal:
            ul = jnp.concatenate([l[1:, :], jnp.full((1, w), fill)], axis=0)
            ur = jnp.concatenate([r[1:, :], jnp.full((1, w), fill)], axis=0)
            dl = jnp.concatenate([jnp.full((1, w), fill), l[:-1, :]], axis=0)
            dr = jnp.concatenate([jnp.full((1, w), fill), r[:-1, :]], axis=0)
            return (ul, dr, ur, dl)
        return (r, l, d, u)

    s_i = shifts(di, zero)
    s_w = shifts(wt, zero)
    ssum = jnp.zeros_like(di)
    nsum = jnp.zeros_like(di)
    cnt = jnp.zeros_like(di)
    for si, sw in zip(s_i, s_w):
        filled = sw > 0
        ssum = ssum + jnp.where(filled, si, 0.0)
        nsum = nsum + jnp.where(filled, sw, 0.0)
        cnt = cnt + filled.astype(jnp.float32)
    empty = wt <= 0
    fill_ok = empty & (cnt > 0)
    out_i_ref[:] = jnp.where(fill_ok, ssum / jnp.maximum(cnt, 1.0), di)
    out_w_ref[:] = jnp.where(fill_ok, nsum / jnp.maximum(cnt, 1.0), wt)


@partial(jax.jit, static_argnames=("diagonal",))
def dilate_depth_pallas(idepth: jnp.ndarray, weight: jnp.ndarray,
                        diagonal: bool):
    """Pallas hole-filling pass; falls back to the jnp version off-TPU."""
    if not (_HAS_PLTPU and jax.default_backend() == "tpu"):
        from sdv_loam_tpu.ops.photometric import _dilate_once
        return _dilate_once(idepth, weight, diagonal)
    h, w = idepth.shape
    ip = _pad_to_tile(idepth.astype(jnp.float32), 8, 128, 0.0)
    wp = _pad_to_tile(weight.astype(jnp.float32), 8, 128, 0.0)
    oi, ow = pl.pallas_call(
        partial(_dilate_kernel, diagonal=diagonal),
        out_shape=(jax.ShapeDtypeStruct(ip.shape, jnp.float32),
                   jax.ShapeDtypeStruct(ip.shape, jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
    )(ip, wp)
    return oi[:h, :w], ow[:h, :w]
