"""Brute-force k-nearest-neighbors on device — the nanoflann equivalent.

The reference vendors nanoflann (src/util/nanoflann.h) solely for
CoarseInitializer::makeNN (CoarseInitializer.cpp:998-1075): 10-NN among the
selected points per pyramid level plus a parent link to the nearest point
one level up, used by the monocular initializer's depth-smoothness
regularizer.

A KD-tree is a poor fit for the TPU; for the point counts involved
(hundreds to a few thousand per level) an exact brute-force distance matrix
on the MXU is faster than tree traversal and trivially batched.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("k",))
def knn(points, valid, k: int = 10):
    """Exact k-NN among `points` ((N, D) with (N,) validity).

    Returns (idx (N, k), dist2 (N, k)) — nearest first, self excluded;
    invalid rows/columns get index N-1 markers with +inf distance.
    """
    n = points.shape[0]
    d2 = jnp.sum((points[:, None, :] - points[None, :, :]) ** 2, axis=-1)
    big = jnp.float32(jnp.inf)
    d2 = jnp.where(valid[None, :] & valid[:, None], d2, big)
    d2 = d2.at[jnp.arange(n), jnp.arange(n)].set(big)  # exclude self
    neg, idx = jax.lax.top_k(-d2, k)
    return idx, -neg


@jax.jit
def nearest_cross(points_a, valid_a, points_b, valid_b):
    """Nearest neighbor of each a-point among b-points (the initializer's
    parent link to the coarser level, CoarseInitializer.cpp:1044-1071).

    Returns (idx (Na,), dist2 (Na,))."""
    d2 = jnp.sum((points_a[:, None, :] - points_b[None, :, :]) ** 2, axis=-1)
    d2 = jnp.where(valid_b[None, :] & valid_a[:, None], d2, jnp.inf)
    idx = jnp.argmin(d2, axis=1)
    return idx, jnp.take_along_axis(d2, idx[:, None], axis=1)[:, 0]
