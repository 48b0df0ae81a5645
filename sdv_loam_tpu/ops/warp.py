"""Bilinear sampling / gather primitives.

Replaces the reference's interpolation family (globalFuncs.h:15-163:
getInterpolatedElement31 / 33 / 33BiLin / 11BiCub ...) with batched gathers.
All samplers take arrays of coordinates and return a validity mask instead of
relying on callers to stay in bounds; out-of-bounds samples return 0 with
mask False, which keeps downstream masked reductions well-defined under jit.

On TPU the 4-corner gather lowers to XLA dynamic-gather over a flattened
(H*W, C) buffer. For the hot photometric-tracking loop a fused Pallas variant
lives in ops/pallas/; this module is the reference implementation and the
default path.
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """Sample `img` at float coords (x, y), pixel-centered, C channels.

    Args:
      img: (H, W) or (H, W, C) array.
      x, y: (...,) float coordinates (x along W, y along H).

    Returns:
      values: (..., C) (or (...,) for 2-D input), 0 outside.
      valid:  (...,) bool — True where the full 2x2 support is inside.
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, c = img.shape
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    ax = (x - x0f).astype(img.dtype)
    ay = (y - y0f).astype(img.dtype)
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    valid = (x0 >= 0) & (x0 <= w - 2) & (y0 >= 0) & (y0 <= h - 2)
    x0c = jnp.clip(x0, 0, w - 2)
    y0c = jnp.clip(y0, 0, h - 2)
    flat = img.reshape(h * w, c)
    base = y0c * w + x0c
    # ONE fused 4-corner gather: separate takes per corner cost ~2-4x more
    # per LM/align iteration on TPU (gather op launch dominates at these
    # sizes; measured 0.8 -> 0.22 ms/iter at 16k points)
    idx4 = jnp.stack([base, base + 1, base + w, base + w + 1], axis=-1)
    g = jnp.take(flat, idx4, axis=0)                  # (..., 4, C)
    wx1 = ax[..., None]
    wy1 = ay[..., None]
    w4 = jnp.stack([(1.0 - wx1) * (1.0 - wy1), wx1 * (1.0 - wy1),
                    (1.0 - wx1) * wy1, wx1 * wy1], axis=-2)   # (..., 4, 1)
    out = (g * w4).sum(axis=-2)
    out = jnp.where(valid[..., None], out, 0.0)
    if squeeze:
        out = out[..., 0]
    return out, valid


def pack_bilinear(img: jnp.ndarray) -> jnp.ndarray:
    """Pack each pixel's 2x2 bilinear support into one row.

    (H, W) -> (H*W, 4); (H, W, C) -> (H*W, 4*C) with corner-major layout
    [c00, c10, c01, c11] x C. TPU gathers cost per-INDEX with row width
    nearly free (CLAUDE.md economics), so `bilinear_sample_packed` needs
    ONE gather index per sample instead of the fused 4-index gather:
    measured 4.0x (1 channel) / 1.7x (3 channels) faster at tracking and
    align shapes on the v5e. The pack itself is a few cheap VPU passes —
    build it inside the fused program, right outside the hot loop.
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, c = img.shape
    p = jnp.pad(img, ((0, 1), (0, 1), (0, 0)), mode="edge")
    q = jnp.stack([p[:h, :w], p[:h, 1:], p[1:, :w], p[1:, 1:]], axis=2)
    return q.reshape(h * w, 4 * c)


def bilinear_sample_packed(packed: jnp.ndarray, h: int, w: int,
                           x: jnp.ndarray, y: jnp.ndarray):
    """`bilinear_sample` semantics from a pack_bilinear buffer.

    packed: (H*W, 4*C). Returns (values (..., C) — squeezed to (...,) for
    C == 1 — and valid (...,) with 0 outside, like bilinear_sample)."""
    c = packed.shape[-1] // 4
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    ax = (x - x0f).astype(packed.dtype)
    ay = (y - y0f).astype(packed.dtype)
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    valid = (x0 >= 0) & (x0 <= w - 2) & (y0 >= 0) & (y0 <= h - 2)
    idx = jnp.clip(y0, 0, h - 2) * w + jnp.clip(x0, 0, w - 2)
    g = jnp.take(packed, idx, axis=0).reshape(x.shape + (4, c))
    w4 = jnp.stack([(1.0 - ax) * (1.0 - ay), ax * (1.0 - ay),
                    (1.0 - ax) * ay, ax * ay], axis=-1)    # (..., 4)
    out = (g * w4[..., None]).sum(axis=-2)                 # (..., C)
    out = jnp.where(valid[..., None], out, 0.0)
    if c == 1:
        out = out[..., 0]
    return out, valid


def nearest_sample(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """Nearest-neighbor sample with validity mask."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, c = img.shape
    xi = jnp.round(x).astype(jnp.int32)
    yi = jnp.round(y).astype(jnp.int32)
    valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    xi = jnp.clip(xi, 0, w - 1)
    yi = jnp.clip(yi, 0, h - 1)
    out = jnp.take(img.reshape(h * w, c), yi * w + xi, axis=0)
    out = jnp.where(valid[..., None], out, 0.0)
    if squeeze:
        out = out[..., 0]
    return out, valid


def gather_patches(img: jnp.ndarray, cx: jnp.ndarray, cy: jnp.ndarray,
                   offsets: jnp.ndarray):
    """Bilinear-sample a fixed offset pattern around each center.

    Args:
      img: (H, W) or (H, W, C).
      cx, cy: (N,) centers.
      offsets: (P, 2) [dx, dy] offsets (float or int).

    Returns (N, P[, C]) samples and (N, P) validity.
    """
    ox = offsets[:, 0].astype(jnp.float32)
    oy = offsets[:, 1].astype(jnp.float32)
    xs = cx[:, None] + ox[None, :]
    ys = cy[:, None] + oy[None, :]
    return bilinear_sample(img, xs, ys)
