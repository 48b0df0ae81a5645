"""Batched SVO-style direct feature alignment (the semi-direct matcher core).

Reference: src/FullSystem/Reprojector.cpp —
  * getWarpMatrixAffine (:14-35): 2x2 affine from projecting the point and
    two 5-px-offset rays into the current frame;
  * getBestSearchLevel (:37-49): halve until |det A| <= 3;
  * warpAffine (:51-82): 10x10 (patch+border) reference patch resampled from
    the host level-0 image through A_ref_cur = A^-1, scaled 2^level;
  * align2D (:448-551): inverse-compositional GN over (du, dv, mean_diff),
    Hessian from reference-patch gradients, <= 10 iterations, convergence at
    |update| < 0.03, brightness transfer affLL applied to the ref patch;
  * align1D (:344-446): same but the update moves only along a direction
    (edgelets), unknowns (step, mean_diff).

TPU-native redesign: everything is batched over M candidates at once.
Per-candidate search levels are handled with a *flattened pyramid*: all
levels live in one (sum H_l*W_l, 3) buffer and each candidate gathers through
its level's offset/width — one fused pass, no per-level loop. Iterations are
a fixed-trip fori_loop with active masks (out-of-bounds or converged lanes
stop updating), matching the reference's break conditions.

Delta vs reference: the reference quantizes the warped ref patch to uint8
(warpAffine:80); we keep float32 (strictly more accurate).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

HALF_PATCH = 4
PATCH = 8
PATCH_AREA = PATCH * PATCH
BORDER_PATCH = PATCH + 2
MIN_UPDATE_SQ = 0.03 * 0.03


@jax.jit
def _concat_levels(dI_pyr):
    return jnp.concatenate([p.reshape(-1, p.shape[-1]) for p in dI_pyr],
                           axis=0)


def flatten_pyramid(dI_pyr):
    """Concatenate pyramid levels into one flat buffer for traced-level gathers.

    The concat runs as ONE jitted program (shapes are static per calib, so
    it compiles once); eager per-level reshapes+concat were ~6 ms host and
    an extra dispatch per frame.

    Returns (flat (sum_l H_l*W_l, C), offsets (L,), widths (L,), heights (L,)).
    """
    offsets = np.cumsum([0] + [p.shape[0] * p.shape[1] for p in dI_pyr[:-1]])
    widths = np.array([p.shape[1] for p in dI_pyr], np.int32)
    heights = np.array([p.shape[0] for p in dI_pyr], np.int32)
    # numpy-typed on purpose: consumers are jit programs that transfer at
    # dispatch; eager jnp wrapping costs one device program per array
    return (_concat_levels(tuple(dI_pyr)), np.asarray(offsets, np.int32),
            np.asarray(widths), np.asarray(heights))


def _flat_bilinear(flat, base, w, x, y):
    """Bilinear sample channel-0 from a flat level: base+y*w+x addressing.

    Caller guarantees in-bounds (x in [0, w-2], y in [0, h-2]).
    flat: (T, C); base, w: (M,) or (M,1); x, y: (M, P).
    Returns (M, P) intensity and (M, P, C) full-channel samples.
    """
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    ax = (x - x0).astype(flat.dtype)
    ay = (y - y0).astype(flat.dtype)
    xi = x0.astype(jnp.int32)
    yi = y0.astype(jnp.int32)
    idx = base + yi * w + xi
    # ONE fused 4-corner gather (see warp.bilinear_sample): 2-4x faster per
    # align/LM iteration than four separate takes at these sizes
    idx4 = jnp.stack([idx, idx + 1, idx + w, idx + w + 1], axis=-1)
    g = jnp.take(flat, idx4, axis=0)                  # (..., 4, C)
    wx1 = ax[..., None]
    wy1 = ay[..., None]
    w4 = jnp.stack([(1 - wx1) * (1 - wy1), wx1 * (1 - wy1),
                    (1 - wx1) * wy1, wx1 * wy1], axis=-2)
    out = (g * w4).sum(axis=-2)
    return out[..., 0], out


def quad_from_flat(flat, w: int, h: int, levels: int):
    """Pack each flat-pyramid pixel's 2x2 bilinear support into ONE row.

    TPU gather cost is per-INDEX; row width is nearly free (CLAUDE.md
    measured economics). Packing the 4 bilinear corners of channel-0 into
    a (T, 4) row — [I(x,y), I(x+1,y), I(x,y+1), I(x+1,y+1)], edge rows
    duplicated — lets `_quad_bilinear` sample with a single gather index
    per pixel instead of the fused 4-index gather: measured 4.0x faster at
    align shapes on the v5e (tools note in ROADMAP round-4). Built INSIDE
    the fused programs from the flat input (a few cheap VPU passes), so no
    persistent HBM or staging cost.

    flat: (T, C) with T = sum_l (w>>l)*(h>>l) (the flatten_pyramid layout).
    """
    outs = []
    off = 0
    for lvl in range(levels):
        wl, hl = w >> lvl, h >> lvl
        img = flat[off:off + wl * hl, 0].reshape(hl, wl)
        p = jnp.pad(img, ((0, 1), (0, 1)), mode="edge")
        q = jnp.stack([p[:hl, :wl], p[:hl, 1:], p[1:, :wl], p[1:, 1:]],
                      axis=-1)
        outs.append(q.reshape(wl * hl, 4))
        off += wl * hl
    return jnp.concatenate(outs, axis=0)


def quad_from_image(img):
    """(H, W) image -> (H*W, 4) packed bilinear-support rows (see
    quad_from_flat)."""
    h, w = img.shape
    p = jnp.pad(img, ((0, 1), (0, 1)), mode="edge")
    q = jnp.stack([p[:h, :w], p[:h, 1:], p[1:, :w], p[1:, 1:]], axis=-1)
    return q.reshape(h * w, 4)


def _quad_bilinear(quad, base, w, x, y):
    """Bilinear sample from a quad-packed buffer: ONE gather index per
    pixel. Caller guarantees in-bounds (x in [0, w-1], y in [0, h-1]).

    quad: (T, 4) or (T, 4*C); base, w: (M,) or (M,1); x, y: (M, P).
    Returns (M, P) for the 4-wide intensity pack, (M, P, C) otherwise."""
    c = quad.shape[-1] // 4
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    ax = (x - x0).astype(quad.dtype)
    ay = (y - y0).astype(quad.dtype)
    idx = base + y0.astype(jnp.int32) * w + x0.astype(jnp.int32)
    g = jnp.take(quad, idx, axis=0)
    w4 = jnp.stack([(1 - ax) * (1 - ay), ax * (1 - ay),
                    (1 - ax) * ay, ax * ay], axis=-1)
    if c == 1:
        return (g * w4).sum(axis=-1)
    g = g.reshape(x.shape + (4, c))
    return (g * w4[..., None]).sum(axis=-2)


def warp_affine_patches(dI_ref0_stack, host_idx, px_ref, A_cur_ref,
                        search_level):
    """Warp 10x10 border patches from each candidate's host level-0 image
    (warpAffine).

    Args:
      dI_ref0_stack: (F, H, W, 3) stacked level-0 pyramids of window frames.
      host_idx: (M,) int32 host-frame slot per candidate.
      px_ref: (M, 2) reference pixel in the host frame.
      A_cur_ref: (M, 2, 2).
      search_level: (M,) int32.

    Returns (M, 10, 10) float patches (0 outside image).
    """
    f, h, w = dI_ref0_stack.shape[:3]
    Ainv = jnp.linalg.inv(A_cur_ref)
    Ainv = jnp.where(jnp.isfinite(Ainv), Ainv, 0.0)
    ys, xs = jnp.meshgrid(jnp.arange(BORDER_PATCH) - (HALF_PATCH + 1),
                          jnp.arange(BORDER_PATCH) - (HALF_PATCH + 1),
                          indexing="ij")
    offs = jnp.stack([xs, ys], axis=-1).reshape(-1, 2).astype(jnp.float32)
    scale = (1 << search_level).astype(jnp.float32)
    px_patch = offs[None, :, :] * scale[:, None, None]
    src = jnp.einsum("mij,mpj->mpi", Ainv, px_patch) + px_ref[:, None, :]
    x = src[..., 0]
    y = src[..., 1]
    ok = (x >= 0) & (y >= 0) & (x < w - 1) & (y < h - 1)
    xc = jnp.clip(x, 0.0, w - 1.001)
    yc = jnp.clip(y, 0.0, h - 1.001)
    # quad-packed intensity gather: one index per sampled pixel (the pack
    # is lane-invariant VPU work XLA hoists out of any vmap; see
    # quad_from_flat). 100 px/lane x lane count per matcher call.
    quad = jax.vmap(lambda im: quad_from_image(im[..., 0]))(
        dI_ref0_stack).reshape(-1, 4)
    base = (host_idx * (h * w))[:, None]
    wv = jnp.full((x.shape[0], 1), w, jnp.int32)
    inten = _quad_bilinear(quad, base, wv, xc, yc)
    inten = jnp.where(ok, inten, 0.0)
    return inten.reshape(-1, BORDER_PATCH, BORDER_PATCH)


def _patch_grads(border_patch):
    """Reference-patch gradients from the 10x10 border patch (align2D:466-482).

    Returns (inner (M,64), dx (M,64), dy (M,64))."""
    inner = border_patch[:, 1:-1, 1:-1]
    dx = 0.5 * (border_patch[:, 1:-1, 2:] - border_patch[:, 1:-1, :-2])
    dy = 0.5 * (border_patch[:, 2:, 1:-1] - border_patch[:, :-2, 1:-1])
    m = border_patch.shape[0]
    return (inner.reshape(m, -1), dx.reshape(m, -1), dy.reshape(m, -1))


@jax.jit
def align2d_batch(flat_pyr, offsets, widths, heights, search_level,
                  border_patch, px_init_scaled, aff_a, aff_b,
                  valid, n_iter: int = 10):
    """Batched inverse-compositional 2-D alignment (align2D).

    Args:
      flat_pyr/offsets/widths/heights: flattened target pyramid.
      search_level: (M,) per-candidate pyramid level.
      border_patch: (M, 10, 10) warped reference patches.
      px_init_scaled: (M, 2) initial pixel on the search level.
      aff_a, aff_b: (M,) brightness transfer ref->cur.
      valid: (M,) candidate mask.

    Returns (px (M,2) on the search level, converged (M,)).
    """
    border_patch = border_patch.astype(jnp.float32)
    px_init_scaled = px_init_scaled.astype(jnp.float32)
    aff_a = aff_a.astype(jnp.float32)
    aff_b = aff_b.astype(jnp.float32)
    ref, dx, dy = _patch_grads(border_patch)
    J = jnp.stack([dx, dy, jnp.ones_like(dx)], axis=-1)       # (M, 64, 3)
    H = jnp.einsum("mpi,mpj->mij", J, J)
    Hinv = jnp.linalg.inv(H + jnp.eye(3, dtype=H.dtype) * 1e-9)
    Hinv = jnp.where(jnp.isfinite(Hinv), Hinv, 0.0)

    base = offsets[search_level][:, None]
    wv = widths[search_level][:, None]
    hv = heights[search_level]
    ys, xs = jnp.meshgrid(jnp.arange(PATCH) - HALF_PATCH,
                          jnp.arange(PATCH) - HALF_PATCH, indexing="ij")
    po_x = xs.reshape(-1).astype(jnp.float32)
    po_y = ys.reshape(-1).astype(jnp.float32)

    def body(_, carry):
        u, v, mean_diff, conv, alive = carry
        ur = jnp.floor(u)
        vr = jnp.floor(v)
        inb = ((ur >= HALF_PATCH) & (vr >= HALF_PATCH)
               & (ur < wv[:, 0] - HALF_PATCH) & (vr < hv - HALF_PATCH))
        act = alive & inb & (~conv) & valid
        # gather current patch around integer corner + subpixel weights:
        # reference gathers at (u_r + offs, v_r + offs) with fixed subpix
        # weights — identical to bilinear at (u + offs, v + offs).
        x = jnp.clip(u[:, None], HALF_PATCH, wv - HALF_PATCH) + po_x[None, :] - 0.0
        y = jnp.clip(v[:, None], HALF_PATCH, hv[:, None] - HALF_PATCH) + po_y[None, :]
        cur, _ = _flat_bilinear(flat_pyr, base, wv, x, y)
        res = cur - (aff_a[:, None] * ref + aff_b[:, None]) + mean_diff[:, None]
        Jres = -jnp.einsum("mp,mpi->mi", res, J)
        upd = jnp.einsum("mij,mj->mi", Hinv, Jres)
        upd = jnp.where(act[:, None], upd, 0.0)
        u = u + upd[:, 0]
        v = v + upd[:, 1]
        mean_diff = mean_diff + upd[:, 2]
        conv = conv | (act & (upd[:, 0] ** 2 + upd[:, 1] ** 2 < MIN_UPDATE_SQ))
        alive = alive & inb
        return u, v, mean_diff, conv, alive

    u0 = px_init_scaled[:, 0]
    v0 = px_init_scaled[:, 1]
    conv0 = jnp.zeros_like(valid)
    carry = (u0, v0, jnp.zeros_like(u0), conv0, valid)
    u, v, _, conv, _ = jax.lax.fori_loop(0, n_iter, body, carry)
    return jnp.stack([u, v], axis=-1), conv & valid


@jax.jit
def align1d_batch(flat_pyr, offsets, widths, heights, search_level,
                  border_patch, px_init_scaled, direction, aff_a, aff_b,
                  valid, n_iter: int = 10):
    """Batched 1-D (edgelet) alignment along `direction` (align1D)."""
    border_patch = border_patch.astype(jnp.float32)
    px_init_scaled = px_init_scaled.astype(jnp.float32)
    aff_a = aff_a.astype(jnp.float32)
    aff_b = aff_b.astype(jnp.float32)
    direction = direction.astype(jnp.float32)
    ref, dx, dy = _patch_grads(border_patch)
    dgrad = (direction[:, 0:1] * dx + direction[:, 1:2] * dy)  # (M, 64)
    J = jnp.stack([dgrad, jnp.ones_like(dgrad)], axis=-1)
    H = jnp.einsum("mpi,mpj->mij", J, J)
    Hinv = jnp.linalg.inv(H + jnp.eye(2, dtype=H.dtype) * 1e-9)
    Hinv = jnp.where(jnp.isfinite(Hinv), Hinv, 0.0)

    base = offsets[search_level][:, None]
    wv = widths[search_level][:, None]
    hv = heights[search_level]
    ys, xs = jnp.meshgrid(jnp.arange(PATCH) - HALF_PATCH,
                          jnp.arange(PATCH) - HALF_PATCH, indexing="ij")
    po_x = xs.reshape(-1).astype(jnp.float32)
    po_y = ys.reshape(-1).astype(jnp.float32)

    def body(_, carry):
        u, v, mean_diff, conv, alive = carry
        ur = jnp.floor(u)
        vr = jnp.floor(v)
        inb = ((ur >= HALF_PATCH) & (vr >= HALF_PATCH)
               & (ur < wv[:, 0] - HALF_PATCH) & (vr < hv - HALF_PATCH))
        act = alive & inb & (~conv) & valid
        x = jnp.clip(u[:, None], HALF_PATCH, wv - HALF_PATCH) + po_x[None, :]
        y = jnp.clip(v[:, None], HALF_PATCH, hv[:, None] - HALF_PATCH) + po_y[None, :]
        cur, _ = _flat_bilinear(flat_pyr, base, wv, x, y)
        res = cur - (aff_a[:, None] * ref + aff_b[:, None]) + mean_diff[:, None]
        Jres = -jnp.einsum("mp,mpi->mi", res, J)
        upd = jnp.einsum("mij,mj->mi", Hinv, Jres)
        upd = jnp.where(act[:, None], upd, 0.0)
        u = u + upd[:, 0] * direction[:, 0]
        v = v + upd[:, 0] * direction[:, 1]
        mean_diff = mean_diff + upd[:, 1]
        conv = conv | (act & (upd[:, 0] ** 2 + upd[:, 1] ** 2 < MIN_UPDATE_SQ))
        alive = alive & inb
        return u, v, mean_diff, conv, alive

    u0 = px_init_scaled[:, 0]
    v0 = px_init_scaled[:, 1]
    carry = (u0, v0, jnp.zeros_like(u0), jnp.zeros_like(valid), valid)
    u, v, _, conv, _ = jax.lax.fori_loop(0, n_iter, body, carry)
    return jnp.stack([u, v], axis=-1), conv & valid


@jax.jit
def align_batch(quad_pyr, offsets, widths, heights, search_level,
                border_patch, px_init_scaled, direction, is_edge,
                aff_a, aff_b, valid, n_iter: int = 10):
    """Unified corner (align2D) + edgelet (align1D) alignment in ONE loop.

    `quad_pyr` is the QUAD-PACKED target pyramid (quad_from_flat): each GN
    iteration samples 64 px/lane with one gather index per pixel — 4x
    faster than the fused 4-corner gather at these shapes (v5e measured).

    Semantically identical to running align2d_batch on corner lanes and
    align1d_batch on edgelet lanes, but: (a) one gather per iteration for
    all lanes instead of two full passes (the reference's per-candidate
    branch, findMatchDirect:266-293), and (b) a while_loop that exits as
    soon as every lane converged (the reference breaks per candidate;
    typical convergence is 3-5 of the 10 max iterations).

    Edgelet lanes are folded into the 3-unknown corner system with
    J = [dgrad, 1, 0] and update (du, dv) = p0 * direction — the zero third
    column makes H rank-2, handled by the same diagonal regularizer.
    """
    border_patch = border_patch.astype(jnp.float32)
    px_init_scaled = px_init_scaled.astype(jnp.float32)
    aff_a = aff_a.astype(jnp.float32)
    aff_b = aff_b.astype(jnp.float32)
    direction = direction.astype(jnp.float32)
    ref, dx, dy = _patch_grads(border_patch)
    dgrad = direction[:, 0:1] * dx + direction[:, 1:2] * dy
    e = is_edge[:, None]
    J = jnp.stack([jnp.where(e, dgrad, dx),
                   jnp.where(e, jnp.ones_like(dx), dy),
                   jnp.where(e, jnp.zeros_like(dx), jnp.ones_like(dx))],
                  axis=-1)                                     # (M, 64, 3)
    H = jnp.einsum("mpi,mpj->mij", J, J)
    Hinv = jnp.linalg.inv(H + jnp.eye(3, dtype=H.dtype) * 1e-9)
    Hinv = jnp.where(jnp.isfinite(Hinv), Hinv, 0.0)

    base = offsets[search_level][:, None]
    wv = widths[search_level][:, None]
    hv = heights[search_level]
    ys, xs = jnp.meshgrid(jnp.arange(PATCH) - HALF_PATCH,
                          jnp.arange(PATCH) - HALF_PATCH, indexing="ij")
    po_x = xs.reshape(-1).astype(jnp.float32)
    po_y = ys.reshape(-1).astype(jnp.float32)

    def cond(carry):
        it, u, v, md, conv, alive = carry
        return (it < n_iter) & jnp.any(alive & valid & (~conv))

    def body(carry):
        it, u, v, mean_diff, conv, alive = carry
        ur = jnp.floor(u)
        vr = jnp.floor(v)
        inb = ((ur >= HALF_PATCH) & (vr >= HALF_PATCH)
               & (ur < wv[:, 0] - HALF_PATCH) & (vr < hv - HALF_PATCH))
        act = alive & inb & (~conv) & valid
        x = jnp.clip(u[:, None], HALF_PATCH, wv - HALF_PATCH) + po_x[None, :]
        y = jnp.clip(v[:, None], HALF_PATCH,
                     hv[:, None] - HALF_PATCH) + po_y[None, :]
        cur = _quad_bilinear(quad_pyr, base, wv, x, y)
        res = cur - (aff_a[:, None] * ref + aff_b[:, None]) \
            + mean_diff[:, None]
        Jres = -jnp.einsum("mp,mpi->mi", res, J)
        upd = jnp.einsum("mij,mj->mi", Hinv, Jres)
        upd = jnp.where(act[:, None], upd, 0.0)
        du = jnp.where(is_edge, upd[:, 0] * direction[:, 0], upd[:, 0])
        dv = jnp.where(is_edge, upd[:, 0] * direction[:, 1], upd[:, 1])
        dmd = jnp.where(is_edge, upd[:, 1], upd[:, 2])
        u = u + du
        v = v + dv
        mean_diff = mean_diff + dmd
        # convergence tests match the references exactly: align2D:540 uses
        # (du, dv); align1D:433 uses (step, mean_diff)
        step_sq = upd[:, 0] ** 2 + upd[:, 1] ** 2
        conv = conv | (act & (step_sq < MIN_UPDATE_SQ))
        alive = alive & inb
        return it + 1, u, v, mean_diff, conv, alive

    u0 = px_init_scaled[:, 0]
    v0 = px_init_scaled[:, 1]
    carry = (jnp.int32(0), u0, v0, jnp.zeros_like(u0),
             jnp.zeros_like(valid), valid)
    _, u, v, _, conv, alive = jax.lax.while_loop(cond, body, carry)
    # failure-mode split for matcher forensics: a candidate that is not
    # converged either WALKED OUT of the level bounds (alive False) or ran
    # out of iterations (alive True) — very different diseases upstream
    fail_oob = valid & ~conv & ~alive
    fail_iters = valid & ~conv & alive
    return jnp.stack([u, v], axis=-1), conv & valid, \
        jnp.stack([fail_oob.sum().astype(jnp.int32),
                   fail_iters.sum().astype(jnp.int32)])


def warp_matrix_affine(px_ref, z_ref, K, Ki, T_cur_ref):
    """Batched getWarpMatrixAffine. px_ref (M,2), z_ref (M,) depth in ref.

    Returns A_cur_ref (M, 2, 2)."""
    fx, fy, cx, cy = K[0], K[1], K[2], K[3]

    def to_unit(px):
        return jnp.stack([(px[..., 0] - cx) / fx, (px[..., 1] - cy) / fy,
                          jnp.ones_like(px[..., 0])], axis=-1)

    hp = jnp.float32(5.0)
    px_ref = px_ref.astype(jnp.float32)
    z_ref = z_ref.astype(jnp.float32)
    xyz = to_unit(px_ref) * z_ref[:, None]
    du = to_unit(px_ref + jnp.array([hp, 0.0], jnp.float32))
    dv = to_unit(px_ref + jnp.array([0.0, hp], jnp.float32))
    du = du * (xyz[:, 2:3] / du[:, 2:3])
    dv = dv * (xyz[:, 2:3] / dv[:, 2:3])
    R = T_cur_ref[:3, :3]
    t = T_cur_ref[:3, 3]

    def proj(p):
        q = p @ R.T + t
        return jnp.stack([fx * q[:, 0] / q[:, 2] + cx,
                          fy * q[:, 1] / q[:, 2] + cy], axis=-1)

    p0 = proj(xyz)
    pu = proj(du)
    pv = proj(dv)
    A = jnp.stack([(pu - p0) / hp, (pv - p0) / hp], axis=-1)  # cols
    return A


def best_search_level(A_cur_ref, max_level: int):
    """Batched getBestSearchLevel: halve while det > 3."""
    D = jnp.abs(jnp.linalg.det(A_cur_ref))
    lvl = jnp.zeros(D.shape, jnp.int32)
    for _ in range(max_level):
        step = (D > 3.0) & (lvl < max_level)
        lvl = jnp.where(step, lvl + 1, lvl)
        D = jnp.where(step, D * 0.25, D)
    return lvl
