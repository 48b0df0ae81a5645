"""Gradient-based pixel selection — the PixelSelector stage.

Reference: src/FullSystem/PixelSelector2.{h,cpp}.
  * makeHists (PixelSelector2.cpp:47-106): 32x32-block histograms of
    sqrt(absSquaredGrad), per-block threshold = quantile(0.5) + 3, then
    3x3-neighborhood mean, squared -> thsSmoothed;
  * select (PixelSelector2.cpp:209-352): 3-scale cascade over blocks of
    pot / 2pot / 4pot pixels. Within each pot cell, the best pixel passing
    the level-0 gradient threshold (score = |grad . random_dir|) is selected
    with status 1; 2pot blocks with no selection pick a pixel passing the
    down-weighted level-1 threshold (status 2); likewise 4pot -> status 4;
  * makeMaps (PixelSelector2.cpp:108-207): density feedback adjusting `pot`
    (one recursion) plus random subsampling toward the target density;
  * selectFromLidar / makeMapsFromLidar (PixelSelector2.cpp:354-622): the
    same cascade restricted to projected LiDAR candidate pixels.

TPU-native redesign:
  * the scalar triple-loop becomes dense per-pixel pass masks + blockwise
    argmax via reshape (pure VPU work, no scatter);
  * scan-order-dependent tie-breaking and libc rand() directions are
    replaced by seeded `jax.random` per-cell directions — deterministic, same
    distribution (SURVEY.md §7 determinism note);
  * the LiDAR variant takes the splatted nearest-depth candidate map from
    ops.lidar (a per-pixel mask) instead of bucketed candidate lists: with
    duplicates-per-pixel removed the selection outcome is identical because
    the cascade scores pixels, not candidates;
  * `pot` is a static argument (recompiles for the few values the density
    controller visits; XLA caches each).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sdv_loam_tpu.config import Settings

# the 16 candidate directions (PixelSelector2.cpp:214-229)
DIRECTIONS = np.array(
    [[0, 1.0000], [0.3827, 0.9239], [0.1951, 0.9808], [0.9239, 0.3827],
     [0.7071, 0.7071], [0.3827, -0.9239], [0.8315, 0.5556], [0.8315, -0.5556],
     [0.5556, -0.8315], [0.9808, 0.1951], [0.9239, -0.3827], [0.7071, -0.7071],
     [0.5556, 0.8315], [0.9808, -0.1951], [1.0000, 0.0000], [0.1951, -0.9808]],
    dtype=np.float32)


@jax.jit
def grad_hist_thresholds(abs_grad0: jnp.ndarray, min_grad_hist_cut: float = 0.5,
                         min_grad_hist_add: float = 3.0):
    """Per-32x32-block smoothed gradient thresholds (makeHists).

    Returns ths_smoothed with shape (h//32, w//32): squared threshold,
    comparable against absSquaredGrad directly.
    """
    h, w = abs_grad0.shape
    h32, w32 = h // 32, w // 32
    g = jnp.sqrt(abs_grad0[:h32 * 32, :w32 * 32])
    gi = jnp.clip(g.astype(jnp.int32), 0, 48)
    # exclude image border ring (it<1 || it>w-2 ...) like the reference
    yy, xx = jnp.meshgrid(jnp.arange(h32 * 32), jnp.arange(w32 * 32),
                          indexing="ij")
    inb = (xx >= 1) & (xx <= w - 2) & (yy >= 1) & (yy <= h - 2)
    blocks = gi.reshape(h32, 32, w32, 32).transpose(0, 2, 1, 3).reshape(h32, w32, -1)
    binb = inb.reshape(h32, 32, w32, 32).transpose(0, 2, 1, 3).reshape(h32, w32, -1)
    # histogram per block over 49 bins
    onehot = (blocks[..., None] == jnp.arange(49)) & binb[..., None]
    hist = onehot.sum(axis=2)                       # (h32, w32, 49)
    total = hist.sum(axis=-1)
    # quantile: smallest bin b with cumsum > cut*total (computeHistQuantil)
    cum = jnp.cumsum(hist, axis=-1)
    # +0.5 matches computeHistQuantil's `hist[0]*below+0.5f` rounding
    # (PixelSelector2.cpp:39-45) — without it, exact-tie blocks resolve one
    # bin early vs the reference
    th = jnp.float32(min_grad_hist_cut) * total[..., None] + 0.5
    qbin = jnp.argmax(cum > th, axis=-1).astype(jnp.float32)
    qbin = jnp.where(cum[..., -1] > th[..., 0], qbin, 90.0)
    ths = qbin + min_grad_hist_add
    # 3x3 neighborhood mean then square (makeHists:81-105)
    pad = jnp.pad(ths, 1, constant_values=0.0)
    cnt = jnp.pad(jnp.ones_like(ths), 1, constant_values=0.0)
    ssum = sum(pad[1 + dy:1 + dy + h32, 1 + dx:1 + dx + w32]
               for dy in (-1, 0, 1) for dx in (-1, 0, 1))
    scnt = sum(cnt[1 + dy:1 + dy + h32, 1 + dx:1 + dx + w32]
               for dy in (-1, 0, 1) for dx in (-1, 0, 1))
    sm = ssum / scnt
    return sm * sm


def _block_reduce_argmax(score, block):
    """Blockwise argmax. score: (H, W) with -inf for non-candidates.

    Returns (best_val (nby, nbx), best_flat_idx (nby, nbx)) where idx is the
    flattened H*W pixel index of the block maximum.

    Implemented as SEPARABLE row/col reductions + an equality pass instead
    of reshape(nby, block, nbx, block).transpose(0, 2, 1, 3): that
    transpose put block*block in the minor dims and measured 57 ms for
    pot=4 at 1200x360 on TPU (vs 0.5 ms for other pots) — XLA lowers the
    4-element minor-dim shuffle catastrophically. The separable form is
    layout-friendly at every pot. Ties pick the smallest flat pixel index
    (deterministic; the C++ keeps the first strict improvement in dx-major
    order, gridMaxSelection PixelSelector.h:30-54 — tie sets are
    measure-zero on float scores).
    """
    h, w = score.shape
    nby, nbx = h // block, w // block

    def block_reduce(x, op):
        x = op(x.reshape(nby, block, w), 1)           # (nby, w)
        return op(x.reshape(nby, nbx, block), 2)      # (nby, nbx)

    v = block_reduce(score, jnp.max)
    vb = jnp.repeat(jnp.repeat(v, block, axis=0), block, axis=1)
    flat = (jnp.arange(h)[:, None] * w + jnp.arange(w)[None, :]).astype(
        jnp.int32)
    first = jnp.where(score == vb, flat, jnp.int32(h * w))
    idx = block_reduce(first, jnp.min)
    return v, idx


def _pad_to(img, hp, wp, value):
    h, w = img.shape
    return jnp.pad(img, ((0, hp - h), (0, wp - w)), constant_values=value)


def _cascade_winners(dI0, ag0, ag1, ag2, ths_smoothed, cand_mask, key,
                     pot: int, th_factor: float = 1.0,
                     grad_downweight_per_level: float = 0.75,
                     select_direction_distribution: bool = True):
    """The 3-scale selection cascade (select / selectFromLidar).

    Args:
      dI0: (H, W, 3) level-0 [intensity, dx, dy].
      ag0/ag1/ag2: absSquaredGrad at levels 0..2.
      ths_smoothed: (H//32, W//32) squared thresholds.
      cand_mask: (H, W) bool — candidate pixels (all-interior for the mono
        path; LiDAR-projected pixels for the depth path).
      key: PRNG key for the per-cell random directions.
      pot: potential (cell size), static.

    Returns:
      status: (H, W) int8 in {0,1,2,4}.
      counts: (3,) int32 — number of status 1 / 2 / 4 selections.
    """
    h, w = ag0.shape
    gx = dI0[..., 1]
    gy = dI0[..., 2]

    yy, xx = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    inb = (xx >= 4) & (xx < w - 5) & (yy >= 4) & (yy < h - 4)  # select():283
    cand = cand_mask & inb

    th0 = ths_smoothed[jnp.minimum(yy >> 5, ths_smoothed.shape[0] - 1),
                       jnp.minimum(xx >> 5, ths_smoothed.shape[1] - 1)]
    dw1 = grad_downweight_per_level
    th1 = th0 * dw1
    th2 = th1 * dw1 * dw1

    # level-1/2 gradient maps sampled at the reference's half/quarter coords
    x1 = (xx.astype(jnp.float32) * 0.5 + 0.25).astype(jnp.int32)
    y1 = (yy.astype(jnp.float32) * 0.5 + 0.25).astype(jnp.int32)
    ag1v = ag1[jnp.clip(y1, 0, ag1.shape[0] - 1), jnp.clip(x1, 0, ag1.shape[1] - 1)]
    x2 = (xx.astype(jnp.float32) * 0.25 + 0.125).astype(jnp.int32)
    y2 = (yy.astype(jnp.float32) * 0.25 + 0.125).astype(jnp.int32)
    ag2v = ag2[jnp.clip(y2, 0, ag2.shape[0] - 1), jnp.clip(x2, 0, ag2.shape[1] - 1)]

    pass0 = cand & (ag0 > th0 * th_factor)
    pass1 = cand & (ag1v > th1 * th_factor)
    pass2 = cand & (ag2v > th2 * th_factor)

    # pad to a multiple of 4*pot
    p4 = 4 * pot
    hp = -(-h // p4) * p4
    wp = -(-w // p4) * p4
    nc_y, nc_x = hp // pot, wp // pot

    # random direction per pot cell / 2pot block / 4pot block
    k1, k2, k3 = jax.random.split(key, 3)
    dirs = jnp.asarray(DIRECTIONS)

    def cell_dirs(k, n_y, n_x, rep):
        idx = jax.random.randint(k, (n_y, n_x), 0, 16)
        # one-hot MXU matmul, not dirs[idx]: gathers cost per-INDEX on TPU
        # and at pot=1 this is one index per PIXEL (measured 94 ms at
        # 1200x360; sub-ms for every other pot). The 432k x 16 @ 16 x 2
        # matmul is ~14 MFLOP — free.
        oh = jax.nn.one_hot(idx.reshape(-1), 16, dtype=jnp.float32)
        d = (oh @ dirs).reshape(n_y, n_x, 2)           # (n_y, n_x, 2)
        # upsample by broadcast+reshape, NOT jnp.repeat: the repeat lowers
        # to a concat/gather chain that measured 71 ms for pot=4 at
        # 1200x360 on TPU (other pots 0.6 ms — an XLA lowering cliff);
        # the broadcast form is uniformly sub-ms
        d = jnp.broadcast_to(d[:, None, :, None, :],
                             (n_y, rep, n_x, rep, 2)).reshape(
            n_y * rep, n_x * rep, 2)
        return d[:hp, :wp]

    d1 = cell_dirs(k1, nc_y, nc_x, pot)
    d2 = cell_dirs(k2, nc_y // 2 + 1, nc_x // 2 + 1, 2 * pot)
    d3 = cell_dirs(k3, nc_y // 4 + 1, nc_x // 4 + 1, 4 * pot)

    gxp = _pad_to(gx, hp, wp, 0.0)
    gyp = _pad_to(gy, hp, wp, 0.0)

    def dir_score(d):
        s = jnp.abs(gxp * d[..., 0] + gyp * d[..., 1])
        return s

    neg = jnp.float32(-1.0)
    if select_direction_distribution:
        s0 = dir_score(d1)
        s1 = dir_score(d2)
        s2 = dir_score(d3)
    else:
        s0 = _pad_to(ag0, hp, wp, 0.0)
        s1 = _pad_to(ag1v, hp, wp, 0.0)
        s2 = _pad_to(ag2v, hp, wp, 0.0)

    p0 = _pad_to(pass0, hp, wp, False)
    p1 = _pad_to(pass1, hp, wp, False)
    p2 = _pad_to(pass2, hp, wp, False)

    # level 1: per pot cell
    sc0 = jnp.where(p0, s0, neg)
    v1, i1 = _block_reduce_argmax(sc0, pot)
    sel1 = v1 >= 0.0                                     # (nc_y, nc_x)

    # level 2: per 2pot block, only pixels of pot cells without a selection
    cell_has1 = jnp.repeat(jnp.repeat(sel1, pot, axis=0), pot, axis=1)
    sc1 = jnp.where(p1 & (~cell_has1), s1, neg)
    v2, i2 = _block_reduce_argmax(sc1, 2 * pot)
    blk_has1 = sel1.reshape(nc_y // 2, 2, nc_x // 2, 2).any(axis=(1, 3))
    sel2 = (v2 >= 0.0) & (~blk_has1)

    # level 3: per 4pot block
    blk2_has = jnp.repeat(jnp.repeat(sel2, 2 * pot, axis=0), 2 * pot, axis=1)
    sc2 = jnp.where(p2 & (~cell_has1) & (~blk2_has), s2, neg)
    v3, i3 = _block_reduce_argmax(sc2, 4 * pot)
    blk4_has1 = sel1.reshape(nc_y // 4, 4, nc_x // 4, 4).any(axis=(1, 3))
    blk4_has2 = sel2.reshape(nc_y // 4, 2, nc_x // 4, 2).any(axis=(1, 3))
    sel3 = (v3 >= 0.0) & (~blk4_has1) & (~blk4_has2)

    counts = jnp.stack([sel1.sum(), sel2.sum(), sel3.sum()]).astype(jnp.int32)
    # winner lists: flat PADDED-image pixel index + status per cascade level.
    # The three levels pick from disjoint pixel sets (level 2/3 exclude
    # blocks containing a finer selection), so concatenation is duplicate-
    # free. Compact consumers work from these lists directly — scattering
    # statuses into the (H, W) image and nonzero-compacting it back costs
    # ~0.2 us per IMAGE cell on TPU (~350 ms at KITTI size).
    winners = [(sel1, i1, 1), (sel2, i2, 2), (sel3, i3, 4)]
    return winners, counts, (hp, wp)


@partial(jax.jit, static_argnames=("pot", "select_direction_distribution"))
def select_cascade(dI0, ag0, ag1, ag2, ths_smoothed, cand_mask, key,
                   pot: int, th_factor: float = 1.0,
                   grad_downweight_per_level: float = 0.75,
                   select_direction_distribution: bool = True):
    """The 3-scale selection cascade returning the dense status image
    (legacy/oracle form; compact consumers use the winner lists inside
    select_compact instead).

    Returns (status (H, W) int8 in {0,1,2,4}, counts (3,) int32)."""
    h, w = ag0.shape
    winners, counts, (hp, wp) = _cascade_winners(
        dI0, ag0, ag1, ag2, ths_smoothed, cand_mask, key, pot, th_factor,
        grad_downweight_per_level, select_direction_distribution)
    status = jnp.zeros((hp * wp,), jnp.int8)
    for sel, idx, code in winners[::-1]:
        status = status.at[jnp.where(sel, idx, hp * wp - 1)].max(
            jnp.where(sel, jnp.int8(code), jnp.int8(0)))
    return status.reshape(hp, wp)[:h, :w], counts


def _select_compact_impl(dI0, ag0, ag1, ag2, cand_mask, depth_map, px_u_map,
                   px_v_map, key, th_factor=1.0,
                   min_grad_hist_cut=0.5,
                   min_grad_hist_add=3.0,
                   grad_downweight_per_level=0.75, *,
                   pot: int, cap: int,
                   select_direction_distribution: bool = True):
    """Whole selection stage as ONE device program with compacted output.

    Fuses makeHists + the 3-scale cascade + the per-candidate data the host
    pool insertion needs (pattern colors/weights, gradient Hessian,
    Shi-Tomasi score, LiDAR depth at the pixel) so a keyframe's point
    selection costs a single host round-trip instead of four
    (PixelSelector2::makeMapsFromLidar + FullSystem::makeNewTraces data
    gathering, PixelSelector2.cpp:354-457 / FullSystem.cpp:1273-1356).

    Returns dict with (cap,)-shaped compacted candidate rows (row-major
    pixel order, like the reference's scan order), `valid` marking real
    rows, `counts` for the density feedback, and n_sel.
    """
    from sdv_loam_tpu.ops.distmap import shi_tomasi
    from sdv_loam_tpu.ops.trace import pattern_colors

    h, w = ag0.shape
    ths = grad_hist_thresholds(ag0, min_grad_hist_cut, min_grad_hist_add)
    winners, counts, (hp, wp) = _cascade_winners(
        dI0, ag0, ag1, ag2, ths, cand_mask, key, pot, th_factor,
        grad_downweight_per_level, select_direction_distribution)
    # compact winner lists directly (≈(h*w)/pot² rows) instead of
    # scatter+nonzero over the full image: sort by padded-flat pixel index
    # preserves the reference's row-major insertion order
    widx = jnp.concatenate([jnp.where(s, i, hp * wp).ravel()
                            for s, i, _ in winners])
    wvalid = widx < hp * wp
    skey = jnp.where(wvalid, widx, jnp.int32(2 ** 30))
    (skey_sorted,) = jax.lax.sort((skey,), num_keys=1)
    take = skey_sorted[:cap]
    valid = take < hp * wp
    idx_c = jnp.where(valid, take, 0)
    n_sel = wvalid.sum()
    vs_i = idx_c // wp
    us_i = idx_c % wp
    valid = valid & (us_i < w) & (vs_i < h)
    vs = vs_i.astype(jnp.float32)
    us = us_i.astype(jnp.float32)
    z = depth_map[jnp.minimum(vs_i, h - 1), jnp.minimum(us_i, w - 1)]
    # LiDAR-depth candidates live at the winning candidate's exact float
    # projection (FullSystem.cpp:1313: point created at the candidate's
    # float Ku/Kv with its own depth); mono candidates at the pixel itself
    fu = px_u_map[jnp.minimum(vs_i, h - 1), jnp.minimum(us_i, w - 1)]
    fv = px_v_map[jnp.minimum(vs_i, h - 1), jnp.minimum(us_i, w - 1)]
    use_f = (z > 0) & (fu >= 0) & (fv >= 0)
    us = jnp.where(use_f, fu, us)
    vs = jnp.where(use_f, fv, vs)
    col, wgt, gradH, finite, gcen = pattern_colors(dI0, us, vs)
    score = shi_tomasi(dI0, us, vs)
    return dict(u=us, v=vs, valid=valid, counts=counts, n_sel=n_sel,
                color=col, weights=wgt, gradH=gradH,
                finite=finite & valid, gcen=gcen, score=score, z=z)


_SELECT_STATICS = ("pot", "cap", "select_direction_distribution")

select_compact = partial(jax.jit,
                         static_argnames=_SELECT_STATICS)(
                             _select_compact_impl)


@partial(jax.jit, static_argnames=_SELECT_STATICS)
def select_compact_batch(args_b, *, pot: int, cap: int,
                         select_direction_distribution: bool = True):
    """B-sequence fleet selection: vmap of select_compact over a leading
    batch axis (the fleet driver folds aligned keyframe selection rounds
    into one program; see kf_ops.kf_opt_step_batch for the rationale).
    `args_b`: tuple over B of per-lane arg tuples, stacked inside the jit."""
    args = jax.tree.map(lambda *xs: jnp.stack(xs), *args_b)

    def one(*a):
        return _select_compact_impl(
            *a, pot=pot, cap=cap,
            select_direction_distribution=select_direction_distribution)

    return jax.vmap(one)(*args)


# `pot` is a STATIC arg of select_compact (cell size changes every reduce
# shape), so each distinct value is one compile. The reference lets
# currentPotential take any integer (PixelSelector2.cpp:120-186); on a
# low-texture scene the density feedback HUNTS, and each new pot cost a
# fresh ~6-8 s tunnel compile inside the steady state (measured: kf.select
# 0.15 -> 1.82 s/KF, 33 s of host time in a 32-frame bench phase). The
# ladder bounds the variant set to 8 cached programs; quotia subsampling
# (random drop toward the density target) absorbs the quantization, the
# same way it absorbs any over-selection in the reference.
_POT_LADDER = (1, 2, 3, 4, 6, 8, 12, 16)


def _pot_bucket(pot) -> int:
    """Largest ladder value <= pot (round DOWN: a too-small pot only
    over-selects, which quotia subsampling then trims; a too-large pot
    under-selects, which nothing can repair)."""
    p = max(1, int(pot))
    out = _POT_LADDER[0]
    for v in _POT_LADDER:
        if v <= p:
            out = v
    return out


def make_maps_compact_steps(dI0, abs_grads, cand_mask, depth_map, px_u_map,
                            px_v_map, density, key,
                            pot_state: dict, settings: Settings, cap: int,
                            th_factor: float = 1.0, sub_seed: int = 0):
    """Generator form of the density-feedback selection (makeMaps /
    makeMapsFromLidar, PixelSelector2.cpp:108-207): yields the device dict
    of each select_compact attempt; the caller sends back the pulled host
    values (so a lockstep driver can batch pulls across sequences).
    Returns (out dict, keep (cap,) bool np mask) via StopIteration.value.
    """
    pot = _pot_bucket(pot_state.get("pot", 3))

    for recursion in range(2):
        # dispatch DESCRIPTOR: the fleet driver folds aligned sequences'
        # selection rounds into one vmapped program (select_compact_batch);
        # single-sequence drivers dispatch select_compact directly
        out = yield (
            "dispatch_select",
            (dI0, abs_grads[0], abs_grads[1], abs_grads[2], cand_mask,
             depth_map, px_u_map, px_v_map, key,
             np.float32(th_factor),
             np.float32(settings.min_grad_hist_cut),
             np.float32(settings.min_grad_hist_add),
             np.float32(settings.grad_downweight_per_level)),
            dict(pot=pot, cap=cap, select_direction_distribution=
                 settings.select_direction_distribution))
        num_have = float(out["counts"].sum())
        quotia = density / max(num_have, 1.0)
        K = num_have * (pot + 1) * (pot + 1)
        ideal_pot = max(1, int(np.sqrt(K / max(density, 1.0)) - 1))
        if recursion == 0 and quotia > 1.25 and pot > 1:
            pot = _pot_bucket(min(ideal_pot, pot - 1))
            continue
        if recursion == 0 and quotia < 0.25:
            pot = _pot_bucket(max(ideal_pot, pot + 1))
            continue
        break
    pot_state["pot"] = _pot_bucket(ideal_pot)

    keep = np.asarray(out["valid"]).copy()
    if quotia < 0.95:
        rng = np.random.default_rng(sub_seed)
        keep &= rng.random(keep.shape) < quotia
    return out, keep


def make_maps_compact(*args, **kw):
    """Single-sequence driver of make_maps_compact_steps (one device_get per
    attempt)."""
    gen = make_maps_compact_steps(*args, **kw)
    pulled = None
    while True:
        try:
            req = gen.send(pulled)
        except StopIteration as stop:
            return stop.value
        if isinstance(req, tuple) and len(req) == 3 \
                and req[0] == "dispatch_select":
            req = select_compact(*req[1], **req[2])
        pulled = jax.device_get(req)


def make_maps(dI0, abs_grads, cand_mask, density, key, pot_state: dict,
              settings: Settings, th_factor: float = 1.0):
    """Host-driven density feedback around select_cascade (makeMaps /
    makeMapsFromLidar, PixelSelector2.cpp:108-207 & 354-457).

    pot_state: mutable {"pot": int} carried across keyframes (the reference
    keeps currentPotential in the selector object).

    Returns (status (H, W) int8 np-array, n_selected int).
    """
    ths = grad_hist_thresholds(abs_grads[0], settings.min_grad_hist_cut,
                               settings.min_grad_hist_add)
    pot = max(1, int(pot_state.get("pot", 3)))
    k_sel, k_sub = jax.random.split(key)

    for recursion in range(2):  # initial + up to 1 re-run (recursionsLeft=1)
        status, counts = select_cascade(
            dI0, abs_grads[0], abs_grads[1], abs_grads[2], ths, cand_mask,
            k_sel, pot, th_factor, settings.grad_downweight_per_level,
            settings.select_direction_distribution)
        status, counts = jax.device_get((status, counts))
        num_have = float(counts.sum())
        quotia = density / max(num_have, 1.0)
        K = num_have * (pot + 1) * (pot + 1)
        ideal_pot = max(1, int(np.sqrt(K / max(density, 1.0)) - 1))
        if recursion == 0 and quotia > 1.25 and pot > 1:
            pot = min(ideal_pot, pot - 1)
            continue
        if recursion == 0 and quotia < 0.25:
            pot = max(ideal_pot, pot + 1)
            continue
        break

    status_np = status
    n_have = int((status_np != 0).sum())
    if quotia < 0.95 and n_have > 0:
        keep = jax.device_get(
            jax.random.uniform(k_sub, status_np.shape) < quotia)
        status_np = np.where(keep, status_np, 0).astype(np.int8)
        n_have = int((status_np != 0).sum())
    pot_state["pot"] = ideal_pot
    return status_np, n_have
