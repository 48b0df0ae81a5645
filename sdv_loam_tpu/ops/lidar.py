"""LiDAR preprocessing: range image, ground removal, segmentation, projection.

Reference pipeline (LeGO-LOAM style, src/main.cpp:562-858):
  projectPointCloud  (main.cpp:562-606): Velodyne cloud -> 64 x 1800 range
      image via vertical/horizontal angle binning;
  groundRemoval      (main.cpp:608-656): ring-pair vertical-angle test
      (|angle| <= 10 deg) on rings below groundScanInd=50;
  cloudSegmentation  (main.cpp:658-783): BFS connected components on the
      range image under the angle criterion
      atan2(d2 sin a, d1 - d2 cos a) > 60 deg; clusters with >= 30 px are
      feasible, clusters with >= 5 px need >= 3 distinct rings;
  lidarCloudHandler  (main.cpp:785-858): T_cam<-lidar transform + pinhole
      projection of segmented points, bounds filter, ground-ratio flag.

TPU-native redesign: everything is fixed-shape tensor ops under one jit.
  * scatter-min builds the range image (deterministic nearest-wins instead of
    the reference's order-dependent overwrite);
  * the sequential BFS becomes a parallel connected-components pass:
    edge-gated min-label hooking + pointer jumping (O(log) sweeps), exact —
    not an approximation — because hooking converges to per-component minima;
  * the output is both the dense per-cell candidate grid and a splatted
    per-pixel camera depth map (nearest-depth wins), which is the form the
    TPU pixel selector consumes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sdv_loam_tpu.config import (ANG_BOTTOM, ANG_RES_X, ANG_RES_Y,
                                 GROUND_SCAN_IND, HORIZON_SCAN, N_SCAN,
                                 SEGMENT_ALPHA_X, SEGMENT_ALPHA_Y,
                                 SEGMENT_THETA, SEGMENT_VALID_LINE_NUM,
                                 SEGMENT_VALID_POINT_NUM, SENSOR_MOUNT_ANGLE)

_NCELL = N_SCAN * HORIZON_SCAN


def project_point_cloud(cloud: jnp.ndarray, mask: jnp.ndarray):
    """Bin points into the 64 x 1800 range image (main.cpp:562-606).

    Args:
      cloud: (N, 3) lidar-frame points (x fwd, y left, z up); padded rows ok.
      mask: (N,) bool validity of each row.

    Returns:
      range_img: (64, 1800) f32, +inf where empty.
      xyz_img:   (64, 1800, 3) f32 point coordinates of the nearest point
                 per cell (0 where empty).
    """
    x, y, z = cloud[:, 0], cloud[:, 1], cloud[:, 2]
    horiz_dist = jnp.sqrt(x * x + y * y)
    vert_deg = jnp.degrees(jnp.arctan2(z, horiz_dist))
    row = jnp.floor((vert_deg + ANG_BOTTOM) / ANG_RES_Y).astype(jnp.int32)
    horiz_deg = jnp.degrees(jnp.arctan2(x, y))
    col = (-jnp.round((horiz_deg - 90.0) / ANG_RES_X)).astype(jnp.int32) + HORIZON_SCAN // 2
    col = jnp.where(col >= HORIZON_SCAN, col - HORIZON_SCAN, col)
    rng = jnp.sqrt(x * x + y * y + z * z)
    ok = (mask & (row >= 0) & (row < N_SCAN) & (col >= 0) & (col < HORIZON_SCAN)
          & (rng >= 0.1))
    idx = jnp.where(ok, row * HORIZON_SCAN + col, _NCELL)  # dump invalid
    rng_s = jnp.where(ok, rng, jnp.inf)

    # sort-based segment-min: XLA scatter-min on TPU costs ~1.5 us/index
    # (~190 ms at this size); a stable 2-key sort is ~10-18 ms. Winner per
    # cell = smallest range, ties to the lowest point index (deterministic
    # — the reference's order-dependent overwrite is its scan order).
    # Winners (first row of each sorted cell segment) are written back by
    # ONE unique-index scatter; the earlier searchsorted formulation paid
    # log2(n) sequential gather rounds for the same answer (measured
    # 18.6 -> ~4 ms at n=131072, tools/stream_bench.py).
    n = cloud.shape[0]
    rowid = jnp.arange(n, dtype=jnp.int32)
    idx_s, rng_sorted, rid_s = jax.lax.sort((idx, rng_s, rowid), num_keys=2)
    first = jnp.concatenate([jnp.ones(1, bool), idx_s[1:] != idx_s[:-1]])
    win = first & (idx_s < _NCELL) & jnp.isfinite(rng_sorted)
    payload = jnp.concatenate(
        [rng_sorted[:, None], cloud[rid_s]], axis=-1)           # (n, 4)
    maps = jnp.full((_NCELL + 1, 4), jnp.inf, dtype=cloud.dtype)
    maps = maps.at[jnp.where(win, idx_s, _NCELL + 2)].set(
        payload, mode="drop", unique_indices=True)
    range_img = maps[:_NCELL, 0].reshape(N_SCAN, HORIZON_SCAN)
    xyz_img = jnp.where(jnp.isfinite(range_img)[..., None],
                        maps[:_NCELL, 1:].reshape(N_SCAN, HORIZON_SCAN, 3),
                        0.0)
    return range_img, xyz_img


def ground_removal(range_img: jnp.ndarray, xyz_img: jnp.ndarray):
    """Ground mask from ring-pair vertical angles (main.cpp:608-656).

    Returns ground: (64, 1800) int8 — 1 ground, 0 not ground, -1 unknown
    (one of the pair cells empty).
    """
    has = jnp.isfinite(range_img)
    lower = xyz_img[:GROUND_SCAN_IND]          # rings 0..49
    upper = xyz_img[1:GROUND_SCAN_IND + 1]     # rings 1..50
    diff = upper - lower
    angle = jnp.degrees(jnp.arctan2(
        diff[..., 2], jnp.sqrt(diff[..., 0] ** 2 + diff[..., 1] ** 2)))
    pair_ok = has[:GROUND_SCAN_IND] & has[1:GROUND_SCAN_IND + 1]
    is_ground_pair = pair_ok & (jnp.abs(angle - SENSOR_MOUNT_ANGLE) <= 10.0)

    ground = jnp.zeros((N_SCAN, HORIZON_SCAN), dtype=jnp.int8)
    # unknown where pair has a hole (rows 0..49 only, like the reference)
    ground = ground.at[:GROUND_SCAN_IND].set(
        jnp.where(pair_ok, 0, -1).astype(jnp.int8))
    # mark both rings of a ground pair
    g = jnp.zeros((N_SCAN, HORIZON_SCAN), dtype=jnp.bool_)
    g = g.at[:GROUND_SCAN_IND].set(is_ground_pair)
    g = g.at[1:GROUND_SCAN_IND + 1].max(is_ground_pair)
    ground = jnp.where(g, jnp.int8(1), ground)
    return ground


def _edge_connected(range_img, shifted_range, alpha):
    """Angle criterion between neighboring cells (main.cpp:700-712)."""
    d1 = jnp.maximum(range_img, shifted_range)
    d2 = jnp.minimum(range_img, shifted_range)
    ang = jnp.arctan2(d2 * np.sin(alpha), d1 - d2 * np.cos(alpha))
    both = jnp.isfinite(range_img) & jnp.isfinite(shifted_range)
    return both & (ang > SEGMENT_THETA)


def _seg_scan_min(lbl, conn_prev, axis, reverse):
    """Segmented min-scan of labels along `axis`.

    conn_prev: bool — True where the cell is connected (angle criterion,
    non-wrapping) to its predecessor in scan order. Labels propagate by
    min along each contiguous connected run in ONE scan, so a wall
    spanning the full 1800-column ring unifies in one sweep instead of
    1800 neighbor hops. associative_scan is O(log n) vector steps — no
    per-cell gathers.
    """
    reset = ~conn_prev

    def comb(a, b):
        va, ra = a
        vb, rb = b
        return jnp.where(rb, vb, jnp.minimum(va, vb)), ra | rb

    v, _ = jax.lax.associative_scan(comb, (lbl, reset), axis=axis,
                                    reverse=reverse)
    return v


def segment_cloud(range_img: jnp.ndarray, ground: jnp.ndarray,
                  n_iters: int = 24):
    """Connected components under the angle criterion; feasibility gating.

    Parallel replacement for the reference's per-cluster BFS
    (labelComponents, main.cpp:658-748): exact connected components via
    iterated sweeps of {min-label hooking over the 4-neighborhood
    (column-wrapped), segmented min-scans along rows and columns, one
    pointer jump}, inside a convergence-checked while_loop. Every op is
    monotone non-increasing and only mixes labels within a component, so
    the first unchanged sweep is the exact fixpoint (per-component
    minima). The scans propagate across whole connected runs per sweep
    (typical range images converge in 2-4 sweeps vs 24 fixed hook+jump
    iterations before — the jump gathers were ~2/3 of preprocess_scan's
    device time); the jump doubles reach for snake-shaped components so
    the n_iters bound is never the binding constraint in practice.

    Returns:
      seg_mask:  (64, 1800) bool — pixels in the segmented cloud (feasible
                 cluster or ground), reference cloudSegmentation:758-781.
      is_ground: (64, 1800) bool — ground subset of seg_mask.
    """
    valid = jnp.isfinite(range_img) & (ground != 1)

    up = jnp.pad(range_img[:-1], ((1, 0), (0, 0)), constant_values=jnp.inf)
    down = jnp.pad(range_img[1:], ((0, 1), (0, 0)), constant_values=jnp.inf)
    left = jnp.roll(range_img, 1, axis=1)    # column wrap (main.cpp:688-691)
    right = jnp.roll(range_img, -1, axis=1)

    conn_up = _edge_connected(range_img, up, SEGMENT_ALPHA_Y)
    conn_down = _edge_connected(range_img, down, SEGMENT_ALPHA_Y)
    conn_left = _edge_connected(range_img, left, SEGMENT_ALPHA_X)
    conn_right = _edge_connected(range_img, right, SEGMENT_ALPHA_X)

    vup = jnp.pad(valid[:-1], ((1, 0), (0, 0)))
    vdown = jnp.pad(valid[1:], ((0, 1), (0, 0)))
    vleft = jnp.roll(valid, 1, axis=1)
    vright = jnp.roll(valid, -1, axis=1)
    conn_up &= valid & vup
    conn_down &= valid & vdown
    conn_left &= valid & vleft
    conn_right &= valid & vright

    # non-wrapping variants for the scans (the hook handles the ring wrap)
    col0 = jnp.zeros((N_SCAN, 1), bool)
    conn_left_nw = jnp.concatenate([col0, conn_left[:, 1:]], axis=1)
    conn_right_nw = jnp.concatenate([conn_right[:, :-1], col0], axis=1)

    idx = jnp.arange(_NCELL, dtype=jnp.int32).reshape(N_SCAN, HORIZON_SCAN)
    label = jnp.where(valid, idx, _NCELL)  # sentinel for invalid

    def hook(lbl):
        lup = jnp.pad(lbl[:-1], ((1, 0), (0, 0)), constant_values=_NCELL)
        ldown = jnp.pad(lbl[1:], ((0, 1), (0, 0)), constant_values=_NCELL)
        lleft = jnp.roll(lbl, 1, axis=1)
        lright = jnp.roll(lbl, -1, axis=1)
        m = lbl
        m = jnp.minimum(m, jnp.where(conn_up, lup, _NCELL))
        m = jnp.minimum(m, jnp.where(conn_down, ldown, _NCELL))
        m = jnp.minimum(m, jnp.where(conn_left, lleft, _NCELL))
        m = jnp.minimum(m, jnp.where(conn_right, lright, _NCELL))
        return jnp.where(valid, m, _NCELL)

    def jump(lbl):
        flat = jnp.append(lbl.reshape(-1), _NCELL)
        return flat[lbl.reshape(-1)].reshape(lbl.shape)

    def sweep(lbl):
        lbl = hook(lbl)
        lbl = _seg_scan_min(lbl, conn_left_nw, axis=1, reverse=False)
        lbl = _seg_scan_min(lbl, conn_right_nw, axis=1, reverse=True)
        lbl = _seg_scan_min(lbl, conn_up, axis=0, reverse=False)
        lbl = _seg_scan_min(lbl, conn_down, axis=0, reverse=True)
        return jump(lbl)

    def cond(st):
        i, cur, prev = st
        return (i < n_iters) & jnp.any(cur != prev)

    def body(st):
        i, cur, _ = st
        return i + 1, sweep(cur), cur

    _, label, _ = jax.lax.while_loop(cond, body, (1, sweep(label), label))

    # cluster statistics via scatter-add on root labels
    flat_label = label.reshape(-1)
    ones = (flat_label < _NCELL).astype(jnp.int32)
    sizes = jnp.zeros((_NCELL + 1,), jnp.int32).at[flat_label].add(ones)

    # distinct-ring count: presence array per (component, ring)
    rows = idx.reshape(-1) // HORIZON_SCAN
    pres_idx = jnp.where(flat_label < _NCELL,
                         flat_label * jnp.int32(N_SCAN) + rows.astype(jnp.int32),
                         _NCELL * N_SCAN)
    presence = jnp.zeros((_NCELL * N_SCAN + 1,), jnp.int8).at[pres_idx].max(
        jnp.where(flat_label < _NCELL, jnp.int8(1), jnp.int8(0)))
    line_count = presence[:_NCELL * N_SCAN].reshape(_NCELL, N_SCAN).astype(
        jnp.int32).sum(axis=1)

    feasible_root = (sizes[:_NCELL] >= 30) | (
        (sizes[:_NCELL] >= SEGMENT_VALID_POINT_NUM)
        & (line_count >= SEGMENT_VALID_LINE_NUM))
    feasible = jnp.append(feasible_root, False)[flat_label].reshape(
        N_SCAN, HORIZON_SCAN)

    is_ground = ground == 1
    seg_mask = (feasible & valid) | is_ground
    return seg_mask, is_ground & seg_mask


def project_to_camera(xyz_img, seg_mask, is_ground, R_cl, t_cl, fx, fy, cx, cy,
                      w, h):
    """Project segmented cells into the camera (lidarCloudHandler,
    main.cpp:810-848).

    Returns per-cell candidate grid (u, v, depth, valid, ground) plus the
    ground ratio and the splatted per-pixel candidate depth map used by the
    TPU pixel selector (nearest-depth wins per output pixel).
    """
    pts = xyz_img.reshape(-1, 3)
    cam = pts @ R_cl.T + t_cl
    zc = cam[:, 2]
    u = cam[:, 0] / zc
    v = cam[:, 1] / zc
    ku = u * fx + cx
    kv = v * fy + cy
    kui = ku.astype(jnp.int32)  # C-style trunc toward 0 for bounds test
    kvi = kv.astype(jnp.int32)
    sm = seg_mask.reshape(-1)
    ok = (sm & (zc >= 0.2)
          & (kui >= 4) & (kui < w - 5) & (kvi >= 4) & (kvi < h - 4))
    grd = is_ground.reshape(-1) & ok
    n_all = ok.sum()
    ground_ratio = grd.sum() / jnp.maximum(n_all, 1)

    # splat to per-pixel depth map, nearest depth wins. Sort-based winner
    # selection + ONE unique-index 4-channel scatter (see
    # project_point_cloud: TPU scatter cost scales with index count and
    # output size; four separate min/max scatters to w*h cells cost
    # hundreds of ms).
    n = zc.shape[0]
    pix = jnp.where(ok, kvi * w + kui, w * h).astype(jnp.int32)
    zsc = jnp.where(ok, zc, jnp.inf)
    rowid = jnp.arange(n, dtype=jnp.int32)
    pix_s, z_s, rid_s = jax.lax.sort((pix, zsc, rowid), num_keys=2)
    first = jnp.concatenate([jnp.ones(1, bool), pix_s[1:] != pix_s[:-1]])
    win_s = first & (pix_s < w * h)
    # the winning candidate's exact float projection per pixel: the
    # reference creates each LiDAR immature point at the candidate's float
    # (Ku, Kv) with that candidate's own depth (FullSystem.cpp:1313-1315);
    # creating it at the integer pixel instead misaligns depth and image
    # content by up to ~0.7 px, which on slanted surfaces is a 1-3% depth
    # error baked into a *trusted* (never re-optimized) depth.
    payload = jnp.stack([
        jnp.where(jnp.isfinite(z_s), z_s, 0.0),
        ku[rid_s], kv[rid_s],
        grd[rid_s].astype(zc.dtype)], axis=-1)                  # (n, 4)
    maps = jnp.zeros((w * h + 1, 4), dtype=xyz_img.dtype)
    # non-winner rows get an out-of-bounds index and are dropped, so every
    # surviving index is unique -> XLA's fast unique-indices scatter path
    maps = maps.at[jnp.where(win_s, pix_s, w * h + 2)].set(
        payload, mode="drop", unique_indices=True)
    depth_map = maps[:w * h, 0].reshape(h, w)
    px_u_map = maps[:w * h, 1].reshape(h, w)
    px_v_map = maps[:w * h, 2].reshape(h, w)
    ground_map = (maps[:w * h, 3] > 0).reshape(h, w)
    px_u_map = jnp.where(depth_map > 0, px_u_map, -1.0)
    px_v_map = jnp.where(depth_map > 0, px_v_map, -1.0)

    # LiDAR bbox area over projected candidates (lidarCloudHandler tracks
    # left/right/up/down, main.cpp:820-838) — on device so selection density
    # needs no depth-map readback
    big = jnp.int32(1 << 20)
    umin = jnp.where(ok, kui, big).min()
    umax = jnp.where(ok, kui, -big).max()
    vmin = jnp.where(ok, kvi, big).min()
    vmax = jnp.where(ok, kvi, -big).max()
    bbox_area = jnp.where(n_all >= 2,
                          ((umax - umin) * (vmax - vmin)).astype(xyz_img.dtype),
                          jnp.asarray(1.0, xyz_img.dtype))

    return dict(
        cand_u=ku.reshape(N_SCAN, HORIZON_SCAN),
        cand_v=kv.reshape(N_SCAN, HORIZON_SCAN),
        cand_z=zc.reshape(N_SCAN, HORIZON_SCAN),
        cand_valid=ok.reshape(N_SCAN, HORIZON_SCAN),
        cand_ground=grd.reshape(N_SCAN, HORIZON_SCAN),
        ground_ratio=ground_ratio,
        depth_map=depth_map,
        ground_map=ground_map,
        px_u_map=px_u_map,
        px_v_map=px_v_map,
        bbox_area=bbox_area,
    )


@partial(jax.jit, static_argnames=("w", "h"))
def preprocess_scan(cloud, mask, R_cl, t_cl, fx, fy, cx, cy, w: int, h: int):
    """Full per-scan LiDAR pipeline under a single jit.

    Returns the dict of project_to_camera plus intermediate grids.
    """
    range_img, xyz_img = project_point_cloud(cloud, mask)
    ground = ground_removal(range_img, xyz_img)
    seg_mask, is_ground = segment_cloud(range_img, ground)
    out = project_to_camera(xyz_img, seg_mask, is_ground, R_cl, t_cl,
                            fx, fy, cx, cy, w, h)
    out["range_img"] = range_img
    out["seg_mask"] = seg_mask
    # addFeaturePoint flag: > 0.8 ground among projected candidates
    # (main.cpp:850-853)
    out["add_feature_point"] = out["ground_ratio"] > 0.8
    return out


@partial(jax.jit, static_argnames=("w", "h"))
def preprocess_scan_batch(args_b, w: int, h: int):
    """B-scan fleet LiDAR preprocess: vmap of preprocess_scan over a
    leading batch axis. `args_b`: tuple over B of per-scan arg tuples
    (already padded to one shared cloud bucket); stacking happens INSIDE
    the jit so it fuses into the batched program instead of dispatching
    eager stack ops (each its own ~5 ms device program over the tunnel)."""
    args = jax.tree.map(lambda *xs: jnp.stack(xs), *args_b)
    return jax.vmap(lambda *a: preprocess_scan(*a, w=w, h=h))(*args)
