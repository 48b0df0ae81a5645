"""Device-mesh data parallelism: many odometry sequences at once.

The reference is a single-process, single-sequence CPU system (SURVEY.md
§2.6) — there is no distributed axis in the algorithm itself. The natural
TPU scaling axis is *batch*: independent sequences (or independent segments
of one long sequence) pinned one-per-device over a 1-D `jax.sharding.Mesh`.
No cross-device collectives are needed in the odometry math; XLA's SPMD
partitioner simply runs each sequence's step on its device, and host-side
control stays global.

SCOPE — smoke-level mesh plumbing only. `_single_step` here is a REDUCED
combined step (pyramid -> track -> BA solve) whose one job is to validate
Mesh/NamedSharding/pjit wiring cheaply (it compiles in seconds;
tests/test_parallel.py). The PRODUCTION multi-chip paths are elsewhere:

  * parallel/dryrun.py — shards the real fused production programs
    (preprocess_scan, track_frame_step, kf_opt_step and the fleet *_batch
    variants) over the mesh, plus the device-pinned InterleavedFleet run;
  * system/multi.py — the fleet drivers the bench and dryrun actually use.

Do not extend this module's step; extend the production programs and shard
those.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sdv_loam_tpu.models import backend
from sdv_loam_tpu.ops.photometric import build_track_ref, splat_idepth, track_pyramid
from sdv_loam_tpu.ops.pyramid import make_images
from sdv_loam_tpu.utils import se3


def make_batch_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), axis_names=("batch",))


def _single_step(state, image, K, levels: int, w: int, h: int, F: int):
    """One combined tracking + BA step for a single sequence (unbatched)."""
    dI, _ = make_images(image, levels)

    # --- tracking: splat the window's sensor depths, build ref, track ---
    id0, w0 = splat_idepth(state["pt_u"].astype(jnp.int32),
                           state["pt_v"].astype(jnp.int32),
                           state["pt_idepth"],
                           jnp.ones_like(state["pt_idepth"]),
                           state["pt_valid"], w, h)
    pools = build_track_ref(dI, id0, w0, levels, cap=2048)
    Ks = tuple(jnp.stack([K[0] / 2 ** l, K[1] / 2 ** l,
                          (K[2] + 0.5) / 2 ** l - 0.5,
                          (K[3] + 0.5) / 2 ** l - 0.5]) for l in range(levels))
    tr = track_pyramid(pools, dI, Ks, state["T_init"],
                       jnp.zeros(2, jnp.float32), jnp.zeros(2, jnp.float32),
                       jnp.ones(2, jnp.float32),
                       jnp.full((5,), jnp.inf, jnp.float32),
                       20.0, 6.0, coarsest_lvl=levels - 1)

    # --- BA: linearize, assemble, solve, update ---
    T_cw = jnp.einsum("fij,fjk->fik", se3.se3_exp(state["eps"]),
                      state["T_cw_fej"])
    pairs = backend.make_pairs(T_cw, state["T_cw_fej"], state["aff"],
                               state["exposure"], K)
    lin = backend.linearize_residuals(
        state["pt_u"], state["pt_v"], state["pt_idepth"], state["pt_host"],
        state["pt_color"], state["pt_weights"], state["res_active"],
        state["res_state"], state["matcher_px"], state["matcher_valid"],
        pairs, state["dI0_stack"], state["fe_th"], K, w=w, h=h)
    frame_delta = state["eps"] * state["frame_valid"][:, None]
    c_delta = jnp.zeros(4, jnp.float32)
    sys_ = backend.build_system(lin, state["pt_host"], state["pt_is_sensor"],
                                state["pt_prior"], pairs, frame_delta,
                                c_delta, n_frames=F)
    ns = backend.make_nullspaces(state["T_cw_fej"],
                                 state["frame_valid"].astype(jnp.float32))
    sol = backend.solve_system(
        sys_, state["HM"], state["bM"],
        backend.stitched_delta(c_delta, state["eps"], state["frame_valid"]),
        jnp.full(4, 2e6, jnp.float32), c_delta, state["frame_prior"],
        frame_delta, state["frame_valid"], ns, jnp.float32(0.1),
        state["pt_host"], state["pt_is_sensor"], pairs, n_frames=F)

    new_state = dict(state)
    new_state["eps"] = state["eps"] + sol["dframes"]
    new_state["pt_idepth"] = jnp.where(
        state["pt_is_sensor"], state["pt_idepth"],
        state["pt_idepth"] + sol["didepth"])
    new_state["T_init"] = tr["T"]
    return new_state, dict(track_res=tr["res"], energy=sys_["e_quad"])


def make_batched_step(mesh: Mesh, levels: int, w: int, h: int, F: int):
    """Build the pjit-ed batched step with batch-sharded in/out."""
    step = partial(_single_step, levels=levels, w=w, h=h, F=F)
    vstep = jax.vmap(step, in_axes=(0, 0, 0))
    sharding = NamedSharding(mesh, P("batch"))

    @partial(jax.jit,
             in_shardings=(sharding, sharding, sharding),
             out_shardings=(sharding, sharding))
    def batched(states, images, Ks):
        return vstep(states, images, Ks)

    return batched, sharding


def make_example_batch(n: int, w: int = 128, h: int = 64, F: int = 4,
                       n_pts: int = 256, seed: int = 0):
    """Tiny synthetic batch of window states for the multi-chip dry-run."""
    rng = np.random.default_rng(seed)
    D = 4 + 6 * F

    def one(i):
        img = rng.random((h, w)).astype(np.float32) * 255
        u = rng.uniform(8, w - 8, n_pts).astype(np.float32)
        v = rng.uniform(8, h - 8, n_pts).astype(np.float32)
        z = rng.uniform(5, 40, n_pts).astype(np.float32)
        host = (rng.integers(0, F - 1, n_pts)).astype(np.int32)
        res_active = np.zeros((n_pts, F), bool)
        res_active[np.arange(n_pts), (host + 1) % F] = True
        state = dict(
            T_cw_fej=np.tile(np.eye(4, dtype=np.float32), (F, 1, 1)),
            eps=np.zeros((F, 6), np.float32),
            aff=np.zeros((F, 2), np.float32),
            exposure=np.ones(F, np.float32),
            frame_valid=np.ones(F, bool),
            frame_prior=np.zeros((F, 6), np.float32),
            # generous photometric gate: example colors are not sampled
            # from the example images, so keep residuals active
            fe_th=np.full(F, 1e7, np.float32),
            HM=np.zeros((D, D), np.float32), bM=np.zeros(D, np.float32),
            pt_u=u, pt_v=v, pt_idepth=1.0 / z, pt_host=host,
            pt_color=rng.random((n_pts, 8)).astype(np.float32) * 255,
            pt_weights=np.ones((n_pts, 8), np.float32),
            pt_is_sensor=np.ones(n_pts, bool),
            pt_prior=np.zeros(n_pts, np.float32),
            pt_valid=np.ones(n_pts, bool),
            res_active=res_active,
            res_state=np.zeros((n_pts, F), np.int8),
            matcher_px=np.stack([np.tile(u[:, None], (1, F)),
                                 np.tile(v[:, None], (1, F))], -1
                                ).astype(np.float32)
            + rng.standard_normal((n_pts, F, 2)).astype(np.float32),
            matcher_valid=res_active.copy(),
            # textured window images (nonzero gradients keep the BA's
            # wJI2 gradient-mass outlier gate open)
            dI0_stack=rng.random((F, h, w, 3)).astype(np.float32) * 50,
            T_init=np.eye(4, dtype=np.float32),
        )
        K = np.array([0.6 * w, 0.6 * w, (w - 1) / 2, (h - 1) / 2], np.float32)
        return state, img, K

    states, imgs, Ks = [], [], []
    for i in range(n):
        st, im, K = one(i)
        states.append(st)
        imgs.append(im)
        Ks.append(K)
    batch_state = {k: np.stack([s[k] for s in states]) for k in states[0]}
    return batch_state, np.stack(imgs), np.stack(Ks)
