"""Isolate track_level's cost shape: per-LM-iteration fixed cost vs
per-lane cost, at KITTI level-0 shapes. Chained-dependency timing.

Usage: python tools/track_microbench.py   (TPU)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

if os.environ.get("SDV_PLAT"):
    jax.config.update("jax_platforms", os.environ["SDV_PLAT"])
import jax.numpy as jnp
import numpy as np

from sdv_loam_tpu.ops.photometric import calc_res_gs, track_level

H, W = 360, 1200
rng = np.random.default_rng(0)
img = jnp.asarray(rng.normal(size=(H, W, 3)).astype(np.float32))
K = jnp.asarray([718.856, 718.856, 600.0, 180.0], jnp.float32)


def make_pool(n):
    return dict(
        u=jnp.asarray(rng.uniform(8, W - 8, n).astype(np.float32)),
        v=jnp.asarray(rng.uniform(8, H - 8, n).astype(np.float32)),
        idepth=jnp.asarray(rng.uniform(0.03, 0.2, n).astype(np.float32)),
        color=jnp.asarray(rng.normal(size=n).astype(np.float32)),
        valid=jnp.ones((n,), bool))


T0 = jnp.eye(4, dtype=jnp.float32)
aff0 = jnp.zeros((2,), jnp.float32)
exp2 = jnp.asarray([1.0, 1.0], jnp.float32)


def chain(label, fn, reps=20):
    tok = jnp.float32(0.0)
    jax.block_until_ready(fn(tok))
    t0 = time.time()
    tok = jnp.float32(0.0)
    for _ in range(reps):
        out = fn(tok)
        tok = out * 0.0
    jax.block_until_ready(tok)
    print(f"{label:44s} {(time.time()-t0)/reps*1000:8.2f} ms", flush=True)


tl = jax.jit(track_level, static_argnames=("max_iters",))
cr = jax.jit(calc_res_gs)

for n in (6144, 1024):
    pool = make_pool(n)

    def res_only(tok, pool=pool):
        r = cr(pool, img, K, T0.at[0, 3].add(tok), aff0, jnp.float32(0.0),
               jnp.float32(20.0), jnp.float32(9.0))
        return r["E"]

    chain(f"calc_res_gs lvl0 n={n}", res_only)

    for iters in (1, 5, 10):
        def run(tok, pool=pool, iters=iters):
            T, aff, r, rep = tl(pool, img, K, T0.at[0, 3].add(tok), aff0,
                                aff0, exp2, jnp.float32(20.0),
                                jnp.float32(9.0), iters)
            return r["E"]

        chain(f"track_level n={n} iters={iters}", run)

# vmapped 3 lanes (the refine-candidates shape)
pool = make_pool(6144)
tl3 = jax.jit(jax.vmap(
    lambda T: track_level(pool, img, K, T, aff0, aff0, exp2,
                          jnp.float32(20.0), jnp.float32(9.0), 10)[2]["E"]))


def run3(tok):
    Ts = jnp.stack([T0.at[0, 3].add(tok), T0.at[0, 3].add(tok + 0.01),
                    T0.at[0, 3].add(tok - 0.01)])
    return tl3(Ts).sum()


chain("track_level vmap3 n=6144 iters=10", run3)
