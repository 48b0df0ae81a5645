"""Link economics part 2: real pull cost of COMPUTED results, and the
program-ALTERNATION cost hypothesis (the kf_microbench2 base-drift artifact:
first-in-sequence measurements of a program carry a ~200 ms transient —
does alternating programs A,B,A,B pay it every switch?).

Usage: python tools/link_bench2.py   (TPU via axon)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

REPS = 12


def t(label, fn, reps=REPS):
    fn()
    t0 = time.time()
    for _ in range(reps):
        fn()
    dt = (time.time() - t0) / reps * 1000
    print(f"{label:48s} {dt:8.1f} ms", flush=True)
    return dt


# --- real pull cost: COMPUTED small + medium results ---
@jax.jit
def mk_small(x):
    return {"T": jnp.eye(4) + x, "flow": jnp.zeros(3) + x,
            "matched": jnp.zeros(4096, jnp.float32) + x,
            "px": jnp.zeros((4096, 2)) + x}


x = jnp.float32(0.0)
r = mk_small(x)
jax.block_until_ready(r)
t("device_get computed small pytree", lambda: jax.device_get(mk_small(x)))


@jax.jit
def mk_med(x):
    return jnp.zeros((360, 1200), jnp.float32) + x


jax.block_until_ready(mk_med(x))
t("device_get computed 1.7MB array", lambda: jax.device_get(mk_med(x)))

# --- alternation cost: two distinct ~10 ms programs ---
a0 = jax.device_put(np.random.rand(1536, 1536).astype(np.float32) * 0.01)


@jax.jit
def prog_a(x):
    for _ in range(8):
        x = jnp.tanh(x @ x)
    return x


@jax.jit
def prog_b(x):
    for _ in range(8):
        x = jnp.sin(x @ x) * 0.9
    return x


jax.block_until_ready(prog_a(a0))
jax.block_until_ready(prog_b(a0))
ta = t("prog A streamed", lambda: jax.block_until_ready(prog_a(a0)))
tb = t("prog B streamed", lambda: jax.block_until_ready(prog_b(a0)))


def alt():
    jax.block_until_ready(prog_b(prog_a(a0)))


tab = t("A,B alternated (one block)", alt)
print(f"  -> alternation overhead vs sum of streamed: "
      f"{tab - ta - tb:+.1f} ms", flush=True)

# --- does a dormant program pay a revival cost? stream A 50x, then B once ---
for _ in range(50):
    r = prog_a(a0)
jax.block_until_ready(r)
t0 = time.time()
jax.block_until_ready(prog_b(a0))
print(f"{'B after 50 dormant (revival cost)':48s} "
      f"{(time.time() - t0) * 1000:8.1f} ms", flush=True)
