"""TPU primitive microbenchmarks over the axon tunnel.

Times the building blocks that dominate the odometry frame loop so
optimization effort lands where the milliseconds are.

Methodology (hard-won): time a CHAIN of executions where each call's input
depends on the previous call's output (x = f(x)), then block once at the
end. This measures the streamed marginal cost per execution — what a
pipelined frame loop actually pays. Independent timeit-style loops are
misleading over the relay: identical dispatches can be deduplicated, and
per-call block_until_ready adds a 30-65 ms round trip that swamps the
device time. Calibrate against the trivial-program chain (~5 ms/execution
overhead): content cost = measured - trivial.

Usage: python tools/microbench.py
"""

import time

import numpy as np


def chain_time(fn, x0, k: int = 12) -> float:
    """Marginal ms per execution of x = fn(x), streamed (one final block)."""
    import jax
    x = fn(x0)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(k):
        x = fn(x)
    jax.block_until_ready(x)
    return 1000 * (time.perf_counter() - t0) / k


def blocking_time(fn, *args, n: int = 5, warm: int = 2) -> float:
    """Median ms of fn(*args) with a per-call block — includes the tunnel
    round trip; use for upload/download costs, not device content."""
    import jax
    for _ in range(warm):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return 1000 * float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend())
    H, W = 360, 1200
    rng = np.random.default_rng(0)
    img = rng.random((H, W)).astype(np.float32)
    img_u8 = (img * 255).astype(np.uint8)
    cloud = rng.standard_normal((131072, 3)).astype(np.float32)

    # --- transfers & round trips (blocking by nature) ---
    print("upload img f32 1.7MB :", blocking_time(jnp.asarray, img), "ms")
    print("upload img u8 0.43MB :", blocking_time(jnp.asarray, img_u8), "ms")
    print("upload cloud 1.5MB   :", blocking_time(jnp.asarray, cloud), "ms")
    x = jax.block_until_ready(jnp.asarray(img))
    tiny = jax.jit(lambda a: a.sum())
    print("dispatch+block (tiny):", blocking_time(lambda: tiny(x)), "ms")
    print("pull 52 floats       :",
          blocking_time(lambda: jax.device_get(x[0, :52])), "ms")
    big = jax.block_until_ready(jnp.zeros((4096, 8, 2)))
    print("pull 4096x8x2        :",
          blocking_time(lambda: jax.device_get(big)), "ms")

    # --- streamed per-execution overhead baseline ---
    f_triv = jax.jit(lambda s: s * 1.0000001 + 1e-9)
    base = chain_time(f_triv, jnp.float32(1.0))
    print(f"trivial chain (BASELINE overhead): {base:.2f} ms")

    # --- gathers (warp/align/trace access pattern), content = total-base ---
    flat1 = jnp.asarray(rng.random((H * W,)).astype(np.float32))
    for n in (32768, 262144, 2097152):
        idx = jnp.asarray(rng.integers(0, H * W - W - 2, n).astype(np.int32))
        f_bi = jax.jit(lambda s: (flat1[idx + (s * 0).astype(jnp.int32)] * 0.2
                                  + flat1[idx + 1] * 0.3
                                  + flat1[idx + W] * 0.25
                                  + flat1[idx + W + 1] * 0.25).sum())
        print(f"bilinear 4-tap n={n:>8}: {chain_time(f_bi, jnp.float32(0)):.2f}"
              f" ms (content ~{chain_time(f_bi, jnp.float32(0)) - base:.2f})")

    # --- while_loop per-iteration overhead ---
    def mk_loop(k):
        def body(c):
            i, v = c
            return i + 1, v * 1.0000001 + 1e-9
        return jax.jit(lambda v: jax.lax.while_loop(
            lambda c: c[0] < k, body, (jnp.int32(0), v))[1])
    for k in (10, 100, 1000):
        print(f"while_loop trivial k={k:<5}: "
              f"{chain_time(mk_loop(k), jnp.float32(1.0)):.2f} ms")

    # --- small dense solves (the BA/LM inner op) ---
    A0 = rng.standard_normal((52, 52)).astype(np.float32)
    A = jnp.asarray(A0 @ A0.T + 52 * np.eye(52, dtype=np.float32))
    b = jnp.asarray(rng.standard_normal(52).astype(np.float32))
    f_lu = jax.jit(lambda v: jnp.linalg.solve(A + jnp.diag(v * 1e-9), -b))
    print("lin.solve 52x52 chain:", chain_time(f_lu, jnp.zeros(52)), "ms")

    # --- pipeline stages at real shapes ---
    from sdv_loam_tpu.ops.pyramid import make_images

    def f_mi(z):
        dI, ag = make_images(z, 6)
        return dI[0][..., 0] * 1.0000001
    print("make_images chain    :", chain_time(f_mi, x), "ms")

    from sdv_loam_tpu.ops import lidar as L
    buf = jnp.asarray((rng.standard_normal((65536, 3)) * 20
                       ).astype(np.float32))
    mask = jnp.ones(65536, bool)
    Rcl = jnp.eye(3, dtype=jnp.float32)
    tcl = jnp.zeros(3, jnp.float32)

    def f_pp(z):
        o = L.preprocess_scan(z, mask, Rcl, tcl, 718.9, 718.9, 600.0, 180.0,
                              W, H)
        return z + o["depth_map"].sum() * 1e-12
    print("preprocess_scan chain:", chain_time(f_pp, buf), "ms")


if __name__ == "__main__":
    main()
