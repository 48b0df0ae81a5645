"""TPU primitive microbenchmarks over the axon tunnel.

Times the building blocks that dominate the odometry frame loop so
optimization effort lands where the milliseconds are:
  * host->device upload (image-sized, cloud-sized)
  * dispatch+device latency of a trivial program and of each pipeline stage
  * gather-heavy ops (the XLA pattern the warp/align/trace stages use)
  * vmap x B scaling of the same ops (latency- vs throughput-bound test)

Usage: python tools/microbench.py
"""

import time

import numpy as np


def timeit(fn, n=5, warm=2):
    for _ in range(warm):
        fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return 1000 * float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend())
    H, W = 360, 1200
    img = np.random.default_rng(0).random((H, W)).astype(np.float32)
    cloud = np.random.default_rng(1).standard_normal((131072, 3)).astype(
        np.float32)

    # --- upload / download / dispatch latency ---
    print("upload img  1.7MB :",
          timeit(lambda: jax.block_until_ready(jnp.asarray(img))), "ms")
    print("upload cloud 1.5MB:",
          timeit(lambda: jax.block_until_ready(jnp.asarray(cloud))), "ms")
    x = jax.block_until_ready(jnp.asarray(img))
    tiny = jax.jit(lambda a: a.sum())
    print("tiny dispatch+blk :", timeit(lambda: jax.block_until_ready(tiny(x))),
          "ms")
    print("pull 52 floats    :",
          timeit(lambda: jax.device_get(x[0, :52])), "ms")
    big = jax.block_until_ready(jnp.zeros((4096, 8, 2)))
    print("pull 4096x8x2     :", timeit(lambda: jax.device_get(big)), "ms")

    # --- gather microbench: N bilinear-ish gathers from an image ---
    def gather_prog(im, idx):
        return im.reshape(-1)[idx].sum()

    g = jax.jit(gather_prog)
    for n in (32768, 262144, 2097152):
        idx = jax.block_until_ready(
            jnp.asarray(np.random.randint(0, H * W, n, dtype=np.int32)))
        print(f"gather {n:>8}      :",
              timeit(lambda: jax.block_until_ready(g(x, idx))), "ms")

    # --- while_loop iteration overhead ---
    def loop_prog(a, k):
        def body(c):
            i, v = c
            return i + 1, v * 1.0001 + a[0, 0]
        return jax.lax.while_loop(lambda c: c[0] < k, body,
                                  (jnp.int32(0), jnp.float32(0)))[1]

    lp = jax.jit(loop_prog, static_argnames=("k",))
    for k in (10, 100, 1000):
        print(f"while_loop k={k:<5}  :",
              timeit(lambda: jax.block_until_ready(lp(x, k))), "ms")

    # --- vmap scaling of a gather-heavy body ---
    def body(im, idx):
        v = im.reshape(-1)[idx]
        return v.sum()

    idx1 = jax.block_until_ready(
        jnp.asarray(np.random.randint(0, H * W, 262144, dtype=np.int32)))
    one = jax.jit(lambda im, i: body(im, i))
    print("gather262k x1     :",
          timeit(lambda: jax.block_until_ready(one(x, idx1))), "ms")
    for B in (8,):
        imB = jax.block_until_ready(jnp.broadcast_to(x, (B, H, W)) + 0.0)
        idxB = jax.block_until_ready(jnp.broadcast_to(idx1, (B, 262144)) + 0)
        vm = jax.jit(jax.vmap(body))
        print(f"gather262k x{B} vmap:",
              timeit(lambda: jax.block_until_ready(vm(imB, idxB))), "ms")

    # --- the actual pipeline stages, isolated (warm shapes) ---
    from sdv_loam_tpu.ops.pyramid import make_images
    mi = lambda: jax.block_until_ready(make_images(jnp.asarray(img), 6))
    print("make_images(warm) :", timeit(mi), "ms")

    # 8x8-patch bilinear matcher-style gather: 4096 patches x 64 px
    from sdv_loam_tpu.ops.align import _flat_bilinear
    flat = jax.block_until_ready(jnp.zeros((H * W, 3)))
    base = jnp.zeros((4096, 1), jnp.int32)
    wv = jnp.full((4096, 1), W, jnp.int32)
    us = jnp.asarray(np.random.uniform(2, W - 3, (4096, 64)).astype(np.float32))
    vs = jnp.asarray(np.random.uniform(2, H - 3, (4096, 64)).astype(np.float32))
    fb = jax.jit(lambda f, b, w_, u, v: _flat_bilinear(f, b, w_, u, v)[0].sum())
    print("patch-gather 4096x64:",
          timeit(lambda: jax.block_until_ready(fb(flat, base, wv, us, vs))),
          "ms")


if __name__ == "__main__":
    main()
