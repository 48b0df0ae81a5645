"""Measure the tunnel-link economics that bound per-frame wall-clock:

  1. host->device upload cost of one frame's arrays (f32 vs uint8 image),
  2. device_get round-trip cost of a small control pytree,
  3. whether a device_get of an ALREADY-COMPLETE result waits behind
     later-enqueued (unrelated) device work — relay queue serialization,
  4. streamed execution time of the production per-frame program chain
     (make_images -> track_frame_step) for comparison.

Usage: python tools/link_bench.py   (TPU via axon)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

W, H = 1200, 360
REPS = 10


def t(label, fn, reps=REPS):
    fn()  # warm
    t0 = time.time()
    for _ in range(reps):
        fn()
    dt = (time.time() - t0) / reps * 1000
    print(f"{label:44s} {dt:8.1f} ms", flush=True)
    return dt


img_f32 = np.random.rand(H, W, 1).astype(np.float32) * 255.0
img_u8 = img_f32.astype(np.uint8)
cloud = np.random.rand(65536, 4).astype(np.float32) * 50.0

# 1. upload costs (block so we time the actual transfer)
t("upload image f32 (5.2 MB)",
  lambda: jax.block_until_ready(jax.device_put(img_f32)))
t("upload image uint8 (1.3 MB)",
  lambda: jax.block_until_ready(jax.device_put(img_u8)))
t("upload cloud f32 (1.0 MB)",
  lambda: jax.block_until_ready(jax.device_put(cloud)))
t("upload img f32 + cloud (one device_put)",
  lambda: jax.block_until_ready(jax.device_put((img_f32, cloud))))

# 2. pull cost of a small pytree
small = jax.device_put({"T": np.eye(4, dtype=np.float32),
                        "flow": np.zeros(3, np.float32),
                        "matched": np.zeros(4096, bool),
                        "px": np.zeros((4096, 2), np.float32)})
jax.block_until_ready(small)
t("device_get small control pytree", lambda: jax.device_get(small))

# 3. does a pull of a COMPLETE result wait behind later-enqueued work?
@jax.jit
def heavy(x):
    # ~50 ms of device work: chained big matmuls
    for _ in range(24):
        x = jnp.tanh(x @ x)
    return x


x0 = jax.device_put(np.random.rand(2048, 2048).astype(np.float32) * 0.01)
r = heavy(x0)
jax.block_until_ready(r)
t("heavy program streamed", lambda: jax.block_until_ready(heavy(x0)))

done = jax.device_put(np.zeros(8, np.float32))
jax.block_until_ready(done)


def pull_behind():
    h = heavy(x0)          # enqueue ~50 ms of work
    t0 = time.time()
    jax.device_get(done)   # pull an ALREADY-complete buffer
    dt = (time.time() - t0) * 1000
    jax.block_until_ready(h)
    return dt


ds = [pull_behind() for _ in range(REPS)]
print(f"{'pull complete buf behind heavy enqueue':44s} "
      f"{np.mean(ds):8.1f} ms  (vs idle pull above)", flush=True)

# 4. dispatch-only cost (async) of the pyramid program
from sdv_loam_tpu.ops.photometric import make_images
lv = 7
r = make_images(jnp.asarray(img_f32[..., 0]), lv)
jax.block_until_ready(r)


def pyr_stream():
    out = make_images(jnp.asarray(img_f32[..., 0]), lv)
    jax.block_until_ready(out)


t("upload f32 + make_images + block", pyr_stream)
