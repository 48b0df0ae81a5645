"""sdv_loam_tpu — TPU-native LiDAR-assisted semi-direct visual odometry.

A brand-new JAX/XLA/Pallas framework with the capabilities of the SDV-LOAM
vision module (reference: ZikangYuan/SDV-LOAM, a C++/ROS DSO derivative).
The pipeline is re-architected TPU-first: fixed-shape point pools with
validity masks, batched/fused kernels for the hot loops, host-side control
with device-side math, and `jax.sharding.Mesh` data parallelism for running
many sequences at once.

Package layout (see SURVEY.md §7):
  config        typed settings (reference: src/util/settings.{h,cpp})
  utils/        SE3 Lie ops, pyramid camera calib, interpolation
  data/         calib/sensor parsers, KITTI reader, synthetic sequences
  ops/          jitted/Pallas compute kernels (lidar, pyramid, select, warp,
                align, trace, photometric GN, BA Hessian assembly)
  models/       composed stages: tracker, matcher, backend, initializer
  parallel/     device-mesh sharding of batched sequences
  system/       FullSystem-equivalent orchestrator + window state
  io/           KITTI trajectory writer, telemetry
  eval/         ATE / RPE evaluation
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Geometry / normal-equation math must run in true float32: TPU matmuls
# default to bfloat16 passes, which destroys pose-composition and Jacobian
# accuracy (the reference solves in double, EnergyFunctional.cpp:659).
# Every matmul in this framework is small, so 'highest' costs nothing.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent XLA compilation cache: the large fused programs (notably the
# single-program BA LM loop) take minutes to compile over the remote-TPU
# tunnel; cache them across processes. CPU runs (tests, verify gates) get a
# SEPARATE cache directory: XLA:CPU caches AOT machine code keyed without
# the exact microarch, and loading an entry compiled with mismatched CPU
# features (the cpu_aot_loader warnings) can SIGILL/segfault — observed
# 2026-08-18 as a hard segfault in compilation_cache.get_executable_and_time
# when CPU and TPU runs shared one directory across hosts. The CPU cache is
# additionally keyed by a fingerprint of this host's CPU model+flags so a
# cache directory carried across machines (the driver runs on varying
# hosts) never feeds mismatched AOT code to the loader.


def _cpu_fingerprint():
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            txt = f.read()
        lines = sorted({ln for ln in txt.splitlines()
                        if ln.startswith(("model name", "flags"))})
        return hashlib.sha1("\n".join(lines).encode()).hexdigest()[:10]
    except OSError:
        import platform
        return platform.machine()


try:
    _cache = _os.environ.get("JAX_COMPILATION_CACHE_DIR",
                             _os.path.expanduser("~/.cache/jax_comp_cache"))
    if "cpu" in str(_jax.config.jax_platforms or ""):
        _cache = _cache + "_cpu_" + _cpu_fingerprint()
    _os.makedirs(_cache, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # cache is an optimization only
    pass

from sdv_loam_tpu.config import Settings  # noqa: F401
