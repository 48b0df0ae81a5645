"""Multi-chip dry-run of the PRODUCTION pipeline programs.

The round-2 dry-run validated sharding over a reduced toy step
(parallel/mesh._single_step); this module runs the REAL fused programs —
`ops.lidar.preprocess_scan`, `ops.frame_step.track_frame_step`,
`system.kf_ops.kf_opt_step` — over an n-device `jax.sharding.Mesh`, one
sequence per device (the framework's data-parallel axis, SURVEY.md §2.6).

Strategy: run a tiny single-sequence FullSystem on the synthetic scene,
RECORDING the exact argument pytrees each production program was called
with (the only guaranteed-valid way to produce production-shaped inputs:
the window state, pools, matcher grids and flags are all interdependent).
Then tile each recorded call across a leading batch axis, shard it over the
mesh, and execute the vmapped program — multiple frame and keyframe cycles,
asserting finite poses and multi-device shard placement.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def record_production_calls(n_frames: int = 8, w: int = 320, h: int = 96):
    """Run a tiny FullSystem, capturing (args, kwargs) of every call to the
    three production device programs. Returns dict of call lists; array
    leaves are pulled to host numpy."""
    from sdv_loam_tpu.data.synthetic import make_sequence
    from sdv_loam_tpu.system.full_system import FullSystem
    from sdv_loam_tpu.ops import frame_step as fs_mod
    from sdv_loam_tpu.system import kf_ops as kf_mod
    from sdv_loam_tpu.ops import lidar as lidar_mod

    rec = {"track": [], "kf": [], "lidar": []}

    def _wrap(name, orig):
        def f(*a, **k):
            rec[name].append((jax.tree.map(np.asarray, a), dict(k)))
            return orig(*a, **k)
        return f

    origs = (fs_mod.track_frame_step, kf_mod.kf_opt_step,
             lidar_mod.preprocess_scan)
    fs_mod.track_frame_step = _wrap("track", origs[0])
    kf_mod.kf_opt_step = _wrap("kf", origs[1])
    lidar_mod.preprocess_scan = _wrap("lidar", origs[2])
    try:
        seq = make_sequence(n_frames=n_frames, w=w, h=h)
        system = FullSystem(seq.calib, seq.sensor)
        for i in range(n_frames):
            img, cloud, ts = seq.get(i)
            system.add_active_frame(img, cloud, ts)
        assert not system.is_lost, "recording run lost tracking"
    finally:
        fs_mod.track_frame_step = origs[0]
        kf_mod.kf_opt_step = origs[1]
        lidar_mod.preprocess_scan = origs[2]
    assert len(rec["track"]) >= 2 and len(rec["kf"]) >= 2, (
        f"recording produced too few calls: "
        f"{ {k: len(v) for k, v in rec.items()} }")
    return rec


def _tile(args, B: int):
    """Stack every leaf B times along a new leading batch axis."""
    return jax.tree.map(lambda x: np.stack([np.asarray(x)] * B), args)


def run_batched_call(fn, args, kwargs, mesh: Mesh, B: int):
    """vmap `fn` over a leading batch axis, shard inputs over the mesh's
    `batch` axis, execute, and return (host outputs, out shardings)."""
    sharding = NamedSharding(mesh, P("batch"))
    batched = _tile(args, B)
    batched = jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), sharding),
                           batched)

    def call(*a):
        return fn(*a, **kwargs)

    out = jax.jit(jax.vmap(call))(*batched)
    jax.block_until_ready(out)
    shardings = jax.tree.map(lambda x: x.sharding, out)
    return jax.tree.map(np.asarray, out), shardings


def dryrun_fleet_batch(n_lanes: int, verbose: bool = True):
    """Drive the PRODUCTION fleet-batched programs (`kf_opt_step_batch`,
    `track_frame_step_batch`, `activate_full_batch`, `trace_points_batch`,
    `select_compact_batch`, `preprocess_scan_batch`, `make_images_batch`)
    through a real `MultiSystem` run with n_lanes tiny sequences.

    VERDICT r3 item 6: the fleet `*_batch` variants ran nowhere except the
    TPU bench that crashed, so sharding/shape regressions in them were
    invisible to every gate. This exercises each with real interdependent
    state (window stacks, pools, matcher grids) exactly as the fleet driver
    stages them, and asserts every batch program actually fired."""
    from sdv_loam_tpu.data.synthetic import make_sequence
    from sdv_loam_tpu.system.full_system import FullSystem
    from sdv_loam_tpu.system.multi import MultiSystem
    from sdv_loam_tpu.ops import frame_step as fs_mod
    from sdv_loam_tpu.system import kf_ops as kf_mod

    hits = {"track_batch": 0, "kf_batch": 0}

    def _count(name, orig):
        def f(*a, **k):
            hits[name] += 1
            return orig(*a, **k)
        return f

    origs = (fs_mod.track_frame_step_batch, kf_mod.kf_opt_step_batch)
    fs_mod.track_frame_step_batch = _count("track_batch", origs[0])
    kf_mod.kf_opt_step_batch = _count("kf_batch", origs[1])
    try:
        n_frames = 8
        seqs = [make_sequence(n_frames=n_frames, w=320, h=96,
                              yaw_rate=0.002 * (i - n_lanes // 2),
                              seed=11 + i)
                for i in range(n_lanes)]
        ms = MultiSystem([FullSystem(s.calib, s.sensor) for s in seqs])
        for i in range(n_frames):
            ms.add_frames([s.get(i) for s in seqs])
    finally:
        fs_mod.track_frame_step_batch = origs[0]
        kf_mod.kf_opt_step_batch = origs[1]
    assert not ms.any_lost, "fleet dryrun lost tracking"
    assert hits["track_batch"] >= n_frames - 2, hits
    assert hits["kf_batch"] >= 2, hits
    errs = [float(np.linalg.norm(f.get_trajectory()[-1][:3, 3]
                                 - s.poses_wc[n_frames - 1][:3, 3]))
            for f, s in zip(ms.systems, seqs)]
    assert max(errs) < 0.5, errs
    if verbose:
        print(f"dryrun_fleet_batch: OK with {n_lanes} lanes; "
              f"batch-program hits={hits}; endpoint errs={np.round(errs, 4)}",
              flush=True)
    return hits


def dryrun_pinned_fleet(n_devices: int, verbose: bool = True):
    """Run the PRODUCTION fleet driver (`system.multi.InterleavedFleet`)
    with one FullSystem pinned per device (`FullSystem(device=...)`) and
    assert each lane's programs actually executed on its own device
    (VERDICT r4 item 6: make multi-chip real, not just dryrun-validated).

    Placement is checked on each system's device-RESIDENT state after the
    run — the per-slot pyramids and the track-constant mirror are produced
    by that system's device programs, so their placement proves where the
    programs ran.

    Cost control: jit executables are compiled PER DEVICE ASSIGNMENT, so a
    pinned lane on a new device cannot reuse any compile from the other
    dryrun stages (measured: 8 pinned lanes of the full-size programs
    > 15 min on the virtual-CPU mesh — would blow the driver-gate budget).
    Two lanes on two distinct devices prove the placement mechanism through
    the identical driver path. Default Settings + the 320x96 scene are
    deliberate: the device-0 lane then shares every in-process jit cache
    with the earlier dryrun stages, so only the device-1 executables
    compile fresh (measured ~2.5 min for a 2-lane cold process vs >15 min
    for 8 pinned lanes)."""
    from sdv_loam_tpu.data.synthetic import make_sequence
    from sdv_loam_tpu.system.full_system import FullSystem
    from sdv_loam_tpu.system.multi import InterleavedFleet

    n_lanes = min(n_devices, 2)
    devices = jax.devices()[:n_lanes]
    assert len(devices) == n_lanes
    n_frames = 6
    seqs = [make_sequence(n_frames=n_frames, w=320, h=96,
                          yaw_rate=0.002 * (i - n_lanes // 2), seed=11 + i)
            for i in range(n_lanes)]
    fleet = InterleavedFleet(
        [FullSystem(s.calib, s.sensor, device=d)
         for s, d in zip(seqs, devices)])
    for i in range(n_frames):
        fleet.add_frames([s.get(i) for s in seqs])
    fleet.flush()
    assert not fleet.any_lost, "pinned fleet lost tracking"

    for fs, dev in zip(fleet.systems, devices):
        placed = set()
        for leaf in jax.tree.leaves(
                [p for p in fs.pyr_slots if p is not None]) + \
                jax.tree.leaves(fs.dI0_stack):
            placed |= getattr(leaf, "devices", lambda: set())()
        assert placed == {dev}, (
            f"system pinned to {dev} has state on {placed}")
    errs = [float(np.linalg.norm(f.get_trajectory()[-1][:3, 3]
                                 - s.poses_wc[n_frames - 1][:3, 3]))
            for f, s in zip(fleet.systems, seqs)]
    assert max(errs) < 0.5, errs
    if verbose:
        print(f"dryrun_pinned_fleet: OK — {n_lanes} sequences on "
              f"{n_lanes} distinct devices; endpoint errs="
              f"{np.round(errs, 4)}", flush=True)


def dryrun_production(n_devices: int, verbose: bool = True):
    """≥2 full frame + keyframe cycles of the production programs on an
    n-device mesh (one virtual sequence per device)."""
    from sdv_loam_tpu.ops import frame_step as fs_mod
    from sdv_loam_tpu.system import kf_ops as kf_mod
    from sdv_loam_tpu.ops import lidar as lidar_mod

    devices = jax.devices()[:n_devices]
    assert len(devices) == n_devices, (
        f"need {n_devices} devices, have {len(jax.devices())}")
    mesh = Mesh(np.array(devices), axis_names=("batch",))

    rec = record_production_calls()
    if verbose:
        print(f"recorded calls: { {k: len(v) for k, v in rec.items()} }",
              flush=True)

    def check_devices(shardings):
        devs = set()
        for s in jax.tree.leaves(shardings,
                                 is_leaf=lambda x: hasattr(x, "device_set")):
            devs |= set(s.device_set)
        return devs

    # two LiDAR preprocess cycles (w, h are positional statics: bind them)
    for a, k in rec["lidar"][-2:]:
        w_, h_ = int(a[-2]), int(a[-1])

        def scan_fn(*aa, _w=w_, _h=h_):
            return lidar_mod.preprocess_scan(*aa, _w, _h)

        out, sh = run_batched_call(scan_fn, a[:-2], k, mesh, n_devices)
        assert np.isfinite(out["depth_map"]).all()
        assert len(check_devices(sh)) == n_devices
    # two tracking cycles (early-window and steady-state calls)
    for a, k in (rec["track"][1], rec["track"][-1]):
        out, sh = run_batched_call(fs_mod.track_frame_step, a, k, mesh,
                                   n_devices)
        assert np.isfinite(out["T_wc"]).all(), "non-finite tracked pose"
        assert out["T_wc"].shape[0] == n_devices
        assert len(check_devices(sh)) == n_devices
    # two keyframe cycles (matcher refresh + windowed BA + marginalization)
    energies = []
    for a, k in (rec["kf"][1], rec["kf"][-1]):
        out, sh = run_batched_call(kf_mod.kf_opt_step, a, k, mesh, n_devices)
        assert np.isfinite(out["energy"]).all(), "non-finite BA energy"
        assert np.isfinite(out["eps"]).all() and np.isfinite(out["HM"]).all()
        assert len(check_devices(sh)) == n_devices
        energies.append(np.asarray(out["energy"]))
    if verbose:
        print(f"dryrun_production: OK on {n_devices} devices; "
              f"kf energies per device = {energies[-1]}", flush=True)
    return energies
