"""FullSystem — the odometry orchestrator.

Reference: src/FullSystem/FullSystem.cpp (+ FullSystemOptimize/Marginalize/
OptPoint). Host-side control flow (keyframe policy, window bookkeeping,
pool lifecycle) drives device-side batched kernels:

  frame step (addActiveFrame, FullSystem.cpp:822-900):
    LiDAR preprocess -> pyramid -> [init | track ladder + struct pose]
    -> KF decision -> makeKeyFrame / makeNonKeyFrame
  keyframe (makeKeyFrame, FullSystem.cpp:1040-1174):
    trace -> flag marg -> insert frame -> new traces (LiDAR+mono selection)
    -> add residuals -> activate points -> matcher refresh -> windowed BA
    -> remove outliers -> new tracking ref -> point/frame marginalization

TPU-native state: fixed-capacity pools with host-side numpy masks for
control and device arrays for compute; the window is a fixed F=8 slot array
with an occupancy mask (SURVEY.md §7).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from sdv_loam_tpu.config import Settings
from sdv_loam_tpu.data.calib import SensorCalib
from sdv_loam_tpu.models import backend
from sdv_loam_tpu.ops import lidar as lidar_ops
from sdv_loam_tpu.ops import trace as trace_ops
from sdv_loam_tpu.ops.align import flatten_pyramid
from sdv_loam_tpu.ops.photometric import build_track_ref, splat_idepth
from sdv_loam_tpu.ops.pyramid import make_images
from sdv_loam_tpu.ops.select import make_maps_compact_steps

from sdv_loam_tpu.utils import se3
from sdv_loam_tpu.utils.camera import PyramidCalib

# point-type codes
CORNER = 0
EDGELET = 1


@jax.jit
def _set_slot_stacks(dI0_stack, flat_stack, slot, dI0, flat0):
    """Per-KF window-stack slot updates fused into one device program."""
    return dI0_stack.at[slot].set(dI0), flat_stack.at[slot].set(flat0)


@jax.jit
def _window_track_consts(eps, T_cw_fej, ref_slot, ref_aff, aff, exposure, K0,
                         slot_used):
    """Per-KF-constant tracking args built ON DEVICE from the kf_opt
    output chain (deferred-readback mode): the next frame's track program
    then consumes the post-BA window poses without the host ever pulling
    them — the one consumer that otherwise forces a blocking kf_opt
    readback before the next frame can track."""
    T_cw = se3.se3_exp(eps.astype(jnp.float32)) @ T_cw_fej
    T_wc = jnp.linalg.inv(T_cw)
    return dict(ref_aff=ref_aff,
                inf5=jnp.full((5,), jnp.inf, jnp.float32),
                ref_T_wc=T_wc[ref_slot],
                T_wc_stack=T_wc.astype(jnp.float32),
                aff=aff, exposure=exposure, K0=K0,
                slot_used=jnp.asarray(slot_used))


def _joint_select_rounds(gens):
    """Drive several `make_maps_compact_steps` generators with each round's
    pulls batched: their first rounds dispatch back-to-back and share ONE
    device_get ("dispatch_select_pair") instead of paying a ~40 ms tunnel
    round trip each. Rare follow-up rounds (density-feedback retries)
    resolve individually. Returns the list of (out, keep) results."""
    results = [None] * len(gens)
    live = {i: g for i, g in enumerate(gens)}
    reqs = {}
    for i, g in list(live.items()):
        try:
            reqs[i] = g.send(None)
        except StopIteration as stop:   # pragma: no cover (never 0-round)
            results[i] = stop.value
            live.pop(i)
    while live:
        ids = sorted(reqs)
        if len(ids) >= 2:
            pulled_tuple = yield ("dispatch_select_pair",
                                  tuple(reqs[i] for i in ids), {})
            pulled = dict(zip(ids, pulled_tuple))
        else:
            (i,) = ids
            pulled = {i: (yield reqs[i])}
        reqs = {}
        for i, p in pulled.items():
            try:
                reqs[i] = live[i].send(p)
            except StopIteration as stop:
                results[i] = stop.value
                live.pop(i)
    return results


def _rotation_ladder(rot_delta=0.02):
    """The 26 unit-quaternion rotation perturbations of trackNewCoarse
    (FullSystem.cpp:341-398)."""
    out = []
    d = rot_delta
    combos = [(d, 0, 0), (0, d, 0), (0, 0, d), (-d, 0, 0), (0, -d, 0),
              (0, 0, -d), (d, d, 0), (0, d, d), (d, 0, d), (-d, d, 0),
              (0, -d, d), (-d, 0, d), (d, -d, 0), (0, d, -d), (d, 0, -d),
              (-d, -d, 0), (0, -d, -d), (-d, 0, -d), (-d, -d, -d),
              (-d, -d, d), (-d, d, -d), (-d, d, d), (d, -d, -d), (d, -d, d),
              (d, d, -d), (d, d, d)]
    for (x, y, z) in combos:
        q = np.array([1.0, x, y, z])
        q = q / np.linalg.norm(q)
        w, xi, yi, zi = q
        R = np.array([
            [1 - 2 * (yi * yi + zi * zi), 2 * (xi * yi - zi * w), 2 * (xi * zi + yi * w)],
            [2 * (xi * yi + zi * w), 1 - 2 * (xi * xi + zi * zi), 2 * (yi * zi - xi * w)],
            [2 * (xi * zi - yi * w), 2 * (yi * zi + xi * w), 1 - 2 * (xi * xi + yi * yi)]])
        T = np.eye(4)
        T[:3, :3] = R
        out.append(T)
    return out


class FullSystem:
    """The complete LiDAR-assisted semi-direct visual odometry system."""

    def __init__(self, calib: PyramidCalib, sensor: SensorCalib,
                 settings: Settings | None = None, observers=None,
                 telemetry=None, device=None):
        self.calib = calib
        self.sensor = sensor
        self.s = settings or Settings()
        self.observers = list(observers or [])
        from sdv_loam_tpu.io.telemetry import Telemetry
        self.telemetry = telemetry or Telemetry()
        # `device`: pin every upload / eager op / jit dispatch of this
        # system to one jax device (fleet mode: one sequence per chip —
        # the reference's one-process-per-sequence analog, SURVEY.md §2.6).
        # None = backend default (single-chip behavior unchanged).
        self.device = device
        s = self.s

        self.w = calib.w[0]
        self.h = calib.h[0]
        self.levels = calib.levels
        self.K0 = np.array(calib.intrinsics_vec(0), np.float32)
        with self._on_device():
            self.Ks = tuple(jnp.asarray(
                [calib.fx[l], calib.fy[l], calib.cx[l], calib.cy[l]],
                jnp.float32) for l in range(self.levels))

        self.F = s.n_frames_cap
        self.N = s.n_active_cap
        self.M = s.n_immature_cap
        F, N, M = self.F, self.N, self.M
        D = 4 + 6 * F

        # --- frame slots ---
        self.slot_used = np.zeros(F, bool)
        self.order: list[int] = []            # slots oldest -> newest
        self.T_cw_fej = np.tile(np.eye(4), (F, 1, 1))
        self.eps = np.zeros((F, 6))
        self.aff = np.zeros((F, 2), np.float32)
        self.exposure = np.ones(F, np.float32)
        self.fe_th = np.full(F, 12.0 * 12.0 * 8.0, np.float32)
        self.frame_prior = np.zeros((F, 6), np.float32)
        self.frame_kf_id = np.full(F, -1, np.int64)
        self.frame_shell_idx = np.full(F, -1, np.int64)
        self.slot_flagged = np.zeros(F, bool)
        self.slot_stats_out = np.zeros(F, np.int64)  # marginalized+dropped pts
        with self._on_device():
            self.dI0_stack = jnp.zeros((F, self.h, self.w, 3), jnp.float32)
        self.pyr_slots: list = [None] * F     # per-slot pyramid tuples
        self.flat_slots: list = [None] * F    # per-slot flattened pyramids

        # --- active point pool ---
        self.pt_valid = np.zeros(N, bool)
        self.pt = dict(
            u=np.zeros(N, np.float32), v=np.zeros(N, np.float32),
            idepth=np.zeros(N, np.float32), host=np.zeros(N, np.int32),
            color=np.zeros((N, 8), np.float32),
            weights=np.zeros((N, 8), np.float32),
            is_sensor=np.zeros(N, bool), type=np.zeros(N, np.int32),
            prior=np.zeros(N, np.float32), quality=np.zeros(N, np.float32),
            idepth_hessian=np.zeros(N, np.float32),
            num_good_res=np.zeros(N, np.int64),
        )
        self.res_active = np.zeros((N, F), bool)
        self.res_state = np.zeros((N, F), np.int8)
        self.res_is_new = np.zeros((N, F), bool)
        self.matcher_px = np.zeros((N, F, 2), np.float32)
        self.matcher_valid = np.zeros((N, F), bool)
        self.centers = np.zeros((N, F, 3), np.float32)

        # --- immature point pool ---
        self.im_valid = np.zeros(M, bool)
        self.im = dict(
            u=np.zeros(M, np.float32), v=np.zeros(M, np.float32),
            idepth_min=np.zeros(M, np.float32),
            idepth_max=np.full(M, np.inf, np.float32),
            host=np.zeros(M, np.int32),
            status=np.full(M, trace_ops.IPS_UNINITIALIZED, np.int32),
            quality=np.full(M, 10000.0, np.float32),
            color=np.zeros((M, 8), np.float32),
            weights=np.zeros((M, 8), np.float32),
            gradH=np.zeros((M, 3), np.float32),
            energy_th=np.full(M, 8 * 144.0, np.float32),
            is_sensor=np.zeros(M, bool),
            pixel_interval=np.zeros(M, np.float32),
            my_type=np.ones(M, np.float32),
            type=np.zeros(M, np.int32),
            grad_center=np.zeros(M, np.float32),
        )

        # --- marginalization prior ---
        self.HM = np.zeros((D, D))
        self.bM = np.zeros(D)

        # --- shells (per input frame) ---
        self.shells: list[dict] = []
        self.kf_shells: list[int] = []        # indices into self.shells

        # tracker state
        self.track_ref = None                 # build_track_ref pools
        self.track_ref_slot = -1
        self.track_ref_aff = np.zeros(2, np.float32)
        self.first_coarse_rmse = -1.0
        self.last_coarse_rmse = np.full(5, 100.0)
        self.current_min_act_dist = 2.0
        self.pot_state = {"pot": 3}
        # SEPARATE pot feedback for the mono-supplement pass: its density
        # target differs ~3x from the LiDAR pass's, so a SHARED state made
        # the two passes hunt from each other's pot every keyframe
        # (measured: pot 4 <-> 12 oscillation, 2 cascade rounds per call,
        # and a fresh select-program compile whenever the hunt crossed a
        # new pot value). The reference has one currentPotential but also
        # only one selection pass per keyframe.
        self.pot_state_mono = {"pot": 3}
        self.ignore_kf = False

        self._im_pool = None           # device-resident immature pool
        self._trace_fresh = False      # pool holds unsynced trace output
        self._pt_dev = None            # device cache of track-step pool args
        self._kf_dev = None            # device-resident active pool mirror
        self._centers_dev = None       # device-resident residual centers
        self._flat_stack = None        # (F, T, 3) flattened window pyramids
        self.track_iters_hist: list = []   # per-frame LM-iteration counts
        self._track_step_hist: list = []   # accepted per-frame step lengths
        self.kf_decision_hist: list = []   # (wsum, rms_flow_t, rms_flow_rt,
        #                                     need) per tracked frame
        self.flag_hist: list = []   # (age_kfs, criterion, n_in, n_out) per
        #                             marginalization flag
        self._pending = None               # pipelined-mode in-flight frame
        self._deferred_kf = None           # deferred kf_opt control readback
        # SDV_SYNC_STAGES=1: block after each device dispatch so the
        # telemetry stage table separates device+dispatch time (stage host_s)
        # from pure link time (sync_s) — profiling only, serializes pipeline
        import os as _os
        self._block = jax.block_until_ready \
            if _os.environ.get("SDV_SYNC_STAGES") else (lambda x: x)
        self.initialized = False
        self.is_lost = False
        self.init_failed = False
        self._mono = None          # camera-only bootstrap (ops/mono_init)
        self._first_frame = None
        self._rng_key = jax.random.PRNGKey(s.seed)

        self._lidar_cap = s.n_lidar_cand_cap * 8  # raw cloud capacity

    # ------------------------------------------------------------------
    # helpers
    # ------------------------------------------------------------------

    def _next_key(self):
        self._rng_key, k = jax.random.split(self._rng_key)
        return k

    @property
    def T_cw(self) -> np.ndarray:
        """(F, 4, 4) current worldToCam per slot: exp(eps) * T_fej.

        Pure NumPy — this is hot host-side control math and a device
        round-trip here costs ~0.4 s over the remote-TPU link."""
        return se3.se3_exp_np(self.eps) @ self.T_cw_fej

    def _bucket_cloud(self, cloud: np.ndarray, cap: int | None = None):
        """Pad a raw cloud to a capacity bucket (each bucket is one
        compiled program). `cap` overrides the per-cloud bucket choice —
        the fleet driver forces one shared bucket across B sequences so
        their scans batch into a single vmapped program."""
        if cap is None:
            cap = self._lidar_cap
            for b in (self._lidar_cap // 4, self._lidar_cap // 2):
                if cloud.shape[0] <= b:
                    cap = b
                    break
        buf = np.zeros((cap, 3), np.float32)
        n = min(cloud.shape[0], cap)
        buf[:n] = cloud[:n]
        mask = np.zeros(cap, bool)
        mask[:n] = True
        return buf, mask, cap

    def _lidar_args(self, buf, mask):
        # numpy-typed on purpose: jit transfers them at dispatch; eager
        # jnp wrapping here would cost one tiny device program per scalar
        return (buf, mask,
                np.asarray(self.sensor.R_cl, np.float32),
                np.asarray(self.sensor.t_cl, np.float32),
                np.float32(self.K0[0]), np.float32(self.K0[1]),
                np.float32(self.K0[2]), np.float32(self.K0[3]))

    def _preprocess(self, cloud: np.ndarray):
        buf, mask, _ = self._bucket_cloud(cloud)
        return self._block(lidar_ops.preprocess_scan(
            *self._lidar_args(buf, mask), self.w, self.h))

    def _free_pt_rows(self, n):
        free = np.nonzero(~self.pt_valid)[0]
        return free[:n]

    def _free_im_rows(self, n):
        free = np.nonzero(~self.im_valid)[0]
        return free[:n]

    def _pair_transforms(self):
        """(F*F) host->target R/t/affine for used slot pairs
        (FrameFramePrecalc::set equivalents for the activation GN)."""
        T_cw_f = self.T_cw
        F = self.F
        R_pair = np.tile(np.eye(3, dtype=np.float32), (F * F, 1, 1))
        t_pair = np.zeros((F * F, 3), np.float32)
        aff_pair = np.tile(np.array([1.0, 0.0], np.float32), (F * F, 1))
        for hslot in range(F):
            if not self.slot_used[hslot]:
                continue
            T_wc_h = np.linalg.inv(T_cw_f[hslot])
            for tslot in range(F):
                if not self.slot_used[tslot]:
                    continue
                p = hslot * F + tslot
                T_ht = T_cw_f[tslot] @ T_wc_h
                R_pair[p] = T_ht[:3, :3]
                t_pair[p] = T_ht[:3, 3]
                a = np.exp(self.aff[tslot][0] - self.aff[hslot][0])
                aff_pair[p] = [a, self.aff[tslot][1] - a * self.aff[hslot][1]]
        return R_pair, t_pair, aff_pair

    def _on_device(self):
        """Scope eager ops, uploads and jit dispatches to this system's
        pinned device (`device=` ctor arg). Uncommitted arrays follow
        `jax.default_device`, and jits with inputs committed to one device
        execute there — so scoping the entry points pins the whole
        system. No-op (null context) when unpinned."""
        if self.device is None:
            import contextlib
            return contextlib.nullcontext()
        return jax.default_device(self.device)

    @staticmethod
    def _pad_bucket(arrs, bucket=512):
        """Pad a list of equal-length arrays to the next bucket multiple so
        batched device calls hit a bounded set of compiled shapes."""
        n = arrs[0].shape[0]
        cap = max(bucket, -(-n // bucket) * bucket)
        out = []
        for a in arrs:
            b = np.zeros((cap,) + a.shape[1:], a.dtype)
            b[:n] = a
            out.append(b)
        return out, n

    def _kf_dev_pool(self):
        """Device-resident active-point pool for the fused KF programs.

        Built once from the host arrays, then chained: kf_opt_step outputs
        become the next KF's inputs and between-KF host mutations are
        mirrored by ONE kf_ops.commit_pool_kf dispatch — so none of the 18
        pool arrays is re-staged over the link per keyframe (VERDICT r3
        item 2: ~730 ms/KF of host-side arg staging)."""
        if self._kf_dev is None:
            self._kf_dev = dict(
                u=jnp.asarray(self.pt["u"]), v=jnp.asarray(self.pt["v"]),
                idepth=jnp.asarray(self.pt["idepth"]),
                host=jnp.asarray(self.pt["host"]),
                color=jnp.asarray(self.pt["color"]),
                weights=jnp.asarray(self.pt["weights"]),
                is_sensor=jnp.asarray(self.pt["is_sensor"]),
                prior=jnp.asarray(self.pt["prior"]),
                type=jnp.asarray(self.pt["type"]),
                quality=jnp.asarray(self.pt["quality"]),
                num_good_res=jnp.asarray(self.pt["num_good_res"]),
                idepth_hessian=jnp.asarray(self.pt["idepth_hessian"]),
                pt_valid=jnp.asarray(self.pt_valid),
                res_active=jnp.asarray(self.res_active),
                res_state=jnp.asarray(self.res_state),
                res_is_new=jnp.asarray(self.res_is_new),
                matcher_px=jnp.asarray(self.matcher_px),
                matcher_valid=jnp.asarray(self.matcher_valid))
        return self._kf_dev

    # ------------------------------------------------------------------
    # main entry (addActiveFrame)
    # ------------------------------------------------------------------

    def add_active_frame(self, image: np.ndarray, cloud: np.ndarray,
                         timestamp: float, exposure: float = 1.0):
        """Process one frame.

        Sequential mode (default, reference `linearizeOperation=true`
        parity): every device readback resolves immediately.

        Pipelined mode (`Settings.pipelined_frames`, the TPU analog of the
        reference's tracking/mapping thread overlap,
        FullSystem.cpp:902-1012): frame N's track program is left running
        on device when this call returns; frame N+1's host staging (image
        upload, pyramid/LiDAR dispatch) overlaps it, and N's pose readback
        + post-track work (trace, keyframe pipeline) happen at the START of
        processing N+1. Tracking still always uses the latest keyframe
        state — the deferral point is between staging and tracking — so
        the trajectory matches sequential mode up to dispatch-order
        numerics; only host/device overlap changes. `is_lost` and shell
        poses lag one frame; `flush()` (or `get_trajectory`) drains."""
        with self._on_device():
            return self._add_active_frame(image, cloud, timestamp, exposure)

    def _add_active_frame(self, image, cloud, timestamp, exposure=1.0):
        if not (self.s.pipelined_frames and self.initialized
                and not self.is_lost and len(self.shells) >= 2):
            self._drain_pending()
            self._pump(self.frame_steps(image, cloud, timestamp, exposure))
            return
        gen = self.frame_steps(image, cloud, timestamp, exposure)
        pulled = None
        while True:
            try:
                req = gen.send(pulled)
            except StopIteration:
                self._drain_pending()
                return
            if isinstance(req, dict) and "__stage_barrier__" in req:
                break
            pulled = self._resolve_sync(req)
        # this frame is staged (uploads + pyramid programs enqueued behind
        # the previous frame's still-running track program); now resolve
        # the previous frame completely — by the time its track result is
        # pulled the device has had a full frame of staging time
        self._drain_pending()
        if self.is_lost:
            # the drained frame lost tracking: this frame takes the lost
            # semantics (keep recording shells with the last pose)
            gen.close()
            self.shells[-1]["T_wc"] = self.shells[-2]["T_wc"].copy()
            self.telemetry.frame_done(False)
            return
        # resolve post-barrier stages (LiDAR preprocess) until the track
        # dispatch descriptor appears, launch it, and leave it in flight
        pulled = None
        while True:
            try:
                req = gen.send(pulled)
            except StopIteration:
                return
            if isinstance(req, tuple) and len(req) == 3 \
                    and req[0] == "dispatch_track":
                res = self._dispatch_request(req)
                # issue the D2H copies NOW: the transfer overlaps the next
                # frame's host staging, so the drain's device_get finds
                # host-local data (~0.2 ms) instead of paying the ~30 ms
                # blocking-pull round trip over the remote-TPU link
                # (measured, tools/link_bench2.py; device_get only issues
                # its own copy_to_host_async at pull time)
                for leaf in jax.tree.leaves(res):
                    if hasattr(leaf, "copy_to_host_async"):
                        leaf.copy_to_host_async()
                self._pending = (gen, res)
                return
            pulled = self._resolve_sync(req)

    def _dispatch_request(self, req):
        """Launch a dispatch-descriptor yield; pass plain pytrees through.

        Descriptors let the DRIVER own program launch: the sequential
        driver launches immediately, the pipelined driver launches and
        leaves the program in flight, and the fleet driver
        (system.multi.MultiSystem) folds B sequences' descriptors into one
        vmapped program. Returns ("__device__", pytree) for results the
        generator consumes device-resident (no readback)."""
        if isinstance(req, tuple) and len(req) == 3:
            if req[0] == "dispatch_track":
                from sdv_loam_tpu.ops.frame_step import track_frame_step
                return self._block(track_frame_step(*req[1], **req[2]))
            if req[0] == "dispatch_pyramid":
                return ("__device__", self._block(make_images(
                    jnp.asarray(req[1][0], jnp.float32), self.levels)))
            if req[0] == "dispatch_lidar":
                return ("__device__", self._preprocess(req[1][0]))
            if req[0] == "dispatch_kf_opt":
                from sdv_loam_tpu.system.kf_ops import kf_opt_step
                return ("__device__",
                        self._block(kf_opt_step(*req[1], **req[2])))
            if req[0] == "dispatch_activate":
                from sdv_loam_tpu.system.kf_ops import activate_full
                return ("__device__",
                        self._block(activate_full(*req[1], **req[2])))
            if req[0] == "dispatch_select":
                from sdv_loam_tpu.ops.select import select_compact
                return self._block(select_compact(*req[1], **req[2]))
            if req[0] == "dispatch_select_pair":
                # both selection passes of one keyframe, dispatched
                # back-to-back (async) and pulled in ONE device_get — the
                # two passes are independent, and each pull over the
                # tunnel costs a ~40 ms round trip
                from sdv_loam_tpu.ops.select import select_compact
                return tuple(self._block(select_compact(*r[1], **r[2]))
                             for r in req[1])
            if req[0] == "dispatch_trace":
                return ("__device__", self._block(
                    trace_ops.trace_points(*req[1], **req[2])))
        return req

    @staticmethod
    def _is_device_result(res):
        return isinstance(res, tuple) and len(res) == 2 \
            and res[0] == "__device__"

    def _resolve_sync(self, req):
        """Dispatch + readback (or device pass-through) of one yield."""
        res = self._dispatch_request(req)
        if self._is_device_result(res):
            return res[1]
        with self.telemetry.sync():
            return jax.device_get(res)

    def _pump(self, gen):
        """Drive a frame generator to completion, resolving every yield."""
        pulled = None
        while True:
            try:
                req = gen.send(pulled)
            except StopIteration:
                return
            pulled = self._resolve_sync(req)

    def _drain_pending(self):
        """Resolve the pipelined-mode pending frame (pose readback, trace,
        keyframe pipeline). Idempotent; no-op in sequential mode."""
        # a deferred kf_opt readback (from the keyframe processed in the
        # PREVIOUS drain) resolves first: its host mirrors must be fresh
        # before this drain's keyframe decision / tail can run
        self._resolve_deferred_kf()
        if self._pending is None:
            return
        gen, req = self._pending
        self._pending = None
        with self.telemetry.sync():
            pulled = jax.device_get(req)   # the in-flight track program
        while True:
            try:
                req = gen.send(pulled)
            except StopIteration:
                return
            pulled = self._resolve_sync(req)

    def flush(self):
        """Finish any pipelined in-flight frame (call at sequence end)."""
        with self._on_device():
            self._drain_pending()
            # the drained frame may itself have been a keyframe that
            # deferred its control readback — resolve it for final shells
            self._resolve_deferred_kf()

    def frame_steps(self, image: np.ndarray, cloud: np.ndarray,
                    timestamp: float, exposure: float = 1.0):
        """Generator form of addActiveFrame: yields a pytree of device
        values at every host-sync point and expects the pulled host values
        back via send(). A lockstep driver (system.multi.MultiSystem) runs
        B sequences' generators in phase and batches all their pulls into
        one device_get per stage — the framework's data-parallel scaling
        axis."""
        if self.is_lost:
            # keep recording shells with the last pose so the trajectory
            # stays dense (reference stops processing, FullSystem.cpp:824)
            last = self.shells[-1]["T_wc"] if self.shells else np.eye(4)
            self.shells.append(dict(id=len(self.shells), timestamp=timestamp,
                                    T_wc=last.copy(), aff=np.zeros(2),
                                    is_kf=False))
            return

        with self.telemetry.stage("pyramid"):
            # descriptor: the fleet driver folds B sequences' pyramids into
            # one vmapped program; results stay device-resident
            dI, abs_grad = yield ("dispatch_pyramid", (image,), {})

        shell = dict(id=len(self.shells), timestamp=timestamp,
                     T_wc=np.eye(4), aff=np.zeros(2), is_kf=False)
        self.shells.append(shell)

        frame = dict(dI=dI, abs_grad=abs_grad, shell=shell, _cloud=cloud,
                     exposure=float(exposure), flat=flatten_pyramid(dI))

        if not self.initialized:
            if self._mono is not None:
                # camera-only bootstrap in progress: feed the mono
                # initializer until it snaps + settles (trackFrame
                # protocol, CoarseInitializer.cpp:50-230)
                ready = self._mono.track_frame(frame["dI"])
                if not ready:
                    self.telemetry.frame_done(False)
                    return
                yield from self._initialize_mono_steps(frame)
                # the ready frame becomes KF1 directly with the
                # initializer pose (initializeFromInitializer semantics) —
                # no photometric tracking for it
                frame["scan"] = self._null_scan()
                frame["flow"] = np.zeros(3)
                frame["track_rmse"] = 0.0
                with self.telemetry.stage("keyframe"):
                    yield from self._make_key_frame_steps(frame)
                self.telemetry.frame_done(True)
                return
            if cloud is None:
                # no LiDAR on the first frame: start the camera-only
                # bootstrap (ops/mono_init; the reference's setFirst path)
                from sdv_loam_tpu.ops.mono_init import MonoInitializer
                self._mono = MonoInitializer(self.calib, self.s)
                self._mono.set_first(frame["dI"], frame["abs_grad"])
                del frame["_cloud"]
                self._first_frame = frame
                self.telemetry.frame_done(False)
                return
            # first frame: stash as the initializer frame (setFirstFromLidar)
            with self.telemetry.stage("lidar"):
                frame["scan"] = self._preprocess(cloud)
            del frame["_cloud"]
            self._first_frame = frame
            self.initialized = True
            self.telemetry.frame_done(False)
            return

        if len(self.shells) == 2 and self._mono is None:
            yield from self._initialize_steps()

        # pipelined-mode stage barrier: everything above is staging (no
        # dependence on the previous frame's state); everything below needs
        # it. The pipelined driver pauses here, drains the previous frame,
        # then resumes. Sequential drivers pull an empty payload (free).
        yield {"__stage_barrier__": True}

        # LiDAR preprocess is NOT staging: its projection bakes in the
        # BA-optimized calib (self.K0), which the previous frame's keyframe
        # pipeline may update — running it before the barrier made the
        # pipelined trajectory diverge from sequential mode.
        if frame["_cloud"] is None:
            # camera-only frame (mono mode / LiDAR dropout): empty depth
            # map; selection falls back to the monocular add_feat branch
            frame.pop("_cloud")
            frame["scan"] = self._null_scan()
        else:
            with self.telemetry.stage("lidar"):
                frame["scan"] = yield ("dispatch_lidar",
                                       (frame.pop("_cloud"),), {})
        # KF-path scan scalars (selection density + mono-branch gate):
        # issue their D2H copies NOW so the keyframe pipeline reads them
        # host-locally (~0.2 ms) instead of paying a dedicated ~30 ms
        # blocking-pull round trip per keyframe (the old "scal" yield)
        frame["_scan_scal"] = {"bbox": frame["scan"]["bbox_area"],
                               "add_feat": frame["scan"]["add_feature_point"]}
        for v in frame["_scan_scal"].values():
            if hasattr(v, "copy_to_host_async"):
                v.copy_to_host_async()

        with self.telemetry.stage("track"):
            ok = yield from self._track_steps(frame)
        if not ok:
            print("Initial tracking failed: LOST!")
            self.is_lost = True
            return

        for ob in self.observers:
            ob.publish_cam_pose(shell["id"], timestamp, shell["T_wc"])

        need_kf = self._keyframe_decision(frame)
        is_kf = need_kf or len(self.kf_shells) < 2
        if is_kf:
            with self.telemetry.stage("keyframe"):
                yield from self._make_key_frame_steps(frame)
        else:
            with self.telemetry.stage("trace"):
                yield from self._make_non_key_frame(frame)
        self.telemetry.frame_done(is_kf)

    # ------------------------------------------------------------------
    # initialization
    # ------------------------------------------------------------------

    def _initialize_steps(self):
        """Insert the first frame as KF0 with LiDAR-depth active points
        (CoarseInitializer::setFirstFromLidar + initializeFromInitializer)."""
        fr = self._first_frame
        scan = fr["scan"]

        lidar_area = float((yield scan["bbox_area"]))
        density = 0.03 * lidar_area  # densities[0] (CoarseInitializer.cpp:780)
        cand = scan["depth_map"] > 0
        out, keep = yield from make_maps_compact_steps(
            fr["dI"][0], fr["abs_grad"], cand, scan["depth_map"],
            scan["px_u_map"], scan["px_v_map"], density,
            self._next_key(), {"pot": 3}, self.s, cap=self.s.n_select_cap,
            sub_seed=self.s.seed)
        # keepPercentage subsampling toward the active density target
        n_have = int(keep.sum())
        keep_p = min(1.0, self.s.desired_point_density / max(n_have, 1))
        rng = np.random.default_rng(self.s.seed)
        keep &= rng.random(keep.shape) <= keep_p

        slot = self._insert_frame_slot(fr, kf_id=0)
        # first-frame gauge prior (getPrior: initialRot/TransPrior)
        self.frame_prior[slot] = np.array([1e10] * 3 + [1e11] * 3)

        good = keep & out["finite"] & (out["z"] > 0)
        if good.sum() < 50:
            # too few LiDAR-depth points to initialize (initializer failure
            # -> full reset path, main.cpp:510-528)
            self.init_failed = True
        rows = self._free_pt_rows(int(good.sum()))
        sel = np.nonzero(good)[0][:len(rows)]

        self.pt_valid[rows] = True
        self.pt["u"][rows] = out["u"][sel]
        self.pt["v"][rows] = out["v"][sel]
        self.pt["idepth"][rows] = 1.0 / out["z"][sel]
        self.pt["host"][rows] = slot
        self.pt["color"][rows] = out["color"][sel]
        self.pt["weights"][rows] = out["weights"][sel]
        self.pt["is_sensor"][rows] = True
        self.pt["type"][rows] = CORNER
        self.pt["prior"][rows] = self.s.idepth_fix_prior  # hasDepthPrior
        self.pt["quality"][rows] = out["gcen"][sel]
        self.res_active[rows, :] = False
        self.matcher_valid[rows, :] = False

        fr["shell"]["is_kf"] = True
        self.kf_shells.append(fr["shell"]["id"])

        # first-frame coarse tracking reference (setCTRefForFirstFrame)
        self._build_track_ref_first_frame(slot)

    def _null_scan(self):
        """Scan-shaped placeholder for camera-only frames: empty depth map
        (no LiDAR candidates), full-image bbox, and add_feature_point
        forced on so selection runs the monocular branch
        (_make_new_traces_steps)."""
        z = np.zeros((self.h, self.w), np.float32)
        return dict(depth_map=z, px_u_map=z, px_v_map=z,
                    bbox_area=np.float32(self.w * self.h),
                    add_feature_point=np.bool_(True))

    def _initialize_mono_steps(self, frame):
        """initializeFromInitializer for the camera-only bootstrap: KF0 =
        the stashed first frame with the mono initializer's gauge-fixed
        points (is_sensor False — BA owns their depths); the current
        frame's pose comes from the initializer, consistently rescaled
        (ops/mono_init.level0_points)."""
        from sdv_loam_tpu.ops.trace import pattern_colors

        fr = self._first_frame
        slot = self._insert_frame_slot(fr, kf_id=0)
        self.frame_prior[slot] = np.array([1e10] * 3 + [1e11] * 3)

        u, v, idep, fac = self._mono.level0_points()
        color, weights, _, finite, gcen = jax.device_get(pattern_colors(
            fr["dI"][0], jnp.asarray(u, jnp.float32),
            jnp.asarray(v, jnp.float32)))
        good = np.asarray(finite) & np.isfinite(idep) & (idep > 0)
        if good.sum() < 50:
            self.init_failed = True
        rows = self._free_pt_rows(int(good.sum()))
        sel = np.nonzero(good)[0][:len(rows)]

        self.pt_valid[rows] = True
        self.pt["u"][rows] = u[sel]
        self.pt["v"][rows] = v[sel]
        self.pt["idepth"][rows] = idep[sel]
        self.pt["host"][rows] = slot
        self.pt["color"][rows] = color[sel]
        self.pt["weights"][rows] = weights[sel]
        self.pt["is_sensor"][rows] = False      # monocular: BA owns depth
        self.pt["type"][rows] = CORNER
        self.pt["prior"][rows] = 0.0            # no depth prior
        self.pt["quality"][rows] = gcen[sel]
        self.res_active[rows, :] = False
        self.matcher_valid[rows, :] = False

        fr["shell"]["is_kf"] = True
        self.kf_shells.append(fr["shell"]["id"])
        self._build_track_ref_first_frame(slot)

        # current frame's pose: first->new from the initializer, translation
        # scaled into the point gauge; world == first frame
        T_fn = np.asarray(self._mono.T, np.float64).copy()
        T_fn[:3, 3] *= fac
        frame["shell"]["T_wc"] = np.linalg.inv(T_fn)
        frame["shell"]["aff"] = np.asarray(self._mono.aff, np.float64)
        self.initialized = True
        self._mono = None
        yield from ()

    def _build_track_ref_first_frame(self, slot):
        m = self.pt_valid & (self.pt["host"] == slot)
        u = np.round(self.pt["u"][m] + 0.5).astype(np.int32)
        v = np.round(self.pt["v"][m] + 0.5).astype(np.int32)
        weight = np.full(m.sum(), np.sqrt(1e-3 / 1e-12), np.float32)
        (u, v, idp, weight, ok), _ = self._pad_bucket(
            [u, v, self.pt["idepth"][m], weight, np.ones(m.sum(), bool)])
        id0, w0 = splat_idepth(jnp.asarray(u), jnp.asarray(v),
                               jnp.asarray(idp), jnp.asarray(weight),
                               jnp.asarray(ok), self.w, self.h)
        self.track_ref = build_track_ref(self.pyr_slots[slot], id0, w0,
                                         self.levels,
                                         cap=self.s.track_ref_caps)
        self.track_ref_slot = slot
        self.track_ref_aff = self.aff[slot].copy()
        self.first_coarse_rmse = -1.0

    # ------------------------------------------------------------------
    # tracking
    # ------------------------------------------------------------------

    def _motion_hypotheses(self):
        """Pose-initialization try list (trackNewCoarse:341-398).

        Returns list of (4,4) lastF->fh transforms."""
        ref_shell = self.shells[self.frame_shell_idx[self.track_ref_slot]]
        tries = []
        if len(self.shells) == 2:
            tries.append(np.eye(4))
            for rd in (0.02, 0.04):
                for R in _rotation_ladder(rd):
                    tries.append(R)
            return tries
        slast = self.shells[-2]
        sprelast = self.shells[-3]

        def inv(T):
            # shells can hold degenerate poses after a hard tracking
            # failure; a singular/non-finite pose would crash here before
            # the ladder's own finite-guard can replace it with identity
            if not np.isfinite(T).all():
                return np.eye(4)
            try:
                return np.linalg.inv(T)
            except np.linalg.LinAlgError:
                return np.eye(4)

        T_s2sp = inv(sprelast["T_wc"]) @ slast["T_wc"]
        T_lastF2s = inv(slast["T_wc"]) @ ref_shell["T_wc"]
        fh_2_slast = T_s2sp
        tries.append(inv(fh_2_slast) @ T_lastF2s)                    # const
        tries.append(inv(fh_2_slast) @ inv(fh_2_slast) @ T_lastF2s)  # double
        half = se3.se3_exp_np(se3.se3_log_np(fh_2_slast) * 0.5)
        tries.append(inv(half) @ T_lastF2s)                          # half
        tries.append(T_lastF2s)                                      # zero
        tries.append(np.eye(4))                                      # zero from KF
        for R in _rotation_ladder(0.02):
            tries.append(inv(fh_2_slast) @ T_lastF2s @ R)
        return tries

    # hypothesis batch buckets: 32 covers the 31 normal-frame tries, 64 the
    # 53 init tries (two compiled ladder variants, each cached)
    N_TRIES_CAP = 64

    def _track_steps(self, frame):
        """Fused frame tracking: hypothesis ladder + pyramid LM + matcher +
        struct pose in ONE device program (ops.frame_step.track_frame_step).
        Generator: yields each attempt's dispatch descriptor; the driver
        launches the program (possibly fleet-batched) and sends back the
        pulled outputs. Returns ok.
        """
        tries = self._motion_hypotheses()
        aff_last = self.shells[-2]["aff"].copy() if len(self.shells) >= 2 \
            else np.zeros(2)
        coarsest = self.levels - 1

        B = 32 if len(tries) <= 32 else self.N_TRIES_CAP
        T_batch = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
        nt = min(len(tries), B)
        stackt = np.stack(tries[:nt])
        # shells can hold non-finite poses after a hard tracking failure;
        # feed the ladder identities instead of letting inf/nan cascade
        # into the device program and the host inv() below
        bad = ~np.isfinite(stackt).all(axis=(1, 2))
        stackt[bad] = np.eye(4)
        T_batch[:nt] = stackt.astype(np.float32)

        ref_shell = self.shells[self.frame_shell_idx[self.track_ref_slot]]
        # captured BEFORE the track yield: in pipelined mode the next
        # frame's shell is appended while this generator is suspended, so
        # relative indexing after the yield would be off by one
        prev_shell = self.shells[-2]
        n_window = len(self.order)
        ref_idx = self.pt["host"].copy()
        # findMatchDirect:242-252 window<=2 special case (target = new frame)
        if n_window == 2:
            ref_idx[:] = self.order[0]

        flat, offs, ws, hs = frame["flat"]

        # device cache of the (KF-mutated-only) point-pool arguments,
        # derived from the device-resident active pool (no uploads)
        if self._pt_dev is None:
            pool = self._kf_dev_pool()
            ridx_d = jnp.full_like(pool["host"], self.order[0]) \
                if n_window == 2 else pool["host"]
            self._pt_dev = (
                pool["u"], pool["v"], pool["idepth"], pool["host"],
                pool["type"], pool["pt_valid"], pool["quality"],
                pool["is_sensor"], ridx_d)
        (pu_d, pv_d, pid_d, ph_d, pty_d, pv2_d, pq_d, psen_d,
         ridx_d) = self._pt_dev

        # per-KF-constant device args (window poses, affine/exposure stacks,
        # calib, the tracking-ref pose): uploaded once per keyframe instead
        # of once per frame (cache invalidated alongside _pt_dev)
        if getattr(self, "_track_const_dev", None) is None:
            T_wc_stack = np.linalg.inv(self.T_cw)
            # ONE batched transfer (device_put of numpy) — eager jnp wraps
            # would cost one tiny device program per leaf
            self._track_const_dev = jax.device_put(dict(
                ref_aff=np.asarray(self.track_ref_aff, np.float32),
                inf5=np.full((5,), np.inf, np.float32),
                ref_T_wc=np.asarray(ref_shell["T_wc"], np.float32),
                T_wc_stack=np.asarray(T_wc_stack, np.float32),
                aff=np.asarray(self.aff, np.float32),
                exposure=np.asarray(self.exposure, np.float32),
                slot_used=np.asarray(self.slot_used, bool),
                K0=np.asarray(self.K0, np.float32)))
        tc = self._track_const_dev

        # re-track ladder (trackNewCoarse:412-462). The reference tries
        # hypotheses ONE AT A TIME and breaks at the first whose residual
        # beats lastCoarseRMSE * re_track_threshold; attempt 1 here already
        # evaluates EVERY hypothesis on the coarsest level and full-refines
        # the top 3 with the constant-motion preference — a strict superset
        # of the reference's search — so the residual threshold cannot be
        # improved by re-running with the winner excluded (measured: the
        # threshold-triggered retries ran 1.8 full track programs per frame
        # for no accuracy change). Retries remain for INVALID results only
        # (NaN/diverged refinement), mirroring the reference's !haveOneGood
        # continuation.
        exclude = np.zeros(B, bool)
        exclude[nt:] = True
        best_out, best_res0 = None, np.inf
        for attempt in range(3):
            # top-k full-pyramid refinement every attempt: picking the best
            # of several by level-0 residual measurably improves ATE (the
            # single-candidate fast path loses ~5x accuracy); the refine
            # candidates dominate the track program's device time (~34 ms
            # each, tools/kf_microbench2.py)
            n_refine = self.s.track_refine_candidates
            # dispatch DESCRIPTOR, not a dispatched program: the driver
            # launches it (add_active_frame / _drain_pending immediately;
            # MultiSystem folds all B sequences' descriptors into ONE
            # vmapped program — the fleet throughput axis)
            out = yield (
                "dispatch_track",
                (self.track_ref, frame["dI"], flat, offs, ws, hs, self.Ks,
                 np.asarray(T_batch, np.float32), np.asarray(exclude),
                 np.asarray(aff_last, np.float32),
                 tc["ref_aff"],
                 # per-frame exposure pair [ref KF, new frame] — the only
                 # track arg that varies with the INPUT stream (times-file
                 # exposures, DatasetReader.h:213-217); host numpy, so it
                 # transfers at dispatch without touching the per-KF cache
                 np.asarray([self.exposure[self.track_ref_slot],
                             frame["exposure"]], np.float32),
                 tc["inf5"], tc["ref_T_wc"],
                 pu_d, pv_d, pid_d, ph_d, pty_d, pv2_d, pq_d, psen_d,
                 tc["T_wc_stack"], tc["aff"],
                 tc["exposure"], self.dI0_stack,
                 ridx_d, tc["slot_used"], tc["K0"],
                 self.s.coarse_cutoff_th, self.s.huber_th),
                dict(coarsest_lvl=coarsest, w=self.w, h=self.h,
                     max_level=self.levels - 1, n_refine=n_refine,
                     use_struct_pose=self.s.use_struct_pose,
                     struct_pose_mad=self.s.struct_pose_mad,
                     closest_view=self.s.closest_view_track,
                     closest_view_margin=np.float32(
                         self.s.closest_view_margin),
                     closest_view_sensor_only=np.bool_(
                         self.s.closest_view_track_sensor_only),
                     struct_pose_e_tol=self.s.struct_pose_e_tol,
                     struct_pose_max_dt=self.s.struct_pose_max_dt))
            r0 = float(np.asarray(out["res"])[0])
            o = bool(out["ok"]) and np.isfinite(r0) and \
                np.isfinite(np.asarray(out["T_wc"])).all()
            if o and r0 < best_res0:
                best_out, best_res0 = out, r0
            if o:
                break
            exclude[int(out["best_try"])] = True
            if exclude[:nt].all():
                break
        out = best_out if best_out is not None else out
        # device-cost diagnostic: LM iterations actually paid per level,
        # plus how many retry-ladder attempts (= dispatch+pull rounds) ran
        self.track_iters_hist.append(np.concatenate(
            [np.asarray(out["lvl_iters"]), [attempt + 1]]))

        res = np.asarray(out["res"], np.float64)
        flow = np.asarray(out["flow"], np.float64)
        ok = best_out is not None
        if not ok:
            # reference fallback: keep the predicted pose and hope to recover
            # (trackNewCoarse:462-468). After a deep divergence the motion
            # prediction itself can be non-finite/singular (f32 overflow in
            # the shells) — sanitize instead of crashing in inv(); the
            # caller's finite checks then declare LOST.
            res = np.where(np.isfinite(res), res, 100.0)
            flow = np.zeros(3)
            T_ref2fh = tries[0]
            ok_T = np.isfinite(T_ref2fh).all() and \
                np.isfinite(ref_shell["T_wc"]).all() and \
                abs(np.linalg.det(T_ref2fh)) > 1e-12
            T_wc = (ref_shell["T_wc"] @ np.linalg.inv(T_ref2fh)) if ok_T \
                else np.full((4, 4), np.nan)
            aff_fh = aff_last
        else:
            T_ref2fh = np.asarray(out["T_ref_to_fh"], np.float64)
            T_wc = np.asarray(out["T_wc"], np.float64)
            aff_fh = np.asarray(out["aff"], np.float64)

        # --- tracked-step sanity veto (robustness deviation, PARITY.md) ---
        # Once every ladder hypothesis is photometrically wrong, the
        # coarsest-level scores all sit at the cutoff clamp and the
        # "winner" is arbitrary — a diverged frame can come back tens of
        # meters off (500-frame S-curve f414: a 13 m step was accepted and
        # poisoned the window beyond recovery). A 10 Hz automotive platform
        # cannot exceed a few x the recent median step; keep the
        # motion-model (constant-velocity) pose for such frames instead.
        s = self.s
        if (ok and s.track_step_veto_m > 0
                and np.isfinite(prev_shell["T_wc"]).all()
                and np.isfinite(T_wc).all()):
            step = float(np.linalg.norm(
                T_wc[:3, 3] - prev_shell["T_wc"][:3, 3]))
            hist = self._track_step_hist
            med = float(np.median(hist[-20:])) if len(hist) >= 5 else 0.0
            lim = max(s.track_step_veto_x * med, s.track_step_veto_m)
            if step > lim:
                T_cv = np.asarray(T_batch[0], np.float64)
                if abs(np.linalg.det(T_cv)) > 1e-12 and \
                        np.isfinite(ref_shell["T_wc"]).all():
                    self.telemetry.counters["track_step_veto"] += 1
                    T_ref2fh = T_cv
                    T_wc = ref_shell["T_wc"] @ np.linalg.inv(T_cv)
                    aff_fh = np.asarray(aff_last, np.float64)
        if np.isfinite(T_wc).all() \
                and np.isfinite(prev_shell["T_wc"]).all():
            self._track_step_hist.append(float(np.linalg.norm(
                T_wc[:3, 3] - prev_shell["T_wc"][:3, 3])))
            del self._track_step_hist[:-64]

        self.last_coarse_rmse = np.where(np.isfinite(res), res, 100.0)

        shell = frame["shell"]
        shell["aff"] = np.asarray(aff_fh)
        shell["T_wc"] = T_wc
        shell["T_wc_tracked"] = np.array(T_wc)   # pre-BA (diagnostics)
        shell["tracking_ref"] = ref_shell["id"]
        # tracking diagnostics: match count and the photometric-only pose
        # (before the struct-pose stage), for drift forensics
        shell["n_matched"] = int(np.asarray(out["n_matched"])) if ok else 0
        shell["T_wc_photo"] = (ref_shell["T_wc"] @ np.linalg.inv(
            np.asarray(T_ref2fh, np.float64))) if ok else np.array(T_wc)

        if self.first_coarse_rmse < 0:
            self.first_coarse_rmse = res[0]
        frame["flow"] = flow
        frame["track_rmse"] = res[0]
        if self.s.log_stuff:
            xi = se3.se3_log_np(np.asarray(T_wc, np.float64))
            self.telemetry.track_line(
                shell["id"], shell["timestamp"], 1.0, xi, aff_fh, res[0],
                int(np.asarray(out.get("best_try", 0))))
        return bool(np.isfinite(flow).all() and np.isfinite(res[0]))

    def _keyframe_decision(self, frame) -> bool:
        s = self.s
        flow = frame["flow"]
        aff_fh = frame["shell"]["aff"]
        a_rel = np.exp(aff_fh[0] - self.track_ref_aff[0])
        wsum = (s.kf_global_weight * s.max_shift_weight_t
                * np.sqrt(max(flow[0], 0)) / (self.w + self.h)
                + s.kf_global_weight * s.max_shift_weight_r
                * np.sqrt(max(flow[1], 0)) / (self.w + self.h)
                + s.kf_global_weight * s.max_shift_weight_rt
                * np.sqrt(max(flow[2], 0)) / (self.w + self.h)
                + s.kf_global_weight * s.max_affine_weight
                * abs(np.log(max(a_rel, 1e-9))))
        need = wsum > 1.0 or \
            2 * self.first_coarse_rmse < frame["track_rmse"]
        if self.ignore_kf and self.kf_shells:
            last_kf_t = self.shells[self.kf_shells[-1]]["timestamp"]
            if frame["shell"]["timestamp"] - last_kf_t <= 0.15:
                need = False
        # KF-rate forensics (VERDICT r4 #2): per-frame decision inputs —
        # RMS flow (px) per term and the combined threshold value
        self.kf_decision_hist.append(
            (float(wsum), float(np.sqrt(max(flow[0], 0))),
             float(np.sqrt(max(flow[2], 0))), bool(need)))
        del self.kf_decision_hist[:-512]
        return bool(need)

    # ------------------------------------------------------------------
    # non-keyframe
    # ------------------------------------------------------------------

    def _make_non_key_frame(self, frame):
        yield from self._trace_steps(frame)

    def _trace_steps(self, frame):
        """Trace all immature points into the new frame (traceNewCoarse).

        Async between keyframes: the mutable trace state (idepth interval,
        status, quality) stays DEVICE-resident and chains from trace to trace
        without host syncs; `_sync_immature()` pulls it back before any host
        consumer (activation) needs it. Dispatches via a DESCRIPTOR so the
        fleet driver folds aligned sequences' traces (keyframe and
        non-keyframe alike — both run right after the track round) into one
        vmapped program.
        """
        if not self.im_valid.any():
            return
        Km = np.eye(3)
        Km[0, 0], Km[1, 1] = self.K0[0], self.K0[1]
        Km[0, 2], Km[1, 2] = self.K0[2], self.K0[3]
        Kim = np.linalg.inv(Km)
        T_cw = self.T_cw
        T_new_cw = np.linalg.inv(frame["shell"]["T_wc"])
        KRKi = np.zeros((self.F, 3, 3), np.float32)
        Kt = np.zeros((self.F, 3), np.float32)
        affp = np.tile(np.array([1.0, 0.0], np.float32), (self.F, 1))
        for slot in self.order:
            T_h2n = T_new_cw @ np.linalg.inv(T_cw[slot])
            KRKi[slot] = Km @ T_h2n[:3, :3] @ Kim
            Kt[slot] = Km @ T_h2n[:3, 3]
            a = np.exp(frame["shell"]["aff"][0] - self.aff[slot][0])
            affp[slot] = [a, frame["shell"]["aff"][1] - a * self.aff[slot][1]]

        pool = self._im_pool_dev()
        out = yield (
            "dispatch_trace",
            (pool["u"], pool["v"], pool["idepth_min"], pool["idepth_max"],
             pool["status"], pool["quality"], pool["color"], pool["weights"],
             pool["gradH"], pool["energy_th"], pool["host"],
             KRKi, Kt, affp, frame["dI"][0],
             np.float32(self.s.max_pix_search),
             np.float32(self.s.huber_th)),
            dict(w=self.w, h=self.h))
        self._im_pool = dict(pool, idepth_min=out["idepth_min"],
                             idepth_max=out["idepth_max"],
                             status=out["status"], quality=out["quality"],
                             pixel_interval=out["pixel_interval"])
        self._trace_fresh = True

    def _im_pool_dev(self):
        """Device-resident immature pool (kf_ops.IM_FIELDS + im_valid),
        built once from the host arrays, then chained through the trace /
        new-trace-commit / activation programs. Invalid rows carry status
        IPS_OOB on device so the chained trace programs skip them (the host
        keeps its stale values; comparisons mask by im_valid)."""
        if self._im_pool is None:
            from sdv_loam_tpu.system.kf_ops import IM_FIELDS
            p = {f: jnp.asarray(self.im[f]) for f in IM_FIELDS}
            p["status"] = jnp.asarray(np.where(
                self.im_valid, self.im["status"], trace_ops.IPS_OOB))
            p["im_valid"] = jnp.asarray(self.im_valid)
            self._im_pool = p
        return self._im_pool

    def _sync_pool_mirrors(self):
        """Pull the checkpoint-only active-pool mirrors (matcher store,
        residual centers) back to host in ONE device_get. The per-KF
        readback deliberately omits them (~0.7 MB/KF ≈ ~35 ms at the
        tunnel's ~20 MB/s download rate); between keyframes the device
        chain is authoritative."""
        if self._kf_dev is None:
            return
        req = {"matcher_px": self._kf_dev["matcher_px"],
               "matcher_valid": self._kf_dev["matcher_valid"]}
        if getattr(self, "_centers_dev", None) is not None:
            req["center"] = self._centers_dev
        pulled = jax.device_get(req)
        self.matcher_px = np.array(pulled["matcher_px"], np.float32)
        self.matcher_valid = np.array(pulled["matcher_valid"])
        if "center" in pulled:
            self.centers = np.array(pulled["center"], np.float32)

    def _sync_immature(self):
        """Pull the device-resident trace state back into the host pool."""
        if not self._trace_fresh or self._im_pool is None:
            return
        out = jax.device_get({k: self._im_pool[k] for k in
                              ("idepth_min", "idepth_max", "status",
                               "quality", "pixel_interval")})
        self._apply_immature_sync(out)

    def _apply_immature_sync(self, out):
        """Apply already-pulled trace state to the host pool."""
        if out is None:
            return
        im = self.im
        upd = self.im_valid & (~im["is_sensor"])
        for k in ("idepth_min", "idepth_max", "quality", "pixel_interval"):
            im[k][upd] = out[k][upd]
        im["status"][upd] = out["status"][upd]
        self._trace_fresh = False

    # ------------------------------------------------------------------
    # keyframe pipeline
    # ------------------------------------------------------------------

    def _insert_frame_slot(self, frame, kf_id):
        free = np.nonzero(~self.slot_used)[0]
        assert free.size > 0, "window slots exhausted"
        slot = int(free[0])
        self.slot_used[slot] = True
        self.order.append(slot)
        T_cw = np.linalg.inv(frame["shell"]["T_wc"])
        self.T_cw_fej[slot] = T_cw
        self.eps[slot] = 0.0
        self.aff[slot] = frame["shell"]["aff"]
        self.exposure[slot] = frame.get("exposure", 1.0)
        # weak pose prior anchoring eps to the frame's tracked insertion
        # pose (robustness deviation, PARITY.md delta 11): invisible in a
        # healthy solve (residual H diag >= 1e5 vs ~4 here) but bounds the
        # step in window directions a thinned residual graph leaves
        # unconstrained — the multiplicative LM damping (1+lambda)*diag is
        # zero there and the marg-prior pull can fling the pose meters
        # (the failure the BA step veto catches after the fact).
        self.frame_prior[slot] = np.array(
            [self.s.frame_pose_prior_t] * 3
            + [self.s.frame_pose_prior_r] * 3, np.float32)
        self.frame_kf_id[slot] = kf_id
        self.frame_shell_idx[slot] = frame["shell"]["id"]
        self.slot_flagged[slot] = False
        self.slot_stats_out[slot] = 0
        self.pyr_slots[slot] = frame["dI"]
        self.flat_slots[slot] = flatten_pyramid(frame["dI"])
        # persistent (F, T, 3) device stack of flattened window pyramids:
        # one 7 MB slot update per KF instead of re-stacking 8 x 7 MB
        # (the matcher refresh masks unused slots, so stale rows are inert)
        if self._flat_stack is None:
            self._flat_stack = jnp.zeros(
                (self.F,) + tuple(self.flat_slots[slot][0].shape),
                jnp.float32)
        # both slot updates in ONE jitted program (eager .at[].set would
        # dispatch 3 device ops each)
        self.dI0_stack, self._flat_stack = _set_slot_stacks(
            self.dI0_stack, self._flat_stack, np.int32(slot),
            frame["dI"][0], self.flat_slots[slot][0])
        self.fe_th[slot] = self.fe_th[self.order[-2]] if len(self.order) > 1 \
            else 12.0 * 12.0 * 8.0
        return slot

    def _make_key_frame_steps(self, frame):
        # dispatch the trace (device-chained). The trace state stays
        # device-resident: no host consumer needs it per-KF (activation
        # reads the device pool; free-row accounting follows the ACTIVATE
        # pull) — _sync_immature() pulls on demand (checkpoint/debug).
        yield from self._trace_steps(frame)
        # scan scalars were async-copied at lidar dispatch (frame_steps);
        # by now they are host-local, so this costs no link round trip
        scal = jax.device_get(frame.get("_scan_scal") or {
            "bbox": frame["scan"]["bbox_area"],
            "add_feat": frame["scan"]["add_feature_point"]})
        frame["bbox_area"] = float(scal["bbox"])
        frame["add_feat"] = bool(scal["add_feat"])
        self._flag_frames_for_marginalization()

        # low-speed KF suppression (makeKeyFrame:1057-1070)
        if len(self.kf_shells) >= 2:
            s1 = self.shells[self.kf_shells[-1]]
            s2 = self.shells[self.kf_shells[-2]]
            dt = s1["timestamp"] - s2["timestamp"]
            if dt > 0:
                speed = np.linalg.norm(s1["T_wc"][:3, 3] - s2["T_wc"][:3, 3]) / dt
                self.ignore_kf = speed < 10.0
        kf_id = len(self.kf_shells)
        slot = self._insert_frame_slot(frame, kf_id)
        frame["shell"]["is_kf"] = True
        self.kf_shells.append(frame["shell"]["id"])

        with self.telemetry.stage("kf.select"):
            yield from self._make_new_traces_steps(frame, slot)

        # residuals: every existing active point x new frame
        # (whole-column writes so the device mirror's column ops match
        # bit-for-bit; invalid rows are masked everywhere downstream)
        pts_m = self.pt_valid & (self.pt["host"] != slot)
        self.res_active[:, slot] = pts_m
        self.res_state[:, slot] = backend.RES_IN
        self.res_is_new[:, slot] = pts_m
        self.matcher_valid[:, slot] = False

        with self.telemetry.stage("kf.activate"):
            yield from self._activate_steps(frame, slot)
        self._commit_pool_dev(slot)
        with self.telemetry.stage("kf.opt"):
            yield from self._kf_opt_steps(frame, slot)
        # deferred-readback mode: _kf_opt_steps stashed the control pull;
        # _kf_publish runs inside _resolve_kf_readback one frame later

    def _kf_publish(self):
        """Per-KF telemetry line + observer publication (runs after the
        kf_opt control readback has been applied to the host mirrors)."""
        self.telemetry.kf_line(len(self.order), int(self.pt_valid.sum()),
                               int(self.res_active.sum()),
                               float(self.last_coarse_rmse[0]))
        if self.s.log_stuff and self.order:
            # numsLog stream (FullSystem.cpp:1392-1411)
            newest_sh = self.shells[self.frame_shell_idx[self.order[-1]]]
            span = newest_sh["id"] - \
                self.shells[self.frame_shell_idx[self.order[0]]]["id"]
            self.telemetry.nums_line(
                len(self.kf_shells) - 1, float(self.last_coarse_rmse[0]),
                int(getattr(self, "last_new_traces", 0)),
                int(np.size(getattr(self, "_last_act", []))),
                int(self.slot_stats_out.sum()),
                int(self.s.max_opt_iterations),
                int((self.res_active & self.pt_valid[:, None]).sum()),
                # resInM equivalent: cumulative residuals folded into HM
                # via point marginalization (per-KF live count n/a — marg
                # residuals are dense in HM, not kept as a set)
                int(self.telemetry.counters.get("res_marginalized", 0)),
                newest_sh["aff"], span, len(self.order))
        if self.observers:
            m = self.pt_valid
            xn = (self.pt["u"][m] - self.K0[2]) / self.K0[0]
            yn = (self.pt["v"][m] - self.K0[3]) / self.K0[1]
            pr = np.stack([xn, yn, np.ones(m.sum())], -1) / \
                np.maximum(self.pt["idepth"][m], 1e-9)[:, None]
            T_wc = np.linalg.inv(self.T_cw)
            Th = T_wc[self.pt["host"][m]]
            pw = np.einsum("nij,nj->ni", Th[:, :3, :3], pr) + Th[:, :3, 3]
            for ob in self.observers:
                ob.publish_keyframes(
                    [self.frame_kf_id[sl] for sl in self.order],
                    T_wc[self.order], pw, self.pt["host"][m])
                ob.on_keyframe(self)

    def _commit_pool_dev(self, slot):
        """Mirror the between-KF host pool mutations (residual insertion +
        activation-row inserts) into the device-resident pool: ONE dispatch,
        only the new rows travel (kf_ops.commit_pool_kf)."""
        from sdv_loam_tpu.system.kf_ops import POOL_FIELDS, commit_pool_kf
        pool = self._kf_dev_pool()
        rows = getattr(self, "_last_act", None)
        rows = np.asarray(rows if rows is not None else [], np.int32)
        (rows_p,), n = self._pad_bucket([rows]) if rows.size else \
            ((np.zeros(512, np.int32),), 0)
        valid = np.arange(rows_p.shape[0]) < n
        vals = {f: self.pt[f][rows_p] for f in POOL_FIELDS}
        vals["idepth"] = self.pt["idepth"][rows_p]
        act_res = self.res_active[rows_p]
        self._kf_dev = commit_pool_kf(
            pool, np.int32(slot), rows_p, valid, vals, act_res)

    def _kf_opt_steps(self, frame, slot):
        """Matcher refresh + windowed BA + outlier removal + tracking-ref
        splat + point/frame marginalization: ONE device program
        (kf_ops.kf_opt_step) and ONE readback of the small control state.
        Replaces five dispatch+readback stages of the round-1 pipeline."""
        from sdv_loam_tpu.system.kf_ops import kf_opt_step
        s = self.s
        F = self.F
        N = self.N
        iters = s.max_opt_iterations
        if len(self.order) < 3:
            iters = 100
        elif len(self.order) < 4:
            iters = 75

        # reference-frame indices (findMatchDirect:242-252 window<=2 case)
        n_window = len(self.order)
        ref_idx_newest = self.pt["host"].copy()
        if n_window == 2:
            ref_idx_newest[:] = self.order[0]
        ref_idx_multi = np.tile(self.pt["host"][None, :], (F, 1))
        multi_mask = np.zeros(F, bool)
        for sl in self.order[:-1]:
            multi_mask[sl] = True
        if n_window == 2:
            a, b = self.order[0], self.order[1]
            for si in range(F):
                ref_idx_multi[si, :] = b if si == a else a

        flat_newest, offs, ws, hs = frame["flat"]
        flat_stack = self._flat_stack
        prior_marg = np.where(self.pt["prior"] > 0,
                              self.pt["prior"] * s.idepth_fix_prior_marg_fac,
                              0.0).astype(np.float32)

        pool = self._kf_dev_pool()

        # bucket the matcher pass-2 lane cap to the live newest-host count
        # (the activation batch just committed): measured ~150-500 lanes
        # steady-state vs the 2048 worst-case burst. Each bucket is a
        # one-time kf_opt_step compile (persistent cache); the short ladder
        # bounds the variant count at 3. Pass 1 stays at the frac default —
        # its live count (~2400) nearly fills the 2560 bucket.
        nf_live = int((self.pt_valid & (self.pt["host"] == slot)).sum())
        p2_cap = next((c for c in (512, 1024, 2048) if nf_live <= c), N)

        statics = dict(
            n_frames=F, w=self.w, h=self.h, max_level=self.levels - 1,
            levels=self.levels, track_ref_cap=s.track_ref_caps,
            gate_refresh=s.ba_gate_refresh,
            resf_at_fej=s.ba_resf_at_fej, p2_cap=p2_cap,
            closest_view=s.closest_view_ref,
            closest_view_margin=np.float32(s.closest_view_margin),
            closest_view_sensor_only=np.bool_(s.closest_view_sensor_only))

        def kf_args(iters_, floor_=None):
            # host-side args are numpy-typed on purpose: jit transfers at
            # dispatch; eager jnp wraps cost one device program per arg
            return (
                np.asarray(self.T_cw_fej, np.float32),
                np.asarray(self.eps, np.float32),
                np.asarray(self.K0), np.asarray(self.K0),
                np.asarray(self.slot_used), np.asarray(self.frame_prior),
                np.full(4, s.initial_calib_hessian / 2500.0, np.float32),
                np.asarray(self.aff, np.float32),
                np.asarray(self.exposure, np.float32),
                np.asarray(self.HM, np.float32),
                np.asarray(self.bM, np.float32),
                np.int32(slot), np.asarray(self.fe_th, np.float32),
                np.asarray(self.slot_flagged),
                pool["u"], pool["v"],
                pool["idepth"], pool["host"],
                pool["color"], pool["weights"],
                pool["is_sensor"], pool["prior"],
                pool["pt_valid"], pool["type"],
                pool["quality"],
                pool["idepth_hessian"],
                pool["num_good_res"],
                pool["res_active"], pool["res_state"],
                pool["res_is_new"],
                pool["matcher_px"], pool["matcher_valid"],
                self.dI0_stack,
                flat_newest, offs, ws, hs, flat_stack,
                np.asarray(ref_idx_newest, np.int32),
                np.asarray(ref_idx_multi, np.int32),
                np.asarray(multi_mask),
                frame["dI"],
                np.int32(iters_), np.int32(s.min_opt_iterations),
                np.float32(s.th_opt_iterations),
                np.bool_(s.force_accept_step),
                np.float32(s.ba_lm_diag_floor if floor_ is None else floor_),
                np.asarray(prior_marg), np.float32(s.marg_weight_fac),
                np.int32(s.min_good_active_res_for_marg),
                np.int32(s.min_good_res_for_marg),
                np.float32(s.min_idepth_h_marg))

        def dispatch(iters_, floor_=None):
            return self._block(kf_opt_step(*kf_args(iters_, floor_),
                                           **statics))

        # matcher_px / matcher_valid / center are NOT pulled: their only
        # host consumer is checkpoint.save (kf_opt reads them from the
        # device chain), and the ~0.7 MB payload cost ~35 ms/KF at the
        # ~20 MB/s tunnel download rate — _sync_pool_mirrors() pulls them
        # on demand instead
        pull_keys = ["eps", "calib", "T_cw_fej", "feth", "energy", "HM", "bM",
                     "stats_out", "idepth", "new_state", "pt_valid",
                     "num_good_res", "idepth_hessian", "res_active",
                     "match_overflow", "match_diag", "match_diag_p2",
                     "res_diag", "death_diag"]
        if s.log_stuff:
            pull_keys += ["H_final", "b_final", "nullspaces", "rmse"]
        # dispatch DESCRIPTOR: the fleet driver (MultiSystem) folds aligned
        # KF rounds from several sequences into ONE vmapped program
        # (kf_ops.kf_opt_step_batch); the result stays device-resident
        out = yield ("dispatch_kf_opt", kf_args(iters), statics)
        self._apply_kf_device_chain(out, slot)
        ctx = dict(out=out, slot=slot, dispatch=dispatch,
                   pull_keys=pull_keys, iters=iters)

        if self.s.pipelined_frames and self.s.deferred_kf_readback:
            # deferred control readback (the reference's mapping-thread
            # overlap, FullSystem.cpp:902-1012): the next frame tracks
            # against the device-chained post-BA state; the host applies
            # mirrors/veto/telemetry at the NEXT frame's drain, when the
            # async-copied pull is already host-local
            self._track_const_dev = _window_track_consts(
                out["eps"], out["T_cw_fej"], np.int32(slot),
                np.asarray(self.track_ref_aff, np.float32),
                np.asarray(self.aff, np.float32),
                np.asarray(self.exposure, np.float32), out["calib"],
                np.asarray(self.slot_used, bool))
            small_dev = {k: out[k] for k in pull_keys}
            for v in jax.tree.leaves(small_dev):
                if hasattr(v, "copy_to_host_async"):
                    v.copy_to_host_async()
            self._deferred_kf = (small_dev, ctx)
            return
        small = yield {k: out[k] for k in pull_keys}
        self._resolve_kf_readback(small, ctx)

    def _apply_kf_device_chain(self, out, slot):
        """Chain the kf_opt outputs that downstream DEVICE programs consume
        (active pool, tracking reference) — no readback required; runs at
        dispatch time in both sync and deferred modes."""
        self._kf_dev = dict(
            self._kf_dev,
            idepth=out["idepth"], res_state=out["new_state"],
            pt_valid=out["pt_valid"], num_good_res=out["num_good_res"],
            idepth_hessian=out["idepth_hessian"],
            res_active=out["res_active"], matcher_px=out["matcher_px"],
            matcher_valid=out["matcher_valid"])
        self._centers_dev = out["center"]
        self.track_ref = out["track_ref"]
        self.track_ref_slot = slot
        self.track_ref_aff = self.aff[slot].copy()
        self.first_coarse_rmse = -1.0
        self._pt_dev = None
        self._track_const_dev = None

    def _resolve_deferred_kf(self):
        """Apply a stashed deferred kf_opt control readback (host mirrors,
        veto, telemetry, observers). The pull data was async-copied at
        dispatch, so the device_get here is ~free."""
        if self._deferred_kf is None:
            return
        small_dev, ctx = self._deferred_kf
        self._deferred_kf = None
        with self.telemetry.stage("kf.resolve"):
            with self.telemetry.sync():
                small = jax.device_get(small_dev)
            self._resolve_kf_readback(small, ctx)

    def _resolve_kf_readback(self, small, ctx):
        s = self.s
        out = ctx["out"]
        slot = ctx["slot"]
        dispatch = ctx["dispatch"]
        pull_keys = ctx["pull_keys"]

        # --- BA step sanity veto (robustness deviation, PARITY.md) ---
        # With the FEJ-anchored residual the LM accept energy is governed by
        # the prior/marg terms; a window direction left unconstrained by a
        # thinned residual graph can be flung meters by the marg pull and
        # still be "accepted" (measured: a single -5.4 m z step at an
        # otherwise-healthy keyframe cascaded into total point starvation).
        # If the accepted LM moved any window pose implausibly far from its
        # pre-BA shell pose, re-run the keyframe tail with BA disabled —
        # the tracked pose is cm-accurate, so a multi-meter BA "correction"
        # is categorically a solver pathology, not information.
        def _step_insane(sm):
            worst_t = worst_r = np.inf
            try:
                T_cw_new = se3.se3_exp_np(np.array(sm["eps"], np.float64)) \
                    @ np.array(sm["T_cw_fej"], np.float64)
                T_wc_new = np.linalg.inv(T_cw_new)
                if np.isfinite(T_wc_new).all():
                    worst_t = worst_r = 0.0
                    for sl in self.order:
                        pre = self.shells[self.frame_shell_idx[sl]]["T_wc"]
                        dT = np.linalg.inv(pre) @ T_wc_new[sl]
                        worst_t = max(worst_t,
                                      float(np.linalg.norm(dT[:3, 3])))
                        c = (np.trace(dT[:3, :3]) - 1.0) / 2.0
                        worst_r = max(worst_r,
                                      float(np.arccos(np.clip(c, -1, 1))))
            except np.linalg.LinAlgError:
                pass   # degenerate BA result -> veto
            return (worst_t > s.ba_step_veto_m
                    or worst_r > s.ba_step_veto_rad
                    or not np.isfinite(sm["energy"]))

        if s.ba_step_veto_m > 0 and len(self.order) >= 4 \
                and _step_insane(small):
            self.telemetry.counters["ba_step_veto"] += 1
            if s.ba_veto_damped_retry > 0:
                # trust-region retry: re-run BA heavily damped instead of
                # disabling it — idepths and small pose corrections keep
                # flowing in degraded regimes (flag-gated; the binary veto
                # below remains the fail-safe)
                out = dispatch(ctx["iters"], s.ba_veto_damped_retry)
                small = jax.device_get({k: out[k] for k in pull_keys})
                if not _step_insane(small):
                    out2 = None
                else:
                    self.telemetry.counters["ba_step_veto_hard"] += 1
                    out2 = dispatch(0)
            else:
                out2 = dispatch(0)
            if out2 is not None:
                out = out2
                small = jax.device_get({k: out[k] for k in pull_keys})
            # the veto replaces the BA output: re-chain the device pools
            # and (deferred mode) the tracking constants. In deferred mode
            # the ONE frame already in flight tracked against the vetoed
            # chain — the same one-frame exposure the reference's
            # tracking/mapping overlap has while mapping decides.
            self._apply_kf_device_chain(out, slot)
            if self.s.pipelined_frames and self.s.deferred_kf_readback:
                self._track_const_dev = _window_track_consts(
                    out["eps"], out["T_cw_fej"], np.int32(slot),
                    np.asarray(self.track_ref_aff, np.float32),
                    np.asarray(self.aff, np.float32),
                    np.asarray(self.exposure, np.float32), out["calib"],
                    np.asarray(self.slot_used, bool))

        if s.log_stuff:
            self.telemetry.log_hessian(len(self.kf_shells) - 1,
                                       small["H_final"], small["b_final"],
                                       small["nullspaces"])

        if not np.isfinite(small["energy"]):
            print("KF Tracking failed: LOST!")
            self.is_lost = True
            return

        # surface matcher lane-cap truncation (silent starvation caused
        # round 2's yaw-drift bug; bench asserts these stay zero)
        ovf = np.asarray(small["match_overflow"])
        self.telemetry.counters["match_overflow_p1"] += int(ovf[0])
        self.telemetry.counters["match_overflow_p2"] += int(ovf[1])
        # matcher/residual failure-mode splits for drift diagnostics
        self.last_match_diag = np.asarray(small["match_diag"])
        self.last_match_diag_p2 = np.asarray(small["match_diag_p2"])
        self.last_res_diag = np.asarray(small["res_diag"])
        self.last_death_diag = np.asarray(small["death_diag"])

        # window state (device chain applied in _apply_kf_device_chain)
        self.T_cw_fej = np.array(small["T_cw_fej"], np.float64)
        self.eps = np.array(small["eps"], np.float64)
        self.K0 = np.array(small["calib"], np.float32)
        self.fe_th = np.array(small["feth"], np.float32)
        self.HM = np.array(small["HM"], np.float64)
        self.bM = np.array(small["bM"], np.float64)
        self.slot_stats_out += np.array(small["stats_out"], np.int64)

        # pool state
        self.pt["idepth"] = np.array(small["idepth"], np.float32)
        self.res_state = np.array(small["new_state"])
        self.pt_valid = np.array(small["pt_valid"])
        self.pt["num_good_res"] = np.array(small["num_good_res"])
        self.pt["idepth_hessian"] = np.array(small["idepth_hessian"],
                                             np.float32)
        self.res_active = np.array(small["res_active"])
        # matcher_px / matcher_valid / centers host mirrors go STALE here
        # by design; the device chain (_kf_dev, _centers_dev) is
        # authoritative and _sync_pool_mirrors() refreshes on demand
        self.res_is_new[:] = False

        # shell updates for in-window frames (optimize():494-500)
        T_wc = np.linalg.inv(self.T_cw)
        # diagnostics: how far this BA moved each window frame's shell
        self.last_ba_window_deltas = {
            int(self.frame_kf_id[sl]): float(np.linalg.norm(
                T_wc[sl][:3, 3]
                - self.shells[self.frame_shell_idx[sl]]["T_wc"][:3, 3]))
            for sl in self.order}
        for sl in self.order:
            self.shells[self.frame_shell_idx[sl]]["T_wc"] = T_wc[sl]
            self.shells[self.frame_shell_idx[sl]]["aff"] = self.aff[sl]

        # frame-marginalization host bookkeeping (device already folded the
        # flagged slots into HM/bM and dropped their residuals/points)
        if any(self.slot_flagged[x] for x in self.order):
            from sdv_loam_tpu.system.kf_ops import im_clear_slots
            self._im_pool = im_clear_slots(self._im_pool_dev(),
                                           jnp.asarray(self.slot_flagged))
        for sl in [x for x in self.order if self.slot_flagged[x]]:
            imh = self.im_valid & (self.im["host"] == sl)
            self.im_valid[imh] = False
            # frame-lifetime bookkeeping (printFrameLifetimes,
            # FullSystem.cpp:1501-1532): KF index at marginalization
            self.shells[self.frame_shell_idx[sl]]["marginalized_at"] = \
                len(self.kf_shells)
            self.slot_used[sl] = False
            self.slot_flagged[sl] = False
            self.order.remove(sl)
            self.pyr_slots[sl] = None
            self.flat_slots[sl] = None
            self.eps[sl] = 0.0
            self.frame_prior[sl] = 0.0

        self._kf_publish()

    def _flag_frames_for_marginalization(self):
        """flagFramesForMarginalization (FullSystemMarginalize.cpp:25-94)."""
        s = self.s
        n_window = len(self.order)
        flagged = 0
        for slot in self.order:
            n_in = int((self.pt_valid & (self.pt["host"] == slot)).sum()
                       + (self.im_valid & (self.im["host"] == slot)).sum())
            n_out = int(self.slot_stats_out[slot])
            a_rel = np.exp(self.aff[self.order[-1]][0] - self.aff[slot][0])
            if ((n_in < s.min_points_remaining * (n_in + n_out)
                 or abs(np.log(max(a_rel, 1e-9))) > s.max_log_aff_fac_in_window)
                    and n_window - flagged > s.min_frames):
                self.slot_flagged[slot] = True
                flagged += 1
                # marginalization forensics: age + which criterion
                self.flag_hist.append((
                    int(self.frame_kf_id[self.order[-1]]
                        - self.frame_kf_id[slot]),
                    "depleted" if n_in < s.min_points_remaining
                    * (n_in + n_out) else "affine", n_in, n_out))
                del self.flag_hist[:-256]
        if n_window - flagged >= s.max_frames:
            # distance-score heuristic
            latest_id = self.frame_kf_id[self.order[-1]]
            T_cw = self.T_cw
            best_score, best_slot = 1.0, None
            for slot in self.order:
                fid = self.frame_kf_id[slot]
                if fid > latest_id - s.min_frame_age or fid == 0:
                    continue
                dist_score = 0.0
                for slot2 in self.order:
                    fid2 = self.frame_kf_id[slot2]
                    if fid2 > latest_id - s.min_frame_age + 1 or slot2 == slot:
                        continue
                    d = np.linalg.norm(T_cw[slot][:3, 3] - T_cw[slot2][:3, 3])
                    dist_score += 1.0 / (1e-5 + d)
                d_latest = np.linalg.norm(
                    T_cw[slot][:3, 3] - T_cw[self.order[-1]][:3, 3])
                dist_score *= -np.sqrt(d_latest)
                if dist_score < best_score:
                    best_score, best_slot = dist_score, slot
            if best_slot is not None:
                self.slot_flagged[best_slot] = True
                self.flag_hist.append((
                    int(self.frame_kf_id[self.order[-1]]
                        - self.frame_kf_id[best_slot]), "distance",
                    -1, -1))
                del self.flag_hist[:-256]

    def _make_new_traces_steps(self, frame, slot):
        """Point selection + immature point creation (makeNewTraces).

        The whole device side (cascade + colors + scores + depth gather) is
        one fused program with compacted output: one host round-trip per
        selection pass (select.select_compact)."""
        scan = frame["scan"]
        lidar_area = frame["bbox_area"]
        img_area = self.w * self.h
        density = (lidar_area / img_area) * self.s.desired_immature_density

        cand = scan["depth_map"] > 0
        # seeded by the frame's own id, NOT len(self.shells): in
        # pipelined mode the NEXT frame's shell is already appended
        # when this runs, and a mode-dependent seed would make the
        # pipelined trajectory diverge from sequential mode
        gens = [make_maps_compact_steps(
            frame["dI"][0], frame["abs_grad"], cand, scan["depth_map"],
            scan["px_u_map"], scan["px_v_map"],
            density, self._next_key(), self.pot_state, self.s,
            cap=self.s.n_select_cap,
            sub_seed=self.s.seed + frame["shell"]["id"] + 1)]
        if frame["add_feat"]:
            # monocular supplement pass (ground-dominated scenes) — an
            # independent selection, so its dispatch+pull rides the same
            # device_get as the LiDAR pass's (joint rounds below)
            gens.append(make_maps_compact_steps(
                frame["dI"][0], frame["abs_grad"],
                jnp.ones((self.h, self.w), bool), scan["depth_map"],
                scan["px_u_map"], scan["px_v_map"],
                self.s.desired_immature_density, self._next_key(),
                self.pot_state_mono, self.s, cap=self.s.n_select_cap,
                sub_seed=self.s.seed + 7919 + frame["shell"]["id"] + 1))
        results = yield from _joint_select_rounds(gens)
        out, keep = results[0]
        lid_keep = keep & out["finite"]
        xs = out["u"][lid_keep]
        ys = out["v"][lid_keep]
        n_sens = int(lid_keep.sum())

        # optional monocular points when the scene is ground-dominated
        mono = None
        if frame["add_feat"]:
            mout, mkeep = results[1]
            # suppress around selected LiDAR points (setMask: ±pot in x,
            # ±1 in y) — vectorized membership test on pixel ids
            pot = self.pot_state_mono.get("pot", 3)
            dxs = np.arange(-pot, pot + 1)
            dys = np.array([-1, 0, 1])
            sx = np.clip(xs[:, None, None] + dxs[None, :, None],
                         0, self.w - 1)
            sy = np.clip(ys[:, None, None] + dys[None, None, :],
                         0, self.h - 1)
            suppressed = np.zeros(self.h * self.w, bool)
            suppressed[(sy * self.w + sx).astype(np.int64).ravel()] = True
            mk = mkeep & mout["finite"]
            mpix = (mout["v"] * self.w + mout["u"]).astype(np.int64)
            mk &= ~suppressed[np.clip(mpix, 0, self.h * self.w - 1)]
            mono = (mout, mk)

        sel_src = [(out, lid_keep, True)]
        if mono is not None:
            sel_src.append((mono[0], mono[1], False))
        all_u = np.concatenate([s[0]["u"][s[1]] for s in sel_src]).astype(
            np.float32)
        all_v = np.concatenate([s[0]["v"][s[1]] for s in sel_src]).astype(
            np.float32)
        col = np.concatenate([s[0]["color"][s[1]] for s in sel_src])
        wgt = np.concatenate([s[0]["weights"][s[1]] for s in sel_src])
        gradH = np.concatenate([s[0]["gradH"][s[1]] for s in sel_src])
        gcen = np.concatenate([s[0]["gcen"][s[1]] for s in sel_src])
        score = np.concatenate([s[0]["score"][s[1]] for s in sel_src])
        z = np.concatenate([out["z"][lid_keep],
                            np.zeros(len(all_u) - n_sens, np.float32)])
        if all_u.size == 0:
            self.last_new_traces = 0
            return
        max_score = score[:n_sens].max() if n_sens else 1.0

        rows = self._free_im_rows(len(all_u))
        self.last_new_traces = int(len(rows))   # per-KF insert diagnostics
        sel = np.arange(len(all_u))[:len(rows)]
        im = self.im
        self.im_valid[rows] = True
        im["u"][rows] = all_u[sel]
        im["v"][rows] = all_v[sel]
        im["host"][rows] = slot
        im["color"][rows] = col[sel]
        im["weights"][rows] = wgt[sel]
        im["gradH"][rows] = gradH[sel]
        im["grad_center"][rows] = gcen[sel]
        im["energy_th"][rows] = 8 * self.s.outlier_th
        im["quality"][rows] = 10000.0
        im["pixel_interval"][rows] = 0.0
        is_sens = sel < n_sens
        im["is_sensor"][rows] = is_sens
        zsel = z[sel]
        idep = np.where(zsel > 0, 1.0 / np.maximum(zsel, 1e-6), 0.0)
        im["idepth_min"][rows] = np.where(is_sens, idep, 0.0)
        im["idepth_max"][rows] = np.where(is_sens, idep, np.inf)
        im["status"][rows] = np.where(is_sens, trace_ops.IPS_SKIPPED,
                                      trace_ops.IPS_UNINITIALIZED)
        # CORNER/EDGELET split by Shi-Tomasi (makeNewTraces:1330-1338);
        # monocular points default to CORNER
        sc = score[sel]
        im["type"][rows] = np.where(is_sens & (sc <= 0.01 * max_score),
                                    EDGELET, CORNER)
        im["my_type"][rows] = 1.0

        # mirror the inserts into the device-resident immature pool
        from sdv_loam_tpu.system.kf_ops import IM_FIELDS, commit_im_rows
        if rows.size:
            (rows_p,), nn = self._pad_bucket([rows.astype(np.int32)])
            valid = np.arange(rows_p.shape[0]) < nn
            vals = {f: self.im[f][rows_p] for f in IM_FIELDS}
            self._im_pool = commit_im_rows(
                self._im_pool_dev(), jnp.asarray(rows_p),
                jnp.asarray(valid),
                {k: jnp.asarray(v) for k, v in vals.items()})

    def _activate_steps(self, frame, newest_slot):
        """activatePointsMT (FullSystem.cpp:569-723)."""
        s = self.s
        n_pts = int(self.pt_valid.sum())
        # density-controlled activation distance
        d = self.current_min_act_dist
        t = s.desired_point_density
        if n_pts < t * 0.66:
            d -= 0.8
        if n_pts < t * 0.8:
            d -= 0.5
        elif n_pts < t * 0.9:
            d -= 0.2
        elif n_pts < t:
            d -= 0.1
        if n_pts > t * 1.5:
            d += 0.8
        if n_pts > t * 1.3:
            d += 0.5
        if n_pts > t * 1.15:
            d += 0.2
        if n_pts > t:
            d += 0.1
        self.current_min_act_dist = float(np.clip(d, 0.0, 4.0))

        # --- the whole stage (distance map + eligibility + spread test +
        # activation GN) is ONE device program with ONE readback ---
        T_cw = self.T_cw
        T_new = T_cw[newest_slot]
        w1, h1 = self.calib.w[1], self.calib.h[1]
        K1 = np.eye(3)
        K1[0, 0], K1[1, 1] = self.calib.fx[1], self.calib.fy[1]
        K1[0, 2], K1[1, 2] = self.calib.cx[1], self.calib.cy[1]
        K0i = np.linalg.inv(np.array(
            [[self.K0[0], 0, self.K0[2]], [0, self.K0[1], self.K0[3]],
             [0, 0, 1]]))
        F = self.F
        KRKi1 = np.tile(np.eye(3, dtype=np.float32), (F, 1, 1))
        Kt1 = np.zeros((F, 3), np.float32)
        for slot in self.order:
            T_h2n = T_new @ np.linalg.inv(T_cw[slot])
            KRKi1[slot] = K1 @ T_h2n[:3, :3] @ K0i
            Kt1[slot] = K1 @ T_h2n[:3, 3]
        R_pair, t_pair, aff_pair = self._pair_transforms()

        im = self.im
        pool_im = self._im_pool_dev()
        pool_pt = self._kf_dev_pool()
        # dispatch DESCRIPTOR (fleet driver folds aligned sequences' rounds
        # into one vmapped program, kf_ops.activate_full_batch)
        dev = yield (
            "dispatch_activate",
            (pool_im,
             pool_pt["u"], pool_pt["v"],
             pool_pt["idepth"], pool_pt["host"],
             pool_pt["pt_valid"],
             np.int32(newest_slot), np.asarray(self.slot_used),
             np.asarray(self.slot_flagged),
             np.asarray(KRKi1, np.float32), np.asarray(Kt1, np.float32),
             np.asarray(R_pair, np.float32), np.asarray(t_pair, np.float32),
             np.asarray(aff_pair, np.float32),
             self.dI0_stack, np.asarray(self.K0),
             np.float32(self.current_min_act_dist),
             np.float32(s.min_trace_quality),
             np.float32(s.min_idepth_h_act)),
            dict(w=self.w, h=self.h, w1=w1, h1=h1, n_frames=F,
                 # bucket the activation-lane cap to the live immature count
                 # (its strict upper bound): the activation GN's content is
                 # proportional to a_cap, and the pool is typically ~25% full
                 # (short bucket ladder -> bounded compile variants)
                 a_cap=next((c for c in (512, 1024, 2048)
                             if int(self.im_valid.sum()) <= c), self.M),
                 gn_iters=s.gn_its_on_point_activation))
        # chain the in-program pool removals; host bookkeeping below applies
        # the identical updates to the host mirror
        self._im_pool = dict(pool_im, im_valid=dev["im_valid"],
                             status=dev["im_status"])
        out = yield {k: dev[k] for k in
                     ("dead", "kill", "drop_oob", "cand_idx", "lane_valid",
                      "success", "idepth", "inlier_targets")}

        self._last_act = None
        dead = out["dead"]
        kill = out["kill"]
        drop_oob = out["drop_oob"]
        for slot in self.order:
            hm = im["host"] == slot
            self.slot_stats_out[slot] += int(((dead | kill) & hm).sum())
        self.im_valid[dead | kill | drop_oob] = False

        lane = out["lane_valid"]
        idx = out["cand_idx"][lane]
        success = out["success"][lane]
        new_idepth = out["idepth"][lane]
        inlier_t = out["inlier_targets"][lane]
        if idx.size == 0:
            return

        ok_idx = idx[success]
        rows = self._free_pt_rows(ok_idx.size)
        ok_idx = ok_idx[:rows.size]
        self._just_activated = rows
        self._last_act = rows
        if rows.size:
            g = im["grad_center"][ok_idx]
            self.pt_valid[rows] = True
            self.pt["u"][rows] = im["u"][ok_idx]
            self.pt["v"][rows] = im["v"][ok_idx]
            self.pt["idepth"][rows] = new_idepth[success][:rows.size]
            self.pt["host"][rows] = im["host"][ok_idx]
            self.pt["color"][rows] = im["color"][ok_idx]
            self.pt["weights"][rows] = im["weights"][ok_idx]
            self.pt["is_sensor"][rows] = im["is_sensor"][ok_idx]
            self.pt["type"][rows] = im["type"][ok_idx]
            self.pt["prior"][rows] = 0.0
            self.pt["quality"][rows] = g
            self.pt["num_good_res"][rows] = 0
            self.res_active[rows, :] = False
            self.res_state[rows, :] = backend.RES_IN
            self.res_is_new[rows, :] = False
            self.matcher_valid[rows, :] = False
            inl = inlier_t[success][:rows.size]
            for slot in self.order:
                tm = inl[:, slot] & self.slot_used[slot] & \
                    (im["host"][ok_idx] != slot)
                self.res_active[rows[tm], slot] = True
                self.res_is_new[rows[tm], slot] = True

        # activated or failed-with--1: remove from immature pool
        self.im_valid[idx[success]] = False
        failed = ~success
        # failure == reference returning (-1): drop
        self.im_valid[idx[failed]] = False
        for slot in self.order:
            self.slot_stats_out[slot] += int((im["host"][idx[failed]] == slot).sum())

    def _set_coarse_tracking_ref(self, newest_slot):
        """makeCoarseDepthL0: sensor points splatted into the newest KF."""
        us, vs, ids, ws = [], [], [], []
        m_new = self.pt_valid & self.pt["is_sensor"] & \
            (self.pt["host"] == newest_slot)
        if m_new.any():
            us.append(self.pt["u"][m_new].astype(np.int32))
            vs.append(self.pt["v"][m_new].astype(np.int32))
            ids.append(self.pt["idepth"][m_new])
            hdif = 1.0 / np.maximum(self.pt["idepth_hessian"][m_new], 1e-10)
            ws.append(np.sqrt(1e-3 / (hdif + 1e-12)))
        m_other = self.pt_valid & self.pt["is_sensor"] & \
            (self.pt["host"] != newest_slot) & \
            self.res_active[:, newest_slot] & \
            (self.res_state[:, newest_slot] == backend.RES_IN)
        if m_other.any():
            c = self.centers[m_other, newest_slot]
            us.append((c[:, 0] + 0.5).astype(np.int32))
            vs.append((c[:, 1] + 0.5).astype(np.int32))
            ids.append(c[:, 2])
            hdif = 1.0 / np.maximum(self.pt["idepth_hessian"][m_other], 1e-10)
            ws.append(np.sqrt(1e-3 / (hdif + 1e-12)))
        if not us:
            return
        u = np.concatenate(us)
        v = np.concatenate(vs)
        idp = np.concatenate(ids).astype(np.float32)
        wt = np.concatenate(ws).astype(np.float32)
        ok = (u >= 0) & (u < self.w) & (v >= 0) & (v < self.h) & (idp > 0)
        (u, v, idp, wt, ok), _ = self._pad_bucket([u, v, idp, wt, ok])
        id0, w0 = splat_idepth(jnp.asarray(u), jnp.asarray(v),
                               jnp.asarray(idp), jnp.asarray(wt),
                               jnp.asarray(ok), self.w, self.h)
        self.track_ref = build_track_ref(self.pyr_slots[newest_slot], id0, w0,
                                         self.levels,
                                         cap=self.s.track_ref_caps)
        self.track_ref_slot = newest_slot
        self.track_ref_aff = self.aff[newest_slot].copy()
        self.first_coarse_rmse = -1.0

    # ------------------------------------------------------------------
    # output
    # ------------------------------------------------------------------

    def get_trajectory(self) -> np.ndarray:
        """(n, 4, 4) camToWorld per input frame (printResult)."""
        self.flush()
        return np.stack([sh["T_wc"] for sh in self.shells])
