"""Lockstep multi-sequence odometry — the batch scaling axis on one chip.

The reference is a single-sequence, single-process system (SURVEY.md §2.6);
the TPU build's throughput axis is B independent sequences sharing one chip.
Every `FullSystem.frame_steps` generator yields either a pytree of device
values or a dispatch DESCRIPTOR at each host-sync point; `MultiSystem`
advances all B generators in phase and

  1. folds all B sequences' per-frame track descriptors into ONE vmapped
     device program (`ops.frame_step.track_frame_step_batch`). The track
     program is per-gather-op-floor bound, not lane bound (ROADMAP round-3
     perf findings), so B sequences inside the same ops cost far less than
     B programs;
  2. batches every stage's readbacks into a single `jax.device_get` — over
     the tunneled TPU a sync costs ~30-100 ms regardless of payload.

The stage-barrier yield in `frame_steps` keeps all B generators phase-
aligned at the track dispatch, so the batched round always sees every
live sequence's descriptor together.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_BATCH_TOLS = ("struct_pose_e_tol", "struct_pose_max_dt")


def _kind(req):
    if isinstance(req, tuple) and len(req) == 3 and isinstance(req[0], str) \
            and req[0].startswith("dispatch_"):
        return req[0]
    return None


def _leaf_shapes(args):
    return tuple(getattr(x, "shape", ()) for x in jax.tree.leaves(args))


@jax.jit
def _slice_lane(tree, j):
    """Extract one batch lane from a batched result pytree in ONE device
    program (per-leaf host slicing would dispatch ~30 tiny programs per
    sequence at ~5 ms streamed overhead each, CLAUDE.md perf notes)."""
    return jax.tree.map(lambda x: x[j], tree)


class MultiSystem:
    """Drive B FullSystem instances in stage-lockstep."""

    def __init__(self, systems, batch_track: bool = True,
                 host_workers: int | None = None):
        self.systems = list(systems)
        self.batch_track = batch_track
        # per-sequence host staging (the numpy control code between yields)
        # is independent across systems; advancing the B generators on a
        # thread pool overlaps it (numpy releases the GIL, jax dispatch is
        # thread-safe). host_workers=0 forces the serial loop.
        n_workers = min(8, len(self.systems)) if host_workers is None \
            else host_workers
        self._pool = None
        if n_workers > 1 and len(self.systems) > 1:
            from concurrent.futures import ThreadPoolExecutor
            self._pool = ThreadPoolExecutor(max_workers=n_workers)

    def __len__(self):
        return len(self.systems)

    def _advance(self, pending, to_send):
        """One lockstep step of every live generator -> {i: yielded req}."""
        reqs = {}
        if self._pool is None:
            for i in list(pending):
                try:
                    reqs[i] = pending[i].send(to_send.get(i))
                except StopIteration:
                    pending.pop(i)
            return reqs
        futs = {i: self._pool.submit(pending[i].send, to_send.get(i))
                for i in list(pending)}
        for i, f in futs.items():
            try:
                reqs[i] = f.result()
            except StopIteration:
                pending.pop(i)
        return reqs

    def add_frames(self, frames):
        """Process one frame per sequence.

        frames: list of (image, cloud, timestamp) or None (sequence done),
        one per system. All device pulls of a given pipeline stage are
        batched into a single device_get; aligned track descriptors are
        folded into one vmapped program.
        """
        pending = {}
        for i, (fs, fr) in enumerate(zip(self.systems, frames)):
            if fr is None:
                continue
            img, cloud, ts = fr
            pending[i] = fs.frame_steps(img, cloud, ts)

        to_send = {i: None for i in pending}
        while pending:
            reqs = self._advance(pending, to_send)
            if not reqs:
                break
            to_send = self._resolve(reqs)

    def _resolve(self, reqs):
        """Dispatch + pull one lockstep round of requests.

        Aligned same-kind descriptors batch into one vmapped program:
        track results are pulled (the generators consume host values),
        pyramid/LiDAR results stay device-resident (sliced lazy views per
        sequence). Misaligned or odd-shaped requests fall back to
        per-sequence dispatch."""
        out = {}
        pull_batches = []       # [(ids, batched device result)] — results
        # the generators consume as HOST values: pulled in the shared
        # device_get below, then host-sliced per lane
        if self.batch_track:
            ids, dev = self._try_batch_track(reqs)
            if ids:
                pull_batches.append((ids, dev))
                for i in ids:
                    reqs.pop(i)
            ids = [i for i, r in reqs.items()
                   if _kind(r) == "dispatch_select"]
            if len(ids) >= 2:
                dev = self._try_batch_select([reqs[i] for i in ids])
                if dev is not None:
                    pull_batches.append((ids, dev))
                    for i in ids:
                        reqs.pop(i)
            for kind, fn in (("dispatch_pyramid", self._batch_pyramid),
                             ("dispatch_lidar", self._batch_lidar)):
                ids = [i for i, r in reqs.items() if _kind(r) == kind]
                if len(ids) >= 2:
                    dev = fn([reqs[i] for i in ids], ids)
                    for j, i in enumerate(ids):
                        out[i] = _slice_lane(dev, np.int32(j))
                        reqs.pop(i)
            for kind in ("dispatch_kf_opt", "dispatch_activate",
                         "dispatch_trace"):
                ids = [i for i, r in reqs.items() if _kind(r) == kind]
                if len(ids) < 2:
                    continue
                dev = self._batch_fused(kind, [reqs[i] for i in ids])
                if dev is not None:
                    for j, i in enumerate(ids):
                        out[i] = _slice_lane(dev, np.int32(j))
                        reqs.pop(i)
        singles = {}
        for i, r in reqs.items():
            res = self.systems[i]._dispatch_request(r)
            if self.systems[i]._is_device_result(res):
                out[i] = res[1]
            else:
                singles[i] = res
        tele = self.systems[0].telemetry
        with tele.sync():
            pulled, bpulled = jax.device_get((singles, pull_batches))
        out.update(pulled)
        for ids, bp in bpulled:
            for j, i in enumerate(ids):
                out[i] = jax.tree.map(lambda x, j=j: x[j], bp)
        return out

    def _try_batch_track(self, reqs):
        track_ids = [i for i, r in reqs.items()
                     if _kind(r) == "dispatch_track"]
        if len(track_ids) < 2:
            return [], None
        kw0 = reqs[track_ids[0]][2]
        sh0 = _leaf_shapes(reqs[track_ids[0]][1])
        if not all(reqs[i][2] == kw0 and _leaf_shapes(reqs[i][1]) == sh0
                   for i in track_ids[1:]):
            return [], None
        from sdv_loam_tpu.ops.frame_step import track_frame_step_batch
        track_reqs = [reqs[i] for i in track_ids]
        etol = np.asarray([np.float32(r[2]["struct_pose_e_tol"])
                           for r in track_reqs])
        mdt = np.asarray([np.float32(r[2]["struct_pose_max_dt"])
                          for r in track_reqs])
        statics = {k: v for k, v in kw0.items() if k not in _BATCH_TOLS}
        # per-lane arg tuples go in unstacked: the stack happens inside the
        # jitted batch wrapper (one fused program, not ~30 eager stacks)
        return track_ids, track_frame_step_batch(
            tuple(r[1] for r in track_reqs), etol, mdt, **statics)

    def _try_batch_select(self, sreqs):
        """One vmapped selection program over aligned keyframe selection
        descriptors. The density-feedback `pot` is a compile-time static
        that can differ between sequences — batching requires equal
        statics (usually true in steady state); otherwise fall back."""
        sh0 = _leaf_shapes(sreqs[0][1])
        if not all(r[2] == sreqs[0][2] and _leaf_shapes(r[1]) == sh0
                   for r in sreqs[1:]):
            return None
        from sdv_loam_tpu.ops.select import select_compact_batch
        return select_compact_batch(tuple(r[1] for r in sreqs),
                                    **sreqs[0][2])

    def _batch_fused(self, kind, kreqs):
        """Fold aligned keyframe-stage descriptors into ONE vmapped program
        (the per-sequence programs are per-gather-op-floor bound; B
        keyframes inside the same ops cost far less than B programs).
        Lane-cap statics are widened to the fleet max — a larger cap is a
        strict superset (more compaction lanes than needed), so the
        per-lane results are unchanged. Returns None when the requests are
        not shape/static-compatible (caller falls back to per-sequence
        dispatch)."""
        from sdv_loam_tpu.ops import trace as trace_ops
        from sdv_loam_tpu.system import kf_ops
        batch_fn, caps = {
            # cap statics widenable per kind; 0 = fraction-of-pool default,
            # the widest setting (kf_opt lane_cap semantics)
            "dispatch_kf_opt": (kf_ops.kf_opt_step_batch,
                                ("p1_cap", "p2_cap")),
            "dispatch_activate": (kf_ops.activate_full_batch, ("a_cap",)),
            "dispatch_trace": (trace_ops.trace_points_batch, ()),
        }[kind]
        sh0 = _leaf_shapes(kreqs[0][1])
        if not all(_leaf_shapes(r[1]) == sh0 for r in kreqs[1:]):
            return None
        statics = dict(kreqs[0][2])
        for r in kreqs[1:]:
            st = r[2]
            if {k: v for k, v in st.items() if k not in caps} != \
                    {k: v for k, v in statics.items() if k not in caps}:
                return None
            for c in caps:
                a, b = statics.get(c, 0), st.get(c, 0)
                statics[c] = 0 if (a == 0 or b == 0) else max(a, b)
        return batch_fn(tuple(r[1] for r in kreqs), **statics)

    def _batch_pyramid(self, preqs, ids):
        """One vmapped pyramid program over the aligned image descriptors
        (one stacked HOST upload, one program)."""
        from sdv_loam_tpu.ops.pyramid import make_images_batch
        levels = self.systems[ids[0]].levels
        assert all(self.systems[i].levels == levels for i in ids)
        imgs = np.stack([np.asarray(r[1][0], np.float32) for r in preqs])
        return make_images_batch(imgs, levels)

    def _batch_lidar(self, lreqs, ids):
        """One vmapped scan-preprocess program, fleet-shared cloud bucket."""
        from sdv_loam_tpu.ops.lidar import preprocess_scan_batch
        systems = [self.systems[i] for i in ids]
        w, h = systems[0].w, systems[0].h
        assert all(fs.w == w and fs.h == h for fs in systems)
        cap = max(fs._bucket_cloud(r[1][0])[2]
                  for fs, r in zip(systems, lreqs))
        args = []
        for fs, r in zip(systems, lreqs):
            buf, mask, _ = fs._bucket_cloud(r[1][0], cap)
            args.append(fs._lidar_args(buf, mask))
        return preprocess_scan_batch(tuple(args), w=w, h=h)

    @property
    def any_lost(self):
        return any(fs.is_lost for fs in self.systems)


class InterleavedFleet:
    """B independent pipelined FullSystems round-robined per frame round.

    The alternative fleet composition to MultiSystem's vmapped lockstep:
    each sequence keeps its OWN single-sequence device programs (one
    compile shared across systems — identical shapes hit the same
    executable) streamed back-to-back on the chip, and the overlap comes
    from `Settings.pipelined_frames`: while system b's track program is in
    flight, systems b+1..B stage their frames and drain their keyframe
    tails, so host Python hides behind other sequences' device time.

    Measured motivation (ROADMAP round-4): after the quad-gather content
    cuts, in-program vmapped batching is a net LOSS (fleet-max
    `lax.while_loop` iterations + lockstep staging outweigh the amortized
    per-op floors). Interleaving has neither pathology — every program
    runs its own iteration count and no generator ever waits for a
    lockstep peer — at the cost of B times the program launches (~4-5 ms
    each streamed, small vs ~100+ ms/frame device content).

    Reference analog: one odometry process per sequence sharing a machine
    (SURVEY.md §2.6); here they share one chip's FIFO queue instead.
    """

    def __init__(self, systems, workers: int = 0):
        self.systems = list(systems)
        # workers>0: advance each system on its own thread so one system's
        # blocking device sync (KF-tail readbacks) does not stall the
        # others' host staging. Each system is only ever touched by its
        # own per-round task, so per-sequence ordering — and therefore the
        # trajectory — is unchanged (jax dispatch is thread-safe).
        self._pool = None
        if workers > 0 and len(self.systems) > 1:
            from concurrent.futures import ThreadPoolExecutor
            self._pool = ThreadPoolExecutor(
                max_workers=min(workers, len(self.systems)))

    def __len__(self):
        return len(self.systems)

    def add_frames(self, frames):
        """One frame round: frames[b] -> systems[b] ((img, cloud, ts) or
        None to skip a sequence this round)."""
        if self._pool is not None:
            import concurrent.futures as cf
            futs = [self._pool.submit(fs.add_active_frame, *fr)
                    for fs, fr in zip(self.systems, frames) if fr is not None]
            # wait for ALL rounds before surfacing the first error: a
            # raising f.result() loop would leave later futures mutating
            # their systems while the caller unwinds
            cf.wait(futs)
            for f in futs:
                f.result()
            return
        for fs, fr in zip(self.systems, frames):
            if fr is not None:
                fs.add_active_frame(*fr)

    def flush(self):
        for fs in self.systems:
            fs.flush()

    @property
    def any_lost(self):
        return any(fs.is_lost for fs in self.systems)
