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


def _is_track(req):
    return isinstance(req, tuple) and len(req) == 3 \
        and req[0] == "dispatch_track"


def _leaf_shapes(args):
    return tuple(getattr(x, "shape", ()) for x in jax.tree.leaves(args))


class MultiSystem:
    """Drive B FullSystem instances in stage-lockstep."""

    def __init__(self, systems, batch_track: bool = True):
        self.systems = list(systems)
        self.batch_track = batch_track

    def __len__(self):
        return len(self.systems)

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
            reqs = {}
            for i in list(pending):
                try:
                    reqs[i] = pending[i].send(to_send.get(i))
                except StopIteration:
                    pending.pop(i)
            if not reqs:
                break
            to_send = self._resolve(reqs)

    def _resolve(self, reqs):
        """Dispatch + pull one lockstep round of requests."""
        batch_ids, batch_out = [], None
        if self.batch_track:
            track_ids = [i for i, r in reqs.items() if _is_track(r)]
            if len(track_ids) >= 2:
                kw0 = reqs[track_ids[0]][2]
                sh0 = _leaf_shapes(reqs[track_ids[0]][1])
                if all(reqs[i][2] == kw0
                       and _leaf_shapes(reqs[i][1]) == sh0
                       for i in track_ids[1:]):
                    batch_ids = track_ids
                    batch_out = self._dispatch_batch(
                        [reqs[i] for i in track_ids], kw0)
        singles = {}
        for i, r in reqs.items():
            if i not in batch_ids:
                singles[i] = self.systems[i]._dispatch_request(r)
        tele = self.systems[min(reqs)].telemetry
        with tele.sync():
            pulled, bpulled = jax.device_get((singles, batch_out))
        out = dict(pulled)
        for j, i in enumerate(batch_ids):
            out[i] = jax.tree.map(lambda x, j=j: x[j], bpulled)
        return out

    @staticmethod
    def _dispatch_batch(track_reqs, kw):
        """One vmapped track program over the B aligned descriptors."""
        from sdv_loam_tpu.ops.frame_step import track_frame_step_batch
        args = jax.tree.map(lambda *xs: jnp.stack(
            [jnp.asarray(x) for x in xs]), *[r[1] for r in track_reqs])
        etol = jnp.asarray([np.float32(r[2]["struct_pose_e_tol"])
                            for r in track_reqs])
        mdt = jnp.asarray([np.float32(r[2]["struct_pose_max_dt"])
                           for r in track_reqs])
        statics = {k: v for k, v in kw.items() if k not in _BATCH_TOLS}
        return track_frame_step_batch(*args, etol, mdt, **statics)

    @property
    def any_lost(self):
        return any(fs.is_lost for fs in self.systems)
