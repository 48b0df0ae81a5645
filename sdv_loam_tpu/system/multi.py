"""Lockstep multi-sequence odometry — the batch scaling axis on one chip.

The reference is a single-sequence, single-process system (SURVEY.md §2.6);
the TPU build's throughput axis is B independent sequences sharing one chip.
Every `FullSystem.frame_steps` generator yields a pytree of device values at
each host-sync point; `MultiSystem` advances all B generators in phase and
batches their pulls into ONE `jax.device_get` per stage. Over the tunneled
TPU a sync costs ~30-100 ms regardless of payload (CLAUDE.md perf notes), so
B sequences cost nearly the same wall-clock per stage as one — aggregate
frames/s scales with B until device compute saturates.

Dispatches interleave too: while sequence 0's tracking program runs on
device, sequences 1..B-1's programs are already enqueued (JAX async
dispatch), so device gaps between host stages are filled.
"""

from __future__ import annotations

import jax


class MultiSystem:
    """Drive B FullSystem instances in stage-lockstep."""

    def __init__(self, systems):
        self.systems = list(systems)

    def __len__(self):
        return len(self.systems)

    def add_frames(self, frames):
        """Process one frame per sequence.

        frames: list of (image, cloud, timestamp) or None (sequence done),
        one per system. All device pulls of a given pipeline stage are
        batched into a single device_get.
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
            tele = self.systems[min(reqs)].telemetry
            with tele.sync():
                to_send = jax.device_get(reqs)  # ONE pull, every sequence

    @property
    def any_lost(self):
        return any(fs.is_lost for fs in self.systems)
