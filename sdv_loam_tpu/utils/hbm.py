"""Client-side HBM accounting.

The axon TPU plugin returns ``None`` from ``Device.memory_stats()``, so
device-memory use is accounted from the client instead: the ``nbytes`` of
every live ``jax.Array``, deduplicated by object identity. This measures
the PERSISTENT footprint (pools, window stacks, per-KF caches) — program
temporaries are invisible to the client and are budgeted with a headroom
factor when sizing the fleet (bench.py picks B from this + a retry ladder).

The reference has no analog: a single-sequence CPU process never manages
accelerator memory (SURVEY.md §2.6). Capacity management is a TPU-build
obligation — round 3 shipped without it and the B=8 fleet phase OOMed a
16 GB v5e (VERDICT r3 item 1).
"""

from __future__ import annotations

import os

import jax

# Known per-chip HBM for the device kinds this project targets. Used only
# as a budgeting default; override with SDV_HBM_BYTES.
_HBM_BY_KIND = {
    "TPU v5 lite": 16e9,      # v5e
    "TPU v5": 95e9,           # v5p
    "TPU v4": 32e9,
    "TPU v6 lite": 32e9,      # v6e (Trillium)
}


def tree_device_bytes(tree, _seen: set | None = None) -> int:
    """Total nbytes of the distinct jax.Arrays in a pytree."""
    seen = _seen if _seen is not None else set()
    total = 0
    for leaf in jax.tree.leaves(tree):
        if isinstance(leaf, jax.Array) and id(leaf) not in seen:
            seen.add(id(leaf))
            total += leaf.nbytes
    return total


def system_device_bytes(fs) -> int:
    """Persistent device bytes held by one FullSystem (all attributes,
    deduplicated — pyramid tuples and caches share buffers)."""
    seen: set = set()
    return sum(tree_device_bytes(v, seen) for v in vars(fs).values())


def live_device_bytes(platform: str | None = None) -> int:
    """nbytes of every live jax.Array on `platform` (default: the default
    backend). Includes arrays owned by all systems plus globals (compiled-
    program constants are not visible; temporaries are not live arrays)."""
    if platform is None:
        platform = jax.default_backend()
    total = 0
    for a in jax.live_arrays():
        try:
            dev = next(iter(a.devices()))
        except Exception:
            continue
        if dev.platform == platform or platform == "any":
            total += a.nbytes
    return total


def hbm_budget_bytes(reserve_frac: float = 0.15) -> int:
    """Usable HBM budget for persistent buffers + temporaries.

    SDV_HBM_BYTES overrides; otherwise the budget comes from
    Device.memory_stats() when available, else the device-kind table."""
    env = os.environ.get("SDV_HBM_BYTES")
    if env:
        return int(float(env))
    d = jax.devices()[0]
    stats = None
    try:
        stats = d.memory_stats()
    except Exception:
        pass
    if stats and stats.get("bytes_limit"):
        total = stats["bytes_limit"]
    else:
        total = next((v for k, v in _HBM_BY_KIND.items()
                      if d.device_kind.startswith(k)), 16e9)
    return int(total * (1.0 - reserve_frac))


def pick_fleet_size(per_system_bytes: int, requested: int,
                    temporaries_factor: float = 4.0,
                    budget: int | None = None) -> int:
    """Largest fleet size <= requested that fits the HBM budget, assuming
    each system's working set is per_system_bytes * temporaries_factor
    (program temporaries of the vmapped fleet programs scale with B and
    dominate the persistent footprint — the factor is calibration, refined
    by bench.py's retry ladder when it proves too optimistic)."""
    budget = hbm_budget_bytes() if budget is None else budget
    if per_system_bytes <= 0:
        return requested
    fit = int(budget // (per_system_bytes * temporaries_factor))
    return max(1, min(requested, fit))
