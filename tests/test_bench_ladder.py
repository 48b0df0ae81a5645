"""Unit tests for the bench fleet ladder's reporting contract.

Round 3 shipped a 0.0 f/s BENCH record because a fleet crash discarded
the completed single-sequence phase, and round 4 found a second bug class:
a crashed child's catch-all prints the RECORD template (valid JSON without
"fps"), which must be treated as a FAILED attempt, not merged into extra.
These tests pin the ladder against both, with subprocess mocked out.

Round 5 added fleet modes: interleaved attempts run by default (they need
no extra compiles); the vmapped lockstep attempts are opt-in via
SDV_BENCH_LOCKSTEP=1.
"""

import json
import os
import types
from unittest import mock

import numpy as np

import bench


class _Seq:
    calib = "calib"
    sensor = "sensor"
    poses_wc = np.zeros((2, 4, 4))


def _proc(stdout, stderr=""):
    p = types.SimpleNamespace()
    p.stdout = stdout
    p.stderr = stderr
    return p


def _run_ladder(stdouts, B0=8):
    """Drive _fleet_ladder with scripted child stdout per attempt."""
    calls = []

    def fake_run(cmd, **kw):
        calls.append((int(cmd[cmd.index("--fleet") + 2]), cmd[-1]))
        return _proc(stdouts[len(calls) - 1])

    extra = {}
    with mock.patch("subprocess.run", side_effect=fake_run):
        fps = bench._fleet_ladder("default", B0, [_Seq()], [[None]], 2,
                                  extra)
    return fps, extra, calls


def test_ladder_keeps_best_attempt():
    """Every (B, mode) attempt is tried; the best aggregate is returned
    with ITS extra."""
    fps, extra, calls = _run_ladder([
        json.dumps({"fps": 1.0, "extra": {"B": 8}}),
        json.dumps({"fps": 2.5, "extra": {"B": 4}}),
    ])
    assert calls == [(8, "interleaved"), (4, "interleaved")]
    assert fps == 2.5
    assert extra["B"] == 4
    assert [t["B"] for t in extra["fleet_tried"]] == [8, 4]


def test_lockstep_attempts_are_opt_in():
    """SDV_BENCH_LOCKSTEP=1 appends the vmapped-lockstep attempts after
    the interleaved ones (they cold-compile huge batch programs, so they
    never run by default)."""
    outs = [json.dumps({"fps": float(i + 1), "extra": {"B": 0}})
            for i in range(4)]
    with mock.patch.dict(os.environ, {"SDV_BENCH_LOCKSTEP": "1"}):
        fps, extra, calls = _run_ladder(outs)
    assert calls == [(8, "interleaved"), (4, "interleaved"),
                     (8, "lockstep"), (4, "lockstep")]
    assert fps == 4.0


def test_small_fleet_single_attempt_per_mode():
    fps, extra, calls = _run_ladder(
        [json.dumps({"fps": 1.0, "extra": {"B": 2}})], B0=2)
    assert calls == [(2, "interleaved")]
    assert fps == 1.0


def test_crashed_child_record_template_is_a_failure():
    """A child that dies prints the RECORD template (valid JSON, no
    "fps"): the ladder must log it as a failure and NOT merge its extra
    (round-4 leak: the template's error field ended up in the record).
    A failure does not count toward the two-completed-attempts budget, so
    the ladder keeps halving (B=2 runs after the B=8 crash)."""
    template = json.dumps({"metric": "x", "value": 0.0,
                           "extra": {"error": "RESOURCE_EXHAUSTED"}})
    fps, extra, calls = _run_ladder([
        template,
        json.dumps({"fps": 1.5, "extra": {"B": 4}}),
        json.dumps({"fps": 1.1, "extra": {"B": 2}}),
    ])
    assert calls == [(8, "interleaved"), (4, "interleaved"),
                     (2, "interleaved")]
    assert fps == 1.5
    assert "error" not in extra
    assert extra["fleet_errors"][0]["B"] == 8


def test_all_attempts_failing_returns_none():
    """Failures halve all the way down to B=2 (ADVICE r4: the two-attempt
    schedule lost the fleet phase when both large sizes OOMed)."""
    fps, extra, calls = _run_ladder(["", "garbage", "{}"])
    assert fps is None
    assert len(calls) == 3
    assert len(extra["fleet_errors"]) == 3


def test_no_fleet_below_two():
    """B0 < 2 skips the phase entirely (ADVICE r4: a degenerate B=1
    "fleet" must not be reported as the aggregate metric)."""
    fps, extra, calls = _run_ladder([], B0=1)
    assert fps is None and calls == []
