"""Unit tests for the bench fleet ladder's reporting contract.

Round 3 shipped a 0.0 f/s BENCH record because a fleet crash discarded
the completed single-sequence phase, and round 4 found a second bug class:
a crashed child's catch-all prints the RECORD template (valid JSON without
"fps"), which must be treated as a FAILED attempt, not merged into extra.
These tests pin the ladder against both, with subprocess mocked out.
"""

import json
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


def _run_ladder(stdouts):
    """Drive _fleet_ladder with scripted child stdout per attempt."""
    calls = []

    def fake_run(cmd, **kw):
        calls.append(int(cmd[cmd.index("--fleet") + 1]))
        return _proc(stdouts[len(calls) - 1])

    extra = {}
    with mock.patch("subprocess.run", side_effect=fake_run):
        fps = bench._fleet_ladder(8, [_Seq()], [[None]], 1, 2, extra)
    return fps, extra, calls


def test_ladder_keeps_best_B():
    """Every B is tried; the best aggregate is returned with ITS extra."""
    fps, extra, calls = _run_ladder([
        json.dumps({"fps": 1.0, "extra": {"B": 8}}),
        json.dumps({"fps": 2.5, "extra": {"B": 4}}),
        json.dumps({"fps": 1.8, "extra": {"B": 2}}),
    ])
    assert calls == [8, 4, 2]
    assert fps == 2.5
    assert extra["B"] == 4
    assert [t["B"] for t in extra["fleet_tried"]] == [8, 4, 2]


def test_crashed_child_record_template_is_a_failure():
    """A child that dies prints the RECORD template (valid JSON, no
    "fps"): the ladder must log it as a failure and NOT merge its extra
    (round-4 leak: the template's error field ended up in the record)."""
    template = json.dumps({"metric": "x", "value": 0.0,
                           "extra": {"error": "RESOURCE_EXHAUSTED"}})
    fps, extra, calls = _run_ladder([
        template,
        json.dumps({"fps": 1.5, "extra": {"B": 4}}),
        json.dumps({"fps": 1.2, "extra": {"B": 2}}),
    ])
    assert calls == [8, 4, 2]
    assert fps == 1.5
    assert "error" not in extra
    assert extra["fleet_errors"][0]["B"] == 8


def test_all_attempts_failing_returns_none():
    fps, extra, calls = _run_ladder(["", "garbage", "{}"])
    assert fps is None
    assert calls == [8, 4, 2]
    assert len(extra["fleet_errors"]) == 3
