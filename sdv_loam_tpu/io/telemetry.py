"""Telemetry: per-stage timing, run summary, and structured logging.

Reference observability surface (SURVEY.md §5):
  * wall-clock + CPU-clock run summary printed at exit with fps and
    ms/frame (main.cpp:948-963);
  * per-KF log line — window size, residual counts, RMSE
    (FullSystem.cpp:1371-1415, printLogLine);
  * the deep-log streams (calib/coarse-tracking/eigenvalue logs,
    FullSystem.cpp:119-176) — here one structured JSONL stream.

The TPU build adds per-stage device timing (the reference has none).
"""

from __future__ import annotations

import json
import time
from collections import defaultdict
from contextlib import contextmanager


class Telemetry:
    def __init__(self, log_path: str | None = None, quiet: bool = True):
        self.stage_time = defaultdict(float)
        self.stage_count = defaultdict(int)
        self.n_frames = 0
        self.n_keyframes = 0
        self.t_start = time.perf_counter()
        self.quiet = quiet
        self._log_f = open(log_path, "w") if log_path else None

    @contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.stage_time[name] += dt
            self.stage_count[name] += 1

    def frame_done(self, is_kf: bool):
        self.n_frames += 1
        if is_kf:
            self.n_keyframes += 1

    def log_event(self, kind: str, **fields):
        if self._log_f:
            self._log_f.write(json.dumps({"t": time.perf_counter() - self.t_start,
                                          "kind": kind, **fields}) + "\n")

    def kf_line(self, n_window: int, n_points: int, n_residuals: int,
                rmse: float):
        """Per-keyframe log line (printLogLine, FullSystem.cpp:1371-1415)."""
        self.log_event("keyframe", window=n_window, points=n_points,
                       residuals=n_residuals, rmse=rmse)
        if not self.quiet:
            print(f"KF {self.n_keyframes}: window={n_window} "
                  f"pts={n_points} res={n_residuals} rmse={rmse:.3f}")

    def summary(self) -> dict:
        """Run summary in the shape of main.cpp:948-963."""
        wall = time.perf_counter() - self.t_start
        fps = self.n_frames / wall if wall > 0 else 0.0
        out = {
            "frames": self.n_frames,
            "keyframes": self.n_keyframes,
            "wall_s": round(wall, 3),
            "fps": round(fps, 2),
            "ms_per_frame": round(1000.0 * wall / max(self.n_frames, 1), 2),
            "stages_ms": {k: round(1000.0 * v / max(self.stage_count[k], 1), 2)
                          for k, v in sorted(self.stage_time.items())},
        }
        return out

    def close(self):
        if self._log_f:
            self._log_f.close()
            self._log_f = None
