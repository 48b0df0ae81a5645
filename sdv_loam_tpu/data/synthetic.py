"""Synthetic driving-scene generator: images + LiDAR scans + ground truth.

There is no KITTI data in this environment (zero egress), so unit tests,
end-to-end accuracy checks, and the benchmark run on a procedurally generated
scene with exact ground truth:

  * world = textured planes (ground + two side walls + far wall), world frame
    anchored at the first camera pose (x right, y down, z forward — camera
    convention of the reference);
  * camera trajectory: forward driving with gentle yaw + small pose noise —
    comparable motion profile to KITTI (~1 m/frame at 10 Hz);
  * texture: band-limited sum of sinusoids -> smooth intensity with gradients
    everywhere, so photometric alignment is well conditioned;
  * LiDAR: Velodyne HDL-64-like ray pattern (64 rings x 1800 columns,
    geometry constants of reference main.cpp:102-122) cast against the same
    planes, returned in the LiDAR frame (x forward, y left, z up) with the
    standard KITTI-style T_cam<-lidar extrinsics.

Everything is plain NumPy on the host (data generation is not the benchmark
target; frames are staged to device by the pipeline).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from sdv_loam_tpu.config import (ANG_BOTTOM, ANG_RES_X, ANG_RES_Y, HORIZON_SCAN,
                                 N_SCAN)
from sdv_loam_tpu.data.calib import SensorCalib
from sdv_loam_tpu.utils.camera import PyramidCalib, make_pyramid_calib

# KITTI-style camera<-lidar rotation: cam x = -y_l, cam y = -z_l, cam z = x_l
_R_CL = np.array([[0.0, -1.0, 0.0],
                  [0.0, 0.0, -1.0],
                  [1.0, 0.0, 0.0]])
_T_CL = np.array([-0.01, -0.05, -0.29])  # ~KITTI magnitude offset


@dataclasses.dataclass
class Plane:
    p0: np.ndarray       # point on plane (world)
    n: np.ndarray        # unit normal (world), pointing toward viewable side
    eu: np.ndarray       # in-plane texture axis u
    ev: np.ndarray       # in-plane texture axis v
    bounds: tuple        # (umin, umax, vmin, vmax) in plane coords, or None
    tex_seed: int
    contrast: float = 1.0  # texture amplitude scale (asphalt ground ~0.1:
    #   real roads are texture-poor, so point selection and the tracker's
    #   flow statistics concentrate on the farther building fronts — the
    #   KITTI-statistical operating point, VERDICT r4 item 4)
    # sparse high-contrast patches (lane markings / cracks / manholes):
    # real asphalt is feature-POOR, not feature-FREE — a small fraction of
    # near-field ground points must survive selection or the system flips
    # into its mono-supplement mode (measured: uniform contrast 0.08
    # floods the map with far mono points, ATE 7x worse)
    patch_frac: float = 0.0   # fraction of patch cells at high contrast
    patch_size: float = 2.5   # patch cell size (world units)
    patch_contrast: float = 0.7


def _texture(u, v, seed, footprint=0.0, contrast=1.0):
    """Band-limited procedural texture in [10, 245].

    `footprint` is the per-sample pixel footprint on the surface (world
    units): each sinusoid component is attenuated by the exact integral of a
    Gaussian pixel aperture, exp(-f^2 s^2 / 2) — analytic mip-mapping. A real
    camera integrates over the pixel, so without this the point-sampled
    texture aliases at range and consecutive frames disagree at the
    intensity level, putting a ~0.5-1 px noise floor under every direct
    alignment (matcher, tracker) that no estimator can beat."""
    rng = np.random.default_rng(seed)
    out = np.zeros_like(u)
    s2 = np.square(footprint)
    # fBm-like octaves: slowly-decaying amplitudes over geometric frequencies
    # give scale-invariant detail (image-plane gradients of tens of intensity
    # units per pixel at driving depths, like real road scenes); the Gaussian
    # aperture keeps whatever exceeds the local Nyquist out of the render.
    #
    # Components are RANDOMLY ORIENTED plane waves (3 per octave), not
    # separable sin(u)*cos(v) lattices: a separable sum is quasi-periodic
    # along the driving axis and produced photometric-aliasing traps —
    # measured long-run tracking locked onto a self-similar offset at
    # ~2.2x the true forward step (tools/drift_bisect.py round-3 logs), a
    # failure mode real street texture does not offer. An oriented sum is
    # an aperiodic Gaussian-like random field with weak autocorrelation
    # side-lobes.
    var = 0.0
    for k in range(12):
        amp = 1.0 / (1.08 ** k)
        for _ in range(5):
            r = rng.uniform(0.4, 1.1) * (1.7 ** k) * 0.1
            th = rng.uniform(0, 2 * np.pi)
            ph = rng.uniform(0, 2 * np.pi)
            att = np.exp(-0.5 * r * r * s2)
            out = out + (amp * att) * np.sin(
                r * np.cos(th) * u + r * np.sin(th) * v + ph)
            var += amp * amp * 0.5
    # normalize the UNattenuated std to the previous generator's ~0.37 so
    # absolute contrast/gradient statistics (selection thresholds, huber
    # scales) carry over; attenuated (distant) areas keep genuinely lower
    # contrast — the analytic mip behavior
    out = out * (0.373 / np.sqrt(var)) * contrast
    return np.clip(127.0 + 110.0 * out, 10.0, 245.0)


def default_scene(cam_height: float = 1.65, half_width: float = 9.0,
                  far: float = 260.0, ground_contrast: float = 1.0,
                  ground_patches: float = 0.0) -> list[Plane]:
    g = Plane(np.array([0.0, cam_height, 0.0]), np.array([0.0, -1.0, 0.0]),
              np.array([1.0, 0.0, 0.0]), np.array([0.0, 0.0, 1.0]), None, 11,
              contrast=ground_contrast, patch_frac=ground_patches)
    left = Plane(np.array([-half_width, 0.0, 0.0]), np.array([1.0, 0.0, 0.0]),
                 np.array([0.0, 0.0, 1.0]), np.array([0.0, 1.0, 0.0]), None, 22)
    right = Plane(np.array([half_width, 0.0, 0.0]), np.array([-1.0, 0.0, 0.0]),
                  np.array([0.0, 0.0, 1.0]), np.array([0.0, 1.0, 0.0]), None, 33)
    back = Plane(np.array([0.0, 0.0, far]), np.array([0.0, 0.0, -1.0]),
                 np.array([1.0, 0.0, 0.0]), np.array([0.0, 1.0, 0.0]), None, 44)
    return [g, left, right, back]


def scene_along_path(poses_wc: np.ndarray, half_width: float = 9.0,
                     seg_len: float = 20.0, cam_height: float = 1.65,
                     wall_top: float = 9.0, ground_contrast: float = 1.0,
                     ground_patches: float = 0.0) -> list[Plane]:
    """A winding canyon: bounded wall segments flanking the TRAJECTORY.

    The default corridor is straight and world-fixed, so any trajectory
    with sustained yaw eventually swings laterally into the walls and the
    scene degenerates (no geometry in view). This builds left/right wall
    segments every `seg_len` meters of path, oriented along the local
    heading — sharp S-curves and 90-degree turns stay inside a textured
    canyon, like a street of building fronts.
    """
    pos = poses_wc[:, :3, 3]
    fwd = poses_wc[:, :3, 2]                       # camera z = heading
    arc = np.concatenate([[0.0], np.cumsum(
        np.linalg.norm(np.diff(pos, axis=0), axis=1))])
    planes = [Plane(np.array([0.0, cam_height, 0.0]),
                    np.array([0.0, -1.0, 0.0]),
                    np.array([1.0, 0.0, 0.0]), np.array([0.0, 0.0, 1.0]),
                    None, 11, contrast=ground_contrast,
                    patch_frac=ground_patches)]
    up = np.array([0.0, -1.0, 0.0])                # world -y is up
    seed = 100
    s = 0.0
    while s < arc[-1] + seg_len:
        i = int(np.searchsorted(arc, min(s + 0.5 * seg_len, arc[-1])))
        i = min(i, len(pos) - 1)
        c = pos[i]
        h = fwd[i] * np.array([1.0, 0.0, 1.0])     # project to drive plane
        h = h / max(np.linalg.norm(h), 1e-9)
        lat = np.cross(up, h)
        # abutting segments (no overlap): on straight sections overlapping
        # COPLANAR segments with different textures tie in ray distance and
        # the winner is numerically unstable -> texture flicker that breaks
        # photometric consistency. Curve joints leave small stable wedge
        # gaps/overlaps, which are harmless (static scene).
        half = 0.5 * seg_len + 0.01
        for side, tex in ((-1.0, 22), (1.0, 33)):
            p0 = c + side * half_width * lat
            n = -side * lat                        # faces the path
            planes.append(Plane(p0, n, h.copy(), up.copy(),
                                (-half, half, -cam_height, wall_top),
                                seed))
            seed += 1
        s += seg_len
    # far wall past the end of the path so forward rays terminate
    end = pos[-1] + fwd[-1] * 120.0
    planes.append(Plane(end, -fwd[-1] / max(np.linalg.norm(fwd[-1]), 1e-9),
                        np.cross(up, fwd[-1]), up.copy(), None, 44))
    return planes


def _raycast(scene, origins, dirs, t_min=0.15, t_max=400.0, px_scale=0.0):
    """Cast rays against the scene.

    origins: (3,) or (N,3); dirs: (N,3). Returns (t (N,), intensity (N,)),
    with t = +inf for misses. `px_scale` is the angular pixel size (1/fx for
    camera rays with |dir_z|=1): when nonzero, the texture is sampled with
    the matching surface footprint (anti-aliased like a real camera pixel).
    """
    origins = np.broadcast_to(origins, dirs.shape)
    best_t = np.full(dirs.shape[0], np.inf)
    best_i = np.zeros(dirs.shape[0])
    dnorm = np.linalg.norm(dirs, axis=-1)
    # cull far-away BOUNDED planes (path-following canyons have dozens of
    # wall segments; only the nearby ones can be hit within texture range)
    cam = origins[0]
    scene = [pl for pl in scene
             if pl.bounds is None or np.linalg.norm(pl.p0 - cam) < 250.0]
    for pl in scene:
        denom = dirs @ pl.n
        num = (pl.p0 - origins) @ pl.n
        with np.errstate(divide="ignore", invalid="ignore"):
            t = num / denom
            ok = (denom < -1e-9) & (t > t_min) & (t < t_max)
            t_safe = np.where(ok, t, 1.0)
            hit = origins + t_safe[:, None] * dirs
            u = (hit - pl.p0) @ pl.eu
            v = (hit - pl.p0) @ pl.ev
        if pl.bounds is not None:
            umin, umax, vmin, vmax = pl.bounds
            ok &= (u >= umin) & (u <= umax) & (v >= vmin) & (v <= vmax)
        closer = ok & (t < best_t)
        if np.any(closer):
            if px_scale > 0.0:
                # footprint = lateral pixel size at range, stretched by the
                # grazing angle on the plane
                cosi = np.abs(denom[closer]) / np.maximum(dnorm[closer], 1e-9)
                fp = (t[closer] * px_scale) / np.maximum(cosi, 0.05)
            else:
                fp = 0.0
            contrast = pl.contrast
            if pl.patch_frac > 0.0:
                # deterministic per-cell hash: sparse high-contrast patches
                cu = np.floor(u[closer] / pl.patch_size)
                cv = np.floor(v[closer] / pl.patch_size)
                hsh = np.modf(np.sin(cu * 12.9898 + cv * 78.233
                                     + pl.tex_seed) * 43758.5453)[0]
                contrast = np.where(np.abs(hsh) < pl.patch_frac,
                                    pl.patch_contrast, pl.contrast)
            inten = _texture(u[closer], v[closer], pl.tex_seed, fp,
                             contrast=contrast)
            best_t[closer] = t[closer]
            best_i[closer] = inten
    return best_t, best_i


def make_trajectory(n_frames: int, step: float = 1.0, yaw_rate=0.004,
                    noise: float = 0.0, seed: int = 7) -> np.ndarray:
    """(n, 4, 4) T_world<-cam ground-truth poses: forward drive with yaw.

    `yaw_rate` may be a scalar (constant turn) or an (n,) per-frame profile
    (S-curves, straights+turns — the long-run accuracy scenarios)."""
    rng = np.random.default_rng(seed)
    yaw_prof = np.broadcast_to(np.asarray(yaw_rate, np.float64), (n_frames,))
    poses = np.zeros((n_frames, 4, 4))
    T = np.eye(4)
    yaw = 0.0
    for i in range(n_frames):
        poses[i] = T
        yaw_i = yaw_prof[i] + (rng.standard_normal() * noise * 0.001)
        yaw += yaw_i
        c, s = np.cos(yaw_i), np.sin(yaw_i)
        # rotation about camera y (down) axis = yaw in driving plane
        Rstep = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        tstep = np.array([0.0, 0.0, step]) + rng.standard_normal(3) * noise * 0.01
        Tstep = np.eye(4)
        Tstep[:3, :3] = Rstep
        Tstep[:3, 3] = tstep
        T = T @ Tstep
    return poses


@dataclasses.dataclass
class SyntheticSequence:
    """In-memory synthetic sequence with the reader interface the system uses."""

    calib: PyramidCalib
    sensor: SensorCalib
    poses_wc: np.ndarray          # (n, 4, 4) ground truth T_world<-cam
    scene: list
    timestamps: np.ndarray
    lidar_stride: int = 4         # subsample columns for speed

    def __len__(self):
        return self.poses_wc.shape[0]

    def get_image(self, i: int) -> np.ndarray:
        c = self.calib
        T = self.poses_wc[i]
        xx, yy = np.meshgrid(np.arange(c.w[0], dtype=np.float64),
                             np.arange(c.h[0], dtype=np.float64))
        dx = (xx - c.cx[0]) / c.fx[0]
        dy = (yy - c.cy[0]) / c.fy[0]
        dirs_cam = np.stack([dx, dy, np.ones_like(dx)], axis=-1).reshape(-1, 3)
        dirs_world = dirs_cam @ T[:3, :3].T
        t, inten = _raycast(self.scene, T[:3, 3], dirs_world,
                            px_scale=1.0 / c.fx[0])
        img = np.where(np.isfinite(t), inten, 0.0)
        return img.reshape(c.h[0], c.w[0]).astype(np.float32)

    def get_depth(self, i: int) -> np.ndarray:
        """Ground-truth metric z-depth image (for oracle tests)."""
        c = self.calib
        T = self.poses_wc[i]
        xx, yy = np.meshgrid(np.arange(c.w[0], dtype=np.float64),
                             np.arange(c.h[0], dtype=np.float64))
        dx = (xx - c.cx[0]) / c.fx[0]
        dy = (yy - c.cy[0]) / c.fy[0]
        dirs_cam = np.stack([dx, dy, np.ones_like(dx)], axis=-1).reshape(-1, 3)
        norm = np.linalg.norm(dirs_cam, axis=-1)
        dirs_world = dirs_cam @ T[:3, :3].T
        t, _ = _raycast(self.scene, T[:3, 3], dirs_world)
        # t is distance along unnormalized dir with |d_z_cam| = 1 -> t == z depth
        return t.reshape(c.h[0], c.w[0]).astype(np.float32)

    def get_cloud(self, i: int) -> np.ndarray:
        """(N, 3) LiDAR-frame points for scan i (Velodyne-like ray pattern)."""
        T_wc = self.poses_wc[i]
        T_wl = T_wc @ self.sensor.T_cam_lidar
        rows = np.arange(N_SCAN, dtype=np.float64)
        cols = np.arange(0, HORIZON_SCAN, self.lidar_stride, dtype=np.float64)
        vert = np.deg2rad(rows * ANG_RES_Y - ANG_BOTTOM)
        horiz = np.deg2rad((HORIZON_SCAN / 2 - cols) * ANG_RES_X + 90.0)
        v, h = np.meshgrid(vert, horiz, indexing="ij")
        d_l = np.stack([np.cos(v) * np.sin(h), np.cos(v) * np.cos(h),
                        np.sin(v)], axis=-1).reshape(-1, 3)
        d_w = d_l @ T_wl[:3, :3].T
        t, _ = _raycast(self.scene, T_wl[:3, 3], d_w, t_min=1.0, t_max=80.0)
        hitmask = np.isfinite(t)
        pts_l = d_l[hitmask] * t[hitmask, None]
        return pts_l.astype(np.float32)

    def get(self, i: int):
        return self.get_image(i), self.get_cloud(i), float(self.timestamps[i])


def s_curve_profile(n_frames: int, peak: float = 0.006,
                    n_lobes: int = 3) -> np.ndarray:
    """(n,) per-frame yaw-rate profile alternating smooth left/right turns
    with short straights — the long-run drift scenario (curvature changes
    sign, so yaw-bias drift cannot cancel by symmetry)."""
    t = np.linspace(0, n_lobes * np.pi, n_frames)
    prof = peak * np.sin(t)
    prof[np.abs(prof) < 0.15 * peak] = 0.0   # straights between lobes
    return prof


def make_sequence(n_frames: int = 20, w: int = 320, h: int = 96,
                  fx: float | None = None, fy: float | None = None,
                  step: float = 1.0,
                  yaw_rate=0.004, seed: int = 7,
                  lidar_stride: int = 4,
                  half_width: float = 9.0,
                  follow_path: bool = False,
                  ground_contrast: float = 1.0,
                  ground_patches: float = 0.0,
                  cy_offset: float = -0.12) -> SyntheticSequence:
    """Build a synthetic sequence. Default small size for tests; use
    (1200, 360) with fx≈718 and half_width≈15 for KITTI-like benchmark
    runs (KITTI streets put structure 10-20 m to the sides).

    `follow_path` builds the canyon ALONG the trajectory (scene_along_path)
    — required whenever the yaw profile swings the path more than
    ~half_width laterally (sharp S-curves, 90-degree turns); the default
    world-fixed corridor degenerates there."""
    if fx is None:
        fx = 0.6 * w  # ~horizontal FOV of KITTI
    if fy is None:
        fy = fx       # anisotropic fy mimics non-proportional resizes like
        #             the reference fast preset's 1241x376 -> 424x320
    # cy_offset (fraction of h, added to the image center): the default
    # -0.12 shows extra near ground (good LiDAR coverage for small test
    # scenes). Real cropped KITTI has only ~174 px below the principal
    # point, which geometrically BOUNDS near-ground optical flow at
    # ~20-28 px/frame — use cy_offset=0 for KITTI-statistical benches
    # (VERDICT r4 item 4; see tools/scene_flow_tune.py).
    cy = (h - 1) / 2.0 + h * cy_offset
    calib = make_pyramid_calib(w, h, fx, fy, (w - 1) / 2.0, cy)
    sensor = SensorCalib(np.array([fx, fy, (w - 1) / 2.0, cy]),
                         _R_CL.copy(), _T_CL.copy())
    poses = make_trajectory(n_frames, step=step, yaw_rate=yaw_rate, seed=seed)
    ts = np.arange(n_frames) * 0.1
    scene = scene_along_path(poses, half_width=half_width,
                             ground_contrast=ground_contrast,
                             ground_patches=ground_patches) if follow_path \
        else default_scene(half_width=half_width,
                           ground_contrast=ground_contrast,
                           ground_patches=ground_patches)
    return SyntheticSequence(calib, sensor, poses, scene, ts,
                             lidar_stride=lidar_stride)
