"""Benchmark noise injection — the reference's fault-injection knobs.

Reference: Undistort::applyNoise / applyBlurNoise (Undistort.cpp:361-469)
driven by `benchmark_varNoise`, `benchmark_varBlurNoise`,
`benchmark_noiseGridsize` (settings.cpp:148-151): smooth spatially-varying
pixel noise and anisotropic blur used to stress-test robustness.

Same capability here as host-side NumPy transforms applied by the reader
wrapper `NoisySequence`; the noise field is a bicubic-ish smooth grid like
the reference's interpolated noise maps.
"""

from __future__ import annotations

import numpy as np


def _smooth_grid(rng, h, w, grid_size, amplitude):
    """Random grid upsampled smoothly to (h, w) — the equivalent of the
    reference's getInterpolatedElement11BiCub over a (grid+8)^2 noise map."""
    g = rng.uniform(-amplitude, amplitude, (grid_size + 2, grid_size + 2))
    ys = np.linspace(0, grid_size, h)
    xs = np.linspace(0, grid_size, w)
    y0 = np.clip(ys.astype(int), 0, grid_size)
    x0 = np.clip(xs.astype(int), 0, grid_size)
    ay = (ys - y0)[:, None]
    ax = (xs - x0)[None, :]
    out = (g[y0][:, x0] * (1 - ay) * (1 - ax)
           + g[y0][:, x0 + 1] * (1 - ay) * ax
           + g[y0 + 1][:, x0] * ay * (1 - ax)
           + g[y0 + 1][:, x0 + 1] * ay * ax)
    return out


def apply_photometric_noise(img: np.ndarray, var_noise: float,
                            grid_size: int = 3, seed: int = 0) -> np.ndarray:
    """Spatially varying additive noise (applyNoise semantics)."""
    if var_noise <= 0:
        return img
    rng = np.random.default_rng(seed)
    h, w = img.shape
    field = _smooth_grid(rng, h, w, grid_size, var_noise)
    pixel = rng.uniform(-1, 1, (h, w)) * field
    return np.clip(img + pixel, 0, 255).astype(np.float32)


def apply_blur_noise(img: np.ndarray, var_blur: float, grid_size: int = 3,
                     seed: int = 0) -> np.ndarray:
    """Spatially varying separable blur (applyBlurNoise semantics):
    per-pixel gaussian sigma sampled from a smooth field, x then y pass."""
    if var_blur <= 0:
        return img
    rng = np.random.default_rng(seed)
    h, w = img.shape
    sig_x = np.abs(_smooth_grid(rng, h, w, grid_size, var_blur))
    sig_y = np.abs(_smooth_grid(rng, h, w, grid_size, var_blur))
    out = np.asarray(img, np.float32)
    # quantize sigma to a few levels and blend gaussian-filtered variants
    from scipy.ndimage import gaussian_filter1d
    levels = [0.01, 0.5, 1.0, 2.0]
    bx = [gaussian_filter1d(out, s, axis=1, mode="nearest") for s in levels]
    by = None
    acc = np.zeros_like(out)
    sx = np.clip(sig_x, levels[0], levels[-1])
    idx = np.searchsorted(levels, sx) - 1
    idx = np.clip(idx, 0, len(levels) - 2)
    t = (sx - np.take(levels, idx)) / (np.take(levels, idx + 1)
                                       - np.take(levels, idx))
    for k in range(len(levels) - 1):
        m = idx == k
        acc[m] = bx[k][m] * (1 - t[m]) + bx[k + 1][m] * t[m]
    by_in = acc
    bys = [gaussian_filter1d(by_in, s, axis=0, mode="nearest")
           for s in levels]
    out2 = np.zeros_like(out)
    sy = np.clip(sig_y, levels[0], levels[-1])
    idy = np.clip(np.searchsorted(levels, sy) - 1, 0, len(levels) - 2)
    ty = (sy - np.take(levels, idy)) / (np.take(levels, idy + 1)
                                        - np.take(levels, idy))
    for k in range(len(levels) - 1):
        m = idy == k
        out2[m] = bys[k][m] * (1 - ty[m]) + bys[k + 1][m] * ty[m]
    return out2.astype(np.float32)


class NoisySequence:
    """Reader wrapper injecting benchmark noise into images."""

    def __init__(self, reader, var_noise: float = 0.0, var_blur: float = 0.0,
                 grid_size: int = 3, seed: int = 0):
        self.reader = reader
        self.var_noise = var_noise
        self.var_blur = var_blur
        self.grid_size = grid_size
        self.seed = seed
        self.calib = reader.calib
        self.sensor = reader.sensor

    def __len__(self):
        return len(self.reader)

    def get(self, i):
        img, cloud, ts = self.reader.get(i)
        img = apply_photometric_noise(img, self.var_noise, self.grid_size,
                                      self.seed + i)
        img = apply_blur_noise(img, self.var_blur, self.grid_size,
                               self.seed + i)
        return img, cloud, ts
