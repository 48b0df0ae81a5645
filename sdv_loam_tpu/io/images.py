"""Image read/write/display helpers — the ImageRW / ImageDisplay equivalent.

Reference: src/IOWrapper/OpenCV/ImageRW_OpenCV.cpp + ImageDisplay_OpenCV.cpp
(imread/imwrite/imshow) with dummy fallbacks when OpenCV is absent
(CMakeLists.txt:99-101). Same structure here: cv2 when available, no-op /
numpy fallbacks otherwise, plus depth-map colorization for the debug views
(debugPlotIDepthMap-style)."""

from __future__ import annotations

import numpy as np

try:
    import cv2
    _HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    _HAS_CV2 = False


def read_gray(path: str) -> np.ndarray:
    if _HAS_CV2:
        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise IOError(f"cannot read {path}")
        return img
    from PIL import Image
    return np.asarray(Image.open(path).convert("L"))


def write_image(path: str, img: np.ndarray) -> None:
    arr = np.clip(np.asarray(img), 0, 255).astype(np.uint8)
    if _HAS_CV2:
        cv2.imwrite(path, arr)
    else:
        from PIL import Image
        Image.fromarray(arr).save(path)


def colorize_idepth(idepth: np.ndarray, valid=None) -> np.ndarray:
    """Jet-style colorization of an inverse-depth map ((H,W) -> (H,W,3) u8),
    the headless counterpart of CoarseTracker::debugPlotIDepthMap."""
    d = np.asarray(idepth, np.float32)
    if valid is None:
        valid = d > 0
    vals = d[valid]
    lo, hi = (np.percentile(vals, 5), np.percentile(vals, 95)) if vals.size \
        else (0.0, 1.0)
    t = np.clip((d - lo) / max(hi - lo, 1e-9), 0, 1)
    r = np.clip(1.5 - np.abs(4 * t - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * t - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * t - 1), 0, 1)
    out = (np.stack([r, g, b], -1) * 255).astype(np.uint8)
    out[~valid] = 0
    return out


def display(name: str, img: np.ndarray, wait_ms: int = 1) -> None:
    """imshow when a GUI is available; silently no-op headless."""
    if not _HAS_CV2:
        return
    try:
        cv2.imshow(name, np.asarray(img))
        cv2.waitKey(wait_ms)
    except Exception:
        pass
