"""Tests for the debug renderings (FullSystemDebugStuff parity) and the
HTML 3-D viewer (Pangolin counterpart)."""

import types

import numpy as np
import jax.numpy as jnp

from sdv_loam_tpu.io.debug_plots import (debug_plot, debug_plot_tracking,
                                         make_jet3, make_rainbow3,
                                         selector_debug_image, stitch)
from sdv_loam_tpu.ops import trace as trace_ops


def _fake_fs(F=2, N=16, M=12, h=40, w=64):
    """Minimal FullSystem stand-in exposing the attributes the debug
    renderers read."""
    rng = np.random.default_rng(0)
    fs = types.SimpleNamespace()
    fs.order = [0, 1]
    fs.dI0_stack = jnp.asarray(
        rng.random((F, h, w, 3)).astype(np.float32) * 200)
    fs.pt_valid = np.zeros(N, bool)
    fs.pt_valid[:10] = True
    fs.pt = dict(
        u=rng.uniform(5, w - 5, N).astype(np.float32),
        v=rng.uniform(5, h - 5, N).astype(np.float32),
        idepth=rng.uniform(0.02, 0.4, N).astype(np.float32),
        host=np.array([0, 1] * (N // 2), np.int32),
        type=rng.integers(0, 4, N).astype(np.int32),
    )
    fs.im_valid = np.zeros(M, bool)
    fs.im_valid[:8] = True
    fs.im = dict(
        u=rng.uniform(5, w - 5, M).astype(np.float32),
        v=rng.uniform(5, h - 5, M).astype(np.float32),
        host=np.array([0, 1] * (M // 2), np.int32),
        status=rng.integers(0, 6, M).astype(np.int32),
        quality=rng.uniform(1, 9, M).astype(np.float32),
        idepth_min=rng.uniform(0.01, 0.1, M).astype(np.float32),
        idepth_max=rng.uniform(0.1, 0.5, M).astype(np.float32),
    )
    fs.aff = np.zeros((F, 2), np.float32)
    fs.exposure = np.ones(F, np.float32)
    return fs, h, w


def test_rainbow_jet_colormaps_match_reference_formulas():
    # makeRainbow3B: id<=0 -> white; phase 0 at id=0.5 -> (127.5, 127.5, 0)
    c = make_rainbow3(np.array([-1.0, 0.5, 1.5]))
    np.testing.assert_array_equal(c[0], [255, 255, 255])
    assert abs(int(c[1][0]) - 127) <= 1 and c[1][2] == 0
    # phase 1 (id in [1,2)): starts at (0,255,0)
    assert c[2][0] == 0
    # makeJet3B endpoints (globalFuncs.h:328-329)
    j = make_jet3(np.array([-0.1, 1.2, 0.0625]))
    np.testing.assert_array_equal(j[0], [128, 0, 0])
    np.testing.assert_array_equal(j[1], [0, 0, 128])
    # t=1/16 -> segment 0 halfway: r = 255*(0.5+0.25)
    assert abs(int(j[2][0]) - 191) <= 1 and j[2][1] == 0


def test_debug_plot_all_modes_render():
    fs, h, w = _fake_fs()
    for mode in (0, 1, 3, 4, 5, 6, 7):
        images, grid = debug_plot(fs, mode=mode)
        assert len(images) == 2
        assert images[0].shape == (h, w, 3) and images[0].dtype == np.uint8
        # the overlay must actually draw something colored
        if mode != 3:  # mode 3 may show nothing if no GOOD/SKIPPED traces
            diff = (images[0].astype(int) - images[0][..., :1].astype(int))
            assert np.abs(diff).sum() > 0, f"mode {mode} drew nothing"
    # grid stitch is 1x2 or 2x1 of the two frames
    assert grid.size >= 2 * h * w * 3


def test_debug_plot_tracking_brightness_transfer():
    fs, h, w = _fake_fs()
    fs.aff[1] = [0.2, 10.0]  # non-trivial transfer
    outs = debug_plot_tracking(fs)
    assert len(outs) == 2
    assert outs[0].dtype == np.uint8
    # frames differ because of the brightness transfer
    assert np.abs(outs[0].astype(int) - outs[1].astype(int)).sum() > 0


def test_selector_debug_image_marks_levels():
    rng = np.random.default_rng(1)
    img = (rng.random((30, 40)) * 255).astype(np.float32)
    status = np.zeros((30, 40), np.int8)
    status[5, 5] = 1
    status[10, 20] = 2
    status[20, 30] = 4
    out = selector_debug_image(img, status)
    np.testing.assert_array_equal(out[5, 5], [0, 255, 0])
    np.testing.assert_array_equal(out[10, 20], [0, 0, 255])
    np.testing.assert_array_equal(out[20, 30], [255, 0, 0])


def test_stitch_grid():
    ims = [np.full((4, 6, 3), i, np.uint8) for i in range(3)]
    out = stitch(ims, cols=2)
    assert out.shape == (8, 12, 3)
    assert out[0, 0, 0] == 0 and out[0, 6, 0] == 1 and out[4, 0, 0] == 2


def test_html3d_viewer_writes_standalone_scene(tmp_path):
    from sdv_loam_tpu.io.viewer3d import Html3DViewer
    p = str(tmp_path / "map.html")
    v = Html3DViewer(p)
    rng = np.random.default_rng(2)
    for i in range(4):
        T = np.eye(4)
        T[2, 3] = float(i)
        v.publish_cam_pose(i, 0.1 * i, T)
    pts = rng.standard_normal((100, 3)).astype(np.float32)
    v.publish_keyframes([0, 1], np.stack([np.eye(4), np.eye(4)]),
                        pts, np.zeros(100, int))
    v.join()
    html = open(p).read()
    assert html.startswith("<!doctype html>")
    assert "webgl" in html and "__DATA__" not in html
    # embedded data round-trips
    import json
    import re
    m = re.search(r"const DATA = (\{.*?\});\n", html, re.S)
    data = json.loads(m.group(1))
    assert data["nKf"] == 1 and len(data["pts"]) == 300
    assert abs(data["pathLen"] - 3.0) < 1e-6
    # frusta: 2 cams x 8 segments x 2 endpoints x 3 coords
    assert len(data["frusta"]) == 2 * 8 * 2 * 3
    # reset clears state
    v.reset()
    assert v._n_kf == 0 and len(v._pts) == 0
