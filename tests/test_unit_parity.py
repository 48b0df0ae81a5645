"""Unit-parity tests against the compiled reference (VERDICT r4 item 3).

`native/oracle/unit_oracle` compiles the reference's accuracy-load-bearing
units with intentional TPU-side deltas and drives them on IDENTICAL
injected inputs (same tensor-file format as tests/test_parity.py):

  * `CoarseTracker::trackNewestCoarse` (CoarseTracker.cpp:662-838) vs
    `ops/photometric.track_pyramid` — identical LM schedule
    (cutoff-doubling, level repeat, accept rule, extrapolation), different
    accumulators (einsum f32/highest vs SSE). Contract: final pose within
    0.05 deg / 5 mm on a 0.4 m motion; per-level rmse within 5%.
  * `CoarseTracker::structPoseEstimation` (CoarseTracker.cpp:949-1007) vs
    `ops/struct_pose.struct_pose_estimate` — deltas 8/12/14 (PARITY.md):
    the reference recomputes H at the PREVIOUS accepted pose (its LM body
    updates `worldToCur_current` AFTER calling calcHandb, :988-992), so
    its gradient lags one accepted step and 10 iterations from a 0.4 m-off
    init stop short of the optimum (measured: 12 mm short); the TPU
    evaluates at the accepted pose. Contract: poses within 2.5 cm of each
    other AND 2 cm of truth, and the TPU final reaches an equal-or-lower
    pixel objective (it is the converged end of the same descent).
  * `Reprojector::align2D` (Reprojector.cpp:448-551) vs
    `ops/align.align2d_batch` — fixed-trip masked iteration vs early
    break. Contract: converged-set agreement >= 90%; for both-converged,
    endpoints within 0.05 px.
  * `EnergyFunctional::orthogonalize` + solveSystemF's scaled solve
    (EnergyFunctional.cpp:615-648, :650-759) vs `models/backend.
    orthogonalize` + `backend.solve_system` — MGS projector vs SVD
    pseudo-inverse, f32 vs double. Contract: solved x within 1e-3
    relative; nullspace components removed to 1e-4 of |x|.

Marked slow: the oracle binary build takes ~3 min the first time.
"""

import os
import struct
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ORACLE_DIR = os.path.join(REPO, "native", "oracle")
BIN = os.path.join(ORACLE_DIR, "unit_oracle")

pytestmark = pytest.mark.slow


def _write_bin(path, arr):
    arr = np.ascontiguousarray(arr, dtype=np.float32)
    with open(path, "wb") as f:
        f.write(struct.pack("i", arr.ndim))
        for d in arr.shape:
            f.write(struct.pack("i", d))
        f.write(arr.tobytes())


def _read_bin(path):
    with open(path, "rb") as f:
        nd = struct.unpack("i", f.read(4))[0]
        dims = [struct.unpack("i", f.read(4))[0] for _ in range(nd)]
        data = np.frombuffer(f.read(), dtype=np.float32)
    return data.reshape(dims)


@pytest.fixture(scope="module")
def unit_bin():
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference tree unavailable")
    r = subprocess.run(["make", "-C", ORACLE_DIR, "unit_oracle"],
                       capture_output=True, text=True)
    if r.returncode != 0 or not os.path.exists(BIN):
        pytest.skip(f"unit oracle build failed: {r.stderr[-500:]}")
    return BIN


def _textured_image(w, h, seed, scale=8):
    rng = np.random.default_rng(seed)
    coarse = rng.random((h // scale + 2, w // scale + 2))
    yy, xx = np.mgrid[0:h, 0:w]
    fy, fx = yy / scale, xx / scale
    y0, x0 = fy.astype(int), fx.astype(int)
    ay, ax = fy - y0, fx - x0
    img = (coarse[y0, x0] * (1 - ax) * (1 - ay)
           + coarse[y0, x0 + 1] * ax * (1 - ay)
           + coarse[y0 + 1, x0] * (1 - ax) * ay
           + coarse[y0 + 1, x0 + 1] * ax * ay)
    img = 30 + 200 * img + 8 * rng.random((h, w))
    return img.astype(np.float32)


def _render_plane(w, h, fx, fy, cx, cy, T_cw, tex, Z0):
    """Render a camera at T_cw viewing the textured Z=Z0 world plane."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    rays = np.stack([(xx - cx) / fx, (yy - cy) / fy, np.ones_like(xx)])
    R = T_cw[:3, :3].T
    C = -R @ T_cw[:3, 3]
    d = np.einsum("ij,jhw->ihw", R, rays)
    s = (Z0 - C[2]) / d[2]
    X = C[0] + s * d[0]
    Y = C[1] + s * d[1]
    th, tw = tex.shape
    tx = np.clip(X / 0.05 + tw / 2, 0, tw - 2)
    ty = np.clip(Y / 0.05 + th / 2, 0, th - 2)
    x0, y0 = tx.astype(int), ty.astype(int)
    ax, ay = tx - x0, ty - y0
    return (tex[y0, x0] * (1 - ax) * (1 - ay)
            + tex[y0, x0 + 1] * ax * (1 - ay)
            + tex[y0 + 1, x0] * (1 - ax) * ay
            + tex[y0 + 1, x0 + 1] * ax * ay).astype(np.float32)


def _rot_angle_deg(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1) / 2
    return np.degrees(np.arccos(np.clip(c, -1, 1)))


# --------------------------------------------------------------------- track
def test_track_newest_coarse_parity(unit_bin, tmp_path):
    """track_pyramid vs trackNewestCoarse on identical injected pc pools
    (ref: CoarseTracker.cpp:662-838)."""
    import jax.numpy as jnp

    from sdv_loam_tpu.ops.photometric import track_pyramid
    from sdv_loam_tpu.ops.pyramid import make_images

    w, h = 320, 224
    fx = fy = 250.0
    cx, cy = 160.0, 112.0
    Z0 = 10.0
    levels = 3
    tex = _textured_image(4 * w, 4 * h, seed=31, scale=24)

    T_true = np.eye(4)   # new_T_ref (ref at identity)
    ang = 0.01
    T_true[:3, :3] = np.array([[np.cos(ang), 0, np.sin(ang)],
                               [0, 1, 0],
                               [-np.sin(ang), 0, np.cos(ang)]])
    T_true[:3, 3] = [-0.25, 0.04, 0.3]

    ref_img = _render_plane(w, h, fx, fy, cx, cy, np.eye(4), tex, Z0)
    new_img = _render_plane(w, h, fx, fy, cx, cy, T_true, tex, Z0)

    dI_ref, _ = make_images(ref_img, levels)
    dI_new, _ = make_images(new_img, levels)

    # per-level pools: interior pixels of the REF frame, constant idepth
    # (fronto-parallel plane), colors sampled from the SAME pyramid both
    # sides consume (injected, so pyramid construction is out of scope)
    rng = np.random.default_rng(5)
    pools = []
    pool_np = []
    for lvl in range(levels):
        wl, hl = w >> lvl, h >> lvl
        n = [1500, 600, 250][lvl]
        us = rng.integers(4, wl - 4, n).astype(np.float32)
        vs = rng.integers(4, hl - 4, n).astype(np.float32)
        col = np.asarray(dI_ref[lvl])[vs.astype(int), us.astype(int), 0]
        idp = np.full(n, 1.0 / Z0, np.float32)
        pool_np.append(np.stack([us, vs, idp, col], 1))
        pools.append(dict(u=jnp.asarray(us), v=jnp.asarray(vs),
                          idepth=jnp.asarray(idp), color=jnp.asarray(col),
                          valid=jnp.ones(n, bool), n=jnp.int32(n)))

    T_init = np.eye(4, dtype=np.float32)
    T_init[:3, 3] = [-0.15, 0.0, 0.2]    # off the true pose, in the basin

    _write_bin(tmp_path / "ref.bin", ref_img)
    _write_bin(tmp_path / "new.bin", new_img)
    for lvl in range(levels):
        _write_bin(tmp_path / f"pool_l{lvl}.bin", pool_np[lvl])
    _write_bin(tmp_path / "T.bin", T_init)
    _write_bin(tmp_path / "aff.bin", np.zeros(4, np.float32))
    subprocess.run(
        [unit_bin, "track", str(fx), str(fy), str(cx), str(cy),
         str(levels - 1), str(tmp_path / "ref.bin"), str(tmp_path / "new.bin"),
         str(tmp_path / "pool"), str(tmp_path / "T.bin"),
         str(tmp_path / "aff.bin"), str(tmp_path / "out.bin")],
        check=True, timeout=300)
    ref = _read_bin(tmp_path / "out.bin")
    T_ref = ref[:16].reshape(4, 4)
    aff_ref = ref[16:18]
    res_ref = ref[18:23]
    ok_ref = bool(ref[26])

    Ks = tuple(jnp.asarray(
        [fx / 2 ** l, fy / 2 ** l,
         (cx + 0.5) / 2 ** l - 0.5, (cy + 0.5) / 2 ** l - 0.5], jnp.float32)
        for l in range(levels))
    out = track_pyramid(
        tuple(pools), tuple(dI_new[l] for l in range(levels)), Ks,
        jnp.asarray(T_init), jnp.zeros(2, jnp.float32),
        jnp.zeros(2, jnp.float32), jnp.ones(2, jnp.float32),
        jnp.full((5,), jnp.inf, jnp.float32), 20.0, 6.0,
        coarsest_lvl=levels - 1)
    T_ours = np.asarray(out["T"])
    res_ours = np.asarray(out["res"])

    assert ok_ref and bool(out["ok"])
    # both recover the true motion
    assert np.linalg.norm(T_ref[:3, 3] - T_true[:3, 3]) < 0.01
    assert np.linalg.norm(T_ours[:3, 3] - T_true[:3, 3]) < 0.01
    # and agree with each other (contract: 5 mm / 0.05 deg on 0.4 m motion)
    dt = np.linalg.norm(T_ref[:3, 3] - T_ours[:3, 3])
    dr = _rot_angle_deg(T_ref[:3, :3], T_ours[:3, :3])
    assert dt < 5e-3, (dt, T_ref[:3, 3], T_ours[:3, 3])
    assert dr < 0.05, dr
    assert np.abs(aff_ref - np.asarray(out["aff"])).max() < 0.05
    for lvl in range(levels):
        assert abs(res_ours[lvl] - res_ref[lvl]) < 0.05 * res_ref[lvl] + 0.2, \
            (lvl, res_ours[lvl], res_ref[lvl])


# ---------------------------------------------------------------- structpose
def test_struct_pose_parity(unit_bin, tmp_path):
    """struct_pose_estimate vs CoarseTracker::structPoseEstimation
    (ref: CoarseTracker.cpp:949-1007)."""
    import jax.numpy as jnp

    from sdv_loam_tpu.ops.struct_pose import struct_pose_estimate

    w, h = 320, 224
    fx = fy = 250.0
    cx, cy = 160.0, 112.0
    host_img = _textured_image(w, h, seed=41)

    rng = np.random.default_rng(7)
    N = 150
    us = rng.integers(8, w - 8, N).astype(np.float32)
    vs = rng.integers(8, h - 8, N).astype(np.float32)
    Z = rng.uniform(6.0, 30.0, N).astype(np.float32)
    idp = (1.0 / Z).astype(np.float32)

    T_host = np.eye(4)                       # host camToWorld
    # world points (reference math: point2world with float32 K inverse)
    X = (us - cx) / fx * Z
    Y = (vs - cy) / fy * Z
    pw = np.stack([X, Y, Z], 1).astype(np.float32)

    # true current pose: small motion; observations = exact projections
    ang = 0.008
    T_cur = np.eye(4)
    T_cur[:3, :3] = np.array([[np.cos(ang), -np.sin(ang), 0],
                              [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    T_cur[:3, 3] = [0.1, -0.05, 0.4]         # camToWorld
    T_wc = np.linalg.inv(T_cur)
    pc = pw @ T_wc[:3, :3].T + T_wc[:3, 3]
    obs = np.stack([fx * pc[:, 0] / pc[:, 2] + cx,
                    fy * pc[:, 1] / pc[:, 2] + cy], 1).astype(np.float32)
    # px noise so the optimum is not exactly the init-reachable truth
    obs += rng.normal(0, 0.3, obs.shape).astype(np.float32)

    T_init = np.eye(4, dtype=np.float32)     # camToWorld init (off by ~0.4m)

    _write_bin(tmp_path / "host.bin", host_img)
    _write_bin(tmp_path / "Thw.bin", T_host.astype(np.float32))
    _write_bin(tmp_path / "pts.bin", np.stack([us, vs, idp], 1))
    _write_bin(tmp_path / "obs.bin", obs)
    _write_bin(tmp_path / "Tcw.bin", T_init)
    subprocess.run(
        [unit_bin, "structpose", str(fx), str(fy), str(cx), str(cy),
         str(tmp_path / "host.bin"), str(tmp_path / "Thw.bin"),
         str(tmp_path / "pts.bin"), str(tmp_path / "obs.bin"),
         str(tmp_path / "Tcw.bin"), str(tmp_path / "outT.bin")],
        check=True, timeout=120)
    T_ref = _read_bin(tmp_path / "outT.bin")

    out = struct_pose_estimate(
        jnp.asarray(T_init), jnp.asarray(pw), jnp.asarray(obs),
        jnp.ones(N, bool), jnp.asarray([fx, fy, cx, cy], jnp.float32),
        w, h, standardize=False)
    T_ours = np.asarray(out["T_cur_to_world"])

    # both near the true pose
    assert np.linalg.norm(T_ref[:3, 3] - T_cur[:3, 3]) < 0.02
    assert np.linalg.norm(T_ours[:3, 3] - T_cur[:3, 3]) < 0.02
    # near each other: residual gap = the reference's one-step gradient lag
    # (calcHandb at the previous accepted pose, :988-992), measured ~12 mm
    # from this 0.4 m-off init
    dt = np.linalg.norm(T_ref[:3, 3] - T_ours[:3, 3])
    dr = _rot_angle_deg(T_ref[:3, :3], T_ours[:3, :3])
    assert dt < 2.5e-2, (dt, T_ref[:3, 3], T_ours[:3, 3])
    assert dr < 0.05, dr

    # the TPU endpoint is the more-converged one: equal-or-lower mean
    # pixel reprojection error on the SAME objective's measurements
    def mean_px_err(T_cw):
        Twc = np.linalg.inv(T_cw)
        pc2 = pw @ Twc[:3, :3].T + Twc[:3, 3]
        uv = np.stack([fx * pc2[:, 0] / pc2[:, 2] + cx,
                       fy * pc2[:, 1] / pc2[:, 2] + cy], 1)
        return float(np.mean(np.linalg.norm(uv - obs, axis=1)))

    e_ref, e_ours = mean_px_err(T_ref), mean_px_err(T_ours)
    assert e_ours <= e_ref * 1.02 + 1e-3, (e_ours, e_ref)


# ------------------------------------------------------------------- align2d
def test_align2d_parity(unit_bin, tmp_path):
    """align2d_batch vs Reprojector::align2D on identical uint8 ref patches
    (ref: Reprojector.cpp:448-551)."""
    import jax.numpy as jnp

    from sdv_loam_tpu.ops.align import align2d_batch, flatten_pyramid
    from sdv_loam_tpu.ops.pyramid import make_images

    w, h = 320, 224
    fx = fy = 250.0
    cx, cy = 160.0, 112.0
    img = _textured_image(w, h, seed=51)
    dI, _ = make_images(img, 3)

    rng = np.random.default_rng(3)
    M = 120
    u0 = rng.integers(12, w - 12, M).astype(np.float64)
    v0 = rng.integers(12, h - 12, M).astype(np.float64)
    # reference patches: the image's own 10x10 neighborhoods, quantized to
    # uint8 exactly as the reference's warp buffer stores them
    img0 = np.asarray(dI[0])[..., 0]
    patches = np.zeros((M, 10, 10), np.float32)
    for m in range(M):
        iy, ix = int(v0[m]) - 5, int(u0[m]) - 5
        patches[m] = np.clip(img0[iy + 1:iy + 11, ix + 1:ix + 11], 0, 255)
    patches = np.floor(patches + 0.5)        # uint8 quantization, both sides
    px_init = np.stack([u0, v0], 1) + rng.uniform(-1.5, 1.5, (M, 2))
    px_init = px_init.astype(np.float32)

    _write_bin(tmp_path / "img.bin", img)
    _write_bin(tmp_path / "patches.bin", patches)
    _write_bin(tmp_path / "px.bin", px_init)
    _write_bin(tmp_path / "aff.bin", np.array([1.0, 0.0], np.float32))
    subprocess.run(
        [unit_bin, "align2d", str(fx), str(fy), str(cx), str(cy),
         str(tmp_path / "img.bin"), "0", str(tmp_path / "patches.bin"),
         str(tmp_path / "px.bin"), str(tmp_path / "aff.bin"),
         str(tmp_path / "out.bin")], check=True, timeout=120)
    ref = _read_bin(tmp_path / "out.bin")    # (M,3): u v conv

    flat, offsets, widths, heights = flatten_pyramid(dI)
    px, conv = align2d_batch(
        flat, jnp.asarray(offsets), jnp.asarray(widths),
        jnp.asarray(heights), jnp.zeros(M, jnp.int32),
        jnp.asarray(patches), jnp.asarray(px_init),
        jnp.ones(M, jnp.float32), jnp.zeros(M, jnp.float32),
        jnp.ones(M, bool))
    px = np.asarray(px)
    conv = np.asarray(conv)

    conv_ref = ref[:, 2] > 0.5
    assert conv_ref.mean() > 0.6             # the scene converges mostly
    agree = (conv == conv_ref).mean()
    assert agree >= 0.9, (agree, conv.mean(), conv_ref.mean())
    both = conv & conv_ref
    d = np.hypot(px[both, 0] - ref[both, 0], px[both, 1] - ref[both, 1])
    assert (d < 0.05).mean() >= 0.95, (np.percentile(d, 95), d.max())


# --------------------------------------------------------------------- solve
def test_solve_system_parity(unit_bin, tmp_path):
    """backend.solve_system (+MGS orthogonalize) vs solveSystemF's scaled
    solve (+SVD orthogonalize) on an identical synthetic window system
    (ref: EnergyFunctional.cpp:615-648, 650-759)."""
    import jax.numpy as jnp

    from sdv_loam_tpu.models import backend

    F = 8
    D = 4 + 6 * F
    rng = np.random.default_rng(17)

    def psd(scale, m):
        J = rng.normal(0, 1, (m, D))
        return (J.T @ J * scale / m).astype(np.float32)

    HA = psd(400.0, 4 * D)
    Hsc = psd(60.0, 4 * D)
    HM = psd(30.0, 4 * D)
    bA = rng.normal(0, 5.0, D).astype(np.float32)
    bsc = rng.normal(0, 1.0, D).astype(np.float32)
    bM = rng.normal(0, 1.0, D).astype(np.float32)
    delta = rng.normal(0, 1e-3, D).astype(np.float32)
    lam = 0.1

    # realistic nullspaces from random window poses
    from sdv_loam_tpu.utils import se3 as se3u
    T_stack = []
    for _ in range(F):
        xi = rng.normal(0, 0.2, 6).astype(np.float32)
        T_stack.append(np.asarray(se3u.se3_exp(jnp.asarray(xi))))
    T_stack = np.stack(T_stack)
    NS = np.asarray(backend.make_nullspaces(
        jnp.asarray(T_stack), jnp.ones(F, jnp.float32)))   # (D, 7)

    for name, a in (("HA", HA), ("Hsc", Hsc), ("HM", HM), ("bA", bA),
                    ("bsc", bsc), ("bM", bM), ("delta", delta), ("NS", NS)):
        _write_bin(tmp_path / f"{name}.bin", a)
    subprocess.run(
        [unit_bin, "solve", str(tmp_path / "HA.bin"),
         str(tmp_path / "Hsc.bin"), str(tmp_path / "HM.bin"),
         str(tmp_path / "bA.bin"), str(tmp_path / "bsc.bin"),
         str(tmp_path / "bM.bin"), str(tmp_path / "delta.bin"),
         str(tmp_path / "NS.bin"), str(lam), str(tmp_path / "x.bin")],
        check=True, timeout=120)
    x_ref = _read_bin(tmp_path / "x.bin")

    N = 16
    sys_ = dict(H_top=jnp.asarray(HA), b_top=jnp.asarray(bA),
                H_sc=jnp.asarray(Hsc), b_sc=jnp.asarray(bsc),
                Hdd=jnp.ones(N, jnp.float32), bd=jnp.zeros(N, jnp.float32),
                HdiF=jnp.zeros(N, jnp.float32),
                Vpt=jnp.zeros((N, D), jnp.float32),
                n_active=jnp.int32(N),
                e_quad=jnp.float32(0.0))
    out = backend.solve_system(
        sys_, jnp.asarray(HM), jnp.asarray(bM), jnp.asarray(delta),
        jnp.zeros(4, jnp.float32), jnp.zeros(4, jnp.float32),
        jnp.zeros((F, 6), jnp.float32), jnp.zeros((F, 6), jnp.float32),
        jnp.ones(F, bool), jnp.asarray(NS), jnp.float32(lam),
        jnp.zeros(N, jnp.int32), jnp.zeros(N, bool),
        jnp.zeros((F, F), jnp.int32), n_frames=F)
    x_ours = np.asarray(out["x"])

    rel = np.linalg.norm(x_ours - x_ref) / max(np.linalg.norm(x_ref), 1e-9)
    assert rel < 1e-3, (rel, np.abs(x_ours - x_ref).max())
    # both projectors actually removed the nullspace directions
    for x in (x_ours, x_ref):
        proj = NS.T @ x
        assert np.abs(proj).max() < 1e-4 * max(np.linalg.norm(x), 1e-9), proj


# ----------------------------------------------------------------- coarsesel
def test_coarse_selector_parity(unit_bin, tmp_path):
    """Quantify the declared coarse-level selector deviation (VERDICT r4
    item 8): ops/mono_init._select_level replaces makePixelStatus's
    per-cell 4-orientation grid maxima (PixelSelector.h:12-195) with a
    gradient-quantile cut toward the same density target. Contract on a
    textured scene, levels 1-2: selected count within 40% of the
    reference's, and at least 35% of the TPU picks land in the reference's
    set (same high-gradient population, different per-cell tie-breaks —
    exact parity is out of scope by design, mono-path only)."""
    import jax.numpy as jnp  # noqa: F401  (jax init ordering)

    from sdv_loam_tpu.config import Settings
    from sdv_loam_tpu.ops.mono_init import MonoInitializer
    from sdv_loam_tpu.ops.pyramid import make_images
    from sdv_loam_tpu.utils.camera import make_pyramid_calib

    w, h = 320, 224
    fx = fy = 250.0
    cx, cy = 160.0, 112.0
    img = _textured_image(w, h, seed=61)
    dI, ag = make_images(img, 3)
    calib = make_pyramid_calib(w, h, fx, fy, cx, cy)
    mi = MonoInitializer(calib, Settings())

    _write_bin(tmp_path / "img.bin", img)
    densities = [0.03, 0.05, 0.15]     # setFirst (CoarseInitializer.cpp:700)
    for lvl in (1, 2):
        density = densities[lvl] * w * h
        subprocess.run(
            [unit_bin, "coarsesel", str(fx), str(fy), str(cx), str(cy),
             str(tmp_path / "img.bin"), str(lvl), str(density),
             str(tmp_path / "sel.bin")], check=True, timeout=120)
        out = _read_bin(tmp_path / "sel.bin")
        wl, hl = w >> lvl, h >> lvl
        ref_map = out[:-1].reshape(hl, wl) > 0.5
        n_ref = int(out[-1])

        u, v = mi._select_level(dI[lvl], np.asarray(ag[lvl]), lvl, density)
        ours = np.zeros((hl, wl), bool)
        ours[v.astype(int), u.astype(int)] = True
        n_ours = int(ours.sum())

        assert n_ref > 100 and n_ours > 100, (lvl, n_ref, n_ours)
        ratio = n_ours / n_ref
        assert 0.6 < ratio < 1.4, (lvl, n_ours, n_ref)
        overlap = (ours & ref_map).sum() / max(n_ours, 1)
        assert overlap > 0.35, (lvl, overlap, n_ours, n_ref)
