"""Monocular coarse initializer — the camera-only bootstrap.

Reference: src/FullSystem/CoarseInitializer.cpp
  * setFirst (:687-764): per-level point selection (PixelSelector at level
    0, gradient-threshold makePixelStatus above), idepth = 1 everywhere,
    10-NN neighbour graph + coarser-level parent links via nanoflann
    (makeNN :998-1075 — here ops/knn, the brute-force MXU equivalent);
  * trackFrame (:50-230): coarse-to-fine LM over (SE3 pose, affine a/b)
    with per-point idepth solved by Schur complement (calcResAndGS
    :281-525), translation-prior "alpha" energy pushing idepths to 1
    until enough parallax accumulates ("snapped"), then a coupling term
    toward the neighbour-regularized iR (optReg :552-589, calcEC
    :533-551);
  * propagateUp/Down (:590-686), resetPoints (:890-917), doStep/applyStep
    (:918-996) between levels and iterations.

The reference runs this only when LiDAR is absent (its ROS flow always
has LiDAR, so the path is dead there); here it is a first-class
capability: `FullSystem` falls back to it when frames arrive without a
cloud, making the pipeline run camera-only (monocular, scale-free).

TPU-native design: each level's whole LM (residual+GS accumulation,
8x8 Schur solve, idepth back-substitution, neighbour regularization,
accept/reject) is ONE fused device program with a `lax.while_loop`; the
pattern gathers use the quad-packed sampler (ops/warp.pack_bilinear).
Between-level propagation and the one-time NN build run on host numpy
(they execute once per level per frame on <= a few thousand points).

Deviations (documented):
  * level-0 selection reuses ops/select.make_maps (the reference's
    PixelSelector with thFactor=2); upper levels select by a gradient
    quantile toward the density target instead of makePixelStatus's
    threshold-iteration loop — same intent, deterministic;
  * point counts are padded to a fixed cap per level (masked lanes).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sdv_loam_tpu.config import PATTERN_P, Settings
from sdv_loam_tpu.ops.knn import knn, nearest_cross
from sdv_loam_tpu.utils import se3

# trackFrame constants (CoarseInitializer.cpp:58-62)
ALPHA_K = 2.5 * 2.5
ALPHA_W = 150.0 * 150.0
REG_WEIGHT = 0.8
COUPLING_WEIGHT = 1.0
MAX_ITERS = (5, 5, 10, 30, 50)          # per level, fine->coarse
# wM preconditioner (CoarseInitializer.cpp:33-36; SCALE_* in NumType.h)
SCALE_XI_ROT = 1.0
SCALE_XI_TRANS = 0.5
SCALE_A = 10.0
SCALE_B = 1000.0
W_M = np.array([SCALE_XI_ROT] * 3 + [SCALE_XI_TRANS] * 3
               + [SCALE_A, SCALE_B], np.float32)


def _median_masked(vals, ok):
    """Per-row median of masked values — nth_element(nnn/2) semantics
    (optReg, CoarseInitializer.cpp:575): invalid entries sort to +inf and
    the median index is nnn // 2."""
    big = jnp.float32(np.inf)
    v = jnp.sort(jnp.where(ok, vals, big), axis=-1)
    nnn = ok.sum(-1)
    med = jnp.take_along_axis(v, (nnn // 2)[:, None], axis=-1)[:, 0]
    return med, nnn


@partial(jax.jit, static_argnames=("w", "h", "max_iters"))
def _level_lm(T_init, aff_init, pt, nbr_idx, nbr_ok, quad_new, ref_color,
              K, snapped_in, w: int, h: int, max_iters: int,
              huber_th: float = 9.0):
    """One pyramid level of trackFrame as ONE device program.

    pt: dict(u, v, idepth, iR, is_good, energy, energy_a, last_hessian)
        — (N,) pools (padded; is_good False on padding).
    quad_new: (h*w, 12) quad-packed target level (intensity+grads).
    ref_color: (N, 8) host pattern intensities (sampled once at set_first /
        propagate; the reference resamples colorRef every iteration, but
        the host image never changes).
    Returns dict with updated pose/aff/pools/snapped + diagnostics.
    """
    from sdv_loam_tpu.ops.align import _quad_bilinear

    # f32 throughout (the unit tests enable x64; default-dtype eyes/zeros
    # would poison the cond/while carries with f64)
    f32 = jnp.float32
    T_init = T_init.astype(f32)
    aff_init = aff_init.astype(f32)
    quad_new = quad_new.astype(f32)
    ref_color = ref_color.astype(f32)
    K = K.astype(f32)
    pt = {k: (v.astype(f32) if v.dtype.kind == "f" else v)
          for k, v in pt.items()}
    N = pt["u"].shape[0]
    fx, fy, cx, cy = K[0], K[1], K[2], K[3]
    pat = jnp.asarray(PATTERN_P, jnp.float32)
    npts = pt["is_good"].sum().astype(jnp.float32) + 1e-6
    n_total = jnp.maximum(pt["valid"].sum().astype(jnp.float32), 1.0)
    outlier_th = jnp.float32(8 * 12 * 12)
    wv = jnp.full((N, 1), w, jnp.int32)
    base0 = jnp.zeros((N, 1), jnp.int32)

    def calc_res_gs(T, aff, idepth, is_good, energy, energy_a):
        """calcResAndGS: per-point pattern residuals -> (H, b, Hsc, bsc,
        Jb, E, alphaEnergy, isGood_new, maxstep)."""
        R = T[:3, :3]
        t = T[:3, 3]
        Kinv_r = jnp.stack([(pt["u"][:, None] + pat[None, :, 0] - cx) / fx,
                            (pt["v"][:, None] + pat[None, :, 1] - cy) / fy,
                            jnp.ones((N, 8), jnp.float32)], axis=-1)        # (N, 8, 3)
        ptp = jnp.einsum("ij,npj->npi", R, Kinv_r) \
            + (t[None, :] * idepth[:, None])[:, None, :]
        u = ptp[..., 0] / ptp[..., 2]
        v = ptp[..., 1] / ptp[..., 2]
        Ku = fx * u + cx
        Kv = fy * v + cy
        new_id = idepth[:, None] / ptp[..., 2]
        inb = (Ku > 1) & (Kv > 1) & (Ku < w - 2) & (Kv < h - 2) & (new_id > 0)
        Kuc = jnp.clip(Ku, 0.0, w - 1.01)
        Kvc = jnp.clip(Kv, 0.0, h - 1.01)
        hit = _quad_bilinear(quad_new, base0, wv, Kuc, Kvc)    # (N, 8, 3)
        a_exp = jnp.exp(aff[0])
        res = hit[..., 0] - a_exp * ref_color - aff[1]
        ok_fin = jnp.isfinite(res)
        absr = jnp.abs(res)
        hw = jnp.where(absr < huber_th, 1.0,
                       huber_th / jnp.maximum(absr, 1e-12))
        e_pat = hw * res * res * (2.0 - hw)
        good_pat = inb & ok_fin
        all_ok = good_pat.all(-1) & is_good
        energy_pt = jnp.where(good_pat, e_pat, 0.0).sum(-1)
        good_new = all_ok & (energy_pt <= outlier_th * 20)

        # Jacobian rows (:371-400)
        hws = jnp.where(hw < 1.0, jnp.sqrt(hw), hw)
        dxdd = (t[0] - t[2] * u) / ptp[..., 2]
        dydd = (t[1] - t[2] * v) / ptp[..., 2]
        dxi = hws * hit[..., 1] * fx
        dyi = hws * hit[..., 2] * fy
        dp = jnp.stack([
            new_id * dxi,
            new_id * dyi,
            -new_id * (u * dxi + v * dyi),
            -u * v * dxi - (1 + v * v) * dyi,
            (1 + u * u) * dxi + u * v * dyi,
            -v * dxi + u * dyi,
            -hws * a_exp * ref_color,
            -hws * jnp.ones_like(u),
        ], axis=-1)                                            # (N, 8, 8)
        dd = dxi * dxdd + dyi * dydd                           # (N, 8)
        rw = hws * res
        maxstep = jnp.where(
            good_pat, 1.0 / jnp.maximum(
                jnp.hypot(dxdd * fx, dydd * fy), 1e-12), 1e10).min(-1)

        gsel = good_new[:, None]
        dp_m = jnp.where(gsel[..., None], dp, 0.0)
        dd_m = jnp.where(gsel, dd, 0.0)
        r_m = jnp.where(gsel, rw, 0.0)
        Hm = jnp.einsum("npi,npj->ij", dp_m, dp_m)
        bm = jnp.einsum("npi,np->i", dp_m, r_m)
        Jb = jnp.concatenate([
            jnp.einsum("npi,np->ni", dp_m, dd_m),              # 0..7
            (r_m * dd_m).sum(-1)[:, None],                     # 8
            (dd_m * dd_m).sum(-1)[:, None],                    # 9
        ], axis=-1)

        # energies: failed points contribute their OLD energy (:315,:425)
        E_phot = jnp.where(good_new, energy_pt,
                           jnp.where(pt["valid"], energy, 0.0)).sum()
        ea_new = (idepth - 1.0) ** 2
        E_alpha_pts = jnp.where(good_new, ea_new,
                                jnp.where(pt["valid"], energy_a, 0.0)).sum()
        alpha_energy = ALPHA_W * (E_alpha_pts
                                  + jnp.sum(t * t) * npts)
        capped = alpha_energy > ALPHA_K * npts
        alpha_energy = jnp.minimum(alpha_energy, ALPHA_K * npts)
        alpha_opt = jnp.where(capped, 0.0, ALPHA_W)

        # Schur terms with alpha / coupling priors (:481-520)
        Jb8 = Jb[:, 8] + alpha_opt * (idepth - 1.0) \
            + jnp.where(capped, COUPLING_WEIGHT * (idepth - pt["iR"]), 0.0)
        Jb9 = Jb[:, 9] + alpha_opt + jnp.where(capped, COUPLING_WEIGHT, 0.0)
        Jb9i = jnp.where(good_new, 1.0 / (1.0 + Jb9), 0.0)
        Hsc = jnp.einsum("ni,nj,n->ij", Jb[:, :8], Jb[:, :8], Jb9i)
        bsc = jnp.einsum("ni,n->i", Jb[:, :8], Jb8 * Jb9i)
        Hm = Hm + jnp.diag(jnp.concatenate(
            [jnp.full(3, alpha_opt * npts, jnp.float32),
             jnp.zeros(5, jnp.float32)]))
        tlog = se3.se3_log(T)[:3]
        bm = bm + jnp.concatenate([tlog * alpha_opt * npts,
                               jnp.zeros(5, jnp.float32)])

        Jb_out = jnp.concatenate([Jb[:, :8], Jb8[:, None],
                                  (Jb9i)[:, None]], axis=-1)
        return dict(H=Hm, b=bm, Hsc=Hsc, bsc=bsc, Jb=Jb_out,
                    E_phot=E_phot, alpha_energy=alpha_energy,
                    capped=capped, good_new=good_new,
                    energy_pt=jnp.where(good_new, energy_pt, energy),
                    energy_a=jnp.where(good_new, ea_new, energy_a),
                    hess=Jb[:, 9], maxstep=maxstep)

    def opt_reg(idepth, iR, is_good, snapped):
        """optReg: iR <- 0.2 id + 0.8 median(neighbour iR) (:552-589)."""
        nb_iR = iR[jnp.clip(nbr_idx, 0, N - 1)]
        nb_ok = nbr_ok & is_good[jnp.clip(nbr_idx, 0, N - 1)]
        med, nnn = _median_masked(nb_iR, nb_ok)
        use = is_good & (nnn > 2) & jnp.isfinite(med)
        iR_new = jnp.where(use, (1 - REG_WEIGHT) * idepth + REG_WEIGHT * med,
                           iR)
        return jnp.where(snapped, iR_new, jnp.ones_like(iR))

    st0 = calc_res_gs(T_init, aff_init, pt["idepth"], pt["is_good"],
                      pt["energy"], pt["energy_a"])

    def cond(c):
        return (c["it"] < max_iters) & (c["fails"] < 2) & (~c["done"])

    def body(c):
        lam = c["lam"]
        Hl = c["H"] * (1.0 + lam * jnp.eye(8, dtype=jnp.float32)) \
            - c["Hsc"] / (1.0 + lam)
        bl = c["b"] - c["bsc"] / (1.0 + lam)
        s = 0.01 / (w * h)
        wm = jnp.asarray(W_M)
        Hl = wm[:, None] * Hl * wm[None, :] * s
        bl = wm * bl * s
        inc = -(wm * jnp.linalg.solve(
            Hl + jnp.eye(8, dtype=jnp.float32) * 1e-12, bl))
        inc = jnp.where(jnp.isfinite(inc), inc, 0.0)
        T_new = se3.se3_exp(inc[:6]) @ c["T"]
        aff_new = c["aff"] + inc[6:8]

        # doStep (:918-945): per-point idepth back-substitution
        bstep = c["Jb"][:, 8] + c["Jb"][:, :8] @ inc
        step = -bstep * c["Jb"][:, 9] / (1.0 + lam)
        mstep = jnp.minimum(0.25 * c["maxstep"], 1e10)
        step = jnp.clip(step, -mstep, mstep)
        id_new = jnp.clip(c["idepth"] + step, 1e-3, 50.0)
        id_new = jnp.where(c["is_good"], id_new, c["idepth"])

        st = calc_res_gs(T_new, aff_new, id_new, c["is_good"],
                         c["energy"], c["energy_a"])
        # calcEC (:533-551): coupling energy old/new (zero pre-snap)
        ec_ok = st["good_new"]
        ec_old = jnp.where(ec_ok, (c["idepth"] - c["iR"]) ** 2, 0.0).sum()
        ec_new = jnp.where(ec_ok, (id_new - c["iR"]) ** 2, 0.0).sum()
        snapped = c["snapped"]
        ec_old = jnp.where(snapped, COUPLING_WEIGHT * ec_old, 0.0)
        ec_new = jnp.where(snapped, COUPLING_WEIGHT * ec_new, 0.0)

        e_new = st["E_phot"] + st["alpha_energy"] + ec_new
        e_old = c["E_phot"] + c["alpha_energy"] + ec_old
        accept = e_old > e_new
        snapped = snapped | (accept & st["capped"])

        def on_accept():
            is_good = st["good_new"]
            iR = opt_reg(id_new, c["iR"], is_good, snapped)
            return dict(
                c, T=T_new, aff=aff_new, idepth=id_new, iR=iR,
                is_good=is_good, energy=st["energy_pt"],
                energy_a=st["energy_a"], last_hessian=st["hess"],
                H=st["H"], b=st["b"], Hsc=st["Hsc"], bsc=st["bsc"],
                Jb=st["Jb"], maxstep=st["maxstep"],
                E_phot=st["E_phot"], alpha_energy=st["alpha_energy"],
                lam=jnp.maximum(lam * 0.5, 1e-4), fails=jnp.int32(0))

        def on_reject():
            return dict(c, lam=jnp.minimum(lam * 4.0, 1e4),
                        fails=c["fails"] + 1)

        out = jax.lax.cond(accept, on_accept, on_reject)
        out["snapped"] = snapped
        out["it"] = c["it"] + 1
        out["done"] = jnp.linalg.norm(inc) <= 1e-4
        return out

    carry = dict(T=T_init, aff=aff_init, idepth=pt["idepth"], iR=pt["iR"],
                 is_good=pt["is_good"], energy=pt["energy"],
                 energy_a=pt["energy_a"], last_hessian=pt["last_hessian"],
                 H=st0["H"], b=st0["b"], Hsc=st0["Hsc"], bsc=st0["bsc"],
                 Jb=st0["Jb"], maxstep=st0["maxstep"],
                 E_phot=st0["E_phot"], alpha_energy=st0["alpha_energy"],
                 lam=jnp.float32(0.1), fails=jnp.int32(0),
                 snapped=snapped_in,
                 it=jnp.int32(0), done=jnp.zeros((), bool))
    # applyStep after the initial calcRes (:99): energies/hessians adopt
    carry["is_good"] = st0["good_new"]
    carry["energy"] = st0["energy_pt"]
    carry["energy_a"] = st0["energy_a"]
    carry["last_hessian"] = st0["hess"]

    out = jax.lax.while_loop(cond, body, carry)
    rmse = jnp.sqrt(out["E_phot"] / jnp.maximum(n_total * 8.0, 1.0))
    return dict(T=out["T"], aff=out["aff"], idepth=out["idepth"],
                iR=out["iR"], is_good=out["is_good"], energy=out["energy"],
                energy_a=out["energy_a"], last_hessian=out["last_hessian"],
                snapped=out["snapped"], rmse=rmse, iters=out["it"])


class MonoInitializer:
    """Host driver: per-level pools + the reference's frame protocol.

    Usage: `set_first(dI, abs_grads)` on the first camera frame, then
    `track_frame(dI)` per frame until it returns True (snapped and settled
    for 5 more frames, trackFrame:224-229)."""

    def __init__(self, calib, settings: Settings | None = None):
        self.calib = calib                  # PyramidCalib (utils/camera.py)
        self.s = settings or Settings()
        self.levels = calib.levels
        self.snapped = False
        self.snapped_at = 0
        self.frame_id = 0
        self.T = np.eye(4, dtype=np.float32)          # thisToNext
        self.aff = np.zeros(2, np.float32)
        self.pts: list[dict] = []

    # ------------------------------------------------------------- setup
    def _select_level(self, dI_l, ag_l, lvl, density):
        """Level-0: the PixelSelector cascade (thFactor=2, setFirst:705);
        above: gradient-quantile selection toward the density target
        (deviation from makePixelStatus's threshold loop, module doc)."""
        h, w = ag_l.shape
        pad = 3  # patternPadding + 1
        if lvl == 0:
            from sdv_loam_tpu.ops.select import make_maps
            status, _ = make_maps(dI_l, (ag_l, ag_l, ag_l),
                                  np.ones((h, w), bool), density,
                                  jax.random.PRNGKey(7), {"pot": 3},
                                  self.s, th_factor=2.0)
            mask = np.asarray(status) != 0
        else:
            g = np.asarray(ag_l)
            q = max(0.0, 1.0 - density / (g.size + 1e-9))
            mask = g > np.quantile(g, q)
        mask[:pad + 1] = mask[-pad - 2:] = False
        mask[:, :pad + 1] = mask[:, -pad - 2:] = False
        v, u = np.nonzero(mask)
        return u.astype(np.float32) + 0.1, v.astype(np.float32) + 0.1

    def set_first(self, dI, abs_grads):
        """setFirst (:687-764): select, init idepth=1, build NN graph."""
        from sdv_loam_tpu.ops.trace import pattern_colors

        w0, h0 = self.calib.w[0], self.calib.h[0]
        densities = [0.03, 0.05, 0.15, 0.5, 1.0]
        self.pts = []
        self.dI_first = dI
        for lvl in range(self.levels):
            u, v = self._select_level(
                dI[lvl], abs_grads[lvl], lvl,
                densities[min(lvl, 4)] * w0 * h0)
            n = len(u)
            cap = max(64, int(2 ** np.ceil(np.log2(max(n, 1)))))
            valid = np.zeros(cap, bool)
            valid[:n] = True
            up = np.zeros(cap, np.float32)
            vp = np.zeros(cap, np.float32)
            up[:n], vp[:n] = u, v
            color, _, _, finite, _ = pattern_colors(
                dI[lvl], jnp.asarray(up), jnp.asarray(vp))
            valid &= np.asarray(finite)
            idx, d2 = knn(jnp.stack([jnp.asarray(up), jnp.asarray(vp)], -1),
                          jnp.asarray(valid), k=10)
            self.pts.append(dict(
                u=up, v=vp, valid=valid,
                idepth=np.ones(cap, np.float32),
                iR=np.ones(cap, np.float32),
                is_good=valid.copy(),
                energy=np.zeros(cap, np.float32),
                energy_a=np.zeros(cap, np.float32),
                last_hessian=np.zeros(cap, np.float32),
                ref_color=np.asarray(color),
                nbr_idx=np.asarray(idx), nbr_ok=np.isfinite(np.asarray(d2)),
                parent=np.full(cap, -1, np.int64)))
        for lvl in range(self.levels - 1):
            p = self.pts[lvl]
            q = self.pts[lvl + 1]
            pi, _ = nearest_cross(
                jnp.stack([jnp.asarray(p["u"] * 0.5 - 0.25),
                           jnp.asarray(p["v"] * 0.5 - 0.25)], -1),
                jnp.asarray(p["valid"]),
                jnp.stack([jnp.asarray(q["u"]), jnp.asarray(q["v"])], -1),
                jnp.asarray(q["valid"]))
            p["parent"] = np.asarray(pi)
        self.snapped = False
        self.snapped_at = 0
        self.frame_id = 0
        self.T = np.eye(4, dtype=np.float32)
        self.aff = np.zeros(2, np.float32)

    # ---------------------------------------------------- per-frame track
    def _reset_points(self, lvl):
        """resetPoints (:890-917): top level revives bad points from the
        neighbour mean."""
        p = self.pts[lvl]
        if lvl != self.levels - 1:
            return
        bad = p["valid"] & ~p["is_good"]
        if not bad.any():
            return
        nb = p["nbr_idx"]
        ok = p["nbr_ok"] & p["is_good"][np.clip(nb, 0, len(p["u"]) - 1)]
        s = (p["iR"][np.clip(nb, 0, len(p["u"]) - 1)] * ok).sum(-1)
        c = ok.sum(-1)
        revive = bad & (c > 0)
        mean = s / np.maximum(c, 1)
        for f in ("iR", "idepth"):
            p[f] = np.where(revive, mean, p[f]).astype(np.float32)
        p["is_good"] = p["is_good"] | revive

    def _propagate_down(self, src):
        """propagateDown (:631-662): fine level adopts parent iR."""
        p = self.pts[src - 1]
        q = self.pts[src]
        par = np.clip(p["parent"], 0, len(q["u"]) - 1)
        pgood = q["is_good"][par] & (q["last_hessian"][par] >= 0.1)
        piR = q["iR"][par]
        ph = q["last_hessian"][par]
        new_bad = p["valid"] & ~p["is_good"] & pgood
        wsum = p["last_hessian"] * 2 + ph
        blend = np.where(wsum > 0,
                         (p["iR"] * p["last_hessian"] * 2 + piR * ph)
                         / np.maximum(wsum, 1e-12), p["iR"])
        upd_good = p["is_good"] & pgood
        iR = np.where(new_bad, piR, np.where(upd_good, blend, p["iR"]))
        p["iR"] = iR.astype(np.float32)
        p["idepth"] = np.where(new_bad | upd_good, iR,
                               p["idepth"]).astype(np.float32)
        p["is_good"] = p["is_good"] | new_bad
        p["last_hessian"] = np.where(new_bad, 0.0,
                                     p["last_hessian"]).astype(np.float32)

    def _propagate_up(self, src):
        """propagateUp (:590-629): coarse iR from hessian-weighted fine."""
        p = self.pts[src]
        q = self.pts[src + 1]
        par = np.clip(p["parent"], 0, len(q["u"]) - 1)
        wgt = np.where(p["is_good"], p["last_hessian"], 0.0)
        sw = np.zeros(len(q["u"]), np.float64)
        sv = np.zeros(len(q["u"]), np.float64)
        np.add.at(sw, par, wgt)
        np.add.at(sv, par, wgt * p["iR"])
        upd = sw > 0
        val = (sv / np.maximum(sw, 1e-12)).astype(np.float32)
        q["iR"] = np.where(upd, val, q["iR"]).astype(np.float32)
        q["idepth"] = np.where(upd, val, q["idepth"]).astype(np.float32)
        q["is_good"] = q["is_good"] | upd

    def track_frame(self, dI_new) -> bool:
        """trackFrame (:50-230). Returns True when initialization is
        ready (snapped for > 5 frames)."""
        from sdv_loam_tpu.ops.warp import pack_bilinear

        if not self.snapped:
            self.T[:3, 3] = 0.0
            for p in self.pts:
                p["iR"] = p["idepth"].copy()
                p["last_hessian"][:] = 0.0

        T = jnp.asarray(self.T)
        aff = jnp.asarray(self.aff)
        snapped = jnp.asarray(self.snapped)
        for lvl in range(self.levels - 1, -1, -1):
            if lvl < self.levels - 1:
                self._propagate_down(lvl + 1)
            self._reset_points(lvl)
            p = self.pts[lvl]
            wl, hl = self.calib.w[lvl], self.calib.h[lvl]
            quad = pack_bilinear(dI_new[lvl])
            out = _level_lm(
                T, aff,
                dict(u=jnp.asarray(p["u"]), v=jnp.asarray(p["v"]),
                     valid=jnp.asarray(p["valid"]),
                     idepth=jnp.asarray(p["idepth"]),
                     iR=jnp.asarray(p["iR"]),
                     is_good=jnp.asarray(p["is_good"]),
                     energy=jnp.asarray(p["energy"]),
                     energy_a=jnp.asarray(p["energy_a"]),
                     last_hessian=jnp.asarray(p["last_hessian"])),
                jnp.asarray(p["nbr_idx"]), jnp.asarray(p["nbr_ok"]),
                quad, jnp.asarray(p["ref_color"]),
                jnp.asarray(self.calib.intrinsics_vec(lvl), jnp.float32),
                snapped, w=wl, h=hl,
                max_iters=MAX_ITERS[min(lvl, len(MAX_ITERS) - 1)])
            host = jax.device_get(out)
            T = jnp.asarray(host["T"])
            aff = jnp.asarray(host["aff"])
            snapped = jnp.asarray(bool(host["snapped"]))
            for f in ("idepth", "iR", "is_good", "energy", "energy_a",
                      "last_hessian"):
                p[f] = np.asarray(host[f])

        self.T = np.asarray(T)
        self.aff = np.asarray(aff)
        self.snapped = bool(host["snapped"])
        for lvl in range(self.levels - 1):
            self._propagate_up(lvl)
        self.frame_id += 1
        if not self.snapped:
            self.snapped_at = 0
        elif self.snapped_at == 0:
            self.snapped_at = self.frame_id
        return self.snapped and self.frame_id > self.snapped_at + 5

    # ---------------------------------------------------------- results
    def level0_points(self):
        """(u, v, idepth, scale) of good level-0 points, gauge-normalized
        to mean inverse depth 1 — the monocular gauge fix of DSO's
        initializeFromInitializer (the SDV reference's rescale() :526-531
        is its LiDAR-era vestige). The caller must scale the relative
        translation by the SAME factor: T.translation *= scale."""
        p = self.pts[0]
        m = p["valid"] & p["is_good"] & (p["iR"] > 0)
        fac = float(np.mean(p["iR"][m])) if m.any() else 1.0
        fac = max(fac, 1e-6)
        return p["u"][m], p["v"][m], p["iR"][m] / fac, fac
