// Unit-parity oracle driver (VERDICT r4 item 3).
//
// Exposes the reference's four accuracy-load-bearing units — with known,
// intentional TPU-side deltas — as tensor-file subcommands so
// tests/test_parity.py can quantify each delta on identical inputs:
//
//   * CoarseTracker::trackNewestCoarse  (CoarseTracker.cpp:662-838)
//     vs ops/photometric.track_pyramid (batched-candidate refinement,
//     einsum accumulators instead of SSE).
//   * CoarseTracker::structPoseEstimation (CoarseTracker.cpp:949-1007)
//     vs ops/struct_pose.struct_pose_estimate (documented deltas 8/12/14:
//     H-at-accepted-pose, MAD standardization option, veto in caller).
//   * Reprojector::align2D (Reprojector.cpp:448-551)
//     vs ops/align.align2d_batch (fixed-trip masked iteration).
//   * EnergyFunctional::orthogonalize + solveSystemF's scaled solve
//     (EnergyFunctional.cpp:615-648, :650-759)
//     vs models/backend.orthogonalize (MGS projector instead of SVD
//     pseudo-inverse) + backend.solve_system (f32/highest vs double).
//
// Reference state is injected directly (pc_* pools, PointHessians, frame
// shells) so both sides see byte-identical inputs; the reference sources
// are compiled unmodified from the read-only tree (ROS satisfied by the
// header stubs in stub/, CoarseTracker via the build-time
// missing-return patch shared with oracle_main).
//
// Tensor file format identical to native/parity/parity_main.cpp:
//   int32 ndim, int32 dims[ndim], float32 data row-major.

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <string>
#include <vector>

#include "util/NumType.h"
#include "util/globalCalib.h"
#include "util/settings.h"
#include "util/FrameShell.h"
#include "FullSystem/HessianBlocks.h"
#include "FullSystem/ImmaturePoint.h"
#include "FullSystem/Residuals.h"
#include "FullSystem/PixelSelector.h"
// test-oracle access to private members (pc_* pools, nullspace vectors);
// all dependency headers are included (and include-guarded) above, so the
// define is confined to these two class definitions in this TU
#define private public
#include "FullSystem/CoarseTracker.h"
#include "FullSystem/Reprojector.h"
#include "OptimizationBackend/EnergyFunctional.h"
#undef private

using namespace sdv_loam;

// ---------------------------------------------------------------- tensor IO
static std::vector<float> read_bin(const std::string& path,
                                   std::vector<int>* dims) {
    FILE* f = fopen(path.c_str(), "rb");
    if (!f) { fprintf(stderr, "cannot open %s\n", path.c_str()); exit(2); }
    int32_t nd = 0;
    if (fread(&nd, 4, 1, f) != 1) exit(2);
    dims->resize(nd);
    size_t n = 1;
    for (int i = 0; i < nd; i++) {
        int32_t d; if (fread(&d, 4, 1, f) != 1) exit(2);
        (*dims)[i] = d; n *= d;
    }
    std::vector<float> out(n);
    if (n && fread(out.data(), 4, n, f) != n) exit(2);
    fclose(f);
    return out;
}

static void write_bin(const std::string& path, const float* data,
                      std::vector<int> dims) {
    FILE* f = fopen(path.c_str(), "wb");
    if (!f) { fprintf(stderr, "cannot write %s\n", path.c_str()); exit(2); }
    int32_t nd = (int32_t)dims.size();
    fwrite(&nd, 4, 1, f);
    size_t n = 1;
    for (int d : dims) { int32_t dd = d; fwrite(&dd, 4, 1, f); n *= d; }
    fwrite(data, 4, n, f);
    fclose(f);
}

static SE3 se3_from_mat(const std::vector<float>& T) {
    Eigen::Matrix4d M;
    for (int i = 0; i < 4; i++)
        for (int j = 0; j < 4; j++) M(i, j) = T[4 * i + j];
    // re-orthonormalize against float32 round-trip
    Eigen::Matrix3d R = M.topLeftCorner<3, 3>();
    Eigen::JacobiSVD<Eigen::Matrix3d> svd(
        R, Eigen::ComputeFullU | Eigen::ComputeFullV);
    R = svd.matrixU() * svd.matrixV().transpose();
    return SE3(R, M.topRightCorner<3, 1>());
}

static void mat_from_se3(const SE3& T, float* out16) {
    Eigen::Matrix4d M = T.matrix();
    for (int i = 0; i < 4; i++)
        for (int j = 0; j < 4; j++) out16[4 * i + j] = (float)M(i, j);
}

static void set_calib(float fx, float fy, float cx, float cy, int w, int h) {
    Eigen::Matrix3f K; K.setIdentity();
    K(0, 0) = fx; K(1, 1) = fy; K(0, 2) = cx; K(1, 2) = cy;
    setGlobalCalib(w, h, K);
}

// ------------------------------------------------------------------- track
// track <fx> <fy> <cx> <cy> <coarsestLvl> <ref_img.bin> <new_img.bin>
//       <pool_prefix> <T_init.bin (4,4)> <aff.bin (4,): aff_init, ref_aff>
//       <out.bin>
// pool_prefix + "_l{lvl}.bin": (N,4) rows [u, v, idepth, color] per level.
// out: (27,) = T(16), aff(2), lastResiduals(5), flow(3), ok(1)
static int run_track(int argc, char** argv) {
    float fx = atof(argv[0]), fy = atof(argv[1]);
    float cx = atof(argv[2]), cy = atof(argv[3]);
    int coarsest = atoi(argv[4]);
    std::vector<int> dr, dn, dT, da;
    std::vector<float> rimg = read_bin(argv[5], &dr);
    std::vector<float> nimg = read_bin(argv[6], &dn);
    std::string pre = argv[7];
    std::vector<float> Tin = read_bin(argv[8], &dT);
    std::vector<float> aff = read_bin(argv[9], &da);
    int h = dr[0], w = dr[1];

    set_calib(fx, fy, cx, cy, w, h);
    CalibHessian hcalib;

    FrameHessian* ref = new FrameHessian();
    ref->makeImages(rimg.data(), &hcalib);
    ref->ab_exposure = 1.0f;
    FrameHessian* nf = new FrameHessian();
    nf->makeImages(nimg.data(), &hcalib);
    nf->ab_exposure = 1.0f;

    CoarseTracker ct(w, h);
    ct.makeK(&hcalib);
    ct.lastRef = ref;
    ct.newFrame = nf;
    ct.lastRef_aff_g2l = AffLight(aff[2], aff[3]);
    ct.refFrameID = 0;
    for (int lvl = 0; lvl <= coarsest; lvl++) {
        std::vector<int> dp;
        char buf[64]; snprintf(buf, sizeof(buf), "_l%d.bin", lvl);
        std::vector<float> pts = read_bin(pre + buf, &dp);
        int n = dp[0];
        for (int i = 0; i < n; i++) {
            ct.pc_u[lvl][i] = pts[4 * i + 0];
            ct.pc_v[lvl][i] = pts[4 * i + 1];
            ct.pc_idepth[lvl][i] = pts[4 * i + 2];
            ct.pc_color[lvl][i] = pts[4 * i + 3];
        }
        ct.pc_n[lvl] = n;
    }

    SE3 lastToNew = se3_from_mat(Tin);
    AffLight aff_out(aff[0], aff[1]);
    Vec5 minRes; minRes.setConstant(1e9);  // never abort (parity isolates LM)
    bool ok = ct.trackNewestCoarse(nf, lastToNew, aff_out, coarsest, minRes);

    float out[27];
    mat_from_se3(lastToNew, out);
    out[16] = (float)aff_out.a; out[17] = (float)aff_out.b;
    for (int i = 0; i < 5; i++) out[18 + i] = (float)ct.lastResiduals[i];
    for (int i = 0; i < 3; i++) out[23 + i] = (float)ct.lastFlowIndicators[i];
    out[26] = ok ? 1.0f : 0.0f;
    write_bin(argv[10], out, {27});
    delete ref; delete nf;
    return 0;
}

// --------------------------------------------------------------- structpose
// structpose <fx> <fy> <cx> <cy> <host_img.bin> <T_host_wc.bin (4,4)>
//            <points.bin (N,3: u v idepth)> <obs.bin (N,2)>
//            <T_cur_wc_init.bin (4,4)> <out_T.bin>
static int run_structpose(int argc, char** argv) {
    float fx = atof(argv[0]), fy = atof(argv[1]);
    float cx = atof(argv[2]), cy = atof(argv[3]);
    std::vector<int> dh, dT, dp, doz, dTc;
    std::vector<float> himg = read_bin(argv[4], &dh);
    std::vector<float> Thw = read_bin(argv[5], &dT);
    std::vector<float> pts = read_bin(argv[6], &dp);
    std::vector<float> obs = read_bin(argv[7], &doz);
    std::vector<float> Tcw = read_bin(argv[8], &dTc);
    int h = dh[0], w = dh[1];

    set_calib(fx, fy, cx, cy, w, h);
    CalibHessian hcalib;

    FrameHessian* host = new FrameHessian();
    host->makeImages(himg.data(), &hcalib);
    host->ab_exposure = 1.0f;
    host->shell = new FrameShell();
    host->shell->camToWorld = se3_from_mat(Thw);

    int N = dp[0];
    std::vector<std::pair<PointHessian*, Eigen::Vector2d>> overlap;
    std::vector<PointHessian*> phs;
    for (int i = 0; i < N; i++) {
        ImmaturePoint ip((int)pts[3 * i], (int)pts[3 * i + 1], host, 1.0f,
                         &hcalib);
        ip.idepth_min = ip.idepth_max = pts[3 * i + 2];
        PointHessian* ph = new PointHessian(&ip, &hcalib);
        ph->setIdepth(pts[3 * i + 2]);
        ph->host = host;
        phs.push_back(ph);
        overlap.emplace_back(
            ph, Eigen::Vector2d(obs[2 * i], obs[2 * i + 1]));
    }

    CoarseTracker ct(w, h);
    ct.makeK(&hcalib);
    SE3 curToWorld = se3_from_mat(Tcw);
    ct.structPoseEstimation(curToWorld, overlap);

    float out[16];
    mat_from_se3(curToWorld, out);
    write_bin(argv[9], out, {4, 4});
    for (PointHessian* p : phs) delete p;
    delete host->shell; host->shell = 0;
    delete host;
    return 0;
}

// ------------------------------------------------------------------ align2d
// align2d <fx> <fy> <cx> <cy> <img.bin (h,w)> <level>
//         <patches.bin (M,10,10)> <px_init.bin (M,2)> <aff.bin (2,)>
//         <out.bin (M,3: u v converged)>
static int run_align2d(int argc, char** argv) {
    float fx = atof(argv[0]), fy = atof(argv[1]);
    float cx = atof(argv[2]), cy = atof(argv[3]);
    std::vector<int> di, dp, dx, da;
    std::vector<float> img = read_bin(argv[4], &di);
    int level = atoi(argv[5]);
    std::vector<float> patches = read_bin(argv[6], &dp);
    std::vector<float> px = read_bin(argv[7], &dx);
    std::vector<float> aff = read_bin(argv[8], &da);
    int h = di[0], w = di[1];

    set_calib(fx, fy, cx, cy, w, h);
    CalibHessian hcalib;
    FrameHessian* fh = new FrameHessian();
    fh->makeImages(img.data(), &hcalib);

    std::vector<FrameHessian*> empty;
    Reprojector rep(&hcalib, fh, empty);
    Vec2f affLL(aff[0], aff[1]);

    int M = dp[0];
    std::vector<float> out(M * 3, 0.f);
    for (int m = 0; m < M; m++) {
        uint8_t border[100], inner[64];
        for (int i = 0; i < 100; i++)
            border[i] = (uint8_t)(patches[100 * m + i] + 0.5f);
        for (int y = 0; y < 8; y++)
            for (int x = 0; x < 8; x++)
                inner[8 * y + x] = border[10 * (y + 1) + x + 1];
        Eigen::Vector2d est(px[2 * m], px[2 * m + 1]);
        bool conv = rep.align2D(fh->dIp[level], border, inner, 10, est,
                                level, affLL);
        out[3 * m + 0] = (float)est.x();
        out[3 * m + 1] = (float)est.y();
        out[3 * m + 2] = conv ? 1.0f : 0.0f;
    }
    write_bin(argv[9], out.data(), {M, 3});
    delete fh;
    return 0;
}

// -------------------------------------------------------------------- solve
// solve <HA.bin (D,D)> <Hsc.bin (D,D)> <HM.bin (D,D)> <bA.bin (D,)>
//       <bsc.bin (D,)> <bM.bin (D,)> <delta.bin (D,)> <NS.bin (D,K)>
//       <lambda> <out_x.bin>
//
// Mirrors solveSystemF's assembly + scaled-LDLT solve + ORTHOGONALIZE_X
// exactly (EnergyFunctional.cpp:650-759, non-SVD branch, as configured by
// settingsDefault: SOLVER_FIX_LAMBDA is off, ORTHOGONALIZE_X_LATER on);
// the nullspace projection itself is the REAL EnergyFunctional::
// orthogonalize (:615-648) with injected lastNullspaces_*.
static int run_solve(int argc, char** argv) {
    std::vector<int> d1, d2, d3, d4, d5, d6, d7, d8;
    std::vector<float> HA = read_bin(argv[0], &d1);
    std::vector<float> Hsc = read_bin(argv[1], &d2);
    std::vector<float> HM = read_bin(argv[2], &d3);
    std::vector<float> bA = read_bin(argv[3], &d4);
    std::vector<float> bsc = read_bin(argv[4], &d5);
    std::vector<float> bM = read_bin(argv[5], &d6);
    std::vector<float> delta = read_bin(argv[6], &d7);
    std::vector<float> NS = read_bin(argv[7], &d8);
    double lambda = atof(argv[8]);
    int D = d1[0], K = d8[1];

    auto toM = [D](std::vector<float>& v) {
        MatXX M(D, D);
        for (int i = 0; i < D; i++)
            for (int j = 0; j < D; j++) M(i, j) = v[D * i + j];
        return M;
    };
    auto toV = [D](std::vector<float>& v) {
        VecX x(D);
        for (int i = 0; i < D; i++) x(i) = v[i];
        return x;
    };
    MatXX HAm = toM(HA), Hscm = toM(Hsc), HMm = toM(HM);
    VecX bAv = toV(bA), bscv = toV(bsc), bMv = toV(bM), dv = toV(delta);

    EnergyFunctional ef;
    for (int k = 0; k < K; k++) {
        VecX n(D);
        for (int i = 0; i < D; i++) n(i) = NS[K * i + k];
        if (k < K - 1) ef.lastNullspaces_pose.push_back(n);
        else ef.lastNullspaces_scale.push_back(n);
    }

    // assembly mirrored from solveSystemF:668-759 (non-orthogonalize-system,
    // non-SVD branch): bM_top = bM + HM*delta; HFinal = HA + HM - Hsc;
    // bFinal = bA + bM_top - bsc; diag *= (1+lambda); scaled LDLT.
    VecX bM_top = bMv + HMm * dv;
    MatXX HFinal = HAm + HMm - Hscm;
    VecX bFinal = bAv + bM_top - bscv;
    for (int i = 0; i < D; i++) HFinal(i, i) *= (1 + lambda);
    VecX SVecI = (HFinal.diagonal() + VecX::Constant(D, 10)).cwiseSqrt()
                     .cwiseInverse();
    MatXX HFinalScaled = SVecI.asDiagonal() * HFinal * SVecI.asDiagonal();
    VecX x = SVecI.asDiagonal() *
             HFinalScaled.ldlt().solve(SVecI.asDiagonal() * bFinal);
    ef.orthogonalize(&x, 0);

    std::vector<float> out(D);
    for (int i = 0; i < D; i++) out[i] = (float)x(i);
    write_bin(argv[9], out.data(), {D});
    return 0;
}

// ---------------------------------------------------------------- coarsesel
// coarsesel <fx> <fy> <cx> <cy> <img.bin (h,w)> <level> <density>
//           <out_map.bin (h_l, w_l)>
// The coarse-level initializer selector (PixelSelector.h:170-195
// makePixelStatus -> gridMaxSelection<pot>), run on dIp[level] exactly as
// CoarseInitializer::setFirst does (CoarseInitializer.cpp:707).
static int run_coarsesel(int argc, char** argv) {
    float fx = atof(argv[0]), fy = atof(argv[1]);
    float cx = atof(argv[2]), cy = atof(argv[3]);
    std::vector<int> di;
    std::vector<float> img = read_bin(argv[4], &di);
    int level = atoi(argv[5]);
    float density = atof(argv[6]);
    int h = di[0], w = di[1];

    set_calib(fx, fy, cx, cy, w, h);
    CalibHessian hcalib;
    FrameHessian* fh = new FrameHessian();
    fh->makeImages(img.data(), &hcalib);

    int wl = w >> level, hl = h >> level;
    std::vector<bool> map(wl * hl, false);
    std::vector<unsigned char> mapb(wl * hl, 0);
    bool* bm = new bool[wl * hl];
    int n = makePixelStatus(fh->dIp[level], bm, wl, hl, density);
    std::vector<float> out(wl * hl);
    for (int i = 0; i < wl * hl; i++) out[i] = bm[i] ? 1.0f : 0.0f;
    out.push_back((float)n);  // appended count
    write_bin(argv[7], out.data(), {hl * wl + 1});
    delete[] bm;
    delete fh;
    return 0;
}

int main(int argc, char** argv) {
    if (argc < 2) {
        fprintf(stderr,
                "usage: unit_oracle <track|structpose|align2d|solve> ...\n");
        return 1;
    }
    setting_debugout_runquiet = true;
    std::string cmd = argv[1];
    if (cmd == "track") return run_track(argc - 2, argv + 2);
    if (cmd == "structpose") return run_structpose(argc - 2, argv + 2);
    if (cmd == "align2d") return run_align2d(argc - 2, argv + 2);
    if (cmd == "solve") return run_solve(argc - 2, argv + 2);
    if (cmd == "coarsesel") return run_coarsesel(argc - 2, argv + 2);
    fprintf(stderr, "unknown subcommand %s\n", cmd.c_str());
    return 1;
}
