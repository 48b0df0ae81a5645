// Reference-oracle parity driver (VERDICT r4 item 5).
//
// Compiles the reference's non-ROS units standalone — Undistort
// (src/util/Undistort.cpp), PixelSelector2 (src/FullSystem/
// PixelSelector2.cpp) and ImmaturePoint::traceOn (src/FullSystem/
// ImmaturePoint.cpp) — and drives them with recorded tensors so
// tests/test_parity.py can diff the TPU implementations
// (sdv_loam_tpu/data/calib.py, ops/select.py, ops/trace.py) against the
// C++ behavior on identical inputs.
//
// Tensor file format (both directions): int32 ndim, int32 dims[ndim],
// float32 data row-major. See tests/test_parity.py:_write_bin/_read_bin.
//
// Subcommands:
//   undistort <calib.txt> <in_u8_img.bin (h,w)> <out_prefix>
//       writes <out_prefix>_img.bin (h_out, w_out) float image,
//              <out_prefix>_K.bin (3,3)
//   select    <fx> <fy> <cx> <cy> <img.bin (h,w)> <cloud_uv.bin (N,2)>
//             <density> <out_prefix>
//       writes <out_prefix>_map.bin (h,w) status map,
//              <out_prefix>_ths.bin (h/32, w/32) smoothed hist thresholds,
//              <out_prefix>_meta.bin (2,) = [num_selected, final_potential]
//   trace     <fx> <fy> <cx> <cy> <host_img.bin (h,w)> <target_img.bin>
//             <T_th.bin (4,4)> <aff.bin (2,)> <points.bin (N,4: u v
//             idmin idmax)> <out.bin>
//       writes (N,8) rows: [status, idepth_min, idepth_max, uv.x, uv.y,
//                           pixel_interval, quality, energyTH]

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "util/NumType.h"
#include "util/globalCalib.h"
#include "util/settings.h"
#include "util/Undistort.h"
#include "util/MinimalImage.h"
#include "util/ImageAndExposure.h"
#include "FullSystem/HessianBlocks.h"
// test-oracle access to PixelSelector's private thsSmoothed (the reference
// is read-only; this define is confined to this translation unit and the
// selector header, which is included first here)
#define private public
#include "FullSystem/PixelSelector2.h"
#undef private
#include "FullSystem/ImmaturePoint.h"

using namespace sdv_loam;

// statics the reference defines in FullSystem.cpp (not linked here), plus
// a stub for the PointFrameResidual dtor (real one in Residuals.cpp, which
// drags the EnergyFunctional backend; never invoked here — no
// PointHessians are ever created in the parity paths)
namespace sdv_loam {
int FrameHessian::instanceCounter = 0;
int PointHessian::instanceCounter = 0;
int CalibHessian::instanceCounter = 0;
PointFrameResidual::~PointFrameResidual() {}
}

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

// ------------------------------------------------------------- subcommands
static int run_undistort(int argc, char** argv) {
    // geometric-only parity: no gamma / vignette files
    Undistort* u = Undistort::getUndistorterForFile(argv[0], "", "");
    if (!u) { fprintf(stderr, "undistorter load failed\n"); return 2; }
    std::vector<int> d;
    std::vector<float> img = read_bin(argv[1], &d);
    MinimalImageB raw(d[1], d[0]);
    for (size_t i = 0; i < img.size(); i++)
        raw.data[i] = (unsigned char)(img[i] + 0.5f);
    ImageAndExposure* out = u->undistort<unsigned char>(&raw, 1.0f, 0.0);
    std::string pre = argv[2];
    write_bin(pre + "_img.bin", out->image, {out->h, out->w});
    Eigen::Matrix<double, 3, 3> K = u->getK();
    float Kf[9];
    for (int i = 0; i < 9; i++) Kf[i] = (float)K(i / 3, i % 3);
    write_bin(pre + "_K.bin", Kf, {3, 3});
    delete out;
    delete u;
    return 0;
}

static int run_select(int argc, char** argv) {
    float fx = atof(argv[0]), fy = atof(argv[1]);
    float cx = atof(argv[2]), cy = atof(argv[3]);
    std::vector<int> d, dc;
    std::vector<float> img = read_bin(argv[4], &d);
    std::vector<float> cloud = read_bin(argv[5], &dc);
    float density = atof(argv[6]);
    std::string pre = argv[7];
    int h = d[0], w = d[1];

    Eigen::Matrix3f K; K.setIdentity();
    K(0, 0) = fx; K(1, 1) = fy; K(0, 2) = cx; K(1, 2) = cy;
    setGlobalCalib(w, h, K);
    CalibHessian hcalib;  // identity gamma

    FrameHessian* fh = new FrameHessian();
    fh->makeImages(img.data(), &hcalib);

    std::vector<Eigen::Vector3d, Eigen::aligned_allocator<Eigen::Vector3d>>
        vCloudPixel;
    for (int i = 0; i < dc[0]; i++)
        vCloudPixel.push_back(Eigen::Vector3d(cloud[2 * i], cloud[2 * i + 1],
                                              1.0));

    PixelSelector sel(w, h);
    std::vector<float> map_out(w * h, 0.f);
    int n = sel.makeMapsFromLidar(fh, map_out.data(), density, 1, false, 1,
                                  vCloudPixel);
    write_bin(pre + "_map.bin", map_out.data(), {h, w});
    // smoothed hist thresholds (squared, same scale as our
    // grad_hist_thresholds): ths pointer holds sqrt-scale; thsSmoothed is
    // private-by-convention but public in the reference struct
    int w32 = w / 32, h32 = h / 32;
    std::vector<float> ths(w32 * h32);
    for (int i = 0; i < w32 * h32; i++)
        ths[i] = sel.thsSmoothed[i];
    write_bin(pre + "_ths.bin", ths.data(), {h32, w32});
    float meta[2] = {(float)n, (float)sel.currentPotential};
    write_bin(pre + "_meta.bin", meta, {2});
    delete fh;
    return 0;
}

static int run_trace(int argc, char** argv) {
    float fx = atof(argv[0]), fy = atof(argv[1]);
    float cx = atof(argv[2]), cy = atof(argv[3]);
    std::vector<int> dh, dt, dT, da, dp;
    std::vector<float> himg = read_bin(argv[4], &dh);
    std::vector<float> timg = read_bin(argv[5], &dt);
    std::vector<float> Tth = read_bin(argv[6], &dT);    // target_T_host (4,4)
    std::vector<float> aff = read_bin(argv[7], &da);    // (2,)
    std::vector<float> pts = read_bin(argv[8], &dp);    // (N,4)
    int h = dh[0], w = dh[1];

    Eigen::Matrix3f K; K.setIdentity();
    K(0, 0) = fx; K(1, 1) = fy; K(0, 2) = cx; K(1, 2) = cy;
    setGlobalCalib(w, h, K);
    CalibHessian hcalib;

    FrameHessian* host = new FrameHessian();
    host->makeImages(himg.data(), &hcalib);
    FrameHessian* target = new FrameHessian();
    target->makeImages(timg.data(), &hcalib);

    Eigen::Matrix3f R;
    Eigen::Vector3f t;
    for (int i = 0; i < 3; i++) {
        for (int j = 0; j < 3; j++) R(i, j) = Tth[4 * i + j];
        t(i) = Tth[4 * i + 3];
    }
    Mat33f KRKi = K * R * K.inverse();
    Vec3f Kt = K * t;
    Vec2f affv(aff[0], aff[1]);

    int N = dp[0];
    std::vector<float> out(N * 8, 0.f);
    for (int i = 0; i < N; i++) {
        ImmaturePoint ip((int)pts[4 * i], (int)pts[4 * i + 1], host, 1.0f,
                         &hcalib);
        ip.idepth_min = pts[4 * i + 2];
        ip.idepth_max = pts[4 * i + 3];
        ImmaturePointStatus st = IPS_OUTLIER;
        if (std::isfinite(ip.energyTH))
            st = ip.traceOn(target, KRKi, Kt, affv, &hcalib, false);
        out[8 * i + 0] = (float)st;
        out[8 * i + 1] = ip.idepth_min;
        out[8 * i + 2] = ip.idepth_max;
        out[8 * i + 3] = ip.lastTraceUV[0];
        out[8 * i + 4] = ip.lastTraceUV[1];
        out[8 * i + 5] = ip.lastTracePixelInterval;
        out[8 * i + 6] = ip.quality;
        out[8 * i + 7] = ip.energyTH;
    }
    write_bin(argv[9], out.data(), {N, 8});
    delete host;
    delete target;
    return 0;
}

int main(int argc, char** argv) {
    if (argc < 2) {
        fprintf(stderr, "usage: parity_main <undistort|select|trace> ...\n");
        return 1;
    }
    std::string cmd = argv[1];
    if (cmd == "undistort") return run_undistort(argc - 2, argv + 2);
    if (cmd == "select") return run_select(argc - 2, argv + 2);
    if (cmd == "trace") return run_trace(argc - 2, argv + 2);
    fprintf(stderr, "unknown subcommand %s\n", cmd.c_str());
    return 1;
}
