// Reference-oracle FULL-SYSTEM driver (VERDICT r4 item 2: execute the
// BASELINE accuracy protocol).
//
// Compiles the reference's complete pipeline — main.cpp's LiDAR
// preprocessing + FullSystem/CoarseTracker/Reprojector/EnergyFunctional —
// from the read-only tree at /root/reference (ROS/PCL/Pangolin satisfied
// by the header stubs in stub/), and drives it frame-by-frame from a
// synthetic KITTI fixture written by sdv_loam_tpu.data.kitti_fixture.
// The handler chain is the reference's own: lidarCloudHandler
// (main.cpp:785-858) -> imgHandler (main.cpp:537-560) -> process()
// (main.cpp:468-535), exactly as the ROS node drives it, so the written
// trajectory (FullSystem::printResult, FullSystem.cpp:253-281) is the
// oracle the 1%-ATE BASELINE target is defined on (BASELINE.md:25-27).
//
// Usage:
//   oracle_main <calib.txt> <sensor.txt> <result.txt> <seq_dir> <n_frames>
//               [preset=0] [mode=1]
//
// seq_dir layout (KITTI): image_0/%06d.png, velodyne/%06d.bin, times.txt.
// preset/mode follow the reference's own launch configuration for KITTI
// (launch/run.launch: mode=1, quiet) and settingsDefault (main.cpp:192).

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <memory>
#include <string>
#include <vector>

#include <opencv2/core/core.hpp>
#include <opencv2/imgcodecs/imgcodecs.hpp>

#include "sensor_msgs/Image.h"
#include "sensor_msgs/PointCloud2.h"

#include "util/settings.h"
#include "util/DatasetReader.h"
#include "FullSystem/FullSystem.h"

using namespace sdv_loam;

// ---- symbols defined in the reference's main.cpp (built as
// build/main_oracle.cpp with its own main() renamed) ----
extern std::string calib;
extern std::string pathSensorPrameter;
extern std::string resultPath;
extern float playbackSpeed;
extern ImageFolderReader* reader;
extern FullSystem* fullSystem;
extern int currentId;
void allocateMemory();
void resetParameters();
void settingsDefault(int preset);
void process();
void imgHandler(const sensor_msgs::ImageConstPtr& img_msg);
void lidarCloudHandler(const sensor_msgs::PointCloud2ConstPtr& cloud_msg);

static std::vector<double> loadTimes(const std::string& seqDir, int n) {
  std::vector<double> ts;
  std::ifstream f((seqDir + "/times.txt").c_str());
  double t;
  while (f >> t) ts.push_back(t);
  while ((int)ts.size() < n) ts.push_back(0.1 * ts.size());
  return ts;
}

int main(int argc, char** argv) {
  if (argc < 6) {
    std::fprintf(stderr,
                 "usage: %s <calib.txt> <sensor.txt> <result.txt> <seq_dir> "
                 "<n_frames> [preset=0] [mode=1]\n",
                 argv[0]);
    return 2;
  }
  calib = argv[1];
  pathSensorPrameter = argv[2];
  resultPath = argv[3];
  std::string seqDir = argv[4];
  int nFrames = std::atoi(argv[5]);
  int preset = argc > 6 ? std::atoi(argv[6]) : 0;
  int mode = argc > 7 ? std::atoi(argv[7]) : 1;

  settingsDefault(preset);
  // parseArgument's mode handling (main.cpp:446-466)
  if (mode == 1) {
    setting_photometricCalibration = 0;
    setting_affineOptModeA = 0;
    setting_affineOptModeB = 0;
  } else if (mode == 2) {
    setting_photometricCalibration = 0;
    setting_affineOptModeA = -1;
    setting_affineOptModeB = -1;
    setting_minGradHistAdd = 3;
  }
  setting_debugout_runquiet = std::getenv("ORACLE_VERBOSE") == nullptr;  // quiet=1 in the KITTI launch
  disableAllDisplay = true;          // no GUI in this image
  playbackSpeed = 0;                 // linearizeOperation (deterministic)

  allocateMemory();
  resetParameters();

  reader = new ImageFolderReader(calib, "", "");
  reader->setGlobalCalibration();

  fullSystem = new FullSystem();
  fullSystem->setGammaFunction(reader->getPhotometricGamma());
  fullSystem->linearizeOperation = (playbackSpeed == 0);
  fullSystem->loadSensorPrameters(pathSensorPrameter);

  std::vector<double> times = loadTimes(seqDir, nFrames);

  char path[1024];
  for (int i = 0; i < nFrames; ++i) {
    // ---- LiDAR scan -> stub PointCloud2 -> reference preprocessing ----
    std::snprintf(path, sizeof(path), "%s/velodyne/%06d.bin", seqDir.c_str(),
                  i);
    FILE* f = std::fopen(path, "rb");
    if (!f) {
      std::fprintf(stderr, "missing %s\n", path);
      return 3;
    }
    auto cloud = boost::make_shared<sensor_msgs::PointCloud2>();
    cloud->header.stamp = ros::Time(times[i]);
    std::array<float, 4> p;
    while (std::fread(p.data(), sizeof(float), 4, f) == 4)
      cloud->xyzi.push_back(p);
    std::fclose(f);
    lidarCloudHandler(cloud);

    // ---- image -> stub sensor_msgs::Image -> reference handler ----
    std::snprintf(path, sizeof(path), "%s/image_0/%06d.png", seqDir.c_str(),
                  i);
    cv::Mat img = cv::imread(path, cv::IMREAD_GRAYSCALE);
    if (img.empty()) {
      std::fprintf(stderr, "missing/unreadable %s\n", path);
      return 3;
    }
    auto msg = boost::make_shared<sensor_msgs::Image>();
    msg->header.stamp = ros::Time(times[i]);
    msg->height = img.rows;
    msg->width = img.cols;
    msg->encoding = "mono8";
    msg->step = img.cols;
    msg->data.assign(img.data, img.data + (size_t)img.rows * img.cols);
    imgHandler(msg);

    process();

    if (fullSystem->initFailed) {
      std::fprintf(stderr, "oracle: initFailed at frame %d\n", i);
      return 4;
    }
    if (fullSystem->isLost) {
      std::fprintf(stderr, "oracle: LOST at frame %d\n", i);
      break;
    }
  }

  fullSystem->blockUntilMappingIsFinished();
  fullSystem->printResult(resultPath);
  std::printf("oracle: done, %d frames, result at %s\n", currentId,
              resultPath.c_str());
  return 0;
}
