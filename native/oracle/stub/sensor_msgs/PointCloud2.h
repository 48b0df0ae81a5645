// sensor_msgs/PointCloud2 stub: carries xyzi quads directly (the oracle
// driver fills them from the fixture's velodyne .bin); pcl::fromROSMsg in
// the pcl stub copies them into the cloud, mirroring the real
// fromROSMsg(x,y,z,intensity) field mapping lidarCloudHandler relies on
// (main.cpp:789).
#pragma once

#include <array>
#include <vector>

#include "../boost/shared_ptr.hpp"
#include "../std_msgs/Header.h"

namespace sensor_msgs {
struct PointCloud2 {
  std_msgs::Header header;
  std::vector<std::array<float, 4>> xyzi;

  typedef boost::shared_ptr<PointCloud2> Ptr;
  typedef boost::shared_ptr<PointCloud2 const> ConstPtr;
};
typedef PointCloud2::Ptr PointCloud2Ptr;
typedef PointCloud2::ConstPtr PointCloud2ConstPtr;
}  // namespace sensor_msgs
