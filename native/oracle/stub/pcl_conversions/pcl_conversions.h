// pcl::fromROSMsg stub: copies the stub PointCloud2's xyzi quads into a
// pcl cloud — the field mapping the real fromROSMsg performs for
// PointXYZI (main.cpp:789).
#pragma once

#include "../pcl/point_cloud.h"
#include "../sensor_msgs/PointCloud2.h"

namespace pcl {

template <class PointT>
void fromROSMsg(const sensor_msgs::PointCloud2& msg, PointCloud<PointT>& c) {
  c.points.resize(msg.xyzi.size());
  for (std::size_t i = 0; i < msg.xyzi.size(); ++i) {
    c.points[i].x = msg.xyzi[i][0];
    c.points[i].y = msg.xyzi[i][1];
    c.points[i].z = msg.xyzi[i][2];
    c.points[i].intensity = msg.xyzi[i][3];
  }
  c.width = (unsigned)c.points.size();
  c.height = 1;
}

}  // namespace pcl
