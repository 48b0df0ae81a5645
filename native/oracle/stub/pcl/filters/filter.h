// pcl::removeNaNFromPointCloud stub (behavioral match of the real one for
// finite/NaN xyz — main.cpp:792).
#pragma once

#include <cmath>
#include <vector>

#include "../point_cloud.h"

namespace pcl {

template <class PointT>
void removeNaNFromPointCloud(const PointCloud<PointT>& in,
                             PointCloud<PointT>& out,
                             std::vector<int>& index) {
  index.clear();
  std::vector<PointT, Eigen::aligned_allocator<PointT>> kept;
  kept.reserve(in.points.size());
  for (std::size_t i = 0; i < in.points.size(); ++i) {
    const PointT& p = in.points[i];
    if (std::isfinite(p.x) && std::isfinite(p.y) && std::isfinite(p.z)) {
      kept.push_back(p);
      index.push_back((int)i);
    }
  }
  out.points.swap(kept);
  out.is_dense = true;
}

}  // namespace pcl
