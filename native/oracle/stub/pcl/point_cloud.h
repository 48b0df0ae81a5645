// pcl::PointCloud stub: vector-of-points with the members the reference's
// LiDAR preprocessing uses (main.cpp:124-167,562-783) — points, clear,
// push_back, resize, plus the boost::shared_ptr Ptr typedef.
#pragma once

#include <cstddef>
#include <vector>

#include <Eigen/StdVector>

#include "../boost/shared_ptr.hpp"
#include "point_types.h"

namespace pcl {

template <class PointT>
struct PointCloud {
  typedef boost::shared_ptr<PointCloud<PointT>> Ptr;
  typedef boost::shared_ptr<PointCloud<PointT> const> ConstPtr;

  std::vector<PointT, Eigen::aligned_allocator<PointT>> points;
  unsigned width = 0, height = 1;
  bool is_dense = true;

  void clear() { points.clear(); }
  std::size_t size() const { return points.size(); }
  bool empty() const { return points.empty(); }
  void push_back(const PointT& p) { points.push_back(p); }
  void resize(std::size_t n) { points.resize(n); }
  PointT& operator[](std::size_t i) { return points[i]; }
  const PointT& operator[](std::size_t i) const { return points[i]; }
};

}  // namespace pcl
