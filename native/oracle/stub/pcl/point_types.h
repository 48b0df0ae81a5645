// pcl stub for the oracle build (PCL is not installed in this image).
// Only the surface main.cpp touches: PointXYZI fields + intensity.
#pragma once

namespace pcl {
struct PointXYZI {
  float x = 0.f, y = 0.f, z = 0.f;
  float intensity = 0.f;
};
}  // namespace pcl
