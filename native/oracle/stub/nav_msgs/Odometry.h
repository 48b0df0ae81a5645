// nav_msgs/Odometry stub: the reference's LiDAR-pose handlers
// (main.cpp:860-892) parse pose.pose.{orientation,position}; they are
// never subscribed (dead code) but must compile.
#pragma once

#include "../boost/shared_ptr.hpp"
#include "../std_msgs/Header.h"

namespace geometry_msgs {
struct Point { double x = 0, y = 0, z = 0; };
struct Quaternion { double x = 0, y = 0, z = 0, w = 1; };
struct Pose {
  Point position;
  Quaternion orientation;
};
struct PoseWithCovariance { Pose pose; };
}  // namespace geometry_msgs

namespace nav_msgs {
struct Odometry {
  std_msgs::Header header;
  geometry_msgs::PoseWithCovariance pose;

  typedef boost::shared_ptr<Odometry> Ptr;
  typedef boost::shared_ptr<Odometry const> ConstPtr;
};
}  // namespace nav_msgs
