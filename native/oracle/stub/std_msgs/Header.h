// std_msgs/Header stub for the oracle build: only the stamp is ever read
// (main.cpp:558,786 — header.stamp.toSec()).
#pragma once

#include <cstdint>
#include <string>

namespace ros {
struct Time {
  double t = 0.0;
  Time() = default;
  explicit Time(double tt) : t(tt) {}
  double toSec() const { return t; }
};
}  // namespace ros

namespace std_msgs {
struct Header {
  uint32_t seq = 0;
  ros::Time stamp;
  std::string frame_id;
};
}  // namespace std_msgs
