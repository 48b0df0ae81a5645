// Minimal ROS stub for the reference-oracle build (VERDICT r4 item 2).
//
// ROS is not installed in this image; the reference's core only touches
// ROS at header level (FullSystem.h:23-31) plus the node glue in main.cpp.
// The oracle driver (oracle_main.cpp) feeds the FullSystem queues directly
// through the stubbed message types, so these classes only need to make
// main.cpp COMPILE — none of the pub/sub machinery ever runs.
#pragma once

#include <cstdint>
#include <cstdio>
#include <iomanip>    // transitively provided by real ros headers; the
#include <sys/time.h> // reference relies on that (FullSystem.cpp:504,
#include <string>     // main.cpp gettimeofday)

#include "std_msgs/Header.h"

namespace ros {

inline void init(int, char**, const std::string&) {}

struct Subscriber {};

class NodeHandle {
 public:
  NodeHandle() {}
  explicit NodeHandle(const std::string&) {}  // ros::NodeHandle nh("~")
  template <class T>
  bool getParam(const std::string&, T&) { return false; }
  // deduced form: n.subscribe(topic, queue, handler)
  template <class F>
  Subscriber subscribe(const std::string&, uint32_t, F) {
    return Subscriber();
  }
  // explicit form: n.subscribe<sensor_msgs::PointCloud2>(...)
  template <class M, class F>
  Subscriber subscribe(const std::string&, uint32_t, F) {
    return Subscriber();
  }
};

struct Rate {
  explicit Rate(double) {}
  void sleep() {}
};

inline bool ok() { return false; }
inline void spinOnce() {}
inline void spin() {}
inline void shutdown() {}

}  // namespace ros

#ifndef ROS_INFO
#define ROS_INFO(...)            \
  do {                           \
    std::printf(__VA_ARGS__);    \
    std::printf("\n");           \
  } while (0)
#endif
