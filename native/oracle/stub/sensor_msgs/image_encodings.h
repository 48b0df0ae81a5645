#pragma once
#include <string>
namespace sensor_msgs {
namespace image_encodings {
static const std::string MONO8 = "mono8";
static const std::string MONO16 = "mono16";
static const std::string BGR8 = "bgr8";
static const std::string RGB8 = "rgb8";
}  // namespace image_encodings
}  // namespace sensor_msgs
