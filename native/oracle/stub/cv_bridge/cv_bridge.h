// cv_bridge stub: toCvCopy/toCvShare building a cv::Mat view of the
// stubbed sensor_msgs::Image (mono8 only — the only encoding the
// reference's imgHandler requests, main.cpp:539-556).
#pragma once

#include <cstring>
#include <memory>
#include <stdexcept>
#include <string>

#include <opencv2/core/core.hpp>

#include "../sensor_msgs/Image.h"

namespace cv_bridge {

struct CvImage {
  std_msgs::Header header;
  std::string encoding;
  cv::Mat image;
};
typedef std::shared_ptr<CvImage> CvImagePtr;
typedef std::shared_ptr<CvImage const> CvImageConstPtr;

inline CvImagePtr toCvCopy(const sensor_msgs::Image& msg,
                           const std::string& encoding = "") {
  if (!encoding.empty() && encoding != "mono8")
    throw std::runtime_error("cv_bridge stub supports mono8 only");
  auto out = std::make_shared<CvImage>();
  out->header = msg.header;
  out->encoding = "mono8";
  out->image = cv::Mat(msg.height, msg.width, CV_8UC1);
  for (uint32_t r = 0; r < msg.height; ++r)
    std::memcpy(out->image.ptr(r), msg.data.data() + (size_t)r * msg.step,
                msg.width);
  return out;
}

inline CvImagePtr toCvCopy(const sensor_msgs::ImageConstPtr& msg,
                           const std::string& encoding = "") {
  return toCvCopy(*msg, encoding);
}

inline CvImageConstPtr toCvShare(const sensor_msgs::ImageConstPtr& msg,
                                 const std::string& encoding = "") {
  return toCvCopy(*msg, encoding);
}

}  // namespace cv_bridge
