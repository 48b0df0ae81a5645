// Pangolin-viewer stand-in for the oracle build (no GUI in this image).
// The oracle always runs with disableAllDisplay=true, so the viewer is
// never constructed; this satisfies main.cpp's references at compile/link
// time. Substituted for the real PangolinViewer.h include by the
// Makefile's build-time sed of main.cpp (quote-includes resolve relative
// to the including file, so an -I shadow cannot override it there).
#pragma once

#include "IOWrapper/Output3DWrapper.h"

namespace sdv_loam {
namespace IOWrap {

class PangolinDSOViewer : public Output3DWrapper {
 public:
  PangolinDSOViewer(int, int, bool = true) {}
  void run() {}
  void close() {}
  void join() override {}
  void reset() override {}
};

}  // namespace IOWrap
}  // namespace sdv_loam
