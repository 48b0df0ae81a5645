// Shadow stub for the parity build. The reference's
// FullSystem/ResidualProjections.h includes FullSystem/FullSystem.h but
// uses nothing from it (its inline projection helpers only need NumType +
// globalCalib); the real header drags in ROS/pcl/cv_bridge which do not
// exist in this image. The -I order places this stub ahead of the
// reference tree, so the orchestrator header (never linked here) resolves
// to this no-op.
#pragma once
#include "util/NumType.h"
#include "util/globalCalib.h"
