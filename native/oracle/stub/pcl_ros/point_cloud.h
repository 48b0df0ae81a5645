#pragma once
// pcl_ros stub: nothing from it is used by the oracle paths.
