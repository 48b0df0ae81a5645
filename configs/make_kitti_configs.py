#!/usr/bin/env python
"""Generate per-sequence calibration + sensor-extrinsics config assets.

The values are public KITTI-Odometry / KITTI-360 / KITTI-CARLA dataset
calibration constants (camera intrinsics of the left grey camera and the
velodyne->camera extrinsics Tr from the official calib files). KITTI
sequences group into three recording dates sharing calibration:
  00-02 (2011_10_03), 03 (2011_09_26), 04-12 (2011_09_30); the reference
uses the 04-12 calibration for 13-21 as well.

File formats (consumed by sdv_loam_tpu.data.calib):
  calib:  "Pinhole fx fy cx cy 0" / "in_w in_h" / "crop" / "out_w out_h"
  sensor: line 1 intrinsics, lines 2-4 rows of [R|t]_cam<-lidar
"""

import os

GROUPS = {
    # name: (fx, fy, cx, cy, in_w, in_h, out_w, out_h, Tr rows)
    "kitti_00_02": (718.856, 718.856, 607.1928, 185.2157, 1241, 376, 1200, 360, [
        "4.276802385584e-04 -9.999672484946e-01 -8.084491683471e-03 -1.198459927713e-02",
        "-7.210626507497e-03 8.081198471645e-03 -9.999413164504e-01 -5.403984729748e-02",
        "9.999738645903e-01 4.859485810390e-04 -7.206933692422e-03 -2.921968648686e-01"]),
    "kitti_03": (721.5377, 721.5377, 609.5593, 172.854, 1242, 375, 1200, 360, [
        "2.347736981471e-04 -9.999441545438e-01 -1.056347781105e-02 -2.796816941295e-03",
        "1.044940741659e-02 1.056535364138e-02 -9.998895741176e-01 -7.510879138296e-02",
        "9.999453885620e-01 1.243653783865e-04 1.045130299567e-02 -2.721327964059e-01"]),
    "kitti_04_12": (707.0912, 707.0912, 601.8873, 183.1104, 1226, 370, 1200, 360, [
        "-1.857739385241e-03 -9.999659513510e-01 -8.039975204516e-03 -4.784029760483e-03",
        "-6.481465826011e-03 8.051860151134e-03 -9.999466081774e-01 -7.337429464231e-02",
        "9.999773098287e-01 -1.805528627661e-03 -6.496203536139e-03 -3.339968064433e-01"]),
    "kitti_360": (552.554261, 552.554261, 682.049453, 238.769549, 1408, 376, 1400, 360, [
        "0.043071 -0.999004 -0.0116255 0.262347",
        "-0.0882929 0.00778461 -0.996064 -0.107634",
        "0.995163 0.043928 -0.0878697 -0.829205"]),
    "kitti_carla": (957.962, 957.962, 696.0, 512.0, 1392, 1024, 1392, 1024, [
        "0.000000 -1.000000 0.000000 0.000000",
        "0.000000 0.000000 -1.000000 -0.099999",
        "1.000000 0.000000 0.000000 -0.300000"]),
}

SEQ_TO_GROUP = {f"{i:02d}": "kitti_00_02" for i in range(3)}
SEQ_TO_GROUP["03"] = "kitti_03"
for i in range(4, 22):
    SEQ_TO_GROUP[f"{i:02d}"] = "kitti_04_12"


def emit(root):
    cdir = os.path.join(root, "calib")
    sdir = os.path.join(root, "sensor")
    os.makedirs(cdir, exist_ok=True)
    os.makedirs(sdir, exist_ok=True)
    names = dict(SEQ_TO_GROUP)
    names["kitti_360"] = "kitti_360"
    names["kitti_carla"] = "kitti_carla"
    for seq, group in names.items():
        fx, fy, cx, cy, iw, ih, ow, oh, tr = GROUPS[group]
        with open(os.path.join(cdir, f"{seq}.txt"), "w") as f:
            f.write(f"Pinhole {fx} {fy} {cx} {cy} 0\n{iw} {ih}\ncrop\n{ow} {oh}\n")
        with open(os.path.join(sdir, f"{seq}.txt"), "w") as f:
            f.write(f"{fx} {fy} {cx} {cy}\n")
            for row in tr:
                f.write(row + "\n")


if __name__ == "__main__":
    emit(os.path.dirname(os.path.abspath(__file__)))
    print("configs written")
