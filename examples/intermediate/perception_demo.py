"""Intermediate: synthetic depth image → obstacle detection → clustering.

Twin of the reference's ``perception_intermediate_demo.py``: a depth
camera observes two box obstacles; connected-component blob detection
unprojects them through the pinhole model, and native DBSCAN groups the
3D points. (The reference's YOLO path is available as ``method='yolo'``
when ultralytics is installed — orthogonal to the TPU value proposition.)
"""

import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from _bootstrap import parse_args

args = parse_args(__doc__)

import numpy as np

from manipulapy_tpu.perception import Perception, dbscan_native
from manipulapy_tpu.vision import CameraConfig, Vision

cam = CameraConfig(fx=500, fy=500, cx=160, cy=120, width=320, height=240)
vision = Vision(camera_configs=[cam])
perception = Perception(vision)

# Synthetic scene: background at 5 m, two square obstacles at 1.2 m / 2.0 m.
depth = np.full((240, 320), 5.0, dtype=np.float32)
depth[60:100, 50:90] = 1.2
depth[140:200, 200:260] = 2.0
rgb = np.zeros((240, 320, 3), dtype=np.uint8)

positions, labels = perception.detect_and_cluster_obstacles(
    rgb, depth, depth_threshold=3.0, min_blob_area=100, eps=0.5, min_samples=1
)
print(f"detected {positions.shape[0]} obstacles, {len(set(labels.tolist()))} cluster(s)")
for p, l in zip(positions, labels):
    print(f"  cluster {int(l)}: world position {np.round(p, 3)}")

# Direct DBSCAN on a synthetic 3D cloud (two clumps + one outlier).
rng = np.random.default_rng(0)
cloud = np.concatenate([
    rng.normal([1, 0, 0.5], 0.03, (40, 3)),
    rng.normal([-0.5, 0.8, 0.2], 0.03, (30, 3)),
    [[5.0, 5.0, 5.0]],
])
lab = dbscan_native(cloud, eps=0.15, min_samples=5)
n_clusters = len(set(lab.tolist()) - {-1})
print(f"\nnative DBSCAN on 71 points: {n_clusters} clusters, "
      f"{int((lab == -1).sum())} outlier(s)")
