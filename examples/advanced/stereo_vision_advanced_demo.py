"""Advanced: full stereo-vision pipeline on a synthetic calibrated rig.

Twin of the reference's ``stereo_vision_advanced_demo.py`` (behavioral
contract: ``Examples/advanced_examples/stereo_vision_advanced_demo.py``):

1. configure a calibrated stereo pair (intrinsics + 10 cm baseline) and
   build cv2 rectification maps via
   ``Vision.compute_stereo_rectification_maps``;
2. synthesize a reproducible rectified left/right image pair with
   textured obstacle blobs at known depths (disparity = f*B/Z shift);
3. recover geometry with the real library calls — ``compute_disparity``
   (StereoSGBM), ``disparity_to_pointcloud`` (Q-matrix reprojection);
4. segment the cloud into obstacles with the native DBSCAN
   (``Perception.cluster_obstacles``) and check the recovered depths
   against ground truth;
5. exercise ``detect_obstacles`` through the depth-blob fallback (no
   YOLO weights needed) for the mono path.

Runs headless on CPU; degrades with a clear message when OpenCV is
absent (optional 'vision' extra).
"""

import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from _bootstrap import parse_args

args = parse_args(__doc__)

import numpy as np

try:
    import cv2  # noqa: F401
except ImportError:
    print("OpenCV not installed (pip extra 'vision'); stereo demo skipped.")
    raise SystemExit(0)

from manipulapy_tpu.perception import Perception
from manipulapy_tpu.vision import Vision

RNG = np.random.default_rng(7)
W, H = 640, 480
FOCAL = 600.0
BASELINE = 0.10  # metres

# ---- 1. calibrated rig ------------------------------------------------------
K = np.array([[FOCAL, 0, W / 2.0], [0, FOCAL, H / 2.0], [0, 0, 1.0]])
stereo = (
    {"intrinsic": K, "distortion": np.zeros(5)},
    {"intrinsic": K, "distortion": np.zeros(5),
     "rotation": np.eye(3), "translation": [-BASELINE, 0.0, 0.0]},
)
vision = Vision(stereo_configs=stereo)
maps = vision.compute_stereo_rectification_maps((W, H))
Q = maps[2]
print(f"rectification maps built; Q[2,3] (fx) = {Q[2, 3]:.1f}")

# ---- 2. synthetic rectified scene ------------------------------------------
# Background texture at 4 m, three textured square obstacles at known depths.
OBSTACLES = [  # (cx, cy, half-size px, depth m)
    (180, 200, 40, 1.0),
    (420, 260, 55, 1.6),
    (320, 120, 30, 2.4),
]
texture = RNG.integers(30, 220, size=(H, W), dtype=np.uint8)
left = texture.copy()
right = np.zeros_like(left)
# shift the whole background by its disparity
bg_disp = int(round(FOCAL * BASELINE / 4.0))
right[:, : W - bg_disp] = left[:, bg_disp:]
for cx, cy, hs, z in OBSTACLES:
    patch = RNG.integers(60, 255, size=(2 * hs, 2 * hs), dtype=np.uint8)
    d = int(round(FOCAL * BASELINE / z))
    left[cy - hs : cy + hs, cx - hs : cx + hs] = patch
    right[cy - hs : cy + hs, cx - hs - d : cx + hs - d] = patch
print(f"synthetic scene: background at 4.0 m, obstacles at "
      f"{[z for *_, z in OBSTACLES]} m")

# ---- 3. disparity -> point cloud -------------------------------------------
disparity = vision.compute_disparity(left, right, num_disparities=96, block_size=9)
valid = disparity > 0
print(f"disparity: {valid.mean() * 100:.0f}% valid pixels, "
      f"range [{disparity[valid].min():.1f}, {disparity[valid].max():.1f}] px")
cloud = vision.disparity_to_pointcloud(disparity)
cloud = cloud[(cloud[:, 2] > 0.2) & (cloud[:, 2] < 3.5)]  # drop background/outliers
print(f"point cloud: {len(cloud):,} foreground points")

# ---- 4. cluster into obstacles ---------------------------------------------
perception = Perception(vision)
sub = cloud[RNG.choice(len(cloud), size=min(4000, len(cloud)), replace=False)]
labels, num = perception.cluster_obstacles(sub, eps=0.2, min_samples=12)
print(f"DBSCAN: {num} clusters")
truth = sorted(z for *_, z in OBSTACLES)
found = []
for c in range(num):
    pts = sub[labels == c]
    centroid = pts.mean(axis=0)
    found.append(centroid[2])
    print(f"  cluster {c}: {len(pts):4d} pts, centroid z = {centroid[2]:.2f} m")
found.sort()
if len(found) >= len(truth):
    err = max(abs(f - t) for f, t in zip(found[: len(truth)], truth))
    print(f"max depth error vs ground truth: {err:.2f} m "
          f"({'OK' if err < 0.25 else 'DEGRADED'})")

# ---- 5. mono path via the depth-blob fallback -------------------------------
depth = np.full((H, W), 4.0, dtype=np.float32)
for cx, cy, hs, z in OBSTACLES:
    depth[cy - hs : cy + hs, cx - hs : cx + hs] = z
rgb = np.stack([left] * 3, axis=-1)
positions, labels2 = vision.detect_obstacles(rgb, depth, method="depth",
                                             depth_threshold=3.0)
print(f"mono detect_obstacles (depth-blob fallback): {len(positions)} detections")
for p in positions:
    print(f"  at camera-frame {np.round(p, 2)}")
