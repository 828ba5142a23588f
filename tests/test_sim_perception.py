"""Simulation + vision/perception tests (native physics replaces the
reference's PyBullet dependency; the conftest-mock strategy of the
reference becomes genuine native execution here)."""

import jax.numpy as jnp
import numpy as np
import pytest

from manipulapy_tpu import trajectory
from manipulapy_tpu.models import catalog
from manipulapy_tpu.perception import Perception, dbscan_native
from manipulapy_tpu.sim import Simulation, pybullet_available
from manipulapy_tpu.vision import CameraConfig, Vision, camera_to_pixel, pixel_to_camera


@pytest.fixture(scope="module")
def sim():
    model = catalog.two_link_planar(dtype=jnp.float64)
    return Simulation(model, dt=0.01, g=(0.0, 0.0, 0.0), substeps=2)


class TestSimulation:
    def test_reset_and_state(self, sim):
        sim.reset(q=[0.3, -0.2])
        np.testing.assert_allclose(sim.get_joint_positions(), [0.3, -0.2])
        assert sim.time == 0.0

    def test_step_advances_time(self, sim):
        sim.reset()
        sim.step(jnp.zeros(2))
        assert sim.time == pytest.approx(0.01)
        assert len(sim.history) == 1

    def test_zero_torque_zero_gravity_stays(self, sim):
        sim.reset(q=[0.5, 0.5])
        for _ in range(10):
            sim.step(jnp.zeros(2))
        np.testing.assert_allclose(sim.get_joint_positions(), [0.5, 0.5], atol=1e-10)

    @pytest.mark.slow
    def test_run_trajectory_reaches_target(self, sim):
        sim.reset()
        traj = trajectory.joint_trajectory(
            sim.model, jnp.zeros(2), jnp.asarray([0.6, -0.4]), 2.0, 200, 5
        )
        ee = sim.run_trajectory(np.asarray(traj.position))
        np.testing.assert_allclose(
            sim.get_joint_positions(), [0.6, -0.4], atol=0.05
        )
        assert ee.shape == (3,)

    @pytest.mark.slow
    def test_run_controller_tracks(self, sim):
        sim.reset()
        traj = trajectory.joint_trajectory(
            sim.model, jnp.zeros(2), jnp.asarray([0.4, 0.3]), 1.5, 150, 5
        )
        achieved = sim.run_controller(
            np.asarray(traj.position),
            np.asarray(traj.velocity),
            np.asarray(traj.acceleration),
        )
        assert achieved.shape == (150, 2)
        np.testing.assert_allclose(achieved[-1], [0.4, 0.3], atol=0.05)

    def test_self_collision_query(self, sim):
        sim.reset()
        colliding, clearance = sim.check_self_collision()
        assert isinstance(colliding, bool)
        assert np.isfinite(clearance)

    def test_csv_export(self, sim, tmp_path):
        sim.reset()
        sim.step(jnp.zeros(2))
        path = tmp_path / "states.csv"
        sim.save_joint_states(str(path))
        lines = path.read_text().strip().splitlines()
        assert lines[0].startswith("time,q0,q1,dq0,dq1")
        assert len(lines) == 2

    def test_pybullet_gated(self):
        if pybullet_available():
            pytest.skip("pybullet installed")
        model = catalog.two_link_planar(dtype=jnp.float64)
        with pytest.raises(ImportError, match="PyBullet"):
            Simulation(model, use_pybullet=True)


class TestVision:
    def test_pinhole_roundtrip(self):
        cam = CameraConfig()
        pts = np.array([[0.2, -0.1, 1.5], [0.0, 0.3, 2.0]])
        uv = np.asarray(camera_to_pixel(pts, cam))
        back = np.asarray(pixel_to_camera(uv[:, 0], uv[:, 1], pts[:, 2], cam))
        np.testing.assert_allclose(back, pts, atol=1e-5)

    def test_depth_detector_finds_blob(self):
        cam = CameraConfig()
        v = Vision([cam])
        depth = np.full((480, 640), 5.0, dtype=np.float32)
        depth[200:260, 300:360] = 1.0  # near object
        rgb = np.zeros((480, 640, 3), dtype=np.uint8)
        positions, labels = v.detect_obstacles(rgb, depth, depth_threshold=2.0)
        assert len(positions) == 1
        # Blob center ~ (330, 230) at depth 1.0.
        expected = np.asarray(pixel_to_camera(330.0, 230.0, 1.0, cam))
        np.testing.assert_allclose(positions[0], expected, atol=0.05)

    def test_depth_detector_empty(self):
        v = Vision()
        depth = np.full((100, 100), 9.0, dtype=np.float32)
        positions, labels = v.detect_obstacles(
            np.zeros((100, 100, 3), np.uint8), depth
        )
        assert positions.shape == (0, 3)

    def test_yolo_gated(self):
        import importlib.util

        if importlib.util.find_spec("ultralytics") is not None:
            pytest.skip("ultralytics installed")
        v = Vision()
        with pytest.raises(ImportError, match="ultralytics"):
            v._ensure_yolo()

    def test_stereo_pipeline(self):
        """End-to-end stereo: synthetic shifted pair -> disparity in the
        right ballpark (the reference validates this in test_vision)."""
        cv2 = pytest.importorskip("cv2")
        rng = np.random.default_rng(0)
        base = (rng.uniform(0, 255, (120, 160)) > 127).astype(np.uint8) * 255
        base = cv2.GaussianBlur(base, (5, 5), 0)
        shift = 8
        left = base
        right = np.roll(base, -shift, axis=1)
        K = np.array([[100.0, 0, 80], [0, 100.0, 60], [0, 0, 1]])
        v = Vision(
            stereo_configs=(
                {"intrinsic": K},
                {"intrinsic": K, "translation": [0.1, 0, 0]},
            )
        )
        v.compute_stereo_rectification_maps((160, 120))
        disp = v.compute_disparity(left, right, num_disparities=32, block_size=9)
        valid = disp[disp > 0]
        assert valid.size > 50
        assert abs(np.median(valid) - shift) < 3.0
        cloud = v.disparity_to_pointcloud(disp)
        assert cloud.shape[1] == 3


class TestPerception:
    def test_dbscan_native_clusters(self):
        pts = np.concatenate(
            [
                np.random.default_rng(0).normal([0, 0, 0], 0.01, (10, 3)),
                np.random.default_rng(1).normal([1, 1, 1], 0.01, (10, 3)),
                [[5.0, 5.0, 5.0]],  # noise
            ]
        )
        labels = dbscan_native(pts, eps=0.1, min_samples=3)
        assert len(set(labels[:10])) == 1
        assert len(set(labels[10:20])) == 1
        assert labels[0] != labels[10]
        assert labels[-1] == -1

    def test_cluster_obstacles_sklearn_or_native(self):
        p = Perception()
        pts = np.array([[0, 0, 0], [0.01, 0, 0], [0.02, 0, 0], [2, 2, 2]])
        labels, num = p.cluster_obstacles(pts, eps=0.1, min_samples=2)
        assert num == 1
        assert labels[-1] == -1

    def test_detect_and_cluster_end_to_end(self):
        cam = CameraConfig()
        p = Perception(Vision([cam]))
        depth = np.full((480, 640), 5.0, dtype=np.float32)
        depth[100:150, 100:150] = 1.0
        depth[300:350, 400:450] = 1.2
        rgb = np.zeros((480, 640, 3), dtype=np.uint8)
        positions, labels = p.detect_and_cluster_obstacles(
            rgb, depth, depth_threshold=2.0, eps=0.5, min_samples=1
        )
        assert len(positions) == 2
