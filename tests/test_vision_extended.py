"""Extended vision/perception tests, mirroring the reference's
``test_vision.py`` (30 tests) / ``test_perception.py`` (20) coverage
classes: pinhole geometry laws, extrinsic transforms, detector
parameters, and DBSCAN clustering properties."""

import numpy as np
import pytest

import jax.numpy as jnp

from manipulapy_tpu.perception import Perception, dbscan_native
from manipulapy_tpu.vision import (
    CameraConfig,
    Vision,
    camera_to_pixel,
    camera_to_world,
    pixel_to_camera,
)


@pytest.fixture()
def cam():
    return CameraConfig(fx=500, fy=400, cx=160, cy=120, width=320, height=240)


class TestPinholeGeometry:
    def test_principal_point_maps_to_optical_axis(self, cam):
        p = pixel_to_camera(cam.cx, cam.cy, 2.0, cam)
        np.testing.assert_allclose(np.asarray(p), [0.0, 0.0, 2.0], atol=1e-6)

    def test_roundtrip_batched(self, cam):
        rng = np.random.default_rng(0)
        uv = rng.uniform([0, 0], [320, 240], (50, 2)).astype(np.float32)
        z = rng.uniform(0.5, 5.0, 50).astype(np.float32)
        pts = pixel_to_camera(uv[:, 0], uv[:, 1], z, cam)
        uv2 = camera_to_pixel(pts, cam)
        np.testing.assert_allclose(np.asarray(uv2), uv, atol=1e-3)

    def test_depth_scales_lateral_offset(self, cam):
        p1 = pixel_to_camera(cam.cx + 100, cam.cy, 1.0, cam)
        p2 = pixel_to_camera(cam.cx + 100, cam.cy, 3.0, cam)
        assert float(p2[0]) == pytest.approx(3.0 * float(p1[0]))

    def test_anisotropic_focal_lengths(self, cam):
        p = pixel_to_camera(cam.cx + 50, cam.cy + 50, 1.0, cam)
        # fx=500 vs fy=400: same pixel offset -> larger y displacement
        assert abs(float(p[1])) > abs(float(p[0]))

    def test_intrinsic_matrix_layout(self, cam):
        K = cam.intrinsic_matrix
        assert K[0, 0] == 500 and K[1, 1] == 400
        assert K[0, 2] == 160 and K[1, 2] == 120
        assert K[2, 2] == 1.0


class TestExtrinsics:
    def test_identity_extrinsic_is_noop(self, cam):
        pts = jnp.asarray([[0.1, 0.2, 1.5]])
        np.testing.assert_allclose(
            np.asarray(camera_to_world(pts, cam)), np.asarray(pts), atol=1e-7
        )

    def test_translation_extrinsic(self):
        T = np.eye(4)
        T[:3, 3] = [1.0, 2.0, 3.0]
        cam = CameraConfig(extrinsic=T)
        out = camera_to_world(jnp.asarray([0.0, 0.0, 1.0]), cam)
        np.testing.assert_allclose(np.asarray(out), [1.0, 2.0, 4.0], atol=1e-6)

    def test_rotation_extrinsic(self):
        # camera looking along -x: 90 deg rotation about z
        T = np.eye(4)
        T[:3, :3] = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
        cam = CameraConfig(extrinsic=T)
        out = camera_to_world(jnp.asarray([1.0, 0.0, 0.0]), cam)
        np.testing.assert_allclose(np.asarray(out), [0.0, 1.0, 0.0], atol=1e-6)


class TestDepthDetector:
    def _scene(self):
        d = np.full((240, 320), 5.0, dtype=np.float32)
        d[100:140, 60:120] = 1.5
        return d

    def test_min_area_filters_specks(self):
        v = Vision(camera_configs=[CameraConfig(width=320, height=240, cx=160, cy=120)])
        d = self._scene()
        d[10:12, 10:12] = 1.0  # 4-pixel speck
        pos_all, _ = v.detect_obstacles(
            np.zeros((240, 320, 3), np.uint8), d, depth_threshold=3.0, min_blob_area=1
        )
        pos_filtered, _ = v.detect_obstacles(
            np.zeros((240, 320, 3), np.uint8), d, depth_threshold=3.0, min_blob_area=100
        )
        assert pos_all.shape[0] == pos_filtered.shape[0] + 1

    def test_threshold_excludes_background(self):
        v = Vision(camera_configs=[CameraConfig(width=320, height=240, cx=160, cy=120)])
        pos, _ = v.detect_obstacles(
            np.zeros((240, 320, 3), np.uint8), self._scene(),
            depth_threshold=1.0, min_blob_area=10,
        )
        assert pos.shape[0] == 0  # blob at 1.5 m is beyond a 1.0 m threshold

    def test_blob_depth_reported(self):
        v = Vision(camera_configs=[CameraConfig(width=320, height=240, cx=160, cy=120)])
        pos, _ = v.detect_obstacles(
            np.zeros((240, 320, 3), np.uint8), self._scene(),
            depth_threshold=3.0, min_blob_area=10,
        )
        assert pos.shape == (1, 3)
        assert pos[0, 2] == pytest.approx(1.5, abs=1e-3)


class TestDBSCANProperties:
    def _clumps(self, n1=30, n2=25, seed=0):
        rng = np.random.default_rng(seed)
        return np.concatenate([
            rng.normal([0, 0, 0], 0.02, (n1, 3)),
            rng.normal([1, 1, 1], 0.02, (n2, 3)),
        ])

    def test_permutation_invariant_partition(self):
        pts = self._clumps()
        rng = np.random.default_rng(3)
        perm = rng.permutation(len(pts))
        l1 = dbscan_native(pts, eps=0.1, min_samples=3)
        l2 = dbscan_native(pts[perm], eps=0.1, min_samples=3)
        # same PARTITION: points in the same cluster stay together
        for a in range(len(pts)):
            for b in range(a + 1, len(pts)):
                same1 = l1[a] == l1[b] and l1[a] != -1
                ia, ib = np.where(perm == a)[0][0], np.where(perm == b)[0][0]
                same2 = l2[ia] == l2[ib] and l2[ia] != -1
                assert same1 == same2

    def test_min_samples_gate(self):
        pts = np.concatenate([self._clumps(), [[5.0, 5.0, 5.0], [5.01, 5.0, 5.0]]])
        labels = dbscan_native(pts, eps=0.1, min_samples=3)
        # the 2-point clump cannot seed a cluster with min_samples=3
        assert labels[-1] == -1 and labels[-2] == -1
        labels2 = dbscan_native(pts, eps=0.1, min_samples=2)
        assert labels2[-1] != -1 and labels2[-1] == labels2[-2]

    def test_eps_merges_clusters(self):
        pts = self._clumps()
        tight = dbscan_native(pts, eps=0.1, min_samples=3)
        loose = dbscan_native(pts, eps=5.0, min_samples=3)
        assert len(set(tight.tolist()) - {-1}) == 2
        assert len(set(loose.tolist()) - {-1}) == 1

    def test_empty_and_single_point(self):
        assert dbscan_native(np.zeros((0, 3)), eps=0.1, min_samples=2).shape == (0,)
        single = dbscan_native(np.zeros((1, 3)), eps=0.1, min_samples=2)
        assert single[0] == -1  # below min_samples

    def test_perception_cluster_labels_and_count(self):
        per = Perception()
        pts = self._clumps()
        labels, num = per.cluster_obstacles(pts, eps=0.1, min_samples=3)
        assert num == 2
        assert labels.shape == (len(pts),)
        # the two clumps land in two distinct clusters
        assert labels[0] == labels[10] != -1
        assert labels[-1] == labels[-10] != -1
        assert labels[0] != labels[-1]

    def test_perception_cluster_empty(self):
        labels, num = Perception().cluster_obstacles(np.zeros((0, 3)))
        assert num == 0 and labels.shape == (0,)


class TestReviewRegressions:
    """Round-5 review findings on vision/checkpoint."""

    def test_sparse_blob_reports_obstacle_depth_not_background(self):
        """A thin diagonal obstacle's bbox is dominated by background
        pixels — the bbox median previously reported the BACKGROUND
        depth (5 m for a 1 m obstacle)."""
        v = Vision(camera_configs=[CameraConfig(width=320, height=240, cx=160, cy=120)])
        d = np.full((240, 320), 5.0, dtype=np.float32)
        for i in range(60):  # thin diagonal at 1.0 m
            d[80 + i, 80 + i] = 1.0
        pos, _ = v.detect_obstacles(
            np.zeros((240, 320, 3), np.uint8), d,
            depth_threshold=2.0, min_blob_area=10,
        )
        assert pos.shape[0] == 1
        assert pos[0, 2] == pytest.approx(1.0, abs=1e-3)

    def test_detect_obstacles_bad_camera_index_soft_fails(self):
        v = Vision(camera_configs=[CameraConfig()])
        rgb = np.zeros((480, 640, 3), np.uint8)
        d = np.full((480, 640), 5.0, np.float32)
        pos, lab = v.detect_obstacles(rgb, d, camera_index=3)
        assert pos.shape == (0, 3) and lab.shape == (0,)
        pos, lab = v.detect_obstacles(rgb, d, camera_index=-1)
        assert pos.shape == (0, 3)

    def test_bfloat16_checkpoint_roundtrip(self, tmp_path):
        """np.savez serializes ml_dtypes leaves as opaque void arrays —
        the restored bf16 state previously raised 'Dtype |V2 is not a
        valid JAX array type'."""
        import jax.numpy as jnp

        from manipulapy_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

        tree = {
            "us": jnp.full((4, 2), 1.5, dtype=jnp.bfloat16),
            "step_scale": jnp.asarray(0.25, jnp.bfloat16),
            "f32": jnp.arange(3.0),
        }
        p = str(tmp_path / "bf16.npz")
        save_checkpoint(p, tree, meta={"step": 3})
        out, meta = load_checkpoint(p, with_meta=True)
        assert meta == {"step": 3}
        assert str(out["us"].dtype) == "bfloat16" and out["us"].shape == (4, 2)
        assert str(out["step_scale"].dtype) == "bfloat16" and out["step_scale"].shape == ()
        assert float(np.asarray(out["step_scale"], np.float32)) == 0.25
        np.testing.assert_allclose(np.asarray(out["f32"]), [0.0, 1.0, 2.0])

    def test_checkpoint_manager_rejects_zero_keep(self, tmp_path):
        from manipulapy_tpu.utils.checkpoint import CheckpointManager

        with pytest.raises(ValueError, match="max_to_keep"):
            CheckpointManager(str(tmp_path), max_to_keep=0)
