"""PyBullet bridge + sim-camera tests against a behavioral fake client.

The reference tests its simulation layer the same way: CI has no display
or GPU, so ``pybullet`` is replaced by a deterministic fake
(``tests/conftest.py:681-705`` in the reference — ``loadURDF -> 0``,
``getNumJoints -> 6``, ``getCameraImage -> random RGBA/depth``). Here the
fake is injected explicitly (``pb_module=``) instead of patched into
``sys.modules``, which keeps it scoped to these tests.
"""

import numpy as np
import pytest

from manipulapy_tpu.models.robot_data import get_robot_urdf
from manipulapy_tpu.pybullet_bridge import PyBulletBridge
from manipulapy_tpu.vision import CameraConfig, Vision


class FakePB:
    """Minimal behavioral pybullet: 6 revolute joints, kinematic state."""

    GUI, DIRECT = 1, 2
    JOINT_FIXED = 4
    JOINT_REVOLUTE = 0
    POSITION_CONTROL = 2
    URDF_USE_SELF_COLLISION = 8
    GEOM_CAPSULE = 7

    def __init__(self, num_joints=6, contacts=()):
        self.num_joints = num_joints
        self.q = np.zeros(num_joints)
        self.targets = np.zeros(num_joints)
        self.params = []  # debug parameter values
        self.bodies = 0
        self.filtered_pairs = []
        self.contacts = list(contacts)
        self.stepped = 0
        self.gravity = None
        self.removed = []
        self.connected = None

    # -- connection/world
    def connect(self, mode):
        self.connected = mode
        return 0

    def disconnect(self, client=None):
        self.connected = None

    def resetSimulation(self):
        pass

    def setGravity(self, x, y, z):
        self.gravity = (x, y, z)

    def setTimeStep(self, dt):
        self.dt = dt

    def loadURDF(self, path, useFixedBase=True, flags=0):
        self.load_flags = flags
        self.bodies += 1
        return self.bodies - 1

    def getNumJoints(self, body):
        return self.num_joints

    def getJointInfo(self, body, j):
        info = [None] * 17
        info[0] = j
        info[1] = f"joint{j}".encode()
        info[2] = self.JOINT_REVOLUTE
        info[8], info[9] = -3.14, 3.14
        info[12] = f"link{j}".encode()
        return info

    def setCollisionFilterPair(self, a, b, la, lb, enable):
        self.filtered_pairs.append((la, lb, enable))

    # -- sliders
    def addUserDebugParameter(self, name, lo, hi, start):
        self.params.append(float(start))
        return len(self.params) - 1

    def readUserDebugParameter(self, pid):
        return self.params[pid]

    # -- motion
    def setJointMotorControlArray(self, bodyUniqueId, jointIndices, controlMode,
                                  targetPositions, forces=None):
        self.forces = forces
        for j, v in zip(jointIndices, targetPositions):
            self.targets[j] = v

    def resetJointState(self, body, j, value):
        self.q[j] = value

    def getJointState(self, body, j):
        return (self.q[j], 0.0, (0, 0, 0, 0, 0, 0), 0.0)

    def stepSimulation(self):
        self.q = 0.5 * self.q + 0.5 * self.targets  # first-order tracking
        self.stepped += 1

    def getLinkState(self, body, link):
        return ((float(self.q.sum()), 0.0, 0.5), (0, 0, 0, 1))

    # -- geometry
    def createVisualShape(self, kind, radius=0.0, length=0.0, rgbaColor=None):
        return 100

    def createMultiBody(self, baseMass=0, baseVisualShapeIndex=0,
                        basePosition=None, baseOrientation=None):
        self.bodies += 1
        return self.bodies - 1

    def removeBody(self, body):
        self.removed.append(body)

    # -- collision
    def performCollisionDetection(self):
        pass

    def getContactPoints(self, bodyA=None, bodyB=None):
        return list(self.contacts)

    # -- camera
    def computeViewMatrix(self, cameraEyePosition, cameraTargetPosition, cameraUpVector):
        return tuple(np.eye(4).ravel())

    def computeProjectionMatrixFOV(self, fov, aspect, nearVal, farVal):
        self.last_fov = fov
        return tuple(np.eye(4).ravel())

    def getCameraImage(self, w, h, viewMatrix=None, projectionMatrix=None):
        rng = np.random.default_rng(0)
        rgba = rng.integers(0, 255, size=(h, w, 4), dtype=np.uint8)
        depth = np.full((h, w), 0.5, dtype=np.float32)
        return w, h, rgba, depth, None


@pytest.fixture
def bridge():
    fake = FakePB()
    b = PyBulletBridge(
        get_robot_urdf("ur5"),
        enable_self_collision=True,
        disable_pairs=[("link0", "link1")],
        torque_limits=np.full(6, 150.0),
        pb_module=fake,
    )
    return b, fake


class TestWorldSetup:
    def test_world(self, bridge):
        b, fake = bridge
        assert fake.gravity == (0, 0, -9.81)
        assert b.robot_id is not None
        assert fake.load_flags == FakePB.URDF_USE_SELF_COLLISION
        assert len(b.non_fixed_joints) == 6
        # ACM pair filtered out (reference sim.py:255-266).
        assert (0, 1, 0) in fake.filtered_pairs

    def test_no_self_collision_flag(self):
        fake = FakePB()
        PyBulletBridge(get_robot_urdf("ur5"), enable_self_collision=False, pb_module=fake)
        assert fake.load_flags == 0

    def test_connect_env_override(self, monkeypatch):
        monkeypatch.setenv("MANIPULAPY_PYBULLET_CONNECT", "DIRECT")
        fake = FakePB()
        PyBulletBridge(get_robot_urdf("ur5"), pb_module=fake)
        assert fake.connected == FakePB.DIRECT


class TestMotion:
    def test_position_control_with_forces(self, bridge):
        b, fake = bridge
        q = np.linspace(-1, 1, 6)
        b.set_joint_positions(q)
        np.testing.assert_allclose(fake.targets, q)
        assert fake.forces == [150.0] * 6  # torque-limit-derived (sim.py:361-399)

    def test_teleport(self, bridge):
        b, fake = bridge
        b.set_joint_positions(np.ones(6), use_motors=False)
        np.testing.assert_allclose(b.get_joint_positions(), np.ones(6))

    def test_run_trajectory_steps_physics(self, bridge):
        b, fake = bridge
        traj = np.linspace(0, 1, 20)[:, None] * np.ones(6)
        ee = b.run_trajectory(traj, draw_trail=True)
        assert fake.stepped == 20
        assert ee.shape == (3,)
        assert len(b._trail_bodies) > 0  # capsule trail, not debug lines
        b.clear_trail()
        assert b._trail_bodies == [] and len(fake.removed) > 0


class TestGuiAndCollision:
    def test_sliders_and_reset(self, bridge):
        b, fake = bridge
        b.add_joint_sliders()
        b.add_reset_button()
        assert len(b.joint_sliders) == 6
        assert b.read_sliders().shape == (6,)
        assert not b.reset_pressed()
        fake.params[b.reset_button] += 1  # press
        assert b.reset_pressed()

    def test_manual_control_loop(self, bridge):
        b, fake = bridge
        b.manual_control_loop(steps=5)
        assert fake.stepped == 5

    def test_self_collision_contacts(self):
        fake = FakePB(contacts=[(0, 0, 0, 2, 4) + (0,) * 9])
        b = PyBulletBridge(get_robot_urdf("ur5"), pb_module=fake)
        colliding, pairs = b.check_self_collision()
        assert colliding and pairs == [(2, 4)]

    def test_no_collision(self, bridge):
        b, fake = bridge
        colliding, pairs = b.check_self_collision()
        assert not colliding and pairs == []


class TestSimCamera:
    def test_capture_image_metric_depth(self):
        """capture_image inverts the NONLINEAR OpenGL z-buffer:
        z = far*near / (far - (far-near)*buf). (The reference's linear
        near + (far-near)*buf map is an upstream bug — it reports an
        object at 1 m as 9.1 m — deliberately not mirrored.)"""
        cam = CameraConfig(width=64, height=48, near=0.1, far=10.0)
        vision = Vision([cam])
        rgb, depth = vision.capture_image(0, pb_module=FakePB())
        assert rgb.shape == (48, 64, 3) and rgb.dtype == np.uint8
        assert depth.shape == (48, 64)
        np.testing.assert_allclose(depth, 10.0 * 0.1 / (10.0 - 9.9 * 0.5), rtol=1e-6)
        # round-trip sanity: the buffer value an object at z=1 m produces
        # must invert back to 1 m
        z = 1.0
        buf = (10.0 / (10.0 - 0.1)) * (1.0 - 0.1 / z)
        z_back = 10.0 * 0.1 / (10.0 - 9.9 * buf)
        assert abs(z_back - z) < 1e-9

    def test_capture_bad_index_soft_fails(self):
        vision = Vision([CameraConfig()])
        assert vision.capture_image(3, pb_module=FakePB()) == (None, None)

    def test_capture_feeds_detection(self):
        """End-to-end: simulated capture -> native depth-blob detector
        (the reference's capture -> detect_obstacles pipeline,
        perception.py:100-167)."""
        cam = CameraConfig(width=64, height=48, near=0.1, far=10.0)
        vision = Vision([cam])
        rgb, depth = vision.capture_image(0, pb_module=FakePB())
        positions, labels = vision.detect_obstacles(
            rgb, depth, 0, method="depth", depth_threshold=6.0
        )
        # Uniform 5.05 m depth < threshold => one blob covering the frame.
        assert positions.shape[1] == 3 and len(positions) >= 1
