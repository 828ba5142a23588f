"""URDF subsystem tests: parsing, tree construction, FK, screw extraction,
and model export (coverage modeled on the reference's urdf test strategy,
SURVEY.md section 4: small hand-written fixtures for branched trees,
mimic joints, prismatic joints, cycles)."""

import jax.numpy as jnp
import numpy as np
import pytest

from manipulapy_tpu import kinematics
from manipulapy_tpu.urdf import URDF, JointType

SIMPLE_ARM = """
<robot name="simple_arm">
  <link name="base">
    <inertial>
      <mass value="2.0"/>
      <origin xyz="0 0 0.1"/>
      <inertia ixx="0.02" iyy="0.02" izz="0.02" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
  <link name="upper">
    <inertial>
      <mass value="1.5"/>
      <origin xyz="0.2 0 0"/>
      <inertia ixx="0.01" iyy="0.01" izz="0.01" ixy="0" ixz="0" iyz="0"/>
    </inertial>
    <collision>
      <geometry><cylinder radius="0.05" length="0.4"/></geometry>
    </collision>
  </link>
  <link name="fore">
    <inertial>
      <mass value="1.0"/>
      <origin xyz="0.15 0 0"/>
      <inertia ixx="0.005" iyy="0.005" izz="0.005" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
  <joint name="shoulder" type="revolute">
    <parent link="base"/>
    <child link="upper"/>
    <origin xyz="0 0 0.2"/>
    <axis xyz="0 0 1"/>
    <limit lower="-3.0" upper="3.0" effort="100" velocity="2.0"/>
  </joint>
  <joint name="elbow" type="revolute">
    <parent link="upper"/>
    <child link="fore"/>
    <origin xyz="0.4 0 0" rpy="0 0 0"/>
    <axis xyz="0 1 0"/>
    <limit lower="-2.0" upper="2.0" effort="60" velocity="2.5"/>
  </joint>
</robot>
"""

PRISMATIC = """
<robot name="slider">
  <link name="world"/>
  <link name="cart"><inertial><mass value="1"/><inertia ixx="0.1" iyy="0.1" izz="0.1" ixy="0" ixz="0" iyz="0"/></inertial></link>
  <joint name="slide" type="prismatic">
    <parent link="world"/><child link="cart"/>
    <origin xyz="0 0 0.5"/><axis xyz="1 0 0"/>
    <limit lower="-1" upper="1" effort="50" velocity="1"/>
  </joint>
</robot>
"""

MIMIC = """
<robot name="gripper">
  <link name="palm"/>
  <link name="f1"><inertial><mass value="0.1"/><inertia ixx="1e-4" iyy="1e-4" izz="1e-4" ixy="0" ixz="0" iyz="0"/></inertial></link>
  <link name="f2"><inertial><mass value="0.1"/><inertia ixx="1e-4" iyy="1e-4" izz="1e-4" ixy="0" ixz="0" iyz="0"/></inertial></link>
  <joint name="drive" type="revolute">
    <parent link="palm"/><child link="f1"/>
    <origin xyz="0.05 0 0"/><axis xyz="0 0 1"/>
    <limit lower="0" upper="1" effort="10" velocity="1"/>
  </joint>
  <joint name="follow" type="revolute">
    <parent link="palm"/><child link="f2"/>
    <origin xyz="-0.05 0 0"/><axis xyz="0 0 1"/>
    <mimic joint="drive" multiplier="-1" offset="0"/>
    <limit lower="-1" upper="0" effort="10" velocity="1"/>
  </joint>
</robot>
"""

CYCLE = """
<robot name="cyclic">
  <link name="a"/><link name="b"/>
  <joint name="j1" type="revolute"><parent link="a"/><child link="b"/><axis xyz="0 0 1"/></joint>
  <joint name="j2" type="revolute"><parent link="b"/><child link="a"/><axis xyz="0 0 1"/></joint>
</robot>
"""

BRANCHED = """
<robot name="tree">
  <link name="torso"/>
  <link name="arm_l"/><link name="arm_r"/>
  <joint name="jl" type="revolute"><parent link="torso"/><child link="arm_l"/><origin xyz="0 0.2 0"/><axis xyz="1 0 0"/><limit lower="-1" upper="1" effort="10" velocity="1"/></joint>
  <joint name="jr" type="revolute"><parent link="torso"/><child link="arm_r"/><origin xyz="0 -0.2 0"/><axis xyz="1 0 0"/><limit lower="-1" upper="1" effort="10" velocity="1"/></joint>
</robot>
"""


class TestParsing:
    def test_basic_structure(self):
        u = URDF.from_string(SIMPLE_ARM)
        assert u.name == "simple_arm"
        assert set(u._links) == {"base", "upper", "fore"}
        assert [j.name for j in u.actuated_joints] == ["shoulder", "elbow"]
        assert u.base_link == "base"
        assert u.end_links == ["fore"]

    def test_joint_limits(self):
        u = URDF.from_string(SIMPLE_ARM)
        assert u.joint_limits == [(-3.0, 3.0), (-2.0, 2.0)]

    def test_inertial_parsing(self):
        u = URDF.from_string(SIMPLE_ARM)
        inertial = u._links["upper"].inertial
        assert inertial.mass == 1.5
        np.testing.assert_allclose(inertial.origin.xyz, [0.2, 0, 0])
        G = inertial.spatial_inertia
        # Parallel-axis: Iyy/Izz pick up m r^2 (reference urdf/types.py:203-239).
        assert G[1, 1] == pytest.approx(0.01 + 1.5 * 0.04)
        assert G[0, 0] == pytest.approx(0.01)
        assert G[3, 3] == 1.5

    def test_cycle_detection(self):
        with pytest.raises(ValueError, match="root|cycle"):
            URDF.from_string(CYCLE)

    def test_malformed_xml_recovery(self):
        broken = SIMPLE_ARM.replace("simple_arm", "R&D arm")
        u = URDF.from_string(broken)
        assert "R&D" in u.name

    def test_branched_tree(self):
        u = URDF.from_string(BRANCHED)
        assert set(u.end_links) == {"arm_l", "arm_r"}
        fk = u.link_fk({"jl": 0.0, "jr": 0.0})
        np.testing.assert_allclose(fk["arm_l"][:3, 3], [0, 0.2, 0])


class TestFK:
    def test_link_fk_home(self):
        u = URDF.from_string(SIMPLE_ARM)
        fk = u.link_fk({})
        np.testing.assert_allclose(fk["base"], np.eye(4))
        np.testing.assert_allclose(fk["upper"][:3, 3], [0, 0, 0.2])
        np.testing.assert_allclose(fk["fore"][:3, 3], [0.4, 0, 0.2])

    def test_link_fk_rotated(self):
        u = URDF.from_string(SIMPLE_ARM)
        fk = u.link_fk({"shoulder": np.pi / 2})
        np.testing.assert_allclose(fk["fore"][:3, 3], [0, 0.4, 0.2], atol=1e-12)

    def test_link_fk_batch_matches_single(self):
        u = URDF.from_string(SIMPLE_ARM)
        cfgs = np.array([[0.0, 0.0], [0.3, -0.5], [np.pi / 2, 0.2]])
        batch = u.link_fk_batch(cfgs)
        for i, (s, e) in enumerate(cfgs):
            single = u.link_fk({"shoulder": s, "elbow": e})
            for link in ("upper", "fore"):
                np.testing.assert_allclose(batch[link][i], single[link], atol=1e-12)

    def test_mimic_joint(self):
        u = URDF.from_string(MIMIC)
        assert [j.name for j in u.actuated_joints] == ["drive"]
        fk = u.link_fk({"drive": 0.5})
        # f2 follows with multiplier -1.
        fk2 = u.link_fk({"drive": 0.0})
        R1 = fk["f2"][:3, :3]
        expected = np.array(
            [
                [np.cos(-0.5), -np.sin(-0.5), 0],
                [np.sin(-0.5), np.cos(-0.5), 0],
                [0, 0, 1],
            ]
        )
        np.testing.assert_allclose(R1, expected, atol=1e-12)
        np.testing.assert_allclose(fk2["f2"][:3, :3], np.eye(3), atol=1e-12)

    def test_get_chain(self):
        u = URDF.from_string(SIMPLE_ARM)
        assert u.get_chain() == ["base", "upper", "fore"]

    def test_get_transform(self):
        u = URDF.from_string(SIMPLE_ARM)
        T = u.get_transform("upper", "fore", {})
        np.testing.assert_allclose(T[:3, 3], [0.4, 0, 0], atol=1e-12)


class TestScrewExtraction:
    def test_screw_axes_simple(self):
        u = URDF.from_string(SIMPLE_ARM)
        data = u.extract_screw_axes()
        S = data["S_list"]
        # shoulder: revolute about z through (0, 0, 0.2): S = [0,0,1, -w x p]
        np.testing.assert_allclose(S[0, :3], [0, 0, 1])
        np.testing.assert_allclose(S[0, 3:], -np.cross([0, 0, 1], [0, 0, 0.2]), atol=1e-12)
        # elbow: about y through (0.4, 0, 0.2)
        np.testing.assert_allclose(S[1, :3], [0, 1, 0])
        np.testing.assert_allclose(S[1, 3:], -np.cross([0, 1, 0], [0.4, 0, 0.2]), atol=1e-12)
        np.testing.assert_allclose(data["M"][:3, 3], [0.4, 0, 0.2])

    def test_prismatic_screw(self):
        u = URDF.from_string(PRISMATIC)
        data = u.extract_screw_axes()
        np.testing.assert_allclose(data["S_list"][0], [0, 0, 0, 1, 0, 0], atol=1e-12)

    def test_model_fk_matches_tree_fk(self):
        """RobotModel PoE FK must reproduce the tree FK for the chain tip —
        the oracle-comparison pattern of the reference's
        test_urdf_accuracy.py."""
        u = URDF.from_string(SIMPLE_ARM)
        model = u.to_robot_model(dtype=jnp.float64)
        rng = np.random.default_rng(0)
        for _ in range(5):
            q = rng.uniform(-1.5, 1.5, 2)
            T_model = np.asarray(kinematics.forward_kinematics(model, jnp.asarray(q)))
            T_tree = u.link_fk({"shoulder": q[0], "elbow": q[1]})["fore"]
            np.testing.assert_allclose(T_model, T_tree, atol=1e-10)

    def test_model_limits(self):
        u = URDF.from_string(SIMPLE_ARM)
        model = u.to_robot_model(dtype=jnp.float64)
        np.testing.assert_allclose(np.asarray(model.joint_lower), [-3.0, -2.0])
        np.testing.assert_allclose(np.asarray(model.torque_limit), [100.0, 60.0])
        np.testing.assert_allclose(np.asarray(model.velocity_limit), [2.0, 2.5])

    def test_link_radii(self):
        u = URDF.from_string(SIMPLE_ARM)
        radii = u.link_radii()
        assert radii[0] == pytest.approx(np.hypot(0.05, 0.2))  # cylinder
        assert radii[1] == 0.08  # default
