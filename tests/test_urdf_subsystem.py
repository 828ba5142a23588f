"""Tests for the URDF subsystem periphery: geometry loaders, modifier,
validator, xacro, scene (reference coverage: tests/test_urdf_native.py,
test_v132_regressions.py URDF classes)."""

import os
import struct
import textwrap

import numpy as np
import pytest

from manipulapy_tpu.urdf import (
    URDF,
    Scene,
    URDFModifier,
    URDFParser,
    URDFValidator,
    XacroProcessor,
    box_mesh,
    cylinder_mesh,
    load_mesh,
    load_obj,
    load_stl,
    sphere_mesh,
    urdf_to_xml,
    validate,
)
from manipulapy_tpu.urdf.geometry import mesh_aabb, mesh_bounding_sphere

SIMPLE_URDF = """
<robot name="rr">
  <link name="base">
    <inertial><mass value="1.0"/><inertia ixx="0.01" iyy="0.01" izz="0.01" ixy="0" ixz="0" iyz="0"/></inertial>
  </link>
  <link name="l1">
    <inertial><origin xyz="0 0 0.2"/><mass value="2.0"/><inertia ixx="0.02" iyy="0.02" izz="0.01" ixy="0" ixz="0" iyz="0"/></inertial>
    <collision><geometry><cylinder radius="0.05" length="0.4"/></geometry></collision>
  </link>
  <link name="l2">
    <inertial><origin xyz="0 0 0.15"/><mass value="1.0"/><inertia ixx="0.01" iyy="0.01" izz="0.005" ixy="0" ixz="0" iyz="0"/></inertial>
  </link>
  <joint name="j1" type="revolute">
    <parent link="base"/><child link="l1"/>
    <origin xyz="0 0 0.1"/><axis xyz="0 0 1"/>
    <limit lower="-3.14" upper="3.14" effort="100" velocity="2.0"/>
  </joint>
  <joint name="j2" type="revolute">
    <parent link="l1"/><child link="l2"/>
    <origin xyz="0 0 0.4"/><axis xyz="0 1 0"/>
    <limit lower="-2.0" upper="2.0" effort="50" velocity="2.0"/>
  </joint>
</robot>
"""


@pytest.fixture()
def rr():
    return URDF.from_string(SIMPLE_URDF)


# -- geometry -------------------------------------------------------------------


class TestGeometry:
    def test_primitives_shapes(self):
        b = box_mesh((1, 2, 3))
        assert b.num_vertices == 8 and b.num_faces == 12
        c = cylinder_mesh(0.5, 2.0, segments=16)
        assert c.num_faces == 4 * 16
        s = sphere_mesh(1.0, subdivisions=8)
        assert s.num_faces > 0

    def test_box_aabb_and_sphere(self):
        b = box_mesh((2, 4, 6))
        lo, hi = mesh_aabb(b)
        np.testing.assert_allclose(lo, [-1, -2, -3])
        np.testing.assert_allclose(hi, [1, 2, 3])
        c, r = mesh_bounding_sphere(b)
        np.testing.assert_allclose(c, [0, 0, 0], atol=1e-12)
        assert r == pytest.approx(np.linalg.norm([1, 2, 3]))

    def test_binary_stl_roundtrip(self, tmp_path):
        mesh = box_mesh((1, 1, 1))
        tris = mesh.vertices[mesh.faces]  # (F, 3, 3)
        path = tmp_path / "box.stl"
        with open(path, "wb") as f:
            f.write(b"\0" * 80)
            f.write(struct.pack("<I", len(tris)))
            for t in tris:
                f.write(struct.pack("<3f", 0, 0, 1))
                for v in t:
                    f.write(struct.pack("<3f", *v))
                f.write(struct.pack("<H", 0))
        loaded = load_stl(str(path))
        assert loaded.num_faces == 12
        lo, hi = mesh_aabb(loaded)
        np.testing.assert_allclose(hi - lo, [1, 1, 1], atol=1e-6)

    def test_ascii_stl(self, tmp_path):
        path = tmp_path / "tri.stl"
        path.write_text(
            textwrap.dedent(
                """\
                solid tri
                facet normal 0 0 1
                  outer loop
                    vertex 0 0 0
                    vertex 1 0 0
                    vertex 0 1 0
                  endloop
                endfacet
                endsolid tri
                """
            )
        )
        m = load_stl(str(path))
        assert m.num_faces == 1 and m.num_vertices == 3

    def test_obj_loader_with_quads(self, tmp_path):
        path = tmp_path / "quad.obj"
        path.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n")
        m = load_obj(str(path))
        assert m.num_faces == 2  # fan-triangulated quad
        assert m.num_vertices == 4

    def test_load_mesh_dispatch(self, tmp_path):
        path = tmp_path / "t.obj"
        path.write_text("v 0 0 0\nv 2 0 0\nv 0 2 0\nf 1 2 3\n")
        m = load_mesh(str(path), scale=0.5)
        lo, hi = mesh_aabb(m)
        np.testing.assert_allclose(hi, [1, 1, 0])


# -- modifier ---------------------------------------------------------------------


class TestModifier:
    def test_edit_does_not_mutate_source(self, rr):
        mod = URDFModifier(rr)
        mod.set_joint_origin("j2", xyz=[0, 0, 0.5])
        assert np.allclose(rr.robot.joint_map["j2"].origin.xyz, [0, 0, 0.4])
        new = mod.modified_urdf()
        assert np.allclose(new.robot.joint_map["j2"].origin.xyz, [0, 0, 0.5])

    def test_limits_and_axis(self, rr):
        mod = URDFModifier(rr)
        mod.set_joint_limits("j1", lower=-1.0, upper=1.0)
        mod.set_joint_axis("j1", [0, 0, 2.0])  # normalized
        new = mod.modified_urdf()
        j = new.robot.joint_map["j1"]
        assert j.limit.lower == -1.0 and j.limit.upper == 1.0
        np.testing.assert_allclose(j.axis, [0, 0, 1])

    def test_mass_edits_and_payload(self, rr):
        mod = URDFModifier(rr)
        mod.set_link_mass("l2", 3.0)
        mod.attach_payload("l2", mass=1.0, com_offset=(0, 0, 0.3))
        new = mod.modified_urdf()
        inert = new.robot.link_map["l2"].inertial
        assert inert.mass == pytest.approx(4.0)
        # CoM moves toward the payload: (3*0.15 + 1*0.3)/4
        assert inert.origin.xyz[2] == pytest.approx((3 * 0.15 + 0.3) / 4)

    def test_zero_offset_shifts_fk(self, rr):
        mod = URDFModifier(rr)
        mod.set_joint_zero_offset("j1", 0.5)
        new = mod.modified_urdf()
        fk_old = rr.link_fk({"j1": 0.5})["l2"]
        fk_new = new.link_fk({"j1": 0.0})["l2"]
        np.testing.assert_allclose(fk_new, fk_old, atol=1e-12)

    def test_xml_roundtrip(self, rr):
        mod = URDFModifier(rr)
        mod.set_link_mass("l1", 5.0)
        xml = mod.to_xml()
        re_parsed = URDF.from_string(xml)
        assert re_parsed.robot.link_map["l1"].inertial.mass == 5.0
        # FK identical through the roundtrip.
        np.testing.assert_allclose(
            re_parsed.link_fk({"j1": 0.3, "j2": -0.2})["l2"],
            mod.modified_urdf().link_fk({"j1": 0.3, "j2": -0.2})["l2"],
            atol=1e-12,
        )

    def test_calibration_save_load(self, rr, tmp_path):
        mod = URDFModifier(rr)
        mod.set_joint_origin("j2", xyz=[0.01, 0, 0.41])
        mod.set_joint_zero_offset("j1", 0.02)
        mod.set_link_mass("l1", 2.5)
        cal = tmp_path / "cal.json"
        mod.save_calibration(str(cal))

        mod2 = URDFModifier(URDF.from_string(SIMPLE_URDF))
        mod2.load_calibration(str(cal))
        new = mod2.modified_urdf()
        assert new.robot.link_map["l1"].inertial.mass == 2.5
        np.testing.assert_allclose(new.robot.joint_map["j2"].origin.xyz, [0.01, 0, 0.41])

    def test_rename(self, rr):
        mod = URDFModifier(rr)
        mod.rename_link("l2", "tool")
        mod.rename_joint("j2", "elbow")
        new = mod.modified_urdf()
        assert "tool" in new.robot.link_map
        assert new.robot.joint_map["elbow"].child == "tool"

    def test_modified_model_parity(self, rr):
        """Edited document flows through to the device model."""
        import jax.numpy as jnp

        mod = URDFModifier(rr)
        mod.set_link_mass("l2", 10.0)
        m = mod.modified_urdf().to_robot_model(dtype=jnp.float64)
        assert float(m.inertias[1, 3, 3]) == pytest.approx(10.0)


# -- validator -------------------------------------------------------------------


class TestValidator:
    def test_valid_document(self, rr):
        res = validate(rr.robot)
        assert res.is_valid

    def test_detects_cycle(self):
        bad = URDFParser().parse_string(
            """
            <robot name="cyc">
              <link name="a"/><link name="b"/>
              <joint name="ab" type="fixed"><parent link="a"/><child link="b"/></joint>
              <joint name="ba" type="fixed"><parent link="b"/><child link="a"/></joint>
            </robot>
            """
        )
        res = validate(bad)
        assert not res.is_valid
        assert any(i.code in ("no_root", "cycle") for i in res.errors)

    def test_detects_inverted_limits_and_bad_mass(self):
        bad = URDFParser().parse_string(
            """
            <robot name="bad">
              <link name="a"/>
              <link name="b"><inertial><mass value="-1"/><inertia ixx="1" iyy="1" izz="5" ixy="0" ixz="0" iyz="0"/></inertial></link>
              <joint name="j" type="revolute">
                <parent link="a"/><child link="b"/><axis xyz="0 0 1"/>
                <limit lower="2.0" upper="-2.0"/>
              </joint>
            </robot>
            """
        )
        res = validate(bad)
        codes = {i.code for i in res.issues}
        assert "inverted_limits" in codes
        assert "negative_mass" in codes
        assert "inertia_triangle" in codes  # 1 + 1 < 5

    def test_detects_unknown_references(self):
        bad = URDFParser().parse_string(
            """
            <robot name="dangling">
              <link name="a"/>
              <joint name="j" type="fixed"><parent link="a"/><child link="ghost"/></joint>
            </robot>
            """
        )
        res = URDFValidator().validate(bad)
        assert any(i.code == "unknown_child" for i in res.errors)


# -- xacro ----------------------------------------------------------------------


class TestXacro:
    def test_property_substitution(self):
        src = """
        <robot name="x" xmlns:xacro="http://www.ros.org/wiki/xacro">
          <xacro:property name="len" value="0.4"/>
          <link name="a"/>
          <link name="b"/>
          <joint name="j" type="revolute">
            <parent link="a"/><child link="b"/>
            <origin xyz="0 0 ${len}"/><axis xyz="0 0 1"/>
            <limit lower="${-pi/2}" upper="${pi/2}"/>
          </joint>
        </robot>
        """
        out = XacroProcessor(prefer_external=False).process_string(src)
        urdf = URDF.from_string(out)
        j = urdf.robot.joint_map["j"]
        np.testing.assert_allclose(j.origin.xyz, [0, 0, 0.4])
        assert j.limit.upper == pytest.approx(np.pi / 2)

    def test_macro_expansion(self):
        src = """
        <robot name="x" xmlns:xacro="http://www.ros.org/wiki/xacro">
          <xacro:macro name="leg" params="name length">
            <link name="${name}"/>
            <joint name="${name}_j" type="fixed">
              <parent link="base"/><child link="${name}"/>
              <origin xyz="0 0 ${length}"/>
            </joint>
          </xacro:macro>
          <link name="base"/>
          <xacro:leg name="left" length="0.3"/>
          <xacro:leg name="right" length="0.5"/>
        </robot>
        """
        out = XacroProcessor(prefer_external=False).process_string(src)
        urdf = URDF.from_string(out)
        assert "left" in urdf.robot.link_map and "right" in urdf.robot.link_map
        np.testing.assert_allclose(urdf.robot.joint_map["right_j"].origin.xyz, [0, 0, 0.5])

    def test_conditionals(self):
        src = """
        <robot name="x" xmlns:xacro="http://www.ros.org/wiki/xacro">
          <xacro:property name="with_tool" value="1"/>
          <link name="base"/>
          <xacro:if value="${with_tool}">
            <link name="tool"/>
            <joint name="tj" type="fixed"><parent link="base"/><child link="tool"/></joint>
          </xacro:if>
          <xacro:unless value="${with_tool}">
            <link name="stub"/>
            <joint name="sj" type="fixed"><parent link="base"/><child link="stub"/></joint>
          </xacro:unless>
        </robot>
        """
        out = XacroProcessor(prefer_external=False).process_string(src)
        urdf = URDF.from_string(out)
        assert "tool" in urdf.robot.link_map
        assert "stub" not in urdf.robot.link_map


# -- scene -----------------------------------------------------------------------


class TestScene:
    def test_world_fk_offset(self, rr):
        scene = Scene()
        scene.add_robot("a", rr, base_position=[1.0, 0, 0])
        scene.robots["a"].set_joint_values([0.0, 0.0])
        fk = scene.world_link_fk("a")
        assert fk["base"][0, 3] == pytest.approx(1.0)
        assert fk["l2"][0, 3] == pytest.approx(1.0)

    def test_far_robots_not_colliding(self, rr):
        scene = Scene()
        scene.add_robot("a", rr, base_position=[0, 0, 0])
        scene.add_robot("b", URDF.from_string(SIMPLE_URDF), base_position=[10, 0, 0])
        colliding, clearance = scene.check_robot_collision("a", "b")
        assert not colliding
        assert clearance > 5

    def test_overlapping_robots_collide(self, rr):
        scene = Scene()
        scene.add_robot("a", rr, base_position=[0, 0, 0])
        scene.add_robot("b", URDF.from_string(SIMPLE_URDF), base_position=[0.01, 0, 0])
        colliding, clearance = scene.check_robot_collision("a", "b")
        assert colliding
        assert clearance < 0
        pairs = scene.check_all_collisions()
        assert ("a", "b", clearance) in pairs

    def test_duplicate_name_rejected(self, rr):
        scene = Scene()
        scene.add_robot("a", rr)
        with pytest.raises(ValueError):
            scene.add_robot("a", rr)


# -- URDF element tail: transmissions, safety, calibration, floating/planar ----

TAIL_URDF = """
<robot name="tail">
  <link name="world"/>
  <link name="body">
    <inertial><mass value="5.0"/><inertia ixx="0.1" iyy="0.1" izz="0.1" ixy="0" ixz="0" iyz="0"/></inertial>
  </link>
  <link name="slider">
    <inertial><mass value="1.0"/><inertia ixx="0.01" iyy="0.01" izz="0.01" ixy="0" ixz="0" iyz="0"/></inertial>
  </link>
  <link name="tip">
    <inertial><mass value="0.5"/><inertia ixx="0.01" iyy="0.01" izz="0.01" ixy="0" ixz="0" iyz="0"/></inertial>
  </link>
  <joint name="free" type="floating">
    <parent link="world"/><child link="body"/>
    <origin xyz="0 0 0.5"/>
  </joint>
  <joint name="plane" type="planar">
    <parent link="body"/><child link="slider"/>
    <origin xyz="0.1 0 0"/><axis xyz="0 0 1"/>
  </joint>
  <joint name="elbow" type="revolute">
    <parent link="slider"/><child link="tip"/>
    <origin xyz="0 0 0.2"/><axis xyz="0 1 0"/>
    <limit lower="-1.5" upper="1.5" effort="40" velocity="2.0"/>
    <safety_controller soft_lower_limit="-1.4" soft_upper_limit="1.4" k_position="15" k_velocity="10"/>
    <calibration rising="0.25"/>
  </joint>
  <transmission name="elbow_trans">
    <type>transmission_interface/SimpleTransmission</type>
    <joint name="elbow">
      <hardwareInterface>hardware_interface/EffortJointInterface</hardwareInterface>
    </joint>
    <actuator name="elbow_motor">
      <mechanicalReduction>50</mechanicalReduction>
      <hardwareInterface>hardware_interface/EffortJointInterface</hardwareInterface>
    </actuator>
  </transmission>
</robot>
"""


class TestURDFElementTail:
    """Transmission / safety_controller / calibration parsing and
    floating/planar child poses (reference ``urdf/parser.py:666-860``,
    ``urdf/types.py:641-748``)."""

    def test_transmission_parsed(self):
        u = URDF.from_string(TAIL_URDF)
        assert len(u.transmissions) == 1
        t = u.transmissions[0]
        assert t.name == "elbow_trans"
        assert t.type == "transmission_interface/SimpleTransmission"
        assert [tj.name for tj in t.joints] == ["elbow"]
        assert t.joints[0].hardware_interface == "hardware_interface/EffortJointInterface"
        assert t.actuators[0].name == "elbow_motor"
        assert t.actuators[0].mechanical_reduction == 50.0

    def test_safety_and_calibration_parsed(self):
        u = URDF.from_string(TAIL_URDF)
        j = u.robot.joint_map["elbow"]
        sc = j.safety_controller
        assert sc is not None
        assert (sc.soft_lower_limit, sc.soft_upper_limit) == (-1.4, 1.4)
        assert (sc.k_position, sc.k_velocity) == (15.0, 10.0)
        assert j.calibration is not None
        assert j.calibration.rising == 0.25
        assert j.calibration.falling is None

    def test_floating_child_pose_quaternion(self):
        u = URDF.from_string(TAIL_URDF)
        j = u.robot.joint_map["free"]
        # 90 deg about z as quaternion [qx qy qz qw].
        s = np.sin(np.pi / 4)
        T = j.child_pose([1.0, 2.0, 3.0, 0.0, 0.0, s, np.cos(np.pi / 4)])
        np.testing.assert_allclose(T[:3, 3], [1.0, 2.0, 3.5], atol=1e-12)  # + origin z
        Rz90 = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=float)
        np.testing.assert_allclose(T[:3, :3], Rz90, atol=1e-12)

    def test_floating_scalar_defaults_identity(self):
        u = URDF.from_string(TAIL_URDF)
        j = u.robot.joint_map["free"]
        np.testing.assert_allclose(j.child_pose(0.0), j.origin.matrix, atol=1e-15)

    def test_planar_child_pose(self):
        u = URDF.from_string(TAIL_URDF)
        j = u.robot.joint_map["plane"]
        T = j.child_pose([0.3, -0.2, np.pi / 2])
        np.testing.assert_allclose(T[:3, 3], [0.4, -0.2, 0.0], atol=1e-12)  # + origin x
        np.testing.assert_allclose(T[0, 0], 0.0, atol=1e-12)
        np.testing.assert_allclose(T[1, 0], 1.0, atol=1e-12)

    def test_link_fk_through_floating_chain(self):
        """FK across floating/planar joints at zero config matches the
        chained origins (no crash, no fixed-joint misinterpretation)."""
        u = URDF.from_string(TAIL_URDF)
        fk = u.link_fk({})
        np.testing.assert_allclose(fk["tip"][:3, 3], [0.1, 0, 0.7], atol=1e-12)

    def test_xml_roundtrip_preserves_tail(self):
        u = URDF.from_string(TAIL_URDF)
        xml = urdf_to_xml(u.robot)
        u2 = URDF.from_string(xml)
        t1, t2 = u.transmissions[0], u2.transmissions[0]
        assert (t1.name, t1.type) == (t2.name, t2.type)
        assert t1.actuators[0].mechanical_reduction == t2.actuators[0].mechanical_reduction
        assert t1.joints[0].hardware_interface == t2.joints[0].hardware_interface
        j1 = u.robot.joint_map["elbow"]
        j2 = u2.robot.joint_map["elbow"]
        assert j1.safety_controller == j2.safety_controller
        assert j1.calibration == j2.calibration

    def test_modifier_preserves_transmissions(self):
        u = URDF.from_string(TAIL_URDF)
        mod = URDFModifier(u)
        mod.set_link_mass("tip", 0.7)
        out = URDF.from_string(mod.to_xml()) if hasattr(mod, "to_xml") else URDF.from_string(urdf_to_xml(mod.robot))
        assert len(out.transmissions) == 1

    def test_validator_transmission_checks(self):
        bad = TAIL_URDF.replace('joint name="elbow">', 'joint name="ghost">')
        res = validate(URDFParser().parse_string(bad))
        codes = {i.code for i in res.issues}
        assert "transmission_unknown_joint" in codes
        good = validate(URDFParser().parse_string(TAIL_URDF))
        assert not any(i.code.startswith("transmission") for i in good.issues)

    def test_validator_empty_transmission_warns(self):
        doc = TAIL_URDF.replace(
            '<joint name="elbow">\n      <hardwareInterface>hardware_interface/EffortJointInterface</hardwareInterface>\n    </joint>',
            "",
        )
        res = validate(URDFParser().parse_string(doc))
        assert "transmission_no_joints" in {i.code for i in res.issues}
