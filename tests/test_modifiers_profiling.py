"""URDFModifier and profiling-utility tests (previously uncovered
modules; the reference pins its modifier surface in
``tests/test_urdf_processor.py`` and its perf monitor in
``test_path_planning.py``)."""

import json
import os

import numpy as np
import pytest

from manipulapy_tpu.urdf import URDF
from manipulapy_tpu.urdf.modifiers import URDFModifier
from manipulapy_tpu.utils.profiling import PerformanceMonitor, benchmark_fn

FIXTURES = os.path.join(os.path.dirname(__file__), "urdf_fixtures")


@pytest.fixture()
def arm():
    return URDF.load(os.path.join(FIXTURES, "simple_arm.urdf"))


class TestJointEdits:
    def test_set_joint_origin_moves_fk(self, arm):
        mod = URDFModifier(arm)
        mod.set_joint_origin("shoulder", xyz=[0.0, 0.0, 0.3])
        fk = mod.modified_urdf().link_fk()
        np.testing.assert_allclose(fk["fore"][:3, 3], [0.4, 0.0, 0.3], atol=1e-12)

    def test_set_joint_axis_normalizes(self, arm):
        mod = URDFModifier(arm)
        mod.set_joint_axis("elbow", [0.0, 0.0, 5.0])
        j = mod.robot.joint_map["elbow"]
        np.testing.assert_allclose(j.axis, [0.0, 0.0, 1.0], atol=1e-12)

    def test_set_joint_axis_zero_raises(self, arm):
        with pytest.raises(ValueError, match="non-zero"):
            URDFModifier(arm).set_joint_axis("elbow", [0, 0, 0])

    def test_set_joint_limits_reach_model(self, arm):
        mod = URDFModifier(arm)
        mod.set_joint_limits("shoulder", lower=-1.0, upper=1.0, effort=55.0, velocity=1.5)
        import jax.numpy as jnp

        model = mod.modified_urdf().to_robot_model(dtype=jnp.float64)
        assert float(model.joint_lower[0]) == -1.0
        assert float(model.joint_upper[0]) == 1.0
        assert float(model.torque_limit[0]) == 55.0
        assert float(model.velocity_limit[0]) == 1.5

    def test_zero_offset_rotates_child_frame(self, arm):
        """A revolute zero offset folds into the joint origin at export:
        FK at q=0 of the offset document equals FK at q=offset of the
        original."""
        off = 0.37
        mod = URDFModifier(arm)
        mod.set_joint_zero_offset("shoulder", off)
        fk_off = mod.modified_urdf().link_fk()
        fk_ref = arm.link_fk({"shoulder": off})
        np.testing.assert_allclose(fk_off["fore"], fk_ref["fore"], atol=1e-9)

    def test_unknown_joint_raises(self, arm):
        with pytest.raises(KeyError, match="Unknown joint"):
            URDFModifier(arm).set_joint_origin("nope", xyz=[0, 0, 0])


class TestLinkEdits:
    def test_scale_masses(self, arm):
        mod = URDFModifier(arm)
        m0 = arm.robot.link_map["upper"].inertial.mass
        mod.scale_masses(2.5)
        assert mod.robot.link_map["upper"].inertial.mass == pytest.approx(2.5 * m0)
        # inertia scales with the mass
        I0 = arm.robot.link_map["upper"].inertial.inertia
        np.testing.assert_allclose(
            mod.robot.link_map["upper"].inertial.inertia, 2.5 * I0
        )

    def test_scale_masses_changes_gravity_torque(self, arm):
        import jax.numpy as jnp

        from manipulapy_tpu.dynamics import gravity_forces

        mod = URDFModifier(arm)
        mod.scale_masses(2.0)
        m1 = arm.to_robot_model(dtype=jnp.float64)
        m2 = mod.modified_urdf().to_robot_model(dtype=jnp.float64)
        q = jnp.asarray([0.3, -0.4])
        g1 = gravity_forces(m1, q)
        g2 = gravity_forces(m2, q)
        np.testing.assert_allclose(np.asarray(g2), 2.0 * np.asarray(g1), atol=1e-9)

    def test_attach_payload_mass_and_com(self, arm):
        mod = URDFModifier(arm)
        l = arm.robot.link_map["fore"].inertial
        m0, c0 = l.mass, l.origin.xyz.copy()
        mod.attach_payload("fore", mass=1.0, com_offset=(0.3, 0.0, 0.0))
        li = mod.robot.link_map["fore"].inertial
        assert li.mass == pytest.approx(m0 + 1.0)
        expected_c = (m0 * c0 + 1.0 * np.array([0.3, 0.0, 0.0])) / (m0 + 1.0)
        np.testing.assert_allclose(li.origin.xyz, expected_c, atol=1e-12)
        # parallel-axis: combined inertia is PSD and >= the original about
        # the new CoM in the trace sense
        assert np.all(np.linalg.eigvalsh(li.inertia) >= -1e-12)

    def test_set_link_com_and_inertia(self, arm):
        mod = URDFModifier(arm)
        mod.set_link_com("upper", [0.1, 0.0, 0.05])
        mod.set_link_inertia("upper", np.diag([0.1, 0.2, 0.3]))
        li = mod.robot.link_map["upper"].inertial
        np.testing.assert_allclose(li.origin.xyz, [0.1, 0.0, 0.05])
        np.testing.assert_allclose(li.inertia, np.diag([0.1, 0.2, 0.3]))


class TestRenamesAndExport:
    def test_rename_link_updates_joints(self, arm):
        mod = URDFModifier(arm)
        mod.rename_link("fore", "forearm")
        assert "forearm" in mod.robot.link_map and "fore" not in mod.robot.link_map
        assert mod.robot.joint_map["elbow"].child == "forearm"
        fk = mod.modified_urdf().link_fk()
        np.testing.assert_allclose(fk["forearm"][:3, 3], [0.4, 0.0, 0.1], atol=1e-12)

    def test_rename_joint_collision_raises(self, arm):
        mod = URDFModifier(arm)
        with pytest.raises(ValueError, match="already exists"):
            mod.rename_joint("shoulder", "elbow")

    def test_xml_roundtrip_preserves_fk(self, arm, tmp_path):
        mod = URDFModifier(arm)
        mod.set_joint_origin("shoulder", xyz=[0.0, 0.0, 0.25])
        mod.set_link_mass("upper", 3.0)
        path = os.path.join(tmp_path, "edited.urdf")
        mod.save(path)
        re = URDF.load(path)
        fk = re.link_fk({"shoulder": 0.5, "elbow": -0.3})
        fk2 = mod.modified_urdf().link_fk({"shoulder": 0.5, "elbow": -0.3})
        np.testing.assert_allclose(fk["fore"], fk2["fore"], atol=1e-9)
        assert re.robot.link_map["upper"].inertial.mass == pytest.approx(3.0)

    def test_calibration_roundtrip(self, arm, tmp_path):
        mod = URDFModifier(arm)
        mod.set_joint_origin("elbow", xyz=[0.45, 0.0, 0.0])
        mod.set_link_mass("fore", 0.8)
        mod.set_joint_zero_offset("shoulder", 0.1)
        cal_path = os.path.join(tmp_path, "cal.json")
        mod.save_calibration(cal_path)
        cal = json.load(open(cal_path))
        assert cal["zero_offsets"] == {"shoulder": 0.1}
        assert "elbow" in cal["joints"] and "fore" in cal["links"]
        # load into a FRESH modifier over the pristine source
        mod2 = URDFModifier(arm)
        mod2.load_calibration(cal_path)
        fk_a = mod.modified_urdf().link_fk()
        fk_b = mod2.modified_urdf().link_fk()
        np.testing.assert_allclose(fk_a["fore"], fk_b["fore"], atol=1e-9)

    def test_source_document_untouched(self, arm):
        mod = URDFModifier(arm)
        mod.set_link_mass("upper", 99.0)
        assert arm.robot.link_map["upper"].inertial.mass != 99.0


class TestProfiling:
    def test_monitor_counts_and_averages(self):
        mon = PerformanceMonitor()
        with mon.time_op("fk"):
            pass
        with mon.time_op("fk"):
            pass
        mon.record("ik", 0.5)
        stats = mon.get_performance_stats()
        assert stats["fk"]["calls"] == 2
        assert stats["ik"]["calls"] == 1
        assert stats["ik"]["total_time_s"] == pytest.approx(0.5)
        assert stats["ik"]["avg_time_s"] == pytest.approx(0.5)

    def test_monitor_reset(self):
        mon = PerformanceMonitor()
        mon.record("x", 1.0)
        mon.reset()
        assert mon.get_performance_stats() == {}

    def test_benchmark_fn_shape(self):
        import jax.numpy as jnp

        out = benchmark_fn(lambda x: x * 2.0, jnp.ones(16), warmup=1, iters=4)
        assert set(out) == {
            "avg_time_ms", "min_time_ms", "max_time_ms", "std_time_ms",
            "median_time_ms", "iterations",
        }
        assert out["iterations"] == 4
        assert out["min_time_ms"] <= out["avg_time_ms"] <= out["max_time_ms"]
