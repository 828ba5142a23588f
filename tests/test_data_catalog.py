"""Bundled-robot data catalog tests (reference: ManipulaPy_data registry,
``ManipulaPy_data/__init__.py:317-592``)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from manipulapy_tpu.kinematics import forward_kinematics
from manipulapy_tpu.dynamics import mass_matrix
from manipulapy_tpu.models import catalog, data
from manipulapy_tpu.urdf import URDF, validate


class TestRegistry:
    def test_at_least_25_robots(self):
        assert len(data.list_robots()) >= 25

    def test_get_robots_by_dof(self):
        sixes = data.get_robots_by_dof(6)
        sevens = data.get_robots_by_dof(7)
        assert "ur5" in sixes and "irb120" in sixes
        assert "panda" in sevens and "iiwa14" in sevens
        assert not set(sixes) & set(sevens)

    def test_get_robot_info(self):
        info = data.get_robot_info("ur10")
        assert info.manufacturer == "Universal Robots"
        assert info.dof == 6

    def test_unknown_robot_raises(self):
        with pytest.raises(KeyError, match="Unknown robot"):
            data.get_robot_urdf("terminator")

    def test_print_catalog_runs(self, capsys):
        data.print_robot_catalog()
        out = capsys.readouterr().out
        assert "ur5" in out and "Franka" in out

    def test_catalog_get_robot_falls_through(self):
        m = catalog.get_robot("iiwa14", dtype=jnp.float64)
        assert m.num_joints == 7
        assert "iiwa14" in catalog.list_robots()


class TestURDFGeneration:
    def test_urdf_file_materialized(self, tmp_path):
        path = data.get_robot_urdf("ur5", directory=str(tmp_path))
        assert os.path.exists(path)
        urdf = URDF.load(path)
        assert len(urdf.actuated_joints) == 6

    @pytest.mark.parametrize("name", data.list_robots())
    def test_every_robot_validates_and_builds(self, name):
        spec = data.get_robot_info(name)
        urdf = URDF.from_string(data.robot_urdf_string(name))
        res = validate(urdf.robot)
        assert res.is_valid, [str(i) for i in res.errors]
        m = urdf.to_robot_model(tip_link="tool0", dtype=jnp.float64)
        assert m.num_joints == spec.dof
        T = forward_kinematics(m, jnp.zeros(spec.dof, dtype=jnp.float64))
        assert np.isfinite(np.asarray(T)).all()

    def test_ur5_reach_bound(self):
        """Workspace radius bounded by the physical reach — the invariant
        that catches transposed screw matrices."""
        m = data.load_robot("ur5", dtype=jnp.float64)
        rng = np.random.default_rng(0)
        for _ in range(10):
            q = jnp.asarray(rng.uniform(-np.pi, np.pi, 6))
            p = np.asarray(forward_kinematics(m, q)[:3, 3])
            assert np.linalg.norm(p) <= 1.0

    def test_mass_matrix_spd(self):
        for name in ("ur5", "panda", "lrmate200id"):
            m = data.load_robot(name, dtype=jnp.float64)
            q = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, m.num_joints))
            M = np.asarray(mass_matrix(m, q))
            np.testing.assert_allclose(M, M.T, atol=1e-12)
            assert np.linalg.eigvalsh(M).min() > 0

    def test_ur_family_shares_structure_not_geometry(self):
        """UR3 and UR10 have the same joint layout but different reach."""
        m3 = data.load_robot("ur3", dtype=jnp.float64)
        m10 = data.load_robot("ur10", dtype=jnp.float64)
        p3 = np.asarray(forward_kinematics(m3, jnp.zeros(6))[:3, 3])
        p10 = np.asarray(forward_kinematics(m10, jnp.zeros(6))[:3, 3])
        assert np.linalg.norm(p10) > 2 * np.linalg.norm(p3)
