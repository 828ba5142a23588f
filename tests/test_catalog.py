"""Catalog sanity tests — physical plausibility checks that are
independent of the oracle (the oracle reads model arrays back, so it
cannot catch model-construction bugs like screw-layout transposition)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manipulapy_tpu import kinematics
from manipulapy_tpu.models import catalog
from manipulapy_tpu.models.robot import make_robot_model


# Total kinematic reach from the base origin (link lengths + frame
# offsets, small margin): UR5 ~ H1+L1+L2+|W1+W2,H2| ~ 1.03.
REACH = {"ur5": 1.1, "panda": 1.3, "two_link_planar": 2.01}


class TestCatalogSanity:
    @pytest.mark.parametrize("name", ["ur5", "panda", "two_link_planar"])
    def test_reach_bounded(self, name):
        """No configuration may place the EE beyond the arm's total reach —
        catches screw-layout corruption that self-consistent oracle tests
        cannot see. Pinned to the programmatic factories (the calibrated
        URDF catalog has its own sanity tests in test_robot_data.py)."""
        model = catalog.get_robot(name, source="programmatic", dtype=jnp.float64)
        rng = np.random.default_rng(0)
        qs = jnp.asarray(rng.uniform(-np.pi, np.pi, size=(256, model.num_joints)))
        ps = jax.vmap(lambda q: kinematics.forward_kinematics(model, q)[:3, 3])(qs)
        r = np.linalg.norm(np.asarray(ps), axis=-1)
        assert r.max() <= REACH[name], f"{name}: reach {r.max():.3f} exceeds bound"

    @pytest.mark.parametrize("name", ["ur5", "panda"])
    def test_screws_are_unit_revolute(self, name):
        model = catalog.get_robot(name, source="programmatic", dtype=jnp.float64)
        w = np.asarray(model.screws_space)[:, :3]
        np.testing.assert_allclose(np.linalg.norm(w, axis=-1), 1.0, atol=1e-12)

    def test_ur5_home_pose(self):
        """Textbook UR5 home: EE at (L1+L2, W1+W2, H1-H2)."""
        model = catalog.ur5(dtype=jnp.float64)
        T = np.asarray(kinematics.forward_kinematics(model, jnp.zeros(6)))
        np.testing.assert_allclose(T[:3, 3], [0.817, 0.191, -0.006], atol=1e-12)

    def test_ur5_base_rotation(self):
        """Rotating only the base yaw joint spins the EE about z: radius
        and height are preserved."""
        model = catalog.ur5(dtype=jnp.float64)
        T0 = np.asarray(kinematics.forward_kinematics(model, jnp.zeros(6)))
        q = jnp.asarray([np.pi / 2, 0, 0, 0, 0, 0])
        T1 = np.asarray(kinematics.forward_kinematics(model, q))
        np.testing.assert_allclose(
            np.hypot(T1[0, 3], T1[1, 3]), np.hypot(T0[0, 3], T0[1, 3]), atol=1e-12
        )
        np.testing.assert_allclose(T1[2, 3], T0[2, 3], atol=1e-12)

    def test_square_layout_requires_explicit_flag(self):
        """(6, 6) screw arrays must not be silently transposed."""
        S_rows = np.asarray(catalog.ur5(dtype=jnp.float64).screws_space)
        M = np.asarray(catalog.ur5(dtype=jnp.float64).home)
        m_rows = make_robot_model(M, S_rows, dtype=jnp.float64)
        m_cols = make_robot_model(M, S_rows.T, layout="cols", dtype=jnp.float64)
        np.testing.assert_allclose(
            np.asarray(m_rows.screws_space), np.asarray(m_cols.screws_space)
        )
        with pytest.raises(ValueError, match="layout"):
            make_robot_model(M, S_rows[:, :5], dtype=jnp.float64)

    def test_registry(self):
        assert "ur5" in catalog.list_robots()
        with pytest.raises(KeyError):
            catalog.get_robot("nonexistent")
        catalog.register_robot("test_chain", lambda **kw: catalog.serial_chain(4, **kw))
        assert catalog.get_robot("test_chain").num_joints == 4
