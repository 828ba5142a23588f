"""Extended potential-field tests, mirroring the coverage classes of the
reference's ``test_potential_field_coverage.py`` /
``test_potential_field_extended.py`` (51 tests upstream): gradient
consistency with the potential, influence-boundary behavior, overlap
escape, batching, and the Cartesian fused field."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manipulapy_tpu import potential_field as pf
from manipulapy_tpu.models import catalog


class TestAttractive:
    def test_quadratic_scaling(self):
        q = jnp.asarray([1.0, 2.0])
        g = jnp.zeros(2)
        u1 = pf.attractive_potential(q, g, k_att=1.0)
        u2 = pf.attractive_potential(2 * q, g, k_att=1.0)
        assert float(u2) == pytest.approx(4.0 * float(u1))
        assert float(pf.attractive_potential(g, g)) == 0.0

    def test_gradient_is_autodiff_of_potential(self):
        q = jnp.asarray([0.4, -0.7, 0.2])
        goal = jnp.asarray([1.0, 0.0, -0.5])
        auto = jax.grad(lambda qq: pf.attractive_potential(qq, goal, k_att=2.5))(q)
        analytic = pf.potential_gradient(q, goal, k_att=2.5)
        np.testing.assert_allclose(np.asarray(auto), np.asarray(analytic), atol=1e-12)


class TestRepulsive:
    def test_zero_outside_influence(self):
        q = jnp.asarray([5.0, 0.0])
        obs = jnp.asarray([[0.0, 0.0]])
        assert float(pf.repulsive_potential(q, obs, d0=0.5)) == 0.0
        g = pf.potential_gradient(q, jnp.asarray([5.0, 0.0]), obs, d0=0.5)
        np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-12)

    def test_monotone_increase_approaching_obstacle(self):
        obs = jnp.asarray([[0.0, 0.0]])
        ds = [0.4, 0.3, 0.2, 0.1, 0.05]
        us = [float(pf.repulsive_potential(jnp.asarray([d, 0.0]), obs, d0=0.5)) for d in ds]
        assert all(b > a for a, b in zip(us, us[1:]))

    def test_continuous_at_influence_boundary(self):
        obs = jnp.asarray([[0.0, 0.0]])
        u_in = float(pf.repulsive_potential(jnp.asarray([0.5 - 1e-7, 0.0]), obs, d0=0.5))
        u_out = float(pf.repulsive_potential(jnp.asarray([0.5 + 1e-7, 0.0]), obs, d0=0.5))
        assert u_out == 0.0
        assert u_in == pytest.approx(0.0, abs=1e-9)

    def test_gradient_pushes_away_from_obstacle(self):
        q = jnp.asarray([0.2, 0.0])
        obs = jnp.asarray([[0.0, 0.0]])
        goal = q  # no attractive term
        g = pf.potential_gradient(q, goal, obs, d0=0.5)
        # gradient-descent motion -g points AWAY from the obstacle (+x)
        assert float(-g[0]) > 0.0
        assert float(g[1]) == pytest.approx(0.0, abs=1e-12)

    def test_gradient_matches_autodiff_inside_influence(self):
        """The analytic repulsive gradient uses the reference's 40x
        factor (2x the autodiff of the 20x potential) — pin the exact
        deliberate relationship rather than blind agreement."""
        q = jnp.asarray([0.21, 0.07])
        goal = jnp.asarray([0.21, 0.07])
        obs = jnp.asarray([[0.0, 0.0]])
        auto = jax.grad(
            lambda qq: pf.repulsive_potential(qq, obs, k_rep=1.0, d0=0.5)
        )(q)
        analytic = pf.potential_gradient(q, goal, obs, k_rep=1.0, d0=0.5)
        np.testing.assert_allclose(np.asarray(analytic), np.asarray(auto), atol=1e-9)

    def test_exact_overlap_uses_escape_direction(self):
        q = jnp.zeros(2)
        obs = jnp.asarray([[0.0, 0.0]])
        g = pf.potential_gradient(q, jnp.zeros(2), obs)
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(g[0]) < 0.0  # fixed -x escape like the reference

    def test_multiple_obstacles_superpose(self):
        q = jnp.asarray([0.2, 0.0])
        goal = q
        o1 = jnp.asarray([[0.0, 0.0]])
        o2 = jnp.asarray([[0.4, 0.0]])
        both = jnp.concatenate([o1, o2])
        g1 = pf.potential_gradient(q, goal, o1)
        g2 = pf.potential_gradient(q, goal, o2)
        g12 = pf.potential_gradient(q, goal, both)
        np.testing.assert_allclose(np.asarray(g12), np.asarray(g1 + g2), atol=1e-9)


class TestBatching:
    def test_batched_matches_loop(self):
        rng = np.random.default_rng(0)
        Q = jnp.asarray(rng.uniform(-1, 1, (32, 3)))
        goal = jnp.asarray([0.5, 0.5, 0.5])
        obs = jnp.asarray(rng.uniform(-1, 1, (5, 3)))
        batched = pf.potential_gradient(Q, goal, obs)
        for i in range(0, 32, 7):
            single = pf.potential_gradient(Q[i], goal, obs)
            np.testing.assert_allclose(
                np.asarray(batched[i]), np.asarray(single), atol=1e-9
            )

    def test_jit_vmap_compose(self):
        goal = jnp.zeros(3)
        obs = jnp.asarray([[0.2, 0.0, 0.0]])
        f = jax.jit(jax.vmap(lambda q: pf.potential_gradient(q, goal, obs)))
        out = f(jnp.ones((16, 3)) * 0.1)
        assert out.shape == (16, 3)
        assert bool(jnp.all(jnp.isfinite(out)))


class TestCartesianFused:
    def test_gradient_is_autodiff_of_potential(self):
        p = jnp.asarray([0.3, 0.1, 0.2])
        goal = jnp.asarray([1.0, 0.0, 0.0])
        obs = jnp.asarray([[0.25, 0.1, 0.2], [2.0, 2.0, 2.0]])

        def U_of(pp):
            U, _ = pf.cartesian_potential_field(pp, goal, obs)
            return U

        auto = jax.grad(U_of)(p)
        _, g = pf.cartesian_potential_field(p, goal, obs)
        np.testing.assert_allclose(np.asarray(auto), np.asarray(g), atol=1e-9)

    def test_far_field_is_pure_attraction(self):
        p = jnp.asarray([3.0, 0.0, 0.0])
        goal = jnp.zeros(3)
        obs = jnp.asarray([[0.0, 5.0, 0.0]])
        U, g = pf.cartesian_potential_field(p, goal, obs)
        assert float(U) == pytest.approx(4.5)
        np.testing.assert_allclose(np.asarray(g), [3.0, 0.0, 0.0], atol=1e-12)

    def test_batch_shape_contract(self):
        P = jnp.ones((10, 4, 3)) * 0.3
        goal = jnp.zeros(3)
        obs = jnp.zeros((2, 3))
        U, g = pf.cartesian_potential_field(P, goal, obs)
        assert U.shape == (10, 4) and g.shape == (10, 4, 3)


class TestCollisionHelpers:
    @pytest.fixture(scope="class")
    def ur5(self):
        return catalog.ur5(dtype=jnp.float64)

    def test_link_positions_shape_and_reach(self, ur5):
        q = jnp.zeros(6)
        P = pf.link_positions(ur5, q)
        assert P.shape == (6, 3)
        assert float(jnp.linalg.norm(P, axis=1).max()) < 1.2  # inside reach

    def test_default_spheres_cover_links(self, ur5):
        s = pf.default_link_spheres(ur5, radius=0.1)
        assert s.radii.shape == (6,)
        assert bool(jnp.all(s.radii == 0.1))

    def test_obstacle_clearance_sign(self, ur5):
        q = jnp.zeros(6)
        spheres = pf.default_link_spheres(ur5)
        P = pf.link_positions(ur5, q)
        on_link = P[2]  # obstacle exactly at a link center
        clear_hit = pf.obstacle_clearance(ur5, q, spheres, on_link[None])
        assert float(np.asarray(clear_hit).min()) < 0  # penetration
        far = jnp.asarray([[10.0, 10.0, 10.0]])
        clear_far = pf.obstacle_clearance(ur5, q, spheres, far)
        assert float(np.asarray(clear_far).min()) > 5.0  # everything clear
