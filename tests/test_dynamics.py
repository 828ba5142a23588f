"""Dynamics parity tests.

Gates (SURVEY.md sections 6-7): mass-matrix symmetry <= ~1e-14,
forward-inverse consistency <= ~1e-12, oracle torque parity (bounding the
reference's FD-noise floor), and exact agreement between the Lagrangian
formulation and the O(n) RNEA path.

All JAX entry points are jitted once at module scope (compile-once /
run-many; see note in test_kinematics.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from manipulapy_tpu import dynamics

G_VEC = jnp.asarray([0.0, 0.0, -9.81])

mass_b = jax.jit(jax.vmap(dynamics.mass_matrix, in_axes=(None, 0)))
grav_b = jax.jit(jax.vmap(lambda m, q: dynamics.gravity_forces(m, q, G_VEC), in_axes=(None, 0)))
cor_b = jax.jit(jax.vmap(dynamics.coriolis_forces, in_axes=(None, 0, 0)))
invdyn_b = jax.jit(
    jax.vmap(
        lambda m, q, dq, ddq, f: dynamics.inverse_dynamics(m, q, dq, ddq, G_VEC, f),
        in_axes=(None, 0, 0, 0, 0),
    )
)
rnea_b = jax.jit(
    jax.vmap(
        lambda m, q, dq, ddq, f: dynamics.rnea(m, q, dq, ddq, G_VEC, f),
        in_axes=(None, 0, 0, 0, 0),
    )
)
fwd_b = jax.jit(
    jax.vmap(lambda m, q, dq, tau: dynamics.forward_dynamics(m, q, dq, tau, G_VEC), in_axes=(None, 0, 0, 0))
)
fwd_fast_b = jax.jit(
    jax.vmap(
        lambda m, q, dq, tau: dynamics.forward_dynamics_fast(m, q, dq, tau, G_VEC),
        in_axes=(None, 0, 0, 0),
    )
)


def rand_states(rng, b, n):
    return (
        jnp.asarray(rng.uniform(-np.pi, np.pi, (b, n))),
        jnp.asarray(rng.uniform(-1.0, 1.0, (b, n))),
        jnp.asarray(rng.uniform(-2.0, 2.0, (b, n))),
    )


class TestMassMatrix:
    def test_matches_oracle(self, ur5):
        S, Mc, G, _ = oracle.model_arrays(ur5)
        rng = np.random.default_rng(0)
        qs, _, _ = rand_states(rng, 8, 6)
        Ms = np.asarray(mass_b(ur5, qs))
        for i in range(8):
            np.testing.assert_allclose(
                Ms[i], oracle.mass_matrix(S, Mc, G, np.asarray(qs[i])), atol=1e-11
            )

    def test_symmetry_and_pd(self, ur5):
        """Symmetry <= ~1e-13 (reference reports 2.1e-14) and positive
        definiteness over a batch."""
        rng = np.random.default_rng(1)
        qs, _, _ = rand_states(rng, 32, 6)
        Ms = np.asarray(mass_b(ur5, qs))
        assert np.max(np.abs(Ms - np.swapaxes(Ms, -1, -2))) < 1e-13
        assert np.linalg.eigvalsh(Ms).min() > 0


class TestGravity:
    def test_matches_oracle(self, ur5):
        S, Mc, G, _ = oracle.model_arrays(ur5)
        rng = np.random.default_rng(4)
        qs, _, _ = rand_states(rng, 8, 6)
        got = np.asarray(grav_b(ur5, qs))
        g = np.array([0.0, 0.0, -9.81])
        for i in range(8):
            np.testing.assert_allclose(
                got[i], oracle.gravity_forces(S, Mc, G, np.asarray(qs[i]), g), atol=1e-11
            )

    def test_zero_gravity(self, ur5):
        q = jnp.asarray([0.3, -0.4, 0.8, 0.1, -0.9, 0.2])
        f = jax.jit(dynamics.gravity_forces)
        np.testing.assert_allclose(np.asarray(f(ur5, q, jnp.zeros(3))), 0.0, atol=1e-14)


class TestCoriolis:
    def test_matches_oracle_fd(self, ur5):
        """Exact autodiff Christoffels vs the oracle's central-FD (the
        reference's own method, eps=1e-6)."""
        S, Mc, G, _ = oracle.model_arrays(ur5)
        rng = np.random.default_rng(5)
        qs, dqs, _ = rand_states(rng, 4, 6)
        got = np.asarray(cor_b(ur5, qs, dqs))
        for i in range(4):
            ref = oracle.coriolis_fd(S, Mc, G, np.asarray(qs[i]), np.asarray(dqs[i]))
            np.testing.assert_allclose(got[i], ref, atol=1e-6)

    def test_zero_velocity_and_quadratic_scaling(self, ur5):
        q = jnp.asarray([[0.5, -0.2, 0.7, -0.1, 0.4, 0.9]] * 3)
        dq0 = jnp.asarray([0.5, -0.3, 0.2, 0.8, -0.1, 0.4])
        dqs = jnp.stack([jnp.zeros(6), dq0, 2.0 * dq0])
        c = np.asarray(cor_b(ur5, q, dqs))
        np.testing.assert_allclose(c[0], 0.0, atol=1e-14)
        np.testing.assert_allclose(c[2], 4.0 * c[1], atol=1e-10)


class TestInverseDynamics:
    def test_matches_oracle(self, ur5):
        S, Mc, G, _ = oracle.model_arrays(ur5)
        rng = np.random.default_rng(6)
        qs, dqs, ddqs = rand_states(rng, 3, 6)
        fts = jnp.asarray(rng.uniform(-5, 5, (3, 6)))
        got = np.asarray(invdyn_b(ur5, qs, dqs, ddqs, fts))
        g = np.array([0.0, 0.0, -9.81])
        for i in range(3):
            ref = oracle.inverse_dynamics(
                S, Mc, G, np.asarray(qs[i]), np.asarray(dqs[i]), np.asarray(ddqs[i]), g,
                np.asarray(fts[i]),
            )
            np.testing.assert_allclose(got[i], ref, atol=1e-6)

    @pytest.mark.slow
    def test_forward_inverse_consistency(self, ur5):
        """fd(id(ddq)) == ddq — reference reports 1.8e-12."""
        rng = np.random.default_rng(7)
        qs, dqs, ddqs = rand_states(rng, 8, 6)
        taus = invdyn_b(ur5, qs, dqs, ddqs, jnp.zeros((8, 6)))
        ddq2 = fwd_b(ur5, qs, dqs, taus)
        np.testing.assert_allclose(np.asarray(ddq2), np.asarray(ddqs), atol=1e-10)


class TestRNEA:
    def test_rnea_matches_lagrangian(self, ur5):
        """The O(n) Newton-Euler path and the Jacobian/Christoffel path are
        the same physics: near machine-precision agreement."""
        rng = np.random.default_rng(8)
        qs, dqs, ddqs = rand_states(rng, 8, 6)
        fts = jnp.asarray(rng.uniform(-5, 5, (8, 6)))
        tau_rnea = np.asarray(rnea_b(ur5, qs, dqs, ddqs, fts))
        tau_lag = np.asarray(invdyn_b(ur5, qs, dqs, ddqs, fts))
        np.testing.assert_allclose(tau_rnea, tau_lag, atol=1e-9)

    def test_rnea_gravity_only(self, ur5):
        qs = jnp.asarray([[0.3, -0.8, 1.2, 0.1, -0.4, 0.6]])
        zero = jnp.zeros((1, 6))
        np.testing.assert_allclose(
            np.asarray(rnea_b(ur5, qs, zero, zero, jnp.zeros((1, 6)))),
            np.asarray(grav_b(ur5, qs)),
            atol=1e-10,
        )

    def test_bias_forces(self, ur5):
        q = jnp.asarray([[0.2, -0.5, 0.9, -0.3, 0.7, 0.1]])
        dq = jnp.asarray([[0.4, 0.2, -0.6, 0.8, -0.2, 0.5]])
        h = np.asarray(
            jax.jit(jax.vmap(lambda m, a, b: dynamics.bias_forces(m, a, b, G_VEC), in_axes=(None, 0, 0)))(
                ur5, q, dq
            )
        )
        expected = np.asarray(cor_b(ur5, q, dq)) + np.asarray(grav_b(ur5, q))
        np.testing.assert_allclose(h, expected, atol=1e-9)

    @pytest.mark.slow
    def test_forward_dynamics_fast(self, ur5):
        rng = np.random.default_rng(10)
        qs, dqs, _ = rand_states(rng, 4, 6)
        taus = jnp.asarray(rng.uniform(-20, 20, (4, 6)))
        np.testing.assert_allclose(
            np.asarray(fwd_fast_b(ur5, qs, dqs, taus)),
            np.asarray(fwd_b(ur5, qs, dqs, taus)),
            atol=1e-9,
        )


class TestEnergy:
    @pytest.mark.slow
    def test_energy_conservation(self, ur5):
        """Unforced, zero-gravity RK4 rollout conserves kinetic energy
        (reference reports 1.3e-11)."""
        q = jnp.asarray([0.1, -0.3, 0.5, 0.2, -0.1, 0.4])
        dq = jnp.asarray([0.3, 0.1, -0.2, 0.05, 0.15, -0.1])
        zero_g = jnp.zeros(3)
        tau = jnp.zeros(6)
        dt = 1e-3

        def deriv(q, dq):
            return dq, dynamics.forward_dynamics_fast(ur5, q, dq, tau, zero_g)

        def rk4_step(carry, _):
            q, dq = carry
            k1q, k1v = deriv(q, dq)
            k2q, k2v = deriv(q + 0.5 * dt * k1q, dq + 0.5 * dt * k1v)
            k3q, k3v = deriv(q + 0.5 * dt * k2q, dq + 0.5 * dt * k2v)
            k4q, k4v = deriv(q + dt * k3q, dq + dt * k3v)
            return (
                q + dt / 6 * (k1q + 2 * k2q + 2 * k3q + k4q),
                dq + dt / 6 * (k1v + 2 * k2v + 2 * k3v + k4v),
            ), None

        @jax.jit
        def run(q, dq):
            (qf, dqf), _ = jax.lax.scan(rk4_step, (q, dq), None, length=100)
            return qf, dqf

        def energy(q, dq):
            return 0.5 * dq @ dynamics.mass_matrix(ur5, q) @ dq

        e0 = float(jax.jit(energy)(q, dq))
        qf, dqf = run(q, dq)
        e1 = float(jax.jit(energy)(qf, dqf))
        assert abs(e1 - e0) / max(abs(e0), 1e-12) < 1e-8


class TestMultiDof:
    @pytest.mark.parametrize("n", [3, 7, 9])
    @pytest.mark.slow
    def test_consistency_across_dof(self, n):
        from manipulapy_tpu.models import catalog

        model = catalog.serial_chain(n, dtype=jnp.float64)
        rng = np.random.default_rng(n)
        q, dq, ddq = (jnp.asarray(rng.uniform(-1, 1, (1, n))) for _ in range(3))
        f0 = jnp.zeros((1, n))
        tau_rnea = np.asarray(rnea_b(model, q, dq, ddq, jnp.zeros((1, 6))))
        tau_lag = np.asarray(invdyn_b(model, q, dq, ddq, jnp.zeros((1, 6))))
        np.testing.assert_allclose(tau_rnea, tau_lag, atol=1e-9)
