"""Kinematics parity tests: framework vs the independent NumPy oracle and
vs the reference's documented invariants (SURVEY.md section 6: FK
consistency ~1e-15, Jacobian-vs-numerical max ~5e-13).

Structure note: every JAX entry point is jitted once at module level and
called on batches — compile-once/run-many keeps the suite fast on the
2-vCPU CI host (eager dispatch there is prohibitively slow) and exercises
the code the way production uses it.
"""

import jax
import jax.numpy as jnp
import numpy as np

import oracle
from manipulapy_tpu import kinematics
from manipulapy_tpu.core import lie

fk_batch = jax.jit(jax.vmap(kinematics.forward_kinematics, in_axes=(None, 0)))
fk_body_batch = jax.jit(
    jax.vmap(lambda m, q: kinematics.forward_kinematics(m, q, "body"), in_axes=(None, 0))
)
jac_batch = jax.jit(jax.vmap(kinematics.jacobian, in_axes=(None, 0)))
jac_body_batch = jax.jit(
    jax.vmap(lambda m, q: kinematics.jacobian(m, q, "body"), in_axes=(None, 0))
)
prefix_batch = jax.jit(jax.vmap(kinematics.link_prefix_transforms, in_axes=(None, 0)))
com_batch = jax.jit(jax.vmap(kinematics.com_transforms, in_axes=(None, 0)))


def rand_qs(rng, b, n):
    return jnp.asarray(rng.uniform(-np.pi, np.pi, size=(b, n)))


class TestForwardKinematics:
    def test_home_configuration(self, ur5):
        T = np.asarray(fk_batch(ur5, jnp.zeros((1, 6)))[0])
        np.testing.assert_allclose(T, np.asarray(ur5.home), atol=1e-14)

    def test_matches_oracle(self, ur5):
        S, Mc, G, M = oracle.model_arrays(ur5)
        rng = np.random.default_rng(0)
        qs = rand_qs(rng, 16, 6)
        Ts = np.asarray(fk_batch(ur5, qs))
        for i in range(16):
            np.testing.assert_allclose(
                Ts[i], oracle.fk_space(S, M, np.asarray(qs[i])), atol=1e-12
            )

    def test_space_body_agree(self, ur5):
        """T_space(q) == T_body(q) — the PoE identity."""
        rng = np.random.default_rng(1)
        qs = rand_qs(rng, 8, 6)
        np.testing.assert_allclose(
            np.asarray(fk_batch(ur5, qs)), np.asarray(fk_body_batch(ur5, qs)), atol=1e-12
        )

    def test_planar_2r_analytic(self, planar2):
        q = np.array([[0.3, -0.7]])
        T = np.asarray(fk_batch(planar2, jnp.asarray(q))[0])
        x = np.cos(0.3) + np.cos(0.3 - 0.7)
        y = np.sin(0.3) + np.sin(0.3 - 0.7)
        np.testing.assert_allclose(T[:3, 3], [x, y, 0.0], atol=1e-14)

    def test_fk_repeatability(self, ur5):
        """Reference reports FK consistency 2.3e-15 (Benchmark/README)."""
        q = jnp.asarray([[0.1, -0.5, 0.8, 0.2, -0.3, 1.1]])
        np.testing.assert_array_equal(np.asarray(fk_batch(ur5, q)), np.asarray(fk_batch(ur5, q)))


class TestJacobian:
    def test_matches_oracle(self, ur5):
        S, Mc, G, M = oracle.model_arrays(ur5)
        rng = np.random.default_rng(3)
        qs = rand_qs(rng, 8, 6)
        Js = np.asarray(jac_batch(ur5, qs))
        for i in range(8):
            np.testing.assert_allclose(
                Js[i], oracle.jacobian_space(S, np.asarray(qs[i])), atol=1e-12
            )

    def test_vs_numerical_differentiation(self, ur5):
        """Space Jacobian vs FD of the FK twist (reference gate ~5e-13,
        loosened for the FD step)."""
        rng = np.random.default_rng(4)
        q = rng.uniform(-np.pi, np.pi, 6)
        h = 1e-7
        # Batch all 12 perturbed configs + the base config in one call.
        qs = np.tile(q, (13, 1))
        for i in range(6):
            qs[2 * i + 1, i] += h
            qs[2 * i + 2, i] -= h
        Ts = np.asarray(fk_batch(ur5, jnp.asarray(qs)))
        J = np.asarray(jac_batch(ur5, jnp.asarray(q[None]))[0])
        for i in range(6):
            rel = Ts[2 * i + 1] @ np.linalg.inv(Ts[2 * i + 2])
            twist = np.asarray(lie.se3_log(jnp.asarray(rel[None]))[0]) / (2 * h)
            np.testing.assert_allclose(J[:, i], twist, atol=1e-5)

    def test_body_jacobian_adjoint_relation(self, ur5):
        """J_b = Ad(T_ee^-1) J_s."""
        rng = np.random.default_rng(5)
        qs = rand_qs(rng, 4, 6)
        Js = jac_batch(ur5, qs)
        Jb = jac_body_batch(ur5, qs)
        Ts = fk_batch(ur5, qs)
        Ad = lie.adjoint(lie.trans_inv(Ts))
        np.testing.assert_allclose(np.asarray(Ad @ Js), np.asarray(Jb), atol=1e-11)

    def test_ee_velocity_and_joint_velocity(self, ur5):
        q = jnp.asarray([0.2, -0.6, 1.0, 0.1, 0.7, -0.4])
        dq = jnp.asarray([0.5, -0.1, 0.2, 0.0, 0.3, -0.2])
        f = jax.jit(kinematics.end_effector_velocity, static_argnames=("frame",))
        V = f(ur5, q, dq)
        J = np.asarray(jac_batch(ur5, q[None])[0])
        np.testing.assert_allclose(np.asarray(V), J @ np.asarray(dq), atol=1e-12)
        g = jax.jit(kinematics.joint_velocity, static_argnames=("frame",))
        dq2 = g(ur5, q, V)
        np.testing.assert_allclose(J @ np.asarray(dq2), np.asarray(V), atol=1e-9)


class TestPrefixTransforms:
    def test_prefix_consistency(self, ur5):
        S, Mc, G, M = oracle.model_arrays(ur5)
        rng = np.random.default_rng(5)
        q = rng.uniform(-np.pi, np.pi, 6)
        P = np.asarray(prefix_batch(ur5, jnp.asarray(q[None]))[0])
        np.testing.assert_allclose(P[0], np.eye(4), atol=1e-15)
        np.testing.assert_allclose(P[6] @ M, oracle.fk_space(S, M, q), atol=1e-12)
        T_com = np.asarray(com_batch(ur5, jnp.asarray(q[None]))[0])
        for k in range(6):
            np.testing.assert_allclose(T_com[k], oracle.com_pose(S, Mc, q, k), atol=1e-12)


class TestLimits:
    def test_clip_to_limits(self, ur5):
        q = jnp.asarray([100.0, -100.0, 0.0, 1.0, -1.0, 0.5])
        qc = np.asarray(jax.jit(kinematics.clip_to_limits)(ur5, q))
        assert np.all(qc <= np.asarray(ur5.joint_upper) + 1e-12)
        assert np.all(qc >= np.asarray(ur5.joint_lower) - 1e-12)
