"""Parity tests for the fused/codegen ops layer (ops/fd_step.py,
ops/smallinalg.py) against the generic dynamics path.

Mirrors the reference's CPU<->GPU consistency checks
(``path_planning.py:2620-2632``): the fused kernel must agree with the
generic formulation to roundoff, at every dtype the kernel supports.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manipulapy_tpu.dynamics import bias_forces, forward_dynamics_fast, mass_matrix
from manipulapy_tpu.ops.fd_step import build_bias_mass_fn, build_fd_step
from manipulapy_tpu.ops.smallinalg import chol_factor_small, chol_solve_small, solve_spd_small


def _batch(model, B=16, seed=0):
    rng = np.random.default_rng(seed)
    n = model.num_joints
    lo = np.asarray(model.joint_lower)
    hi = np.asarray(model.joint_upper)
    lo = np.where(np.isfinite(lo), lo, -np.pi)
    hi = np.where(np.isfinite(hi), hi, np.pi)
    q = jnp.asarray(rng.uniform(lo * 0.5, hi * 0.5, size=(B, n)), dtype=model.dtype)
    dq = jnp.asarray(rng.uniform(-1.0, 1.0, size=(B, n)), dtype=model.dtype)
    tau = jnp.asarray(rng.uniform(-20.0, 20.0, size=(B, n)), dtype=model.dtype)
    return q, dq, tau


class TestBiasMassParity:
    @pytest.mark.slow
    def test_mass_and_bias_match_generic(self, ur5):
        q, dq, _ = _batch(ur5)
        fused = jax.jit(build_bias_mass_fn(ur5))
        M_f, h_f = fused(q, dq)
        M_g = jax.vmap(lambda qq: mass_matrix(ur5, qq))(q)
        h_g = jax.vmap(lambda qq, dd: bias_forces(ur5, qq, dd))(q, dq)
        np.testing.assert_allclose(np.asarray(M_f), np.asarray(M_g), atol=1e-10)
        np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_g), atol=1e-9)

    def test_custom_gravity(self, ur5):
        q, dq, _ = _batch(ur5, B=4, seed=1)
        g = (0.0, -4.0, -7.0)
        fused = jax.jit(build_bias_mass_fn(ur5, g=g))
        _, h_f = fused(q, dq)
        h_g = jax.vmap(lambda qq, dd: bias_forces(ur5, qq, dd, g=jnp.asarray(g, ur5.dtype)))(q, dq)
        np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_g), atol=1e-9)


class TestFusedStepParity:
    @pytest.mark.slow
    def test_step_matches_generic_integrator(self, ur5):
        dt = 0.01
        q, dq, tau = _batch(ur5)
        step = jax.jit(build_fd_step(ur5, dt=dt))
        q1, dq1, ddq = step(q, dq, tau)

        def generic(qq, dd, tt):
            # Same clamp placement as forward_dynamics_trajectory's substep
            # (q advanced with the unclipped velocity, then both clipped).
            a = forward_dynamics_fast(ur5, qq, dd, tt)
            d2 = dd + a * dt
            q2 = jnp.clip(qq + d2 * dt, ur5.joint_lower, ur5.joint_upper)
            d2 = jnp.clip(d2, -ur5.velocity_limit, ur5.velocity_limit)
            return q2, d2, a

        q1g, dq1g, ddqg = jax.vmap(generic)(q, dq, tau)
        np.testing.assert_allclose(np.asarray(ddq), np.asarray(ddqg), atol=1e-8)
        np.testing.assert_allclose(np.asarray(dq1), np.asarray(dq1g), atol=1e-9)
        np.testing.assert_allclose(np.asarray(q1), np.asarray(q1g), atol=1e-9)

    def test_unbatched_shapes(self, planar2):
        step = build_fd_step(planar2, dt=0.005)
        n = planar2.num_joints
        q1, dq1, ddq = step(
            jnp.zeros(n, planar2.dtype),
            jnp.zeros(n, planar2.dtype),
            jnp.ones(n, planar2.dtype),
        )
        assert q1.shape == dq1.shape == ddq.shape == (n,)
        assert np.isfinite(np.asarray(ddq)).all()

    @pytest.mark.slow
    def test_f32_build(self, ur5):
        m32 = ur5.astype(jnp.float32)
        q, dq, tau = _batch(m32, B=8)
        step = jax.jit(build_fd_step(m32, dt=0.01))
        q1, dq1, ddq = step(q, dq, tau)
        ddq_ref = jax.vmap(lambda a, b, c: forward_dynamics_fast(m32, a, b, c))(q, dq, tau)
        # f32 with a UR5 wrist-dominated M (cond ~1e6): ~1% relative is the
        # realistic roundoff floor for two differently-ordered Cholesky solves.
        np.testing.assert_allclose(np.asarray(ddq), np.asarray(ddq_ref), rtol=1e-2, atol=1e-2)


class TestSmallLinalg:
    def test_solve_spd_matches_numpy(self):
        rng = np.random.default_rng(3)
        A = rng.normal(size=(6, 6))
        M = A @ A.T + 6 * np.eye(6)
        rhs = rng.normal(size=6)
        x = solve_spd_small(jnp.asarray(M), jnp.asarray(rhs))
        np.testing.assert_allclose(np.asarray(x), np.linalg.solve(M, rhs), atol=1e-10)

    def test_chol_factor_solve_roundtrip(self):
        rng = np.random.default_rng(4)
        A = rng.normal(size=(4, 4))
        M = A @ A.T + 4 * np.eye(4)
        L = chol_factor_small(jnp.asarray(M))
        for rhs in rng.normal(size=(3, 4)):
            x = chol_solve_small(L, jnp.asarray(rhs))
            np.testing.assert_allclose(np.asarray(x), np.linalg.solve(M, rhs), atol=1e-10)

    def test_batched_solve(self):
        rng = np.random.default_rng(5)
        A = rng.normal(size=(7, 5, 5))
        M = np.einsum("bij,bkj->bik", A, A) + 5 * np.eye(5)
        rhs = rng.normal(size=(7, 5))
        x = jax.vmap(solve_spd_small)(jnp.asarray(M), jnp.asarray(rhs))
        ref = np.stack([np.linalg.solve(M[i], rhs[i]) for i in range(7)])
        np.testing.assert_allclose(np.asarray(x), ref, atol=1e-10)


class TestBuildRollout:
    """build_rollout must reproduce forward_dynamics_trajectory exactly
    (same integrator, same clamp placement), batched and unbatched."""

    @pytest.mark.slow
    def test_matches_generic_trajectory_batched(self, ur5):
        from manipulapy_tpu.ops.fd_step import build_rollout
        from manipulapy_tpu.trajectory import forward_dynamics_trajectory

        B, N = 4, 7
        q0, dq0, _ = _batch(ur5, B=B, seed=3)
        rng = np.random.default_rng(4)
        taus = jnp.asarray(rng.uniform(-20, 20, size=(B, N, ur5.num_joints)), dtype=ur5.dtype)
        rollout = build_rollout(ur5, dt=0.01, intRes=2)
        qs, dqs, ddqs = rollout(q0, dq0, taus)
        ref = jax.vmap(
            lambda q, dq, t: forward_dynamics_trajectory(ur5, q, dq, t, dt=0.01, intRes=2)
        )(q0, dq0, taus)
        np.testing.assert_allclose(np.asarray(qs), np.asarray(ref[0]), rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(dqs), np.asarray(ref[1]), rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(ddqs), np.asarray(ref[2]), rtol=1e-8, atol=1e-8)

    def test_matches_generic_trajectory_unbatched(self, planar2):
        from manipulapy_tpu.ops.fd_step import build_rollout
        from manipulapy_tpu.trajectory import forward_dynamics_trajectory

        N, n = 5, planar2.num_joints
        rng = np.random.default_rng(5)
        q0 = jnp.asarray(rng.uniform(-1, 1, n), dtype=planar2.dtype)
        dq0 = jnp.zeros(n, dtype=planar2.dtype)
        taus = jnp.asarray(rng.uniform(-5, 5, size=(N, n)), dtype=planar2.dtype)
        rollout = build_rollout(planar2, dt=0.02)
        qs, dqs, ddqs = rollout(q0, dq0, taus)
        ref = forward_dynamics_trajectory(planar2, q0, dq0, taus, dt=0.02)
        np.testing.assert_allclose(np.asarray(qs), np.asarray(ref[0]), rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(ddqs), np.asarray(ref[2]), rtol=1e-8, atol=1e-8)

    def test_rejects_bad_intres(self, planar2):
        from manipulapy_tpu.ops.fd_step import build_rollout

        with pytest.raises(ValueError):
            build_rollout(planar2, intRes=0)
