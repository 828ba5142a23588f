"""IK tests: convergence on reachable FK-generated targets (the
reference's benchmark protocol, ``Benchmark/README.MD:272-278``: 94%+
convergence, ~1e-5 m position error), batched solves, multi-start, and
guess strategies."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manipulapy_tpu import ik, kinematics


def fk(model, q):
    return kinematics.forward_kinematics(model, q)


class TestGeometricError:
    def test_zero_at_identity(self, ur5):
        q = jnp.asarray([0.3, -0.5, 0.8, 0.1, -0.2, 0.6])
        T = fk(ur5, q)
        V, rot, trans = ik.geometric_error(T, T)
        np.testing.assert_allclose(np.asarray(V), 0.0, atol=1e-12)
        assert float(rot) < 1e-12 and float(trans) < 1e-12

    def test_translation_only(self, ur5):
        T1 = jnp.eye(4, dtype=jnp.float64)
        T2 = T1.at[:3, 3].set(jnp.asarray([0.1, -0.2, 0.3]))
        V, rot, trans = ik.geometric_error(T1, T2)
        np.testing.assert_allclose(np.asarray(V[3:]), [0.1, -0.2, 0.3], atol=1e-12)
        assert float(rot) < 1e-12
        assert float(trans) == pytest.approx(np.sqrt(0.01 + 0.04 + 0.09), abs=1e-12)


class TestDLSSolve:
    def test_undamped_matches_lstsq(self):
        rng = np.random.default_rng(0)
        J = jnp.asarray(rng.standard_normal((6, 6)))
        V = jnp.asarray(rng.standard_normal(6))
        dq = ik.dls_solve(J, V, 0.0)
        np.testing.assert_allclose(
            np.asarray(dq), np.linalg.lstsq(np.asarray(J), np.asarray(V), rcond=None)[0], atol=1e-8
        )

    def test_damping_bounds_step(self):
        """Near-singular J: damped solve stays finite and bounded."""
        J = jnp.diag(jnp.asarray([1.0, 1.0, 1.0, 1.0, 1.0, 1e-9]))
        V = jnp.ones(6, dtype=jnp.float64)
        dq = np.asarray(ik.dls_solve(J, V, 0.05))
        assert np.all(np.isfinite(dq))
        assert np.abs(dq).max() < 1.0 / 0.05  # bounded by 1/(2 lambda)-ish


class TestSolveIK:
    @pytest.mark.slow
    def test_converges_on_reachable_targets(self, ur5):
        """FK-generated targets, perturbed warm starts: every solve must
        converge to the documented tolerances."""
        rng = np.random.default_rng(1)
        B = 12
        q_true = jnp.asarray(rng.uniform(-1.5, 1.5, (B, 6)))
        targets = jax.vmap(lambda q: fk(ur5, q))(q_true)
        guesses = q_true + jnp.asarray(rng.normal(0, 0.3, (B, 6)))
        res = ik.solve_ik_batch(
            ur5, targets, guesses, max_iterations=150, eomg=1e-6, ev=1e-6
        )
        success = np.asarray(res.success)
        assert success.mean() >= 0.9, f"success rate {success.mean()}"
        # Verify the claimed solutions actually reach the target.
        T_sol = jax.vmap(lambda q: fk(ur5, q))(res.theta)
        _, rot, trans = jax.vmap(ik.geometric_error)(T_sol, targets)
        assert np.all(np.asarray(trans)[success] < 1e-5)

    def test_respects_joint_limits(self, ur5):
        rng = np.random.default_rng(2)
        q_true = jnp.asarray(rng.uniform(-1.0, 1.0, 6))
        res = ik.solve_ik(ur5, fk(ur5, q_true), jnp.zeros(6, dtype=jnp.float64))
        theta = np.asarray(res.theta)
        assert np.all(theta <= np.asarray(ur5.joint_upper) + 1e-9)
        assert np.all(theta >= np.asarray(ur5.joint_lower) - 1e-9)

    def test_unreachable_target_reports_failure(self, ur5):
        T_far = jnp.eye(4, dtype=jnp.float64).at[:3, 3].set(jnp.asarray([5.0, 0.0, 0.0]))
        res = ik.solve_ik(ur5, T_far, jnp.zeros(6, dtype=jnp.float64), max_iterations=60)
        assert not bool(res.success)
        assert float(res.trans_err) > 1.0

    @pytest.mark.slow
    def test_multi_start(self, ur5):
        rng = np.random.default_rng(3)
        q_true = jnp.asarray(rng.uniform(-1.2, 1.2, 6))
        res = ik.multi_start_ik(ur5, fk(ur5, q_true), num_starts=8, max_iterations=120)
        assert bool(res.success)
        assert float(res.trans_err) < 1e-5


class TestGuessStrategies:
    def test_midpoint_within_limits(self, ur5):
        g = np.asarray(ik.midpoint_guess(ur5))
        assert np.all(g >= np.asarray(ur5.joint_lower))
        assert np.all(g <= np.asarray(ur5.joint_upper))

    def test_random_within_limits(self, ur5):
        g = np.asarray(ik.random_guesses(ur5, jax.random.PRNGKey(0), 64))
        assert g.shape == (64, 6)
        assert np.all(g >= np.asarray(ur5.joint_lower) - 1e-9)
        assert np.all(g <= np.asarray(ur5.joint_upper) + 1e-9)

    def test_extrapolate_reduces_error(self, ur5):
        """One J^+ step from a near solution reduces the pose error
        (ik_helpers.py:102-158 contract)."""
        q_true = jnp.asarray([0.4, -0.6, 0.8, 0.2, -0.3, 0.5])
        T = fk(ur5, q_true)
        q0 = q_true + 0.05
        q1 = ik.extrapolate_guess(ur5, q0, T)
        _, r0, t0 = ik.geometric_error(fk(ur5, q0), T)
        _, r1, t1 = ik.geometric_error(fk(ur5, q1), T)
        assert float(r1 + t1) < float(r0 + t0)

    def test_workspace_heuristic_points_at_target(self, ur5):
        T = jnp.eye(4, dtype=jnp.float64).at[:3, 3].set(jnp.asarray([0.0, 0.5, 0.3]))
        g = np.asarray(ik.workspace_heuristic_guess(ur5, T))
        assert g[0] == pytest.approx(np.pi / 2, abs=1e-6)


class TestSelectBest:
    def test_nan_lane_does_not_win(self):
        """A diverged lane (NaN errors) must never beat a converged one:
        jnp.argmin follows NumPy NaN semantics, so select_best demotes
        NaN scores to +inf."""
        results = ik.IKResult(
            theta=jnp.asarray([[1.0, 1.0], [2.0, 2.0]]),
            success=jnp.asarray([False, True]),
            iterations=jnp.asarray([5, 7]),
            rot_err=jnp.asarray([jnp.nan, 1e-7]),
            trans_err=jnp.asarray([jnp.nan, 2e-7]),
        )
        best = ik.select_best(results)
        assert bool(best.success)
        np.testing.assert_allclose(np.asarray(best.theta), [2.0, 2.0])

    def test_all_failed_picks_lowest_finite_error(self):
        results = ik.IKResult(
            theta=jnp.asarray([[1.0], [2.0], [3.0]]),
            success=jnp.asarray([False, False, False]),
            iterations=jnp.asarray([1, 2, 3]),
            rot_err=jnp.asarray([jnp.nan, 0.5, 0.2]),
            trans_err=jnp.asarray([jnp.nan, 0.1, 0.3]),
        )
        best = ik.select_best(results)
        np.testing.assert_allclose(np.asarray(best.theta), [3.0])  # 0.5 < 0.6
