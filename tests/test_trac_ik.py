"""Dual-solver (trac-ik-style), guess-cache, smart/robust IK tests
(reference coverage: tests/test_trac_ik.py, 44 tests; test_ik_helpers.py,
31 tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manipulapy_tpu.ik import IKResult, solve_ik
from manipulapy_tpu.ik_cache import (
    IKInitialGuessCache,
    adaptive_multi_start_ik,
    robust_ik,
    smart_ik,
)
from manipulapy_tpu.kinematics import forward_kinematics
from manipulapy_tpu.trac_ik import TracIKSolver, sqp_ik, trac_ik_solve


def _target(model, q):
    return forward_kinematics(model, jnp.asarray(q, dtype=model.dtype))


class TestSQP:
    def test_converges_on_reachable_pose(self, ur5):
        q_true = jnp.asarray([0.4, -0.8, 0.9, 0.3, -0.5, 0.7], dtype=jnp.float64)
        T = _target(ur5, q_true)
        res = sqp_ik(ur5, T, q_true + 0.3, max_iterations=120)
        assert bool(res.success)
        assert float(res.trans_err) < 1e-6

    def test_respects_joint_limits(self, ur5):
        q_true = jnp.asarray([0.2, -0.5, 0.5, 0.1, -0.2, 0.3], dtype=jnp.float64)
        res = sqp_ik(ur5, _target(ur5, q_true), jnp.zeros(6, dtype=jnp.float64))
        q = np.asarray(res.theta)
        assert np.all(q >= np.asarray(ur5.joint_lower) - 1e-12)
        assert np.all(q <= np.asarray(ur5.joint_upper) + 1e-12)

    def test_different_family_than_dls(self, ur5):
        """Both converge but along different iterates (dual-solver value)."""
        q_true = jnp.asarray([0.3, -0.6, 0.8, 0.2, -0.4, 0.5], dtype=jnp.float64)
        T = _target(ur5, q_true)
        guess = q_true + 0.4
        r_sqp = sqp_ik(ur5, T, guess, max_iterations=200)
        r_dls = solve_ik(ur5, T, guess, max_iterations=300)
        assert bool(r_sqp.success) and bool(r_dls.success)


class TestTracIK:
    @pytest.mark.slow
    def test_solver_succeeds(self, ur5):
        solver = TracIKSolver(ur5, timeout=2.0, num_guesses=6)
        q_true = jnp.asarray([0.5, -0.7, 0.6, 0.4, -0.3, 0.2], dtype=jnp.float64)
        res = solver.solve(_target(ur5, q_true))
        assert bool(res.success)
        assert float(res.trans_err) < 1e-6

    @pytest.mark.slow
    def test_warm_start_used(self, ur5):
        solver = TracIKSolver(ur5, timeout=2.0, num_guesses=4)
        q_true = jnp.asarray([0.1, -0.4, 0.5, 0.2, -0.1, 0.3], dtype=jnp.float64)
        res = solver.solve(_target(ur5, q_true), theta0=q_true + 0.05)
        assert bool(res.success)

    def test_one_shot_wrapper(self, planar2):
        q_true = jnp.asarray([0.6, 0.9], dtype=jnp.float64)
        res = trac_ik_solve(planar2, _target(planar2, q_true), timeout=2.0)
        assert bool(res.success)

    @pytest.mark.slow
    def test_unreachable_returns_best_effort(self, planar2):
        """Timeout with an unreachable target still returns a best-effort
        IKResult (reference behavior: best tracked solution)."""
        T = np.eye(4)
        T[:3, 3] = [5.0, 0.0, 0.0]  # outside the 2R workspace
        solver = TracIKSolver(planar2, timeout=0.3, num_guesses=4)
        res = solver.solve(jnp.asarray(T))
        assert isinstance(res, IKResult)
        assert not bool(res.success)
        assert np.isfinite(float(res.trans_err))


class TestGuessCache:
    def test_add_lookup_roundtrip(self, ur5):
        cache = IKInitialGuessCache(max_entries=8)
        q = np.array([0.3, -0.5, 0.8, 0.2, -0.3, 1.1])
        T = np.asarray(_target(ur5, jnp.asarray(q)))
        cache.add(T, q)
        hit = cache.lookup(T)
        np.testing.assert_allclose(hit, q, atol=1e-9)

    def test_knn_blend(self, ur5):
        cache = IKInitialGuessCache(k=2)
        for dq in (0.0, 0.02):
            q = np.array([0.3 + dq, -0.5, 0.8, 0.2, -0.3, 1.1])
            cache.add(np.asarray(_target(ur5, jnp.asarray(q))), q)
        q_mid = np.array([0.31, -0.5, 0.8, 0.2, -0.3, 1.1])
        hit = cache.lookup(np.asarray(_target(ur5, jnp.asarray(q_mid))))
        assert abs(hit[0] - 0.31) < 0.02

    def test_fifo_eviction(self):
        cache = IKInitialGuessCache(max_entries=3)
        for i in range(5):
            T = np.eye(4)
            T[0, 3] = float(i)
            cache.add(T, np.full(6, float(i)))
        assert len(cache) == 3
        T0 = np.eye(4)  # evicted entry's pose
        hit = cache.lookup(T0, max_distance=0.5)
        assert hit is None or hit[0] >= 2.0

    def test_max_distance_gate(self):
        cache = IKInitialGuessCache()
        cache.add(np.eye(4), np.zeros(6))
        far = np.eye(4)
        far[0, 3] = 10.0
        assert cache.lookup(far, max_distance=1.0) is None

    def test_lookup_with_distance(self):
        cache = IKInitialGuessCache()
        cache.add(np.eye(4), np.zeros(6))
        near = np.eye(4)
        near[0, 3] = 0.1
        hit = cache.lookup_with_distance(near)
        assert hit is not None
        guess, dist = hit
        assert guess.shape == (6,)
        assert abs(dist - 0.1) < 1e-9

    def test_add_async_pending_is_bounded(self):
        """A caller that never does a host-side access (non-'cached'
        strategy streams) must not grow _pending without bound."""
        import jax.numpy as jnp

        cache = IKInitialGuessCache(max_entries=4)
        for i in range(20):
            T = np.eye(4)
            T[0, 3] = float(i)
            cache.add_async(T, jnp.asarray(True), jnp.full(6, float(i)))
        assert len(cache._pending) <= cache.max_entries + 1
        assert len(cache) == 4  # FIFO bound applied

    def test_direct_add_materializes_pending_first(self):
        """add() flushes pending async inserts so FIFO order matches
        solve order."""
        import jax.numpy as jnp

        cache = IKInitialGuessCache(max_entries=2)
        T1 = np.eye(4)
        cache.add_async(T1, jnp.asarray(True), jnp.ones(6))
        T2 = np.eye(4)
        T2[0, 3] = 1.0
        cache.add(T2, np.full(6, 2.0))
        T3 = np.eye(4)
        T3[0, 3] = 2.0
        cache.add(T3, np.full(6, 3.0))  # evicts the OLDEST = the async T1
        assert len(cache) == 2
        hit = cache.lookup(T1, max_distance=0.25)
        assert hit is None  # T1 was first in, first out

    def test_add_async_lazy_materialization(self):
        """add_async defers the device fetch; a successful pending entry
        lands at the next host-side access, a failed one is dropped."""
        import jax.numpy as jnp

        cache = IKInitialGuessCache()
        cache.add_async(np.eye(4), jnp.asarray(True), jnp.ones(6))
        T_fail = np.eye(4)
        T_fail[0, 3] = 5.0
        cache.add_async(T_fail, jnp.asarray(False), jnp.zeros(6))
        assert len(cache._pending) == 2  # nothing fetched yet
        assert len(cache) == 1  # materializes: success kept, failure dropped
        hit = cache.lookup(np.eye(4))
        np.testing.assert_allclose(hit, np.ones(6), atol=1e-9)


class TestSolveRoundSelection:
    def test_solve_returns_current_successful_round(self, ur5):
        """A converged round must be returned even when a FAILED earlier
        round had lower combined error (near-miss failures can out-score
        successes)."""
        from manipulapy_tpu.ik import IKResult
        from manipulapy_tpu.trac_ik import TracIKSolver

        solver = TracIKSolver(ur5, timeout=10.0)
        fail_low_err = IKResult(
            theta=jnp.zeros(6), success=jnp.asarray(False),
            iterations=jnp.asarray(10),
            rot_err=jnp.asarray(1.5e-6), trans_err=jnp.asarray(1e-7),
        )
        success_higher_err = IKResult(
            theta=jnp.ones(6), success=jnp.asarray(True),
            iterations=jnp.asarray(12),
            rot_err=jnp.asarray(9e-7), trans_err=jnp.asarray(9.5e-7),
        )
        calls = iter([fail_low_err, success_higher_err])
        solver._round = lambda *a, **k: next(calls)
        res = solver.solve(jnp.eye(4, dtype=jnp.float64))
        assert bool(res.success)
        np.testing.assert_allclose(np.asarray(res.theta), np.ones(6))


class TestSmartRobust:
    def test_smart_auto_converges_and_fills_cache(self, ur5):
        cache = IKInitialGuessCache()
        q_true = jnp.asarray([0.4, -0.6, 0.7, 0.3, -0.2, 0.4], dtype=jnp.float64)
        res = smart_ik(ur5, _target(ur5, q_true), cache=cache, max_iterations=150)
        assert bool(res.success)
        assert len(cache) == 1

    def test_smart_cached_strategy(self, ur5):
        cache = IKInitialGuessCache()
        q_true = jnp.asarray([0.4, -0.6, 0.7, 0.3, -0.2, 0.4], dtype=jnp.float64)
        T = _target(ur5, q_true)
        cache.add(np.asarray(T), np.asarray(q_true))
        res = smart_ik(ur5, T, strategy="cached", cache=cache, max_iterations=50)
        assert bool(res.success)
        assert int(res.iterations) <= 5  # warm start converges immediately

    def test_smart_fast_path_on_near_hit(self, ur5):
        """A repeated near-identical query takes the m=1 fast path (the
        cached guess races alone) and still succeeds."""
        cache = IKInitialGuessCache()
        q_true = jnp.asarray([0.4, -0.6, 0.7, 0.3, -0.2, 0.4], dtype=jnp.float64)
        T = _target(ur5, q_true)
        res1 = smart_ik(ur5, T, cache=cache, max_iterations=150)
        assert bool(res1.success)
        # Second query at the same pose: nearest-entry distance ~0 →
        # fast path; the warm start converges in a handful of iterations.
        res2 = smart_ik(ur5, T, cache=cache, max_iterations=150)
        assert bool(res2.success)
        assert int(res2.iterations) <= 10

    def test_smart_unknown_strategy_raises(self, ur5):
        with pytest.raises(ValueError, match="Unknown IK strategy"):
            smart_ik(ur5, jnp.eye(4, dtype=jnp.float64), strategy="telepathy")

    @pytest.mark.slow
    def test_robust_schedule(self, ur5):
        q_true = jnp.asarray([0.5, -0.9, 1.1, 0.2, -0.6, 0.8], dtype=jnp.float64)
        res = robust_ik(ur5, _target(ur5, q_true), max_iterations=120)
        assert bool(res.success)

    @pytest.mark.slow
    def test_adaptive_multi_start_escalates(self, planar2):
        T = np.eye(4)
        T[:3, 3] = [5.0, 0.0, 0.0]  # unreachable: forces escalation
        res, used = adaptive_multi_start_ik(
            planar2, jnp.asarray(T), initial_starts=2, max_starts=8, max_iterations=20
        )
        assert used == 2 + 4 + 8
        assert not bool(res.success)

    @pytest.mark.slow
    def test_adaptive_multi_start_quick_on_easy(self, ur5):
        q_true = jnp.asarray([0.2, -0.4, 0.5, 0.1, -0.2, 0.3], dtype=jnp.float64)
        res, used = adaptive_multi_start_ik(
            ur5, _target(ur5, q_true), initial_starts=4, max_iterations=150
        )
        assert bool(res.success)
        assert used == 4
