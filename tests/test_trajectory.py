"""Trajectory layer tests — parity gates from the reference's benchmarks:
quintic/cubic boundary conditions (<= ~2e-7 in f32, exact in f64,
``Benchmark/README.MD:310-313``), batch consistency, degenerate guards
(``cuda_kernels.py:676-680``), and trajectory-level dynamics round trips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manipulapy_tpu import dynamics, trajectory
from manipulapy_tpu.core.time_scaling import scaling_profile

G_VEC = jnp.asarray([0.0, 0.0, -9.81])


class TestTimeScaling:
    @pytest.mark.parametrize("method", [3, 5, 1])
    def test_boundary_conditions(self, method):
        s, sd, sdd = scaling_profile(2.0, 500, method, dtype=jnp.float64)
        s, sd, sdd = np.asarray(s), np.asarray(sd), np.asarray(sdd)
        assert s[0] == pytest.approx(0.0, abs=1e-12)
        assert s[-1] == pytest.approx(1.0, abs=1e-12)
        if method in (3, 5):
            assert sd[0] == pytest.approx(0.0, abs=1e-12)
            assert sd[-1] == pytest.approx(0.0, abs=1e-12)
        if method == 5:
            assert sdd[0] == pytest.approx(0.0, abs=1e-12)
            assert sdd[-1] == pytest.approx(0.0, abs=1e-12)

    def test_derivative_consistency(self):
        """s_dot and s_ddot are the analytic time derivatives of s."""
        N, Tf = 2001, 3.0
        s, sd, sdd = (np.asarray(a) for a in scaling_profile(Tf, N, 5, dtype=jnp.float64))
        dt = Tf / (N - 1)
        np.testing.assert_allclose(np.gradient(s, dt)[1:-1], sd[1:-1], atol=1e-5)
        np.testing.assert_allclose(np.gradient(sd, dt)[1:-1], sdd[1:-1], atol=1e-4)

    def test_degenerate_guards(self):
        """N <= 1 or Tf <= 0 collapse to zeros (cuda_kernels.py:676-680)."""
        s, sd, sdd = scaling_profile(0.0, 100, 5, dtype=jnp.float64)
        assert np.all(np.asarray(s) == 0) and np.all(np.asarray(sd) == 0)
        s1, _, _ = scaling_profile(2.0, 1, 5, dtype=jnp.float64)
        assert s1.shape == (1,)

    def test_monotone(self):
        for method in (3, 5, 1):
            s, _, _ = scaling_profile(1.0, 100, method, dtype=jnp.float64)
            assert np.all(np.diff(np.asarray(s)) >= -1e-15)


class TestJointTrajectory:
    def test_endpoints(self, ur5):
        start = jnp.zeros(6, dtype=jnp.float64)
        end = jnp.asarray([0.5, -0.8, 1.2, 0.3, -0.2, 0.9])
        traj = trajectory.joint_trajectory(ur5, start, end, 2.0, 200, 5)
        np.testing.assert_allclose(np.asarray(traj.position[0]), np.asarray(start), atol=1e-12)
        np.testing.assert_allclose(np.asarray(traj.position[-1]), np.asarray(end), atol=1e-12)
        np.testing.assert_allclose(np.asarray(traj.velocity[0]), 0.0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(traj.velocity[-1]), 0.0, atol=1e-12)

    def test_matches_reference_formula(self, ur5):
        """Positions follow start + s * delta exactly (cuda_kernels.py:828-831)."""
        start = jnp.asarray([0.1, 0.2, 0.3, 0.4, 0.5, 0.6])
        end = jnp.asarray([1.1, -0.2, 0.9, 0.0, 1.5, -0.6])
        N, Tf = 100, 2.0
        traj = trajectory.joint_trajectory(ur5, start, end, Tf, N, 3, clip_to_limits=False)
        tau = np.linspace(0, 1, N)
        s = 3 * tau**2 - 2 * tau**3
        expected = np.asarray(start) + s[:, None] * (np.asarray(end) - np.asarray(start))
        np.testing.assert_allclose(np.asarray(traj.position), expected, atol=1e-12)

    def test_limit_clipping(self, ur5):
        """Positions clip to joint limits post-hoc (path_planning.py:630-636)."""
        end = jnp.full(6, 100.0)
        traj = trajectory.joint_trajectory(ur5, jnp.zeros(6, dtype=jnp.float64), end, 1.0, 50, 5)
        assert np.all(np.asarray(traj.position) <= np.asarray(ur5.joint_upper) + 1e-9)

    def test_batch_matches_single(self, ur5):
        rng = np.random.default_rng(0)
        starts = jnp.asarray(rng.uniform(-1, 1, (8, 6)))
        ends = jnp.asarray(rng.uniform(-1, 1, (8, 6)))
        batch = trajectory.batch_joint_trajectory(ur5, starts, ends, 2.0, 64, 5)
        single = trajectory.joint_trajectory(ur5, starts[3], ends[3], 2.0, 64, 5)
        np.testing.assert_allclose(
            np.asarray(batch.position[3]), np.asarray(single.position), atol=1e-12
        )


class TestCartesianTrajectory:
    def test_endpoints_and_geodesic(self):
        from manipulapy_tpu.core import lie

        X0 = np.eye(4)
        w = np.asarray([0.3, 0.2, 0.9])
        X1 = np.asarray(lie.se3_exp(jnp.asarray(np.concatenate([w, [0.5, -0.2, 0.7]]))))
        poses, vel, acc = trajectory.cartesian_trajectory(
            jnp.asarray(X0), jnp.asarray(X1), 2.0, 50, 5
        )
        np.testing.assert_allclose(np.asarray(poses[0]), X0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(poses[-1]), X1, atol=1e-10)
        # Orientation follows the geodesic: R(s) = R0 exp(log(R0^T R1) s).
        R_mid = np.asarray(poses[25][:3, :3])
        log_rel = np.asarray(lie.so3_log(jnp.asarray(X0[:3, :3].T @ X1[:3, :3])))
        s_mid = float(3 * 0.5**2 * 4 - 2 * 0.5**3 * 8)  # not needed: check orthonormality
        np.testing.assert_allclose(R_mid @ R_mid.T, np.eye(3), atol=1e-12)

    def test_straight_line_positions(self):
        X0, X1 = np.eye(4), np.eye(4)
        X1[:3, 3] = [1.0, 2.0, 3.0]
        poses, vel, acc = trajectory.cartesian_trajectory(
            jnp.asarray(X0), jnp.asarray(X1), 1.0, 11, 1
        )
        p = np.asarray(poses[:, :3, 3])
        # Linear scaling: p(tau) on the straight segment.
        for i in range(11):
            np.testing.assert_allclose(p[i], np.array([1.0, 2, 3]) * (i / 10), atol=1e-12)


class TestInverseDynamicsTrajectory:
    def test_matches_pointwise(self, ur5):
        rng = np.random.default_rng(1)
        N = 10
        q = jnp.asarray(rng.uniform(-1, 1, (N, 6)))
        dq = jnp.asarray(rng.uniform(-1, 1, (N, 6)))
        ddq = jnp.asarray(rng.uniform(-1, 1, (N, 6)))
        taus = trajectory.inverse_dynamics_trajectory(ur5, q, dq, ddq, g=G_VEC)
        for i in (0, 5, 9):
            expected = dynamics.rnea(ur5, q[i], dq[i], ddq[i], G_VEC)
            clipped = jnp.clip(expected, -ur5.torque_limit, ur5.torque_limit)
            np.testing.assert_allclose(np.asarray(taus[i]), np.asarray(clipped), atol=1e-9)

    def test_torque_clipping(self, ur5):
        """Torques clamp to the model limits (path_planning.py:1184-1186)."""
        q = jnp.zeros((3, 6), dtype=jnp.float64)
        ddq = jnp.full((3, 6), 1e4)
        taus = np.asarray(
            trajectory.inverse_dynamics_trajectory(ur5, q, jnp.zeros_like(q), ddq, g=G_VEC)
        )
        assert np.all(taus <= np.asarray(ur5.torque_limit) + 1e-9)

    def test_batched_3d(self, ur5):
        """(B, N, J) input works in one call (the 3D-grid kernel analogue)."""
        rng = np.random.default_rng(2)
        q = jnp.asarray(rng.uniform(-1, 1, (4, 5, 6)))
        taus = trajectory.inverse_dynamics_trajectory(
            ur5, q, jnp.zeros_like(q), jnp.zeros_like(q), g=G_VEC
        )
        assert taus.shape == (4, 5, 6)


class TestForwardDynamicsTrajectory:
    def test_gravity_free_rest_stays_at_rest(self, ur5):
        q0 = jnp.asarray([0.1, -0.4, 0.7, 0.2, -0.5, 0.3])
        taus = jnp.zeros((20, 6), dtype=jnp.float64)
        qs, dqs, dds = trajectory.forward_dynamics_trajectory(
            ur5, q0, jnp.zeros(6, dtype=jnp.float64), taus, g=jnp.zeros(3), dt=0.01
        )
        np.testing.assert_allclose(np.asarray(qs[-1]), np.asarray(q0), atol=1e-12)
        np.testing.assert_allclose(np.asarray(dqs[-1]), 0.0, atol=1e-12)

    def test_gravity_compensation_holds(self, ur5):
        """Feeding gravity torques back holds the arm still — the fwd∘inv
        consistency gate at trajectory level."""
        q0 = jnp.asarray([0.2, -0.6, 0.9, 0.1, -0.3, 0.5])
        tau_g = dynamics.gravity_forces(ur5, q0, G_VEC)
        taus = jnp.tile(tau_g, (50, 1))
        qs, dqs, _ = trajectory.forward_dynamics_trajectory(
            ur5, q0, jnp.zeros(6, dtype=jnp.float64), taus, g=G_VEC, dt=0.001, intRes=4
        )
        np.testing.assert_allclose(np.asarray(qs[-1]), np.asarray(q0), atol=1e-6)

class TestRolloutDispatch:
    """The public rollout API is served by the fused engines
    (``ops/fd_step.py`` cgen / ``ops/pallas_rollout.py``) for concrete
    calls; these pin parity across the dispatch boundary and that every
    fallback condition still lands on the generic scan."""

    def _inputs(self, ur5, B=None):
        rng = np.random.default_rng(3)
        shp = (B, 6) if B else (6,)
        q0 = jnp.asarray(rng.uniform(-0.5, 0.5, shp))
        dq0 = jnp.asarray(rng.uniform(-0.2, 0.2, shp))
        taus = jnp.asarray(rng.uniform(-5, 5, ((B,) if B else ()) + (30, 6)))
        return q0, dq0, taus

    @pytest.mark.parametrize("B", [None, 4])
    def test_engine_matches_generic(self, ur5, B):
        q0, dq0, taus = self._inputs(ur5, B)
        fast = trajectory.forward_dynamics_trajectory(
            ur5, q0, dq0, taus, dt=0.01, intRes=2
        )
        slow = trajectory._forward_dynamics_trajectory_generic(
            ur5, q0, dq0, taus, None, None, 0.01, 2
        )
        for a, b in zip(fast, slow):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-10)

    def test_zero_wrench_matches_no_wrench(self, ur5):
        """Ftipmat forces the generic path; a zero wrench must agree with
        the engine-served no-wrench call."""
        q0, dq0, taus = self._inputs(ur5)
        ft = jnp.zeros((30, 6))
        a = trajectory.forward_dynamics_trajectory(ur5, q0, dq0, taus, Ftipmat=ft)
        b = trajectory.forward_dynamics_trajectory(ur5, q0, dq0, taus)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-10)

    def test_custom_gravity_served_and_correct(self, ur5):
        q0, dq0, taus = self._inputs(ur5)
        g = jnp.asarray([0.0, -1.0, -9.0])
        fast = trajectory.forward_dynamics_trajectory(ur5, q0, dq0, taus, g=g)
        slow = trajectory._forward_dynamics_trajectory_generic(
            ur5, q0, dq0, taus, g, None, 0.01, 1
        )
        for a, b in zip(fast, slow):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-10)

    def test_traced_call_falls_back(self, ur5):
        """Inside an outer jit the inputs are tracers; the dispatcher must
        route to the generic scan and still produce identical results."""
        q0, dq0, taus = self._inputs(ur5)
        jitted = jax.jit(
            lambda q, dq, t: trajectory.forward_dynamics_trajectory(ur5, q, dq, t)
        )
        fast = trajectory.forward_dynamics_trajectory(ur5, q0, dq0, taus)
        for a, b in zip(jitted(q0, dq0, taus), fast):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-10)

    def test_engine_cache_reused(self, ur5):
        q0, dq0, taus = self._inputs(ur5)
        trajectory.forward_dynamics_trajectory(ur5, q0, dq0, taus)
        size = len(trajectory._ENGINE_CACHE)
        trajectory.forward_dynamics_trajectory(ur5, q0, dq0, taus)
        assert len(trajectory._ENGINE_CACHE) == size


class TestForwardDynamicsTrajectorySlow:
    @pytest.mark.slow
    def test_round_trip_inverse_then_forward(self, ur5):
        """Torques from a planned trajectory, integrated forward, track the
        plan (reference compare_implementations-style gate)."""
        start = jnp.asarray([0.0, -0.3, 0.5, 0.0, 0.2, 0.0])
        end = jnp.asarray([0.4, -0.6, 0.9, 0.2, -0.1, 0.3])
        N, Tf = 101, 1.0
        dt = Tf / (N - 1)
        traj = trajectory.joint_trajectory(ur5, start, end, Tf, N, 5)
        taus = trajectory.inverse_dynamics_trajectory(
            ur5, traj.position, traj.velocity, traj.acceleration, g=G_VEC
        )
        qs, dqs, _ = trajectory.forward_dynamics_trajectory(
            ur5, start, traj.velocity[0], taus[:-1], g=G_VEC, dt=dt, intRes=8
        )
        # Euler integration error dominates; tolerance is integration-level.
        np.testing.assert_allclose(np.asarray(qs[-1]), np.asarray(traj.position[-2]), atol=5e-3)


class TestF32GripperChainRollout:
    """f32 rollout trustworthiness on the worst-conditioned chain
    (jaco_7dof: mass-matrix diagonal spans 1e-5..1.5, cond ~5e5 — the
    round-3 silent-error robots). Through the public rollout semantics
    (position AND velocity clamps, ``path_planning.py:1492-1503``) an f32
    trajectory must track the f64 oracle; the per-state ddq accuracy
    itself is gated norm-wise in ``benchmarks/reference_parity.py``
    (F32_FWD_SCALED_TOL) and the solver-variant evidence lives in
    ``benchmarks/f32_conditioning_study.py``."""

    def test_jaco_f32_tracks_f64_with_clamps(self):
        from manipulapy_tpu import dynamics as dyn
        from manipulapy_tpu.models.robot_data import load_robot

        m64 = load_robot("jaco_7dof", dtype=jnp.float64)
        m32 = load_robot("jaco_7dof", dtype=jnp.float32)
        n = int(m64.num_joints)
        rng = np.random.default_rng(7)
        q0 = rng.uniform(-0.3, 0.3, n)
        g64 = jnp.asarray([0.0, 0.0, -9.81])
        tau_g = np.asarray(dyn.gravity_forces(m64, jnp.asarray(q0), g64))
        N, dt = 25, 0.005
        taus = tau_g[None, :] + 0.2 * (np.abs(tau_g[None, :]) + 0.1) * np.sin(
            2 * np.pi * 2 * np.arange(N)[:, None] * dt + np.arange(n)[None, :]
        )

        # Semi-implicit Euler with the engine's clamp placement; a step-
        # level loop because the n=10 fused rollout program is too big for
        # an XLA:CPU compile in the fast suite (engine<->generic parity is
        # pinned separately on ur5 in TestRolloutDispatch).
        def mk_step(m, g):
            @jax.jit
            def step(q, dq, tau):
                ddq = dyn.forward_dynamics(m, q, dq, tau, g, jnp.zeros(6, m.dtype))
                dq2 = jnp.clip(dq + ddq * dt, -m.velocity_limit, m.velocity_limit)
                q2 = jnp.clip(q + dq2 * dt, m.joint_lower, m.joint_upper)
                return q2, dq2

            return step

        step64 = mk_step(m64, g64)
        step32 = mk_step(m32, jnp.asarray([0.0, 0.0, -9.81], jnp.float32))

        q64, dq64 = jnp.asarray(q0), jnp.zeros(n)
        q32, dq32 = jnp.asarray(q0, jnp.float32), jnp.zeros(n, jnp.float32)
        for t in range(N):
            q64, dq64 = step64(q64, dq64, jnp.asarray(taus[t]))
            q32, dq32 = step32(q32, dq32, jnp.asarray(taus[t], jnp.float32))
            # Measured divergence over 40 steps: q ~3e-7 rad, dq ~2.5e-5
            # rad/s; gates give ~300x headroom.
            assert float(jnp.abs(q32.astype(jnp.float64) - q64).max()) < 1e-4
            assert float(jnp.abs(dq32.astype(jnp.float64) - dq64).max()) < 1e-2
