"""Control layer tests: law-by-law parity with the reference's formulas
(``control.py:120-1067``) plus closed-loop behavior gates (a computed-
torque loop must actually track)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manipulapy_tpu import control, dynamics

G_VEC = jnp.asarray([0.0, 0.0, -9.81])


class TestBasicLaws:
    def test_pd_formula(self):
        tau = control.pd_control(
            jnp.asarray([1.0, 2.0]),
            jnp.asarray([0.5, 0.0]),
            jnp.asarray([0.8, 1.5]),
            jnp.asarray([0.0, 0.1]),
            10.0,
            2.0,
        )
        np.testing.assert_allclose(
            np.asarray(tau), [10 * 0.2 + 2 * 0.5, 10 * 0.5 + 2 * (-0.1)], atol=1e-12
        )

    def test_pid_integral_state(self):
        state = control.ControlState.zero(2, dtype=jnp.float64)
        e = jnp.asarray([1.0, -1.0])
        tau1, state = control.pid_control(
            e, jnp.zeros(2), jnp.zeros(2), jnp.zeros(2), 0.1, 1.0, 1.0, 0.0, state
        )
        tau2, state = control.pid_control(
            e, jnp.zeros(2), jnp.zeros(2), jnp.zeros(2), 0.1, 1.0, 1.0, 0.0, state
        )
        # Integral accumulates: tau = Kp e + Ki * eint.
        np.testing.assert_allclose(np.asarray(tau1), [1.1, -1.1], atol=1e-12)
        np.testing.assert_allclose(np.asarray(tau2), [1.2, -1.2], atol=1e-12)

    def test_integral_clamp(self):
        state = control.ControlState.zero(1, dtype=jnp.float64)
        for _ in range(100):
            _, state = control.pid_control(
                jnp.asarray([10.0]), jnp.zeros(1), jnp.zeros(1), jnp.zeros(1),
                0.1, 1.0, 1.0, 0.0, state, i_clamp=2.0,
            )
        assert float(state.eint[0]) == pytest.approx(2.0)

    def test_computed_torque_at_goal_is_gravity_feedforward(self, ur5):
        """At the setpoint with zero desired accel, computed torque reduces
        to gravity compensation (control.py:120-194 contract)."""
        q = jnp.asarray([0.3, -0.5, 0.8, 0.1, -0.2, 0.6])
        state = control.ControlState.zero(6, dtype=jnp.float64)
        tau, _ = control.computed_torque_control(
            ur5, q, jnp.zeros(6), jnp.zeros(6), q, jnp.zeros(6),
            G_VEC, 0.01, 100.0, 0.0, 20.0, state,
        )
        np.testing.assert_allclose(
            np.asarray(tau), np.asarray(dynamics.gravity_forces(ur5, q, G_VEC)), atol=1e-9
        )

    def test_feedforward_is_rnea(self, ur5):
        q = jnp.asarray([0.1, 0.2, 0.3, 0.4, 0.5, 0.6])
        dq = jnp.asarray([0.5, -0.3, 0.2, 0.1, 0.0, -0.4])
        ddq = jnp.asarray([1.0, 0.5, -0.5, 0.2, 0.3, -0.1])
        tau = control.feedforward_control(ur5, q, dq, ddq, G_VEC, jnp.zeros(6))
        np.testing.assert_allclose(
            np.asarray(tau), np.asarray(dynamics.rnea(ur5, q, dq, ddq, G_VEC)), atol=1e-10
        )

    def test_cartesian_space_control_direction(self, ur5):
        """Task-space PD must pull the EE toward the goal: tau^T J_v^T p_err > 0."""
        from manipulapy_tpu.kinematics import forward_kinematics, jacobian

        q = jnp.asarray([0.2, -0.4, 0.6, 0.1, -0.3, 0.2])
        T = forward_kinematics(ur5, q)
        p_goal = T[:3, 3] + jnp.asarray([0.05, 0.0, 0.05])
        tau = control.cartesian_space_control(ur5, p_goal, q, jnp.zeros(6), 50.0, 5.0)
        J_v = jacobian(ur5, q)[3:, :]
        v = np.asarray(J_v @ dynamics.forward_dynamics(ur5, q, jnp.zeros(6), tau, jnp.zeros(3)))
        p_err = np.asarray(p_goal - T[:3, 3])
        assert v @ p_err > 0


class TestClosedLoop:
    def test_computed_torque_tracks_setpoint(self, ur5):
        """Closed-loop regulation: from rest offset, the computed-torque
        loop settles at the setpoint (the behavior the reference's Examples
        demonstrate)."""
        q_des = jnp.asarray([0.3, -0.5, 0.7, 0.1, -0.2, 0.4])
        dt = 0.005

        def loop(carry, _):
            q, dq, state = carry
            tau, state = control.computed_torque_control(
                ur5, q_des, jnp.zeros(6), jnp.zeros(6), q, dq,
                G_VEC, dt, 120.0, 2.0, 25.0, state,
            )
            ddq = dynamics.forward_dynamics_fast(ur5, q, dq, tau, G_VEC)
            dq = dq + ddq * dt
            q = q + dq * dt
            return (q, dq, state), None

        q0 = q_des + 0.2
        init = (q0, jnp.zeros(6, dtype=jnp.float64), control.ControlState.zero(6, dtype=jnp.float64))
        (q_f, dq_f, _), _ = jax.lax.scan(loop, init, None, length=600)
        np.testing.assert_allclose(np.asarray(q_f), np.asarray(q_des), atol=1e-2)
        assert np.abs(np.asarray(dq_f)).max() < 0.05


class TestKalman:
    def test_predict_update_converges_to_measurement(self, ur5):
        q = jnp.asarray([0.1, -0.2, 0.3, 0.0, 0.1, -0.1])
        state = control.KalmanState.initial(q + 0.3, jnp.zeros(6), p0=1.0)
        Q = jnp.eye(12, dtype=jnp.float64) * 1e-5
        R = jnp.eye(12, dtype=jnp.float64) * 1e-3
        z = jnp.concatenate([q, jnp.zeros(6)])
        tau_g = dynamics.gravity_forces(ur5, q, G_VEC)
        for _ in range(10):
            state = control.kalman_filter_control(
                ur5, state, tau_g, z, G_VEC, jnp.zeros(6), 0.01, Q, R
            )
        np.testing.assert_allclose(np.asarray(state.x_hat[:6]), np.asarray(q), atol=5e-2)

    def test_update_pulls_toward_measurement(self):
        state = control.KalmanState(
            x_hat=jnp.zeros(4, dtype=jnp.float64), P=jnp.eye(4, dtype=jnp.float64)
        )
        z = jnp.ones(4, dtype=jnp.float64)
        new = control.kalman_filter_update(state, z, jnp.eye(4, dtype=jnp.float64) * 1e-6)
        np.testing.assert_allclose(np.asarray(new.x_hat), 1.0, atol=1e-4)


class TestTuningMetrics:
    def test_ziegler_nichols_tables(self):
        Kp, Ki, Kd = control.ziegler_nichols_tuning(10.0, 2.0, "PID")
        assert float(Kp) == pytest.approx(6.0)
        assert float(Ki) == pytest.approx(6.0)
        assert float(Kd) == pytest.approx(1.5)
        Kp, Ki, Kd = control.ziegler_nichols_tuning(10.0, 2.0, "P")
        assert (float(Kp), float(Ki), float(Kd)) == (5.0, 0.0, 0.0)
        with pytest.raises(ValueError):
            control.ziegler_nichols_tuning(1.0, 1.0, "LQR")
        # PI row matches the reference's table exactly (control.py:961):
        # Ki = 1.2 * Ku / Tu (NOT 1.2 * Kp / Tu).
        Kp, Ki, Kd = control.ziegler_nichols_tuning(10.0, 2.0, "PI")
        assert float(Kp) == pytest.approx(4.5)
        assert float(Ki) == pytest.approx(6.0)
        assert float(Kd) == 0.0

    def test_tu_validation(self):
        """Reference control.py:952-958: PI/PID reject Tu <= 0 / non-finite."""
        for bad in (0.0, -1.0, float("nan"), float("inf")):
            with pytest.raises(ValueError):
                control.ziegler_nichols_tuning(10.0, bad, "PID")
        # P-only tuning never touches Tu.
        control.ziegler_nichols_tuning(10.0, 0.0, "P")

    def test_tune_controller_broadcast(self):
        Kp, Ki, Kd = control.tune_controller(10.0, 2.0, "PID", n=6)
        assert Kp.shape == Ki.shape == Kd.shape == (6,)
        np.testing.assert_allclose(np.asarray(Kp), 6.0)
        with pytest.raises(ValueError):
            control.tune_controller(10.0, 0.0, "PID")

    def test_step_metrics_on_synthetic_response(self):
        """Second-order-ish response with known overshoot."""
        t = jnp.asarray(np.linspace(0, 10, 2001))
        zeta, wn = 0.5, 2.0
        wd = wn * np.sqrt(1 - zeta**2)
        y = 1 - np.exp(-zeta * wn * np.asarray(t)) * (
            np.cos(wd * np.asarray(t)) + zeta / np.sqrt(1 - zeta**2) * np.sin(wd * np.asarray(t))
        )
        m = control.step_response_metrics(t, jnp.asarray(y), 1.0)
        expected_os = 100 * np.exp(-np.pi * zeta / np.sqrt(1 - zeta**2))
        assert float(m["percent_overshoot"]) == pytest.approx(expected_os, rel=0.05)
        assert 0.5 < float(m["rise_time"]) < 1.2
        assert float(m["steady_state_error"]) < 1e-3

    def test_enforce_limits(self, ur5):
        q, dq, tau = control.enforce_limits(
            ur5, jnp.full(6, 100.0), jnp.full(6, 100.0), jnp.full(6, 1e4)
        )
        assert np.all(np.asarray(q) <= np.asarray(ur5.joint_upper) + 1e-9)
        assert np.all(np.asarray(dq) <= np.asarray(ur5.velocity_limit) + 1e-9)
        assert np.all(np.asarray(tau) <= np.asarray(ur5.torque_limit) + 1e-9)

    def test_find_ultimate_gain(self, planar2):
        """A sweep that genuinely sustains oscillation (Kp >= 20 rings
        through the whole 6 s window on the 2R arm) yields Ku, Tu > 0."""
        Ku, Tu = control.find_ultimate_gain_and_period(
            planar2,
            jnp.zeros(2, dtype=jnp.float64),
            jnp.asarray([0.5, -0.3]),
            jnp.zeros(3),
            steps=600,
            Kp_start=20.0,
            num_gains=8,
        )
        assert float(Ku) >= 20.0
        assert float(Tu) > 0

    def test_find_ultimate_gain_no_oscillation_signals_zero(self, planar2):
        """A sweep whose gains never sustain oscillation returns Tu == 0
        — the documented no-oscillation signal ziegler_nichols_tuning
        checks (the old fallback returned dt*steps, so the guard could
        never fire and bogus Z-N gains flowed through silently)."""
        _, Tu = control.find_ultimate_gain_and_period(
            planar2,
            jnp.zeros(2, dtype=jnp.float64),
            jnp.asarray([0.5, -0.3]),
            jnp.zeros(3),
            steps=200,
            num_gains=12,
        )
        assert float(Tu) == 0.0
