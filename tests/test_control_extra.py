"""Edge-case and untested-path tests for the control layer (grows
coverage toward the reference's control-module breadth): the
robust/adaptive/feedforward variants, the joint/cartesian wrappers,
the Kalman loop, and clamp/metric semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manipulapy_tpu import control as ctl
from manipulapy_tpu.dynamics import inverse_dynamics, rnea
from manipulapy_tpu.kinematics import forward_kinematics, jacobian
from manipulapy_tpu.models import catalog


@pytest.fixture(scope="module")
def ur5():
    return catalog.ur5(dtype=jnp.float64)


G = (0.0, 0.0, -9.81)
FTIP = jnp.zeros(6, dtype=jnp.float64)
Q = jnp.asarray([0.3, -0.5, 0.7, 0.2, -0.4, 0.6])
DQ = jnp.asarray([0.1, -0.1, 0.2, 0.0, -0.2, 0.1])
DDQ = jnp.asarray([0.5, -0.2, 0.3, 0.1, 0.0, -0.1])


class TestRobustAdaptive:
    def test_robust_zero_disturbance_is_inverse_dynamics(self, ur5):
        tau = ctl.robust_control(ur5, Q, DQ, DDQ, G, FTIP,
                                 disturbance_estimate=jnp.zeros(6),
                                 adaptation_gain=2.0)
        ref = inverse_dynamics(ur5, Q, DQ, DDQ, g=G)
        np.testing.assert_allclose(np.asarray(tau), np.asarray(ref), atol=1e-9)

    def test_robust_linear_in_disturbance(self, ur5):
        d = jnp.asarray([1.0, -2.0, 0.5, 0.0, 3.0, -1.0])
        t0 = ctl.robust_control(ur5, Q, DQ, DDQ, G, FTIP, jnp.zeros(6), 2.0)
        t1 = ctl.robust_control(ur5, Q, DQ, DDQ, G, FTIP, d, 2.0)
        np.testing.assert_allclose(np.asarray(t1 - t0), 2.0 * np.asarray(d), atol=1e-10)

    def test_robust_tip_wrench_through_jacobian(self, ur5):
        F = jnp.asarray([0.0, 0.0, 1.0, 2.0, -1.0, 3.0])
        t0 = ctl.robust_control(ur5, Q, DQ, DDQ, G, FTIP, jnp.zeros(6), 1.0)
        t1 = ctl.robust_control(ur5, Q, DQ, DDQ, G, F, jnp.zeros(6), 1.0)
        np.testing.assert_allclose(
            np.asarray(t1 - t0), np.asarray(jacobian(ur5, Q).T @ F), atol=1e-9
        )

    def test_adaptive_updates_estimate_and_applies_it(self, ur5):
        est0 = jnp.zeros(6)
        err = jnp.asarray([0.1, -0.2, 0.0, 0.3, 0.1, -0.1])
        tau, est1 = ctl.adaptive_control(ur5, Q, DQ, DDQ, G, FTIP,
                                         measurement_error=err,
                                         adaptation_gain=0.5,
                                         parameter_estimate=est0)
        np.testing.assert_allclose(np.asarray(est1), 0.5 * np.asarray(err), atol=1e-12)
        base = rnea(ur5, Q, DQ, DDQ, g=G, f_tip=FTIP)
        np.testing.assert_allclose(np.asarray(tau - base), np.asarray(est1), atol=1e-10)

    def test_adaptive_estimate_accumulates(self, ur5):
        err = jnp.full(6, 0.2)
        est = jnp.zeros(6)
        for _ in range(3):
            _, est = ctl.adaptive_control(ur5, Q, DQ, DDQ, G, FTIP, err, 1.0, est)
        np.testing.assert_allclose(np.asarray(est), 0.6 * np.ones(6), atol=1e-12)


class TestFeedforwardWrappers:
    def test_pd_feedforward_decomposes(self, ur5):
        Kp = jnp.full(6, 30.0)
        Kd = jnp.full(6, 5.0)
        qd, dqd, ddqd = Q + 0.2, DQ * 0.0, DDQ * 0.0
        tau = ctl.pd_feedforward_control(ur5, qd, dqd, ddqd, Q, DQ, G, FTIP, Kp, Kd)
        expect = ctl.feedforward_control(ur5, qd, dqd, ddqd, G, FTIP) + ctl.pd_control(
            qd, dqd, Q, DQ, Kp, Kd
        )
        np.testing.assert_allclose(np.asarray(tau), np.asarray(expect), atol=1e-10)

    def test_joint_space_control_is_setpoint_pd(self, ur5):
        Kp = jnp.full(6, 40.0)
        Kd = jnp.full(6, 8.0)
        tau = ctl.joint_space_control(ur5, Q + 0.3, Q, DQ, Kp, Kd)
        np.testing.assert_allclose(
            np.asarray(tau), np.asarray(Kp * 0.3 - Kd * DQ), atol=1e-10
        )

    def test_cartesian_space_control_zero_at_target_rest(self, ur5):
        p = forward_kinematics(ur5, Q)[:3, 3]
        tau = ctl.cartesian_space_control(ur5, p, Q, jnp.zeros(6),
                                          jnp.full(3, 20.0), jnp.full(3, 4.0))
        np.testing.assert_allclose(np.asarray(tau), np.zeros(6), atol=1e-9)


class TestKalmanLoop:
    def test_filter_control_converges_to_truth(self, ur5):
        """Noisy full-state measurements of a stationary truth: the
        combined predict+update loop contracts covariance and pulls the
        estimate toward the measurements."""
        truth = jnp.concatenate([Q, jnp.zeros(6)])
        state = ctl.KalmanState.initial(Q + 0.3, jnp.full(6, 0.2), p0=1.0)
        Qn = jnp.eye(12) * 1e-5
        Rn = jnp.eye(12) * 1e-3
        tau_hold = ctl.feedforward_control(ur5, Q, jnp.zeros(6), jnp.zeros(6), G, FTIP)
        p_trace0 = float(jnp.trace(state.P))
        rng = np.random.default_rng(1)
        for _ in range(10):
            z = truth + jnp.asarray(rng.normal(0, 1e-3, 12))
            state = ctl.kalman_filter_control(ur5, state, tau_hold, z, G, FTIP,
                                              dt=0.005, Q=Qn, R=Rn)
        assert float(jnp.trace(state.P)) < 0.1 * p_trace0
        err = np.asarray(state.x_hat - truth)
        assert np.linalg.norm(err[:6]) < 0.05

    def test_update_with_tiny_R_snaps_to_measurement(self):
        state = ctl.KalmanState.initial(jnp.ones(3), jnp.zeros(3), p0=1.0)
        z = jnp.asarray([2.0, 3.0, 4.0, 0.1, 0.2, 0.3])
        new = ctl.kalman_filter_update(state, z, jnp.eye(6) * 1e-12)
        np.testing.assert_allclose(np.asarray(new.x_hat), np.asarray(z), atol=1e-6)

    def test_update_with_huge_R_keeps_prior(self):
        state = ctl.KalmanState.initial(jnp.ones(3), jnp.zeros(3), p0=1e-6)
        z = jnp.full(6, 100.0)
        new = ctl.kalman_filter_update(state, z, jnp.eye(6) * 1e6)
        np.testing.assert_allclose(
            np.asarray(new.x_hat), np.asarray(state.x_hat), atol=1e-3
        )


class TestStateAndJit:
    def test_integral_anti_windup(self):
        state = ctl.ControlState.zero(3, dtype=jnp.float64)
        for _ in range(100):
            _, state = ctl.pid_control(
                jnp.ones(3), jnp.zeros(3), jnp.zeros(3), jnp.zeros(3),
                dt=0.1, Kp=1.0, Ki=1.0, Kd=0.0, state=state, i_clamp=0.5,
            )
        np.testing.assert_allclose(np.asarray(state.eint), 0.5 * np.ones(3), atol=1e-12)

    def test_computed_torque_jittable_loop(self, ur5):
        state = ctl.ControlState.zero(6, dtype=jnp.float64)
        Kp, Ki, Kd = jnp.full(6, 50.0), jnp.full(6, 1.0), jnp.full(6, 10.0)

        @jax.jit
        def step(q, dq, st):
            return ctl.computed_torque_control(
                ur5, Q + 0.2, jnp.zeros(6), jnp.zeros(6), q, dq, G,
                0.01, Kp, Ki, Kd, st,
            )

        tau, st2 = step(Q, DQ, state)
        assert np.all(np.isfinite(np.asarray(tau)))
        assert not np.allclose(np.asarray(st2.eint), 0.0)
