"""MPC solver tests: the iLQR loop must actually solve control problems
(regulation on the 2R arm, cost decrease, control-limit respect) and the
receding-horizon step must track (BASELINE config #3 shape, tiny sizes
for CI)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manipulapy_tpu import dynamics
from manipulapy_tpu.mpc import (
    ILQRParams,
    ilqr,
    make_step_fn,
    make_tracking_costs,
    mpc_step,
    quadratic_tracking_cost,
)

G0 = jnp.zeros(3)  # gravity-free keeps the toy problems well-conditioned


@pytest.fixture(scope="module")
def planar2_f64():
    from manipulapy_tpu.models import catalog

    return catalog.two_link_planar(dtype=jnp.float64)


class TestILQRLinearSystem:
    def test_solves_double_integrator(self):
        """Sanity on a known LQR problem: 1-D double integrator reaches
        the origin."""
        dt = 0.1

        def step(x, u):
            p, v = x[0], x[1]
            v2 = v + u[0] * dt
            return jnp.asarray([p + v2 * dt, v2])

        cost = quadratic_tracking_cost(jnp.zeros(2), w_q=1.0, w_dq=0.1, w_u=1e-3)

        def terminal(x):
            return 10.0 * jnp.sum(x**2)

        params = ILQRParams(horizon=30, dt=dt, iterations=15)
        x0 = jnp.asarray([2.0, 0.0])
        res = ilqr(step, cost, terminal, x0, jnp.zeros((30, 1)), params)
        assert float(jnp.abs(res.xs[-1][0])) < 0.1
        assert np.isfinite(float(res.cost))


class TestILQRManipulator:
    def test_regulates_to_goal(self, planar2_f64):
        model = planar2_f64
        params = ILQRParams(horizon=25, dt=0.05, iterations=12)
        step = make_step_fn(model, params.dt, g=G0)
        q_goal = jnp.asarray([0.6, -0.4])
        running, terminal = make_tracking_costs(model, q_goal, w_terminal=500.0)
        x0 = jnp.zeros(4, dtype=jnp.float64)
        res = ilqr(step, running, terminal, x0, jnp.zeros((25, 2), dtype=jnp.float64), params)
        q_final = np.asarray(res.xs[-1][:2])
        np.testing.assert_allclose(q_final, np.asarray(q_goal), atol=0.05)

    def test_cost_decreases_from_init(self, planar2_f64):
        model = planar2_f64
        params = ILQRParams(horizon=20, dt=0.05, iterations=8)
        step = make_step_fn(model, params.dt, g=G0)
        running, terminal = make_tracking_costs(model, jnp.asarray([0.5, 0.5]))
        x0 = jnp.zeros(4, dtype=jnp.float64)
        us0 = jnp.zeros((20, 2), dtype=jnp.float64)

        # Initial rollout cost:
        from manipulapy_tpu.mpc.ilqr import _rollout

        xs0 = _rollout(step, x0, us0)
        ts = jnp.arange(20)
        c0 = float(
            jnp.sum(jax.vmap(running)(xs0[:-1], us0, ts)) + terminal(xs0[-1])
        )
        res = ilqr(step, running, terminal, x0, us0, params)
        assert float(res.cost) < c0

    def test_respects_control_limits(self, planar2_f64):
        model = planar2_f64
        params = ILQRParams(horizon=15, dt=0.05, iterations=6)
        step = make_step_fn(model, params.dt, g=G0)
        running, terminal = make_tracking_costs(model, jnp.asarray([1.5, -1.5]))
        u_max = jnp.asarray([3.0, 3.0])
        res = ilqr(
            step, running, terminal, jnp.zeros(4, dtype=jnp.float64),
            jnp.zeros((15, 2), dtype=jnp.float64), params,
            u_min=-u_max, u_max=u_max,
        )
        us = np.asarray(res.us)
        assert np.all(us <= 3.0 + 1e-9) and np.all(us >= -3.0 - 1e-9)

    def test_batched_solves_vmap(self, planar2_f64):
        """Scenario batching: vmapped solves agree with individual ones."""
        model = planar2_f64
        params = ILQRParams(horizon=10, dt=0.05, iterations=4)
        step = make_step_fn(model, params.dt, g=G0)
        goals = jnp.asarray([[0.3, -0.2], [-0.4, 0.5]])

        def solve(qg):
            running, terminal = make_tracking_costs(model, qg)
            return ilqr(
                step, running, terminal, jnp.zeros(4, dtype=jnp.float64),
                jnp.zeros((10, 2), dtype=jnp.float64), params,
            ).cost

        # NOTE: make_tracking_costs closes over qg; vmap via explicit cost.
        def solve_traced(qg):
            x_goal = jnp.concatenate([qg, jnp.zeros_like(qg)])
            running = quadratic_tracking_cost(x_goal, 10.0, 0.5, 1e-4)

            def terminal(x):
                err = x - x_goal
                return 100.0 * (jnp.sum(err[:2] ** 2) + 0.1 * jnp.sum(err[2:] ** 2))

            return ilqr(
                step, running, terminal, jnp.zeros(4, dtype=jnp.float64),
                jnp.zeros((10, 2), dtype=jnp.float64), params,
            ).cost

        batched = jax.vmap(solve_traced)(goals)
        for i in range(2):
            np.testing.assert_allclose(
                float(batched[i]), float(solve_traced(goals[i])), rtol=1e-6
            )


class TestMPCLoop:
    def test_receding_horizon_tracks(self, planar2_f64):
        """Closed receding-horizon loop drives the arm to the goal — the
        full MPC behavior at toy scale."""
        model = planar2_f64
        params = ILQRParams(horizon=12, dt=0.05, iterations=4)
        step = make_step_fn(model, params.dt, g=G0)
        q_goal = jnp.asarray([0.5, -0.3])
        running, terminal = make_tracking_costs(model, q_goal, w_terminal=300.0)

        x = jnp.zeros(4, dtype=jnp.float64)
        us = jnp.zeros((12, 2), dtype=jnp.float64)
        for _ in range(25):
            u, us, _ = mpc_step(step, running, terminal, x, us, params)
            x = step(x, u)
        np.testing.assert_allclose(np.asarray(x[:2]), np.asarray(q_goal), atol=0.05)
        assert np.abs(np.asarray(x[2:])).max() < 0.2
