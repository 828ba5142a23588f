"""Fleet MPC (BASELINE config #5): heterogeneous robots x scenarios.

Validates the padding algebra (padded joints are exact no-ops for FK,
RNEA, and the mass-matrix solve), the fleet rollout, and the distributed
MPC round with its psum fleet-cost reduction on the virtual 8-device mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manipulapy_tpu.dynamics import forward_dynamics_fast
from manipulapy_tpu.kinematics import forward_kinematics
from manipulapy_tpu.models import catalog
from manipulapy_tpu.mpc import ILQRParams
from manipulapy_tpu.parallel import (
    Fleet,
    fleet_ilqr_solve,
    fleet_mpc_round,
    fleet_rollout,
    make_mesh,
    masked_forward_dynamics,
    stack_models,
)


@pytest.fixture(scope="module")
def fleet():
    models = [
        catalog.ur5(dtype=jnp.float64),
        catalog.panda(dtype=jnp.float64),
        catalog.two_link_planar(dtype=jnp.float64),
    ]
    return stack_models(models), models


class TestStacking:
    def test_shapes_and_mask(self, fleet):
        fl, models = fleet
        n_max = max(m.num_joints for m in models)
        assert fl.num_robots == 3
        assert fl.num_joints == n_max == 7
        assert fl.model.screws_space.shape == (3, 7, 6)
        np.testing.assert_array_equal(
            np.asarray(jnp.sum(fl.mask, axis=1)), [6, 7, 2]
        )

    def test_padded_fk_matches_original(self, fleet):
        fl, models = fleet
        for r, m in enumerate(models):
            n = m.num_joints
            q = jnp.asarray(np.random.uniform(-1, 1, n))
            q_pad = jnp.zeros(fl.num_joints).at[:n].set(q)
            model_r, _ = fl.robot(r)
            T_pad = forward_kinematics(model_r, q_pad)
            T_ref = forward_kinematics(m, q)
            np.testing.assert_allclose(np.asarray(T_pad), np.asarray(T_ref), atol=1e-12)

    def test_masked_forward_dynamics_matches_original(self, fleet):
        fl, models = fleet
        for r, m in enumerate(models):
            n = m.num_joints
            q = jnp.asarray(np.random.uniform(-1, 1, n))
            dq = jnp.asarray(np.random.uniform(-0.5, 0.5, n))
            tau = jnp.asarray(np.random.uniform(-5, 5, n))
            nm = fl.num_joints
            pad = lambda v: jnp.zeros(nm).at[:n].set(v)
            model_r, mask_r = fl.robot(r)
            ddq_pad = masked_forward_dynamics(model_r, mask_r, pad(q), pad(dq), pad(tau))
            ddq_ref = forward_dynamics_fast(m, q, dq, tau)
            np.testing.assert_allclose(
                np.asarray(ddq_pad[:n]), np.asarray(ddq_ref), rtol=1e-9, atol=1e-9
            )
            # Padded joints never move.
            np.testing.assert_allclose(np.asarray(ddq_pad[n:]), 0.0, atol=1e-12)

    def test_pad_to_validation(self, fleet):
        _, models = fleet
        with pytest.raises(ValueError):
            stack_models(models, pad_to=3)
        with pytest.raises(ValueError):
            stack_models([])


class TestFleetRollout:
    @pytest.mark.slow
    def test_rollout_shapes_finite(self, fleet):
        fl, _ = fleet
        R, n = fl.num_robots, fl.num_joints
        S, N = 2, 10
        key = jax.random.PRNGKey(0)
        q0 = jax.random.uniform(key, (R, S, n), minval=-0.3, maxval=0.3) * fl.mask[:, None, :]
        dq0 = jnp.zeros((R, S, n))
        taus = jnp.zeros((R, S, N, n))
        qs, dqs = fleet_rollout(fl, q0, dq0, taus, dt=0.005)
        assert qs.shape == (R, S, N, n)
        assert bool(jnp.all(jnp.isfinite(qs)))
        # Padded joints stay exactly at zero through the rollout.
        pad_mask = 1.0 - fl.mask
        assert float(jnp.max(jnp.abs(qs * pad_mask[:, None, None, :]))) == 0.0


@pytest.mark.slow
class TestFleetMPC:
    def test_fleet_ilqr_improves_cost(self, fleet):
        fl, _ = fleet
        R, n = fl.num_robots, fl.num_joints
        S, H = 2, 5
        params = ILQRParams(horizon=H, dt=0.02, iterations=3, line_search_steps=4)
        key = jax.random.PRNGKey(1)
        q_goals = jax.random.uniform(key, (R, S, n), minval=-0.3, maxval=0.3) * fl.mask[:, None, :]
        x0 = jnp.zeros((R, S, 2 * n))
        us0 = jnp.zeros((R, S, H, n))
        res = fleet_ilqr_solve(fl, x0, us0, q_goals, params)
        assert res.us.shape == (R, S, H, n)
        assert bool(jnp.all(jnp.isfinite(res.cost)))
        # Padded controls are pinned to zero by their zero torque limits.
        pad_mask = 1.0 - fl.mask
        assert float(jnp.max(jnp.abs(res.us * pad_mask[:, None, None, :]))) == 0.0

    def test_fleet_mpc_round_distributed(self, fleet):
        fl, _ = fleet
        mesh = make_mesh(8)
        R, n = fl.num_robots, fl.num_joints
        S, H = 8, 4
        params = ILQRParams(horizon=H, dt=0.02, iterations=2, line_search_steps=3)
        key = jax.random.PRNGKey(2)
        q_goals = jax.random.uniform(key, (R, S, n), minval=-0.2, maxval=0.2) * fl.mask[:, None, :]
        x0 = jnp.zeros((R, S, 2 * n))
        us0 = jnp.zeros((R, S, H, n))
        us, costs, fleet_cost = fleet_mpc_round(fl, mesh, x0, us0, q_goals, params)
        assert us.shape == (R, S, H, n)
        assert costs.shape == (R, S)
        assert bool(jnp.isfinite(fleet_cost))
        np.testing.assert_allclose(float(fleet_cost), float(jnp.mean(costs)), rtol=1e-6)

    def test_fleet_mpc_round_rejects_ragged_batch(self, fleet):
        fl, _ = fleet
        mesh = make_mesh(8)
        n = fl.num_joints
        with pytest.raises(ValueError):
            fleet_mpc_round(
                fl,
                mesh,
                jnp.zeros((3, 3, 2 * n)),
                jnp.zeros((3, 3, 2, n)),
                jnp.zeros((3, 3, n)),
                ILQRParams(horizon=2, dt=0.02, iterations=1, line_search_steps=2),
            )
