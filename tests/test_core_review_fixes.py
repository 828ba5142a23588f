"""Regression tests for the round-5 core review findings (trajectory /
fd_step / ilqr / host-array registry)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manipulapy_tpu.models import catalog
from manipulapy_tpu.models.robot import host_arrays
from manipulapy_tpu.ops.fd_step import build_fd_step
from manipulapy_tpu.trajectory import forward_dynamics_trajectory


@pytest.fixture(scope="module")
def ur5():
    return catalog.ur5(dtype=jnp.float64)


class TestHostArrayRegistry:
    def test_replace_derivative_misses_registry(self, ur5):
        """A dataclasses.replace derivative must NOT be served the
        original model's host arrays (it silently clamped fused engines
        to pre-override joint limits)."""
        assert host_arrays(ur5) is not None
        derived = dataclasses.replace(
            ur5,
            joint_lower=jnp.full(6, -0.5, ur5.dtype),
            joint_upper=jnp.full(6, 0.5, ur5.dtype),
        )
        assert host_arrays(derived) is None  # falls back to device_get

    def test_fused_step_respects_overridden_limits(self, ur5):
        """The fused cgen step built from a limit-overridden model clamps
        to the OVERRIDE, matching the generic path."""
        tight = dataclasses.replace(
            ur5,
            joint_lower=jnp.full(6, -0.1, ur5.dtype),
            joint_upper=jnp.full(6, 0.1, ur5.dtype),
        )
        step = build_fd_step(tight, dt=0.5, clip_limits=True, clip_velocity=False)
        q = jnp.zeros(6)
        dq = jnp.full(6, 10.0)  # huge velocity: q would leave [-0.1, 0.1]
        q_new, dq_new, _ = step(q, dq, jnp.zeros(6))
        assert float(jnp.max(q_new)) <= 0.1 + 1e-9
        assert float(jnp.min(q_new)) >= -0.1 - 1e-9

    def test_urdf_processor_joint_limits_override(self):
        """End-to-end through the public facade: URDFToRobotModel's
        documented joint_limits override reaches the fused engines."""
        from manipulapy_tpu.urdf.processor import URDFToRobotModel

        lo = np.full(6, -0.2)
        hi = np.full(6, 0.2)
        proc = URDFToRobotModel("ur5", joint_limits=(lo, hi))
        model = proc.model
        np.testing.assert_allclose(np.asarray(model.joint_lower), lo, atol=1e-6)
        step = build_fd_step(model, dt=0.5, clip_limits=True, clip_velocity=False)
        q_new, _, _ = step(jnp.zeros(6, model.dtype), jnp.full(6, 10.0, model.dtype),
                           jnp.zeros(6, model.dtype))
        assert float(jnp.max(np.abs(np.asarray(q_new)))) <= 0.2 + 1e-5


class TestClipSemantics:
    def test_clip_velocity_independent_of_clip_limits(self, ur5):
        step = build_fd_step(ur5, dt=0.1, clip_limits=False, clip_velocity=True)
        q = jnp.zeros(6)
        dq = jnp.full(6, 50.0)  # far beyond the UR5 velocity limit (pi)
        _, dq_new, _ = step(q, dq, jnp.zeros(6))
        assert bool(jnp.all(jnp.abs(dq_new) <= ur5.velocity_limit + 1e-9))


class TestTrajectoryContracts:
    def test_unbatched_constant_tip_wrench_broadcasts(self, ur5):
        q0 = jnp.zeros(6)
        dq0 = jnp.zeros(6)
        taus = jnp.zeros((10, 6))
        F = jnp.asarray([0.0, 0.0, 0.0, 0.0, 0.0, -5.0])
        qs_const, dqs_const, _ = forward_dynamics_trajectory(
            ur5, q0, dq0, taus, Ftipmat=F, dt=0.01
        )
        qs_tiled, dqs_tiled, _ = forward_dynamics_trajectory(
            ur5, q0, dq0, taus, Ftipmat=jnp.tile(F, (10, 1)), dt=0.01
        )
        np.testing.assert_allclose(np.asarray(qs_const), np.asarray(qs_tiled), atol=1e-12)
        # and the wrench actually does something
        qs_free, _, _ = forward_dynamics_trajectory(ur5, q0, dq0, taus, dt=0.01)
        assert float(jnp.abs(qs_const - qs_free).max()) > 1e-9

    def test_intres_zero_raises_clearly(self, ur5):
        with pytest.raises(ValueError, match="intRes must be >= 1"):
            forward_dynamics_trajectory(
                ur5, jnp.zeros(6), jnp.zeros(6), jnp.zeros((5, 6)), intRes=0
            )


class TestStepFnBatching:
    def test_generic_step_fn_handles_batched_states(self, ur5):
        from manipulapy_tpu.mpc import make_step_fn

        step = make_step_fn(ur5, dt=0.01, fused=False)
        x = jnp.zeros((4, 12))
        u = jnp.zeros((4, 6))
        out = step(x, u)
        assert out.shape == (4, 12)
        # matches the fused variant
        step_f = make_step_fn(ur5, dt=0.01, fused=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(step_f(x, u)), atol=1e-8
        )
