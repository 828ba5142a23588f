"""Pallas kernel parity tests (interpret mode on CPU; compiled on TPU).

The same discipline as the reference's GPU<->CPU consistency checks
(``path_planning.py:2620-2632``): the hand-written kernel must match the
jnp reference implementation to f32 roundoff.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manipulapy_tpu.core.time_scaling import scaling_profile
from manipulapy_tpu.ops.pallas_kernels import (
    cartesian_potential_pallas,
    pallas_available,
    trajectory_pallas,
)
from manipulapy_tpu.potential_field import cartesian_potential_field

INTERP = not pallas_available()


class TestTrajectoryKernel:
    @pytest.mark.parametrize("method", [3, 5, 1])
    def test_matches_reference_profile(self, method):
        B, J, N, Tf = 3, 6, 300, 2.0
        rng = np.random.default_rng(0)
        start = jnp.asarray(rng.uniform(-1, 1, (B, J)), dtype=jnp.float32)
        end = jnp.asarray(rng.uniform(-1, 1, (B, J)), dtype=jnp.float32)
        pos, vel, acc = trajectory_pallas(start, end, Tf, N, method, interpret=INTERP)

        s, sd, sdd = scaling_profile(Tf, N, method, dtype=jnp.float32)
        delta = end - start
        pos_ref = start[:, None, :] + s[None, :, None] * delta[:, None, :]
        vel_ref = sd[None, :, None] * delta[:, None, :]
        acc_ref = sdd[None, :, None] * delta[:, None, :]
        np.testing.assert_allclose(np.asarray(pos), np.asarray(pos_ref), atol=2e-6)
        np.testing.assert_allclose(np.asarray(vel), np.asarray(vel_ref), atol=2e-5)
        np.testing.assert_allclose(np.asarray(acc), np.asarray(acc_ref), atol=2e-4)

    def test_boundary_conditions(self):
        start = jnp.zeros((1, 4), dtype=jnp.float32)
        end = jnp.full((1, 4), 1.0, dtype=jnp.float32)
        pos, vel, acc = trajectory_pallas(start, end, 1.5, 128, 5, interpret=INTERP)
        np.testing.assert_allclose(np.asarray(pos[0, 0]), 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(pos[0, -1]), 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(vel[0, 0]), 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(vel[0, -1]), 0.0, atol=1e-5)

    def test_non_divisible_N(self):
        """N not a multiple of the lane tile exercises the padded block."""
        start = jnp.zeros((2, 3), dtype=jnp.float32)
        end = jnp.ones((2, 3), dtype=jnp.float32)
        pos, _, _ = trajectory_pallas(start, end, 1.0, 101, 3, interpret=INTERP)
        assert pos.shape == (2, 101, 3)
        np.testing.assert_allclose(np.asarray(pos[:, -1]), 1.0, atol=1e-6)


class TestPotentialKernel:
    def test_matches_reference(self):
        rng = np.random.default_rng(1)
        P, O = 400, 5
        pts = jnp.asarray(rng.uniform(-1, 1, (P, 3)), dtype=jnp.float32)
        goal = jnp.asarray([0.3, -0.2, 0.5], dtype=jnp.float32)
        obstacles = jnp.asarray(rng.uniform(-1, 1, (O, 3)), dtype=jnp.float32)
        U, g = cartesian_potential_pallas(pts, goal, obstacles, 0.6, interpret=INTERP)
        U_ref, g_ref = cartesian_potential_field(pts, goal, obstacles, 0.6)
        np.testing.assert_allclose(np.asarray(U), np.asarray(U_ref), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-4, atol=1e-4)

    def test_outside_influence_is_attractive_only(self):
        pts = jnp.asarray([[2.0, 0.0, 0.0]], dtype=jnp.float32)
        goal = jnp.zeros(3, dtype=jnp.float32)
        obstacles = jnp.asarray([[-2.0, 0.0, 0.0]], dtype=jnp.float32)
        U, g = cartesian_potential_pallas(pts, goal, obstacles, 0.5, interpret=INTERP)
        assert float(U[0]) == pytest.approx(2.0)  # 0.5 * |p|^2
        np.testing.assert_allclose(np.asarray(g[0]), [2.0, 0.0, 0.0], atol=1e-6)
