"""Planner facade tests (reference: OptimizedTrajectoryPlanning surface,
tests/test_trajectory_planning.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from manipulapy_tpu.planner import TrajectoryPlanner, create_planner
from manipulapy_tpu.potential_field import link_positions, default_link_spheres, obstacle_clearance


class TestPlannerFacade:
    def test_joint_trajectory_boundaries(self, ur5):
        p = TrajectoryPlanner(ur5)
        q0 = jnp.zeros(6, dtype=jnp.float64)
        q1 = jnp.asarray([0.5, -0.4, 0.3, 0.2, -0.1, 0.6], dtype=jnp.float64)
        t = p.joint_trajectory(q0, q1, 2.0, 100)
        np.testing.assert_allclose(np.asarray(t.position[0]), np.asarray(q0), atol=1e-12)
        np.testing.assert_allclose(np.asarray(t.position[-1]), np.asarray(q1), atol=1e-12)
        np.testing.assert_allclose(np.asarray(t.velocity[0]), 0, atol=1e-9)
        np.testing.assert_allclose(np.asarray(t.velocity[-1]), 0, atol=1e-9)

    def test_performance_stats_accumulate(self, ur5):
        p = TrajectoryPlanner(ur5)
        q1 = jnp.full((6,), 0.3, dtype=jnp.float64)
        for _ in range(3):
            p.joint_trajectory(jnp.zeros(6, dtype=jnp.float64), q1, 1.0, 50)
        s = p.get_performance_stats()
        assert s["calls"] == 3
        assert s["steady_calls"] == 2
        assert s["per_op"]["joint_trajectory"]["calls"] == 3
        assert s["compile_amortization"] > 1.0  # cached calls beat compile

    def test_batch_and_invdyn(self, ur5):
        p = TrajectoryPlanner(ur5)
        B, N = 4, 30
        q0 = jnp.zeros((B, 6), dtype=jnp.float64)
        q1 = jnp.asarray(np.random.default_rng(0).uniform(-0.5, 0.5, (B, 6)))
        t = p.batch_joint_trajectory(q0, q1, 1.5, N)
        assert t.position.shape == (B, N, 6)
        tau = p.inverse_dynamics_trajectory(t.position, t.velocity, t.acceleration)
        assert tau.shape == (B, N, 6)
        assert np.isfinite(np.asarray(tau)).all()

    def test_cartesian_trajectory(self, ur5):
        from manipulapy_tpu.kinematics import forward_kinematics

        p = TrajectoryPlanner(ur5)
        X0 = forward_kinematics(ur5, jnp.zeros(6, dtype=jnp.float64))
        X1 = forward_kinematics(ur5, jnp.full((6,), 0.4, dtype=jnp.float64))
        poses, vel, acc = p.cartesian_trajectory(X0, X1, 2.0, 50)
        assert poses.shape == (50, 4, 4)
        np.testing.assert_allclose(np.asarray(poses[0]), np.asarray(X0), atol=1e-10)
        np.testing.assert_allclose(np.asarray(poses[-1]), np.asarray(X1), atol=1e-10)

    def test_forward_dynamics_trajectory(self, planar2):
        p = TrajectoryPlanner(planar2)
        N = 20
        taus = jnp.zeros((N, 2), dtype=jnp.float64)
        qs, dqs, ddqs = p.forward_dynamics_trajectory(
            jnp.asarray([0.3, 0.2], dtype=jnp.float64),
            jnp.zeros(2, dtype=jnp.float64),
            taus,
            g=(0.0, 0.0, 0.0),
        )
        # Zero torque, zero gravity: state stays put.
        np.testing.assert_allclose(np.asarray(qs[-1]), [0.3, 0.2], atol=1e-10)

    def test_self_collision_query(self, ur5):
        p = TrajectoryPlanner(ur5)
        colliding, clearance = p.check_self_collision(jnp.zeros(6, dtype=jnp.float64))
        assert isinstance(colliding, bool)
        assert clearance > 0


class TestPlanTrajectory:
    def test_endpoints_pinned(self, ur5):
        p = TrajectoryPlanner(ur5)
        q0 = jnp.zeros(6, dtype=jnp.float64)
        q1 = jnp.asarray([0.4, -0.3, 0.5, 0.1, 0.0, 0.2], dtype=jnp.float64)
        wps = p.plan_trajectory(q0, q1, num_waypoints=7)
        assert wps.shape == (7, 6)
        np.testing.assert_allclose(np.asarray(wps[0]), np.asarray(q0), atol=1e-12)
        np.testing.assert_allclose(np.asarray(wps[-1]), np.asarray(q1), atol=1e-12)

    def test_avoids_obstacle_on_path(self, ur5):
        q0 = jnp.zeros(6, dtype=jnp.float64)
        q1 = jnp.asarray([0.6, -0.5, 0.5, 0.0, 0.0, 0.0], dtype=jnp.float64)
        q_mid = 0.5 * (q0 + q1)
        obstacle = link_positions(ur5, q_mid)[3][None, :]
        p = create_planner(ur5, obstacle_points=np.asarray(obstacle), sphere_radius=0.05)
        wps = p.plan_trajectory(q0, q1, num_waypoints=9, descent_steps=200, step_size=0.02)
        spheres = default_link_spheres(ur5, radius=0.05)
        straight = jnp.linspace(q0, q1, 9)
        worst_before = min(
            float(jnp.min(obstacle_clearance(ur5, q, spheres, obstacle))) for q in straight[1:-1]
        )
        worst_after = min(
            float(jnp.min(obstacle_clearance(ur5, q, spheres, obstacle))) for q in wps[1:-1]
        )
        assert worst_before < 0
        assert worst_after > worst_before

    def test_collision_avoidance_in_joint_trajectory(self, ur5):
        q1 = jnp.asarray([0.5, -0.4, 0.4, 0.0, 0.0, 0.0], dtype=jnp.float64)
        q_mid = 0.5 * q1
        obstacle = np.asarray(link_positions(ur5, q_mid)[3][None, :])
        p = create_planner(ur5, obstacle_points=obstacle, sphere_radius=0.05)
        t = p.joint_trajectory(jnp.zeros(6, dtype=jnp.float64), q1, 1.0, 20, avoid_collisions=True)
        assert t.position.shape == (20, 6)
        assert "collision_avoidance" in p.performance_stats["per_op"]
