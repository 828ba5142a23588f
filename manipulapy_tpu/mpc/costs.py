"""Cost library for the MPC solver.

Bridges the reference's cost-like ingredients into differentiable MPC
costs: joint-space quadratic tracking (the computed-torque error metric,
``control.py:120-194``), task-space pose costs through the SE(3) log (the
IK geometric error, ``kinematics.py:282-332``), and potential-field
obstacle costs (``potential_field.py:86-153``).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

from ..core import lie
from ..kinematics import forward_kinematics
from ..models.robot import RobotModel
from ..potential_field import LinkSpheres, obstacle_clearance

__all__ = [
    "quadratic_tracking_cost",
    "pose_tracking_cost",
    "obstacle_cost",
    "make_tracking_costs",
]


def quadratic_tracking_cost(
    x_ref: jnp.ndarray,
    w_q: float = 1.0,
    w_dq: float = 0.1,
    w_u: float = 1e-4,
):
    """Running cost ``l(x, u, t)`` tracking a (H+1, 2n) state reference.

    ``x_ref`` may also be a single (2n,) goal state (broadcast over t).
    """
    x_ref = jnp.asarray(x_ref)

    def cost(x, u, t):
        ref = x_ref if x_ref.ndim == 1 else x_ref[t]
        n = x.shape[-1] // 2
        dq_err = x - ref
        return (
            w_q * jnp.sum(dq_err[:n] ** 2)
            + w_dq * jnp.sum(dq_err[n:] ** 2)
            + w_u * jnp.sum(u**2)
        )

    return cost


def pose_tracking_cost(
    model: RobotModel,
    T_goal: jnp.ndarray,
    w_pos: float = 100.0,
    w_rot: float = 10.0,
    w_dq: float = 0.01,
    w_u: float = 1e-5,
):
    """Task-space running cost: squared SE(3) log error of the EE pose.

    Differentiates through FK and the (gradient-safe) log map — the
    reason :mod:`core.lie` keeps its small-angle branches autodiff-clean.
    """

    def cost(x, u, t):
        n = x.shape[-1] // 2
        T = forward_kinematics(model, x[:n])
        err = lie.se3_log(lie.trans_inv(T_goal) @ T)
        return (
            w_rot * jnp.sum(err[:3] ** 2)
            + w_pos * jnp.sum(err[3:] ** 2)
            + w_dq * jnp.sum(x[n:] ** 2)
            + w_u * jnp.sum(u**2)
        )

    return cost


def obstacle_cost(
    model: RobotModel,
    spheres: LinkSpheres,
    obstacle_points: jnp.ndarray,
    weight: float = 100.0,
    margin: float = 0.05,
):
    """Hinge-squared clearance penalty over link spheres vs point
    obstacles — the differentiable MPC form of the repulsive potential
    (``potential_field.py:94-110``)."""

    def cost(x, u, t):
        n_joints = model.num_joints
        clear = obstacle_clearance(model, x[:n_joints], spheres, obstacle_points)
        viol = jnp.minimum(clear - margin, 0.0)
        return weight * jnp.sum(viol * viol)

    return cost


def make_tracking_costs(
    model: RobotModel,
    q_goal: jnp.ndarray,
    w_q: float = 10.0,
    w_dq: float = 0.5,
    w_u: float = 1e-4,
    w_terminal: float = 100.0,
    extra_cost: Optional[Callable] = None,
):
    """(running, terminal) cost pair steering to a joint-space goal at
    rest — the standard MPC setup for BASELINE config #3."""
    x_goal = jnp.concatenate([q_goal, jnp.zeros_like(q_goal)])
    base = quadratic_tracking_cost(x_goal, w_q, w_dq, w_u)

    def running(x, u, t):
        c = base(x, u, t)
        if extra_cost is not None:
            c = c + extra_cost(x, u, t)
        return c

    def terminal(x):
        n = q_goal.shape[-1]
        err = x - x_goal
        return w_terminal * (jnp.sum(err[:n] ** 2) + 0.1 * jnp.sum(err[n:] ** 2))

    return running, terminal
