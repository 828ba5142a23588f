"""Trajectory generation and trajectory-level dynamics, fully batched.

Capability parity with the reference's planning layer
(``ManipulaPy/path_planning.py``, ``cuda_kernels.py`` trajectory kernels),
redesigned for XLA:

* The reference ships *five* hand-tuned CUDA kernel variants plus an
  occupancy autotuner for the same time-scaling math
  (``cuda_kernels.py:780-1144, 1686-1896``). Here there is ONE jitted
  formulation — an outer product of the scaling profile with the joint
  delta — which XLA fuses and tiles; batching over (B, N, J) replaces the
  3D CUDA grid (``cuda_kernels.py:1473-1541``).
* ``inverse_dynamics_trajectory`` runs the *exact* dynamics vmapped over
  every waypoint in one launch. The reference either loops the exact CPU
  path serially (~1.19 ms x N, ``path_planning.py:1202-1263``) or uses a
  deliberately simplified per-joint GPU kernel (``cuda_kernels.py:
  1147-1228``). Exactness here is the headline improvement.
* ``forward_dynamics_trajectory`` is a ``lax.scan`` over time with
  ``intRes`` Euler sub-steps and the reference's joint-limit clamp
  placement (``path_planning.py:1479-1503``) reproduced inside the step.
* Joint-limit clipping of generated trajectories is applied post-hoc to
  positions only, exactly like the reference (``path_planning.py:630-636``).

All functions are pure; batch axes lead. ``method`` and ``N`` are static.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .core import lie
from .core.time_scaling import scaling_profile
from .dynamics import forward_dynamics_fast, inverse_dynamics, rnea
from .models.robot import RobotModel

__all__ = [
    "Trajectory",
    "joint_trajectory",
    "batch_joint_trajectory",
    "cartesian_trajectory",
    "inverse_dynamics_trajectory",
    "forward_dynamics_trajectory",
]


class Trajectory(NamedTuple):
    """(N, J) positions/velocities/accelerations — the reference's
    ``(traj_pos, traj_vel, traj_acc)`` triple."""

    position: jnp.ndarray
    velocity: jnp.ndarray
    acceleration: jnp.ndarray


@partial(jax.jit, static_argnames=("N", "method", "clip_to_limits"))
def joint_trajectory(
    model: RobotModel,
    theta_start: jnp.ndarray,
    theta_end: jnp.ndarray,
    Tf,
    N: int,
    method: int = 5,
    clip_to_limits: bool = True,
) -> Trajectory:
    """Point-to-point joint trajectory with polynomial time scaling.

    Behavioural twin of ``OptimizedTrajectoryPlanning.joint_trajectory``
    (``path_planning.py:533-738``): ``pos = start + s (end - start)``,
    ``vel = s_dot * delta``, ``acc = s_ddot * delta``, then positions are
    clipped to the joint limits (``path_planning.py:630-636``).

    Batch by passing (..., J) endpoints — the scaling profile broadcasts.
    """
    # Kernel policy (measured, benchmarks/kernel_bakeoff_results.json):
    # the broadcast outer product below IS the optimal TPU program — the
    # hand-written Pallas twin (ops/pallas_kernels.py::trajectory_pallas)
    # ties it at <=1.5M output elements (both at the dispatch floor) and
    # is 2.2x SLOWER at 25M elements (B=1024, N=4096), because XLA already
    # fuses scaling-profile + outer product into one pass while the kernel
    # pays a (B,J,N)->(B,N,J) relayout. So the jnp path serves every call;
    # the Pallas kernel stays as a tested parity twin only. (The reference
    # needed five CUDA variants + an autotuner for this op,
    # cuda_kernels.py:780-1144,1686-1896.) Degenerate Tf/N guards live in
    # scaling_profile (cuda_kernels.py:676-680 semantics).
    s, s_dot, s_ddot = scaling_profile(Tf, N, method, dtype=theta_start.dtype)
    delta = theta_end - theta_start
    pos = theta_start[..., None, :] + s[:, None] * delta[..., None, :]
    vel = s_dot[:, None] * delta[..., None, :]
    acc = s_ddot[:, None] * delta[..., None, :]
    if clip_to_limits:
        pos = jnp.clip(pos, model.joint_lower, model.joint_upper)
    return Trajectory(pos, vel, acc)


@partial(jax.jit, static_argnames=("N", "method", "clip_to_limits"))
def batch_joint_trajectory(
    model: RobotModel,
    theta_start: jnp.ndarray,
    theta_end: jnp.ndarray,
    Tf,
    N: int,
    method: int = 5,
    clip_to_limits: bool = True,
) -> Trajectory:
    """(B, J) start/end pairs -> (B, N, J) batch (reference 3D-grid kernel,
    ``cuda_kernels.py:1473-1541`` / ``path_planning.py:805-947``)."""
    return joint_trajectory(
        model, theta_start, theta_end, Tf, N, method, clip_to_limits
    )


@partial(jax.jit, static_argnames=("N", "method"))
def cartesian_trajectory(
    X_start: jnp.ndarray,
    X_end: jnp.ndarray,
    Tf,
    N: int,
    method: int = 5,
):
    """Straight-line Cartesian trajectory with SE(3) orientation blending.

    Positions interpolate linearly with the time scaling; orientation
    follows the geodesic ``R(s) = R_s exp(log(R_s^T R_e) s)`` — the math
    the reference runs per-step on host (``path_planning.py:1544-1559``),
    here evaluated for all N steps in one batched exp/log.

    Returns:
        (poses, velocity, acceleration): (N, 4, 4) transforms plus (N, 3)
        linear velocity/acceleration profiles (matching the reference's
        Cartesian kernel outputs, ``cuda_kernels.py:1333-1385``).
    """
    dtype = X_start.dtype
    s, s_dot, s_ddot = scaling_profile(Tf, N, method, dtype=dtype)
    R_s, p_s = lie.trans_to_rp(X_start)
    R_e, p_e = lie.trans_to_rp(X_end)
    dp = p_e - p_s

    pos = p_s + s[:, None] * dp
    vel = s_dot[:, None] * dp
    acc = s_ddot[:, None] * dp

    log_rel = lie.so3_log(R_s.T @ R_e)  # (3,) rotation vector
    R_steps = R_s @ lie.so3_exp(s[:, None] * log_rel)  # (N, 3, 3)
    poses = lie.rp_to_trans(R_steps, pos)
    return poses, vel, acc


@partial(jax.jit, static_argnames=("use_rnea",))
def inverse_dynamics_trajectory(
    model: RobotModel,
    thetamat: jnp.ndarray,
    dthetamat: jnp.ndarray,
    ddthetamat: jnp.ndarray,
    g=None,
    Ftip=None,
    use_rnea: bool = True,
) -> jnp.ndarray:
    """Exact inverse dynamics for every waypoint, one fused launch.

    (..., N, J) trajectories -> (..., N, J) torques, clamped to the
    model's torque limits like both reference paths
    (``path_planning.py:1184-1186, 1256-1259``). ``use_rnea`` selects the
    O(n) Newton-Euler sweep (default) or the Lagrangian composition.
    """
    fn = rnea if use_rnea else inverse_dynamics

    def per_point(q, dq, ddq, f):
        return fn(model, q, dq, ddq, g, f)

    flat_q = thetamat.reshape(-1, thetamat.shape[-1])
    flat_dq = dthetamat.reshape(-1, thetamat.shape[-1])
    flat_ddq = ddthetamat.reshape(-1, thetamat.shape[-1])
    if Ftip is None:
        flat_f = jnp.zeros((flat_q.shape[0], 6), dtype=thetamat.dtype)
    else:
        flat_f = jnp.broadcast_to(Ftip, thetamat.shape[:-1] + (6,)).reshape(-1, 6)
    tau = jax.vmap(per_point)(flat_q, flat_dq, flat_ddq, flat_f)
    tau = tau.reshape(thetamat.shape)
    return jnp.clip(tau, -model.torque_limit, model.torque_limit)


_DEFAULT_G = (0.0, 0.0, -9.81)
_ENGINE_CACHE: dict = {}
_ENGINE_CACHE_MAX = 16


def _rollout_engine_for(model, dt, intRes, g, num_elements, dtype, batched_2d):
    """Resolve + cache the fast rollout engine for a concrete call, or
    return None when only the generic scan path applies."""
    from .ops import dispatch

    want_pallas = (
        dispatch.pallas_wanted(num_elements)
        and dtype == jnp.float32  # the Pallas engine's precision contract
        and batched_2d  # kernel layout needs (B, n) initial states
    )
    kind = "pallas" if want_pallas else "cgen"
    # Key on model CONTENT when available: load_robot builds a fresh
    # RobotModel per call, so an id(model) key would rebuild+recompile
    # the engine on every forward_dynamics_trajectory(load_robot(...))
    # call. The host-array registry carries a sha256 of the f64 source
    # arrays; id(model) is the fallback for derived (tree-mapped) models.
    from .models.robot import host_arrays

    host = host_arrays(model)
    model_key = host["digest"] if host is not None else id(model)
    key = (model_key, str(model.dtype), float(dt), int(intRes), tuple(g), kind)
    hit = _ENGINE_CACHE.get(key)
    if hit is not None:
        return hit[1]
    if kind == "pallas":
        from .ops.pallas_rollout import build_pallas_rollout

        engine = build_pallas_rollout(
            model, dt=float(dt), intRes=int(intRes), g=tuple(g),
            interpret=jax.default_backend() != "tpu",
        )
    else:
        from .ops.fd_step import build_rollout

        engine = build_rollout(model, dt=float(dt), intRes=int(intRes), g=tuple(g))
    if len(_ENGINE_CACHE) >= _ENGINE_CACHE_MAX:
        _ENGINE_CACHE.pop(next(iter(_ENGINE_CACHE)))
    # Keep the model in the value: its id() is the cache key, so it must
    # stay alive for the key to stay unambiguous.
    _ENGINE_CACHE[key] = (model, engine)
    return engine


def forward_dynamics_trajectory(
    model: RobotModel,
    thetalist: jnp.ndarray,
    dthetalist: jnp.ndarray,
    taumat: jnp.ndarray,
    g=None,
    Ftipmat=None,
    dt=0.01,
    intRes: int = 1,
):
    """Integrate forward dynamics along a torque trajectory.

    Matches the reference's CPU semantics (``path_planning.py:1435-1515``):
    per waypoint, ``intRes`` semi-explicit Euler sub-steps of length
    ``dt / intRes``; joint positions clamped to limits and velocities to
    the velocity limit after each sub-step (clamp placement per
    ``path_planning.py:1492-1503``). Exact dynamics throughout — the
    reference's GPU variant used the simplified per-joint model
    (``cuda_kernels.py:1230-1331``).

    Leading batch axes are handled automatically: (B, J) states with
    (B, N, J) torques produce (B, N, J) outputs.

    Dispatch (the analogue of the reference's GPU/CPU auto-dispatch,
    ``path_planning.py:457-492``): concrete host-side calls with default
    wrench/gravity are served by the fused rollout engines — the cgen
    elementwise program (``ops/fd_step.py``), or the Pallas VMEM-carry
    kernel (``ops/pallas_rollout.py``) for large f32 batches on TPU —
    which share the exact same emitted dynamics and clamp semantics
    (parity pinned in ``tests/test_trajectory.py``). Calls traced inside
    an outer ``jit``/``vmap``, with an ``Ftipmat``, or with traced
    ``g``/``dt`` fall back to the generic scan below.

    Returns:
        (thetamat, dthetamat, ddthetamat): each (N, J), where row t is the
        state at waypoint t (row 0 = initial state).
    """
    if int(intRes) < 1:
        # Same clear contract as build_rollout — without this, intRes=0
        # reached the generic scan and died with an opaque trace-time
        # IndexError (dt/0 then ddqs[-1] on a length-0 scan).
        raise ValueError("intRes must be >= 1")
    concrete = not any(
        isinstance(x, jax.core.Tracer)
        for x in (
            jax.tree_util.tree_leaves(model)
            + [thetalist, dthetalist, taumat, dt]
            # Flatten g: a tuple of traced scalars must route to the
            # generic path, not crash the float() coercion below.
            + jax.tree_util.tree_leaves(g)
        )
    )
    if concrete and Ftipmat is None and intRes >= 1:
        g_t = _DEFAULT_G if g is None else tuple(float(x) for x in jnp.asarray(g))
        arr = jnp.asarray(thetalist)
        engine = _rollout_engine_for(
            model, dt, intRes, g_t,
            num_elements=int(jnp.asarray(taumat).size),
            dtype=arr.dtype,
            batched_2d=(arr.ndim == 2),
        )
        return engine(thetalist, dthetalist, taumat)
    return _forward_dynamics_trajectory_generic(
        model, thetalist, dthetalist, taumat, g, Ftipmat, dt, intRes
    )


@partial(jax.jit, static_argnames=("intRes",))
def _forward_dynamics_trajectory_generic(
    model: RobotModel,
    thetalist: jnp.ndarray,
    dthetalist: jnp.ndarray,
    taumat: jnp.ndarray,
    g=None,
    Ftipmat=None,
    dt=0.01,
    intRes: int = 1,
):
    """The generic scan path: supports tip wrenches, traced inputs, any
    leading batch dims, and any dtype. Same step semantics as the fused
    engines."""
    if thetalist.ndim > 1:
        if Ftipmat is None:
            batched = jax.vmap(
                lambda q, dq, t: _forward_dynamics_trajectory_generic(
                    model, q, dq, t, g, None, dt, intRes
                )
            )
            return batched(thetalist, dthetalist, taumat)
        batched = jax.vmap(
            lambda q, dq, t, f: _forward_dynamics_trajectory_generic(
                model, q, dq, t, g, f, dt, intRes
            )
        )
        f_b = jnp.broadcast_to(Ftipmat, taumat.shape[:-1] + (6,))
        return batched(thetalist, dthetalist, taumat, f_b)
    N = taumat.shape[-2]
    sub_dt = jnp.asarray(dt, dtype=thetalist.dtype) / intRes
    if Ftipmat is None:
        Ftipmat = jnp.zeros(taumat.shape[:-1] + (6,), dtype=thetalist.dtype)
    else:
        # A constant (6,) wrench must broadcast over the waypoint axis
        # like the batched branch (and inverse_dynamics_trajectory) do —
        # unbroadcast it would pair a length-6 leading axis with the
        # (N, J) torque scan.
        Ftipmat = jnp.broadcast_to(
            jnp.asarray(Ftipmat, dtype=thetalist.dtype), taumat.shape[:-1] + (6,)
        )

    def substep(state, tau_f):
        q, dq = state
        tau, f = tau_f
        ddq = forward_dynamics_fast(model, q, dq, tau, g, f)
        dq_new = dq + ddq * sub_dt
        q_new = q + dq_new * sub_dt
        q_new = jnp.clip(q_new, model.joint_lower, model.joint_upper)
        dq_new = jnp.clip(dq_new, -model.velocity_limit, model.velocity_limit)
        return (q_new, dq_new), ddq

    def step(state, tau_f):
        def body(carry, _):
            new_state, ddq = substep(carry, tau_f)
            return new_state, ddq

        (q_new, dq_new), ddqs = jax.lax.scan(body, state, None, length=intRes)
        return (q_new, dq_new), (state[0], state[1], ddqs[-1])

    init = (thetalist, dthetalist)
    _, (qs, dqs, ddqs) = jax.lax.scan(step, init, (taumat, Ftipmat))
    return qs, dqs, ddqs
