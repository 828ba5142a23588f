"""Hand-written Pallas TPU kernels for the hot elementwise paths.

The counterpart of the reference's Numba-CUDA kernel layer
(``ManipulaPy/cuda_kernels.py``) — but where the reference ships FIVE
hand-tuned variants of the trajectory kernel plus an occupancy autotuner
(``cuda_kernels.py:780-1144, 1686-1896``), the TPU needs exactly one
kernel per op with the right *layout*:

* time (the long axis) rides the 128-wide lane dimension, joints ride
  sublanes — so a (B, N, J) trajectory is computed as (B, J, N) tiles at
  full VPU width instead of wasting 122/128 lanes on a J=6 last axis;
* scalars (Tf, gains) live in SMEM; obstacle lists live in SMEM and are
  broadcast per-obstacle over the point lanes.

Every kernel has an ``interpret`` flag (CPU-testable) and a jnp
reference twin in :mod:`manipulapy_tpu.trajectory` /
:mod:`manipulapy_tpu.potential_field`; parity tests compare the two —
the same CPU<->device diff discipline the reference uses
(``path_planning.py:2620-2632``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["trajectory_pallas", "cartesian_potential_pallas", "pallas_available"]

_TILE_N = 256  # lane-axis tile for trajectory timesteps
_TILE_P = 256  # lane-axis tile for potential-field query points


def pallas_available() -> bool:
    """True when a real TPU backend is present (compiled Pallas path)."""
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# Trajectory time-scaling kernel
# ---------------------------------------------------------------------------


def _traj_kernel(method, N, tf_ref, start_ref, end_ref, pos_ref, vel_ref, acc_ref):
    """One (1, J, TILE_N) tile: s/s_dot/s_ddot on the lane axis, joint
    deltas broadcast over sublanes (reference ``trajectory_kernel``,
    ``cuda_kernels.py:780-831``, with the same cubic/quintic/linear
    dispatch resolved at trace time). The (B, J) endpoint arrays stay
    whole in VMEM (a (1, J) block per batch row violates Mosaic's
    8-sublane divisibility for B not a multiple of 8); the batch row is
    selected with a dynamic index instead."""
    j = start_ref.shape[1]
    b = pl.program_id(0)
    n0 = pl.program_id(1) * _TILE_N
    # Mosaic's iota is integer-only; cast to f32 after the index offset.
    t_idx = (
        jax.lax.broadcasted_iota(jnp.int32, (1, j, _TILE_N), 2) + n0
    ).astype(jnp.float32)
    tau = jnp.clip(t_idx / float(N - 1), 0.0, 1.0)

    Tf = tf_ref[0, 0]
    inv_tf = 1.0 / Tf
    if method == 3:  # cubic
        s = 3.0 * tau**2 - 2.0 * tau**3
        s_dot = 6.0 * tau * (1.0 - tau) * inv_tf
        s_ddot = 6.0 * (1.0 - 2.0 * tau) * inv_tf * inv_tf
    elif method == 5:  # quintic
        tau2 = tau * tau
        tau3 = tau2 * tau
        tau4 = tau2 * tau2
        s = 10.0 * tau3 - 15.0 * tau4 + 6.0 * tau4 * tau
        s_dot = (30.0 * tau2 - 60.0 * tau3 + 30.0 * tau4) * inv_tf
        s_ddot = (60.0 * tau - 180.0 * tau2 + 120.0 * tau3) * inv_tf * inv_tf
    else:  # linear
        s = tau
        s_dot = jnp.full_like(tau, inv_tf)
        s_ddot = jnp.zeros_like(tau)

    start = start_ref[b, :][None, :, None]  # (1, J, 1)
    delta = (end_ref[b, :] - start_ref[b, :])[None, :, None]
    pos_ref[:] = start + s * delta
    vel_ref[:] = s_dot * delta
    acc_ref[:] = s_ddot * delta


@functools.partial(
    jax.jit, static_argnames=("N", "method", "interpret")
)
def trajectory_pallas(
    theta_start: jnp.ndarray,
    theta_end: jnp.ndarray,
    Tf,
    N: int,
    method: int = 5,
    *,
    interpret: bool = False,
):
    """Batched point-to-point trajectories as a Pallas kernel.

    Args:
        theta_start, theta_end: (B, J) f32 endpoints.
        Tf: scalar duration (> 0; degenerate cases belong to the jnp path).
        N: timesteps (static, > 1).
        method: 3 cubic / 5 quintic / else linear (static).

    Returns:
        (pos, vel, acc), each (B, N, J) — identical (to f32 roundoff) to
        ``trajectory.joint_trajectory`` without limit clipping.
    """
    B, J = theta_start.shape
    theta_start = theta_start.astype(jnp.float32)
    theta_end = theta_end.astype(jnp.float32)
    tf_arr = jnp.asarray(Tf, dtype=jnp.float32).reshape(1, 1)

    grid = (B, pl.cdiv(N, _TILE_N))
    out = jax.ShapeDtypeStruct((B, J, N), jnp.float32)
    kernel = functools.partial(_traj_kernel, method, N)
    pos, vel, acc = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda b, n: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # start (B, J), whole
            pl.BlockSpec(memory_space=pltpu.VMEM),  # end (B, J), whole
        ],
        out_specs=[
            pl.BlockSpec((1, J, _TILE_N), lambda b, n: (b, 0, n), memory_space=pltpu.VMEM)
        ]
        * 3,
        out_shape=[out, out, out],
        interpret=interpret,
    )(tf_arr, theta_start, theta_end)
    # (B, J, N) -> (B, N, J): one relayout outside the kernel.
    return (
        jnp.swapaxes(pos, 1, 2),
        jnp.swapaxes(vel, 1, 2),
        jnp.swapaxes(acc, 1, 2),
    )


# ---------------------------------------------------------------------------
# Fused Cartesian potential-field kernel
# ---------------------------------------------------------------------------


def _potential_kernel(num_obstacles, d0, goal_ref, obs_ref, pos_ref, u_ref, g_ref):
    """One (3, TILE_P) tile of query points: attractive + repulsive
    potential and gradient (reference ``fused_potential_gradient_kernel``,
    ``cuda_kernels.py:1387-1471``). Obstacles stream from SMEM as scalars
    broadcast over the point lanes."""
    px = pos_ref[0:1, :]  # (1, P)
    py = pos_ref[1:2, :]
    pz = pos_ref[2:3, :]

    dx = px - goal_ref[0]
    dy = py - goal_ref[1]
    dz = pz - goal_ref[2]
    u = 0.5 * (dx * dx + dy * dy + dz * dz)
    gx, gy, gz = dx, dy, dz

    inv_d0 = 1.0 / d0

    def body(o, carry):
        u, gx, gy, gz = carry
        ox = pos_ref[0:1, :] - obs_ref[o, 0]
        oy = pos_ref[1:2, :] - obs_ref[o, 1]
        oz = pos_ref[2:3, :] - obs_ref[o, 2]
        d2 = ox * ox + oy * oy + oz * oz
        d = jnp.sqrt(d2)
        d_safe = jnp.maximum(d, 1e-9)
        inside = d < d0
        inv_d = 1.0 / d_safe
        diff_inv = inv_d - inv_d0
        u = u + jnp.where(inside, 0.5 * diff_inv * diff_inv, 0.0)
        coeff = jnp.where(inside, -diff_inv * inv_d * inv_d * inv_d, 0.0)
        return (u, gx + coeff * ox, gy + coeff * oy, gz + coeff * oz)

    u, gx, gy, gz = jax.lax.fori_loop(0, num_obstacles, body, (u, gx, gy, gz))
    u_ref[:] = u
    g_ref[0:1, :] = gx
    g_ref[1:2, :] = gy
    g_ref[2:3, :] = gz


@functools.partial(jax.jit, static_argnames=("influence_distance", "interpret"))
def cartesian_potential_pallas(
    positions: jnp.ndarray,
    goal: jnp.ndarray,
    obstacles: jnp.ndarray,
    influence_distance: float = 0.5,
    *,
    interpret: bool = False,
):
    """Fused 3D potential + gradient over (P, 3) points.

    Returns (U, grad): (P,) and (P, 3) f32 — parity twin of
    ``potential_field.cartesian_potential_field``.
    """
    P = positions.shape[0]
    O = obstacles.shape[0]
    pos_t = positions.astype(jnp.float32).T  # (3, P): points on lanes
    goal = goal.astype(jnp.float32)
    obstacles = obstacles.astype(jnp.float32)

    grid = (pl.cdiv(P, _TILE_P),)
    kernel = functools.partial(_potential_kernel, O, float(influence_distance))
    u, g = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # goal (3,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # obstacles (O, 3)
            pl.BlockSpec((3, _TILE_P), lambda p: (0, p), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, _TILE_P), lambda p: (0, p), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, _TILE_P), lambda p: (0, p), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, P), jnp.float32),
            jax.ShapeDtypeStruct((3, P), jnp.float32),
        ],
        interpret=interpret,
    )(goal, obstacles, pos_t)
    return u[0], g.T
