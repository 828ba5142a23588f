"""Fused Pallas TPU kernel for exact-dynamics rollouts.

One kernel launch integrates the full rollout: per step it computes the
exact coupled forward dynamics (mass matrix via per-link CoM Jacobians,
RNEA velocity bias, gravity, unrolled Cholesky solve — identical math to
``ops/fd_step.py``) and the semi-implicit Euler update, with the state
carried in VMEM scratch across the sequential time axis of the grid.

Why this beats the XLA `lax.scan` version (``ops/fd_step.py::build_rollout``):
under `scan`, every step is its own fusion region, so the (B, n) state and
a large fraction of the ~3k-op step expression round-trip through HBM once
per step. Here the state lives in VMEM scratch for the whole rollout and
each step's torque block streams in through the Pallas pipeline (grid
time-axis minor => Mosaic double-buffers the loads), leaving the VPU as
the only bottleneck.

Layout: the batch is tiled as (8, 128) VPU registers — each per-joint
scalar of the dynamics is an (8, 128) tile of 1024 scenarios, so the
emitted elementwise program maps 1:1 onto full-width VPU ops. Tensors are
staged host-side as (Bt, n, 8, 128) / (Bt, N, n, 8, 128).

Reference counterpart: the forward-dynamics CUDA kernel
(``cuda_kernels.py:1230-1331``) — which integrates a *simplified*
per-joint model and re-integrates from t=0 per thread to dodge the
temporal race. The sequential-grid + scratch-carry structure here is the
TPU-native answer to the same dependency: one program instance per batch
tile owns its timeline, so there is no race to dodge and the dynamics are
the exact coupled equations.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fd_step import build_fd_step_planes
from ..models.robot import RobotModel

__all__ = ["build_pallas_rollout"]

_SUB, _LANE = 8, 128
_TILE_B = _SUB * _LANE  # 1024 scenarios per program instance


def build_pallas_rollout(
    model: RobotModel,
    dt: float = 0.01,
    intRes: int = 1,
    g=(0.0, 0.0, -9.81),
    interpret: bool = False,
    time_tile: int = 0,
    tiled_io: bool = False,
):
    """Build the fused Pallas rollout for this robot.

    ``rollout(q0, dq0, taumat) -> (qs, dqs, ddqs)`` with (B, n) initial
    states and (B, N, n) torques — the exact output contract of
    ``trajectory.forward_dynamics_trajectory`` (row t = state at waypoint
    t, ``ddqs[t]`` = last-substep acceleration). B is padded to a multiple
    of 1024 internally. f32 only (the rollout engine's precision contract,
    like the reference's f32 kernels, ``cuda_kernels.py:318``).

    ``time_tile``: waypoints per grid cell (0 = auto: the largest divisor
    of N whose in+out DMA blocks fit a ~6 MB double-buffered VMEM budget —
    large tiles amortize per-cell pipeline latency, the measured
    bottleneck of the big-batch path, ``docs/ROOFLINE.md``).

    ``tiled_io``: consume/produce the kernel's native staged layout
    ((Bt, n, 8, 128) states, (Bt, N, n, 8, 128) sequences) and skip the
    stage/unstage transposes — for producers that emit tiles directly
    (e.g. on-device torque generators); ``stage_batch``/``unstage_batch``
    convert. At B=131072, N=50 the transposes cost ~25% of the whole
    rollout.
    """
    if intRes < 1:
        raise ValueError("intRes must be >= 1")
    n, step_planes = build_fd_step_planes(
        model, dt=float(dt) / intRes, g=g, clip_limits=True
    )

    def make_kernel(Tt):
        """Kernel processing ``Tt`` waypoints per grid cell. A multi-step
        time tile amortizes per-cell pipeline bookkeeping and enlarges the
        DMA blocks (measured +5% at B=131072 over Tt=1; bit-exact)."""

        def kernel(q0_ref, dq0_ref, tau_ref, qs_ref, dqs_ref, ddqs_ref, q_s, dq_s):
            t = pl.program_id(1)

            # New batch tile: seed the scratch state from the initial state.
            @pl.when(t == 0)
            def _():
                q_s[:] = q0_ref[0]
                dq_s[:] = dq0_ref[0]

            q = [q_s[j] for j in range(n)]
            dq = [dq_s[j] for j in range(n)]
            for tt in range(Tt):
                # Output contract: row t is the state AT waypoint t (pre-step).
                for j in range(n):
                    qs_ref[0, tt, j] = jnp.broadcast_to(q[j], (_SUB, _LANE))
                    dqs_ref[0, tt, j] = jnp.broadcast_to(dq[j], (_SUB, _LANE))
                tau = [tau_ref[0, tt, j] for j in range(n)]
                for _ in range(intRes):
                    q, dq, ddq = step_planes(q, dq, tau)
                for j in range(n):
                    ddqs_ref[0, tt, j] = jnp.broadcast_to(ddq[j], (_SUB, _LANE))
            for j in range(n):
                q_s[j] = q[j]
                dq_s[j] = dq[j]

        return kernel

    def _pick_tt(N):
        if time_tile:
            if N % time_tile:
                raise ValueError(f"time_tile {time_tile} must divide N={N}")
            return int(time_tile)
        # Auto: largest divisor whose 4 double-buffered (tau + 3 outputs)
        # DMA blocks stay under a VMEM budget. The budget is layout-aware
        # (measured on v5e, N=50 UR5): tiled-IO chains run best at
        # mid-size tiles (Tt=25: 1.65G vs Tt=50: 1.52G steps/s at
        # B=131072), while the staged path is fastest with the whole
        # horizon per cell (Tt=25 showed a reproducible -23% at B=4096).
        budget = (6 if tiled_io else 12) * 1024 * 1024
        block = n * _SUB * _LANE * 4  # one (n, 8, 128) f32 time-slice
        # Compile-size cap: the kernel body unrolls Tt * intRes copies of
        # the ~3k-op step program; bound that product so intRes > 1
        # callers don't multiply Mosaic compile time.
        max_steps_unrolled = 50
        best = 1
        for d in range(1, N + 1):
            if (
                N % d == 0
                and 2 * 4 * d * block <= budget
                and d * intRes <= max_steps_unrolled
            ):
                best = d
        return best

    @jax.jit
    def rollout(q0: jnp.ndarray, dq0: jnp.ndarray, taumat: jnp.ndarray):
        if tiled_io:
            # Native layout: q0/dq0 (Bt, n, 8, 128), taumat (Bt, N, n, 8, 128).
            # Validate here: a caller passing unstaged (B, n)/(B, N, n)
            # arrays would otherwise hit an opaque shape error deep in
            # pallas_call (use ``stage_batch`` to convert).
            if taumat.ndim != 5 or taumat.shape[-2:] != (_SUB, _LANE):
                raise ValueError(
                    "tiled_io rollout expects taumat (Bt, N, n, 8, 128) "
                    f"kernel-native tiles, got {taumat.shape}; use stage_batch()"
                )
            for name, arr in (("q0", q0), ("dq0", dq0)):
                if arr.ndim != 4 or arr.shape[-2:] != (_SUB, _LANE):
                    raise ValueError(
                        f"tiled_io rollout expects {name} (Bt, n, 8, 128) "
                        f"tiles, got {arr.shape}; use stage_batch()"
                    )
            q0 = q0.astype(jnp.float32)
            dq0 = dq0.astype(jnp.float32)
            taumat = taumat.astype(jnp.float32)
            Bt, N = taumat.shape[0], taumat.shape[1]
            q0_s, dq0_s, tau_s = q0, dq0, taumat
        else:
            B, N = taumat.shape[0], taumat.shape[-2]
            pad = (-B) % _TILE_B
            if pad:
                q0 = jnp.concatenate([q0, jnp.zeros((pad, n), q0.dtype)], axis=0)
                dq0 = jnp.concatenate([dq0, jnp.zeros((pad, n), dq0.dtype)], axis=0)
                taumat = jnp.concatenate(
                    [taumat, jnp.zeros((pad, N, n), taumat.dtype)], axis=0
                )
            Bp = B + pad
            Bt = Bp // _TILE_B

            # (B, n) -> (Bt, n, 8, 128); (B, N, n) -> (Bt, N, n, 8, 128).
            def stage2(x):
                return (
                    x.astype(jnp.float32)
                    .reshape(Bt, _SUB, _LANE, n)
                    .transpose(0, 3, 1, 2)
                )

            def stage3(x):
                return (
                    x.astype(jnp.float32)
                    .reshape(Bt, _SUB, _LANE, N, n)
                    .transpose(0, 3, 4, 1, 2)
                )

            q0_s, dq0_s, tau_s = stage2(q0), stage2(dq0), stage3(taumat)
        Tt = _pick_tt(N)
        out = jax.ShapeDtypeStruct((Bt, N, n, _SUB, _LANE), jnp.float32)
        state_spec = pl.BlockSpec(
            (1, n, _SUB, _LANE), lambda b, t: (b, 0, 0, 0), memory_space=pltpu.VMEM
        )
        step_spec = pl.BlockSpec(
            (1, Tt, n, _SUB, _LANE), lambda b, t: (b, t, 0, 0, 0), memory_space=pltpu.VMEM
        )
        # Batch-tile cells are independent; telling Mosaic so lets it
        # pipeline DMA across the b axis instead of serializing the grid.
        params = (
            {}
            if interpret
            else dict(
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=(
                        pltpu.GridDimensionSemantics.PARALLEL,
                        pltpu.GridDimensionSemantics.ARBITRARY,
                    )
                )
            )
        )
        qs, dqs, ddqs = pl.pallas_call(
            make_kernel(Tt),
            grid=(Bt, N // Tt),
            in_specs=[state_spec, state_spec, step_spec],
            out_specs=[step_spec] * 3,
            out_shape=[out, out, out],
            scratch_shapes=[
                pltpu.VMEM((n, _SUB, _LANE), jnp.float32),
                pltpu.VMEM((n, _SUB, _LANE), jnp.float32),
            ],
            interpret=interpret,
            **params,
        )(q0_s, dq0_s, tau_s)

        if tiled_io:
            return qs, dqs, ddqs

        def unstage(x):  # (Bt, N, n, 8, 128) -> (B, N, n)
            return x.transpose(0, 3, 4, 1, 2).reshape(Bp, N, n)[:B]

        return unstage(qs), unstage(dqs), unstage(ddqs)

    return rollout


def stage_batch(x: jnp.ndarray) -> jnp.ndarray:
    """(B, ..., n) -> (Bt, ..., n, 8, 128) kernel-native tiles (B padded
    to a multiple of 1024). Inverse of :func:`unstage_batch`."""
    B = x.shape[0]
    pad = (-B) % _TILE_B
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
        )
    Bt = (B + pad) // _TILE_B
    mid = x.shape[1:]
    y = x.astype(jnp.float32).reshape((Bt, _SUB, _LANE) + mid)
    perm = (0,) + tuple(range(3, 3 + len(mid))) + (1, 2)
    return y.transpose(perm)


def unstage_batch(x: jnp.ndarray, B: int) -> jnp.ndarray:
    """(Bt, ..., 8, 128) -> (B, ...): undo :func:`stage_batch`."""
    mid = x.shape[1:-2]
    perm = (0, len(x.shape) - 2, len(x.shape) - 1) + tuple(range(1, 1 + len(mid)))
    return x.transpose(perm).reshape((x.shape[0] * _TILE_B,) + mid)[:B]
