"""The flagship composition: batched fused Pallas MPC under ``shard_map``.

BASELINE config #5's actual shape is the *batched fused solver*
(:mod:`manipulapy_tpu.mpc.fused_batch` — scenarios on the (8, 128) VPU
tile axes) sharded over the device mesh on the scenario axis, with the
fleet cost psum-reduced over ICI. The generic-iLQR distributed round
(:func:`manipulapy_tpu.parallel.fleet.fleet_mpc_round`) proves the mesh
layout; this module runs the *fast* solver on that layout:

* each device owns ``B_global / n_devices`` scenarios, padded locally to
  (8, 128)-tile multiples — the Pallas grid, VMEM scratch, and
  tile-Cholesky are untouched by the sharding (no mesh axis appears
  inside a kernel);
* goals ride a runtime argument (sharded like the scenarios), so a fleet
  re-targets every receding-horizon round without recompiling;
* the only cross-device communication is one ``pmean`` of the
  per-device mean cost — the guaranteed-shape collective (a scalar per
  device over ICI), matching the reference-free design of SURVEY §5
  ("distributed communication backend: none" in the reference;
  ``urdf/scene.py:55`` is merely kinematic).

Heterogeneous fleets compose the same way per robot:
:func:`build_fleet_fused_mpc` strips each robot's padding (the fused
kernels need a non-singular mass matrix, so the padded no-op joints of
:func:`manipulapy_tpu.parallel.fleet.stack_models` must not enter the
Riccati pipeline), builds one sharded solver per distinct robot, and
reassembles padded fleet-shaped outputs.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.robot import RobotModel
from ..mpc.fused_batch import BatchTrackingMPC, build_batch_tracking_mpc
from .fleet import Fleet
from .mesh import SCENARIO_AXIS

__all__ = [
    "ShardedBatchMPC",
    "build_sharded_batch_mpc",
    "FleetFusedMPC",
    "build_fleet_fused_mpc",
    "unpad_robot",
]


class ShardedBatchMPC(NamedTuple):
    """Mesh-sharded batched fused solver.

    ``solve(x0 (B, 2n), us_warm (B, H, n), q_goal?) ->
    (us (B, H, n), xs (B, H+1, 2n), cost (B,), fleet_cost scalar)``
    where B is the GLOBAL batch (scenario axis sharded over the mesh) and
    ``fleet_cost`` is the psum-reduced mean cost across all devices.
    """

    solve: callable
    local: BatchTrackingMPC
    mesh: Mesh
    batch: int
    axis_name: str

    def shard_inputs(self, *arrays):
        """Place (B, ...) arrays with B split across the mesh (optional —
        ``solve`` accepts unplaced arrays too; pre-placing skips a
        re-shard on dispatch)."""
        sh = NamedSharding(self.mesh, P(self.axis_name))
        out = tuple(jax.device_put(jnp.asarray(a), sh) for a in arrays)
        return out if len(out) > 1 else out[0]


def build_sharded_batch_mpc(
    model: RobotModel,
    mesh: Mesh,
    q_goal: jnp.ndarray,
    batch: int,
    horizon: int,
    dt: float,
    *,
    axis_name: str = SCENARIO_AXIS,
    **solver_kw,
) -> ShardedBatchMPC:
    """Build the fused batch solver sharded over ``mesh``'s scenario axis.

    ``batch`` (global scenario count) must divide by the mesh size; each
    device's local sub-batch is padded to an (8, 128)-tile multiple
    inside the local solver, so per-device sub-batches of any size work
    (but multiples of 1024 waste nothing). ``q_goal``: (n,) shared or
    (batch, n) per scenario; re-targetable per solve without recompiling.
    Remaining kwargs go to
    :func:`manipulapy_tpu.mpc.fused_batch.build_batch_tracking_mpc`.
    """
    n = model.num_joints
    nx = 2 * n
    B = int(batch)
    n_dev = mesh.devices.size
    if B % n_dev != 0:
        raise ValueError(f"global batch {B} must divide by the mesh size {n_dev}")
    B_local = B // n_dev

    # Local solver built with placeholder goals: goals ALWAYS ride the
    # runtime argument here, because the build-time constant would bake
    # the same goal tiles into every device (wrong for per-scenario
    # goals under sharding).
    local = build_batch_tracking_mpc(
        model,
        np.zeros((B_local, n), dtype=np.float32),
        B_local,
        horizon,
        dt,
        **solver_kw,
    )

    if not isinstance(q_goal, (np.ndarray, list, tuple)):
        q_goal = jax.device_get(q_goal)
    goal_default = np.asarray(q_goal, dtype=np.float32)
    if goal_default.ndim == 1:
        goal_default = np.broadcast_to(goal_default, (B, n)).copy()
    if goal_default.shape != (B, n):
        raise ValueError(f"q_goal must be ({n},) or ({B}, {n}), got {goal_default.shape}")

    def _body(x0_l, us_l, g_l):
        us_o, xs_o, cost_o = local.solve(x0_l, us_l, g_l)
        # Guaranteed-shape collective: one scalar per device over ICI.
        fleet = jax.lax.pmean(jnp.mean(cost_o, keepdims=True), axis_name)
        return us_o, xs_o, cost_o, fleet

    sharded_body = jax.shard_map(
        _body,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name)),
        out_specs=(P(axis_name), P(axis_name), P(axis_name), P()),
        # pallas_call's out_shape carries no varying-mesh-axes metadata,
        # so the vma checker cannot see through the kernels; the specs
        # above are the full contract (everything scenario-sharded except
        # the pmean-reduced fleet cost).
        check_vma=False,
    )

    @jax.jit
    def _solve(x0, us_init, goals):
        return sharded_body(
            x0.astype(jnp.float32), us_init.astype(jnp.float32), goals
        )

    sh = NamedSharding(mesh, P(axis_name))
    # Upload + shard the build-time goals ONCE: re-staging them per call
    # would add an H2D transfer and a dispatch to every receding-horizon
    # round on exactly the link this module exists to keep quiet.
    goal_default_sharded = jax.device_put(
        jnp.asarray(goal_default, jnp.float32), sh
    )

    def solve(
        x0: jnp.ndarray,
        us_init: jnp.ndarray,
        q_goal_new: Optional[jnp.ndarray] = None,
    ):
        if x0.shape[0] != B:
            raise ValueError(f"x0 global batch {x0.shape[0]} != declared batch {B}")
        if us_init.shape[0] != B:
            raise ValueError(f"us_init global batch {us_init.shape[0]} != {B}")
        if q_goal_new is None:
            goals = goal_default_sharded
        else:
            goals = jnp.asarray(q_goal_new, jnp.float32)
            if goals.ndim == 1:
                goals = jnp.broadcast_to(goals, (B, n))
            if goals.shape != (B, n):
                raise ValueError(
                    f"q_goal must be ({n},) or ({B}, {n}), got {goals.shape}"
                )
            goals = jax.device_put(goals, sh)
        us, xs, cost, fleet = _solve(x0, us_init, goals)
        return us, xs, cost, fleet[0]

    return ShardedBatchMPC(
        solve=solve, local=local, mesh=mesh, batch=B, axis_name=axis_name
    )


def unpad_robot(padded: RobotModel, n_real: int) -> RobotModel:
    """Invert :func:`manipulapy_tpu.parallel.fleet.stack_models` padding
    for one robot: slice the first ``n_real`` joint rows off every
    per-joint leaf (padding is appended, so this recovers the original
    robot exactly). Needed because the fused Riccati pipeline assumes a
    non-singular mass matrix — padded no-op joints make M singular."""
    return RobotModel(
        home=padded.home,
        screws_space=padded.screws_space[:n_real],
        screws_body=padded.screws_body[:n_real],
        inertias=padded.inertias[:n_real],
        com_home=padded.com_home[:n_real],
        joint_lower=padded.joint_lower[:n_real],
        joint_upper=padded.joint_upper[:n_real],
        velocity_limit=padded.velocity_limit[:n_real],
        torque_limit=padded.torque_limit[:n_real],
    )


class FleetFusedMPC(NamedTuple):
    """Heterogeneous fleet on the fused sharded solver: one
    :class:`ShardedBatchMPC` per robot, fleet-shaped (R, S, ...) I/O.

    ``round(x0 (R, S, 2 n_max), us0 (R, S, H, n_max), q_goals (R, S,
    n_max)) -> (us (R, S, H, n_max), costs (R, S), fleet_cost scalar)``
    — the fused twin of
    :func:`manipulapy_tpu.parallel.fleet.fleet_mpc_round`.
    """

    solvers: Tuple[ShardedBatchMPC, ...]
    dofs: Tuple[int, ...]
    n_max: int
    horizon: int
    scenarios: int
    mesh: Mesh

    def round(self, x0, us0, q_goals):
        R, S = len(self.solvers), self.scenarios
        n_max, H = self.n_max, self.horizon
        if x0.shape != (R, S, 2 * n_max):
            raise ValueError(f"x0 must be ({R}, {S}, {2 * n_max}), got {x0.shape}")
        us_out = []
        costs = []
        fleet_means = []
        for r, (solver, n_r) in enumerate(zip(self.solvers, self.dofs)):
            x0_r = jnp.concatenate(
                [x0[r, :, :n_r], x0[r, :, n_max : n_max + n_r]], axis=-1
            )
            us_r, _, cost_r, fleet_r = solver.solve(
                x0_r, us0[r, :, :, :n_r], q_goals[r, :, :n_r]
            )
            pad = n_max - n_r
            if pad:
                us_r = jnp.pad(us_r, ((0, 0), (0, 0), (0, pad)))
            us_out.append(us_r)
            costs.append(cost_r)
            fleet_means.append(fleet_r)
        us = jnp.stack(us_out, axis=0)
        cost = jnp.stack(costs, axis=0)
        fleet_cost = jnp.mean(jnp.stack(fleet_means))
        return us, cost, fleet_cost


def build_fleet_fused_mpc(
    fleet: Fleet,
    mesh: Mesh,
    scenarios: int,
    horizon: int,
    dt: float,
    *,
    axis_name: str = SCENARIO_AXIS,
    dofs: Optional[Tuple[int, ...]] = None,
    **solver_kw,
) -> FleetFusedMPC:
    """One sharded fused solver per fleet robot (compile cost: one build
    per DISTINCT (DoF, dynamics) — here per robot; reuse the handle
    across receding-horizon rounds, goals are runtime arguments).

    ``dofs`` overrides the per-robot true DoF (default: from the fleet
    mask)."""
    R = fleet.num_robots
    n_max = fleet.num_joints
    if dofs is None:
        dofs = tuple(int(np.asarray(fleet.mask[r]).sum()) for r in range(R))
    solvers = []
    for r in range(R):
        padded_r, _ = fleet.robot(r)
        model_r = unpad_robot(padded_r, dofs[r])
        solvers.append(
            build_sharded_batch_mpc(
                model_r,
                mesh,
                np.zeros((scenarios, dofs[r]), dtype=np.float32),
                scenarios,
                horizon,
                dt,
                axis_name=axis_name,
                **solver_kw,
            )
        )
    return FleetFusedMPC(
        solvers=tuple(solvers),
        dofs=tuple(dofs),
        n_max=n_max,
        horizon=int(horizon),
        scenarios=int(scenarios),
        mesh=mesh,
    )
