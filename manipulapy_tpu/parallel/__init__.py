"""Distributed execution over TPU meshes (scenario-axis sharding).

No reference counterpart — the reference is single-process/single-GPU
(SURVEY.md section 5: "no NCCL/MPI/..."). This layer implements the
BASELINE.json multi-host dimension: batch/scenario sharding over ICI/DCN
via ``jax.sharding`` + ``shard_map``.
"""

from .mesh import (
    make_mesh,
    scenario_sharding,
    replicate_model,
    shard_batch,
    sharded_vmap,
    distributed_rollout,
    distributed_ik,
    scaling_efficiency,
)
from .fleet import (
    Fleet,
    stack_models,
    masked_forward_dynamics,
    make_masked_step_fn,
    fleet_rollout,
    fleet_ilqr_solve,
    fleet_mpc_round,
)
from .fused_fleet import (
    ShardedBatchMPC,
    build_sharded_batch_mpc,
    FleetFusedMPC,
    build_fleet_fused_mpc,
    unpad_robot,
)

__all__ = [
    "make_mesh",
    "scenario_sharding",
    "replicate_model",
    "shard_batch",
    "sharded_vmap",
    "distributed_rollout",
    "distributed_ik",
    "scaling_efficiency",
    "Fleet",
    "stack_models",
    "masked_forward_dynamics",
    "make_masked_step_fn",
    "fleet_rollout",
    "fleet_ilqr_solve",
    "fleet_mpc_round",
    "ShardedBatchMPC",
    "build_sharded_batch_mpc",
    "FleetFusedMPC",
    "build_fleet_fused_mpc",
    "unpad_robot",
]
