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

__all__ = [
    "make_mesh",
    "scenario_sharding",
    "replicate_model",
    "shard_batch",
    "sharded_vmap",
    "distributed_rollout",
    "distributed_ik",
    "scaling_efficiency",
]
