"""Backend dispatch for the hand-written Pallas kernels.

The analogue of the reference's CUDA/CPU auto-dispatch
(``path_planning.py:457-492``: use the GPU when the work size clears a
threshold, CPU otherwise) — reduced to what actually matters on TPU:
compiled Pallas kernels exist only on a real TPU backend, and below a
minimum work size the jnp path is identical anyway (XLA fuses the same
elementwise graph), so the dispatch is backend + work-size, not an
autotuner.

Env overrides (reference config style, ``MANIPULAPY_FASTMATH`` et al.):
``MANIPULAPY_TPU_NO_PALLAS=1`` forces the jnp paths everywhere;
``MANIPULAPY_TPU_FORCE_PALLAS=1`` forces Pallas (interpret mode off-TPU —
for tests).
"""

from __future__ import annotations

import jax

from ..utils.config import env_flag

__all__ = ["pallas_wanted", "rollout_engine"]

# Below this many output elements a kernel launch cannot beat the fused
# XLA graph. Measured (benchmarks/kernel_bakeoff_results.json, v5e): the
# Pallas rollout ties cgen/XLA at B=256 (both at the ~5 ms dispatch
# floor) and wins 1.5-9x from B=4096 up (41M vs 27M steps/s at B=4096,
# 477M vs 53M at B=131072); the trajectory and potential Pallas twins
# never beat their fused-XLA formulations and are NOT dispatched (see the
# kernel-policy notes in trajectory.py / potential_field.py).
MIN_PALLAS_ELEMENTS = 1 << 14


def pallas_wanted(num_elements: int = MIN_PALLAS_ELEMENTS) -> bool:
    """True when the compiled Pallas path should serve this call."""
    if env_flag("MANIPULAPY_TPU_NO_PALLAS"):
        return False
    if env_flag("MANIPULAPY_TPU_FORCE_PALLAS"):
        return True
    return jax.default_backend() == "tpu" and num_elements >= MIN_PALLAS_ELEMENTS


def rollout_engine(model, dt: float = 0.01, intRes: int = 1, g=(0.0, 0.0, -9.81),
                   batch_hint: int = 0):
    """The preferred rollout engine for this backend: the fused Pallas
    kernel on TPU (state carried in VMEM across the whole horizon), the
    cgen XLA scan elsewhere. Both share the exact same emitted dynamics
    (``ops/fd_step.py::build_fd_step_planes``). ``batch_hint`` is the
    total output element count when known; with no hint the work is
    assumed large. The public API route with per-call caching is
    ``trajectory.forward_dynamics_trajectory``."""
    if pallas_wanted(batch_hint if batch_hint > 0 else MIN_PALLAS_ELEMENTS):
        from .pallas_rollout import build_pallas_rollout

        return build_pallas_rollout(
            model, dt=dt, intRes=intRes, g=g,
            interpret=jax.default_backend() != "tpu",
        )
    from .fd_step import build_rollout

    return build_rollout(model, dt=dt, intRes=intRes, g=g)
