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
from manipulapy_tpu.ops.pallas_rollout import build_pallas_rollout, stage_batch

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

    # The product rollout engine for this shape: the Pallas VMEM-carry
    # kernel (ops/pallas_rollout.py), driven through its tiled-IO contract
    # — inputs/outputs in the kernel-native (Bt, ..., 8, 128) scenario
    # tiles, the layout an on-device producer/consumer pipeline (torque
    # generator -> rollout -> cost/reduction) uses. The (B, N, n) staging
    # transposes of the convenience API are measured at ~40% of the whole
    # rollout at this batch (951M vs 1.65G steps/s, docs/ROOFLINE.md);
    # ``stage_batch``/``unstage_batch`` are the public converters.
    # Off-TPU, fall back to the cgen scan.
    if jax.default_backend() == "tpu":
        rollout = build_pallas_rollout(model, dt=0.01, intRes=1, tiled_io=True)
        q0, dq0, taus = stage_batch(q0), stage_batch(dq0), stage_batch(taus)
        last = lambda x: x[:, -1]
    else:
        rollout = build_rollout(model, dt=0.01, intRes=1)
        last = lambda x: x[:, -1, :]

    # True on-device per-rollout time via in-program repetition: chain k
    # rollouts with a data dependence (each feeds its final state into the
    # next) inside one jitted program, force a scalar readback, and take
    # the difference quotient (T(k2) - T(k1)) / (k2 - k1). This cancels
    # the fixed host<->device round trip of the tunnelled chip, which a
    # plain ``block_until_ready`` loop folds into every call (measured on
    # v5e at this batch: blocked-loop 125 ms vs true 103 ms per rollout).
    def make_chain(k):
        @jax.jit
        def run(q, dq, taus):
            def body(carry, _):
                q, dq = carry
                qs, dqs, _ = rollout(q, dq, taus)
                return (last(qs), last(dqs)), None
            (qf, _), _ = jax.lax.scan(body, (q, dq), None, length=k)
            return jnp.sum(qf)
        return run

    k1, k2 = 2, 8
    small, large = make_chain(k1), make_chain(k2)
    jax.device_get(small(q0, dq0, taus))  # compile
    jax.device_get(large(q0, dq0, taus))

    def best(fn, reps=3):
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.device_get(fn(q0, dq0, taus))
            b = min(b, time.perf_counter() - t0)
        return b

    elapsed = (best(large) - best(small)) / (k2 - k1)

    steps_per_s = batch * steps / elapsed
    print(
        json.dumps(
            {
                "metric": "ur5_exact_fd_rollout_steps_per_s",
                "value": round(steps_per_s, 1),
                "unit": "steps/s (batch=%d, N=%d, exact dynamics, f32, kernel-native tiled IO; staged public API ~60%% of this, docs/ROOFLINE.md)" % (batch, steps),
                "vs_baseline": round(steps_per_s / REFERENCE_EXACT_STEPS_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
