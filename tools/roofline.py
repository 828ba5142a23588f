#!/usr/bin/env python3
"""Roofline analysis of the fused exact-dynamics rollout kernel.

Pulls FLOP and byte counts from XLA's own compiled-program cost model
(``Compiled.cost_analysis()``) for the ``ops/fd_step.py`` rollout at the
bench shape, divides by the honestly-measured device time (in-program
difference quotient — see ``bench.py``), and places the kernel on the
v5e roofline:

* HBM:  ~819 GB/s (TPU v5e public spec)
* VPU:  ~1.9 TFLOP/s f32 estimate (8x128 lanes x 2 FLOP/FMA x ~0.94 GHz)
  — the rollout is scalar/elementwise SoA code, so it runs on the VPU,
  not the MXU; the MXU's 197 TFLOP/s bf16 is unreachable for this op mix.

Writes ``docs/ROOFLINE.md`` + ``benchmarks/roofline_results.json``.
Run on the chip: ``python tools/roofline.py``.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

from manipulapy_tpu.models import catalog
from manipulapy_tpu.ops.fd_step import build_rollout

HBM_GB_S = 819.0  # TPU v5e HBM bandwidth, public spec
VPU_TFLOP_F32 = 1.9  # 8x128 lanes x 2 FLOP (FMA) x ~0.94 GHz, estimate


def measure(batch=131072, steps=50):
    model = catalog.ur5(dtype=jnp.float32)
    n = model.num_joints
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    q0 = jax.random.uniform(k1, (batch, n), minval=-1, maxval=1)
    dq0 = jax.random.uniform(k2, (batch, n), minval=-0.5, maxval=0.5)
    taus = jax.random.uniform(k3, (batch, steps, n), minval=-10, maxval=10)
    rollout = build_rollout(model, dt=0.01, intRes=1)

    # XLA cost model for ONE rollout call.
    lowered = jax.jit(rollout).lower(q0, dq0, taus)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    bytes_accessed = float(cost.get("bytes accessed", 0.0))

    # Honest device time: difference quotient over a data-dependent chain.
    def make_chain(k):
        @jax.jit
        def run(q, dq, taus):
            def body(carry, _):
                q, dq = carry
                qs, dqs, _ = rollout(q, dq, taus)
                return (qs[:, -1, :], dqs[:, -1, :]), None
            (qf, _), _ = jax.lax.scan(body, (q, dq), None, length=k)
            return jnp.sum(qf)
        return run

    k1_, k2_ = 2, 8
    small, large = make_chain(k1_), make_chain(k2_)
    jax.device_get(small(q0, dq0, taus))
    jax.device_get(large(q0, dq0, taus))

    def best(fn, reps=3):
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.device_get(fn(q0, dq0, taus))
            b = min(b, time.perf_counter() - t0)
        return b

    t_call = (best(large) - best(small)) / (k2_ - k1_)
    n_steps = batch * steps
    return {
        "batch": batch,
        "steps": steps,
        "device_time_s": t_call,
        "steps_per_s": n_steps / t_call,
        "xla_flops_per_call": flops,
        "xla_bytes_per_call": bytes_accessed,
        "flops_per_step": flops / n_steps,
        "bytes_per_step": bytes_accessed / n_steps,
        "achieved_tflop_s": flops / t_call / 1e12,
        "achieved_gb_s": bytes_accessed / t_call / 1e9,
        "vpu_utilization_pct": 100.0 * (flops / t_call / 1e12) / VPU_TFLOP_F32,
        "hbm_utilization_pct": 100.0 * (bytes_accessed / t_call / 1e9) / HBM_GB_S,
        "arithmetic_intensity_flop_per_byte": flops / max(bytes_accessed, 1.0),
        "hbm_roofline_intensity": VPU_TFLOP_F32 * 1e12 / (HBM_GB_S * 1e9),
    }


def main():
    r = measure(
        batch=int(os.environ.get("BENCH_BATCH", 131072)),
        steps=int(os.environ.get("BENCH_STEPS", 50)),
    )
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "benchmarks", "roofline_results.json")
    with open(out, "w") as f:
        json.dump({"roofline": r, "hbm_gb_s": HBM_GB_S, "vpu_tflop_f32_est": VPU_TFLOP_F32,
                   "device": str(jax.devices()[0])}, f, indent=2)
    bound = "compute (VPU)" if r["vpu_utilization_pct"] > r["hbm_utilization_pct"] else "memory (HBM)"
    print(json.dumps(r, indent=2))
    print(f"binding resource: {bound}")
    print(f"-> {out}")


if __name__ == "__main__":
    main()
