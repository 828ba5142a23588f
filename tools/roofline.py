#!/usr/bin/env python3
"""Roofline analysis of the fused exact-dynamics rollout engines.

Pulls FLOP and byte counts from XLA's own compiled-program cost model
(``Compiled.cost_analysis()``) for the ``ops/fd_step.py`` cgen rollout at
the bench shape, divides by the honestly-measured device time (in-program
difference quotient — see ``bench.py``), and places both rollout engines
on the v5e roofline:

* HBM:  ~819 GB/s (TPU v5e public spec)
* VPU:  1.9-3.6 TFLOP/s f32 envelope (see ``VPU_TFLOP_F32``) — the
  rollout is scalar/elementwise SoA code, so it runs on the VPU, not the
  MXU; the MXU's 197 TFLOP/s bf16 is unreachable for this op mix.

The Pallas engine (``ops/pallas_rollout.py``) computes the exact same
emitted per-step program (same ``build_fd_step_planes`` trace), so its
per-step FLOP count is the cgen engine's; only its HBM traffic differs
(state stays in VMEM across the horizon instead of round-tripping per
scan step), which is exactly why it wins the bakeoff.

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
from manipulapy_tpu.ops.pallas_rollout import build_pallas_rollout

HBM_GB_S = 819.0  # TPU v5e HBM bandwidth, public spec
# VPU f32 peak envelope: (8, 128) vector unit x ~4 ALUs x 2 FLOP (FMA) x
# ~0.94 GHz ~ 7.7 TFLOP/s. Empirical lower bound from this very workload:
# the VMEM-resident rollout configuration sustains > 5 TFLOP/s by the XLA
# cost model's FLOP accounting, so the earlier 1.9-3.6 estimates were too
# low. Utilization is reported against this envelope; treat +-30% as the
# honest uncertainty (exact ALU count/clock are not public).
VPU_TFLOP_F32 = 7.7


def _device_time(rollout, q0, dq0, taus, k_small=2, k_large=8, last=None):
    """Difference-quotient device time of one rollout call."""
    if last is None:
        last = lambda x: x[:, -1, :]

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

    small, large = make_chain(k_small), make_chain(k_large)
    jax.device_get(small(q0, dq0, taus))
    jax.device_get(large(q0, dq0, taus))

    def best(fn, reps=3):
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.device_get(fn(q0, dq0, taus))
            b = min(b, time.perf_counter() - t0)
        return b

    return (best(large) - best(small)) / (k_large - k_small)


def measure(batch=131072, steps=50):
    model = catalog.ur5(dtype=jnp.float32)
    n = model.num_joints
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    q0 = jax.random.uniform(k1, (batch, n), minval=-1, maxval=1)
    dq0 = jax.random.uniform(k2, (batch, n), minval=-0.5, maxval=0.5)
    taus = jax.random.uniform(k3, (batch, steps, n), minval=-10, maxval=10)

    rollout_cgen = build_rollout(model, dt=0.01, intRes=1)
    rollout_pallas = build_pallas_rollout(
        model, dt=0.01, intRes=1, interpret=jax.default_backend() != "tpu"
    )
    rollout_tiled = build_pallas_rollout(
        model, dt=0.01, intRes=1, interpret=jax.default_backend() != "tpu",
        tiled_io=True,
    )

    # XLA cost model for ONE cgen rollout call (the Pallas kernel is a
    # custom call the cost model cannot see into; same math per step).
    compiled = jax.jit(rollout_cgen).lower(q0, dq0, taus).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0]
    # XLA's cost model counts a lax.scan body ONCE, independent of trip
    # count (verified on this backend: flops of a length-10/50/100 scan of
    # the same body are identical), so scale by the waypoint count.
    flops = float(cost.get("flops", 0.0)) * steps
    bytes_accessed = float(cost.get("bytes accessed", 0.0)) * steps

    from manipulapy_tpu.ops.pallas_rollout import stage_batch

    q0_t, dq0_t, taus_t = stage_batch(q0), stage_batch(dq0), stage_batch(taus)

    n_steps = batch * steps
    engines = {}
    for name, rollout in (
        ("cgen_xla", rollout_cgen),
        ("pallas", rollout_pallas),
        ("pallas_tiled_io", rollout_tiled),
    ):
        if name == "pallas_tiled_io":
            t_call = _device_time(
                rollout, q0_t, dq0_t, taus_t, last=lambda x: x[:, -1]
            )
        else:
            t_call = _device_time(rollout, q0, dq0, taus)
        engines[name] = {
            "device_time_s": t_call,
            "steps_per_s": n_steps / t_call,
            "achieved_tflop_s": flops / t_call / 1e12,
            "vpu_utilization_pct": 100.0 * (flops / t_call / 1e12) / VPU_TFLOP_F32,
        }

    # VMEM-resident point: B=1024 fits the whole working set (1.2 MB of
    # torques + state) in VMEM, so chained rollouts run with ZERO HBM
    # streaming — the pure-compute speed of light for this step program.
    B_small = 1024
    q0s, dq0s, tauss = q0[:B_small], dq0[:B_small], taus[:B_small]
    t_small_call = _device_time(rollout_pallas, q0s, dq0s, tauss,
                                k_small=8, k_large=256)
    fps = flops / n_steps  # per-step FLOPs
    small_steps = B_small * steps
    engines["pallas_vmem_resident_B1024"] = {
        "device_time_s": t_small_call,
        "steps_per_s": small_steps / t_small_call,
        "achieved_tflop_s": fps * small_steps / t_small_call / 1e12,
        "vpu_utilization_pct": 100.0 * (fps * small_steps / t_small_call / 1e12)
        / VPU_TFLOP_F32,
    }
    # Byte-level numbers only make sense for the engine the cost model saw.
    engines["cgen_xla"].update(
        {
            "achieved_gb_s": bytes_accessed / engines["cgen_xla"]["device_time_s"] / 1e9,
            "hbm_utilization_pct": 100.0
            * (bytes_accessed / engines["cgen_xla"]["device_time_s"] / 1e9)
            / HBM_GB_S,
        }
    )
    return {
        "batch": batch,
        "steps": steps,
        "xla_flops_per_call": flops,
        "xla_bytes_per_call": bytes_accessed,
        "flops_per_step": flops / n_steps,
        "bytes_per_step_cgen": bytes_accessed / n_steps,
        "arithmetic_intensity_flop_per_byte_cgen": flops / max(bytes_accessed, 1.0),
        "hbm_roofline_intensity": VPU_TFLOP_F32 * 1e12 / (HBM_GB_S * 1e9),
        "engines": engines,
    }


def _write_markdown(path, r):
    cg = r["engines"]["cgen_xla"]
    pa = r["engines"]["pallas"]
    pt = r["engines"]["pallas_tiled_io"]
    pv = r["engines"]["pallas_vmem_resident_B1024"]
    lines = [
        "# Rollout-engine roofline (TPU v5e, measured)",
        "",
        f"Workload: exact-dynamics UR5 rollout, batch {r['batch']:,} x "
        f"{r['steps']} steps (f32). FLOP/byte counts from XLA's compiled-"
        "program cost model for the cgen engine; device times from in-"
        "program difference quotients (tunnel round trip cancelled). "
        "Generated by `python tools/roofline.py`; raw numbers in "
        "`benchmarks/roofline_results.json`.",
        "",
        "| engine | steps/s | achieved TFLOP/s | VPU util | achieved GB/s | HBM util |",
        "|---|---:|---:|---:|---:|---:|",
        f"| cgen (XLA scan) | {cg['steps_per_s']:,.0f} | {cg['achieved_tflop_s']:.3f} "
        f"| {cg['vpu_utilization_pct']:.1f}% | {cg['achieved_gb_s']:.0f} "
        f"| {cg['hbm_utilization_pct']:.1f}% |",
        f"| Pallas (VMEM-carry, staged (B,N,n) API) | {pa['steps_per_s']:,.0f} | {pa['achieved_tflop_s']:.3f} "
        f"| {pa['vpu_utilization_pct']:.1f}% | n/a (state in VMEM) | n/a |",
        f"| Pallas, tiled IO (kernel-native layout) | {pt['steps_per_s']:,.0f} | {pt['achieved_tflop_s']:.3f} "
        f"| {pt['vpu_utilization_pct']:.1f}% | n/a (state in VMEM) | n/a |",
        f"| Pallas, fully VMEM-resident (B=1024) | {pv['steps_per_s']:,.0f} "
        f"| {pv['achieved_tflop_s']:.3f} | {pv['vpu_utilization_pct']:.1f}% "
        f"| 0 (working set in VMEM) | n/a |",
        "",
        f"- Per-step cost: {r['flops_per_step']:,.0f} FLOP, "
        f"{r['bytes_per_step_cgen']:,.0f} B HBM traffic on the cgen engine.",
        f"- Arithmetic intensity (cgen): "
        f"{r['arithmetic_intensity_flop_per_byte_cgen']:.1f} FLOP/B vs the "
        f"roofline knee at {r['hbm_roofline_intensity']:.1f} FLOP/B — the "
        f"cgen engine is bound by "
        f"{'HBM bandwidth' if cg['hbm_utilization_pct'] > cg['vpu_utilization_pct'] else 'VPU compute'} "
        f"({cg['hbm_utilization_pct']:.0f}% HBM vs {cg['vpu_utilization_pct']:.0f}% VPU). "
        "Byte counts are the XLA cost model's per-iteration figure x trip "
        "count — an estimate of scan-carry traffic, not a profile.",
        "- The gap between the staged row and the tiled-IO row is NOT the "
        "kernel: it is the XLA (B, N, n) <-> (Bt, N, n, 8, 128) staging "
        "transposes of the convenience API (round 3 misattributed this to "
        "per-grid-cell DMA latency; larger time tiles and parallel grid "
        "semantics each moved <3%, removing the transposes recovered the "
        "rest). Producers that emit the kernel-native layout "
        "(`stage_batch`/`unstage_batch`, `tiled_io=True`) skip that cost "
        "entirely — bench.py's headline uses this path.",
        "- The Pallas engine runs the identical emitted step program but "
        "carries (q, dq) in VMEM scratch across the whole horizon, so the "
        "scan-step state round trips through HBM disappear; its speedup "
        "over cgen is the removed memory traffic plus XLA scan overhead.",
        "- Both engines are VPU (vector) workloads: the dynamics step is "
        "scalar SoA arithmetic with no matmuls large enough for the MXU.",
        "",
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines))


def main():
    r = measure(
        batch=int(os.environ.get("BENCH_BATCH", 131072)),
        steps=int(os.environ.get("BENCH_STEPS", 50)),
    )
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(root, "benchmarks", "roofline_results.json")
    with open(out, "w") as f:
        json.dump({"roofline": r, "hbm_gb_s": HBM_GB_S, "vpu_tflop_f32_est": VPU_TFLOP_F32,
                   "device": str(jax.devices()[0])}, f, indent=2)
    md = os.path.join(root, "docs", "ROOFLINE.md")
    _write_markdown(md, r)
    print(json.dumps(r, indent=2))
    print(f"-> {out}\n-> {md}")


if __name__ == "__main__":
    main()
