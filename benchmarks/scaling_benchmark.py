#!/usr/bin/env python3
"""Virtual-mesh scaling benchmark: the honest stand-in for multi-host.

Real 2+-host scaling is unmeasurable in this environment (one tunnelled
chip); what CAN be measured — and what exposes collective/partitioning
overhead early — is the virtual CPU mesh
(``xla_force_host_platform_device_count``). Two caveats shape the
methodology:

* all virtual devices share the host's physical cores, so FIXED
  PER-DEVICE work cannot show weak scaling (8 devices on 2 vCPUs run 8x
  the work on the same silicon — the raw table below shows exactly
  that); instead the committed gate is **sharding-overhead efficiency**:
  the SAME total work run unsharded on one device vs sharded over n
  devices. Ideal = 1.0 (partitioning + collectives free); the gate is
  >= 0.8 at 8 devices.
* the workloads are the product mesh paths: ``distributed_rollout``
  (scenario-sharded exact-dynamics rollouts) and the fleet cost round
  (``parallel/fleet.py``, a ``psum`` reduction over the mesh) — the same
  code MULTICHIP dryruns compile.

Writes ``benchmarks/scaling_results.json``. Run:
``python -m benchmarks.scaling_benchmark`` (forces CPU + 8 virtual
devices; must be a fresh process).
"""

from __future__ import annotations

import json
import os
import sys
import time

# Must precede the jax import: 8 virtual CPU devices.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from benchmarks import common  # noqa: E402

TOTAL_B = 1024  # total rollout scenarios (fixed across device counts)
STEPS = 20
GATE = 0.8


def _median(fn, reps=5):
    """Median-of-reps (was min-of-3): on a 2-vCPU host running up to 8
    virtual devices, single draws produced non-monotonic artifacts (a
    0.74 eff at 2 devices in round 3 beside 0.94 at 4 — host noise, not
    collective cost); medians over 5 reps smooth scheduler jitter."""
    import statistics

    fn()  # compile
    jax.block_until_ready(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def run():
    from manipulapy_tpu.models import catalog
    from manipulapy_tpu.parallel import mesh as pmesh

    model = catalog.ur5(dtype=jnp.float32)
    n = model.num_joints
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    q0 = jax.random.uniform(k1, (TOTAL_B, n), minval=-1, maxval=1, dtype=jnp.float32)
    dq0 = jax.random.uniform(k2, (TOTAL_B, n), minval=-0.5, maxval=0.5, dtype=jnp.float32)
    taus = jax.random.uniform(k3, (TOTAL_B, STEPS, n), minval=-10, maxval=10, dtype=jnp.float32)

    device_counts = [1, 2, 4, 8]
    rollout_t = {}
    psum_t = {}
    for nd in device_counts:
        m = pmesh.make_mesh(nd)

        def roll(m=m):
            return pmesh.distributed_rollout(model, m, q0, dq0, taus, dt=0.01)

        rollout_t[nd] = _median(roll)

        # Fleet-style cost round: sharded rollout summary + psum-shaped
        # global reduction (jnp.sum over a sharded array lowers to the
        # same all-reduce the fleet MPC round uses).
        def cost_round(m=m):
            qs, dqs, _ = pmesh.distributed_rollout(model, m, q0, dq0, taus, dt=0.01)
            return float(jnp.sum(qs * qs) + jnp.sum(dqs * dqs))

        psum_t[nd] = _median(cost_round)

    overhead_eff = {nd: rollout_t[1] / rollout_t[nd] for nd in device_counts}
    overhead_eff_cost = {nd: psum_t[1] / psum_t[nd] for nd in device_counts}

    # Raw fixed-per-device-work table (NOT the gate — see module docstring):
    # per-device work held at TOTAL_B/8 scenarios.
    per_dev_b = TOTAL_B // 8
    weak_t = {}
    for nd in device_counts:
        m = pmesh.make_mesh(nd)
        b = per_dev_b * nd

        def roll(m=m, b=b):
            return pmesh.distributed_rollout(model, m, q0[:b], dq0[:b], taus[:b], dt=0.01)

        weak_t[nd] = _median(roll)
    weak_eff = pmesh.scaling_efficiency(weak_t)

    # Flagship-path row: the batched fused Pallas solver under shard_map
    # (parallel/fused_fleet.py — BASELINE config #5's actual shape).
    # Same methodology as the gate: fixed total work (FUSED_B scenarios),
    # 1 device vs 8 devices. A 3-DoF chain keeps the interpret-mode
    # XLA:CPU compile bounded (a 6-DoF interpret build measured >15 min
    # on this host; the full-size Panda build is benchmarked on the real
    # chip in performance_results.json).
    from manipulapy_tpu.parallel.fused_fleet import build_sharded_batch_mpc

    # B chosen so the padded tile work is IDENTICAL at both device
    # counts: 8192 scenarios = 8 full (8, 128) tiles on one device, or
    # exactly one full tile per device on eight — so the ratio isolates
    # partitioning/collective overhead like the main gate does.
    FUSED_B, FUSED_H = 8192, 10
    model3 = catalog.serial_chain(3, dtype=jnp.float32)
    n3 = model3.num_joints
    kf = jax.random.PRNGKey(1)
    goals3 = jax.random.uniform(kf, (FUSED_B, n3), minval=-0.4, maxval=0.4, dtype=jnp.float32)
    x0f = jnp.zeros((FUSED_B, 2 * n3), jnp.float32)
    usf = jnp.zeros((FUSED_B, FUSED_H, n3), jnp.float32)
    fused_t = {}
    for nd in [1, 8]:
        m = pmesh.make_mesh(nd)
        smpc = build_sharded_batch_mpc(
            model3, m, goals3, FUSED_B, FUSED_H, 0.02,
            iterations=2, line_search_steps=4, interpret=True,
        )

        def solve(smpc=smpc):
            return smpc.solve(x0f, usf)

        fused_t[nd] = _median(solve, reps=3)
    fused_eff = {nd: fused_t[1] / fused_t[nd] for nd in fused_t}

    return {
        "benchmark": "virtual_mesh_scaling",
        "host_cpus": os.cpu_count(),
        "total_scenarios": TOTAL_B,
        "steps": STEPS,
        "gate": {
            "name": "sharding_overhead_efficiency_all_device_counts",
            "values": overhead_eff,
            "threshold": GATE,
            "pass": bool(all(overhead_eff[nd] >= GATE for nd in overhead_eff)),
            "definition": "T(total work, 1 device) / T(same total work, n devices), median of 5 reps, gated at EVERY device count",
        },
        "rollout_time_s": rollout_t,
        "sharding_overhead_efficiency": overhead_eff,
        "cost_round_time_s": psum_t,
        "sharding_overhead_efficiency_with_reduction": overhead_eff_cost,
        "fixed_per_device_work_time_s": weak_t,
        "fixed_per_device_work_efficiency": weak_eff,
        "fused_batch_sharded": {
            "solver": "mpc.fused_batch under shard_map (parallel/fused_fleet.py)",
            "robot": "serial_chain(3)",
            "batch": FUSED_B,
            "horizon": FUSED_H,
            "time_s": fused_t,
            "sharding_overhead_efficiency": fused_eff,
            "note": (
                "interpret-mode Pallas on the virtual mesh; 8192 scenarios "
                "= 8 full (8, 128) scenario tiles on 1 device vs one full "
                "tile per device on 8 — constant padded tile work, so the "
                "ratio isolates partitioning/collective overhead for the "
                "flagship solver (the full-size real-chip numbers live in "
                "performance_results.json)."
            ),
        },
        "note": (
            "all virtual devices share this host's physical cores, so the "
            "fixed-per-device table reflects core oversubscription, not "
            "collective cost; the gate isolates partitioning/collective "
            "overhead at constant total work. Real weak scaling requires "
            "real chips (MULTICHIP dryrun covers compile/execute validity)."
        ),
    }


def main() -> int:
    out = os.path.join(os.path.dirname(__file__), "scaling_results.json")
    payload = run()
    common.write_artifact(out, payload)
    g = payload["gate"]
    print(json.dumps({k: payload[k] for k in (
        "rollout_time_s", "sharding_overhead_efficiency",
        "fixed_per_device_work_efficiency")}, indent=2, default=str))
    vals = " ".join(f"{nd}dev={v:.3f}" for nd, v in g["values"].items())
    print(f"gate {g['name']}: {vals} (>= {g['threshold']}) pass={g['pass']}")
    print(f"wrote {out}")
    return 0 if g["pass"] else 2


if __name__ == "__main__":
    sys.exit(main())
