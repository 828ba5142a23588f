#!/usr/bin/env python3
"""Kernel bake-off: Pallas vs XLA-fused vs generic-vmap, on real hardware.

VERDICT round 1, item 4: "no dead kernels — every kernel either serves a
product path or has a committed measurement justifying why not." This
script produces that measurement. For each hot op it times every
implementation across batch sizes on the current backend (run it on the
TPU chip) and writes ``benchmarks/kernel_bakeoff_results.json`` plus a
human-readable table; the winners drive the dispatch defaults in
``manipulapy_tpu.ops.dispatch``.

Ops compared:
- exact-dynamics rollout (B, N=50): generic ``vmap(forward_dynamics_fast)``
  scan vs the cgen SoA scan (``ops/fd_step.py``) vs the fused Pallas
  kernel (``ops/pallas_rollout.py``);
- point-to-point trajectory (B, N): jnp broadcast (``trajectory.py``) vs
  Pallas (``ops/pallas_kernels.py::trajectory_pallas``);
- Cartesian potential+gradient (P points): jnp vs Pallas.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.common import setup_backend, time_fn, write_artifact  # noqa: E402


def run(quick: bool = False):
    import jax
    import jax.numpy as jnp

    from manipulapy_tpu import trajectory as traj
    from manipulapy_tpu.dynamics import forward_dynamics_fast
    from manipulapy_tpu.models import catalog
    from manipulapy_tpu.ops.fd_step import build_rollout
    from manipulapy_tpu.ops.pallas_kernels import (
        cartesian_potential_pallas,
        pallas_available,
        trajectory_pallas,
    )
    from manipulapy_tpu.ops.pallas_rollout import build_pallas_rollout
    from manipulapy_tpu.potential_field import cartesian_potential_field

    interpret = not pallas_available()
    model = catalog.ur5(dtype=jnp.float32)
    n = model.num_joints
    key = jax.random.PRNGKey(0)
    timings = []

    # ---- rollout engines ---------------------------------------------------
    N = 50
    batches = [4096, 16384] if quick else [256, 1024, 4096, 16384, 65536, 131072]
    roll_cgen = build_rollout(model, dt=0.01, intRes=1)
    roll_pallas = build_pallas_rollout(model, dt=0.01, intRes=1, interpret=interpret)

    def make_generic():
        def substep(c, tau):
            q, dq = c
            ddq = forward_dynamics_fast(model, q, dq, tau)
            dq_n = jnp.clip(dq + ddq * 0.01, -model.velocity_limit, model.velocity_limit)
            q_n = jnp.clip(q + dq_n * 0.01, model.joint_lower, model.joint_upper)
            return (q_n, dq_n), (q, dq, ddq)

        @jax.jit
        def rollout(q0, dq0, taus):
            def per(q0_i, dq0_i, taus_i):
                _, out = jax.lax.scan(substep, (q0_i, dq0_i), taus_i)
                return out

            return jax.vmap(per)(q0, dq0, jnp.swapaxes(taus, 0, 1).swapaxes(0, 1))

        return rollout

    roll_generic = make_generic()

    for B in batches:
        k1, k2, k3 = jax.random.split(jax.random.fold_in(key, B), 3)
        q0 = jax.random.uniform(k1, (B, n), minval=-1, maxval=1, dtype=jnp.float32)
        dq0 = jax.random.uniform(k2, (B, n), minval=-0.5, maxval=0.5, dtype=jnp.float32)
        taus = jax.random.uniform(k3, (B, N, n), minval=-10, maxval=10, dtype=jnp.float32)
        items = B * N
        if B <= 16384:  # generic path is too slow to sweep at full width
            timings.append(
                time_fn(f"rollout_generic_B{B}", lambda: roll_generic(q0, dq0, taus),
                        items_per_call=items, iters=3)
            )
        timings.append(
            time_fn(f"rollout_cgen_xla_B{B}", lambda: roll_cgen(q0, dq0, taus),
                    items_per_call=items, iters=5)
        )
        timings.append(
            time_fn(f"rollout_pallas_B{B}", lambda: roll_pallas(q0, dq0, taus),
                    items_per_call=items, iters=5)
        )

    # ---- trajectory kernel -------------------------------------------------
    for B, Nt in ([(256, 1000)] if quick else [(64, 1000), (256, 1000), (1024, 4096)]):
        ts = jax.random.uniform(key, (B, n), dtype=jnp.float32)
        te = ts + 1.0
        items = B * Nt * n
        timings.append(
            time_fn(
                f"traj_jnp_B{B}_N{Nt}",
                lambda Nt=Nt, ts=ts, te=te: traj.batch_joint_trajectory(
                    model, ts, te, 2.0, Nt, 5, clip_to_limits=False
                ),
                items_per_call=items,
            )
        )
        timings.append(
            time_fn(
                f"traj_pallas_B{B}_N{Nt}",
                lambda Nt=Nt, ts=ts, te=te: trajectory_pallas(
                    ts, te, 2.0, Nt, 5, interpret=interpret
                ),
                items_per_call=items,
            )
        )

    # ---- potential field ---------------------------------------------------
    for P in ([65536] if quick else [16384, 262144]):
        pts = jax.random.uniform(key, (P, 3), dtype=jnp.float32)
        goal = jnp.asarray([0.5, 0.5, 0.5], jnp.float32)
        obs = jax.random.uniform(jax.random.fold_in(key, 1), (32, 3), dtype=jnp.float32)
        timings.append(
            time_fn(
                f"potential_jnp_P{P}",
                lambda pts=pts: cartesian_potential_field(pts, goal, obs, 0.5),
                items_per_call=P,
            )
        )
        timings.append(
            time_fn(
                f"potential_pallas_P{P}",
                lambda pts=pts: cartesian_potential_pallas(
                    pts, goal, obs, 0.5, interpret=interpret
                ),
                items_per_call=P,
            )
        )

    return timings, interpret


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument(
        "--output",
        default=os.path.join(os.path.dirname(__file__), "kernel_bakeoff_results.json"),
    )
    args = ap.parse_args(argv)

    backend = setup_backend()
    print(f"backend: {backend}")
    timings, interpret = run(quick=args.quick)
    metrics = {}
    for t in timings:
        metrics[f"{t.name}_per_s"] = t.throughput
        print(
            f"  {t.name}: {t.sustained_s*1e3:.3f} ms sustained, "
            f"{t.throughput:,.0f} items/s (compile {t.compile_s:.1f} s)"
        )
    write_artifact(
        args.output,
        {
            "benchmark": "kernel_bakeoff",
            "backend": backend,
            "pallas_interpret_mode": interpret,
            "timings": timings,
            "metrics": metrics,
        },
    )
    print(f"-> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
