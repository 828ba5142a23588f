"""Performance benchmark: throughput/latency sweeps over problem sizes.

Mirrors the reference's ``Benchmark/performance_benchmark.py`` (CPU-vs-GPU
sweeps N=100..50k, joints 6-18) reframed for XLA: compile time vs
steady-state latency, batch scaling, and the exact-dynamics rollout
throughput the reference never had (its GPU dynamics were simplified —
``cuda_kernels.py:1163-1166``).

Run on the TPU chip (default backend) or CPU:
``python -m benchmarks.performance_benchmark [--quick]``.
"""

from __future__ import annotations

import argparse
import os
import sys

from .common import device_latency, setup_backend, time_fn, write_artifact


def run(quick: bool = False, only: str = ""):
    import jax
    import jax.numpy as jnp

    from manipulapy_tpu import dynamics as dyn
    from manipulapy_tpu import ik as ik_mod
    from manipulapy_tpu import trajectory as traj
    from manipulapy_tpu.kinematics import forward_kinematics, jacobian
    from manipulapy_tpu.models import catalog

    model = catalog.ur5(dtype=jnp.float32)
    n = model.num_joints
    key = jax.random.PRNGKey(0)
    timings = []

    if only:
        if only != "mpc":
            raise SystemExit(f"unknown --only section: {only!r} (supported: mpc)")
        timings.extend(_run_mpc(quick))
        return timings

    # --- Trajectory generation sweep (reference sweeps 100..50k points).
    traj_sizes = [1000, 10_000] if quick else [100, 1000, 10_000, 100_000]
    q0 = jnp.zeros(n, jnp.float32)
    q1 = jnp.ones(n, jnp.float32)
    for N in traj_sizes:
        fn = jax.jit(lambda N=N: traj.joint_trajectory(model, q0, q1, 2.0, N, 5))
        timings.append(
            time_fn(f"joint_trajectory_N{N}", fn, items_per_call=N * n, N=N)
        )

    # --- Batched trajectory (B, N, J) (reference 3D kernel).
    B, N = (64, 1000) if quick else (256, 1000)
    ts = jax.random.uniform(key, (B, n), dtype=jnp.float32)
    te = ts + 1.0
    fn = jax.jit(lambda: traj.batch_joint_trajectory(model, ts, te, 2.0, N, 5))
    timings.append(time_fn(f"batch_trajectory_B{B}_N{N}", fn, items_per_call=B * N * n, B=B, N=N))

    # --- FK / Jacobian batch throughput.
    for Bk in ([4096] if quick else [1024, 16_384]):
        qs = jax.random.uniform(key, (Bk, n), minval=-3, maxval=3, dtype=jnp.float32)
        fk = jax.jit(jax.vmap(lambda q: forward_kinematics(model, q)))
        timings.append(time_fn(f"fk_batch_{Bk}", lambda fk=fk, qs=qs: fk(qs), items_per_call=Bk))
        jac = jax.jit(jax.vmap(lambda q: jacobian(model, q)))
        timings.append(time_fn(f"jacobian_batch_{Bk}", lambda jac=jac, qs=qs: jac(qs), items_per_call=Bk))

    # --- Exact dynamics batch throughput (the headline).
    for Bk in ([4096] if quick else [1024, 4096, 16_384]):
        qs = jax.random.uniform(key, (Bk, n), minval=-1, maxval=1, dtype=jnp.float32)
        dqs = jax.random.uniform(key, (Bk, n), minval=-1, maxval=1, dtype=jnp.float32)
        taus = jax.random.uniform(key, (Bk, n), minval=-10, maxval=10, dtype=jnp.float32)
        mm = jax.jit(jax.vmap(lambda q: dyn.mass_matrix(model, q)))
        timings.append(time_fn(f"mass_matrix_batch_{Bk}", lambda mm=mm, qs=qs: mm(qs), items_per_call=Bk))
        idyn = jax.jit(jax.vmap(lambda q, dq, t: dyn.rnea(model, q, dq, t)))
        timings.append(
            time_fn(f"rnea_batch_{Bk}", lambda idyn=idyn, qs=qs, dqs=dqs, taus=taus: idyn(qs, dqs, taus), items_per_call=Bk)
        )
        fd = jax.jit(jax.vmap(lambda q, dq, t: dyn.forward_dynamics_fast(model, q, dq, t)))
        timings.append(
            time_fn(f"forward_dynamics_batch_{Bk}", lambda fd=fd, qs=qs, dqs=dqs, taus=taus: fd(qs, dqs, taus), items_per_call=Bk)
        )

    # --- Rollout throughput (BASELINE config #2) through the PUBLIC API.
    # Called directly (no outer jit/vmap) so the dispatcher serves it with
    # the fused engines — wrapping it in jit turns the model into tracers
    # and benchmarks the generic-scan fallback instead (the round-2
    # mistake that reported 562k steps/s for a 63M steps/s engine).
    B, steps = (1024, 50) if quick else (4096, 50)
    q0b = jax.random.uniform(key, (B, n), minval=-1, maxval=1, dtype=jnp.float32)
    dq0b = jnp.zeros((B, n), jnp.float32)
    tausb = jax.random.uniform(key, (B, steps, n), minval=-10, maxval=10, dtype=jnp.float32)
    timings.append(
        time_fn(
            f"fd_rollout_B{B}_N{steps}",
            lambda: traj.forward_dynamics_trajectory(
                model, q0b, dq0b, tausb, dt=0.01, intRes=1
            ),
            items_per_call=B * steps,
            B=B,
            steps=steps,
            note="public dispatch-served API (fused engine on TPU)",
        )
    )
    # The generic-scan fallback, for the dispatch-win comparison.
    roll_generic = jax.jit(
        jax.vmap(lambda q, dq, t: traj.forward_dynamics_trajectory(model, q, dq, t, dt=0.01, intRes=1))
    )
    timings.append(
        time_fn(
            f"fd_rollout_generic_B{B}_N{steps}",
            lambda: roll_generic(q0b, dq0b, tausb),
            items_per_call=B * steps,
            iters=3,
            note="generic lax.scan fallback (traced-call path)",
        )
    )

    # --- Batched IK throughput (config #4 ingredient).
    Bik = 256 if quick else 1024
    qs = jax.random.uniform(key, (Bik, n), minval=-1.5, maxval=1.5, dtype=jnp.float32)
    targets = jax.jit(jax.vmap(lambda q: forward_kinematics(model, q)))(qs)
    guesses = qs + 0.2
    ikb = jax.jit(lambda T, g: ik_mod.solve_ik_batch(model, T, g, max_iterations=50))
    timings.append(
        time_fn(f"ik_batch_{Bik}", lambda: ikb(targets, guesses), items_per_call=Bik, iters=3)
    )

    timings.extend(_run_mpc(quick))
    return timings


def _run_mpc(quick: bool = False):
    """Receding-horizon MPC on the CALIBRATED vendored Panda, H=50 —
    BASELINE config #3: "H=50 MPC solves ... within a 10 ms budget".

    Measurement methodology (the tunnel round trip to the chip has been
    observed anywhere from 0.05 ms to ~24 ms across sessions, so every
    number here is decomposed):

    * ``device_ms`` (THE gate number): per-solve device time from an
      INLINE-UNROLLED receding-horizon chain (solve -> apply first
      control -> advance -> warm-start next solve), k=1 vs k=5 difference
      quotient — the fixed round trip cancels exactly. The round-2
      ``lax.scan``-over-solve chain never finished compiling; the inline
      unroll compiles in seconds (see ``common.inline_chain``).
    * ``blocked_ms`` / ``pipelined_ms``: naive fenced latency and
      pipelined-dispatch sustained rate of the bare jitted solve, for
      cross-checking (blocked includes one full tunnel round trip).
    * ``dispatch_floor``: the tunnel's own blocked/pipelined floor,
      measured in the same session.

    Solvers timed: the fused three-Pallas-kernel tracking solver
    (``mpc/fused.py``) on the 7-DoF calibrated arm chain (tip
    ``panda_hand``) and on the full 8-joint calibrated chain (arm +
    finger — the reference's exact actuated-joint set), plus a 2-iteration
    warm-start deployment config. Full (non ``--quick``) mode adds the
    generic ``ilqr`` solver and a vmapped batch (their jit compile is
    ~4.5 min cold — tracked in ``compile_s`` — vs <35 s for the fused
    solver; with the persistent compilation cache reruns are seconds).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .common import dispatch_floor, inline_chain
    from manipulapy_tpu.models import robot_data
    from manipulapy_tpu.mpc import ILQRParams, ilqr, make_step_fn, make_tracking_costs
    from manipulapy_tpu.mpc.fused import build_tracking_mpc

    timings = []
    floor = dispatch_floor()
    H = 50
    q_goal7 = [0.3, -0.4, 0.2, -1.6, 0.1, 1.4, 0.4]

    def receding_step(solver, H, n):
        def step(carry):
            x, us = carry
            us_new, xs, _ = solver.solve(x, us)
            x_next = xs[1]
            us_warm = jnp.concatenate([us_new[1:], us_new[-1:]], axis=0)
            return (x_next, us_warm)
        return step

    def fused_row(name, model, q_goal, iterations, **extra):
        import time as _time

        n = model.num_joints
        t0 = _time.perf_counter()
        solver = build_tracking_mpc(
            model, np.asarray(q_goal, dtype=np.float32), horizon=H, dt=0.01,
            iterations=iterations, line_search_steps=6,
        )
        x0 = jnp.zeros(2 * n, jnp.float32)
        us0 = jnp.zeros((H, n), jnp.float32)
        jax.block_until_ready(solver.solve(x0, us0))
        build_compile_s = _time.perf_counter() - t0

        bare = time_fn(f"{name}_bare", lambda: solver.solve(x0, us0), iters=8)
        # k spread sized so the chained work (~10-20 solves) dominates
        # tunnel jitter: at 0.4-1.2 ms/solve a 1-vs-5 chain is only 2-5 ms
        # of work vs multi-ms round-trip variance, which produced NaN
        # (t_large < t_small) for the 2-iteration config in round 4.
        row = device_latency(
            name, inline_chain(receding_step(solver, H, n), (x0, us0)),
            k_small=2, k_large=18, reps=5, items_per_call=1,
            solver="fused-pallas", horizon=H, iterations=iterations,
            robot="panda (calibrated, vendored URDF)", n_joints=n,
            build_plus_first_solve_compile_s=build_compile_s,
            blocked_ms=bare.min_s * 1e3, pipelined_ms=bare.sustained_s * 1e3,
            dispatch_floor=floor, **extra,
        )
        timings.append(row)
        return row

    panda7 = robot_data.load_robot("panda", tip_link="panda_hand", chain_joints_only=True)
    panda8 = robot_data.load_robot("panda")

    gate = fused_row("mpc_panda_H50_fused_single", panda7, q_goal7, 4,
                     tip_link="panda_hand", budget_ms=10.0)
    gate.extra["north_star_pass"] = bool(gate.sustained_s * 1e3 <= 10.0)

    fused_row("mpc_panda_H50_fused_warm2", panda7, q_goal7, 2,
              tip_link="panda_hand",
              note="receding-horizon deployment config: warm starts converge in 2 iterations")
    fused_row("mpc_panda_full8_H50_fused", panda8, q_goal7 + [0.02], 4,
              note="full calibrated chain (arm + finger) = the reference's exact actuated-joint set")

    if quick:
        return timings

    # --- Generic ilqr solver (flexible-cost path) on the same problem. ---
    n = panda7.num_joints
    params = ILQRParams(horizon=H, dt=0.01, iterations=4, line_search_steps=6)
    step_fn = make_step_fn(panda7, params.dt)
    # Hybrid linearization: differentiate the array-form step (compiles in
    # ~half the time of jacfwd over the scalar cgen step, same runtime).
    lin_step = make_step_fn(panda7, params.dt, fused=False)
    running, terminal = make_tracking_costs(panda7, jnp.asarray(q_goal7, jnp.float32))
    x0 = jnp.zeros(2 * n, jnp.float32)
    us0 = jnp.zeros((H, n), jnp.float32)

    @jax.jit
    def generic_once(x, us):
        res = ilqr(step_fn, running, terminal, x, us, params,
                   u_min=-panda7.torque_limit, u_max=panda7.torque_limit,
                   linearize_step_fn=lin_step)
        return res.us, res.xs, res.cost

    row = time_fn("mpc_panda_H50_generic", lambda: generic_once(x0, us0),
                  iters=8, solver="generic-ilqr", horizon=H,
                  dispatch_floor=floor,
                  note="blocked mean includes one tunnel round trip; "
                       "sustained_s (pipelined) bounds device time")
    timings.append(row)

    # Batched throughput (solves/s/chip): dispatch amortizes over the batch.
    Bm = 64
    x0b = jnp.zeros((Bm, 2 * n), jnp.float32)
    us0b = jnp.zeros((Bm, H, n), jnp.float32)
    batched = jax.jit(jax.vmap(lambda x, us: generic_once(x, us)[0]))
    timings.append(
        time_fn(f"mpc_panda_H50_batch_{Bm}", lambda: batched(x0b, us0b),
                items_per_call=Bm, iters=3)
    )

    # Batched FUSED solver (mpc/fused_batch.py): scenarios on the (8, 128)
    # tile axes — the fleet path that used to fall back to the generic
    # solver above (round-3 missing item #1). Per-scenario goals included.
    from manipulapy_tpu.mpc.fused_batch import build_batch_tracking_mpc

    rngb = np.random.default_rng(0)
    for Bf in (64, 1024, 4096):
        goals = jnp.asarray(
            np.asarray(q_goal7)[None]
            + rngb.uniform(-0.2, 0.2, (Bf, n)).astype(np.float32)
        )
        x0f = jnp.asarray(rngb.uniform(-0.2, 0.2, (Bf, 2 * n)), jnp.float32)
        us0f = jnp.zeros((Bf, H, n), jnp.float32)
        import time as _time

        t0 = _time.perf_counter()
        mpcb = build_batch_tracking_mpc(panda7, goals, Bf, H, dt=0.01, iterations=4)
        jax.block_until_ready(mpcb.solve(x0f, us0f))
        build_s = _time.perf_counter() - t0
        timings.append(
            time_fn(
                f"mpc_batch_fused_{Bf}",
                lambda: mpcb.solve(x0f, us0f),
                items_per_call=Bf, iters=5,
                solver="fused-batch-pallas", horizon=H, iterations=4,
                robot="panda (calibrated 7-DoF chain)",
                build_plus_first_solve_compile_s=round(build_s, 1),
                note="B full H=50 4-iteration iLQR solves per launch, "
                     "per-scenario goals/line-search/regularization; "
                     "B=64 pads to one 1024-scenario tile (same cost)",
            )
        )
    return timings


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--quick", action="store_true")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--only", default="", help="run a single section (mpc)")
    p.add_argument(
        "--output", default=os.path.join(os.path.dirname(__file__), "performance_results.json")
    )
    args = p.parse_args(argv)

    backend = setup_backend("cpu" if args.cpu else None)
    print(f"backend: {backend}")
    timings = run(quick=args.quick, only=args.only)
    metrics = {}
    for t in timings:
        line = (
            f"  {t.name}: {t.mean_s*1e3:.3f} ms/call, "
            f"{t.sustained_s*1e3:.3f} ms sustained (compile {t.compile_s:.2f} s)"
        )
        if t.throughput:
            line += f"  {t.throughput:,.0f} items/s"
            metrics[f"{t.name}_per_s"] = t.throughput
        metrics[f"{t.name}_ms"] = t.sustained_s * 1e3
        print(line)
    write_artifact(
        args.output,
        {"benchmark": "performance", "backend": backend, "timings": timings, "metrics": metrics},
    )
    print(f"-> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
