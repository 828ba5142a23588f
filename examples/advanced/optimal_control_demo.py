"""Advanced: iLQR optimal control and receding-horizon MPC.

Twin of the reference's ``optimal_control_advanced_demo.py`` — except the
reference has no trajectory optimizer at all (its planner stops at
potential-field nudging, ``path_planning.py:2252``); this is the BASELINE
config #3 workload. Four phases:

1. **One iLQR solve** — exact-dynamics linearization, Riccati backward
   pass, line search, box torque limits; cost per iteration printed.
2. **Receding horizon** — apply the first control, shift the warm start,
   re-solve; tracks the goal like a deployed controller.
3. **Disturbance rejection** — a mid-run velocity kick; MPC recovers.
4. **Torque-limit sweep** — how tight actuation changes the solution.

Saves a tracking plot to ``examples/out/optimal_control.png``.
Run: ``python examples/advanced/optimal_control_demo.py [--quick] [--cpu]``.
"""

import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from _bootstrap import parse_args

args = parse_args(__doc__)
QUICK = "--quick" in sys.argv

import time

import jax
import jax.numpy as jnp
import numpy as np

from manipulapy_tpu.models import catalog
from manipulapy_tpu.mpc import ILQRParams, ilqr, make_step_fn, make_tracking_costs, mpc_step

# --quick swaps in the 2-link planar arm: the n=6 iLQR program costs
# minutes of XLA:CPU compile on small hosts, the planar one seconds.
model = catalog.two_link_planar() if QUICK else catalog.get_robot(args.robot)
n = model.num_joints
H, dt = (16, 0.02) if QUICK else (30, 0.02)
iters = 4 if QUICK else 8
params = ILQRParams(horizon=H, dt=dt, iterations=iters, line_search_steps=6)
step_fn = make_step_fn(model, dt)
OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "out")
os.makedirs(OUT_DIR, exist_ok=True)

q_goal = jnp.asarray(np.linspace(0.3, 0.8, n))
running, terminal = make_tracking_costs(model, q_goal)
x0 = jnp.zeros(2 * n)
us0 = jnp.zeros((H, n))

# -- Phase 1: a single solve, iteration by iteration -------------------------
print("=" * 72)
print(f"Phase 1: iLQR solve ({args.robot}, H={H}, dt={dt}, box torque limits)")
print("=" * 72)
t0 = time.perf_counter()
res = ilqr(step_fn, running, terminal, x0, us0, params,
           u_min=-model.torque_limit, u_max=model.torque_limit)
jax.block_until_ready(res.us)
print(f"compile + solve: {time.perf_counter() - t0:.2f} s")
print(f"{'iterations':>12}  {'final cost':>12}")
for it in ([1, iters] if QUICK else [1, 2, 4, iters]):
    p_it = params._replace(iterations=it)
    r = ilqr(step_fn, running, terminal, x0, us0, p_it,
             u_min=-model.torque_limit, u_max=model.torque_limit)
    print(f"{it:>12}  {float(r.cost):>12.3f}")
t0 = time.perf_counter()
res = ilqr(step_fn, running, terminal, x0, us0, params,
           u_min=-model.torque_limit, u_max=model.torque_limit)
jax.block_until_ready(res.us)
print(f"warm re-solve: {(time.perf_counter() - t0)*1e3:.1f} ms wall "
      f"(fused-Pallas variant of this problem: 0.86 ms device — "
      f"benchmarks/performance_results.json)")

# -- Phase 2: receding-horizon loop ------------------------------------------
print()
print("=" * 72)
print("Phase 2: receding-horizon MPC (apply, shift, re-solve)")
print("=" * 72)
STEPS = 8 if QUICK else 20
x, us_warm = x0, res.us
errs = [float(jnp.max(jnp.abs(x[:n] - q_goal)))]
for step in range(STEPS):
    u, us_warm, r = mpc_step(step_fn, running, terminal, x, us_warm, params,
                             u_min=-model.torque_limit, u_max=model.torque_limit)
    x = step_fn(x, u)
    errs.append(float(jnp.max(jnp.abs(x[:n] - q_goal))))
print(f"max joint error: {errs[0]:.4f} -> {errs[-1]:.4f} rad over {STEPS} steps")
print(f"final velocity magnitude {float(jnp.max(jnp.abs(x[n:]))):.4f} rad/s, "
      f"solver converged: {bool(r.converged)}")

# -- Phase 3: disturbance rejection ------------------------------------------
print()
print("=" * 72)
print("Phase 3: disturbance rejection (velocity kick mid-run)")
print("=" * 72)
x_d, us_d = x0, res.us
errs_d = []
for step in range(STEPS):
    if step == STEPS // 2:
        x_d = x_d.at[n:].add(0.8)  # 0.8 rad/s kick on every joint
        print(f"  step {step}: +0.8 rad/s velocity kick applied")
    u, us_d, r = mpc_step(step_fn, running, terminal, x_d, us_d, params,
                          u_min=-model.torque_limit, u_max=model.torque_limit)
    x_d = step_fn(x_d, u)
    errs_d.append(float(jnp.max(jnp.abs(x_d[:n] - q_goal))))
print(f"error after kick {errs_d[STEPS // 2]:.4f} -> final {errs_d[-1]:.4f} rad "
      f"(recovered: {errs_d[-1] < 2 * errs[-1] + 0.05})")

# -- Phase 4: torque-limit sweep ---------------------------------------------
print()
print("=" * 72)
print("Phase 4: torque-limit sweep (tighter actuation, same solver)")
print("=" * 72)
print(f"{'u_limit':>10} {'cost':>12} {'max |u|':>10}")
lims = [5.0, 50.0] if QUICK else [2.0, 5.0, 20.0, 100.0]
for lim in lims:
    u_lim = jnp.full(n, lim)
    r = ilqr(step_fn, running, terminal, x0, us0, params, u_min=-u_lim, u_max=u_lim)
    print(f"{lim:>10.1f} {float(r.cost):>12.3f} {float(jnp.max(jnp.abs(r.us))):>10.3f}")
print("the box projection saturates exactly at the limit — the solver")
print("plans WITH the constraint rather than clipping after the fact.")

# -- Plot artifact -----------------------------------------------------------
try:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 4))
    ax.plot(errs, "o-", label="nominal MPC")
    ax.plot(range(1, len(errs_d) + 1), errs_d, "s--", label="with velocity kick")
    ax.axvline(STEPS // 2 + 1, color="tab:red", ls=":", label="disturbance")
    ax.set_xlabel("MPC step")
    ax.set_ylabel("max joint error to goal (rad)")
    ax.set_yscale("log")
    ax.set_title(f"Receding-horizon tracking ({args.robot}, H={H})")
    ax.grid(True, alpha=0.3)
    ax.legend()
    out_png = os.path.join(OUT_DIR, "optimal_control.png")
    fig.savefig(out_png, dpi=120, bbox_inches="tight")
    print(f"\nplot saved: {out_png}")
except ImportError:
    print("\n(matplotlib unavailable — plot skipped)")
