"""Advanced: iLQR receding-horizon MPC to a joint-space goal.

Twin of the reference's ``optimal_control_advanced_demo.py`` — except the
reference has no trajectory optimizer at all (its planner stops at
potential-field nudging); this is the BASELINE config #3 workload:
exact-dynamics iLQR with box torque limits, warm-started across MPC steps.
"""

import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from _bootstrap import parse_args

args = parse_args(__doc__)

import time

import jax
import jax.numpy as jnp
import numpy as np

from manipulapy_tpu.models import catalog
from manipulapy_tpu.mpc import ILQRParams, ilqr, make_step_fn, make_tracking_costs, mpc_step

model = catalog.get_robot(args.robot)
n = model.num_joints
H, dt = 30, 0.02
params = ILQRParams(horizon=H, dt=dt, iterations=8, line_search_steps=6)
step_fn = make_step_fn(model, dt)

q_goal = jnp.asarray(np.linspace(0.3, 0.8, n))
running, terminal = make_tracking_costs(model, q_goal)

x0 = jnp.zeros(2 * n)
us0 = jnp.zeros((H, n))

print(f"iLQR solve: {args.robot}, H={H}, dt={dt}, box torque limits")
t0 = time.perf_counter()
res = ilqr(step_fn, running, terminal, x0, us0, params,
           u_min=-model.torque_limit, u_max=model.torque_limit)
jax.block_until_ready(res.us)
print(f"compile + solve: {time.perf_counter() - t0:.2f} s, cost {float(res.cost):.3f}")

t0 = time.perf_counter()
res = ilqr(step_fn, running, terminal, x0, us0, params,
           u_min=-model.torque_limit, u_max=model.torque_limit)
jax.block_until_ready(res.us)
solve_ms = (time.perf_counter() - t0) * 1e3
print(f"warm solve: {solve_ms:.1f} ms (budget: 10 ms on-device per BASELINE)")

# Receding-horizon loop: apply the first control, shift the warm start.
x, us_warm = x0, res.us
for step in range(20):
    u, us_warm, r = mpc_step(step_fn, running, terminal, x, us_warm, params,
                             u_min=-model.torque_limit, u_max=model.torque_limit)
    x = step_fn(x, u)
err = float(jnp.max(jnp.abs(x[:n] - q_goal)))
print(f"\nafter 20 MPC steps: max joint error to goal {err:.4f} rad, "
      f"velocity magnitude {float(jnp.max(jnp.abs(x[n:]))):.4f} rad/s")
print(f"final solver cost {float(r.cost):.4f}, converged: {bool(r.converged)}")
