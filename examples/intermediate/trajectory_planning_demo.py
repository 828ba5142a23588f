"""Intermediate: joint/Cartesian/batch trajectories through the planner.

Twin of the reference's ``trajectory_planning_intermediate_demo.py``:
quintic vs cubic scaling, SE(3) Cartesian interpolation, a batched
(B, N, J) generation pass, inverse-dynamics torque profiles, and the
planner's performance-stats report (compile vs steady-state instead of
GPU-vs-CPU speedup).
"""

import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from _bootstrap import parse_args

args = parse_args(__doc__)

import jax
import jax.numpy as jnp
import numpy as np

from manipulapy_tpu.kinematics import forward_kinematics
from manipulapy_tpu.models import catalog
from manipulapy_tpu.planner import create_planner

model = catalog.get_robot(args.robot)
n = model.num_joints
planner = create_planner(model)

q0, q1 = jnp.zeros(n), jnp.asarray(np.linspace(0.4, 1.0, n))

for method, name in [(3, "cubic"), (5, "quintic")]:
    tr = planner.joint_trajectory(q0, q1, Tf=2.0, N=400, method=method)
    peak_v = float(jnp.max(jnp.abs(tr.velocity)))
    peak_a = float(jnp.max(jnp.abs(tr.acceleration)))
    print(f"{name:>8}: N=400, peak |dq| {peak_v:.3f} rad/s, peak |ddq| {peak_a:.3f} rad/s^2, "
          f"endpoint vel {float(jnp.max(jnp.abs(tr.velocity[-1]))):.1e}")

# Cartesian straight-line trajectory between two EE poses.
T_start = forward_kinematics(model, q0)
T_end = forward_kinematics(model, q1)
poses, vel, acc = planner.cartesian_trajectory(T_start, T_end, Tf=2.0, N=200)
d = float(jnp.linalg.norm(poses[-1][:3, 3] - T_end[:3, 3]))
print(f"\nCartesian SE(3) path: {poses.shape[0]} poses, terminal position error {d:.2e} m")

# Batched generation: 512 start/end pairs in one launch (the reference's
# 3D (B, t, j) CUDA kernel, as one XLA program).
B = 512
key = jax.random.PRNGKey(0)
starts = jax.random.uniform(key, (B, n), minval=-0.5, maxval=0.0)
ends = starts + 1.0
batch = planner.batch_joint_trajectory(starts, ends, Tf=2.0, N=300)
print(f"batched: {batch.position.shape} positions, "
      f"boundary err {float(jnp.max(jnp.abs(batch.position[:, 0] - jnp.clip(starts, model.joint_lower, model.joint_upper)))):.1e}")

# Torques along the quintic trajectory (exact inverse dynamics per point).
tr = planner.joint_trajectory(q0, q1, Tf=2.0, N=400, method=5)
taus = planner.inverse_dynamics_trajectory(tr.position, tr.velocity, tr.acceleration)
print(f"inverse-dynamics torques: {taus.shape}, peak |tau| {float(jnp.max(jnp.abs(taus))):.2f} Nm")

stats = planner.get_performance_stats()
print(f"\nplanner stats: {stats['calls']} calls, compile {stats['compile_time']:.2f} s, "
      f"steady avg {stats['avg_steady_time']*1e3:.2f} ms, "
      f"compile amortization {stats['compile_amortization']:.0f} calls")

# -- Dynamic feasibility: how fast can this motion be? -----------------------
# Shrink the duration until the inverse-dynamics torques hit the actuator
# limits — the planning question the reference's Benchmark answers with
# sweeps, done here as one table.
print("\ndynamic feasibility sweep (same path, shorter Tf):")
print(f"{'Tf (s)':>8} {'peak |tau| (Nm)':>16} {'within limits':>14}")
for Tf in (2.0, 1.0, 0.5, 0.25):
    trf = planner.joint_trajectory(q0, q1, Tf=Tf, N=200, method=5)
    tauf = planner.inverse_dynamics_trajectory(trf.position, trf.velocity, trf.acceleration)
    peak = float(jnp.max(jnp.abs(tauf)))
    # Per-joint check against each joint's OWN actuator limit. The
    # planner clips output torques to the limits (reference semantics,
    # path_planning.py:1238-1263), so saturation = any sample AT a limit.
    within = bool(jnp.all(jnp.abs(tauf) < model.torque_limit * (1 - 1e-6)))
    print(f"{Tf:>8.2f} {peak:>16.1f} {str(within):>14}")

# -- Plot artifact -----------------------------------------------------------
try:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "out")
    os.makedirs(OUT_DIR, exist_ok=True)
    tr3 = planner.joint_trajectory(q0, q1, Tf=2.0, N=400, method=3)
    tr5 = planner.joint_trajectory(q0, q1, Tf=2.0, N=400, method=5)
    ts = np.linspace(0, 2.0, 400)
    fig, axes = plt.subplots(1, 3, figsize=(13, 3.6))
    for ax, attr, lbl in ((axes[0], "position", "q (rad)"),
                          (axes[1], "velocity", "dq (rad/s)"),
                          (axes[2], "acceleration", "ddq (rad/s²)")):
        ax.plot(ts, np.asarray(getattr(tr3, attr))[:, -1], "--", label="cubic")
        ax.plot(ts, np.asarray(getattr(tr5, attr))[:, -1], "-", label="quintic")
        ax.set_xlabel("t (s)"); ax.set_ylabel(lbl); ax.grid(alpha=0.3)
    axes[0].set_title("wrist joint: cubic vs quintic time scaling")
    axes[0].legend()
    out_png = os.path.join(OUT_DIR, "trajectory_planning.png")
    fig.savefig(out_png, dpi=120, bbox_inches="tight")
    print(f"\nplot saved: {out_png}")
except ImportError:
    print("\n(matplotlib unavailable — plot skipped)")
