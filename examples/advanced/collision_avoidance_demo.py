"""Advanced: potential-field collision avoidance along a trajectory.

Twin of the reference's ``collision_avoidance_advanced_demo.py``: a
straight joint-space path sweeps the arm near obstacles; the potential-
field post-pass (gradient descent on the fused obstacle potential,
reference ``path_planning.py:740-803`` + ``cuda_kernels.py:1387-1471``)
repairs the colliding waypoints — all waypoints in parallel under jit,
not the reference's per-waypoint Python loop. Three phases:

1. **Single obstacle** — an obstacle placed exactly on the nominal
   mid-path EE position; clearance before/after, deviation, endpoints.
2. **Margin sweep** — the clearance-vs-deviation tradeoff as the
   requested margin grows (the tuning knob a deployment actually turns).
3. **Obstacle field** — three obstacles bracketing the path at once.

Saves an EE-path plot to ``examples/out/collision_avoidance.png``.
Run: ``python examples/advanced/collision_avoidance_demo.py [--quick] [--cpu]``.
"""

import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from _bootstrap import parse_args

args = parse_args(__doc__)
QUICK = "--quick" in sys.argv

import jax
import jax.numpy as jnp
import numpy as np

from manipulapy_tpu.kinematics import forward_kinematics
from manipulapy_tpu.models import catalog
from manipulapy_tpu.planner import create_planner
from manipulapy_tpu.potential_field import obstacle_clearance

model = catalog.get_robot(args.robot)
n = model.num_joints
N = 60 if QUICK else 120
STEPS = 120 if QUICK else 300
OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "out")
os.makedirs(OUT_DIR, exist_ok=True)

q0 = jnp.zeros(n)
q1 = jnp.asarray(np.linspace(0.6, 1.2, n))


def ee_path(positions):
    return np.asarray(
        jax.jit(jax.vmap(lambda q: forward_kinematics(model, q)[:3, 3]))(positions)
    )


def min_clearance(planner, positions, stride=5):
    vals = jax.vmap(
        lambda q: jnp.min(
            obstacle_clearance(model, q, planner.spheres, planner.obstacle_points)
        )
    )(positions[::stride])
    return float(jnp.min(vals))


# -- Phase 1: single obstacle on the nominal path ----------------------------
print("=" * 72)
print("Phase 1: obstacle directly on the nominal EE path")
print("=" * 72)
planner_plain = create_planner(model)
tr = planner_plain.joint_trajectory(q0, q1, Tf=2.0, N=N, method=5)
mid_q = tr.position[N // 2]
obstacle = forward_kinematics(model, mid_q)[:3, 3]
print(f"obstacle placed at nominal mid-path EE position "
      f"{np.round(np.asarray(obstacle), 3)} (radius 0.10 m)")

planner = create_planner(
    model, obstacle_points=np.asarray(obstacle)[None, :], sphere_radius=0.10
)
before = min_clearance(planner, tr.position)
print(f"min clearance BEFORE avoidance: {before:+.3f} m  (negative = colliding)")

fixed = planner.joint_trajectory(
    q0, q1, Tf=2.0, N=N, method=5, avoid_collisions=True,
    avoidance_steps=STEPS, clearance_margin=0.03,
)
after = min_clearance(planner, fixed.position)
dev = float(jnp.max(jnp.abs(fixed.position - tr.position)))
print(f"min clearance AFTER  avoidance: {after:+.3f} m")
print(f"max joint-space deviation introduced: {dev:.3f} rad")
print(f"endpoints pinned: start "
      f"{bool(jnp.allclose(fixed.position[0], tr.position[0], atol=1e-5))}, "
      f"goal {bool(jnp.allclose(fixed.position[-1], tr.position[-1], atol=1e-5))}")

# -- Phase 2: margin sweep ---------------------------------------------------
print()
print("=" * 72)
print("Phase 2: clearance margin sweep (safety vs path deviation)")
print("=" * 72)
print(f"{'margin':>8} {'min clearance':>14} {'max deviation':>14}")
margins = [0.01, 0.05] if QUICK else [0.0, 0.02, 0.05, 0.08]
for margin in margins:
    out = planner.joint_trajectory(
        q0, q1, Tf=2.0, N=N, method=5, avoid_collisions=True,
        avoidance_steps=STEPS, clearance_margin=margin,
    )
    c = min_clearance(planner, out.position)
    d = float(jnp.max(jnp.abs(out.position - tr.position)))
    print(f"{margin:>8.2f} {c:>+13.3f} m {d:>12.3f} rad")
print("larger margins buy clearance with joint-space deviation — the same")
print("knob the reference exposes as the potential-field influence distance.")

# -- Phase 3: obstacle field -------------------------------------------------
print()
print("=" * 72)
print("Phase 3: three obstacles bracketing the path")
print("=" * 72)
path = ee_path(tr.position)
obs3 = np.stack([
    path[N // 4],
    path[N // 2] + np.asarray([0.0, 0.04, 0.0]),
    path[3 * N // 4] - np.asarray([0.0, 0.0, 0.05]),
])
planner3 = create_planner(model, obstacle_points=obs3, sphere_radius=0.08)
before3 = min_clearance(planner3, tr.position)
fixed3 = planner3.joint_trajectory(
    q0, q1, Tf=2.0, N=N, method=5, avoid_collisions=True,
    avoidance_steps=STEPS, clearance_margin=0.03,
)
after3 = min_clearance(planner3, fixed3.position)
print(f"min clearance: {before3:+.3f} m -> {after3:+.3f} m "
      f"across {len(obs3)} obstacles (all waypoints repaired in ONE jitted "
      f"descent, vs the reference's <=100-step loop per waypoint)")

# -- Plot artifact -----------------------------------------------------------
try:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(11, 4.5))
    p_before, p_after = path, ee_path(fixed.position)
    for ax, (i, j), lbl in ((axes[0], (0, 2), "x-z"), (axes[1], (1, 2), "y-z")):
        ax.plot(p_before[:, i], p_before[:, j], "-", color="gray", label="nominal")
        ax.plot(p_after[:, i], p_after[:, j], "-", color="tab:blue", label="avoided")
        circ = plt.Circle(
            (float(obstacle[i]), float(obstacle[j])), 0.10, color="tab:red", alpha=0.3
        )
        ax.add_patch(circ)
        ax.set_xlabel(lbl[0]); ax.set_ylabel(lbl[-1])
        ax.set_title(f"EE path, {lbl} plane")
        ax.set_aspect("equal")
        ax.legend()
    out_png = os.path.join(OUT_DIR, "collision_avoidance.png")
    fig.savefig(out_png, dpi=120, bbox_inches="tight")
    print(f"\nplot saved: {out_png}")
except ImportError:
    print("\n(matplotlib unavailable — plot skipped)")
