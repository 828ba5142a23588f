"""Advanced: potential-field collision avoidance along a trajectory.

Twin of the reference's ``collision_avoidance_advanced_demo.py``: a
straight joint-space path sweeps the arm near a point obstacle; the
potential-field post-pass (gradient descent on the fused obstacle
potential) repairs the colliding waypoints — all of it jitted, not a
Python per-waypoint loop.
"""

import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from _bootstrap import parse_args

args = parse_args(__doc__)

import jax.numpy as jnp
import numpy as np

from manipulapy_tpu.kinematics import forward_kinematics
from manipulapy_tpu.models import catalog
from manipulapy_tpu.planner import create_planner
from manipulapy_tpu.potential_field import obstacle_clearance

model = catalog.get_robot(args.robot)
n = model.num_joints

q0 = jnp.zeros(n)
q1 = jnp.asarray(np.linspace(0.6, 1.2, n))

# Put a point obstacle right on the nominal mid-path EE position.
planner_plain = create_planner(model)
tr = planner_plain.joint_trajectory(q0, q1, Tf=2.0, N=120, method=5)
mid_q = tr.position[60]
obstacle = forward_kinematics(model, mid_q)[:3, 3]
print(f"obstacle placed at nominal mid-path EE position {np.round(np.asarray(obstacle), 3)}")

planner = create_planner(model, obstacle_points=np.asarray(obstacle)[None, :], sphere_radius=0.10)

def min_clearance(positions):
    vals = [
        float(jnp.min(obstacle_clearance(model, q, planner.spheres, planner.obstacle_points)))
        for q in positions[::10]
    ]
    return min(vals)

print(f"min clearance BEFORE avoidance: {min_clearance(tr.position):+.3f} m")

fixed = planner.joint_trajectory(
    q0, q1, Tf=2.0, N=120, method=5, avoid_collisions=True,
    avoidance_steps=300, clearance_margin=0.03,
)
print(f"min clearance AFTER  avoidance: {min_clearance(fixed.position):+.3f} m")
dev = float(jnp.max(jnp.abs(fixed.position - tr.position)))
print(f"max joint-space deviation introduced: {dev:.3f} rad")
print(f"endpoints pinned: start {bool(jnp.allclose(fixed.position[0], tr.position[0], atol=1e-5))}, "
      f"goal {bool(jnp.allclose(fixed.position[-1], tr.position[-1], atol=1e-5))}")
