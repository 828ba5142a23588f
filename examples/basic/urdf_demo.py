"""Basic URDF: bundled robot catalog → URDF parse → RobotModel → FK/IK.

Twin of the reference's ``urdf_processing_basic_demo.py``: loads a
bundled robot URDF through the native parser, extracts the screw-theory
model, and round-trips a pose through FK + IK.
"""

import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from _bootstrap import parse_args

args = parse_args(__doc__)

import jax.numpy as jnp
import numpy as np

from manipulapy_tpu import ik as ik_mod
from manipulapy_tpu.kinematics import forward_kinematics
from manipulapy_tpu.models import data as robot_data
from manipulapy_tpu.urdf import URDF

print("bundled robots:", ", ".join(robot_data.list_robots()[:10]), "...")
print("6-DoF robots:", ", ".join(robot_data.get_robots_by_dof(6)[:8]), "...")

urdf_path = robot_data.get_robot_urdf(args.robot)
print(f"\nURDF for {args.robot}: {urdf_path}")

robot = URDF.load(urdf_path)
print(f"parsed: {len(robot.links)} links, {len(robot.joints)} joints, "
      f"actuated: {len(robot.actuated_joints)}")

model = robot.to_robot_model()
print(f"RobotModel: {model.num_joints} DoF, home EE at "
      f"{np.round(np.asarray(model.home[:3, 3]), 4)}")

q = jnp.asarray(np.linspace(0.2, 0.7, model.num_joints))
T = forward_kinematics(model, q)
res = ik_mod.solve_ik(model, T, q + 0.25, max_iterations=200)
print(f"FK->IK roundtrip: success={bool(res.success)}, "
      f"pos err {float(res.trans_err):.2e} m, rot err {float(res.rot_err):.2e} rad")
