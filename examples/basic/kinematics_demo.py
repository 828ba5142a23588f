"""Basic kinematics: FK, Jacobian, end-effector velocity, batched FK.

TPU-native twin of the reference's ``kinematics_basic_demo.py``: the same
queries, but every function is jittable and the batch case is one vmapped
launch instead of a Python loop.
"""

import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from _bootstrap import parse_args

args = parse_args(__doc__)

import jax
import jax.numpy as jnp
import numpy as np

from manipulapy_tpu.kinematics import (
    end_effector_velocity,
    forward_kinematics,
    jacobian,
)
from manipulapy_tpu.models import catalog

model = catalog.get_robot(args.robot)
n = model.num_joints
print(f"robot: {args.robot} ({n} DoF), backend: {jax.default_backend()}")

q = jnp.asarray(np.linspace(0.1, 0.6, n))
T = forward_kinematics(model, q)
print("\nFK pose at q =", np.round(np.asarray(q), 3))
print(np.round(np.asarray(T), 4))

J = jacobian(model, q)
print(f"\nspace Jacobian (6x{n}), sigma_min = {float(jnp.linalg.svd(J, compute_uv=False)[-1]):.4f}")

dq = jnp.full(n, 0.2)
V = end_effector_velocity(model, q, dq)
print("EE twist [w; v] for dq=0.2:", np.round(np.asarray(V), 4))

# Batched FK: 10,000 configurations in one launch.
B = 10_000
qs = jax.random.uniform(jax.random.PRNGKey(0), (B, n), minval=-1.0, maxval=1.0)
fk_batch = jax.jit(jax.vmap(lambda q: forward_kinematics(model, q)))
Ts = fk_batch(qs)
pos = Ts[:, :3, 3]
print(f"\nbatched FK over {B} configs: positions shape {pos.shape}")
print(f"workspace extent: min {np.round(np.asarray(pos.min(axis=0)), 3)}, "
      f"max {np.round(np.asarray(pos.max(axis=0)), 3)}")
