"""Intermediate: singularity detection, manipulability, Monte-Carlo workspace.

Twin of the reference's ``singularity_analysis_intermediate_demo.py``.
The Monte-Carlo workspace — a CUDA RNG kernel + host FK loop in the
reference (``singularity.py:135-214``) — is here one jitted program:
jax PRNG sampling + vmapped FK.
"""

import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from _bootstrap import parse_args

args = parse_args(__doc__)

import jax
import jax.numpy as jnp
import numpy as np

from manipulapy_tpu import singularity as sg
from manipulapy_tpu.models import catalog

model = catalog.get_robot(args.robot)
n = model.num_joints

q_reg = jnp.asarray(np.linspace(0.3, 0.9, n))
q_sing = jnp.zeros(n)  # stretched-out configurations are singular for most arms

for name, q in [("regular", q_reg), ("home (stretched)", q_sing)]:
    sigma = float(sg.singularity_measure(model, q))
    cond = float(sg.condition_number(model, q))
    near = bool(sg.near_singularity(model, q))
    print(f"{name:>17}: sigma_min {sigma:.5f}, cond {cond:9.1f}, near-singular: {near}")

lin, ang = sg.manipulability_ellipsoid(model, q_reg)
print(f"\nmanipulability at regular q: linear radii {np.round(np.asarray(lin.radii), 3)}, "
      f"volume measure {float(sg.manipulability_measure(model, q_reg)):.4f}")

# Monte-Carlo workspace: 200k sampled configurations, one launch.
pts = sg.monte_carlo_workspace(model, jax.random.PRNGKey(0), num_samples=200_000)
r = jnp.linalg.norm(pts, axis=1)
print(f"\nworkspace cloud: {pts.shape[0]} points, radial extent "
      f"[{float(r.min()):.3f}, {float(r.max()):.3f}] m")

# Batch singularity scan along a trajectory (vmapped SVD).
qs = jnp.linspace(q_sing, q_reg, 100)
sigmas = jax.jit(jax.vmap(lambda q: sg.singularity_measure(model, q)))(qs)
first_safe = int(jnp.argmax(sigmas > 1e-2))
print(f"trajectory scan: leaves the singular neighborhood at step {first_safe}/100")
