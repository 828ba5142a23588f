"""Basic dynamics: mass matrix, gravity, RNEA, forward-dynamics roundtrip.

The reference's ``dynamics_basic_demo.py`` twin — but this framework's
dynamics are exact on the accelerator (the reference's GPU kernels were
simplified per-joint models; its exact path was CPU-only).
"""

import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from _bootstrap import parse_args

args = parse_args(__doc__)

import jax
import jax.numpy as jnp
import numpy as np

from manipulapy_tpu import dynamics as dyn
from manipulapy_tpu.models import catalog

model = catalog.get_robot(args.robot)
n = model.num_joints
q = jnp.asarray(np.linspace(-0.4, 0.4, n))
dq = jnp.full(n, 0.3)
ddq = jnp.full(n, 0.5)

M = dyn.mass_matrix(model, q)
print(f"mass matrix ({n}x{n}): symmetric to {float(jnp.max(jnp.abs(M - M.T))):.2e}, "
      f"eig_min = {float(jnp.linalg.eigvalsh(M)[0]):.4f}")

g_tau = dyn.gravity_forces(model, q)
print("gravity torques:", np.round(np.asarray(g_tau), 3))

c = dyn.coriolis_forces(model, q, dq)
print("Coriolis torques:", np.round(np.asarray(c), 4))

tau = dyn.rnea(model, q, dq, ddq)
tau_lagr = dyn.inverse_dynamics(model, q, dq, ddq)
print(f"RNEA vs Lagrangian agreement: {float(jnp.max(jnp.abs(tau - tau_lagr))):.2e}")

ddq_back = dyn.forward_dynamics(model, q, dq, tau)
print(f"forward(inverse(ddq)) roundtrip error: {float(jnp.max(jnp.abs(ddq_back - ddq))):.2e}")

# Batched: 4096 exact forward-dynamics evaluations in one launch.
B = 4096
key = jax.random.PRNGKey(0)
qs = jax.random.uniform(key, (B, n), minval=-1, maxval=1)
taus = jax.random.uniform(key, (B, n), minval=-20, maxval=20)
fd = jax.jit(jax.vmap(lambda q, t: dyn.forward_dynamics_fast(model, q, jnp.zeros(n), t)))
ddqs = fd(qs, taus)
print(f"\nbatched exact forward dynamics over {B} configs: {ddqs.shape}, "
      f"all finite: {bool(jnp.all(jnp.isfinite(ddqs)))}")
