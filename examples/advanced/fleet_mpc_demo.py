"""Advanced: heterogeneous fleet MPC sharded over a device mesh.

No reference counterpart (the reference is single-GPU, single-robot at a
time). A UR5, a Panda, and a planar arm are stacked into one padded
batched model; 8 scenarios per robot solve iLQR concurrently with the
scenario axis sharded across all available devices, and the fleet cost
reduces with an explicit psum collective.

On a CPU-only host this runs on a virtual 8-device mesh
(``--virtual 8``); on a TPU slice the same code shards over real chips.
"""

import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
import argparse

sys.argv_extra = None
p = argparse.ArgumentParser(description=__doc__)
p.add_argument("--virtual", type=int, default=0, help="force N virtual CPU devices")
args, _ = p.parse_known_args()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import jax

if args.virtual:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.virtual)

import jax.numpy as jnp

from manipulapy_tpu.models import catalog
from manipulapy_tpu.mpc import ILQRParams
from manipulapy_tpu.parallel import fleet_mpc_round, make_mesh, stack_models

devices = jax.devices()
print(f"devices: {len(devices)} x {devices[0].platform}")

fleet = stack_models([
    catalog.ur5(dtype=jnp.float32),
    catalog.panda(dtype=jnp.float32),
    catalog.two_link_planar(dtype=jnp.float32),
])
R, n = fleet.num_robots, fleet.num_joints
print(f"fleet: {R} robots padded to {n} DoF "
      f"(real joints per robot: {[int(x) for x in jnp.sum(fleet.mask, axis=1)]})")

mesh = make_mesh()
S = max(8, mesh.devices.size)  # scenarios per robot, divisible by mesh
H = 10
params = ILQRParams(horizon=H, dt=0.02, iterations=4, line_search_steps=4)

key = jax.random.PRNGKey(0)
q_goals = jax.random.uniform(key, (R, S, n), minval=-0.4, maxval=0.4) * fleet.mask[:, None, :]
x0 = jnp.zeros((R, S, 2 * n))
us0 = jnp.zeros((R, S, H, n))

print(f"solving {R * S} MPC problems (H={H}) over a {mesh.devices.size}-device mesh...")
us, costs, fleet_cost = fleet_mpc_round(fleet, mesh, x0, us0, q_goals, params)
print(f"fleet mean cost (psum-reduced over the mesh): {float(fleet_cost):.4f}")
for r_idx, name in enumerate(["ur5", "panda", "planar2"]):
    print(f"  {name:>8}: per-scenario costs "
          f"min {float(costs[r_idx].min()):.3f} / max {float(costs[r_idx].max()):.3f}")
print(f"controls sharded as: {us.sharding}")
