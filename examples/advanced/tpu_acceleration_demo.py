"""Advanced: jit/vmap scaling sweep — the TPU twin of the reference's
``gpu_acceleration_advanced_demo.py``.

The reference demonstrates CUDA speedup vs problem size (and a CPU
threshold below which the GPU loses). The XLA equivalent: compile once,
then sweep the batch axis and watch throughput scale until the chip
saturates — no dispatch threshold machinery needed.
"""

import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from _bootstrap import parse_args

args = parse_args(__doc__)

import time

import jax
import jax.numpy as jnp

from manipulapy_tpu import dynamics as dyn
from manipulapy_tpu.models import catalog

model = catalog.get_robot(args.robot)
n = model.num_joints
print(f"backend: {jax.default_backend()}\n")
print(f"{'batch':>8} {'time/call':>12} {'evals/s':>14} {'scaling':>8}")

base_rate = None
fd = jax.jit(jax.vmap(lambda q, dq, t: dyn.forward_dynamics_fast(model, q, dq, t)))
for B in [64, 512, 4096, 32_768]:
    key = jax.random.PRNGKey(B)
    q = jax.random.uniform(key, (B, n), minval=-1, maxval=1)
    dq = jnp.zeros((B, n))
    tau = jax.random.uniform(key, (B, n), minval=-10, maxval=10)
    jax.block_until_ready(fd(q, dq, tau))  # compile this shape
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fd(q, dq, tau)
    jax.block_until_ready(out)
    per_call = (time.perf_counter() - t0) / iters
    rate = B / per_call
    if base_rate is None:
        base_rate = rate
    print(f"{B:>8} {per_call*1e3:>10.2f} ms {rate:>14,.0f} {rate/base_rate:>7.1f}x")

print("\nthroughput grows ~linearly with batch until the chip saturates —")
print("the XLA replacement for the reference's CPU/GPU dispatch threshold")
print("(path_planning.py:457-492): there is no crossover to manage.")
