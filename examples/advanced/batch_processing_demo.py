"""Advanced: thousands of exact-dynamics rollouts in a single launch.

Twin of the reference's ``batch_processing_advanced_demo.py`` — but where
the reference batches *simplified* per-joint GPU dynamics
(``cuda_kernels.py:1230-1331``), every rollout here integrates the fully
coupled mass matrix + Coriolis + gravity. Three phases:

1. **One launch, 4096 rollouts** — the fused SoA engine
   (``ops/fd_step.py``); throughput vs the reference's exact CPU path.
2. **Monte-Carlo reachability** — where do 4096 random torque policies
   take the arm? Final-state statistics + limit-saturation counts, the
   kind of question batched exact dynamics makes cheap.
3. **Batch IK on the final poses** — close the loop: solve IK back to a
   subset of the reached poses, all targets in one vmapped call.

Saves a reachability scatter to ``examples/out/batch_processing.png``.
Run: ``python examples/advanced/batch_processing_demo.py [--quick] [--cpu]``.
"""

import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from _bootstrap import parse_args

args = parse_args(__doc__)
QUICK = "--quick" in sys.argv

import time

import jax
import jax.numpy as jnp
import numpy as np

from manipulapy_tpu.kinematics import forward_kinematics
from manipulapy_tpu.models import catalog
from manipulapy_tpu.ops.fd_step import build_rollout

model = catalog.get_robot(args.robot)
n = model.num_joints
B, N = (256, 20) if QUICK else (4096, 100)
OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "out")
os.makedirs(OUT_DIR, exist_ok=True)

key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
q0 = jax.random.uniform(k1, (B, n), minval=-0.5, maxval=0.5)
dq0 = jnp.zeros((B, n))
taus = jax.random.uniform(k2, (B, N, n), minval=-15, maxval=15)

# -- Phase 1: one launch -----------------------------------------------------
print("=" * 72)
print(f"Phase 1: {B} exact-dynamics rollouts x {N} steps ({args.robot})")
print("=" * 72)
rollout = build_rollout(model, dt=0.01)
t0 = time.perf_counter()
qs, dqs, ddqs = jax.block_until_ready(rollout(q0, dq0, taus))
print(f"compile + first run: {time.perf_counter() - t0:.2f} s")
iters = 2 if QUICK else 5
t0 = time.perf_counter()
for _ in range(iters):
    out = rollout(q0, dq0, taus)
jax.block_until_ready(out)
dt_s = (time.perf_counter() - t0) / iters
print(f"steady state: {dt_s*1e3:.1f} ms/launch -> {B*N/dt_s:,.0f} exact-dynamics steps/s")
print(f"reference exact path: ~855 steps/s single-threaded CPU (1.17 ms/call, "
      f"README.md:442) -> {B*N/dt_s/855:,.0f}x")

# -- Phase 2: Monte-Carlo reachability ---------------------------------------
print()
print("=" * 72)
print("Phase 2: where do random torque policies take the arm?")
print("=" * 72)
qf, dqf = qs[:, -1], dqs[:, -1]
ee = jax.jit(jax.vmap(lambda q: forward_kinematics(model, q)[:3, 3]))(qf)
ee_np = np.asarray(ee)
radius = np.linalg.norm(ee_np, axis=1)
at_lower = jnp.sum(jnp.any(jnp.isclose(qf, model.joint_lower, atol=1e-5), axis=1))
at_upper = jnp.sum(jnp.any(jnp.isclose(qf, model.joint_upper, atol=1e-5), axis=1))
print(f"final EE radius: mean {radius.mean():.3f} m, p5 {np.percentile(radius, 5):.3f}, "
      f"p95 {np.percentile(radius, 95):.3f} (all within reach)")
print(f"rollouts ending on a joint limit: lower {int(at_lower)}, upper {int(at_upper)} "
      f"of {B} (clamp semantics per the reference, path_planning.py:1492-1503)")
print(f"within limits everywhere: "
      f"{bool(jnp.all((qf >= model.joint_lower - 1e-6) & (qf <= model.joint_upper + 1e-6)))}")
print(f"velocity-limit respected: "
      f"{bool(jnp.all(jnp.abs(dqf) <= jnp.where(jnp.isfinite(model.velocity_limit), model.velocity_limit, jnp.inf) + 1e-6))}")

# -- Phase 3: batch IK back to reached poses ---------------------------------
print()
print("=" * 72)
print("Phase 3: batch IK back to a subset of reached poses")
print("=" * 72)
from manipulapy_tpu import ik as ik_mod

M = 32 if QUICK else 256
targets = jax.jit(jax.vmap(lambda q: forward_kinematics(model, q)))(qf[:M])
t0 = time.perf_counter()
res = jax.block_until_ready(
    ik_mod.solve_ik_batch(model, targets, qf[:M] + 0.2, max_iterations=200)
)
ik_s = time.perf_counter() - t0
succ = int(jnp.sum(res.success))
print(f"{M} IK targets in one vmapped call: {succ}/{M} converged, "
      f"{ik_s*1e3:.0f} ms total ({ik_s/M*1e3:.2f} ms/target incl. compile)")

# -- Plot artifact -----------------------------------------------------------
try:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(11, 4.5))
    sc = axes[0].scatter(ee_np[:, 0], ee_np[:, 1], c=ee_np[:, 2], s=4, cmap="viridis")
    fig.colorbar(sc, ax=axes[0], label="z (m)")
    axes[0].set_xlabel("x (m)"); axes[0].set_ylabel("y (m)")
    axes[0].set_title(f"Final EE positions of {B} random-torque rollouts")
    axes[0].set_aspect("equal")
    axes[1].hist(radius, bins=30, color="tab:blue", alpha=0.8)
    axes[1].set_xlabel("final EE radius (m)")
    axes[1].set_ylabel("rollouts")
    axes[1].set_title("Reach distribution")
    out_png = os.path.join(OUT_DIR, "batch_processing.png")
    fig.savefig(out_png, dpi=120, bbox_inches="tight")
    print(f"\nplot saved: {out_png}")
except ImportError:
    print("\n(matplotlib unavailable — plot skipped)")
