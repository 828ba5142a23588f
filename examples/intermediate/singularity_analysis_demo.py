"""Intermediate: singularity detection, ellipsoids, workspace, path audit.

Twin of the reference's ``singularity_analysis_intermediate_demo.py``.
The Monte-Carlo workspace — a CUDA RNG kernel + host FK loop in the
reference (``singularity.py:135-214``, 1.85 s for 10k samples by its own
measurement) — is here one jitted program: jax PRNG sampling + vmapped
FK. Four phases:

1. **Detection** — sigma_min / condition number at regular and singular
   poses; manipulability ellipsoids.
2. **Singular families** — batched sweeps locate the wrist and elbow
   families exactly where theory puts them.
3. **Workspace quality map** — 200k samples + manipulability annotation,
   one dispatch each; plotted to ``examples/out/singularity.png``.
4. **Trajectory audit** — scan a planned path for singular neighborhoods
   before execution.

Run: ``python examples/intermediate/singularity_analysis_demo.py [--robot ur5] [--cpu] [--quick]``.
"""

import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from _bootstrap import parse_args

args = parse_args(__doc__)
QUICK = "--quick" in sys.argv

import jax
import jax.numpy as jnp
import numpy as np

from manipulapy_tpu import singularity as sg
from manipulapy_tpu.models import catalog
from manipulapy_tpu.trajectory import joint_trajectory

model = catalog.get_robot(args.robot)
n = model.num_joints
OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "out")
os.makedirs(OUT_DIR, exist_ok=True)
print(f"robot: {args.robot} ({n} DoF), backend: {jax.default_backend()}")

# -- Phase 1: detection -------------------------------------------------------
print("\n" + "=" * 72)
print("Phase 1: how singular is a pose?")
print("=" * 72)
q_reg = jnp.asarray(np.linspace(0.3, 0.9, n))
q_sing = jnp.zeros(n)  # stretched-out configurations are singular for most arms

for name, q in [("regular", q_reg), ("home (stretched)", q_sing)]:
    sigma = float(sg.singularity_measure(model, q))
    cond = float(sg.condition_number(model, q))
    near = bool(sg.near_singularity(model, q))
    print(f"{name:>17}: sigma_min {sigma:.5f}, cond {cond:9.1f}, near-singular: {near}")

lin, ang = sg.manipulability_ellipsoid(model, q_reg)
print(f"\nmanipulability ellipsoid at the regular pose:")
print(f"  linear radii  {np.round(np.asarray(lin.radii), 3)} m/s per unit |dq|")
print(f"  angular radii {np.round(np.asarray(ang.radii), 3)} rad/s")
print(f"  anisotropy sigma1/sigma3 = {float(lin.radii[0] / lin.radii[-1]):.2f}, "
      f"Yoshikawa measure {float(sg.manipulability_measure(model, q_reg)):.4f}")

# -- Phase 2: the singular families ------------------------------------------
print("\n" + "=" * 72)
print("Phase 2: locating the classic singular families (batched sweeps)")
print("=" * 72)
sweep = jnp.linspace(-0.5, 0.5, 101)
meas = jax.jit(jax.vmap(lambda qq: sg.singularity_measure(model, qq)))
for fam, joint_idx in [("wrist (theta_5 = 0)", 4), ("elbow (theta_3 = 0)", 2)]:
    if joint_idx >= n:
        continue
    Q = jnp.tile(q_reg, (101, 1)).at[:, joint_idx].set(sweep)
    sig = meas(Q)
    k = int(jnp.argmin(sig))
    print(f"  {fam:<22} sigma_min minimized at {float(sweep[k]):+.3f} "
          f"(theory 0.000), value {float(sig[k]):.2e}")

# -- Phase 3: workspace quality map ------------------------------------------
print("\n" + "=" * 72)
print("Phase 3: Monte-Carlo workspace + quality annotation")
print("=" * 72)
NS = 20_000 if QUICK else 200_000
pts = sg.monte_carlo_workspace(model, jax.random.PRNGKey(0), num_samples=NS)
r = jnp.linalg.norm(pts, axis=1)
print(f"{NS:,} samples in one dispatch: radial extent "
      f"[{float(r.min()):.3f}, {float(r.max()):.3f}] m "
      f"(reference: 1.85 s for 10k samples, CUDA RNG + host FK loop)")

NQ = 5_000 if QUICK else 20_000
lo = jnp.where(jnp.isfinite(model.joint_lower), model.joint_lower, -jnp.pi)
hi = jnp.where(jnp.isfinite(model.joint_upper), model.joint_upper, jnp.pi)
Qs = jax.random.uniform(jax.random.PRNGKey(1), (NQ, n), minval=lo, maxval=hi)
from manipulapy_tpu.kinematics import forward_kinematics

quality_pipe = jax.jit(jax.vmap(lambda qq: (
    forward_kinematics(model, qq)[:3, 3],
    sg.manipulability_measure(model, qq),
)))
qpts, w = quality_pipe(Qs)
frac_near = float(jnp.mean((jax.jit(jax.vmap(
    lambda qq: sg.singularity_measure(model, qq)))(Qs) < 1e-2).astype(jnp.float32)))
print(f"quality over {NQ:,} configs: manipulability median {float(jnp.median(w)):.4f}, "
      f"5th pct {float(jnp.percentile(w, 5)):.4f}; "
      f"{frac_near:.1%} of joint space is near-singular")

# -- Phase 4: trajectory audit ------------------------------------------------
print("\n" + "=" * 72)
print("Phase 4: audit a planned path before executing it")
print("=" * 72)
traj = joint_trajectory(model, q_reg, q_sing, Tf=2.0, N=200, method=5)
sig_path = meas(traj.position)
k_bad = int(jnp.argmin(sig_path))
frac_bad = float(jnp.mean((sig_path < 1e-2).astype(jnp.float32)))
print(f"quintic path {np.round(np.asarray(q_reg), 2)} -> stretched pose, 200 waypoints:")
print(f"  sigma_min: start {float(sig_path[0]):.4f} -> "
      f"worst {float(sig_path[k_bad]):.2e} at waypoint {k_bad}")
print(f"  {frac_bad:.0%} of waypoints are near-singular -> replan, or switch IK to "
      f"high-damping DLS through that stretch")

try:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(11, 4.5))
    # x-z workspace slice colored by manipulability (sequential, one hue)
    qp = np.asarray(qpts)
    sc = axes[0].scatter(qp[:, 0], qp[:, 2], c=np.asarray(w), s=2,
                         cmap="Blues", rasterized=True)
    fig.colorbar(sc, ax=axes[0], label="manipulability")
    axes[0].set_xlabel("x [m]")
    axes[0].set_ylabel("z [m]")
    axes[0].set_title(f"{args.robot} workspace quality ({NQ:,} samples)")
    axes[0].set_aspect("equal")
    # path audit
    axes[1].semilogy(np.asarray(sig_path), lw=2, color="#1f77b4")
    axes[1].axhline(1e-2, color="#d62728", lw=1, ls="--", label="near-singular band")
    axes[1].set_xlabel("waypoint")
    axes[1].set_ylabel("sigma_min(J)")
    axes[1].set_title("trajectory singularity audit")
    axes[1].legend(frameon=False)
    axes[1].grid(alpha=0.2)
    out = os.path.join(OUT_DIR, "singularity.png")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"saved plots -> {out}")
except ImportError:
    print("(matplotlib unavailable — plot skipped)")
