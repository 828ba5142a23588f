"""Basic dynamics: mass matrix, RNEA, energy physics, rollout engines.

The reference's ``dynamics_basic_demo.py`` twin — but this framework's
dynamics are exact on the accelerator (the reference's GPU kernels were
simplified per-joint models, ``cuda_kernels.py:1163-1166``; its exact
path was CPU-only). Four phases:

1. **The manipulator equation** — M, gravity, analytic Coriolis, and the
   RNEA/Lagrangian cross-check.
2. **Round trips + passivity** — forward(inverse(.)) identity and the
   energy-balance check dq . c == 0.5 dq . dM/dt . dq.
3. **A real rollout** — torque-free pendulum drop under gravity; total
   energy drift printed and plotted (``examples/out/dynamics.png``).
4. **Batch throughput sweep** — exact forward dynamics over growing
   batch sizes, one launch each.

Run: ``python examples/basic/dynamics_demo.py [--robot ur5] [--cpu] [--quick]``.
"""

import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from _bootstrap import parse_args

args = parse_args(__doc__)
QUICK = "--quick" in sys.argv

import time

import jax
import jax.numpy as jnp
import numpy as np

from manipulapy_tpu import dynamics as dyn
from manipulapy_tpu.models import catalog
from manipulapy_tpu.trajectory import forward_dynamics_trajectory

model = catalog.get_robot(args.robot)
n = model.num_joints
OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "out")
os.makedirs(OUT_DIR, exist_ok=True)
print(f"robot: {args.robot} ({n} DoF), backend: {jax.default_backend()}")

# -- Phase 1: the manipulator equation ---------------------------------------
print("\n" + "=" * 72)
print("Phase 1: tau = M(q) ddq + c(q, dq) + g(q)")
print("=" * 72)
q = jnp.asarray(np.linspace(-0.4, 0.4, n))
dq = jnp.full(n, 0.3)
ddq = jnp.full(n, 0.5)

M = dyn.mass_matrix(model, q)
eigs = jnp.linalg.eigvalsh(M)
print(f"mass matrix ({n}x{n}): symmetric to {float(jnp.max(jnp.abs(M - M.T))):.2e}, "
      f"eigenvalues [{float(eigs[0]):.4f} .. {float(eigs[-1]):.3f}] (SPD)")
print("gravity torques :", np.round(np.asarray(dyn.gravity_forces(model, q)), 3))
print("coriolis torques:", np.round(np.asarray(dyn.coriolis_forces(model, q, dq)), 4))

tau = dyn.rnea(model, q, dq, ddq)
tau_lagr = dyn.inverse_dynamics(model, q, dq, ddq)
print(f"O(n) RNEA vs composed Lagrangian agreement: "
      f"{float(jnp.max(jnp.abs(tau - tau_lagr))):.2e}")

# -- Phase 2: round trips and passivity --------------------------------------
print("\n" + "=" * 72)
print("Phase 2: identities the physics must satisfy")
print("=" * 72)
ddq_back = dyn.forward_dynamics(model, q, dq, tau)
rt_err = float(jnp.max(jnp.abs(ddq_back - ddq)))
print(f"forward(inverse(ddq)) roundtrip error: {rt_err:.2e} "
      f"(f32 model: M^-1 amplifies input rounding by kappa(M) ~ 1e3 — the\n"
      f"  conditioning floor, not solver error; see benchmarks/f32_conditioning_study.py)")

# Passivity: the Coriolis term does no net work beyond dM/dt transport.
dM = jax.jvp(lambda qq: dyn.mass_matrix(model, qq), (q,), (dq,))[1]
lhs = float(dq @ dyn.coriolis_forces(model, q, dq))
rhs = float(0.5 * dq @ dM @ dq)
print(f"energy balance dq.c = {lhs:+.6f} vs 0.5 dq.dM.dq = {rhs:+.6f} "
      f"(diff {abs(lhs - rhs):.2e})")

# -- Phase 3: a real rollout with an energy audit -----------------------------
print("\n" + "=" * 72)
print("Phase 3: torque-free drop — does the integrator conserve energy?")
print("=" * 72)
N, dt_s = (100, 0.002) if QUICK else (400, 0.002)
q0 = jnp.asarray(np.linspace(0.2, 0.6, n))[None]
dq0 = jnp.zeros((1, n))
taus0 = jnp.zeros((1, N, n))
qs, dqs, _ = forward_dynamics_trajectory(model, q0, dq0, taus0, dt=dt_s, intRes=4)
qs, dqs = qs[0], dqs[0]


def energy(qq, dd):
    ke = 0.5 * dd @ dyn.mass_matrix(model, qq) @ dd
    # potential energy from gravity torque line integral is robot-specific;
    # audit instead via the work-energy theorem: dE_kin/dt = dq . (tau - g - c)
    return ke


ke = jax.vmap(energy)(qs, dqs)
g_work = jax.vmap(lambda qq, dd: -dd @ dyn.gravity_forces(model, qq))(qs, dqs)
# cumulative gravity work should equal the kinetic-energy gain
# (trapezoid rule; the audit samples waypoints, so it carries its own
# discretization error on top of the integrator's)
cum_w = jnp.concatenate([
    jnp.zeros(1), jnp.cumsum(0.5 * (g_work[1:] + g_work[:-1])) * dt_s
])
drift = np.asarray(ke - ke[0] - cum_w)
rel = np.abs(drift[-1]) / max(float(ke.max()), 1e-9)
print(f"rolled {N} steps x intRes=4 semi-implicit Euler (dt={dt_s})")
print(f"work-energy mismatch: end {drift[-1]:+.2e} J "
      f"({rel:.1%} of peak kinetic energy {float(ke.max()):.1f} J)")
print("(first-order integrator + waypoint-rate audit: both shrink with dt/intRes)")

try:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    t_axis = np.arange(N) * dt_s
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.plot(t_axis, np.asarray(ke), lw=2, color="#1f77b4", label="kinetic energy")
    ax.plot(t_axis, np.asarray(ke[0] + cum_w), lw=2, ls="--", color="#ff7f0e",
            label="E0 + gravity work")
    ax.set_xlabel("time [s]")
    ax.set_ylabel("energy [J]")
    ax.set_title(f"{args.robot} torque-free drop: work-energy audit")
    ax.legend(frameon=False)
    ax.grid(alpha=0.2)
    out = os.path.join(OUT_DIR, "dynamics.png")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"saved energy plot -> {out}")
except ImportError:
    print("(matplotlib unavailable — plot skipped)")

# -- Phase 4: batch throughput sweep -----------------------------------------
print("\n" + "=" * 72)
print("Phase 4: exact forward dynamics, batched")
print("=" * 72)
fd = jax.jit(jax.vmap(lambda qq, t: dyn.forward_dynamics_fast(model, qq, jnp.zeros(n), t)))
batches = [256, 1024] if QUICK else [256, 1024, 4096, 16384]
print(f"{'batch':>7}  {'wall ms':>9}  {'M evals/s':>10}")
for B in batches:
    key = jax.random.PRNGKey(B)
    qs_b = jax.random.uniform(key, (B, n), minval=-1, maxval=1)
    taus_b = jax.random.uniform(key, (B, n), minval=-20, maxval=20)
    jax.block_until_ready(fd(qs_b, taus_b))  # compile per shape
    t0 = time.perf_counter()
    out_b = jax.block_until_ready(fd(qs_b, taus_b))
    dt_w = time.perf_counter() - t0
    assert bool(jnp.all(jnp.isfinite(out_b)))
    print(f"{B:>7,}  {dt_w * 1e3:>9.2f}  {B / dt_w / 1e6:>10.3f}")
print("(exact coupled dynamics every evaluation — no simplified per-joint model)")
