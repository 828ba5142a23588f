"""Basic control: computed-torque vs PID closed-loop tracking, tuned and stressed.

Twin of the reference's ``control_basic_demo.py`` — the controllers are
pure step functions (state carried explicitly), so every closed-loop
simulation here is ONE ``lax.scan``, and the gain sweep vmaps whole
simulations. Three phases:

1. **Tracking comparison** — computed-torque vs inertia-scaled
   PID+gravity on a quintic reference.
2. **Gain sweep** — closed-loop natural frequency vs tracking error,
   every frequency simulated in parallel lanes.
3. **Disturbance rejection** — a mid-run velocity kick; recovery time
   per controller. Error curves saved to ``examples/out/control_basic.png``.

Run: ``python examples/basic/control_demo.py [--robot ur5] [--cpu] [--quick]``.
"""

import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from _bootstrap import parse_args

args = parse_args(__doc__)
QUICK = "--quick" in sys.argv

import jax
import jax.numpy as jnp
import numpy as np

from manipulapy_tpu import control as ctl
from manipulapy_tpu.dynamics import forward_dynamics_fast, gravity_forces, mass_matrix
from manipulapy_tpu.models import catalog
from manipulapy_tpu.trajectory import joint_trajectory

model = catalog.get_robot(args.robot)
n = model.num_joints
dt, N = 0.005, (150 if QUICK else 400)
OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "out")
os.makedirs(OUT_DIR, exist_ok=True)
print(f"robot: {args.robot} ({n} DoF), backend: {jax.default_backend()}")

ref = joint_trajectory(model, jnp.zeros(n), jnp.full(n, 0.8), Tf=N * dt, N=N, method=5)
g = jnp.asarray([0.0, 0.0, -9.81])

# Inertia-scaled PID gains (uniform closed-loop natural frequency): the
# UR5's wrist joints have ~1000x less effective inertia than the
# shoulder, so uniform gains either crawl at the base or blow up at the
# wrist.
Mdiag = jnp.diag(mass_matrix(model, jnp.zeros(n)))


def pid_gains(wn, zeta=1.0):
    Kp = Mdiag * wn * wn
    return Kp, 0.1 * Kp, 2.0 * zeta * Mdiag * wn


Kp_ct, Ki_ct, Kd_ct = jnp.full(n, 60.0), jnp.full(n, 2.0), jnp.full(n, 12.0)


def simulate(control_step, kick_at=-1, kick=0.0):
    def body(carry, t):
        q, dq, state = carry
        dq = jnp.where(t == kick_at, dq + kick, dq)
        tau, state = control_step(
            q, dq, ref.position[t], ref.velocity[t], ref.acceleration[t], state
        )
        ddq = forward_dynamics_fast(model, q, dq, tau)
        dq = dq + ddq * dt
        q = q + dq * dt
        return (q, dq, state), jnp.max(jnp.abs(q - ref.position[t]))

    init = (jnp.zeros(n), jnp.zeros(n), ctl.ControlState.zero(n, dtype=model.dtype))
    _, errs = jax.lax.scan(body, init, jnp.arange(N))
    return errs


def ct_step(q, dq, qd, dqd, ddqd, state):
    return ctl.computed_torque_control(
        model, qd, dqd, ddqd, q, dq, g, dt, Kp=Kp_ct, Ki=Ki_ct, Kd=Kd_ct, state=state
    )


def make_pid_step(Kp, Ki, Kd):
    def step(q, dq, qd, dqd, ddqd, state):
        tau, state = ctl.pid_control(qd, dqd, q, dq, dt, Kp=Kp, Ki=Ki, Kd=Kd, state=state)
        return tau + gravity_forces(model, q, g), state

    return step


# -- Phase 1: tracking comparison --------------------------------------------
print("\n" + "=" * 72)
print("Phase 1: quintic tracking — computed-torque vs PID+gravity")
print("=" * 72)
Kp12, Ki12, Kd12 = pid_gains(12.0)
curves = {}
for name, step in [("computed-torque", ct_step),
                   ("PID+gravity (wn=12)", make_pid_step(Kp12, Ki12, Kd12))]:
    errs = jax.jit(lambda s=step: simulate(s))()
    curves[name] = np.asarray(errs)
    print(f"{name:>22}: final {float(errs[-1]):.5f} rad, peak {float(jnp.max(errs)):.5f} rad")
print("(computed-torque cancels the exact dynamics -> ~60x tighter tracking)")

# -- Phase 2: gain sweep, all frequencies in parallel -------------------------
print("\n" + "=" * 72)
print("Phase 2: PID natural-frequency sweep (one vmapped batch of simulations)")
print("=" * 72)
wns = jnp.asarray([4.0, 8.0, 12.0, 20.0] if QUICK else [2.0, 4.0, 8.0, 12.0, 16.0, 24.0, 32.0])


def sim_for_wn(wn):
    Kp = Mdiag * wn * wn
    Ki = 0.1 * Kp
    Kd = 2.0 * Mdiag * wn

    def step(q, dq, qd, dqd, ddqd, state):
        tau, state = ctl.pid_control(qd, dqd, q, dq, dt, Kp=Kp, Ki=Ki, Kd=Kd, state=state)
        return tau + gravity_forces(model, q, g), state

    return simulate(step)


err_sweep = jax.jit(jax.vmap(sim_for_wn))(wns)
print(f"  {'wn [rad/s]':>11}  {'peak err':>10}  {'final err':>10}")
for wn, e in zip(wns, err_sweep):
    print(f"  {float(wn):>11.1f}  {float(jnp.max(e)):>10.5f}  {float(e[-1]):>10.5f}")
best = int(jnp.argmin(err_sweep[:, -1]))
print(f"stiffest useful tuning here: wn = {float(wns[best]):.0f} rad/s "
      f"(higher gains fight the dt={dt} discrete-time limit)")

# -- Phase 3: disturbance rejection -------------------------------------------
print("\n" + "=" * 72)
print("Phase 3: velocity kick at t = N/2 — who recovers faster?")
print("=" * 72)
kick_t = N // 2
for name, step in [("computed-torque", ct_step),
                   ("PID+gravity (wn=12)", make_pid_step(Kp12, Ki12, Kd12))]:
    errs = jax.jit(lambda s=step: simulate(s, kick_at=kick_t, kick=0.5))()
    post = np.asarray(errs[kick_t:])
    pre = float(errs[kick_t - 1])
    band = max(1.5 * pre, 0.02)  # recovered = back inside 1.5x pre-kick error
    pk = int(post.argmax())      # measure recovery from the error PEAK
    below = np.nonzero(post[pk:] <= band)[0]
    rec_txt = f"~{(pk + below[0]) * dt * 1e3:.0f} ms" if below.size else "> sim window"
    curves[f"{name} +kick"] = np.asarray(errs)
    print(f"{name:>22}: peak after kick {post.max():.4f} rad, "
          f"re-settles in {rec_txt}")

try:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    t_axis = np.arange(N) * dt
    fig, ax = plt.subplots(figsize=(7.5, 4))
    colors = {"computed-torque": "#1f77b4", "PID+gravity (wn=12)": "#ff7f0e"}
    for name in ("computed-torque", "PID+gravity (wn=12)"):
        ax.semilogy(t_axis, np.maximum(curves[f"{name} +kick"], 1e-8), lw=2,
                    color=colors[name], label=f"{name} (kicked)")
    ax.axvline(kick_t * dt, color="#999999", lw=1, ls="--")
    ax.set_xlabel("time [s]")
    ax.set_ylabel("max joint tracking error [rad]")
    ax.set_title(f"{args.robot}: closed-loop tracking with a velocity kick")
    ax.legend(frameon=False)
    ax.grid(alpha=0.2)
    out = os.path.join(OUT_DIR, "control_basic.png")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"\nsaved error curves -> {out}")
except ImportError:
    print("\n(matplotlib unavailable — plot skipped)")
