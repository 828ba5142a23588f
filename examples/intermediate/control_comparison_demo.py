"""Intermediate: controller comparison — PD+gravity, PID, computed-torque,
robust, adaptive — on the same tracking task, with step-response metrics.

Twin of the reference's ``control_comparison_intermediate_demo.py``. All
closed loops run as ``lax.scan`` programs; the step-response metrics
(rise time, overshoot, settling time) match the reference's
first-entry-never-leaves semantics (``control.py:789-829``).
"""

import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from _bootstrap import parse_args

args = parse_args(__doc__)

import jax
import jax.numpy as jnp
import numpy as np

from manipulapy_tpu import control as ctl
from manipulapy_tpu.dynamics import forward_dynamics_fast, gravity_forces, mass_matrix
from manipulapy_tpu.models import catalog

model = catalog.get_robot(args.robot)
n = model.num_joints
dt, N = 0.004, 500
g = jnp.asarray([0.0, 0.0, -9.81])
q_goal = jnp.full(n, 0.5)

Mdiag = jnp.diag(mass_matrix(model, jnp.zeros(n)))
wn = 14.0
Kp = Mdiag * wn * wn
Kd = 2.0 * Mdiag * wn
Ki = 0.15 * Kp


def loop(step_fn):
    def body(carry, _):
        q, dq, state = carry
        tau, state = step_fn(q, dq, state)
        tau = jnp.clip(tau, -model.torque_limit, model.torque_limit)
        ddq = forward_dynamics_fast(model, q, dq, tau)
        dq = dq + ddq * dt
        q = q + dq * dt
        return (q, dq, state), q[1]  # joint 1 (shoulder) response

    init = (jnp.zeros(n), jnp.zeros(n), ctl.ControlState.zero(n, dtype=model.dtype))
    (_, _, _), ys = jax.lax.scan(body, init, None, length=N)
    return ys


zero = jnp.zeros(n)


def pd_grav(q, dq, s):
    tau = ctl.pd_control(q_goal, zero, q, dq, Kp=Kp, Kd=Kd)
    return tau + gravity_forces(model, q, g), s


def pid(q, dq, s):
    tau, s = ctl.pid_control(q_goal, zero, q, dq, dt, Kp=Kp, Ki=Ki, Kd=Kd, state=s)
    return tau + gravity_forces(model, q, g), s


def computed_torque(q, dq, s):
    return ctl.computed_torque_control(
        model, q_goal, zero, zero, q, dq, g, dt, Kp=jnp.full(n, wn * wn),
        Ki=jnp.full(n, 2.0), Kd=jnp.full(n, 2 * wn), state=s
    )


def robust(q, dq, s):
    tau = ctl.robust_control(
        model, q, dq, zero, g, jnp.zeros(6),
        disturbance_estimate=jnp.full(n, 0.5), adaptation_gain=2.0,
    )
    e_term = ctl.pd_control(q_goal, zero, q, dq, Kp=Kp, Kd=Kd)
    return tau + e_term, s


t = np.arange(N) * dt
for name, fn in [("PD+gravity", pd_grav), ("PID+gravity", pid),
                 ("computed-torque", computed_torque), ("robust", robust)]:
    ys = jax.jit(lambda f=fn: loop(f))()
    m = ctl.step_response_metrics(jnp.asarray(t), ys, float(q_goal[1]))
    print(f"{name:>16}: rise {float(m['rise_time']):.3f} s, "
          f"overshoot {float(m['percent_overshoot']):5.1f}%, "
          f"settle {float(m['settling_time']):.3f} s, ss err {float(m['steady_state_error']):.4f}")

# -- Ziegler-Nichols auto-tuning row -----------------------------------------
# The classical pipeline: find the ultimate gain/period with the relay-style
# sweep experiment (reference control.py:993-1067), feed them through the
# Z-N table (tune_controller validates Tu and broadcasts to DOF length).
print("\nZiegler-Nichols auto-tuning (relay sweep on the device plant):")
Ku, Tu = ctl.find_ultimate_gain_and_period(
    model, jnp.zeros(n), q_goal, g, dt=dt, steps=400, Kp_start=20.0,
)
print(f"  ultimate gain Ku={float(Ku):.1f}, period Tu={float(Tu):.3f} s")
try:
    Kp_zn, Ki_zn, Kd_zn = ctl.tune_controller(Ku, Tu, "PID", n=n)
    zn_scale = Mdiag  # gains act through M-normalized plant like the PD row

    def zn_pid(q, dq, s):
        tau, s = ctl.pid_control(
            q_goal, zero, q, dq, dt,
            Kp=Kp_zn * zn_scale, Ki=Ki_zn * zn_scale, Kd=Kd_zn * zn_scale, state=s,
        )
        return tau + gravity_forces(model, q, g), s

    ys = jax.jit(lambda: loop(zn_pid))()
    m = ctl.step_response_metrics(jnp.asarray(t), ys, float(q_goal[1]))
    if bool(jnp.isfinite(ys[-1])):
        print(f"{'ZN-tuned PID':>16}: rise {float(m['rise_time']):.3f} s, "
              f"overshoot {float(m['percent_overshoot']):5.1f}%, "
              f"settle {float(m['settling_time']):.3f} s, ss err {float(m['steady_state_error']):.4f}")
    else:
        print(f"{'ZN-tuned PID':>16}: UNSTABLE at the raw Z-N gains — the classic "
              "table assumes a near-linear plant; the hand-tuned rows above show "
              "what model-based gain placement buys on a coupled arm")
except ValueError as e:
    print(f"  tuning skipped: {e}")

# -- Plot artifact -----------------------------------------------------------
try:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "out")
    os.makedirs(OUT_DIR, exist_ok=True)
    fig, ax = plt.subplots(figsize=(8, 4.5))
    for name, fn in [("PD+gravity", pd_grav), ("PID+gravity", pid),
                     ("computed-torque", computed_torque), ("robust", robust)]:
        ys = jax.jit(lambda f=fn: loop(f))()
        ax.plot(t, np.asarray(ys), label=name)
    ax.axhline(float(q_goal[1]), color="gray", ls="--", lw=0.8, label="goal")
    ax.set_xlabel("t (s)"); ax.set_ylabel("joint 1 position (rad)")
    ax.set_title(f"Controller step responses ({args.robot}, shoulder joint)")
    ax.grid(alpha=0.3); ax.legend()
    out_png = os.path.join(OUT_DIR, "control_comparison.png")
    fig.savefig(out_png, dpi=120, bbox_inches="tight")
    print(f"\nplot saved: {out_png}")
except ImportError:
    print("\n(matplotlib unavailable — plot skipped)")
