"""Basic control: computed-torque and PID closed-loop trajectory tracking.

Twin of the reference's ``control_basic_demo.py``: the controllers are
pure step functions (state carried explicitly), so the whole closed-loop
simulation is one ``lax.scan`` — no Python control loop.
"""

import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from _bootstrap import parse_args

args = parse_args(__doc__)

import jax
import jax.numpy as jnp
import numpy as np

from manipulapy_tpu import control as ctl
from manipulapy_tpu.dynamics import forward_dynamics_fast
from manipulapy_tpu.models import catalog
from manipulapy_tpu.trajectory import joint_trajectory

model = catalog.get_robot(args.robot)
n = model.num_joints
dt, N = 0.005, 400

ref = joint_trajectory(model, jnp.zeros(n), jnp.full(n, 0.8), Tf=N * dt, N=N, method=5)

Kp, Ki, Kd = jnp.full(n, 60.0), jnp.full(n, 2.0), jnp.full(n, 12.0)

# For the PID baseline, scale gains by the inertia seen at each joint
# (uniform closed-loop natural frequency): the UR5's wrist joints have
# ~1000x less effective inertia than the shoulder, so uniform gains
# either crawl at the base or blow up at the wrist.
from manipulapy_tpu.dynamics import mass_matrix

Mdiag = jnp.diag(mass_matrix(model, jnp.zeros(n)))
wn, zeta = 12.0, 1.0
Kp_pid = Mdiag * wn * wn
Kd_pid = 2.0 * zeta * Mdiag * wn
Ki_pid = 0.1 * Kp_pid


def simulate(control_step):
    def body(carry, t):
        q, dq, state = carry
        tau, state = control_step(q, dq, ref.position[t], ref.velocity[t], ref.acceleration[t], state)
        ddq = forward_dynamics_fast(model, q, dq, tau)
        dq = dq + ddq * dt
        q = q + dq * dt
        return (q, dq, state), jnp.max(jnp.abs(q - ref.position[t]))

    init = (jnp.zeros(n), jnp.zeros(n), ctl.ControlState.zero(n, dtype=model.dtype))
    _, errs = jax.lax.scan(body, init, jnp.arange(N))
    return errs


g = jnp.asarray([0.0, 0.0, -9.81])


def ct_step(q, dq, qd, dqd, ddqd, state):
    return ctl.computed_torque_control(
        model, qd, dqd, ddqd, q, dq, g, dt, Kp=Kp, Ki=Ki, Kd=Kd, state=state
    )


def pid_grav_step(q, dq, qd, dqd, ddqd, state):
    # Plain PID can't fight the arm's ~50 Nm gravity torques, so the
    # standard baseline adds gravity compensation.
    tau, state = ctl.pid_control(
        qd, dqd, q, dq, dt, Kp=Kp_pid, Ki=Ki_pid, Kd=Kd_pid, state=state
    )
    from manipulapy_tpu.dynamics import gravity_forces

    return tau + gravity_forces(model, q, g), state


for name, step in [("computed-torque", ct_step), ("PID+gravity", pid_grav_step)]:
    errs = jax.jit(lambda s=step: simulate(s))()
    print(f"{name:>16}: final tracking error {float(errs[-1]):.5f} rad, "
          f"peak {float(jnp.max(errs)):.5f} rad")

print("\n(computed-torque cancels the exact dynamics, so it tracks the",
      "\n quintic reference ~60x tighter than inertia-scaled PID+gravity)")
