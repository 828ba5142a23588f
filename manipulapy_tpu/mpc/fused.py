"""Latency-fused tracking MPC: the Panda H=50 <= 10 ms path.

The generic :func:`manipulapy_tpu.mpc.ilqr.ilqr` is kernel-launch-bound
for single solves on TPU: measured on v5e (Panda, H=50, 4 iterations),
33.6 ms split into forward ~2.4 ms + linearize ~2.7 ms + backward
~4.3 ms + cost ~1.4 ms per iteration — tiny ops, none compute-bound
(batch 256 runs 256x the work in 3.4x the time), and scan ``unroll`` was
measured to give ~0 because the cost is kernel COUNT, not loop overhead.
(A further measured constant: every host-dispatched jit call on the
tunnelled chip carries ~1 ms of launch latency, so sub-timings below
include that floor once.)

This module rebuilds the iteration as THREE Pallas kernels plus a few
glue ops:

* ``linearize``: every (A_t, B_t) of the horizon in ONE kernel —
  timesteps ride the 128-lane axis and the exact jacobians come from
  ``jax.linearize`` of the fused cgen step traced *inside* the kernel
  (one primal trace + 3n linear pushforwards, register-resident);
* ``backward``: the Riccati sweep as ONE kernel — time is the sequential
  grid axis (index-mapped in reverse), the value function lives in VMEM
  scratch, Quu is solved by a vectorized in-register Gauss-Jordan
  (pivoting-free: Quu is SPD), and the (k_t, K_t) gains stream out in
  exactly the packed tile layout the forward kernel consumes;
* ``forward``: every line-search candidate closed-loop in ONE kernel —
  alphas ride lanes, time is the sequential grid axis, state in scratch,
  and the tracking cost accumulates in-kernel.

Specialized to the quadratic joint-space tracking-cost family
(``make_tracking_costs``) — the BASELINE config #3 problem; arbitrary
costs stay on the generic solver. Parity with the generic solver is
pinned in ``tests/test_mpc.py`` (identical costs on the planar arm).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.robot import RobotModel
from ..ops.fd_step import build_fd_step_planes

__all__ = ["TrackingMPC", "build_tracking_mpc"]

_LANES = 128


class TrackingMPC(NamedTuple):
    """Jitted solver handle: ``solve(x0, us_warm) -> (us, xs, cost)``.

    ``linearize``, ``backward`` and ``forward`` expose the three Pallas
    kernels for benchmarking and parity tests."""

    solve: callable
    horizon: int
    n: int
    linearize: callable = None
    backward: callable = None
    forward: callable = None
    # The jitted core ``solve_impl(x0, us_init, goal_row)`` and the
    # build-time goal row — exposed so utils/aot.py can AOT-compile and
    # serialize the executable for cold-start elimination.
    solve_impl: callable = None
    goal_default: object = None


def _stage_time_lanes(x, lanes=_LANES):
    """(H, d) -> (d, lanes) f32 with zero padding on the lane axis."""
    H, d = x.shape
    out = jnp.zeros((d, lanes), jnp.float32)
    return out.at[:, :H].set(x.astype(jnp.float32).T)


def _gj_solve(M, rhs):
    """``M^{-1} rhs`` for a small SPD ``M`` (m, m) and rhs (m, k), as
    vectorized in-register Gauss-Jordan: per pivot, ONE scalar extract +
    one broadcast row scale + one rank-1 update + one select. No pivoting
    (M SPD + Levenberg regularization keeps pivots positive)."""
    m = M.shape[0]
    aug = jnp.concatenate([M, rhs], axis=1)  # (m, m+k)
    rows = jax.lax.broadcasted_iota(jnp.int32, aug.shape, 0)
    for p in range(m):
        inv_p = 1.0 / aug[p, p]
        row_p = aug[p : p + 1, :] * inv_p  # (1, m+k) normalized pivot row
        col = aug[:, p : p + 1]  # (m, 1)
        elim = aug - col * row_p  # zero col p in every row
        aug = jnp.where(rows == p, row_p, elim)  # row p := normalized
    return aug[:, m:]


def build_tracking_mpc(
    model: RobotModel,
    q_goal: jnp.ndarray,
    horizon: int,
    dt: float,
    iterations: int = 4,
    line_search_steps: int = 6,
    w_q: float = 10.0,
    w_dq: float = 0.5,
    w_u: float = 1e-4,
    w_terminal: float = 100.0,
    reg: float = 1e-6,
    u_limit: Optional[jnp.ndarray] = None,
    g=(0.0, 0.0, -9.81),
    interpret: Optional[bool] = None,
) -> TrackingMPC:
    """Build the fused solver for one (robot, goal, horizon) instance.

    ``u_limit`` defaults to the model's torque limits. ``interpret``
    defaults to True off-TPU (CPU tests) and False on TPU.
    """
    n = model.num_joints
    nx = 2 * n
    H = int(horizon)
    if H > _LANES:
        raise ValueError(f"horizon {H} > {_LANES} lanes (tile the kernel to lift)")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_alpha = int(line_search_steps)

    def _round_up(v, m):
        return ((v + m - 1) // m) * m

    # Packed-tile geometry, sized for the robot (supports up to n=8, e.g.
    # the full calibrated Panda arm+finger chain with nx=16).
    b_col = _round_up(nx, 8)  # column offset of B inside the packed AB tile
    ab_cols = 32
    if b_col + n > ab_cols:
        raise ValueError(
            f"robot too large for the fused packed layout (nx={nx}, n={n}); "
            "use the generic mpc.ilqr solver"
        )
    kk_rows = _round_up(n + 1, 8)  # rows [:n] = K_t, row n = k_t
    v_rows = _round_up(nx + 1, 8)  # rows [:nx] = Vxx, row nx = Vx
    ab_rows = _round_up(nx, 8)

    # MPC step semantics: positions clipped, velocities free (hard velocity
    # clamps kill the gradients the solver needs — mpc/ilqr.py note).
    _, step_planes = build_fd_step_planes(
        model, dt=float(dt), g=tuple(float(x) for x in g),
        clip_limits=True, clip_velocity=False,
    )

    if u_limit is None:
        from ..models.robot import host_arrays

        host = host_arrays(model)
        u_limit = (
            host["torque_limit"] if host is not None
            else jax.device_get(model.torque_limit)
        )
    elif not isinstance(u_limit, (np.ndarray, list, tuple, float, int)):
        u_limit = jax.device_get(u_limit)
    u_lim = np.broadcast_to(np.asarray(u_limit, dtype=np.float64), (n,))
    if not isinstance(q_goal, (np.ndarray, list, tuple)):
        q_goal = jax.device_get(q_goal)  # one transfer, not per-element
    q_goal_np = np.asarray(q_goal, dtype=np.float64)
    x_goal = np.concatenate([q_goal_np, np.zeros(n)])
    w_x_np = np.asarray([w_q] * n + [w_dq] * n)
    wT_np = np.asarray([w_terminal] * n + [0.1 * w_terminal] * n)

    # ---------------- Pallas kernel 1: whole-horizon linearization ----------
    def lin_kernel(xs_ref, us_ref, AB_ref):
        # Every plane is a (1, LANES) tile; timesteps ride the lane axis.
        planes = tuple(
            [xs_ref[i : i + 1, :] for i in range(nx)]
            + [us_ref[j : j + 1, :] for j in range(n)]
        )

        def f(*p):
            q = list(p[:n])
            dq = list(p[n:nx])
            u = list(p[nx:])
            q2, dq2, _ = step_planes(q, dq, u)
            return tuple(
                jnp.broadcast_to(v, (1, _LANES)) for v in list(q2) + list(dq2)
            )

        _, lin = jax.linearize(f, *planes)
        # ALL nx+n tangent seeds in ONE vectorized pass: vmap stacks the
        # seed axis onto sublanes, so the linearized step program appears
        # once in the kernel instead of nx+n times — ~20x less Mosaic
        # code to compile (measured: whole-solver build 79 s -> seed-loop
        # removed) and the pushforwards ride the VPU's sublane axis.
        m = nx + n
        # Stacked seeds: seeds_stack[k] has shape (m, 1, LANES) with
        # row j = 1.0 iff j == k (the vmapped axis is the seed index j).
        seeds_stack = tuple(
            jnp.broadcast_to(
                (jax.lax.broadcasted_iota(jnp.int32, (m, 1, 1), 0) == k).astype(
                    jnp.float32
                ),
                (m, 1, _LANES),
            )
            for k in range(m)
        )
        cols = jax.vmap(lambda *s: lin(*s))(*seeds_stack)
        # cols[i]: (m, 1, LANES) — pushforward of output plane i under
        # every seed. Two block writes per output row: A then B columns.
        for i in range(nx):
            AB_ref[i, :nx, :] = cols[i][:nx, 0, :]
            AB_ref[i, b_col : b_col + n, :] = cols[i][nx:, 0, :]

    @jax.jit
    def linearize(xs, us):
        """xs (H, nx), us (H, n) -> AB lanes-layout (nx, 32, LANES):
        ``AB[i, k, t] = A_t[i, k]``; ``AB[i, 16 + j, t] = B_t[i, j]``."""
        return pl.pallas_call(
            lin_kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nx, 32, _LANES), jnp.float32),
            interpret=interpret,
        )(_stage_time_lanes(xs), _stage_time_lanes(us))

    def linearize_unpacked(xs, us):
        """(A (H, nx, nx), B (H, nx, n)) view — tests/benchmarks."""
        AB = linearize(xs, us)
        ABt = jnp.moveaxis(AB, -1, 0)[:H]
        return ABt[:, :, :nx], ABt[:, :, b_col : b_col + n]

    # ---------------- Pallas kernel 2: Riccati backward sweep ---------------
    # Time is the sequential grid axis, index-mapped in REVERSE; V lives in
    # scratch; gains stream out in the forward kernel's packed layout.
    def bwd_kernel(const_ref, AB_ref, sd_ref, Vterm_ref, reg_ref, kK_ref, V_s):
        # Pallas kernels must be constant-free: the cost-weight vectors
        # arrive through ``const_ref`` (row 0 = 2*w_x, row 1 = x_goal) and
        # identity matrices are built from iota.
        lx_w = const_ref[0:1, :nx]  # (1, nx)
        xg_row = const_ref[1:2, :nx]
        r_ids = jax.lax.broadcasted_iota(jnp.int32, (nx, nx), 0)
        c_ids = jax.lax.broadcasted_iota(jnp.int32, (nx, nx), 1)
        eye_nx = jnp.where(r_ids == c_ids, 1.0, 0.0).astype(jnp.float32)
        eye_n = eye_nx[:n, :n]
        lxx_diag = eye_nx * jnp.swapaxes(lx_w, 0, 1)  # diag(2 w_x)
        luu_diag = (2.0 * float(w_u)) * eye_n
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            V_s[:] = Vterm_ref[:]

        ab = AB_ref[0]  # (ab_rows, 128)
        A = ab[:nx, :nx]
        Bm = ab[:nx, b_col : b_col + n]
        Vxx = V_s[:nx, :nx]
        Vx_row = V_s[nx : nx + 1, :nx]  # (1, nx)

        lx_row = lx_w * (sd_ref[0, 0:1, :nx] - xg_row)  # (1, nx)
        lu_row = (2.0 * float(w_u)) * sd_ref[0, 1:2, :n]  # (1, n)

        dgT = lambda a, b: jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # a^T b without a transpose relayout
        dot = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)

        Qx_row = lx_row + dot(Vx_row, A)  # (1, nx)
        Qu_row = lu_row + dot(Vx_row, Bm)  # (1, n)
        VA = dot(Vxx, A)  # (nx, nx)
        VB = dot(Vxx, Bm)  # (nx, n)
        Qxx = lxx_diag + dgT(A, VA)
        reg_c = reg_ref[0]
        Quu = luu_diag + reg_c * eye_n + dgT(Bm, VB)
        Qux = dgT(Bm, VA)  # (n, nx)

        Qu_col = jnp.swapaxes(Qu_row, 0, 1)  # (n, 1)
        sol = _gj_solve(Quu, jnp.concatenate([Qu_col, Qux], axis=1))  # (n, 1+nx)
        k_col = -sol[:, :1]
        K = -sol[:, 1:]  # (n, nx)

        Quu_k = dot(Quu, k_col)  # (n, 1)
        Vx_new = Qx_row + dgT(Quu_k + Qu_col, K) + dgT(k_col, Qux)  # (1, nx)
        KtQuu = dgT(K, Quu)  # (nx, n)
        Vxx_new = Qxx + dot(KtQuu, K) + dgT(K, Qux) + dgT(Qux, K)
        Vxx_new = 0.5 * (Vxx_new + jnp.swapaxes(Vxx_new, 0, 1))

        V_s[:nx, :nx] = Vxx_new
        V_s[nx : nx + 1, :nx] = Vx_new
        kK_ref[0, :n, :nx] = K
        kK_ref[0, n : n + 1, :n] = jnp.swapaxes(k_col, 0, 1)

    @jax.jit
    def backward(AB, sd, Vterm, reg_c, goal_row):
        """AB (nx, 32, LANES) lanes-layout, sd (H, 8, LANES), Vterm
        (v_rows, LANES), reg scalar -> gains kK (H, kk_rows, LANES):
        rows [:n] = K_t, row n = k_t."""
        # One relayout: lanes-major AB -> per-step (H, 16, 128) tiles.
        ABt = jnp.moveaxis(AB, -1, 0)[:H]  # (H, nx, 32)
        AB_tiles = jnp.zeros((H, ab_rows, _LANES), jnp.float32).at[:, :nx, :32].set(ABt)
        const_tile = (
            jnp.zeros((8, _LANES), jnp.float32)
            .at[0, :nx].set(jnp.asarray(2.0 * w_x_np, jnp.float32))
            .at[1, :nx].set(goal_row[0])
        )
        return pl.pallas_call(
            bwd_kernel,
            grid=(H,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # const tile
                pl.BlockSpec((1, ab_rows, _LANES), lambda t: (H - 1 - t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, _LANES), lambda t: (H - 1 - t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, kk_rows, _LANES), lambda t: (H - 1 - t, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H, kk_rows, _LANES), jnp.float32),
            scratch_shapes=[pltpu.VMEM((v_rows, _LANES), jnp.float32)],
            interpret=interpret,
        )(const_tile, AB_tiles, sd, Vterm, jnp.reshape(reg_c.astype(jnp.float32), (1,)))

    # ---------------- Pallas kernel 3: line-search forward ------------------
    # alphas ride lanes; grid over time with scratch-carried state. Gains
    # arrive in the backward kernel's packed layout.
    def fwd_kernel(x0_ref, goal_ref, sd_ref, kK_ref, alpha_ref,
                   xs_ref, us_ref, cost_ref, x_s, acc_s):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            for i in range(nx):
                x_s[i : i + 1, :] = jnp.full((1, _LANES), 0.0) + x0_ref[0, i]
            acc_s[:] = jnp.zeros((1, _LANES), jnp.float32)

        alpha = alpha_ref[0:1, :]  # (1, LANES)
        x = [x_s[i : i + 1, :] for i in range(nx)]
        dx = [x[i] - sd_ref[0, 0, i] for i in range(nx)]
        u = []
        for j in range(n):
            uj = sd_ref[0, 1, j] + alpha * kK_ref[0, n, j]
            for i in range(nx):
                uj = uj + kK_ref[0, j, i] * dx[i]
            u.append(jnp.clip(uj, -float(u_lim[j]), float(u_lim[j])))

        # Running cost at the PRE-step state (matches the generic solver).
        c = jnp.zeros((1, _LANES), jnp.float32)
        for i in range(n):
            e = x[i] - goal_ref[0, i]
            c = c + float(w_q) * e * e
            c = c + float(w_dq) * x[n + i] * x[n + i]
        for j in range(n):
            c = c + float(w_u) * u[j] * u[j]
        acc_s[:] = acc_s[:] + c

        q2, dq2, _ = step_planes(x[:n], x[n:], u)
        bc = lambda v: jnp.broadcast_to(v, (1, _LANES))
        for i in range(n):
            x_s[i : i + 1, :] = bc(q2[i])
            x_s[n + i : n + i + 1, :] = bc(dq2[i])
            xs_ref[0, 0, i : i + 1, :] = bc(q2[i])
            xs_ref[0, 0, n + i : n + i + 1, :] = bc(dq2[i])
            us_ref[0, 0, i : i + 1, :] = bc(u[i])

        @pl.when(t == H - 1)
        def _():
            # Terminal cost on the post-step state.
            cT = jnp.zeros((1, _LANES), jnp.float32)
            for i in range(nx):
                e = x_s[i : i + 1, :] - goal_ref[0, i]
                cT = cT + float(wT_np[i]) * e * e
            cost_ref[:] = acc_s[:] + cT

    @jax.jit
    def forward_packed(x0_s, goal_row, sd, kK, alpha_s):
        """Packed-layout line-search rollouts; returns packed outputs:
        xs (1, H, nx, LANES) post-step states, us (1, H, n, LANES),
        costs (1, LANES)."""
        return pl.pallas_call(
            fwd_kernel,
            grid=(H,),
            in_specs=[
                pl.BlockSpec((1, nx), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nx), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, _LANES), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kk_rows, _LANES), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # alphas (1, LANES)
            ],
            out_specs=[
                pl.BlockSpec((1, 1, nx, _LANES), lambda t: (0, t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, n, _LANES), lambda t: (0, t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((1, H, nx, _LANES), jnp.float32),
                jax.ShapeDtypeStruct((1, H, n, _LANES), jnp.float32),
                jax.ShapeDtypeStruct((1, _LANES), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((nx, _LANES), jnp.float32),
                pltpu.VMEM((1, _LANES), jnp.float32),
            ],
            interpret=interpret,
        )(x0_s, goal_row, sd, kK, alpha_s)

    def _stage_sd(xs_pre, us):
        sd = jnp.zeros((H, 8, _LANES), jnp.float32)
        sd = sd.at[:, 0, :nx].set(xs_pre.astype(jnp.float32))
        return sd.at[:, 1, :n].set(us.astype(jnp.float32))

    @jax.jit
    def forward(x0, xs_ref_traj, us_ref_traj, ks, Ks, alphas):
        """Unpacked-API line-search rollouts (tests/benchmarks):
        returns xs_new (A, H, nx), us_new (A, H, n), costs (A,)."""
        x0_s = jnp.zeros((1, nx), jnp.float32).at[0].set(x0.astype(jnp.float32))
        n_a = alphas.shape[0]
        alpha_s = jnp.zeros((1, _LANES), jnp.float32).at[0, :n_a].set(
            alphas.astype(jnp.float32)
        )
        sd = _stage_sd(xs_ref_traj, us_ref_traj)
        kK = jnp.zeros((H, kk_rows, _LANES), jnp.float32)
        kK = kK.at[:, :n, :nx].set(Ks.astype(jnp.float32))
        kK = kK.at[:, n, :n].set(ks.astype(jnp.float32))
        goal_row = jnp.zeros((1, nx), jnp.float32).at[0].set(
            jnp.asarray(x_goal, jnp.float32)
        )
        xs_out, us_out, cost = forward_packed(x0_s, goal_row, sd, kK, alpha_s)
        xs_new = jnp.moveaxis(xs_out[0], -1, 0)[:n_a]
        us_new = jnp.moveaxis(us_out[0], -1, 0)[:n_a]
        return xs_new, us_new, cost[0, :n_a]

    alphas_v = 0.5 ** jnp.arange(n_alpha, dtype=jnp.float32)

    # ---------------- solver loop --------------------------------------------
    # The goal rides a runtime argument (like the batched solver): a
    # receding-horizon loop can re-target every step without recompiling.
    @jax.jit
    def solve_impl(x0, us_init, goal_row):
        x0 = x0.astype(jnp.float32)
        us0 = jnp.clip(
            us_init.astype(jnp.float32),
            -jnp.asarray(u_lim, jnp.float32),
            jnp.asarray(u_lim, jnp.float32),
        )
        x0_s = jnp.zeros((1, nx), jnp.float32).at[0].set(x0)
        alpha_s = jnp.zeros((1, _LANES), jnp.float32).at[0, :n_alpha].set(alphas_v)
        zero_alpha = jnp.zeros((1, _LANES), jnp.float32)
        kK0 = jnp.zeros((H, kk_rows, _LANES), jnp.float32)

        # Initial rollout: alpha = 0 closed loop == open loop of us0.
        sd0 = _stage_sd(jnp.zeros((H, nx), jnp.float32), us0)
        xs_p, us_p, cost_p = forward_packed(x0_s, goal_row, sd0, kK0, zero_alpha)
        cost = cost_p[0, 0]

        def select(xs_p, us_p, lane):
            xs_sel = jax.lax.dynamic_index_in_dim(
                xs_p[0], lane, axis=-1, keepdims=False
            )  # (H, nx)
            us_sel = jax.lax.dynamic_index_in_dim(us_p[0], lane, axis=-1, keepdims=False)
            return xs_sel, us_sel

        xs_post, us_cur = select(xs_p, us_p, 0)

        def iteration(carry, _):
            xs_post, us_cur, cost, reg_c = carry
            xs_pre = jnp.concatenate([x0[None], xs_post[:-1]], axis=0)
            sd = _stage_sd(xs_pre, us_cur)
            AB = linearize(xs_pre, us_cur)
            x_last = xs_post[-1]
            Vterm = jnp.zeros((v_rows, _LANES), jnp.float32)
            Vterm = Vterm.at[:nx, :nx].set(jnp.diag(jnp.asarray(2.0 * wT_np, jnp.float32)))
            Vterm = Vterm.at[nx, :nx].set(
                jnp.asarray(2.0 * wT_np, jnp.float32) * (x_last - goal_row[0])
            )
            kK = backward(AB, sd, Vterm, reg_c, goal_row)
            xs_p, us_p, costs_p = forward_packed(x0_s, goal_row, sd, kK, alpha_s)
            costs_all = costs_p[0, :n_alpha]
            improving = jnp.logical_and(jnp.isfinite(costs_all), costs_all < cost)
            idx = jnp.argmax(improving)
            accepted = jnp.any(improving)
            xs_sel, us_sel = select(xs_p, us_p, idx)
            xs_new = jnp.where(accepted, xs_sel, xs_post)
            us_new = jnp.where(accepted, us_sel, us_cur)
            cost_new = jnp.where(accepted, costs_all[idx], cost)
            reg_new = jnp.where(
                accepted, jnp.maximum(reg_c / 10.0, 1e-9), jnp.minimum(reg_c * 10.0, 1e6)
            )
            return (xs_new, us_new, cost_new, reg_new), None

        (xs_post, us_cur, cost, _), _ = jax.lax.scan(
            iteration, (xs_post, us_cur, cost, jnp.float32(reg)), None,
            length=iterations,
        )
        xs_full = jnp.concatenate([x0[None], xs_post], axis=0)
        return us_cur, xs_full, cost

    goal_row_c = jnp.zeros((1, nx), jnp.float32).at[0].set(
        jnp.asarray(x_goal, jnp.float32)
    )

    def solve(x0, us_init, q_goal_new=None):
        """Solve; ``q_goal_new`` (n,) re-targets WITHOUT recompiling."""
        if q_goal_new is None:
            goal_row = goal_row_c
        else:
            goal_row = jnp.zeros((1, nx), jnp.float32).at[0, :n].set(
                jnp.asarray(q_goal_new, jnp.float32)
            )
        return solve_impl(x0, us_init, goal_row)

    return TrackingMPC(
        solve=solve, horizon=H, n=n,
        linearize=linearize_unpacked, backward=backward, forward=forward,
        solve_impl=solve_impl, goal_default=goal_row_c,
    )
