"""Batched fused tracking MPC: fleet-scale iLQR at Pallas-kernel cost.

The single-problem fused solver (:mod:`manipulapy_tpu.mpc.fused`) puts
line-search candidates / timesteps on the 128-lane axis — right for
latency, wrong for throughput: a batch of scenarios would serialize.
This module re-lays the same three-kernel pipeline with **scenarios on
the (8, 128) VPU tile axes** — the layout proven by the rollout engine
(``ops/pallas_rollout.py``): every per-scenario scalar of the solver is
an (8, 128) tile of 1024 scenarios, so each Pallas grid cell advances
1024 iLQR problems in lockstep full-width VPU ops.

Pipeline per iteration (all Pallas, grid time axis sequential):

* ``linearize`` — grid (Bt, H): exact (A_t, B_t) per scenario from
  ``jax.linearize`` of the fused cgen step traced in-kernel, all
  2n + n tangent seeds in one vmapped pass (the compile-size trick from
  ``fused.py``), each jacobian entry an (8, 128) scenario tile;
* ``backward`` — grid (Bt, H) time-reversed: Riccati sweep with the
  value function (nx + 1 rows of tiles) in VMEM scratch, per-scenario
  Levenberg regularization riding a tile, and Quu solved by an unrolled
  tile-Cholesky (same structure as ``ops/smallinalg.py``);
* ``forward`` — two variants of one body: a cost-only pass over the
  line-search grid (Bt, A, H) scoring every alpha for every scenario,
  and a replay pass (Bt, H) that rolls the per-scenario WINNING alpha
  (alpha rides a tile) and streams out the accepted trajectory. Alpha=0
  retraces the nominal trajectory exactly (closed-loop with dx=0), so
  non-improving scenarios keep their trajectory without a select.

Per-scenario goals are supported (``q_goal`` may be (B, n)): the fleet
problem solves 1024s of different targets in one launch.

Reference counterpart being surpassed: the 3D batch trajectory kernel
(``cuda_kernels.py:1473-1541``) — which batches *interpolation*, not
optimal control — and the >1 kHz control-rate claim
(``paper/paper.md:77-81``). Parity with the generic vmapped iLQR is
pinned in ``tests/test_mpc.py::TestBatchFusedMPC``.
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

__all__ = ["BatchTrackingMPC", "build_batch_tracking_mpc", "batch_mpc_step"]

_SUB, _LANE = 8, 128
_TILE_B = _SUB * _LANE  # 1024 scenarios per grid cell


class BatchTrackingMPC(NamedTuple):
    """Jitted batched solver handle:
    ``solve(x0 (B, 2n), us_warm (B, H, n)) -> (us (B, H, n),
    xs (B, H+1, 2n), cost (B,))``. ``q_goal`` fixed at build time —
    (n,) shared or (B, n) per scenario."""

    solve: callable
    horizon: int
    n: int
    batch: int
    # The four Pallas pipeline stages, exposed for benchmarks/tests.
    linearize: callable = None
    backward: callable = None
    linesearch_costs: callable = None
    replay: callable = None
    # The jitted core ``solve_impl(x0, us_init, goal_tiles)`` and the
    # build-time goal tiles — exposed so utils/aot.py can AOT-compile
    # and serialize the executable for cold-start elimination.
    solve_impl: callable = None
    goal_default: object = None


def _chol_solve_tiles(M, rhs_cols):
    """Unrolled Cholesky solve where every matrix entry is an (8, 128)
    scenario tile. ``M``: n x n list-of-lists (symmetric, lower half
    read); ``rhs_cols``: list of columns, each a list of n tiles.
    Returns solved columns in the same structure."""
    n = len(M)
    L = [[None] * (i + 1) for i in range(n)]
    inv_d = [None] * n
    for j in range(n):
        s = M[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(s)
        L[j][j] = d
        inv_d[j] = 1.0 / d
        for i in range(j + 1, n):
            s = M[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d[j]
    out = []
    for rhs in rhs_cols:
        y = [None] * n
        for i in range(n):
            s = rhs[i]
            for k in range(i):
                s = s - L[i][k] * y[k]
            y[i] = s * inv_d[i]
        x = [None] * n
        for i in range(n - 1, -1, -1):
            s = y[i]
            for k in range(i + 1, n):
                s = s - L[k][i] * x[k]
            x[i] = s * inv_d[i]
        out.append(x)
    return out


def build_batch_tracking_mpc(
    model: RobotModel,
    q_goal: jnp.ndarray,
    batch: int,
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
) -> BatchTrackingMPC:
    """Build the batched fused solver for one (robot, goals, B, H).

    ``batch`` is the declared scenario count; inputs are padded to a
    multiple of 1024 internally (one VPU tile of scenarios per grid
    cell), so B = 64 costs the same as B = 1024 — size fleets
    accordingly. ``q_goal``: (n,) shared or (batch, n) per scenario.
    """
    n = model.num_joints
    nx = 2 * n
    H = int(horizon)
    B = int(batch)
    A = int(line_search_steps)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    pad = (-B) % _TILE_B
    Bp = B + pad
    Bt = Bp // _TILE_B

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
        q_goal = jax.device_get(q_goal)
    q_goal_np = np.asarray(q_goal, dtype=np.float64)
    if q_goal_np.ndim == 1:
        q_goal_np = np.broadcast_to(q_goal_np, (B, n))
    if q_goal_np.shape != (B, n):
        raise ValueError(f"q_goal must be ({n},) or ({B}, {n}), got {q_goal_np.shape}")
    goal_pad = np.concatenate([q_goal_np, np.zeros((pad, n))], axis=0)

    w_x = [float(w_q)] * n + [float(w_dq)] * n
    wT = [float(w_terminal)] * n + [0.1 * float(w_terminal)] * n
    m = nx + n  # tangent seeds: x then u

    # -- staging: scenario axis -> (8, 128) tiles ---------------------------
    def stage_state(x):  # (Bp, d) -> (Bt, d, 8, 128)
        d = x.shape[-1]
        return x.astype(jnp.float32).reshape(Bt, _SUB, _LANE, d).transpose(0, 3, 1, 2)

    def stage_seq(x):  # (Bp, H, d) -> (Bt, H, d, 8, 128)
        d = x.shape[-1]
        return (
            x.astype(jnp.float32)
            .reshape(Bt, _SUB, _LANE, H, d)
            .transpose(0, 3, 4, 1, 2)
        )

    def unstage_state(x):  # (Bt, d, 8, 128) -> (B, d)
        return x.transpose(0, 2, 3, 1).reshape(Bp, -1)[:B]

    def unstage_seq(x):  # (Bt, H, d, 8, 128) -> (B, H, d)
        return x.transpose(0, 3, 4, 1, 2).reshape(Bp, H, -1)[:B]

    goal_tiles_c = stage_state(jnp.asarray(goal_pad))  # (Bt, n, 8, 128)

    tile_spec = lambda d: pl.BlockSpec(
        (1, d, _SUB, _LANE), lambda b, t: (b, 0, 0, 0), memory_space=pltpu.VMEM
    )

    def seq_spec(d, rev=False):
        ix = (lambda b, t: (b, H - 1 - t, 0, 0, 0)) if rev else (lambda b, t: (b, t, 0, 0, 0))
        return pl.BlockSpec((1, 1, d, _SUB, _LANE), ix, memory_space=pltpu.VMEM)

    # ---------------- kernel 1: per-scenario whole-horizon linearization ----
    def lin_kernel(xs_ref, us_ref, AB_ref):
        planes = tuple(
            [xs_ref[0, 0, i] for i in range(nx)] + [us_ref[0, 0, j] for j in range(n)]
        )

        def f(*p):
            q2, dq2, _ = step_planes(list(p[:n]), list(p[n:nx]), list(p[nx:]))
            return tuple(
                jnp.broadcast_to(v, (_SUB, _LANE)) for v in list(q2) + list(dq2)
            )

        _, lin = jax.linearize(f, *planes)
        # All m seeds in one vmapped pass (seed axis leading): the linear
        # step program appears once in the Mosaic module (fused.py's
        # measured ~20x compile-size lever).
        seeds_stack = tuple(
            jnp.broadcast_to(
                (jax.lax.broadcasted_iota(jnp.int32, (m, 1, 1), 0) == k).astype(
                    jnp.float32
                ),
                (m, _SUB, _LANE),
            )
            for k in range(m)
        )
        cols = jax.vmap(lambda *s: lin(*s))(*seeds_stack)
        # cols[i]: (m, 8, 128) — d(out_i)/d(in_k) tiles. One block write
        # per output row.
        for i in range(nx):
            AB_ref[0, 0, i] = cols[i]

    @jax.jit
    def linearize(xs_t, us_t):
        """xs_t (Bt, H, nx, 8, 128) pre-step states, us_t (Bt, H, n, 8,
        128) -> AB (Bt, H, nx, m, 8, 128): AB[..., i, k] = d x'_i / d
        [x; u]_k per scenario."""
        return pl.pallas_call(
            lin_kernel,
            grid=(Bt, H),
            in_specs=[seq_spec(nx), seq_spec(n)],
            out_specs=pl.BlockSpec(
                (1, 1, nx, m, _SUB, _LANE),
                lambda b, t: (b, t, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((Bt, H, nx, m, _SUB, _LANE), jnp.float32),
            interpret=interpret,
        )(xs_t, us_t)

    # ---------------- kernel 2: Riccati backward sweep ----------------------
    def bwd_kernel(AB_ref, xs_ref, us_ref, xlast_ref, goal_ref, reg_ref, kK_ref, V_s):
        t = pl.program_id(1)
        goal = [goal_ref[0, i] for i in range(n)]
        x_goal = goal + [jnp.zeros((_SUB, _LANE), jnp.float32)] * n

        @pl.when(t == 0)
        def _():
            # Terminal value function: Vxx = diag(2 wT), Vx = 2 wT (xT - g).
            for i in range(nx):
                for k in range(nx):
                    V_s[i, k] = (
                        jnp.full((_SUB, _LANE), 2.0 * wT[i], jnp.float32)
                        if i == k
                        else jnp.zeros((_SUB, _LANE), jnp.float32)
                    )
                V_s[nx, i] = (2.0 * wT[i]) * (xlast_ref[0, i] - x_goal[i])

        Am = [[AB_ref[0, 0, i, k] for k in range(nx)] for i in range(nx)]
        Bm = [[AB_ref[0, 0, i, nx + j] for j in range(n)] for i in range(nx)]
        Vxx = [[V_s[i, k] for k in range(nx)] for i in range(nx)]
        Vx = [V_s[nx, i] for i in range(nx)]
        x = [xs_ref[0, 0, i] for i in range(nx)]
        u = [us_ref[0, 0, j] for j in range(n)]
        reg_c = reg_ref[0]  # (8, 128) per-scenario Levenberg tile

        lx = [(2.0 * w_x[i]) * (x[i] - x_goal[i]) for i in range(nx)]
        lu = [(2.0 * float(w_u)) * u[j] for j in range(n)]

        # Qx = lx + A^T Vx ; Qu = lu + B^T Vx
        Qx = [lx[i] + sum(Vx[k] * Am[k][i] for k in range(nx)) for i in range(nx)]
        Qu = [lu[j] + sum(Vx[k] * Bm[k][j] for k in range(nx)) for j in range(n)]
        # VA = Vxx A ; VB = Vxx B
        VA = [
            [sum(Vxx[k][l] * Am[l][i] for l in range(nx)) for i in range(nx)]
            for k in range(nx)
        ]
        VB = [
            [sum(Vxx[k][l] * Bm[l][j] for l in range(nx)) for j in range(n)]
            for k in range(nx)
        ]
        # Qxx = lxx + A^T VA (lxx diagonal)
        Qxx = [
            [
                sum(Am[l][i] * VA[l][k] for l in range(nx))
                + ((2.0 * w_x[i]) if i == k else 0.0)
                for k in range(nx)
            ]
            for i in range(nx)
        ]
        # Quu = luu + reg I + B^T VB ; Qux = B^T VA
        Quu = [
            [
                sum(Bm[l][j] * VB[l][j2] for l in range(nx))
                + ((2.0 * float(w_u)) + reg_c if j == j2 else 0.0)
                for j2 in range(n)
            ]
            for j in range(n)
        ]
        Qux = [
            [sum(Bm[l][j] * VA[l][i] for l in range(nx)) for i in range(nx)]
            for j in range(n)
        ]

        # Solve Quu [k | K] = [Qu | Qux] (then negate).
        cols = [[Qu[j] for j in range(n)]] + [
            [Qux[j][i] for j in range(n)] for i in range(nx)
        ]
        sols = _chol_solve_tiles(Quu, cols)
        k_t = [-sols[0][j] for j in range(n)]
        K = [[-sols[1 + i][j] for i in range(nx)] for j in range(n)]  # (n, nx)

        # Vx' = Qx + K^T Quu k + K^T Qu + Qux^T k
        Quu_k = [sum(Quu[j][j2] * k_t[j2] for j2 in range(n)) for j in range(n)]
        Vx_new = [
            Qx[i]
            + sum(K[j][i] * (Quu_k[j] + Qu[j]) for j in range(n))
            + sum(Qux[j][i] * k_t[j] for j in range(n))
            for i in range(nx)
        ]
        # Vxx' = Qxx + K^T Quu K + K^T Qux + Qux^T K, symmetrized.
        KtQuu = [
            [sum(K[j][i] * Quu[j][j2] for j in range(n)) for j2 in range(n)]
            for i in range(nx)
        ]
        Vxx_new = [[None] * nx for _ in range(nx)]
        for i in range(nx):
            for k in range(i, nx):
                v = (
                    Qxx[i][k]
                    + sum(KtQuu[i][j2] * K[j2][k] for j2 in range(n))
                    + sum(K[j][i] * Qux[j][k] for j in range(n))
                    + sum(Qux[j][i] * K[j][k] for j in range(n))
                )
                Vxx_new[i][k] = v
                Vxx_new[k][i] = v

        for i in range(nx):
            for k in range(nx):
                V_s[i, k] = Vxx_new[i][k]
            V_s[nx, i] = Vx_new[i]
        for j in range(n):
            kK_ref[0, 0, j, 0] = k_t[j]
            for i in range(nx):
                kK_ref[0, 0, j, 1 + i] = K[j][i]

    @jax.jit
    def backward(AB, xs_t, us_t, xlast_t, goal_t, reg_t):
        """-> gains kK (Bt, H, n, 1 + nx, 8, 128): [..., j, 0] = k_t[j],
        [..., j, 1 + i] = K_t[j, i], per scenario."""
        return pl.pallas_call(
            bwd_kernel,
            grid=(Bt, H),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, nx, m, _SUB, _LANE),
                    lambda b, t: (b, H - 1 - t, 0, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                seq_spec(nx, rev=True),
                seq_spec(n, rev=True),
                tile_spec(nx),
                tile_spec(n),
                pl.BlockSpec((1, _SUB, _LANE), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, n, 1 + nx, _SUB, _LANE),
                lambda b, t: (b, H - 1 - t, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((Bt, H, n, 1 + nx, _SUB, _LANE), jnp.float32),
            scratch_shapes=[pltpu.VMEM((nx + 1, nx, _SUB, _LANE), jnp.float32)],
            interpret=interpret,
        )(AB, xs_t, us_t, xlast_t, goal_t, reg_t)

    # ---------------- kernel 3: forward (cost pass + replay pass) -----------
    def _fwd_step(x, dx, u_nom, kK_t, alpha, goal):
        """Shared body: closed-loop control, running cost, dynamics step.
        Returns (u, running_cost, x_next)."""
        u = []
        for j in range(n):
            uj = u_nom[j] + alpha * kK_t[j][0]
            for i in range(nx):
                uj = uj + kK_t[j][1 + i] * dx[i]
            u.append(jnp.clip(uj, -float(u_lim[j]), float(u_lim[j])))
        c = jnp.zeros((_SUB, _LANE), jnp.float32)
        for i in range(n):
            e = x[i] - goal[i]
            c = c + float(w_q) * e * e + float(w_dq) * x[n + i] * x[n + i]
        for j in range(n):
            c = c + float(w_u) * u[j] * u[j]
        q2, dq2, _ = step_planes(x[:n], x[n:], u)
        bc = lambda v: jnp.broadcast_to(v, (_SUB, _LANE))
        return u, c, [bc(v) for v in q2] + [bc(v) for v in dq2]

    def _terminal(x, goal):
        cT = jnp.zeros((_SUB, _LANE), jnp.float32)
        for i in range(n):
            e = x[i] - goal[i]
            cT = cT + wT[i] * e * e + wT[n + i] * x[n + i] * x[n + i]
        return cT

    def cost_kernel(x0_ref, sd_x_ref, sd_u_ref, kK_ref, goal_ref, alphas_ref,
                    cost_ref, x_s, acc_s):
        t = pl.program_id(2)
        a = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            for i in range(nx):
                x_s[i] = x0_ref[0, i]
            acc_s[0] = jnp.zeros((_SUB, _LANE), jnp.float32)

        alpha = alphas_ref[a]
        goal = [goal_ref[0, i] for i in range(n)]
        x = [x_s[i] for i in range(nx)]
        dx = [x[i] - sd_x_ref[0, 0, i] for i in range(nx)]
        u_nom = [sd_u_ref[0, 0, j] for j in range(n)]
        kK_t = [[kK_ref[0, 0, j, c] for c in range(1 + nx)] for j in range(n)]
        _, c, x_next = _fwd_step(x, dx, u_nom, kK_t, alpha, goal)
        acc_s[0] = acc_s[0] + c
        for i in range(nx):
            x_s[i] = x_next[i]

        @pl.when(t == H - 1)
        def _():
            cost_ref[0, 0] = acc_s[0] + _terminal([x_s[i] for i in range(nx)], goal)

    @jax.jit
    def linesearch_costs(x0_t, sd_x, sd_u, kK, goal_t, alphas):
        """Score every alpha for every scenario: -> (Bt, A, 8, 128)."""
        return pl.pallas_call(
            cost_kernel,
            grid=(Bt, A, H),
            in_specs=[
                pl.BlockSpec((1, nx, _SUB, _LANE), lambda b, a, t: (b, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, nx, _SUB, _LANE), lambda b, a, t: (b, t, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, n, _SUB, _LANE), lambda b, a, t: (b, t, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, n, 1 + nx, _SUB, _LANE), lambda b, a, t: (b, t, 0, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, _SUB, _LANE), lambda b, a, t: (b, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, _SUB, _LANE), lambda b, a, t: (b, a, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((Bt, A, _SUB, _LANE), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((nx, _SUB, _LANE), jnp.float32),
                pltpu.VMEM((1, _SUB, _LANE), jnp.float32),
            ],
            interpret=interpret,
        )(x0_t, sd_x, sd_u, kK, goal_t, alphas)

    def replay_kernel(x0_ref, sd_x_ref, sd_u_ref, kK_ref, goal_ref, alpha_ref,
                      xs_ref, us_ref, cost_ref, x_s, acc_s):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            for i in range(nx):
                x_s[i] = x0_ref[0, i]
            acc_s[0] = jnp.zeros((_SUB, _LANE), jnp.float32)

        alpha = alpha_ref[0, 0]  # per-scenario tile
        goal = [goal_ref[0, i] for i in range(n)]
        x = [x_s[i] for i in range(nx)]
        dx = [x[i] - sd_x_ref[0, 0, i] for i in range(nx)]
        u_nom = [sd_u_ref[0, 0, j] for j in range(n)]
        kK_t = [[kK_ref[0, 0, j, c] for c in range(1 + nx)] for j in range(n)]
        u, c, x_next = _fwd_step(x, dx, u_nom, kK_t, alpha, goal)
        acc_s[0] = acc_s[0] + c
        for i in range(nx):
            x_s[i] = x_next[i]
            xs_ref[0, 0, i] = x_next[i]
        for j in range(n):
            us_ref[0, 0, j] = u[j]

        @pl.when(t == H - 1)
        def _():
            cost_ref[0, 0] = acc_s[0] + _terminal([x_s[i] for i in range(nx)], goal)

    @jax.jit
    def replay(x0_t, sd_x, sd_u, kK, goal_t, alpha_t):
        """Roll the per-scenario alpha closed-loop; -> (xs_post (Bt, H,
        nx, 8, 128), us (Bt, H, n, 8, 128), cost (Bt, 1, 8, 128))."""
        return pl.pallas_call(
            replay_kernel,
            grid=(Bt, H),
            in_specs=[
                tile_spec(nx),
                seq_spec(nx),
                seq_spec(n),
                pl.BlockSpec((1, 1, n, 1 + nx, _SUB, _LANE), lambda b, t: (b, t, 0, 0, 0, 0), memory_space=pltpu.VMEM),
                tile_spec(n),
                pl.BlockSpec((1, 1, _SUB, _LANE), lambda b, t: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                seq_spec(nx),
                seq_spec(n),
                pl.BlockSpec((1, 1, _SUB, _LANE), lambda b, t: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Bt, H, nx, _SUB, _LANE), jnp.float32),
                jax.ShapeDtypeStruct((Bt, H, n, _SUB, _LANE), jnp.float32),
                jax.ShapeDtypeStruct((Bt, 1, _SUB, _LANE), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((nx, _SUB, _LANE), jnp.float32),
                pltpu.VMEM((1, _SUB, _LANE), jnp.float32),
            ],
            interpret=interpret,
        )(x0_t, sd_x, sd_u, kK, goal_t, alpha_t)

    alphas_np = 0.5 ** np.arange(A, dtype=np.float32)

    # ---------------- solver loop -------------------------------------------
    # Goals are a runtime ARGUMENT (staged tiles), not a baked constant:
    # a fleet re-targets every horizon, and constants would force a full
    # recompile per goal set (compiles are never cached on the tunnelled
    # chip — measured 15-400 s each).
    @jax.jit
    def solve_impl(x0, us_init, goal_tiles):
        u_lim_j = jnp.asarray(u_lim, jnp.float32)
        us0 = jnp.clip(us_init.astype(jnp.float32), -u_lim_j, u_lim_j)
        x0p = jnp.concatenate(
            [x0.astype(jnp.float32), jnp.zeros((pad, nx), jnp.float32)], axis=0
        )
        us0p = jnp.concatenate(
            [us0, jnp.zeros((pad, H, n), jnp.float32)], axis=0
        )
        x0_t = stage_state(x0p)  # (Bt, nx, 8, 128)
        alphas_c = jnp.asarray(alphas_np)
        zeros_tile = jnp.zeros((Bt, 1, _SUB, _LANE), jnp.float32)
        kK0 = jnp.zeros((Bt, H, n, 1 + nx, _SUB, _LANE), jnp.float32)

        # Initial rollout: alpha = 0, zero gains == open-loop us0.
        sd_u0 = stage_seq(us0p)
        sd_x0 = jnp.zeros((Bt, H, nx, _SUB, _LANE), jnp.float32)
        xs_post, us_cur, cost_t = replay(x0_t, sd_x0, sd_u0, kK0, goal_tiles, zeros_tile)
        cost_t = cost_t[:, 0]  # (Bt, 8, 128)

        def iteration(carry, _):
            xs_post, us_cur, cost_t, reg_t = carry
            # Pre-step nominal states: x0 then xs_post[:-1].
            sd_x = jnp.concatenate([x0_t[:, None], xs_post[:, :-1]], axis=1)
            AB = linearize(sd_x, us_cur)
            xlast_t = xs_post[:, -1]  # (Bt, nx, 8, 128)
            kK = backward(AB, sd_x, us_cur, xlast_t, goal_tiles, reg_t)
            costs_all = linesearch_costs(x0_t, sd_x, us_cur, kK, goal_tiles, alphas_c)
            # Per-scenario first improving alpha (alphas descend from 1).
            improving = jnp.logical_and(
                jnp.isfinite(costs_all), costs_all < cost_t[:, None]
            )  # (Bt, A, 8, 128)
            idx = jnp.argmax(improving, axis=1)  # (Bt, 8, 128)
            accepted = jnp.any(improving, axis=1)
            alpha_sel = jnp.where(accepted, jnp.asarray(alphas_np)[idx], 0.0)
            xs_new, us_new, cost_new = replay(
                x0_t, sd_x, us_cur, kK, goal_tiles, alpha_sel[:, None]
            )
            cost_new = cost_new[:, 0]
            # alpha = 0 retraces the nominal trajectory for FINITE gains,
            # but NaN gains (a scenario whose Quu lost positive
            # definiteness) would poison it through 0 * NaN — guard the
            # whole state for rejected scenarios, like the single-problem
            # solver does (fused.py), and the cost against f32 drift.
            keep = accepted[:, None, None]
            xs_new = jnp.where(keep, xs_new, xs_post)
            us_new = jnp.where(keep, us_new, us_cur)
            cost_new = jnp.where(accepted, cost_new, cost_t)
            reg_new = jnp.where(
                accepted,
                jnp.maximum(reg_t / 10.0, 1e-9),
                jnp.minimum(reg_t * 10.0, 1e6),
            )
            return (xs_new, us_new, cost_new, reg_new), None

        reg0 = jnp.full((Bt, _SUB, _LANE), float(reg), jnp.float32)
        (xs_post, us_cur, cost_t, _), _ = jax.lax.scan(
            iteration, (xs_post, us_cur, cost_t, reg0), None, length=iterations
        )
        xs_full = jnp.concatenate(
            [unstage_state(x0_t)[:, None], unstage_seq(xs_post)], axis=1
        )
        cost = cost_t.reshape(Bp)[:B]
        return unstage_seq(us_cur), xs_full, cost

    def solve(x0, us_init, q_goal_new=None):
        """Solve the batch. ``q_goal_new`` (B, n) re-targets every
        scenario WITHOUT recompiling (goals ride a staged argument)."""
        if x0.shape[0] != B:
            raise ValueError(f"x0 batch {x0.shape[0]} != declared batch {B}")
        if q_goal_new is None:
            goal_t = goal_tiles_c
        else:
            g = jnp.asarray(q_goal_new, jnp.float32)
            if g.ndim == 1:  # shared goal, like the build-time path
                g = jnp.broadcast_to(g, (B, n))
            elif g.shape[0] != B:
                raise ValueError(
                    f"q_goal_new batch {g.shape[0]} != declared batch {B}"
                )
            gp = jnp.concatenate([g, jnp.zeros((pad, n), jnp.float32)], axis=0)
            goal_t = stage_state(gp)
        return solve_impl(x0, us_init, goal_t)

    return BatchTrackingMPC(
        solve=solve, horizon=H, n=n, batch=B,
        linearize=linearize, backward=backward,
        linesearch_costs=linesearch_costs, replay=replay,
        solve_impl=solve_impl, goal_default=goal_tiles_c,
    )


def batch_mpc_step(
    mpc: BatchTrackingMPC,
    x: jnp.ndarray,
    us_warm: jnp.ndarray,
    q_goal: Optional[jnp.ndarray] = None,
):
    """One receding-horizon round for a whole fleet: solve all B
    scenarios, return the first controls, and shift the warm starts
    (the batched analogue of :func:`manipulapy_tpu.mpc.ilqr.mpc_step`).

    Returns ``(u_first (B, n), us_warm_next (B, H, n), (us, xs, cost))``.
    ``q_goal`` re-targets every scenario without recompiling.
    """
    us, xs, cost = mpc.solve(x, us_warm, q_goal)
    u_first = us[:, 0]
    us_next = jnp.concatenate([us[:, 1:], us[:, -1:]], axis=1)
    return u_first, us_next, (us, xs, cost)
