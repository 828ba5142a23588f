#!/usr/bin/env python3
"""Per-stage profile of the batched fused MPC solver across robot sizes.

Answers VERDICT r4 weak #5: is the 7-DoF+ (n=10 with fingers) fused-batch
tail caused by tile underfill or by the n-scaling of a specific pipeline
stage? Times each exposed Pallas stage (linearize / backward /
linesearch_costs / replay) with an in-program chained difference
quotient, per robot, and prints a stage table + scaling exponents.

Run: ``python tools/profile_fused_batch_stages.py [--robots panda,jaco_7dof]``.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--robots", default="gen3,franka_panda,jaco_6dof,jaco_7dof")
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--horizon", type=int, default=50)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from manipulapy_tpu.models import robot_data
    from manipulapy_tpu.mpc.fused_batch import build_batch_tracking_mpc

    B, H = args.batch, args.horizon
    report = {}
    for key in args.robots.split(","):
        model = robot_data.load_robot(key)
        n = model.num_joints
        nx = 2 * n
        mpc = build_batch_tracking_mpc(
            model, jnp.zeros(n, jnp.float32), batch=B, horizon=H, dt=0.01,
            iterations=4,
        )
        Bt = (B + 1023) // 1024
        SUB, LANE = 8, 128
        x0_t = jnp.zeros((Bt, nx, SUB, LANE), jnp.float32)
        sd_x = jnp.zeros((Bt, H, nx, SUB, LANE), jnp.float32)
        sd_u = jnp.zeros((Bt, H, n, SUB, LANE), jnp.float32)
        kK = jnp.zeros((Bt, H, n, 1 + nx, SUB, LANE), jnp.float32)
        goal_t = mpc.goal_default
        xlast = jnp.zeros((Bt, nx, SUB, LANE), jnp.float32)
        reg_t = jnp.full((Bt, SUB, LANE), 1e-6, jnp.float32)
        alphas = 0.5 ** jnp.arange(6, dtype=jnp.float32)
        zeros_tile = jnp.zeros((Bt, 1, SUB, LANE), jnp.float32)

        stages = {
            "linearize": lambda c: mpc.linearize(sd_x + c, sd_u)[..., :1, :, :].sum(),
            "backward": lambda c: mpc.backward(
                jnp.zeros((Bt, H, nx, nx + n, SUB, LANE), jnp.float32) + c,
                sd_x, sd_u, xlast, goal_t, reg_t,
            ).sum(),
            "linesearch": lambda c: mpc.linesearch_costs(
                x0_t + c, sd_x, sd_u, kK, goal_t, alphas
            ).sum(),
            "replay": lambda c: sum(
                r.sum() for r in mpc.replay(x0_t + c, sd_x, sd_u, kK, goal_t, zeros_tile)
            ),
        }

        row = {"n": n}
        for name, work in stages.items():
            def chain(k):
                @jax.jit
                def run():
                    def body(c, _):
                        return work(1e-12 * c).astype(jnp.float32), None
                    c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=k)
                    return c
                return run

            k1, k2 = 2, 10
            small, large = chain(k1), chain(k2)
            jax.device_get(small())
            jax.device_get(large())

            def best(fn, reps=3):
                b = float("inf")
                for _ in range(reps):
                    t0 = time.perf_counter()
                    jax.device_get(fn())
                    b = min(b, time.perf_counter() - t0)
                return b

            per = (best(large) - best(small)) / (k2 - k1)
            row[name] = round(per * 1e3, 3)

        # whole solve for reference
        x0 = jnp.zeros((B, nx), jnp.float32)
        us0 = jnp.zeros((B, H, n), jnp.float32)
        jax.block_until_ready(mpc.solve(x0, us0))
        t0 = time.perf_counter()
        for _ in range(3):
            r = mpc.solve(x0, us0)
        jax.block_until_ready(r)
        row["full_solve_ms"] = round((time.perf_counter() - t0) / 3 * 1e3, 2)
        report[key] = row
        print(key, row, flush=True)

    ns = np.array([r["n"] for r in report.values()], float)
    print("\nscaling exponents (log-log fit vs n):")
    for s in ("linearize", "backward", "linesearch", "replay"):
        ys = np.array([r[s] for r in report.values()], float)
        if np.all(ys > 0) and len(set(ns)) > 1:
            k = np.polyfit(np.log(ns), np.log(ys), 1)[0]
            print(f"  {s}: ~n^{k:.2f}")
    print(json.dumps(report))


if __name__ == "__main__":
    main()
