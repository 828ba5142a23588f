"""Shared benchmark infrastructure: timing, environment capture, JSON
artifacts, and regression comparison.

The reference's benchmarks time CUDA kernels with warm-up launches and
write JSON result artifacts (``Benchmark/quick_benchmark.py``,
``Benchmark/ik_branch_benchmark_results.json``); the XLA equivalents are
compile-excluded steady-state timing (first call = compile) and
``block_until_ready`` fencing.
"""

from __future__ import annotations

import json
import os
import platform
import time
from dataclasses import asdict, dataclass, field
from typing import Any, Callable, Dict, List, Optional

import jax


def setup_backend(prefer: Optional[str] = None) -> str:
    """Select the benchmark backend.

    Defaults to whatever jax resolves (the real TPU chip when tunnelled);
    ``prefer='cpu'`` forces CPU (accuracy benchmarks want f64 + CPU).
    Returns the backend name actually in use.
    """
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    if prefer == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass  # backend already initialized
    return jax.default_backend()


def enable_x64() -> None:
    jax.config.update("jax_enable_x64", True)


@dataclass
class Timing:
    """Steady-state timing of one jitted workload."""

    name: str
    compile_s: float
    mean_s: float
    min_s: float
    sustained_s: float  # per-call time with pipelined dispatch (one fence)
    iters: int
    throughput: Optional[float] = None  # items/s at the sustained rate
    latency_throughput: Optional[float] = None  # items/s fenced per call
    extra: Dict[str, Any] = field(default_factory=dict)


def time_fn(
    name: str,
    fn: Callable[[], Any],
    *,
    iters: int = 10,
    items_per_call: Optional[float] = None,
    **extra,
) -> Timing:
    """Warm-up (compile) + timed steady-state runs, fenced with
    ``block_until_ready`` — the XLA analogue of the reference's
    warm-up-launch-then-cuda.synchronize timing
    (``cuda_kernels.py:2129-2208``)."""
    t0 = time.perf_counter()
    jax.block_until_ready(fn())
    compile_s = time.perf_counter() - t0

    # Per-call latency: fence every call (includes host<->device round trip —
    # on a tunnelled chip this floor can dominate small workloads).
    times: List[float] = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        times.append(time.perf_counter() - t0)
    mean_s = sum(times) / len(times)

    # Sustained rate: pipeline all dispatches, fence once — what a real
    # batch/streaming workload sees.
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    sustained_s = (time.perf_counter() - t0) / iters

    return Timing(
        name=name,
        compile_s=compile_s,
        mean_s=mean_s,
        min_s=min(times),
        sustained_s=sustained_s,
        iters=iters,
        throughput=(items_per_call / sustained_s) if items_per_call else None,
        latency_throughput=(items_per_call / mean_s) if items_per_call else None,
        extra=extra,
    )


def device_latency(
    name: str,
    chain_fn: Callable[[int], Callable[[], Any]],
    *,
    k_small: int = 4,
    k_large: int = 20,
    items_per_call: Optional[float] = None,
    reps: int = 3,
    **extra,
) -> Timing:
    """True on-device per-iteration latency via in-program repetition.

    ``chain_fn(k)`` must return a jitted 0-arg callable whose program runs
    the workload ``k`` times *sequentially with a data dependence* (e.g. a
    ``lax.scan`` feeding each solve's output into the next solve's input)
    and returns a scalar. Timing forces a host readback of that scalar, so
    the fixed host<->device round trip — ~24 ms through the axon tunnel,
    and the reason naive per-call timing is meaningless here — cancels in
    the difference quotient (T(k_large) - T(k_small)) / (k_large - k_small).

    This is the measurement the reference gets for free from
    ``cuda.synchronize()`` on a local GPU (``cuda_kernels.py:2129-2208``);
    on a remote-tunnelled TPU it has to be amortized explicitly.
    """

    def _readback(fn):
        t0 = time.perf_counter()
        jax.device_get(fn())
        first = time.perf_counter() - t0
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.device_get(fn())
            best = min(best, time.perf_counter() - t0)
        return first, best

    if k_large <= k_small:
        raise ValueError(f"k_large ({k_large}) must exceed k_small ({k_small})")
    small = chain_fn(k_small)
    large = chain_fn(k_large)
    compile_s, t_small = _readback(small)
    _, t_large = _readback(large)
    raw = (t_large - t_small) / (k_large - k_small)
    # A non-positive quotient means tunnel jitter swamped the measurement —
    # never report it as a (spuriously tiny) latency.
    suspect = raw <= 0
    if suspect:
        import warnings

        warnings.warn(
            f"device_latency[{name}]: t_large ({t_large:.4f}s) <= t_small "
            f"({t_small:.4f}s); round-trip jitter exceeded the chained work. "
            "Reporting NaN — increase k_large or reps."
        )
    per_iter = float("nan") if suspect else raw
    finite = not suspect
    return Timing(
        name=name,
        compile_s=compile_s,
        mean_s=per_iter,
        min_s=per_iter,
        sustained_s=per_iter,
        iters=k_large - k_small,
        throughput=(items_per_call / per_iter) if (items_per_call and finite) else None,
        latency_throughput=(items_per_call / per_iter) if (items_per_call and finite) else None,
        extra={**extra, "method": "in-program difference quotient",
               "t_small_s": t_small, "t_large_s": t_large,
               "k_small": k_small, "k_large": k_large, "suspect": suspect},
    )


def scalar_chain(work: Callable[[Any], Any]) -> Callable[[int], Callable[[], Any]]:
    """Adapt a stateless workload to :func:`device_latency`'s contract.

    ``work(c)`` must run the workload once and return a scalar that
    depends on its outputs, where ``c`` is a carried f32 scalar the
    caller should fold into an input at negligible magnitude (e.g.
    ``q0 + 1e-12 * c``) so consecutive repetitions form a true data
    chain XLA cannot collapse, hoist, or overlap. Returns the
    ``chain_fn(k)`` factory device_latency expects.
    """
    import jax.numpy as jnp

    def chain(k: int) -> Callable[[], Any]:
        @jax.jit
        def run():
            def body(c, _):
                return work(c), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=k)
            return c

        return run

    return chain


def inline_chain(step: Callable[[Any], Any], init: Any) -> Callable[[int], Callable[[], Any]]:
    """chain_fn factory for :func:`device_latency` that UNROLLS the chain
    in Python instead of wrapping it in ``lax.scan``.

    ``step(carry) -> carry`` runs the workload once; ``init`` is the first
    carry (a pytree of arrays). The returned program folds the carry to a
    scalar so timing forces a readback.

    Why not ``scalar_chain``/``lax.scan``: scanning over a body that itself
    contains Pallas kernels or nested scans (the fused MPC solver) blows up
    XLA compile time unboundedly — the round-2 MPC harness never finished
    compiling. Inline unrolling with small k (1 vs 5) compiles in seconds
    because each repetition reuses the already-lowered inner jit.
    """
    import jax.numpy as jnp

    def chain(k: int) -> Callable[[], Any]:
        @jax.jit
        def run():
            carry = init
            for _ in range(k):
                carry = step(carry)
            leaves = jax.tree_util.tree_leaves(carry)
            return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

        return run

    return chain


def dispatch_floor(reps: int = 30) -> Dict[str, float]:
    """Measured host<->device overheads of THIS session's tunnel: blocked
    round-trip latency and pipelined per-dispatch throughput of a trivial
    jitted op. Recorded in artifacts so a reader can tell how much of any
    blocked timing is tunnel, not device (the axon tunnel's round trip has
    been observed anywhere from 0.05 ms to ~24 ms across sessions)."""
    import jax.numpy as jnp

    @jax.jit
    def tiny(x):
        return x + 1.0

    x = jnp.zeros((8, 128), jnp.float32)
    jax.block_until_ready(tiny(x))
    blocked = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(tiny(x))
        blocked.append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    out = None
    for _ in range(reps * 4):
        out = tiny(x)
    jax.block_until_ready(out)
    pipelined = (time.perf_counter() - t0) / (reps * 4)
    return {
        "blocked_round_trip_ms": min(blocked) * 1e3,
        "pipelined_dispatch_ms": pipelined * 1e3,
    }


def environment_info() -> Dict[str, Any]:
    return {
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
        "jax_version": jax.__version__,
        "python": platform.python_version(),
        "platform": platform.platform(),
    }


def write_artifact(path: str, payload: Dict[str, Any]) -> str:
    """Write a JSON result artifact (reference commits these, e.g.
    ``Benchmark/ik_branch_benchmark_results.json``)."""
    payload = dict(payload)
    payload.setdefault("environment", environment_info())
    payload.setdefault("timestamp", time.strftime("%Y-%m-%dT%H:%M:%S"))
    with open(path, "w") as f:
        json.dump(payload, f, indent=2, default=_json_default)
    return path


def _json_default(o):
    if isinstance(o, Timing):
        return asdict(o)
    try:
        import numpy as np

        if isinstance(o, (np.floating, np.integer)):
            return o.item()
        if isinstance(o, np.ndarray):
            return o.tolist()
    except ImportError:
        pass
    return str(o)


def compare_to_previous(path: str, results: Dict[str, float], tol: float = 0.25):
    """Regression check against a previous artifact: flags metrics that
    regressed by more than ``tol`` fractionally (the reference's
    quick-benchmark regression detection, ``Benchmark/quick_benchmark.py``).

    Returns (regressions, previous) — empty when no previous artifact.
    """
    if not os.path.exists(path):
        return [], None
    with open(path) as f:
        prev = json.load(f)
    prev_metrics = prev.get("metrics", {})
    regressions = []
    for k, v in results.items():
        pv = prev_metrics.get(k)
        if pv is None or not isinstance(pv, (int, float)) or pv <= 0:
            continue
        # Larger-is-better metrics named *_per_s; smaller-is-better else.
        if k.endswith("_per_s"):
            if v < pv * (1 - tol):
                regressions.append({"metric": k, "previous": pv, "current": v})
        else:
            if v > pv * (1 + tol):
                regressions.append({"metric": k, "previous": pv, "current": v})
    return regressions, prev
