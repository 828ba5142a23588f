"""Polynomial time-scaling profiles (cubic / quintic / linear).

Behavioural twin of the reference's scaling math — the formulas every
trajectory kernel evaluates per element (``ManipulaPy/cuda_kernels.py:
805-826``, ``ManipulaPy/utils.py:566-591``) — as one vectorized function of
the normalized time ``tau = t / Tf``:

* cubic  (method=3):  ``s = 3 tau^2 - 2 tau^3``
* quintic (method=5): ``s = 10 tau^3 - 15 tau^4 + 6 tau^5``
* linear (other):     ``s = tau``

Derivatives are returned with respect to *real* time (divided by ``Tf`` and
``Tf^2``), matching the kernels. Degenerate inputs (``N <= 1`` or
``Tf <= 0``) collapse to "sit at start" with zero rates, matching the
reference's guard (``cuda_kernels.py:676-680``).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["time_scaling", "scaling_profile", "CUBIC", "QUINTIC", "LINEAR"]

CUBIC = 3
QUINTIC = 5
LINEAR = 1


def time_scaling(tau: jnp.ndarray, Tf, method: int):
    """Evaluate (s, s_dot, s_ddot) at normalized times ``tau`` in [0, 1].

    ``method`` is a static Python int (3, 5, or anything else for linear),
    selecting the polynomial at trace time like the kernels' compile-time
    dispatch.
    """
    Tf = jnp.asarray(Tf, dtype=tau.dtype)
    # Guarded divisor: degenerate Tf <= 0 zeroes everything below anyway.
    Tf_safe = jnp.where(Tf > 0, Tf, jnp.ones_like(Tf))
    if method == CUBIC:
        s = 3.0 * tau**2 - 2.0 * tau**3
        s_dot = 6.0 * tau * (1.0 - tau) / Tf_safe
        s_ddot = 6.0 * (1.0 - 2.0 * tau) / (Tf_safe * Tf_safe)
    elif method == QUINTIC:
        tau2 = tau * tau
        tau3 = tau2 * tau
        tau4 = tau2 * tau2
        s = 10.0 * tau3 - 15.0 * tau4 + 6.0 * tau4 * tau
        s_dot = (30.0 * tau2 - 60.0 * tau3 + 30.0 * tau4) / Tf_safe
        s_ddot = (60.0 * tau - 180.0 * tau2 + 120.0 * tau3) / (Tf_safe * Tf_safe)
    else:
        s = tau
        s_dot = jnp.ones_like(tau) / Tf_safe
        s_ddot = jnp.zeros_like(tau)
    # Degenerate-duration guard (reference cuda_kernels.py:676-680).
    ok = Tf > 0
    zero = jnp.zeros_like(tau)
    return (
        jnp.where(ok, s, zero),
        jnp.where(ok, s_dot, zero),
        jnp.where(ok, s_ddot, zero),
    )


def scaling_profile(Tf, N: int, method: int, dtype=jnp.float32):
    """(s, s_dot, s_ddot) sampled at ``N`` uniform points over [0, Tf].

    ``tau_t = t / (N - 1)`` exactly as the kernels index time
    (``cuda_kernels.py:804``); ``N <= 1`` collapses to zeros.
    """
    if N <= 1:
        zero = jnp.zeros((max(N, 0),), dtype=dtype)
        return zero, zero, zero
    tau = jnp.linspace(0.0, 1.0, N, dtype=dtype)
    return time_scaling(tau, Tf, method)
