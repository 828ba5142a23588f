"""Functional `numba` stand-in so the reference's CPU paths import here.

numba is not installed in this environment, but the reference's
``cuda_kernels.py`` / ``path_planning.py`` import it unconditionally
(``path_planning.py:28``) even though their CPU fallbacks are pure NumPy.
The reference's own test suite does the same trick — it mocks
``numba.cuda`` so GPU modules import on CPU-only CI
(``tests/conftest.py:659-667`` in the reference). Installing this stub
(``install()``) lets the parity harness run the reference's *actual* CPU
trajectory/planner code (``cuda_kernels.py:645-713``,
``path_planning.py:146-231``) instead of re-deriving its math.

``njit`` returns the undecorated function (pure-Python semantics are the
compiled semantics) and ``prange`` is ``range``; with
``NUMBA_DISABLE_CUDA=1`` the reference's import-time CUDA probe bails out
before touching ``numba.cuda`` internals and wires its own MockCuda.
"""

from __future__ import annotations

import os
import sys
import types


def install() -> None:
    if "numba" in sys.modules and not getattr(
        sys.modules["numba"], "__manipulapy_tpu_stub__", False
    ):
        return  # real numba present; don't shadow it
    os.environ.setdefault("NUMBA_DISABLE_CUDA", "1")

    numba = types.ModuleType("numba")
    numba.__manipulapy_tpu_stub__ = True
    numba.config = types.SimpleNamespace(
        CUDA_CACHE_SIZE="0", CUDA_LOW_OCCUPANCY_WARNINGS=False, DISABLE_JIT=True
    )

    def njit(*args, **kwargs):
        if args and callable(args[0]):
            return args[0]
        return lambda f: f

    numba.njit = njit
    numba.jit = njit
    numba.prange = range
    numba.float32 = float
    numba.int32 = int

    cuda = types.ModuleType("numba.cuda")
    cuda.is_available = lambda: False

    def _cuda_jit(*args, **kwargs):
        if args and callable(args[0]):
            return args[0]
        return lambda f: f

    cuda.jit = _cuda_jit
    numba.cuda = cuda

    sys.modules["numba"] = numba
    sys.modules["numba.cuda"] = cuda
