"""Environment/config flags.

The reference configures itself through ``MANIPULAPY_*`` environment
variables (``SURVEY.md`` section 5: fastmath, CPU forcing, pinned memory,
quiet mode). The TPU framework keeps the same mechanism with a
``MANIPULAPY_TPU_*`` prefix; most reference flags have no TPU counterpart
(no pinned memory, no CUDA probe) and are intentionally absent.

Flags honored:

* ``MANIPULAPY_TPU_X64`` — enable float64 globally (CPU parity runs).
* ``MANIPULAPY_TPU_CACHE_DIR`` — persistent XLA compilation cache dir.
* ``MANIPULAPY_TPU_QUIET`` — suppress any banner output (parity with
  ``MANIPULAPY_QUIET``, reference ``__init__.py:472-475``).
"""

from __future__ import annotations

import os

__all__ = ["env_flag", "configure_cpu_precision", "configure_cache"]


def env_flag(name: str, default: bool = False) -> bool:
    """Parse a boolean environment flag ('1'/'true'/'yes' => True)."""
    val = os.environ.get(name)
    if val is None:
        return default
    return val.strip().lower() in ("1", "true", "yes", "on")


def configure_cpu_precision() -> None:
    """Opt into full-precision f64 math on the CPU backend.

    XLA:CPU's default fast-math lowers f64 inverse-trig/exp to ~1e-7
    approximations (empirically verified on this backend — see
    ``core/lie.py::_acos``). Call before creating any jitted function, or
    set ``XLA_FLAGS=--xla_cpu_enable_fast_math=false`` in the environment.
    """
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_cpu_enable_fast_math" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_cpu_enable_fast_math=false").strip()

    import jax

    jax.config.update("jax_enable_x64", True)


def configure_cache(path: str | None = None) -> None:
    """Enable the persistent XLA compilation cache."""
    import jax

    cache_dir = path or os.environ.get(
        "MANIPULAPY_TPU_CACHE_DIR", os.path.expanduser("~/.cache/manipulapy_tpu_xla")
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
