"""Force the CPU backend for host-side experiments/benchmarks.

The shared environment pins JAX to the remote 'axon' TPU tunnel in a way
that survives JAX_PLATFORMS=cpu in the shell env (re-pinned at interpreter
startup); jax.config.update works regardless. Import this before anything
that imports jax.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_cpu_enable_fast_math" not in _flags:
    _flags += " --xla_cpu_enable_fast_math=false"
os.environ["XLA_FLAGS"] = _flags.strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
