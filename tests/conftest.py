"""Test configuration for the TPU-native framework.

Mirrors the role of the reference's conftest "smart mocking"
(``/root/reference/tests/conftest.py``): the reference fakes CUDA/pybullet
so GPU code paths are exercised on CPU-only CI. Here the analogue is a
*virtual device mesh*: tests force the CPU platform with 8 virtual XLA
devices (``xla_force_host_platform_device_count``) so every sharding /
multi-chip code path compiles and executes without TPU hardware, and
enable x64 so parity tolerances match the reference's float64 CPU oracle.
"""

import os

# Must be set before jax import.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags += " --xla_force_host_platform_device_count=8"
if "xla_cpu_enable_fast_math" not in _flags:
    # XLA:CPU's fast-math lowers f64 inverse-trig/exp to ~1e-7-accurate
    # approximations, breaking the reference-grade parity tolerances
    # (verified empirically on this backend; see core/lie.py::_acos).
    _flags += " --xla_cpu_enable_fast_math=false"
os.environ["XLA_FLAGS"] = _flags.strip()
# Force (not setdefault): the shared environment pins JAX_PLATFORMS=axon
# (the remote TPU tunnel) — on it, every compile is an HTTP round trip and
# f64 support is partial. Tests are a CPU/f64/virtual-mesh workload.
os.environ["JAX_PLATFORMS"] = "cpu"
# Persistent compilation cache: the test suite compiles hundreds of small
# programs; caching makes reruns fast on this 2-vCPU host.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax  # noqa: E402

# The env var above is only read when jax's config module first loads; if a
# pytest plugin imported jax before this conftest, it saw the terminal's
# JAX_PLATFORMS=axon. config.update works regardless of import order.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(42)


@pytest.fixture(scope="session")
def ur5():
    import jax.numpy as jnp
    from manipulapy_tpu.models import catalog

    return catalog.ur5(dtype=jnp.float64)


@pytest.fixture(scope="session")
def planar2():
    import jax.numpy as jnp
    from manipulapy_tpu.models import catalog

    return catalog.two_link_planar(dtype=jnp.float64)
