"""Runtime utilities: profiling, performance stats, config flags."""

from .profiling import PerformanceMonitor, benchmark_fn, profile_trace
from .config import configure_cpu_precision, env_flag

__all__ = [
    "PerformanceMonitor",
    "benchmark_fn",
    "profile_trace",
    "configure_cpu_precision",
    "env_flag",
]
