"""Utilities: timing, throughput (MLUPS) accounting, profiling hooks."""
from .perf import mlups, time_steps, trace_profile
from .cache import enable_compile_cache
