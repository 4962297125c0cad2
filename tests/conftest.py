"""Test configuration: force CPU with an 8-device virtual mesh.

Multi-chip TPU hardware is not available in CI; sharding tests run on a
virtual CPU mesh exactly as the driver's dryrun does.  The axon TPU plugin
registers itself via sitecustomize and overrides JAX_PLATFORMS, so the
platform is also forced through jax.config before any backend init.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compile cache: jit programs dominate suite wall time on the
# 1-core CI box; warm reruns skip compilation entirely.  min_compile_secs=0
# caches even sub-second programs — the suite compiles hundreds of them.
from waterlily_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache(min_compile_secs=0.0)
