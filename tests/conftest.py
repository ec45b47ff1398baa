"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests drive a
jax.sharding.Mesh over 8 virtual CPU devices instead (same GSPMD partitioner
as on a real slice).  Must be set before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override: shell may have JAX_PLATFORMS=axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# the environment's site hook re-registers the axon (TPU) platform even when
# JAX_PLATFORMS=cpu; force the config before any backend initializes
jax.config.update("jax_platforms", "cpu")
# persist XLA compiles across test runs (saves minutes on reruns)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/booster_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
