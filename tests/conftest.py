"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding is tested on the host platform (the driver dry-runs
the real multi-chip path separately); set PYFASTANI_TPU_TEST_TPU=1 to run
the suite against real devices instead.
"""

import os

if not os.environ.get("PYFASTANI_TPU_TEST_TPU"):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

# persistent compilation cache: XLA compiles are the dominant test cost
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_pyfastani_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

if not os.environ.get("PYFASTANI_TPU_TEST_TPU"):
    # the axon TPU plugin ignores the JAX_PLATFORMS env var; force via config
    import jax

    jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
