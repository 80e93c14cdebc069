"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding is tested on the host platform (the driver dry-runs
the real multi-chip path separately); set PYFASTANI_TPU_TEST_TPU=1 to run
the suite against real devices instead.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if not os.environ.get("PYFASTANI_TPU_TEST_TPU"):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    # the axon TPU plugin ignores the JAX_PLATFORMS env var; force via config
    import jax

    jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: XLA compiles are the dominant test cost
# (env vars are not honored by this jaxlib build -- configure via jax.config)
from pyfastani_tpu.utils.jaxconfig import configure as _configure_jax_cache

_configure_jax_cache()

# build the optional native host extension in place when absent (the .so is
# not committed; one -O3 cc invocation, skipped silently without a compiler)
from pyfastani_tpu import _native as _native_mod

if not _native_mod.HAVE_NATIVE:
    import subprocess

    _repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(
        [sys.executable, "setup.py", "-q", "build_ext", "--inplace"],
        cwd=_repo,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        check=False,
    )
    import importlib

    importlib.reload(_native_mod)
