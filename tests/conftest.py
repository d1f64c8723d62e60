"""Test configuration: force JAX onto CPU with an 8-device virtual mesh.

The image's sitecustomize registers the `axon` PJRT plugin (the tunneled real
TPU chip) and makes it the default backend regardless of JAX_PLATFORMS, so the
env var alone is not enough — `jax.config.update` after import is.  Unit tests
must not run on the tunnel (eager dispatch over it is pathologically slow) and
need 8 virtual CPU devices to exercise multi-chip sharding without multi-chip
hardware.  bench.py is the only entry point that talks to the real chip.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the differential suite compiles one cycle-step
# program per VmConfig (~30-120 s each on XLA:CPU); cached reruns are fast
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu_eravm")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
