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

import hashlib

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the differential suite compiles one cycle-step
# program per VmConfig (~30-120 s each on XLA:CPU); cached reruns are fast.
# The dir is keyed by the HOST CPU's feature set: XLA:CPU AOT cache entries
# compiled on a different machine (the session hosts vary) load anyway and
# SEGFAULT mid-run (observed; the loader only warns about e.g.
# prefer-no-scatter mismatches before crashing).
try:
    _flags = [ln for ln in open("/proc/cpuinfo") if ln.startswith("flags")]
    _hw = hashlib.sha1(_flags[0].encode()).hexdigest()[:8] if _flags else "na"
except OSError:
    _hw = "na"
jax.config.update("jax_compilation_cache_dir",
                  f"/tmp/jax_cache_tpu_eravm_{_hw}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import pytest  # noqa: E402

_last_module = [None]
_tests_since_clear = [0]


@pytest.fixture(autouse=True)
def _bound_executable_accumulation(request):
    # XLA:CPU segfaults (in executable cache serialization) late in long
    # full-suite runs — position-dependent, never in isolated modules;
    # dropping the in-memory executables at module boundaries (and every
    # 10 tests inside big-kernel modules — observed again within
    # test_fused_cycle once the fused kernel grew) bounds the
    # accumulation (the persistent cache makes re-loads cheap).
    mod = request.module.__name__
    _tests_since_clear[0] += 1
    if (_last_module[0] not in (None, mod)
            or _tests_since_clear[0] >= 10):
        jax.clear_caches()
        _tests_since_clear[0] = 0
    _last_module[0] = mod
    yield
