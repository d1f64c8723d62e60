"""Test configuration: force JAX onto CPU with an 8-device virtual mesh.

Real-TPU execution is exercised by bench.py / the driver, not the unit suite;
tests must validate multi-chip sharding without multi-chip hardware
(see the build brief), hence the virtual device count.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
