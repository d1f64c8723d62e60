"""JAX/Pallas compute kernels: 256-bit limb arithmetic, hash round functions,
queue commitments."""

from . import u256  # noqa: F401
