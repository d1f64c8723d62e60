"""Host-side utilities."""

from .u256_host import (  # noqa: F401
    NUM_LIMBS, batch_from_limbs, batch_to_limbs, from_limbs, to_limbs,
)
