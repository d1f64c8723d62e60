"""Mesh + sharding layer (SPMD over transaction contexts)."""

from .mesh import make_mesh, run_block, shard_state  # noqa: F401
