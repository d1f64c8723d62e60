"""Witness machinery: queue commitments and (device) queue reconstruction."""

from .commitment import (  # noqa: F401
    block_commitment, commit_device_queues, commit_memory_queue,
    device_queue_streams, serialize_memory_query,
)
