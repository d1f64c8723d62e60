"""Witness-queue commitments: the north-star outputs of witness generation.

The reference emits ordered query streams through `VmWitnessTracer` hooks
(SURVEY.md §5.1); a downstream prover commits to them.  This framework defines
the commitment concretely (the reference pins no serialization, so this is the
framework's own pinned spec, applied identically to the golden oracle's stream
and the device queues):

  memory-query record (64 bytes):
      bytes  0..4   timestamp, big-endian u32
      byte   4      memory type (MemoryType enum value)
      bytes  5..9   page, big-endian u32
      bytes  9..13  index, big-endian u32
      byte   13     flags: bit0 rw, bit1 value_is_pointer
      bytes 14..32  zero
      bytes 32..64  value, big-endian u256

  lane commitment  = keccak256(concat(records in emission order))
  block commitment = keccak256(concat(lane commitments in lane order))

The block form makes multi-host aggregation an *ordered fold*: each shard
hashes its lanes locally, shards exchange 32-byte digests (all-gather over
ICI/DCN), and every host folds them in global lane order — sequential
semantics preserved with O(#lanes) bytes of communication (SURVEY.md §5.8).
"""

from __future__ import annotations

import numpy as np

from ..golden.precompiles import keccak256
from ..golden.queries import MemoryQuery


def serialize_memory_query(q: MemoryQuery) -> bytes:
    flags = int(q.rw_flag) | (int(q.value_is_pointer) << 1)
    return (q.timestamp.to_bytes(4, "big")
            + bytes([int(q.memory_type)])
            + q.page.to_bytes(4, "big")
            + q.index.to_bytes(4, "big")
            + bytes([flags])
            + bytes(18)
            + q.value.to_bytes(32, "big"))


def commit_memory_queue(queries: list[MemoryQuery]) -> bytes:
    """Per-lane commitment over the dense, ordered query stream."""
    return keccak256(b"".join(serialize_memory_query(q) for q in queries))


def block_commitment(lane_commitments: list[bytes]) -> bytes:
    return keccak256(b"".join(lane_commitments))


# ---------------------------------------------------------------------------
# Device-queue extraction
# ---------------------------------------------------------------------------

def device_queue_streams(state) -> list[list[MemoryQuery]]:
    """Reconstruct per-lane dense query streams from the device witness queue
    (8-slot blocks with validity bits; see models/batched_vm.py)."""
    from ..golden.queries import MemoryType
    from ..utils import from_limbs

    wq_meta = np.asarray(state.wq_meta)
    wq_value = np.asarray(state.wq_value)
    wq_flags = np.asarray(state.wq_flags)
    B, Q = wq_flags.shape
    streams: list[list[MemoryQuery]] = []
    for b in range(B):
        lane: list[MemoryQuery] = []
        valid = wq_flags[b] & 4
        for s in np.nonzero(valid)[0]:
            ts, mtype, page, index = (int(x) for x in wq_meta[b, s])
            lane.append(MemoryQuery(
                timestamp=ts, memory_type=MemoryType(mtype), page=page,
                index=index, value=from_limbs(wq_value[b, s]),
                value_is_pointer=bool(wq_flags[b, s] & 2),
                rw_flag=bool(wq_flags[b, s] & 1)))
        streams.append(lane)
    return streams


def commit_device_queues(state) -> tuple[list[bytes], bytes]:
    """(per-lane commitments, block commitment) for a batched VM state."""
    lanes = [commit_memory_queue(s) for s in device_queue_streams(state)]
    return lanes, block_commitment(lanes)
