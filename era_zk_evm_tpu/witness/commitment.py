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
# Rolling (streaming) commitment — the device-native form
# ---------------------------------------------------------------------------
# One Keccak-f[1600] permutation per query: the 64-byte record is XORed into
# sponge lanes 0..7 (little-endian u64 lanes) and the state permuted.
# Finalization XORs the query count into lane 0 and 0x80<<56 into lane 7,
# permutes once more, and takes the first 32 bytes.  Unlike the dense
# keccak256 form above, this absorbs queries as they are emitted, so the
# device can commit unbounded streams with O(1) memory (no queue arrays).

def _absorb_record(state: list[int], record: bytes) -> list[int]:
    from ..golden.precompiles import keccak_f1600

    st = list(state)
    for k in range(8):
        st[k] ^= int.from_bytes(record[8 * k:8 * k + 8], "little")
    return keccak_f1600(st)


def rolling_commit(queries: list[MemoryQuery]) -> bytes:
    """Host reference for the streaming commitment (device: models layer)."""
    from ..golden.precompiles import keccak_f1600

    state = [0] * 25
    for q in queries:
        state = _absorb_record(state, serialize_memory_query(q))
    state[0] ^= len(queries)
    state[7] ^= 0x80 << 56
    state = keccak_f1600(state)
    return b"".join(state[k].to_bytes(8, "little") for k in range(4))


def device_rolling_commitments(state) -> list[bytes]:
    """Finalize per-lane device sponge states (wc_state/wc_count) to digests."""
    from ..golden.precompiles import keccak_f1600

    wc = np.asarray(state.wc_state)
    counts = np.asarray(state.wc_count)
    out = []
    for b in range(wc.shape[0]):
        st = [int(wc[b, k, 0]) | (int(wc[b, k, 1]) << 32) for k in range(25)]
        st[0] ^= int(counts[b])
        st[7] ^= 0x80 << 56
        st = keccak_f1600(st)
        out.append(b"".join(st[k].to_bytes(8, "little") for k in range(4)))
    return out


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
