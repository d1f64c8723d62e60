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


def serialize_log_query(q) -> bytes:
    """Log-query record (128 bytes): header + address + key/read/written."""
    flags = int(q.rw_flag) | (int(q.rollback) << 1) | (int(q.is_service) << 2)
    return (q.timestamp.to_bytes(4, "big")
            + bytes([q.aux_byte, q.shard_id, flags])
            + q.tx_number_in_block.to_bytes(2, "big")
            + bytes(3)
            + q.address.to_bytes(20, "big")
            + q.key.to_bytes(32, "big")
            + q.read_value.to_bytes(32, "big")
            + q.written_value.to_bytes(32, "big"))


def commit_log_queue(queries) -> bytes:
    return keccak256(b"".join(serialize_log_query(q) for q in queries))


def serialize_decommittment(q) -> bytes:
    """Decommitment record (64 bytes): hash + page/length/timestamp/fresh."""
    return (q.hash.to_bytes(32, "big")
            + q.timestamp.to_bytes(4, "big")
            + q.memory_page.to_bytes(4, "big")
            + q.decommitted_length.to_bytes(4, "big")
            + bytes([int(q.is_fresh)])
            + bytes(19))


def commit_decommitter_queue(queries) -> bytes:
    return keccak256(b"".join(serialize_decommittment(q) for q in queries))


# ---------------------------------------------------------------------------
# Rolling (streaming) commitment — the device-native form (spec v2,
# rate-packed)
# ---------------------------------------------------------------------------
# Records are absorbed at the standard keccak256 rate (1088 bits / 136
# bytes): each permutation covers TWO 64-byte records — record 2i into
# little-endian u64 lanes 0..7, record 2i+1 into lanes 8..15, then one
# keccak-f[1600] permutation (equivalently: 128-byte rate blocks with the
# final 8 rate bytes reserved).  An odd trailing record waits (already
# XORed in) until finalization.  Finalization XORs `count | 0x80<<56` into
# rate lane 16 — outside the record region, so (records..., count) encode
# injectively — permutes once, and takes the first 32 bytes.  Unlike the
# dense keccak256 form above, this absorbs queries as they are emitted, so
# the device can commit unbounded streams with O(1) memory (no queue
# arrays).
#
# v1 of this spec permuted once PER record (half the rate wasted); the
# permutation count is the dominant cost of committed-mode execution
# (PERF.md round-5), and the reference pins no serialization, so the
# framework's pinned spec uses the full rate.

def rolling_commit(queries: list[MemoryQuery]) -> bytes:
    """Host reference for the streaming commitment (device: models layer)."""
    from ..golden.precompiles import keccak_f1600

    state = [0] * 25
    for r, q in enumerate(queries):
        record = serialize_memory_query(q)
        base = 0 if r % 2 == 0 else 8
        for k in range(8):
            state[base + k] ^= int.from_bytes(record[8 * k:8 * k + 8],
                                              "little")
        if r % 2 == 1:
            state = keccak_f1600(state)
    state[16] ^= len(queries) | (0x80 << 56)
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
        st[16] ^= int(counts[b]) | (0x80 << 56)
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

    # device queues are batch-last ([Q, ..., B]); view as [B, Q, ...]
    wq_meta = np.asarray(state.wq_meta).transpose(2, 0, 1)
    wq_value = np.asarray(state.wq_value).transpose(2, 0, 1)
    wq_flags = np.asarray(state.wq_flags).T
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


def device_log_streams(state) -> list[list]:
    """Reconstruct per-lane log-query streams from the device log queue."""
    from ..golden.queries import LogQuery
    from ..utils import from_limbs

    lq_meta = np.asarray(state.lq_meta)
    lq_addr = np.asarray(state.lq_addr)
    lq_key = np.asarray(state.lq_key)
    lq_read = np.asarray(state.lq_read)
    lq_written = np.asarray(state.lq_written)
    B, LQ = lq_meta.shape[:2]
    out = []
    for b in range(B):
        lane = []
        for s in range(LQ):
            if not lq_meta[b, s, 3]:
                continue
            packed = int(lq_meta[b, s, 1])
            lane.append(LogQuery(
                timestamp=int(lq_meta[b, s, 0]),
                tx_number_in_block=int(lq_meta[b, s, 2]),
                aux_byte=packed & 0xFF,
                shard_id=(packed >> 16) & 0xFF,
                address=sum(int(lq_addr[b, s, i]) << (32 * i) for i in range(5)),
                key=from_limbs(lq_key[b, s]),
                read_value=from_limbs(lq_read[b, s]),
                written_value=from_limbs(lq_written[b, s]),
                rw_flag=bool((packed >> 8) & 1),
                rollback=False,
                is_service=bool((packed >> 9) & 1)))
        out.append(lane)
    return out


def device_decommit_streams(state) -> list[list]:
    from ..golden.queries import DecommittmentQuery
    from ..utils import from_limbs

    dq_meta = np.asarray(state.dq_meta)
    dq_hash = np.asarray(state.dq_hash)
    B, DQ = dq_meta.shape[:2]
    out = []
    for b in range(B):
        lane = []
        for s in range(DQ):
            if not (dq_meta[b, s, 3] & 1):
                continue
            lane.append(DecommittmentQuery(
                hash=from_limbs(dq_hash[b, s]),
                timestamp=int(dq_meta[b, s, 0]),
                memory_page=int(dq_meta[b, s, 1]),
                decommitted_length=int(dq_meta[b, s, 2]),
                is_fresh=bool(dq_meta[b, s, 3] & 2)))
        out.append(lane)
    return out


def device_precompile_streams(state) -> list[list[MemoryQuery]]:
    """Per-lane mem_in/mem_out MemoryQuery streams of every precompile call,
    flattened in call order (mem_in records then mem_out records per call;
    the golden counterpart is `flatten_precompile_calls`)."""
    from ..golden.queries import MemoryType
    from ..utils import from_limbs

    pq_meta = np.asarray(state.pq_meta)
    pq_value = np.asarray(state.pq_value)
    pq_flags = np.asarray(state.pq_flags)
    B, PQ = pq_flags.shape
    streams: list[list[MemoryQuery]] = []
    for b in range(B):
        lane: list[MemoryQuery] = []
        for s in np.nonzero(pq_flags[b] & 4)[0]:
            ts, mtype, page, index = (int(x) for x in pq_meta[b, s])
            lane.append(MemoryQuery(
                timestamp=ts, memory_type=MemoryType(mtype), page=page,
                index=index, value=from_limbs(pq_value[b, s]),
                value_is_pointer=False,
                rw_flag=bool(pq_flags[b, s] & 1)))
        streams.append(lane)
    return streams


def device_precompile_rounds(state, config) -> list[list[int]]:
    """Per-lane round counts (PrecompileCyclesWitness equivalent), one per
    call, read from each block's first output slot (flags bits 3+)."""
    from ..models.state import precompile_queue_slots

    ps_in, ps_out = precompile_queue_slots(config)
    ps = ps_in + ps_out
    pq_flags = np.asarray(state.pq_flags)
    out = []
    for b in range(pq_flags.shape[0]):
        rounds = []
        for base in range(0, pq_flags.shape[1] - ps + 1, ps):
            f = int(pq_flags[b, base + ps_in])
            if f & 4:
                rounds.append(f >> 3)
        out.append(rounds)
    return out


def flatten_precompile_calls(precompile_calls) -> list[MemoryQuery]:
    """Golden-side counterpart: tracer PrecompileCallResult list -> the dense
    per-lane stream (mem_in then mem_out per call, call order)."""
    stream: list[MemoryQuery] = []
    for call in precompile_calls:
        stream.extend(call.mem_in)
        stream.extend(call.mem_out)
    return stream


def commit_precompile_queue(queries: list[MemoryQuery]) -> bytes:
    """Same 64-byte record serialization as the memory queue."""
    return keccak256(b"".join(serialize_memory_query(q) for q in queries))


def commit_device_queues(state) -> tuple[list[bytes], bytes]:
    """(per-lane memory-queue commitments, block commitment)."""
    lanes = [commit_memory_queue(s) for s in device_queue_streams(state)]
    return lanes, block_commitment(lanes)


def commit_all_device_queues(state) -> dict:
    """All three queue families committed per lane + folded per block."""
    mem = [commit_memory_queue(s) for s in device_queue_streams(state)]
    logs = [commit_log_queue(s) for s in device_log_streams(state)]
    dec = [commit_decommitter_queue(s) for s in device_decommit_streams(state)]
    out = {
        "memory_lanes": mem, "memory_block": block_commitment(mem),
        "log_lanes": logs, "log_block": block_commitment(logs),
        "decommitter_lanes": dec, "decommitter_block": block_commitment(dec),
    }
    if state.pq_flags.shape[1] > 0:
        pre = [commit_precompile_queue(s)
               for s in device_precompile_streams(state)]
        out["precompile_lanes"] = pre
        out["precompile_block"] = block_commitment(pre)
    return out
