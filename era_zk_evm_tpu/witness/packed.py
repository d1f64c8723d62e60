"""Packed witness streams: device serialization + device commitments.

The object path (commitment.device_*_streams -> Python query objects ->
golden keccak256 in _COMMITTERS) costs per-QUERY host Python — a pure-
Python keccak permutation every 136 bytes dwarfs device time on any
production-size block (VERDICT r3 weakness #3).  This module keeps the
whole hot path in arrays:

  * record-word serializers (jitted): each queue family's device arrays ->
    the PINNED per-record byte layouts of witness/commitment.py
    (serialize_memory_query / serialize_log_query / serialize_decommittment),
    expressed as little-endian u32 words — the exact flat word stream whose
    bytes keccak absorbs, so digests computed from these words equal the
    host commitments bit-for-bit.
  * `drain_witness_queues_packed` — the packed drain: one device
    serialization + one host transfer per family, then the same queue
    rewind as models/spill.drain_witness_queues.  No Python objects.
  * `split_records_by_lane` — vectorized ragged extraction (no per-query
    loop): per-lane [n_b, W] record arrays from one np.nonzero + np.split.
  * `commit_packed_streams` — per-tx dense keccak256 commitments computed
    ON DEVICE over ragged record streams, bucketed by padded block count
    so a handful of compiled sponge variants cover any block.
  * `packed_grand_products` — per-tx sorted-log-queue grand products: one
    batched device keccak over every record (the sorted_queue fingerprint
    spec), then O(1) host mulmods per record.  The product is multiset-
    invariant, so the unsorted emission-order stream yields the sorted
    stream's product (witness/sorted_queue.py spec).

Object materialization (`queries_from_packed`) exists for consumers who
want the reference's query structs — it is NOT on the hot path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.goldilocks import GOLDILOCKS_P
from ..ops.keccak import keccak_f1600_array

U32 = jnp.uint32

#: record width in u32 words per family (the pinned serializations)
RECORD_WORDS = {"memory": 16, "log": 32, "decommit": 16, "precompile": 16}


def _bswap(x):
    x = x.astype(U32)
    return ((x & 0xFF) << 24) | ((x & 0xFF00) << 8) \
        | ((x >> 8) & 0xFF00) | (x >> 24)


# ---------------------------------------------------------------------------
# Device record serializers (all return (words u32[B, Q, W], valid bool[B, Q]))
# ---------------------------------------------------------------------------

def memory_record_words(state):
    """serialize_memory_query as LE u32 words from the batch-last wq arrays."""
    meta = jnp.transpose(state.wq_meta, (2, 0, 1))    # [B, Q, 4]
    value = jnp.transpose(state.wq_value, (2, 0, 1))  # [B, Q, 8]
    flags = jnp.transpose(state.wq_flags, (1, 0))     # [B, Q]
    return _memory_like_words(meta, value, flags & 3), (flags & 4) != 0


def precompile_record_words(state):
    """Precompile queue: same 64-byte record as the memory queue
    (value_is_pointer always False; flags bits 3+ hold round counts)."""
    meta, value, flags = state.pq_meta, state.pq_value, state.pq_flags
    return _memory_like_words(meta, value, flags & 1), (flags & 4) != 0


def _memory_like_words(meta, value, flag_byte):
    ts, mtype, page, index = (meta[..., i] for i in range(4))
    words = [
        _bswap(ts),
        mtype | ((page >> 24) << 8) | (((page >> 16) & 0xFF) << 16)
        | (((page >> 8) & 0xFF) << 24),
        (page & 0xFF) | ((index >> 24) << 8) | (((index >> 16) & 0xFF) << 16)
        | (((index >> 8) & 0xFF) << 24),
        (index & 0xFF) | (flag_byte.astype(U32) << 8),
    ]
    z = jnp.zeros_like(ts)
    words += [z, z, z, z]
    words += [_bswap(value[..., 7 - i]) for i in range(8)]
    return jnp.stack(words, axis=-1)


def log_record_words(state):
    """serialize_log_query (128 bytes) as LE u32 words (the unpadded form
    of sorted_queue.log_queue_blocks)."""
    meta, addr = state.lq_meta, state.lq_addr
    key, read, written = state.lq_key, state.lq_read, state.lq_written
    ts = meta[..., 0]
    packed = meta[..., 1]
    tx = meta[..., 2]
    aux = packed & 0xFF
    rw = (packed >> 8) & 1
    svc = (packed >> 9) & 1
    shard = (packed >> 16) & 0xFF
    flags = rw | (svc << 2)   # rollback bit 1 never set in device queues
    words = [
        _bswap(ts),
        aux | (shard << 8) | (flags << 16) | (((tx >> 8) & 0xFF) << 24),
        tx & 0xFF,
    ]
    words += [_bswap(addr[..., 4 - i]) for i in range(5)]
    for arr in (key, read, written):
        words += [_bswap(arr[..., 7 - i]) for i in range(8)]
    return jnp.stack(words, axis=-1), meta[..., 3] != 0


def decommit_record_words(state):
    """serialize_decommittment (64 bytes) as LE u32 words."""
    meta, h = state.dq_meta, state.dq_hash
    ts, page, length = meta[..., 0], meta[..., 1], meta[..., 2]
    fresh = (meta[..., 3] >> 1) & 1
    words = [_bswap(h[..., 7 - i]) for i in range(8)]
    words += [_bswap(ts), _bswap(page), _bswap(length), fresh.astype(U32)]
    z = jnp.zeros_like(ts)
    words += [z, z, z, z]
    return jnp.stack(words, axis=-1), (meta[..., 3] & 1) != 0


@partial(jax.jit, static_argnames=("families",))
def _serialize_all(state, families: tuple):
    out = {}
    fns = {"memory": memory_record_words, "log": log_record_words,
           "decommit": decommit_record_words,
           "precompile": precompile_record_words}
    for name in families:
        out[name] = fns[name](state)
    return out


@partial(jax.jit, static_argnames=("families", "budget_frac"))
def _serialize_all_compact(state, families: tuple, budget_frac: float):
    """Like _serialize_all, but each family's dense [B, Q, W] record block
    is COMPACTED on device to (rows u32[budget, W], lane_counts i32[B],
    count i32): valid rows scattered to the front in (lane, slot) order.

    Why: the dense drain ships mostly invalid padding — measured 175 MB/
    round against ~25 MB of real records on the storage/event block
    workload, and the host link (a tunnel here, PCIe in production) is
    the block pipeline's binding resource.  `budget = ceil(B*Q*
    budget_frac)` rows are transferred; `count` must be checked against
    the budget by the caller (an overflow means dropped records — same
    caller-sized-capacity contract as the queues themselves).

    SINGLE-DEVICE ONLY: the cumsum-position `.at[pos].set` scatter over
    the B-flattened block silently miscompiles under the GSPMD
    partitioner on a batch-SHARDED state (the CLAUDE.md `.at[].set`
    gotcha, observed on the block-commitment fold) — the dp-mesh drain
    path must use the dense `_serialize_all` form (asserted in
    drain_witness_queues_packed_async)."""
    dense = _serialize_all(state, families)
    fracs = dict(budget_frac) if isinstance(budget_frac, tuple) \
        else {name: budget_frac for name in dense}
    out = {}
    for name, (words, valid) in dense.items():
        B, Q, W = words.shape
        budget = max(1, int(B * Q * fracs[name]))
        flat_w = words.reshape(B * Q, W)
        flat_v = valid.reshape(B * Q)
        pos = jnp.cumsum(flat_v) - 1                    # stable, lane-major
        pos = jnp.where(flat_v, pos, budget)            # invalid -> dropped
        rows = jnp.zeros((budget + 1, W), U32).at[pos].set(
            flat_w, mode="drop")
        out[name] = (rows[:budget],
                     valid.sum(axis=1).astype(jnp.int32),
                     flat_v.sum().astype(jnp.int32))
    return out


def _queue_families(config) -> tuple:
    return tuple(name for name, cap in (
        ("memory", config.queue_capacity),
        ("log", config.log_queue_capacity),
        ("decommit", config.decommit_queue_capacity),
        ("precompile", config.precompile_queue_capacity)) if cap > 0)


def drain_witness_queues_packed_async(state, config, compact_frac=None):
    """Non-blocking packed drain: (state, packed) with host copies started
    and the queues rewound; the caller resolves the arrays later
    (np.asarray) — the scheduler's deferred-finalization path enqueues
    drains without ever stalling the round loop on a tunnel round-trip.

    packed is {family: (words [B, Q, W], valid [B, Q])}, or with
    `compact_frac` set, {family: (rows [budget, W], lane_counts [B],
    count)} — device-compacted to cut the host-link volume by the queue
    fill ratio (see _serialize_all_compact; resolve with
    split_compacted_by_lane, which also enforces the budget).
    `compact_frac` may be a float (all families) or a {family: frac}
    dict — families fill at very different rates (a log-heavy workload
    measured ~33% log fill vs ~5% memory fill per drain), and one budget
    either overflows the hot family or ships pure padding for the
    cold ones."""
    from ..models.spill import _rewind_queues_jit

    families = _queue_families(config)
    if compact_frac is None:
        packed = _serialize_all(state, families)
    else:
        if isinstance(compact_frac, dict):
            compact_frac = tuple(sorted(
                (name, float(compact_frac[name])) for name in families))
        sharding = getattr(state.wq_meta, "sharding", None)
        assert sharding is None or len(sharding.device_set) == 1, (
            "compact_frac on a batch-sharded state: the compaction "
            "scatter miscompiles under GSPMD (see _serialize_all_compact)"
        )
        packed = _serialize_all_compact(state, families, compact_frac)
        # compact mode: DON'T start the rows transfer — the budget array
        # is mostly padding, and the caller can slice rows[:count] once
        # the (tiny, async-copied) count arrives, shipping only real
        # records (fetch_compacted_rows).  Async-copy the counts only.
        for _rows, lane_counts, count in packed.values():
            for leaf in (lane_counts, count):
                try:
                    leaf.copy_to_host_async()
                except AttributeError:  # pragma: no cover
                    pass
        return _rewind_queues_jit(state), packed
    for leaf in jax.tree.leaves(packed):
        try:
            leaf.copy_to_host_async()
        except AttributeError:  # pragma: no cover — older jax.Array impls
            pass
    return _rewind_queues_jit(state), packed


def fetch_compacted_rows(packed: dict) -> dict:
    """Resolve a compacted drain to host numpy, transferring only the
    valid rows: {family: (rows [>=count, W], lane_counts [B], count)}.

    The row count is bucketed to the next power of two (a bounded set of
    sliced-shape programs instead of one per distinct count) and clipped
    to the budget; overflow (count > budget: records were dropped on
    device) raises HERE — earlier than the end-of-block resolve."""
    out = {}
    for name, (rows, lane_counts, count) in packed.items():
        c = int(np.asarray(count))
        budget = rows.shape[0]
        if c > budget:
            raise RuntimeError(
                f"compacted drain overflow ({name}): {c} valid records "
                f"vs a {budget}-row transfer budget — raise "
                "drain_compact_frac")
        n = 1
        while n < max(c, 1):
            n *= 2
        n = min(n, budget)
        out[name] = (np.asarray(rows[:n]), np.asarray(lane_counts),
                     np.int32(c))
    return out


def drain_witness_queues_packed(state, config):
    """The packed drain: (state, {family: (words u32[B, Q, W], valid
    bool[B, Q]) as numpy}) with the queues rewound — the array counterpart
    of models/spill.drain_witness_queues (same families, same rewind)."""
    state, packed = drain_witness_queues_packed_async(state, config)
    return state, jax.device_get(packed)


def split_records_by_lane(words: np.ndarray, valid: np.ndarray) -> list:
    """[B, Q, W] + [B, Q] -> per-lane [n_b, W] arrays, slot order preserved
    (= emission order).  One np.nonzero + one np.split; no per-query loop."""
    counts = valid.sum(axis=1)
    rows = words[valid]                      # ordered by (lane, slot)
    return np.split(rows, np.cumsum(counts)[:-1])


def split_compacted_by_lane(rows: np.ndarray, lane_counts: np.ndarray,
                            count: int) -> list:
    """Compacted-drain counterpart of split_records_by_lane.  Raises if the
    drain's row budget overflowed (records were dropped on device — the
    caller must raise compact_frac, exactly like sizing queue capacity)."""
    if count > rows.shape[0]:
        raise RuntimeError(
            f"compacted drain overflow: {count} valid records vs a "
            f"{rows.shape[0]}-row transfer budget — raise compact_frac")
    assert int(lane_counts.sum()) == count
    return np.split(rows[:count], np.cumsum(lane_counts)[:-1])


# ---------------------------------------------------------------------------
# Device commitments over ragged packed streams
# ---------------------------------------------------------------------------

#: padded-block-count buckets (powers of two) — one compiled sponge per
#: bucket level actually used, instead of one per distinct stream length
def _block_bucket(n_blocks: int) -> int:
    b = 1
    while b < n_blocks:
        b *= 2
    return b


@partial(jax.jit, static_argnames=("n_blocks",))
def _absorb_ragged(blocks, nb_valid, n_blocks: int):
    """Sponge over [T, n_blocks, 34] rate blocks where row t only absorbs
    its first nb_valid[t] blocks (the rest are bucket padding)."""
    def body(carry, x):
        blk, k = x                           # [T, 34], scalar step index
        lanes = jnp.concatenate(
            [blk.reshape(blk.shape[0], 17, 2),
             jnp.zeros((blk.shape[0], 8, 2), U32)], axis=1)
        nxt = keccak_f1600_array(carry ^ lanes)
        keep = (k < nb_valid)[:, None, None]
        return jnp.where(keep, nxt, carry), None

    st0 = jnp.zeros((blocks.shape[0], 25, 2), U32)
    xs = (jnp.transpose(blocks, (1, 0, 2)), jnp.arange(n_blocks))
    st, _ = jax.lax.scan(body, st0, xs)
    return st[:, :4, :].reshape(blocks.shape[0], 8)


def commit_packed_streams(streams: list[np.ndarray]) -> list[bytes]:
    """Per-stream keccak256 over the concatenated records — bit-equal to
    commitment.commit_*_queue on the object streams.  All permutations run
    on device; host work is one memcpy + 2 pad writes per stream."""
    digests: list[bytes | None] = [None] * len(streams)
    by_bucket: dict[int, list[int]] = {}
    blocks_of = []
    for i, rec in enumerate(streams):
        total_words = int(rec.size)
        nb = (total_words * 4) // 136 + 1
        blocks_of.append(nb)
        by_bucket.setdefault(_block_bucket(nb), []).append(i)
    for bucket, idxs in sorted(by_bucket.items()):
        T = len(idxs)
        data = np.zeros((T, bucket * 34), dtype=np.uint32)
        nbs = np.zeros((T,), dtype=np.int32)
        for j, i in enumerate(idxs):
            flat = np.ascontiguousarray(streams[i], dtype=np.uint32).reshape(-1)
            nb = blocks_of[i]
            data[j, :flat.size] = flat
            data[j, flat.size] ^= 0x01
            data[j, nb * 34 - 1] ^= 0x80000000
            nbs[j] = nb
        rows = np.asarray(_absorb_ragged(
            jnp.asarray(data.reshape(T, bucket, 34)), jnp.asarray(nbs),
            bucket))
        for j, i in enumerate(idxs):
            digests[i] = b"".join(int(w).to_bytes(4, "little")
                                  for w in rows[j])
    return digests


def fold_digests_device(digests: list[bytes]) -> bytes:
    """block_commitment (keccak256 over concatenated 32-byte digests) on
    device — one ragged-sponge call at T=1."""
    if not digests:
        from .device_fold import keccak256_device_stream

        return bytes(np.asarray(
            jax.jit(keccak256_device_stream)(jnp.zeros((0, 8), U32)))
            .astype("<u4").tobytes())
    rows = np.stack([np.frombuffer(d, dtype="<u4") for d in digests])
    return commit_packed_streams([rows.reshape(len(digests), 8)])[0]


# ---------------------------------------------------------------------------
# Per-tx grand products from packed log records
# ---------------------------------------------------------------------------

#: record count from which the bit-sliced keccak kernel beats the jnp
#: HBM-streamed form (needs >=32 states per u32 slot x a dense (8, G8)
#: plane row; 32768 = G8 128, the kernel's efficient floor)
_BITSLICE_MIN_RECORDS = 32768


@partial(jax.jit, static_argnames=())
def _fingerprints_device(records):
    """[N, 32] packed log records -> Goldilocks fingerprints (lo, hi) u32[N]
    (keccak of the 128-byte record, first 8 digest bytes LE, reduced).

    One single-block sponge absorb per record.  Production-size blocks
    (N >= 32768, a multiple of 256) take the bit-sliced kernel (~27x the
    jnp form, PERF.md keccak audit); small batches stay on the jnp path
    (the bit-plane transposes don't amortize under 32 states/slot)."""
    from ..ops.goldilocks import gl_reduce64

    n = records.shape[0]
    pad01 = jnp.full((n, 1), 0x01, U32)
    pad80 = jnp.full((n, 1), 0x80000000, U32)
    blocks = jnp.concatenate([records, pad01, pad80], axis=1)
    lanes = jnp.concatenate(
        [blocks.reshape(n, 17, 2), jnp.zeros((n, 8, 2), U32)], axis=1)
    if n >= _BITSLICE_MIN_RECORDS and n % 256 == 0:
        from ..ops.keccak import (
            keccak_f1600_bitsliced, planes_to_states, states_to_planes,
        )

        st = planes_to_states(
            keccak_f1600_bitsliced(states_to_planes(lanes), iters=1))
    else:
        st = keccak_f1600_array(lanes)
    return gl_reduce64(st[:, 0, 0], st[:, 0, 1])


def packed_grand_products(streams: list[np.ndarray],
                          gamma: int | None = None) -> list[int]:
    """Per-stream ∏ (γ + fingerprint) mod p — equals
    sorted_queue.host_grand_product over the sorted object stream (the
    product is order-invariant)."""
    from .sorted_queue import DEFAULT_GAMMA

    if gamma is None:
        gamma = DEFAULT_GAMMA
    counts = [s.shape[0] for s in streams]
    total = sum(counts)
    if total == 0:
        return [1] * len(streams)
    allrec = np.concatenate(
        [s.reshape(-1, 32) for s in streams if s.shape[0]], axis=0)
    # pad the batch to a bucket size (few compiled variants)
    pad_to = _block_bucket(total)
    if pad_to > total:
        allrec = np.concatenate(
            [allrec, np.zeros((pad_to - total, 32), np.uint32)], axis=0)
    lo, hi = jax.device_get(_fingerprints_device(jnp.asarray(allrec)))
    fp = (lo.astype(np.uint64) | (hi.astype(np.uint64) << 32))[:total]
    out = []
    pos = 0
    for c in counts:
        acc = 1
        for v in fp[pos:pos + c]:
            acc = acc * ((gamma + int(v)) % GOLDILOCKS_P) % GOLDILOCKS_P
        out.append(acc)
        pos += c
    return out


# ---------------------------------------------------------------------------
# Object materialization (off the hot path) + join columns
# ---------------------------------------------------------------------------

def queries_from_packed(family: str, words: np.ndarray) -> list:
    """Packed records -> the reference-shaped query objects (for consumers
    of TxResult.streams who want structs; conformance-tested against the
    object drain)."""
    from ..golden.queries import (
        DecommittmentQuery, LogQuery, MemoryQuery, MemoryType,
    )

    def bs(x):
        return int.from_bytes(int(x).to_bytes(4, "little"), "big")

    out = []
    if family in ("memory", "precompile"):
        for r in words:
            w1, w2, w3 = int(r[1]), int(r[2]), int(r[3])
            value = sum(bs(r[8 + i]) << (32 * (7 - i)) for i in range(8))
            out.append(MemoryQuery(
                timestamp=bs(r[0]), memory_type=MemoryType(w1 & 0xFF),
                page=(((w1 >> 8) & 0xFF) << 24) | (((w1 >> 16) & 0xFF) << 16)
                | (((w1 >> 24) & 0xFF) << 8) | (w2 & 0xFF),
                index=(((w2 >> 8) & 0xFF) << 24) | (((w2 >> 16) & 0xFF) << 16)
                | (((w2 >> 24) & 0xFF) << 8) | (w3 & 0xFF),
                value=value, rw_flag=bool((w3 >> 8) & 1),
                value_is_pointer=bool((w3 >> 9) & 1)))
    elif family == "log":
        for r in words:
            w1 = int(r[1])
            address = sum(bs(r[3 + i]) << (32 * (4 - i)) for i in range(5))
            key = sum(bs(r[8 + i]) << (32 * (7 - i)) for i in range(8))
            rd = sum(bs(r[16 + i]) << (32 * (7 - i)) for i in range(8))
            wr = sum(bs(r[24 + i]) << (32 * (7 - i)) for i in range(8))
            out.append(LogQuery(
                timestamp=bs(r[0]), tx_number_in_block=((w1 >> 24) << 8)
                | (int(r[2]) & 0xFF),
                aux_byte=w1 & 0xFF, shard_id=(w1 >> 8) & 0xFF,
                address=address, key=key, read_value=rd, written_value=wr,
                rw_flag=bool((w1 >> 16) & 1), rollback=False,
                is_service=bool((w1 >> 18) & 1)))
    elif family == "decommit":
        for r in words:
            out.append(DecommittmentQuery(
                hash=sum(bs(r[i]) << (32 * (7 - i)) for i in range(8)),
                timestamp=bs(r[8]), memory_page=bs(r[9]),
                decommitted_length=bs(r[10]), is_fresh=bool(int(r[11]) & 1)))
    else:
        raise ValueError(family)
    return out


def log_join_columns(words: np.ndarray):
    """Vectorized (timestamp, address, shard) columns from packed log
    records — the net-state join inputs (models/net_states), without
    LogQuery objects."""
    def bsv(col):
        c = col.astype(np.uint32)
        return ((c & 0xFF) << 24) | ((c & 0xFF00) << 8) \
            | ((c >> 8) & 0xFF00) | (c >> 24)

    ts = bsv(words[:, 0])
    shard = (words[:, 1] >> 8) & 0xFF
    address = np.zeros(words.shape[0], dtype=object)
    for i in range(5):
        address = address + (bsv(words[:, 3 + i]).astype(object)
                             << (32 * (4 - i)))
    return ts, address, shard
