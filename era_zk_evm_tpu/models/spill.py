"""Spill-to-host protocols: bounded device arenas for unbounded executions.

Two host-mediated mechanisms, both applied BETWEEN `run_cycles` segments
(the lockstep cycle step itself never talks to the host):

1. **Witness-queue draining** — the dense memory/log/decommit/precompile
   queues are block-positioned by uniform step clocks; draining extracts
   their contents to host lists and rewinds the clocks, so a queue sized
   for one segment serves an unbounded run (the streaming alternative to
   `rolling_commitment` when the full query streams are wanted, e.g. for a
   prover feeding on sorted queues).  Concatenating per-segment drains
   reproduces the exact one-shot stream (tested).

2. **Callstack spill/unspill** — frames BELOW the working window move to
   host numpy storage when a lane's depth approaches the device cap
   (`VmConfig.max_depth`), and move back before the window underflows.
   All device-side operations are depth-relative, so shifting the frame
   stack down and biasing `depth` is invisible to the interpreter; the
   host tracks per-lane spilled frames (reference counterpart: the
   unbounded `Callstack.inner` vec, execution_stack.rs:90-140, capped
   only by VM_MAX_STACK_DEPTH).

Segment-length contract for spill: depth grows at most 1 per cycle, so a
segment of N cycles needs `max_depth - spill_headroom >= N` frames free
after each spill pass (assert in `spill_callstack`).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .state import CS, BatchedVmState, VmConfig

CS_ARRAYS = ("cs_this_address", "cs_msg_sender", "cs_code_address",
             "cs_context_u128", "cs_scalars")


# ---------------------------------------------------------------------------
# 1. Witness-queue draining
# ---------------------------------------------------------------------------

def drain_witness_queues(state: BatchedVmState, config: VmConfig):
    """Extract all dense queue contents to host and rewind the block clocks.

    Returns (state, streams) where streams is a dict with per-lane lists:
    ``memory`` (MemoryQuery), ``log`` (LogQuery), ``decommit``
    (DecommittmentQuery), ``precompile`` (MemoryQuery) — present for the
    queue families the config enables.  After draining, the queues are
    empty and positioned at block 0; timestamps keep counting, so
    concatenated drains form the exact continuous stream.
    """
    from ..witness.commitment import (
        device_decommit_streams, device_log_streams,
        device_precompile_streams, device_queue_streams,
    )

    streams = {}
    if config.queue_capacity > 0:
        streams["memory"] = device_queue_streams(state)
    if config.log_queue_capacity > 0:
        streams["log"] = device_log_streams(state)
    if config.decommit_queue_capacity > 0:
        streams["decommit"] = device_decommit_streams(state)
    if config.precompile_queue_capacity > 0:
        streams["precompile"] = device_precompile_streams(state)

    return _rewind_queues_jit(state), streams


@jax.jit
def _rewind_queues_jit(state: BatchedVmState) -> BatchedVmState:
    # one jitted call, not ~18 eager zeros_like dispatches — the refill
    # scheduler drains at every chunk boundary and each eager op is a
    # tunnel round-trip on axon
    z = jnp.zeros_like
    return dataclasses.replace(
        state,
        global_step=z(state.global_step),          # memory/log/decommit clock
        wq_count=z(state.wq_count), wq_meta=z(state.wq_meta),
        wq_value=z(state.wq_value), wq_flags=z(state.wq_flags),
        lq_count=z(state.lq_count), lq_meta=z(state.lq_meta),
        lq_addr=z(state.lq_addr), lq_key=z(state.lq_key),
        lq_read=z(state.lq_read), lq_written=z(state.lq_written),
        dq_count=z(state.dq_count), dq_hash=z(state.dq_hash),
        dq_meta=z(state.dq_meta),
        pq_count=z(state.pq_count), pq_blocks=z(state.pq_blocks),
        pq_meta=z(state.pq_meta), pq_value=z(state.pq_value),
        pq_flags=z(state.pq_flags),
    )


# ---------------------------------------------------------------------------
# 2. Callstack spill / unspill
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class SpilledFrames:
    """Host-side storage of spilled bottom frames, per lane (LIFO order:
    index 0 is the outermost frame — the root sentinel once spilled)."""

    frames: list[list[dict]]

    @classmethod
    def empty(cls, batch: int) -> "SpilledFrames":
        return cls(frames=[[] for _ in range(batch)])

    def spilled_depth(self, b: int) -> int:
        return len(self.frames[b])


def normalize_callstack(state: BatchedVmState, config: VmConfig,
                        spilled: SpilledFrames, lo: int, hi: int):
    """Bring every lane's device depth into [lo, hi] by moving frames
    to/from host storage (device slots 0..depth are live, oldest at 0).

    - depth > hi: the (depth - hi) OLDEST device frames spill to host.
    - depth < lo with spilled frames: restore up to (lo - depth) newest
      spilled frames under the bottom.

    Correctness window for a segment of n cycles: depth moves at most 1
    per cycle, so lo >= n + 1 guarantees the device stack never underflows
    into spilled frames (and the done-at-depth-0 sentinel stays truthful),
    and hi <= max_depth - 2 - n guarantees push headroom.  Both are
    satisfiable when n <= (max_depth - 3) // 2.
    """
    D = config.max_depth
    assert 1 <= lo <= hi <= D - 2
    depth = np.asarray(state.depth).copy()
    need_spill = np.nonzero(depth > hi)[0]
    need_fill = [b for b in np.nonzero(depth < lo)[0]
                 if spilled.frames[b]]
    if len(need_spill) == 0 and not need_fill:
        return state, spilled
    arrs = {name: np.asarray(getattr(state, name)).copy()
            for name in CS_ARRAYS}
    for b in need_spill:
        s = int(depth[b]) - hi
        for i in range(s):  # oldest first
            spilled.frames[b].append(
                {name: arrs[name][b, i].copy() for name in CS_ARRAYS})
        for name in CS_ARRAYS:
            arrs[name][b, : D - s] = arrs[name][b, s:]
        depth[b] -= s
    for b in need_fill:
        r = min(len(spilled.frames[b]), lo - int(depth[b]))
        for name in CS_ARRAYS:
            arrs[name][b, r:] = arrs[name][b, : D - r].copy()
        for i in range(r):
            frame = spilled.frames[b].pop()  # newest spilled first
            for name in CS_ARRAYS:
                arrs[name][b, r - 1 - i] = frame[name]
        depth[b] += r
    state = dataclasses.replace(
        state, depth=jnp.asarray(depth),
        **{name: jnp.asarray(a) for name, a in arrs.items()})
    return state, spilled


# ---------------------------------------------------------------------------
# 3. Storage-KV spill (evict / verify / replay)
# ---------------------------------------------------------------------------
# The device KV table (st_key/st_val/st_used, compare-all, VmConfig.
# storage_slots entries) is a CACHE of the block's storage map; the
# reference's storage is unbounded (testing/storage.rs:8-76).  Protocol,
# applied between run_cycles segments:
#
#   * spill_storage_kv — entries not referenced by a live journal entry
#     move to a host dict; the table compacts and j_slot indices are
#     remapped.  (Entries with live journal references must stay resident:
#     a later panic replays prev-values into their slots.)
#   * a segment that touches an evicted key cannot see the host value, so
#     segments run on a SNAPSHOT: afterwards the drained log stream yields
#     the touched keys; any overlap with the evicted set rehydrates those
#     keys into the snapshot and re-runs the segment (iterating — wrong
#     values can change which keys get touched) until no cold touch
#     remains.  Miss-free segments (the common case) run once.
#
# run_segments_storage drives this; bit-exactness of the concatenated log
# stream + final storage vs an unsegmented golden run is proven in
# tests/test_spill.py.


@dataclasses.dataclass
class HostStorage:
    """Host overflow map per lane: 14-limb key tuple -> 8-limb value."""

    maps: list[dict[tuple, np.ndarray]]

    @classmethod
    def empty(cls, batch: int) -> "HostStorage":
        return cls(maps=[{} for _ in range(batch)])


def spill_storage_kv(state: BatchedVmState, config: VmConfig,
                     host: HostStorage, keep: int):
    """Evict evictable device KV entries beyond `keep` per lane to host.

    Evictable = not referenced by any live journal entry (j_slot[:j_count]
    after compaction).  Keeps the FIRST `keep` evictable entries resident
    (insertion order — recent writes sit at high indices, so pass keep=0
    to evict everything evictable).  Compacts the table in place and
    remaps j_slot through the permutation.
    """
    S = config.storage_slots
    st_key = np.asarray(state.st_key).copy()
    st_val = np.asarray(state.st_val).copy()
    st_used = np.asarray(state.st_used).copy()
    st_count = np.asarray(state.st_count).copy()
    j_slot = np.asarray(state.j_slot).copy()
    j_count = np.asarray(state.j_count)
    B = st_key.shape[0]
    for b in range(B):
        n = min(int(st_count[b]), S)
        pinned = set(int(s) for s in j_slot[b, : int(j_count[b])])
        resident: list[int] = []
        kept_evictable = 0
        for i in range(n):
            if not st_used[b, i]:
                continue
            if i in pinned:
                resident.append(i)
            elif kept_evictable < keep:
                resident.append(i)
                kept_evictable += 1
            else:
                host.maps[b][tuple(int(x) for x in st_key[b, i])] = \
                    st_val[b, i].copy()
        remap = {old: new for new, old in enumerate(resident)}
        nk = np.zeros_like(st_key[b])
        nv = np.zeros_like(st_val[b])
        nu = np.zeros_like(st_used[b])
        for old, new in remap.items():
            nk[new] = st_key[b, old]
            nv[new] = st_val[b, old]
            nu[new] = True
        st_key[b], st_val[b], st_used[b] = nk, nv, nu
        st_count[b] = len(resident)
        for j in range(int(j_count[b])):
            j_slot[b, j] = remap[int(j_slot[b, j])]
    state = dataclasses.replace(
        state, st_key=jnp.asarray(st_key), st_val=jnp.asarray(st_val),
        st_used=jnp.asarray(st_used), st_count=jnp.asarray(st_count),
        j_slot=jnp.asarray(j_slot))
    return state, host


def rehydrate_keys(state: BatchedVmState, config: VmConfig,
                   host: HostStorage, needed: list[set]) -> BatchedVmState:
    """Insert host values for the given per-lane key sets into free slots."""
    S = config.storage_slots
    st_key = np.asarray(state.st_key).copy()
    st_val = np.asarray(state.st_val).copy()
    st_used = np.asarray(state.st_used).copy()
    st_count = np.asarray(state.st_count).copy()
    for b, keys in enumerate(needed):
        for key in keys:
            val = host.maps[b].pop(key, None)
            if val is None:
                continue
            slot = int(st_count[b])
            assert slot < S, "KV table full during rehydration"
            st_key[b, slot] = np.asarray(key, dtype=np.uint32)
            st_val[b, slot] = val
            st_used[b, slot] = True
            st_count[b] += 1
    return dataclasses.replace(
        state, st_key=jnp.asarray(st_key), st_val=jnp.asarray(st_val),
        st_used=jnp.asarray(st_used), st_count=jnp.asarray(st_count))


def _touched_storage_keys(log_streams, shard_of=lambda q: q.shard_id):
    """Per-lane sets of 14-limb key tuples touched by storage log queries."""
    from ..isa import params
    from .state import storage_key_limbs

    out = []
    for lane in log_streams:
        keys = set()
        for q in lane:
            if q.aux_byte == params.STORAGE_AUX_BYTE:
                keys.add(tuple(int(x) for x in storage_key_limbs(
                    q.shard_id, q.address, q.key)))
        out.append(keys)
    return out


def run_segments_storage(state: BatchedVmState, config: VmConfig,
                         run_cycles, n_cycles: int, segment: int,
                         host: HostStorage | None = None,
                         keep: int = 0, max_replays: int = 8):
    """Run in segments with KV spill between them (see protocol above).

    Requires config.log_queue_capacity > 0 (the drained log stream is the
    cold-touch detector) sized for one segment.  Returns
    (state, host, streams) where streams concatenates every segment's
    drained queue families (identical to an unsegmented drain).
    """
    from ..witness.commitment import device_log_streams

    if host is None:
        host = HostStorage.empty(config.batch)
    assert config.log_queue_capacity >= segment > 0
    acc: dict[str, list[list]] = {}
    done = 0
    while done < n_cycles:
        n = min(segment, n_cycles - done)
        snapshot = state
        for attempt in range(max_replays + 1):
            # run on a copy: both engines donate their state argument, and
            # the replay path must be able to reuse the snapshot
            out = run_cycles(
                jax.tree.map(lambda x: x.copy(), snapshot), config, n)
            touched = _touched_storage_keys(device_log_streams(out))
            miss = [set(k for k in t if k in host.maps[b])
                    for b, t in enumerate(touched)]
            if not any(miss):
                break
            assert attempt < max_replays, "storage replay did not converge"
            snapshot = rehydrate_keys(snapshot, config, host, miss)
        state, streams = drain_witness_queues(out, config)
        for name, lanes in streams.items():
            if name not in acc:
                acc[name] = [[] for _ in range(config.batch)]
            for b in range(config.batch):
                acc[name][b].extend(lanes[b])
        state = compact_log_state_host(state, config)
        state, host = spill_storage_kv(state, config, host, keep=keep)
        done += n
    return state, host, acc


def compact_log_state_host(state: BatchedVmState,
                           config: VmConfig) -> BatchedVmState:
    """Journal/event compaction (models/compaction.py) as a host step."""
    from .compaction import compact_log_state

    if config.journal_slots == 0:
        return state
    return compact_log_state(state, config)


# ---------------------------------------------------------------------------
# 4. Heap-frame arena reclamation
# ---------------------------------------------------------------------------
# Far calls allocate heap/aux-heap frame slots from `frame_count` and never
# free them (the reference never frees pages SEMANTICALLY either — its pools
# are an invisible allocator detail, memory.rs:660-758).  Liveness here is
# decidable from tags: a heap page is reachable only through (a) a live
# callstack frame's heap_slot or (b) a TAGGED fat pointer in the register
# file or stack arena (untagged words cannot be dereferenced: UMA
# FatPointerRead panics without the tag, uma.rs:70-77).  Reclamation drops
# every other slot and compacts, so a bounded `heap_frames` serves
# unboundedly many far calls when called between run_cycles segments.
#
# Witness bit-exactness: memory queries record PAGE numbers, which never
# change — only slot positions move — so the query streams of a reclaimed
# run equal the unreclaimed run's exactly (tested).
#
# Caveat (documented contract): a program that stashes a page NUMBER as an
# untagged integer and later passes it as a precompile ABI read/write page
# defeats tag-based liveness; the standard protocol (ABI pages = 0 = own
# heap) is unaffected.


def reclaim_heap_frames(state: BatchedVmState, config: VmConfig):
    """Compact live heap/aux frame slots; returns the new state."""
    from .state import arena_word_major

    F = config.heap_frames
    HW, AW = config.heap_words, config.aux_heap_words
    depth = np.asarray(state.depth)
    cs = np.asarray(state.cs_scalars).copy()
    hp = np.asarray(state.hp_page).copy()
    ap = np.asarray(state.ap_page).copy()
    fc = np.asarray(state.frame_count).copy()
    regs = np.asarray(state.regs)
    reg_ptr = np.asarray(state.reg_ptr)
    stack = arena_word_major(np.asarray(state.stack), config)
    stack_tag = np.asarray(state.stack_ptr_tag)
    heap = arena_word_major(np.asarray(state.heap), config).copy()
    aux = arena_word_major(np.asarray(state.aux_heap), config).copy()
    B = depth.shape[0]
    heap_slot_col = CS["heap_slot"]

    for b in range(B):
        n = min(int(fc[b]), F)
        live = set()
        for d in range(int(depth[b]) + 1):
            live.add(int(cs[b, d, heap_slot_col]))
        pages = set()
        for r in range(regs.shape[1]):
            if reg_ptr[b, r]:
                pages.add(int(regs[b, r, 1]))
        for i in np.nonzero(stack_tag[b])[0]:
            pages.add(int(stack[b, i, 1]))
        for s in range(n):
            if int(hp[b, s]) in pages or int(ap[b, s]) in pages:
                live.add(s)
        order = sorted(s for s in live if s < n)
        if len(order) == n:
            continue
        remap = {old: new for new, old in enumerate(order)}
        nh = np.zeros_like(hp[b])
        na = np.zeros_like(ap[b])
        nheap = np.zeros_like(heap[b])
        naux = np.zeros_like(aux[b])
        for old, new in remap.items():
            nh[new] = hp[b, old]
            na[new] = ap[b, old]
            nheap[new * HW:(new + 1) * HW] = heap[b, old * HW:(old + 1) * HW]
            naux[new * AW:(new + 1) * AW] = aux[b, old * AW:(old + 1) * AW]
        hp[b], ap[b] = nh, na
        heap[b], aux[b] = nheap, naux
        for d in range(int(depth[b]) + 1):
            cs[b, d, heap_slot_col] = remap[int(cs[b, d, heap_slot_col])]
        fc[b] = len(order)

    def from_word_major(arr, like):
        if config.limb_major_arenas:
            return jnp.asarray(arr.transpose(0, 2, 1))
        return jnp.asarray(arr)

    return dataclasses.replace(
        state, cs_scalars=jnp.asarray(cs), hp_page=jnp.asarray(hp),
        ap_page=jnp.asarray(ap), frame_count=jnp.asarray(fc),
        heap=from_word_major(heap, state.heap),
        aux_heap=from_word_major(aux, state.aux_heap))


# ---------------------------------------------------------------------------
# 5. Code-bank eviction (evict / detect / replay)
# ---------------------------------------------------------------------------
# The device code bank (cb_hash/cb_len/cb_page/cb_valid + the code arena,
# VmConfig.code_pages slots) is a CACHE of the block's known contracts; the
# reference decommitter is unbounded (decommitter.rs:10-99, a HashMap).
# Protocol, applied between run_cycles segments (same snapshot/replay shape
# as the storage-KV spill above):
#
#   * spill_code_bank — bank slots whose bound page is NOT referenced by a
#     live callstack frame (nor the fetch cache) move to a host dict keyed
#     by the stored-form code hash, KEEPING their page binding: a repeat
#     decommit must observe is_fresh=false and the original page
#     (far_call.rs:450-453 refund semantics).  The bank compacts; slot
#     positions carry no semantics (frames reference PAGE numbers, and the
#     fetch resolves page -> slot by compare-all each cycle).
#   * a segment that far-calls an evicted contract would mis-execute (the
#     device treats an unknown hash as the hard-error path), so segments
#     run on a SNAPSHOT: afterwards the drained log stream's storage reads
#     at DEPLOYER_SYSTEM_CONTRACT_ADDRESS yield every REQUESTED code hash
#     (the far-call hash read precedes the decommit, far_call.rs:124-146
#     — so misses are visible too); any overlap with the evicted set
#     rehydrates those contracts and re-runs the segment until no cold
#     touch remains.  Miss-free segments (the common case) run once.
#
# run_segments_decommit drives this; bit-exactness of the concatenated
# log + decommit streams and the final registers vs an unsegmented
# big-bank run is proven in tests/test_spill.py.


@dataclasses.dataclass
class HostCodeBank:
    """Host overflow of evicted contracts, per lane: stored-form 8-limb
    hash tuple -> {"page": u32, "len": u32, "words": np.ndarray[CW, 8]}."""

    maps: list[dict[tuple, dict]]

    @classmethod
    def empty(cls, batch: int) -> "HostCodeBank":
        return cls(maps=[{} for _ in range(batch)])


def spill_code_bank(state: BatchedVmState, config: VmConfig,
                    host: HostCodeBank, keep: int = 0,
                    pin_hashes: list[set] | None = None):
    """Evict evictable code-bank slots beyond `keep` per lane to host.

    Evictable = valid slot whose bound page is not referenced by any live
    frame's code_page / the previous_code_page fetch cache, and whose hash
    is not the block's default-AA hash (an empty-hash far call can demand
    it at any time, far_call.rs:150-158).  Slot 0 (the entry program) is
    always resident.  Unbound staged slots (cb_page == 0) are evictable.
    `pin_hashes` (per-lane sets of 8-limb hash tuples) keeps named
    contracts resident — the replay path uses it to avoid evicting what
    the segment is known to touch.
    """
    from .state import CS, arena_word_major

    P_ = config.code_pages
    CW = config.code_words
    cb_hash = np.asarray(state.cb_hash).copy()
    cb_len = np.asarray(state.cb_len).copy()
    cb_page = np.asarray(state.cb_page).copy()
    cb_valid = np.asarray(state.cb_valid).copy()
    code = arena_word_major(np.asarray(state.code), config).copy()
    depth = np.asarray(state.depth)
    cs = np.asarray(state.cs_scalars)
    prev_page = np.asarray(state.previous_code_page)
    aa_hash = np.asarray(state.default_aa_hash)
    B = cb_hash.shape[0]
    col = CS["code_page"]
    changed = False
    for b in range(B):
        live = {int(cs[b, d, col]) for d in range(int(depth[b]) + 1)}
        live.add(int(prev_page[b]))
        named = pin_hashes[b] if pin_hashes is not None else set()
        resident: list[int] = []
        kept_evictable = 0
        for s in range(P_):
            if not cb_valid[b, s]:
                continue
            pinned = (s == 0
                      or (cb_page[b, s] != 0 and int(cb_page[b, s]) in live)
                      or (cb_hash[b, s] == aa_hash[b]).all()
                      or tuple(int(x) for x in cb_hash[b, s]) in named)
            if pinned:
                resident.append(s)
            elif kept_evictable < keep:
                resident.append(s)
                kept_evictable += 1
            else:
                host.maps[b][tuple(int(x) for x in cb_hash[b, s])] = {
                    "page": int(cb_page[b, s]), "len": int(cb_len[b, s]),
                    "words": code[b, s * CW:(s + 1) * CW].copy()}
                changed = True
        if len(resident) == P_:
            continue
        nh = np.zeros_like(cb_hash[b])
        nl = np.zeros_like(cb_len[b])
        npg = np.zeros_like(cb_page[b])
        nv = np.zeros_like(cb_valid[b])
        ncode = np.zeros_like(code[b])
        for new, old in enumerate(resident):
            nh[new] = cb_hash[b, old]
            nl[new] = cb_len[b, old]
            npg[new] = cb_page[b, old]
            nv[new] = True
            ncode[new * CW:(new + 1) * CW] = code[b, old * CW:(old + 1) * CW]
        cb_hash[b], cb_len[b], cb_page[b], cb_valid[b] = nh, nl, npg, nv
        code[b] = ncode
        changed = True
    if not changed:
        return state, host
    if config.limb_major_arenas:
        code = code.transpose(0, 2, 1)
    state = dataclasses.replace(
        state, cb_hash=jnp.asarray(cb_hash), cb_len=jnp.asarray(cb_len),
        cb_page=jnp.asarray(cb_page), cb_valid=jnp.asarray(cb_valid),
        code=jnp.asarray(code))
    return state, host


def rehydrate_code(state: BatchedVmState, config: VmConfig,
                   host: HostCodeBank, needed: list[set]) -> BatchedVmState:
    """Re-insert evicted contracts for the given per-lane stored-hash sets
    into free bank slots (restoring their page bindings)."""
    from .state import arena_word_major

    P_ = config.code_pages
    CW = config.code_words
    cb_hash = np.asarray(state.cb_hash).copy()
    cb_len = np.asarray(state.cb_len).copy()
    cb_page = np.asarray(state.cb_page).copy()
    cb_valid = np.asarray(state.cb_valid).copy()
    code = arena_word_major(np.asarray(state.code), config).copy()
    for b, hashes in enumerate(needed):
        for key in hashes:
            ent = host.maps[b].pop(key, None)
            if ent is None:
                continue
            free = [s for s in range(P_) if not cb_valid[b, s]]
            # capacity contract: code_pages must cover the entry slot +
            # pages live in frames at the segment boundary + every distinct
            # contract one segment touches; shorten segments or grow
            # code_pages if this trips
            assert free, ("code bank full during rehydration — the segment "
                          "touches more contracts than code_pages can hold")
            s = free[0]
            cb_hash[b, s] = np.asarray(key, dtype=np.uint32)
            cb_len[b, s] = ent["len"]
            cb_page[b, s] = ent["page"]
            cb_valid[b, s] = True
            code[b, s * CW:(s + 1) * CW] = ent["words"]
    if config.limb_major_arenas:
        code = code.transpose(0, 2, 1)
    return dataclasses.replace(
        state, cb_hash=jnp.asarray(cb_hash), cb_len=jnp.asarray(cb_len),
        cb_page=jnp.asarray(cb_page), cb_valid=jnp.asarray(cb_valid),
        code=jnp.asarray(code))


def _touched_code_hashes(log_streams) -> list[set]:
    """Per-lane sets of stored-form 8-limb hash tuples requested by far
    calls, from the log stream's code-hash storage reads (reads at the
    deployer system contract, far_call.rs:124-146).  Stored form = the
    versioned hash with the marker byte cleared (CODE_AT_REST_MARKER = 0;
    batched_vm stored_hash normalization)."""
    from ..isa import params
    from ..utils import to_limbs

    mask = ~(0xFF << 240)
    out = []
    for lane in log_streams:
        hashes = set()
        for q in lane:
            if (q.aux_byte == params.STORAGE_AUX_BYTE and not q.rw_flag
                    and q.address == params.DEPLOYER_SYSTEM_CONTRACT_ADDRESS):
                hashes.add(tuple(int(x)
                                 for x in to_limbs(q.read_value & mask)))
        out.append(hashes)
    return out


def run_segments_decommit(state: BatchedVmState, config: VmConfig,
                          run_cycles, n_cycles: int, segment: int,
                          host: HostCodeBank | None = None,
                          keep: int = 0, max_replays: int = 8):
    """Run in segments with code-bank eviction between them (see protocol
    above).  Requires config.log_queue_capacity >= segment (the drained
    log stream is the cold-touch detector).  Returns (state, host, streams)
    where streams concatenates every segment's drained queue families
    (identical to an unsegmented drain)."""
    from ..witness.commitment import device_log_streams

    if host is None:
        host = HostCodeBank.empty(config.batch)
    assert config.log_queue_capacity >= segment > 0
    acc: dict[str, list[list]] = {}
    done = 0
    while done < n_cycles:
        n = min(segment, n_cycles - done)
        snapshot = state
        for attempt in range(max_replays + 1):
            out = run_cycles(
                jax.tree.map(lambda x: x.copy(), snapshot), config, n)
            touched = _touched_code_hashes(device_log_streams(out))
            miss = [set(k for k in t if k in host.maps[b])
                    for b, t in enumerate(touched)]
            if not any(miss):
                break
            assert attempt < max_replays, "decommit replay did not converge"
            # make room first: evict everything not pinned and not touched
            # by this segment (a replay can need more contracts than the
            # bank has free slots when the snapshot arrived full)
            snapshot, host = spill_code_bank(snapshot, config, host,
                                             keep=0, pin_hashes=touched)
            snapshot = rehydrate_code(snapshot, config, host, miss)
        state, streams = drain_witness_queues(out, config)
        for name, lanes in streams.items():
            if name not in acc:
                acc[name] = [[] for _ in range(config.batch)]
            for b in range(config.batch):
                acc[name][b].extend(lanes[b])
        state, host = spill_code_bank(state, config, host, keep=keep)
        done += n
    return state, host, acc


def run_segments(state: BatchedVmState, config: VmConfig, run_cycles,
                 n_cycles: int, segment: int,
                 spilled: SpilledFrames | None = None):
    """Convenience driver: run in segments, normalizing the callstack
    window around each so bounded `max_depth` serves unbounded recursion.

    Requires segment <= (max_depth - 3) // 2.  Returns (state, spilled);
    pass `spilled` back in when continuing the same execution across
    multiple run_segments calls (e.g. with queue drains in between) —
    frames that do not fit the device stack stay host-side in it.
    """
    assert segment <= (config.max_depth - 3) // 2, "segment too long for D"
    if spilled is None:
        spilled = SpilledFrames.empty(config.batch)
    done = 0
    while done < n_cycles:
        n = min(segment, n_cycles - done)
        state, spilled = normalize_callstack(
            state, config, spilled, lo=n + 1, hi=config.max_depth - 2 - n)
        state = run_cycles(state, config, n)
        done += n
    # lanes that ran to completion have popped every frame, so their spill
    # store is empty; one final fill restores what fits for the rest
    # (architectural depth beyond max_depth-2 stays host-side in `spilled`)
    state, spilled = normalize_callstack(
        state, config, spilled, lo=config.max_depth - 2,
        hi=config.max_depth - 2)
    return state, spilled
