"""Batched VM state: struct-of-arrays over a batch of independent contexts.

The TPU-native re-representation of `VmLocalState` + callstack + memory
(SURVEY.md §2.1, §7): every field is an array with a leading batch axis; the
callstack is a fixed-depth SoA (frames[b, d]); memory is flat per-lane arenas
instead of the reference's page graph.  Everything is a pytree, so the whole
state flows through jit/scan/shard_map unchanged.

U256 values are uint32[..., 8] (little-endian limbs); 160-bit addresses are
uint32[..., 5].
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..isa import params

U32 = jnp.uint32
I32 = jnp.int32
BOOL = jnp.bool_


@dataclasses.dataclass(frozen=True)
class VmConfig:
    """Static geometry of the batched VM (XLA shapes)."""

    batch: int
    code_words: int = 64          # per-lane code page capacity (32-byte words)
    stack_words: int = 2048       # per-lane stack arena (must cover initial SP)
    heap_words: int = 512         # per-lane heap arena
    aux_heap_words: int = 64      # per-lane aux-heap arena
    max_depth: int = 32           # callstack frames held on device
    queue_capacity: int = 0       # memory-witness queue slots (0 = off)
    #: optional two-window stack arena: absolutes [0, A) + the SP region
    #: [stack_sp_base, stack_sp_base + stack_words - A) (see _map_stack_index)
    stack_abs_words: int | None = None
    stack_sp_base: int = 768
    # -- LOG-family device state (0 disables the subsystem arrays) --
    storage_slots: int = 0        # per-lane KV capacity (compare-all lookup)
    journal_slots: int = 0        # per-lane storage-write journal (rollback)
    event_slots: int = 0          # per-lane event journal
    log_queue_capacity: int = 0   # log-witness queue (1 slot per cycle)
    # -- FAR_CALL device state --
    heap_frames: int = 1          # global-frame heap/aux arena slots per lane
    code_pages: int = 1           # code-bank slots per lane (slot 0 = entry)
    decommit_queue_capacity: int = 0  # decommit-witness queue (1 slot/cycle)
    # -- precompile unit --
    precompile_keccak_blocks: int = 0  # max 136-byte blocks (0 = disabled)
    precompile_sha_rounds: int = 0     # max 64-byte rounds per call
    precompile_ecrecover: bool = False  # secp256k1 recovery in-cycle
    #: precompile round-witness queue: the mem_in/mem_out MemoryQuery streams
    #: of each precompile call (reference: add_precompile_call_result,
    #: helpers.rs:211-221) recorded in their own queue family.  One block of
    #: `precompile_queue_slots(config)` slots per precompile-emitting cycle.
    precompile_queue_capacity: int = 0
    #: streaming memory-queue commitment: one keccak-f absorb per query
    #: (witness/commitment.py rolling spec); O(1) memory, unbounded streams
    rolling_commitment: bool = False
    #: store the word arenas (code/stack/heap/aux) limb-major [B, 8, W]
    #: instead of word-major ([B, W, 8] / flat [B, W*8]).  Limb-major puts
    #: the word axis on the 128-lane dimension with the 8-limb axis exactly
    #: filling the sublane tile — the layout the fused Pallas cycle kernel
    #: requires for pad-free VMEM residency (a word-major [TB, W, 8] block
    #: tiles to (W, 128): 16x padding).  Both layouts are conformance-tested.
    limb_major_arenas: bool = False
    #: batch-occupancy lax.cond gates around arena sweeps.  On the real chip
    #: these conds force whole-arena layout-conversion copies at the
    #: conditional boundary (a [B,SW,8] stack showed up as a 16x-padded
    #: {2,1,0:T(8,128)} copy — 4 GB/step, see tools/probe_perf.py), so TPU
    #: bench/serving configs pass False.  On XLA:CPU the conds are the
    #: opposite: they partition the graph and keep fusion (and compile time —
    #: super-linear in fused-chain length, the ecrecover step explodes
    #: without them) bounded, so the default stays True for the CPU
    #: test/dev loop.
    sweep_gating: bool = True

    def __post_init__(self):
        if self.stack_abs_words is None:
            assert self.stack_words > params.INITIAL_SP_ON_FAR_CALL
        else:
            assert self.stack_sp_base <= params.INITIAL_SP_ON_FAR_CALL \
                < self.stack_sp_base + self.stack_words - self.stack_abs_words
        if self.queue_capacity:
            assert self.queue_capacity % 8 == 0
        if self.precompile_queue_capacity:
            ps_in, ps_out = precompile_queue_slots(self)
            assert self.precompile_queue_capacity >= ps_in + ps_out


def precompile_queue_slots(config: VmConfig) -> tuple[int, int]:
    """(input, output) witness slots per precompile call, from the config's
    precompile limits.  Input words are consecutive from the call's first
    word: keccak covers ceil bytes over 136*blocks-1 max, sha reads 2 words
    per round, ecrecover reads 4; outputs are 1 word (2 for ecrecover)."""
    ins = 1
    if config.precompile_keccak_blocks:
        ins = max(ins, (config.precompile_keccak_blocks * 136 + 61) // 32)
    if config.precompile_sha_rounds:
        ins = max(ins, 2 * config.precompile_sha_rounds)
    if config.precompile_ecrecover:
        ins = max(ins, 4)
    outs = 2 if config.precompile_ecrecover else 1
    return ins, outs


# callstack scalar fields, all uint32[B, D]
CS_SCALAR_FIELDS = (
    "base_memory_page", "code_page", "sp", "pc", "exception_handler",
    "ergs_remaining", "shard_ids",  # shard_ids packs this|caller<<8|code<<16
    "flags_word",                   # bit0 is_static, bit1 is_local_frame
    "heap_bound", "aux_heap_bound",
    # frame-entry snapshots of the storage journal / event journal lengths
    # (rollback segmentation; reference: per-frame ApplicationData stacks)
    "journal_snapshot", "event_snapshot",
    # which heap-arena slot this frame's heap/aux-heap pages live in
    "heap_slot",
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BatchedVmState:
    # register file
    regs: jax.Array          # u32[B, 15, 8]
    reg_ptr: jax.Array       # bool[B, 15]
    flags: jax.Array         # bool[B, 3]: lt/of, eq, gt

    # local scalars
    timestamp: jax.Array             # u32[B]
    monotonic_cycle_counter: jax.Array  # u32[B]
    spent_pubdata: jax.Array         # u32[B]
    ergs_per_pubdata: jax.Array      # u32[B]
    tx_number: jax.Array             # u32[B]
    pending_exception: jax.Array     # bool[B]
    previous_code_word: jax.Array    # u32[B, 8]
    previous_super_pc: jax.Array     # u32[B]
    previous_code_page: jax.Array    # u32[B]
    context_u128: jax.Array          # u32[B, 4]

    # callstack (SoA, frames[b, d]; current = d == depth)
    depth: jax.Array                 # i32[B]
    cs_this_address: jax.Array       # u32[B, D, 5]
    cs_msg_sender: jax.Array         # u32[B, D, 5]
    cs_code_address: jax.Array       # u32[B, D, 5]
    cs_context_u128: jax.Array       # u32[B, D, 4]
    cs_scalars: jax.Array            # u32[B, D, len(CS_SCALAR_FIELDS)]

    # memory arenas (code/heap/aux are slot pools, flattened:
    # code word p*CW+w, heap word f*HW+w, aux_heap word f*AW+w).  Physical
    # layout per config.limb_major_arenas: word-major u32[B, W, 8] (stack
    # flat u32[B, W*8]) or limb-major u32[B, 8, W] — see arena_shape().
    code: jax.Array                  # u32[B, P*CW, 8] | u32[B, 8, P*CW]
    stack: jax.Array                 # u32[B, SW*8] | u32[B, 8, SW]
    stack_ptr_tag: jax.Array         # bool[B, SW]
    heap: jax.Array                  # u32[B, F*HW, 8] | u32[B, 8, F*HW]
    aux_heap: jax.Array              # u32[B, F*AW, 8] | u32[B, 8, F*AW]
    # heap-slot page tables: VM page numbers of slot f's heap/aux pages
    hp_page: jax.Array               # u32[B, F]
    ap_page: jax.Array               # u32[B, F]
    frame_count: jax.Array           # i32[B] — next free heap slot
    page_counter: jax.Array          # u32[B] — memory_page_counter
    # code bank: pre-staged contracts; decommit binds a VM page number
    cb_hash: jax.Array               # u32[B, P, 8] — stored-form code hash
    cb_len: jax.Array                # u32[B, P] — code length in words
    cb_page: jax.Array               # u32[B, P] — bound VM page (0 = unbound)
    cb_valid: jax.Array              # bool[B, P]
    default_aa_hash: jax.Array       # u32[B, 8] — block default AA code hash
    # decommit-witness queue (1 slot per cycle)
    dq_hash: jax.Array               # u32[B, DQ, 8]
    dq_meta: jax.Array               # u32[B, DQ, 4]: ts, page, len, fresh|valid<<1
    dq_count: jax.Array              # i32[B]
    # rolling memory-queue commitment sponge (zero-size when disabled)
    wc_state: jax.Array              # u32[B, 25, 2] (or [B, 0, 2])
    wc_count: jax.Array              # u32[B]

    # lane status
    done: jax.Array                  # bool[B] — execution has ended
    lane_error: jax.Array            # bool[B] — hit an unsupported/oob path
    #: global cycle-step clock (uniform across lanes, never frozen) — drives
    #: the batch-uniform witness-queue block positions; survives checkpoints
    global_step: jax.Array           # i32[B]

    # memory witness queue (optional; zero-size arrays when off).
    # Stored batch-LAST ([Q, ..., B]): XLA's while-loop layout for these is
    # batch-minor, and a batch-major jnp.zeros input would pay a full-array
    # layout-conversion copy at every run_cycles entry (8 GB of HLO temps at
    # q=5120, B=32k — measured; it OOMed the chip).  Host readers transpose.
    wq_count: jax.Array              # i32[B]
    wq_meta: jax.Array               # u32[Q, 4, B]: timestamp, type, page, index
    wq_value: jax.Array              # u32[Q, 8, B]
    wq_flags: jax.Array              # u32[Q, B]: bit0 rw, bit1 is_ptr, bit2 valid

    # -- LOG-family state (zero-size arrays when disabled) --
    # storage: per-lane KV store; key = (key u256, address, shard) = 14 limbs
    st_key: jax.Array                # u32[B, S, 14]
    st_val: jax.Array                # u32[B, S, 8]
    st_used: jax.Array               # bool[B, S]
    st_count: jax.Array              # i32[B]
    # storage-write journal: (slot, previous value) per write
    j_slot: jax.Array                # i32[B, J]
    j_prev: jax.Array                # u32[B, J, 8]
    j_count: jax.Array               # i32[B]
    # event journal: forward entries; panicked-frame segments get cancelled
    ev_key: jax.Array                # u32[B, E, 8]
    ev_val: jax.Array                # u32[B, E, 8]
    ev_meta: jax.Array               # u32[B, E, 2]: ts, aux|first<<8|tx<<16
    ev_cancelled: jax.Array          # bool[B, E]
    ev_count: jax.Array              # i32[B]
    # log-witness queue: one slot per cycle, batch-uniform position
    lq_meta: jax.Array               # u32[B, LQ, 4]: ts, packed, tx, shard
    lq_addr: jax.Array               # u32[B, LQ, 5]
    lq_key: jax.Array                # u32[B, LQ, 8]
    lq_read: jax.Array               # u32[B, LQ, 8]
    lq_written: jax.Array            # u32[B, LQ, 8]
    lq_count: jax.Array              # i32[B]
    # precompile round-witness queue: mem_in/mem_out query records per call
    pq_meta: jax.Array               # u32[B, PQ, 4]: ts, type, page, index
    pq_value: jax.Array              # u32[B, PQ, 8]
    pq_flags: jax.Array              # u32[B, PQ]: bit0 rw, bit2 valid,
    #                                  bits 3+ round count (first out slot)
    pq_count: jax.Array              # i32[B]
    pq_blocks: jax.Array             # i32[B] — uniform block clock (like
    #                                  global_step, advanced only on cycles
    #                                  where some lane ran a precompile)


CS = {name: i for i, name in enumerate(CS_SCALAR_FIELDS)}

#: the state fields stored batch-LAST ([..., B]; see the wq_* comment above).
#: Single source of truth for batch-axis mergers (models/scheduler.merge_lanes):
#: any new batch-last array MUST be added here or lane merges corrupt it.
BATCH_LAST_FIELDS = ("wq_meta", "wq_value", "wq_flags")


def arena_shape(config: VmConfig, words: int) -> tuple[int, ...]:
    """Physical shape of a `words`-word u256 arena under the config's layout
    (limb-major [B, 8, W]; word-major heap/aux/code [B, W, 8], stack flat)."""
    if config.limb_major_arenas:
        return (config.batch, 8, words)
    return (config.batch, words, 8)


def arena_word_major(arr: np.ndarray | jax.Array, config: VmConfig) -> np.ndarray:
    """Host-side view of an arena as word-major [B, W, 8] regardless of the
    physical layout (for readers: differential harness, witness extractors)."""
    a = np.asarray(arr)
    if config.limb_major_arenas:
        return a.transpose(0, 2, 1)
    if a.ndim == 2:  # flat word-major stack [B, W*8]
        return a.reshape(a.shape[0], -1, 8)
    return a


def empty_state(config: VmConfig) -> BatchedVmState:
    B, D = config.batch, config.max_depth
    Q = config.queue_capacity
    z = partial(jnp.zeros, dtype=U32)
    state = BatchedVmState(
        regs=z((B, params.REGISTERS_COUNT, 8)),
        reg_ptr=jnp.zeros((B, params.REGISTERS_COUNT), dtype=BOOL),
        flags=jnp.zeros((B, 3), dtype=BOOL),
        timestamp=jnp.full((B,), params.STARTING_TIMESTAMP, dtype=U32),
        monotonic_cycle_counter=z((B,)),
        spent_pubdata=z((B,)),
        ergs_per_pubdata=z((B,)),
        tx_number=z((B,)),
        pending_exception=jnp.zeros((B,), dtype=BOOL),
        previous_code_word=z((B, 8)),
        previous_super_pc=z((B,)),
        previous_code_page=z((B,)),
        context_u128=z((B, 4)),
        depth=jnp.zeros((B,), dtype=I32),
        cs_this_address=z((B, D, 5)),
        cs_msg_sender=z((B, D, 5)),
        cs_code_address=z((B, D, 5)),
        cs_context_u128=z((B, D, 4)),
        cs_scalars=z((B, D, len(CS_SCALAR_FIELDS))),
        code=z(arena_shape(config, config.code_pages * config.code_words)),
        stack=z((B, 8, config.stack_words) if config.limb_major_arenas
                else (B, config.stack_words * 8)),
        stack_ptr_tag=jnp.zeros((B, config.stack_words), dtype=BOOL),
        heap=z(arena_shape(config, config.heap_frames * config.heap_words)),
        aux_heap=z(arena_shape(config,
                               config.heap_frames * config.aux_heap_words)),
        hp_page=z((B, config.heap_frames)),
        ap_page=z((B, config.heap_frames)),
        frame_count=jnp.ones((B,), dtype=I32),
        page_counter=jnp.full((B,), params.STARTING_BASE_PAGE, dtype=U32),
        cb_hash=z((B, config.code_pages, 8)),
        cb_len=z((B, config.code_pages)),
        cb_page=z((B, config.code_pages)),
        cb_valid=jnp.zeros((B, config.code_pages), dtype=BOOL),
        default_aa_hash=z((B, 8)),
        dq_hash=z((B, config.decommit_queue_capacity, 8)),
        dq_meta=z((B, config.decommit_queue_capacity, 4)),
        dq_count=jnp.zeros((B,), dtype=I32),
        wc_state=z((B, 25 if config.rolling_commitment else 0, 2)),
        wc_count=z((B,)),
        done=jnp.zeros((B,), dtype=BOOL),
        lane_error=jnp.zeros((B,), dtype=BOOL),
        global_step=jnp.zeros((B,), dtype=I32),
        wq_count=jnp.zeros((B,), dtype=I32),
        wq_meta=z((Q, 4, B)),
        wq_value=z((Q, 8, B)),
        wq_flags=z((Q, B)),
        st_key=z((B, config.storage_slots, 14)),
        st_val=z((B, config.storage_slots, 8)),
        st_used=jnp.zeros((B, config.storage_slots), dtype=BOOL),
        st_count=jnp.zeros((B,), dtype=I32),
        j_slot=jnp.zeros((B, config.journal_slots), dtype=I32),
        j_prev=z((B, config.journal_slots, 8)),
        j_count=jnp.zeros((B,), dtype=I32),
        ev_key=z((B, config.event_slots, 8)),
        ev_val=z((B, config.event_slots, 8)),
        ev_meta=z((B, config.event_slots, 2)),
        ev_cancelled=jnp.zeros((B, config.event_slots), dtype=BOOL),
        ev_count=jnp.zeros((B,), dtype=I32),
        lq_meta=z((B, config.log_queue_capacity, 4)),
        lq_addr=z((B, config.log_queue_capacity, 5)),
        lq_key=z((B, config.log_queue_capacity, 8)),
        lq_read=z((B, config.log_queue_capacity, 8)),
        lq_written=z((B, config.log_queue_capacity, 8)),
        lq_count=jnp.zeros((B,), dtype=I32),
        pq_meta=z((B, config.precompile_queue_capacity, 4)),
        pq_value=z((B, config.precompile_queue_capacity, 8)),
        pq_flags=z((B, config.precompile_queue_capacity)),
        pq_count=jnp.zeros((B,), dtype=I32),
        pq_blocks=jnp.zeros((B,), dtype=I32),
    )
    # root frames: empty context with the initial ergs budget
    root = state.cs_scalars
    root = root.at[:, 0, CS["sp"]].set(params.INITIAL_SP_ON_FAR_CALL)
    root = root.at[:, 0, CS["ergs_remaining"]].set(params.VM_INITIAL_FRAME_ERGS)
    state.cs_scalars = root
    return state


def make_entry_state(config: VmConfig, programs: list[list[int]],
                     ergs: int = 1 << 27,
                     entry_address: int | list[int] = 0x8001,
                     heap_init: list[list[int]] | None = None,
                     is_static: bool = False,
                     base_page: int = 8,
                     calldata: list[list[int] | None] | None = None,
                     context_u128: int | list[int] = 0) -> BatchedVmState:
    """Host-side constructor: load one bytecode (code-word list) per lane and
    push a bootloader-style entry frame (mirrors testing/harness.build_vm).

    `calldata` (per-lane word lists; individual lanes may be None) stages the
    bootloader calldata page (reference: memory.rs:293-298
    `polulate_bootloaders_calldata` + the BOOTLOADER_CALLDATA_PAGE constant):
    the words land in heap-frame slot 1 registered under page
    BOOTLOADER_CALLDATA_PAGE, and the entry frame receives a tagged r1 fat
    pointer over them (offset 0, start 0, length 32*len bytes) — the
    far-call r1 calldata protocol (far_call.rs:571-577).  Lanes whose entry
    is None keep r1 = 0 / frame_count = 1, exactly as a calldata-free build.

    `entry_address` and `context_u128` accept one scalar for all lanes or a
    per-lane list (the entry frame's context_u128_value; reference:
    CallStackEntry.context_u128_value, vm_state/execution_stack.rs).
    """
    from ..isa.abi import FatPointer
    from ..utils import to_limbs

    B = config.batch
    assert len(programs) == B
    state = empty_state(config)

    code = np.zeros((B, config.code_pages * config.code_words, 8),
                    dtype=np.uint32)
    for b, words in enumerate(programs):
        assert len(words) <= config.code_words, "program exceeds code arena"
        for i, w in enumerate(words):
            code[b, i] = to_limbs(w)  # bank slot 0 = the entry program
    if config.limb_major_arenas:
        code = code.transpose(0, 2, 1)
    state.code = jnp.asarray(code)
    state.cb_page = state.cb_page.at[:, 0].set(base_page)
    state.cb_valid = state.cb_valid.at[:, 0].set(True)

    heap = np.zeros((B, config.heap_frames * config.heap_words, 8),
                    dtype=np.uint32)
    if heap_init is not None:
        for b, words in enumerate(heap_init):
            for i, w in enumerate(words):
                heap[b, i] = to_limbs(w)  # heap slot 0 = entry frame heap
    has_calldata = np.zeros((B,), dtype=bool)
    if calldata is not None:
        assert config.heap_frames >= 2, "calldata needs heap-frame slot 1"
        for b, words in enumerate(calldata):
            if words is None:
                continue
            has_calldata[b] = True
            assert len(words) <= config.heap_words, "calldata exceeds arena"
            for i, w in enumerate(words):
                heap[b, config.heap_words + i] = to_limbs(w)
    if config.limb_major_arenas:
        heap = heap.transpose(0, 2, 1)
    state.heap = jnp.asarray(heap)
    state.hp_page = state.hp_page.at[:, 0].set(base_page + 2)
    state.ap_page = state.ap_page.at[:, 0].set(base_page + 3)
    if has_calldata.any():
        # per-lane staging: ONLY lanes with calldata get the page binding,
        # the second frame slot, and the tagged r1 pointer — a calldata-free
        # lane in a mixed batch must be bit-identical to a calldata-free
        # build (r1 = 0, frame_count = 1)
        state.hp_page = state.hp_page.at[:, 1].set(jnp.where(
            jnp.asarray(has_calldata),
            jnp.uint32(params.BOOTLOADER_CALLDATA_PAGE), state.hp_page[:, 1]))
        state.frame_count = jnp.where(jnp.asarray(has_calldata), 2,
                                      state.frame_count).astype(I32)
        r1 = np.zeros((B, 8), dtype=np.uint32)
        for b, words in enumerate(calldata):
            if words is None:
                continue
            fp = FatPointer(offset=0,
                            memory_page=params.BOOTLOADER_CALLDATA_PAGE,
                            start=0, length=32 * len(words))
            r1[b] = to_limbs(fp.to_u256())
        state.regs = state.regs.at[:, 0].set(jnp.where(
            jnp.asarray(has_calldata)[:, None], jnp.asarray(r1),
            state.regs[:, 0]))
        state.reg_ptr = state.reg_ptr.at[:, 0].set(jnp.asarray(has_calldata))
    state.page_counter = jnp.full(
        (B,), max(params.STARTING_BASE_PAGE,
                  base_page + params.NEW_MEMORY_PAGES_PER_FAR_CALL),
        dtype=U32)

    # entry frame at depth 1
    entry_list = ([entry_address] * B if isinstance(entry_address, int)
                  else list(entry_address))
    assert len(entry_list) == B
    addr = np.array([[(e >> (32 * i)) & 0xFFFFFFFF for i in range(5)]
                     for e in entry_list], dtype=np.uint32)
    state.cs_this_address = state.cs_this_address.at[:, 1].set(jnp.asarray(addr))
    state.cs_code_address = state.cs_code_address.at[:, 1].set(jnp.asarray(addr))
    ctx_list = ([context_u128] * B if isinstance(context_u128, int)
                else list(context_u128))
    assert len(ctx_list) == B
    if any(ctx_list):
        assert all(0 <= c < (1 << 128) for c in ctx_list)
        ctx = np.array([[(c >> (32 * i)) & 0xFFFFFFFF for i in range(4)]
                        for c in ctx_list], dtype=np.uint32)
        state.cs_context_u128 = state.cs_context_u128.at[:, 1].set(
            jnp.asarray(ctx))
    sc = state.cs_scalars
    sc = sc.at[:, 1, CS["base_memory_page"]].set(base_page)
    sc = sc.at[:, 1, CS["code_page"]].set(base_page)
    sc = sc.at[:, 1, CS["sp"]].set(params.INITIAL_SP_ON_FAR_CALL)
    sc = sc.at[:, 1, CS["pc"]].set(0)
    sc = sc.at[:, 1, CS["exception_handler"]].set((1 << 16) - 1)
    sc = sc.at[:, 1, CS["ergs_remaining"]].set(ergs)
    sc = sc.at[:, 1, CS["flags_word"]].set(1 if is_static else 0)
    sc = sc.at[:, 1, CS["heap_bound"]].set(params.NEW_FRAME_MEMORY_STIPEND)
    sc = sc.at[:, 1, CS["aux_heap_bound"]].set(params.NEW_FRAME_MEMORY_STIPEND)
    # root frame keeps VM_INITIAL_FRAME_ERGS - ergs
    sc = sc.at[:, 0, CS["ergs_remaining"]].set(params.VM_INITIAL_FRAME_ERGS - ergs)
    state.cs_scalars = sc
    state.depth = jnp.ones((B,), dtype=I32)
    return state


def populate_code_bank(state: BatchedVmState, config: VmConfig,
                       contracts: list[list[tuple[int, list[int]]]],
                       default_aa_hash: int = 0) -> BatchedVmState:
    """Stage known contracts: contracts[b] = [(stored_code_hash, words)].

    Bank slot 0 is the entry program; staged contracts fill slots 1..P-1 and
    get bound to VM page numbers on first decommit (far call).
    """
    from ..utils import to_limbs

    B = config.batch
    hashes = np.zeros((B, config.code_pages, 8), dtype=np.uint32)
    lens = np.zeros((B, config.code_pages), dtype=np.uint32)
    valid = np.zeros((B, config.code_pages), dtype=bool)
    code = arena_word_major(state.code, config).copy()
    for b, lane in enumerate(contracts):
        assert len(lane) <= config.code_pages - 1, "code bank full"
        for i, (code_hash, words) in enumerate(lane):
            slot = 1 + i
            hashes[b, slot] = to_limbs(code_hash)
            lens[b, slot] = len(words)
            valid[b, slot] = True
            assert len(words) <= config.code_words
            for w_i, w in enumerate(words):
                code[b, slot * config.code_words + w_i] = to_limbs(w)
    new_cb_hash = jnp.asarray(hashes)
    state.cb_hash = jnp.where(jnp.asarray(valid)[:, :, None], new_cb_hash,
                              state.cb_hash)
    state.cb_len = jnp.where(jnp.asarray(valid), jnp.asarray(lens),
                             state.cb_len)
    state.cb_valid = state.cb_valid | jnp.asarray(valid)
    if config.limb_major_arenas:
        code = code.transpose(0, 2, 1)
    state.code = jnp.asarray(code)
    state.default_aa_hash = jnp.broadcast_to(
        jnp.asarray(to_limbs(default_aa_hash)), (B, 8))
    return state


def storage_key_limbs(shard: int, address: int, key: int) -> np.ndarray:
    """(shard, address, key) -> the 14-limb device storage key."""
    from ..utils import to_limbs

    out = np.zeros(14, dtype=np.uint32)
    out[:8] = to_limbs(key)
    for i in range(5):
        out[8 + i] = (address >> (32 * i)) & 0xFFFFFFFF
    out[13] = shard
    return out


def populate_storage(state: BatchedVmState, config: VmConfig,
                     entries: list[list[tuple[int, int, int, int]]]) -> BatchedVmState:
    """Pre-populate per-lane storage: entries[b] = [(shard, address, key, value)]."""
    from ..utils import to_limbs

    B = config.batch
    keys = np.zeros((B, config.storage_slots, 14), dtype=np.uint32)
    vals = np.zeros((B, config.storage_slots, 8), dtype=np.uint32)
    used = np.zeros((B, config.storage_slots), dtype=bool)
    counts = np.zeros((B,), dtype=np.int32)
    for b, lane_entries in enumerate(entries):
        assert len(lane_entries) <= config.storage_slots
        for i, (shard, address, key, value) in enumerate(lane_entries):
            keys[b, i] = storage_key_limbs(shard, address, key)
            vals[b, i] = to_limbs(value)
            used[b, i] = True
        counts[b] = len(lane_entries)
    state.st_key = jnp.asarray(keys)
    state.st_val = jnp.asarray(vals)
    state.st_used = jnp.asarray(used)
    state.st_count = jnp.asarray(counts)
    return state
