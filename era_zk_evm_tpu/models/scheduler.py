"""Continuous lane refill: block-scale transaction scheduling.

The reference executes ONE VM to completion (SURVEY §3.1: the host loop
`while !vm.execution_has_ended() { vm.cycle() }`); a block is a sequence
of transactions with wildly varying cycle counts.  The batched lockstep
engines freeze finished lanes (models/batched_vm.py), so a naive batch of
transactions runs at the speed of its LONGEST member — at a 10:1 length
skew most lane-cycles are wasted on frozen lanes.

This module is the TPU-native answer, the analogue of continuous batching
in LLM serving: between chunks, lanes whose transaction finished are
refilled with the next pending transaction, keeping effective occupancy
near 100% regardless of the length distribution.  Nothing like it exists
in the reference (single-context, nothing to schedule); the semantics it
must preserve are per-transaction: each tx runs in a fresh VM context
(registers, timestamps, queues all restart), exactly as if it had its own
lane from the start — proven by tests/test_scheduler.py against
single-tx-per-lane runs.

Round protocol (host-overhead-minimized — the round-3 shape left the chip
>95% idle on per-round host work):
  1. run one chunk (either engine's run_cycles driver);
  2. ONE fixed-shape packed readback (done|error bits + cycle counters) —
     fixed shapes so nothing recompiles as the finished-lane count varies
     (a varying-length `state.regs[finished]` gather forced a fresh XLA
     compile nearly every round — the dominant cost of the old loop);
  3. rounds where no refill is wanted and no queue family is near capacity
     end here — no drain, no finalization, no further host work.  This is
     sound: a finished lane is FROZEN (no new cycles, no new queries), so
     its registers/counters/queue contents wait unchanged until the next
     action round, and attribution stays exact because the lane's occupant
     doesn't change between drains;
  4. action rounds drain the witness queues and enqueue a bucketed
     fixed-shape finalize gather — ENQUEUE-ONLY in packed mode: the drain
     records (tagged with a lane->tx snapshot) and the gather results are
     parked with host copies started and resolved once AFTER the last
     round (nothing a TxResult needs feeds back into scheduling), then
     where() fresh entry states into the refilled lanes (merge_lanes).
     Objects mode keeps synchronous drains (the conformance form).
  5. queue-capacity pressure forces a drain even without refill: the drain
     clock is tracked on host (cycles since last rewind vs. each enabled
     family's capacity), costing no readback.

Throughput: bench.py's `block-refill` workload measures txs/s with refill
vs. the frozen-lane baseline on a skewed length mix.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .net_states import (
    event_entries_of, messages_from_entries, messages_from_join,
    storage_map_of,
)
from .spill import drain_witness_queues
from .state import (
    BATCH_LAST_FIELDS, CS, BatchedVmState, VmConfig, make_entry_state,
    populate_code_bank, populate_storage, precompile_queue_slots,
)

#: a transaction whose program is this sentinel finishes on its first cycle
#: (entry-frame ret with no returndata); used to pad lanes past the block
_NOOP_PROGRAM_ASM = "ret r0"


@dataclasses.dataclass
class TxSpec:
    """One transaction: an entry program plus its per-lane environment."""

    program: list[int]                      # code words (assembled)
    ergs: int = 1 << 27
    entry_address: int = 0x8001
    calldata: list[int] | None = None
    storage: tuple = ()                     # [(shard, address, key, value)]
    contracts: tuple = ()                   # [(stored_hash, code_words)]
    context_u128: int = 0                   # entry frame's context_u128_value
    #: optional relative cost estimate (any unit) consumed by the
    #: scheduler's order="cost_desc" policy; 0 = unknown
    cost_hint: int = 0


@dataclasses.dataclass
class TxResult:
    tx: int                                 # index into the block's tx list
    status: str                             # "ok" | "error"
    cycles: int                             # cycles this tx executed
    registers: np.ndarray                   # u32[15, 8] final register file
    streams: dict                           # per-family witness query lists
    #: net outcomes at tx finish (get_final_net_states shape; None when the
    #: config has neither storage_slots nor event_slots)
    net_states: dict | None = None


def merge_lanes(state: BatchedVmState, fresh: BatchedVmState,
                mask) -> BatchedVmState:
    """Replace the masked lanes of `state` with `fresh` (bool mask[B])."""
    out = {}
    for f in dataclasses.fields(BatchedVmState):
        o = getattr(state, f.name)
        n = getattr(fresh, f.name)
        if f.name in BATCH_LAST_FIELDS:
            m = mask.reshape((1,) * (o.ndim - 1) + mask.shape)
        else:
            m = mask.reshape(mask.shape + (1,) * (o.ndim - 1))
        out[f.name] = jnp.where(m, n, o)
    return BatchedVmState(**out)


# eager merge_lanes is ~2 dispatches per state field — on axon each rides
# the tunnel, so the per-round refill cost was dominated by dispatch
# latency, not compute.  One jitted call; the outgoing state is donated
# (never referenced after the merge), `fresh` is NOT (so a cached
# template can be passed without defensive copies).
_merge_lanes_jit = jax.jit(merge_lanes, donate_argnums=(0,))

# the INITIAL state flows straight into the engine, whose driver donates
# its input buffers — a fresh_builder backed by a cached template must
# not lose its template to that donation, so the initial build is
# deep-copied once (the copy_p primitive defeats jit's passthrough
# aliasing; merge results are always fresh buffers and need no copy)
_copy_state_jit = jax.jit(lambda s: jax.tree.map(jnp.copy, s))


@jax.jit
def _round_status(state: BatchedVmState):
    """The whole per-round readback as ONE fixed-shape device array:
    row 0 = done | lane_error << 1, row 1 = monotonic_cycle_counter."""
    return jnp.stack([
        state.done.astype(jnp.uint32)
        | (state.lane_error.astype(jnp.uint32) << 1),
        state.monotonic_cycle_counter.astype(jnp.uint32),
    ])


#: pad sizes for the finished-lane gather: a handful of compiled variants
#: instead of one per distinct finished-count
_FINALIZE_BUCKETS = (64, 256, 1024, 4096, 16384)


def _bucket(n: int, batch: int) -> int:
    for p in _FINALIZE_BUCKETS:
        if n <= p < batch:
            return p
    return batch


@partial(jax.jit, static_argnames=("want_st", "want_ev"))
def _finalize_gather(state: BatchedVmState, idx, want_st: bool,
                     want_ev: bool):
    """Fixed-shape row gather of everything finalization needs for the
    `idx` lanes (padded to a bucket size; extra rows are ignored)."""
    def take(a):
        return jnp.take(a, idx, axis=0)

    out = {"regs": take(state.regs)}
    if want_st:
        out.update(st_key=take(state.st_key), st_val=take(state.st_val),
                   st_used=take(state.st_used))
    if want_ev:
        out.update(ev_meta=take(state.ev_meta), ev_key=take(state.ev_key),
                   ev_val=take(state.ev_val),
                   ev_cancelled=take(state.ev_cancelled),
                   ev_count=take(state.ev_count))
    return out


def _drain_budget_cycles(config: VmConfig) -> int | None:
    """Cycles the enabled queue families can absorb between drains (None =
    no family enabled, never force a drain)."""
    budgets = []
    if config.queue_capacity:
        budgets.append(config.queue_capacity // 8)
    if config.log_queue_capacity:
        budgets.append(config.log_queue_capacity)
    if config.decommit_queue_capacity:
        budgets.append(config.decommit_queue_capacity)
    if config.precompile_queue_capacity:
        ps_in, ps_out = precompile_queue_slots(config)
        budgets.append(config.precompile_queue_capacity // (ps_in + ps_out))
    return min(budgets) if budgets else None


def _noop_program() -> list[int]:
    from ..isa.assembler import assemble_to_code_words

    return assemble_to_code_words(_NOOP_PROGRAM_ASM)


def _build_entries(config: VmConfig, specs: list[TxSpec | None]):
    """Entry state for a full batch; `None` slots get the noop program.

    Per-lane ergs are patched in after make_entry_state (which takes one
    scalar): both the entry frame's budget and the root frame's remainder
    (state.py make_entry_state ergs carving).
    """
    from ..isa import params

    for s in specs:
        if s is not None and not 0 <= s.ergs <= params.VM_INITIAL_FRAME_ERGS:
            raise ValueError(
                f"TxSpec.ergs {s.ergs} outside [0, VM_INITIAL_FRAME_ERGS="
                f"{params.VM_INITIAL_FRAME_ERGS}] — the root-frame carve "
                "would wrap")
    noop = _noop_program()
    progs = [s.program if s else noop for s in specs]
    any_calldata = any(s and s.calldata is not None for s in specs)
    calldata = ([(s.calldata if s else None) for s in specs]
                if any_calldata else None)
    entries = [s.entry_address if s else 0x8001 for s in specs]
    contexts = [s.context_u128 if s else 0 for s in specs]
    fresh = make_entry_state(config, progs, ergs=0, entry_address=entries,
                             calldata=calldata, context_u128=contexts)
    ergs_np = np.array([s.ergs if s else 1 for s in specs], dtype=np.uint64)
    root_np = (np.uint64(params.VM_INITIAL_FRAME_ERGS)
               - ergs_np).astype(np.uint32)
    sc = fresh.cs_scalars
    sc = sc.at[:, 1, CS["ergs_remaining"]].set(
        jnp.asarray(ergs_np.astype(np.uint32)))
    sc = sc.at[:, 0, CS["ergs_remaining"]].set(jnp.asarray(root_np))
    fresh.cs_scalars = sc
    if config.storage_slots > 0 and any(s and s.storage for s in specs):
        fresh = populate_storage(
            config=config, state=fresh,
            entries=[list(s.storage) if s else [] for s in specs])
    if config.code_pages > 1 and any(s and s.contracts for s in specs):
        fresh = populate_code_bank(
            fresh, config, [list(s.contracts) if s else [] for s in specs])
    return fresh


def run_block_refill(config: VmConfig, txs: list[TxSpec], run_cycles_fn,
                     chunk: int, max_rounds: int = 100_000,
                     refill: bool = True, fresh_builder=None,
                     refill_frac: float = 0.125,
                     collect: str = "objects",
                     spec_depth: int = 2,
                     tail_chunk_mult: int = 1,
                     order: str = "arrival",
                     drain_compact_frac: float | None = None,
                     adaptive_chunk: bool = False,
                     run_dyn_fn=None,
                     min_chunk: int = 8,
                     ) -> tuple[list[TxResult], dict]:
    """Run a block of transactions over `config.batch` lanes with
    continuous refill.  `run_cycles_fn(state, config, n)` is either
    engine's driver.  With ``refill=False`` every tx still runs (in
    batch-sized waves) but finished lanes stay frozen until the whole
    wave ends — the baseline the refill throughput win is measured
    against.

    `fresh_builder(specs)` (default `_build_entries`) maps a length-B list
    of TxSpec|None to a full fresh entry state; callers whose txs share a
    template can supply a cached-template patcher to avoid the host-side
    rebuild per refill round (see bench.py's block-refill workload).
    `fresh_builder` results are consumed read-only (the merge never
    donates them), so a patched cached template may be returned directly.

    `refill_frac`: a refill round (drain + finalize + build + merge) only
    triggers once at least this fraction of lanes is free (or every
    running lane has finished) — a trickle of early finishers isn't worth
    the per-round host cost; waves mode is the refill_frac=1.0 endpoint.
    Rounds in between do NO host work beyond one packed flags readback
    (see the module docstring's round protocol).

    `spec_depth`: speculative launch depth — how many chunks ride ahead of
    the status being acted on, so the ~20 ms tunnel round-trip per round
    hides behind device compute (sound for any depth: finished lanes are
    frozen, and statuses are tagged with their launch index so a status
    that predates a lane's refill is never trusted for that lane).

    `tail_chunk_mult`: once the pending-tx queue is empty, launch chunks
    this many times longer — the drain-out tail pays the per-round fixed
    cost far fewer times (a second compiled kernel variant; warm runs
    cover it).  1 = off (the default keeps test-tier compiles down).

    `order`: "arrival" dispenses txs in list order; "cost_desc" dispenses
    by descending TxSpec.cost_hint (longest-first — the classic makespan
    heuristic: the tail is made of cheap txs).  TxResult.tx always indexes
    the ORIGINAL list.

    `drain_compact_frac` (packed mode only): compact each drain's record
    block on device to `B*Q*frac` rows before the host transfer — the
    dense drain ships mostly invalid padding and the host link is the
    block pipeline's binding resource.  Overflow (more valid records than
    the budget) raises at resolve time; size it like queue capacity.

    `adaptive_chunk`: shrink-to-horizon chunk sizing — while txs are
    pending, the next chunk's length is the refill_frac-quantile of the
    per-lane REMAINING-cycle estimates (cost_hint scaled by the running
    cycles/hint calibration from finished txs, minus cycles run since
    dispatch), clipped to [min_chunk, chunk].  A lane finishing mid-chunk
    wastes the rest of the chunk; on short-tx mixes that residual is the
    dominant utilization loss, and sizing the chunk to the predicted next
    finish-wave removes it without any per-length recompiles — the
    shrunk launches go through `run_dyn_fn(state, config, n)`, which must
    execute n cycles from ONE compiled program with a dynamic cycle count
    (models/fused_cycle.run_chunk_fused_dyn; a static-n engine would
    recompile per distinct length).  Chunk-length variation cannot change
    per-tx semantics (finished lanes are frozen, per-lane timestamps and
    queue order depend only on executed cycles), so TxResults are
    bit-identical — asserted by tests/test_scheduler.py.  Inert until
    the first tx with cost_hint > 0 finishes (no calibration), and during
    the tail (escalation takes over).  Drain-budget note: a dynamic chunk
    splices the full compiled `chunk` extent of queue rows, so the drain
    clock reserves `chunk` cycles for it regardless of n.

    `collect` picks the witness-stream representation in TxResult.streams:
    "objects" (reference-shaped query structs, the conformance form) or
    "packed" (u32 record arrays in the pinned serialization layouts,
    witness/packed.py — zero per-query host work; the block pipeline's
    device-commitment form).

    Returns (results, stats): stats["lane_cycles"] counts every launched
    lane-cycle (tail-escalated chunks included), so utilization =
    stats["useful_cycles"] / stats["lane_cycles"]."""
    B = config.batch
    rounds = 0
    if fresh_builder is None:
        def fresh_builder(sp):
            return _build_entries(config, sp)
    results: list[TxResult | None] = [None] * len(txs)
    next_tx = 0
    lane_tx = np.full((B,), -1, dtype=np.int64)
    specs: list[TxSpec | None] = [None] * B
    if order == "cost_desc":
        dispatch = list(np.argsort(
            -np.asarray([t.cost_hint for t in txs], dtype=np.int64),
            kind="stable"))
    elif order == "arrival":
        dispatch = list(range(len(txs)))
    else:
        raise ValueError(f"unknown order {order!r}")
    if adaptive_chunk:
        assert run_dyn_fn is not None, "adaptive_chunk needs run_dyn_fn"
    #: adaptive-chunk bookkeeping: per-lane dispatched cost hint, cycles
    #: run since dispatch, and the cycles/hint calibration accumulators
    lane_hint = np.zeros((B,), dtype=np.float64)
    lane_run = np.zeros((B,), dtype=np.float64)
    calib_num = 0.0
    calib_den = 0.0
    for lane in range(B):
        if next_tx < len(txs):
            lane_tx[lane] = dispatch[next_tx]
            specs[lane] = txs[dispatch[next_tx]]
            lane_hint[lane] = txs[dispatch[next_tx]].cost_hint
            next_tx += 1
    state = _copy_state_jit(fresh_builder(specs))
    streams_acc: list[dict] = [dict() for _ in range(B)]
    drain_budget = _drain_budget_cycles(config)
    if drain_budget is not None:
        assert drain_budget >= chunk, (
            f"chunk {chunk} exceeds the smallest queue family's capacity "
            f"({drain_budget} cycles)")
    cycles_since_drain = 0
    want_st = config.storage_slots > 0
    want_ev = config.event_slots > 0
    refill_threshold = max(1, int(refill_frac * B))

    def _launch(st, n, dyn=False):
        """Enqueue one n-cycle chunk + its status; nothing blocks.  The
        status host copy starts immediately so the later np.asarray finds
        the bytes already in flight instead of paying a fresh tunnel
        round-trip behind the queued chunks."""
        st = (run_dyn_fn if dyn else run_cycles_fn)(st, config, n)
        sd = _round_status(st)
        try:
            sd.copy_to_host_async()
        except AttributeError:  # pragma: no cover
            pass
        return st, sd

    # Speculative pipeline: the chunk AFTER the one whose status we are
    # about to read is already launched, so the ~20 ms status round-trip
    # (tunnel latency) overlaps device compute instead of serializing
    # with it.  Sound because a finished lane is frozen: running one more
    # chunk leaves its registers/counters/queue contents bit-identical,
    # so acting on a one-chunk-old status produces the same TxResults.
    # Deferred finalization: nothing a TxResult needs ever feeds back into
    # scheduling, so drains and finalize gathers are ENQUEUED during the
    # round loop (device arrays with host copies started) and resolved
    # once after the last round.  The round-3/round-4a shape blocked on a
    # device_get per action round (~2 tunnel round-trips + O(records)
    # Python), which is why refill lost to its own waves baseline
    # (BENCH speedup 0.37 then 0.66) despite 2x the lane utilization.
    # Deferred drains are bounded: only the newest _MAX_DEVICE_DRAINS
    # entries keep device references; older ones are resolved to host
    # numpy (their async copies have been in flight for >= that many
    # action rounds, so the device_get is a near-no-op) — an unbounded
    # queue held every drain's full record block in HBM until block end
    # (~80-256 MB each at bench_block shapes: device OOM risk on long
    # blocks; advisor round-4 finding).
    pending_drains: list = []      # [packed (device or host), lane_tx]
    drains_on_host = 0             # prefix of pending_drains already host
    pending_final: list = []       # per action round finalize payloads

    _MAX_DEVICE_DRAINS = 4

    def _drain_to_host(packed):
        """Device drain -> host numpy.  Compacted drains transfer only
        rows[:count] (power-of-two bucketed) — the fixed budget array is
        mostly padding and the host link is the binding resource
        (witness/packed.fetch_compacted_rows; measured: the full-budget
        transfer put the realistic-mix block bench at 99% link time)."""
        if drain_compact_frac is None:
            return jax.device_get(packed)
        from ..witness.packed import fetch_compacted_rows

        return fetch_compacted_rows(packed)

    def _drain_and_attribute(st):
        """Drain the queues.  Packed mode: enqueue only (resolved at block
        end; device refs bounded — see pending_drains above).  Objects
        mode: the reference-shaped conformance form — keeps the
        synchronous per-round attribution."""
        nonlocal drains_on_host
        if collect == "packed":
            from ..witness.packed import drain_witness_queues_packed_async

            st, packed = drain_witness_queues_packed_async(
                st, config, compact_frac=drain_compact_frac)
            pending_drains.append([packed, lane_tx.copy()])
            while len(pending_drains) - drains_on_host > _MAX_DEVICE_DRAINS:
                ent = pending_drains[drains_on_host]
                ent[0] = _drain_to_host(ent[0])
                drains_on_host += 1
        else:
            st, streams = drain_witness_queues(st, config)
            for name, lanes in streams.items():
                for b, lane_stream in enumerate(lanes):
                    if lane_stream and lane_tx[b] >= 0:
                        streams_acc[b].setdefault(name, []).extend(lane_stream)
        return st

    import time as _time
    from collections import deque

    prof = {"status_read": 0.0, "drain": 0.0, "finalize_enqueue": 0.0,
            "refill_python": 0.0, "builder": 0.0, "merge": 0.0,
            "launch": 0.0, "resolve": 0.0, "action_rounds": 0}

    #: launch index of the last chunk that preceded each lane's refill —
    #: a status tagged <= last_refill[lane] describes the FORMER occupant
    #: and is never trusted for done/error bits on that lane
    last_refill = np.zeros((B,), dtype=np.int64)
    statuses: deque = deque()       # (status device array, launch tag)
    launched = 0
    lane_cycles_total = 0
    rounds = 0
    can_escalate = tail_chunk_mult > 1 and (
        drain_budget is None or chunk * tail_chunk_mult <= drain_budget)
    if tail_chunk_mult > 1 and not can_escalate:
        import warnings

        warnings.warn(
            f"tail_chunk_mult={tail_chunk_mult} requested but the smallest "
            f"queue family only holds {drain_budget} cycles (chunk={chunk})"
            " — tail escalation disabled; size queue capacities to "
            "chunk*tail_chunk_mult to engage it", stacklevel=2)
    adaptive_launches = 0
    while rounds <= max_rounds:
        # keep `spec_depth` chunks in flight ahead of the status we pop
        while len(statuses) < max(1, spec_depth):
            n_next = (chunk * tail_chunk_mult
                      if (can_escalate and next_tx >= len(txs)) else chunk)
            use_dyn = False
            if (adaptive_chunk and next_tx < len(txs) and calib_den > 0):
                est = lane_hint * (calib_num / calib_den) - lane_run
                running = (lane_tx >= 0) & (est > 0)
                if running.any():
                    horizon = np.quantile(est[running],
                                          min(refill_frac, 0.5))
                    # quantized to min_chunk multiples: bounds the set of
                    # distinct lengths (finitely many programs even for a
                    # static-n run_dyn_fn) without hurting the policy
                    n_dyn = int(np.clip(
                        -(-np.ceil(horizon) // min_chunk) * min_chunk,
                        min_chunk, chunk))
                    if n_dyn < chunk:
                        n_next, use_dyn = n_dyn, True
            # capacity pressure: the chunk about to launch must fit the
            # smallest enabled queue family, so the forced drain runs
            # BEFORE the launch (lane occupancy is unchanged, so
            # attribution is unaffected).  A dynamic chunk splices the
            # full compiled `chunk` extent of queue rows (zero tail),
            # so it reserves `chunk` cycles regardless of n_next.
            if (drain_budget is not None
                    and cycles_since_drain
                    + (chunk if use_dyn else n_next) > drain_budget):
                state = _drain_and_attribute(state)
                cycles_since_drain = 0
            t0 = _time.perf_counter()
            state, sd = _launch(state, n_next, dyn=use_dyn)
            prof["launch"] += _time.perf_counter() - t0
            launched += 1
            rounds += 1
            adaptive_launches += use_dyn
            cycles_since_drain += n_next
            lane_run[lane_tx >= 0] += n_next
            lane_cycles_total += n_next * B
            statuses.append((sd, launched))
        sready, tag = statuses.popleft()
        t1 = _time.perf_counter()
        status_mono = np.asarray(sready)     # overlaps the in-flight chunks
        prof["status_read"] += _time.perf_counter() - t1
        status, mono = status_mono[0], status_mono[1]
        occupied = lane_tx >= 0
        fresh_lane = last_refill >= tag      # refilled after this snapshot
        fin_mask = (status != 0) & occupied & ~fresh_lane
        any_running = bool((occupied
                            & ((status == 0) | fresh_lane)).any())
        if refill:
            free_after = B - int(occupied.sum()) + int(fin_mask.sum())
            act = ((next_tx < len(txs) and free_after >= refill_threshold)
                   or not any_running)
        else:
            act = not any_running
        if not act:
            continue

        prof["action_rounds"] += 1
        t0 = _time.perf_counter()
        state = _drain_and_attribute(state)
        cycles_since_drain = 0
        t1 = _time.perf_counter()
        prof["drain"] += t1 - t0

        # every device consumer here is enqueue-only: the finalize gather
        # result is parked in pending_final (host copies started) and the
        # refill build/merge/status-refresh are enqueued behind it — an
        # action round never blocks on anything but the one status read
        finished = np.nonzero(fin_mask)[0]
        if finished.size:
            pad = _bucket(finished.size, B)
            idx = np.zeros((pad,), dtype=np.int32)
            idx[:finished.size] = finished
            gather_fut = _finalize_gather(state, jnp.asarray(idx),
                                          want_st, want_ev)
            for leaf in jax.tree.leaves(gather_fut):
                try:
                    leaf.copy_to_host_async()
                except AttributeError:  # pragma: no cover
                    pass
            fin_tx = lane_tx[finished].copy()   # before refill rewrites it
            # cycles/hint calibration for the adaptive-chunk policy (mono
            # is each finished tx's final cycle count: lanes reset to 0
            # at refill and freeze at done)
            fin_hints = np.array([txs[t].cost_hint for t in fin_tx],
                                 dtype=np.float64)
            hinted = fin_hints > 0
            calib_num += float(mono[finished][hinted].sum())
            calib_den += float(fin_hints[hinted].sum())
            pending_final.append({
                "gather": gather_fut, "finished": finished,
                "fin_tx": fin_tx, "status": status, "mono": mono,
                # objects mode: the outgoing occupants' streams, popped so
                # the next occupant of the lane starts a fresh accumulator
                "streams": {int(l): streams_acc[l] for l in finished}
                if collect != "packed" else None,
            })
            for lane in finished:
                lane_tx[lane] = -1
                streams_acc[lane] = {}
        t2 = _time.perf_counter()
        prof["finalize_enqueue"] += t2 - t1

        if next_tx < len(txs):
            rspecs: list[TxSpec | None] = [None] * B
            rmask = np.zeros((B,), dtype=bool)
            lanes = (np.nonzero(lane_tx < 0)[0] if refill
                     else np.arange(B))
            for lane in lanes:
                if next_tx >= len(txs):
                    break
                rspecs[lane] = txs[dispatch[next_tx]]
                lane_tx[lane] = dispatch[next_tx]
                lane_hint[lane] = txs[dispatch[next_tx]].cost_hint
                lane_run[lane] = 0.0
                rmask[lane] = True
                next_tx += 1
            t3 = _time.perf_counter()
            prof["refill_python"] += t3 - t2
            if rmask.any():
                fresh = fresh_builder(rspecs)
                t4 = _time.perf_counter()
                prof["builder"] += t4 - t3
                state = _merge_lanes_jit(state, fresh,
                                         jnp.asarray(rmask))
                # every status still in flight (tag <= launched) predates
                # this merge; the tag guard keeps those snapshots from
                # being trusted for the refilled lanes
                last_refill[rmask] = launched
                prof["merge"] += _time.perf_counter() - t4

        if next_tx >= len(txs) and not (lane_tx >= 0).any():
            break
    else:
        raise RuntimeError("run_block_refill: max_rounds exhausted")

    # ------------------------------------------------------------------
    # Resolve everything deferred — the only blocking readbacks of the
    # whole block beyond the per-round status words.
    # ------------------------------------------------------------------
    t0 = _time.perf_counter()
    # Packed-stream attribution, fully vectorized: concatenate every
    # drain's valid rows (chronological: drain-major, lane-major, slot)
    # with a per-row tx id from the drain-time lane->tx snapshot, one
    # stable argsort by tx id per family, one split — no per-lane or
    # per-tx Python loops (the O(lanes x drains) resolve was the e2e
    # block pipeline's host floor).
    tx_packed: dict[int, dict[str, np.ndarray]] = {}
    if collect == "packed":
        fam_rows: dict[str, list] = {}
        fam_txid: dict[str, list] = {}
        for i, (packed_dev, ltx) in enumerate(pending_drains):
            host = (packed_dev if i < drains_on_host
                    else _drain_to_host(packed_dev))
            for name, fam in host.items():
                if drain_compact_frac is None:
                    words, valid = fam
                    counts = valid.sum(axis=1)
                    rows = words[valid]          # (lane, slot) order
                else:
                    rows_b, counts, count = fam
                    count = int(count)
                    if count > rows_b.shape[0]:
                        raise RuntimeError(
                            f"compacted drain overflow: {count} valid "
                            f"records vs a {rows_b.shape[0]}-row transfer "
                            "budget — raise drain_compact_frac")
                    rows = rows_b[:count]
                if not rows.shape[0]:
                    continue
                fam_rows.setdefault(name, []).append(rows)
                fam_txid.setdefault(name, []).append(np.repeat(ltx, counts))
        for name in fam_rows:
            rows = np.concatenate(fam_rows[name], axis=0)
            txid = np.concatenate(fam_txid[name])
            keep = txid >= 0
            rows, txid = rows[keep], txid[keep]
            perm = np.argsort(txid, kind="stable")
            rows, txid = rows[perm], txid[perm]
            uniq, starts = np.unique(txid, return_index=True)
            for t, arr in zip(uniq, np.split(rows, starts[1:])):
                tx_packed.setdefault(int(t), {})[name] = arr

    for ent in pending_final:
        g = jax.device_get(ent["gather"])
        status, mono = ent["status"], ent["mono"]
        for i, lane in enumerate(ent["finished"]):
            tx_i = int(ent["fin_tx"][i])
            if collect == "packed":
                tx_streams = tx_packed.get(tx_i, {})
            else:
                tx_streams = ent["streams"][int(lane)]
            net = None
            if want_st or want_ev:
                entries = (event_entries_of(
                    g["ev_meta"], g["ev_key"], g["ev_val"],
                    g["ev_cancelled"], g["ev_count"], i)
                    if want_ev else [])
                if collect == "packed":
                    from ..witness.packed import (
                        RECORD_WORDS, log_join_columns,
                    )

                    lw = tx_streams.get(
                        "log", np.zeros((0, RECORD_WORDS["log"]),
                                        np.uint32))
                    ts_c, addr_c, shard_c = log_join_columns(lw)
                    ev, l1 = messages_from_join(
                        entries,
                        dict(zip(ts_c.tolist(),
                                 zip(addr_c.tolist(),
                                     shard_c.tolist()))))
                else:
                    ev, l1 = messages_from_entries(
                        entries, tx_streams.get("log", []))
                net = {"final_storage":
                       (storage_map_of(g["st_key"], g["st_val"],
                                       g["st_used"], i)
                        if want_st else {}),
                       "events": ev, "l1_messages": l1}
            results[tx_i] = TxResult(
                tx=tx_i,
                status="error" if (status[lane] & 2) else "ok",
                cycles=int(mono[lane]), registers=g["regs"][i],
                streams=tx_streams, net_states=net)
    prof["resolve"] = _time.perf_counter() - t0
    assert all(r is not None for r in results)
    useful = sum(r.cycles for r in results)
    return results, {"rounds": rounds,
                     "lane_cycles": lane_cycles_total,
                     "useful_cycles": useful,
                     "adaptive_launches": adaptive_launches,
                     "utilization": useful / max(1, lane_cycles_total),
                     "profile": {k: (round(v, 4) if isinstance(v, float)
                                     else v) for k, v in prof.items()}}
