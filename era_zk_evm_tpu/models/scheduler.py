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

Round protocol:
  1. run one chunk (either engine's run_cycles driver);
  2. drain the witness queues; each drained per-lane stream is appended to
     the record of the tx OCCUPYING that lane this chunk (a lane runs one
     tx at a time and drains happen at every boundary, so attribution is
     exact; the drain's block-clock rewind also re-synchronizes the
     batch-uniform queue positions for the incoming fresh lanes);
  3. read the done/error masks; finalize finished lanes' TxResults;
  4. where() a fresh entry state into the refilled lanes (merge_lanes).

Throughput: bench.py's `block-refill` workload measures txs/s with refill
vs. the frozen-lane baseline on a skewed length mix.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .net_states import (
    event_entries_of, messages_from_entries, storage_map_of,
)
from .spill import drain_witness_queues
from .state import (
    CS, BatchedVmState, VmConfig, make_entry_state, populate_code_bank,
    populate_storage,
)

#: queue arrays stored batch-LAST (state.py docstring); everything else is
#: batch-first
_BATCH_LAST_FIELDS = ("wq_meta", "wq_value", "wq_flags")

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
        if f.name in _BATCH_LAST_FIELDS:
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

    noop = _noop_program()
    progs = [s.program if s else noop for s in specs]
    any_calldata = any(s and s.calldata is not None for s in specs)
    calldata = ([(s.calldata or []) if s else [] for s in specs]
                if any_calldata else None)
    entry0 = specs[0].entry_address if specs[0] else 0x8001
    assert all(s is None or s.entry_address == entry0 for s in specs), \
        "per-lane entry addresses not supported yet (shared entry only)"
    fresh = make_entry_state(config, progs, ergs=0, entry_address=entry0,
                             calldata=calldata)
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
                     refill_frac: float = 0.125
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

    `refill_frac`: a refill round (build + merge) only triggers once at
    least this fraction of lanes is free (or every running lane has
    finished) — a trickle of early finishers isn't worth the per-round
    merge + readback cost; waves mode is the refill_frac=1.0 endpoint.

    Returns (results, stats): stats["rounds"] counts chunks launched,
    so utilization = useful tx cycles / (rounds * chunk * batch)."""
    B = config.batch
    rounds = 0
    if fresh_builder is None:
        def fresh_builder(sp):
            return _build_entries(config, sp)
    results: list[TxResult | None] = [None] * len(txs)
    next_tx = 0
    lane_tx = np.full((B,), -1, dtype=np.int64)
    specs: list[TxSpec | None] = [None] * B
    for lane in range(B):
        if next_tx < len(txs):
            lane_tx[lane] = next_tx
            specs[lane] = txs[next_tx]
            next_tx += 1
    state = _copy_state_jit(fresh_builder(specs))
    streams_acc: list[dict] = [dict() for _ in range(B)]

    for _ in range(max_rounds):
        rounds += 1
        state = run_cycles_fn(state, config, chunk)
        state, streams = drain_witness_queues(state, config)
        for name, lanes in streams.items():
            for b in range(B):
                if lane_tx[b] >= 0 and lanes[b]:
                    streams_acc[b].setdefault(name, []).extend(lanes[b])
        # one readback for both masks (each np.asarray is a tunnel
        # round-trip on axon)
        flags = np.asarray(jnp.stack([state.done, state.lane_error]))
        done, err = flags[0], flags[1]
        finished = np.nonzero((done | err) & (lane_tx >= 0))[0]
        if finished.size:
            mono = np.asarray(state.monotonic_cycle_counter[finished])
            regs = np.asarray(state.regs[finished])
            st_arr = ev_arr = None
            if config.storage_slots > 0:
                st_arr = (np.asarray(state.st_key), np.asarray(state.st_val),
                          np.asarray(state.st_used))
            if config.event_slots > 0:
                ev_arr = (np.asarray(state.ev_meta), np.asarray(state.ev_key),
                          np.asarray(state.ev_val),
                          np.asarray(state.ev_cancelled),
                          np.asarray(state.ev_count))
            for i, lane in enumerate(finished):
                net = None
                if st_arr is not None or ev_arr is not None:
                    entries = (event_entries_of(*ev_arr, lane)
                               if ev_arr is not None else [])
                    ev, l1 = messages_from_entries(
                        entries, streams_acc[lane].get("log", []))
                    net = {"final_storage":
                           (storage_map_of(*st_arr, lane)
                            if st_arr is not None else {}),
                           "events": ev, "l1_messages": l1}
                results[lane_tx[lane]] = TxResult(
                    tx=int(lane_tx[lane]),
                    status="error" if err[lane] else "ok",
                    cycles=int(mono[i]), registers=regs[i],
                    streams=streams_acc[lane], net_states=net)
                streams_acc[lane] = {}
                lane_tx[lane] = -1
        wave_done = not refill and not (((~done) & (~err))
                                        & (lane_tx >= 0)).any()
        free = int((lane_tx < 0).sum())
        no_active = not (lane_tx >= 0).any()
        want_refill = refill and (free >= max(1, int(refill_frac * B))
                                  or no_active)
        if (want_refill or wave_done) and next_tx < len(txs):
            rspecs: list[TxSpec | None] = [None] * B
            rmask = np.zeros((B,), dtype=bool)
            lanes = (np.nonzero(lane_tx < 0)[0] if refill
                     else np.arange(B))
            for lane in lanes:
                if next_tx >= len(txs):
                    break
                rspecs[lane] = txs[next_tx]
                lane_tx[lane] = next_tx
                rmask[lane] = True
                next_tx += 1
            if rmask.any():
                fresh = fresh_builder(rspecs)
                state = _merge_lanes_jit(state, fresh,
                                         jnp.asarray(rmask))
        if next_tx >= len(txs) and not (lane_tx >= 0).any():
            break
    else:
        raise RuntimeError("run_block_refill: max_rounds exhausted")
    assert all(r is not None for r in results)
    useful = sum(r.cycles for r in results)
    return results, {"rounds": rounds,
                     "lane_cycles": rounds * chunk * B,
                     "useful_cycles": useful,
                     "utilization": useful / max(1, rounds * chunk * B)}
