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

    z = jnp.zeros_like
    state = dataclasses.replace(
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
    return state, streams


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
