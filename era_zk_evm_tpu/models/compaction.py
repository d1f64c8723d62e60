"""Journal / event-queue compaction for long-running frames.

The storage-write journal (`j_slot`/`j_prev`) exists only to replay value
rollbacks when a frame panics (reference: storage.rs:156-181); entries below
the LOWEST live frame snapshot can never be replayed again, so they are dead
weight in the fixed-capacity device arenas.  Likewise, cancelled event
entries (event_sink.rs:154-175 rollback merges) are excluded from every
downstream observable.  `compact_log_state` drops both classes and shifts
the arrays down in place, adjusting counts and every frame's snapshot —
letting a bounded `journal_slots`/`event_slots` capacity serve unboundedly
long executions when called periodically between `run_cycles` segments.

Everything is batch-lockstep array code (stable-filter via exclusive cumsum
+ one-hot shift, matching the interpreter's sweep idiom — see
models/batched_vm._gather_rows on why not dynamic gathers).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .state import CS, BatchedVmState, VmConfig

I32 = jnp.int32
U32 = jnp.uint32


def _stable_filter(keep: jax.Array, arrs: list[jax.Array]):
    """Compact kept rows to the front, preserving order.

    keep: bool[B, N]; each arr is [B, N] or [B, N, K].  Returns the shifted
    arrays (dropped tail zeroed) — one-hot product formulation, fused by XLA
    into a single sweep per array.
    """
    N = keep.shape[1]
    newpos = jnp.cumsum(keep, axis=1) - keep.astype(I32)   # exclusive cumsum
    oh = (newpos[:, :, None] == jnp.arange(N, dtype=I32)[None, None, :]) \
        & keep[:, :, None]                                  # [B, N(src), N(dst)]
    outs = []
    for arr in arrs:
        if arr.ndim == 2:
            outs.append(jnp.sum(arr[:, :, None] * oh.astype(arr.dtype),
                                axis=1))
        else:
            outs.append(jnp.sum(arr[:, :, None, :]
                                * oh.astype(arr.dtype)[:, :, :, None], axis=1))
    return outs


def _dropped_below(keep: jax.Array, snaps: jax.Array) -> jax.Array:
    """#dropped entries strictly below each snapshot position.

    keep: bool[B, N]; snaps: i32[B, D] (values in [0, N]).  Returns i32[B, D].
    """
    N = keep.shape[1]
    cum = jnp.cumsum(~keep, axis=1)                        # inclusive
    cum = jnp.concatenate(
        [jnp.zeros_like(cum[:, :1]), cum], axis=1)         # [B, N+1], cum[s] = below s
    s = jnp.clip(snaps, 0, N)
    oh = s[:, :, None] == jnp.arange(N + 1, dtype=I32)[None, None, :]
    return jnp.sum(cum[:, None, :] * oh.astype(I32), axis=2)


@partial(jax.jit, static_argnames=("config", "base_depth"))
def compact_log_state(state: BatchedVmState, config: VmConfig,
                      base_depth: int = 1) -> BatchedVmState:
    """Drop dead journal entries + cancelled events; shift arrays down.

    Safe at any point between cycles: preserves every future rollback
    (entries at/above the lowest live snapshot are kept verbatim, in order)
    and every final observable (uncancelled events keep their order and
    metadata; the storage KV itself is untouched).

    `base_depth` is the caller's contract that frames at depth <=
    base_depth never fine-grain-revert (production: a block whose
    bootloader/entry frame panics is discarded wholesale, so its rollback
    segment need not be replayable).  The live minimum is taken over
    frames strictly deeper; with only base frames live, the whole journal
    is droppable — the long-running-frame case this exists for.
    """
    if config.journal_slots == 0:
        return state
    B, D = config.batch, config.max_depth
    J, E = config.journal_slots, config.event_slots
    pos_j = jnp.arange(J, dtype=I32)[None, :]
    pos_e = jnp.arange(E, dtype=I32)[None, :]

    d_pos = jnp.arange(D, dtype=I32)[None, :]
    live = (d_pos > base_depth) & (d_pos <= state.depth[:, None])
    j_snaps = state.cs_scalars[:, :, CS["journal_snapshot"]].astype(I32)
    ev_snaps = state.cs_scalars[:, :, CS["event_snapshot"]].astype(I32)
    big = jnp.int32(1 << 30)
    j_min = jnp.minimum(jnp.min(jnp.where(live, j_snaps, big), axis=1),
                        state.j_count)
    ev_min = jnp.minimum(jnp.min(jnp.where(live, ev_snaps, big), axis=1),
                         state.ev_count)

    # journal: everything below the lowest live snapshot is unreachable
    j_keep = (pos_j >= j_min[:, None]) & (pos_j < state.j_count[:, None])
    new_j_slot, new_j_prev = _stable_filter(
        j_keep, [state.j_slot, state.j_prev])
    j_drops = _dropped_below(j_keep, j_snaps)  # == min(snap, j_min) per frame
    new_j_snaps = jnp.clip(j_snaps, 0, state.j_count[:, None]) - j_drops
    new_j_count = jnp.sum(j_keep.astype(I32), axis=1)

    # events: cancelled entries below the lowest live snapshot are dead
    # (entries above it stay — an outer panic re-cancels idempotently, and
    # positions relative to live snapshots must be preserved there only in
    # count; dropping any cancelled entry keeps relative order of the rest)
    ev_in = pos_e < state.ev_count[:, None]
    ev_keep = ev_in & (~state.ev_cancelled | (pos_e >= ev_min[:, None]))
    new_ev_key, new_ev_val, new_ev_meta = _stable_filter(
        ev_keep, [state.ev_key, state.ev_val, state.ev_meta])
    # cancelled flags move to their new positions
    newpos_e = jnp.cumsum(ev_keep, axis=1) - ev_keep.astype(I32)
    oh_e = (newpos_e[:, :, None] == pos_e[:, None, :]) & ev_keep[:, :, None]
    new_ev_cancelled = jnp.sum(
        state.ev_cancelled[:, :, None] & oh_e, axis=1)
    ev_drops = _dropped_below(ev_keep, ev_snaps)
    new_ev_snaps = jnp.clip(ev_snaps, 0, state.ev_count[:, None]) - ev_drops
    new_ev_count = jnp.sum(ev_keep.astype(I32), axis=1)

    sc = state.cs_scalars
    sc = sc.at[:, :, CS["journal_snapshot"]].set(new_j_snaps.astype(U32))
    sc = sc.at[:, :, CS["event_snapshot"]].set(new_ev_snaps.astype(U32))

    # (inside jit the arg is a fresh unflattened pytree — safe to mutate)
    state.j_slot = new_j_slot
    state.j_prev = new_j_prev
    state.j_count = new_j_count
    state.ev_key = new_ev_key
    state.ev_val = new_ev_val
    state.ev_meta = new_ev_meta
    state.ev_cancelled = new_ev_cancelled
    state.ev_count = new_ev_count
    state.cs_scalars = sc
    return state
