"""Device-side final net states — `get_final_net_states` for the batched engines.

The reference's end-of-run extraction (`get_final_net_states`,
/root/reference/src/testing/mod.rs:42-71) flattens the storage/event
histories into net outcomes: final storage, net events, net L1 messages
(the event sink's `flatten()` cancels timestamp-paired rollbacks,
/root/reference/src/reference_impls/event_sink.rs:66-131).  On the device
the same nets are already materialized by construction:

  * final storage  = the per-lane KV table (`st_key`/`st_val`/`st_used`) —
    journal rollbacks were replayed on panic, so the table holds net values;
  * net events     = the event journal (`ev_*`) minus `ev_cancelled`
    entries (panicked-frame segments are cancelled in place, the device
    form of the forward/rollback merge in event_sink.rs:154-175).

The journal stores (timestamp, aux, key, value, is_first, tx) but not the
emitting address/shard; `device_net_states` recovers the full
`EventMessage` shape by joining uncancelled journal entries with the
drained log-query stream on the (unique, strictly increasing) emission
timestamp.
"""

from __future__ import annotations

import numpy as np

from ..golden.queries import EventMessage
from ..isa import params
from ..utils import from_limbs


def storage_map_of(st_key, st_val, st_used, b) -> dict:
    """One lane's final storage {(shard, address, key): value} from the
    (host-read) KV table arrays."""
    m = {}
    for s in np.nonzero(st_used[b])[0]:
        key = from_limbs(st_key[b, s, :8])
        address = sum(int(st_key[b, s, 8 + i]) << (32 * i) for i in range(5))
        shard = int(st_key[b, s, 13])
        m[(shard, address, key)] = from_limbs(st_val[b, s])
    return m


def event_entries_of(ev_meta, ev_key, ev_val, ev_cancelled, ev_count,
                     b) -> list[tuple]:
    """One lane's uncancelled event-journal entries in emission order:
    (timestamp, aux_byte, key, value, is_first, tx_number_in_block)."""
    lane = []
    for i in range(int(ev_count[b])):
        if ev_cancelled[b, i]:
            continue
        packed = int(ev_meta[b, i, 1])
        lane.append((int(ev_meta[b, i, 0]), packed & 0xFF,
                     from_limbs(ev_key[b, i]), from_limbs(ev_val[b, i]),
                     bool((packed >> 8) & 1), (packed >> 16) & 0xFFFF))
    return lane


def device_storage_maps(state, config) -> list[dict]:
    """Per-lane final storage maps (net values — rollbacks already replayed)."""
    if config.storage_slots == 0:
        return [dict() for _ in range(config.batch)]
    st_key = np.asarray(state.st_key)
    st_val = np.asarray(state.st_val)
    st_used = np.asarray(state.st_used)
    return [storage_map_of(st_key, st_val, st_used, b)
            for b in range(config.batch)]


def device_event_entries(state) -> list[list[tuple]]:
    """Per-lane uncancelled event-journal entries in emission order."""
    ev_meta = np.asarray(state.ev_meta)
    ev_key = np.asarray(state.ev_key)
    ev_val = np.asarray(state.ev_val)
    ev_cancelled = np.asarray(state.ev_cancelled)
    ev_count = np.asarray(state.ev_count)
    return [event_entries_of(ev_meta, ev_key, ev_val, ev_cancelled,
                             ev_count, b)
            for b in range(ev_meta.shape[0])]


def messages_from_join(entries, by_ts: dict) -> tuple[list, list]:
    """Join journal entries with a {timestamp: (address, shard)} map to
    recover address/shard; split events vs L1 messages by aux byte.

    Every journal entry MUST join (the log queue records the same emission
    the journal did): a miss means the caller ran with event_slots > 0 but
    no log queue (log_queue_capacity == 0) or dropped the drained stream —
    silently defaulting address/shard to 0 would fabricate wrong
    EventMessages, so this raises instead."""
    events: list[EventMessage] = []
    l1: list[EventMessage] = []
    for ts, aux, key, value, is_first, tx in entries:
        hit = by_ts.get(ts)
        if hit is None:
            raise ValueError(
                f"event-journal entry at timestamp {ts} has no matching "
                "log-stream query — net states with events need "
                "log_queue_capacity > 0 and the full drained log stream")
        address, shard = hit
        msg = EventMessage(
            shard_id=shard, is_first=is_first,
            tx_number_in_block=tx,
            address=address, key=key, value=value)
        (events if aux == params.EVENT_AUX_BYTE else l1).append(msg)
    return events, l1


def messages_from_entries(entries, log_stream) -> tuple[list, list]:
    """messages_from_join over a LogQuery object stream."""
    return messages_from_join(
        entries, {q.timestamp: (q.address, q.shard_id) for q in log_stream})


def net_states_by_tx(state, config, log_streams) -> list[dict]:
    """Per-lane net outcomes grouped by `tx_number_in_block` — the
    bootloader block shape's extraction (one VM runs a bootloader that
    far-calls every transaction and advances the tx counter via
    Context.IncrementTxNumber between them; reference:
    /root/reference/src/opcodes/execution/context.rs:36-50, counter
    stamped onto every LogQuery/event at emission).

    Returns per lane {tx_number: {"events", "l1_messages", "storage_writes"}}
    where storage_writes lists that tx's NET storage log queries (rw_flag
    write entries from the drained stream) — the per-tx attribution a
    block explorer / prover needs from a single-VM multi-tx run."""
    entries = device_event_entries(state)
    out = []
    for b in range(config.batch):
        stream = log_streams[b] if b < len(log_streams) else []
        ev, l1 = messages_from_entries(entries[b], stream)
        lane: dict[int, dict] = {}

        def bucket(tx):
            return lane.setdefault(
                tx, {"events": [], "l1_messages": [], "storage_writes": []})

        for m in ev:
            bucket(m.tx_number_in_block)["events"].append(m)
        for m in l1:
            bucket(m.tx_number_in_block)["l1_messages"].append(m)
        for q in stream:
            if q.aux_byte == params.STORAGE_AUX_BYTE and q.rw_flag:
                bucket(q.tx_number_in_block)["storage_writes"].append(q)
        out.append(lane)
    return out


def device_net_states(state, config, log_streams) -> list[dict]:
    """Per-lane net outcomes, shaped like `testing.harness.get_final_net_states`
    minus the history fields (the ordered histories are the drained queue
    streams themselves): {"final_storage", "events", "l1_messages"}.

    `log_streams` is the lane-indexed drained log-query stream
    (witness.commitment.device_log_streams or a scheduler's accumulated
    per-tx stream) used to recover event address/shard fields."""
    storage = device_storage_maps(state, config)
    entries = device_event_entries(state)
    out = []
    for b in range(config.batch):
        ev, l1 = messages_from_entries(
            entries[b], log_streams[b] if b < len(log_streams) else [])
        out.append({"final_storage": storage[b],
                    "events": ev, "l1_messages": l1})
    return out
