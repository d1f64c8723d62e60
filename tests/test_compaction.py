"""Journal/event compaction: mid-run compaction must preserve every future
rollback and every net observable (storage values, net events, registers)."""

import numpy as np

from era_zk_evm_tpu.isa.assembler import assemble_to_code_words
from era_zk_evm_tpu.models import VmConfig, make_entry_state, run_cycles
from era_zk_evm_tpu.models.compaction import compact_log_state
from era_zk_evm_tpu.utils import from_limbs


def _config(batch, journal_slots=8, event_slots=8, storage_slots=8):
    return VmConfig(batch=batch, queue_capacity=0, heap_words=16,
                    stack_words=2048, code_words=64, max_depth=8,
                    storage_slots=storage_slots, journal_slots=journal_slots,
                    event_slots=event_slots)


# entry frame writes (droppable under the base-depth contract), then an
# inner frame whose write/event must still roll back AFTER compaction
PROG_PANIC = """
    add 5, r0, r1
    add 1, r0, r2
    log.swrite r1, r2
    log.event r1, r2
    add 3000, r0, r9
    near_call r9, @inner, @h
    done:
    log.sread r1, r4
    ret r0
    inner:
    add 99, r0, r3
    log.swrite r1, r3
    log.event r3, r3
    add r0, r0, r8
    panic
    h:
    jump @done
"""

# same shape but the inner frame returns cleanly (journal entries survive
# as history; nothing rolls back)
PROG_OK = """
    add 5, r0, r1
    add 2, r0, r2
    log.swrite r1, r2
    log.event r1, r2
    add 3000, r0, r9
    near_call r9, @inner, @h
    done:
    log.sread r1, r4
    ret r0
    inner:
    add 88, r0, r3
    log.swrite r1, r3
    log.event r3, r3
    add r0, r0, r8
    ret r0
    h:
    jump @done
"""


def _observables(state, config):
    st_key = np.asarray(state.st_key)
    st_val = np.asarray(state.st_val)
    st_used = np.asarray(state.st_used)
    ev_key = np.asarray(state.ev_key)
    ev_val = np.asarray(state.ev_val)
    ev_meta = np.asarray(state.ev_meta)
    ev_cancelled = np.asarray(state.ev_cancelled)
    ev_count = np.asarray(state.ev_count)
    out = []
    for b in range(config.batch):
        storage = {}
        for s in range(config.storage_slots):
            if st_used[b, s]:
                storage[from_limbs(st_key[b, s, :8])] = from_limbs(st_val[b, s])
        events = [(from_limbs(ev_key[b, i]), from_limbs(ev_val[b, i]),
                   int(ev_meta[b, i, 0]))
                  for i in range(int(ev_count[b])) if not ev_cancelled[b, i]]
        out.append({
            "storage": storage, "events": events,
            "regs": np.asarray(state.regs)[b].tolist(),
            "flags": np.asarray(state.flags)[b].tolist(),
            "done": bool(np.asarray(state.done)[b]),
            "err": bool(np.asarray(state.lane_error)[b]),
        })
    return out


class TestCompaction:
    def test_midframe_compaction_preserves_rollback(self):
        programs = [PROG_PANIC, PROG_OK]
        config = _config(len(programs))
        words = [assemble_to_code_words(p) for p in programs]

        plain = run_cycles(
            make_entry_state(config, words, ergs=1 << 20), config, 32)
        # split inside the inner frame, after its write/event (cycle 10)
        state = make_entry_state(config, words, ergs=1 << 20)
        state = run_cycles(state, config, 10)
        state = compact_log_state(state, config)
        j_count = np.asarray(state.j_count)
        # entry-frame journal entry dropped, inner entry kept
        assert j_count.tolist() == [1, 1]
        state = run_cycles(state, config, 22)

        got = _observables(state, config)
        want = _observables(plain, config)
        assert got == want
        # and the semantics themselves: lane 0 rolled back to 1, lane 1 kept 88
        assert got[0]["storage"][5] == 1
        assert got[1]["storage"][5] == 88
        assert len(got[0]["events"]) == 1
        assert len(got[1]["events"]) == 2

    def test_cancelled_events_below_base_are_dropped(self):
        programs = [PROG_PANIC]
        config = _config(1)
        words = [assemble_to_code_words(p) for p in programs]
        state = run_cycles(
            make_entry_state(config, words, ergs=1 << 20), config, 32)
        before = _observables(state, config)
        ev_count_before = int(np.asarray(state.ev_count)[0])
        assert ev_count_before == 2  # one live + one cancelled
        state = compact_log_state(state, config)
        assert int(np.asarray(state.ev_count)[0]) == 1  # cancelled dropped
        # whole journal droppable once only base frames are live
        assert int(np.asarray(state.j_count)[0]) == 0
        assert _observables(state, config) == before

    def test_repeated_compaction_fixed_capacity(self):
        # a long-running entry frame writing in a loop: periodic compaction
        # keeps a tiny journal serving many more writes than its capacity
        prog = """
            add 16, r0, r13
            add 1, r0, r10
            loop:
            add r13, r0, r1
            log.swrite r1, r13
            log.event r1, r13
            sub! r13, r10, r13
            jump.if_ne @loop
            ret r0
        """
        config = _config(1, journal_slots=6, event_slots=32, storage_slots=16)
        words = [assemble_to_code_words(prog)]
        state = make_entry_state(config, words, ergs=1 << 20)
        for _ in range(20):
            state = run_cycles(state, config, 5)  # one loop iteration
            state = compact_log_state(state, config)
        state = run_cycles(state, config, 16)
        assert bool(np.asarray(state.done)[0])
        assert not bool(np.asarray(state.lane_error)[0])
        got = _observables(state, config)[0]
        assert got["storage"] == {k: k for k in range(1, 17)}
        assert len(got["events"]) == 16
