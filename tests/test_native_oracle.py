"""Native C++ oracle vs the golden Python model (and the pinned witness
record serialization) on the shared opcode subset."""

import random

import pytest

from era_zk_evm_tpu.isa.assembler import assemble_to_code_words
from era_zk_evm_tpu.native import ST_DONE, run_oracle
from era_zk_evm_tpu.testing.harness import run_golden_like
from era_zk_evm_tpu.witness.commitment import (
    serialize_log_query, serialize_memory_query,
)

PROGRAMS = [
    # storage + events with near-call rollback
    """
    add 5, r0, r1
    add 70, r0, r2
    log.swrite r1, r2
    log.sread r1, r3
    log.event.first r1, r2
    log.to_l1 r2, r1
    add 3000, r0, r9
    near_call r9, @m, @h
    done:
    log.sread r1, r4
    ret r0
    m:
    add 99, r0, r3
    log.swrite r1, r3
    log.event r3, r3
    panic
    h:
    jump @done
    """,
    """
    add 7, r0, r1
    add 35, r0, r2
    add! r1, r2, r3
    sub! r3, r1, r4
    mul r3, r4, r5, r6
    div! r5, r2, r7, r8
    ret r0
    """,
    """
    add 1, r0, r10
    add 6, r0, r1
    add 0, r0, r2
    loop:
    add r2, r1, r2
    sub! r1, r10, r1
    jump.if_ne @loop
    ret r0
    """,
    """
    add 11, r0, r1
    add r1, r0, stack+=[1]
    add 22, r0, r2
    add r2, r0, stack+=[1]
    add stack-=[1], r0, r3
    add stack-=[1], r0, r4
    add stack[100], r0, r5
    add code[@k], r0, r6
    ret r0
    k: .word 0x1122334455667788990011223344556677889900112233445566778899001122
    """,
    """
    add 777, r0, r2
    st.h 0, r2
    add 5, r0, r1
    add 251, r0, r3
    shl r1, r3, r4
    add 3, r0, r5
    st.h r5, r4
    ld.h r5, r6
    ld.h.inc 0, r7, r8
    st.ah 32, r2
    ld.ah 32, r9
    ret r0
    """,
    """
    add 5, r0, r1
    near_call r0, @double, @fail
    add r1, r0, r2
    ret r0
    double:
    add r1, r1, r1
    ret r0
    fail:
    panic
    """,
    """
    add 2000, r0, r9
    near_call r9, @f, @handler
    done:
    add.if_lt 77, r0, r3
    ret r0
    f:
    add 5, r0, r1
    ptr.add r1, r2, r3     ; not a pointer -> shorthand panic
    ret r0
    handler:
    add 55, r0, r5
    jump @done
    """,
    """
    ctx.ergs r1
    ctx.sp r2
    ctx.this r3
    shl! r1, r2, r4
    rol r3, r1, r5
    xor r4, r5, r6
    and r4, r5, r7
    or! r4, r5, r8
    ret r0
    """,
]


def _compare(src: str, max_cycles: int = 256) -> None:
    vm, tools, cycles = run_golden_like(src, max_cycles)
    native = run_oracle(assemble_to_code_words(src), max_cycles=max_cycles)
    assert native["status"] == ST_DONE, native["status"]
    assert native["cycles"] == cycles
    # final register file (post-exit wipe incl. the returndata pointer in r1)
    for i in range(15):
        want = vm.local_state.registers[i]
        assert native["registers"][i] == want.value, f"r{i+1}"
        assert native["reg_ptr"][i] == want.is_pointer, f"r{i+1}.ptr"
    lt, eq, gt = native["flags"]
    f = vm.local_state.flags
    assert (lt, eq, gt) == (f.overflow_or_less_than, f.equality,
                            f.greater_than)
    # heap contents
    heap_page = 10
    want_heap = vm.memory.dump_page(heap_page, 0, 64)
    assert native["heap"] == want_heap
    # witness stream: byte-identical to the pinned record serialization
    want_records = [serialize_memory_query(q)
                    for _, q in tools.witness.memory_queries]
    assert native["witness_count"] == len(want_records)
    assert native["witness_records"] == want_records
    # LOG-family observables
    want_logs = [serialize_log_query(q) for _, q in tools.witness.log_queries]
    assert native["log_records"] == want_logs
    for shard in range(len(vm.storage.inner)):
        for address, slots in vm.storage.inner[shard].items():
            for key, val in slots.items():
                assert native["storage"].get((address, key), 0) == val
    _, want_events, want_l1 = __import__(
        "era_zk_evm_tpu.testing.differential",
        fromlist=["_flatten_copy"])._flatten_copy(tools)
    want_all = [(2, e.is_first, e.key, e.value) for e in want_events] \
        + [(3, e.is_first, e.key, e.value) for e in want_l1]
    got_all = [(e["aux"], e["is_first"], e["key"], e["value"])
               for e in native["events"]]
    assert sorted(got_all) == sorted(want_all)
    # entry-frame leftover ergs returned to the root (the golden root frame
    # started at VM_INITIAL_FRAME_ERGS - ergs; the native root starts at 0)
    from era_zk_evm_tpu.isa import params

    root = vm.local_state.callstack.current
    leftover = root.ergs_remaining - (params.VM_INITIAL_FRAME_ERGS - (1 << 20))
    assert native["entry_ergs"] == leftover


class TestNativeOracle:
    @pytest.mark.parametrize("idx", range(len(PROGRAMS)))
    def test_programs(self, idx):
        _compare(PROGRAMS[idx])

    def test_random_fuzz(self):
        from tests.test_batched_vm import _random_program

        rng = random.Random(0xBEEF)
        for _ in range(20):
            _compare(_random_program(rng), max_cycles=192)
