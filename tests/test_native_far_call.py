"""Native C++ oracle vs golden: FAR_CALL / decommit / returndata / UMA fat-ptr.

Extends the native-vs-golden comparison to the full call protocol: contract
bank staging, deployer-space code-hash storage, decommit witness (fresh +
repeat refunds), calldata/returndata fat pointers, delegate/mimic modes,
and the context setters (the pieces added to the native oracle after the
round-1 subset)."""

import pytest

from era_zk_evm_tpu.golden import BlockProperties
from era_zk_evm_tpu.isa import params
from era_zk_evm_tpu.isa.abi import (
    FarCallABI, FatPointer, ForwardingMode, RetABI, code_hash_for_bytecode,
)
from era_zk_evm_tpu.isa.assembler import assemble_to_code_words
from era_zk_evm_tpu.native import ST_DONE, run_oracle
from era_zk_evm_tpu.testing import harness
from era_zk_evm_tpu.witness.commitment import (
    serialize_log_query, serialize_memory_query,
)

CALLEE_ADDR = 0x30055
ERGS = 1 << 20


def _fc_abi(length=32, mode=ForwardingMode.USE_HEAP, ergs=(1 << 32) - 1,
            ctor=False, system=False, start=0):
    return FarCallABI(FatPointer(0, 0, start, length), ergs, 0, mode,
                      ctor, system).to_u256()


def _ret_abi(length=32, mode=ForwardingMode.USE_HEAP, start=0):
    return RetABI(FatPointer(0, 0, start, length), mode).to_u256()


def _compare_fc(src: str, contracts: list[tuple[int, str]],
                default_aa_source: str | None = None,
                max_cycles: int = 256,
                entry_address: int = harness.ENTRY_ADDRESS) -> None:
    bank = []
    storage_entries = []
    for address, c_src in contracts:
        words = assemble_to_code_words(c_src)
        h = code_hash_for_bytecode(words)
        bank.append((h, words))
        storage_entries.append(
            (params.DEPLOYER_SYSTEM_CONTRACT_ADDRESS, address, h))
    aa_hash = 0
    if default_aa_source is not None:
        aa_words = assemble_to_code_words(default_aa_source)
        aa_hash = code_hash_for_bytecode(aa_words)
        bank.append((aa_hash, aa_words))

    # golden run with the same staging
    tools = harness.create_default_tools()
    if storage_entries:
        tools.storage.populate([(0, a, k, v) for a, k, v in storage_entries])
    tools.decommitter.populate([(h, list(w)) for h, w in bank])
    vm = harness.build_vm(
        assemble_to_code_words(src), tools=tools, ergs=ERGS,
        block_properties=BlockProperties(default_aa_code_hash=aa_hash),
        entry_address=entry_address)
    cycles = harness.run(vm, max_cycles)

    native = run_oracle(
        assemble_to_code_words(src), entry_address=entry_address, ergs=ERGS,
        max_cycles=max_cycles, contracts=bank,
        storage_entries=[(a, k, v) for a, k, v in storage_entries],
        default_aa_hash=aa_hash)

    assert native["status"] == ST_DONE, native["status"]
    assert native["cycles"] == cycles
    for i in range(15):
        want = vm.local_state.registers[i]
        assert native["registers"][i] == want.value, f"r{i+1}"
        assert native["reg_ptr"][i] == want.is_pointer, f"r{i+1}.ptr"
    lt, eq, gt = native["flags"]
    f = vm.local_state.flags
    assert (lt, eq, gt) == (f.overflow_or_less_than, f.equality,
                            f.greater_than)
    want_heap = vm.memory.dump_page(harness.ENTRY_BASE_PAGE + 2, 0, 64)
    assert native["heap"] == want_heap
    want_records = [serialize_memory_query(q)
                    for _, q in tools.witness.memory_queries]
    assert native["witness_count"] == len(want_records)
    assert native["witness_records"] == want_records
    want_logs = [serialize_log_query(q) for _, q in tools.witness.log_queries]
    assert native["log_records"] == want_logs
    # decommit-witness stream
    want_dec = tools.witness.decommittments
    assert len(native["decommit_records"]) == len(want_dec)
    for got, (_, q, _words) in zip(native["decommit_records"], want_dec):
        assert got["hash"] == q.hash
        assert got["timestamp"] == q.timestamp
        assert got["page"] == q.memory_page
        assert got["length"] == q.decommitted_length
        assert got["is_fresh"] == q.is_fresh
    root = vm.local_state.callstack.current
    leftover = root.ergs_remaining - (params.VM_INITIAL_FRAME_ERGS - ERGS)
    assert native["entry_ergs"] == leftover


CALLEE_ECHO = f"""
    ld.ptr r1, r5
    add 1, r0, r6
    add r5, r6, r5
    st.h 0, r5
    add code[@rabi], r0, r7
    ret r7
    rabi: .word {_ret_abi(32)}
"""


class TestNativeFarCall:
    def test_basic_call_and_returndata(self):
        src = f"""
            add 41, r0, r3
            st.h 0, r3
            add code[@abi], r0, r4
            add code[@dest], r0, r2
            far_call r4, r2, @fail
            ld.ptr r1, r8
            ret r0
            fail:
            panic
            abi: .word {_fc_abi(32)}
            dest: .word {CALLEE_ADDR}
        """
        _compare_fc(src, [(CALLEE_ADDR, CALLEE_ECHO)])

    def test_repeat_decommit_refund(self):
        src = f"""
            add 10, r0, r3
            st.h 0, r3
            add code[@abi], r0, r4
            add code[@dest], r0, r2
            far_call r4, r2, @fail
            ld.ptr r1, r5
            far_call r4, r2, @fail
            ld.ptr r1, r6
            ret r0
            fail:
            panic
            abi: .word {_fc_abi(32)}
            dest: .word {CALLEE_ADDR}
        """
        _compare_fc(src, [(CALLEE_ADDR, CALLEE_ECHO)])

    def test_callee_revert_rolls_back_storage(self):
        callee = f"""
            add 5, r0, r1
            add 123, r0, r2
            log.swrite r1, r2
            log.event r1, r2
            add code[@rabi], r0, r7
            revert r7
            rabi: .word {_ret_abi(0)}
        """
        src = f"""
            add 5, r0, r1
            add 7, r0, r2
            log.swrite r1, r2
            add code[@abi], r0, r4
            add code[@dest], r0, r2
            far_call r4, r2, @handler
            add 1, r0, r9
            jump @out
            handler:
            log.sread r1, r10
            out:
            ret r0
            abi: .word {_fc_abi(0)}
            dest: .word {CALLEE_ADDR}
        """
        _compare_fc(src, [(CALLEE_ADDR, callee)])

    def test_delegate_preserves_sender_and_storage_context(self):
        callee = """
            ctx.this r5
            ctx.caller r6
            ctx.code_addr r7
            add 9, r0, r1
            add 55, r0, r2
            log.swrite r1, r2
            ret r0
        """
        src = f"""
            add code[@abi], r0, r4
            add code[@dest], r0, r2
            delegate_call r4, r2, @fail
            add 9, r0, r1
            log.sread r1, r8
            ret r0
            fail:
            panic
            abi: .word {_fc_abi(0)}
            dest: .word {CALLEE_ADDR}
        """
        _compare_fc(src, [(CALLEE_ADDR, callee)])

    def test_mimic_call_sender_from_r15(self):
        callee = """
            ctx.caller r5
            st.h 0, r5
            ret r0
        """
        src = f"""
            add 0xDEAD, r0, r15
            add code[@abi], r0, r4
            add code[@dest], r0, r2
            mimic_call r4, r2, @fail
            ret r0
            fail:
            panic
            abi: .word {_fc_abi(0)}
            dest: .word {CALLEE_ADDR}
        """
        # mimic requires kernel mode: run from a kernel entry address
        _compare_fc(src, [(CALLEE_ADDR, callee)], entry_address=0x8001)

    def test_default_aa_fallback(self):
        aa = """
            add 777, r0, r5
            st.h 0, r5
            ret r0
        """
        src = f"""
            add code[@abi], r0, r4
            add code[@dest], r0, r2
            far_call r4, r2, @fail
            add 3, r0, r9
            ret r0
            fail:
            panic
            abi: .word {_fc_abi(0)}
            dest: .word 0x99999
        """
        _compare_fc(src, [], default_aa_source=aa)

    def test_far_call_out_of_ergs_unwinds_to_handler(self):
        # unknown dest hash in kernel space: bad-hash exception -> pending
        # panic -> handler; no decommit
        src = f"""
            add code[@abi], r0, r4
            add code[@dest], r0, r2
            far_call r4, r2, @handler
            panic
            handler:
            add 11, r0, r9
            ret r0
            abi: .word {_fc_abi(0)}
            dest: .word 0x7777
        """
        _compare_fc(src, [(CALLEE_ADDR, CALLEE_ECHO)])

    def test_fat_pointer_arithmetic_on_calldata(self):
        callee = f"""
            add 4, r0, r6
            ptr.add r1, r6, r2
            ld.ptr r2, r5
            st.h 0, r5
            ptr.shrink r1, r6, r3
            ptr.pack r1, r0, r4
            ret r0
        """
        src = f"""
            add code[@w], r0, r3
            st.h 0, r3
            st.h 32, r3
            add code[@abi], r0, r4
            add code[@dest], r0, r2
            far_call r4, r2, @fail
            ret r0
            fail:
            panic
            abi: .word {_fc_abi(64)}
            dest: .word {CALLEE_ADDR}
            w: .word {int.from_bytes(bytes(range(32)), 'big')}
        """
        _compare_fc(src, [(CALLEE_ADDR, callee)])

    def test_static_far_call_write_panics(self):
        callee = """
            add 5, r0, r1
            log.swrite r1, r1
            ret r0
        """
        src = f"""
            add code[@abi], r0, r4
            add code[@dest], r0, r2
            far_call.static r4, r2, @handler
            panic
            handler:
            add 21, r0, r9
            ret r0
            abi: .word {_fc_abi(0)}
            dest: .word {CALLEE_ADDR}
        """
        _compare_fc(src, [(CALLEE_ADDR, callee)])

    def test_context_setters_and_pubdata(self):
        # kernel entry: set ergs_per_pubdata + tx number, then pay pubdata
        src = """
            add 3, r0, r7
            ctx.set_pubdata r7
            ctx.inc_tx
            ctx.meta r5
            add 5, r0, r1
            add 70, r0, r2
            log.swrite r1, r2
            log.to_l1 r1, r2
            ctx.get_u128 r6
            ret r0
        """
        _compare_fc(src, [], entry_address=0x8001)

    def test_context_u128_flows_into_callee(self):
        callee = """
            ctx.get_u128 r5
            st.h 0, r5
            ret r0
        """
        src = f"""
            add 77, r0, r7
            ctx.set_u128 r7
            add code[@abi], r0, r4
            add code[@dest], r0, r2
            far_call r4, r2, @fail
            ctx.get_u128 r9
            ret r0
            fail:
            panic
            abi: .word {_fc_abi(0)}
            dest: .word {CALLEE_ADDR}
        """
        _compare_fc(src, [(CALLEE_ADDR, callee)], entry_address=0x8001)


class TestNativeFarCallFuzz:
    def test_random_scenarios(self):
        """Reuse the device fuzz scenario generator: random callees
        (ret/revert/plain-exit) x random callers (pass-all / zero / partial
        ergs) compared native-vs-golden on every observable."""
        from tests.test_batched_far_call import _random_far_call_scenario

        for seed in (0xC01, 0xC02, 0xC03, 0xC04):
            callers, contracts = _random_far_call_scenario(seed)
            for src in callers:
                _compare_fc(src, contracts, max_cycles=192)
