"""Far-call / decommit / cross-contract golden tests (SURVEY.md §3.3-3.4)."""

from era_zk_evm_tpu.golden import BlockProperties
from era_zk_evm_tpu.isa import params
from era_zk_evm_tpu.isa.abi import (
    FarCallABI, FatPointer, ForwardingMode, RetABI, code_hash_for_bytecode,
)
from era_zk_evm_tpu.isa.assembler import assemble_to_code_words
from era_zk_evm_tpu.testing.harness import (
    build_vm, create_default_tools, reg, run,
)

CALLEE_ADDRESS = 0x10042  # user-space

PASS_ALL_ERGS = (1 << 32) - 1


def fc_abi(ergs: int = PASS_ALL_ERGS, mode=ForwardingMode.USE_HEAP,
           start: int = 0, length: int = 0) -> int:
    return FarCallABI(
        memory_quasi_fat_pointer=FatPointer(0, 0, start, length),
        ergs_passed=ergs, shard_id=0, forwarding_mode=mode,
        constructor_call=False, to_system=False).to_u256()


def ret_abi(start: int = 0, length: int = 0,
            mode=ForwardingMode.USE_HEAP) -> int:
    return RetABI(FatPointer(0, 0, start, length), mode).to_u256()


def setup_callee(tools, source: str, address: int = CALLEE_ADDRESS,
                 shard: int = 0):
    words = assemble_to_code_words(source)
    code_hash = code_hash_for_bytecode(words)
    tools.storage.populate([
        (shard, params.DEPLOYER_SYSTEM_CONTRACT_ADDRESS, address, code_hash)])
    tools.decommitter.populate([(code_hash, words)])
    return code_hash


def run_caller(tools, caller_src: str, **kwargs):
    vm = build_vm(assemble_to_code_words(caller_src), tools=tools, **kwargs)
    run(vm, max_cycles=500)
    return vm


class TestFarCall:
    def test_basic_far_call_and_return(self):
        tools = create_default_tools()
        setup_callee(tools, """
            add 11, r0, r5
            ret r0
        """)
        vm = run_caller(tools, f"""
            add code[@abi], r0, r4
            add code[@dest], r0, r2
            far_call r4, r2, @on_fail
            add 1, r0, r8
            ret r0
            on_fail:
            add 99, r0, r9
            ret r0
            abi: .word {fc_abi()}
            dest: .word {CALLEE_ADDRESS}
        """)
        assert reg(vm, 8) == 1
        assert reg(vm, 9) == 0
        assert reg(vm, 5) == 0  # callee registers wiped on far ret

    def test_far_call_calldata_and_returndata(self):
        tools = create_default_tools()
        setup_callee(tools, f"""
            ld.ptr r1, r5          ; calldata[0]
            add 1, r0, r6
            add r5, r6, r5
            st.h 0, r5             ; heap[0] = calldata[0] + 1
            add code[@rabi], r0, r7
            ret r7                 ; forward heap[0..32]
            rabi: .word {ret_abi(0, 32)}
        """)
        vm = run_caller(tools, f"""
            add 41, r0, r3
            st.h 0, r3
            add code[@abi], r0, r4
            add code[@dest], r0, r2
            far_call r4, r2, @on_fail
            ld.ptr r1, r10          ; returndata[0]
            ret r0
            on_fail:
            add 99, r0, r9
            ret r0
            abi: .word {fc_abi(length=32)}
            dest: .word {CALLEE_ADDRESS}
        """)
        assert reg(vm, 9) == 0
        assert reg(vm, 10) == 42

    def test_far_call_revert_runs_handler_and_rolls_back(self):
        tools = create_default_tools()
        setup_callee(tools, """
            add 5, r0, r1
            add 50, r0, r2
            log.swrite r1, r2
            revert r0
        """)
        vm = run_caller(tools, f"""
            add code[@abi], r0, r4
            add code[@dest], r0, r2
            far_call r4, r2, @on_fail
            add 1, r0, r8
            ret r0
            on_fail:
            add 5, r0, r1
            log.sread r1, r9       ; must observe rolled-back 0
            add 1, r0, r11
            ret r0
            abi: .word {fc_abi()}
            dest: .word {CALLEE_ADDRESS}
        """)
        assert reg(vm, 8) == 0
        assert reg(vm, 11) == 1
        assert reg(vm, 9) == 0

    def test_unknown_code_hash_panics_via_handler(self):
        # empty slot + zero default AA hash -> invalid format -> shorthand panic
        tools = create_default_tools()
        vm = run_caller(tools, f"""
            add code[@abi], r0, r4
            add code[@dest], r0, r2
            far_call r4, r2, @on_fail
            add 1, r0, r8
            ret r0
            on_fail:
            add 7, r0, r9
            ret r0
            abi: .word {fc_abi()}
            dest: .word {CALLEE_ADDRESS}
        """)
        assert reg(vm, 9) == 7
        assert reg(vm, 8) == 0

    def test_default_aa_masking(self):
        tools = create_default_tools()
        aa_src = f"""
            add 123, r0, r5
            st.h 0, r5
            add code[@rabi], r0, r7
            ret r7
            rabi: .word {ret_abi(0, 32)}
        """
        aa_words = assemble_to_code_words(aa_src)
        aa_hash = code_hash_for_bytecode(aa_words)
        tools.decommitter.populate([(aa_hash, aa_words)])
        vm = run_caller(tools, f"""
            add code[@abi], r0, r4
            add code[@dest], r0, r2
            far_call r4, r2, @on_fail
            ld.ptr r1, r10
            ret r0
            on_fail:
            add 9, r0, r9
            ret r0
            abi: .word {fc_abi()}
            dest: .word {CALLEE_ADDRESS}
        """, block_properties=BlockProperties(default_aa_code_hash=aa_hash))
        assert reg(vm, 9) == 0
        assert reg(vm, 10) == 123

    def test_63_64_rule(self):
        tools = create_default_tools()
        setup_callee(tools, f"""
            ctx.ergs r5
            st.h 0, r5
            add code[@rabi], r0, r7
            ret r7
            rabi: .word {ret_abi(0, 32)}
        """)
        vm = run_caller(tools, f"""
            add code[@abi], r0, r4
            add code[@dest], r0, r2
            ctx.ergs r6
            far_call r4, r2, @on_fail
            ld.ptr r1, r10
            add r6, r0, r11         ; keep "before" for assertions? r6 survives? no
            ret r0
            on_fail:
            panic
            abi: .word {fc_abi()}
            dest: .word {CALLEE_ADDRESS}
        """)
        # r6 was wiped by the far ret; use heap round-trip value instead:
        callee_saw = reg(vm, 10)
        assert 0 < callee_saw < (1 << 27)  # strictly less than entry ergs

    def test_repeat_decommit_traced_once(self):
        tools = create_default_tools()
        setup_callee(tools, "ret r0")
        vm = run_caller(tools, f"""
            add code[@abi], r0, r4
            add code[@dest], r0, r2
            far_call r4, r2, @fail
            add code[@abi], r0, r4
            add code[@dest], r0, r2
            far_call r4, r2, @fail
            add 1, r0, r8
            ret r0
            fail:
            panic
            abi: .word {fc_abi()}
            dest: .word {CALLEE_ADDRESS}
        """)
        assert reg(vm, 8) == 1
        fresh = [d for d in tools.witness.decommittments if d[1].is_fresh]
        stale = [d for d in tools.witness.decommittments if not d[1].is_fresh]
        assert len(fresh) == 1
        assert len(stale) == 1 and stale[0][2] == []

    def test_mimic_requires_kernel(self):
        tools = create_default_tools()
        setup_callee(tools, "ret r0")
        # a decode-masked panic unwinds the CURRENT frame, so observe it
        # through a near-call exception handler
        vm = run_caller(tools, f"""
            add 10000, r0, r7
            near_call r7, @do_mimic, @fail
            done:
            ret r0
            do_mimic:
            add code[@abi], r0, r4
            add code[@dest], r0, r2
            mimic_call r4, r2, @unused
            unused:
            ret r0
            fail:
            add 3, r0, r9
            jump @done
            abi: .word {fc_abi()}
            dest: .word {CALLEE_ADDRESS}
        """, entry_address=0x2_0000)
        assert reg(vm, 9) == 3

    def test_delegate_call_preserves_identity(self):
        tools = create_default_tools()
        # callee stores ctx.this into the shared storage slot
        setup_callee(tools, """
            ctx.this r5
            add 1, r0, r6
            log.swrite r6, r5
            ret r0
        """)
        vm = run_caller(tools, f"""
            add code[@abi], r0, r4
            add code[@dest], r0, r2
            delegate_call r4, r2, @fail
            add 1, r0, r6
            log.sread r6, r10
            ret r0
            fail:
            panic
            abi: .word {fc_abi()}
            dest: .word {CALLEE_ADDRESS}
        """)
        # under delegate, `this` stays the caller's address
        from era_zk_evm_tpu.testing.harness import ENTRY_ADDRESS
        assert reg(vm, 10) == ENTRY_ADDRESS

    def test_static_call_propagates(self):
        tools = create_default_tools()
        setup_callee(tools, """
            add 1, r0, r5
            log.swrite r5, r5      ; banned in static -> masked panic
            ret r0
        """)
        vm = run_caller(tools, f"""
            add code[@abi], r0, r4
            add code[@dest], r0, r2
            far_call.static r4, r2, @fail
            add 1, r0, r8
            ret r0
            fail:
            add 3, r0, r9
            ret r0
            abi: .word {fc_abi()}
            dest: .word {CALLEE_ADDRESS}
        """)
        assert reg(vm, 9) == 3
