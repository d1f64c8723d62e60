"""Golden VM semantics tests: arithmetic, flags, control flow, stack, UMA,
storage/events with rollback, near/far calls, witness stream shape."""

import pytest

from era_zk_evm_tpu.golden import MemoryType
from era_zk_evm_tpu.isa import params
from era_zk_evm_tpu.isa.abi import FatPointer
from era_zk_evm_tpu.testing.harness import (
    flags, get_final_net_states, reg, run_asm,
)

U256 = (1 << 256) - 1


class TestArithmetic:
    def test_add_basic(self):
        vm, _, _ = run_asm("""
            add 7, r0, r1
            add 35, r0, r2
            add r1, r2, r3
            ret r0
        """)
        assert reg(vm, 3) == 42

    def test_add_overflow_flags(self):
        vm, _, _ = run_asm("""
            add 1, r0, r1
            sub! r0, r1, r2      ; r2 = 0 - 1 -> underflow, lt set
            add! r2, r1, r3      ; max + 1 -> 0, of + eq
            ret r0
        """)
        assert reg(vm, 2) == U256
        assert reg(vm, 3) == 0
        f = flags(vm)
        assert f.overflow_or_less_than and f.equality and not f.greater_than

    def test_mul_div(self):
        vm, _, _ = run_asm("""
            add 1000, r0, r1
            add 999, r0, r2
            mul! r1, r2, r3, r4   ; 999000, high 0
            add 7, r0, r5
            div! r3, r5, r6, r7   ; q=142714, r=2
            ret r0
        """)
        assert reg(vm, 3) == 999000 and reg(vm, 4) == 0
        assert reg(vm, 6) == 142714 and reg(vm, 7) == 2
        f = flags(vm)
        assert not f.equality and not f.greater_than  # q!=0, r!=0

    def test_div_by_zero(self):
        vm, _, _ = run_asm("""
            add 5, r0, r1
            div! r1, r0, r2, r3
            ret r0
        """)
        assert reg(vm, 2) == 0 and reg(vm, 3) == 0
        assert flags(vm).overflow_or_less_than

    def test_mul_512_bit(self):
        vm, _, _ = run_asm("""
            add 1, r0, r1
            add 255, r0, r2
            shl r1, r2, r3        ; r3 = 2^255
            mul r3, r3, r4, r5    ; low = 0, high = 2^254
            ret r0
        """)
        assert reg(vm, 4) == 0
        assert reg(vm, 5) == 1 << 254

    def test_shift_rol_ror(self):
        vm, _, _ = run_asm("""
            add 1, r0, r1
            add 200, r0, r2
            shl r1, r2, r3        ; 2^200
            add 60, r0, r4
            rol r3, r4, r5        ; 2^(260 mod 256) = 2^4
            ror r1, r1, r6        ; ror(1,1) = 2^255
            shr! r1, r1, r7       ; 0, eq
            ret r0
        """)
        assert reg(vm, 5) == 1 << 4
        assert reg(vm, 6) == 1 << 255
        assert reg(vm, 7) == 0
        assert flags(vm).equality

    def test_binop(self):
        vm, _, _ = run_asm("""
            add 0b1100, r0, r1
            add 0b1010, r0, r2
            xor r1, r2, r3
            and r1, r2, r4
            or r1, r2, r5
            ret r0
        """)
        assert reg(vm, 3) == 0b0110
        assert reg(vm, 4) == 0b1000
        assert reg(vm, 5) == 0b1110

    def test_swap_operands(self):
        vm, _, _ = run_asm("""
            add 10, r0, r1
            add 3, r0, r2
            sub r1, r2, r3       ; 7
            sub.s r1, r2, r4     ; r2 - r1 = -7 mod 2^256
            ret r0
        """)
        assert reg(vm, 3) == 7
        assert reg(vm, 4) == (U256 - 6) & U256


class TestControlFlow:
    def test_loop_sum(self):
        vm, _, _ = run_asm("""
            add 1, r0, r10       ; const 1
            add 5, r0, r1        ; i = 5
            add 0, r0, r2        ; acc = 0
            loop:
            add r2, r1, r2
            sub! r1, r10, r1
            jump.if_ne @loop
            ret r0
        """, max_cycles=50)
        assert reg(vm, 2) == 15

    def test_masked_nop_preserves_pc_flow(self):
        vm, _, _ = run_asm("""
            add 1, r0, r1
            sub! r1, r1, r2      ; eq set
            add.if_ne 99, r0, r3 ; masked to nop
            add.if_eq 42, r0, r4
            ret r0
        """)
        assert reg(vm, 3) == 0
        assert reg(vm, 4) == 42


class TestStack:
    def test_push_pop(self):
        vm, _, _ = run_asm("""
            add 11, r0, r1
            add r1, r0, stack+=[1]   ; push 11
            add 22, r0, r2
            add r2, r0, stack+=[1]   ; push 22
            add stack-=[1], r0, r3   ; pop -> 22
            add stack-=[1], r0, r4   ; pop -> 11
            ret r0
        """)
        assert reg(vm, 3) == 22
        assert reg(vm, 4) == 11

    def test_absolute_and_offset(self):
        vm, _, _ = run_asm("""
            add 7, r0, r1
            add r1, r0, stack[100]
            add stack[100], r0, r2
            add 5, r0, r3
            add r3, r0, stack+=[1]     ; push at old sp
            add stack-[1], r0, r4      ; read sp-1 = pushed slot
            ret r0
        """)
        assert reg(vm, 2) == 7
        assert reg(vm, 4) == 5

    def test_sp_tracking(self):
        vm, _, _ = run_asm("""
            add 1, r0, stack+=[3]    ; sp += 3
            ctx.sp r1
            ret r0
        """)
        assert reg(vm, 1) == params.INITIAL_SP_ON_FAR_CALL + 3


class TestUMA:
    def test_aligned_heap_rw(self):
        vm, _, _ = run_asm("""
            add 1234, r0, r2
            st.h 64, r2
            ld.h 64, r3
            ret r0
        """)
        assert reg(vm, 3) == 1234

    def test_unaligned_heap_rw(self):
        vm, _, _ = run_asm("""
            add 5, r0, r1
            add 251, r0, r2
            shl r1, r2, r1          ; r1 = 5 << 251 (top bits set)
            add 3, r0, r5           ; offset 3, unaligned
            st.h r5, r1
            ld.h r5, r3
            ld.h 0, r4              ; word 0 now holds top bytes of r1
            ret r0
        """)
        assert reg(vm, 3) == reg(vm, 1)
        # first 3 bytes of word0 are zero, rest are r1's top bytes
        assert reg(vm, 4) == (reg(vm, 1) >> 24) & U256

    def test_uma_increment(self):
        vm, _, _ = run_asm("""
            add 777, r0, r2
            st.h 0, r2
            add 888, r0, r3
            st.h 32, r3
            ld.h.inc 0, r4, r5    ; r4 = mem[0], r5 = 32
            ld.h r5, r6           ; r6 = mem[32]
            ret r0
        """)
        assert reg(vm, 4) == 777
        assert reg(vm, 5) == 32
        assert reg(vm, 6) == 888

    def test_heap_growth_charges_ergs(self):
        vm1, _, _ = run_asm("ctx.ergs r1\n ret r0")
        base_ergs = reg(vm1, 1)
        vm2, _, _ = run_asm("""
            add 4096, r0, r1
            ld.h r1, r2
            ctx.ergs r3
            ret r0
        """)
        # growth = 4096+32 - stipend bound; charged 1 erg/byte
        expected_growth = 4096 + 32 - params.NEW_FRAME_MEMORY_STIPEND
        spent_delta = base_ergs - reg(vm2, 3)
        # account for the extra instructions (one more add + the uma op)
        overhead = params.AVERAGE_OPCODE_ERGS + params.UMA_ERGS
        assert spent_delta == expected_growth + overhead

    def test_deref_beyond_heap_range_panics_frame(self):
        vm, tools, _ = run_asm("""
            add 2000, r0, r9
            near_call r9, @body, @handler   ; cap the burnable ergs
            body:
            add 1, r0, r1
            add 250, r0, r2
            shl r1, r2, r1         ; huge offset
            ld.h r1, r3            ; deref beyond range -> pending panic
            add 123, r0, r4        ; skipped (pending exception fires)
            ret r0
            handler:
            add 55, r0, r5
            ret r0
        """)
        assert reg(vm, 5) == 55
        assert reg(vm, 4) == 0


class TestCalls:
    def test_near_call_ret(self):
        vm, _, _ = run_asm("""
            add 5, r0, r1
            near_call r0, @double, @fail
            add r1, r0, r2
            ret r0
            double:
            add r1, r1, r1
            ret r0
            fail:
            panic
        """)
        assert reg(vm, 2) == 10

    def test_near_call_panic_unwinds_to_handler(self):
        vm, _, _ = run_asm("""
            add 1, r0, r1
            near_call r0, @fail_fn, @handler
            add 999, r0, r2          ; skipped
            ret r0
            fail_fn:
            panic
            handler:
            add 77, r0, r3
            ret r0
        """)
        assert reg(vm, 3) == 77
        assert reg(vm, 2) == 0

    def test_panic_sets_lt_flag_and_handler_sees_it(self):
        vm, _, _ = run_asm("""
            near_call r0, @fail_fn, @handler
            fail_fn:
            panic
            handler:
            add.if_lt 1, r0, r5
            ret r0
        """)
        assert reg(vm, 5) == 1

    def test_near_call_ergs_accounting(self):
        vm, _, _ = run_asm("""
            add 1000, r0, r1
            near_call r1, @spin, @h   ; pass exactly 1000 ergs
            ctx.ergs r2
            ret r0
            spin:
            ctx.ergs r3
            ret r0
            h:
            panic
        """)
        # callee saw <= 1000 ergs
        assert reg(vm, 3) <= 1000


class TestStorageAndEvents:
    def test_storage_rw(self):
        vm, tools, _ = run_asm("""
            add 5, r0, r1          ; key
            add 70, r0, r2         ; value
            log.swrite r1, r2
            log.sread r1, r3
            ret r0
        """)
        assert reg(vm, 3) == 70
        final = get_final_net_states(tools)
        from era_zk_evm_tpu.testing import ENTRY_ADDRESS
        assert final["final_storage"][0][ENTRY_ADDRESS][5] == 70

    def test_storage_rollback_on_panic(self):
        vm, tools, _ = run_asm("""
            add 5, r0, r1
            add 70, r0, r2
            log.swrite r1, r2          ; committed value 70
            near_call r0, @mutate, @h
            done:
            log.sread r1, r4
            ret r0
            mutate:
            add 99, r0, r3
            log.swrite r1, r3          ; rolled back
            panic
            h:
            jump @done
        """)
        assert reg(vm, 4) == 70
        final = get_final_net_states(tools)
        from era_zk_evm_tpu.testing import ENTRY_ADDRESS
        assert final["final_storage"][0][ENTRY_ADDRESS][5] == 70

    def test_events_flatten_and_rollback_cancel(self):
        vm, tools, _ = run_asm("""
            add 1, r0, r1
            add 100, r0, r2
            log.event r1, r2            ; survives
            near_call r0, @emitter, @h
            done:
            ret r0
            emitter:
            add 2, r0, r3
            add 200, r0, r4
            log.event r3, r4            ; cancelled by panic
            panic
            h:
            jump @done
        """)
        final = get_final_net_states(tools)
        events = final["events"]
        assert len(events) == 1
        assert events[0].key == 1 and events[0].value == 100
        # history contains forward + rollback-marked twin
        assert len(final["event_history"]) == 3

    def test_l1_message(self):
        vm, tools, _ = run_asm("""
            add 9, r0, r1
            add 90, r0, r2
            log.to_l1.first r1, r2
            ret r0
        """)
        final = get_final_net_states(tools)
        assert len(final["l1_messages"]) == 1
        assert final["l1_messages"][0].is_first


class TestExceptionMasking:
    def test_static_context_write_panics(self):
        vm, _, _ = run_asm("""
            near_call r0, @w, @h
            done:
            ret r0
            w:
            add 1, r0, r1
            log.swrite r1, r1
            ret r0
            h:
            add 11, r0, r2
            jump @done
        """, is_static=True)
        assert reg(vm, 2) == 11

    def test_out_of_ergs_panics(self):
        vm, _, _ = run_asm("""
            add 10, r0, r1
            near_call r1, @spin, @h    ; only 10 ergs
            done:
            ret r0
            spin:
            jump @spin                  ; burns out
            h:
            add 5, r0, r3
            jump @done
        """, max_cycles=100)
        assert reg(vm, 3) == 5

    def test_kernel_only_from_user_mode_panics(self):
        vm, _, _ = run_asm("""
            near_call r0, @k, @h
            done:
            ret r0
            k:
            ctx.inc_tx
            ret r0
            h:
            add 3, r0, r9
            jump @done
        """, entry_address=0x1_0000)  # non-kernel address
        assert reg(vm, 9) == 3
        assert vm.local_state.tx_number_in_block == 0


class TestWitnessStream:
    def test_memory_queries_recorded_with_timestamps(self):
        vm, tools, cycles = run_asm("""
            add 1234, r0, r2
            st.h 0, r2
            ld.h 0, r3
            ret r0
        """)
        mq = [q for _, q in tools.witness.memory_queries]
        # an aligned heap write still pre-reads word 0 for the byte splice
        # (uma.rs:265-274), so: read(0) + write + read
        heap_ops = [q for q in mq if q.memory_type == MemoryType.HEAP]
        assert len(heap_ops) == 3
        pre_read, write, read = heap_ops
        assert not pre_read.rw_flag and pre_read.value == 0
        assert write.rw_flag and not read.rw_flag
        assert write.value == 1234 and read.value == 1234
        # write at ts+3 of its cycle; read at ts+0 of the next cycle;
        # timestamps strictly ordered
        assert write.timestamp < read.timestamp

    def test_code_read_caching(self):
        vm, tools, cycles = run_asm("""
            nop
            nop
            nop
            nop
            nop
            ret r0
        """)
        code_reads = [q for _, q in tools.witness.memory_queries
                      if q.memory_type == MemoryType.CODE]
        # 6 instructions = 2 code words; super-pc cache means exactly 2 reads
        assert len(code_reads) == 2

    def test_context_events(self):
        vm, tools, _ = run_asm("""
            near_call r0, @f, @h
            ret r0
            f:
            ret r0
            h:
            panic
        """)
        kinds = [(k, p) for _, k, p in tools.witness.context_events]
        # bootloader frame start + near-call start/finish + final finish
        assert kinds == [("start", None), ("start", None),
                         ("finish", False), ("finish", False)]
