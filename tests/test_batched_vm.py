"""Differential conformance: batched TPU interpreter vs the golden oracle."""

import random

import pytest

from era_zk_evm_tpu.testing.differential import diff_run

BASIC_PROGRAMS = [
    # arithmetic + flags
    """
    add 7, r0, r1
    add 35, r0, r2
    add! r1, r2, r3
    sub! r3, r1, r4
    ret r0
    """,
    # overflow / underflow flags
    """
    add 1, r0, r1
    sub! r0, r1, r2
    add! r2, r1, r3
    add.if_eq 5, r0, r4
    add.if_lt 6, r0, r5
    ret r0
    """,
    # mul/div incl. by-zero
    """
    add 1000, r0, r1
    add 999, r0, r2
    mul! r1, r2, r3, r4
    add 7, r0, r5
    div! r3, r5, r6, r7
    div! r6, r0, r8, r9
    ret r0
    """,
    # shifts and rotates
    """
    add 1, r0, r1
    add 200, r0, r2
    shl r1, r2, r3
    add 60, r0, r4
    rol r3, r4, r5
    ror r1, r1, r6
    shr! r1, r1, r7
    ret r0
    """,
    # binops
    """
    add 12, r0, r1
    add 10, r0, r2
    xor r1, r2, r3
    and r1, r2, r4
    or! r1, r2, r5
    ret r0
    """,
    # swapped operands
    """
    add 10, r0, r1
    add 3, r0, r2
    sub.s r1, r2, r3
    sub r1, r2, r4
    shl.s r2, r1, r5
    ret r0
    """,
]

CONTROL_FLOW = [
    # loop with conditional backward jump
    """
    add 1, r0, r10
    add 5, r0, r1
    add 0, r0, r2
    loop:
    add r2, r1, r2
    sub! r1, r10, r1
    jump.if_ne @loop
    ret r0
    """,
    # masked nops
    """
    add 1, r0, r1
    sub! r1, r1, r2
    add.if_ne 99, r0, r3
    add.if_eq 42, r0, r4
    add.if_gt 17, r0, r5
    add.if_le 23, r0, r6
    ret r0
    """,
    # jump via register
    """
    add 4, r0, r1
    jump r1
    add 111, r0, r2     ; skipped
    add 222, r0, r3     ; skipped
    add 5, r0, r4
    ret r0
    """,
]

STACK_PROGRAMS = [
    """
    add 11, r0, r1
    add r1, r0, stack+=[1]
    add 22, r0, r2
    add r2, r0, stack+=[1]
    add stack-=[1], r0, r3
    add stack-=[1], r0, r4
    ret r0
    """,
    """
    add 7, r0, r1
    add r1, r0, stack[100]
    add stack[100], r0, r2
    add 5, r0, r3
    add r3, r0, stack+=[1]
    add stack-[1], r0, r4
    ctx.sp r5
    ret r0
    """,
    # code-page constants
    """
    add code[@k1], r0, r1
    add code[@k2], r0, r2
    add r1, r2, r3
    ret r0
    k1: .word 0xdeadbeefcafebabe112233445566778899aabbccddeeff0012345678deadbeef
    k2: .word 0x1
    """,
]

UMA_PROGRAMS = [
    # aligned heap rw
    """
    add 1234, r0, r2
    st.h 64, r2
    ld.h 64, r3
    ret r0
    """,
    # unaligned rw + word0 inspection
    """
    add 5, r0, r1
    add 251, r0, r2
    shl r1, r2, r1
    add 3, r0, r5
    st.h r5, r1
    ld.h r5, r3
    ld.h 0, r4
    ld.h 32, r6
    ret r0
    """,
    # increment variants
    """
    add 777, r0, r2
    st.h 0, r2
    add 888, r0, r3
    st.h 32, r3
    ld.h.inc 0, r4, r5
    ld.h r5, r6
    st.h.inc 64, r2, r7
    ret r0
    """,
    # aux heap
    """
    add 4242, r0, r2
    st.ah 0, r2
    ld.ah 0, r3
    ld.h 0, r4
    ret r0
    """,
    # heap growth ergs
    """
    add 1500, r0, r1
    ld.h r1, r2
    ctx.ergs r3
    st.ah 1100, r3
    ctx.ergs r4
    ret r0
    """,
]

CALL_PROGRAMS = [
    # near call + local ret
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
    # panic unwinds to handler, lt flag set
    """
    add 2000, r0, r9
    near_call r9, @fail_fn, @handler
    add 999, r0, r2
    ret r0
    fail_fn:
    panic
    handler:
    add.if_lt 77, r0, r3
    ret r0
    """,
    # nested near calls
    """
    add 1, r0, r1
    near_call r0, @f1, @h
    ret r0
    f1:
    add r1, r1, r1
    near_call r0, @f2, @h
    add r1, r1, r1
    ret r0
    f2:
    add r1, r1, r1
    ret r0
    h:
    panic
    """,
    # ergs-limited near call burns out
    """
    add 30, r0, r1
    near_call r1, @spin, @h
    done:
    ret r0
    spin:
    jump @spin
    h:
    add 5, r0, r3
    jump @done
    """,
    # to-label ret
    """
    add 3000, r0, r9
    near_call r9, @f, @h
    add 1, r0, r5          ; skipped by ret-to-label
    elsewhere:
    ret r0
    f:
    ret.to_label r0, @elsewhere
    h:
    panic
    """,
]

CONTEXT_PROGRAMS = [
    """
    ctx.this r1
    ctx.caller r2
    ctx.code_addr r3
    ctx.ergs r4
    ctx.sp r5
    ctx.meta r6
    ctx.get_u128 r7
    ret r0
    """,
    """
    add 99, r0, r1
    ctx.set_u128 r1
    ctx.set_pubdata r1
    ctx.inc_tx
    ctx.inc_tx
    ctx.meta r2
    ret r0
    """,
]

PTR_PROGRAMS = [
    # ptr ops on a hand-built pointer in kernel mode: build via ptr.pack?
    # pointers can only originate from calls; exercise the panic paths instead
    """
    add 2000, r0, r9
    near_call r9, @bad_ptr, @h
    done:
    ret r0
    bad_ptr:
    add 5, r0, r1
    ptr.add r1, r2, r3     ; src0 not a pointer -> shorthand panic
    ret r0
    h:
    add 66, r0, r4
    jump @done
    """,
    # uma deref beyond heap range panics the frame
    """
    add 2000, r0, r9
    near_call r9, @body, @handler
    done:
    ret r0
    body:
    add 1, r0, r1
    add 250, r0, r2
    shl r1, r2, r1
    ld.h r1, r3
    ret r0
    handler:
    add 55, r0, r5
    jump @done
    """,
]


class TestDifferential:
    def test_basic_arithmetic(self):
        diff_run(BASIC_PROGRAMS)

    def test_limb_major_arenas(self):
        # same observables under the limb-major [B, 8, W] physical arena
        # layout (the Pallas-kernel VMEM form) — code fetch, stack
        # push/pop, and UMA heap splices all sweep the word axis
        diff_run(BASIC_PROGRAMS[:2] + STACK_PROGRAMS[:2] + UMA_PROGRAMS[:2],
                 config_overrides={"limb_major_arenas": True})

    def test_control_flow(self):
        diff_run(CONTROL_FLOW)

    def test_stack(self):
        diff_run(STACK_PROGRAMS)

    def test_uma(self):
        diff_run(UMA_PROGRAMS)

    def test_calls(self):
        diff_run(CALL_PROGRAMS)

    def test_bootloader_calldata(self):
        """Entry frame reads its bootloader calldata through the tagged r1
        fat pointer (memory.rs:293-298 + far_call.rs:571-577): in-bounds
        reads, ptr.add walking, and the zero tail beyond length — full
        witness-stream diff."""
        progs = [
            # read word 0 and word 1 via ld.ptr + ptr.add
            """
            ld.ptr r1, r5
            add 32, r0, r6
            ptr.add r1, r6, r2
            ld.ptr r2, r7
            add r5, r7, r8
            st.h 0, r8
            ret r0
            """,
            # walk past length: tail bytes read as zero
            """
            add 64, r0, r6
            ptr.add r1, r6, r2
            ld.ptr r2, r7
            st.h 0, r7
            ret r0
            """,
            # shrink then read inside the shrunk window
            """
            add 32, r0, r6
            ptr.shrink r1, r6, r2
            ld.ptr r2, r7
            st.h 0, r7
            ret r0
            """,
        ]
        diff_run(progs, calldata=[0xDEADBEEF << 128, 0x1234, (1 << 255) | 7])

    def test_context(self):
        diff_run(CONTEXT_PROGRAMS)

    def test_ptr_and_panics(self):
        diff_run(PTR_PROGRAMS)

    def test_user_mode(self):
        # non-kernel entry: kernel-only ops must mask to panic
        diff_run([
            """
            add 2000, r0, r9
            near_call r9, @k, @h
            done:
            ret r0
            k:
            ctx.inc_tx
            ret r0
            h:
            add 3, r0, r3
            jump @done
            """,
        ], ergs=1 << 20)


def _random_program(rng: random.Random) -> str:
    """Generate a random terminating program over the device-supported subset."""
    lines = []
    n_ops = rng.randrange(5, 30)
    regs = [f"r{i}" for i in range(0, 9)]

    def r():
        return rng.choice(regs)

    for i in range(n_ops):
        kind = rng.randrange(14)
        if kind in (0, 1, 2):
            op = rng.choice(["add", "sub", "mul", "div", "xor", "and", "or",
                             "shl", "shr", "rol", "ror"])
            bang = "!" if rng.random() < 0.4 else ""
            extra = ", r" + str(rng.randrange(1, 9)) \
                if op in ("mul", "div") else ""
            lines.append(f"{op}{bang} {r()}, {r()}, r{rng.randrange(1, 9)}{extra}")
        elif kind == 3:
            lines.append(f"add {rng.randrange(0, 65536)}, {r()}, r{rng.randrange(1, 9)}")
        elif kind == 4:
            lines.append(f"add {r()}, r0, stack+=[1]")
            lines.append(f"add stack-=[1], r0, r{rng.randrange(1, 9)}")
        elif kind == 5:
            slot = rng.randrange(0, 200)
            lines.append(f"add {r()}, r0, stack[{slot}]")
            lines.append(f"add stack[{slot}], r0, r{rng.randrange(1, 9)}")
        elif kind == 6:
            off = rng.randrange(0, 900)
            lines.append(f"st.h {off}, {r()}")
            lines.append(f"ld.h {off}, r{rng.randrange(1, 9)}")
        elif kind == 7:
            off = rng.randrange(0, 1200)
            lines.append(f"ld.h {off}, r{rng.randrange(1, 9)}")
        elif kind == 8:
            cond = rng.choice(["if_eq", "if_ne", "if_gt", "if_lt", "if_ge",
                               "if_le", "if_gt_or_lt"])
            lines.append(f"add.{cond} {rng.randrange(100)}, r0, r{rng.randrange(1, 9)}")
        elif kind == 9:
            lines.append(rng.choice(
                ["ctx.ergs", "ctx.sp", "ctx.this", "ctx.meta"])
                + f" r{rng.randrange(1, 9)}")
        elif kind == 10:
            lines.append("nop")
        elif kind == 11:
            off = rng.randrange(0, 40)
            lines.append(f"st.ah {off}, {r()}")
            lines.append(f"ld.ah {off}, r{rng.randrange(1, 9)}")
        elif kind == 12:
            key = rng.randrange(1, 8)
            lines.append(f"add {key}, r0, r9")
            lines.append(f"log.swrite r9, {r()}")
            lines.append(f"log.sread r9, r{rng.randrange(1, 9)}")
        else:
            lines.append(f"log.event {r()}, {r()}")
    lines.append("ret r0")
    return "\n".join(lines)


def _random_call_program(rng: random.Random) -> str:
    """Random program with near-call structure: a main body that calls 1-2
    random leaf functions (some of which panic) under exception handlers."""
    n_funcs = rng.randrange(1, 3)
    lines = [f"add {rng.randrange(500, 4000)}, r0, r14"]
    for i in range(n_funcs):
        lines.append(f"near_call r14, @fn{i}, @h{i}")
        lines.append(f"add {rng.randrange(100)}, r0, r{rng.randrange(1, 6)}")
    lines.append("ret r0")
    for i in range(n_funcs):
        lines.append(f"fn{i}:")
        body = _random_program(rng).splitlines()
        # strip the trailing ret; keep the body short
        lines.extend(line for line in body[:-1][:8]
                     if "near_call" not in line)
        if rng.random() < 0.4:
            lines.append("panic")
        else:
            lines.append("ret r0")
        lines.append(f"h{i}:")
        lines.append(f"add {200 + i}, r0, r{10 + i}")
        lines.append("ret r0")
    return "\n".join(lines)


class TestRandomDifferential:
    @pytest.mark.parametrize("seed", range(6))
    def test_random_straightline(self, seed):
        rng = random.Random(0xC0FFEE + seed)
        programs = [_random_program(rng) for _ in range(8)]
        diff_run(programs, max_cycles=128)

    @pytest.mark.parametrize("seed", range(3))
    def test_random_call_structured(self, seed):
        rng = random.Random(0xFACADE + seed)
        programs = [_random_call_program(rng) for _ in range(8)]
        diff_run(programs, max_cycles=192)


LOG_PROGRAMS = [
    # storage write + read back
    """
    add 5, r0, r1
    add 70, r0, r2
    log.swrite r1, r2
    log.sread r1, r3
    log.sread r2, r4        ; absent key reads 0
    ret r0
    """,
    # overwrite + multiple keys
    """
    add 1, r0, r1
    add 2, r0, r2
    add 11, r0, r3
    add 22, r0, r4
    log.swrite r1, r3
    log.swrite r2, r4
    log.swrite r1, r4
    log.sread r1, r5
    log.sread r2, r6
    ret r0
    """,
    # rollback on near-call panic (incl. insert rollback)
    """
    add 5, r0, r1
    add 70, r0, r2
    log.swrite r1, r2
    add 3000, r0, r9
    near_call r9, @mutate, @h
    done:
    log.sread r1, r4
    add 9, r0, r5
    log.sread r5, r6        ; rolled-back insert reads 0
    ret r0
    mutate:
    add 99, r0, r3
    log.swrite r1, r3
    add 9, r0, r7
    log.swrite r7, r3       ; fresh insert, also rolled back
    panic
    h:
    jump @done
    """,
    # nested frames: inner success inside outer panic
    """
    add 7, r0, r1
    add 1, r0, r2
    log.swrite r1, r2
    add 4000, r0, r9
    near_call r9, @outer, @h
    done:
    log.sread r1, r4
    ret r0
    outer:
    add 2, r0, r2
    log.swrite r1, r2
    add 2000, r0, r8
    near_call r8, @inner, @oh
    panic                     ; outer panics after inner succeeded
    inner:
    add 3, r0, r2
    log.swrite r1, r2
    ret r0
    oh:
    panic
    h:
    jump @done
    """,
    # events + l1 messages with rollback cancellation
    """
    add 1, r0, r1
    add 100, r0, r2
    log.event r1, r2
    log.to_l1.first r1, r2
    add 2500, r0, r9
    near_call r9, @emitter, @h
    done:
    add 2, r0, r3
    add 200, r0, r4
    log.event.first r3, r4
    ret r0
    emitter:
    add 5, r0, r5
    add 500, r0, r6
    log.event r5, r6
    panic
    h:
    jump @done
    """,
    # pubdata ergs accounting: set price then write
    """
    add 3, r0, r1
    ctx.set_pubdata r1
    add 5, r0, r2
    add 50, r0, r3
    log.swrite r2, r3
    log.to_l1 r2, r3
    ctx.ergs r4
    ret r0
    """,
    # out-of-ergs on pubdata: to_l1 skipped, ergs zeroed, next decode panics
    """
    add 100, r0, r1
    ctx.set_pubdata r1
    add 3000, r0, r9
    near_call r9, @w, @h
    done:
    ret r0
    w:
    add 5, r0, r2
    log.to_l1 r2, r2       ; cost 100*88 >> passed ergs -> skipped + ergs 0
    add 1, r0, r3          ; masked into panic (no ergs)
    ret r0
    h:
    add 42, r0, r8
    jump @done
    """,
    # storage in tx context: inc_tx changes the recorded tx number
    """
    add 1, r0, r1
    log.swrite r1, r1
    ctx.inc_tx
    add 2, r0, r2
    log.swrite r2, r2
    log.event r1, r2
    ret r0
    """,
]


class TestLogDifferential:
    def test_storage_and_events(self):
        diff_run(LOG_PROGRAMS)

    def test_prepopulated_storage(self):
        # device storage pre-population must match golden populate
        import numpy as np
        from era_zk_evm_tpu.isa.assembler import assemble_to_code_words
        from era_zk_evm_tpu.models import VmConfig, make_entry_state, run_cycles
        from era_zk_evm_tpu.models.state import populate_storage
        from era_zk_evm_tpu.testing.harness import (
            ENTRY_ADDRESS, build_vm, create_default_tools, reg, run,
        )
        from era_zk_evm_tpu.utils import from_limbs

        src = """
        add 77, r0, r1
        log.sread r1, r2
        ret r0
        """
        tools = create_default_tools()
        tools.storage.populate([(0, ENTRY_ADDRESS, 77, 123456)])
        vm = build_vm(assemble_to_code_words(src), tools=tools)
        run(vm, 32)
        assert reg(vm, 2) == 123456

        config = VmConfig(batch=1, queue_capacity=256, storage_slots=8,
                          journal_slots=8, event_slots=8,
                          log_queue_capacity=32)
        state = make_entry_state(config, [assemble_to_code_words(src)])
        state = populate_storage(state, config,
                                 [[(0, ENTRY_ADDRESS, 77, 123456)]])
        state = run_cycles(state, config, 32)
        assert not np.asarray(state.lane_error)[0]
        # r2 was wiped by the final ret on both engines; check the log stream
        assert from_limbs(np.asarray(state.lq_read)[0, 1]) == 123456
