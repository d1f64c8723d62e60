"""Device far-call differential conformance (SURVEY.md §3.3 on TPU)."""

from era_zk_evm_tpu.isa.abi import FarCallABI, FatPointer, ForwardingMode, RetABI
from era_zk_evm_tpu.testing.differential import diff_run

CALLEE = 0x10042
CALLEE2 = 0x10055

PASS_ALL = (1 << 32) - 1


def fc_abi(ergs=PASS_ALL, mode=ForwardingMode.USE_HEAP, start=0, length=0,
           to_system=False):
    return FarCallABI(FatPointer(0, 0, start, length), ergs, 0, mode,
                      False, to_system).to_u256()


def ret_abi(start=0, length=0, mode=ForwardingMode.USE_HEAP):
    return RetABI(FatPointer(0, 0, start, length), mode).to_u256()


CONTRACTS = [
    (CALLEE, f"""
        ld.ptr r1, r5          ; calldata[0]
        add 1, r0, r6
        add r5, r6, r5
        st.h 0, r5             ; heap[0] = calldata[0] + 1
        add code[@rabi], r0, r7
        ret r7                 ; forward heap[0..32]
        rabi: .word {ret_abi(0, 32)}
    """),
    (CALLEE2, """
        add 5, r0, r1
        add 50, r0, r2
        log.swrite r1, r2
        revert r0
    """),
]

FAR_PROGRAMS = [
    # basic call + returndata read-back
    f"""
    add 41, r0, r3
    st.h 0, r3
    add code[@abi], r0, r4
    add code[@dest], r0, r2
    far_call r4, r2, @on_fail
    ld.ptr r1, r10          ; returndata[0] == 42
    ret r0
    on_fail:
    add 99, r0, r9
    ret r0
    abi: .word {fc_abi(length=32)}
    dest: .word {CALLEE}
    """,
    # revert runs handler + storage rolls back
    f"""
    add code[@abi], r0, r4
    add code[@dest2], r0, r2
    far_call r4, r2, @on_fail
    add 1, r0, r8
    ret r0
    on_fail:
    add 5, r0, r1
    log.sread r1, r9       ; rolled-back 0
    add 7, r0, r11
    ret r0
    abi: .word {fc_abi()}
    dest2: .word {CALLEE2}
    """,
    # unknown-address call with zero default AA: masked AA hash 0 -> panic
    f"""
    add code[@abi], r0, r4
    add code[@dest3], r0, r2
    far_call r4, r2, @on_fail
    add 1, r0, r8
    ret r0
    on_fail:
    add 7, r0, r9
    ret r0
    abi: .word {fc_abi()}
    dest3: .word 0x77777
    """,
    # repeat decommit: second call is stale (refund path)
    f"""
    add 1, r0, r3
    st.h 0, r3
    add code[@abi], r0, r4
    add code[@dest], r0, r2
    far_call r4, r2, @fail
    add code[@abi], r0, r4
    add code[@dest], r0, r2
    far_call r4, r2, @fail
    ld.ptr r1, r10
    ret r0
    fail:
    add 99, r0, r9
    ret r0
    abi: .word {fc_abi(length=32)}
    dest: .word {CALLEE}
    """,
    # zero-ergs far call: callee immediately out of ergs -> handler
    f"""
    add code[@abi0], r0, r4
    add code[@dest], r0, r2
    far_call r4, r2, @on_fail
    add 1, r0, r8
    ret r0
    on_fail:
    add 3, r0, r9
    ret r0
    abi0: .word {fc_abi(ergs=0)}
    dest: .word {CALLEE}
    """,
    # static far call: callee's storage write masks to panic
    f"""
    add code[@abi], r0, r4
    add code[@dest2], r0, r2
    far_call.static r4, r2, @on_fail
    add 1, r0, r8
    ret r0
    on_fail:
    add 11, r0, r9
    ret r0
    abi: .word {fc_abi()}
    dest2: .word {CALLEE2}
    """,
]

DELEGATE_PROGRAMS = [
    # delegate keeps identity; callee writes ctx.this into storage
    f"""
    add code[@abi], r0, r4
    add code[@dest], r0, r2
    delegate_call r4, r2, @fail
    add 1, r0, r6
    log.sread r6, r10
    ret r0
    fail:
    add 99, r0, r9
    ret r0
    abi: .word {fc_abi()}
    dest: .word {CALLEE}
    """,
]

DELEGATE_CONTRACTS = [
    (CALLEE, """
        ctx.this r5
        add 1, r0, r6
        log.swrite r6, r5
        ret r0
    """),
]


class TestFarCallDifferential:
    def test_far_calls(self):
        diff_run(FAR_PROGRAMS, contracts=CONTRACTS, max_cycles=128)

    def test_far_calls_limb_major(self):
        # code-bank gathers + per-frame heap slots under the limb-major
        # arena layout (decommit writes go through the word-major host path)
        diff_run(FAR_PROGRAMS[:2], contracts=CONTRACTS, max_cycles=128,
                 config_overrides={"limb_major_arenas": True})

    def test_delegate(self):
        diff_run(DELEGATE_PROGRAMS, contracts=DELEGATE_CONTRACTS,
                 max_cycles=128)

    def test_default_aa(self):
        aa = f"""
            add 123, r0, r5
            st.h 0, r5
            add code[@rabi], r0, r7
            ret r7
            rabi: .word {ret_abi(0, 32)}
        """
        prog = f"""
            add code[@abi], r0, r4
            add code[@dest], r0, r2
            far_call r4, r2, @on_fail
            ld.ptr r1, r10
            ret r0
            on_fail:
            add 9, r0, r9
            ret r0
            abi: .word {fc_abi()}
            dest: .word 0x99999
        """
        diff_run([prog], contracts=[], default_aa_source=aa, max_cycles=128)


PTR_FWD_CONTRACTS = [
    (CALLEE, f"""
        ld.ptr r1, r5           ; calldata[0]
        st.h 0, r5
        ptr.add r1, r0, r6      ; copy of calldata ptr (offset +0)
        add 32, r0, r7
        ptr.add r6, r7, r6      ; offset 32
        ld.ptr r6, r8           ; calldata[1]
        st.h 32, r8
        ptr.shrink r1, r7, r9   ; length -= 32
        ptr.pack r9, r0, r10    ; pack with zero high -> same ptr
        add code[@rabi], r0, r7
        ret r7
        rabi: .word {ret_abi(0, 64)}
    """),
    (CALLEE2, f"""
        ld.ptr r1, r5
        add 1, r0, r6
        add r5, r6, r5
        st.h 0, r5
        add code[@rfwd], r0, r7
        ret r7                  ; forward our own CALLDATA pointer? banned ->
                                ; instead forward heap normally
        rfwd: .word {ret_abi(0, 32)}
    """),
]

PTR_FWD_PROGRAMS = [
    # two-word calldata; callee echoes both words via ptr arithmetic
    f"""
    add 1111, r0, r3
    st.h 0, r3
    add 2222, r0, r5
    st.h 32, r5
    add code[@abi], r0, r4
    add code[@dest], r0, r2
    far_call r4, r2, @fail
    ld.ptr r1, r10          ; returndata[0] == 1111
    add 32, r0, r3
    ptr.add r1, r3, r6
    ld.ptr r6, r11          ; returndata[1] == 2222
    ret r0
    fail:
    add 99, r0, r9
    ret r0
    abi: .word {fc_abi(length=64)}
    dest: .word {CALLEE}
    """,
    # nested far calls: A calls B which calls A's sibling? use CALLEE2 -> heap fwd
    f"""
    add 41, r0, r3
    st.h 0, r3
    add code[@abi], r0, r4
    add code[@dest2], r0, r2
    far_call r4, r2, @fail
    ld.ptr r1, r10          ; 42
    ret r0
    fail:
    add 99, r0, r9
    ret r0
    abi: .word {fc_abi(length=32)}
    dest2: .word {CALLEE2}
    """,
    # revert with returndata: callee writes then reverts forwarding heap
    f"""
    add code[@abi], r0, r4
    add code[@dest3], r0, r2
    far_call r4, r2, @on_fail
    add 1, r0, r8
    ret r0
    on_fail:
    ld.ptr r1, r10          ; revert data readable in the handler
    add 2, r0, r11
    ret r0
    abi: .word {fc_abi()}
    dest3: .word 0x10077
    """,
]

REVERTDATA_CONTRACT = [(0x10077, f"""
    add 5151, r0, r2
    st.h 0, r2
    add code[@rabi], r0, r7
    revert r7
    rabi: .word {ret_abi(0, 32)}
""")]


class TestPointerForwarding:
    def test_ptr_ops_on_calldata(self):
        diff_run(PTR_FWD_PROGRAMS[:2], contracts=PTR_FWD_CONTRACTS,
                 max_cycles=160)

    def test_revert_with_returndata(self):
        diff_run([PTR_FWD_PROGRAMS[2]], contracts=REVERTDATA_CONTRACT,
                 max_cycles=160)


NESTED_CONTRACTS = [
    (CALLEE, f"""
        ld.ptr r1, r5
        add 1, r0, r6
        add r5, r6, r5          ; +1
        st.h 0, r5
        add code[@abi2], r0, r4
        add code[@dest2], r0, r2
        far_call r4, r2, @fail  ; nested call to CALLEE2
        ld.ptr r1, r7           ; nested returndata
        st.h 0, r7
        add code[@rabi], r0, r7
        ret r7
        fail:
        panic
        abi2: .word {fc_abi(length=32)}
        dest2: .word {CALLEE2}
        rabi: .word {ret_abi(0, 32)}
    """),
    (CALLEE2, f"""
        ld.ptr r1, r5
        add 10, r0, r6
        add r5, r6, r5          ; +10
        st.h 0, r5
        add code[@rabi], r0, r7
        ret r7
        rabi: .word {ret_abi(0, 32)}
    """),
]


class TestNestedFarCalls:
    def test_two_level_call_chain(self):
        prog = f"""
        add 100, r0, r3
        st.h 0, r3
        add code[@abi], r0, r4
        add code[@dest], r0, r2
        far_call r4, r2, @fail
        ld.ptr r1, r10          ; 100 + 1 + 10 = 111
        ret r0
        fail:
        add 99, r0, r9
        ret r0
        abi: .word {fc_abi(length=32)}
        dest: .word {CALLEE}
        """
        diff_run([prog], contracts=NESTED_CONTRACTS, max_cycles=200)


def _random_far_call_scenario(seed: int):
    """Random callee contracts + random callers exercising the call protocol."""
    import random

    from tests.test_batched_vm import _random_program

    rng = random.Random(seed)
    addrs = [0x20000 + 0x111 * i for i in range(2)]
    contracts = []
    for address in addrs:
        body = [ln for ln in _random_program(rng).splitlines()[:-1][:10]
                if "near_call" not in ln]
        exit_kind = rng.randrange(3)
        if exit_kind == 0:
            tail = ["ld.ptr r1, r5", "add 1, r0, r6", "add r5, r6, r5",
                    "st.h 0, r5", "add code[@rabi], r0, r7", "ret r7",
                    f"rabi: .word {ret_abi(0, 32)}"]
        elif exit_kind == 1:
            tail = ["add 7, r0, r5", "st.h 0, r5",
                    "add code[@rabi], r0, r7", "revert r7",
                    f"rabi: .word {ret_abi(0, 32)}"]
        else:
            tail = ["ret r0"]
        contracts.append((address, "\n".join(body + tail)))

    callers = []
    for _ in range(6):
        target = rng.choice(addrs)
        ergs_mode = rng.choice([PASS_ALL, 0, rng.randrange(500, 5000)])
        pre = [ln for ln in _random_program(rng).splitlines()[:-1][:6]
               if "near_call" not in ln]
        callers.append("\n".join(pre + [
            f"add {rng.randrange(1, 1000)}, r0, r3",
            "st.h 0, r3",
            "add code[@abi], r0, r4",
            "add code[@dest], r0, r2",
            "far_call r4, r2, @on_fail",
            "ld.ptr r1, r10",
            "add 1, r0, r11",
            "ret r0",
            "on_fail:",
            "add 99, r0, r9",
            "ret r0",
            f"abi: .word {fc_abi(ergs=ergs_mode, length=32)}",
            f"dest: .word {target}",
        ]))
    return callers, contracts


class TestRandomFarCalls:
    def test_random_scenarios(self):
        for seed in (0xAB1, 0xAB2):
            callers, contracts = _random_far_call_scenario(seed)
            diff_run(callers, contracts=contracts, max_cycles=192)


EDGE_CONTRACT = [(CALLEE, f"""
    ld.ptr r1, r5
    st.h 0, r5
    st.h 32, r5
    add code[@rabi], r0, r7
    ret r7                    ; 40-byte returndata (unaligned length)
    rabi: .word {ret_abi(0, 40)}
""")]


class TestFatPointerEdges:
    def test_tail_masking_and_oob_reads(self):
        # returndata is 40 bytes: reads near/past the bound exercise the
        # beyond-bound tail masking (uma.rs:305-320) and the silent-zero skip
        prog = f"""
        add code[@v], r0, r3
        st.h 0, r3
        add code[@abi], r0, r4
        add code[@dest], r0, r2
        far_call r4, r2, @fail
        ld.ptr r1, r10          ; offset 0: full word, last 24 bytes masked?
                                ; no: length 40 -> offset 0..8 unmasked
        add 8, r0, r3
        ptr.add r1, r3, r6
        ld.ptr r6, r11          ; offset 8: 32 bytes fully in bounds
        add 9, r0, r3
        ptr.add r1, r3, r6
        ld.ptr r6, r12          ; offset 9: tail byte masked
        add 39, r0, r3
        ptr.add r1, r3, r6
        ld.ptr r6, r13          ; offset 39: last byte only
        add 40, r0, r3
        ptr.add r1, r3, r6
        ld.ptr r6, r14          ; offset == length: out of bounds -> 0
        add 2, r0, r3
        ptr.shrink r1, r3, r6   ; length 38
        add 7, r0, r3
        ptr.add r6, r3, r6
        ld.ptr r6, r15          ; offset 7 with shrunk length 38
        ret r0
        fail:
        panic
        abi: .word {fc_abi(length=32)}
        dest: .word {CALLEE}
        v: .word 0x0102030405060708090A0B0C0D0E0F101112131415161718191A1B1C1D1E1F20
        """
        diff_run([prog], contracts=EDGE_CONTRACT, max_cycles=192)

    def test_unaligned_calldata_window(self):
        # calldata with byte-granular ptr.add offsets: unaligned two-word reads
        prog = f"""
        add code[@v], r0, r3
        st.h 0, r3
        add code[@w], r0, r5
        st.h 32, r5
        add code[@abi], r0, r4
        add code[@dest2], r0, r2
        far_call r4, r2, @fail
        add 1, r0, r8
        ret r0
        fail:
        panic
        abi: .word {fc_abi(length=64)}
        dest2: .word 0x30011
        v: .word 0x1111111111111111222222222222222233333333333333334444444444444444
        w: .word 0x5555555555555555666666666666666677777777777777778888888888888888
        """
        callee = [(0x30011, """
            add 3, r0, r9
            ptr.add r1, r9, r6
            ld.ptr r6, r5          ; unaligned read spanning both words
            st.h 0, r5
            add 31, r0, r9
            ptr.add r1, r9, r6
            ld.ptr r6, r7          ; maximal unalignment
            st.h 32, r7
            ret r0
        """)]
        diff_run([prog], contracts=callee, max_cycles=192)
