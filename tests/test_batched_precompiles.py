"""Device precompile unit vs golden: keccak256 / sha256 through log.precompile."""

import pytest
import hashlib

from era_zk_evm_tpu.golden.precompiles import keccak256
from era_zk_evm_tpu.isa import params
from era_zk_evm_tpu.isa.abi import PrecompileCallABI
from era_zk_evm_tpu.models import VmConfig
from era_zk_evm_tpu.testing.differential import diff_run


def _config(batch, max_cycles):
    return VmConfig(
        batch=batch, queue_capacity=max_cycles * 8, heap_words=64,
        stack_words=2048, code_words=64, max_depth=8,
        storage_slots=16, journal_slots=32, event_slots=32,
        log_queue_capacity=max_cycles, heap_frames=2, code_pages=2,
        decommit_queue_capacity=max_cycles,
        precompile_keccak_blocks=3, precompile_sha_rounds=3)


def keccak_abi(offset, length, out_word):
    return PrecompileCallABI(
        input_memory_offset=offset, input_memory_length=length,
        output_memory_offset=out_word, output_memory_length=0,
        memory_page_to_read=0, memory_page_to_write=0,
        precompile_interpreted_data=0).to_u256()


def sha_abi(in_word, rounds, out_word):
    return PrecompileCallABI(
        input_memory_offset=in_word, input_memory_length=2 * rounds,
        output_memory_offset=out_word, output_memory_length=1,
        memory_page_to_read=0, memory_page_to_write=0,
        precompile_interpreted_data=rounds).to_u256()


class TestDevicePrecompiles:
    def test_keccak_cases(self):
        data4 = (0x61626364).to_bytes(4, "big")
        programs = [
            # 4 bytes, aligned
            f"""
            add code[@d], r0, r2
            st.h 0, r2
            add code[@abi], r0, r4
            log.precompile r4, r0, r5
            add 64, r0, r6
            ld.h r6, r7
            ret r0
            abi: .word {keccak_abi(0, 4, 2)}
            d: .word {int.from_bytes(data4 + bytes(28), 'big')}
            """,
            # empty input
            f"""
            add code[@abi], r0, r4
            log.precompile r4, r0, r5
            ld.h 0, r7
            ret r0
            abi: .word {keccak_abi(0, 0, 0)}
            """,
            # 2 full words (64 bytes), output word 3
            f"""
            add code[@w0], r0, r2
            st.h 0, r2
            add code[@w1], r0, r3
            st.h 32, r3
            add code[@abi], r0, r4
            log.precompile r4, r0, r5
            add 96, r0, r6
            ld.h r6, r7
            ret r0
            abi: .word {keccak_abi(0, 64, 3)}
            w0: .word {int.from_bytes(bytes(range(32)), 'big')}
            w1: .word {int.from_bytes(bytes(range(32, 64)), 'big')}
            """,
            # unaligned byte offset 3, 40 bytes spanning two words
            f"""
            add code[@w0], r0, r2
            st.h 0, r2
            add code[@w1], r0, r3
            st.h 32, r3
            add code[@abi], r0, r4
            log.precompile r4, r0, r5
            add 96, r0, r6
            ld.h r6, r7
            ret r0
            abi: .word {keccak_abi(3, 40, 3)}
            w0: .word {int.from_bytes(bytes(range(32)), 'big')}
            w1: .word {int.from_bytes(bytes(range(32, 64)), 'big')}
            """,
            # two-block input: 200 bytes of 0x7b starting at offset 0
            f"""
            add code[@fill], r0, r2
            st.h 0, r2
            st.h 32, r2
            st.h 64, r2
            st.h 96, r2
            st.h 128, r2
            st.h 160, r2
            st.h 192, r2
            add code[@abi], r0, r4
            log.precompile r4, r0, r5
            add code[@outw], r0, r6
            ld.h r6, r7
            ret r0
            abi: .word {keccak_abi(0, 200, 8)}
            fill: .word {int.from_bytes(bytes([0x7B] * 32), 'big')}
            outw: .word 256
            """,
        ]
        diff_run(programs, config=_config(len(programs), 128),
                 max_cycles=128, ergs=1 << 20,
                 entry_address=params.KECCAK256_ROUND_FUNCTION_PRECOMPILE_ADDRESS)

    def test_keccak_limb_major(self):
        # precompile mem_in reads / mem_out writes sweep the heap word axis
        # under the limb-major arena layout (unaligned window, 2 words)
        prog = f"""
        add code[@w0], r0, r2
        st.h 0, r2
        add code[@w1], r0, r3
        st.h 32, r3
        add code[@abi], r0, r4
        log.precompile r4, r0, r5
        add 96, r0, r6
        ld.h r6, r7
        ret r0
        abi: .word {keccak_abi(3, 40, 3)}
        w0: .word {int.from_bytes(bytes(range(32)), 'big')}
        w1: .word {int.from_bytes(bytes(range(32, 64)), 'big')}
        """
        diff_run([prog], config_overrides={"limb_major_arenas": True},
                 config=_config(1, 128), max_cycles=128, ergs=1 << 20,
                 entry_address=params.KECCAK256_ROUND_FUNCTION_PRECOMPILE_ADDRESS)

    def test_sha256_rounds(self):
        msg = b"abc"
        block = msg + b"\x80" + b"\x00" * (64 - len(msg) - 1 - 8) \
            + (len(msg) * 8).to_bytes(8, "big")
        w0 = int.from_bytes(block[:32], "big")
        w1 = int.from_bytes(block[32:], "big")
        programs = [
            f"""
            add code[@w0], r0, r2
            st.h 0, r2
            add code[@w1], r0, r3
            st.h 32, r3
            add code[@abi], r0, r4
            log.precompile r4, r0, r5
            add 64, r0, r6
            ld.h r6, r7
            ret r0
            abi: .word {sha_abi(0, 1, 2)}
            w0: .word {w0}
            w1: .word {w1}
            """,
        ]
        diff_run(programs, config=_config(1, 96), max_cycles=96,
                 ergs=1 << 20,
                 entry_address=params.SHA256_ROUND_FUNCTION_PRECOMPILE_ADDRESS)

    def test_precompile_extra_cost_out_of_ergs(self):
        # src1 = extra ergs cost exceeding the frame budget: dst0 = 0
        programs = [
            f"""
            add 3000, r0, r9
            near_call r9, @w, @h
            done:
            ret r0
            w:
            add code[@abi], r0, r4
            add 60000, r0, r6      ; extra cost > passed ergs
            log.precompile r4, r6, r5
            add r5, r0, stack[7]   ; store result flag (0)
            ret r0
            h:
            add 1, r0, r8
            jump @done
            abi: .word {keccak_abi(0, 0, 0)}
            """,
        ]
        diff_run(programs, config=_config(1, 96), max_cycles=96, ergs=1 << 20,
                 entry_address=params.KECCAK256_ROUND_FUNCTION_PRECOMPILE_ADDRESS)


@pytest.mark.slow
class TestDeviceEcrecover:
    def test_ecrecover_via_vm(self):
        from era_zk_evm_tpu.golden.precompiles import (
            SECP_GX, SECP_GY, SECP_N, _ec_mul, _inv_mod, keccak256,
        )
        import dataclasses

        d = 0xC0FFEE0DDF00DC0FFEE0DDF00DC0FFEE0DDF00DC0FFEE0DDF00DC0FFEE0DD01
        pub = _ec_mul(d, (SECP_GX, SECP_GY))
        digest = int.from_bytes(keccak256(b"device recovery"), "big")
        k = 0x8BADF00D8BADF00D8BADF00D8BADF00D8BADF00D8BADF00D8BADF00D8BADF00D
        R = _ec_mul(k, (SECP_GX, SECP_GY))
        r = R[0] % SECP_N
        s = _inv_mod(k, SECP_N) * (digest + r * d) % SECP_N
        v = R[1] & 1
        if s > SECP_N // 2:
            s = SECP_N - s
            v ^= 1
        abi = PrecompileCallABI(
            input_memory_offset=0, input_memory_length=4,
            output_memory_offset=4, output_memory_length=2,
            memory_page_to_read=0, memory_page_to_write=0,
            precompile_interpreted_data=0).to_u256()
        prog = f"""
            add code[@dg], r0, r2
            st.h 0, r2
            add {v}, r0, r3
            st.h 32, r3
            add code[@sr], r0, r4
            st.h 64, r4
            add code[@ss], r0, r5
            st.h 96, r5
            add code[@abi], r0, r6
            log.precompile r6, r0, r7
            add 128, r0, r8
            ld.h r8, r9
            add 160, r0, r10
            ld.h r10, r11
            ret r0
            abi: .word {abi}
            dg: .word {digest}
            sr: .word {r}
            ss: .word {s}
        """
        config = dataclasses.replace(_config(1, 96), precompile_ecrecover=True)
        diff_run([prog], config=config, max_cycles=96, ergs=1 << 20,
                 entry_address=params.ECRECOVER_INNER_FUNCTION_PRECOMPILE_ADDRESS)


class TestPrecompileRoundWitness:
    """Device precompile mem_in/mem_out queue vs the golden tracer's
    add_precompile_call_result streams (checked inside diff_run when
    `precompile_queue_capacity` is enabled)."""

    def test_keccak_and_sha_round_witness(self):
        import dataclasses

        data4 = (0x61626364).to_bytes(4, "big")
        msg = b"abc"
        block = msg + b"\x80" + b"\x00" * (64 - len(msg) - 1 - 8) \
            + (len(msg) * 8).to_bytes(8, "big")
        programs = [
            # keccak: unaligned byte offset 3, 40 bytes spanning two words,
            # then an empty-input call (no mem_in, one mem_out each)
            f"""
            add code[@w0], r0, r2
            st.h 0, r2
            add code[@w1], r0, r3
            st.h 32, r3
            add code[@abi], r0, r4
            log.precompile r4, r0, r5
            add code[@abi2], r0, r6
            log.precompile r6, r0, r7
            ret r0
            abi: .word {keccak_abi(3, 40, 3)}
            abi2: .word {keccak_abi(0, 0, 5)}
            w0: .word {int.from_bytes(bytes(range(32)), 'big')}
            w1: .word {int.from_bytes(bytes(range(32, 64)), 'big')}
            """,
            # keccak: 4 bytes aligned
            f"""
            add code[@d], r0, r2
            st.h 0, r2
            add code[@abi], r0, r4
            log.precompile r4, r0, r5
            ret r0
            abi: .word {keccak_abi(0, 4, 2)}
            d: .word {int.from_bytes(data4 + bytes(28), 'big')}
            """,
            # sha256: one round (2 mem_in words, 1 mem_out)
            f"""
            add code[@w0], r0, r2
            st.h 0, r2
            add code[@w1], r0, r3
            st.h 32, r3
            add code[@abi], r0, r4
            log.precompile r4, r0, r5
            ret r0
            abi: .word {sha_abi(0, 1, 2)}
            w0: .word {int.from_bytes(block[:32], 'big')}
            w1: .word {int.from_bytes(block[32:], 'big')}
            """,
        ]
        # PS = 14 in-slots (3 keccak blocks) + 1 out-slot; 2 emitting cycles
        config = dataclasses.replace(_config(len(programs), 96),
                                     precompile_queue_capacity=15 * 4)
        diff_run(programs, config=config, max_cycles=96, ergs=1 << 20,
                 entry_address=params.KECCAK256_ROUND_FUNCTION_PRECOMPILE_ADDRESS)

    def test_ecrecover_round_witness(self):
        import dataclasses

        from era_zk_evm_tpu.golden.precompiles import (
            SECP_GX, SECP_GY, SECP_N, _ec_mul, _inv_mod, keccak256,
        )
        from era_zk_evm_tpu.isa.abi import PrecompileCallABI

        d = 0xC0FFEE0DDF00DC0FFEE0DDF00DC0FFEE0DDF00DC0FFEE0DDF00DC0FFEE0DD01
        digest = int.from_bytes(keccak256(b"round witness"), "big")
        k = 0x8BADF00D8BADF00D8BADF00D8BADF00D8BADF00D8BADF00D8BADF00D8BADF00D
        R = _ec_mul(k, (SECP_GX, SECP_GY))
        r = R[0] % SECP_N
        s = _inv_mod(k, SECP_N) * (digest + r * d) % SECP_N
        v = R[1] & 1
        if s > SECP_N // 2:
            s = SECP_N - s
            v ^= 1
        abi = PrecompileCallABI(
            input_memory_offset=0, input_memory_length=4,
            output_memory_offset=4, output_memory_length=2,
            memory_page_to_read=0, memory_page_to_write=0,
            precompile_interpreted_data=0).to_u256()
        prog = f"""
            add code[@dg], r0, r2
            st.h 0, r2
            add {v}, r0, r3
            st.h 32, r3
            add code[@sr], r0, r4
            st.h 64, r4
            add code[@ss], r0, r5
            st.h 96, r5
            add code[@abi], r0, r6
            log.precompile r6, r0, r7
            ret r0
            abi: .word {abi}
            dg: .word {digest}
            sr: .word {r}
            ss: .word {s}
        """
        # ecrecover: 4 in + 2 out slots -> PS = 16 with keccak blocks cfg
        config = dataclasses.replace(_config(1, 96),
                                     precompile_ecrecover=True,
                                     precompile_queue_capacity=16 * 2)
        diff_run([prog], config=config, max_cycles=96, ergs=1 << 20,
                 entry_address=params.ECRECOVER_INNER_FUNCTION_PRECOMPILE_ADDRESS)
