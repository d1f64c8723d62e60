"""Native C++ oracle keccak256/sha256 precompiles vs golden + host hashes.

Extends the native subset to Log.precompile (golden/precompiles.py
semantics: byte-stream keccak sponge over unaligned windows, sha256 round
function), enabling runtime-speed fuzzing of precompile-heavy workloads
and a third engine for the config-2 shape."""

import hashlib

import numpy as np
import pytest

from era_zk_evm_tpu.golden.precompiles import keccak256
from era_zk_evm_tpu.isa import params
from era_zk_evm_tpu.isa.abi import PrecompileCallABI
from era_zk_evm_tpu.isa.assembler import assemble_to_code_words
from era_zk_evm_tpu.native import ST_DONE, ST_UNSUPPORTED, run_oracle


def _abi(offset, length, out_word, rounds=0, out_len=0):
    return PrecompileCallABI(
        input_memory_offset=offset, input_memory_length=length,
        output_memory_offset=out_word, output_memory_length=out_len,
        memory_page_to_read=0, memory_page_to_write=0,
        precompile_interpreted_data=rounds).to_u256()


def _heap_word(out, idx):
    return out["heap"][idx]


class TestNativeKeccak:
    def test_unaligned_window(self):
        prog = f"""
        add code[@w0], r0, r2
        st.h 0, r2
        add code[@w1], r0, r3
        st.h 32, r3
        add code[@abi], r0, r4
        log.precompile r4, r0, r5
        ret r0
        abi: .word {_abi(3, 40, 3)}
        w0: .word {int.from_bytes(bytes(range(32)), 'big')}
        w1: .word {int.from_bytes(bytes(range(32, 64)), 'big')}
        """
        out = run_oracle(
            assemble_to_code_words(prog),
            entry_address=params.KECCAK256_ROUND_FUNCTION_PRECOMPILE_ADDRESS)
        assert out["status"] == ST_DONE
        want = int.from_bytes(keccak256(bytes(range(3, 43))), "big")
        assert _heap_word(out, 3) == want
        # dst0 protocol: r5 == 1 before the exit wipe; check via log record
        assert len(out["log_records"]) == 1

    def test_empty_and_exact_rate(self):
        for length, fill in ((0, 0), (136, 0x41)):
            words = []
            stores = []
            n_words = (length + 31) // 32
            for i in range(n_words):
                chunk = bytes([fill] * min(32, length - 32 * i))
                chunk = chunk + bytes(32 - len(chunk))
                words.append(f"w{i}: .word {int.from_bytes(chunk, 'big')}")
                stores.append(f"add code[@w{i}], r0, r2\nst.h {32*i}, r2")
            prog = "\n".join(stores) + f"""
            add code[@abi], r0, r4
            log.precompile r4, r0, r5
            ret r0
            abi: .word {_abi(0, length, 8)}
            """ + "\n".join(words)
            out = run_oracle(
                assemble_to_code_words(prog),
                entry_address=
                params.KECCAK256_ROUND_FUNCTION_PRECOMPILE_ADDRESS)
            assert out["status"] == ST_DONE, length
            want = int.from_bytes(keccak256(bytes([fill] * length)), "big")
            assert _heap_word(out, 8) == want, length


class TestNativeSha256:
    def test_one_round(self):
        msg = b"abc"
        padded = msg + b"\x80" + bytes(52) + (len(msg) * 8).to_bytes(8, "big")
        w0 = int.from_bytes(padded[:32], "big")
        w1 = int.from_bytes(padded[32:], "big")
        prog = f"""
        add code[@w0], r0, r2
        st.h 0, r2
        add code[@w1], r0, r3
        st.h 32, r3
        add code[@abi], r0, r4
        log.precompile r4, r0, r5
        ret r0
        abi: .word {_abi(0, 2, 3, rounds=1, out_len=1)}
        w0: .word {w0}
        w1: .word {w1}
        """
        out = run_oracle(
            assemble_to_code_words(prog),
            entry_address=params.SHA256_ROUND_FUNCTION_PRECOMPILE_ADDRESS)
        assert out["status"] == ST_DONE
        assert _heap_word(out, 3) == int.from_bytes(
            hashlib.sha256(msg).digest(), "big")


class TestNativeEcrecoverUnsupported:
    def test_ecrecover_recovers_vs_golden(self):
        """Native secp256k1 recovery == golden ecrecover_inner (plus the
        invalid-signature zero path) — closes the C++ oracle's last
        precompile gap."""
        from era_zk_evm_tpu.golden.precompiles import (
            SECP_GX, SECP_GY, SECP_N, _ec_mul, _inv_mod, ecrecover_inner,
            keccak256,
        )

        d = 0xC0FFEE0DDF00DC0FFEE0DDF00DC0FFEE0DDF00DC0FFEE0DDF00DC0FFEE0DD01
        k = 0x8BADF00D8BADF00D8BADF00D8BADF00D8BADF00D8BADF00D8BADF00D8BADF00D
        digest = int.from_bytes(keccak256(b"native recovery"), "big")
        R = _ec_mul(k, (SECP_GX, SECP_GY))
        r = R[0] % SECP_N
        s = _inv_mod(k, SECP_N) * (digest + r * d) % SECP_N
        v = R[1] & 1
        if s > SECP_N // 2:
            s = SECP_N - s
            v ^= 1
        want = ecrecover_inner(digest, v, r, s)
        assert want is not None

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
        abi: .word {_abi(0, 4, 4)}
        dg: .word {digest}
        sr: .word {r}
        ss: .word {s}
        """
        out = run_oracle(
            assemble_to_code_words(prog),
            entry_address=params.ECRECOVER_INNER_FUNCTION_PRECOMPILE_ADDRESS)
        assert out["status"] == ST_DONE
        assert _heap_word(out, 4) == 1
        assert _heap_word(out, 5) == want

        # invalid signature (r = 0): ok flag and address both zero
        bad = f"""
        add code[@dg], r0, r2
        st.h 0, r2
        add {v}, r0, r3
        st.h 32, r3
        add 0, r0, r4
        st.h 64, r4
        add code[@ss], r0, r5
        st.h 96, r5
        add code[@abi], r0, r6
        log.precompile r6, r0, r7
        ret r0
        abi: .word {_abi(0, 4, 4)}
        dg: .word {digest}
        ss: .word {s}
        """
        out = run_oracle(
            assemble_to_code_words(bad),
            entry_address=params.ECRECOVER_INNER_FUNCTION_PRECOMPILE_ADDRESS)
        assert out["status"] == ST_DONE
        assert _heap_word(out, 4) == 0
        assert _heap_word(out, 5) == 0


class TestNativeVsGoldenPrecompileRecords:
    def test_log_record_parity(self):
        """The precompile Log-query record must serialize byte-identically
        across the golden and native engines (cross-engine contract)."""
        from era_zk_evm_tpu.testing import harness
        from era_zk_evm_tpu.witness.commitment import serialize_log_query

        prog = f"""
        add code[@w0], r0, r2
        st.h 0, r2
        add code[@abi], r0, r4
        log.precompile r4, r0, r5
        ret r0
        abi: .word {_abi(0, 17, 5)}
        w0: .word {int.from_bytes(bytes(range(100, 132)), 'big')}
        """
        entry = params.KECCAK256_ROUND_FUNCTION_PRECOMPILE_ADDRESS
        tools = harness.create_default_tools()
        vm = harness.build_vm(assemble_to_code_words(prog), tools=tools,
                              ergs=1 << 20, entry_address=entry)
        cycles = harness.run(vm, 64)
        native = run_oracle(assemble_to_code_words(prog),
                            entry_address=entry, max_cycles=64)
        assert native["status"] == ST_DONE
        assert native["cycles"] == cycles
        want_logs = [serialize_log_query(q)
                     for _, q in tools.witness.log_queries]
        assert native["log_records"] == want_logs
        # heap digest parity
        want_heap = vm.memory.dump_page(10, 0, 64)
        assert native["heap"] == want_heap


class TestNativeKeccakFuzz:
    def test_randomized_offsets_and_lengths(self):
        import random

        rng = random.Random(0xC0FFEE)
        for _ in range(10):
            offset = rng.randrange(0, 32)
            length = rng.randrange(0, 280)
            data = bytes(rng.randrange(256) for _ in range(length))
            padded = bytes(offset) + data
            padded += bytes(-len(padded) % 32)
            words, stores = [], []
            for i in range(len(padded) // 32):
                words.append(
                    f"w{i}: .word "
                    f"{int.from_bytes(padded[32*i:32*i+32], 'big')}")
                stores.append(f"add code[@w{i}], r0, r2\nst.h {32*i}, r2")
            prog = "\n".join(stores) + f"""
            add code[@abi], r0, r4
            log.precompile r4, r0, r5
            ret r0
            abi: .word {_abi(offset, length, 20)}
            """ + "\n".join(words)
            out = run_oracle(
                assemble_to_code_words(prog), heap_words=64,
                entry_address=
                params.KECCAK256_ROUND_FUNCTION_PRECOMPILE_ADDRESS)
            assert out["status"] == ST_DONE, (offset, length)
            want = int.from_bytes(keccak256(data), "big")
            assert _heap_word(out, 20) == want, (offset, length)
