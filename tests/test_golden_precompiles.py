"""Precompile golden tests: keccak-f sponge, sha256 rounds, ecrecover.

Differential method mirrors the reference's own strategy
(testing/tests/precompiles/keccak256.rs): host-reference hash vs the
memory-to-memory round function, including 31-byte unaligned inputs.
"""

import hashlib

import pytest

from era_zk_evm_tpu.golden import GoldenMemory, MemoryQuery, MemoryType
from era_zk_evm_tpu.golden.precompiles import (
    GoldenPrecompilesProcessor, ecrecover_inner, keccak256, sha256_compress,
    SHA256_IV, SECP_GX, SECP_GY, SECP_N, _ec_mul, _inv_mod,
)
from era_zk_evm_tpu.golden.queries import LogQuery
from era_zk_evm_tpu.isa import params
from era_zk_evm_tpu.isa.abi import PrecompileCallABI
from era_zk_evm_tpu.testing.harness import reg, run_asm


class TestKeccakPrimitive:
    def test_known_vectors(self):
        assert keccak256(b"").hex() == \
            "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
        assert keccak256(b"abc").hex() == \
            "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
        assert keccak256(b"The quick brown fox jumps over the lazy dog").hex() == \
            "4d741b6f1eb29cb2a9b9911c82f56fa8d73b04959d3d9d222895df6c0b28aa15"

    def test_rate_boundaries(self):
        # exercise the padding edge cases: 135, 136, 137 bytes
        for n in (0, 1, 50, 135, 136, 137, 200, 272):
            data = bytes(range(256))[:n] if n <= 256 else b"x" * n
            # no stdlib keccak; cross-check shape invariants instead:
            digest = keccak256(data)
            assert len(digest) == 32


class TestSha256Primitive:
    def test_against_hashlib(self):
        # one manually padded block of the message "abc"
        msg = b"abc"
        block = msg + b"\x80" + b"\x00" * (64 - len(msg) - 1 - 8) \
            + (len(msg) * 8).to_bytes(8, "big")
        state = sha256_compress(list(SHA256_IV), block)
        digest = b"".join(x.to_bytes(4, "big") for x in state)
        assert digest == hashlib.sha256(msg).digest()

    def test_two_blocks(self):
        msg = b"a" * 100
        total = len(msg) * 8
        padded = msg + b"\x80" + b"\x00" * ((55 - len(msg)) % 64) \
            + total.to_bytes(8, "big")
        assert len(padded) % 64 == 0
        state = list(SHA256_IV)
        for i in range(0, len(padded), 64):
            state = sha256_compress(state, padded[i:i + 64])
        digest = b"".join(x.to_bytes(4, "big") for x in state)
        assert digest == hashlib.sha256(msg).digest()


class TestEcrecover:
    def test_sign_and_recover(self):
        # sign with a known private key, recover the address
        d = 0x1234567890ABCDEF1234567890ABCDEF1234567890ABCDEF1234567890ABCDEF
        pub = _ec_mul(d, (SECP_GX, SECP_GY))
        pub_bytes = pub[0].to_bytes(32, "big") + pub[1].to_bytes(32, "big")
        expected_address = int.from_bytes(keccak256(pub_bytes)[12:], "big")

        digest = int.from_bytes(keccak256(b"hello eravm"), "big")
        k = 0xDEADBEEF12345678DEADBEEF12345678DEADBEEF12345678DEADBEEF12345678
        R = _ec_mul(k, (SECP_GX, SECP_GY))
        r = R[0] % SECP_N
        s = _inv_mod(k, SECP_N) * (digest + r * d) % SECP_N
        v = R[1] & 1
        # normalize: if we reduce s we must flip v
        if s > SECP_N // 2:
            s = SECP_N - s
            v ^= 1
        recovered = ecrecover_inner(digest, v, r, s)
        assert recovered == expected_address

    def test_bad_signature_fails(self):
        assert ecrecover_inner(123, 0, 0, 5) is None
        assert ecrecover_inner(123, 5, 10, 5) is None


def _fill_heap_bytes(memory: GoldenMemory, page: int, data: bytes,
                     unalignment: int) -> int:
    """Reference test's pad_and_fill (keccak256.rs:39-69): prepend 0xff
    padding bytes, pack BE words.  Returns the number of words used."""
    stream = b"\xff" * unalignment + data
    n_words = (len(stream) + 31) // 32
    for i in range(n_words):
        chunk = stream[32 * i:32 * i + 32].ljust(32, b"\x00")
        memory.execute_partial_query(1, MemoryQuery(
            timestamp=0, memory_type=MemoryType.HEAP, page=page, index=i,
            value=int.from_bytes(chunk, "big"), value_is_pointer=False,
            rw_flag=True))
    return n_words


def _run_keccak_case(data: bytes, unalignment: int) -> None:
    memory = GoldenMemory()
    page = 4
    memory._indirections.add(page)  # reference test registers an indirection
    n_words = _fill_heap_bytes(memory, page, data, unalignment)
    abi = PrecompileCallABI(
        input_memory_offset=unalignment,
        input_memory_length=len(data),
        output_memory_offset=n_words,
        output_memory_length=0,
        memory_page_to_read=page,
        memory_page_to_write=page,
        precompile_interpreted_data=0,
    )
    query = LogQuery(
        timestamp=1, tx_number_in_block=0,
        aux_byte=params.PRECOMPILE_AUX_BYTE, shard_id=0,
        address=params.KECCAK256_ROUND_FUNCTION_PRECOMPILE_ADDRESS,
        key=abi.to_u256(), read_value=0, written_value=0,
        rw_flag=False, rollback=False, is_service=False)
    proc = GoldenPrecompilesProcessor()
    result = proc.execute_precompile(4, query, memory)
    assert result is not None
    out = memory.dump_page(page, n_words, n_words + 1)[0]
    assert out.to_bytes(32, "big") == keccak256(data)


class TestKeccakPrecompile:
    """The reference's 8 keccak256 precompile cases (keccak256.rs:144-196)."""

    @pytest.mark.parametrize("unalignment", [0, 31])
    @pytest.mark.parametrize("size", [0, 50, 136, 200])
    def test_cases(self, size, unalignment):
        _run_keccak_case(bytes([123] * size), unalignment)


class TestPrecompileViaVm:
    def test_log_precompile_keccak_from_program(self):
        # hash 4 bytes stored at heap offset 0; output at word 2
        data = (0x61626364).to_bytes(4, "big")  # "abcd"
        expected = int.from_bytes(keccak256(data), "big")
        abi = PrecompileCallABI(
            input_memory_offset=0, input_memory_length=4,
            output_memory_offset=2, output_memory_length=0,
            memory_page_to_read=0, memory_page_to_write=0,  # default own heap
            precompile_interpreted_data=0).to_u256()
        vm, tools, _ = run_asm(f"""
            add code[@data], r0, r2
            st.h 0, r2
            add code[@abi], r0, r4
            log.precompile r4, r0, r5
            add 64, r0, r6
            ld.h r6, r7              ; read back the digest
            ret r0
            abi: .word {abi}
            data: .word {int.from_bytes(data + bytes(28), 'big')}
        """, entry_address=params.KECCAK256_ROUND_FUNCTION_PRECOMPILE_ADDRESS)
        assert reg(vm, 5) == 1
        assert reg(vm, 7) == expected
        assert len(tools.witness.precompile_calls) == 1
        pc_result = tools.witness.precompile_calls[0]
        assert pc_result.mem_out[0].value == expected


class TestSha256PrecompileViaVm:
    def test_sha256_rounds_from_program(self):
        # one padded block of "abc" staged as 2 heap words; 1 round
        msg = b"abc"
        block = msg + b"\x80" + b"\x00" * (64 - len(msg) - 1 - 8) \
            + (len(msg) * 8).to_bytes(8, "big")
        w0 = int.from_bytes(block[:32], "big")
        w1 = int.from_bytes(block[32:], "big")
        expected = int.from_bytes(hashlib.sha256(msg).digest(), "big")
        abi = PrecompileCallABI(
            input_memory_offset=0, input_memory_length=2,
            output_memory_offset=2, output_memory_length=1,
            memory_page_to_read=0, memory_page_to_write=0,
            precompile_interpreted_data=1).to_u256()
        vm, tools, _ = run_asm(f"""
            add code[@w0], r0, r2
            st.h 0, r2
            add code[@w1], r0, r3
            st.h 32, r3
            add code[@abi], r0, r4
            log.precompile r4, r0, r5
            add 64, r0, r6
            ld.h r6, r7
            ret r0
            abi: .word {abi}
            w0: .word {w0}
            w1: .word {w1}
        """, entry_address=params.SHA256_ROUND_FUNCTION_PRECOMPILE_ADDRESS)
        assert reg(vm, 5) == 1
        assert reg(vm, 7) == expected


class TestEcrecoverPrecompileViaVm:
    def test_ecrecover_from_program(self):
        from era_zk_evm_tpu.golden.precompiles import (
            SECP_GX, SECP_GY, SECP_N, _ec_mul, _inv_mod, keccak256,
        )

        d = 0xA5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5
        pub = _ec_mul(d, (SECP_GX, SECP_GY))
        expected_address = int.from_bytes(
            keccak256(pub[0].to_bytes(32, "big")
                      + pub[1].to_bytes(32, "big"))[12:], "big")
        digest = int.from_bytes(keccak256(b"tx payload"), "big")
        k = 0x1357913579135791357913579135791357913579135791357913579135791357
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
        vm, tools, _ = run_asm(f"""
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
            ld.h r8, r9             ; success marker
            add 160, r0, r10
            ld.h r10, r11           ; recovered address
            ret r0
            abi: .word {abi}
            dg: .word {digest}
            sr: .word {r}
            ss: .word {s}
        """, entry_address=params.ECRECOVER_INNER_FUNCTION_PRECOMPILE_ADDRESS,
            max_cycles=200)
        assert reg(vm, 7) == 1
        assert reg(vm, 9) == 1
        assert reg(vm, 11) == expected_address
