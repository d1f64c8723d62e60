"""Fused Pallas cycle kernel vs the jnp interpreter: bit-exact state equality.

run_cycles_fused must reproduce run_cycles EXACTLY — every register, flag,
arena word, callstack entry, counter, and the full witness-queue block
content — for every supported program family (the jnp path is itself
diff-tested against the golden oracle, so equality here closes the chain).
Runs in Pallas interpret mode on CPU (tests/conftest.py pins the platform).
"""

import dataclasses

import numpy as np
import pytest

from era_zk_evm_tpu.isa.assembler import assemble_to_code_words
from era_zk_evm_tpu.models import VmConfig, make_entry_state, run_cycles
from era_zk_evm_tpu.models.fused_cycle import run_cycles_fused, supported

from test_batched_vm import (
    BASIC_PROGRAMS, CALL_PROGRAMS, CONTEXT_PROGRAMS, CONTROL_FLOW,
    PTR_PROGRAMS, STACK_PROGRAMS, UMA_PROGRAMS,
)

N_CYCLES = 48


@pytest.fixture(scope="module", autouse=True)
def _fresh_caches():
    # After a long full-suite run, XLA:CPU segfaults inside a pjit exec in
    # this module (position-dependent; the module alone always passes).
    # Dropping the accumulated executables before these tests avoids the
    # crashy interaction.
    import jax

    jax.clear_caches()
    yield


def _config(batch, limb_major=False, queue=True):
    return VmConfig(batch=batch, code_words=32, stack_words=256,
                    sweep_gating=False, stack_abs_words=64, stack_sp_base=960,
                    heap_words=64, aux_heap_words=16, max_depth=8,
                    queue_capacity=N_CYCLES * 8 * 2 if queue else 0,
                    limb_major_arenas=limb_major)


def fused_diff(programs, n_cycles=N_CYCLES, tile=4, k_inner=16,
               ergs=1 << 20, limb_major=False, queue=True):
    B = len(programs)
    while B % tile:  # largest divisor of B <= the requested tile
        tile -= 1
    config = _config(B, limb_major=limb_major, queue=queue)
    assert supported(config)
    words = [assemble_to_code_words(src) for src in programs]

    ref = run_cycles(make_entry_state(config, words, ergs=ergs),
                     config, n_cycles)
    fus = run_cycles_fused(make_entry_state(config, words, ergs=ergs),
                           config, n_cycles, tile=tile, k_inner=k_inner)

    bad = []
    for f in dataclasses.fields(ref):
        a = np.asarray(getattr(ref, f.name))
        b = np.asarray(getattr(fus, f.name))
        if a.shape != b.shape or not (a == b).all():
            bad.append(f.name)
    assert not bad, f"fused/jnp mismatch in fields: {bad}"
    return fus


class TestFusedConformance:
    def test_basic_arithmetic(self):
        fused_diff(BASIC_PROGRAMS[:4])

    def test_binops_and_swaps(self):
        fused_diff(BASIC_PROGRAMS[4:])

    def test_control_flow(self):
        fused_diff(CONTROL_FLOW)

    def test_stack(self):
        fused_diff(STACK_PROGRAMS)

    def test_uma(self):
        fused_diff(UMA_PROGRAMS[:4])

    def test_uma_growth_ergs(self):
        fused_diff([UMA_PROGRAMS[4]])

    def test_near_calls(self):
        fused_diff(CALL_PROGRAMS)

    def test_context(self):
        fused_diff(CONTEXT_PROGRAMS)

    def test_ptr_and_panics(self):
        fused_diff(PTR_PROGRAMS)

    def test_user_mode_masking(self):
        # kernel-only ctx op from a user-space frame must mask to panic
        fused_diff([
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
        ])

    def test_unsupported_families_flag_lane_error(self):
        # LOG / FAR_CALL outside the subset raise lane_error on both paths
        fus = fused_diff([
            """
            add 1, r0, r1
            log.sread r1, r2
            ret r0
            """,
        ])
        assert np.asarray(fus.lane_error).all()


class TestFusedGeometry:
    def test_chunk_remainder(self):
        # n_cycles not divisible by k_inner: full chunks + remainder kernel
        fused_diff(CONTROL_FLOW, n_cycles=N_CYCLES, k_inner=20)

    def test_single_chunk(self):
        fused_diff(BASIC_PROGRAMS[:2], n_cycles=N_CYCLES, k_inner=N_CYCLES)

    def test_multi_tile(self):
        fused_diff(BASIC_PROGRAMS[:2] * 2, tile=2)

    def test_limb_major_state_layout(self):
        fused_diff(UMA_PROGRAMS[:2] + STACK_PROGRAMS[:2], limb_major=True)

    def test_no_witness_queue(self):
        fused_diff(BASIC_PROGRAMS[:2] + CALL_PROGRAMS[:2], queue=False)

    def test_resume_preserves_block_clock(self):
        # two run_cycles_fused calls on one state == one long jnp run
        programs = CONTROL_FLOW
        B = len(programs)
        config = _config(B)
        words = [assemble_to_code_words(s) for s in programs]
        ref = run_cycles(make_entry_state(config, words, ergs=1 << 20),
                         config, N_CYCLES)
        fus = make_entry_state(config, words, ergs=1 << 20)
        fus = run_cycles_fused(fus, config, N_CYCLES // 2, tile=B, k_inner=16)
        fus = run_cycles_fused(fus, config, N_CYCLES // 2, tile=B, k_inner=16)
        for f in dataclasses.fields(ref):
            a = np.asarray(getattr(ref, f.name))
            b = np.asarray(getattr(fus, f.name))
            assert (a == b).all(), f.name


class TestFusedFuzz:
    def test_random_arith_programs(self):
        import random

        rng = random.Random(0xF05ED)
        ops = ["add", "sub", "and", "or", "xor", "shl", "shr", "rol", "ror",
               "mul", "div", "sub!", "add!"]
        programs = []
        for _ in range(4):
            lines = [f"add {rng.randrange(1, 1 << 16)}, r0, r{j}"
                     for j in range(1, 6)]
            for _ in range(24):
                op = rng.choice(ops)
                a, b, d = (rng.randrange(1, 15) for _ in range(3))
                if op in ("mul", "div"):
                    d2 = rng.randrange(1, 15)
                    lines.append(f"{op} r{a}, r{b}, r{d}, r{d2}")
                else:
                    lines.append(f"{op} r{a}, r{b}, r{d}")
            lines.append("ret r0")
            programs.append("\n".join(lines))
        fused_diff(programs, n_cycles=40)


# ===========================================================================
# LOG family + FAR_CALL coverage (fused vs jnp, full state equality)
# ===========================================================================

def _log_config(batch, n_cycles=N_CYCLES):
    return VmConfig(batch=batch, code_words=32, stack_words=256,
                    sweep_gating=False, stack_abs_words=64, stack_sp_base=960,
                    heap_words=64, aux_heap_words=16, max_depth=8,
                    queue_capacity=n_cycles * 8 * 2,
                    storage_slots=8, journal_slots=16, event_slots=16,
                    log_queue_capacity=n_cycles * 2, heap_frames=4,
                    code_pages=4, decommit_queue_capacity=n_cycles * 2)


def fused_diff_log(programs, contracts=None, n_cycles=N_CYCLES, tile=4,
                   k_inner=16, ergs=1 << 20):
    from era_zk_evm_tpu.isa import params
    from era_zk_evm_tpu.isa.abi import code_hash_for_bytecode
    from era_zk_evm_tpu.models.state import (
        populate_code_bank, populate_storage,
    )

    B = len(programs)
    while B % tile:
        tile -= 1
    config = _log_config(B, n_cycles)
    assert supported(config)
    words = [assemble_to_code_words(src) for src in programs]
    entries, bank = [], []
    for address, c_src in contracts or []:
        c_words = assemble_to_code_words(c_src)
        h = code_hash_for_bytecode(c_words)
        entries.append((0, params.DEPLOYER_SYSTEM_CONTRACT_ADDRESS,
                        address, h))
        bank.append((h, c_words))

    def fresh():
        s = make_entry_state(config, words, ergs=ergs)
        if entries:
            s = populate_storage(s, config, [entries] * B)
        if bank:
            s = populate_code_bank(s, config, [list(bank)] * B)
        return s

    ref = run_cycles(fresh(), config, n_cycles)
    fus = run_cycles_fused(fresh(), config, n_cycles, tile=tile,
                           k_inner=k_inner)
    bad = []
    for f in dataclasses.fields(ref):
        a = np.asarray(getattr(ref, f.name))
        b = np.asarray(getattr(fus, f.name))
        if a.shape != b.shape or not (a == b).all():
            bad.append(f.name)
    assert not bad, f"fused/jnp mismatch in fields: {bad}"
    return fus


class TestFusedLogFamily:
    def test_storage_events(self):
        from test_batched_vm import LOG_PROGRAMS

        fused_diff_log(LOG_PROGRAMS)

    def test_rollback_on_panic(self):
        fused_diff_log([
            """
            add 9, r0, r1
            add 11, r0, r2
            log.swrite r1, r2
            add 3000, r0, r9
            near_call r9, @w, @h
            done:
            log.sread r1, r5
            ret r0
            w:
            add 55, r0, r3
            log.swrite r1, r3
            log.event r1, r3
            panic
            h:
            jump @done
            """,
        ])

    def test_pubdata_out_of_ergs(self):
        # storage write with too few ergs for pubdata: soft failure
        fused_diff_log([
            """
            add 120, r0, r1
            ctx.set_pubdata r1
            add 1, r0, r2
            add 190, r0, r9
            near_call r9, @w, @h
            done:
            ret r0
            w:
            log.swrite r2, r2
            ret r0
            h:
            add 7, r0, r7
            jump @done
            """,
        ])


class TestFusedFarCall:
    def test_far_calls(self):
        from test_batched_far_call import CONTRACTS, FAR_PROGRAMS

        fused_diff_log(FAR_PROGRAMS, contracts=CONTRACTS, n_cycles=128,
                       k_inner=32)

    def test_delegate_and_mimic(self):
        from test_batched_far_call import DELEGATE_CONTRACTS, DELEGATE_PROGRAMS

        fused_diff_log(DELEGATE_PROGRAMS, contracts=DELEGATE_CONTRACTS,
                       n_cycles=128, k_inner=32)

    def test_far_call_bad_hash_panics_to_handler(self):
        # empty code-hash slot + zero default AA: versioned-hash validation
        # fails -> pending panic -> exception handler (no lane_error)
        fus = fused_diff_log([
            """
            add code[@abi], r0, r4
            add 77, r0, r2
            far_call r4, r2, @h
            ret r0
            h:
            add 5, r0, r5
            ret r0
            abi: .word 0
            """,
        ])
        assert not np.asarray(fus.lane_error).any()
        assert np.asarray(fus.done).all()


class TestFusedPrecompiles:
    """keccak256/sha256 through log.precompile in the fused kernel
    (pq round-witness + ecrecover stay on the jnp path; supported())."""

    def _pp_config(self, batch, n_cycles):
        return VmConfig(batch=batch, code_words=32, stack_words=256,
                        sweep_gating=False, stack_abs_words=64,
                        stack_sp_base=960, heap_words=32, aux_heap_words=16,
                        max_depth=8, queue_capacity=n_cycles * 8,
                        storage_slots=8, journal_slots=16, event_slots=16,
                        log_queue_capacity=n_cycles, heap_frames=2,
                        code_pages=2, decommit_queue_capacity=n_cycles,
                        precompile_keccak_blocks=2, precompile_sha_rounds=2)

    def _diff(self, programs, entry_address, n_cycles=64):
        B = len(programs)
        tile = B
        config = self._pp_config(B, n_cycles)
        assert supported(config)
        # the jnp reference runs with sweep gating ON: it partitions the
        # XLA:CPU graph (compile time), and since invalid witness rows are
        # zero-masked in both engines the results are gating-invariant
        ref_config = dataclasses.replace(config, sweep_gating=True)
        words = [assemble_to_code_words(s) for s in programs]
        ref = run_cycles(make_entry_state(ref_config, words, ergs=1 << 20,
                                          entry_address=entry_address),
                         ref_config, n_cycles)
        fus = run_cycles_fused(
            make_entry_state(config, words, ergs=1 << 20,
                             entry_address=entry_address),
            config, n_cycles, tile=tile, k_inner=32)
        bad = [f.name for f in dataclasses.fields(ref)
               if not (np.asarray(getattr(ref, f.name))
                       == np.asarray(getattr(fus, f.name))).all()]
        assert not bad, f"fused/jnp mismatch: {bad}"
        return fus

    def test_keccak_cases(self):
        from era_zk_evm_tpu.isa import params
        from test_batched_precompiles import keccak_abi

        programs = [
            # empty input
            f"""
            add code[@abi], r0, r4
            log.precompile r4, r0, r5
            ld.h 0, r7
            ret r0
            abi: .word {keccak_abi(0, 0, 0)}
            """,
            # unaligned offset 3, 40 bytes spanning two words
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
            # two-block input: 200 bytes
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
            ret r0
            abi: .word {keccak_abi(0, 200, 8)}
            fill: .word {int.from_bytes(bytes([0x7B] * 32), 'big')}
            """,
        ]
        fus = self._diff(
            programs,
            params.KECCAK256_ROUND_FUNCTION_PRECOMPILE_ADDRESS,
            n_cycles=64)
        assert not np.asarray(fus.lane_error).any()

    def test_sha256_rounds(self):
        from era_zk_evm_tpu.isa import params
        from test_batched_precompiles import sha_abi

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
        add 96, r0, r6
        ld.h r6, r7
        ret r0
        abi: .word {sha_abi(0, 1, 3)}
        w0: .word {w0}
        w1: .word {w1}
        """
        fus = self._diff(
            [prog], params.SHA256_ROUND_FUNCTION_PRECOMPILE_ADDRESS,
            n_cycles=48)
        assert not np.asarray(fus.lane_error).any()
        from era_zk_evm_tpu.models.state import arena_word_major
        from era_zk_evm_tpu.utils import from_limbs
        import hashlib
        heap = arena_word_major(np.asarray(fus.heap),
                                self._pp_config(1, 48))
        assert from_limbs(heap[0, 3]) == int.from_bytes(
            hashlib.sha256(msg).digest(), "big")


@pytest.mark.slow
class TestFusedEcrecover:
    """The ecrecover detour protocol: the fused kernel detects ecrecover
    cycles, the wrapper re-runs the chunk up to each one (dynamic k_stop)
    and executes that cycle on the jnp engine — full state + all witness
    queues bit-exact vs a pure jnp run.  Reference vectors construction:
    /root/reference/src/testing/tests/precompiles/ecrecover.rs:127-144."""

    def _ec_vector(self, seed_msg: bytes, d: int, k: int):
        from era_zk_evm_tpu.golden.precompiles import (
            SECP_GX, SECP_GY, SECP_N, _ec_mul, _inv_mod, keccak256,
        )

        digest = int.from_bytes(keccak256(seed_msg), "big")
        R = _ec_mul(k, (SECP_GX, SECP_GY))
        r = R[0] % SECP_N
        s = _inv_mod(k, SECP_N) * (digest + r * d) % SECP_N
        v = R[1] & 1
        if s > SECP_N // 2:
            s = SECP_N - s
            v ^= 1
        return digest, v, r, s

    def test_ecrecover_detour_mid_chunk(self):
        from era_zk_evm_tpu.isa import params
        from era_zk_evm_tpu.isa.abi import PrecompileCallABI

        d = 0xC0FFEE0DDF00DC0FFEE0DDF00DC0FFEE0DDF00DC0FFEE0DDF00DC0FFEE0DD01
        k1 = 0x8BADF00D8BADF00D8BADF00D8BADF00D8BADF00D8BADF00D8BADF00D8BADF00D
        dg1, v1, r1, s1 = self._ec_vector(b"fused detour 1", d, k1)
        dg2, v2, r2, s2 = self._ec_vector(b"fused detour 2", d, k1 + 7)
        ec_abi = PrecompileCallABI(
            input_memory_offset=0, input_memory_length=4,
            output_memory_offset=4, output_memory_length=2,
            memory_page_to_read=0, memory_page_to_write=0,
            precompile_interpreted_data=0).to_u256()
        kc_abi = PrecompileCallABI(
            input_memory_offset=0, input_memory_length=16,
            output_memory_offset=7, output_memory_length=1,
            memory_page_to_read=0, memory_page_to_write=0,
            precompile_interpreted_data=0).to_u256()

        def ec_call(dg, v, r, s, tag):
            return f"""
            add code[@dg{tag}], r0, r2
            st.h 0, r2
            add {v}, r0, r3
            st.h 32, r3
            add code[@sr{tag}], r0, r4
            st.h 64, r4
            add code[@ss{tag}], r0, r5
            st.h 96, r5
            add code[@ecabi], r0, r6
            log.precompile r6, r0, r7
            add 128, r0, r8
            ld.h r8, r9
            add 160, r0, r10
            ld.h r10, r11
            """

        prog = f"""
            add 1, r0, r14
            {ec_call(dg1, v1, r1, s1, '1')}
            add r9, r11, r12
            add code[@kcabi], r0, r6
            log.precompile r6, r0, r7
            ld.h 224, r13
            {ec_call(dg2, v2, r2, s2, '2')}
            add r9, r12, r12
            ret r0
            ecabi: .word {ec_abi}
            kcabi: .word {kc_abi}
            dg1: .word {dg1}
            sr1: .word {r1}
            ss1: .word {s1}
            dg2: .word {dg2}
            sr2: .word {r2}
            ss2: .word {s2}
        """
        n_cycles = 64
        B = 2
        config = dataclasses.replace(
            VmConfig(batch=B, code_words=64, stack_words=256,
                     sweep_gating=False, stack_abs_words=64,
                     stack_sp_base=960, heap_words=32, aux_heap_words=16,
                     max_depth=8, queue_capacity=n_cycles * 8,
                     storage_slots=8, journal_slots=16, event_slots=16,
                     log_queue_capacity=n_cycles, heap_frames=2,
                     code_pages=2, decommit_queue_capacity=n_cycles,
                     precompile_keccak_blocks=2, precompile_sha_rounds=2),
            precompile_ecrecover=True)
        assert supported(config)
        ref_config = dataclasses.replace(config, sweep_gating=True)
        words = [assemble_to_code_words(prog)] * B
        entry = params.ECRECOVER_INNER_FUNCTION_PRECOMPILE_ADDRESS
        ref = run_cycles(make_entry_state(ref_config, words, ergs=1 << 20,
                                          entry_address=entry),
                         ref_config, n_cycles)
        # k_inner=8 puts the ecrecover cycles mid-chunk repeatedly
        fus = run_cycles_fused(
            make_entry_state(config, words, ergs=1 << 20,
                             entry_address=entry),
            config, n_cycles, tile=B, k_inner=8)
        assert not np.asarray(ref.lane_error).any()
        bad = [f.name for f in dataclasses.fields(ref)
               if not (np.asarray(getattr(ref, f.name))
                       == np.asarray(getattr(fus, f.name))).all()]
        assert not bad, f"fused/jnp mismatch: {bad}"


class TestFusedRollingCommitment:
    def test_rolling_sponge_equality(self):
        config = VmConfig(batch=2, code_words=32, stack_words=256,
                          sweep_gating=False, stack_abs_words=64,
                          stack_sp_base=960, heap_words=32, aux_heap_words=8,
                          max_depth=8, queue_capacity=0,
                          rolling_commitment=True)
        assert supported(config)
        programs = [UMA_PROGRAMS[1], STACK_PROGRAMS[0]]
        words = [assemble_to_code_words(s) for s in programs]
        ref = run_cycles(make_entry_state(config, words, ergs=1 << 20),
                         config, N_CYCLES)
        fus = run_cycles_fused(make_entry_state(config, words, ergs=1 << 20),
                               config, N_CYCLES, tile=2, k_inner=16)
        for f in dataclasses.fields(ref):
            a = np.asarray(getattr(ref, f.name))
            b = np.asarray(getattr(fus, f.name))
            assert (a == b).all(), f.name
        assert np.asarray(fus.wc_count).all()

    @pytest.mark.slow  # ~10 min of interpret-mode XLA:CPU kernel compiles
    def test_bitsliced_fold_matches_fallback_and_spec(self):
        """The bit-sliced rolling fold (B % 256 == 0 path) against BOTH the
        u32-pair fallback kernel and an independent numpy model of the
        rate-packed spec v2, on random slot blocks with mixed validity,
        parities, and nonzero initial sponge states."""
        import jax
        import jax.numpy as jnp

        from era_zk_evm_tpu.golden.precompiles import keccak_f1600
        from era_zk_evm_tpu.models.fused_cycle import (
            _rolling_fold_bitsliced, _rolling_fold_call,
        )

        B, k_cycles = 256, 2
        kq = k_cycles * 8
        rng = np.random.RandomState(3)
        meta = rng.randint(0, 1 << 32, size=(kq, 4, B), dtype=np.uint64) \
            .astype(np.uint32)
        val = rng.randint(0, 1 << 32, size=(kq, 8, B), dtype=np.uint64) \
            .astype(np.uint32)
        # ~60% valid slots; random rw/ptr bits; zero out invalid rows the
        # way the engine does (validity gates absorbs either way)
        valid = rng.rand(kq, B) < 0.6
        flg = (rng.randint(0, 4, size=(kq, B)).astype(np.uint32) | 4) \
            * valid.astype(np.uint32)
        meta *= valid[:, None, :].astype(np.uint32)
        val *= valid[:, None, :].astype(np.uint32)
        wc0 = rng.randint(0, 1 << 32, size=(25, 2, B), dtype=np.uint64) \
            .astype(np.uint32)
        cnt0 = rng.randint(0, 7, size=(1, B)).astype(np.uint32)

        config = VmConfig(batch=B, code_words=32, stack_words=256,
                          sweep_gating=False, stack_abs_words=64,
                          stack_sp_base=960, heap_words=32, aux_heap_words=8,
                          max_depth=8, queue_capacity=0,
                          rolling_commitment=True)
        bs = _rolling_fold_bitsliced(config, k_cycles, interpret=True)
        wc_bs, cnt_bs = jax.jit(bs)(jnp.asarray(meta), jnp.asarray(val),
                                    jnp.asarray(flg), jnp.asarray(wc0),
                                    jnp.asarray(cnt0))
        fb = _rolling_fold_call(config, k_cycles, tile=B, interpret=True)
        wc_fb, cnt_fb = jax.jit(fb)(jnp.asarray(meta), jnp.asarray(val),
                                    jnp.asarray(flg), jnp.asarray(wc0),
                                    jnp.asarray(cnt0))
        assert (np.asarray(cnt_bs) == np.asarray(cnt_fb)).all()
        assert (np.asarray(wc_bs) == np.asarray(wc_fb)).all()

        # independent numpy model of spec v2 (one random lane per parity)
        def bswap32(x):
            return int.from_bytes(int(x).to_bytes(4, "little"), "big")

        for lane in (0, 1, 77, 255):
            st = [int(wc0[k, 0, lane]) | (int(wc0[k, 1, lane]) << 32)
                  for k in range(25)]
            count = int(cnt0[0, lane])
            for s in range(kq):
                if not (flg[s, lane] & 4):
                    continue
                ts, mt, pg, ix = (int(meta[s, i, lane]) for i in range(4))
                fl = int(flg[s, lane]) & 3
                rec = (ts.to_bytes(4, "big") + bytes([mt & 0xFF])
                       + pg.to_bytes(4, "big") + ix.to_bytes(4, "big")
                       + bytes([fl]) + bytes(18)
                       + b"".join(int(val[s, 7 - i, lane]).to_bytes(4, "big")
                                  for i in range(8)))
                base = 0 if count % 2 == 0 else 8
                for k in range(8):
                    st[base + k] ^= int.from_bytes(rec[8 * k:8 * k + 8],
                                                   "little")
                if count % 2 == 1:
                    st = keccak_f1600(st)
                count += 1
            got = np.asarray(wc_bs)[:, :, lane]
            want = np.array([[w & 0xFFFFFFFF, w >> 32]
                             for w in st], dtype=np.uint32)
            assert (got == want).all(), lane
            assert int(np.asarray(cnt_bs)[0, lane]) == count


class TestFusedSharded:
    def test_run_block_fused_on_cpu_mesh(self):
        """Fused engine under shard_map on the 8-device virtual mesh equals
        the single-shard fused run (same aggregates + full state)."""
        import jax

        from era_zk_evm_tpu.parallel.fused import run_block_fused
        from era_zk_evm_tpu.parallel.mesh import make_mesh, shard_state

        B = 8
        config = _config(B)
        words = [assemble_to_code_words(s)
                 for s in (BASIC_PROGRAMS[:4] + CONTROL_FLOW)[:B]]
        words += [words[0]] * (B - len(words))
        single = run_cycles_fused(
            make_entry_state(config, words, ergs=1 << 20), config,
            N_CYCLES, tile=8, k_inner=16)

        mesh = make_mesh(8)
        state = shard_state(make_entry_state(config, words, ergs=1 << 20),
                            mesh)
        sharded, agg = run_block_fused(state, config, N_CYCLES, mesh,
                                       tile=1, k_inner=16)
        assert int(agg["done_lanes"]) == B
        assert int(agg["error_lanes"]) == 0
        for f in dataclasses.fields(single):
            a = np.asarray(getattr(single, f.name))
            b = np.asarray(getattr(sharded, f.name))
            assert (a == b).all(), f.name

    def test_collective_block_commitment(self):
        """The device/collective block fold (finalize per shard, all-gather
        digests over the mesh, fold in global lane order) equals the host
        fold of witness/commitment.py bit-exactly, on both engines."""
        from era_zk_evm_tpu.parallel.fused import run_block_fused
        from era_zk_evm_tpu.parallel.mesh import (
            make_mesh, run_block, shard_state,
        )
        from era_zk_evm_tpu.witness.commitment import (
            block_commitment, device_rolling_commitments,
        )

        B = 8
        config = VmConfig(batch=B, code_words=32, stack_words=256,
                          sweep_gating=False, stack_abs_words=64,
                          stack_sp_base=960, heap_words=32, aux_heap_words=8,
                          max_depth=8, queue_capacity=0,
                          rolling_commitment=True)
        assert supported(config)
        words = [assemble_to_code_words(s)
                 for s in (UMA_PROGRAMS[:4] + STACK_PROGRAMS)[:B]]
        words += [words[0]] * (B - len(words))
        mesh = make_mesh(8)
        state = shard_state(make_entry_state(config, words, ergs=1 << 20),
                            mesh)
        out, agg = run_block_fused(state, config, N_CYCLES, mesh,
                                   tile=1, k_inner=16)
        got = b"".join(int(w).to_bytes(4, "little")
                       for w in np.asarray(agg["memory_block_commitment"]))
        want = block_commitment(device_rolling_commitments(out))
        assert got == want

        # jnp engine (auto-partitioned fold) agrees
        state2 = shard_state(make_entry_state(config, words, ergs=1 << 20),
                             mesh)
        out2, agg2 = run_block(state2, config, N_CYCLES)
        got2 = b"".join(int(w).to_bytes(4, "little")
                        for w in np.asarray(agg2["memory_block_commitment"]))
        assert got2 == want


class TestFusedPrecompileRoundWitness:
    def test_pq_streams_and_clock(self):
        """The precompile mem_in/mem_out round-witness queue: per-cycle
        blocks spliced at the batch-global block clock by the wrapper,
        bit-exact vs jnp incl. across chunk boundaries."""
        from era_zk_evm_tpu.isa import params
        from era_zk_evm_tpu.isa.abi import PrecompileCallABI
        from era_zk_evm_tpu.witness.commitment import (
            device_precompile_streams,
        )

        def kabi(o, l, out):
            return PrecompileCallABI(o, l, out, 0, 0, 0, 0).to_u256()

        prog = f"""
        add code[@w0], r0, r2
        st.h 0, r2
        add code[@abi], r0, r4
        log.precompile r4, r0, r5
        add code[@abi2], r0, r4
        log.precompile r4, r0, r5
        ret r0
        abi: .word {kabi(3, 24, 3)}
        abi2: .word {kabi(0, 17, 5)}
        w0: .word {int.from_bytes(bytes(range(64, 96)), 'big')}
        """
        N, B = 48, 2
        config = VmConfig(batch=B, code_words=32, stack_words=256,
                          sweep_gating=False, stack_abs_words=64,
                          stack_sp_base=960, heap_words=32, aux_heap_words=16,
                          max_depth=8, queue_capacity=N * 8, storage_slots=8,
                          journal_slots=16, event_slots=16,
                          log_queue_capacity=N, heap_frames=2, code_pages=2,
                          decommit_queue_capacity=N,
                          precompile_keccak_blocks=2, precompile_sha_rounds=2,
                          precompile_queue_capacity=64)
        assert supported(config)
        words = [assemble_to_code_words(prog)] * B
        entry = params.KECCAK256_ROUND_FUNCTION_PRECOMPILE_ADDRESS
        rc = dataclasses.replace(config, sweep_gating=True)
        ref = run_cycles(make_entry_state(rc, words, ergs=1 << 20,
                                          entry_address=entry), rc, N)
        # k_inner=8 forces the block clock across SIX chunk boundaries
        fus = run_cycles_fused(
            make_entry_state(config, words, ergs=1 << 20,
                             entry_address=entry), config, N, tile=2,
            k_inner=8)
        bad = [f.name for f in dataclasses.fields(ref)
               if not (np.asarray(getattr(ref, f.name))
                       == np.asarray(getattr(fus, f.name))).all()]
        assert not bad, bad
        assert device_precompile_streams(ref) == \
            device_precompile_streams(fus)
        assert not np.asarray(fus.lane_error).any()


class TestFusedCheckpointAndCompaction:
    def test_checkpoint_resume_across_engines(self, tmp_path):
        """Checkpoint a jnp run midway, resume on the FUSED engine (and vice
        versa) — block clocks and queue contents survive the handoff."""
        from era_zk_evm_tpu.models.checkpoint import (
            load_checkpoint, save_checkpoint,
        )

        programs = CONTROL_FLOW
        B = len(programs)
        config = _config(B)
        words = [assemble_to_code_words(s) for s in programs]
        ref = run_cycles(make_entry_state(config, words, ergs=1 << 20),
                         config, N_CYCLES)

        half = make_entry_state(config, words, ergs=1 << 20)
        half = run_cycles(half, config, N_CYCLES // 2)       # jnp first half
        path = tmp_path / "mid.ckpt"
        save_checkpoint(path, half, config)
        restored, _ = load_checkpoint(path)
        resumed = run_cycles_fused(restored, config, N_CYCLES // 2,
                                   tile=B, k_inner=8)        # fused second
        for f in dataclasses.fields(ref):
            a = np.asarray(getattr(ref, f.name))
            b = np.asarray(getattr(resumed, f.name))
            assert (a == b).all(), f.name

    def test_compaction_between_fused_segments(self):
        """Journal/event compaction between fused run segments equals an
        uncompacted jnp run's final storage + rollback behavior."""
        from era_zk_evm_tpu.models.compaction import compact_log_state

        src = """
        add 1, r0, r10
        add 6, r0, r1
        loop:
        log.swrite r1, r1
        log.event r1, r1
        sub! r1, r10, r1
        jump.if_ne @loop
        add 3, r0, r2
        log.sread r2, r5
        ret r0
        """
        config = _log_config(1)
        words = [assemble_to_code_words(src)]
        ref = run_cycles(make_entry_state(config, words, ergs=1 << 20),
                         config, N_CYCLES)
        fus = make_entry_state(config, words, ergs=1 << 20)
        fus = run_cycles_fused(fus, config, N_CYCLES // 2, tile=1, k_inner=8)
        fus = compact_log_state(fus, config)
        fus = run_cycles_fused(fus, config, N_CYCLES // 2, tile=1, k_inner=8)
        assert np.asarray(fus.done).all()
        assert not np.asarray(fus.lane_error).any()
        # storage end-state equality (journal positions differ by design)
        ref_kv = {}
        for i in range(config.storage_slots):
            if np.asarray(ref.st_used)[0, i]:
                ref_kv[int(np.asarray(ref.st_key)[0, i, 0])] = \
                    int(np.asarray(ref.st_val)[0, i, 0])
        fus_kv = {}
        for i in range(config.storage_slots):
            if np.asarray(fus.st_used)[0, i]:
                fus_kv[int(np.asarray(fus.st_key)[0, i, 0])] = \
                    int(np.asarray(fus.st_val)[0, i, 0])
        assert ref_kv == fus_kv


class TestFusedLogQueueResume:
    def test_lq_dq_splice_at_resumed_clock(self):
        """Two fused calls on one state: the log/decommit-queue blocks must
        splice at the persistent step clock (step0 > 0 on the second call),
        landing bit-exactly on the one-shot jnp run."""
        prog = """
        add 1, r0, r10
        add 8, r0, r1
        loop:
        log.swrite r1, r1
        log.event r1, r1
        sub! r1, r10, r1
        jump.if_ne @loop
        log.sread r10, r5
        ret r0
        """
        config = _log_config(2)
        words = [assemble_to_code_words(prog)] * 2
        ref = run_cycles(make_entry_state(config, words, ergs=1 << 20),
                         config, N_CYCLES)
        fus = make_entry_state(config, words, ergs=1 << 20)
        fus = run_cycles_fused(fus, config, N_CYCLES // 2, tile=2, k_inner=8)
        fus = run_cycles_fused(fus, config, N_CYCLES // 2, tile=2, k_inner=8)
        for f in dataclasses.fields(ref):
            a = np.asarray(getattr(ref, f.name))
            b = np.asarray(getattr(fus, f.name))
            assert (a == b).all(), f.name
