"""Three-engine fuzz: batched TPU interpreter vs the native C++ oracle.

Both engines are independently proven against the golden Python model; this
campaign cross-checks them directly on a wide random batch (the native oracle
is ~10M cycles/s, so the bottleneck is the device run, which executes all
programs in one batch).  Compared: status, cycle counts, final registers +
pointer tags, flags, heap, and byte-identical witness record streams.
"""

import random

import numpy as np

from era_zk_evm_tpu.isa.assembler import assemble_to_code_words
from era_zk_evm_tpu.models import VmConfig, make_entry_state, run_cycles
from era_zk_evm_tpu.models.state import arena_word_major
from era_zk_evm_tpu.native import ST_DONE, run_oracle
from era_zk_evm_tpu.utils import from_limbs
from era_zk_evm_tpu.witness.commitment import (
    device_log_streams, device_queue_streams, serialize_log_query,
    serialize_memory_query,
)
from tests.test_batched_vm import _random_program

MAX_CYCLES = 160


def _gen_programs(n: int, seed: int) -> list[str]:
    rng = random.Random(seed)
    return [_random_program(rng) for _ in range(n)]


class TestCrossEngineFuzz:
    def test_device_vs_native_wide_batch(self):
        programs = _gen_programs(48, seed=0xF00D)
        words = [assemble_to_code_words(p) for p in programs]

        config = VmConfig(batch=len(programs), queue_capacity=MAX_CYCLES * 8,
                          heap_words=64, stack_words=2048, code_words=64,
                          max_depth=8, storage_slots=16, journal_slots=64,
                          event_slots=64, log_queue_capacity=MAX_CYCLES)
        state = make_entry_state(config, words, ergs=1 << 20)
        state = run_cycles(state, config, MAX_CYCLES)
        assert not np.any(np.asarray(state.lane_error))
        assert np.all(np.asarray(state.done))

        streams = device_queue_streams(state)
        log_streams = device_log_streams(state)
        regs = np.asarray(state.regs)
        tags = np.asarray(state.reg_ptr)
        flags = np.asarray(state.flags)
        mcc = np.asarray(state.monotonic_cycle_counter)
        heap = arena_word_major(state.heap, config)

        for b, w in enumerate(words):
            native = run_oracle(w, ergs=1 << 20, max_cycles=MAX_CYCLES,
                                witness_cap=MAX_CYCLES * 8)
            assert native["status"] == ST_DONE, (b, native["status"])
            assert native["cycles"] == int(mcc[b]), b
            for i in range(15):
                assert native["registers"][i] == from_limbs(regs[b, i]), \
                    (b, f"r{i+1}")
                assert native["reg_ptr"][i] == bool(tags[b, i]), (b, f"r{i+1}")
            lt, eq, gt = native["flags"]
            assert (lt, eq, gt) == tuple(bool(x) for x in flags[b]), b
            got_heap = [from_limbs(heap[b, i]) for i in range(64)]
            assert got_heap == native["heap"], b
            device_records = [serialize_memory_query(q) for q in streams[b]]
            assert device_records == native["witness_records"], b
            device_logs = [serialize_log_query(q) for q in log_streams[b]]
            assert device_logs == native["log_records"], b


class TestCrossEngineFarCallFuzz:
    def test_device_vs_native_far_calls(self):
        """Random far-call scenarios on both engines: the device batch and
        the native scalar oracle must agree byte-for-byte on the witness
        streams and on every architectural observable."""
        from era_zk_evm_tpu.isa import params
        from era_zk_evm_tpu.isa.abi import code_hash_for_bytecode
        from era_zk_evm_tpu.models.state import (
            populate_code_bank, populate_storage,
        )
        from era_zk_evm_tpu.witness.commitment import device_decommit_streams
        from tests.test_batched_far_call import _random_far_call_scenario

        callers, contracts = [], None
        for seed in (0xD01, 0xD02):
            c, contracts = _random_far_call_scenario(seed)
            callers.extend(c)
        words = [assemble_to_code_words(p) for p in callers]
        bank = []
        storage_entries = []
        for address, c_src in contracts:
            c_words = assemble_to_code_words(c_src)
            h = code_hash_for_bytecode(c_words)
            bank.append((h, c_words))
            storage_entries.append(
                (params.DEPLOYER_SYSTEM_CONTRACT_ADDRESS, address, h))

        B = len(callers)
        config = VmConfig(batch=B, queue_capacity=MAX_CYCLES * 8,
                          heap_words=64, stack_words=2048, code_words=64,
                          max_depth=8, storage_slots=16, journal_slots=64,
                          event_slots=64, log_queue_capacity=MAX_CYCLES,
                          heap_frames=4, code_pages=4,
                          decommit_queue_capacity=MAX_CYCLES)
        state = make_entry_state(config, words, ergs=1 << 20)
        state = populate_storage(
            state, config, [[(0, a, k, v) for a, k, v in storage_entries]] * B)
        state = populate_code_bank(state, config, [list(bank)] * B)
        state = run_cycles(state, config, MAX_CYCLES)
        assert not np.any(np.asarray(state.lane_error))
        assert np.all(np.asarray(state.done))

        streams = device_queue_streams(state)
        log_streams = device_log_streams(state)
        dec_streams = device_decommit_streams(state)
        regs = np.asarray(state.regs)
        tags = np.asarray(state.reg_ptr)
        flags = np.asarray(state.flags)
        mcc = np.asarray(state.monotonic_cycle_counter)
        heap = arena_word_major(state.heap, config)

        for b, w in enumerate(words):
            native = run_oracle(
                w, ergs=1 << 20, max_cycles=MAX_CYCLES,
                witness_cap=MAX_CYCLES * 8, contracts=bank,
                storage_entries=[(a, k, v) for a, k, v in storage_entries])
            assert native["status"] == ST_DONE, (b, native["status"])
            assert native["cycles"] == int(mcc[b]), b
            for i in range(15):
                assert native["registers"][i] == from_limbs(regs[b, i]), \
                    (b, f"r{i+1}")
                assert native["reg_ptr"][i] == bool(tags[b, i]), (b, f"r{i+1}")
            lt, eq, gt = native["flags"]
            assert (lt, eq, gt) == tuple(bool(x) for x in flags[b]), b
            # entry-frame heap (slot 0 of the device heap arena pool)
            got_heap = [from_limbs(heap[b, i]) for i in range(64)]
            assert got_heap == native["heap"], b
            device_records = [serialize_memory_query(q) for q in streams[b]]
            assert device_records == native["witness_records"], b
            device_logs = [serialize_log_query(q) for q in log_streams[b]]
            assert device_logs == native["log_records"], b
            got_dec = [(q.hash, q.timestamp, q.memory_page,
                        q.decommitted_length, q.is_fresh)
                       for q in dec_streams[b]]
            want_dec = [(d["hash"], d["timestamp"], d["page"], d["length"],
                         d["is_fresh"]) for d in native["decommit_records"]]
            assert got_dec == want_dec, b


class TestFusedEngineFuzz:
    def test_fused_vs_jnp_random_programs(self):
        """Third engine leg: the fused Pallas kernel must match the jnp
        interpreter bit-exactly on the randomized fuzz programs (the jnp
        engine is itself checked against the native C++ oracle above)."""
        import dataclasses

        from era_zk_evm_tpu.models.fused_cycle import (
            run_cycles_fused, supported,
        )

        programs = _gen_programs(16, seed=0xFACE)
        words = [assemble_to_code_words(p) for p in programs]
        config = VmConfig(batch=len(programs),
                          queue_capacity=MAX_CYCLES * 8,
                          heap_words=64, stack_words=2048, code_words=64,
                          max_depth=8, storage_slots=16, journal_slots=64,
                          event_slots=64, log_queue_capacity=MAX_CYCLES,
                          sweep_gating=False)
        assert supported(config)
        ref_config = dataclasses.replace(config, sweep_gating=True)
        ref = run_cycles(make_entry_state(ref_config, words, ergs=1 << 20),
                         ref_config, MAX_CYCLES)
        fus = run_cycles_fused(
            make_entry_state(config, words, ergs=1 << 20), config,
            MAX_CYCLES, tile=16, k_inner=40)
        bad = [f.name for f in dataclasses.fields(ref)
               if not (np.asarray(getattr(ref, f.name))
                       == np.asarray(getattr(fus, f.name))).all()]
        assert not bad, bad
        assert np.all(np.asarray(fus.done))
        assert not np.any(np.asarray(fus.lane_error))
