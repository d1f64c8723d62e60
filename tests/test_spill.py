"""Spill-to-host protocols: queue draining + callstack spill windows."""

import numpy as np

from era_zk_evm_tpu.isa import params
from era_zk_evm_tpu.isa.assembler import assemble_to_code_words
from era_zk_evm_tpu.models import VmConfig, make_entry_state, run_cycles
from era_zk_evm_tpu.models.spill import (
    SpilledFrames, drain_witness_queues, normalize_callstack, run_segments,
)
from era_zk_evm_tpu.testing.harness import run_golden_like
from era_zk_evm_tpu.utils import from_limbs
from era_zk_evm_tpu.witness.commitment import (
    serialize_log_query, serialize_memory_query,
)

PROG = """
    add 5, r0, r1
    add 70, r0, r2
    log.swrite r1, r2
    st.h 0, r2
    ld.h 0, r3
    add r3, r0, stack+=[1]
    add stack-=[1], r0, r4
    log.event r1, r4
    log.sread r1, r6
    ret r0
"""


class TestQueueDrain:
    def test_segmented_drains_equal_one_shot(self):
        words = [assemble_to_code_words(PROG)] * 2
        big = VmConfig(batch=2, queue_capacity=32 * 8, heap_words=16,
                       stack_words=2048, code_words=64, max_depth=8,
                       storage_slots=8, journal_slots=16, event_slots=16,
                       log_queue_capacity=32)
        small = VmConfig(batch=2, queue_capacity=8 * 8, heap_words=16,
                         stack_words=2048, code_words=64, max_depth=8,
                         storage_slots=8, journal_slots=16, event_slots=16,
                         log_queue_capacity=8)

        ref = run_cycles(make_entry_state(big, words, ergs=1 << 20), big, 32)
        _, want = drain_witness_queues(ref, big)

        state = make_entry_state(small, words, ergs=1 << 20)
        got_mem = [[] for _ in range(2)]
        got_log = [[] for _ in range(2)]
        for _ in range(4):
            state = run_cycles(state, small, 8)
            state, streams = drain_witness_queues(state, small)
            for b in range(2):
                got_mem[b].extend(streams["memory"][b])
                got_log[b].extend(streams["log"][b])
        assert not np.any(np.asarray(state.lane_error))
        for b in range(2):
            assert [serialize_memory_query(q) for q in got_mem[b]] == \
                [serialize_memory_query(q) for q in want["memory"][b]]
            assert [serialize_log_query(q) for q in got_log[b]] == \
                [serialize_log_query(q) for q in want["log"][b]]


RECURSE = """
    add 1, r0, r10
    add 12, r0, r13
    near_call r0, @rec, @fail
    add 7, r0, r5
    ret r0
    fail:
    panic
    rec:
    sub! r13, r10, r13
    jump.if_eq @leaf
    near_call r0, @rec, @fail
    leaf:
    ret r0
"""


class TestStorageKvSpill:
    def test_4x_distinct_keys_segmented(self):
        """A program writing 4x storage_slots distinct keys (and re-reading
        old, evicted ones — exercising the rehydrate/replay path) runs
        segmented through the KV spill, and its concatenated log stream +
        final storage equal an unsegmented big-table run.  Reference
        counterpart: unbounded storage, testing/storage.rs:8-76."""
        from era_zk_evm_tpu.models.spill import (
            HostStorage, run_segments_storage,
        )

        prog = """
            add 1, r0, r10
            add code[@n], r0, r1
            add 0, r0, r2
            loop:
            add r2, r10, r2
            log.swrite r2, r2
            and 7, r2, r4
            add r4, r10, r4
            log.sread r4, r5
            sub! r1, r10, r1
            jump.if_ne @loop
            ret r0
            n: .word 32
        """
        words = [assemble_to_code_words(prog)] * 2
        # unsegmented reference: table big enough for all 32 keys
        big = VmConfig(batch=2, queue_capacity=0, heap_words=16,
                       stack_words=2048, code_words=64, max_depth=8,
                       storage_slots=40, journal_slots=256, event_slots=8,
                       log_queue_capacity=256)
        n_cycles = 32 * 7 + 8
        ref = run_cycles(make_entry_state(big, words, ergs=1 << 20),
                         big, n_cycles)
        assert not np.any(np.asarray(ref.lane_error))
        _, want = drain_witness_queues(ref, big)

        # segmented: 8-slot table, spill between 32-cycle segments
        small = VmConfig(batch=2, queue_capacity=0, heap_words=16,
                         stack_words=2048, code_words=64, max_depth=8,
                         storage_slots=8, journal_slots=256, event_slots=8,
                         log_queue_capacity=32)
        state = make_entry_state(small, words, ergs=1 << 20)
        state, host, got = run_segments_storage(
            state, small, run_cycles, n_cycles, segment=16)
        assert not np.any(np.asarray(state.lane_error))
        for b in range(2):
            assert [serialize_log_query(q) for q in got["log"][b]] == \
                [serialize_log_query(q) for q in want["log"][b]]

        # final storage: host map + device residual == the big table
        from era_zk_evm_tpu.models.state import storage_key_limbs

        st_key = np.asarray(ref.st_key)
        st_val = np.asarray(ref.st_val)
        st_used = np.asarray(ref.st_used)
        sk = np.asarray(state.st_key)
        sv = np.asarray(state.st_val)
        su = np.asarray(state.st_used)
        for b in range(2):
            want_map = {tuple(int(x) for x in st_key[b, i]):
                        tuple(int(x) for x in st_val[b, i])
                        for i in range(st_key.shape[1]) if st_used[b, i]}
            got_map = {k: tuple(int(x) for x in v)
                       for k, v in host.maps[b].items()}
            for i in range(sk.shape[1]):
                if su[b, i]:
                    got_map[tuple(int(x) for x in sk[b, i])] = \
                        tuple(int(x) for x in sv[b, i])
            assert got_map == want_map


class TestHeapFrameReclaim:
    def test_many_far_calls_through_small_frame_pool(self):
        """4x more far calls than heap_frames: reclamation between
        segments compacts dead frame slots (tag-based liveness keeps the
        live returndata pointer's page), and the run's registers + full
        witness stream equal an unreclaimed big-pool run.  Reference
        counterpart: unbounded page allocation, memory.rs:660-758."""
        import dataclasses

        from era_zk_evm_tpu.isa import params as P
        from era_zk_evm_tpu.isa.abi import (
            FarCallABI, FatPointer, ForwardingMode, RetABI,
            code_hash_for_bytecode,
        )
        from era_zk_evm_tpu.models.spill import reclaim_heap_frames
        from era_zk_evm_tpu.models.state import (
            populate_code_bank, populate_storage,
        )

        n_calls = 12
        callee_addr = 0x20042
        r_abi = RetABI(FatPointer(0, 0, 0, 32),
                       ForwardingMode.USE_HEAP).to_u256()
        f_abi = FarCallABI(FatPointer(0, 0, 0, 32), (1 << 30), 0,
                           ForwardingMode.USE_HEAP, False, False).to_u256()
        callee = assemble_to_code_words(f"""
            ld.ptr r1, r5
            add 7, r0, r6
            add r5, r6, r5
            st.h 0, r5
            add code[@rabi], r0, r7
            ret r7
            rabi: .word {r_abi}
        """)
        h = code_hash_for_bytecode(callee)
        caller = assemble_to_code_words(f"""
            add 1, r0, r10
            add code[@n], r0, r13
            add 0, r0, r3
            loop:
            st.h 0, r3
            add code[@abi], r0, r4
            add code[@dest], r0, r2
            far_call r4, r2, @fail
            ld.ptr r1, r3
            sub! r13, r10, r13
            jump.if_ne @loop
            ret r0
            fail:
            panic
            abi: .word {f_abi}
            dest: .word {callee_addr}
            n: .word {n_calls}
        """)
        entries = [(0, P.DEPLOYER_SYSTEM_CONTRACT_ADDRESS, callee_addr, h)]
        n_cycles = n_calls * 12

        def build(frames):
            cfg = VmConfig(batch=2, code_words=16, stack_words=2048,
                           heap_words=16, aux_heap_words=8, max_depth=8,
                           queue_capacity=n_cycles * 8,
                           storage_slots=4, journal_slots=8, event_slots=8,
                           log_queue_capacity=n_cycles, heap_frames=frames,
                           code_pages=2,
                           decommit_queue_capacity=n_cycles)
            st = make_entry_state(cfg, [caller] * 2, ergs=1 << 24)
            st = populate_storage(st, cfg, [entries] * 2)
            return cfg, populate_code_bank(st, cfg, [[(h, callee)]] * 2)

        big_cfg, big = build(n_calls + 2)
        big = run_cycles(big, big_cfg, n_cycles)
        assert not np.asarray(big.lane_error).any()
        assert np.asarray(big.done).all()

        small_cfg, small = build(4)
        done = 0
        while done < n_cycles:
            small = run_cycles(small, small_cfg, 12)
            small = reclaim_heap_frames(small, small_cfg)
            assert int(np.asarray(small.frame_count).max()) <= 3
            done += 12
        assert not np.asarray(small.lane_error).any()
        assert np.asarray(small.done).all()

        # registers (the final r1 returndata protocol included) + ordered
        # witness streams must match the big-pool run exactly
        assert (np.asarray(small.regs) == np.asarray(big.regs)).all()
        assert (np.asarray(small.reg_ptr) == np.asarray(big.reg_ptr)).all()
        from era_zk_evm_tpu.witness.commitment import (
            device_log_streams, device_queue_streams, serialize_log_query,
            serialize_memory_query,
        )

        for wb, ws in zip(device_queue_streams(big),
                          device_queue_streams(small)):
            assert [serialize_memory_query(q) for q in wb] == \
                [serialize_memory_query(q) for q in ws]
        for lb, ls in zip(device_log_streams(big),
                          device_log_streams(small)):
            assert [serialize_log_query(q) for q in lb] == \
                [serialize_log_query(q) for q in ls]


class TestCodeBankEviction:
    def test_decommit_heavy_through_small_code_bank(self):
        """A caller far-calling 3 distinct contracts round-robin runs
        through a 3-slot code bank (entry + 2) via eviction between
        8-cycle segments — including a contract that NEVER fit the device
        bank (staged host-side from the start) — and the concatenated
        log + decommit streams and final registers equal an unsegmented
        big-bank run.  Reference counterpart: the unbounded decommitter
        HashMap, decommitter.rs:10-99."""
        from era_zk_evm_tpu.isa import params as P
        from era_zk_evm_tpu.isa.abi import (
            FarCallABI, FatPointer, ForwardingMode, RetABI,
            code_hash_for_bytecode,
        )
        from era_zk_evm_tpu.models.spill import (
            HostCodeBank, run_segments_decommit,
        )
        from era_zk_evm_tpu.models.state import (
            populate_code_bank, populate_storage,
        )
        from era_zk_evm_tpu.utils import to_limbs
        from era_zk_evm_tpu.witness.commitment import (
            device_decommit_streams, device_log_streams,
            serialize_decommittment,
        )

        r_abi = RetABI(FatPointer(0, 0, 0, 0),
                       ForwardingMode.USE_HEAP).to_u256()
        f_abi = FarCallABI(FatPointer(0, 0, 0, 0), 1 << 30, 0,
                           ForwardingMode.USE_HEAP, False, False).to_u256()
        callees = []
        for k in range(3):
            words = assemble_to_code_words(f"""
                add {k + 5}, r0, r11
                log.swrite r11, r11
                add code[@rabi], r0, r7
                ret r7
                rabi: .word {r_abi}
            """)
            callees.append((0x20042 + k, code_hash_for_bytecode(words),
                            words))
        calls = "\n".join(
            f"add code[@abi], r0, r4\n"
            f"add code[@d{i % 3}], r0, r2\n"
            f"far_call r4, r2, @fail"
            for i in range(6))
        caller = assemble_to_code_words(f"""
            {calls}
            ret r0
            fail:
            panic
            abi: .word {f_abi}
            d0: .word {callees[0][0]}
            d1: .word {callees[1][0]}
            d2: .word {callees[2][0]}
        """)
        entries = [(0, P.DEPLOYER_SYSTEM_CONTRACT_ADDRESS, addr, h)
                   for addr, h, _ in callees]
        n_cycles = 6 * 8 + 8
        B = 2

        def build(code_pages, staged):
            cfg = VmConfig(batch=B, code_words=16, stack_words=2048,
                           heap_words=16, aux_heap_words=8, max_depth=8,
                           queue_capacity=0, storage_slots=8,
                           journal_slots=16, event_slots=8,
                           log_queue_capacity=n_cycles,
                           heap_frames=8, code_pages=code_pages,
                           decommit_queue_capacity=n_cycles)
            st = make_entry_state(cfg, [caller] * B, ergs=1 << 24)
            st = populate_storage(st, cfg, [entries] * B)
            bank = [(h, w) for _, h, w in staged]
            return cfg, populate_code_bank(st, cfg, [bank] * B)

        big_cfg, big = build(5, callees)
        big = run_cycles(big, big_cfg, n_cycles)
        assert not np.asarray(big.lane_error).any()
        assert np.asarray(big.done).all()
        want_log = device_log_streams(big)
        want_dq = device_decommit_streams(big)

        # small bank: only 2 of 3 contracts fit; the 3rd starts host-side
        small_cfg, small = build(3, callees[:2])
        host = HostCodeBank.empty(B)
        cw = small_cfg.code_words
        words3 = np.zeros((cw, 8), dtype=np.uint32)
        for i, w in enumerate(callees[2][2]):
            words3[i] = to_limbs(w)
        for b in range(B):
            host.maps[b][tuple(int(x) for x in to_limbs(callees[2][1]))] = {
                "page": 0, "len": len(callees[2][2]), "words": words3}
        small, host, got = run_segments_decommit(
            small, small_cfg, run_cycles, n_cycles, segment=8, host=host)
        assert not np.asarray(small.lane_error).any()
        assert np.asarray(small.done).all()
        assert (np.asarray(small.regs) == np.asarray(big.regs)).all()
        for b in range(B):
            assert [serialize_log_query(q) for q in got["log"][b]] == \
                [serialize_log_query(q) for q in want_log[b]]
            assert [serialize_decommittment(q) for q in got["decommit"][b]] \
                == [serialize_decommittment(q) for q in want_dq[b]]
        # the bank really was too small: something got evicted to host
        assert any(host.maps[b] for b in range(B))


class TestCallstackSpill:
    def test_deep_recursion_through_shallow_device_stack(self):
        # architectural depth reaches 14; device holds only 8 frames
        vm, _, cycles = run_golden_like(RECURSE, 128)
        config = VmConfig(batch=2, queue_capacity=0, heap_words=16,
                          stack_words=2048, code_words=64, max_depth=8)
        words = [assemble_to_code_words(RECURSE)] * 2
        state = make_entry_state(config, words, ergs=1 << 20)
        state, spilled = run_segments(state, config, run_cycles,
                                      n_cycles=80, segment=2)
        assert np.all(np.asarray(state.done))
        assert not np.any(np.asarray(state.lane_error))
        assert all(not f for f in spilled.frames)
        for b in range(2):
            assert int(np.asarray(state.monotonic_cycle_counter)[b]) == cycles
            for i in range(15):
                want = vm.local_state.registers[i]
                got = from_limbs(np.asarray(state.regs)[b, i])
                assert got == want.value, f"r{i+1}"
            root_ergs = int(np.asarray(state.cs_scalars)[b, 0, 5])
            want_root = vm.local_state.callstack.current.ergs_remaining
            assert root_ergs == want_root

    def test_normalize_roundtrip_preserves_frames(self):
        # push some frames, spill to a window, restore, compare arrays
        config = VmConfig(batch=1, queue_capacity=0, heap_words=16,
                          stack_words=2048, code_words=64, max_depth=8)
        words = [assemble_to_code_words(RECURSE)]
        state = make_entry_state(config, words, ergs=1 << 20)
        state = run_cycles(state, config, 9)  # partway down the recursion
        before = {n: np.asarray(getattr(state, n)).copy()
                  for n in ("cs_scalars", "cs_this_address", "depth")}
        d0 = int(np.asarray(state.depth)[0])
        assert d0 > 3
        spilled = SpilledFrames.empty(1)
        state, spilled = normalize_callstack(state, config, spilled,
                                             lo=2, hi=2)
        assert int(np.asarray(state.depth)[0]) == 2
        assert spilled.spilled_depth(0) == d0 - 2
        state, spilled = normalize_callstack(state, config, spilled,
                                             lo=d0, hi=config.max_depth - 2)
        assert spilled.spilled_depth(0) == 0
        after = np.asarray(state.cs_scalars)
        # live frames 0..depth restored bit-exactly
        assert np.array_equal(after[0, :d0 + 1],
                              before["cs_scalars"][0, :d0 + 1])
        assert np.array_equal(np.asarray(state.cs_this_address)[0, :d0 + 1],
                              before["cs_this_address"][0, :d0 + 1])


class TestSpillWithFusedEngine:
    def test_deep_recursion_on_fused_kernel(self):
        """run_segments drives the FUSED engine through the same
        deep-recursion spill protocol, bit-equal to the jnp run."""
        import dataclasses

        from era_zk_evm_tpu.models.fused_cycle import (
            run_cycles_fused, supported,
        )

        config = VmConfig(batch=2, queue_capacity=0, heap_words=16,
                          stack_words=2048, code_words=64, max_depth=8,
                          sweep_gating=False)
        assert supported(config)
        words = [assemble_to_code_words(RECURSE)] * 2
        ref, ref_spill = run_segments(
            make_entry_state(config, words, ergs=1 << 20), config,
            run_cycles, n_cycles=80, segment=2)

        def fused_engine(state, cfg, n):
            return run_cycles_fused(state, cfg, n, tile=2, k_inner=n)

        fus, fus_spill = run_segments(
            make_entry_state(config, words, ergs=1 << 20), config,
            fused_engine, n_cycles=80, segment=2)
        assert np.all(np.asarray(fus.done))
        for f in dataclasses.fields(ref):
            a = np.asarray(getattr(ref, f.name))
            b = np.asarray(getattr(fus, f.name))
            assert (a == b).all(), f.name
