"""Bit-exact witness commitments: golden stream vs device queues, and the
sharded block fold vs the unsharded one (SURVEY.md §5.8 semantics)."""

import numpy as np

from era_zk_evm_tpu.isa.assembler import assemble_to_code_words
from era_zk_evm_tpu.models import VmConfig, make_entry_state, run_cycles
from era_zk_evm_tpu.parallel import make_mesh, run_block, shard_state
from era_zk_evm_tpu.testing.differential import run_golden
from era_zk_evm_tpu.witness import (
    block_commitment, commit_device_queues, commit_memory_queue,
)

PROGRAMS = [
    """
    add 7, r0, r1
    st.h 0, r1
    ld.h 3, r2
    add r2, r0, stack+=[1]
    add stack-=[1], r0, r3
    ret r0
    """,
    """
    add 1, r0, r10
    add 4, r0, r1
    loop:
    st.h r1, r1
    sub! r1, r10, r1
    jump.if_ne @loop
    ret r0
    """,
    """
    add 2000, r0, r9
    near_call r9, @f, @h
    done:
    ret r0
    f:
    add 5, r0, r1
    st.ah 0, r1
    panic
    h:
    jump @done
    """,
    """
    nop
    ret r0
    """,
] * 2  # 8 lanes


def _run_device(programs, max_cycles=64):
    config = VmConfig(batch=len(programs), queue_capacity=max_cycles * 8,
                      heap_words=64, stack_words=2048, code_words=64,
                      max_depth=8)
    words = [assemble_to_code_words(p) for p in programs]
    state = make_entry_state(config, words, ergs=1 << 20)
    state = run_cycles(state, config, max_cycles)
    assert not np.any(np.asarray(state.lane_error))
    assert np.all(np.asarray(state.done))
    return state, config


class TestCommitments:
    def test_golden_vs_device_commitments(self):
        state, _ = _run_device(PROGRAMS)
        device_lanes, device_block = commit_device_queues(state)
        golden_lanes = []
        for src in PROGRAMS:
            _, tools, _ = run_golden(src, 64, ergs=1 << 20)
            golden_lanes.append(commit_memory_queue(
                [q for _, q in tools.witness.memory_queries]))
        assert device_lanes == golden_lanes
        assert device_block == block_commitment(golden_lanes)

    def test_sharded_run_same_commitment(self):
        # same programs executed under an 8-device mesh must produce the
        # identical block commitment (ordered shard fold == unsharded fold)
        state, config = _run_device(PROGRAMS)
        _, unsharded_block = commit_device_queues(state)

        words = [assemble_to_code_words(p) for p in PROGRAMS]
        sh_state = make_entry_state(config, words, ergs=1 << 20)
        mesh = make_mesh(8)
        sh_state = shard_state(sh_state, mesh)
        sh_state, aggregates = run_block(sh_state, config, 64)
        assert int(aggregates["error_lanes"]) == 0
        # per-shard local fold + ordered combine (hosts exchange digests)
        lanes, _ = commit_device_queues(sh_state)
        n_shards = 8
        per_shard = len(PROGRAMS) // n_shards
        shard_digests = [lanes[s * per_shard:(s + 1) * per_shard]
                         for s in range(n_shards)]
        combined = block_commitment(
            [d for shard in shard_digests for d in shard])
        assert combined == unsharded_block


class TestRollingCommitment:
    def test_device_rolling_matches_host_spec(self):
        from era_zk_evm_tpu.models import VmConfig, make_entry_state, run_cycles
        from era_zk_evm_tpu.witness.commitment import (
            device_rolling_commitments, rolling_commit,
        )

        max_cycles = 64
        config = VmConfig(batch=len(PROGRAMS), queue_capacity=max_cycles * 8,
                          heap_words=64, stack_words=2048, code_words=64,
                          max_depth=8, rolling_commitment=True)
        words = [assemble_to_code_words(p) for p in PROGRAMS]
        state = make_entry_state(config, words, ergs=1 << 20)
        state = run_cycles(state, config, max_cycles)
        assert not np.any(np.asarray(state.lane_error))

        device_digests = device_rolling_commitments(state)
        for b, src in enumerate(PROGRAMS):
            _, tools, _ = run_golden(src, max_cycles, ergs=1 << 20)
            want = rolling_commit([q for _, q in tools.witness.memory_queries])
            assert device_digests[b] == want, f"lane {b}"

    def test_rolling_without_queue_arrays(self):
        # commitment-only mode: zero queue capacity, unbounded-stream shape
        from era_zk_evm_tpu.models import VmConfig, make_entry_state, run_cycles
        from era_zk_evm_tpu.witness.commitment import (
            device_rolling_commitments, rolling_commit,
        )

        src_prog = PROGRAMS[0]
        config = VmConfig(batch=2, queue_capacity=0, heap_words=64,
                          stack_words=2048, code_words=64, max_depth=8,
                          rolling_commitment=True)
        words = [assemble_to_code_words(src_prog)] * 2
        state = make_entry_state(config, words, ergs=1 << 20)
        state = run_cycles(state, config, 64)
        assert not np.any(np.asarray(state.lane_error))
        _, tools, _ = run_golden(src_prog, 64, ergs=1 << 20)
        want = rolling_commit([q for _, q in tools.witness.memory_queries])
        assert device_rolling_commitments(state) == [want, want]


class TestScalingHarness:
    def test_weak_scaling_runs_on_virtual_mesh(self):
        from era_zk_evm_tpu.parallel.scaling import measure

        # functional check: 1- and 8-device meshes both execute cleanly
        r1 = measure(1, lanes_per_device=16, n_cycles=8)
        r8 = measure(8, lanes_per_device=16, n_cycles=8)
        assert r1 > 0 and r8 > 0


class TestAllQueueCommitments:
    def test_log_and_decommit_commitments_match_golden(self):
        from era_zk_evm_tpu.models import VmConfig
        from era_zk_evm_tpu.testing.differential import diff_run  # noqa: F401
        from era_zk_evm_tpu.witness import (
            commit_all_device_queues, commit_decommitter_queue,
            commit_log_queue,
        )
        from era_zk_evm_tpu.models import make_entry_state, run_cycles
        from era_zk_evm_tpu.models.state import (
            populate_code_bank, populate_storage,
        )
        from era_zk_evm_tpu.isa import params as isa_params
        from era_zk_evm_tpu.isa.abi import code_hash_for_bytecode

        callee_src = """
            add 3, r0, r1
            log.swrite r1, r1
            ret r0
        """
        callee_words = assemble_to_code_words(callee_src)
        h = code_hash_for_bytecode(callee_words)
        caller = f"""
            add 1, r0, r1
            log.swrite r1, r1
            log.event r1, r1
            add code[@abi], r0, r4
            add code[@dest], r0, r2
            far_call r4, r2, @fail
            add 1, r0, r8
            ret r0
            fail:
            panic
            abi: .word {0xFFFFFFFF << 192}
            dest: .word 0x10042
        """
        B = 2
        config = VmConfig(batch=B, queue_capacity=64 * 8, heap_words=32,
                          stack_words=2048, code_words=32, max_depth=8,
                          storage_slots=8, journal_slots=16, event_slots=16,
                          log_queue_capacity=64, heap_frames=2, code_pages=2,
                          decommit_queue_capacity=64)
        words = [assemble_to_code_words(caller)] * B
        state = make_entry_state(config, words, ergs=1 << 20)
        entries = [(0, isa_params.DEPLOYER_SYSTEM_CONTRACT_ADDRESS,
                    0x10042, h)]
        state = populate_storage(state, config, [entries] * B)
        state = populate_code_bank(state, config, [[(h, callee_words)]] * B)
        state = run_cycles(state, config, 64)
        assert not np.any(np.asarray(state.lane_error))

        device = commit_all_device_queues(state)

        # golden side
        from era_zk_evm_tpu.testing import harness
        tools = harness.create_default_tools()
        tools.storage.populate(entries)
        tools.decommitter.populate([(h, list(callee_words))])
        vm = harness.build_vm(assemble_to_code_words(caller), tools=tools,
                              ergs=1 << 20)
        harness.run(vm, 64)
        want_log = commit_log_queue([q for _, q in tools.witness.log_queries])
        want_dec = commit_decommitter_queue(
            [q for _, q, _ in tools.witness.decommittments])
        assert device["log_lanes"] == [want_log] * B
        assert device["decommitter_lanes"] == [want_dec] * B
