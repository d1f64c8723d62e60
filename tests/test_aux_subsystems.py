"""Auxiliary subsystems (SURVEY.md §5): debug tracing, checkpoint/resume,
bootloader calldata."""

import numpy as np

from era_zk_evm_tpu.golden.tracing import CollectingDebugTracer
from era_zk_evm_tpu.isa import params
from era_zk_evm_tpu.isa.assembler import assemble_to_code_words
from era_zk_evm_tpu.models import VmConfig, make_entry_state, run_cycles
from era_zk_evm_tpu.models.checkpoint import load_checkpoint, save_checkpoint
from era_zk_evm_tpu.testing.harness import build_vm, create_default_tools, run
from era_zk_evm_tpu.utils import from_limbs


class TestDebugTracer:
    def test_hooks_fire_with_payloads(self):
        src = """
        add 7, r0, r1
        sub! r1, r1, r2
        add.if_ne 99, r0, r3
        ret r0
        """
        tracer = CollectingDebugTracer()
        vm = build_vm(assemble_to_code_words(src))
        cycles = run(vm, 32, tracer=tracer)
        kinds = [k for k, _ in tracer.events]
        # 4 hook sites per cycle
        assert kinds.count("before_decoding") == cycles
        assert kinds.count("after_decoding") == cycles
        assert kinds.count("before_execution") == cycles
        assert kinds.count("after_execution") == cycles
        # the masked-to-nop cycle is visible: condition resolved False
        decodings = [d for k, d in tracer.events if k == "after_decoding"]
        assert any(not d.resolved_condition for d in decodings)
        # operand payloads carry real values
        execs = [d for k, d in tracer.events if k == "before_execution"]
        assert any(d.src0_value.value == 7 for d in execs)

    def test_noop_tracer_is_free(self):
        from era_zk_evm_tpu.golden.tracing import NoopTracer

        vm = build_vm(assemble_to_code_words("add 1, r0, r1\nret r0"))
        run(vm, 16, tracer=NoopTracer())  # gates off: no hook calls

    def test_device_trace_matches_golden_hooks(self):
        """Device-side debug tracing (testing/debug_trace.py): per-cycle
        pc/depth snapshots of a batched lane line up 1:1 with the golden
        CollectingDebugTracer's before_decoding events — the L5 debugging
        surface on the batched engine."""
        from era_zk_evm_tpu.testing.debug_trace import (
            format_trace, trace_cycles,
        )

        src = """
        add 7, r0, r1
        add 3, r0, r9
        near_call r9, @sub, @h
        back:
        sub! r1, r1, r2
        add.if_ne 99, r0, r3
        ret r0
        sub:
        add r1, r1, r4
        ret r0
        h:
        jump @back
        """
        tracer = CollectingDebugTracer()
        vm = build_vm(assemble_to_code_words(src), ergs=1 << 20)
        cycles = run(vm, 32, tracer=tracer)
        golden_pcs = [pc for k, pc in tracer.events
                      if k == "before_decoding"]

        config = VmConfig(batch=2, code_words=32, stack_words=2048,
                          heap_words=16, aux_heap_words=8, max_depth=8,
                          queue_capacity=0)
        state = make_entry_state(config, [assemble_to_code_words(src)] * 2,
                                 ergs=1 << 20)
        state, traces = trace_cycles(state, config, cycles, lanes=[0],
                                     with_registers=True)
        assert np.asarray(state.done).all()
        device_pcs = [s.pc for s in traces[0]]
        assert device_pcs == golden_pcs
        # the disassembly annotates the instruction about to execute
        assert any("near_call" in s.asm for s in traces[0])
        listing = format_trace(traces[0])
        assert "pc=" in listing and "near_call" in listing

    def test_page_dumps_match_golden(self):
        """Device dump_page_content (memory.rs:300-401 counterpart) agrees
        with golden's dump_page on heap, stack, and code pages, and the
        Flags repr matches the reference's `lt± eq± gt±` format."""
        from era_zk_evm_tpu.golden.state import Flags
        from era_zk_evm_tpu.models import run_cycles
        from era_zk_evm_tpu.testing.debug_trace import dump_page_content

        assert repr(Flags(True, False, True)) == "lt+ eq- gt+"

        src = """
        add 77, r0, r5
        st.h 32, r5
        add r5, r0, stack[3]
        sub! r5, r5, r6
        ret r0
        """
        words = assemble_to_code_words(src)
        vm = build_vm(words, ergs=1 << 20)
        run(vm, 16)
        config = VmConfig(batch=2, code_words=32, stack_words=2048,
                          heap_words=16, aux_heap_words=8, max_depth=8,
                          queue_capacity=0)
        state = make_entry_state(config, [words] * 2, ergs=1 << 20)
        state = run_cycles(state, config, 16)
        assert np.asarray(state.done).all()
        base = 8  # make_entry_state default base_page
        for page, lo, hi in ((base + 2, 0, 4),       # heap
                             (base + 1, 0, 8),       # stack
                             (base, 0, 4)):          # code
            got = dump_page_content(state, config, 0, page, lo, hi)
            want = [f"{w:064x}"
                    for w in vm.memory.dump_page(page, lo, hi)]
            assert got == want, page
        # heap word 1 really holds the stored value
        assert int(dump_page_content(state, config, 0, base + 2,
                                     1, 2)[0], 16) == 77
        # unmaterialized pages dump as zeros (sparse-page semantics)
        assert dump_page_content(state, config, 0, 0x7FFF, 0, 2) == \
            ["0" * 64] * 2


class TestCheckpointResume:
    def test_roundtrip_bit_exact(self, tmp_path):
        src = """
        add 1, r0, r10
        add 30, r0, r1
        loop:
        add r2, r1, r2
        st.h 0, r2
        sub! r1, r10, r1
        jump.if_ne @loop
        ret r0
        """
        config = VmConfig(batch=4, queue_capacity=512, heap_words=16,
                          stack_words=2048, code_words=16, max_depth=4,
                          rolling_commitment=True)
        words = [assemble_to_code_words(src)] * 4
        state = make_entry_state(config, words, ergs=1 << 20)

        # straight-through run
        full = run_cycles(state, config, 40)

        # checkpointed run: 15 cycles, save, load, 25 more
        state2 = make_entry_state(config, words, ergs=1 << 20)
        part = run_cycles(state2, config, 15)
        save_checkpoint(tmp_path / "ckpt", part, config)
        loaded, config2 = load_checkpoint(tmp_path / "ckpt")
        assert config2 == config
        resumed = run_cycles(loaded, config2, 25)

        import dataclasses

        for f in dataclasses.fields(full):
            a = np.asarray(getattr(full, f.name))
            b = np.asarray(getattr(resumed, f.name))
            assert np.array_equal(a, b), f"field {f.name} diverged"

    def test_resume_on_mesh(self, tmp_path):
        from era_zk_evm_tpu.parallel import make_mesh

        config = VmConfig(batch=8, queue_capacity=64, heap_words=16,
                          stack_words=2048, code_words=16, max_depth=4)
        words = [assemble_to_code_words("add 5, r0, r1\nret r0")] * 8
        state = make_entry_state(config, words, ergs=1 << 20)
        state = run_cycles(state, config, 1)
        save_checkpoint(tmp_path / "ck2", state, config)
        mesh = make_mesh(8)
        loaded, config2 = load_checkpoint(tmp_path / "ck2", mesh=mesh)
        assert len(loaded.regs.sharding.device_set) == 8
        out = run_cycles(loaded, config2, 4)
        assert bool(np.all(np.asarray(out.done)))


class TestBootloaderCalldata:
    def test_golden_bootloader_calldata_page(self):
        tools = create_default_tools()
        tools.memory.populate_bootloader_calldata([111, 222])
        # a fat pointer to the bootloader calldata page is readable
        from era_zk_evm_tpu.golden.queries import MemoryQuery, MemoryType

        q = tools.memory.execute_partial_query(0, MemoryQuery(
            0, MemoryType.FAT_POINTER, params.BOOTLOADER_CALLDATA_PAGE, 1,
            0, False, False))
        assert q.value == 222
