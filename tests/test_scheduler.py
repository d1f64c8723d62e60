"""Continuous lane-refill scheduler conformance (models/scheduler.py).

Each transaction routed through the refilling batch must see exactly the
VM it would have seen with a dedicated lane: same final registers, same
cycle count, same ordered memory-witness stream.  The reference has no
scheduler (single context, SURVEY §3.1); the per-tx semantics it pins are
the entry-state protocol (testing/mod.rs:24-40 construction) and the
witness stream of each isolated run.
"""

import numpy as np
import pytest

from era_zk_evm_tpu.isa.assembler import assemble_to_code_words
from era_zk_evm_tpu.models import VmConfig, make_entry_state
from era_zk_evm_tpu.models.batched_vm import run_cycles
from era_zk_evm_tpu.models.scheduler import TxSpec, run_block_refill
from era_zk_evm_tpu.models.spill import drain_witness_queues


def _prog(n_iters: int) -> list[int]:
    # ~6 cycles per iteration: alu + stack push/pop + heap store
    return assemble_to_code_words(f"""
        add 1, r0, r10
        add code[@n], r0, r1
        add 0, r0, r2
        loop:
        add r2, r1, r2
        add r2, r0, stack+=[1]
        add stack-=[1], r0, r3
        st.h 0, r3
        sub! r1, r10, r1
        jump.if_ne @loop
        ret r0
        n: .word {n_iters}
    """)


def _config(batch: int) -> VmConfig:
    return VmConfig(batch=batch, code_words=16, stack_words=96,
                    stack_abs_words=16, stack_sp_base=1000,
                    heap_words=8, aux_heap_words=4, max_depth=4,
                    queue_capacity=16 * 8 * 4)


# tx lengths deliberately skewed (the refill win case) and NOT multiples
# of the chunk, so finishes land mid-chunk
LENGTHS = [1, 7, 2, 11, 3, 1, 9, 4, 2, 6]


def _isolated_reference(cfg, length, n_chunks, chunk):
    """Run one tx alone (whole batch = copies of it) and return lane 0's
    (registers, cycles, memory stream)."""
    state = make_entry_state(cfg, [_prog(length)] * cfg.batch,
                             ergs=(1 << 26))
    streams = []
    for _ in range(n_chunks):
        state = run_cycles(state, cfg, chunk)
        state, s = drain_witness_queues(state, cfg)
        streams.extend(s["memory"][0])
    assert bool(np.asarray(state.done)[0])
    return (np.asarray(state.regs)[0],
            int(np.asarray(state.monotonic_cycle_counter)[0]), streams)


@pytest.mark.parametrize("refill", [True, False])
def test_refill_matches_isolated_runs(refill):
    chunk = 16
    cfg = _config(batch=4)
    txs = [TxSpec(program=_prog(n), ergs=(1 << 26)) for n in LENGTHS]
    results, stats = run_block_refill(cfg, txs, run_cycles, chunk,
                                      refill=refill)
    assert len(results) == len(LENGTHS)
    for n, r in zip(LENGTHS, results):
        ref_regs, ref_cycles, ref_stream = _isolated_reference(
            cfg, n, n_chunks=(6 * n + 16 + chunk - 1) // chunk, chunk=chunk)
        assert r.status == "ok"
        assert r.cycles == ref_cycles, (n, r.cycles, ref_cycles)
        assert np.array_equal(r.registers, ref_regs)
        assert r.streams.get("memory", []) == ref_stream
    assert stats["useful_cycles"] == sum(r.cycles for r in results)


def test_heterogeneous_block_matches_isolated_runs():
    """Mixed entry addresses, mixed calldata-vs-none, mixed context_u128:
    every tx in one refilled block must match its dedicated single-tx run
    (the ADVICE r3 finding: a calldata-free tx in a mixed block used to get
    a tagged zero-length r1 pointer and frame_count=2)."""
    chunk = 16
    cfg = VmConfig(batch=4, code_words=16, stack_words=96,
                   stack_abs_words=16, stack_sp_base=1000,
                   heap_words=8, aux_heap_words=4, max_depth=4,
                   heap_frames=2, queue_capacity=16 * 8 * 4)
    # reads its own entry address, the context, and (when present) calldata
    prog_cd = assemble_to_code_words("""
        ctx.this r5
        ctx.get_u128 r6
        ld.ptr r1, r7
        add r1, r0, r8
        ret r0
    """)
    prog_plain = assemble_to_code_words("""
        ctx.this r5
        ctx.get_u128 r6
        add r1, r0, r8
        add 7, r0, r7
        ret r0
    """)
    txs = [
        TxSpec(program=prog_cd, ergs=1 << 26, entry_address=0x8001,
               calldata=[0xAA11, 0xBB22], context_u128=(5 << 64) | 9),
        TxSpec(program=prog_plain, ergs=1 << 26, entry_address=0x9999),
        TxSpec(program=prog_cd, ergs=1 << 26, entry_address=0x17001,
               calldata=[0xC0FFEE], context_u128=1 << 127),
        TxSpec(program=prog_plain, ergs=1 << 26, entry_address=0x8001,
               context_u128=42),
        TxSpec(program=prog_plain, ergs=1 << 26, entry_address=0x8002),
    ]
    results, _ = run_block_refill(cfg, txs, run_cycles, chunk)
    assert len(results) == len(txs)
    for i, tx in enumerate(txs):
        iso = make_entry_state(
            cfg, [tx.program] * cfg.batch, ergs=tx.ergs,
            entry_address=tx.entry_address,
            calldata=([tx.calldata] * cfg.batch
                      if tx.calldata is not None else None),
            context_u128=tx.context_u128)
        iso = run_cycles(iso, cfg, chunk * 2)
        assert bool(np.asarray(iso.done)[0])
        iso, s = drain_witness_queues(iso, cfg)
        r = results[i]
        assert r.status == "ok", i
        assert r.cycles == int(np.asarray(iso.monotonic_cycle_counter)[0]), i
        assert np.array_equal(r.registers, np.asarray(iso.regs)[0]), i
        assert r.streams.get("memory", []) == s["memory"][0], i


def test_txspec_ergs_out_of_range_rejected():
    from era_zk_evm_tpu.isa import params

    cfg = _config(batch=2)
    bad = TxSpec(program=_prog(1), ergs=params.VM_INITIAL_FRAME_ERGS + 1)
    with pytest.raises(ValueError, match="TxSpec.ergs"):
        run_block_refill(cfg, [bad], run_cycles, chunk=16)


def test_refill_beats_frozen_waves_on_rounds():
    chunk = 16
    cfg = _config(batch=2)
    txs = [TxSpec(program=_prog(n), ergs=(1 << 26)) for n in LENGTHS]
    _, s_refill = run_block_refill(cfg, txs, run_cycles, chunk, refill=True)
    _, s_waves = run_block_refill(cfg, txs, run_cycles, chunk, refill=False)
    # identical useful work, strictly fewer chunks with refill on this skew
    assert s_refill["useful_cycles"] == s_waves["useful_cycles"]
    assert s_refill["rounds"] < s_waves["rounds"]
    assert s_refill["utilization"] > s_waves["utilization"]


def test_scheduling_policies_preserve_semantics():
    """spec_depth > 2, tail chunk escalation, and longest-first dispatch
    are pure scheduling policies: every TxResult must be bit-identical to
    the default-policy run (same registers, cycles, status, streams)."""
    chunk = 16
    cfg = _config(batch=4)
    txs = [TxSpec(program=_prog(n), ergs=(1 << 26), cost_hint=n)
           for n in LENGTHS]
    base, _ = run_block_refill(cfg, txs, run_cycles, chunk)
    fancy, stats = run_block_refill(
        cfg, txs, run_cycles, chunk, spec_depth=3, tail_chunk_mult=2,
        order="cost_desc", refill_frac=0.5)
    for b, f in zip(base, fancy):
        assert (b.tx, b.status, b.cycles) == (f.tx, f.status, f.cycles)
        assert np.array_equal(b.registers, f.registers)
        assert b.streams.get("memory", []) == f.streams.get("memory", [])
    # escalated tail chunks are accounted in lane_cycles, not rounds*chunk
    assert stats["lane_cycles"] >= stats["rounds"] * chunk * cfg.batch


def test_adaptive_chunk_preserves_semantics():
    """Shrink-to-horizon chunk sizing is a pure scheduling policy: every
    TxResult must be bit-identical to the fixed-chunk run, and the
    adaptive run must actually launch shrunk chunks (the policy engages
    once the first hinted tx finishes)."""
    chunk = 16
    cfg = _config(batch=4)
    # a longer block than the other tests: the policy calibrates off the
    # first finished hinted tx, so pending txs must outlast that
    txs = [TxSpec(program=_prog(n), ergs=(1 << 26), cost_hint=n)
           for n in LENGTHS * 4]
    base, _ = run_block_refill(cfg, txs, run_cycles, chunk)
    adap, stats = run_block_refill(
        cfg, txs, run_cycles, chunk, adaptive_chunk=True,
        run_dyn_fn=run_cycles, min_chunk=8, refill_frac=0.5)
    assert stats["adaptive_launches"] > 0, stats
    for b, f in zip(base, adap):
        assert (b.tx, b.status, b.cycles) == (f.tx, f.status, f.cycles)
        assert np.array_equal(b.registers, f.registers)
        assert b.streams.get("memory", []) == f.streams.get("memory", [])
