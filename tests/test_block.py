"""execute_block: the host-facing block pipeline vs per-tx golden runs.

Each transaction routed through the block pipeline must produce exactly the
outcomes of a dedicated golden-oracle run: cycle count, final net states
(final storage / net events / net L1 messages — the reference's
get_final_net_states, testing/mod.rs:42-71), per-family witness-stream
commitments, and the sorted-log grand product.  The block-level outputs
must equal the host folds over those per-tx outputs in tx order.
"""

import numpy as np
import pytest

from era_zk_evm_tpu.block import execute_block
from era_zk_evm_tpu.isa import params
from era_zk_evm_tpu.isa.abi import code_hash_for_bytecode
from era_zk_evm_tpu.isa.assembler import assemble_to_code_words
from era_zk_evm_tpu.models import TxSpec, VmConfig
from era_zk_evm_tpu.testing import harness
from era_zk_evm_tpu.witness.commitment import (
    block_commitment, commit_decommitter_queue, commit_log_queue,
    commit_memory_queue,
)
from era_zk_evm_tpu.witness.sorted_queue import host_grand_product, host_sort_key

CHUNK = 24
ERGS = 1 << 22

# tx A: storage writes + read + event (param in code word)
TX_STORAGE = """
    add code[@p], r0, r1
    log.swrite r1, r1
    add 7, r1, r2
    log.swrite r2, r2
    log.sread r1, r3
    log.event r3, r1
    ret r0
    p: .word {val}
"""

# tx B: event survives, panicked near-call frame's event + storage write
# roll back, L1 message after the handler
TX_ROLLBACK = """
    add 100, r0, r1
    log.event r1, r1
    near_call r9, @sub, @handler
    handler:
    add 2, r0, r8
    log.to_l1 r8, r1
    ret r0
    sub:
    add 200, r0, r2
    log.event r2, r2
    log.swrite r2, r2
    panic
"""

# tx C: far call into a contract that writes storage
CALLEE = """
    add 3, r0, r1
    log.swrite r1, r1
    ret r0
"""

TX_FARCALL = f"""
    add 1, r0, r1
    log.swrite r1, r1
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

# tx D: pure arithmetic, variable length
TX_ALU = """
    add 1, r0, r10
    add code[@n], r0, r1
    add 0, r0, r2
    loop:
    add r2, r1, r2
    sub! r1, r10, r1
    jump.if_ne @loop
    ret r0
    n: .word {iters}
"""


def _block_txs():
    callee_words = assemble_to_code_words(CALLEE)
    h = code_hash_for_bytecode(callee_words)
    dep = [(0, params.DEPLOYER_SYSTEM_CONTRACT_ADDRESS, 0x10042, h)]
    txs = [
        TxSpec(program=assemble_to_code_words(TX_STORAGE.format(val=11)),
               ergs=ERGS),
        TxSpec(program=assemble_to_code_words(TX_ROLLBACK), ergs=ERGS),
        TxSpec(program=assemble_to_code_words(TX_FARCALL), ergs=ERGS,
               storage=tuple(dep), contracts=((h, tuple(callee_words)),)),
        TxSpec(program=assemble_to_code_words(TX_ALU.format(iters=9)),
               ergs=ERGS),
        TxSpec(program=assemble_to_code_words(TX_STORAGE.format(val=0xBEEF)),
               ergs=ERGS),
        TxSpec(program=assemble_to_code_words(TX_ALU.format(iters=2)),
               ergs=ERGS),
    ]
    return txs, callee_words, h


def _config(batch):
    return VmConfig(batch=batch, queue_capacity=CHUNK * 8 * 2,
                    sweep_gating=False,
                    heap_words=16, aux_heap_words=8,
                    stack_words=2048, code_words=32, max_depth=8,
                    storage_slots=8, journal_slots=16, event_slots=16,
                    log_queue_capacity=CHUNK * 2, heap_frames=2,
                    code_pages=2, decommit_queue_capacity=CHUNK)


def _golden_reference(tx: TxSpec):
    tools = harness.create_default_tools()
    if tx.storage:
        tools.storage.populate(list(tx.storage))
    for h, words in tx.contracts:
        tools.decommitter.populate([(h, list(words))])
    vm = harness.build_vm(list(tx.program), tools=tools, ergs=tx.ergs)
    cycles = harness.run(vm, 4096)
    nets = harness.get_final_net_states(tools)
    final_storage = {}
    for shard, per_addr in enumerate(tools.storage.inner):
        for address, slots in per_addr.items():
            for key, value in slots.items():
                final_storage[(shard, address, key)] = value
    logs = [q for _, q in tools.witness.log_queries]
    return {
        "cycles": cycles,
        "final_storage": final_storage,
        "events": nets["events"],
        "l1_messages": nets["l1_messages"],
        "memory_commit": commit_memory_queue(
            [q for _, q in tools.witness.memory_queries]),
        "log_commit": commit_log_queue(logs),
        "decommit_commit": commit_decommitter_queue(
            [q for _, q, _ in tools.witness.decommittments]),
        "sorted_product": host_grand_product(sorted(logs, key=host_sort_key)),
    }


@pytest.mark.parametrize("engine,batch", [("jnp", 2), ("fused", 4)])
def test_execute_block_matches_golden(engine, batch):
    txs, _, _ = _block_txs()
    result = execute_block(_config(batch), txs, engine=engine, chunk=CHUNK,
                           tile=2 if engine == "fused" else None)
    assert result.all_ok
    assert len(result.txs) == len(txs)

    want_mem, want_log, want_dec = [], [], []
    for i, tx in enumerate(txs):
        ref = _golden_reference(tx)
        r = result.txs[i]
        assert r.cycles == ref["cycles"], (i, r.cycles, ref["cycles"])
        assert r.net_states is not None
        assert r.net_states["final_storage"] == ref["final_storage"], i
        assert r.net_states["events"] == ref["events"], i
        assert r.net_states["l1_messages"] == ref["l1_messages"], i
        c = result.tx_commitments[i]
        assert c["memory"] == ref["memory_commit"], i
        assert c["log"] == ref["log_commit"], i
        assert c["decommit"] == ref["decommit_commit"], i
        assert result.sorted_log_products[i] == ref["sorted_product"], i
        want_mem.append(ref["memory_commit"])
        want_log.append(ref["log_commit"])
        want_dec.append(ref["decommit_commit"])

    assert result.commitments["memory"] == block_commitment(want_mem)
    assert result.commitments["log"] == block_commitment(want_log)
    assert result.commitments["decommit"] == block_commitment(want_dec)
    assert result.stats["utilization"] > 0


def test_block_engines_agree():
    """jnp and fused pipelines produce identical BlockResults."""
    txs, _, _ = _block_txs()
    a = execute_block(_config(2), txs, engine="jnp", chunk=CHUNK)
    b = execute_block(_config(4), txs, engine="fused", chunk=CHUNK, tile=2)
    assert a.commitments == b.commitments
    assert a.sorted_log_products == b.sorted_log_products
    assert a.block_log_product == b.block_log_product
    for ra, rb in zip(a.txs, b.txs):
        assert ra.cycles == rb.cycles
        assert np.array_equal(ra.registers, rb.registers)
        assert ra.net_states == rb.net_states


def test_block_scheduling_policies_passthrough():
    """execute_block forwards scheduling-policy knobs to the scheduler;
    policies are pure (bit-identical BlockResults)."""
    txs, _, _ = _block_txs()
    for t, hint in zip(txs, (3, 1, 2)):
        t.cost_hint = hint
    a = execute_block(_config(2), txs, engine="jnp", chunk=CHUNK)
    b = execute_block(_config(2), txs, engine="jnp", chunk=CHUNK,
                      spec_depth=3, tail_chunk_mult=2, order="cost_desc",
                      refill_frac=0.5)
    assert a.commitments == b.commitments
    assert a.block_log_product == b.block_log_product
    for ra, rb in zip(a.txs, b.txs):
        assert (ra.tx, ra.status, ra.cycles) == (rb.tx, rb.status, rb.cycles)
        assert ra.net_states == rb.net_states
