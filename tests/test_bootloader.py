"""The bootloader-driven block shape: ONE VM runs a bootloader that reads
transaction descriptors from the bootloader calldata page, far-calls each
transaction, and advances `tx_number_in_block` between them via
Context.IncrementTxNumber — the reference's real usage pattern
(/root/reference/src/reference_impls/memory.rs:293-298 calldata page;
/root/reference/src/opcodes/execution/context.rs:36-50 tx counter).

Proven here: (1) full golden/device conformance of the multi-tx run
including the ordered witness streams (diff_run), and (2) per-tx net-state
extraction keyed by tx_number_in_block (models/net_states.net_states_by_tx)
matching the golden tracer's own grouping."""

import numpy as np

from era_zk_evm_tpu.isa import params
from era_zk_evm_tpu.isa.abi import code_hash_for_bytecode
from era_zk_evm_tpu.isa.assembler import assemble_to_code_words
from era_zk_evm_tpu.models import VmConfig, make_entry_state, run_cycles
from era_zk_evm_tpu.models.net_states import net_states_by_tx
from era_zk_evm_tpu.models.state import populate_code_bank, populate_storage
from era_zk_evm_tpu.testing import harness
from era_zk_evm_tpu.testing.differential import diff_run
from era_zk_evm_tpu.witness.commitment import device_log_streams

MAX_CYCLES = 160

#: the per-tx "transactions" of the block: each writes one storage slot and
#: emits one event carrying its own marker value
TX_ADDRS = [0x10001, 0x10002, 0x10003]
TX_MARKS = [101, 202, 303]

_CALLEES = [
    f"""
    add {mark}, r0, r1
    log.swrite r1, r1
    log.event r1, r1
    ret r0
    """
    for mark in TX_MARKS
]

#: descriptor list consumed by the bootloader: word 0 = N, words 1..N = the
#: callee address of tx i (a deliberately minimal descriptor format — the
#: real bootloader's ABI-encoded tx blobs reduce to the same page reads)
TX_SEQUENCE = [0, 1, 2, 0]   # tx 3 re-calls contract 0 (repeat decommit)
CALLDATA = [len(TX_SEQUENCE)] + [TX_ADDRS[i] for i in TX_SEQUENCE]

BOOTLOADER = f"""
    add 1, r0, r11
    add 32, r0, r12
    ld.ptr r1, r5
    add r5, r0, r7
    add 0, r0, r6
    copy:
    ptr.add r1, r12, r1
    ld.ptr r1, r2
    add r6, r12, r6
    st.h r6, r2
    sub! r7, r11, r7
    jump.if_ne @copy
    add r5, r0, r7
    add 0, r0, r6
    loop:
    add r6, r12, r6
    ld.h r6, r2
    add r6, r0, stack+=[1]
    add r7, r0, stack+=[1]
    add code[@abi], r0, r4
    far_call r4, r2, @fail
    ctx.inc_tx
    add stack-=[1], r0, r7
    add stack-=[1], r0, r6
    add 1, r0, r11
    add 32, r0, r12
    sub! r7, r11, r7
    jump.if_ne @loop
    ret r0
    fail:
    panic
    abi: .word {0xFFFFFFFF << 192}
"""


def _config(batch):
    return VmConfig(
        batch=batch, queue_capacity=MAX_CYCLES * 8, heap_words=64,
        stack_words=2048, code_words=64, max_depth=8,
        storage_slots=16, journal_slots=32, event_slots=32,
        log_queue_capacity=MAX_CYCLES,
        heap_frames=2 + len(TX_SEQUENCE), code_pages=1 + len(TX_ADDRS),
        decommit_queue_capacity=MAX_CYCLES)


def test_bootloader_block_conformance():
    """Golden vs device on the full multi-tx bootloader run — registers,
    arenas, and every ordered witness stream (incl. tx_number stamps)."""
    diff_run([BOOTLOADER] * 2, config=_config(2), max_cycles=MAX_CYCLES,
             ergs=1 << 24,
             contracts=list(zip(TX_ADDRS, _CALLEES)),
             calldata=CALLDATA)


def test_bootloader_per_tx_net_states():
    """Device per-tx extraction (net_states_by_tx) vs the golden tracer's
    own tx_number grouping, on the same bootloader block."""
    B = 2
    config = _config(B)
    contract_entries = []
    bank = []
    for addr, src in zip(TX_ADDRS, _CALLEES):
        words = assemble_to_code_words(src)
        h = code_hash_for_bytecode(words)
        contract_entries.append(
            (0, params.DEPLOYER_SYSTEM_CONTRACT_ADDRESS, addr, h))
        bank.append((h, words))

    state = make_entry_state(config,
                             [assemble_to_code_words(BOOTLOADER)] * B,
                             ergs=1 << 24, calldata=[CALLDATA] * B)
    state = populate_storage(state, config, [contract_entries] * B)
    state = populate_code_bank(state, config, [bank] * B)
    state = run_cycles(state, config, MAX_CYCLES)
    assert np.all(np.asarray(state.done))
    assert not np.any(np.asarray(state.lane_error))

    logs = device_log_streams(state)
    per_tx = net_states_by_tx(state, config, logs)[0]

    # every tx of the block appears under its own tx_number, with exactly
    # its callee's marker event and storage write
    assert sorted(per_tx) == list(range(len(TX_SEQUENCE)))
    for tx_i, contract_i in enumerate(TX_SEQUENCE):
        bucket = per_tx[tx_i]
        assert len(bucket["events"]) == 1, tx_i
        ev = bucket["events"][0]
        assert ev.tx_number_in_block == tx_i
        assert ev.value == TX_MARKS[contract_i]
        assert ev.address == TX_ADDRS[contract_i]
        writes = [q for q in bucket["storage_writes"]
                  if q.address == TX_ADDRS[contract_i]]
        assert len(writes) == 1 and writes[0].written_value \
            == TX_MARKS[contract_i], tx_i

    # golden cross-check: the golden tracer's log stream groups the same way
    tools = harness.create_default_tools()
    tools.storage.populate(list(contract_entries))
    tools.decommitter.populate([(h, list(w)) for h, w in bank])
    vm = harness.build_vm(assemble_to_code_words(BOOTLOADER), tools=tools,
                          ergs=1 << 24)
    from era_zk_evm_tpu.golden.state import PrimitiveValue
    from era_zk_evm_tpu.isa.abi import FatPointer

    tools.memory.populate_bootloader_calldata(list(CALLDATA))
    fp = FatPointer(offset=0, memory_page=params.BOOTLOADER_CALLDATA_PAGE,
                    start=0, length=32 * len(CALLDATA))
    vm.local_state.registers[0] = PrimitiveValue(value=fp.to_u256(),
                                                 is_pointer=True)
    harness.run(vm, MAX_CYCLES)
    nets = harness.get_final_net_states(tools)
    golden_by_tx: dict[int, list] = {}
    for m in nets["events"]:
        golden_by_tx.setdefault(m.tx_number_in_block, []).append(m)
    assert {tx: b["events"] for tx, b in per_tx.items() if b["events"]} \
        == golden_by_tx
