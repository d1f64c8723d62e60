"""Ergs price-table sensitivity: the pinned prices are behavior-bearing
(a 1-erg budget change flips control flow at the exact table-predicted
boundary), and the DOCUMENTED_DIVERGENCES swap mechanism reaches the
executed variant table — together proving that a future price correction
verified against the public zkevm_opcode_defs v1.4.1 crate is a safe
one-line data change whose effect the suite can observe.

Reference consumer of the table: /root/reference/src/vm_state/cycle.rs:147-163
(decode-stage price charge; unaffordable -> masked into panic)."""

import numpy as np

from era_zk_evm_tpu.isa import opcodes, params
from era_zk_evm_tpu.isa.assembler import assemble_to_code_words
from era_zk_evm_tpu.models import VmConfig, make_entry_state, run_cycles
from era_zk_evm_tpu.testing import harness
from era_zk_evm_tpu.testing.differential import diff_run

# storage writes: the most price-sensitive family (their io price dwarfs
# the decode floor, so a wrong STORAGE_WRITE_IO_PRICE shifts out-of-ergs
# boundaries on any real workload)
PROGRAM = """
    add 7, r0, r1
    log.swrite r1, r1
    log.swrite r1, r1
    add 1, r0, r8
    ret r0
"""


def _golden_ergs_consumed(budget: int):
    """(consumed, r8, error) of a golden run under the given entry budget."""
    tools = harness.create_default_tools()
    vm = harness.build_vm(assemble_to_code_words(PROGRAM), tools=tools,
                          ergs=budget)
    harness.run(vm, 64)
    consumed = budget - vm.final_frame_ergs if hasattr(vm, "final_frame_ergs") \
        else None
    return vm, tools


def test_budget_boundary_flips_behavior_by_one_erg():
    """Run once with a big budget to measure the exact table-derived cost,
    then show budget == cost executes fully while budget == cost-1 takes
    the out-of-ergs path on BOTH the golden oracle and the device engine
    (same boundary — the engines charge the same table)."""
    big = 1 << 20
    tools = harness.create_default_tools()
    vm = harness.build_vm(assemble_to_code_words(PROGRAM), tools=tools,
                          ergs=big)
    harness.run(vm, 64)
    # both writes landed
    writes = [q for _, q in tools.witness.log_queries if q.rw_flag]
    assert len(writes) == 2
    root_left = vm.local_state.callstack.current.ergs_remaining
    consumed = big - (root_left - (params.VM_INITIAL_FRAME_ERGS - big))

    def outcome(budget):
        """True iff the storage write SURVIVED (net state) — one erg short
        anywhere in the program panics the entry frame and rolls it back."""
        t = harness.create_default_tools()
        v = harness.build_vm(assemble_to_code_words(PROGRAM), tools=t,
                             ergs=budget)
        harness.run(v, 64)
        return any(slots.get(7) == 7
                   for per_addr in t.storage.inner
                   for slots in per_addr.values())

    assert outcome(consumed) is True       # exactly affordable
    assert outcome(consumed - 1) is False  # one erg short: rolled back
    # the boundary value is what the pinned table predicts: decode prices
    # for the 5 instructions + the swrite io prices charged at execution
    # (cold write extra cost is internal to the LOG op; assert the table's
    # floor is included — consumed strictly covers 2x STORAGE_WRITE_IO_PRICE)
    assert consumed >= 2 * params.STORAGE_WRITE_IO_PRICE

    # device engine agrees on the exact boundary (full differential run at
    # both budgets — registers, ergs, witness streams all compared)
    for budget in (consumed, consumed - 1):
        diff_run([PROGRAM] * 2, max_cycles=64, ergs=budget)


def test_documented_divergence_reaches_executed_table():
    """A DOCUMENTED_DIVERGENCES entry changes the price the engines
    execute with (opcodes._synthesize applies it), and the pinned expected
    table tracks it — the swap mechanism a verified correction will use."""
    from era_zk_evm_tpu.isa import ergs_prices

    # pick the first log.swrite variant
    idx = next(v.index for v in opcodes.VARIANTS
               if v.opcode is opcodes.Opcode.LOG
               and v.sub == int(opcodes.LogOp.STORAGE_WRITE))
    old_price = opcodes.VARIANTS[idx].price
    assert old_price == params.STORAGE_WRITE_IO_PRICE

    patched = {idx: (old_price + 17, "sensitivity test (synthetic)")}
    orig = ergs_prices.DOCUMENTED_DIVERGENCES
    try:
        ergs_prices.DOCUMENTED_DIVERGENCES = patched
        rebuilt = opcodes._synthesize()
        assert rebuilt[idx].price == old_price + 17
        # neighbours untouched
        assert rebuilt[idx - 1].price == opcodes.VARIANTS[idx - 1].price
        assert ergs_prices.expected_price_table()[idx] == old_price + 17
        # the two tables stay consistent under the swap (the invariant
        # test_isa pins for the unpatched build)
        got = np.asarray([v.price for v in rebuilt], dtype=np.uint64)
        assert (got == ergs_prices.expected_price_table()).all()
    finally:
        ergs_prices.DOCUMENTED_DIVERGENCES = orig
    # module state untouched
    assert opcodes.VARIANTS[idx].price == old_price
