"""Segmented block executor: all spill protocols composed in one run."""

import numpy as np

from era_zk_evm_tpu.isa import params as P
from era_zk_evm_tpu.isa.abi import (
    FarCallABI, FatPointer, ForwardingMode, RetABI, code_hash_for_bytecode,
)
from era_zk_evm_tpu.isa.assembler import assemble_to_code_words
from era_zk_evm_tpu.models import VmConfig, make_entry_state, run_cycles
from era_zk_evm_tpu.models.executor import BlockHosts, run_block_segments
from era_zk_evm_tpu.models.spill import drain_witness_queues
from era_zk_evm_tpu.models.state import (
    populate_code_bank, populate_storage, storage_key_limbs,
)
from era_zk_evm_tpu.witness.commitment import (
    serialize_decommittment, serialize_log_query, serialize_memory_query,
)

R_ABI = RetABI(FatPointer(0, 0, 0, 0), ForwardingMode.USE_HEAP).to_u256()
F_ABI = FarCallABI(FatPointer(0, 0, 0, 0), 1 << 30, 0,
                   ForwardingMode.USE_HEAP, False, False).to_u256()


def _callees(n=3):
    out = []
    for k in range(n):
        words = assemble_to_code_words(f"""
            add {k + 21}, r0, r11
            log.swrite r11, r11
            add code[@rabi], r0, r7
            ret r7
            rabi: .word {R_ABI}
        """)
        out.append((0x40000 + k, code_hash_for_bytecode(words), words))
    return out


def _caller(callees, key_base: int, depth: int, iters: int):
    """Recursion burst to `depth`, then `iters` rounds of: distinct storage
    write + heap store/load + far call (round-robin over the callees)."""
    body = "\n".join(f"""
        add r9, r10, r9
        add r9, r14, r12
        log.swrite r12, r12
        st.h 0, r12
        ld.h 0, r8
        add code[@abi], r0, r4
        add code[@d{k % len(callees)}], r0, r2
        far_call r4, r2, @fail
    """ for k in range(iters))
    dests = "\n".join(f"d{k}: .word {callees[k][0]}"
                      for k in range(len(callees)))
    return assemble_to_code_words(f"""
        add 1, r0, r10
        add code[@depth], r0, r13
        add code[@base], r0, r14
        add 0, r0, r9
        near_call r0, @rec, @fail
        {body}
        ret r0
        rec:
        log.event r13, r13
        sub! r13, r10, r13
        jump.if_eq @leaf
        near_call r0, @rec, @fail
        leaf:
        ret r0
        fail:
        panic
        abi: .word {F_ABI}
        depth: .word {depth}
        base: .word {key_base}
        {dests}
    """)


class TestBlockExecutor:
    def test_all_spills_composed_equal_one_shot(self):
        """Deep recursion + 2x storage_slots distinct keys + more contracts
        than code_pages + heap traffic, run in 6-cycle segments on tight
        geometry with EVERY spill protocol active, equals a one-shot run on
        big geometry: concatenated memory/log/decommit streams, final
        registers, and the merged storage map.  Reference counterpart: the
        unbounded host loop over unbounded oracles (SURVEY §3.1)."""
        callees = _callees(3)
        B = 2
        programs = [_caller(callees, key_base=1000 * (b + 1), depth=9,
                            iters=6) for b in range(B)]
        entries = [(0, P.DEPLOYER_SYSTEM_CONTRACT_ADDRESS, a, h)
                   for a, h, _ in callees]
        n_cycles = 60 + 6 * 16 + 16

        def build(big: bool):
            cfg = VmConfig(
                batch=B, code_words=32, stack_words=2048, heap_words=16,
                aux_heap_words=8,
                max_depth=16 if big else 15,
                queue_capacity=(n_cycles if big else 8) * 8,
                storage_slots=32 if big else 8,
                journal_slots=64, event_slots=64,
                log_queue_capacity=n_cycles if big else 16,
                heap_frames=10 if big else 4,
                code_pages=4 if big else 3,
                decommit_queue_capacity=n_cycles if big else 16)
            st = make_entry_state(cfg, programs, ergs=1 << 24)
            st = populate_storage(st, cfg, [entries] * B)
            staged = callees if big else callees[:2]
            st = populate_code_bank(st, cfg,
                                    [[(h, w) for _, h, w in staged]] * B)
            return cfg, st

        big_cfg, big = build(True)
        big = run_cycles(big, big_cfg, n_cycles)
        assert not np.asarray(big.lane_error).any()
        assert np.asarray(big.done).all()
        big_final, want = drain_witness_queues(big, big_cfg)

        small_cfg, small = build(False)
        hosts = BlockHosts.empty(B)
        # the third contract never fits the device bank: host-side from t=0
        from era_zk_evm_tpu.utils import to_limbs
        w3 = np.zeros((small_cfg.code_words, 8), dtype=np.uint32)
        for i, w in enumerate(callees[2][2]):
            w3[i] = to_limbs(w)
        for b in range(B):
            hosts.code.maps[b][
                tuple(int(x) for x in to_limbs(callees[2][1]))] = {
                "page": 0, "len": len(callees[2][2]), "words": w3.copy()}
        small, hosts, got = run_block_segments(
            small, small_cfg, run_cycles, n_cycles, segment=6, hosts=hosts)
        assert not np.asarray(small.lane_error).any()
        assert np.asarray(small.done).all()
        assert (np.asarray(small.regs) == np.asarray(big.regs)).all()

        for b in range(B):
            for fam, ser in (("memory", serialize_memory_query),
                             ("log", serialize_log_query),
                             ("decommit", serialize_decommittment)):
                assert [ser(q) for q in got[fam][b]] == \
                    [ser(q) for q in want[fam][b]], (fam, b)

        # merged storage (host overflow + device residual) == the big table
        st_key = np.asarray(big_final.st_key)
        st_val = np.asarray(big_final.st_val)
        st_used = np.asarray(big_final.st_used)
        sk = np.asarray(small.st_key)
        sv = np.asarray(small.st_val)
        su = np.asarray(small.st_used)
        for b in range(B):
            want_map = {tuple(int(x) for x in st_key[b, i]):
                        tuple(int(x) for x in st_val[b, i])
                        for i in range(st_key.shape[1]) if st_used[b, i]}
            got_map = {k: tuple(int(x) for x in v)
                       for k, v in hosts.storage.maps[b].items()}
            for i in range(sk.shape[1]):
                if su[b, i]:
                    got_map[tuple(int(x) for x in sk[b, i])] = \
                        tuple(int(x) for x in sv[b, i])
            assert got_map == want_map
        # every bounded resource was actually exceeded in the small run
        assert any(hosts.storage.maps[b] for b in range(B))
        assert any(hosts.code.maps[b] for b in range(B))

    def test_executor_on_fused_engine(self):
        """The executor drives the fused kernel identically: same final
        registers + concatenated log stream as the jnp-engine run above
        (the flagship engine must compose with every spill protocol)."""
        from functools import partial

        from era_zk_evm_tpu.models.fused_cycle import (
            run_cycles_fused, supported,
        )

        callees = _callees(3)
        B = 2
        programs = [_caller(callees, key_base=1000 * (b + 1), depth=9,
                            iters=6) for b in range(B)]
        entries = [(0, P.DEPLOYER_SYSTEM_CONTRACT_ADDRESS, a, h)
                   for a, h, _ in callees]
        n_cycles = 60 + 6 * 16 + 16

        def build():
            cfg = VmConfig(
                batch=B, code_words=32, stack_words=2048, heap_words=16,
                aux_heap_words=8, max_depth=15, queue_capacity=8 * 8,
                storage_slots=8, journal_slots=64, event_slots=64,
                log_queue_capacity=16, heap_frames=4, code_pages=4,
                decommit_queue_capacity=16, sweep_gating=False,
                limb_major_arenas=True)
            st = make_entry_state(cfg, programs, ergs=1 << 24)
            st = populate_storage(st, cfg, [entries] * B)
            st = populate_code_bank(st, cfg,
                                    [[(h, w) for _, h, w in callees]] * B)
            return cfg, st

        cfg, jst = build()
        assert supported(cfg)
        j_out, j_hosts, j_got = run_block_segments(
            jst, cfg, run_cycles, n_cycles, segment=6)
        _, fst = build()
        fused = partial(run_cycles_fused, tile=B, k_inner=6)
        f_out, f_hosts, f_got = run_block_segments(
            fst, cfg, fused, n_cycles, segment=6)
        assert not np.asarray(f_out.lane_error).any()
        assert np.asarray(f_out.done).all()
        assert (np.asarray(f_out.regs) == np.asarray(j_out.regs)).all()
        for b in range(B):
            assert [serialize_log_query(q) for q in f_got["log"][b]] == \
                [serialize_log_query(q) for q in j_got["log"][b]]
            assert [serialize_memory_query(q) for q in f_got["memory"][b]] \
                == [serialize_memory_query(q) for q in j_got["memory"][b]]
