"""Packed witness streams (witness/packed.py): byte-exactness vs the pinned
object serializations, device commitments vs host commitments, and the
packed block pipeline vs the object block pipeline.

The packed layer is the block pipeline's hot path (no per-query host work);
every claim it makes reduces to "same bytes, same digests" against the
object path proven equal to the golden oracle elsewhere."""

import dataclasses

import numpy as np
import pytest

from era_zk_evm_tpu.isa import params
from era_zk_evm_tpu.isa.abi import PrecompileCallABI, code_hash_for_bytecode
from era_zk_evm_tpu.isa.assembler import assemble_to_code_words
from era_zk_evm_tpu.models import VmConfig, make_entry_state, run_cycles
from era_zk_evm_tpu.models.state import populate_code_bank, populate_storage
from era_zk_evm_tpu.witness.commitment import (
    block_commitment, commit_decommitter_queue, commit_log_queue,
    commit_memory_queue, commit_precompile_queue, device_decommit_streams,
    device_log_streams, device_precompile_streams, device_queue_streams,
    serialize_decommittment, serialize_log_query, serialize_memory_query,
)
from era_zk_evm_tpu.witness.packed import (
    RECORD_WORDS, commit_packed_streams, drain_witness_queues_packed,
    fold_digests_device, packed_grand_products, queries_from_packed,
    split_records_by_lane,
)
from era_zk_evm_tpu.witness.sorted_queue import host_grand_product, host_sort_key

MAX_CYCLES = 64

_SERIALIZERS = {
    "memory": serialize_memory_query,
    "log": serialize_log_query,
    "decommit": serialize_decommittment,
    "precompile": serialize_memory_query,
}
_COMMITTERS = {
    "memory": commit_memory_queue,
    "log": commit_log_queue,
    "decommit": commit_decommitter_queue,
    "precompile": commit_precompile_queue,
}


def _abi(offset, length, out_word):
    return PrecompileCallABI(
        input_memory_offset=offset, input_memory_length=length,
        output_memory_offset=out_word, output_memory_length=0,
        memory_page_to_read=0, memory_page_to_write=0,
        precompile_interpreted_data=0).to_u256()


def _rich_state():
    """A batch exercising all four queue families: heap/stack traffic,
    storage + events + rollback, a far call (decommit), and a keccak
    precompile call."""
    callee_words = assemble_to_code_words("""
        add 3, r0, r1
        log.swrite r1, r1
        ret r0
    """)
    h = code_hash_for_bytecode(callee_words)
    programs = [
        f"""
        add 1, r0, r1
        st.h 0, r1
        log.swrite r1, r1
        log.event r1, r1
        add code[@abi], r0, r4
        add code[@dest], r0, r2
        far_call r4, r2, @fail
        ret r0
        fail:
        panic
        abi: .word {0xFFFFFFFF << 192}
        dest: .word 0x10042
        """,
        f"""
        add code[@w0], r0, r2
        st.h 0, r2
        add code[@pabi], r0, r4
        log.precompile r4, r0, r5
        add 9, r0, r6
        log.to_l1 r6, r6
        ret r0
        pabi: .word {_abi(0, 17, 2)}
        w0: .word {int.from_bytes(bytes(range(32)), 'big')}
        """,
        """
        add 2000, r0, r9
        near_call r9, @f, @hd
        done:
        ret r0
        f:
        add 5, r0, r1
        log.swrite r1, r1
        log.event r1, r1
        panic
        hd:
        jump @done
        """,
        """
        add 4, r0, r1
        st.h r1, r1
        ld.h 3, r2
        ret r0
        """,
    ]
    config = VmConfig(
        batch=len(programs), queue_capacity=MAX_CYCLES * 8, heap_words=64,
        stack_words=2048, code_words=64, max_depth=8,
        storage_slots=16, journal_slots=32, event_slots=32,
        log_queue_capacity=MAX_CYCLES, heap_frames=2, code_pages=2,
        decommit_queue_capacity=MAX_CYCLES,
        precompile_keccak_blocks=3, precompile_sha_rounds=3,
        precompile_queue_capacity=15 * 4)
    words = [assemble_to_code_words(p) for p in programs]
    state = make_entry_state(
        config, words, ergs=1 << 20,
        entry_address=params.KECCAK256_ROUND_FUNCTION_PRECOMPILE_ADDRESS)
    entries = [(0, params.DEPLOYER_SYSTEM_CONTRACT_ADDRESS, 0x10042, h)]
    state = populate_storage(state, config, [entries] * config.batch)
    state = populate_code_bank(state, config,
                               [[(h, callee_words)]] * config.batch)
    state = run_cycles(state, config, MAX_CYCLES)
    assert not np.any(np.asarray(state.lane_error))
    assert np.all(np.asarray(state.done))
    return state, config


class TestPackedRecords:
    def test_packed_bytes_equal_object_serialization(self):
        state, config = _rich_state()
        objects = {
            "memory": device_queue_streams(state),
            "log": device_log_streams(state),
            "decommit": device_decommit_streams(state),
            "precompile": device_precompile_streams(state),
        }
        _, packed = drain_witness_queues_packed(state, config)
        assert set(packed) == set(objects)
        for name, (words, valid) in packed.items():
            per_lane = split_records_by_lane(words, valid)
            ser = _SERIALIZERS[name]
            total = 0
            for b in range(config.batch):
                want = b"".join(ser(q) for q in objects[name][b])
                got = per_lane[b].astype("<u4").tobytes()
                assert got == want, (name, b)
                total += len(objects[name][b])
            assert total > 0, f"family {name} not exercised"

    def test_device_commitments_equal_host(self):
        state, config = _rich_state()
        objects = {
            "memory": device_queue_streams(state),
            "log": device_log_streams(state),
            "decommit": device_decommit_streams(state),
            "precompile": device_precompile_streams(state),
        }
        _, packed = drain_witness_queues_packed(state, config)
        for name, (words, valid) in packed.items():
            per_lane = split_records_by_lane(words, valid)
            got = commit_packed_streams(per_lane)
            want = [_COMMITTERS[name](objects[name][b])
                    for b in range(config.batch)]
            assert got == want, name
            # ordered block fold on device == host fold
            assert fold_digests_device(got) == block_commitment(want), name

    def test_empty_stream_commitment(self):
        empty = [np.zeros((0, 16), np.uint32)]
        from era_zk_evm_tpu.golden.precompiles import keccak256

        assert commit_packed_streams(empty) == [keccak256(b"")]

    def test_queries_from_packed_round_trip(self):
        state, config = _rich_state()
        objects = {
            "memory": device_queue_streams(state),
            "log": device_log_streams(state),
            "decommit": device_decommit_streams(state),
            "precompile": device_precompile_streams(state),
        }
        _, packed = drain_witness_queues_packed(state, config)
        for name, (words, valid) in packed.items():
            per_lane = split_records_by_lane(words, valid)
            for b in range(config.batch):
                fam = "memory" if name == "precompile" else name
                assert queries_from_packed(fam, per_lane[b]) \
                    == objects[name][b], (name, b)

    def test_grand_products_match_host(self):
        state, config = _rich_state()
        logs = device_log_streams(state)
        _, packed = drain_witness_queues_packed(state, config)
        per_lane = split_records_by_lane(*packed["log"])
        got = packed_grand_products(per_lane)
        want = [host_grand_product(sorted(lane, key=host_sort_key))
                for lane in logs]
        assert got == want


class TestPackedBlockPipeline:
    def test_block_packed_equals_objects(self):
        import sys

        sys.path.insert(0, "/root/repo/tests")
        from test_block import _block_txs, _config

        from era_zk_evm_tpu.block import execute_block

        txs, _, _ = _block_txs()
        a = execute_block(_config(2), txs, engine="jnp", chunk=24,
                          streams="objects")
        b = execute_block(_config(2), txs, engine="jnp", chunk=24,
                          streams="packed")
        assert a.tx_commitments == b.tx_commitments
        assert a.commitments == b.commitments
        assert a.sorted_log_products == b.sorted_log_products
        assert a.block_log_product == b.block_log_product
        for ra, rb in zip(a.txs, b.txs):
            assert ra.net_states == rb.net_states
            assert ra.cycles == rb.cycles
            # packed streams materialize to the object streams
            for name, obj_stream in ra.streams.items():
                fam = "memory" if name == "precompile" else name
                assert queries_from_packed(
                    fam, rb.streams.get(
                        name, np.zeros((0, RECORD_WORDS[name]), np.uint32))) \
                    == obj_stream, name


@pytest.mark.slow  # interpret-mode run of the bit-sliced keccak kernel
def test_bitsliced_fingerprints_match_jnp_path(monkeypatch):
    """The large-stream fingerprint pass switches to the bit-sliced keccak
    kernel (witness/packed._BITSLICE_MIN_RECORDS); its fingerprints must be
    bit-identical to the jnp sponge path.  Threshold patched down so the
    CPU interpret run stays tractable."""
    import jax
    import jax.numpy as jnp

    from era_zk_evm_tpu.witness import packed as P

    rng = np.random.default_rng(17)
    recs = rng.integers(0, 1 << 32, size=(256, 32), dtype=np.uint32)
    want = jax.device_get(P._fingerprints_device(jnp.asarray(recs)))
    monkeypatch.setattr(P, "_BITSLICE_MIN_RECORDS", 256)
    # the module-level jit may hold the old-threshold trace for this
    # shape; call the unjitted function so the patched branch is taken
    got = jax.device_get(
        P._fingerprints_device.__wrapped__(jnp.asarray(recs)))
    assert (want[0] == got[0]).all() and (want[1] == got[1]).all()


def test_compacted_drain_equals_dense_drain():
    """The device-compacted drain (witness/packed._serialize_all_compact)
    must reproduce the dense drain's per-lane record streams exactly."""
    import jax

    from era_zk_evm_tpu.witness.packed import (
        drain_witness_queues_packed_async, split_compacted_by_lane,
        split_records_by_lane,
    )

    state, config = _rich_state()
    _, dense = drain_witness_queues_packed_async(state, config)
    _, compact = drain_witness_queues_packed_async(state, config,
                                                   compact_frac=0.5)
    dense = jax.device_get(dense)
    compact = jax.device_get(compact)
    assert set(dense) == set(compact)
    for name in dense:
        want = split_records_by_lane(*dense[name])
        rows, lane_counts, count = compact[name]
        got = split_compacted_by_lane(rows, lane_counts, int(count))
        assert len(want) == len(got)
        for w, g in zip(want, got):
            assert np.array_equal(w, g), name

    # overflow is detected, not silent
    _, tiny = drain_witness_queues_packed_async(state, config,
                                                compact_frac=0.001)
    rows, lane_counts, count = jax.device_get(tiny)["memory"]
    with pytest.raises(RuntimeError, match="overflow"):
        split_compacted_by_lane(rows, lane_counts, int(count))


def test_fetch_compacted_rows_slices_and_checks():
    """fetch_compacted_rows ships only rows[:count] (power-of-two
    bucketed), per-family fracs apply, and overflow raises at fetch."""
    from era_zk_evm_tpu.witness.packed import (
        drain_witness_queues_packed_async, fetch_compacted_rows,
        split_compacted_by_lane, split_records_by_lane,
    )

    state, config = _rich_state()
    _, dense = drain_witness_queues_packed_async(state, config)
    _, compact = drain_witness_queues_packed_async(
        state, config,
        compact_frac={name: 0.5 for name in dense})
    fetched = fetch_compacted_rows(compact)
    import jax

    dense = jax.device_get(dense)
    for name in dense:
        want = split_records_by_lane(*dense[name])
        rows, lane_counts, count = fetched[name]
        c = int(count)
        assert rows.shape[0] >= c
        budget = compact[name][0].shape[0]
        assert rows.shape[0] <= budget
        got = split_compacted_by_lane(rows, lane_counts, c)
        for w, g in zip(want, got):
            assert np.array_equal(w, g), name

    _, tiny = drain_witness_queues_packed_async(state, config,
                                                compact_frac=0.001)
    with pytest.raises(RuntimeError, match="overflow"):
        fetch_compacted_rows(tiny)
