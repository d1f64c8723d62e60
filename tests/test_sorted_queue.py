"""Sorted-queue simulation + Goldilocks grand-product commitments.

Pins: witness/sorted_queue.py module docstring.  Checks the field kernels
against Python ints, device fingerprints/sort/products against host
references, the sorted/unsorted permutation identity, and the sharded
block fold on the 8-device virtual mesh.
"""

import numpy as np

import jax
import jax.numpy as jnp

from era_zk_evm_tpu.isa.assembler import assemble_to_code_words
from era_zk_evm_tpu.models import VmConfig, make_entry_state, run_cycles
from era_zk_evm_tpu.ops.goldilocks import (
    GOLDILOCKS_P, gl_add, gl_mul, gl_reduce64,
)
from era_zk_evm_tpu.witness.commitment import (
    device_log_streams, serialize_log_query,
)
from era_zk_evm_tpu.witness.sorted_queue import (
    DEFAULT_GAMMA, block_grand_product, grand_product, host_fingerprint,
    host_grand_product, host_sort_key, log_queue_fingerprints,
    sort_log_queue,
)

P = GOLDILOCKS_P


def _pair(vals):
    vals = np.asarray(vals, dtype=np.uint64)
    return (jnp.asarray(vals & 0xFFFFFFFF, jnp.uint32),
            jnp.asarray(vals >> 32, jnp.uint32))


def _ints(lo, hi):
    return (np.asarray(lo).astype(np.uint64)
            | (np.asarray(hi).astype(np.uint64) << 32))


class TestGoldilocks:
    def test_mul_add_fuzz(self):
        rng = np.random.default_rng(7)
        a = rng.integers(0, P, size=512, dtype=np.uint64)
        b = rng.integers(0, P, size=512, dtype=np.uint64)
        # adversarial values near the modulus / powers of two
        edge = np.array([0, 1, P - 1, P - 2, (1 << 32) - 1, 1 << 32,
                         (1 << 63), (1 << 64) - 1 - (1 << 32)],
                        dtype=np.uint64) % P
        a[:8] = edge
        b[:8] = edge[::-1]
        alo, ahi = _pair(a)
        blo, bhi = _pair(b)
        mlo, mhi = jax.jit(gl_mul)(alo, ahi, blo, bhi)
        want = (a.astype(object) * b.astype(object)) % P
        assert (_ints(mlo, mhi).astype(object) == want).all()
        slo, shi = jax.jit(gl_add)(alo, ahi, blo, bhi)
        want_s = (a.astype(object) + b.astype(object)) % P
        assert (_ints(slo, shi).astype(object) == want_s).all()

    def test_reduce64(self):
        vals = np.array([0, 1, P - 1, P, P + 5, (1 << 64) - 1],
                        dtype=np.uint64)
        lo, hi = _pair(vals)
        rlo, rhi = jax.jit(gl_reduce64)(lo, hi)
        assert (_ints(rlo, rhi) == vals % P).all()


# a log mix emitting storage writes/reads in descending key order, events,
# and an L1 message — deliberately un-sorted emission order
PROG = """
    add 9, r0, r1
    add 111, r0, r2
    log.swrite r1, r2
    add 3, r0, r1
    log.swrite r1, r2
    log.event r2, r1
    add 6, r0, r1
    log.sread r1, r3
    log.swrite r1, r2
    log.to_l1! r1, r2
    add 3, r0, r1
    log.sread r1, r3
    ret r0
"""

PROG2 = """
    add 5, r0, r1
    add 77, r0, r2
    log.swrite r1, r2
    log.event r1, r2
    add 2, r0, r1
    log.swrite r1, r2
    log.sread r1, r3
    ret r0
"""


_RUN_CACHE: dict = {}


def _run(batch=2, progs=None):
    if batch in _RUN_CACHE:          # one cycle-step compile per geometry
        return _RUN_CACHE[batch]
    config = VmConfig(batch=batch, queue_capacity=0, heap_words=16,
                      stack_words=2048, code_words=64, max_depth=8,
                      storage_slots=8, journal_slots=16, event_slots=16,
                      log_queue_capacity=32)
    progs = progs or [PROG, PROG2]
    words = [assemble_to_code_words(progs[i % len(progs)])
             for i in range(batch)]
    state = run_cycles(make_entry_state(config, words, ergs=1 << 20),
                       config, 32)
    assert not np.asarray(state.lane_error).any()
    _RUN_CACHE[batch] = state
    return state


class TestSortedQueue:
    def test_fingerprints_match_host(self):
        state = _run()
        (lo, hi), valid = jax.jit(log_queue_fingerprints)(state)
        fps = _ints(lo, hi)
        streams = device_log_streams(state)
        v = np.asarray(valid)
        for b, lane in enumerate(streams):
            got = fps[b][v[b]]
            want = [host_fingerprint(q) for q in lane]
            assert list(got) == want

    def test_sorted_queue_matches_host_sort(self):
        state = _run()
        s_meta, s_addr, s_key, s_read, s_written = \
            jax.jit(sort_log_queue)(state)
        import dataclasses

        sorted_state = dataclasses.replace(
            state, lq_meta=s_meta, lq_addr=s_addr, lq_key=s_key,
            lq_read=s_read, lq_written=s_written)
        got_streams = device_log_streams(sorted_state)
        want_streams = [sorted(lane, key=host_sort_key)
                        for lane in device_log_streams(state)]
        for got, want in zip(got_streams, want_streams):
            assert [serialize_log_query(q) for q in got] == \
                [serialize_log_query(q) for q in want]

    def test_grand_product_permutation_identity(self):
        state = _run()
        (lo, hi), valid = log_queue_fingerprints(state)
        plo, phi = jax.jit(grand_product)(lo, hi, valid)
        got = _ints(plo, phi)
        # host product over the emission-ordered stream
        streams = device_log_streams(state)
        for b, lane in enumerate(streams):
            assert int(got[b]) == host_grand_product(lane)
        # sorted copy commits to the same product (permutation identity)
        import dataclasses

        s = sort_log_queue(state)
        sorted_state = dataclasses.replace(
            state, lq_meta=s[0], lq_addr=s[1], lq_key=s[2], lq_read=s[3],
            lq_written=s[4])
        (slo, shi), svalid = log_queue_fingerprints(sorted_state)
        qlo, qhi = grand_product(slo, shi, svalid)
        assert (_ints(qlo, qhi) == got).all()

    def test_sharded_block_product(self):
        from era_zk_evm_tpu.parallel.mesh import make_mesh, shard_state

        state = _run(batch=8)
        (lo, hi), valid = log_queue_fingerprints(state)
        plo, phi = grand_product(lo, hi, valid)
        want_lanes = _ints(plo, phi)
        want_block = 1
        for x in want_lanes:
            want_block = want_block * int(x) % P

        mesh = make_mesh(8)
        sharded = shard_state(state, mesh)

        @jax.jit
        def fold(s):
            (lo, hi), valid = log_queue_fingerprints(s)
            plo, phi = grand_product(lo, hi, valid)
            return block_grand_product(plo, phi)

        blo, bhi = fold(sharded)
        assert int(_ints(blo[None], bhi[None])[0]) == want_block
