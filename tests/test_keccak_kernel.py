"""Batched keccak kernel vs the scalar golden implementation + known vectors."""

import numpy as np
import jax.numpy as jnp
import pytest

from era_zk_evm_tpu.golden.precompiles import keccak256, keccak_f1600
from era_zk_evm_tpu.ops.keccak import (
    absorb_blocks, digest_from_state, keccak_f1600_array, pad_messages,
    keccak_f1600_bitsliced, planes_to_states, states_to_planes,
)


class TestPermutation:
    def test_matches_scalar(self):
        rng = np.random.default_rng(7)
        B = 16
        states = rng.integers(0, 1 << 64, size=(B, 25), dtype=np.uint64)
        packed = np.zeros((B, 25, 2), dtype=np.uint32)
        packed[:, :, 0] = states & 0xFFFFFFFF
        packed[:, :, 1] = states >> 32
        out = np.asarray(keccak_f1600_array(jnp.asarray(packed)))
        for b in range(B):
            want = keccak_f1600([int(x) for x in states[b]])
            got = [int(out[b, k, 0]) | (int(out[b, k, 1]) << 32)
                   for k in range(25)]
            assert got == want

    def test_zero_state_permutation(self):
        packed = jnp.zeros((1, 25, 2), jnp.uint32)
        out = np.asarray(keccak_f1600_array(packed))
        want = keccak_f1600([0] * 25)
        got = [int(out[0, k, 0]) | (int(out[0, k, 1]) << 32) for k in range(25)]
        assert got == want

    def test_pallas_kernel_matches_array_form(self):
        from era_zk_evm_tpu.ops.keccak import keccak_f1600_pallas

        rng = np.random.default_rng(3)
        st = jnp.asarray(rng.integers(0, 1 << 32, size=(16, 25, 2),
                                      dtype=np.uint32))
        want = st
        for _ in range(3):
            want = keccak_f1600_array(want)
        got = keccak_f1600_pallas(st, iters=3, tile=8)
        assert (np.asarray(got) == np.asarray(want)).all()


class TestBitSliced:
    """The bit-plane formulation (32 states per u32; >100M perms/s on chip,
    see PERF.md keccak audit)."""

    def test_transpose_roundtrip(self):
        rng = np.random.default_rng(11)
        st = jnp.asarray(rng.integers(0, 1 << 32, size=(512, 25, 2),
                                      dtype=np.uint32))
        planes = states_to_planes(st)
        assert planes.shape == (1600, 8, 2)
        rt = planes_to_states(planes)
        assert (np.asarray(rt) == np.asarray(st)).all()

    def test_transpose_places_plane_bits(self):
        # state s=3, lane 7 (x=2,y=1), hi bit 5 -> plane (2+5)*64+32+5,
        # group g = s//32 = 0, bit position s%32 = 3
        st = np.zeros((256, 25, 2), dtype=np.uint32)
        st[3, 7, 1] = 1 << 5
        planes = np.asarray(states_to_planes(jnp.asarray(st)))
        flat = planes.reshape(1600, 8)
        assert flat[7 * 64 + 32 + 5, 0] == 1 << 3
        assert flat.sum() == 1 << 3

    @pytest.mark.slow  # interpret-mode run of the 16k-op kernel body
    def test_matches_array_form(self):
        rng = np.random.default_rng(12)
        st = jnp.asarray(rng.integers(0, 1 << 32, size=(256, 25, 2),
                                      dtype=np.uint32))
        want = keccak_f1600_array(st)
        got = planes_to_states(
            keccak_f1600_bitsliced(states_to_planes(st), iters=1))
        assert (np.asarray(got) == np.asarray(want)).all()


class TestSponge:
    def test_known_vectors(self):
        msgs = [b"", b"", b""]
        blocks = jnp.asarray(pad_messages(msgs))
        digests = digest_from_state(absorb_blocks(blocks))
        assert digests[0].hex() == \
            "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"

    def test_against_golden_various_lengths(self):
        for length in (0, 1, 50, 135, 136, 137, 200, 272):
            msgs = [bytes([(i * 7 + j) % 256 for j in range(length)])
                    for i in range(4)]
            blocks = jnp.asarray(pad_messages(msgs))
            digests = digest_from_state(absorb_blocks(blocks))
            for m, d in zip(msgs, digests):
                assert d == keccak256(m), f"len={length}"
