"""Batched sha256 kernel vs hashlib + the scalar golden implementation."""

import hashlib

import numpy as np
import jax.numpy as jnp

from era_zk_evm_tpu.golden.precompiles import sha256_compress, SHA256_IV
from era_zk_evm_tpu.ops.sha256 import sha256_blocks, sha256_compress_batched, sha256_iv


def _pad(msg: bytes) -> bytes:
    total = len(msg) * 8
    padded = msg + b"\x80" + b"\x00" * ((55 - len(msg)) % 64) \
        + total.to_bytes(8, "big")
    assert len(padded) % 64 == 0
    return padded


def _to_blocks(msgs: list[bytes]) -> np.ndarray:
    padded = [_pad(m) for m in msgs]
    n = len(padded[0]) // 64
    out = np.zeros((len(msgs), n, 16), dtype=np.uint32)
    for b, p in enumerate(padded):
        for blk in range(n):
            for i in range(16):
                out[b, blk, i] = int.from_bytes(
                    p[64 * blk + 4 * i:64 * blk + 4 * i + 4], "big")
    return out


class TestSha256Kernel:
    def test_single_block_matches_scalar(self):
        rng = np.random.default_rng(11)
        B = 8
        blocks = rng.integers(0, 1 << 32, size=(B, 16), dtype=np.uint32)
        state = sha256_iv(B)
        out = np.asarray(sha256_compress_batched(state, jnp.asarray(blocks)))
        for b in range(B):
            block_bytes = b"".join(int(x).to_bytes(4, "big") for x in blocks[b])
            want = sha256_compress(list(SHA256_IV), block_bytes)
            assert [int(x) for x in out[b]] == want

    def test_full_hash_vs_hashlib(self):
        msgs = [b"", b"abc", b"a" * 55, b"b" * 56]
        for group in ([msgs[0], msgs[1]],):
            pass
        # uniform-length groups
        for m in msgs:
            blocks = jnp.asarray(_to_blocks([m, m]))
            out = np.asarray(sha256_blocks(blocks))
            digest = b"".join(int(x).to_bytes(4, "big") for x in out[0])
            assert digest == hashlib.sha256(m).digest(), m

    def test_multi_block(self):
        m = bytes(range(200))
        blocks = jnp.asarray(_to_blocks([m] * 3))
        out = np.asarray(sha256_blocks(blocks))
        digest = b"".join(int(x).to_bytes(4, "big") for x in out[2])
        assert digest == hashlib.sha256(m).digest()
