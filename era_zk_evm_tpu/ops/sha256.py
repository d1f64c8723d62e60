"""Batched SHA-256 compression (JAX, elementwise over [B] u32 vectors).

Backs the EraVM sha256 round-function precompile (SURVEY.md §2.10) and the
versioned-code-hash machinery.  The 64 rounds run under a `lax.fori_loop`
with a rolling 16-word message-schedule window: XLA:CPU's simplifier shows
super-linear compile time on the fully unrolled add-rotate-xor chain (>170s
for 64 rounds), while the looped form compiles instantly everywhere and the
round constants index with a batch-uniform scalar (fast on TPU).

Scalar reference: era_zk_evm_tpu.golden.precompiles.sha256_compress."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..golden.precompiles import SHA256_IV, SHA256_K

U32 = jnp.uint32


def _rotr(x, n: int):
    return (x >> n) | (x << (32 - n))


def sha256_compress_batched(state: jax.Array, block: jax.Array,
                            unroll: bool | None = None) -> jax.Array:
    """One compression round per lane.

    state: u32[B, 8]; block: u32[B, 16] (big-endian words of the 64-byte
    block).  Returns u32[B, 8].

    `unroll=None` picks per backend: unrolled on TPU (the fori_loop's
    per-round dynamic window indexing dominates there — the unrolled form
    is pure static dataflow the VPU pipelines), looped elsewhere (XLA:CPU's
    super-linear simplifier blowup on the unrolled chain, see module doc).
    """
    if unroll is None:
        unroll = jax.default_backend() == "tpu"
    if unroll:
        return _sha256_compress_unrolled(state, block)
    k_tab = jnp.asarray(SHA256_K, dtype=U32)

    def idx(w, i):
        return jax.lax.dynamic_index_in_dim(w, i % 16, axis=1, keepdims=False)

    def body(i, carry):
        a, b, c, d, e, f, g, h, w = carry
        w16 = idx(w, i)
        # message schedule: for i >= 16 replace slot i%16 in the rolling window
        s0 = _rotr(idx(w, i - 15), 7) ^ _rotr(idx(w, i - 15), 18) \
            ^ (idx(w, i - 15) >> 3)
        s1 = _rotr(idx(w, i - 2), 17) ^ _rotr(idx(w, i - 2), 19) \
            ^ (idx(w, i - 2) >> 10)
        scheduled = w16 + s0 + idx(w, i - 7) + s1
        wi = jnp.where(i < 16, w16, scheduled)
        w = jax.lax.dynamic_update_index_in_dim(w, wi, i % 16, axis=1)

        s1r = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + s1r + ch + k_tab[i] + wi
        s0r = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = s0r + maj
        return (t1 + t2, a, b, c, d + t1, e, f, g, w)

    init = tuple(state[:, i] for i in range(8)) + (block,)
    out = jax.lax.fori_loop(0, 64, body, init)
    return jnp.stack([state[:, i] + out[i] for i in range(8)], axis=1)


def _sha256_compress_unrolled(state: jax.Array, block: jax.Array) -> jax.Array:
    """Fully unrolled compression: static message schedule, no dynamic
    indexing — the TPU-preferred form (each round is a short add/rot/xor
    dataflow chain over [B] vectors)."""
    w = [block[:, i] for i in range(16)]
    for i in range(16, 64):
        s0 = _rotr(w[i - 15], 7) ^ _rotr(w[i - 15], 18) ^ (w[i - 15] >> 3)
        s1 = _rotr(w[i - 2], 17) ^ _rotr(w[i - 2], 19) ^ (w[i - 2] >> 10)
        w.append(w[i - 16] + s0 + w[i - 7] + s1)
    a, b, c, d, e, f, g, h = (state[:, i] for i in range(8))
    for i in range(64):
        s1r = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + s1r + ch + jnp.uint32(SHA256_K[i]) + w[i]
        s0r = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = s0r + maj
        a, b, c, d, e, f, g, h = t1 + t2, a, b, c, d + t1, e, f, g
    out = (a, b, c, d, e, f, g, h)
    return jnp.stack([state[:, i] + out[i] for i in range(8)], axis=1)


def sha256_iv(batch: int) -> jax.Array:
    return jnp.broadcast_to(jnp.asarray(SHA256_IV, dtype=U32), (batch, 8))


@jax.jit
def sha256_blocks(blocks: jax.Array) -> jax.Array:
    """Hash n pre-padded blocks per lane: u32[B, n, 16] -> states u32[B, 8]."""
    B, n, _ = blocks.shape
    state = sha256_iv(B)
    for i in range(n):
        state = sha256_compress_batched(state, blocks[:, i])
    return state
