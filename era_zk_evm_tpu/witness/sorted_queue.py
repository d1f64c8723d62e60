"""Sorted-queue simulation + grand-product commitments (SURVEY §7 step 6).

The prover-facing form of the log queue is a SORTED copy plus a permutation
argument binding it to the emission-ordered queue: both multisets commit to
the same grand product ∏ (γ + fingerprint(entry)) over a prime field.  The
framework pins:

  * field      — Goldilocks (p = 2^64 - 2^32 + 1), the field of zkSync
    Era's prover stack (Boojum); arithmetic in ops/goldilocks.py.
  * fingerprint— keccak256 of the 128-byte log record (the exact
    commitment.serialize_log_query layout), first 8 digest bytes as a
    little-endian u64, reduced mod p.
  * γ          — caller-supplied (Fiat-Shamir in a real prover); pinned
    default DEFAULT_GAMMA for tests/benches.
  * sort order — lexicographic (aux_byte, shard_id, address, key,
    timestamp), invalid slots last; for storage queries this is the
    reference's storage-application order (address/key-major, then time
    — testing/storage.rs flatten_and_net_history's per-slot grouping),
    and events keep timestamp order within their aux class.

Sorting runs as one batched `lax.sort` over the queue axis (XLA's native
sort — no Pallas needed); fingerprints batch all B*Q records through the
keccak-f kernel at once.  The grand product is a log-depth tree of
Goldilocks multiplies, so the block-level fold over a sharded batch is a
collective tree the SPMD partitioner handles (tested on the 8-device CPU
mesh in tests/test_sorted_queue.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.goldilocks import GOLDILOCKS_P, gl_add, gl_mul, gl_reduce64
from ..ops.keccak import absorb_blocks

U32 = jnp.uint32

#: pinned test/bench γ (a real prover derives γ by Fiat-Shamir)
DEFAULT_GAMMA = 0xA5A55A5A_DEADBEEF % GOLDILOCKS_P


def _bswap(x):
    x = x.astype(U32)
    return ((x & 0xFF) << 24) | ((x & 0xFF00) << 8) \
        | ((x >> 8) & 0xFF00) | (x >> 24)


def log_queue_blocks(state) -> jax.Array:
    """Device serialization: the log queue as keccak rate blocks.

    Returns u32[B, Q, 34] — each row one padded 136-byte block holding the
    128-byte record of commitment.serialize_log_query, byte-exact.
    """
    meta = state.lq_meta          # [B, Q, 4]: ts, packed, tx, valid
    addr = state.lq_addr          # [B, Q, 5] LE u32 limbs
    key = state.lq_key            # [B, Q, 8]
    read = state.lq_read
    written = state.lq_written
    B, Q = meta.shape[:2]
    ts = meta[..., 0]
    packed = meta[..., 1]
    tx = meta[..., 2]
    aux = packed & 0xFF
    rw = (packed >> 8) & 1
    svc = (packed >> 9) & 1
    shard = (packed >> 16) & 0xFF
    flags = rw  # | rollback << 1 (device queues never hold rollback twins)
    flags = flags | (svc << 2)
    words = [
        _bswap(ts),
        aux | (shard << 8) | (flags << 16) | (((tx >> 8) & 0xFF) << 24),
        tx & 0xFF,
    ]
    words += [_bswap(addr[..., 4 - i]) for i in range(5)]
    for arr in (key, read, written):
        words += [_bswap(arr[..., 7 - i]) for i in range(8)]
    words.append(jnp.full((B, Q), 0x01, dtype=U32))          # pad 0x01
    words.append(jnp.full((B, Q), 0x80000000, dtype=U32))    # pad 0x80
    return jnp.stack(words, axis=-1)                          # [B, Q, 34]


def log_queue_fingerprints(state):
    """((fp_lo, fp_hi) u32[B, Q], valid bool[B, Q]) — keccak fingerprints
    of every queue record, reduced into Goldilocks."""
    blocks = log_queue_blocks(state)
    B, Q = blocks.shape[:2]
    st = absorb_blocks(blocks.reshape(B * Q, 1, 34))           # [BQ, 25, 2]
    lo = st[:, 0, 0].reshape(B, Q)
    hi = st[:, 0, 1].reshape(B, Q)
    lo, hi = gl_reduce64(lo, hi)
    valid = state.lq_meta[..., 3] != 0
    return (lo, hi), valid


def grand_product(fp_lo, fp_hi, valid, gamma: int = DEFAULT_GAMMA):
    """Per-lane ∏ (γ + fp) mod p over valid entries -> (lo, hi) u32[B].

    Log-depth tree fold (invalid slots contribute the factor 1)."""
    g_lo = jnp.full_like(fp_lo, gamma & 0xFFFFFFFF)
    g_hi = jnp.full_like(fp_hi, (gamma >> 32) & 0xFFFFFFFF)
    t_lo, t_hi = gl_add(fp_lo, fp_hi, g_lo, g_hi)
    one = jnp.ones_like(t_lo)
    zero = jnp.zeros_like(t_hi)
    lo = jnp.where(valid, t_lo, one)
    hi = jnp.where(valid, t_hi, zero)
    n = lo.shape[-1]
    while n > 1:
        half = (n + 1) // 2
        pad = half * 2 - n
        if pad:
            lo = jnp.concatenate(
                [lo, jnp.ones(lo.shape[:-1] + (pad,), U32)], axis=-1)
            hi = jnp.concatenate(
                [hi, jnp.zeros(hi.shape[:-1] + (pad,), U32)], axis=-1)
        lo, hi = gl_mul(lo[..., :half], hi[..., :half],
                        lo[..., half:], hi[..., half:])
        n = half
    return lo[..., 0], hi[..., 0]


def block_grand_product(lane_lo, lane_hi):
    """Fold per-lane products over the (possibly sharded) batch axis."""
    return grand_product(lane_lo, lane_hi,
                         jnp.ones_like(lane_lo, dtype=jnp.bool_), gamma=0)


def sort_log_queue(state):
    """The sorted-queue simulation: a copy of the log-queue arrays ordered
    by (aux_byte, shard, address, key, timestamp), invalid slots last.

    Returns (lq_meta, lq_addr, lq_key, lq_read, lq_written) with the same
    shapes as the state arrays.  One batched stable lax.sort.
    """
    meta, addr = state.lq_meta, state.lq_addr
    key, read, written = state.lq_key, state.lq_read, state.lq_written
    invalid = (meta[..., 3] == 0).astype(U32)
    packed = meta[..., 1]
    keys = [invalid, packed & 0xFF, (packed >> 16) & 0xFF]
    keys += [addr[..., 4 - i] for i in range(5)]
    keys += [key[..., 7 - i] for i in range(8)]
    keys += [meta[..., 0]]
    payload = [meta[..., i] for i in range(4)] \
        + [addr[..., i] for i in range(5)] \
        + [key[..., i] for i in range(8)] \
        + [read[..., i] for i in range(8)] \
        + [written[..., i] for i in range(8)]
    out = jax.lax.sort(tuple(keys) + tuple(payload), dimension=1,
                       num_keys=len(keys), is_stable=True)
    p = list(out[len(keys):])
    s_meta = jnp.stack(p[0:4], axis=-1)
    s_addr = jnp.stack(p[4:9], axis=-1)
    s_key = jnp.stack(p[9:17], axis=-1)
    s_read = jnp.stack(p[17:25], axis=-1)
    s_written = jnp.stack(p[25:33], axis=-1)
    return s_meta, s_addr, s_key, s_read, s_written


# ---------------------------------------------------------------------------
# Host references
# ---------------------------------------------------------------------------

def host_fingerprint(q) -> int:
    from ..golden.precompiles import keccak256
    from .commitment import serialize_log_query

    d = keccak256(serialize_log_query(q))
    return int.from_bytes(d[:8], "little") % GOLDILOCKS_P


def host_grand_product(queries, gamma: int = DEFAULT_GAMMA) -> int:
    acc = 1
    for q in queries:
        acc = acc * ((gamma + host_fingerprint(q)) % GOLDILOCKS_P) \
            % GOLDILOCKS_P
    return acc


def host_sort_key(q):
    return (q.aux_byte, q.shard_id, q.address, q.key, q.timestamp)
