"""Device-side commitment finalization + the collective block fold.

Round 1 specified the block commitment as an ordered fold over per-lane
digests (commitment.py module docstring) but executed it in host Python.
This module puts both halves on device:

  * `finalize_rolling_device` — per-lane sponge finalization of the
    rolling (streaming) memory-queue commitment (wc_state/wc_count), the
    batched-jnp equivalent of `commitment.device_rolling_commitments`.
  * `keccak256_device_stream` — keccak256 over N concatenated 32-byte
    digests in lane order, as a `lax.scan` sponge: the device form of
    `commitment.block_commitment`.

The multi-chip path (parallel/fused.py) finalizes per-shard, all-gathers
the 32-byte digests over the mesh axis (ICI/DCN — 32 bytes/lane of
traffic), and folds the gathered stream in GLOBAL lane order on every
device, preserving the sequential ordering semantics the reference's
witness consumers require (/root/reference/src/vm_state/mod.rs:220-234:
ordering is timestamp-derived per lane; lane order is this framework's
pinned block-level extension — see witness/commitment.py).

Bit-exactness vs the host fold is proven in
tests/test_parallel.py::test_collective_block_commitment.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.keccak import keccak_f1600, keccak_f1600_array

U32 = jnp.uint32


def _perm_looped(st: jax.Array) -> jax.Array:
    """keccak-f[1600] on one state u32[25, 2], fori-loop round form.

    XLA:CPU compile time explodes super-linearly on the 24-round unrolled
    chain when it sits inside a lax.scan (measured: >100 s for a 2-block
    scan); the looped form compiles in seconds and runs the same math.
    """
    lo = [st[i, 0] for i in range(25)]
    hi = [st[i, 1] for i in range(25)]
    lo, hi = keccak_f1600(lo, hi, unroll=False)
    return jnp.stack([jnp.stack(lo), jnp.stack(hi)], axis=1)


def finalize_rolling_device(wc_state: jax.Array,
                            wc_count: jax.Array) -> jax.Array:
    """Finalize per-lane rolling sponges: u32[B, 25, 2], u32[B] -> u32[B, 8].

    Mirrors commitment.device_rolling_commitments / rolling_commit
    (spec v2: count | 0x80<<56 XORed into rate lane 16, one permutation);
    output rows are the 32-byte digests as 8 little-endian u32 words
    [lane0.lo, lane0.hi, ..., lane3.hi].
    """
    st = wc_state
    st = st.at[:, 16, 0].set(st[:, 16, 0] ^ wc_count.astype(U32))
    st = st.at[:, 16, 1].set(st[:, 16, 1] ^ U32(0x80000000))
    st = keccak_f1600_array(st)
    return st[:, :4, :].reshape(st.shape[0], 8)


def keccak256_device_stream(rows: jax.Array) -> jax.Array:
    """keccak256 over concatenated 32-byte rows -> digest u32[8].

    rows: u32[N, 8], each row one 32-byte record in little-endian u32
    words (the `finalize_rolling_device` output form).  Equals
    golden.precompiles.keccak256(b"".join(row_bytes)) bit-exactly —
    i.e. commitment.block_commitment on device.  N is static, so the
    0x01 / 0x80 pad positions fold to constants; the sponge runs as a
    sequential lax.scan over 136-byte rate blocks (N*32/136 + 1
    permutations at batch 1 — a per-block finalization cost, not a
    per-cycle one).
    """
    import numpy as np

    n = rows.shape[0]
    total_words = n * 8                      # u32 words; 4 bytes each
    n_blocks = (total_words * 4) // 136 + 1
    padded_words = n_blocks * 34
    # keccak256 (legacy) pad: 0x01 at the first pad byte, 0x80 at the
    # final rate-block byte — both land INSIDE the pad region (the data
    # is u32-aligned and the pad is non-empty), so the pad is one
    # compile-time constant.  No in-place update on the (possibly
    # sharded) data array: an .at[].set on a batch-sharded input
    # miscompiled under the GSPMD partitioner (observed on the 8-device
    # CPU mesh).
    pad = np.zeros(padded_words - total_words, dtype=np.uint32)
    pad[0] ^= 0x01
    pad[-1] ^= 0x80000000
    flat = jnp.concatenate([rows.reshape(-1), jnp.asarray(pad)])
    blocks = flat.reshape(n_blocks, 34)

    def absorb(st, blk):
        xor = jnp.concatenate(
            [blk.reshape(17, 2), jnp.zeros((8, 2), dtype=U32)], axis=0)
        return _perm_looped(st ^ xor), None

    st0 = jnp.zeros((25, 2), dtype=U32)
    st, _ = jax.lax.scan(absorb, st0, blocks)
    return st[:4].reshape(8)


def digest_rows_to_bytes(rows) -> list[bytes]:
    """Host helper: u32[N, 8] digest rows -> 32-byte digests."""
    import numpy as np

    rows = np.asarray(rows)
    return [b"".join(int(w).to_bytes(4, "little") for w in row)
            for row in rows]
