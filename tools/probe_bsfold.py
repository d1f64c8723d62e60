"""Round-5 micro-probes for the bit-sliced rolling fold design.

  perm   — keccak_f1600_bitsliced per-full-batch-perm cost at G8=B/256
  tr     — XLA-side record-word -> bit-plane butterfly transpose cost
           for a whole chunk's slot blocks ([KQ, 12, B] -> [KQ, 12*32, 8, G8])

Usage: python tools/probe_bsfold.py [batch] [kq]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from era_zk_evm_tpu.ops.keccak import _bit_transpose_32, keccak_f1600_bitsliced


def probe_perm(batch, iters=256):
    g8 = batch // 256
    planes = jnp.ones((1600, 8, g8), jnp.uint32)
    f = jax.jit(lambda s: keccak_f1600_bitsliced(s, iters=iters,
                                                 interpret=False))
    int(np.asarray(f(planes))[0, 0, 0])
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        int(np.asarray(f(planes))[0, 0, 0])
        best = min(best, time.time() - t0)
    per_perm = best / iters
    print(f"perm G8={g8}: {per_perm * 1e6:.0f}us/batch-perm "
          f"({batch * iters / best / 1e6:.1f}M lane-perms/s)")


def rec_words_to_planes(rec: jax.Array) -> jax.Array:
    """u32[KQ, W, B] record words -> bit planes u32[KQ, W*32, 8, B//256].

    Plane (w, z) holds bit z of word w for 32 consecutive lanes per u32
    (matching ops.keccak.states_to_planes' lane->group convention)."""
    KQ, W, B = rec.shape
    g = rec.reshape(KQ, W, B // 32, 32)            # [KQ, W, G, lane]
    p = _bit_transpose_32(g)                       # [KQ, W, G, z] planes
    p = jnp.transpose(p, (0, 1, 3, 2))             # [KQ, W, z, G]
    return p.reshape(KQ, W * 32, 8, B // 256)


def probe_tr(batch, kq):
    rec = jnp.ones((kq, 12, batch), jnp.uint32)
    f = jax.jit(rec_words_to_planes)
    int(np.asarray(f(rec))[0, 0, 0, 0])
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        int(np.asarray(f(rec))[0, 0, 0, 0])
        best = min(best, time.time() - t0)
    mb = kq * 12 * batch * 4 / 2**20
    print(f"transpose KQ={kq} B={batch} ({mb:.0f}MB): {best * 1e3:.1f}ms")


def main():
    nums = [int(a) for a in sys.argv[1:] if a.isdigit()]
    batch = nums[0] if nums else 32768
    kq = nums[1] if len(nums) > 1 else 1024
    print(f"backend: {jax.default_backend()}")
    probe_perm(batch)
    probe_tr(batch, kq)


if __name__ == "__main__":
    main()
