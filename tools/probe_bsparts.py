"""Decompose the bit-sliced fold cost: XLA prep vs pallas kernel.

Usage: python tools/probe_bsparts.py [batch] [n_cycles]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
K = int(sys.argv[2]) if len(sys.argv) > 2 else 128
KQ = K * 8
G8 = B // 256


def timeit(f, *args, label="", reps=3):
    out = f(*args)
    s = jax.tree.leaves(out)[0]
    int(np.asarray(s.reshape(-1)[0]))
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = f(*args)
        s = jax.tree.leaves(out)[0]
        int(np.asarray(s.reshape(-1)[0]))
        best = min(best, time.time() - t0)
    print(f"{label}: {best * 1e3:.1f}ms", flush=True)
    return out


def main():
    from era_zk_evm_tpu.models import VmConfig
    from era_zk_evm_tpu.models.fused_cycle import _rolling_fold_bitsliced
    from era_zk_evm_tpu.ops.keccak import _bit_transpose_32

    rng = np.random.RandomState(0)
    meta = jnp.asarray(rng.randint(0, 1 << 31, size=(KQ, 4, B))
                       .astype(np.uint32))
    val = jnp.asarray(rng.randint(0, 1 << 31, size=(KQ, 8, B))
                      .astype(np.uint32))
    # bench-like validity: ~1 valid slot per cycle, batch-uniform
    slot_valid = (rng.rand(KQ) < 0.11)
    flg = jnp.asarray((slot_valid[:, None] * np.full((KQ, B), 5))
                      .astype(np.uint32))
    wc = jnp.zeros((25, 2, B), jnp.uint32)
    cnt = jnp.zeros((1, B), jnp.uint32)

    # 1. full fold
    config = VmConfig(batch=B, code_words=16, stack_words=256,
                      sweep_gating=False, stack_abs_words=64,
                      stack_sp_base=960, heap_words=64, aux_heap_words=16,
                      max_depth=8, queue_capacity=0,
                      rolling_commitment=True)
    fold = _rolling_fold_bitsliced(config, K, interpret=False)
    timeit(jax.jit(fold), meta, val, flg, wc, cnt, label="full fold")

    # 2. XLA prep only (transposes + masks, no pallas)
    def prep(meta_blk, val_blk, flg_blk, cnt):
        valid = (flg_blk & 4) != 0
        vm = valid.astype(jnp.uint32)
        before = cnt[0][None, :] + jnp.cumsum(vm, axis=0) - vm
        wrap_m = vm * (before & 1)
        words = [meta_blk[:, 0], meta_blk[:, 1], meta_blk[:, 2],
                 meta_blk[:, 3]]
        for k in range(4):
            words.append(val_blk[:, 7 - 2 * k])
            words.append(val_blk[:, 6 - 2 * k])
        recw = jnp.stack([w * vm for w in words], axis=1)
        g = recw.reshape(KQ, 12, B // 32, 32)
        p = _bit_transpose_32(g)
        p = jnp.transpose(p, (0, 1, 3, 2))
        rec_planes = p.reshape(KQ, 384, 8, G8)
        shifts = jnp.arange(32, dtype=jnp.uint32)
        wm = (wrap_m.reshape(KQ, B // 32, 32)
              << shifts[None, None, :]).sum(axis=2, dtype=jnp.uint32)
        return rec_planes, wm.reshape(KQ, 8, G8)

    rp, wm = timeit(jax.jit(prep), meta, val, flg, cnt, label="xla prep")
    print("done")


if __name__ == "__main__":
    main()
