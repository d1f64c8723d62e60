"""Decompose the v3 bit-sliced fold: DMA floor vs absorb vs perm.

Variants (doctored flag blocks, KQ=1024, B=32768):
  none   — all slots invalid: grid + DMA + prep floor
  half   — 112 active slots, parity from cnt0=0 (56 wraps): the bench shape
  noperm — 112 active slots but wrap masks forced empty via odd... (uses
           112 absorbs, 0 perms) -> isolates absorb+transpose cost

Usage: python tools/probe_foldparts.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = 32768
K = 128
KQ = K * 8


def main():
    from era_zk_evm_tpu.models import VmConfig
    from era_zk_evm_tpu.models.fused_cycle import _rolling_fold_bitsliced

    rng = np.random.RandomState(0)
    meta = jnp.asarray(rng.randint(0, 1 << 31, size=(KQ, 4, B))
                       .astype(np.uint32))
    val = jnp.asarray(rng.randint(0, 1 << 31, size=(KQ, 8, B))
                      .astype(np.uint32))
    slot_valid = np.zeros(KQ, bool)
    slot_valid[rng.choice(KQ, 112, replace=False)] = True
    wc = jnp.zeros((25, 2, B), jnp.uint32)
    cnt = jnp.zeros((1, B), jnp.uint32)

    config = VmConfig(batch=B, code_words=16, stack_words=256,
                      sweep_gating=False, stack_abs_words=64,
                      stack_sp_base=960, heap_words=64, aux_heap_words=16,
                      max_depth=8, queue_capacity=0,
                      rolling_commitment=True)
    fold = jax.jit(_rolling_fold_bitsliced(config, K, interpret=False))

    variants = {
        "none": np.zeros((KQ, B), np.uint32),
        "half": (slot_valid[:, None] * np.full((KQ, B), 5)).astype(np.uint32),
    }
    # noperm: every lane sees only EVEN-parity records -> absorbs without
    # permutations: make each active slot valid for all lanes but reset
    # parity by... parity accumulates; instead mark only the first active
    # slot valid (1 absorb, 0 wraps) scaled: alternate validity per lane
    # so each lane gets <= 1 record: lane l valid only in its l%112-th
    # active slot — too scattered; approximate with 1 record/lane via the
    # first active slot only:
    one = np.zeros((KQ, B), np.uint32)
    one[np.nonzero(slot_valid)[0][:], :] = 0   # start all-invalid
    act = np.nonzero(slot_valid)[0]
    lane_slot = act[np.arange(B) % len(act)]
    one[lane_slot, np.arange(B)] = 5           # 1 record/lane, 112 absorbs
    variants["noperm"] = one

    for name, flg_np in variants.items():
        flg = jnp.asarray(flg_np)
        w2, c2 = fold(meta, val, flg, wc, cnt)
        int(np.asarray(c2)[0, 0])
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            w2, c2 = fold(meta, val, flg, wc, cnt)
            int(np.asarray(c2)[0, 0])
            best = min(best, time.time() - t0)
        print(f"{name}: {best * 1e3:.1f}ms", flush=True)


if __name__ == "__main__":
    main()
