"""Split the v4 fold: time XLA prep alone vs the pallas call alone.

Usage: python tools/probe_fold_split.py
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
G8 = B // 256


def bench(f, args, label, reps=3):
    out = f(*args)
    leaf = jax.tree.leaves(out)[0]
    int(np.asarray(leaf.reshape(-1)[0]))
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = f(*args)
        leaf = jax.tree.leaves(out)[0]
        int(np.asarray(leaf.reshape(-1)[0]))
        best = min(best, time.time() - t0)
    print(f"{label}: {best * 1e3:.1f}ms", flush=True)
    return out


def main():
    from era_zk_evm_tpu.ops.keccak import _bit_transpose_32

    rng = np.random.RandomState(0)
    meta = jnp.asarray(rng.randint(0, 1 << 31, size=(KQ, 4, B))
                       .astype(np.uint32))
    val = jnp.asarray(rng.randint(0, 1 << 31, size=(KQ, 8, B))
                      .astype(np.uint32))
    slot_valid = np.zeros(KQ, bool)
    slot_valid[rng.choice(KQ, 112, replace=False)] = True
    flg = jnp.asarray((slot_valid[:, None] * np.full((KQ, B), 5))
                      .astype(np.uint32))
    wc = jnp.zeros((25, 2, B), jnp.uint32)
    cnt = jnp.zeros((1, B), jnp.uint32)

    def prep(flg_blk, cnt):
        valid = (flg_blk & 4) != 0
        vm = valid.astype(jnp.uint32)
        cnt0 = cnt[0]
        per_cyc = vm.reshape(KQ // 8, 8, B)
        cyc_base = jnp.cumsum(per_cyc.sum(axis=1), axis=0) \
            - per_cyc.sum(axis=1)
        intra = jnp.cumsum(per_cyc, axis=1) - per_cyc
        before = (cnt0[None, :] + (cyc_base[:, None, :] + intra)
                  .reshape(KQ, B))
        wrap_m = vm * (before & 1)
        even_m = vm - wrap_m

        def pack_bits(m):
            g = m.reshape(KQ, 8, 32, G8)
            shifts = jnp.arange(32, dtype=jnp.uint32)
            return (g << shifts[None, None, :, None]).sum(
                axis=2, dtype=jnp.uint32)

        emwm = jnp.stack([pack_bits(even_m), pack_bits(wrap_m)], axis=1)
        slot_any = jnp.any(valid, axis=1).astype(jnp.int32)
        slot_wrap = jnp.any(wrap_m != 0, axis=1).astype(jnp.int32)
        cnt_new = cnt + vm.sum(axis=0, dtype=jnp.uint32)[None, :]
        return emwm, slot_any, slot_wrap, cnt_new

    emwm, sa, sw, cn = bench(jax.jit(prep), (flg, cnt), "prep(masks+flags)")

    # relayout cost of feeding meta/val to pallas: force a copy
    def relayout(m, v):
        return (m.reshape(KQ, 4, 8, 32, G8) + 0,
                v.reshape(KQ, 8, 8, 32, G8) + 0)

    bench(jax.jit(relayout), (meta, val), "meta/val reshape+copy")

    # pallas call alone with precomputed inputs
    from era_zk_evm_tpu.models import VmConfig
    from era_zk_evm_tpu.models import fused_cycle as fc

    config = VmConfig(batch=B, code_words=16, stack_words=256,
                      sweep_gating=False, stack_abs_words=64,
                      stack_sp_base=960, heap_words=64, aux_heap_words=16,
                      max_depth=8, queue_capacity=0,
                      rolling_commitment=True)
    fold = fc._rolling_fold_bitsliced(config, K, interpret=False)
    bench(jax.jit(fold), (meta, val, flg, wc, cnt), "full fold")
    # zero-flag fold = floor
    zf = jnp.zeros_like(flg)
    bench(jax.jit(fold), (meta, val, zf, wc, cnt), "fold all-invalid")


def pieces():
    """Time the v5 fold's pieces via the exposed internals."""
    from era_zk_evm_tpu.models import VmConfig
    from era_zk_evm_tpu.models.fused_cycle import _rolling_fold_bitsliced

    rng = np.random.RandomState(0)
    meta = jnp.asarray(rng.randint(0, 1 << 31, size=(KQ, 4, B))
                       .astype(np.uint32))
    val = jnp.asarray(rng.randint(0, 1 << 31, size=(KQ, 8, B))
                      .astype(np.uint32))
    slot_valid = np.zeros(KQ, bool)
    slot_valid[rng.choice(KQ, 112, replace=False)] = True
    flg = jnp.asarray((slot_valid[:, None] * np.full((KQ, B), 5))
                      .astype(np.uint32))
    zf = jnp.zeros_like(flg)
    cnt = jnp.zeros((1, B), jnp.uint32)
    wc = jnp.zeros((25, 2, B), jnp.uint32)

    config = VmConfig(batch=B, code_words=16, stack_words=256,
                      sweep_gating=False, stack_abs_words=64,
                      stack_sp_base=960, heap_words=64, aux_heap_words=16,
                      max_depth=8, queue_capacity=0,
                      rolling_commitment=True)
    fold = _rolling_fold_bitsliced(config, K, interpret=False)

    flg5 = flg.reshape(KQ, 1, 8, 32, G8)[:, 0]
    zf5 = zf.reshape(KQ, 1, 8, 32, G8)[:, 0]
    par0 = jnp.zeros((1, 8, G8), jnp.uint32)
    bench(jax.jit(fold._mask_call), (flg5, par0), "mask kernel (112 act)")
    bench(jax.jit(fold._mask_call), (zf5, par0), "mask kernel (0 act)")

    emwm, cntp = jax.jit(fold._mask_call)(flg5, par0)
    union = emwm[:, 0] | emwm[:, 1]
    slot_any = jnp.any(union != 0, axis=(1, 2)).astype(jnp.int32)
    slot_wrap = jnp.any(emwm[:, 1] != 0, axis=(1, 2)).astype(jnp.int32)
    sz = jnp.zeros_like(slot_any)
    meta5 = meta.reshape(KQ, 4, 8, 32, G8)
    val5 = val.reshape(KQ, 8, 8, 32, G8)
    stp = jax.jit(fold._state_to_planes)(wc)
    rc = jnp.asarray(fold._rc_tab)

    bench(jax.jit(fold._call),
          (rc, sz, sz, meta5, val5, zf5, emwm, stp),
          "main kernel (0 act)")
    bench(jax.jit(fold._call),
          (rc, slot_any, slot_wrap, meta5, val5, flg5, emwm, stp),
          "main kernel (112 act)")
    bench(jax.jit(fold._state_to_planes), (wc,), "state->planes")
    bench(jax.jit(fold._planes_to_state), (stp,), "planes->state")
    bench(jax.jit(fold), (meta, val, flg, wc, cnt), "full fold")


if __name__ == "__main__":
    if "pieces" in sys.argv:
        pieces()
    else:
        main()
