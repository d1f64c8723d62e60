"""Round-5 probe: where does the rolling-commitment fold spend its time?

Measures on the real chip:
  * capture-mode (witness queue) per-call + pipelined rates
  * rolling-mode per-call + pipelined rates (the delta is the fold cost)
  * the _rolling_fold_call kernel in isolation on real slot blocks
  * the slot-validity profile of the bench workload (how many of the
    K*8 slots per chunk have any valid lane -> permutation count)

Usage: python tools/probe_rolling.py [batch] [n_cycles] [group ...]
Groups: rates fold profile   (default: all)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from era_zk_evm_tpu.isa.assembler import assemble_to_code_words
from era_zk_evm_tpu.models import VmConfig, make_entry_state
from era_zk_evm_tpu.models.fused_cycle import run_cycles_fused
from era_zk_evm_tpu.models.spill import _rewind_queues_jit

WORKLOAD = """
    add 1, r0, r10
    add code[@n], r0, r1
    add 0, r0, r2
    loop:
    add r2, r1, r2
    mul r2, r1, r3, r4
    xor r3, r2, r5
    shl r5, r10, r6
    add r6, r0, stack+=[1]
    add stack-=[1], r0, r7
    st.h 0, r7
    ld.h 32, r8
    sub! r1, r10, r1
    jump.if_ne @loop
    ret r0
    n: .word 32768
"""


def make_cfg(batch, n_cycles, mode):
    q = n_cycles * 8 if mode == "capture" else 0
    return VmConfig(batch=batch, code_words=16, stack_words=256,
                    sweep_gating=False,
                    stack_abs_words=64, stack_sp_base=960,
                    heap_words=64, aux_heap_words=16, max_depth=8,
                    queue_capacity=q,
                    rolling_commitment=(mode == "rolling"))


def timed_rates(batch, n_cycles, mode, tile=512, depth=4, repeats=3):
    config = make_cfg(batch, n_cycles, mode)
    program = assemble_to_code_words(WORKLOAD)
    state = make_entry_state(config, [program] * batch, ergs=(1 << 31) - 1)

    def step(st):
        return run_cycles_fused(st, config, n_cycles, tile=tile,
                                k_inner=min(128, n_cycles))

    def sync(st):
        int(np.asarray(st.monotonic_cycle_counter)[0])

    t0 = time.time()
    state = step(state)
    sync(state)
    compile_s = time.time() - t0
    if mode == "capture":
        state = _rewind_queues_jit(state)

    best_call = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        state = step(state)
        sync(state)
        best_call = min(best_call, time.time() - t0)
        if mode == "capture":
            state = _rewind_queues_jit(state)

    best_pipe = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        for _ in range(depth):
            state = step(state)
            if mode == "capture":
                state = _rewind_queues_jit(state)
        sync(state)
        best_pipe = min(best_pipe, (time.time() - t0) / depth)
    cyc = batch * n_cycles
    print(f"{mode:8s} B={batch} K={n_cycles} compile={compile_s:.1f}s  "
          f"sync={cyc / best_call / 1e6:.1f}M  piped={cyc / best_pipe / 1e6:.1f}M "
          f"(call {best_call * 1e3:.1f}ms piped {best_pipe * 1e3:.1f}ms)")
    return best_call, best_pipe


def capture_blocks(batch, n_cycles, tile=512):
    """Run capture mode once and return the queue arrays (the fold's input
    layout) + the validity profile."""
    config = make_cfg(batch, n_cycles, "capture")
    program = assemble_to_code_words(WORKLOAD)
    state = make_entry_state(config, [program] * batch, ergs=(1 << 31) - 1)
    state = run_cycles_fused(state, config, n_cycles, tile=tile,
                             k_inner=min(128, n_cycles))
    meta = state.wq_meta      # [Q, 4, B]
    val = state.wq_value      # [Q, 8, B]
    flg = state.wq_flags      # [Q, B]
    return config, meta, val, flg


def profile(batch, n_cycles, tile=512):
    config, meta, val, flg = capture_blocks(batch, n_cycles, tile)
    f = np.asarray(flg)
    valid = (f & 4) != 0
    any_valid = valid.any(axis=1)
    all_valid = valid.all(axis=1)
    print(f"profile B={batch} K={n_cycles}: slots={f.shape[0]} "
          f"any_valid={int(any_valid.sum())} all_valid={int(all_valid.sum())} "
          f"mean_lane_records={valid.sum(axis=0).mean():.1f}")


def fold_only(batch, n_cycles, tile=512, repeats=3, kind="both"):
    from era_zk_evm_tpu.models.fused_cycle import (
        _rolling_fold_bitsliced, _rolling_fold_call,
    )

    config, meta, val, flg = capture_blocks(batch, n_cycles, tile)
    rcfg = make_cfg(batch, n_cycles, "rolling")
    wc = jnp.zeros((25, 2, batch), jnp.uint32)
    cnt = jnp.zeros((1, batch), jnp.uint32)
    n_slots = int(((np.asarray(flg) & 4) != 0).any(axis=1).sum())

    folds = {}
    if kind in ("both", "pair"):
        folds["u32pair"] = _rolling_fold_call(rcfg, n_cycles, tile,
                                              interpret=False)
    if kind in ("both", "bs"):
        folds["bitsliced"] = _rolling_fold_bitsliced(rcfg, n_cycles,
                                                     interpret=False)
    for name, fold in folds.items():
        f = jax.jit(lambda m, v, fl, w, c, _f=fold: _f(m, v, fl, w, c))
        t0 = time.time()
        w2, c2 = f(meta, val, flg, wc, cnt)
        int(np.asarray(c2)[0, 0])
        print(f"{name} fold compile+run: {time.time() - t0:.1f}s")
        best = float("inf")
        for _ in range(repeats):
            t0 = time.time()
            w2, c2 = f(meta, val, flg, wc, cnt)
            int(np.asarray(c2)[0, 0])
            best = min(best, time.time() - t0)
        print(f"fold[{name}] B={batch} KQ={meta.shape[0]}: "
              f"{best * 1e3:.1f}ms ({n_slots} active slots, "
              f"cnt={int(np.asarray(c2)[0, 0])})")


def main():
    args = [a for a in sys.argv[1:]]
    nums = [a for a in args if a.isdigit()]
    groups = [a for a in args if not a.isdigit()] or ["profile", "fold",
                                                      "rates"]
    batch = int(nums[0]) if nums else 32768
    n_cycles = int(nums[1]) if len(nums) > 1 else 128
    print(f"backend: {jax.default_backend()} {jax.devices()}")
    if "profile" in groups:
        profile(batch, n_cycles)
    if "fold" in groups:
        fold_only(batch, n_cycles)
    if "rates" in groups:
        timed_rates(batch, n_cycles, "capture")
        timed_rates(batch, n_cycles, "rolling")


if __name__ == "__main__":
    main()
