"""Fused-kernel perf ablation: where does the tile-cycle time go on-chip?

Times run_cycles_fused under varied geometries, opcode mixes, and the
kernel's DEBUG_SKIP unit-bisection hooks to attribute the per-cycle cost
(arena sweeps vs ALU units vs witness emission vs fixed overhead).
Diagnostics only; prints a table to stdout.

Usage: python tools/ablate_fused.py [group ...]
Groups: mix geom skip tile  (default: mix geom)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from era_zk_evm_tpu.isa.assembler import assemble_to_code_words
from era_zk_evm_tpu.models import VmConfig, make_entry_state
from era_zk_evm_tpu.models import fused_cycle
from era_zk_evm_tpu.models.fused_cycle import run_cycles_fused

N_CYCLES = 128

# the bench.py headline workload (mixed: alu, mul, stack push/pop, heap)
PROG_BENCH = """
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

PROG_ALU = """
    add 1, r0, r10
    add code[@n], r0, r1
    loop:
    add r1, r1, r2
    xor r2, r1, r3
    and r3, r2, r4
    or r4, r2, r5
    add r5, r2, r6
    sub r6, r2, r7
    add r7, r2, r8
    sub! r1, r10, r1
    jump.if_ne @loop
    ret r0
    n: .word 32768
"""

PROG_STACK = """
    add 1, r0, r10
    add code[@n], r0, r1
    loop:
    add r1, r1, r2
    xor r2, r1, r3
    add r3, r0, stack+=[1]
    add stack-=[1], r0, r4
    add r4, r0, stack[0]
    add stack[0], r0, r5
    add r5, r2, r6
    sub! r1, r10, r1
    jump.if_ne @loop
    ret r0
    n: .word 32768
"""

PROG_HEAP = """
    add 1, r0, r10
    add code[@n], r0, r1
    loop:
    add r1, r1, r2
    xor r2, r1, r3
    st.h 0, r3
    ld.h 32, r4
    st.h 64, r4
    ld.h 0, r5
    add r5, r2, r6
    sub! r1, r10, r1
    jump.if_ne @loop
    ret r0
    n: .word 32768
"""


def timed(config, program, label, tile=256, k_inner=128, skip=frozenset(),
          stage=None):
    fused_cycle.DEBUG_SKIP = frozenset(skip)
    fused_cycle.DEBUG_STAGE = stage
    fused_cycle._run_cycles_fused_jit.clear_cache()
    words = assemble_to_code_words(program)
    state = make_entry_state(config, [words] * config.batch,
                             ergs=(1 << 31) - 1)
    t0 = time.time()
    state = run_cycles_fused(state, config, N_CYCLES, tile=tile,
                             k_inner=k_inner)
    int(np.asarray(state.monotonic_cycle_counter)[0])
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        state = run_cycles_fused(state, config, N_CYCLES, tile=tile,
                                 k_inner=k_inner)
        int(np.asarray(state.monotonic_cycle_counter)[0])
        best = min(best, time.time() - t0)
    fused_cycle.DEBUG_SKIP = frozenset()
    fused_cycle.DEBUG_STAGE = None
    err = int(np.sum(np.asarray(state.lane_error)))
    rate = config.batch * N_CYCLES / best
    n_tiles = config.batch // tile
    us_tc = best / N_CYCLES / n_tiles * 1e6
    print(f"{label:40s} B={config.batch:6d} T={tile:3d} {us_tc:7.3f} "
          f"us/tile-cyc {rate/1e6:7.2f}M cyc/s err={err} "
          f"(compile {compile_s:.1f}s)", flush=True)
    return rate


def cfg(batch=32768, stack_words=256, heap_words=64, witness=True,
        max_depth=8, **kw):
    q = N_CYCLES * 8 * 5 if witness else 0
    sp_base = 960 if stack_words >= 256 else 1024 - stack_words + 64 + 32
    return VmConfig(batch=batch, code_words=16, stack_words=stack_words,
                    sweep_gating=False,
                    stack_abs_words=64, stack_sp_base=sp_base,
                    heap_words=heap_words, aux_heap_words=16,
                    max_depth=max_depth, queue_capacity=q, **kw)


def main():
    print(f"platform: {jax.devices()}", file=sys.stderr)
    groups = sys.argv[1:] or ["mix", "geom"]

    if "mix" in groups:
        timed(cfg(), PROG_BENCH, "bench mix (headline geometry)")
        timed(cfg(witness=False), PROG_BENCH, "bench mix, no witness")
        timed(cfg(witness=False), PROG_ALU, "alu-only")
        timed(cfg(witness=False), PROG_STACK, "stack 4/10")
        timed(cfg(witness=False), PROG_HEAP, "heap 4/10")

    if "geom" in groups:
        timed(cfg(stack_words=128), PROG_BENCH, "bench mix, SW=128")
        timed(cfg(heap_words=16), PROG_BENCH, "bench mix, HW=16")
        timed(cfg(stack_words=128, heap_words=16), PROG_BENCH,
              "bench mix, SW=128 HW=16")
        timed(cfg(max_depth=4), PROG_BENCH, "bench mix, D=4")

    if "skip" in groups:
        timed(cfg(), PROG_BENCH, "bench mix, skip mul", skip={"mul"})
        timed(cfg(), PROG_BENCH, "bench mix, skip div", skip={"div"})
        timed(cfg(), PROG_BENCH, "bench mix, skip shift", skip={"shift"})
        timed(cfg(), PROG_BENCH, "bench mix, skip uma_shift",
              skip={"uma_shift"})
        timed(cfg(), PROG_BENCH, "bench mix, skip all 4",
              skip={"mul", "div", "shift", "uma_shift"})

    if "stage" in groups:
        # cumulative pipeline profile via the DEBUG_STAGE early-return hook
        for st in (1, 13, 2, 3, 4, 5, 6, 7, 8, 9, 10):
            timed(cfg(), PROG_BENCH, f"bench mix, cut at stage {st}",
                  stage=st)

    if "rt" in groups:
        # does a runtime-false lax.cond skip its branch on Mosaic?
        # (cache OFF for all three so only the cond mechanism varies)
        fused_cycle._WORD_CACHE = False
        timed(cfg(), PROG_STACK, "stack mix, baseline (cache off)",
              tile=512)
        timed(cfg(), PROG_STACK, "stack mix, cond rt-false", tile=512,
              skip={"stack_rw_rt"})
        timed(cfg(), PROG_STACK, "stack mix, compile-false", tile=512,
              skip={"stack_rw"})
        fused_cycle._WORD_CACHE = True

    if "rtw" in groups:
        # pl.when statement-form: runtime-false vs compile-time removal
        fused_cycle._WORD_CACHE = False
        timed(cfg(), PROG_STACK, "stack mix, baseline (cache off)",
              tile=512)
        timed(cfg(), PROG_STACK, "stack mix, store when rt-false",
              tile=512, skip={"stack_st_rt"})
        timed(cfg(), PROG_STACK, "stack mix, store removed", tile=512,
              skip={"stack_st_off"})
        fused_cycle._WORD_CACHE = True

    if "wc" in groups:
        # the landed word cache, on vs off (module flag, traced at build)
        for prog, label in ((PROG_BENCH, "bench mix"),
                            (PROG_STACK, "stack 4/10"),
                            (PROG_HEAP, "heap 4/10")):
            timed(cfg(), prog, f"T=512 {label}, word cache ON", tile=512)
            fused_cycle._WORD_CACHE = False
            fused_cycle._run_cycles_fused_jit.clear_cache()
            timed(cfg(), prog, f"T=512 {label}, word cache OFF", tile=512)
            fused_cycle._WORD_CACHE = True
            fused_cycle._run_cycles_fused_jit.clear_cache()

    if "cache" in groups:
        # upper bound for a perfect top-of-stack / hot-heap-word cache:
        # the sweeps' occupancy conds forced off (WRONG results, perf only)
        timed(cfg(), PROG_BENCH, "T=512 baseline", tile=512)
        timed(cfg(), PROG_BENCH, "T=512 skip stack_rw", tile=512,
              skip={"stack_rw"})
        timed(cfg(), PROG_BENCH, "T=512 skip heap_rw", tile=512,
              skip={"heap_rw"})
        timed(cfg(), PROG_BENCH, "T=512 skip both", tile=512,
              skip={"stack_rw", "heap_rw"})

    if "tile" in groups:
        timed(cfg(), PROG_BENCH, "bench mix, tile=128", tile=128)
        timed(cfg(), PROG_BENCH, "bench mix, tile=512", tile=512)
        timed(cfg(), PROG_BENCH, "bench mix, K=64", k_inner=64)
        timed(cfg(batch=65536), PROG_BENCH, "bench mix, B=64k")


if __name__ == "__main__":
    main()
