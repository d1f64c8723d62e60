"""Perf ablation probe: where does the cycle-step time go on the real chip?

Times run_cycles under varied programs/configs to attribute cost:
batch scaling, arena sizes, opcode mix, witness mode.  Diagnostics only
(not part of the test suite); prints a table to stdout.
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
from era_zk_evm_tpu.models.batched_vm import run_cycles

N_CYCLES = 128

PROG_ALU = """
    add 1, r0, r10
    add code[@n], r0, r1
    loop:
    add r1, r1, r2
    xor r2, r1, r3
    shl r3, r10, r4
    and r4, r3, r5
    or r5, r2, r6
    add r6, r2, r7
    sub r7, r2, r8
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


def timed(config, program, label):
    words = assemble_to_code_words(program)
    state = make_entry_state(config, [words] * config.batch,
                             ergs=(1 << 31) - 1)
    t0 = time.time()
    state = run_cycles(state, config, N_CYCLES)
    jax.block_until_ready(state)
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        state = run_cycles(state, config, N_CYCLES)
        jax.block_until_ready(state)
        best = min(best, time.time() - t0)
    err = int(np.sum(np.asarray(state.lane_error)))
    rate = config.batch * N_CYCLES / best
    ms_per_step = best / N_CYCLES * 1e3
    print(f"{label:44s} B={config.batch:6d} {ms_per_step:7.3f} ms/step "
          f"{rate/1e6:7.2f}M cyc/s err={err} (compile {compile_s:.1f}s)",
          flush=True)
    return ms_per_step


def cfg(batch=32768, stack_words=256, heap_words=64, witness=False,
        max_depth=8, **kw):
    q = N_CYCLES * 8 * 5 if witness else 0
    # keep INITIAL_SP (1024) inside the sliding sp window for any SW
    # (960 kept for SW>=256 so default shapes stay compile-cache-warm)
    sp_base = 960 if stack_words >= 256 else 1024 - stack_words + 64 + 32
    return VmConfig(batch=batch, code_words=16, stack_words=stack_words,
                    sweep_gating=False,
                    stack_abs_words=64, stack_sp_base=sp_base,
                    heap_words=heap_words, aux_heap_words=16,
                    max_depth=max_depth, queue_capacity=q, **kw)


def main():
    print(f"platform: {jax.devices()}", file=sys.stderr)
    sel = sys.argv[1] if len(sys.argv) > 1 else "all"

    if sel in ("all", "mix"):
        timed(cfg(), PROG_ALU, "alu-only")
        timed(cfg(), PROG_STACK, "stack 4/10")
        timed(cfg(), PROG_HEAP, "heap 4/10")
        timed(cfg(witness=True), PROG_ALU, "alu-only +witness")
        timed(cfg(witness=True), PROG_HEAP, "heap 4/10 +witness")

    if sel in ("all", "arena"):
        timed(cfg(stack_words=128), PROG_STACK, "stack 4/10, SW=128")
        timed(cfg(stack_words=512), PROG_STACK, "stack 4/10, SW=512")
        timed(cfg(stack_words=1024), PROG_STACK, "stack 4/10, SW=1024")
        timed(cfg(heap_words=256), PROG_HEAP, "heap 4/10, HW=256")
        timed(cfg(heap_words=1024), PROG_HEAP, "heap 4/10, HW=1024")

    if sel in ("all", "batch"):
        timed(cfg(batch=4096), PROG_ALU, "alu-only")
        timed(cfg(batch=8192), PROG_ALU, "alu-only")
        timed(cfg(batch=16384), PROG_ALU, "alu-only")
        timed(cfg(batch=65536), PROG_ALU, "alu-only")
        timed(cfg(batch=65536), PROG_HEAP, "heap 4/10")
        timed(cfg(batch=131072), PROG_ALU, "alu-only")

    if sel in ("all", "depth"):
        timed(cfg(max_depth=4), PROG_ALU, "alu-only, D=4")
        timed(cfg(max_depth=16), PROG_ALU, "alu-only, D=16")
        timed(cfg(max_depth=32), PROG_ALU, "alu-only, D=32")


if __name__ == "__main__":
    main()
