"""Scaling-efficiency harness (SURVEY.md §7 step 8 / BASELINE.md metric 3).

Weak scaling: each device carries the same per-device lane count; efficiency
= throughput(n devices) / (n * throughput(1 device)).  On real multi-chip
hardware the dp axis rides ICI and the only cross-device traffic is the
block-aggregate reduction + the ordered commitment fold (32 B per lane), so
efficiency should sit near 1; this harness also runs on the virtual CPU mesh
(functional validation — virtual-device timings share one host, so CPU
numbers validate plumbing, not performance).
"""

from __future__ import annotations

import time

import jax

from ..isa.assembler import assemble_to_code_words
from ..models import VmConfig, make_entry_state
from . import make_mesh, run_block, shard_state

_WORKLOAD = """
    add 1, r0, r10
    add code[@n], r0, r1
    add 0, r0, r2
    loop:
    add r2, r1, r2
    mul r2, r1, r3, r4
    xor r3, r2, r5
    st.h 0, r5
    ld.h 32, r6
    sub! r1, r10, r1
    jump.if_ne @loop
    ret r0
    n: .word 32768
"""


def measure(n_devices: int, lanes_per_device: int = 256,
            n_cycles: int = 32) -> float:
    """Cycles/sec for an n-device dp mesh (weak scaling)."""
    batch = n_devices * lanes_per_device
    config = VmConfig(batch=batch, code_words=16, stack_words=2048,
                      sweep_gating=False,
                      heap_words=64, aux_heap_words=16, max_depth=4,
                      queue_capacity=0)
    program = assemble_to_code_words(_WORKLOAD)
    state = make_entry_state(config, [program] * batch, ergs=(1 << 31) - 1)
    mesh = make_mesh(n_devices)
    state = shard_state(state, mesh)
    state, agg = run_block(state, config, n_cycles)
    jax.block_until_ready(state)
    t0 = time.time()
    state, agg = run_block(state, config, n_cycles)
    jax.block_until_ready(state)
    dt = time.time() - t0
    assert int(agg["error_lanes"]) == 0
    return batch * n_cycles / dt


def weak_scaling_report(device_counts=(1, 2, 4, 8)) -> dict[int, float]:
    rates = {n: measure(n) for n in device_counts}
    base = rates[device_counts[0]] / device_counts[0]
    return {n: rates[n] / (n * base) for n in device_counts}
