"""Segmented block executor: unbounded blocks on bounded device geometry.

The reference's host loop is `while !vm.execution_has_ended() { vm.cycle() }`
over unbounded oracles (SURVEY §3.1; the testing pattern in
/root/reference/src/testing/tests, storage.rs:8-76 and decommitter.rs:10-99
are unbounded HashMaps, memory.rs:660-758 allocates pages forever).  The
device engines run fixed XLA shapes, so production-size blocks execute as
SEGMENTS with host-mediated spill protocols between them (models/spill.py).
This module composes every protocol into one driver:

  per segment
    1. callstack window normalization (spill/unspill bottom frames so the
       fixed device depth serves unbounded recursion);
    2. the segment runs on a SNAPSHOT; the drained-stream detectors for
       cold storage keys AND cold code hashes run together, rehydrate
       what is missing, and replay the segment until no cold touch
       remains (miss-free segments — the common case — run once);
    3. witness queues drain to host (block clocks rewind), the journal /
       event arrays compact, storage-KV and code-bank entries beyond the
       keep set evict to host, dead heap-frame slots reclaim.

The concatenated drained streams are bit-exact equal to an unsegmented
run's (tests/test_executor.py proves it against a big-geometry run on the
same programs, including final registers and the merged storage map).

Geometry contract (asserted): segment <= (max_depth - 3) // 2 when
callstack normalization is on; log_queue_capacity >= segment (the log
stream is both cold-touch detectors' input); code_pages covers the entry
slot + boundary-live pages + one segment's distinct contracts;
storage_slots covers journal-pinned entries + one segment's distinct keys;
heap_frames covers boundary-live frames + one segment's far calls.
"""

from __future__ import annotations

import dataclasses

import jax

from .spill import (
    HostCodeBank, HostStorage, SpilledFrames, _touched_code_hashes,
    _touched_storage_keys, compact_log_state_host, drain_witness_queues,
    normalize_callstack, rehydrate_code, rehydrate_keys, reclaim_heap_frames,
    spill_code_bank, spill_storage_kv,
)
from .state import BatchedVmState, VmConfig


@dataclasses.dataclass
class BlockHosts:
    """Host-side overflow stores threaded through a segmented execution."""

    storage: HostStorage
    code: HostCodeBank
    frames: SpilledFrames

    @classmethod
    def empty(cls, batch: int) -> "BlockHosts":
        return cls(storage=HostStorage.empty(batch),
                   code=HostCodeBank.empty(batch),
                   frames=SpilledFrames.empty(batch))


def run_block_segments(state: BatchedVmState, config: VmConfig, run_cycles,
                       n_cycles: int, segment: int,
                       hosts: BlockHosts | None = None,
                       keep_storage: int = 0, keep_code: int = 0,
                       max_replays: int = 8,
                       normalize_stack: bool = True,
                       reclaim_heap: bool = True):
    """Run `n_cycles` in `segment`-cycle slices with every spill protocol
    active.  Returns (state, hosts, streams) where streams concatenates the
    per-segment queue drains (identical to an unsegmented drain).

    `run_cycles` is either engine's driver (models.batched_vm.run_cycles or
    models.fused_cycle.run_cycles_fused via functools.partial).
    """
    if hosts is None:
        hosts = BlockHosts.empty(config.batch)
    log_on = config.storage_slots > 0 and config.log_queue_capacity > 0
    if normalize_stack:
        assert segment <= (config.max_depth - 3) // 2, \
            "segment too long for the callstack window (max_depth)"
    assert not log_on or config.log_queue_capacity >= segment
    acc: dict[str, list[list]] = {}
    done = 0
    while done < n_cycles:
        n = min(segment, n_cycles - done)
        if normalize_stack:
            state, hosts.frames = normalize_callstack(
                state, config, hosts.frames,
                lo=n + 1, hi=config.max_depth - 2 - n)
        snapshot = state
        for attempt in range(max_replays + 1):
            out = run_cycles(
                jax.tree.map(lambda x: x.copy(), snapshot), config, n)
            if not log_on:
                break
            from ..witness.commitment import device_log_streams

            logs = device_log_streams(out)
            t_keys = _touched_storage_keys(logs)
            t_hashes = _touched_code_hashes(logs)
            miss_k = [set(k for k in t if k in hosts.storage.maps[b])
                      for b, t in enumerate(t_keys)]
            miss_h = [set(h for h in t if h in hosts.code.maps[b])
                      for b, t in enumerate(t_hashes)]
            if not any(miss_k) and not any(miss_h):
                break
            assert attempt < max_replays, "segment replay did not converge"
            if any(miss_k):
                snapshot = rehydrate_keys(snapshot, config, hosts.storage,
                                          miss_k)
            if any(miss_h):
                snapshot, hosts.code = spill_code_bank(
                    snapshot, config, hosts.code, keep=0,
                    pin_hashes=t_hashes)
                snapshot = rehydrate_code(snapshot, config, hosts.code,
                                          miss_h)
        state, streams = drain_witness_queues(out, config)
        for name, lanes in streams.items():
            if name not in acc:
                acc[name] = [[] for _ in range(config.batch)]
            for b in range(config.batch):
                acc[name][b].extend(lanes[b])
        if config.storage_slots > 0:
            state = compact_log_state_host(state, config)
            state, hosts.storage = spill_storage_kv(
                state, config, hosts.storage, keep=keep_storage)
            state, hosts.code = spill_code_bank(
                state, config, hosts.code, keep=keep_code)
        if reclaim_heap and config.heap_frames > 1:
            state = reclaim_heap_frames(state, config)
        done += n
    if normalize_stack:
        state, hosts.frames = normalize_callstack(
            state, config, hosts.frames,
            lo=config.max_depth - 2, hi=config.max_depth - 2)
    return state, hosts, acc
