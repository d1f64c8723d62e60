"""Block-level execution pipeline — the host-facing entry point.

This is the TPU framework's equivalent of the reference's *usage pattern*:
host code constructs a VmState with populated oracles, loops
`while !vm.execution_has_ended() { vm.cycle(&mut tracer) }`, then extracts
`get_final_net_states` (/root/reference/src/testing/mod.rs:15-71; SURVEY
§3.1/§3.2).  The reference executes one transaction per VM; a block is a
host-side sequence of such runs.  Here the whole block is one call:

    result = execute_block(config, [TxSpec(...), ...])

* transactions run over `config.batch` lanes with continuous refill
  (models/scheduler.py) on either device engine (default: the fused
  flagship when the config supports it);
* every tx gets its ordered witness streams (memory / log / decommit /
  precompile queues, the reference's VmWitnessTracer product, SURVEY §5.1),
  its net states (final storage, net events, net L1 messages — the
  get_final_net_states shape), and per-family stream commitments;
* the block gets per-family ordered commitment folds over tx order (the
  pinned spec in witness/commitment.py) and the sorted-log-queue grand
  product (witness/sorted_queue.py, the prover-facing form).

The hot path is array-only end to end: drains extract PACKED record words
(witness/packed.py — the pinned serializations as device-built u32 words),
per-tx digests and log fingerprints are keccak'd ON DEVICE in bucketed
batches, and host work per query is O(1) integer arithmetic (grand-product
mulmods), never serialization or Python keccak.  `streams="objects"`
switches TxResult.streams back to reference-shaped query structs (the
conformance form; commitments then fold on host exactly as before).

Per-tx semantics are bit-identical to a dedicated single-tx run (proven by
tests/test_scheduler.py + tests/test_block.py against the golden oracle).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .models import TxSpec, TxResult, VmConfig, run_block_refill
from .models.batched_vm import run_cycles
from .witness.commitment import (
    block_commitment, commit_decommitter_queue, commit_log_queue,
    commit_memory_queue, commit_precompile_queue,
)
from .witness.sorted_queue import host_grand_product, host_sort_key

#: stream-name -> committing function (host object path)
_COMMITTERS = {
    "memory": commit_memory_queue,
    "log": commit_log_queue,
    "decommit": commit_decommitter_queue,
    "precompile": commit_precompile_queue,
}


@dataclasses.dataclass
class BlockResult:
    """Everything a reference user gets from a block, in tx order."""

    txs: list[TxResult]                 # per-tx results incl. streams + nets
    tx_commitments: list[dict]          # per-tx {family: 32-byte digest}
    commitments: dict                   # per-family block fold over tx order
    sorted_log_products: list[int]      # per-tx grand product (sorted stream)
    block_log_product: int              # Goldilocks product over tx order
    stats: dict                         # scheduler occupancy stats

    @property
    def all_ok(self) -> bool:
        return all(t.status == "ok" for t in self.txs)


def _engine_fn(engine: str, tile: int | None, k_inner: int,
               config: VmConfig):
    from .models.fused_cycle import run_cycles_fused, supported

    if engine == "auto":
        std_tile = next((c for c in (512, 256, 128, 64)
                         if config.batch % c == 0), None)
        engine = ("fused" if supported(config) and not config.sweep_gating
                  and (tile is not None or std_tile is not None)
                  else "jnp")
    if engine == "jnp":
        return run_cycles
    if engine != "fused":
        raise ValueError(f"unknown engine {engine!r}")

    def run_fn(state, config, n):
        t = tile
        if t is None:
            t = next((c for c in (512, 256, 128, 64)
                      if config.batch % c == 0), None)
            if t is None:
                # a fallback of tile=batch for an odd batch (e.g. 96) would
                # violate the fused kernel's tile geometry and fail deep in
                # the Mosaic compile — reject it here with the cause
                raise ValueError(
                    f"batch {config.batch} has no standard fused tile "
                    "divisor (512/256/128/64); pass an explicit tile= that "
                    "divides the batch")
        return run_cycles_fused(state, config, n, tile=t,
                                k_inner=min(k_inner, n))
    return run_fn


def _engine_dyn_fn(tile: int | None, k_inner: int, config: VmConfig):
    """Dynamic-cycle-count single-chunk driver for the adaptive-chunk
    scheduler policy (fused engine only): one compiled program covers
    every requested length n <= k_inner."""
    from .models.fused_cycle import run_chunk_fused_dyn

    def run_dyn(state, config, n):
        t = tile
        if t is None:
            t = next((c for c in (512, 256, 128, 64)
                      if config.batch % c == 0), None)
        return run_chunk_fused_dyn(state, n, config, tile=t,
                                   k_inner=k_inner)
    return run_dyn


def _families(config: VmConfig) -> list[str]:
    return [name for name, cap in (
        ("memory", config.queue_capacity),
        ("log", config.log_queue_capacity),
        ("decommit", config.decommit_queue_capacity),
        ("precompile", config.precompile_queue_capacity),
    ) if cap > 0]


def execute_block(config: VmConfig, txs: list[TxSpec], engine: str = "auto",
                  chunk: int = 64, tile: int | None = None,
                  k_inner: int = 128, refill: bool = True,
                  fresh_builder=None,
                  streams: str = "packed", **sched_kwargs) -> BlockResult:
    """Run a block of transactions end to end; see the module docstring.

    `engine` picks the device interpreter ("fused" = the flagship Pallas
    kernel, "jnp" = the XLA-fused fallback, "auto" = fused when the config
    supports it); `chunk` is the cycles-per-launch granularity (queue
    drains + lane refills happen at chunk boundaries).  `streams` picks
    the witness representation + commitment path ("packed" = device
    commitments over packed record arrays — the hot path; "objects" =
    query structs + host folds).  Scheduling-policy knobs (`refill_frac`,
    `spec_depth`, `tail_chunk_mult`, `order` — see
    models/scheduler.run_block_refill; all pure policies, bit-identical
    TxResults) and any remaining args pass through to the scheduler.
    """
    run_fn = _engine_fn(engine, tile, k_inner, config)
    if sched_kwargs.get("adaptive_chunk") \
            and "run_dyn_fn" not in sched_kwargs:
        if run_fn is run_cycles:
            raise ValueError("adaptive_chunk needs the fused engine "
                             "(run_chunk_fused_dyn) or an explicit "
                             "run_dyn_fn")
        sched_kwargs["run_dyn_fn"] = _engine_dyn_fn(
            tile, min(k_inner, chunk), config)
    results, stats = run_block_refill(config, txs, run_fn, chunk,
                                      refill=refill,
                                      fresh_builder=fresh_builder,
                                      collect=streams, **sched_kwargs)
    families = _families(config)

    if streams == "packed":
        from .witness.packed import (
            RECORD_WORDS, commit_packed_streams, fold_digests_device,
            packed_grand_products,
        )

        tx_commitments: list[dict] = [dict() for _ in results]
        for name in families:
            w = RECORD_WORDS[name]
            per_tx = [r.streams.get(name, np.zeros((0, w), np.uint32))
                      for r in results]
            for c, d in zip(tx_commitments, commit_packed_streams(per_tx)):
                c[name] = d
        commitments = {
            name: fold_digests_device([c[name] for c in tx_commitments])
            for name in families}
        log_streams = [r.streams.get(
            "log", np.zeros((0, RECORD_WORDS["log"]), np.uint32))
            for r in results]
        sorted_products = packed_grand_products(log_streams)
    else:
        tx_commitments = [
            {name: _COMMITTERS[name](r.streams.get(name, []))
             for name in families}
            for r in results]
        commitments = {
            name: block_commitment([c[name] for c in tx_commitments])
            for name in families}
        sorted_products = []
        for r in results:
            logs = sorted(r.streams.get("log", []), key=host_sort_key)
            sorted_products.append(host_grand_product(logs))

    from .ops.goldilocks import GOLDILOCKS_P
    block_product = 1
    for gp in sorted_products:
        block_product = (block_product * gp) % GOLDILOCKS_P

    return BlockResult(txs=results, tx_commitments=tx_commitments,
                       commitments=commitments,
                       sorted_log_products=sorted_products,
                       block_log_product=block_product, stats=stats)
