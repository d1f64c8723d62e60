"""Sharded block execution on the fused Pallas engine.

Data-parallel over the batch axis: each device runs the fused multi-cycle
kernel on its shard (the kernel's grid is already a batch-tile loop, so a
shard is just fewer tiles).  shard_map gives each device a closed-over
per-shard VmConfig; cross-device aggregates ride XLA collectives, exactly
like parallel.mesh.run_block on the jnp engine.

Leaf partition specs follow the state layout: every leaf is batch-FIRST
except the memory-witness queue slabs (wq_meta/wq_value/wq_flags), which
are batch-LAST ([Q, ..., B] — see models/state.py on why).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.state import CS, BatchedVmState, VmConfig

_BATCH_LAST = ("wq_meta", "wq_value", "wq_flags")


def _leaf_spec(name: str, ndim: int, axis_name: str) -> P:
    if name in _BATCH_LAST:
        return P(*([None] * (ndim - 1) + [axis_name]))
    return P(*([axis_name] + [None] * (ndim - 1)))


def run_block_fused(state: BatchedVmState, config: VmConfig, n_cycles: int,
                    mesh: Mesh, axis_name: str = "dp",
                    tile: int = 128, k_inner: int = 64,
                    interpret: bool | None = None):
    """Advance a batch-sharded state n_cycles on the fused kernel, then
    fold the same block aggregates as parallel.mesh.run_block."""
    from jax.experimental.shard_map import shard_map

    from ..models.fused_cycle import run_cycles_fused

    n_dev = mesh.devices.size
    assert config.batch % n_dev == 0
    shard_config = dataclasses.replace(config, batch=config.batch // n_dev)
    shard_tile = min(tile, shard_config.batch)
    while shard_config.batch % shard_tile:
        shard_tile -= 1

    specs = {
        f.name: _leaf_spec(f.name, jnp.ndim(getattr(state, f.name)),
                           axis_name)
        for f in dataclasses.fields(BatchedVmState)
    }
    in_specs = BatchedVmState(**specs)

    def shard_fn(s: BatchedVmState) -> BatchedVmState:
        return run_cycles_fused(s, shard_config, n_cycles, tile=shard_tile,
                                k_inner=k_inner, interpret=interpret)

    sharded = shard_map(shard_fn, mesh=mesh, in_specs=(in_specs,),
                        out_specs=in_specs, check_rep=False)

    @jax.jit
    def step(s):
        s = sharded(s)
        aggregates = {
            "done_lanes": jnp.sum(s.done.astype(jnp.int32)),
            "error_lanes": jnp.sum(s.lane_error.astype(jnp.int32)),
            "cycles_retired": jnp.sum(
                s.monotonic_cycle_counter.astype(jnp.float32)),
            "witness_queries": jnp.sum(s.wq_count),
            "root_ergs": jnp.sum(
                s.cs_scalars[:, 0, CS["ergs_remaining"]]
                .astype(jnp.float32)),
        }
        if config.rolling_commitment:
            # ordered block fold on device: finalize per-shard lane
            # digests, all-gather the 32-byte digests over the mesh axis
            # (ICI/DCN), fold in GLOBAL lane order on every device —
            # semantics of witness/commitment.block_commitment, traffic
            # O(32 bytes/lane).  Bit-exact vs the host fold (tested).
            from ..witness.device_fold import (
                finalize_rolling_device, keccak256_device_stream,
            )

            def digest_shard(wcs, wcc):
                d = finalize_rolling_device(wcs, wcc)
                return jax.lax.all_gather(d, axis_name, axis=0, tiled=True)

            gathered = shard_map(
                digest_shard, mesh=mesh,
                in_specs=(P(axis_name, None, None), P(axis_name)),
                out_specs=P(None, None), check_rep=False,
            )(s.wc_state, s.wc_count)
            aggregates["memory_block_commitment"] = \
                keccak256_device_stream(gathered)
        return s, aggregates

    return step(state)
