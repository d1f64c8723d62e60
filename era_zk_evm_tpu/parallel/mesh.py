"""Mesh construction + block-scale sharding of the batched VM.

The reference is single-threaded (SURVEY.md §2.11) — every parallel axis here
is new, TPU-native architecture: transaction contexts are the data-parallel
axis (`dp`), sharded over devices with `jax.sharding`; block-level aggregates
(spent ergs, witness-queue lengths, commitment folds) reduce across the mesh
with XLA collectives over ICI/DCN.  Because every state leaf carries the batch
as its leading axis, one PartitionSpec("dp") shards the whole VM state.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import BatchedVmState, VmConfig, cycle_step
from ..models.state import CS


def make_mesh(n_devices: int | None = None, axis_name: str = "dp") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        assert len(devices) >= n_devices, \
            f"need {n_devices} devices, have {len(devices)}"
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_state(state: BatchedVmState, mesh: Mesh,
                axis_name: str = "dp") -> BatchedVmState:
    """Place every leaf batch-sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), state)


@partial(jax.jit, static_argnames=("config", "n_cycles"), donate_argnums=(0,))
def run_block(state: BatchedVmState, config: VmConfig, n_cycles: int):
    """One sharded block-execution step: advance all contexts n_cycles, then
    fold block-level aggregates (XLA inserts the cross-device reductions).

    Returns (state, aggregates) where aggregates are scalars reduced over the
    whole mesh: finished-lane count, error count, total cycles retired, total
    witness queries emitted, and the root-frame ergs remaining.
    """
    state = jax.lax.fori_loop(
        0, n_cycles, lambda i, s: cycle_step(s, config, i), state)
    aggregates = {
        "done_lanes": jnp.sum(state.done.astype(jnp.int32)),
        "error_lanes": jnp.sum(state.lane_error.astype(jnp.int32)),
        "cycles_retired": jnp.sum(
            state.monotonic_cycle_counter.astype(jnp.int64)
            if jax.config.jax_enable_x64 else
            state.monotonic_cycle_counter.astype(jnp.float32)),
        "witness_queries": jnp.sum(state.wq_count),
        "root_ergs": jnp.sum(
            state.cs_scalars[:, 0, CS["ergs_remaining"]].astype(jnp.float32)),
    }
    if config.rolling_commitment:
        # device block fold (see parallel/fused.py): under plain jit the
        # SPMD partitioner inserts the all-gather the sequential fold needs
        from ..witness.device_fold import (
            finalize_rolling_device, keccak256_device_stream,
        )

        digests = finalize_rolling_device(state.wc_state, state.wc_count)
        aggregates["memory_block_commitment"] = \
            keccak256_device_stream(digests)
    return state, aggregates
