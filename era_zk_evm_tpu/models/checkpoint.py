"""Block-level checkpoint / resume for the batched VM (SURVEY.md §5.4).

The reference has no checkpointing but its state is fully explicit; here the
entire batched VM state is a pytree of arrays, so a checkpoint is just the
array set + the static config, and resume is bit-exact: the cycle step is a
pure function of (state, config).  Multi-host runs re-shard on load by passing
a mesh.
"""

from __future__ import annotations

import dataclasses
import json
import pathlib

import jax
import numpy as np

from .state import BatchedVmState, VmConfig


def save_checkpoint(path: str | pathlib.Path, state: BatchedVmState,
                    config: VmConfig) -> None:
    path = pathlib.Path(path)
    path.mkdir(parents=True, exist_ok=True)
    arrays = {f.name: np.asarray(getattr(state, f.name))
              for f in dataclasses.fields(state)}
    np.savez_compressed(path / "state.npz", **arrays)
    (path / "config.json").write_text(json.dumps(dataclasses.asdict(config)))


def load_checkpoint(path: str | pathlib.Path,
                    mesh=None, axis_name: str = "dp"):
    """-> (state, config); optionally re-shard over a mesh on load."""
    path = pathlib.Path(path)
    config = VmConfig(**json.loads((path / "config.json").read_text()))
    data = np.load(path / "state.npz")
    kwargs = {name: jax.numpy.asarray(data[name]) for name in data.files}
    state = BatchedVmState(**kwargs)
    if mesh is not None:
        from ..parallel import shard_state

        state = shard_state(state, mesh, axis_name)
    return state, config
