"""Flagship batched lockstep interpreter (TPU-native VmState + cycle)."""

from .batched_vm import cycle_step, run_cycles  # noqa: F401
from .scheduler import TxResult, TxSpec, run_block_refill  # noqa: F401
from .state import BatchedVmState, VmConfig, empty_state, make_entry_state  # noqa: F401
