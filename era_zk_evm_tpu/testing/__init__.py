"""Test-harness layer (capability of the reference's `src/testing`)."""

from .harness import (  # noqa: F401
    ENTRY_ADDRESS, ENTRY_BASE_PAGE, ENTRY_ERGS, Tools, build_vm,
    create_default_tools, get_final_net_states, reg, run, run_asm,
)
