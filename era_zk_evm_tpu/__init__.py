"""era_zk_evm_tpu — a TPU-native EraVM execution + witness-generation engine.

Built from scratch in JAX/XLA/Pallas with the capabilities of the Rust crate
`zk_evm` v1.4.1 (matter-labs/era-zk_evm) plus the two external crates it
depends on (`zkevm_opcode_defs`, `zk_evm_abstractions`); see SURVEY.md.

Architecture (NOT a port):
  * ``isa``      — the EraVM ISA as data: constants, opcode variant table,
                   8-byte instruction encoding, ABIs (Layer 0).
  * ``golden``   — a sequential, exact Python model of the VM.  This is the
                   conformance oracle every TPU kernel is differentially
                   tested against (the role the Rust crate itself plays for
                   the circuits).
  * ``ops``      — JAX/Pallas compute kernels: 256-bit limb arithmetic,
                   Keccak-f[1600], SHA-256 rounds, queue commitments.
  * ``models``   — the flagship batched lockstep interpreter: thousands of
                   independent transaction contexts stepped per chip under
                   ``lax.scan`` with masked (branchless) opcode semantics.
  * ``witness``  — batched witness queues (memory / log / decommitter /
                   precompile) and their rolling commitments.
  * ``parallel`` — mesh construction + block-scale sharding over ICI/DCN.
  * ``testing``  — harness mirroring ``src/testing`` of the reference.
  * ``block``    — the host-facing entry point: ``execute_block`` runs a
                   whole block of transactions (continuous lane refill,
                   witness streams, net states, commitment folds).
"""

__version__ = "0.1.0"


def execute_block(*args, **kwargs):
    """Lazy re-export of block.execute_block (keeps bare import light)."""
    from .block import execute_block as _impl

    return _impl(*args, **kwargs)
