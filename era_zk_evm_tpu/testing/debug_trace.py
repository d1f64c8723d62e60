"""Device-side debug tracing: per-cycle architectural snapshots of lanes.

The reference's `Tracer` hooks (src/tracing.rs:40-72) observe one VM from
inside the cycle loop; the batched engines are opaque in-flight, so the
device counterpart steps `cycle_step` one cycle at a time and reads back
the observable surface per hook point — the before-execution payload
(pc, disassembled instruction, sp, ergs, flags, depth, timestamp) for
selected lanes.  Built for debugging divergences: the rows line up 1:1
with golden's CollectingDebugTracer events (tested), so a mismatching
cycle localizes immediately.

This is a DEBUG tool, not a production path: it syncs the device every
cycle (fine on CPU; on the real chip prefer short n_cycles).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

from ..isa.assembler import disassemble_one
from ..models import VmConfig, cycle_step
from ..models.state import CS, BatchedVmState, arena_word_major
from ..utils import from_limbs


@dataclasses.dataclass
class CycleSnapshot:
    """One lane's architectural state at a cycle boundary."""

    cycle: int
    pc: int
    sp: int
    ergs: int
    depth: int
    flags: tuple[bool, bool, bool]      # (lt/of, eq, gt)
    timestamp: int
    instruction: int                    # raw 8-byte encoding at pc
    asm: str                            # disassembly of `instruction`
    done: bool
    lane_error: bool
    registers: list[int] | None = None  # optional full register file


def _fetch_instruction(state_np: dict, config: VmConfig, b: int,
                       pc: int, code_page: int) -> int:
    """Read the 8-byte instruction at (code_page, pc) from the code bank."""
    cb_page = state_np["cb_page"][b]
    cb_valid = state_np["cb_valid"][b]
    slot = None
    for s in range(cb_page.shape[0]):
        if cb_valid[s] and int(cb_page[s]) == code_page:
            slot = s
            break
    if slot is None:
        return 0
    super_pc, sub_pc = pc >> 2, pc & 3
    if super_pc >= config.code_words:
        return 0
    word = from_limbs(state_np["code"][b, slot * config.code_words + super_pc])
    shift = 64 * (3 - sub_pc)
    return (word >> shift) & ((1 << 64) - 1)


def trace_cycles(state: BatchedVmState, config: VmConfig, n_cycles: int,
                 lanes: list[int] | None = None,
                 with_registers: bool = False,
                 ) -> tuple[BatchedVmState, list[list[CycleSnapshot]]]:
    """Step n_cycles one at a time, snapshotting `lanes` before each cycle.

    Returns (advanced state, traces) with traces[i] the i-th requested
    lane's per-cycle snapshots.  The snapshot is the before-execution
    view: the instruction ABOUT to execute at that cycle.
    """
    B = config.batch
    lanes = list(range(B)) if lanes is None else list(lanes)
    traces: list[list[CycleSnapshot]] = [[] for _ in lanes]

    for k in range(n_cycles):
        cs = np.asarray(state.cs_scalars)
        depth = np.asarray(state.depth)
        flags = np.asarray(state.flags)
        ts = np.asarray(state.timestamp)
        done = np.asarray(state.done)
        err = np.asarray(state.lane_error)
        snap_np = {
            "cb_page": np.asarray(state.cb_page),
            "cb_valid": np.asarray(state.cb_valid),
            "code": arena_word_major(np.asarray(state.code), config),
        }
        regs = np.asarray(state.regs) if with_registers else None
        for i, b in enumerate(lanes):
            d = int(depth[b])
            frame = cs[b, d]
            pc = int(frame[CS["pc"]])
            insn = _fetch_instruction(snap_np, config, b, pc,
                                      int(frame[CS["code_page"]]))
            traces[i].append(CycleSnapshot(
                cycle=k,
                pc=pc,
                sp=int(frame[CS["sp"]]),
                ergs=int(frame[CS["ergs_remaining"]]),
                depth=d,
                flags=(bool(flags[b, 0]), bool(flags[b, 1]),
                       bool(flags[b, 2])),
                timestamp=int(ts[b]),
                instruction=insn,
                asm=disassemble_one(insn) if insn else "<no code>",
                done=bool(done[b]),
                lane_error=bool(err[b]),
                registers=[from_limbs(regs[b, r]) for r in range(15)]
                if with_registers else None,
            ))
        state = cycle_step(state, config)
    return state, traces


def resolve_page(state: BatchedVmState, config: VmConfig, lane: int,
                 page: int):
    """Map a VM page number to its backing device arena for one lane.

    Returns (kind, arena_word_major_view, word_offset, n_words) with kind
    in {"code", "stack", "heap", "aux_heap"}, or None if the page is not
    materialized on device.  Device counterpart of the reference's page
    graph lookups (memory.rs:300-401 dump helpers work per page number).
    """
    cb_page = np.asarray(state.cb_page)[lane]
    cb_valid = np.asarray(state.cb_valid)[lane]
    for slot in range(config.code_pages):
        if cb_valid[slot] and int(cb_page[slot]) == page:
            return ("code", arena_word_major(np.asarray(state.code), config),
                    slot * config.code_words, config.code_words)
    hp = np.asarray(state.hp_page)[lane]
    ap = np.asarray(state.ap_page)[lane]
    nf = int(np.asarray(state.frame_count)[lane])
    for slot in range(min(nf, config.heap_frames)):
        if int(hp[slot]) == page:
            return ("heap", arena_word_major(np.asarray(state.heap), config),
                    slot * config.heap_words, config.heap_words)
        if int(ap[slot]) == page:
            return ("aux_heap",
                    arena_word_major(np.asarray(state.aux_heap), config),
                    slot * config.aux_heap_words, config.aux_heap_words)
    # stack pages: frame base + 1 for any frame row (popped rows keep
    # their metadata, so finished lanes still dump — debug-tool semantics)
    cs = np.asarray(state.cs_scalars)[lane]
    for d in range(config.max_depth):
        if int(cs[d, CS["base_memory_page"]]) + 1 == page:
            stack = arena_word_major(np.asarray(state.stack), config)
            return ("stack", stack, 0, config.stack_words)
    return None


def dump_page_content(state: BatchedVmState, config: VmConfig, lane: int,
                      page: int, start: int = 0,
                      end: int | None = None) -> list[str]:
    """Hex dump of word range [start, end) of a VM page for one lane.

    Device counterpart of SimpleMemory::dump_page_content
    (memory.rs:300-401): one 64-hex-digit string per 32-byte word.
    Unmaterialized pages dump as implicit zeros (the reference's sparse
    pages read as zero too).
    """
    hit = resolve_page(state, config, lane, page)
    out = []
    if hit is None:
        n = (end if end is not None else start + 1) - start
        return ["0" * 64] * max(n, 0)
    kind, arena, off, n_words = hit
    if end is None:
        end = n_words
    for w in range(start, end):
        if 0 <= w < n_words:
            out.append(f"{from_limbs(arena[lane, off + w]):064x}")
        else:
            out.append("0" * 64)
    return out


def dump_full_page(state: BatchedVmState, config: VmConfig, lane: int,
                   page: int) -> list[str]:
    """Whole-page hex dump (memory.rs dump_full_page counterpart)."""
    return dump_page_content(state, config, lane, page)


def format_trace(trace: list[CycleSnapshot]) -> str:
    """Render one lane's trace as a debugger-style listing."""
    lines = []
    for s in trace:
        mark = "!" if s.lane_error else ("." if s.done else " ")
        fl = "".join(c if f else "-" for c, f in zip("leg", s.flags))
        lines.append(
            f"{mark} c{s.cycle:05d} d{s.depth} pc={s.pc:5d} sp={s.sp:5d} "
            f"ergs={s.ergs:10d} [{fl}] ts={s.timestamp:6d}  {s.asm}")
    return "\n".join(lines)
