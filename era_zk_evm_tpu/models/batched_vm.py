"""The flagship model: a batched, branchless, lockstep EraVM interpreter.

One fused cycle-step program advances B independent transaction contexts at
once (SURVEY.md §7 architecture stance).  Where the reference branches, this
computes every opcode family masked and merges by select — the reference's own
decode stage already *masks* instructions into panic/nop instead of branching
(cycle.rs:187-217), which is exactly the SIMD formulation this leans into.

Cycle-step structure mirrors the reference pipeline 1:1 for conformance
(decode → addressing → src read → dispatch → writeback; 4-slot timestamp
discipline), but the dataflow is pure array ops: gathers for code fetch /
table lookup / operand reads, u256 limb kernels for the ALU, scatters for
writebacks, with the two expensive units (512-bit multiply, 256-step divide)
gated behind batch-wide `lax.cond` so their cost is only paid on cycles where
some lane needs them.

Round-1 device subset: NOP/ADD/SUB/MUL/DIV/JUMP/CONTEXT/SHIFT/BINOP/PTR/
NEAR_CALL/RET/UMA(heap+aux+fat-pointer-to-own-pages).  LOG and FAR_CALL raise
`lane_error` (golden model covers them; device support lands with the storage
table + code bank layers).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..isa import params
from ..isa.encoding import (
    exception_revert_encoding, VARIANT_MASK,
)
from ..isa.opcodes import (
    Condition, ContextOp, FarCallOp, LogOp, NOP_VARIANT_INDEX, NUM_VARIANTS,
    Opcode, OperandMode, PANIC_VARIANT_INDEX, PtrOp, RetOp, ShiftOp, UMAOp,
    decode_consts, table_arrays,
)
from ..ops import u256
from .state import CS, BatchedVmState, VmConfig

U32 = jnp.uint32
I32 = jnp.int32
BOOL = jnp.bool_
U16_MASK = jnp.uint32(0xFFFF)
U32_MAX = jnp.uint32(0xFFFFFFFF)

SLOTS_PER_CYCLE = 8  # max memory queries one cycle can emit (see wq block)

_PANIC_ENC = exception_revert_encoding()
assert _PANIC_ENC < (1 << 32)


def _tables():
    arrs = table_arrays()
    return {k: jnp.asarray(v) for k, v in arrs.items()}


def _take(tab, idx):
    """Constant-table lookup as a one-hot sweep (see _gather_rows on why)."""
    oh = jnp.arange(tab.shape[0], dtype=I32)[None, :] == idx.astype(I32)[:, None]
    return jnp.sum(jnp.where(oh, tab[None, :], 0), axis=1)


def _sel(mask, a, b):
    """where with mask broadcast over trailing dims."""
    extra = a.ndim - mask.ndim
    m = mask.reshape(mask.shape + (1,) * extra)
    return jnp.where(m, a, b)


def _onehot(idx, n):
    """[B] indices -> bool[B, n] one-hot (out-of-range rows all-false)."""
    return jnp.arange(n, dtype=I32)[None, :] == idx.astype(I32)[:, None]


def _gather_rows(arr, idx):
    """arr[B, N, ...] gathered at per-lane idx[B] -> [B, ...].

    One-hot compare + reduce instead of a dynamic gather: XLA lowers per-lane
    gathers to a serial per-row loop on TPU (~0.2us x B each, measured), while
    this formulation is a dense bandwidth-bound sweep the VPU vectorizes.
    """
    n = arr.shape[1]
    oh = _onehot(idx, n)
    oh = oh.reshape(oh.shape + (1,) * (arr.ndim - 2))
    if arr.dtype == jnp.bool_:
        return jnp.any(arr & oh, axis=1)
    # where-select instead of multiply-by-onehot: u32 multiplies are
    # multi-op on the VPU and dominate the sweep (measured ~1.5x whole-step)
    return jnp.sum(jnp.where(oh, arr, 0), axis=1)


def _gather_words(arr2d, idx):
    """Word gather from a flat 2D arena [B, W*8] -> [B, 8].

    Arenas are STORED 2D: with a trailing limb dim of 8, XLA's layout
    assignment sometimes materializes whole-arena copies in a {2,1,0}
    (8,128)-tiled layout — 16x padding, gigabytes per copy (measured: a
    [B,256,8] stack became a 4 GB HLO-temp copy at a cond boundary).  A 2D
    [B, W*8] carry keeps boundary layouts sane; the 3D view below lives
    only inside fusions.
    """
    B = arr2d.shape[0]
    return _gather_rows(arr2d.reshape(B, arr2d.shape[1] // 8, 8), idx)


def _scatter_words(arr2d, idx, values, mask):
    """Masked word scatter into a flat 2D arena (see _gather_words)."""
    B = arr2d.shape[0]
    out = _scatter_rows(arr2d.reshape(B, arr2d.shape[1] // 8, 8), idx,
                        values, mask)
    return out.reshape(B, arr2d.shape[1])


def _scatter_rows(arr, idx, values, mask):
    """Masked per-lane row write: arr[b, idx[b]] = values[b] where mask[b].

    Same one-hot trick as _gather_rows, as a full-array select (single sweep).
    """
    n = arr.shape[1]
    oh = _onehot(idx, n) & mask[:, None]
    oh = oh.reshape(oh.shape + (1,) * (arr.ndim - 2))
    vals = values.reshape(values.shape[:1] + (1,) + values.shape[1:])
    return jnp.where(oh, vals, arr)


def _gather_arena(config, arr, idx):
    """u256-word gather from a word arena -> u32[B, 8], under either physical
    layout (state.arena_shape): limb-major [B, 8, W] sweeps the last (lane)
    axis — the pad-free VMEM form the fused Pallas path needs — while
    word-major uses the flat-2D/3D row sweeps."""
    if config.limb_major_arenas:
        oh = _onehot(idx, arr.shape[2])
        return jnp.sum(jnp.where(oh[:, None, :], arr, 0), axis=2)
    if arr.ndim == 2:
        return _gather_words(arr, idx)
    return _gather_rows(arr, idx)


def _scatter_arena(config, arr, idx, values, mask):
    """Masked u256-word scatter into a word arena (see _gather_arena)."""
    if config.limb_major_arenas:
        oh = _onehot(idx, arr.shape[2]) & mask[:, None]
        return jnp.where(oh[:, None, :], values[:, :, None], arr)
    if arr.ndim == 2:
        return _scatter_words(arr, idx, values, mask)
    return _scatter_rows(arr, idx, values, mask)


def _occupancy_cond(enabled: bool, pred, true_fn, false_fn, operand):
    """Batch-occupancy gating for arena sweeps: skips untouched arenas on
    cycles where no lane needs them (a big win for sparse opcode mixes), but
    measurably de-optimizes the rolling-commitment pipeline (the per-slot
    sponge conds stop fusing with cond-produced record values), so callers
    disable it when that mode is on."""
    if not enabled:
        return true_fn(operand)
    return jax.lax.cond(pred, true_fn, false_fn, operand)


def _addr_is_kernel(addr5):
    """uint32[B,5] 160-bit address < 2^16?"""
    high_zero = jnp.all(addr5[:, 1:] == 0, axis=1)
    return (addr5[:, 0] < (1 << 16)) & high_zero


def _addr_to_u256(addr5):
    B = addr5.shape[0]
    return jnp.concatenate(
        [addr5, jnp.zeros((B, 3), dtype=U32)], axis=1)


def _map_stack_index(config: VmConfig, idx):
    """Logical stack index -> physical arena slot + in-window flag.

    With `stack_abs_words` unset the arena maps [0, stack_words) identically.
    Set, it holds two windows — absolutes [0, A) and the SP region
    [sp_base, sp_base + stack_words - A) — so the arena (and every one-hot
    sweep over it) stays small while SP still starts at the architectural
    1024 (isa.params.INITIAL_SP_ON_FAR_CALL).
    """
    if config.stack_abs_words is None:
        return idx, idx < config.stack_words
    a = config.stack_abs_words
    s0 = config.stack_sp_base
    w = config.stack_words - a
    in_abs = idx < a
    in_sp = (idx >= s0) & (idx < s0 + w)
    phys = jnp.where(in_abs, idx, a + (idx - s0))
    return jnp.where(in_abs | in_sp, phys, config.stack_words), in_abs | in_sp


@partial(jax.jit, static_argnames=("config",))
def cycle_step(state: BatchedVmState, config: VmConfig,
               step: jax.Array | int = 0) -> BatchedVmState:
    # the queue-block clock comes from the state itself, not the loop index,
    # so checkpoint/resume keeps positions (`step` is accepted for backward
    # compatibility but unused)
    del step
    step = jnp.min(state.global_step)
    tab = _tables()
    B = config.batch
    D = config.max_depth
    lanes = jnp.arange(B)

    frozen = state.done  # lanes that had already ended: all writes masked off
    active = ~frozen
    lane_error = state.lane_error

    depth = state.depth
    scal = _gather_rows(state.cs_scalars, depth)        # [B, F]
    this_addr = _gather_rows(state.cs_this_address, depth)
    msg_sender = _gather_rows(state.cs_msg_sender, depth)
    code_addr = _gather_rows(state.cs_code_address, depth)
    frame_u128 = _gather_rows(state.cs_context_u128, depth)

    pc = scal[:, CS["pc"]]
    code_page = scal[:, CS["code_page"]]
    ergs0 = scal[:, CS["ergs_remaining"]]
    flags_word = scal[:, CS["flags_word"]]
    is_static = (flags_word & 1).astype(BOOL)
    is_local_frame = ((flags_word >> 1) & 1).astype(BOOL)
    base_page = scal[:, CS["base_memory_page"]]
    heap_bound0 = scal[:, CS["heap_bound"]]
    aux_bound0 = scal[:, CS["aux_heap_bound"]]

    # ------------------------------------------------------------------
    # Fetch (cycle.rs:45-129): super-pc cache + pending-exception override
    # ------------------------------------------------------------------
    pending = state.pending_exception
    super_pc = pc >> 2
    sub_pc = pc & 3
    pages_differ = code_page != state.previous_code_page
    code_read_needed = (~pending) & (pages_differ | (super_pc != state.previous_super_pc))

    # resolve the frame's code page to a code-bank slot (decommit binding)
    cb_match = (state.cb_page == code_page[:, None]) & state.cb_valid  # [B, P]
    code_slot = jnp.sum(jnp.where(
        cb_match, jnp.arange(config.code_pages, dtype=U32)[None, :], 0),
        axis=1)
    code_page_found = jnp.any(cb_match, axis=1)
    fetched = _gather_arena(config, state.code,
                            code_slot * config.code_words + super_pc)
    lane_error = lane_error | (active & code_read_needed
                               & (~code_page_found
                                  | (super_pc >= config.code_words)))

    code_word = _sel(code_read_needed, fetched, state.previous_code_word)
    new_prev_code_word = code_word
    new_prev_super_pc = jnp.where(code_read_needed | pending,
                                  super_pc, state.previous_super_pc)
    new_prev_code_page = code_page  # set unconditionally (cycle.rs:49)

    # instruction at sub_pc: sub_pc 0 = most significant 8 bytes
    lo_idx = (6 - 2 * sub_pc).astype(I32)
    insn_lo = jnp.sum(jnp.where(_onehot(lo_idx, 8), code_word, 0), axis=1)
    insn_hi = jnp.sum(jnp.where(_onehot(lo_idx + 1, 8), code_word, 0), axis=1)
    insn_lo = jnp.where(pending, jnp.uint32(_PANIC_ENC & 0xFFFFFFFF), insn_lo)
    insn_hi = jnp.where(pending, jnp.uint32(_PANIC_ENC >> 32), insn_hi)
    new_pending = jnp.zeros_like(pending)  # cleared when consumed

    # ------------------------------------------------------------------
    # Decode + exception masking (cycle.rs:134-217)
    # ------------------------------------------------------------------
    raw_variant = insn_lo & VARIANT_MASK
    condition = (insn_lo >> 11) & 7
    src0_reg = (insn_lo >> 16) & 0xF
    src1_reg = (insn_lo >> 20) & 0xF
    dst0_reg = (insn_lo >> 24) & 0xF
    dst1_reg = (insn_lo >> 28) & 0xF
    imm0 = insn_hi & U16_MASK
    imm1 = (insn_hi >> 16) & U16_MASK

    # -- arithmetic variant decode (no table gathers; see decode_consts) --
    dc = {k: jnp.asarray(v) for k, v in decode_consts().items()}
    fam16 = jnp.sum((raw_variant[:, None] >= dc["start"][None, :]).astype(U32),
                    axis=1) - 1  # family id; >= NUM_VARIANTS lands on INVALID

    def fam_const(name):
        oh = _onehot(fam16, 16)
        return jnp.sum(jnp.where(oh, dc[name][None, :], 0), axis=1)

    f_start = fam_const("start")
    f_nflags = fam_const("n_flags")
    f_ndst = fam_const("n_dst")
    f_nsrc = fam_const("n_src")
    f_srcbase = fam_const("src_base")
    f_dstbase = fam_const("dst_base")
    rr = raw_variant - f_start
    combo = rr % f_nflags
    rr = rr // f_nflags
    dst_i = rr % f_ndst
    rr = rr // f_ndst
    src_i = rr % f_nsrc
    sub_raw = rr // f_nsrc
    src0_mode_raw = f_srcbase + src_i
    dst0_mode_raw = f_dstbase + dst_i
    flag0_raw = (combo & 1).astype(BOOL)
    flag1_raw = ((combo >> 1) & 1).astype(BOOL)

    OPc = Opcode
    invalid = fam16 == OPc.INVALID
    requires_kernel = ((fam16 == OPc.CONTEXT)
                       & (sub_raw >= ContextOp.SET_CONTEXT_U128)) \
        | ((fam16 == OPc.LOG) & (sub_raw == LogOp.PRECOMPILE_CALL)) \
        | ((fam16 == OPc.FAR_CALL) & (sub_raw == FarCallOp.MIMIC))
    allowed_in_static = ~(
        ((fam16 == OPc.LOG) & (sub_raw >= LogOp.STORAGE_WRITE)
         & (sub_raw <= LogOp.TO_L1_MESSAGE))
        | ((fam16 == OPc.CONTEXT) & (sub_raw == ContextOp.SET_CONTEXT_U128)))

    # price (see isa/opcodes._price)
    rich = ((src0_mode_raw >= OperandMode.FULL_STACK_PUSH_POP)
            & (src0_mode_raw != OperandMode.FULL_IMM16)) \
        | ((dst0_mode_raw >= OperandMode.FULL_STACK_PUSH_POP)
           & (dst0_mode_raw <= OperandMode.FULL_ABS_STACK))
    p = params
    alu_like = (fam16 <= OPc.JUMP) | (fam16 == OPc.SHIFT) \
        | (fam16 == OPc.BINOP) | (fam16 == OPc.PTR)
    price = jnp.where(rich, p.RICH_ADDRESSING_OPCODE_ERGS,
                      p.AVERAGE_OPCODE_ERGS).astype(U32)
    log_prices = jnp.asarray([p.STORAGE_READ_IO_PRICE, p.STORAGE_WRITE_IO_PRICE,
                              p.EVENT_IO_PRICE, p.L1_MESSAGE_IO_PRICE,
                              p.PRECOMPILE_CALL_BASE_PRICE], dtype=np.uint32)
    log_price = jnp.sum(jnp.where(
        _onehot(sub_raw, 5), log_prices[None, :], 0), axis=1)
    price = jnp.where(alu_like | (fam16 == OPc.CONTEXT), price,
            jnp.where(fam16 == OPc.LOG, log_price,
            jnp.where(fam16 == OPc.NEAR_CALL, p.NEAR_CALL_ERGS,
            jnp.where(fam16 == OPc.FAR_CALL, p.FAR_CALL_ERGS,
            jnp.where(fam16 == OPc.RET, p.RET_ERGS,
            jnp.where(fam16 == OPc.UMA, p.UMA_ERGS,
                      jnp.uint32(p.INVALID_OPCODE_ERGS)))))))

    not_enough = ergs0 < price
    ergs1 = jnp.where(not_enough, 0, ergs0 - price)

    is_kernel = _addr_is_kernel(this_addr)
    callstack_full = depth >= params.VM_MAX_STACK_DEPTH
    mask_panic = invalid | not_enough | (requires_kernel & ~is_kernel) \
        | (~allowed_in_static & is_static) | callstack_full

    lt_f, eq_f, gt_f = state.flags[:, 0], state.flags[:, 1], state.flags[:, 2]
    cond_table = jnp.stack([
        jnp.ones_like(lt_f),            # ALWAYS
        gt_f,                           # GT
        lt_f,                           # LT
        eq_f,                           # EQ
        gt_f | eq_f,                    # GE
        lt_f | eq_f,                    # LE
        ~eq_f,                          # NE
        gt_f | lt_f,                    # GT_OR_LT
    ], axis=1)                          # [B, 8]
    cond_met = jnp.any(cond_table & _onehot(condition, 8), axis=1)
    mask_nop = (~cond_met) & (~mask_panic)

    zeroed = mask_panic | mask_nop
    src0_reg = jnp.where(zeroed, 0, src0_reg)
    src1_reg = jnp.where(zeroed, 0, src1_reg)
    dst0_reg = jnp.where(zeroed, 0, dst0_reg)
    dst1_reg = jnp.where(zeroed, 0, dst1_reg)
    imm0 = jnp.where(zeroed, 0, imm0)
    imm1 = jnp.where(zeroed, 0, imm1)

    # apply panic/nop masking to the decoded fields by constant override
    # (panic -> ret.panic reg-only; nop -> nop with FULL_REG addressing)
    def ov(raw_field, panic_const, nop_const):
        return jnp.where(mask_panic, jnp.uint32(panic_const),
                         jnp.where(mask_nop, jnp.uint32(nop_const),
                                   raw_field.astype(U32)))

    opcode = ov(fam16, Opcode.RET, Opcode.NOP)
    sub_variant = ov(sub_raw, RetOp.PANIC, 0)
    src0_mode = ov(src0_mode_raw, OperandMode.REG_ONLY, OperandMode.FULL_REG)
    dst0_mode = ov(dst0_mode_raw, OperandMode.REG_ONLY, OperandMode.FULL_REG)
    vflag0 = flag0_raw & ~zeroed
    vflag1 = flag1_raw & ~zeroed
    set_flags = vflag0 & ((opcode >= Opcode.ADD) & (opcode <= Opcode.DIV)
                          | (opcode == Opcode.SHIFT) | (opcode == Opcode.BINOP))
    swap_operands = (vflag1 & ((opcode == Opcode.SUB) | (opcode == Opcode.DIV)
                               | (opcode == Opcode.SHIFT))) \
        | (vflag0 & (opcode == Opcode.PTR))
    src0_can_ptr = (opcode == Opcode.PTR) | (opcode == Opcode.RET) \
        | (opcode == Opcode.FAR_CALL) \
        | ((opcode == Opcode.UMA) & (sub_variant == UMAOp.FAT_POINTER_READ))
    src1_can_ptr = opcode == Opcode.PTR

    def read_reg(idx):
        # r0 reads as zero: the one-hot of (idx - 1 == -1) selects nothing
        shifted = idx.astype(I32) - 1
        val = _gather_rows(state.regs, shifted)
        tag = _gather_rows(state.reg_ptr, shifted)
        return val, tag

    # ------------------------------------------------------------------
    # Operand addressing (mem_ops.rs:14-125)
    # ------------------------------------------------------------------
    M = OperandMode
    sp0 = scal[:, CS["sp"]]
    src0_reg_val, src0_reg_tag = read_reg(src0_reg)
    vaddr0 = ((src0_reg_val[:, 0] & U16_MASK) + imm0) & U16_MASK
    src0_pushpop = src0_mode == M.FULL_STACK_PUSH_POP
    src0_stack_off = src0_mode == M.FULL_STACK_OFFSET
    src0_abs = src0_mode == M.FULL_ABS_STACK
    src0_code = src0_mode == M.FULL_CODE_PAGE
    sp1 = jnp.where(src0_pushpop, (sp0 - vaddr0) & U16_MASK, sp0)
    src0_loc = jnp.where(src0_pushpop, sp1,
                jnp.where(src0_stack_off, (sp1 - vaddr0) & U16_MASK, vaddr0))
    src0_is_stack_mem = src0_pushpop | src0_stack_off | src0_abs

    dst0_reg_val, _ = read_reg(dst0_reg)
    vaddr1 = ((dst0_reg_val[:, 0] & U16_MASK) + imm1) & U16_MASK
    dst0_pushpop = dst0_mode == M.FULL_STACK_PUSH_POP
    dst0_stack_off = dst0_mode == M.FULL_STACK_OFFSET
    dst0_abs = dst0_mode == M.FULL_ABS_STACK
    sp2 = jnp.where(dst0_pushpop, (sp1 + vaddr1) & U16_MASK, sp1)
    dst0_loc = jnp.where(dst0_pushpop, sp1,
                jnp.where(dst0_stack_off, (sp2 - vaddr1) & U16_MASK, vaddr1))
    dst0_is_stack_mem = dst0_pushpop | dst0_stack_off | dst0_abs

    is_nop_op = opcode == Opcode.NOP
    do_src0_mem_read = (src0_is_stack_mem | src0_code) & ~is_nop_op

    src0_phys, src0_in_window = _map_stack_index(config, src0_loc)
    gate = config.sweep_gating and not config.rolling_commitment
    stack_val, stack_tag = _occupancy_cond(
        gate, jnp.any(do_src0_mem_read & src0_is_stack_mem),
        lambda _: (_gather_arena(config, state.stack, src0_phys),
                   _gather_rows(state.stack_ptr_tag, src0_phys)),
        lambda _: (jnp.zeros((B, 8), dtype=U32), jnp.zeros((B,), dtype=BOOL)),
        None)
    code_val = _occupancy_cond(
        gate, jnp.any(do_src0_mem_read & src0_code),
        lambda _: _gather_arena(config, state.code,
                               code_slot * config.code_words + src0_loc),
        lambda _: jnp.zeros((B, 8), dtype=U32), None)
    lane_error = lane_error | (active & do_src0_mem_read & src0_is_stack_mem
                               & ~src0_in_window)
    lane_error = lane_error | (active & do_src0_mem_read & src0_code
                               & (src0_loc >= config.code_words))

    src0_mem_val = _sel(src0_code, code_val, stack_val)
    src0_mem_tag = jnp.where(src0_code, False, stack_tag) & do_src0_mem_read

    use_reg = (src0_mode == M.REG_ONLY) | (src0_mode == M.FULL_REG) \
        | (src0_mode == M.REG_OR_IMM_REG)
    use_imm = (src0_mode == M.FULL_IMM16) | (src0_mode == M.REG_OR_IMM_IMM)
    src0 = _sel(use_reg, src0_reg_val,
                _sel(use_imm, u256.from_u32_scalar(imm0), src0_mem_val))
    src0_tag = jnp.where(use_reg, src0_reg_tag,
                         jnp.where(use_imm, False, src0_mem_tag))
    src1, src1_tag = read_reg(src1_reg)

    src0, src1 = (_sel(swap_operands, src1, src0),
                  _sel(swap_operands, src0, src1))
    src0_tag, src1_tag = (jnp.where(swap_operands, src1_tag, src0_tag),
                          jnp.where(swap_operands, src0_tag, src1_tag))

    new_pc_lin = (pc + 1) & U16_MASK

    # pointer-taint erasure (cycle.rs:374-396): clear page/start/length limbs
    def erase(val, tag, can_ptr):
        do = tag & ~can_ptr & ~is_kernel
        erased = val.at[:, 1:4].set(0)
        return _sel(do, erased, val), tag & ~do

    src0, src0_tag = erase(src0, src0_tag, src0_can_ptr)
    src1, src1_tag = erase(src1, src1_tag, src1_can_ptr)

    # ==================================================================
    # Opcode semantics (masked, all families)
    # ==================================================================
    OP = Opcode
    is_add = opcode == OP.ADD
    is_sub = opcode == OP.SUB
    is_mul = opcode == OP.MUL
    is_div = opcode == OP.DIV
    is_jump = opcode == OP.JUMP
    is_ctx = opcode == OP.CONTEXT
    is_shift = opcode == OP.SHIFT
    is_binop = opcode == OP.BINOP
    is_ptr = opcode == OP.PTR
    is_near_call = opcode == OP.NEAR_CALL
    is_ret = opcode == OP.RET
    is_uma = opcode == OP.UMA
    is_log = opcode == OP.LOG
    log_enabled = config.storage_slots > 0
    precompile_enabled = config.precompile_keccak_blocks > 0
    unsupported = ((opcode == OP.FAR_CALL) & (not log_enabled)) \
        | (is_log & ((sub_variant == LogOp.PRECOMPILE_CALL)
                     & (not precompile_enabled) | (not log_enabled)))
    lane_error = lane_error | (active & unsupported)

    sum_val, carry = u256.add(src0, src1)
    diff_val, borrow = u256.sub(src0, src1)

    def mul_unit(_):
        return u256.mul_full(src0, src1)

    mul_lo, mul_hi = jax.lax.cond(
        jnp.any(is_mul), mul_unit,
        lambda _: (jnp.zeros_like(src0), jnp.zeros_like(src0)), None)

    def div_unit(_):
        return u256.div_mod(src0, src1)

    div_q, div_r = jax.lax.cond(
        jnp.any(is_div), div_unit,
        lambda _: (jnp.zeros_like(src0), jnp.zeros_like(src0)), None)
    div_by_zero = u256.is_zero(src1)

    shift_amount = src1[:, 0] & 0xFF  # low 8 bits of src1 (shift.rs:44)

    def shift_unit(_):
        n = shift_amount
        res_shl = u256.shl(src0, n)
        res_shr = u256.shr(src0, n)
        res_rol = u256.rol(src0, n)
        res_ror = u256.ror(src0, n)
        s = sub_variant
        return _sel(s == ShiftOp.SHL, res_shl,
               _sel(s == ShiftOp.SHR, res_shr,
               _sel(s == ShiftOp.ROL, res_rol, res_ror)))

    shift_val = jax.lax.cond(jnp.any(is_shift), shift_unit,
                             lambda _: jnp.zeros_like(src0), None)

    binop_val = _sel(sub_variant == 0, src0 ^ src1,
                _sel(sub_variant == 1, src0 & src1, src0 | src1))

    # ---------------- context (context.rs) ----------------
    ctx_sub = sub_variant
    meta = jnp.zeros((B, 8), dtype=U32)
    meta = meta.at[:, 0].set(state.ergs_per_pubdata)
    meta = meta.at[:, 2].set(heap_bound0)
    meta = meta.at[:, 3].set(aux_bound0)
    shard_this = scal[:, CS["shard_ids"]] & 0xFF
    shard_caller = (scal[:, CS["shard_ids"]] >> 8) & 0xFF
    shard_code = (scal[:, CS["shard_ids"]] >> 16) & 0xFF
    meta = meta.at[:, 7].set(shard_this | (shard_caller << 8) | (shard_code << 16))
    u128_as_u256 = jnp.concatenate(
        [frame_u128, jnp.zeros((B, 4), dtype=U32)], axis=1)
    ctx_val = _sel(ctx_sub == ContextOp.THIS, _addr_to_u256(this_addr),
              _sel(ctx_sub == ContextOp.CALLER, _addr_to_u256(msg_sender),
              _sel(ctx_sub == ContextOp.CODE_ADDRESS, _addr_to_u256(code_addr),
              _sel(ctx_sub == ContextOp.META, meta,
              _sel(ctx_sub == ContextOp.ERGS_LEFT, u256.from_u32_scalar(ergs1),
              _sel(ctx_sub == ContextOp.SP, u256.from_u32_scalar(sp2),
                   u128_as_u256))))))
    ctx_writes_dst = is_ctx & (ctx_sub <= ContextOp.GET_CONTEXT_U128)
    ctx_set_u128 = is_ctx & (ctx_sub == ContextOp.SET_CONTEXT_U128)
    ctx_set_pubdata = is_ctx & (ctx_sub == ContextOp.SET_ERGS_PER_PUBDATA_BYTE)
    ctx_inc_tx = is_ctx & (ctx_sub == ContextOp.INCREMENT_TX_NUMBER)

    new_context_u128 = _sel(ctx_set_u128, src0[:, :4], state.context_u128)
    new_ergs_per_pubdata = jnp.where(ctx_set_pubdata, src0[:, 0],
                                     state.ergs_per_pubdata)
    new_tx_number = jnp.where(ctx_inc_tx, (state.tx_number + 1) & U16_MASK,
                              state.tx_number)

    # ---------------- ptr ops (ptr.rs) ----------------
    ptr_sub = sub_variant
    fp_offset = src0[:, 0]
    fp_length = src0[:, 3]
    src1_low32 = src1[:, 0]
    src1_ge_2_32 = jnp.any(src1[:, 1:] != 0, axis=1)
    ptr_basic_panic = is_ptr & (~src0_tag | src1_tag)
    ptr_addsub = is_ptr & (ptr_sub <= PtrOp.SUB)
    ptr_range_panic = ptr_addsub & src1_ge_2_32
    new_off_add = fp_offset + src1_low32
    add_of = new_off_add < fp_offset
    new_off_sub = fp_offset - src1_low32
    sub_uf = fp_offset < src1_low32
    ptr_off_panic = is_ptr & (
        ((ptr_sub == PtrOp.ADD) & add_of) | ((ptr_sub == PtrOp.SUB) & sub_uf))
    src1_low128_nz = jnp.any(src1[:, :4] != 0, axis=1)
    ptr_pack_panic = is_ptr & (ptr_sub == PtrOp.PACK) & src1_low128_nz
    new_len = fp_length - src1_low32
    shrink_uf = fp_length < src1_low32
    ptr_shrink_panic = is_ptr & (ptr_sub == PtrOp.SHRINK) & shrink_uf
    ptr_panic = ptr_basic_panic | ptr_range_panic | ptr_off_panic \
        | ptr_pack_panic | ptr_shrink_panic

    ptr_result = src0
    ptr_result = ptr_result.at[:, 0].set(jnp.where(
        ptr_sub == PtrOp.ADD, new_off_add,
        jnp.where(ptr_sub == PtrOp.SUB, new_off_sub, src0[:, 0])))
    ptr_result = ptr_result.at[:, 3].set(jnp.where(
        ptr_sub == PtrOp.SHRINK, new_len, ptr_result[:, 3]))
    pack_result = jnp.concatenate([src0[:, :4], src1[:, 4:]], axis=1)
    ptr_result = _sel(ptr_sub == PtrOp.PACK, pack_result, ptr_result)
    ptr_writes = is_ptr & ~ptr_panic

    # ---------------- UMA (uma.rs) ----------------
    uma_sub = sub_variant
    uma_is_heap = is_uma & ((uma_sub == UMAOp.HEAP_READ) | (uma_sub == UMAOp.HEAP_WRITE))
    uma_is_aux = is_uma & ((uma_sub == UMAOp.AUX_HEAP_READ) | (uma_sub == UMAOp.AUX_HEAP_WRITE))
    uma_is_ptr_read = is_uma & (uma_sub == UMAOp.FAT_POINTER_READ)
    uma_is_read = is_uma & ((uma_sub == UMAOp.HEAP_READ)
                            | (uma_sub == UMAOp.AUX_HEAP_READ)) | uma_is_ptr_read
    uma_is_write = is_uma & ~uma_is_read
    uma_increment = is_uma & vflag0.astype(BOOL)

    u_offset = src0[:, 0]
    u_page_field = src0[:, 1]
    u_start = src0[:, 2]
    u_length = src0[:, 3]

    heap_page = base_page + 2
    aux_page = base_page + 3
    cur_heap_slot = scal[:, CS["heap_slot"]]

    uma_exc_not_ptr = uma_is_ptr_read & ~src0_tag
    ptr_in_bounds = u_offset < u_length
    uma_skip_oob_ptr = uma_is_ptr_read & ~ptr_in_bounds
    src0_gt_max = jnp.any(src0[:, 1:] != 0, axis=1) \
        | (u_offset > jnp.uint32(params.MAX_OFFSET_TO_DEREF))
    uma_exc_deref = (uma_is_heap | uma_is_aux) & src0_gt_max
    src_byte_off = jnp.where(uma_is_ptr_read, u_start + u_offset, u_offset)

    incremented = u_offset + 32
    increment_of = incremented < u_offset
    uma_exc_incr = is_uma & increment_of

    # heap growth (uma.rs:152-217)
    cur_bound = jnp.where(uma_is_heap, heap_bound0, aux_bound0)
    growth_uf = incremented < cur_bound
    growth = jnp.where(growth_uf, 0, incremented - cur_bound)
    growth = jnp.where(uma_is_heap | uma_is_aux, growth, 0)
    new_heap_bound_u = jnp.where(uma_is_heap & ~growth_uf, incremented, heap_bound0)
    new_aux_bound_u = jnp.where(uma_is_aux & ~growth_uf, incremented, aux_bound0)

    uma_cost = growth * params.MEMORY_GROWTH_ERGS_PER_BYTE
    uma_cost = jnp.where(uma_exc_deref, U32_MAX, uma_cost)
    uma_cost = jnp.where(is_uma, uma_cost, 0)
    uma_no_ergs = ergs1 < uma_cost
    ergs2 = jnp.where(uma_no_ergs, 0, ergs1 - uma_cost)

    uma_set_panic = is_uma & (uma_exc_not_ptr | uma_exc_deref | uma_exc_incr
                              | (is_uma & uma_no_ergs))
    uma_skip_mem = uma_skip_oob_ptr | uma_set_panic

    word0 = (src_byte_off >> 5).astype(U32)
    word1 = word0 + 1
    unalign = src_byte_off & 31
    is_unaligned = unalign != 0

    # arena select: resolve fat-pointer pages through the heap page tables
    # (reachable = any live/extended-lifetime global frame page)
    hp_match = state.hp_page == u_page_field[:, None]   # [B, F]
    ap_match = state.ap_page == u_page_field[:, None]
    ptr_heap_slot = jnp.sum(jnp.where(
        hp_match, jnp.arange(config.heap_frames, dtype=U32)[None, :], 0),
        axis=1)
    ptr_aux_slot = jnp.sum(jnp.where(
        ap_match, jnp.arange(config.heap_frames, dtype=U32)[None, :], 0),
        axis=1)
    ptr_page_is_heap = uma_is_ptr_read & jnp.any(hp_match, axis=1)
    ptr_page_is_aux = uma_is_ptr_read & ~ptr_page_is_heap \
        & jnp.any(ap_match, axis=1)
    lane_error = lane_error | (active & uma_is_ptr_read & ~uma_skip_mem
                               & ~(ptr_page_is_heap | ptr_page_is_aux))
    use_heap_arena = uma_is_heap | ptr_page_is_heap
    use_aux_arena = uma_is_aux | ptr_page_is_aux
    uma_slot = jnp.where(uma_is_ptr_read,
                         jnp.where(ptr_page_is_heap, ptr_heap_slot,
                                   ptr_aux_slot),
                         cur_heap_slot)

    do_mem = is_uma & ~uma_skip_mem
    hw_err = do_mem & use_heap_arena & (word1 >= config.heap_words)
    aw_err = do_mem & use_aux_arena & (word1 >= config.aux_heap_words)
    lane_error = lane_error | (active & (hw_err | aw_err))

    h_base = uma_slot * config.heap_words
    a_base = uma_slot * config.aux_heap_words

    # Four independently occupancy-gated sweeps (heap/aux x aligned/odd
    # word): each full-arena read is the dominant HBM cost of the cycle, so
    # skip any the batch doesn't need this cycle — aligned-only heap traffic
    # (the common case) then pays 1 sweep instead of 4.
    z8 = jnp.zeros((B, 8), dtype=U32)
    gate = config.sweep_gating and not config.rolling_commitment
    need_h = do_mem & use_heap_arena
    need_a = do_mem & use_aux_arena
    w0_heap = _occupancy_cond(
        gate, jnp.any(need_h),
        lambda _: _gather_arena(config, state.heap, h_base + word0),
        lambda _: z8, None)
    w1_heap = _occupancy_cond(
        gate, jnp.any(need_h & is_unaligned),
        lambda _: _gather_arena(config, state.heap, h_base + word1),
        lambda _: z8, None)
    w0_aux = _occupancy_cond(
        gate, jnp.any(need_a),
        lambda _: _gather_arena(config, state.aux_heap, a_base + word0),
        lambda _: z8, None)
    w1_aux = _occupancy_cond(
        gate, jnp.any(need_a & is_unaligned),
        lambda _: _gather_arena(config, state.aux_heap, a_base + word1),
        lambda _: z8, None)
    w0 = _sel(do_mem, _sel(use_heap_arena, w0_heap, w0_aux), z8)
    w1 = _sel(do_mem & is_unaligned,
              _sel(use_heap_arena, w1_heap, w1_aux), z8)

    una_bits = unalign * 8
    read_val = u256.shl(w0, una_bits) | u256.shr(w1, 256 - una_bits)
    # fat-pointer tail cleanup (uma.rs:305-320)
    beyond_uf = incremented < u_length
    beyond = jnp.where(beyond_uf | uma_skip_mem, 0, incremented - u_length) & 31
    bb = beyond * 8
    read_val_ptr = u256.shl(u256.shr(read_val, bb), bb)
    read_val = _sel(uma_is_ptr_read, read_val_ptr, read_val)

    sv = src1
    keep_hi_bits = (32 - unalign) * 8  # word_0_lowest_bytes * 8
    new_w0 = u256.shl(u256.shr(w0, keep_hi_bits), keep_hi_bits) \
        | u256.shr(sv, una_bits)
    new_w1 = u256.shr(u256.shl(w1, una_bits), una_bits) \
        | u256.shl(sv, keep_hi_bits)

    uma_do_write = uma_is_write & ~uma_skip_mem
    uma_do_read_mem = is_uma & ~uma_skip_mem

    incremented_src0 = src0.at[:, 0].set(incremented)

    # ---------------- log family (log.rs) ----------------
    # pubdata ergs accounting first, then the storage/event action; the
    # refund estimate is RefundType::None in the reference testing oracle
    ts_log = state.timestamp + 1
    shard_this_u8 = scal[:, CS["shard_ids"]] & 0xFF
    is_rollup = shard_this_u8 == 0
    log_sub = sub_variant
    l_sread = is_log & (log_sub == LogOp.STORAGE_READ)
    l_swrite = is_log & (log_sub == LogOp.STORAGE_WRITE)
    l_event = is_log & (log_sub == LogOp.EVENT)
    l_tol1 = is_log & (log_sub == LogOp.TO_L1_MESSAGE)
    if log_enabled:
        l_precomp = is_log & (log_sub == LogOp.PRECOMPILE_CALL)
        ergs_on_pubdata = jnp.where(
            l_swrite & is_rollup,
            state.ergs_per_pubdata * params.INITIAL_STORAGE_WRITE_PUBDATA_BYTES,
            jnp.where(l_tol1,
                      state.ergs_per_pubdata * params.L1_MESSAGE_PUBDATA_BYTES,
                      0))
        log_extra_cost = jnp.where(l_precomp, src1[:, 0], 0)
        log_total_cost = ergs_on_pubdata + log_extra_cost
        log_not_enough = log_total_cost > ergs2
        ergs_after_log = jnp.where(is_log & log_not_enough, 0,
                                   ergs2 - jnp.where(is_log, log_total_cost, 0))
        new_spent_pubdata = state.spent_pubdata + jnp.where(
            active & is_log,
            jnp.where(log_not_enough, jnp.minimum(ergs2, ergs_on_pubdata),
                      ergs_on_pubdata),
            0)
        log_skipped = log_not_enough  # write/to_l1 return early w/o querying

        # storage lookup: compare-all over the per-lane KV slots
        key14 = jnp.concatenate([src0, this_addr,
                                 shard_this_u8[:, None]], axis=1)  # [B, 14]
        slot_match = jnp.all(state.st_key == key14[:, None, :], axis=2) \
            & state.st_used                                  # [B, S]
        slot_found = jnp.any(slot_match, axis=1)
        current_val = jnp.sum(jnp.where(
            slot_match[:, :, None], state.st_val, 0), axis=1)

        do_sread = l_sread & active & ~zeroed
        do_swrite = l_swrite & active & ~log_skipped
        do_event = (l_event | l_tol1) & active & ~log_skipped
        do_precomp = l_precomp & active & ~log_skipped

        # write target slot: the match, or a fresh slot at st_count
        fresh_needed = do_swrite & ~slot_found
        fresh_oh = _onehot(state.st_count, config.storage_slots) \
            & fresh_needed[:, None]
        lane_error = lane_error | (fresh_needed
                                   & (state.st_count >= config.storage_slots))
        write_oh = (slot_match & do_swrite[:, None]) | fresh_oh
        new_st_key = jnp.where(fresh_oh[:, :, None], key14[:, None, :],
                               state.st_key)
        new_st_val = jnp.where(write_oh[:, :, None], src1[:, None, :],
                               state.st_val)
        new_st_used = state.st_used | fresh_oh
        new_st_count = state.st_count + fresh_needed.astype(I32)
        write_slot = jnp.sum(jnp.where(
            write_oh, jnp.arange(config.storage_slots, dtype=I32)[None, :],
            0), axis=1)

        # journal append (slot, previous value) for rollback
        j_oh = _onehot(state.j_count, config.journal_slots) & do_swrite[:, None]
        lane_error = lane_error | (do_swrite
                                   & (state.j_count >= config.journal_slots))
        new_j_slot = jnp.where(j_oh, write_slot[:, None], state.j_slot)
        new_j_prev = jnp.where(j_oh[:, :, None], current_val[:, None, :],
                               state.j_prev)
        new_j_count = state.j_count + do_swrite.astype(I32)

        # event journal append
        ev_oh = _onehot(state.ev_count, config.event_slots) & do_event[:, None]
        lane_error = lane_error | (do_event
                                   & (state.ev_count >= config.event_slots))
        aux_byte = jnp.where(l_event, params.EVENT_AUX_BYTE,
                             params.L1_MESSAGE_AUX_BYTE).astype(U32)
        ev_meta_row = jnp.stack(
            [ts_log, aux_byte | (vflag0.astype(U32) << 8)
             | (state.tx_number << 16)], axis=1)
        new_ev_key = jnp.where(ev_oh[:, :, None], src0[:, None, :], state.ev_key)
        new_ev_val = jnp.where(ev_oh[:, :, None], src1[:, None, :], state.ev_val)
        new_ev_meta = jnp.where(ev_oh[:, :, None], ev_meta_row[:, None, :],
                                state.ev_meta)
        new_ev_count = state.ev_count + do_event.astype(I32)

        log_read_result = current_val  # 0 when the key is absent
    else:
        ergs_after_log = ergs2
        new_spent_pubdata = state.spent_pubdata
        new_st_key, new_st_val = state.st_key, state.st_val
        new_st_used, new_st_count = state.st_used, state.st_count
        new_j_slot, new_j_prev, new_j_count = \
            state.j_slot, state.j_prev, state.j_count
        new_ev_key, new_ev_val = state.ev_key, state.ev_val
        new_ev_meta, new_ev_count = state.ev_meta, state.ev_count
        do_sread = jnp.zeros((B,), dtype=BOOL)
        do_swrite = do_event = do_precomp = do_sread
        l_precomp = do_sread
        log_read_result = jnp.zeros((B, 8), dtype=U32)
        current_val = log_read_result
        aux_byte = jnp.zeros((B,), dtype=U32)

    # ---------------- precompile unit (keccak256 / sha256 in-cycle) -------
    # (log.rs:252-328 + DefaultPrecompilesProcessor; ecrecover is round-2)
    pp_write_h = jnp.zeros((B,), dtype=BOOL)
    pp_write_a = jnp.zeros((B,), dtype=BOOL)
    pp_out_val = jnp.zeros((B, 8), dtype=U32)
    pp_out_idx = jnp.zeros((B,), dtype=U32)
    if precompile_enabled and log_enabled:
        MK = config.precompile_keccak_blocks
        MS = max(config.precompile_sha_rounds, 1)
        pp_in_off = src0[:, 0]
        pp_in_len = src0[:, 1]
        pp_out_off = src0[:, 2]
        pp_page_r = jnp.where(src0[:, 4] == 0, heap_page, src0[:, 4])
        pp_page_w = jnp.where(src0[:, 5] == 0, heap_page, src0[:, 5])
        pp_rounds = src0[:, 6]
        addr16 = this_addr[:, 0] & 0xFFFF
        is_keccak_pc = do_precomp & (
            addr16 == params.KECCAK256_ROUND_FUNCTION_PRECOMPILE_ADDRESS)
        is_sha_pc = do_precomp & (
            addr16 == params.SHA256_ROUND_FUNCTION_PRECOMPILE_ADDRESS)
        is_ec_pc = do_precomp & (
            addr16 == params.ECRECOVER_INNER_FUNCTION_PRECOMPILE_ADDRESS) \
            & jnp.bool_(config.precompile_ecrecover)
        pp_any = is_keccak_pc | is_sha_pc | is_ec_pc

        def page_slot(page):
            hm = state.hp_page == page[:, None]
            am = state.ap_page == page[:, None]
            on_h = jnp.any(hm, axis=1)
            on_a = ~on_h & jnp.any(am, axis=1)
            frames_iota = jnp.arange(config.heap_frames, dtype=U32)[None, :]
            slot = jnp.where(
                on_h,
                jnp.sum(jnp.where(hm, frames_iota, 0), axis=1),
                jnp.sum(jnp.where(am, frames_iota, 0), axis=1))
            return on_h, on_a, slot

        r_on_h, r_on_a, r_slot = page_slot(pp_page_r)
        w_on_h, w_on_a, pp_w_slot = page_slot(pp_page_w)
        lane_error = lane_error | (pp_any & ~(r_on_h | r_on_a)) \
            | (pp_any & ~(w_on_h | w_on_a))

        def read_in_word(idx):
            hv = _gather_arena(config, state.heap,
                               r_slot * config.heap_words + idx)
            av = _gather_arena(config, state.aux_heap,
                               r_slot * config.aux_heap_words + idx)
            return _sel(r_on_h, hv, av)

        # ---- keccak256: byte-stream sponge with XOR-padding ----
        kc_blocks = pp_in_len // 136 + 1
        kc_last = kc_blocks * 136 - 1
        lane_error = lane_error | (is_keccak_pc & (kc_blocks > MK))

        def keccak_unit(_):
            lo = [jnp.zeros((B,), U32) for _ in range(25)]
            hi = [jnp.zeros((B,), U32) for _ in range(25)]
            from ..ops.keccak import keccak_f1600 as _perm
            for k in range(MK):
                blk_on = is_keccak_pc & (k < kc_blocks)
                base_byte = pp_in_off + k * 136
                base_word = base_byte >> 5
                window = [read_in_word(base_word + w) for w in range(6)]
                wb = []
                for w in range(6):
                    for j in range(32):  # BE byte j of the 32-byte word
                        limb = window[w][:, 7 - j // 4]
                        wb.append((limb >> (8 * (3 - j % 4))) & 0xFF)
                bytes_arr = jnp.stack(wb, axis=1)          # u32[B, 192]
                sh = base_byte & 31
                aligned = jnp.zeros((B, 136), dtype=U32)
                for s in range(32):
                    aligned = aligned + (sh == s)[:, None].astype(U32) \
                        * bytes_arr[:, s:s + 136]
                g = jnp.arange(136, dtype=U32)[None, :] + k * 136
                data = jnp.where(g < pp_in_len[:, None], aligned, 0)
                blk = data ^ jnp.where(g == pp_in_len[:, None], 0x01, 0) \
                    ^ jnp.where(g == kc_last[:, None], 0x80, 0)
                for l in range(17):
                    lane_lo = sum((blk[:, 8 * l + t] << (8 * t))
                                  for t in range(4))
                    lane_hi = sum((blk[:, 8 * l + t] << (8 * (t - 4)))
                                  for t in range(4, 8))
                    lo[l] = lo[l] ^ jnp.where(blk_on, lane_lo, 0)
                    hi[l] = hi[l] ^ jnp.where(blk_on, lane_hi, 0)
                plo, phi = _perm(lo, hi, unroll=False)
                lo = [jnp.where(blk_on, plo[i], lo[i]) for i in range(25)]
                hi = [jnp.where(blk_on, phi[i], hi[i]) for i in range(25)]
            # digest = LE bytes of lanes 0..3; output word is that BE value
            dbytes = []
            for i in range(32):
                lane_v = lo[i // 8] if (i % 8) < 4 else hi[i // 8]
                dbytes.append((lane_v >> (8 * ((i % 8) % 4))) & 0xFF)
            out = jnp.zeros((B, 8), dtype=U32)
            for j in range(8):
                limb = (dbytes[28 - 4 * j] << 24) | (dbytes[29 - 4 * j] << 16) \
                    | (dbytes[30 - 4 * j] << 8) | dbytes[31 - 4 * j]
                out = out.at[:, j].set(limb)
            return out

        keccak_out = jax.lax.cond(
            jnp.any(is_keccak_pc), keccak_unit,
            lambda _: jnp.zeros((B, 8), dtype=U32), None)

        # ---- sha256 rounds ----
        lane_error = lane_error | (is_sha_pc & (pp_rounds > MS))

        def sha_unit(_):
            from ..ops.sha256 import sha256_compress_batched, sha256_iv
            st8 = sha256_iv(B)
            for k in range(MS):
                r_on = is_sha_pc & (k < pp_rounds)
                w0 = read_in_word(pp_in_off + 2 * k)
                w1 = read_in_word(pp_in_off + 2 * k + 1)
                block16 = jnp.concatenate(
                    [w0[:, ::-1], w1[:, ::-1]], axis=1)  # BE u32 words
                ns = sha256_compress_batched(st8, block16)
                st8 = _sel(r_on, ns, st8)
            return st8[:, ::-1]  # state as one BE u256 word

        sha_out = jax.lax.cond(
            jnp.any(is_sha_pc), sha_unit,
            lambda _: jnp.zeros((B, 8), dtype=U32), None)

        # ---- ecrecover (ops/secp256k1): 4 input words -> 2 output words
        if config.precompile_ecrecover:
            from ..ops.secp256k1 import ecrecover_batched

            ec_digest = read_in_word(pp_in_off + 0)
            ec_v = read_in_word(pp_in_off + 1)[:, 0] & 1
            ec_r = read_in_word(pp_in_off + 2)
            ec_s = read_in_word(pp_in_off + 3)

            def ec_unit(_):
                return ecrecover_batched(ec_digest, ec_v, ec_r, ec_s)

            ec_ok, ec_addr = jax.lax.cond(
                jnp.any(is_ec_pc), ec_unit,
                lambda _: (jnp.zeros((B,), dtype=BOOL),
                           jnp.zeros((B, 8), dtype=U32)), None)
            ec_ok_word = jnp.zeros((B, 8), dtype=U32).at[:, 0].set(
                ec_ok.astype(U32))
        else:
            ec_ok_word = jnp.zeros((B, 8), dtype=U32)
            ec_addr = jnp.zeros((B, 8), dtype=U32)

        pp_out_val = _sel(is_keccak_pc, keccak_out,
                          _sel(is_ec_pc, ec_ok_word, sha_out))
        pp_out_val2 = ec_addr            # second output word (ecrecover only)
        pp_out_idx = pp_out_off
        hw_ok = (pp_out_off + is_ec_pc.astype(U32)) < jnp.where(
            w_on_h, config.heap_words, config.aux_heap_words)
        lane_error = lane_error | (pp_any & ~hw_ok)
        pp_write_h = pp_any & w_on_h & hw_ok & active
        pp_write_a = pp_any & w_on_a & hw_ok & active
        pp_write2_h = pp_write_h & is_ec_pc
        pp_write2_a = pp_write_a & is_ec_pc
        pp_key = src0.at[:, 4].set(pp_page_r).at[:, 5].set(pp_page_w)

        # ---- precompile round-witness queue (mem_in/mem_out streams) ----
        # (reference: add_precompile_call_result hook, helpers.rs:211-221;
        # golden: GoldenPrecompilesProcessor.execute_precompile emission)
        pq_meta, pq_value, pq_flags = state.pq_meta, state.pq_value, state.pq_flags
        pq_count, pq_blocks = state.pq_count, state.pq_blocks
        if config.precompile_queue_capacity > 0:
            from .state import precompile_queue_slots

            PS_IN, PS_OUT = precompile_queue_slots(config)
            PS = PS_IN + PS_OUT
            cap_p = config.precompile_queue_capacity
            blocks0 = jnp.min(pq_blocks)
            p_base = jnp.minimum(blocks0 * PS, cap_p - PS)
            p_overflow = blocks0 * PS > cap_p - PS
            # input words are consecutive from the call's first word
            first_word_q = jnp.where(is_keccak_pc, pp_in_off >> 5, pp_in_off)
            kq_words = jnp.where(
                pp_in_len == 0, 0,
                ((pp_in_off + pp_in_len - 1) >> 5) - (pp_in_off >> 5) + 1)
            n_words = jnp.where(is_keccak_pc, kq_words,
                                jnp.where(is_sha_pc, 2 * pp_rounds,
                                          jnp.uint32(4)))
            rounds_q = jnp.where(is_keccak_pc, kc_blocks,
                                 jnp.where(is_sha_pc, pp_rounds,
                                           jnp.uint32(1)))
            emit = pp_any & ~p_overflow
            lane_error = lane_error | (pp_any & p_overflow) \
                | (emit & (n_words > PS_IN))

            def in_vals_unit(_):
                return jnp.stack(
                    [read_in_word(first_word_q + i) for i in range(PS_IN)],
                    axis=1)

            in_vals = jax.lax.cond(
                jnp.any(emit), in_vals_unit,
                lambda _: jnp.zeros((B, PS_IN, 8), dtype=U32), None)

            ts_pread = ts_log            # reads at +1 (first decommit/pc read)
            ts_pwrite = ts_log + 1       # writes at +2
            meta_rows, val_rows, flag_rows = [], [], []
            for i in range(PS_IN):
                v = emit & (i < n_words)
                meta_rows.append(jnp.stack(
                    [jnp.where(v, ts_pread, 0),
                     jnp.where(v, jnp.uint32(3), 0),       # FAT_POINTER
                     jnp.where(v, pp_page_r, 0),
                     jnp.where(v, first_word_q + i, 0)], axis=1))
                val_rows.append(jnp.where(v[:, None], in_vals[:, i], 0))
                flag_rows.append(v.astype(U32) << 2)
            out_specs = [(emit, pp_out_idx, pp_out_val, True)]
            if PS_OUT == 2:
                out_specs.append((emit & is_ec_pc, pp_out_idx + 1,
                                  pp_out_val2, False))
            for v, oidx, oval, first_out in out_specs:
                meta_rows.append(jnp.stack(
                    [jnp.where(v, ts_pwrite, 0),
                     jnp.where(v, jnp.uint32(1), 0),       # HEAP
                     jnp.where(v, pp_page_w, 0),
                     jnp.where(v, oidx, 0)], axis=1))
                val_rows.append(jnp.where(v[:, None], oval, 0))
                fl = v.astype(U32) | (v.astype(U32) << 2)
                if first_out:  # rounds witness rides on the first out slot
                    fl = fl | jnp.where(v, rounds_q << 3, 0)
                flag_rows.append(fl)
            pq_meta = jax.lax.dynamic_update_slice(
                pq_meta, jnp.stack(meta_rows, axis=1), (0, p_base, 0))
            pq_value = jax.lax.dynamic_update_slice(
                pq_value, jnp.stack(val_rows, axis=1), (0, p_base, 0))
            pq_flags = jax.lax.dynamic_update_slice(
                pq_flags, jnp.stack(flag_rows, axis=1), (0, p_base))
            n_out = 1 + (emit & is_ec_pc).astype(I32) if PS_OUT == 2 else 1
            pq_count = pq_count + jnp.where(
                emit, n_words.astype(I32) + n_out, 0)
            pq_blocks = pq_blocks + jnp.any(pp_any).astype(I32)
    else:
        pp_key = src0
        pq_meta, pq_value, pq_flags = state.pq_meta, state.pq_value, state.pq_flags
        pq_count, pq_blocks = state.pq_count, state.pq_blocks

    # ---------------- near call (near_call.rs) ----------------
    nc_abi = src0[:, 0]
    nc_pass_all = (nc_abi == 0) | (nc_abi > ergs_after_log)
    nc_passed = jnp.where(nc_pass_all, ergs_after_log, nc_abi)
    nc_left = jnp.where(nc_pass_all, 0, ergs_after_log - nc_abi)

    # ---------------- ret (ret.rs) ----------------
    ret_sub = sub_variant
    ret_is_panic0 = is_ret & (ret_sub == RetOp.PANIC)
    ret_src0 = _sel(ret_is_panic0, jnp.zeros_like(src0), src0)
    ret_src0_tag = src0_tag & ~ret_is_panic0
    r_off = ret_src0[:, 0]
    r_page = ret_src0[:, 1]
    r_start = ret_src0[:, 2]
    r_len = ret_src0[:, 3]
    r_mode = (ret_src0[:, 7] >> 8) & 0xFF
    r_mode = jnp.where(r_mode > 2, 0, r_mode)
    r_fwd = r_mode == 1      # ForwardFatPointer
    r_use_aux = r_mode == 2

    nonlocal_ret = is_ret & ~is_local_frame
    rp_not_ptr = r_fwd & ~ret_src0_tag
    rp_back_fwd = r_fwd & (r_page < base_page)
    # start+length overflow over u32 (DEREF_BEYOND_HEAP_RANGE)
    r_sl = r_start + r_len
    r_deref_exc = r_sl < r_start
    r_off_exc = (~r_fwd) & (r_off != 0)
    rp_validation = r_deref_exc | r_off_exc
    rp_slice = r_off > r_len
    ret_panic1 = nonlocal_ret & (rp_not_ptr | rp_back_fwd | rp_validation | rp_slice)
    ret_escalated = (is_ret & (ret_sub == RetOp.PANIC)) | ret_panic1
    # masked pointer for panic
    z32 = jnp.zeros_like(r_off)
    r_off = jnp.where(ret_escalated, z32, r_off)
    r_page = jnp.where(ret_escalated, z32, r_page)
    r_start = jnp.where(ret_escalated, z32, r_start)
    r_len = jnp.where(ret_escalated, z32, r_len)
    # forwarding resolution (non-local, Ok|Revert)
    apply_fwd = nonlocal_ret & ~ret_escalated
    r_start = jnp.where(apply_fwd & r_fwd, r_start + r_off, r_start)
    r_len = jnp.where(apply_fwd & r_fwd, r_len - r_off, r_len)
    r_off = jnp.where(apply_fwd & r_fwd, 0, r_off)
    r_page = jnp.where(apply_fwd & ~r_fwd,
                       jnp.where(r_use_aux, aux_page, heap_page), r_page)
    # growth payment (non-local, non-forward)
    r_upper = r_start + r_len
    r_upper = jnp.where(nonlocal_ret & r_deref_exc, U32_MAX, r_upper)
    r_bound = jnp.where(r_use_aux, aux_bound0, heap_bound0)
    r_growth_uf = r_upper < r_bound
    r_growth = jnp.where(r_growth_uf, 0, r_upper - r_bound)
    r_growth = jnp.where(nonlocal_ret & ~r_fwd, r_growth, 0)
    r_cost = r_growth * params.MEMORY_GROWTH_ERGS_PER_BYTE
    r_no_ergs = ergs_after_log < r_cost
    ergs3 = jnp.where(is_ret & ~r_no_ergs,
                      ergs_after_log - jnp.where(is_ret, r_cost, 0),
                      jnp.where(is_ret & r_no_ergs, 0, ergs_after_log))
    ret_panic2 = nonlocal_ret & r_no_ergs
    ret_final_panic = ret_escalated | ret_panic2
    r_off = jnp.where(ret_panic2, 0, r_off)
    r_page = jnp.where(ret_panic2, 0, r_page)
    r_start = jnp.where(ret_panic2, 0, r_start)
    r_len = jnp.where(ret_panic2, 0, r_len)
    ret_panicked = is_ret & ((ret_sub == RetOp.REVERT) | ret_final_panic)
    is_to_label = is_ret & vflag0.astype(BOOL)

    returndata_u256 = jnp.zeros((B, 8), dtype=U32)
    returndata_u256 = returndata_u256.at[:, 0].set(r_off)
    returndata_u256 = returndata_u256.at[:, 1].set(r_page)
    returndata_u256 = returndata_u256.at[:, 2].set(r_start)
    returndata_u256 = returndata_u256.at[:, 3].set(r_len)

    # ---------------- far call (far_call.rs:35-613) ----------------
    is_far_call = (opcode == OP.FAR_CALL) & jnp.bool_(log_enabled)
    fc_sub = sub_variant
    fc_delegate = is_far_call & (fc_sub == 1)
    fc_mimic = is_far_call & (fc_sub == 2)

    fc_addr5 = src1[:, :5]
    fc_dst_kernel = _addr_is_kernel(fc_addr5)
    fc_off, fc_page_f = src0[:, 0], src0[:, 1]
    fc_start, fc_len = src0[:, 2], src0[:, 3]
    fc_ergs_abi = src0[:, 6]
    fc_shard_abi = src0[:, 7] & 0xFF
    fc_mode = (src0[:, 7] >> 8) & 0xFF
    fc_mode = jnp.where(fc_mode > 2, 0, fc_mode)
    fc_ctor = (((src0[:, 7] >> 16) & 0xFF) != 0) & is_kernel
    fc_to_system = (((src0[:, 7] >> 24) & 0xFF) != 0) & fc_dst_kernel
    fc_static_flag = vflag0
    fc_shard_flag = vflag1

    fc_code_shard = jnp.where(fc_shard_flag, fc_shard_abi, shard_this_u8)
    fc_this_shard = jnp.where(fc_delegate, shard_this_u8, fc_code_shard)
    fc_new_base = state.page_counter

    # code-hash storage read (skipped for unavailable-shard trivial mapping)
    fc_trivial = fc_code_shard != 0  # zkporter unavailable in this build
    fc_do_sread = is_far_call & active & ~fc_trivial
    if log_enabled:
        deployer5 = jnp.zeros((B, 5), dtype=U32) \
            .at[:, 0].set(params.DEPLOYER_SYSTEM_CONTRACT_ADDRESS)
        fc_key14 = jnp.concatenate(
            [_addr_to_u256(fc_addr5), deployer5, fc_code_shard[:, None]], axis=1)
        fc_slot_match = jnp.all(new_st_key == fc_key14[:, None, :], axis=2) \
            & new_st_used
        fc_hash_storage = jnp.sum(jnp.where(
            fc_slot_match[:, :, None], new_st_val, 0), axis=1)
    else:
        fc_hash_storage = jnp.zeros((B, 8), dtype=U32)
    fc_hash_storage = _sel(fc_trivial, jnp.zeros((B, 8), dtype=U32),
                           fc_hash_storage)
    # default-AA masking for empty slots of user-space targets
    fc_mask_aa = u256.is_zero(fc_hash_storage) & ~fc_dst_kernel & ~fc_trivial
    fc_hash_raw = _sel(fc_mask_aa, state.default_aa_hash, fc_hash_storage)

    # versioned-hash validation (BE byte layout lives in limb 7)
    h7 = fc_hash_raw[:, 7]
    vh_ok = (h7 >> 24) == params.CODE_HASH_VERSION_BYTE
    vh_marker = (h7 >> 16) & 0xFF
    vh_len = h7 & 0xFFFF
    marker_rest = vh_marker == params.CODE_AT_REST_MARKER
    marker_ctor = vh_marker == params.YET_CONSTRUCTED_MARKER
    marker_valid = marker_rest | marker_ctor
    can_plain = ~fc_ctor & marker_rest
    can_ctor = fc_ctor & marker_ctor
    callable_direct = vh_ok & marker_valid & (can_plain | can_ctor)
    # degraded path: valid-format but wrong calling mode, user-space target
    degrade_aa = vh_ok & marker_valid & ~(can_plain | can_ctor) & ~fc_dst_kernel
    aa7 = state.default_aa_hash[:, 7]
    fcx_bad_hash = ~vh_ok | (vh_ok & ~marker_valid)
    fcx_ctor_system = vh_ok & marker_valid & ~(can_plain | can_ctor) \
        & fc_dst_kernel
    stored_hash = fc_hash_raw.at[:, 7].set(
        (h7 & jnp.uint32(0xFF00FFFF)))  # marker byte -> at rest
    fc_code_hash = _sel(callable_direct, stored_hash,
                        _sel(degrade_aa, state.default_aa_hash,
                             jnp.zeros((B, 8), dtype=U32)))
    fc_code_len = jnp.where(callable_direct, vh_len,
                            jnp.where(degrade_aa, aa7 & 0xFFFF, 0))

    # ABI quasi-pointer validation + forwarding (as in ret, but vs caller)
    fc_fwd = fc_mode == 1
    fc_use_aux = fc_mode == 2
    fcx_not_ptr = fc_fwd & ~src0_tag
    fc_sl = fc_start + fc_len
    fcx_deref = fc_sl < fc_start
    fcx_off = (~fc_fwd) & (fc_off != 0)
    fcx_slice = fc_off > fc_len
    fcx_malformed = fcx_deref | fcx_off | fcx_slice
    fc_exc0 = is_far_call & (fcx_bad_hash | fcx_ctor_system | fcx_not_ptr
                             | fcx_malformed)
    # forwarding resolution
    fc_start2 = jnp.where(fc_fwd, fc_start + fc_off, fc_start)
    fc_len2 = jnp.where(fc_fwd, fc_len - fc_off, fc_len)
    fc_off2 = jnp.where(fc_fwd, 0, fc_off)
    fc_page2 = jnp.where(fc_fwd, fc_page_f,
                         jnp.where(fc_use_aux, aux_page, heap_page))
    zero_fp = fc_exc0
    fc_off2 = jnp.where(zero_fp, 0, fc_off2)
    fc_page2 = jnp.where(zero_fp, 0, fc_page2)
    fc_start2 = jnp.where(zero_fp, 0, fc_start2)
    fc_len2 = jnp.where(zero_fp, 0, fc_len2)

    # memory-growth payment against the CALLER frame bounds
    fc_upper = fc_start2 + fc_len2
    fc_upper = jnp.where(is_far_call & fcx_deref, U32_MAX, fc_upper)
    fc_bound = jnp.where(fc_use_aux, aux_bound0, heap_bound0)
    fc_growth_uf = fc_upper < fc_bound
    fc_growth = jnp.where(fc_growth_uf | fc_fwd, 0, fc_upper - fc_bound)
    fc_bound_update = is_far_call & ~fc_fwd & ~fc_growth_uf
    fc_new_heap_bound = jnp.where(fc_bound_update & ~fc_use_aux, fc_upper,
                                  heap_bound0)
    fc_new_aux_bound = jnp.where(fc_bound_update & fc_use_aux, fc_upper,
                                 aux_bound0)
    fc_cost_growth = jnp.where(is_far_call, fc_growth, 0) \
        * params.MEMORY_GROWTH_ERGS_PER_BYTE
    fc_no_ergs_grow = ergs_after_log < fc_cost_growth
    fc_exc1 = fc_exc0 | (is_far_call & fc_no_ergs_grow)
    fc_ergs_a = jnp.where(fc_no_ergs_grow, 0, ergs_after_log - fc_cost_growth)

    fc_cost_decommit = params.ERGS_PER_CODE_WORD_DECOMMITTMENT * fc_code_len
    fc_no_ergs_dec = fc_ergs_a < fc_cost_decommit
    fc_exc = fc_exc1 | (is_far_call & fc_no_ergs_dec)
    fc_ergs_b = jnp.where(fc_no_ergs_dec, fc_ergs_a,
                          fc_ergs_a - fc_cost_decommit)

    # decommit: bind a pre-staged code-bank slot to the candidate page
    fc_do_decommit = is_far_call & active & ~fc_exc
    bank_match = jnp.all(state.cb_hash == fc_code_hash[:, None, :], axis=2) \
        & state.cb_valid
    bank_found = jnp.any(bank_match, axis=1)
    # unknown code hash is the VM's single hard error (decommitter.rs:50-56)
    lane_error = lane_error | (fc_do_decommit & ~bank_found)
    bank_slot_idx = jnp.sum(jnp.where(
        bank_match, jnp.arange(config.code_pages, dtype=U32)[None, :], 0),
        axis=1)
    bound_page = jnp.sum(jnp.where(bank_match, state.cb_page, 0), axis=1)
    fc_fresh = bound_page == 0
    fc_code_page = jnp.where(fc_fresh, fc_new_base, bound_page)
    bind_oh = bank_match & (fc_do_decommit & fc_fresh)[:, None]
    new_cb_page = jnp.where(bind_oh, fc_new_base[:, None], state.cb_page)
    # repeat decommit refunds the decommit cost (far_call.rs:450-453)
    fc_ergs_c = jnp.where(fc_do_decommit & ~fc_fresh,
                          fc_ergs_b + fc_cost_decommit, fc_ergs_b)
    fc_code_page = jnp.where(fc_exc, params.UNMAPPED_PAGE, fc_code_page)

    # 63/64 rule
    fc_max_passable = (fc_ergs_c // 64) * 63
    fc_leftover = fc_ergs_c - fc_max_passable
    fc_want = fc_ergs_abi
    fc_over = fc_want > fc_max_passable
    fc_passed = jnp.where(fc_over, fc_max_passable, fc_want)
    fc_left = jnp.where(fc_over, fc_leftover,
                        fc_leftover + fc_max_passable - fc_want)

    # addresses / context for the callee frame
    r15_val, _ = read_reg(jnp.full((B,), 15, dtype=U32))
    mimic_sender5 = r15_val[:, :5]
    fc_next_this = _sel(fc_delegate, this_addr, fc_addr5)
    fc_next_sender = _sel(fc_delegate, msg_sender,
                          _sel(fc_mimic, mimic_sender5, this_addr))
    fc_next_u128 = _sel(fc_delegate, frame_u128, state.context_u128)

    fc_heap_slot = state.frame_count
    lane_error = lane_error | (is_far_call & active
                               & (fc_heap_slot >= config.heap_frames))

    # ==================================================================
    # Flags writeback
    # ==================================================================
    add_eq = u256.is_zero(sum_val)
    sub_eq = u256.is_zero(diff_val)
    mul_of = ~u256.is_zero(mul_hi)
    mul_eq = u256.is_zero(mul_lo)
    div_eq = u256.is_zero(div_q)
    div_gt = u256.is_zero(div_r)
    shift_eq = u256.is_zero(shift_val)
    binop_eq = u256.is_zero(binop_val)

    new_lt = jnp.zeros((B,), dtype=BOOL)
    new_eq = jnp.zeros((B,), dtype=BOOL)
    new_gt = jnp.zeros((B,), dtype=BOOL)
    cb = carry.astype(BOOL)
    bb_ = borrow.astype(BOOL)
    new_lt = jnp.where(is_add, cb, jnp.where(is_sub, bb_, new_lt))
    new_eq = jnp.where(is_add, add_eq, jnp.where(is_sub, sub_eq, new_eq))
    new_gt = jnp.where(is_add, ~add_eq & ~cb,
             jnp.where(is_sub, ~sub_eq & ~bb_, new_gt))
    new_lt = jnp.where(is_mul, mul_of, new_lt)
    new_eq = jnp.where(is_mul, mul_eq, new_eq)
    new_gt = jnp.where(is_mul, ~mul_of & ~mul_eq, new_gt)
    new_lt = jnp.where(is_div, div_by_zero, new_lt)
    new_eq = jnp.where(is_div, div_eq & ~div_by_zero, new_eq)
    new_gt = jnp.where(is_div, div_gt & ~div_by_zero, new_gt)
    new_eq = jnp.where(is_shift, shift_eq, new_eq)
    new_lt = jnp.where(is_shift | is_binop, False, new_lt)
    new_gt = jnp.where(is_shift | is_binop, False, new_gt)
    new_eq = jnp.where(is_binop, binop_eq, new_eq)

    writes_flags = (set_flags & (is_add | is_sub | is_mul | is_div
                                 | is_shift | is_binop))
    resets_flags = is_near_call | is_ret | is_far_call
    ret_sets_lt = is_ret & ret_final_panic

    flags_lt = jnp.where(writes_flags, new_lt,
               jnp.where(resets_flags, ret_sets_lt, lt_f))
    flags_eq = jnp.where(writes_flags, new_eq,
               jnp.where(resets_flags, False, eq_f))
    flags_gt = jnp.where(writes_flags, new_gt,
               jnp.where(resets_flags, False, gt_f))
    new_flags = jnp.stack([flags_lt, flags_eq, flags_gt], axis=1)

    # ==================================================================
    # dst0 / dst1 selection
    # ==================================================================
    dst0_val = jnp.zeros((B, 8), dtype=U32)
    dst0_val = _sel(is_add, sum_val, dst0_val)
    dst0_val = _sel(is_sub, diff_val, dst0_val)
    dst0_val = _sel(is_mul, mul_lo, dst0_val)
    dst0_val = _sel(is_div, _sel(div_by_zero, jnp.zeros_like(div_q), div_q),
                    dst0_val)
    dst0_val = _sel(is_shift, shift_val, dst0_val)
    dst0_val = _sel(is_binop, binop_val, dst0_val)
    dst0_val = _sel(is_ctx, ctx_val, dst0_val)
    dst0_val = _sel(ptr_writes, ptr_result, dst0_val)
    dst0_val = _sel(uma_is_read & is_uma, read_val, dst0_val)
    dst0_val = _sel(uma_is_write & uma_increment,
                    incremented_src0, dst0_val)
    dst0_val = _sel(do_sread, log_read_result, dst0_val)
    precomp_one = jnp.zeros((B, 8), dtype=U32).at[:, 0].set(
        do_precomp.astype(U32))
    dst0_val = _sel(l_precomp & active, precomp_one, dst0_val)
    dst0_is_ptr = ptr_writes  # only ptr ops produce tagged dst0 here

    dst0_write = is_add | is_sub | is_mul | is_div | is_shift | is_binop \
        | ctx_writes_dst | ptr_writes | do_sread | (l_precomp & active) \
        | (uma_is_read & ~uma_set_panic) \
        | (uma_is_write & uma_increment & ~uma_set_panic)

    dst1_val = jnp.zeros((B, 8), dtype=U32)
    dst1_val = _sel(is_mul, mul_hi, dst1_val)
    dst1_val = _sel(is_div, _sel(div_by_zero, jnp.zeros_like(div_r), div_r),
                    dst1_val)
    dst1_val = _sel(uma_is_read & uma_increment, incremented_src0, dst1_val)
    dst1_is_ptr = uma_is_read & uma_increment & src0_tag
    dst1_write = is_mul | is_div \
        | (uma_is_read & uma_increment & ~uma_set_panic)

    # pending exception accumulation (shorthand panics)
    new_pending = new_pending | (ptr_basic_panic | ptr_range_panic
                                 | ptr_off_panic | ptr_pack_panic
                                 | ptr_shrink_panic) & is_ptr
    new_pending = new_pending | uma_set_panic
    new_pending = new_pending | (is_far_call & fc_exc)

    # ==================================================================
    # PC resolution + frame machinery
    # ==================================================================
    cur_pc_new = new_pc_lin
    cur_pc_new = jnp.where(is_jump, src0[:, 0] & U16_MASK, cur_pc_new)
    # near_call: caller's saved pc = new_pc (set below as current update,
    # then the pushed frame's pc = imm0)

    # ---- current frame update (applies to all lanes; dead for ret lanes)
    cur_scal = scal
    cur_scal = cur_scal.at[:, CS["pc"]].set(cur_pc_new)
    cur_scal = cur_scal.at[:, CS["sp"]].set(sp2)
    cur_ergs_final = jnp.where(is_near_call, nc_left,
                      jnp.where(is_far_call, fc_left,
                      jnp.where(is_ret, 0, ergs3)))
    cur_scal = cur_scal.at[:, CS["ergs_remaining"]].set(cur_ergs_final)
    cur_scal = cur_scal.at[:, CS["heap_bound"]].set(
        jnp.where(is_uma, new_heap_bound_u,
                  jnp.where(is_far_call, fc_new_heap_bound, heap_bound0)))
    cur_scal = cur_scal.at[:, CS["aux_heap_bound"]].set(
        jnp.where(is_uma, new_aux_bound_u,
                  jnp.where(is_far_call, fc_new_aux_bound, aux_bound0)))

    new_cs_scalars = _scatter_rows(state.cs_scalars, depth, cur_scal, active)

    # ---- push (near call / far call)
    push_mask = (is_near_call | is_far_call) & active
    pushed = cur_scal
    pushed = pushed.at[:, CS["pc"]].set(jnp.where(is_far_call, 0, imm0))
    pushed = pushed.at[:, CS["exception_handler"]].set(
        jnp.where(is_far_call, imm0, imm1))
    pushed = pushed.at[:, CS["ergs_remaining"]].set(
        jnp.where(is_far_call, fc_passed, nc_passed))
    pushed = pushed.at[:, CS["flags_word"]].set(
        jnp.where(is_far_call,
                  (is_static.astype(U32) | fc_static_flag.astype(U32)),
                  flags_word | 2))  # far: static only; near: is_local
    pushed = pushed.at[:, CS["journal_snapshot"]].set(new_j_count.astype(U32))
    pushed = pushed.at[:, CS["event_snapshot"]].set(new_ev_count.astype(U32))
    pushed = pushed.at[:, CS["base_memory_page"]].set(
        jnp.where(is_far_call, fc_new_base, base_page))
    pushed = pushed.at[:, CS["code_page"]].set(
        jnp.where(is_far_call, fc_code_page, code_page))
    pushed = pushed.at[:, CS["sp"]].set(
        jnp.where(is_far_call, params.INITIAL_SP_ON_FAR_CALL, sp2))
    pushed = pushed.at[:, CS["shard_ids"]].set(
        jnp.where(is_far_call,
                  fc_this_shard | (shard_this_u8 << 8) | (fc_code_shard << 16),
                  scal[:, CS["shard_ids"]]))
    pushed = pushed.at[:, CS["heap_bound"]].set(
        jnp.where(is_far_call, params.NEW_FRAME_MEMORY_STIPEND,
                  pushed[:, CS["heap_bound"]]))
    pushed = pushed.at[:, CS["aux_heap_bound"]].set(
        jnp.where(is_far_call, params.NEW_FRAME_MEMORY_STIPEND,
                  pushed[:, CS["aux_heap_bound"]]))
    pushed = pushed.at[:, CS["heap_slot"]].set(
        jnp.where(is_far_call, fc_heap_slot.astype(U32),
                  pushed[:, CS["heap_slot"]]))
    push_idx = jnp.minimum(depth + 1, D - 1)
    lane_error = lane_error | (active & push_mask & (depth + 1 >= D))
    new_cs_scalars = _scatter_rows(new_cs_scalars, push_idx, pushed, push_mask)
    push_this = _sel(is_far_call, fc_next_this, this_addr)
    push_sender = _sel(is_far_call, fc_next_sender, msg_sender)
    push_code_addr = _sel(is_far_call, fc_addr5, code_addr)
    push_u128 = _sel(is_far_call, fc_next_u128, frame_u128)
    new_cs_this = _scatter_rows(state.cs_this_address, push_idx, push_this, push_mask)
    new_cs_sender = _scatter_rows(state.cs_msg_sender, push_idx, push_sender, push_mask)
    new_cs_code = _scatter_rows(state.cs_code_address, push_idx, push_code_addr, push_mask)
    new_cs_u128 = _scatter_rows(state.cs_context_u128, push_idx, push_u128, push_mask)
    # context register is consumed by the call (far_call.rs:558)
    new_context_u128 = _sel(is_far_call & active,
                            jnp.zeros((B, 4), dtype=U32), new_context_u128)
    # heap-slot allocation + page tables + page counter
    new_frame_count = state.frame_count + (is_far_call & active).astype(I32)
    slot_oh_fc = _onehot(fc_heap_slot.astype(I32), config.heap_frames) \
        & (is_far_call & active)[:, None]
    new_hp_page = jnp.where(slot_oh_fc, (fc_new_base + 2)[:, None],
                            state.hp_page)
    new_ap_page = jnp.where(slot_oh_fc, (fc_new_base + 3)[:, None],
                            state.ap_page)
    new_page_counter = state.page_counter + jnp.where(
        is_far_call & active, params.NEW_MEMORY_PAGES_PER_FAR_CALL, 0)

    # ---- pop (ret): update the parent frame
    pop_mask = is_ret & active
    parent_idx = jnp.maximum(depth - 1, 0)
    parent_scal = _gather_rows(new_cs_scalars, parent_idx)
    p_ergs = parent_scal[:, CS["ergs_remaining"]] + ergs3
    parent_scal = parent_scal.at[:, CS["ergs_remaining"]].set(p_ergs)
    label_jump = is_to_label & is_local_frame
    p_pc = parent_scal[:, CS["pc"]]
    p_pc = jnp.where(label_jump, imm0,
            jnp.where(ret_panicked, scal[:, CS["exception_handler"]], p_pc))
    parent_scal = parent_scal.at[:, CS["pc"]].set(p_pc)
    # local frames propagate heap bounds up
    loc = is_local_frame
    parent_scal = parent_scal.at[:, CS["heap_bound"]].set(
        jnp.where(loc, jnp.where(is_uma, new_heap_bound_u, heap_bound0),
                  parent_scal[:, CS["heap_bound"]]))
    parent_scal = parent_scal.at[:, CS["aux_heap_bound"]].set(
        jnp.where(loc, jnp.where(is_uma, new_aux_bound_u, aux_bound0),
                  parent_scal[:, CS["aux_heap_bound"]]))
    new_cs_scalars = _scatter_rows(new_cs_scalars, parent_idx, parent_scal, pop_mask)

    # ---- storage rollback + event cancel for panicked frame pops
    # (reference: storage.rs:156-181 value replay; event_sink.rs:154-175)
    if log_enabled:
        j_snap = scal[:, CS["journal_snapshot"]].astype(I32)
        ev_snap = scal[:, CS["event_snapshot"]].astype(I32)
        panic_pop = pop_mask & ret_panicked

        def replay_cond(carry):
            _, idx = carry
            return jnp.any(panic_pop & (idx > j_snap))

        def replay_body(carry):
            st_val, idx = carry
            lane_on = panic_pop & (idx > j_snap)
            e = jnp.maximum(idx - 1, 0)
            entry_oh = _onehot(e, config.journal_slots) & lane_on[:, None]
            slot = jnp.sum(jnp.where(entry_oh, new_j_slot, 0), axis=1)
            prev = jnp.sum(jnp.where(entry_oh[:, :, None], new_j_prev, 0),
                           axis=1)
            slot_oh = _onehot(slot, config.storage_slots) & lane_on[:, None]
            st_val = jnp.where(slot_oh[:, :, None], prev[:, None, :], st_val)
            return st_val, idx - lane_on.astype(I32)

        new_st_val, _ = jax.lax.while_loop(
            replay_cond, replay_body, (new_st_val, new_j_count))
        new_j_count = jnp.where(panic_pop, j_snap, new_j_count)
        ev_pos = jnp.arange(config.event_slots, dtype=I32)[None, :]
        cancel = panic_pop[:, None] & (ev_pos >= ev_snap[:, None]) \
            & (ev_pos < new_ev_count[:, None])
        new_ev_cancelled = state.ev_cancelled | cancel
    else:
        new_ev_cancelled = state.ev_cancelled

    new_depth = depth + push_mask.astype(I32) - pop_mask.astype(I32)
    new_depth = jnp.maximum(new_depth, 0)
    new_done = new_depth == 0

    # ==================================================================
    # Register writebacks
    # ==================================================================
    dst0_to_reg = dst0_write & ~dst0_is_stack_mem & (dst0_reg > 0) & active
    new_regs = _scatter_rows(state.regs, jnp.maximum(dst0_reg.astype(I32) - 1, 0),
                             dst0_val, dst0_to_reg)
    new_reg_ptr = _scatter_rows(state.reg_ptr,
                                jnp.maximum(dst0_reg.astype(I32) - 1, 0),
                                dst0_is_ptr, dst0_to_reg)

    dst1_to_reg = dst1_write & (dst1_reg > 0) & active
    new_regs = _scatter_rows(new_regs, jnp.maximum(dst1_reg.astype(I32) - 1, 0),
                             dst1_val, dst1_to_reg)
    new_reg_ptr = _scatter_rows(new_reg_ptr,
                                jnp.maximum(dst1_reg.astype(I32) - 1, 0),
                                dst1_is_ptr, dst1_to_reg)

    # non-local ret register-file protocol: r1 = returndata ptr, rest wiped
    wiped = jnp.zeros_like(new_regs)
    wiped = wiped.at[:, 0].set(returndata_u256)
    wiped_ptr = jnp.zeros_like(new_reg_ptr)
    wiped_ptr = wiped_ptr.at[:, 0].set(True)
    wipe = nonlocal_ret & active
    new_regs = _sel(wipe, wiped, new_regs)
    new_reg_ptr = _sel(wipe, wiped_ptr, new_reg_ptr)
    new_context_u128 = _sel(wipe, jnp.zeros((B, 4), dtype=U32),
                            new_context_u128)

    # far-call register protocol (far_call.rs:571-610): r1 = calldata fat ptr,
    # r2 = ctor|system markers, r3..r12 kept (tags cleared) only for system
    # calls, r13..r15 zeroed
    calldata_u256 = jnp.zeros((B, 8), dtype=U32)
    calldata_u256 = calldata_u256.at[:, 0].set(fc_off2)
    calldata_u256 = calldata_u256.at[:, 1].set(fc_page2)
    calldata_u256 = calldata_u256.at[:, 2].set(fc_start2)
    calldata_u256 = calldata_u256.at[:, 3].set(fc_len2)
    marker_u256 = jnp.zeros((B, 8), dtype=U32)
    marker_u256 = marker_u256.at[:, 0].set(
        fc_ctor.astype(U32) | (fc_to_system.astype(U32) << 1))
    pos15 = jnp.arange(params.REGISTERS_COUNT)
    keep_sys = ((pos15 >= 2) & (pos15 <= 11))[None, :] & fc_to_system[:, None]
    far_file = _sel(keep_sys, state.regs, jnp.zeros_like(state.regs))
    far_file = far_file.at[:, 0].set(calldata_u256)
    far_file = far_file.at[:, 1].set(marker_u256)
    far_tags = jnp.zeros_like(state.reg_ptr)
    far_tags = far_tags.at[:, 0].set(True)
    fc_wipe = is_far_call & active
    new_regs = _sel(fc_wipe, far_file, new_regs)
    new_reg_ptr = _sel(fc_wipe, far_tags, new_reg_ptr)

    # ==================================================================
    # Memory writebacks
    # ==================================================================
    dst0_to_stack = dst0_write & dst0_is_stack_mem & active
    dst0_phys, dst0_in_window = _map_stack_index(config, dst0_loc)
    lane_error = lane_error | (dst0_to_stack & ~dst0_in_window)
    new_stack, new_stack_tag = _occupancy_cond(
        gate, jnp.any(dst0_to_stack),
        lambda sv: (_scatter_arena(config, sv[0], dst0_phys, dst0_val,
                                   dst0_to_stack),
                    _scatter_rows(sv[1], dst0_phys, dst0_is_ptr,
                                  dst0_to_stack)),
        lambda sv: sv, (state.stack, state.stack_ptr_tag))

    w_heap0 = uma_do_write & use_heap_arena & active
    w_heap1 = w_heap0 & is_unaligned
    w_aux0 = uma_do_write & use_aux_arena & active
    w_aux1 = w_aux0 & is_unaligned
    # w0/w1 scatters gated independently (see the uma read sweeps above)
    new_heap = _occupancy_cond(
        gate, jnp.any(w_heap0),
        lambda h: _scatter_arena(config, h, h_base + word0, new_w0, w_heap0),
        lambda h: h, state.heap)
    new_heap = _occupancy_cond(
        gate, jnp.any(w_heap1),
        lambda h: _scatter_arena(config, h, h_base + word1, new_w1, w_heap1),
        lambda h: h, new_heap)
    new_aux = _occupancy_cond(
        gate, jnp.any(w_aux0),
        lambda a: _scatter_arena(config, a, a_base + word0, new_w0, w_aux0),
        lambda a: a, state.aux_heap)
    new_aux = _occupancy_cond(
        gate, jnp.any(w_aux1),
        lambda a: _scatter_arena(config, a, a_base + word1, new_w1, w_aux1),
        lambda a: a, new_aux)
    if precompile_enabled and log_enabled:
        # precompile output word(s) (defined in the precompile unit above)
        new_heap = _scatter_arena(
            config, new_heap, pp_w_slot * config.heap_words + pp_out_idx,
            pp_out_val, pp_write_h)
        new_aux = _scatter_arena(
            config, new_aux, pp_w_slot * config.aux_heap_words + pp_out_idx,
            pp_out_val, pp_write_a)
        new_heap = _scatter_arena(
            config, new_heap, pp_w_slot * config.heap_words + pp_out_idx + 1,
            pp_out_val2, pp_write2_h)
        new_aux = _scatter_arena(
            config, new_aux, pp_w_slot * config.aux_heap_words + pp_out_idx + 1,
            pp_out_val2, pp_write2_a)

    # ==================================================================
    # Witness queue (memory queries, golden order; see golden/vm.py)
    # ==================================================================
    wq_count = state.wq_count
    wq_meta, wq_value, wq_flags = state.wq_meta, state.wq_value, state.wq_flags
    wc_state, wc_count = state.wc_state, state.wc_count
    if config.queue_capacity > 0 or config.rolling_commitment:
        # Every cycle owns a fixed 8-slot block at a batch-uniform position
        # (dynamic_update_slice with a scalar index — no per-lane scatter);
        # slot validity rides in bit2 of wq_flags and the dense stream is
        # reconstructed by filtering valid slots in order.
        cap = max(config.queue_capacity, SLOTS_PER_CYCLE)
        base = jnp.minimum(
            jnp.asarray(step, I32) * SLOTS_PER_CYCLE, cap - SLOTS_PER_CYCLE)
        overflow = (jnp.asarray(step, I32) * SLOTS_PER_CYCLE
                    > cap - SLOTS_PER_CYCLE) \
            if config.queue_capacity > 0 else jnp.bool_(False)
        ts0 = state.timestamp
        ts3 = state.timestamp + 3
        stack_page_arr = base_page + 1
        uma_page = jnp.where(uma_is_ptr_read, u_page_field,
                    jnp.where(uma_is_heap, heap_page, aux_page))
        uma_type = jnp.where(uma_is_ptr_read, 3,
                    jnp.where(uma_is_aux, 2, 1))  # MemoryType enum values
        # slots in golden emission order
        slots = [
            # (valid, type, page, index, value, is_ptr, rw, timestamp)
            (code_read_needed & ~state.done, jnp.full((B,), 4, U32), code_page,
             super_pc, code_word, jnp.zeros((B,), BOOL), False, ts0),
            (do_src0_mem_read & src0_is_stack_mem, jnp.zeros((B,), U32) + 0,
             stack_page_arr, src0_loc, stack_val, stack_tag, False, ts0),
            (do_src0_mem_read & src0_code, jnp.full((B,), 4, U32), code_page,
             src0_loc, code_val, jnp.zeros((B,), BOOL), False, ts0),
            (uma_do_read_mem, uma_type, uma_page, word0, w0,
             jnp.zeros((B,), BOOL), False, ts0),
            (uma_do_read_mem & is_unaligned, uma_type, uma_page, word1, w1,
             jnp.zeros((B,), BOOL), False, ts0),
            (dst0_to_stack, jnp.zeros((B,), U32), stack_page_arr, dst0_loc,
             dst0_val, dst0_is_ptr, True, ts3),
            (uma_do_write, uma_type, uma_page, word0, new_w0,
             jnp.zeros((B,), BOOL), True, ts3),
            (uma_do_write & is_unaligned, uma_type, uma_page, word1, new_w1,
             jnp.zeros((B,), BOOL), True, ts3),
        ]
        if config.queue_capacity > 0:
            meta_block, value_block, flag_block = [], [], []
            for valid, mtype, mpage, midx, mval, mptr, rw, ts in slots:
                lane_error = lane_error | (valid & active & overflow)
                valid = valid & active & ~overflow
                vm = valid.astype(U32)
                # invalid slots are all-zero rows (incl. the static rw bit):
                # engines may then skip untouched-arena sweeps (gated-zero
                # values) while staying bit-identical; stream extraction and
                # commitments key on the valid bit only
                meta_block.append(jnp.stack(
                    [ts * vm, mtype.astype(U32) * vm, mpage.astype(U32) * vm,
                     midx.astype(U32) * vm], axis=1))
                value_block.append(jnp.where(valid[:, None], mval, 0))
                flag_block.append(((jnp.uint32(1) if rw else jnp.uint32(0))
                                   | (mptr.astype(U32) << 1)
                                   | (vm << 2)) * vm)
                wq_count = wq_count + valid.astype(I32)
            # batch-last slabs (see state.py on queue layouts)
            meta_b = jnp.stack(meta_block, axis=0)     # [8, B, 4]
            value_b = jnp.stack(value_block, axis=0)   # [8, B, 8]
            flag_b = jnp.stack(flag_block, axis=0)     # [8, B]
            wq_meta = jax.lax.dynamic_update_slice(
                wq_meta, jnp.transpose(meta_b, (0, 2, 1)), (base, 0, 0))
            wq_value = jax.lax.dynamic_update_slice(
                wq_value, jnp.transpose(value_b, (0, 2, 1)), (base, 0, 0))
            wq_flags = jax.lax.dynamic_update_slice(wq_flags, flag_b, (base, 0))

    # ---- rolling memory-queue commitment (witness/commitment.py spec v2,
    # rate-packed): record 2i is XORed into sponge lanes 0..7, record 2i+1
    # into lanes 8..15 followed by one permutation — the per-lane record
    # parity (wc_count & 1) picks the destination half, and a lane only
    # permutes when its odd record lands.  Permutations are gated per slot
    # on batch-wide wrap occupancy.
    wc_state, wc_count = state.wc_state, state.wc_count
    if config.rolling_commitment:
        from ..ops.keccak import keccak_f1600 as _wc_perm

        def _bswap(x):
            x = x.astype(U32)
            return ((x & 0xFF) << 24) | ((x & 0xFF00) << 8) \
                | ((x >> 8) & 0xFF00) | (x >> 24)

        wlo = [wc_state[:, k, 0] for k in range(25)]
        whi = [wc_state[:, k, 1] for k in range(25)]
        for valid, mtype, mpage, midx, mval, mptr, rw, ts in slots:
            valid = valid & active
            fl = (jnp.uint32(1) if rw else jnp.uint32(0)) | (mptr.astype(U32) << 1)
            mpage = mpage.astype(U32)
            midx = midx.astype(U32)
            rec_lo = [None] * 8
            rec_hi = [None] * 8
            rec_lo[0] = _bswap(ts)
            rec_hi[0] = (mtype.astype(U32) & 0xFF) \
                | (((mpage >> 24) & 0xFF) << 8) \
                | (((mpage >> 16) & 0xFF) << 16) \
                | (((mpage >> 8) & 0xFF) << 24)
            rec_lo[1] = (mpage & 0xFF) | (((midx >> 24) & 0xFF) << 8) \
                | (((midx >> 16) & 0xFF) << 16) | (((midx >> 8) & 0xFF) << 24)
            rec_hi[1] = (midx & 0xFF) | (fl << 8)
            rec_lo[2] = rec_hi[2] = rec_lo[3] = rec_hi[3] = \
                jnp.zeros((B,), dtype=U32)
            for k in range(4):
                rec_lo[4 + k] = _bswap(mval[:, 7 - 2 * k])
                rec_hi[4 + k] = _bswap(mval[:, 6 - 2 * k])
            par1 = (wc_count & 1) != 0
            ab_even = valid & ~par1            # -> lanes 0..7
            wrap = valid & par1                # -> lanes 8..15, then permute
            ab_lo = [wlo[i] ^ jnp.where(ab_even, rec_lo[i], 0)
                     if i < 8 else wlo[i] for i in range(25)]
            ab_hi = [whi[i] ^ jnp.where(ab_even, rec_hi[i], 0)
                     if i < 8 else whi[i] for i in range(25)]
            ab_lo = [ab_lo[i] ^ jnp.where(wrap, rec_lo[i - 8], 0)
                     if 8 <= i < 16 else ab_lo[i] for i in range(25)]
            ab_hi = [ab_hi[i] ^ jnp.where(wrap, rec_hi[i - 8], 0)
                     if 8 <= i < 16 else ab_hi[i] for i in range(25)]

            def absorb(_, _lo=tuple(ab_lo), _hi=tuple(ab_hi)):
                plo, phi = _wc_perm(list(_lo), list(_hi), unroll=False)
                return tuple(plo), tuple(phi)

            plo, phi = jax.lax.cond(
                jnp.any(wrap), absorb,
                lambda _, _lo=tuple(ab_lo), _hi=tuple(ab_hi): (_lo, _hi),
                None)
            wlo = [jnp.where(wrap, plo[i], ab_lo[i]) for i in range(25)]
            whi = [jnp.where(wrap, phi[i], ab_hi[i]) for i in range(25)]
            wc_count = wc_count + valid.astype(U32)
        wc_state = jnp.stack(
            [jnp.stack(wlo, axis=1), jnp.stack(whi, axis=1)], axis=2)

    # ---- log-witness queue (add_log_query stream; 1 slot per cycle)
    lq_count = state.lq_count
    lq_meta, lq_addr = state.lq_meta, state.lq_addr
    lq_key, lq_read, lq_written = state.lq_key, state.lq_read, state.lq_written
    if config.log_queue_capacity > 0 and log_enabled:  # noqa: SIM102
        lpos = jnp.minimum(jnp.asarray(step, I32),
                           config.log_queue_capacity - 1)
        loverflow = jnp.asarray(step, I32) >= config.log_queue_capacity
        lvalid = (do_sread | do_swrite | do_event | do_precomp
                  | fc_do_sread) & ~loverflow
        lane_error = lane_error | ((do_sread | do_swrite | do_event
                                    | do_precomp | fc_do_sread) & loverflow)
        l_aux = jnp.where(do_precomp, jnp.uint32(params.PRECOMPILE_AUX_BYTE),
                jnp.where(do_sread | do_swrite | fc_do_sread,
                          jnp.uint32(params.STORAGE_AUX_BYTE), aux_byte))
        l_rw = (do_swrite | do_event).astype(U32)
        l_svc = jnp.where(fc_do_sread, False, vflag0).astype(U32)
        l_shard = jnp.where(fc_do_sread, fc_code_shard, shard_this_u8)
        packed_meta = l_aux | (l_rw << 8) | (l_svc << 9) \
            | (l_shard << 16)
        meta_row = jnp.stack(
            [jnp.where(lvalid, ts_log, 0),
             jnp.where(lvalid, packed_meta, 0),
             jnp.where(lvalid, state.tx_number, 0),
             lvalid.astype(U32)], axis=1)
        read_row = jnp.where((do_sread | do_swrite)[:, None], current_val, 0)
        read_row = jnp.where(do_precomp[:, None], 0, read_row)
        # reads copy read_value into written_value (helpers.rs:145-148)
        written_row = jnp.where(do_sread[:, None], current_val,
                                jnp.where((do_swrite | do_event)[:, None],
                                          src1, 0))
        def upd(arr, row):
            return jax.lax.dynamic_update_slice(
                arr, row[:, None], (0, lpos) + (0,) * (arr.ndim - 2))
        lq_meta = upd(lq_meta, meta_row)
        deployer5_row = jnp.zeros((B, 5), dtype=U32) \
            .at[:, 0].set(params.DEPLOYER_SYSTEM_CONTRACT_ADDRESS)
        addr_row = _sel(fc_do_sread, deployer5_row, this_addr)
        key_row = _sel(fc_do_sread, _addr_to_u256(fc_addr5),
                       _sel(do_precomp, pp_key, src0))
        read_row = _sel(fc_do_sread, fc_hash_storage, read_row)
        written_row = _sel(fc_do_sread, fc_hash_storage, written_row)
        lq_addr = upd(lq_addr, jnp.where(lvalid[:, None], addr_row, 0))
        lq_key = upd(lq_key, jnp.where(lvalid[:, None], key_row, 0))
        lq_read = upd(lq_read, jnp.where(lvalid[:, None], read_row, 0))
        lq_written = upd(lq_written, jnp.where(lvalid[:, None], written_row, 0))
        lq_count = lq_count + lvalid.astype(I32)

    # ---- decommit-witness queue (1 slot per cycle)
    dq_count = state.dq_count
    dq_hash, dq_meta = state.dq_hash, state.dq_meta
    if config.decommit_queue_capacity > 0 and log_enabled:
        dpos = jnp.minimum(jnp.asarray(step, I32),
                           config.decommit_queue_capacity - 1)
        doverflow = jnp.asarray(step, I32) >= config.decommit_queue_capacity
        dvalid = fc_do_decommit & ~doverflow
        lane_error = lane_error | (fc_do_decommit & doverflow)
        drow = jnp.stack(
            [jnp.where(dvalid, state.timestamp + 1, 0),
             jnp.where(dvalid, fc_code_page, 0),
             jnp.where(dvalid, fc_code_len, 0),
             dvalid.astype(U32) | (jnp.where(dvalid, fc_fresh, False)
                                   .astype(U32) << 1)], axis=1)
        dq_hash = jax.lax.dynamic_update_slice(
            dq_hash, jnp.where(dvalid[:, None], fc_code_hash, 0)[:, None],
            (0, dpos, 0))
        dq_meta = jax.lax.dynamic_update_slice(
            dq_meta, drow[:, None], (0, dpos, 0))
        dq_count = dq_count + dvalid.astype(I32)

    # ==================================================================
    # Assemble the new state; freeze lanes that were already done
    # ==================================================================
    # frozen-lane protection: all array writebacks above were masked by
    # `active`; the remaining per-lane scalars are frozen with cheap selects
    # (no full-state copy — the big arenas stay in-place inside the scan).
    f = _sel
    return BatchedVmState(
        regs=new_regs, reg_ptr=new_reg_ptr,
        flags=f(frozen, state.flags, new_flags),
        timestamp=jnp.where(frozen, state.timestamp,
                            state.timestamp + params.TIME_DELTA_PER_CYCLE),
        monotonic_cycle_counter=jnp.where(
            frozen, state.monotonic_cycle_counter,
            state.monotonic_cycle_counter + 1),
        spent_pubdata=jnp.where(frozen, state.spent_pubdata,
                                new_spent_pubdata),
        ergs_per_pubdata=jnp.where(frozen, state.ergs_per_pubdata,
                                   new_ergs_per_pubdata),
        tx_number=jnp.where(frozen, state.tx_number, new_tx_number),
        pending_exception=jnp.where(frozen, state.pending_exception,
                                    new_pending),
        previous_code_word=f(frozen, state.previous_code_word,
                             new_prev_code_word),
        previous_super_pc=jnp.where(frozen, state.previous_super_pc,
                                    new_prev_super_pc),
        previous_code_page=jnp.where(frozen, state.previous_code_page,
                                     new_prev_code_page),
        context_u128=f(frozen, state.context_u128, new_context_u128),
        depth=jnp.where(frozen, state.depth, new_depth),
        cs_this_address=new_cs_this,
        cs_msg_sender=new_cs_sender,
        cs_code_address=new_cs_code,
        cs_context_u128=new_cs_u128,
        cs_scalars=new_cs_scalars,
        code=state.code,
        stack=new_stack, stack_ptr_tag=new_stack_tag,
        heap=new_heap, aux_heap=new_aux,
        done=jnp.where(frozen, state.done, new_done),
        lane_error=lane_error,
        global_step=state.global_step + 1,
        wq_count=wq_count, wq_meta=wq_meta, wq_value=wq_value,
        wq_flags=wq_flags,
        st_key=new_st_key, st_val=new_st_val, st_used=new_st_used,
        st_count=jnp.where(frozen, state.st_count, new_st_count),
        j_slot=new_j_slot, j_prev=new_j_prev,
        j_count=jnp.where(frozen, state.j_count, new_j_count),
        ev_key=new_ev_key, ev_val=new_ev_val, ev_meta=new_ev_meta,
        ev_cancelled=new_ev_cancelled,
        ev_count=jnp.where(frozen, state.ev_count, new_ev_count),
        lq_meta=lq_meta, lq_addr=lq_addr, lq_key=lq_key, lq_read=lq_read,
        lq_written=lq_written,
        lq_count=jnp.where(frozen, state.lq_count, lq_count),
        pq_meta=pq_meta, pq_value=pq_value, pq_flags=pq_flags,
        pq_count=jnp.where(frozen, state.pq_count, pq_count),
        pq_blocks=pq_blocks,
        hp_page=new_hp_page, ap_page=new_ap_page,
        frame_count=jnp.where(frozen, state.frame_count, new_frame_count),
        page_counter=jnp.where(frozen, state.page_counter, new_page_counter),
        cb_hash=state.cb_hash, cb_len=state.cb_len,
        cb_page=jnp.where(frozen[:, None], state.cb_page, new_cb_page),
        cb_valid=state.cb_valid,
        default_aa_hash=state.default_aa_hash,
        dq_hash=dq_hash, dq_meta=dq_meta,
        dq_count=jnp.where(frozen, state.dq_count, dq_count),
        wc_state=wc_state, wc_count=wc_count,
    )


@partial(jax.jit, static_argnames=("config", "n_cycles"),
         donate_argnames=("state",))
def run_cycles(state: BatchedVmState, config: VmConfig,
               n_cycles: int) -> BatchedVmState:
    """Advance all lanes by n_cycles (lanes freeze once they finish).

    The input state is DONATED: without donation XLA must preserve every
    loop-carried arena, which materializes copies of the stack, heap and
    witness-queue arrays (gigabytes of HLO temps and one full-queue copy
    per call, measured on the real chip).  Callers rebind:
    ``state = run_cycles(state, ...)``; on CPU donation is a no-op.
    """
    return jax.lax.fori_loop(
        0, n_cycles, lambda i, s: cycle_step(s, config, i), state)
