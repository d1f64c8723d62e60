"""Fused Pallas multi-cycle kernel: VM state VMEM-resident across K cycles.

The jnp interpreter (batched_vm.cycle_step) streams every arena through HBM
once per cycle — measured bandwidth-bound at ~10-13M cycles/s on one v5e
chip.  This kernel keeps a batch tile's ENTIRE hot state (registers,
callstack, stack/heap/aux/code arenas, scalars) resident in VMEM while
stepping K cycles, so HBM sees each arena once per K cycles plus the
irreducible witness-queue output stream.

In-kernel layout is batch-LAST so the 128-wide VPU lanes run dense:
  * u256 values:  u32[8, TB]        (limb-leading little-endian)
  * lane scalars: u32/i32/bool[TB]
  * word arenas:  u32[8, W, TB]     (word axis on sublanes)
  * callstack:    u32[D, F, TB]
Per-lane dynamic indexing stays the one-hot compare+reduce formulation of
batched_vm (TPUs have no per-lane gather), but the sweeps now run at VPU
speed over VMEM instead of HBM bandwidth.

Semantics are a 1:1 port of batched_vm.cycle_step (same reference citations:
/root/reference/src/vm_state/cycle.rs pipeline, mem_ops.rs addressing,
opcodes/execution/* families) covering ALL opcode families: the LOG unit
(storage KV + journal rollback + events), FAR_CALL (code-hash reads,
versioned-hash validation, decommit bank binding, 63/64 rule, register
protocol), the keccak256/sha256 precompiles, and all four witness-queue
families (memory 8-slot blocks, log, decommit, precompile round-witness)
plus the rolling sponge commitment.  Only ecrecover stays on the jnp
engine (its field arithmetic would add ~100k ops to the kernel and risk
the Mosaic resource ceiling) — see supported().
Conformance: tests/test_fused_cycle.py proves bit-exact state + witness
stream equality against run_cycles on every supported program family.

Witness-queue blocks: the kernel emits one [K*8-slot] block per batch tile
per call; the host wrapper splices it into the persistent queue at
global_step*8 (bit-exact in the non-overflow regime; overflow sets
lane_error exactly like the jnp path and leaves clamped content
unspecified, which the jnp path does too).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..isa import params
from ..isa.encoding import VARIANT_MASK, exception_revert_encoding
from ..isa.opcodes import (
    ContextOp, LogOp, Opcode, OperandMode, PtrOp, RetOp, ShiftOp,
    UMAOp, decode_consts,
)
from .state import CS, CS_SCALAR_FIELDS, BatchedVmState, VmConfig

U32 = jnp.uint32
I32 = jnp.int32
BOOL = jnp.bool_
# np scalars, NOT jnp: module-level jnp arrays become captured constants
# inside the Pallas kernel trace (pallas_call rejects closure captures)
U16_MASK = np.uint32(0xFFFF)
U32_MAX = np.uint32(0xFFFFFFFF)
NF = len(CS_SCALAR_FIELDS)

_PANIC_ENC = exception_revert_encoding()
_PANIC_LO = np.uint32(_PANIC_ENC & 0xFFFFFFFF)
_PANIC_HI = np.uint32(_PANIC_ENC >> 32)

SLOTS_PER_CYCLE = 8  # must match batched_vm.SLOTS_PER_CYCLE


def supported(config: VmConfig) -> bool:
    """Configs this kernel covers (see module docstring).

    Everything is in-kernel — the LOG family (storage/journal/events +
    log-witness queue), FAR_CALL (decommit bank, callstack,
    decommit-witness queue), the keccak256/sha256 precompiles + their
    round-witness (pq) queue, and the rolling sponge commitment — except
    ecrecover, which stays on the jnp engine.  The accepted-geometry
    couplings (each asserted below):

      * ecrecover (when on) needs the keccak/sha units and the LOG unit:
        the kernel only DETECTS ecrecover cycles (its field arithmetic,
        ~100k kernel ops, would risk the Mosaic resource ceiling); the
        wrapper re-runs the chunk up to the first such cycle (dynamic
        k_stop) and executes that one cycle on the jnp engine —
        bit-exact, with zero overhead for configs without it.
      * pq queue needs the keccak/sha units AND the LOG unit
        (storage_slots > 0): pq rows are emitted by in-kernel precompile
        calls, which are LOG sub-ops.
      * rolling commitment and the memory witness QUEUE are exclusive:
        both consume the same per-cycle slot stream; the jnp engine has
        the same restriction in practice (bench modes use one or the
        other), and supporting both would double the slot writeback.
      * precompile units need the LOG unit (they are LogOp.PRECOMPILE_CALL).
      * log/decommit queues need the LOG/FAR_CALL unit (storage_slots > 0)
        that emits them.
    """
    pp_on = config.precompile_keccak_blocks > 0 \
        or config.precompile_sha_rounds > 0
    return ((not config.precompile_ecrecover
             or (pp_on and config.storage_slots > 0))
            and (config.precompile_queue_capacity == 0
                 or (pp_on and config.storage_slots > 0))
            and not (config.rolling_commitment and config.queue_capacity)
            and (not pp_on or config.storage_slots > 0)
            and (config.storage_slots > 0 or
                 (config.log_queue_capacity == 0
                  and config.decommit_queue_capacity == 0)))


# ===========================================================================
# limb-leading u256 kernels (u32[8, TB]; port of ops/u256.py conventions)
# ===========================================================================

def _u256_add(a, b):
    out = []
    carry = jnp.zeros_like(a[0])
    for i in range(8):
        s = a[i] + b[i]
        c1 = (s < a[i]).astype(U32)
        s = s + carry
        c2 = (s < carry).astype(U32)
        out.append(s)
        carry = c1 | c2
    return jnp.stack(out, axis=0), carry


def _u256_sub(a, b):
    out = []
    borrow = jnp.zeros_like(a[0])
    for i in range(8):
        d = a[i] - b[i]
        b1 = (a[i] < b[i]).astype(U32)
        d2 = d - borrow
        b2 = (d < borrow).astype(U32)
        out.append(d2)
        borrow = b1 | b2
    return jnp.stack(out, axis=0), borrow


def _u256_is_zero(a):
    z = a[0] == 0
    for i in range(1, 8):
        z = z & (a[i] == 0)
    return z


def _u256_from_u32(x, tb):
    z = jnp.zeros((7, tb), dtype=U32)
    return jnp.concatenate([x[None, :].astype(U32), z], axis=0)


def _sel8(mask, a, b):
    """mask[TB] select over [8, TB] (or [k, TB]) values."""
    return jnp.where(mask[None, :], a, b)


def _shift_limbs(a, words, left: bool):
    """Per-lane limb move: out[i] = a[i -/+ words] (0 out of range).

    Log-depth form: stage-shift by 1/2/4 limbs selected by the bits of
    `words` (24 selects vs the 64-compare/64-or one-hot sweep — measured
    at ~2x cheaper in the UMA/shift units)."""
    w = words.astype(U32)
    x = [a[i] for i in range(8)]
    zero = jnp.zeros_like(a[0])
    for bit in (0, 1, 2):
        sh = 1 << bit
        take = ((w >> bit) & 1) != 0
        if left:
            moved = [x[i - sh] if i >= sh else zero for i in range(8)]
        else:
            moved = [x[i + sh] if i + sh < 8 else zero for i in range(8)]
        x = [jnp.where(take, moved[i], x[i]) for i in range(8)]
    big = w >= 8
    x = [jnp.where(big, zero, x[i]) for i in range(8)]
    return jnp.stack(x, axis=0)


def _u256_shl(a, n):
    n = n.astype(U32)
    words = (n >> 5).astype(I32)
    bits = n & 31
    moved = _shift_limbs(a, words, left=True)
    lo_part = moved << bits[None, :]
    carry_src = _shift_limbs(a, words + 1, left=True)
    hi_part = jnp.where((bits == 0)[None, :], 0,
                        carry_src >> ((32 - bits) % 32)[None, :])
    out = lo_part | hi_part
    return jnp.where((n >= 256)[None, :], 0, out)


def _u256_shr(a, n):
    n = n.astype(U32)
    words = (n >> 5).astype(I32)
    bits = n & 31
    moved = _shift_limbs(a, words, left=False)
    lo_part = moved >> bits[None, :]
    carry_src = _shift_limbs(a, words + 1, left=False)
    hi_part = jnp.where((bits == 0)[None, :], 0,
                        carry_src << ((32 - bits) % 32)[None, :])
    out = lo_part | hi_part
    return jnp.where((n >= 256)[None, :], 0, out)


def _u256_rol(a, n):
    return _u256_shl(a, n) | _u256_shr(a, 256 - n)


def _u256_ror(a, n):
    return _u256_shr(a, n) | _u256_shl(a, 256 - n)


def _u256_shl1(a):
    """Static shift-left-by-1 (div_mod inner step)."""
    rows = [a[0] << 1]
    for i in range(1, 8):
        rows.append((a[i] << 1) | (a[i - 1] >> 31))
    return jnp.stack(rows, axis=0)


def _u256_mul_full(a, b):
    """512-bit product -> (lo [8,TB], hi [8,TB]).

    16-bit-digit schoolbook with u32 column accumulators (<= 32 terms of
    lo/hi half-products < 2^16 each keeps columns < 2^22), then a
    Kogge-Stone carry settle — the pure-VPU form of ops/u256.mul_full
    (the MXU/f32 formulation there exists for XLA graph-size reasons that
    don't apply inside one Mosaic kernel).
    """
    ad = []
    bd = []
    for i in range(8):
        ad += [a[i] & U16_MASK, a[i] >> 16]
        bd += [b[i] & U16_MASK, b[i] >> 16]
    cols = [jnp.zeros_like(a[0]) for _ in range(33)]
    for i in range(16):
        for j in range(16):
            p = ad[i] * bd[j]
            cols[i + j] = cols[i + j] + (p & U16_MASK)
            cols[i + j + 1] = cols[i + j + 1] + (p >> 16)
    cols = cols[:32]
    # local split + log-depth carry lookahead (see ops/u256.mul_full)
    e = [cols[0] & U16_MASK]
    for k in range(1, 32):
        e.append((cols[k] & U16_MASK) + (cols[k - 1] >> 16))
    g = [(x >> 16) != 0 for x in e]
    p_ = [x == U16_MASK for x in e]
    for sh in (1, 2, 4, 8, 16):
        g = [g[k] | (p_[k] & g[k - sh]) if k >= sh else g[k]
             for k in range(32)]
        p_ = [p_[k] & p_[k - sh] if k >= sh else jnp.zeros_like(p_[k])
              for k in range(32)]
    d = [(e[0]) & U16_MASK]
    for k in range(1, 32):
        d.append((e[k] + g[k - 1].astype(U32)) & U16_MASK)
    limbs = [d[2 * k] | (d[2 * k + 1] << 16) for k in range(16)]
    return jnp.stack(limbs[:8], axis=0), jnp.stack(limbs[8:], axis=0)


def _u256_div_mod(a, b):
    """Restoring division, 8 limbs x 32-bit fori (b == 0 -> (0, 0))."""
    b_zero = _u256_is_zero(b)
    q = jnp.zeros_like(a)
    r = jnp.zeros_like(a)

    def limb_round(limb, carry):
        q, r = carry

        def body(j, c):
            q, r = c
            bit = (31 - j).astype(U32)
            a_bit = (a[limb] >> bit) & 1
            r = _u256_shl1(r)
            r = _set_row(r, 0, r[0] | a_bit)
            r_minus_b, borrow = _u256_sub(r, b)
            fits = borrow == 0
            r = _sel8(fits, r_minus_b, r)
            q = _u256_shl1(q)
            q = _set_row(q, 0, q[0] | fits.astype(U32))
            return q, r

        return jax.lax.fori_loop(0, 32, body, (q, r))

    for limb in range(7, -1, -1):
        q, r = limb_round(limb, (q, r))
    q = _sel8(b_zero, jnp.zeros_like(q), q)
    r = _sel8(b_zero, jnp.zeros_like(r), r)
    return q, r



_SHA256_IV = None
_SHA256_K = None



def _keccak_f1600_kernel(lo: list, hi: list) -> tuple[list, list]:
    """keccak-f[1600] under lax.fori_loop with round constants selected by
    scalar where-chains — Pallas kernels reject array-valued constants
    (rc tables would be closure captures) and the fully unrolled form blows
    the XLA:CPU interpret-mode compile."""
    from ..golden.precompiles import KECCAK_RC
    from ..ops.keccak import _round

    def body(i, carry):
        lo, hi = list(carry[0]), list(carry[1])
        rc_lo = U32(0)
        rc_hi = U32(0)
        for r in range(24):
            rc_lo = jnp.where(i == r, U32(KECCAK_RC[r] & 0xFFFFFFFF), rc_lo)
            rc_hi = jnp.where(i == r, U32(KECCAK_RC[r] >> 32), rc_hi)
        lo, hi = _round(lo, hi, rc_lo, rc_hi)
        return (tuple(lo), tuple(hi))

    lo_t, hi_t = jax.lax.fori_loop(0, 24, body, (tuple(lo), tuple(hi)))
    return list(lo_t), list(hi_t)

def _sha256_compress_ll(st8: list, block16: list) -> list:
    """SHA-256 compression over lists of u32[TB] vectors, as a fori over 4
    blocks of 16 statically-indexed rounds: Pallas kernels reject the K-table
    as a captured array constant and the fully unrolled 64-round chain blows
    the XLA:CPU interpret-mode compile; round constants come from scalar
    where-chains over the (static) block index."""
    from ..golden.precompiles import SHA256_K

    def rotr(x, n):
        return (x >> n) | (x << (32 - n))

    def body(j, carry):
        a, b, c, d, e, f, g, h = carry[:8]
        w = list(carry[8:])
        for t in range(16):
            # message schedule for rounds >= 16 (block j >= 1)
            s0 = rotr(w[(t + 1) % 16], 7) ^ rotr(w[(t + 1) % 16], 18) \
                ^ (w[(t + 1) % 16] >> 3)
            s1 = rotr(w[(t + 14) % 16], 17) ^ rotr(w[(t + 14) % 16], 19) \
                ^ (w[(t + 14) % 16] >> 10)
            scheduled = w[t] + s0 + w[(t + 9) % 16] + s1
            wi = jnp.where(j == 0, w[t], scheduled)
            w[t] = wi
            kc = U32(0)
            for j_ in range(4):
                kc = jnp.where(j == j_, U32(SHA256_K[16 * j_ + t]), kc)
            s1r = rotr(e, 6) ^ rotr(e, 11) ^ rotr(e, 25)
            ch = (e & f) ^ (~e & g)
            t1 = h + s1r + ch + kc + wi
            s0r = rotr(a, 2) ^ rotr(a, 13) ^ rotr(a, 22)
            maj = (a & b) ^ (a & c) ^ (b & c)
            t2 = s0r + maj
            a, b, c, d, e, f, g, h = t1 + t2, a, b, c, d + t1, e, f, g
        return (a, b, c, d, e, f, g, h, *w)

    out = jax.lax.fori_loop(0, 4, body, (*st8, *block16))
    return [st8[i] + out[i] for i in range(8)]


# ===========================================================================
# small helpers (batch-last one-hot forms of batched_vm helpers)
# ===========================================================================


def _usum(x, axis):
    """Sum that tolerates u32 inputs: Mosaic has no unsigned reductions, and
    same-width int convert is bit-preserving, so sum in i32 and convert back
    (wraparound semantics identical)."""
    if x.dtype == jnp.uint32:
        return jnp.sum(x.astype(I32), axis=axis).astype(U32)
    return jnp.sum(x, axis=axis)


def _set_row(x, i: int, row):
    """x[k, TB] with x[i] replaced (static i) — concat instead of .at[].set,
    which lowers to lax.scatter (unsupported by Mosaic)."""
    parts = []
    if i > 0:
        parts.append(x[:i])
    parts.append(row[None, :].astype(x.dtype))
    if i + 1 < x.shape[0]:
        parts.append(x[i + 1:])
    return jnp.concatenate(parts, axis=0)


def _bsel(p, a, b):
    """Boolean select as logic ops: Mosaic i1 vector selects crash the
    compile helper (bisected), so where() is reserved for non-bool dtypes."""
    return (p & a) | (~p & b)

def _onehot_l(idx, n):
    """idx[TB] -> bool[n, TB] (out-of-range all-false)."""
    tb = idx.shape[0]
    iota = jax.lax.broadcasted_iota(I32, (n, tb), 0)
    return iota == idx.astype(I32)[None, :]


# Tried-and-NEGATIVE (kept for re-measurement): gathers as bit-select
# multiplexer trees — fold the indexed axis in half log2(N) times,
# selecting upper/lower by one index bit per stage.  On paper ~half the
# ops of the one-hot where+reduce form (one select per surviving element,
# no compare plane), and bit-exact (OOB/negative -> 0, conformance-tested
# with ERAVM_FUSED_TREE_GATHER=1); but MEASURED SLOWER on the v5e chip:
# 34.3M vs 38.8M cycles/s on the headline workload at tile=512 — Mosaic
# lowers the one-hot masked-sum into tighter code than the halving-shape
# select chain (relayouts between stages).  Default stays one-hot.
# Scatters are one-hot in both modes (a scatter needs the per-position
# compare; there is no tree equivalent).
_TREE_GATHER = os.environ.get("ERAVM_FUSED_TREE_GATHER", "0") == "1"
_VMEM_LIMIT_BYTES = int(os.environ.get("ERAVM_FUSED_VMEM_MB", "112")) * 2**20

# Per-lane write-back word caches over the stack and heap arenas (default
# ON; env kill-switch for A/B measurement).  Rationale + coherence rules:
# see _cycle_tile's "word cache" sections.  Upper bound measured via the
# stack_rw/heap_rw DEBUG_SKIP probes: +31% headline with both sweeps off
# (tools/ablate_fused.py `cache` group).
_WORD_CACHE = os.environ.get("ERAVM_FUSED_WORD_CACHE", "1") == "1"
#: cache-meta sentinel: idx field all-ones never equals a real arena index
_WC_INVALID = 0xFFFFFFFF


def _pow2_pad(arr, axis, n):
    npow = 1 if n <= 1 else 1 << (n - 1).bit_length()
    if npow != n:
        shape = list(arr.shape)
        shape[axis] = npow - n
        arr = jnp.concatenate(
            [arr, jnp.zeros(shape, dtype=arr.dtype)], axis=axis)
    return arr, npow


def _gather_l_onehot(arr, idx):
    oh = _onehot_l(idx, arr.shape[0])
    oh = oh.reshape((arr.shape[0],) + (1,) * (arr.ndim - 2) + oh.shape[1:])
    if arr.dtype == jnp.bool_:
        return jnp.any(arr & oh, axis=0)
    return _usum(jnp.where(oh, arr, 0), axis=0)


def _gather_l(arr, idx):
    """arr[N, ..., TB] at per-lane idx[TB] -> [..., TB] (OOB -> 0)."""
    if not _TREE_GATHER:
        return _gather_l_onehot(arr, idx)
    n = arr.shape[0]
    iu = idx.astype(U32)
    x, npow = _pow2_pad(arr, 0, n)
    h = npow // 2
    while h >= 1:
        bit = ((iu >> (h.bit_length() - 1)) & 1) != 0
        b = bit.reshape((1,) * (x.ndim - 1) + bit.shape)
        if x.dtype == jnp.bool_:
            x = _bsel(b, x[h:], x[:h])
        else:
            x = jnp.where(b, x[h:], x[:h])
        h //= 2
    out = x[0]
    inr = (iu < n).reshape((1,) * (out.ndim - 1) + idx.shape)
    if arr.dtype == jnp.bool_:
        return out & inr
    return jnp.where(inr, out, 0)


def _scatter_l(arr, idx, values, mask):
    """arr[N, ..., TB] masked per-lane row write (values [..., TB])."""
    oh = _onehot_l(idx, arr.shape[0]) & mask[None, :]
    oh = oh.reshape((arr.shape[0],) + (1,) * (arr.ndim - 2) + oh.shape[1:])
    if arr.dtype == jnp.bool_:
        return _bsel(oh, values[None, ...], arr)
    return jnp.where(oh, values[None, ...], arr)


def _gather_arena_l(arena, idx):
    """arena u32[8, W, TB] word gather -> u32[8, TB] (OOB -> 0)."""
    if not _TREE_GATHER:
        oh = _onehot_l(idx, arena.shape[1])      # [W, TB]
        return _usum(jnp.where(oh[None, :, :], arena, 0), axis=1)
    w = arena.shape[1]
    iu = idx.astype(U32)
    x, npow = _pow2_pad(arena, 1, w)
    h = npow // 2
    while h >= 1:
        bit = (((iu >> (h.bit_length() - 1)) & 1) != 0)[None, None, :]
        x = jnp.where(bit, x[:, h:], x[:, :h])
        h //= 2
    return jnp.where((iu < w)[None, :], x[:, 0, :], 0)


def _scatter_arena_l(arena, idx, values, mask):
    """arena u32[8, W, TB] masked word write (values u32[8, TB])."""
    oh = _onehot_l(idx, arena.shape[1]) & mask[None, :]   # [W, TB]
    return jnp.where(oh[None, :, :], values[:, None, :], arena)


def _addr_is_kernel_l(addr5):
    """u32[5, TB] 160-bit address < 2^16?"""
    high_zero = (addr5[1] == 0) & (addr5[2] == 0) & (addr5[3] == 0) \
        & (addr5[4] == 0)
    return (addr5[0] < (1 << 16)) & high_zero


def _addr_to_u256_l(addr5):
    z = jnp.zeros((3,) + addr5.shape[1:], dtype=U32)
    return jnp.concatenate([addr5, z], axis=0)


def _map_stack_index_l(config: VmConfig, idx):
    """Port of batched_vm._map_stack_index (two-window stack arena)."""
    if config.stack_abs_words is None:
        return idx, idx < config.stack_words
    a = config.stack_abs_words
    s0 = config.stack_sp_base
    w = config.stack_words - a
    in_abs = idx < a
    in_sp = (idx >= s0) & (idx < s0 + w)
    phys = jnp.where(in_abs, idx, a + (idx - s0))
    return jnp.where(in_abs | in_sp, phys, config.stack_words), in_abs | in_sp

# ===========================================================================
# one cycle over a batch tile (port of batched_vm.cycle_step, no-log subset)
# ===========================================================================


#: dev-only output-passthrough set: nv fields forced back to the carried
#: value after _cycle_tile (XLA then DCEs their producers) — liveness-level
#: crash bisection.  "mem" disables the arena ref stores.
DEBUG_PASSTHROUGH: frozenset = frozenset()

#: dev-only section-skip set: named heavyweight units replaced by zeros to
#: bisect compile-resource blowups ("mul", "div", "shift", "uma_shift").
DEBUG_SKIP: frozenset = frozenset()

#: dev-only bisect hook: when set to stage N, _cycle_tile returns early after
#: that stage (carry structure preserved; probe value folded into timestamp
#: to keep the truncated computation live).  Used to localize Mosaic crashes.
DEBUG_STAGE = None


def _stage_cut(v, n, probe):
    if DEBUG_STAGE is not None and DEBUG_STAGE == n:
        nv = dict(v)
        nv["timestamp"] = v["timestamp"] + probe.astype(U32)
        return nv
    return None

def _decode_family(raw_variant):
    """Arithmetic variant decode with static per-family constants.

    Port of cycle_step's fam16/div-mod decode (batched_vm.py:277-302), but
    the div/mod divisors are folded per family as STATIC ints so Mosaic
    lowers them to shift/multiply sequences instead of per-lane udiv.
    """
    dc = decode_consts()
    starts = [int(x) for x in dc["start"]]
    n_src = [int(x) for x in dc["n_src"]]
    n_dst = [int(x) for x in dc["n_dst"]]
    n_flags = [int(x) for x in dc["n_flags"]]
    src_base = [int(x) for x in dc["src_base"]]
    dst_base = [int(x) for x in dc["dst_base"]]

    fam16 = jnp.zeros_like(raw_variant)
    for f in range(1, 16):
        fam16 = fam16 + (raw_variant >= starts[f]).astype(U32)

    z = jnp.zeros_like(raw_variant)
    combo = z
    dst_i = z
    src_i = z
    sub_raw = z
    src0_mode_raw = z
    dst0_mode_raw = z
    for f in range(16):
        m = fam16 == f
        rr = raw_variant - starts[f]
        c = rr % n_flags[f]
        rr = rr // n_flags[f]
        d = rr % n_dst[f]
        rr = rr // n_dst[f]
        s = rr % n_src[f]
        sb = rr // n_src[f]
        combo = jnp.where(m, c, combo)
        dst_i = jnp.where(m, d, dst_i)
        src_i = jnp.where(m, s, src_i)
        sub_raw = jnp.where(m, sb, sub_raw)
        src0_mode_raw = jnp.where(m, src_base[f] + s, src0_mode_raw)
        dst0_mode_raw = jnp.where(m, dst_base[f] + d, dst0_mode_raw)
    return fam16, sub_raw, combo, src0_mode_raw, dst0_mode_raw


def _cycle_tile(v: dict, consts: dict, mem: dict, config: VmConfig,
                ovfs) -> tuple[dict, list, tuple | None, tuple | None]:
    """Advance the tile one cycle; returns (new values, witness slot rows).

    `v` maps state-field names to batch-last arrays (see module docstring);
    `ovf` is a scalar bool: this cycle's witness block would overflow the
    persistent queue (the caller derives it from the global step clock).
    Every section cites the batched_vm.cycle_step line it ports.
    """
    TB = v["done"].shape[0]
    ovf, ovf_l, ovf_d = ovfs
    log_enabled = config.storage_slots > 0
    # big arenas live in (aliased) output REFS, not the fori carry: carrying
    # multi-MB vector values across the loop back-edge aborts the Mosaic
    # compile helper (SIGABRT, bisected); in-VMEM ref read/write per cycle
    # is the same data movement without the carry pressure.
    stack_arena = mem["stack"][...]
    stack_tag_arena = mem["stack_tag"][...]
    heap_arena = mem["heap"][...]
    aux_arena = mem["aux_heap"][...]

    # ---- word cache (stack + heap): per-lane 2-entry write-back caches
    # keyed by PHYSICAL arena index, direct-mapped by index parity.  All
    # in-kernel readers overlay hits (src0 stack read, UMA heap reads,
    # the precompile input reads), so the cache is coherent by
    # read-through; the arena sees only evictions (parity conflict),
    # precompile-cycle flushes, and the chunk-end flush in _build_kernel.
    # In lockstep push/pop + fixed-offset heap traffic this removes the
    # arena sweeps entirely (+31% measured bound, ablate_fused `cache`).
    cache_on = "stc_val" in mem
    if cache_on:
        stc_val = mem["stc_val"][...]        # u32[2, 8, TB]
        stc_meta = mem["stc_meta"][...]      # u32[2, TB]: idx | tag<<31
        hc_val = mem["hc_val"][...]
        hc_meta = mem["hc_meta"][...]        # u32[2, TB]: idx

        def _wc_lookup(meta, val, phys):
            """(hit bool[TB], cached value u32[8,TB], cached meta u32[TB])
            for a physical index, checking the entry at its parity slot."""
            par = (phys.astype(U32) & 1) != 0
            m = jnp.where(par, meta[1], meta[0])
            v = _sel8(par, val[1], val[0])
            return (m & 0x7FFFFFFF) == phys.astype(U32), v, m

    def _gated(name, pred, fn):
        """Occupancy-gate `fn` (→ u32[rows, TB]) behind a pl.when region.

        Value-form lax.cond does NOT skip its branch at runtime on Mosaic
        (measured: a runtime-false cond saves ~1%, compile-time removal
        13% — tools/ablate_fused.py `rt` group); pl.when DOES (runtime-
        false ≈ removed, `rtw` group).  So every occupancy gate routes its
        result through a scratch ref written inside pl.when; the zero
        store mirrors the old cond's zero branch."""
        ref = mem[name]
        ref[...] = jnp.zeros(ref.shape, dtype=U32)

        @pl.when(pred)
        def _run():
            ref[...] = fn()
        return ref[...]
    D = config.max_depth
    p = params
    M = OperandMode
    OP = Opcode

    # carried booleans ride as u32 (i1 vectors in a fori carry crash the
    # Mosaic compile helper on this toolchain — bisected)
    frozen = v["done"].astype(BOOL)
    active = ~frozen
    lane_error = v["lane_error"].astype(BOOL)

    # the CURRENT frame rides in a dedicated VMEM cache (v["cur_*"]), not
    # gathered from the [D, ...] callstack arrays: the full-depth one-hot
    # gather + the every-cycle writeback scatter were ~1/6 of the cycle
    # cost (tools/ablate_fused.py stage profile); the cs arrays are now
    # touched only on push/pop and at the chunk boundary.
    depth = v["depth"]
    scal = v["cur_scal"]                            # [NF, TB]
    this_addr = v["cur_this"]                       # [5, TB]
    msg_sender = v["cur_sender"]
    code_addr = v["cur_code"]
    frame_u128 = v["cur_u128"]                      # [4, TB]

    pc = scal[CS["pc"]]
    code_page = scal[CS["code_page"]]
    ergs0 = scal[CS["ergs_remaining"]]
    flags_word = scal[CS["flags_word"]]
    is_static = (flags_word & 1).astype(BOOL)
    is_local_frame = ((flags_word >> 1) & 1).astype(BOOL)
    base_page = scal[CS["base_memory_page"]]
    heap_bound0 = scal[CS["heap_bound"]]
    aux_bound0 = scal[CS["aux_heap_bound"]]

    cut = _stage_cut(v, 0, v["timestamp"] ^ scal[CS["pc"]])
    if cut is not None:
        return cut, [], None, None, None, None

    # ---- fetch: super-pc cache + pending override (batched_vm.py:230-263)
    pending = v["pending_exception"].astype(BOOL)
    super_pc = pc >> 2
    sub_pc = pc & 3
    pages_differ = code_page != v["previous_code_page"]
    code_read_needed = (~pending) & (pages_differ
                                     | (super_pc != v["previous_super_pc"]))
    cb_page_tab = mem["cb_page"][...]
    cb_match = (cb_page_tab == code_page[None, :]) & consts["cb_valid"]  # [P,TB]
    piota = jax.lax.broadcasted_iota(U32, cb_match.shape, 0)
    code_slot = _usum(jnp.where(cb_match, piota, 0), axis=0)
    code_page_found = jnp.any(cb_match, axis=0)
    fetched = _gated(
        "g_fetch", jnp.any(code_read_needed & ~frozen),
        lambda: _gather_arena_l(consts["code"],
                                code_slot * config.code_words + super_pc))
    lane_error = lane_error | (active & code_read_needed
                               & (~code_page_found
                                  | (super_pc >= config.code_words)))
    code_word = _sel8(code_read_needed, fetched, v["previous_code_word"])
    new_prev_code_word = code_word
    new_prev_super_pc = jnp.where(code_read_needed | pending,
                                  super_pc, v["previous_super_pc"])
    new_prev_code_page = code_page

    lo_idx = (6 - 2 * sub_pc).astype(I32)
    insn_lo = _gather_l(code_word, lo_idx)
    insn_hi = _gather_l(code_word, lo_idx + 1)
    insn_lo = jnp.where(pending, U32(_PANIC_LO), insn_lo)
    insn_hi = jnp.where(pending, U32(_PANIC_HI), insn_hi)
    new_pending = jnp.zeros_like(pending)

    cut = _stage_cut(v, 1, insn_lo ^ insn_hi)
    if cut is not None:
        return cut, [], None, None, None, None

    # ---- decode + masking (batched_vm.py:265-396)
    raw_variant = insn_lo & VARIANT_MASK
    condition = (insn_lo >> 11) & 7
    src0_reg = (insn_lo >> 16) & 0xF
    src1_reg = (insn_lo >> 20) & 0xF
    dst0_reg = (insn_lo >> 24) & 0xF
    dst1_reg = (insn_lo >> 28) & 0xF
    imm0 = insn_hi & U16_MASK
    imm1 = (insn_hi >> 16) & U16_MASK

    fam16, sub_raw, combo, src0_mode_raw, dst0_mode_raw = \
        _decode_family(raw_variant)
    flag0_raw = (combo & 1).astype(BOOL)
    flag1_raw = ((combo >> 1) & 1).astype(BOOL)

    cut = _stage_cut(v, 11, fam16 ^ sub_raw ^ combo ^ src0_mode_raw
                     ^ dst0_mode_raw ^ imm0 ^ imm1)
    if cut is not None:
        return cut, [], None, None, None, None

    invalid = fam16 == OP.INVALID
    requires_kernel = ((fam16 == OP.CONTEXT)
                       & (sub_raw >= ContextOp.SET_CONTEXT_U128)) \
        | ((fam16 == OP.LOG) & (sub_raw == LogOp.PRECOMPILE_CALL)) \
        | ((fam16 == OP.FAR_CALL) & (sub_raw == 2))
    allowed_in_static = ~(
        ((fam16 == OP.LOG) & (sub_raw >= LogOp.STORAGE_WRITE)
         & (sub_raw <= LogOp.TO_L1_MESSAGE))
        | ((fam16 == OP.CONTEXT) & (sub_raw == ContextOp.SET_CONTEXT_U128)))

    rich = ((src0_mode_raw >= M.FULL_STACK_PUSH_POP)
            & (src0_mode_raw != M.FULL_IMM16)) \
        | ((dst0_mode_raw >= M.FULL_STACK_PUSH_POP)
           & (dst0_mode_raw <= M.FULL_ABS_STACK))
    alu_like = (fam16 <= OP.JUMP) | (fam16 == OP.SHIFT) \
        | (fam16 == OP.BINOP) | (fam16 == OP.PTR)
    price = jnp.where(rich, U32(p.RICH_ADDRESSING_OPCODE_ERGS),
                      U32(p.AVERAGE_OPCODE_ERGS))
    lp = [p.STORAGE_READ_IO_PRICE, p.STORAGE_WRITE_IO_PRICE,
          p.EVENT_IO_PRICE, p.L1_MESSAGE_IO_PRICE,
          p.PRECOMPILE_CALL_BASE_PRICE]
    log_price = jnp.zeros_like(price)
    for s_, val in enumerate(lp):
        log_price = jnp.where(sub_raw == s_, U32(val), log_price)
    price = jnp.where(alu_like | (fam16 == OP.CONTEXT), price,
            jnp.where(fam16 == OP.LOG, log_price,
            jnp.where(fam16 == OP.NEAR_CALL, U32(p.NEAR_CALL_ERGS),
            jnp.where(fam16 == OP.FAR_CALL, U32(p.FAR_CALL_ERGS),
            jnp.where(fam16 == OP.RET, U32(p.RET_ERGS),
            jnp.where(fam16 == OP.UMA, U32(p.UMA_ERGS),
                      U32(p.INVALID_OPCODE_ERGS)))))))

    cut = _stage_cut(v, 12, price ^ invalid.astype(U32)
                     ^ requires_kernel.astype(U32)
                     ^ allowed_in_static.astype(U32))
    if cut is not None:
        return cut, [], None, None, None, None

    not_enough = ergs0 < price
    ergs1 = jnp.where(not_enough, 0, ergs0 - price)

    is_kernel = _addr_is_kernel_l(this_addr)
    callstack_full = depth >= p.VM_MAX_STACK_DEPTH
    mask_panic = invalid | not_enough | (requires_kernel & ~is_kernel) \
        | (~allowed_in_static & is_static) | callstack_full

    lt_f = v["flags"][0].astype(BOOL)
    eq_f = v["flags"][1].astype(BOOL)
    gt_f = v["flags"][2].astype(BOOL)
    # stacked as u32: jnp.stack over i1 vectors crashes Mosaic (bisected)
    cond_rows = jnp.stack([
        jnp.ones_like(lt_f).astype(U32), gt_f.astype(U32), lt_f.astype(U32),
        eq_f.astype(U32), (gt_f | eq_f).astype(U32),
        (lt_f | eq_f).astype(U32), (~eq_f).astype(U32),
        (gt_f | lt_f).astype(U32)], axis=0)          # u32[8, TB]
    cond_met = jnp.any((cond_rows != 0) & _onehot_l(condition, 8), axis=0)
    mask_nop = (~cond_met) & (~mask_panic)

    cut = _stage_cut(v, 13, mask_panic.astype(U32)
                     ^ mask_nop.astype(U32) ^ ergs1)
    if cut is not None:
        return cut, [], None, None, None, None

    zeroed = mask_panic | mask_nop
    src0_reg = jnp.where(zeroed, 0, src0_reg)
    src1_reg = jnp.where(zeroed, 0, src1_reg)
    dst0_reg = jnp.where(zeroed, 0, dst0_reg)
    dst1_reg = jnp.where(zeroed, 0, dst1_reg)
    imm0 = jnp.where(zeroed, 0, imm0)
    imm1 = jnp.where(zeroed, 0, imm1)

    def ov(raw_field, panic_const, nop_const):
        return jnp.where(mask_panic, U32(panic_const),
                         jnp.where(mask_nop, U32(nop_const),
                                   raw_field.astype(U32)))

    opcode = ov(fam16, OP.RET, OP.NOP)
    sub_variant = ov(sub_raw, RetOp.PANIC, 0)
    src0_mode = ov(src0_mode_raw, M.REG_ONLY, M.FULL_REG)
    dst0_mode = ov(dst0_mode_raw, M.REG_ONLY, M.FULL_REG)
    vflag0 = flag0_raw & ~zeroed
    vflag1 = flag1_raw & ~zeroed
    set_flags = vflag0 & ((opcode >= OP.ADD) & (opcode <= OP.DIV)
                          | (opcode == OP.SHIFT) | (opcode == OP.BINOP))
    swap_operands = (vflag1 & ((opcode == OP.SUB) | (opcode == OP.DIV)
                               | (opcode == OP.SHIFT))) \
        | (vflag0 & (opcode == OP.PTR))
    src0_can_ptr = (opcode == OP.PTR) | (opcode == OP.RET) \
        | (opcode == OP.FAR_CALL) \
        | ((opcode == OP.UMA) & (sub_variant == UMAOp.FAT_POINTER_READ))
    src1_can_ptr = opcode == OP.PTR

    def read_reg(idx):
        shifted = idx.astype(I32) - 1  # r0 selects nothing -> zero
        val = _gather_l(v["regs"], shifted)
        tag = _gather_l(v["reg_ptr"], shifted) != 0
        return val, tag

    def read_reg_low(idx):
        """Limb 0 only (address generation) — 1/8 the sweep of read_reg."""
        return _gather_l(v["regs"][:, 0, :], idx.astype(I32) - 1)

    cut = _stage_cut(v, 21, opcode ^ sub_variant ^ src0_mode ^ dst0_mode
                     ^ set_flags.astype(U32) ^ price)
    if cut is not None:
        return cut, [], None, None, None, None


    sp0 = scal[CS["sp"]]
    src0_reg_val, src0_reg_tag = read_reg(src0_reg)
    vaddr0 = ((src0_reg_val[0] & U16_MASK) + imm0) & U16_MASK
    src0_pushpop = src0_mode == M.FULL_STACK_PUSH_POP
    src0_stack_off = src0_mode == M.FULL_STACK_OFFSET
    src0_abs = src0_mode == M.FULL_ABS_STACK
    src0_code = src0_mode == M.FULL_CODE_PAGE
    sp1 = jnp.where(src0_pushpop, (sp0 - vaddr0) & U16_MASK, sp0)
    src0_loc = jnp.where(src0_pushpop, sp1,
                jnp.where(src0_stack_off, (sp1 - vaddr0) & U16_MASK, vaddr0))
    src0_is_stack_mem = src0_pushpop | src0_stack_off | src0_abs

    cut = _stage_cut(v, 22, src0_reg_val[0] ^ src0_loc ^ sp1
                     ^ src0_reg_tag.astype(U32))
    if cut is not None:
        return cut, [], None, None, None, None

    dst0_reg_low = read_reg_low(dst0_reg)
    vaddr1 = ((dst0_reg_low & U16_MASK) + imm1) & U16_MASK
    dst0_pushpop = dst0_mode == M.FULL_STACK_PUSH_POP
    dst0_stack_off = dst0_mode == M.FULL_STACK_OFFSET
    dst0_abs = dst0_mode == M.FULL_ABS_STACK
    sp2 = jnp.where(dst0_pushpop, (sp1 + vaddr1) & U16_MASK, sp1)
    dst0_loc = jnp.where(dst0_pushpop, sp1,
                jnp.where(dst0_stack_off, (sp2 - vaddr1) & U16_MASK, vaddr1))
    dst0_is_stack_mem = dst0_pushpop | dst0_stack_off | dst0_abs

    is_nop_op = opcode == OP.NOP
    do_src0_mem_read = (src0_is_stack_mem | src0_code) & ~is_nop_op

    cut = _stage_cut(v, 23, dst0_loc ^ sp2
                     ^ do_src0_mem_read.astype(U32))
    if cut is not None:
        return cut, [], None, None, None, None

    src0_phys, src0_in_window = _map_stack_index_l(config, src0_loc)
    # tile-occupancy conds around the arena SWEEPS (the one-hot compare+
    # reduce compute is the per-cycle floor — ~1us per 256-word sweep at
    # TB=256 — so the whole gather lives inside the cond; gating only the
    # ref load while sweeping a zeros array saved nothing, measured)
    if cache_on:
        st_hit, st_cval, st_cmeta = _wc_lookup(stc_meta, stc_val, src0_phys)
        any_stack_read = jnp.any(do_src0_mem_read & src0_is_stack_mem
                                 & ~st_hit)
    else:
        st_hit = jnp.zeros((TB,), dtype=BOOL)
        any_stack_read = jnp.any(do_src0_mem_read & src0_is_stack_mem)
    if "stack_rw" in DEBUG_SKIP:  # perf probe: perfect-stack-cache bound
        any_stack_read = jnp.bool_(False)
    if "stack_rw_rt" in DEBUG_SKIP:  # probe: does a RUNTIME-false cond
        # actually skip the sweep on Mosaic, or lower to both-branches?
        any_stack_read = jnp.any(v["done"] > U32(1))  # always false
    sread = _gated(
        "g_stack", any_stack_read,
        lambda: jnp.concatenate(
            [_gather_arena_l(stack_arena, src0_phys),
             _gather_l(stack_tag_arena, src0_phys)[None, :]], axis=0))
    stack_val, stack_tag_u = sread[:8], sread[8]
    if cache_on:
        stack_val = _sel8(st_hit, st_cval, stack_val)
        stack_tag_u = jnp.where(st_hit, st_cmeta >> 31, stack_tag_u)
    stack_tag = stack_tag_u.astype(BOOL)
    code_val = _gated(
        "g_code", jnp.any(do_src0_mem_read & src0_code),
        lambda: _gather_arena_l(consts["code"],
                                code_slot * config.code_words + src0_loc))
    lane_error = lane_error | (active & do_src0_mem_read & src0_is_stack_mem
                               & ~src0_in_window)
    lane_error = lane_error | (active & do_src0_mem_read & src0_code
                               & (src0_loc >= config.code_words))

    cut = _stage_cut(v, 24, stack_val[0] ^ code_val[0]
                     ^ stack_tag.astype(U32) ^ lane_error.astype(U32))
    if cut is not None:
        return cut, [], None, None, None, None

    src0_mem_val = _sel8(src0_code, code_val, stack_val)
    src0_mem_tag = (~src0_code & stack_tag) & do_src0_mem_read

    use_reg = (src0_mode == M.REG_ONLY) | (src0_mode == M.FULL_REG) \
        | (src0_mode == M.REG_OR_IMM_REG)
    use_imm = (src0_mode == M.FULL_IMM16) | (src0_mode == M.REG_OR_IMM_IMM)
    src0 = _sel8(use_reg, src0_reg_val,
                 _sel8(use_imm, _u256_from_u32(imm0, TB), src0_mem_val))
    src0_tag = _bsel(use_reg, src0_reg_tag, ~use_imm & src0_mem_tag)
    cut = _stage_cut(v, 25, src0[0] ^ src0_tag.astype(U32))
    if cut is not None:
        return cut, [], None, None, None, None

    src1, src1_tag = read_reg(src1_reg)

    src0, src1 = (_sel8(swap_operands, src1, src0),
                  _sel8(swap_operands, src0, src1))
    src0_tag, src1_tag = (_bsel(swap_operands, src1_tag, src0_tag),
                          _bsel(swap_operands, src0_tag, src1_tag))

    cut = _stage_cut(v, 26, src0[0] ^ src1[0] ^ src1_tag.astype(U32))
    if cut is not None:
        return cut, [], None, None, None, None

    new_pc_lin = (pc + 1) & U16_MASK

    # pointer-taint erasure (cycle.rs:374-396)
    def erase(val, tag, can_ptr):
        do = tag & ~can_ptr & ~is_kernel
        erased = jnp.concatenate(
            [val[:1], jnp.zeros_like(val[1:4]), val[4:]], axis=0)
        return _sel8(do, erased, val), tag & ~do

    src0, src0_tag = erase(src0, src0_tag, src0_can_ptr)
    src1, src1_tag = erase(src1, src1_tag, src1_can_ptr)

    cut = _stage_cut(v, 2, src0[0] ^ src1[0] ^ dst0_loc ^ sp2)
    if cut is not None:
        return cut, [], None, None, None, None

    # ---- opcode family predicates (batched_vm.py:476-495)
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
    pp_enabled = log_enabled and config.precompile_keccak_blocks > 0
    if log_enabled:
        if pp_enabled:
            unsupported = jnp.zeros((TB,), dtype=BOOL)
        else:
            unsupported = is_log & (sub_variant == LogOp.PRECOMPILE_CALL)
    else:
        unsupported = (opcode == OP.FAR_CALL) | is_log
    lane_error = lane_error | (active & unsupported)

    sum_val, carry = _u256_add(src0, src1)
    diff_val, borrow = _u256_sub(src0, src1)

    z8 = jnp.zeros((8, TB), dtype=U32)
    if "mul" in DEBUG_SKIP:
        mul_lo, mul_hi = z8, z8
    else:
        mul2 = _gated("g_mul", jnp.any(is_mul),
                      lambda: jnp.concatenate(
                          _u256_mul_full(src0, src1), axis=0))
        mul_lo, mul_hi = mul2[:8], mul2[8:]
    if "div" in DEBUG_SKIP:
        div_q, div_r = z8, z8
    else:
        div2 = _gated("g_div", jnp.any(is_div),
                      lambda: jnp.concatenate(
                          _u256_div_mod(src0, src1), axis=0))
        div_q, div_r = div2[:8], div2[8:]
    div_by_zero = _u256_is_zero(src1)

    shift_amount = src1[0] & 0xFF

    def shift_unit():
        n = shift_amount
        s = sub_variant
        return _sel8(s == ShiftOp.SHL, _u256_shl(src0, n),
               _sel8(s == ShiftOp.SHR, _u256_shr(src0, n),
               _sel8(s == ShiftOp.ROL, _u256_rol(src0, n),
                     _u256_ror(src0, n))))

    shift_val = z8 if "shift" in DEBUG_SKIP else \
        _gated("g_shift", jnp.any(is_shift), shift_unit)

    binop_val = _sel8(sub_variant == 0, src0 ^ src1,
                 _sel8(sub_variant == 1, src0 & src1, src0 | src1))

    cut = _stage_cut(v, 3, sum_val[0] ^ diff_val[0] ^ mul_lo[0]
                     ^ div_q[0] ^ shift_val[0] ^ binop_val[0])
    if cut is not None:
        return cut, [], None, None, None, None

    # ---- context (context.rs; batched_vm.py:534-562)
    ctx_sub = sub_variant
    shard_this = scal[CS["shard_ids"]] & 0xFF
    shard_caller = (scal[CS["shard_ids"]] >> 8) & 0xFF
    shard_code = (scal[CS["shard_ids"]] >> 16) & 0xFF
    ztb = jnp.zeros((TB,), dtype=U32)
    meta = jnp.stack([
        v["ergs_per_pubdata"], ztb, heap_bound0, aux_bound0,
        ztb, ztb, ztb,
        shard_this | (shard_caller << 8) | (shard_code << 16)], axis=0)
    u128_as_u256 = jnp.concatenate(
        [frame_u128, jnp.zeros((4, TB), dtype=U32)], axis=0)
    ctx_val = _sel8(ctx_sub == ContextOp.THIS, _addr_to_u256_l(this_addr),
              _sel8(ctx_sub == ContextOp.CALLER, _addr_to_u256_l(msg_sender),
              _sel8(ctx_sub == ContextOp.CODE_ADDRESS,
                    _addr_to_u256_l(code_addr),
              _sel8(ctx_sub == ContextOp.META, meta,
              _sel8(ctx_sub == ContextOp.ERGS_LEFT,
                    _u256_from_u32(ergs1, TB),
              _sel8(ctx_sub == ContextOp.SP, _u256_from_u32(sp2, TB),
                    u128_as_u256))))))
    ctx_writes_dst = is_ctx & (ctx_sub <= ContextOp.GET_CONTEXT_U128)
    ctx_set_u128 = is_ctx & (ctx_sub == ContextOp.SET_CONTEXT_U128)
    ctx_set_pubdata = is_ctx & (ctx_sub == ContextOp.SET_ERGS_PER_PUBDATA_BYTE)
    ctx_inc_tx = is_ctx & (ctx_sub == ContextOp.INCREMENT_TX_NUMBER)

    new_context_u128 = _sel8(ctx_set_u128, src0[:4], v["context_u128"])
    new_ergs_per_pubdata = jnp.where(ctx_set_pubdata, src0[0],
                                     v["ergs_per_pubdata"])
    new_tx_number = jnp.where(ctx_inc_tx, (v["tx_number"] + 1) & U16_MASK,
                              v["tx_number"])

    # ---- ptr ops (ptr.rs; batched_vm.py:564-595)
    ptr_sub = sub_variant
    fp_offset = src0[0]
    fp_length = src0[3]
    src1_low32 = src1[0]
    src1_ge_2_32 = (src1[1] != 0) | (src1[2] != 0) | (src1[3] != 0) \
        | (src1[4] != 0) | (src1[5] != 0) | (src1[6] != 0) | (src1[7] != 0)
    ptr_basic_panic = is_ptr & (~src0_tag | src1_tag)
    ptr_addsub = is_ptr & (ptr_sub <= PtrOp.SUB)
    ptr_range_panic = ptr_addsub & src1_ge_2_32
    new_off_add = fp_offset + src1_low32
    add_of = new_off_add < fp_offset
    new_off_sub = fp_offset - src1_low32
    sub_uf = fp_offset < src1_low32
    ptr_off_panic = is_ptr & (
        ((ptr_sub == PtrOp.ADD) & add_of) | ((ptr_sub == PtrOp.SUB) & sub_uf))
    src1_low128_nz = (src1[0] != 0) | (src1[1] != 0) | (src1[2] != 0) \
        | (src1[3] != 0)
    ptr_pack_panic = is_ptr & (ptr_sub == PtrOp.PACK) & src1_low128_nz
    new_len = fp_length - src1_low32
    shrink_uf = fp_length < src1_low32
    ptr_shrink_panic = is_ptr & (ptr_sub == PtrOp.SHRINK) & shrink_uf
    ptr_panic = ptr_basic_panic | ptr_range_panic | ptr_off_panic \
        | ptr_pack_panic | ptr_shrink_panic

    ptr_result = src0
    ptr_result = _set_row(ptr_result, 0, jnp.where(
        ptr_sub == PtrOp.ADD, new_off_add,
        jnp.where(ptr_sub == PtrOp.SUB, new_off_sub, src0[0])))
    ptr_result = _set_row(ptr_result, 3, jnp.where(
        ptr_sub == PtrOp.SHRINK, new_len, ptr_result[3]))
    pack_result = jnp.concatenate([src0[:4], src1[4:]], axis=0)
    ptr_result = _sel8(ptr_sub == PtrOp.PACK, pack_result, ptr_result)
    ptr_writes = is_ptr & ~ptr_panic

    cut = _stage_cut(v, 4, ctx_val[0] ^ ptr_result[0]
                     ^ ptr_panic.astype(U32))
    if cut is not None:
        return cut, [], None, None, None, None

    # ---- UMA (uma.rs; batched_vm.py:597-728)
    uma_sub = sub_variant
    uma_is_heap = is_uma & ((uma_sub == UMAOp.HEAP_READ)
                            | (uma_sub == UMAOp.HEAP_WRITE))
    uma_is_aux = is_uma & ((uma_sub == UMAOp.AUX_HEAP_READ)
                           | (uma_sub == UMAOp.AUX_HEAP_WRITE))
    uma_is_ptr_read = is_uma & (uma_sub == UMAOp.FAT_POINTER_READ)
    uma_is_read = is_uma & ((uma_sub == UMAOp.HEAP_READ)
                            | (uma_sub == UMAOp.AUX_HEAP_READ)) \
        | uma_is_ptr_read
    uma_is_write = is_uma & ~uma_is_read
    uma_increment = is_uma & vflag0

    u_offset = src0[0]
    u_page_field = src0[1]
    u_start = src0[2]
    u_length = src0[3]

    heap_page = base_page + 2
    aux_page = base_page + 3
    cur_heap_slot = scal[CS["heap_slot"]]

    uma_exc_not_ptr = uma_is_ptr_read & ~src0_tag
    ptr_in_bounds = u_offset < u_length
    uma_skip_oob_ptr = uma_is_ptr_read & ~ptr_in_bounds
    src0_gt_max = (src0[1] != 0) | (src0[2] != 0) | (src0[3] != 0) \
        | (src0[4] != 0) | (src0[5] != 0) | (src0[6] != 0) | (src0[7] != 0) \
        | (u_offset > U32(p.MAX_OFFSET_TO_DEREF))
    uma_exc_deref = (uma_is_heap | uma_is_aux) & src0_gt_max
    src_byte_off = jnp.where(uma_is_ptr_read, u_start + u_offset, u_offset)

    incremented = u_offset + 32
    increment_of = incremented < u_offset
    uma_exc_incr = is_uma & increment_of

    cur_bound = jnp.where(uma_is_heap, heap_bound0, aux_bound0)
    growth_uf = incremented < cur_bound
    growth = jnp.where(growth_uf, 0, incremented - cur_bound)
    growth = jnp.where(uma_is_heap | uma_is_aux, growth, 0)
    new_heap_bound_u = jnp.where(uma_is_heap & ~growth_uf, incremented,
                                 heap_bound0)
    new_aux_bound_u = jnp.where(uma_is_aux & ~growth_uf, incremented,
                                aux_bound0)

    uma_cost = growth * p.MEMORY_GROWTH_ERGS_PER_BYTE
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

    # fat-pointer page resolution through the heap page tables
    hp_page_tab = mem["hp_page"][...]
    ap_page_tab = mem["ap_page"][...]
    hp_match = hp_page_tab == u_page_field[None, :]    # [F, TB]
    ap_match = ap_page_tab == u_page_field[None, :]
    fiota = jax.lax.broadcasted_iota(U32, hp_match.shape, 0)
    ptr_heap_slot = _usum(jnp.where(hp_match, fiota, 0), axis=0)
    ptr_aux_slot = _usum(jnp.where(ap_match, fiota, 0), axis=0)
    ptr_page_is_heap = uma_is_ptr_read & jnp.any(hp_match, axis=0)
    ptr_page_is_aux = uma_is_ptr_read & ~ptr_page_is_heap \
        & jnp.any(ap_match, axis=0)
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

    need_h = do_mem & use_heap_arena
    need_a = do_mem & use_aux_arena
    if "heap_rw" in DEBUG_SKIP:  # perf probe: perfect-heap-cache bound
        need_h = jnp.zeros_like(need_h)
        need_a = jnp.zeros_like(need_a)
    h_phys0 = h_base + word0
    h_phys1 = h_base + word1
    if cache_on:
        h_hit0, h_cv0, _ = _wc_lookup(hc_meta, hc_val, h_phys0)
        h_hit1, h_cv1, _ = _wc_lookup(hc_meta, hc_val, h_phys1)
        miss_h0 = need_h & ~h_hit0
        miss_h1 = need_h & is_unaligned & ~h_hit1
    else:
        miss_h0 = need_h
        miss_h1 = need_h & is_unaligned
    w0_heap = _gated("g_hw0", jnp.any(miss_h0),
                     lambda: _gather_arena_l(heap_arena, h_phys0))
    w1_heap = _gated("g_hw1", jnp.any(miss_h1),
                     lambda: _gather_arena_l(heap_arena, h_phys1))
    if cache_on:
        w0_heap = _sel8(h_hit0, h_cv0, w0_heap)
        w1_heap = _sel8(h_hit1, h_cv1, w1_heap)
    w0_aux = _gated("g_aw0", jnp.any(need_a),
                    lambda: _gather_arena_l(aux_arena, a_base + word0))
    w1_aux = _gated("g_aw1", jnp.any(need_a & is_unaligned),
                    lambda: _gather_arena_l(aux_arena, a_base + word1))
    w0 = _sel8(do_mem, _sel8(use_heap_arena, w0_heap, w0_aux), z8)
    w1 = _sel8(do_mem & is_unaligned,
               _sel8(use_heap_arena, w1_heap, w1_aux), z8)

    una_bits = unalign * 8
    beyond_uf = incremented < u_length
    beyond = jnp.where(beyond_uf | uma_skip_mem, 0, incremented - u_length) \
        & 31
    bb = beyond * 8
    sv = src1
    keep_hi_bits = (32 - unalign) * 8
    # the splice shifts cost ~1.2us/cycle unconditionally (measured,
    # tools/ablate_fused.py): occupancy-gate the whole unit on any UMA in
    # the tile, and inside it take the aligned fast path (unalign == 0 ->
    # read_val = w0, new_w0 = src1, new_w1 = w1 — the shl/shr identities
    # below fold to exactly that) when no lane is unaligned this cycle.
    any_uma_mem = jnp.any(do_mem)

    def splice_unaligned():
        read_val = _u256_shl(w0, una_bits) | _u256_shr(w1, 256 - una_bits)
        new_w0 = _u256_shl(_u256_shr(w0, keep_hi_bits), keep_hi_bits) \
            | _u256_shr(sv, una_bits)
        new_w1 = _u256_shr(_u256_shl(w1, una_bits), una_bits) \
            | _u256_shl(sv, keep_hi_bits)
        return read_val, new_w0, new_w1

    if "uma_shift" in DEBUG_SKIP:
        read_val, new_w0, new_w1 = w0, sv, sv
    else:
        spl_ref = mem["g_splice"]
        spl_ref[...] = jnp.zeros(spl_ref.shape, dtype=U32)
        any_unal = jnp.any(do_mem & is_unaligned)

        @pl.when(any_uma_mem & ~any_unal)
        def _splice_aligned():  # the shl/shr identities fold to exactly this
            spl_ref[...] = jnp.concatenate([w0, sv, w1], axis=0)

        @pl.when(any_unal)
        def _splice_full():  # formulas subsume aligned lanes (una == 0)
            spl_ref[...] = jnp.concatenate(splice_unaligned(), axis=0)

        spl = spl_ref[...]
        read_val, new_w0, new_w1 = spl[:8], spl[8:16], spl[16:24]

    def ptr_mask_unit():
        masked = _u256_shl(_u256_shr(read_val, bb), bb)
        return _sel8(uma_is_ptr_read, masked, read_val)

    pmask_on = uma_is_ptr_read & do_mem
    pm = _gated("g_pmask", jnp.any(pmask_on), ptr_mask_unit)
    read_val = _sel8(pmask_on, pm, read_val)

    uma_do_write = uma_is_write & ~uma_skip_mem
    uma_do_read_mem = is_uma & ~uma_skip_mem

    incremented_src0 = _set_row(src0, 0, incremented)

    cut = _stage_cut(v, 5, read_val[0] ^ new_w0[0] ^ new_w1[0]
                     ^ uma_cost ^ uma_slot)
    if cut is not None:
        return cut, [], None, None, None, None

    # ---- log family (log.rs; port of batched_vm.py:730-831)
    ts_log = v["timestamp"] + 1
    shard_this_u8 = scal[CS["shard_ids"]] & 0xFF
    is_rollup = shard_this_u8 == 0
    log_sub = sub_variant
    l_sread = is_log & (log_sub == LogOp.STORAGE_READ)
    l_swrite = is_log & (log_sub == LogOp.STORAGE_WRITE)
    l_event = is_log & (log_sub == LogOp.EVENT)
    l_tol1 = is_log & (log_sub == LogOp.TO_L1_MESSAGE)
    if log_enabled:
        S = config.storage_slots
        J = config.journal_slots
        E = config.event_slots
        st_key_arr = mem["st_key"][...]          # [S, 14, TB]
        st_val_arr = mem["st_val"][...]          # [S, 8, TB]
        st_used_arr = mem["st_used"][...].astype(BOOL)   # [S, TB]
        l_precomp = is_log & (log_sub == LogOp.PRECOMPILE_CALL)
        ergs_on_pubdata = jnp.where(
            l_swrite & is_rollup,
            v["ergs_per_pubdata"]
            * p.INITIAL_STORAGE_WRITE_PUBDATA_BYTES,
            jnp.where(l_tol1,
                      v["ergs_per_pubdata"] * p.L1_MESSAGE_PUBDATA_BYTES,
                      0))
        log_extra_cost = jnp.where(l_precomp, src1[0], 0)
        log_total_cost = ergs_on_pubdata + log_extra_cost
        log_not_enough = log_total_cost > ergs2
        ergs_after_log = jnp.where(
            is_log & log_not_enough, 0,
            ergs2 - jnp.where(is_log, log_total_cost, 0))
        new_spent_pubdata = v["spent_pubdata"] + jnp.where(
            active & is_log,
            # compare+select, not jnp.minimum: Mosaic cannot legalize
            # vector arith.minui on this toolchain (bisected via the
            # remote compile helper; signed min/max on i32 are fine)
            jnp.where(log_not_enough,
                      jnp.where(ergs2 < ergs_on_pubdata, ergs2,
                                ergs_on_pubdata),
                      ergs_on_pubdata),
            0)
        log_skipped = log_not_enough

        # storage lookup: compare-all over the per-lane KV slots
        key14 = jnp.concatenate(
            [src0, this_addr, shard_this_u8[None, :]], axis=0)  # [14, TB]
        slot_match = jnp.all(st_key_arr == key14[None, :, :], axis=1) \
            & st_used_arr                                   # [S, TB]
        slot_found = jnp.any(slot_match, axis=0)
        current_val = _usum(jnp.where(slot_match[:, None, :],
                                      st_val_arr, 0), axis=0)

        do_sread = l_sread & active & ~zeroed
        do_swrite = l_swrite & active & ~log_skipped
        do_event = (l_event | l_tol1) & active & ~log_skipped
        do_precomp = l_precomp & active & ~log_skipped

        st_count = v["st_count"]
        fresh_needed = do_swrite & ~slot_found
        fresh_oh = _onehot_l(st_count, S) & fresh_needed[None, :]
        lane_error = lane_error | (fresh_needed & (st_count >= S))
        write_oh = (slot_match & do_swrite[None, :]) | fresh_oh
        new_st_key = jnp.where(fresh_oh[:, None, :], key14[None, :, :],
                               st_key_arr)
        new_st_val = jnp.where(write_oh[:, None, :], src1[None, :, :],
                               st_val_arr)
        new_st_used = st_used_arr | fresh_oh
        new_st_count = st_count + fresh_needed.astype(I32)
        siota = jax.lax.broadcasted_iota(I32, (S, TB), 0)
        write_slot = jnp.sum(jnp.where(write_oh, siota, 0), axis=0)

        # journal append (slot, previous value) for rollback
        j_count = v["j_count"]
        j_oh = _onehot_l(j_count, J) & do_swrite[None, :]
        lane_error = lane_error | (do_swrite & (j_count >= J))
        j_slot_arr = mem["j_slot"][...]          # [J, TB] u32-coded i32
        j_prev_arr = mem["j_prev"][...]          # [J, 8, TB]
        new_j_slot = jnp.where(j_oh, write_slot.astype(U32)[None, :],
                               j_slot_arr)
        new_j_prev = jnp.where(j_oh[:, None, :], current_val[None, :, :],
                               j_prev_arr)
        new_j_count = j_count + do_swrite.astype(I32)

        # event journal append
        ev_count = v["ev_count"]
        ev_oh = _onehot_l(ev_count, E) & do_event[None, :]
        lane_error = lane_error | (do_event & (ev_count >= E))
        aux_byte = jnp.where(l_event, U32(p.EVENT_AUX_BYTE),
                             U32(p.L1_MESSAGE_AUX_BYTE))
        ev_meta_row = jnp.stack(
            [ts_log, aux_byte | (vflag0.astype(U32) << 8)
             | (v["tx_number"] << 16)], axis=0)             # [2, TB]
        ev_key_arr = mem["ev_key"][...]
        ev_val_arr = mem["ev_val"][...]
        ev_meta_arr = mem["ev_meta"][...]
        new_ev_key = jnp.where(ev_oh[:, None, :], src0[None, :, :],
                               ev_key_arr)
        new_ev_val = jnp.where(ev_oh[:, None, :], src1[None, :, :],
                               ev_val_arr)
        new_ev_meta = jnp.where(ev_oh[:, None, :], ev_meta_row[None, :, :],
                                ev_meta_arr)
        new_ev_count = ev_count + do_event.astype(I32)

        log_read_result = current_val
    else:
        ergs_after_log = ergs2
        new_spent_pubdata = v["spent_pubdata"]
        fB2 = jnp.zeros((TB,), dtype=BOOL)
        do_sread = do_swrite = do_event = do_precomp = l_precomp = fB2
        log_read_result = jnp.zeros((8, TB), dtype=U32)
        current_val = log_read_result
        aux_byte = jnp.zeros((TB,), dtype=U32)
        new_st_key = new_st_val = new_st_used = None
        new_j_count = v["j_count"]
        new_ev_count = v["ev_count"]
        new_st_count = v["st_count"]

    # ---- precompile unit (keccak256 / sha256 in-cycle; port of
    # batched_vm.py:833-990 minus ecrecover and the pq round-witness queue,
    # which stay on the jnp path — see supported())
    pp_key = src0
    prow = None
    pp_write_h = jnp.zeros((TB,), dtype=BOOL)
    pp_write_a = jnp.zeros((TB,), dtype=BOOL)
    pp_out_val = jnp.zeros((8, TB), dtype=U32)
    pp_out_idx = jnp.zeros((TB,), dtype=U32)
    if pp_enabled:
        MK = config.precompile_keccak_blocks
        MS = max(config.precompile_sha_rounds, 1)
        HW = config.heap_words
        AW = config.aux_heap_words
        pp_in_off = src0[0]
        pp_in_len = src0[1]
        pp_out_off = src0[2]
        pp_page_r = jnp.where(src0[4] == 0, heap_page, src0[4])
        pp_page_w = jnp.where(src0[5] == 0, heap_page, src0[5])
        pp_rounds = src0[6]
        addr16 = this_addr[0] & 0xFFFF
        is_keccak_pc = do_precomp & (
            addr16 == p.KECCAK256_ROUND_FUNCTION_PRECOMPILE_ADDRESS)
        is_sha_pc = do_precomp & (
            addr16 == p.SHA256_ROUND_FUNCTION_PRECOMPILE_ADDRESS)
        pp_any = is_keccak_pc | is_sha_pc
        # ecrecover: the kernel does NOT execute it (the wrapper re-runs
        # the chunk up to the first such cycle and detours that one cycle
        # through the jnp engine — see run_cycles_fused); here it is only
        # DETECTED, and the lane's in-kernel "execution" is garbage that
        # the wrapper discards.
        if config.precompile_ecrecover:
            want_ec = do_precomp & (
                addr16 == p.ECRECOVER_INNER_FUNCTION_PRECOMPILE_ADDRESS)
        else:
            want_ec = None

        def page_slot(page):
            hm = hp_page_tab == page[None, :]
            am = ap_page_tab == page[None, :]
            on_h = jnp.any(hm, axis=0)
            on_a = ~on_h & jnp.any(am, axis=0)
            fi = jax.lax.broadcasted_iota(U32, hm.shape, 0)
            slot = jnp.where(on_h, _usum(jnp.where(hm, fi, 0), axis=0),
                             _usum(jnp.where(am, fi, 0), axis=0))
            return on_h, on_a, slot

        r_on_h, r_on_a, r_slot = page_slot(pp_page_r)
        w_on_h, w_on_a, pp_w_slot = page_slot(pp_page_w)
        lane_error = lane_error | (pp_any & ~(r_on_h | r_on_a)) \
            | (pp_any & ~(w_on_h | w_on_a))

        def read_in_word(idx):
            phys = r_slot * HW + idx
            hv = _gather_arena_l(heap_arena, phys)
            if cache_on:  # read-through: cached heap words overlay the arena
                ph, pv, _ = _wc_lookup(hc_meta, hc_val, phys)
                hv = _sel8(ph, pv, hv)
            av = _gather_arena_l(aux_arena, r_slot * AW + idx)
            return _sel8(r_on_h, hv, av)

        # ---- keccak256: byte-stream sponge with XOR-padding ----
        kc_blocks = pp_in_len // 136 + 1
        kc_last = kc_blocks * 136 - 1
        lane_error = lane_error | (is_keccak_pc & (kc_blocks > MK))

        def keccak_unit():
            _perm = lambda lo, hi, unroll: _keccak_f1600_kernel(lo, hi)

            lo = [ztb for _ in range(25)]
            hi = [ztb for _ in range(25)]
            for k in range(MK):
                blk_on = is_keccak_pc & (k < kc_blocks)
                base_byte = pp_in_off + k * 136
                base_word = base_byte >> 5
                window = [read_in_word(base_word + w) for w in range(6)]
                wb = []
                for w in range(6):
                    for j in range(32):  # BE byte j of the 32-byte word
                        limb = window[w][7 - j // 4]
                        wb.append((limb >> (8 * (3 - j % 4))) & 0xFF)
                wbv = jnp.stack(wb, axis=0)                # u32[192, TB]
                sh = base_byte & 31
                aligned = jnp.zeros((136, TB), dtype=U32)
                for s_ in range(32):
                    aligned = aligned + (sh == s_).astype(U32)[None, :] \
                        * wbv[s_:s_ + 136]
                g = jax.lax.broadcasted_iota(U32, (136, TB), 0) + k * 136
                data = jnp.where(g < pp_in_len[None, :], aligned, 0)
                blk = data ^ jnp.where(g == pp_in_len[None, :], 0x01, 0) \
                    ^ jnp.where(g == kc_last[None, :], 0x80, 0)
                for l_ in range(17):
                    lane_lo = sum((blk[8 * l_ + t] << (8 * t))
                                  for t in range(4))
                    lane_hi = sum((blk[8 * l_ + t] << (8 * (t - 4)))
                                  for t in range(4, 8))
                    lo[l_] = lo[l_] ^ jnp.where(blk_on, lane_lo, 0)
                    hi[l_] = hi[l_] ^ jnp.where(blk_on, lane_hi, 0)
                # fori form, matching the jnp unit: the unrolled 24-round
                # chain makes the XLA:CPU interpret-mode compile explode
                plo, phi = _perm(lo, hi, unroll=False)
                lo = [jnp.where(blk_on, plo[i], lo[i]) for i in range(25)]
                hi = [jnp.where(blk_on, phi[i], hi[i]) for i in range(25)]
            dbytes = []
            for i in range(32):
                lane_v = lo[i // 8] if (i % 8) < 4 else hi[i // 8]
                dbytes.append((lane_v >> (8 * ((i % 8) % 4))) & 0xFF)
            limbs = []
            for j in range(8):
                limbs.append((dbytes[28 - 4 * j] << 24)
                             | (dbytes[29 - 4 * j] << 16)
                             | (dbytes[30 - 4 * j] << 8)
                             | dbytes[31 - 4 * j])
            return jnp.stack(limbs, axis=0)

        keccak_out = _gated("g_keccak", jnp.any(is_keccak_pc), keccak_unit)

        # ---- sha256 rounds ----
        lane_error = lane_error | (is_sha_pc & (pp_rounds > MS))

        def sha_unit():
            from ..golden.precompiles import SHA256_IV

            st8 = [jnp.full((TB,), iv, dtype=U32) for iv in SHA256_IV]
            for k in range(MS):
                r_on = is_sha_pc & (k < pp_rounds)
                w0 = read_in_word(pp_in_off + 2 * k)
                w1 = read_in_word(pp_in_off + 2 * k + 1)
                block16 = [w0[7 - i] for i in range(8)] \
                    + [w1[7 - i] for i in range(8)]    # BE u32 words
                ns = _sha256_compress_ll(st8, block16)
                st8 = [jnp.where(r_on, ns[i], st8[i]) for i in range(8)]
            return jnp.stack(st8[::-1], axis=0)  # one BE u256 word

        sha_out = _gated("g_sha", jnp.any(is_sha_pc), sha_unit)

        pp_out_val = _sel8(is_keccak_pc, keccak_out, sha_out)
        pp_out_idx = pp_out_off
        hw_ok = pp_out_off < jnp.where(w_on_h, U32(HW), U32(AW))
        lane_error = lane_error | (pp_any & ~hw_ok)
        pp_write_h = pp_any & w_on_h & hw_ok & active
        pp_write_a = pp_any & w_on_a & hw_ok & active
        pp_key = _set_row(_set_row(src0, 4, pp_page_r), 5, pp_page_w)

        # ---- precompile round-witness rows (port of batched_vm.py:997-1066,
        # minus the batch-global block clock: the kernel emits per-cycle
        # rows + an emit flag; the WRAPPER advances the clock, splices the
        # flagged cycles' blocks, and reconciles pq_count/overflow errors)
        if config.precompile_queue_capacity > 0:
            from .state import precompile_queue_slots

            PS_IN, PS_OUT = precompile_queue_slots(config)
            first_word_q = jnp.where(is_keccak_pc, pp_in_off >> 5, pp_in_off)
            kq_words = jnp.where(
                pp_in_len == 0, 0,
                ((pp_in_off + pp_in_len - 1) >> 5) - (pp_in_off >> 5) + 1)
            n_words = jnp.where(is_keccak_pc, kq_words,
                                jnp.where(is_sha_pc, 2 * pp_rounds,
                                          jnp.full((TB,), 4, dtype=U32)))
            rounds_q = jnp.where(is_keccak_pc, kc_blocks,
                                 jnp.where(is_sha_pc, pp_rounds,
                                           jnp.full((TB,), 1, dtype=U32)))
            emit = pp_any
            lane_error = lane_error | (emit & (n_words > PS_IN))

            def in_vals_unit():
                return jnp.stack(
                    [read_in_word(first_word_q + i) for i in range(PS_IN)],
                    axis=0)                              # [PS_IN, 8, TB]

            in_vals = _gated("g_invals", jnp.any(emit), in_vals_unit)

            ts_pread = ts_log
            ts_pwrite = ts_log + 1
            meta_rows, val_rows, flag_rows = [], [], []
            for i in range(PS_IN):
                vq = emit & (i < n_words)
                vqu = vq.astype(U32)
                meta_rows.append(jnp.stack(
                    [ts_pread * vqu, jnp.full((TB,), 3, U32) * vqu,
                     pp_page_r * vqu, (first_word_q + i) * vqu], axis=0))
                val_rows.append(jnp.where(vq[None, :], in_vals[i], 0))
                flag_rows.append(vqu << 2)
            vqu = emit.astype(U32)
            meta_rows.append(jnp.stack(
                [ts_pwrite * vqu, jnp.full((TB,), 1, U32) * vqu,
                 pp_page_w * vqu, pp_out_idx * vqu], axis=0))
            val_rows.append(jnp.where(emit[None, :], pp_out_val, 0))
            flag_rows.append((vqu | (vqu << 2)) | (rounds_q * vqu) << 3)
            prow = (jnp.stack(meta_rows, axis=0),      # [PS, 4, TB]
                    jnp.stack(val_rows, axis=0),       # [PS, 8, TB]
                    jnp.stack(flag_rows, axis=0),      # [PS, TB]
                    emit.astype(U32),                  # [TB]
                    (n_words + 1) * vqu)               # [TB] slots per lane
        else:
            prow = None

    # ---- near call (near_call.rs; batched_vm.py:1072-1076)
    nc_abi = src0[0]
    nc_pass_all = (nc_abi == 0) | (nc_abi > ergs_after_log)
    nc_passed = jnp.where(nc_pass_all, ergs_after_log, nc_abi)
    nc_left = jnp.where(nc_pass_all, 0, ergs_after_log - nc_abi)

    # ---- ret (ret.rs; batched_vm.py:1078-1141)
    ret_sub = sub_variant
    ret_is_panic0 = is_ret & (ret_sub == RetOp.PANIC)
    ret_src0 = _sel8(ret_is_panic0, z8, src0)
    ret_src0_tag = src0_tag & ~ret_is_panic0
    r_off = ret_src0[0]
    r_page = ret_src0[1]
    r_start = ret_src0[2]
    r_len = ret_src0[3]
    r_mode = (ret_src0[7] >> 8) & 0xFF
    r_mode = jnp.where(r_mode > 2, 0, r_mode)
    r_fwd = r_mode == 1
    r_use_aux = r_mode == 2

    nonlocal_ret = is_ret & ~is_local_frame
    rp_not_ptr = r_fwd & ~ret_src0_tag
    rp_back_fwd = r_fwd & (r_page < base_page)
    r_sl = r_start + r_len
    r_deref_exc = r_sl < r_start
    r_off_exc = (~r_fwd) & (r_off != 0)
    rp_validation = r_deref_exc | r_off_exc
    rp_slice = r_off > r_len
    ret_panic1 = nonlocal_ret & (rp_not_ptr | rp_back_fwd | rp_validation
                                 | rp_slice)
    ret_escalated = (is_ret & (ret_sub == RetOp.PANIC)) | ret_panic1
    z32 = jnp.zeros_like(r_off)
    r_off = jnp.where(ret_escalated, z32, r_off)
    r_page = jnp.where(ret_escalated, z32, r_page)
    r_start = jnp.where(ret_escalated, z32, r_start)
    r_len = jnp.where(ret_escalated, z32, r_len)
    apply_fwd = nonlocal_ret & ~ret_escalated
    r_start = jnp.where(apply_fwd & r_fwd, r_start + r_off, r_start)
    r_len = jnp.where(apply_fwd & r_fwd, r_len - r_off, r_len)
    r_off = jnp.where(apply_fwd & r_fwd, 0, r_off)
    r_page = jnp.where(apply_fwd & ~r_fwd,
                       jnp.where(r_use_aux, aux_page, heap_page), r_page)
    r_upper = r_start + r_len
    r_upper = jnp.where(nonlocal_ret & r_deref_exc, U32_MAX, r_upper)
    r_bound = jnp.where(r_use_aux, aux_bound0, heap_bound0)
    r_growth_uf = r_upper < r_bound
    r_growth = jnp.where(r_growth_uf, 0, r_upper - r_bound)
    r_growth = jnp.where(nonlocal_ret & ~r_fwd, r_growth, 0)
    r_cost = r_growth * p.MEMORY_GROWTH_ERGS_PER_BYTE
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
    is_to_label = is_ret & vflag0

    returndata_u256 = jnp.stack(
        [r_off, r_page, r_start, r_len, ztb, ztb, ztb, ztb], axis=0)

    cut = _stage_cut(v, 6, returndata_u256[0] ^ ergs3 ^ nc_passed)
    if cut is not None:
        return cut, [], None, None, None, None

    # ---- far call (far_call.rs; port of batched_vm.py:1143-1296)
    is_far_call = (opcode == OP.FAR_CALL) if log_enabled \
        else jnp.zeros((TB,), dtype=BOOL)
    if log_enabled:
        fc_sub = sub_variant
        fc_delegate = is_far_call & (fc_sub == 1)
        fc_mimic = is_far_call & (fc_sub == 2)

        fc_addr5 = src1[:5]
        fc_dst_kernel = _addr_is_kernel_l(fc_addr5)
        fc_off, fc_page_f = src0[0], src0[1]
        fc_start, fc_len = src0[2], src0[3]
        fc_ergs_abi = src0[6]
        fc_shard_abi = src0[7] & 0xFF
        fc_mode = (src0[7] >> 8) & 0xFF
        fc_mode = jnp.where(fc_mode > 2, 0, fc_mode)
        fc_ctor = (((src0[7] >> 16) & 0xFF) != 0) & is_kernel
        fc_to_system = (((src0[7] >> 24) & 0xFF) != 0) & fc_dst_kernel
        fc_static_flag = vflag0
        fc_shard_flag = vflag1

        fc_code_shard = jnp.where(fc_shard_flag, fc_shard_abi, shard_this_u8)
        fc_this_shard = jnp.where(fc_delegate, shard_this_u8, fc_code_shard)
        fc_new_base = v["page_counter"]

        fc_trivial = fc_code_shard != 0
        fc_do_sread = is_far_call & active & ~fc_trivial
        zrow = jnp.zeros((4, TB), dtype=U32)
        deployer5 = jnp.concatenate(
            [jnp.full((1, TB), p.DEPLOYER_SYSTEM_CONTRACT_ADDRESS,
                      dtype=U32), zrow], axis=0)
        fc_key14 = jnp.concatenate(
            [_addr_to_u256_l(fc_addr5), deployer5,
             fc_code_shard[None, :]], axis=0)
        fc_slot_match = jnp.all(new_st_key == fc_key14[None, :, :], axis=1) \
            & new_st_used
        fc_hash_storage = _usum(jnp.where(fc_slot_match[:, None, :],
                                          new_st_val, 0), axis=0)
        z8f = jnp.zeros((8, TB), dtype=U32)
        fc_hash_storage = _sel8(fc_trivial, z8f, fc_hash_storage)
        aa_hash = consts["default_aa_hash"]
        fc_mask_aa = _u256_is_zero(fc_hash_storage) & ~fc_dst_kernel \
            & ~fc_trivial
        fc_hash_raw = _sel8(fc_mask_aa, aa_hash, fc_hash_storage)

        h7 = fc_hash_raw[7]
        vh_ok = (h7 >> 24) == p.CODE_HASH_VERSION_BYTE
        vh_marker = (h7 >> 16) & 0xFF
        vh_len = h7 & 0xFFFF
        marker_rest = vh_marker == p.CODE_AT_REST_MARKER
        marker_ctor = vh_marker == p.YET_CONSTRUCTED_MARKER
        marker_valid = marker_rest | marker_ctor
        can_plain = ~fc_ctor & marker_rest
        can_ctor = fc_ctor & marker_ctor
        callable_direct = vh_ok & marker_valid & (can_plain | can_ctor)
        degrade_aa = vh_ok & marker_valid & ~(can_plain | can_ctor) \
            & ~fc_dst_kernel
        aa7 = aa_hash[7]
        fcx_bad_hash = ~vh_ok | (vh_ok & ~marker_valid)
        fcx_ctor_system = vh_ok & marker_valid & ~(can_plain | can_ctor) \
            & fc_dst_kernel
        stored_hash = _set_row(fc_hash_raw, 7, h7 & U32(0xFF00FFFF))
        fc_code_hash = _sel8(callable_direct, stored_hash,
                             _sel8(degrade_aa, aa_hash, z8f))
        fc_code_len = jnp.where(callable_direct, vh_len,
                                jnp.where(degrade_aa, aa7 & 0xFFFF, 0))

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
        fc_start2 = jnp.where(fc_fwd, fc_start + fc_off, fc_start)
        fc_len2 = jnp.where(fc_fwd, fc_len - fc_off, fc_len)
        fc_off2 = jnp.where(fc_fwd, 0, fc_off)
        fc_page2 = jnp.where(fc_fwd, fc_page_f,
                             jnp.where(fc_use_aux, aux_page, heap_page))
        fc_off2 = jnp.where(fc_exc0, 0, fc_off2)
        fc_page2 = jnp.where(fc_exc0, 0, fc_page2)
        fc_start2 = jnp.where(fc_exc0, 0, fc_start2)
        fc_len2 = jnp.where(fc_exc0, 0, fc_len2)

        fc_upper = fc_start2 + fc_len2
        fc_upper = jnp.where(is_far_call & fcx_deref, U32_MAX, fc_upper)
        fc_bound = jnp.where(fc_use_aux, aux_bound0, heap_bound0)
        fc_growth_uf = fc_upper < fc_bound
        fc_growth = jnp.where(fc_growth_uf | fc_fwd, 0, fc_upper - fc_bound)
        fc_bound_update = is_far_call & ~fc_fwd & ~fc_growth_uf
        fc_new_heap_bound = jnp.where(fc_bound_update & ~fc_use_aux,
                                      fc_upper, heap_bound0)
        fc_new_aux_bound = jnp.where(fc_bound_update & fc_use_aux,
                                     fc_upper, aux_bound0)
        fc_cost_growth = jnp.where(is_far_call, fc_growth, 0) \
            * p.MEMORY_GROWTH_ERGS_PER_BYTE
        fc_no_ergs_grow = ergs_after_log < fc_cost_growth
        fc_exc1 = fc_exc0 | (is_far_call & fc_no_ergs_grow)
        fc_ergs_a = jnp.where(fc_no_ergs_grow, 0,
                              ergs_after_log - fc_cost_growth)

        fc_cost_decommit = p.ERGS_PER_CODE_WORD_DECOMMITTMENT * fc_code_len
        fc_no_ergs_dec = fc_ergs_a < fc_cost_decommit
        fc_exc = fc_exc1 | (is_far_call & fc_no_ergs_dec)
        fc_ergs_b = jnp.where(fc_no_ergs_dec, fc_ergs_a,
                              fc_ergs_a - fc_cost_decommit)

        fc_do_decommit = is_far_call & active & ~fc_exc
        bank_match = jnp.all(consts["cb_hash"] == fc_code_hash[None, :, :],
                             axis=1) & consts["cb_valid"]       # [P, TB]
        bank_found = jnp.any(bank_match, axis=0)
        lane_error = lane_error | (fc_do_decommit & ~bank_found)
        bound_page = _usum(jnp.where(bank_match, cb_page_tab, 0), axis=0)
        fc_fresh = bound_page == 0
        fc_code_page = jnp.where(fc_fresh, fc_new_base, bound_page)
        bind_oh = bank_match & (fc_do_decommit & fc_fresh)[None, :]
        new_cb_page = jnp.where(bind_oh, fc_new_base[None, :], cb_page_tab)
        fc_ergs_c = jnp.where(fc_do_decommit & ~fc_fresh,
                              fc_ergs_b + fc_cost_decommit, fc_ergs_b)
        fc_code_page = jnp.where(fc_exc, U32(p.UNMAPPED_PAGE), fc_code_page)

        fc_max_passable = (fc_ergs_c // 64) * 63
        fc_leftover = fc_ergs_c - fc_max_passable
        fc_want = fc_ergs_abi
        fc_over = fc_want > fc_max_passable
        fc_passed = jnp.where(fc_over, fc_max_passable, fc_want)
        fc_left = jnp.where(fc_over, fc_leftover,
                            fc_leftover + fc_max_passable - fc_want)

        mimic_sender5 = _gated(
            "g_mimic", jnp.any(fc_mimic),
            lambda: read_reg(jnp.full((TB,), 15, dtype=U32))[0][:5])
        fc_next_this = _sel8(fc_delegate, this_addr, fc_addr5)
        fc_next_sender = _sel8(fc_delegate, msg_sender,
                               _sel8(fc_mimic, mimic_sender5, this_addr))
        fc_next_u128 = _sel8(fc_delegate, frame_u128, v["context_u128"])

        fc_heap_slot = v["frame_count"]
        lane_error = lane_error | (is_far_call & active
                                   & (fc_heap_slot >= config.heap_frames))
    else:
        fc_exc = jnp.zeros((TB,), dtype=BOOL)
        fc_left = jnp.zeros((TB,), dtype=U32)
        fc_do_sread = jnp.zeros((TB,), dtype=BOOL)
        fc_do_decommit = fc_do_sread

    # ---- flags writeback (batched_vm.py:1298-1341)
    add_eq = _u256_is_zero(sum_val)
    sub_eq = _u256_is_zero(diff_val)
    mul_of = ~_u256_is_zero(mul_hi)
    mul_eq = _u256_is_zero(mul_lo)
    div_eq = _u256_is_zero(div_q)
    div_gt = _u256_is_zero(div_r)
    shift_eq = _u256_is_zero(shift_val)
    binop_eq = _u256_is_zero(binop_val)

    fF = jnp.zeros((TB,), dtype=BOOL)
    cb = carry.astype(BOOL)
    bb_ = borrow.astype(BOOL)
    new_lt = _bsel(is_add, cb, is_sub & bb_)
    new_eq = _bsel(is_add, add_eq, is_sub & sub_eq)
    new_gt = _bsel(is_add, ~add_eq & ~cb, is_sub & ~sub_eq & ~bb_)
    new_lt = _bsel(is_mul, mul_of, new_lt)
    new_eq = _bsel(is_mul, mul_eq, new_eq)
    new_gt = _bsel(is_mul, ~mul_of & ~mul_eq, new_gt)
    new_lt = _bsel(is_div, div_by_zero, new_lt)
    new_eq = _bsel(is_div, div_eq & ~div_by_zero, new_eq)
    new_gt = _bsel(is_div, div_gt & ~div_by_zero, new_gt)
    new_eq = _bsel(is_shift, shift_eq, new_eq)
    new_lt = ~(is_shift | is_binop) & new_lt
    new_gt = ~(is_shift | is_binop) & new_gt
    new_eq = _bsel(is_binop, binop_eq, new_eq)

    writes_flags = set_flags & (is_add | is_sub | is_mul | is_div
                                | is_shift | is_binop)
    resets_flags = is_near_call | is_ret | is_far_call
    ret_sets_lt = is_ret & ret_final_panic

    flags_lt = _bsel(writes_flags, new_lt,
                     _bsel(resets_flags, ret_sets_lt, lt_f))
    flags_eq = _bsel(writes_flags, new_eq, ~resets_flags & eq_f)
    flags_gt = _bsel(writes_flags, new_gt, ~resets_flags & gt_f)
    new_flags = jnp.stack([flags_lt.astype(U32), flags_eq.astype(U32),
                           flags_gt.astype(U32)], axis=0)

    # ---- dst0 / dst1 selection (batched_vm.py:1343-1377)
    dst0_val = z8
    dst0_val = _sel8(is_add, sum_val, dst0_val)
    dst0_val = _sel8(is_sub, diff_val, dst0_val)
    dst0_val = _sel8(is_mul, mul_lo, dst0_val)
    dst0_val = _sel8(is_div, _sel8(div_by_zero, z8, div_q), dst0_val)
    dst0_val = _sel8(is_shift, shift_val, dst0_val)
    dst0_val = _sel8(is_binop, binop_val, dst0_val)
    dst0_val = _sel8(is_ctx, ctx_val, dst0_val)
    dst0_val = _sel8(ptr_writes, ptr_result, dst0_val)
    dst0_val = _sel8(uma_is_read & is_uma, read_val, dst0_val)
    dst0_val = _sel8(uma_is_write & uma_increment, incremented_src0, dst0_val)
    dst0_val = _sel8(do_sread, log_read_result, dst0_val)
    precomp_one = jnp.concatenate(
        [do_precomp.astype(U32)[None, :], jnp.zeros((7, TB), dtype=U32)],
        axis=0)
    dst0_val = _sel8(l_precomp & active, precomp_one, dst0_val)
    dst0_is_ptr = ptr_writes

    dst0_write = is_add | is_sub | is_mul | is_div | is_shift | is_binop \
        | ctx_writes_dst | ptr_writes | do_sread | (l_precomp & active) \
        | (uma_is_read & ~uma_set_panic) \
        | (uma_is_write & uma_increment & ~uma_set_panic)

    dst1_val = z8
    dst1_val = _sel8(is_mul, mul_hi, dst1_val)
    dst1_val = _sel8(is_div, _sel8(div_by_zero, z8, div_r), dst1_val)
    dst1_val = _sel8(uma_is_read & uma_increment, incremented_src0, dst1_val)
    dst1_is_ptr = uma_is_read & uma_increment & src0_tag
    dst1_write = is_mul | is_div \
        | (uma_is_read & uma_increment & ~uma_set_panic)

    # pending-exception accumulation (shorthand panics)
    new_pending = new_pending | (ptr_panic & is_ptr) | uma_set_panic
    new_pending = new_pending | (is_far_call & fc_exc)

    cut = _stage_cut(v, 7, dst0_val[0] ^ dst1_val[0]
                     ^ new_flags[0].astype(U32))
    if cut is not None:
        return cut, [], None, None, None, None

    # ---- pc + frame machinery (batched_vm.py:1386-1525)
    cur_pc_new = new_pc_lin
    cur_pc_new = jnp.where(is_jump, src0[0] & U16_MASK, cur_pc_new)

    cur_scal = scal
    cur_scal = _set_row(cur_scal, CS["pc"], cur_pc_new)
    cur_scal = _set_row(cur_scal, CS["sp"], sp2)
    cur_ergs_final = jnp.where(is_near_call, nc_left,
                      jnp.where(is_far_call, fc_left,
                      jnp.where(is_ret, 0, ergs3)))
    cur_scal = _set_row(cur_scal, CS["ergs_remaining"], cur_ergs_final)
    hb_cur = jnp.where(is_uma, new_heap_bound_u, heap_bound0)
    ab_cur = jnp.where(is_uma, new_aux_bound_u, aux_bound0)
    if log_enabled:
        hb_cur = jnp.where(is_far_call, fc_new_heap_bound, hb_cur)
        ab_cur = jnp.where(is_far_call, fc_new_aux_bound, ab_cur)
    cur_scal = _set_row(cur_scal, CS["heap_bound"], hb_cur)
    cur_scal = _set_row(cur_scal, CS["aux_heap_bound"], ab_cur)

    # push (near call / far call; batched_vm.py:1412-1467)
    push_mask = (is_near_call | is_far_call) & active
    pop_mask_e = is_ret & active
    pushed = cur_scal
    pushed = _set_row(pushed, CS["pc"],
                      jnp.where(is_far_call, 0, imm0))
    pushed = _set_row(pushed, CS["exception_handler"],
                      jnp.where(is_far_call, imm0, imm1))
    pushed = _set_row(pushed, CS["ergs_remaining"],
                      jnp.where(is_far_call,
                                fc_passed if log_enabled else 0, nc_passed))
    push_flags = flags_word | 2          # near: is_local
    push_this, push_sender = this_addr, msg_sender
    push_code_addr, push_u128 = code_addr, frame_u128
    new_context_u128_p = new_context_u128
    if log_enabled:
        push_flags = jnp.where(
            is_far_call,
            is_static.astype(U32) | fc_static_flag.astype(U32), push_flags)
        pushed = _set_row(pushed, CS["base_memory_page"],
                          jnp.where(is_far_call, fc_new_base, base_page))
        pushed = _set_row(pushed, CS["code_page"],
                          jnp.where(is_far_call, fc_code_page, code_page))
        pushed = _set_row(pushed, CS["sp"],
                          jnp.where(is_far_call,
                                    U32(p.INITIAL_SP_ON_FAR_CALL), sp2))
        pushed = _set_row(pushed, CS["shard_ids"], jnp.where(
            is_far_call,
            fc_this_shard | (shard_this_u8 << 8) | (fc_code_shard << 16),
            scal[CS["shard_ids"]]))
        pushed = _set_row(pushed, CS["heap_bound"], jnp.where(
            is_far_call, U32(p.NEW_FRAME_MEMORY_STIPEND),
            pushed[CS["heap_bound"]]))
        pushed = _set_row(pushed, CS["aux_heap_bound"], jnp.where(
            is_far_call, U32(p.NEW_FRAME_MEMORY_STIPEND),
            pushed[CS["aux_heap_bound"]]))
        pushed = _set_row(pushed, CS["heap_slot"], jnp.where(
            is_far_call, fc_heap_slot.astype(U32),
            pushed[CS["heap_slot"]]))
        push_this = _sel8(is_far_call, fc_next_this, this_addr)
        push_sender = _sel8(is_far_call, fc_next_sender, msg_sender)
        push_code_addr = _sel8(is_far_call, fc_addr5, code_addr)
        push_u128 = _sel8(is_far_call, fc_next_u128, frame_u128)
        # context register is consumed by the call (far_call.rs:558)
        new_context_u128_p = _sel8(is_far_call & active,
                                   jnp.zeros((4, TB), dtype=U32),
                                   new_context_u128)
    new_context_u128 = new_context_u128_p
    pushed = _set_row(pushed, CS["flags_word"], push_flags)
    pushed = _set_row(pushed, CS["journal_snapshot"],
                      new_j_count.astype(U32))
    pushed = _set_row(pushed, CS["event_snapshot"],
                      new_ev_count.astype(U32))
    push_idx = jnp.minimum(depth + 1, D - 1)
    lane_error = lane_error | (active & push_mask & (depth + 1 >= D))

    # cs arrays are touched only on frame events (the reference's
    # every-cycle current-frame writeback collapses to the last write
    # before the frame is left, plus the chunk-boundary writeback in
    # _build_kernel): store the outgoing current frame at depth and the
    # pushed frame at depth+1.
    frame_event = push_mask | pop_mask_e
    if "mem" not in DEBUG_PASSTHROUGH:
        @pl.when(jnp.any(frame_event))
        def _store_cs_event():
            css = mem["cs_scalars"][...]
            css = _scatter_l(css, depth, cur_scal, frame_event)
            css = _scatter_l(css, push_idx, pushed, push_mask)
            mem["cs_scalars"][...] = css
            mem["cs_this"][...] = _scatter_l(
                mem["cs_this"][...], push_idx, push_this, push_mask)
            mem["cs_sender"][...] = _scatter_l(
                mem["cs_sender"][...], push_idx, push_sender, push_mask)
            mem["cs_code"][...] = _scatter_l(
                mem["cs_code"][...], push_idx, push_code_addr, push_mask)
            mem["cs_u128"][...] = _scatter_l(
                mem["cs_u128"][...], push_idx, push_u128, push_mask)
    # heap-slot allocation + page tables + page counter (far call)
    new_frame_count = v["frame_count"]
    new_page_counter = v["page_counter"]
    if log_enabled:
        new_frame_count = new_frame_count + (is_far_call
                                             & active).astype(I32)
        slot_oh_fc = _onehot_l(fc_heap_slot, config.heap_frames) \
            & (is_far_call & active)[None, :]
        new_hp_page = jnp.where(slot_oh_fc, (fc_new_base + 2)[None, :],
                                hp_page_tab)
        new_ap_page = jnp.where(slot_oh_fc, (fc_new_base + 3)[None, :],
                                ap_page_tab)
        new_page_counter = new_page_counter + jnp.where(
            is_far_call & active, U32(p.NEW_MEMORY_PAGES_PER_FAR_CALL), 0)

    # pop (ret): load the parent frame from the cs refs (sees the stale
    # write above — a root-frame ret gathers its own just-written row)
    # and make it the new cached current frame
    pop_mask = pop_mask_e
    parent_idx = jnp.maximum(depth - 1, 0)

    def _pop_gather():
        return jnp.concatenate([
            _gather_l(mem["cs_scalars"][...], parent_idx),
            _gather_l(mem["cs_this"][...], parent_idx),
            _gather_l(mem["cs_sender"][...], parent_idx),
            _gather_l(mem["cs_code"][...], parent_idx),
            _gather_l(mem["cs_u128"][...], parent_idx),
        ], axis=0)

    pg = _gated("g_pop", jnp.any(pop_mask), _pop_gather)
    parent_scal = pg[:NF]
    parent_this = pg[NF:NF + 5]
    parent_sender = pg[NF + 5:NF + 10]
    parent_code = pg[NF + 10:NF + 15]
    parent_u128 = pg[NF + 15:NF + 19]
    p_ergs = parent_scal[CS["ergs_remaining"]] + ergs3
    parent_scal = _set_row(parent_scal, CS["ergs_remaining"], p_ergs)
    label_jump = is_to_label & is_local_frame
    p_pc = parent_scal[CS["pc"]]
    p_pc = jnp.where(label_jump, imm0,
            jnp.where(ret_panicked, scal[CS["exception_handler"]], p_pc))
    parent_scal = _set_row(parent_scal, CS["pc"], p_pc)
    loc = is_local_frame
    parent_scal = _set_row(parent_scal, CS["heap_bound"], 
        jnp.where(loc, jnp.where(is_uma, new_heap_bound_u, heap_bound0),
                  parent_scal[CS["heap_bound"]]))
    parent_scal = _set_row(parent_scal, CS["aux_heap_bound"],
        jnp.where(loc, jnp.where(is_uma, new_aux_bound_u, aux_bound0),
                  parent_scal[CS["aux_heap_bound"]]))

    # next cached current frame: pushed frame on push, updated parent on
    # pop, the updated current otherwise (the updated parent lives ONLY
    # in the cache until the next frame event / chunk boundary)
    ncur_scal = jnp.where(pop_mask[None, :], parent_scal,
                          jnp.where(push_mask[None, :], pushed, cur_scal))
    ncur_this = _sel8(pop_mask, parent_this,
                      _sel8(push_mask, push_this, this_addr))
    ncur_sender = _sel8(pop_mask, parent_sender,
                        _sel8(push_mask, push_sender, msg_sender))
    ncur_code = _sel8(pop_mask, parent_code,
                      _sel8(push_mask, push_code_addr, code_addr))
    ncur_u128 = _sel8(pop_mask, parent_u128,
                      _sel8(push_mask, push_u128, frame_u128))

    # storage rollback + event cancel for panicked pops
    # (storage.rs:156-181 value replay; event_sink.rs:154-175)
    if log_enabled:
        j_snap = scal[CS["journal_snapshot"]].astype(I32)
        ev_snap = scal[CS["event_snapshot"]].astype(I32)
        panic_pop = pop_mask & ret_panicked

        def do_rollback():
            def replay_body(i, st_val):
                # replay journal entries top-down: entry new_j_count-1-i,
                # active while it is still above the lane's snapshot
                idx = new_j_count - 1 - i
                lane_on = panic_pop & (idx >= j_snap) & (idx >= 0)
                entry_oh = _onehot_l(idx, J) & lane_on[None, :]
                slot = _usum(jnp.where(entry_oh, new_j_slot, 0), axis=0)
                prev = _usum(jnp.where(entry_oh[:, None, :], new_j_prev, 0),
                             axis=0)
                slot_oh = _onehot_l(slot.astype(I32), S) & lane_on[None, :]
                return jnp.where(slot_oh[:, None, :], prev[None, :, :],
                                 st_val)

            return jax.lax.fori_loop(0, J, replay_body, new_st_val)

        roll_lane = panic_pop & (new_j_count > j_snap)
        rolled = _gated("g_stroll", jnp.any(roll_lane), do_rollback)
        new_st_val = jnp.where(roll_lane[None, None, :], rolled, new_st_val)
        new_j_count = jnp.where(panic_pop, j_snap, new_j_count)
        ev_pos = jax.lax.broadcasted_iota(I32, (E, TB), 0)
        cancel = panic_pop[None, :] & (ev_pos >= ev_snap[None, :]) \
            & (ev_pos < new_ev_count[None, :])
        new_ev_cancelled = mem["ev_cancelled"][...] | cancel.astype(U32)

    new_depth = depth + push_mask.astype(I32) - pop_mask.astype(I32)
    new_depth = jnp.maximum(new_depth, 0)
    new_done = new_depth == 0

    cut = _stage_cut(v, 8, ncur_scal[0] ^ new_depth.astype(U32))
    if cut is not None:
        return cut, [], None, None, None, None

    # ---- register writebacks (batched_vm.py:1527-1553)
    dst0_to_reg = dst0_write & ~dst0_is_stack_mem & (dst0_reg > 0) & active
    reg_ptr_b = v["reg_ptr"].astype(BOOL)
    new_regs = _scatter_l(v["regs"],
                          jnp.maximum(dst0_reg.astype(I32) - 1, 0),
                          dst0_val, dst0_to_reg)
    new_reg_ptr = _scatter_l(reg_ptr_b,
                             jnp.maximum(dst0_reg.astype(I32) - 1, 0),
                             dst0_is_ptr, dst0_to_reg)
    dst1_to_reg = dst1_write & (dst1_reg > 0) & active
    new_regs = _scatter_l(new_regs,
                          jnp.maximum(dst1_reg.astype(I32) - 1, 0),
                          dst1_val, dst1_to_reg)
    new_reg_ptr = _scatter_l(new_reg_ptr,
                             jnp.maximum(dst1_reg.astype(I32) - 1, 0),
                             dst1_is_ptr, dst1_to_reg)

    # non-local ret register-file protocol: r1 = returndata ptr, rest wiped
    riota = jax.lax.broadcasted_iota(I32, (p.REGISTERS_COUNT, 1, TB), 0)
    wipe = nonlocal_ret & active
    wiped = jnp.where(riota == 0, returndata_u256[None, :, :],
                      jnp.zeros_like(new_regs))
    wiped_ptr = (riota[:, 0, :] == 0)
    new_regs = jnp.where(wipe[None, None, :], wiped, new_regs)
    new_reg_ptr = _bsel(wipe[None, :], wiped_ptr, new_reg_ptr)
    new_context_u128 = _sel8(wipe, jnp.zeros((4, TB), dtype=U32),
                             new_context_u128)

    # far-call register protocol (far_call.rs:571-610): r1 = calldata fat
    # ptr, r2 = ctor|system markers, r3..r12 kept (tags cleared) only for
    # system calls, r13..r15 zeroed
    if log_enabled:
        calldata_u256 = jnp.stack(
            [fc_off2, fc_page2, fc_start2, fc_len2,
             ztb, ztb, ztb, ztb], axis=0)
        marker_row = fc_ctor.astype(U32) | (fc_to_system.astype(U32) << 1)
        marker_u256 = jnp.concatenate(
            [marker_row[None, :], jnp.zeros((7, TB), dtype=U32)], axis=0)
        pos15 = jax.lax.broadcasted_iota(
            I32, (p.REGISTERS_COUNT, 1, TB), 0)
        keep_sys = (pos15 >= 2) & (pos15 <= 11) \
            & fc_to_system[None, None, :]
        far_file = jnp.where(keep_sys, new_regs,
                             jnp.zeros_like(new_regs))
        far_file = jnp.concatenate(
            [calldata_u256[None], marker_u256[None], far_file[2:]], axis=0)
        far_tags = (pos15[:, 0, :] == 0)
        fc_wipe = is_far_call & active
        new_regs = jnp.where(fc_wipe[None, None, :], far_file, new_regs)
        new_reg_ptr = _bsel(fc_wipe[None, :], far_tags, new_reg_ptr)

    cut = _stage_cut(v, 9, new_regs[0, 0] ^ new_reg_ptr[0].astype(U32)
                     ^ new_context_u128[0])
    if cut is not None:
        return cut, [], None, None, None, None

    # ---- memory writebacks (batched_vm.py:1577-1611)
    dst0_to_stack = dst0_write & dst0_is_stack_mem & active
    dst0_phys, dst0_in_window = _map_stack_index_l(config, dst0_loc)
    lane_error = lane_error | (dst0_to_stack & ~dst0_in_window)
    w_heap0 = uma_do_write & use_heap_arena & active
    w_heap1 = w_heap0 & is_unaligned
    w_aux0 = uma_do_write & use_aux_arena & active
    w_aux1 = w_aux0 & is_unaligned
    # scatter sweeps (the where over the whole arena) live INSIDE the
    # occupancy conds — see the gather conds above for why
    if "mem" not in DEBUG_PASSTHROUGH:
        if cache_on:
            # stack writes land in the cache; the arena sees only parity-
            # conflict evictions (and the chunk-end flush in _build_kernel)
            st_in = dst0_to_stack & dst0_in_window
            st_par = (dst0_phys.astype(U32) & 1) != 0
            st_in0 = st_in & ~st_par
            st_in1 = st_in & st_par
            st_idx0 = stc_meta[0] & 0x7FFFFFFF
            st_idx1 = stc_meta[1] & 0x7FFFFFFF
            st_ev0 = st_in0 & (stc_meta[0] != U32(_WC_INVALID)) \
                & (st_idx0 != dst0_phys.astype(U32))
            st_ev1 = st_in1 & (stc_meta[1] != U32(_WC_INVALID)) \
                & (st_idx1 != dst0_phys.astype(U32))
            any_stack_store = jnp.any(st_ev0 | st_ev1)
        else:
            any_stack_store = jnp.any(dst0_to_stack)
        if "stack_rw" in DEBUG_SKIP:  # perf probe (see the gather twin)
            any_stack_store = jnp.bool_(False)
        if "stack_st_rt" in DEBUG_SKIP:  # probe: does a RUNTIME-false
            # pl.when skip its body, unlike value-form lax.cond?
            any_stack_store = jnp.any(v["done"] > U32(1))  # always false

        if "stack_st_off" not in DEBUG_SKIP:  # probe twin: static removal
            @pl.when(any_stack_store)
            def _store_stack():
                if cache_on:
                    sa = _scatter_arena_l(stack_arena, st_idx0.astype(I32),
                                          stc_val[0], st_ev0)
                    sa = _scatter_arena_l(sa, st_idx1.astype(I32),
                                          stc_val[1], st_ev1)
                    mem["stack"][...] = sa
                    tg = _scatter_l(stack_tag_arena, st_idx0.astype(I32),
                                    stc_meta[0] >> 31, st_ev0)
                    tg = _scatter_l(tg, st_idx1.astype(I32),
                                    stc_meta[1] >> 31, st_ev1)
                    mem["stack_tag"][...] = tg
                else:
                    mem["stack"][...] = _scatter_arena_l(
                        stack_arena, dst0_phys, dst0_val, dst0_to_stack)
                    mem["stack_tag"][...] = _scatter_l(
                        stack_tag_arena, dst0_phys, dst0_is_ptr.astype(U32),
                        dst0_to_stack)

        if cache_on:
            new_meta_w = dst0_phys.astype(U32) \
                | (dst0_is_ptr.astype(U32) << 31)
            mem["stc_val"][...] = jnp.stack(
                [_sel8(st_in0, dst0_val, stc_val[0]),
                 _sel8(st_in1, dst0_val, stc_val[1])], axis=0)
            mem["stc_meta"][...] = jnp.stack(
                [jnp.where(st_in0, new_meta_w, stc_meta[0]),
                 jnp.where(st_in1, new_meta_w, stc_meta[1])], axis=0)

        if cache_on:
            # heap writes land in the cache too — except on precompile-
            # write cycles, where the whole cache flushes to the arena
            # first and this cycle's UMA writes go direct (the pp output
            # scatter must land LAST so pp wins any same-index overlap)
            pp_cyc = jnp.any(pp_write_h) if pp_enabled else jnp.bool_(False)
            hc_wc0 = w_heap0 & ~pp_cyc
            hc_wc1 = w_heap1 & ~pp_cyc
            # read-allocate: pure reads fill the cache with the words they
            # read (post-overlay, so hits just re-store the same entry) —
            # without this, read-mostly heap words miss forever
            hc_rf0 = need_h & ~uma_do_write & ~pp_cyc
            hc_rf1 = need_h & is_unaligned & ~uma_do_write & ~pp_cyc
            hc_par0 = (h_phys0 & 1) != 0
            hc_par1 = (h_phys1 & 1) != 0
            hv0 = hc_meta[0] != U32(_WC_INVALID)
            hv1 = hc_meta[1] != U32(_WC_INVALID)
            hc_from0 = [(hc_wc0 | hc_rf0) & ~hc_par0,
                        (hc_wc0 | hc_rf0) & hc_par0]
            hc_from1 = [(hc_wc1 | hc_rf1) & ~hc_par1,
                        (hc_wc1 | hc_rf1) & hc_par1]
            hc_in = [hc_from0[0] | hc_from1[0], hc_from0[1] | hc_from1[1]]
            hc_iidx = [jnp.where(hc_from0[s], h_phys0, h_phys1)
                       for s in (0, 1)]
            hc_ival = [_sel8(hc_from0[s],
                             _sel8(hc_wc0, new_w0, w0_heap),
                             _sel8(hc_wc1, new_w1, w1_heap))
                       for s in (0, 1)]
            hc_ev = [hc_in[0] & hv0 & (hc_meta[0] != hc_iidx[0]),
                     hc_in[1] & hv1 & (hc_meta[1] != hc_iidx[1])]
            hc_fl = [hv0 & pp_cyc, hv1 & pp_cyc]
            hc_direct0 = w_heap0 & pp_cyc
            hc_direct1 = w_heap1 & pp_cyc
            any_heap_store = jnp.any(hc_ev[0] | hc_ev[1] | hc_fl[0]
                                     | hc_fl[1] | hc_direct0 | pp_write_h)
        else:
            any_heap_store = jnp.any(w_heap0 | pp_write_h)
        any_aux_store = jnp.any(w_aux0 | pp_write_a)
        if "heap_rw" in DEBUG_SKIP:  # perf probe (see the gather twin)
            any_heap_store = jnp.bool_(False)
            any_aux_store = jnp.bool_(False)

        @pl.when(any_heap_store)
        def _store_heap():
            if cache_on:
                nh = _scatter_arena_l(
                    heap_arena, hc_meta[0].astype(I32), hc_val[0],
                    hc_ev[0] | hc_fl[0])
                nh = _scatter_arena_l(
                    nh, hc_meta[1].astype(I32), hc_val[1],
                    hc_ev[1] | hc_fl[1])
                nh = _scatter_arena_l(nh, h_phys0, new_w0, hc_direct0)
                nh = _scatter_arena_l(nh, h_phys1, new_w1, hc_direct1)
            else:
                nh = _scatter_arena_l(heap_arena, h_phys0, new_w0, w_heap0)
                nh = _scatter_arena_l(nh, h_phys1, new_w1, w_heap1)
            if pp_enabled:
                nh = _scatter_arena_l(
                    nh, pp_w_slot * config.heap_words + pp_out_idx,
                    pp_out_val, pp_write_h)
            mem["heap"][...] = nh

        if cache_on:
            mem["hc_val"][...] = jnp.stack(
                [_sel8(hc_in[0], hc_ival[0], hc_val[0]),
                 _sel8(hc_in[1], hc_ival[1], hc_val[1])], axis=0)
            inv = U32(_WC_INVALID)
            mem["hc_meta"][...] = jnp.stack(
                [jnp.where(hc_in[0], hc_iidx[0],
                           jnp.where(pp_cyc, inv, hc_meta[0])),
                 jnp.where(hc_in[1], hc_iidx[1],
                           jnp.where(pp_cyc, inv, hc_meta[1]))], axis=0)

        @pl.when(any_aux_store)
        def _store_aux():
            na = _scatter_arena_l(aux_arena, a_base + word0, new_w0, w_aux0)
            na = _scatter_arena_l(na, a_base + word1, new_w1, w_aux1)
            if pp_enabled:
                na = _scatter_arena_l(
                    na, pp_w_slot * config.aux_heap_words + pp_out_idx,
                    pp_out_val, pp_write_a)
            mem["aux_heap"][...] = na

    cut = _stage_cut(v, 10, dst0_val[0] ^ new_w0[0] ^ new_w1[0])
    if cut is not None:
        return cut, [], None, None, None, None

    # ---- witness slot rows (golden emission order; batched_vm.py:1627-1692)
    wq_count = v["wq_count"]
    ts0 = v["timestamp"]
    ts3 = v["timestamp"] + 3
    stack_page_arr = base_page + 1
    uma_page = jnp.where(uma_is_ptr_read, u_page_field,
                jnp.where(uma_is_heap, heap_page, aux_page))
    uma_type = jnp.where(uma_is_ptr_read, 3,
                jnp.where(uma_is_aux, 2, 1)).astype(U32)
    fB = jnp.zeros((TB,), dtype=BOOL)
    t4 = jnp.full((TB,), 4, dtype=U32)
    t0 = jnp.zeros((TB,), dtype=U32)
    slots_raw = [
        # (valid, type, page, index, value, is_ptr, rw(static), ts)
        (code_read_needed & ~frozen, t4, code_page, super_pc, code_word,
         fB, False, ts0),
        (do_src0_mem_read & src0_is_stack_mem, t0, stack_page_arr, src0_loc,
         stack_val, stack_tag, False, ts0),
        (do_src0_mem_read & src0_code, t4, code_page, src0_loc, code_val,
         fB, False, ts0),
        (uma_do_read_mem, uma_type, uma_page, word0, w0, fB, False, ts0),
        (uma_do_read_mem & is_unaligned, uma_type, uma_page, word1, w1,
         fB, False, ts0),
        (dst0_to_stack, t0, stack_page_arr, dst0_loc, dst0_val, dst0_is_ptr,
         True, ts3),
        (uma_do_write, uma_type, uma_page, word0, new_w0, fB, True, ts3),
        (uma_do_write & is_unaligned, uma_type, uma_page, word1, new_w1,
         fB, True, ts3),
    ]
    slots = []
    if config.queue_capacity > 0 or config.rolling_commitment:
        for valid, mtype, mpage, midx, mval, mptr, rw, ts in slots_raw:
            lane_error = lane_error | (valid & active & ovf)
            valid = valid & active & ~ovf
            if config.queue_capacity > 0:
                wq_count = wq_count + valid.astype(I32)
            vm = valid.astype(U32)
            slots.append((valid, mtype * vm, mpage.astype(U32) * vm,
                          midx.astype(U32) * vm,
                          jnp.where(valid[None, :], mval, 0),
                          mptr & valid, rw, ts * vm))

    # ---- rolling memory-queue commitment: moved OUT of the cycle
    # kernel into the per-chunk companion kernel (_rolling_fold_call) —
    # the in-kernel absorbs put the combined program over the Mosaic
    # resource ceiling (SIGABRT at tile>=128); the slot blocks emitted
    # above carry the exact per-cycle records the sponge consumes

    # ---- log-witness queue row (1 slot per cycle; batched_vm.py:1747-1793)
    lrow = None
    new_lq_count = v["lq_count"]
    if log_enabled and config.log_queue_capacity > 0:
        lvalid = (do_sread | do_swrite | do_event | do_precomp
                  | fc_do_sread) & ~ovf_l
        lane_error = lane_error | ((do_sread | do_swrite | do_event
                                    | do_precomp | fc_do_sread) & ovf_l)
        l_aux = jnp.where(do_precomp, U32(p.PRECOMPILE_AUX_BYTE),
                jnp.where(do_sread | do_swrite | fc_do_sread,
                          U32(p.STORAGE_AUX_BYTE), aux_byte))
        l_rw = (do_swrite | do_event).astype(U32)
        l_svc = (~fc_do_sread & vflag0).astype(U32)
        l_shard = jnp.where(fc_do_sread, fc_code_shard, shard_this_u8)
        packed_meta = l_aux | (l_rw << 8) | (l_svc << 9) | (l_shard << 16)
        lvu = lvalid.astype(U32)
        meta_row = jnp.stack(
            [ts_log * lvu, packed_meta * lvu, v["tx_number"] * lvu, lvu],
            axis=0)                                       # [4, TB]
        read_row = _sel8(do_sread | do_swrite, current_val, z8)
        read_row = _sel8(do_precomp, z8, read_row)
        written_row = _sel8(do_sread, current_val,
                            _sel8(do_swrite | do_event, src1, z8))
        addr_row = _sel8(fc_do_sread, deployer5, this_addr)
        key_row = _sel8(fc_do_sread, _addr_to_u256_l(fc_addr5),
                        _sel8(do_precomp, pp_key, src0))
        read_row = _sel8(fc_do_sread, fc_hash_storage, read_row)
        written_row = _sel8(fc_do_sread, fc_hash_storage, written_row)
        lm = lvalid[None, :]
        lrow = (meta_row, jnp.where(lm, addr_row[:5], 0),
                jnp.where(lm, key_row, 0), jnp.where(lm, read_row, 0),
                jnp.where(lm, written_row, 0))
        new_lq_count = new_lq_count + lvalid.astype(I32)

    # ---- decommit-witness queue row (batched_vm.py:1795-1815)
    drow = None
    new_dq_count = v["dq_count"]
    if log_enabled and config.decommit_queue_capacity > 0:
        dvalid = fc_do_decommit & ~ovf_d
        lane_error = lane_error | (fc_do_decommit & ovf_d)
        dvu = dvalid.astype(U32)
        dmeta = jnp.stack(
            [(v["timestamp"] + 1) * dvu, fc_code_page * dvu,
             fc_code_len * dvu,
             (dvu | ((dvalid & fc_fresh).astype(U32) << 1))
             * dvu], axis=0)                              # [4, TB]
        drow = (jnp.where(dvalid[None, :], fc_code_hash, 0), dmeta)
        new_dq_count = new_dq_count + dvalid.astype(I32)

    # ---- assemble (batched_vm.py:1817-1884); freeze finished lanes
    fz = frozen
    nv = dict(v)
    nv["regs"] = new_regs
    nv["reg_ptr"] = new_reg_ptr.astype(U32)
    nv["flags"] = _sel8(fz, v["flags"], new_flags)
    nv["timestamp"] = jnp.where(fz, v["timestamp"],
                                v["timestamp"] + p.TIME_DELTA_PER_CYCLE)
    nv["monotonic_cycle_counter"] = jnp.where(
        fz, v["monotonic_cycle_counter"], v["monotonic_cycle_counter"] + 1)
    nv["spent_pubdata"] = jnp.where(fz, v["spent_pubdata"],
                                    new_spent_pubdata)
    nv["ergs_per_pubdata"] = jnp.where(fz, v["ergs_per_pubdata"],
                                       new_ergs_per_pubdata)
    nv["tx_number"] = jnp.where(fz, v["tx_number"], new_tx_number)
    nv["pending_exception"] = _bsel(
        fz, v["pending_exception"].astype(BOOL), new_pending).astype(U32)
    nv["previous_code_word"] = _sel8(fz, v["previous_code_word"],
                                     new_prev_code_word)
    nv["previous_super_pc"] = jnp.where(fz, v["previous_super_pc"],
                                        new_prev_super_pc)
    nv["previous_code_page"] = jnp.where(fz, v["previous_code_page"],
                                         new_prev_code_page)
    nv["context_u128"] = _sel8(fz, v["context_u128"], new_context_u128)
    nv["depth"] = jnp.where(fz, v["depth"], new_depth)
    nv["cur_scal"] = jnp.where(fz[None, :], v["cur_scal"], ncur_scal)
    nv["cur_this"] = _sel8(fz, v["cur_this"], ncur_this)
    nv["cur_sender"] = _sel8(fz, v["cur_sender"], ncur_sender)
    nv["cur_code"] = _sel8(fz, v["cur_code"], ncur_code)
    nv["cur_u128"] = _sel8(fz, v["cur_u128"], ncur_u128)

    nv["done"] = _bsel(fz, v["done"].astype(BOOL),
                       new_done).astype(U32)
    nv["lane_error"] = lane_error.astype(U32)
    nv["wq_count"] = wq_count
    if log_enabled:
        @pl.when(jnp.any(is_log & active))
        def _store_log_state():
            mem["st_key"][...] = new_st_key
            mem["st_val"][...] = new_st_val
            mem["st_used"][...] = new_st_used.astype(U32)
            mem["j_slot"][...] = new_j_slot
            mem["j_prev"][...] = new_j_prev
            mem["ev_key"][...] = new_ev_key
            mem["ev_val"][...] = new_ev_val
            mem["ev_meta"][...] = new_ev_meta

        @pl.when(jnp.any(pop_mask & ret_panicked))
        def _store_rollback():
            mem["st_val"][...] = new_st_val
            mem["ev_cancelled"][...] = new_ev_cancelled

        @pl.when(jnp.any(is_far_call & active))
        def _store_fc_state():
            mem["cb_page"][...] = new_cb_page
            mem["hp_page"][...] = new_hp_page
            mem["ap_page"][...] = new_ap_page
        nv["st_count"] = jnp.where(fz, v["st_count"], new_st_count)
        nv["j_count"] = jnp.where(fz, v["j_count"], new_j_count)
        nv["ev_count"] = jnp.where(fz, v["ev_count"], new_ev_count)
        nv["lq_count"] = jnp.where(fz, v["lq_count"], new_lq_count)
        nv["dq_count"] = jnp.where(fz, v["dq_count"], new_dq_count)
        nv["frame_count"] = jnp.where(fz, v["frame_count"],
                                      new_frame_count)
        nv["page_counter"] = jnp.where(fz, v["page_counter"],
                                       new_page_counter)
    if config.precompile_ecrecover and not pp_enabled:
        want_ec = jnp.zeros((TB,), dtype=BOOL)
    ecrow = want_ec.astype(U32) if config.precompile_ecrecover else None
    return nv, slots, lrow, drow, prow, ecrow


# ===========================================================================
# kernel boundary: packing the BatchedVmState into batch-last VMEM buffers
# ===========================================================================

# packed per-lane scalar rows (one u32[16, B] array instead of 15 tiny refs)
_SCAL_ROWS = (
    "timestamp", "monotonic_cycle_counter", "spent_pubdata",
    "ergs_per_pubdata", "tx_number", "previous_super_pc",
    "previous_code_page", "page_counter",
    "depth", "frame_count", "global_step", "wq_count",      # i32, bitcast-safe
    "pending_exception", "done", "lane_error",              # bool
    "st_count", "j_count", "ev_count", "lq_count", "dq_count",  # i32
    "wc_count", "pq_count", "pq_blocks",
)
_SCAL_I32 = {"depth", "frame_count", "global_step", "wq_count",
             "st_count", "j_count", "ev_count", "lq_count", "dq_count",
             "pq_count", "pq_blocks"}
_SCAL_BOOL = {"pending_exception", "done", "lane_error"}
_SROW = {name: i for i, name in enumerate(_SCAL_ROWS)}

# carried (in+out) tensor fields: name -> batch-last shape builder
#: arrays the kernel mutates in-place via output refs (beyond the carry)
MEM_FIELDS = ("stack", "stack_tag", "heap", "aux_heap", "hp_page", "ap_page",
              "cb_page")
LOG_MEM_FIELDS = ("st_key", "st_val", "st_used", "j_slot", "j_prev",
                  "ev_key", "ev_val", "ev_meta", "ev_cancelled")


def _inout_specs(config: VmConfig):
    D = config.max_depth
    specs = [
        ("scal", (24,)),
        ("regs", (params.REGISTERS_COUNT, 8)),
        ("reg_ptr", (params.REGISTERS_COUNT,)),
        ("flags", (3,)),
        ("previous_code_word", (8,)),
        ("context_u128", (4,)),
        ("cs_scalars", (D, NF)),
        ("cs_this", (D, 5)),
        ("cs_sender", (D, 5)),
        ("cs_code", (D, 5)),
        ("cs_u128", (D, 4)),
        ("stack", (8, config.stack_words)),
        ("stack_tag", (config.stack_words,)),
        ("heap", (8, config.heap_frames * config.heap_words)),
        ("aux_heap", (8, config.heap_frames * config.aux_heap_words)),
        # page tables mutate on far call (slot allocation, decommit bind)
        ("hp_page", (config.heap_frames,)),
        ("ap_page", (config.heap_frames,)),
        ("cb_page", (config.code_pages,)),
    ]
    if config.rolling_commitment:
        specs.append(("wc_state", (25, 2)))
    if config.storage_slots > 0:
        S, J, E = (config.storage_slots, config.journal_slots,
                   config.event_slots)
        specs += [
            ("st_key", (S, 14)), ("st_val", (S, 8)), ("st_used", (S,)),
            ("j_slot", (J,)), ("j_prev", (J, 8)),
            ("ev_key", (E, 8)), ("ev_val", (E, 8)), ("ev_meta", (E, 2)),
            ("ev_cancelled", (E,)),
        ]
    return specs


def _const_specs(config: VmConfig):
    return [
        ("code", (8, config.code_pages * config.code_words)),
        ("cb_valid", (config.code_pages,)),
        ("cb_hash", (config.code_pages, 8)),
        ("cb_len", (config.code_pages,)),
        ("default_aa_hash", (8,)),
    ]


def _arena_batch_last(arr, config: VmConfig):
    """State arena (either physical layout) -> u32[8, W, B]."""
    if config.limb_major_arenas:
        return jnp.transpose(arr, (1, 2, 0))          # [B, 8, W]
    if arr.ndim == 2:                                  # flat stack [B, W*8]
        arr = arr.reshape(arr.shape[0], -1, 8)
    return jnp.transpose(arr, (2, 1, 0))               # [B, W, 8]


def _arena_from_batch_last(arr, like, config: VmConfig):
    """u32[8, W, B] -> the state's physical arena layout (shaped like `like`)."""
    if config.limb_major_arenas:
        return jnp.transpose(arr, (2, 0, 1))
    out = jnp.transpose(arr, (2, 1, 0))                # [B, W, 8]
    if like.ndim == 2:
        out = out.reshape(like.shape)
    return out


def _pack(state: BatchedVmState, config: VmConfig) -> dict:
    """BatchedVmState -> dict of batch-last kernel buffers."""
    def scalrow(name):
        x = getattr(state, name)
        return x.astype(U32)

    pad = 24 - len(_SCAL_ROWS)
    bufs = {
        "scal": jnp.stack([scalrow(n) for n in _SCAL_ROWS]
                          + [jnp.zeros_like(state.timestamp)] * pad, axis=0),
        "regs": jnp.transpose(state.regs, (1, 2, 0)),
        "reg_ptr": jnp.transpose(state.reg_ptr.astype(U32), (1, 0)),
        "flags": jnp.transpose(state.flags.astype(U32), (1, 0)),
        "previous_code_word": jnp.transpose(state.previous_code_word, (1, 0)),
        "context_u128": jnp.transpose(state.context_u128, (1, 0)),
        "cs_scalars": jnp.transpose(state.cs_scalars, (1, 2, 0)),
        "cs_this": jnp.transpose(state.cs_this_address, (1, 2, 0)),
        "cs_sender": jnp.transpose(state.cs_msg_sender, (1, 2, 0)),
        "cs_code": jnp.transpose(state.cs_code_address, (1, 2, 0)),
        "cs_u128": jnp.transpose(state.cs_context_u128, (1, 2, 0)),
        "stack": _arena_batch_last(state.stack, config),
        "stack_tag": jnp.transpose(state.stack_ptr_tag.astype(U32), (1, 0)),
        "heap": _arena_batch_last(state.heap, config),
        "aux_heap": _arena_batch_last(state.aux_heap, config),
        "code": _arena_batch_last(state.code, config),
        "hp_page": jnp.transpose(state.hp_page, (1, 0)),
        "ap_page": jnp.transpose(state.ap_page, (1, 0)),
        "cb_page": jnp.transpose(state.cb_page, (1, 0)),
        "cb_valid": jnp.transpose(state.cb_valid.astype(U32), (1, 0)),
        "cb_hash": jnp.transpose(state.cb_hash, (1, 2, 0)),
        **({"wc_state": jnp.transpose(state.wc_state, (1, 2, 0))}
           if config.rolling_commitment else {}),
        "cb_len": jnp.transpose(state.cb_len, (1, 0)),
        "default_aa_hash": jnp.transpose(state.default_aa_hash, (1, 0)),
    }
    if config.storage_slots > 0:
        bufs.update(
            st_key=jnp.transpose(state.st_key, (1, 2, 0)),
            st_val=jnp.transpose(state.st_val, (1, 2, 0)),
            st_used=jnp.transpose(state.st_used.astype(U32), (1, 0)),
            j_slot=jnp.transpose(state.j_slot.astype(U32), (1, 0)),
            j_prev=jnp.transpose(state.j_prev, (1, 2, 0)),
            ev_key=jnp.transpose(state.ev_key, (1, 2, 0)),
            ev_val=jnp.transpose(state.ev_val, (1, 2, 0)),
            ev_meta=jnp.transpose(state.ev_meta, (1, 2, 0)),
            ev_cancelled=jnp.transpose(state.ev_cancelled.astype(U32),
                                       (1, 0)),
        )
    return bufs


def _unpack(bufs: dict, state: BatchedVmState,
            config: VmConfig) -> BatchedVmState:
    """Batch-last kernel buffers -> BatchedVmState (non-subset fields pass
    through from the input state)."""
    import dataclasses as _dc

    s = bufs["scal"]

    def row(name):
        x = s[_SROW[name]]
        if name in _SCAL_I32:
            return x.astype(I32)
        if name in _SCAL_BOOL:
            return x.astype(BOOL)
        return x

    return _dc.replace(
        state,
        regs=jnp.transpose(bufs["regs"], (2, 0, 1)),
        reg_ptr=jnp.transpose(bufs["reg_ptr"], (1, 0)).astype(BOOL),
        flags=jnp.transpose(bufs["flags"], (1, 0)).astype(BOOL),
        previous_code_word=jnp.transpose(bufs["previous_code_word"], (1, 0)),
        context_u128=jnp.transpose(bufs["context_u128"], (1, 0)),
        cs_scalars=jnp.transpose(bufs["cs_scalars"], (2, 0, 1)),
        cs_this_address=jnp.transpose(bufs["cs_this"], (2, 0, 1)),
        cs_msg_sender=jnp.transpose(bufs["cs_sender"], (2, 0, 1)),
        cs_code_address=jnp.transpose(bufs["cs_code"], (2, 0, 1)),
        cs_context_u128=jnp.transpose(bufs["cs_u128"], (2, 0, 1)),
        stack=_arena_from_batch_last(bufs["stack"], state.stack, config),
        stack_ptr_tag=jnp.transpose(bufs["stack_tag"], (1, 0)).astype(BOOL),
        heap=_arena_from_batch_last(bufs["heap"], state.heap, config),
        aux_heap=_arena_from_batch_last(bufs["aux_heap"], state.aux_heap,
                                        config),
        timestamp=row("timestamp"),
        monotonic_cycle_counter=row("monotonic_cycle_counter"),
        spent_pubdata=row("spent_pubdata"),
        ergs_per_pubdata=row("ergs_per_pubdata"),
        tx_number=row("tx_number"),
        previous_super_pc=row("previous_super_pc"),
        previous_code_page=row("previous_code_page"),
        page_counter=row("page_counter"),
        depth=row("depth"),
        frame_count=row("frame_count"),
        global_step=row("global_step"),
        wq_count=row("wq_count"),
        pending_exception=row("pending_exception"),
        done=row("done"),
        lane_error=row("lane_error"),
        hp_page=jnp.transpose(bufs["hp_page"], (1, 0)),
        ap_page=jnp.transpose(bufs["ap_page"], (1, 0)),
        cb_page=jnp.transpose(bufs["cb_page"], (1, 0)),
        st_count=row("st_count"), j_count=row("j_count"),
        ev_count=row("ev_count"), lq_count=row("lq_count"),
        dq_count=row("dq_count"), wc_count=row("wc_count"),
        pq_count=row("pq_count"), pq_blocks=row("pq_blocks"),
        **({"wc_state": jnp.transpose(bufs["wc_state"], (2, 0, 1))}
           if config.rolling_commitment else {}),
        **({} if config.storage_slots == 0 else dict(
            st_key=jnp.transpose(bufs["st_key"], (2, 0, 1)),
            st_val=jnp.transpose(bufs["st_val"], (2, 0, 1)),
            st_used=jnp.transpose(bufs["st_used"], (1, 0)).astype(BOOL),
            j_slot=jnp.transpose(bufs["j_slot"], (1, 0)).astype(I32),
            j_prev=jnp.transpose(bufs["j_prev"], (2, 0, 1)),
            ev_key=jnp.transpose(bufs["ev_key"], (2, 0, 1)),
            ev_val=jnp.transpose(bufs["ev_val"], (2, 0, 1)),
            ev_meta=jnp.transpose(bufs["ev_meta"], (2, 0, 1)),
            ev_cancelled=jnp.transpose(bufs["ev_cancelled"],
                                       (1, 0)).astype(BOOL),
        )),
    )


# ===========================================================================
# the Pallas kernel + public driver
# ===========================================================================

#: the per-lane rows that ride the fori carry as VALUES (~60KB at TB=256):
#: all scalar rows + the cached current callstack frame.  The carry avoids
#: re-loading + re-stacking + re-storing them every cycle — that fixed
#: work was ~3us/tile-cycle, the largest single cost in the stage profile
#: (tools/ablate_fused.py).  Big arrays (regs, arenas, cs) stay in refs:
#: multi-MB live carries SIGABRT the Mosaic compile helper (bisected).
def _carry_from_vals(v: dict):
    # rank-2 [1, TB] rows: rank-1 carries crash Mosaic's vector-layout
    # inference (VectorLayout::join check failure, observed)
    rows = tuple(v[name].astype(U32)[None, :] for name in _SCAL_ROWS)
    return rows + (v["cur_scal"], v["cur_this"], v["cur_sender"],
                   v["cur_code"], v["cur_u128"])


def _vals_from_carry(carry, refs: dict) -> dict:
    """Rebuild the per-cycle value dict from the fori carry + big refs.

    Booleans ride as u32 (i1 vectors in loop-visible state crash Mosaic);
    _cycle_tile converts at its boundary.
    """
    v = {}
    for i, name in enumerate(_SCAL_ROWS):
        x = carry[i][0]
        if name in _SCAL_I32:
            x = x.astype(I32)
        v[name] = x
    n = len(_SCAL_ROWS)
    (v["cur_scal"], v["cur_this"], v["cur_sender"], v["cur_code"],
     v["cur_u128"]) = carry[n:n + 5]
    for name in ("regs", "reg_ptr", "flags", "previous_code_word",
                 "context_u128"):
        v[name] = refs[name][:]
    return v


def _vals_to_refs(v: dict, refs: dict) -> None:
    """Store the carried rows back into the inout refs (ONCE per chunk)."""
    rows = []
    for name in _SCAL_ROWS:
        rows.append(v[name].astype(U32))
    rows += [jnp.zeros_like(rows[0])] * (24 - len(_SCAL_ROWS))
    refs["scal"][:] = jnp.stack(rows, axis=0)


def _big_to_refs(v: dict, refs: dict) -> None:
    for name in ("regs", "reg_ptr", "flags", "previous_code_word",
                 "context_u128"):
        refs[name][:] = v[name]


def _block_specs(config: VmConfig, k_cycles: int):
    """(name, shape-prefix) of the per-call queue output blocks."""
    blocks = []
    if config.queue_capacity > 0 or config.rolling_commitment:
        # rolling configs emit the slot blocks too: they feed the
        # COMPANION commitment kernel (_rolling_fold_call), not the
        # persistent queue
        kq = k_cycles * SLOTS_PER_CYCLE
        blocks += [("wq_meta_blk", (kq, 4)), ("wq_value_blk", (kq, 8)),
                   ("wq_flags_blk", (kq,))]
    if config.storage_slots > 0 and config.log_queue_capacity > 0:
        blocks += [("lq_meta_blk", (k_cycles, 4)),
                   ("lq_addr_blk", (k_cycles, 5)),
                   ("lq_key_blk", (k_cycles, 8)),
                   ("lq_read_blk", (k_cycles, 8)),
                   ("lq_written_blk", (k_cycles, 8))]
    if config.storage_slots > 0 and config.decommit_queue_capacity > 0:
        blocks += [("dq_hash_blk", (k_cycles, 8)),
                   ("dq_meta_blk", (k_cycles, 4))]
    if config.precompile_queue_capacity > 0:
        from .state import precompile_queue_slots

        ps = sum(precompile_queue_slots(config))
        blocks += [("pq_meta_blk", (k_cycles, ps, 4)),
                   ("pq_value_blk", (k_cycles, ps, 8)),
                   ("pq_flags_blk", (k_cycles, ps)),
                   ("pq_emit_blk", (k_cycles,)),
                   ("pq_nslots_blk", (k_cycles,))]
    if config.precompile_ecrecover:
        blocks += [("ec_first_blk", ())]
    return blocks


def _scratch_specs(config: VmConfig):
    """(name, shape-prefix) of every kernel scratch ref, in arg order."""
    specs = []
    if _WORD_CACHE:
        specs += [("stc_val", (2, 8)), ("stc_meta", (2,)),
                  ("hc_val", (2, 8)), ("hc_meta", (2,))]
    specs += [("g_fetch", (8,)), ("g_stack", (9,)), ("g_code", (8,)),
              ("g_hw0", (8,)), ("g_hw1", (8,)), ("g_aw0", (8,)),
              ("g_aw1", (8,)), ("g_mul", (16,)), ("g_div", (16,)),
              ("g_shift", (8,)), ("g_splice", (24,)), ("g_pmask", (8,))]
    specs += [("g_mimic", (5,)), ("g_pop", (NF + 19,))]
    if config.storage_slots > 0:
        specs += [("g_stroll", (config.storage_slots, 8))]
    if config.storage_slots > 0 and config.precompile_keccak_blocks > 0:
        specs += [("g_keccak", (8,)), ("g_sha", (8,))]
    if config.precompile_queue_capacity > 0:
        from .state import precompile_queue_slots

        ps_in, _ = precompile_queue_slots(config)
        specs += [("g_invals", (ps_in, 8))]
    return specs


def _build_kernel(config: VmConfig, k_cycles: int):
    inout = _inout_specs(config)
    const = _const_specs(config)
    blocks = _block_specs(config, k_cycles)
    with_wq = config.queue_capacity > 0
    with_lq = config.storage_slots > 0 and config.log_queue_capacity > 0
    with_dq = config.storage_slots > 0 \
        and config.decommit_queue_capacity > 0
    cap = max(config.queue_capacity, SLOTS_PER_CYCLE)

    def kernel(step0_ref, *refs):
        n_in = len(const) + len(inout)
        in_refs = {name: r for (name, _), r in zip(const + inout,
                                                   refs[:n_in])}
        out_list = refs[n_in:]
        out_refs = {name: r for (name, _), r in zip(inout, out_list)}
        blk = {name: r for (name, _), r in zip(blocks,
                                               out_list[len(inout):])}
        scr = out_list[len(inout) + len(blocks):]
        cache_refs = {name: r
                      for (name, _), r in zip(_scratch_specs(config), scr)}
        if _WORD_CACHE:
            # caches start cold per tile (scratch persists across grid
            # iterations on TPU — the sentinel init is load-bearing)
            for m in ("stc_meta", "hc_meta"):
                cache_refs[m][...] = jnp.full(
                    cache_refs[m].shape, _WC_INVALID, dtype=jnp.uint32)
        step0 = step0_ref[0]
        k_stop = step0_ref[1]              # dynamic cycle bound (ecrecover
        #                                    detour protocol; == k_cycles
        #                                    for configs without it)

        # ALL state lives in the (aliased) output refs; the fori carry is
        # empty.  Carrying the ~25 state arrays as loop values blows the
        # Mosaic compile helper's resource limits (SIGABRT) once the full
        # dataflow is live — per-iteration VMEM ref load/store bounds the
        # live ranges instead (bisected; arenas alone weren't enough).
        kconsts = {name: in_refs[name][:] for name, _ in const
                   if name != "cb_valid"}
        kconsts["cb_valid"] = in_refs["cb_valid"][:].astype(BOOL)
        mem_names = [n for n in MEM_FIELDS]
        if config.storage_slots > 0:
            mem_names += list(LOG_MEM_FIELDS)
        mem = {name: out_refs[name] for name in mem_names}
        mem.update(cache_refs)
        for name in ("cs_scalars", "cs_this", "cs_sender", "cs_code",
                     "cs_u128"):
            mem[name] = out_refs[name]
        for name, _ in inout:
            out_refs[name][...] = in_refs[name][...]

        # initial fori carry: the scalar rows + the current-frame cache
        # (one gather per CHUNK — see _cycle_tile's top-of-cycle comment)
        s0 = out_refs["scal"][:]
        v0 = {name: s0[_SROW[name]] for name in _SCAL_ROWS}
        depth0 = s0[_SROW["depth"]].astype(I32)
        doh0 = _onehot_l(depth0, config.max_depth)[:, None, :]
        v0["cur_scal"] = _usum(
            jnp.where(doh0, out_refs["cs_scalars"][...], 0), axis=0)
        v0["cur_this"] = _usum(
            jnp.where(doh0, out_refs["cs_this"][...], 0), axis=0)
        v0["cur_sender"] = _usum(
            jnp.where(doh0, out_refs["cs_sender"][...], 0), axis=0)
        v0["cur_code"] = _usum(
            jnp.where(doh0, out_refs["cs_code"][...], 0), axis=0)
        v0["cur_u128"] = _usum(
            jnp.where(doh0, out_refs["cs_u128"][...], 0), axis=0)
        carry0 = _carry_from_vals(v0)

        if config.precompile_ecrecover:
            # blocks for cycles >= k_stop are never written by the body:
            # pre-zero them (and the first-ecrecover-cycle detector)
            for name, _sh in blocks:
                if name != "ec_first_blk":
                    blk[name][...] = jnp.zeros(blk[name].shape,
                                               blk[name].dtype)
            blk["ec_first_blk"][...] = jnp.full(
                blk["ec_first_blk"].shape, k_cycles, dtype=jnp.uint32)

        def body(k, carry):
            if config.precompile_ecrecover:
                # lax.cond (not pl.when): the carry threads through; the
                # ref stores inside lower the same way pl.when does
                return jax.lax.cond(k < k_stop,
                                    lambda c: _exec_cycle(k, c),
                                    lambda c: c, carry)
            return _exec_cycle(k, carry)

        def _exec_cycle(k, carry):
            ovf = (step0 + k) * SLOTS_PER_CYCLE > cap - SLOTS_PER_CYCLE \
                if with_wq else jnp.bool_(False)
            ovf_l = (step0 + k) >= config.log_queue_capacity \
                if with_lq else jnp.bool_(False)
            ovf_d = (step0 + k) >= config.decommit_queue_capacity \
                if with_dq else jnp.bool_(False)
            v = _vals_from_carry(carry, out_refs)
            nv, slots, lrow, drow, prow, ecrow = _cycle_tile(
                v, kconsts, mem, config, (ovf, ovf_l, ovf_d))
            if ecrow is not None:
                cur = blk["ec_first_blk"][...]
                blk["ec_first_blk"][...] = jnp.where(
                    (ecrow != 0) & (cur == U32(k_cycles)),
                    k.astype(U32), cur)
            for name in DEBUG_PASSTHROUGH:
                if name in nv:
                    nv[name] = v[name]
            if (with_wq or config.rolling_commitment) and slots:
                # one aligned [8, ...] store per array instead of 24
                # dynamic row stores (k*8 is 8-aligned by construction)
                meta_rows, val_rows, flag_rows = [], [], []
                for (valid, mtype, mpage, midx, mval, mptr, rw, ts) \
                        in slots:
                    meta_rows.append(
                        jnp.stack([ts, mtype, mpage, midx], axis=0))
                    val_rows.append(mval)
                    vmf = valid.astype(U32)
                    flag_rows.append(
                        ((U32(1) if rw else U32(0))
                         | (mptr.astype(U32) << 1) | (vmf << 2)) * vmf)
                base = k * SLOTS_PER_CYCLE
                blk["wq_meta_blk"][pl.ds(base, SLOTS_PER_CYCLE)] = \
                    jnp.stack(meta_rows, axis=0)
                blk["wq_value_blk"][pl.ds(base, SLOTS_PER_CYCLE)] = \
                    jnp.stack(val_rows, axis=0)
                blk["wq_flags_blk"][pl.ds(base, SLOTS_PER_CYCLE)] = \
                    jnp.stack(flag_rows, axis=0)
            if lrow is not None:
                meta_r, addr_r, key_r, read_r, written_r = lrow
                blk["lq_meta_blk"][k] = meta_r
                blk["lq_addr_blk"][k] = addr_r
                blk["lq_key_blk"][k] = key_r
                blk["lq_read_blk"][k] = read_r
                blk["lq_written_blk"][k] = written_r
            if drow is not None:
                blk["dq_hash_blk"][k] = drow[0]
                blk["dq_meta_blk"][k] = drow[1]
            if prow is not None:
                blk["pq_meta_blk"][k] = prow[0]
                blk["pq_value_blk"][k] = prow[1]
                blk["pq_flags_blk"][k] = prow[2]
                blk["pq_emit_blk"][k] = prow[3]
                blk["pq_nslots_blk"][k] = prow[4]
            nv["global_step"] = v["global_step"] + 1
            _big_to_refs(nv, out_refs)
            return _carry_from_vals(nv)

        carry_n = jax.lax.fori_loop(0, k_cycles, body, carry0)
        vn = _vals_from_carry(carry_n, out_refs)
        _vals_to_refs(vn, out_refs)

        # chunk-boundary word-cache flush: the arenas leave the kernel
        # exactly as the cache-less kernel would have written them (the
        # host-side drain/spill/checkpoint/differential paths all read
        # the arenas directly)
        if _WORD_CACHE:
            s_meta = cache_refs["stc_meta"][...]
            s_val = cache_refs["stc_val"][...]
            sv0 = s_meta[0] != U32(_WC_INVALID)
            sv1 = s_meta[1] != U32(_WC_INVALID)

            @pl.when(jnp.any(sv0 | sv1))
            def _flush_stack():
                si0 = (s_meta[0] & 0x7FFFFFFF).astype(I32)
                si1 = (s_meta[1] & 0x7FFFFFFF).astype(I32)
                a = _scatter_arena_l(out_refs["stack"][...], si0,
                                     s_val[0], sv0)
                a = _scatter_arena_l(a, si1, s_val[1], sv1)
                out_refs["stack"][...] = a
                t = _scatter_l(out_refs["stack_tag"][...], si0,
                               s_meta[0] >> 31, sv0)
                t = _scatter_l(t, si1, s_meta[1] >> 31, sv1)
                out_refs["stack_tag"][...] = t

            h_meta = cache_refs["hc_meta"][...]
            h_val = cache_refs["hc_val"][...]
            hv0 = h_meta[0] != U32(_WC_INVALID)
            hv1 = h_meta[1] != U32(_WC_INVALID)

            @pl.when(jnp.any(hv0 | hv1))
            def _flush_heap():
                a = _scatter_arena_l(out_refs["heap"][...],
                                     h_meta[0].astype(I32), h_val[0], hv0)
                a = _scatter_arena_l(a, h_meta[1].astype(I32), h_val[1],
                                     hv1)
                out_refs["heap"][...] = a

        # chunk-boundary writeback: the cached current frame becomes the
        # cs entry at the final depth (all-lanes mask; frozen lanes write
        # back what they loaded)
        depth_f = vn["depth"]
        tmask = jnp.ones(depth_f.shape, dtype=BOOL)
        out_refs["cs_scalars"][...] = _scatter_l(
            out_refs["cs_scalars"][...], depth_f, vn["cur_scal"], tmask)
        out_refs["cs_this"][...] = _scatter_l(
            out_refs["cs_this"][...], depth_f, vn["cur_this"], tmask)
        out_refs["cs_sender"][...] = _scatter_l(
            out_refs["cs_sender"][...], depth_f, vn["cur_sender"], tmask)
        out_refs["cs_code"][...] = _scatter_l(
            out_refs["cs_code"][...], depth_f, vn["cur_code"], tmask)
        out_refs["cs_u128"][...] = _scatter_l(
            out_refs["cs_u128"][...], depth_f, vn["cur_u128"], tmask)

    return kernel


def _build_call(config: VmConfig, k_cycles: int, tile: int,
                interpret: bool):
    """pallas_call closure for one (config, K, TB) geometry."""
    inout = _inout_specs(config)
    const = _const_specs(config)
    with_wq = config.queue_capacity > 0
    B = config.batch
    n_tiles = B // tile

    def spec(shape_prefix):
        nd = len(shape_prefix)
        return pl.BlockSpec(
            tuple(shape_prefix) + (tile,),
            (lambda i, *_, _nd=nd: (0,) * _nd + (i,)),
            memory_space=pltpu.VMEM)

    blocks = _block_specs(config, k_cycles)
    in_specs = [spec(sh) for _, sh in const] + [spec(sh) for _, sh in inout]
    out_specs = [spec(sh) for _, sh in inout] \
        + [spec(sh) for _, sh in blocks]
    out_shapes = [jax.ShapeDtypeStruct(tuple(sh) + (B,), jnp.uint32)
                  for _, sh in inout + blocks]

    # kernel-lifetime scratch: (a) the per-lane write-back word caches
    # (val u32[2, 8, T] + meta u32[2, T] per arena; meta = idx | tag<<31,
    # sentinel _WC_INVALID), (b) one landing ref per pl.when-gated unit
    # (_gated in _cycle_tile).  ~130 KB VMEM at tile=512.
    scratch_shapes = [pltpu.VMEM(tuple(sh) + (tile,), jnp.uint32)
                      for _, sh in _scratch_specs(config)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )
    kernel = _build_kernel(config, k_cycles)
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # v5e has ~128 MiB VMEM; the default Mosaic scoped-vmem limit
            # (~16 MiB) makes the compile helper crash outright (HTTP 500,
            # no diagnostic) once blocks exceed it — bisected empirically.
            # 112 MiB: the tree-gather fold intermediates put the headline
            # geometry at ~107 MiB scoped (measured), still under hardware
            vmem_limit_bytes=_VMEM_LIMIT_BYTES),
    )

    def run(step0, k_stop, bufs):
        ins = [bufs[name] for name, _ in const] \
            + [bufs[name] for name, _ in inout]
        outs = call(jnp.stack([jnp.asarray(step0, dtype=I32),
                               jnp.asarray(k_stop, dtype=I32)]), *ins)
        new_bufs = dict(bufs)
        for (name, _), arr in zip(inout, outs[:len(inout)]):
            new_bufs[name] = arr
        out_blocks = {name: arr for (name, _), arr
                      in zip(blocks, outs[len(inout):])}
        return new_bufs, out_blocks

    return run


def _splice_batch_first(arr, block, base):
    # state queue arrays are [B, CAP, r]; blocks arrive [K, r, B]
    blk = jnp.transpose(block, (2, 0, 1))
    return jax.lax.dynamic_update_slice(
        arr, blk, (0, base) + (0,) * (arr.ndim - 2))

def _rolling_fold_call(config: VmConfig, k_cycles: int, tile: int,
                       interpret: bool):
    """Companion kernel: absorb one chunk's witness-slot blocks into the
    per-lane rolling sponges (the commitment half of the old in-kernel
    rolling unit, in its own small program — no Mosaic resource ceiling).

    Bit-exact with the jnp engine's per-slot absorbs: the slot blocks
    carry the same masked records in the same order, absorbs gate on the
    same validity bits, and the v2 rate-packing parity (wc_count & 1)
    picks the destination half exactly as the jnp path does."""
    from ..golden.precompiles import KECCAK_RC  # noqa: F401 (via _round)

    B = config.batch
    n_tiles = B // tile
    kq = k_cycles * SLOTS_PER_CYCLE

    def kernel(meta_ref, val_ref, flg_ref, wc_ref, cnt_ref,
               wc_out, cnt_out, st_scr):
        wc = wc_ref[...]                      # [25, 2, TB]
        st_scr[...] = jnp.concatenate([
            jnp.stack([wc[i, 0] for i in range(25)], axis=0),
            jnp.stack([wc[i, 1] for i in range(25)], axis=0),
            cnt_ref[...]], axis=0)            # [51, TB]

        def _bswap(x):
            x = x.astype(U32)
            return ((x & 0xFF) << 24) | ((x & 0xFF00) << 8) \
                | ((x >> 8) & 0xFF00) | (x >> 24)

        def slot_body(s_, carry):
            st51 = st_scr[...]
            meta = meta_ref[pl.dslice(s_, 1)][0]     # [4, TB]
            mval = val_ref[pl.dslice(s_, 1)][0]      # [8, TB]
            flg = flg_ref[pl.dslice(s_, 1)][0]       # [TB]
            valid = (flg & 4) != 0
            fl = (flg & 1) | (flg & 2)
            ts, mtype, mpage, midx = meta[0], meta[1], meta[2], meta[3]
            ztb_ = jnp.zeros_like(ts)
            rec_lo = [None] * 8
            rec_hi = [None] * 8
            rec_lo[0] = _bswap(ts)
            rec_hi[0] = (mtype & 0xFF) | (((mpage >> 24) & 0xFF) << 8) \
                | (((mpage >> 16) & 0xFF) << 16) \
                | (((mpage >> 8) & 0xFF) << 24)
            rec_lo[1] = (mpage & 0xFF) | (((midx >> 24) & 0xFF) << 8) \
                | (((midx >> 16) & 0xFF) << 16) \
                | (((midx >> 8) & 0xFF) << 24)
            rec_hi[1] = (midx & 0xFF) | (fl << 8)
            rec_lo[2] = rec_hi[2] = rec_lo[3] = rec_hi[3] = ztb_
            for k_ in range(4):
                rec_lo[4 + k_] = _bswap(mval[7 - 2 * k_])
                rec_hi[4 + k_] = _bswap(mval[6 - 2 * k_])
            # spec v2 rate packing: even-parity records land in u64 lanes
            # 0..7 (rows 0..7 lo / 25..32 hi), odd-parity in lanes 8..15
            # (rows 8..15 / 33..40); only odd records trigger the
            # permutation.  Parity masks ride as u32 0/1 rows — boolean
            # rank-1 vectors through ~ / & SIGABRT Mosaic's layout
            # inference (VectorLayout::join, the same class as rank-1
            # fori carries); i1 appears only in the two proven patterns
            # (jnp.any reduction, [None, :]-broadcast where select).
            wrap_b = ((flg >> 2) & st51[50] & 1) != 0
            zrow = jnp.zeros_like(st51[:1])
            z8 = jnp.broadcast_to(zrow, (8,) + zrow.shape[1:])
            z9 = jnp.broadcast_to(zrow, (9,) + zrow.shape[1:])
            z17 = jnp.broadcast_to(zrow, (17,) + zrow.shape[1:])
            lo8 = jnp.stack(rec_lo, axis=0)
            hi8 = jnp.stack(rec_hi, axis=0)
            rec_even = jnp.concatenate([lo8, z17, hi8, z17], axis=0)
            rec_odd = jnp.concatenate([z8, lo8, z9, z8, hi8, z9], axis=0)
            rec50 = jnp.where(wrap_b[None, :], rec_odd, rec_even)
            ab50 = jnp.where(valid[None, :], st51[:50] ^ rec50, st51[:50])
            ncount = st51[50] + valid.astype(U32)

            # ONE pl.when (not value-form lax.cond: a runtime-false cond
            # does NOT skip its branch on Mosaic — measured, ablate_fused
            # `rt` group; and not TWO sequential whens: an absorb-when
            # followed by a perm-when SIGABRTs Mosaic layout inference —
            # round-5 bisect, tools/bisect_fold.py `two` variant).  The
            # permutation runs for any valid slot and the wrap select
            # keeps absorb-only lanes on their absorbed state; the
            # bit-sliced fold (the production path) gates permutations on
            # wrap occupancy properly via scalar SMEM flags.
            @pl.when(jnp.any(valid))
            def _absorb():
                lo = [ab50[i] for i in range(25)]
                hi = [ab50[25 + i] for i in range(25)]
                plo, phi = _keccak_f1600_kernel(lo, hi)
                out50 = jnp.stack(plo + phi, axis=0)
                new50 = jnp.where(wrap_b[None, :], out50, ab50)
                st_scr[...] = jnp.concatenate(
                    [new50, ncount[None, :]], axis=0)
            return carry

        jax.lax.fori_loop(0, kq, slot_body, 0)
        st51 = st_scr[...]
        rows = [jnp.stack([st51[k_], st51[25 + k_]], axis=0)
                for k_ in range(25)]
        wc_out[...] = jnp.stack(rows, axis=0)
        cnt_out[...] = st51[50:51]

    def spec(shape_prefix):
        nd = len(shape_prefix)
        return pl.BlockSpec(
            tuple(shape_prefix) + (tile,),
            (lambda i, _nd=nd: (0,) * _nd + (i,)),
            memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[spec((kq, 4)), spec((kq, 8)), spec((kq,)),
                  spec((25, 2)), spec((1,))],
        out_specs=[spec((25, 2)), spec((1,))],
        out_shape=[jax.ShapeDtypeStruct((25, 2, B), jnp.uint32),
                   jax.ShapeDtypeStruct((1, B), jnp.uint32)],
        scratch_shapes=[pltpu.VMEM((51, tile), jnp.uint32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT_BYTES),
    )
    return call



#: record-word -> base plane index of the 12 nonzero 64-byte-record words
#: (u64 lane L, half h) -> planes L*64 + 32*h .. +31; lanes 2,3 are the
#: record's zero padding (bytes 16..32) and absorb nothing
_REC_DEST_BASE = (0, 32, 64, 96,            # lanes 0,1 lo/hi
                  256, 288, 320, 352,       # lanes 4,5 lo/hi
                  384, 416, 448, 480)       # lanes 6,7 lo/hi


def _rolling_fold_bitsliced(config: VmConfig, k_cycles: int,
                            interpret: bool):
    """Bit-sliced companion fold (spec v2): absorb one chunk's witness-slot
    blocks into the per-lane rolling sponges with the sponge state held as
    1600 u32 bit-planes (32 lanes per u32).

    Why: the u32-pair fold kernel is register-spill bound — measured
    645us per batch-permutation at B=32k vs ~56us bit-sliced (PERF.md
    round-4 keccak audit; round-5 probe_rolling/probe_perm) — and the
    rate-packed spec v2 halves the permutation count on top.

    Two pallas kernels per chunk (round-5 measurements drove every piece
    of this shape — tools/probe_bsparts.py / probe_foldparts.py /
    probe_fold_split.py):

      1. MASK kernel: streams the flag blocks once and carries a per-lane
         parity bitmask in VMEM scratch across the slot grid, emitting the
         packed even/wrap destination masks [KQ, 2, 8, G8] and per-lane
         valid-count planes.  (The same computation as XLA ops — cumsum,
         bit-packs, reduces — measured 27 ms/chunk of pass-structure
         overhead; this kernel does it in one 128 MB stream.)
      2. FOLD kernel: per active slot, builds the 12 record words from
         the raw meta/value blocks and bit-transposes them in-register
         (an XLA-side butterfly materializing [KQ, 384, 8, G8] record
         planes measured 127 ms/chunk); per wrapping slot runs one
         keccak-f[1600] over three VMEM buffers (the canonical state must
         survive the permutation for the per-lane wrap select).

    The lane->bit-plane GROUP MAPPING is chosen so transposed outputs
    align with plane slices with no in-kernel shuffles: lane
    b = G8*(32*s + j) + r  ->  group (s, r), bit j.  A slot's record word
    rides as [8, 32, G8] (sublane s, j, r); the 5-stage butterfly pairs
    along axis 1 (aligned slices + u32 position masks — no i1 vectors),
    and its output's [:, z, :] slice IS plane z of that word: absorb is
    pure [8, g8t]-slice XORs into the state ref.  Slot gating rides SMEM
    scalar flags (jnp.any-gated sequential pl.whens SIGABRT Mosaic —
    tools/bisect_fold.py).

    Bit-exact vs the jnp engine's per-slot absorbs (same records, same
    order, same parity discipline) — tests/test_fused_cycle.py."""
    from ..ops.keccak import (
        _bit_transpose_32, _chi_source_planes, _g8_tile,
        bitsliced_round_refs, rc_planes_np,
    )

    B = config.batch
    assert B % 256 == 0, B
    G8 = B // 256
    g8t = _g8_tile(G8)
    kq = k_cycles * SLOTS_PER_CYCLE
    chi_src = _chi_source_planes()
    rc_tab = rc_planes_np()
    _T_MASKS = (np.uint32(0x55555555), np.uint32(0x33333333),
                np.uint32(0x0F0F0F0F), np.uint32(0x00FF00FF),
                np.uint32(0x0000FFFF))

    def _bswap(x):
        x = x.astype(U32)
        return ((x & 0xFF) << 24) | ((x & 0xFF00) << 8) \
            | ((x >> 8) & 0xFF00) | (x >> 24)

    def _transpose32(x):
        """32x32 bit transpose of [8, 32, g8t] (j on axis 1): same
        butterfly as ops.keccak._bit_transpose_32, expressed with aligned
        axis-1 slice-rolls and u32 position masks (kernel-safe: no
        reshapes, no i1 vectors, no unaligned slices)."""
        iota_j = jax.lax.broadcasted_iota(U32, x.shape, 1)
        for k in range(5):
            w = 1 << k
            m = _T_MASKS[k]
            down = jnp.concatenate([x[:, w:], x[:, :w]], axis=1)
            up = jnp.concatenate([x[:, 32 - w:], x[:, :32 - w]], axis=1)
            upper_u = U32(0) - ((iota_j >> k) & 1)   # all-ones where j&w
            t_low = ((x >> w) ^ down) & m
            t_up = ((up >> w) ^ x) & m
            xl = x ^ (t_low << w)
            xu = x ^ t_up
            x = (xl & ~upper_u) | (xu & upper_u)
        return x

    # ------------------------------------------------------------------
    # Kernel 1: per-slot destination masks + count planes from the flag
    # blocks, with the running parity bitmask carried in VMEM scratch.
    # ------------------------------------------------------------------
    def mask_kernel(flg_ref, par0_ref, emwm_ref, cntp_ref, par_scr):
        s = pl.program_id(1)

        @pl.when(s == 0)
        def _init():
            par_scr[...] = par0_ref[0]
            cntp_ref[...] = jnp.zeros((32, 8, cntp_ref.shape[2]), U32)

        flg = flg_ref[0]                              # [8, 32, g8t]
        vfull = U32(0) - ((flg >> 2) & 1)             # all-ones where valid
        vt = _transpose32(vfull)                      # every z-slice = mask
        vmask = vt[:, 0]                              # [8, g8t] lane bits
        par = par_scr[...]
        em = vmask & ~par
        wm = vmask & par
        par_scr[...] = par ^ vmask
        emwm_ref[0, 0] = em
        emwm_ref[0, 1] = wm
        for j in range(32):
            cntp_ref[j] = cntp_ref[j] + ((vmask >> j) & 1)

    def mask_spec(shape_mid):
        nd = len(shape_mid)
        return pl.BlockSpec(
            (1,) + tuple(shape_mid) + (g8t,),
            (lambda g, s, _nd=nd: (s,) + (0,) * _nd + (g,)),
            memory_space=pltpu.VMEM)

    mask_call = pl.pallas_call(
        mask_kernel,
        grid=(G8 // g8t, kq),
        in_specs=[
            mask_spec((8, 32)),                       # flags
            pl.BlockSpec((1, 8, g8t), lambda g, s: (0, 0, g),
                         memory_space=pltpu.VMEM),    # parity0
        ],
        out_specs=[
            mask_spec((2, 8)),                        # even|wrap masks
            pl.BlockSpec((32, 8, g8t), lambda g, s: (0, 0, g),
                         memory_space=pltpu.VMEM),    # count planes
        ],
        out_shape=[jax.ShapeDtypeStruct((kq, 2, 8, G8), jnp.uint32),
                   jax.ShapeDtypeStruct((32, 8, G8), jnp.uint32)],
        scratch_shapes=[pltpu.VMEM((8, g8t), jnp.uint32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT_BYTES),
    )

    # ------------------------------------------------------------------
    # Kernel 2: the fold proper (absorbs + gated permutations).
    # ------------------------------------------------------------------
    def kernel(rc_ref, any_ref, wrap_ref, meta_ref, val_ref, flg_ref,
               emwm_ref, s_ref, o_ref, buf_b, buf_c):
        s = pl.program_id(1)

        @pl.when(s == 0)
        def _init():
            o_ref[...] = s_ref[...]

        @pl.when(any_ref[s] != 0)
        def _absorb():
            em = emwm_ref[0, 0]                      # [8, g8t]
            wm = emwm_ref[0, 1]
            ts, mtype, mpage, midx = (meta_ref[0, i] for i in range(4))
            flg = flg_ref[0]                         # [8, 32, g8t]
            fl = (flg & 1) | (flg & 2)
            words = [
                _bswap(ts),
                (mtype & 0xFF) | (((mpage >> 24) & 0xFF) << 8)
                | (((mpage >> 16) & 0xFF) << 16)
                | (((mpage >> 8) & 0xFF) << 24),
                (mpage & 0xFF) | (((midx >> 24) & 0xFF) << 8)
                | (((midx >> 16) & 0xFF) << 16)
                | (((midx >> 8) & 0xFF) << 24),
                (midx & 0xFF) | (fl << 8),
            ]
            for k_ in range(4):
                words.append(_bswap(val_ref[0, 7 - 2 * k_]))
                words.append(_bswap(val_ref[0, 6 - 2 * k_]))
            for word, base in zip(words, _REC_DEST_BASE):
                t = _transpose32(word)               # [8, 32, g8t]
                for z in range(32):
                    sl = t[:, z]                     # [8, g8t]: plane z
                    o_ref[base + z] = o_ref[base + z] ^ (sl & em)
                    p1 = 512 + base + z
                    o_ref[p1] = o_ref[p1] ^ (sl & wm)

        @pl.when(wrap_ref[s] != 0)
        def _perm():
            # 24 rounds over three buffers: o (canonical, preserved),
            # b, c — r0: o->b, then 11 fori bodies of (b->c, c->b) for
            # rounds 1..22, r23: b->c; per-lane select c back into o.
            bitsliced_round_refs(o_ref, buf_b, rc_ref, 0, chi_src)

            def body(j, _):
                r = 2 * j + 1
                bitsliced_round_refs(buf_b, buf_c, rc_ref, r, chi_src)
                bitsliced_round_refs(buf_c, buf_b, rc_ref, r + 1, chi_src)
                return 0

            jax.lax.fori_loop(0, 11, body, 0)
            bitsliced_round_refs(buf_b, buf_c, rc_ref, 23, chi_src)
            wm = emwm_ref[0, 1]
            for p in range(1600):
                o_ref[p] = (buf_c[p] & wm) | (o_ref[p] & ~wm)

    state_spec = pl.BlockSpec((1600, 8, g8t), lambda g, s: (0, 0, g),
                              memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(G8 // g8t, kq),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),    # rc [24, 64]
            pl.BlockSpec(memory_space=pltpu.SMEM),    # slot_any [kq]
            pl.BlockSpec(memory_space=pltpu.SMEM),    # slot_wrap [kq]
            mask_spec((4, 8, 32)),                    # meta
            mask_spec((8, 8, 32)),                    # value
            mask_spec((8, 32)),                       # flags
            mask_spec((2, 8)),                        # even|wrap masks
            state_spec,
        ],
        out_specs=state_spec,
        out_shape=jax.ShapeDtypeStruct((1600, 8, G8), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((1600, 8, g8t), jnp.uint32),
                        pltpu.VMEM((1600, 8, g8t), jnp.uint32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT_BYTES),
    )

    def _state_to_planes(wc_state):
        """[25, 2, B] -> [1600, 8, G8] under the fold's lane mapping
        (lane G8*(32s + j) + r -> group (s, r), bit j)."""
        w = jnp.transpose(wc_state.reshape(50, B), (1, 0))   # [B, 50]
        w = w.reshape(8, 32, G8, 50)                         # s, j, r, W
        w = jnp.transpose(w, (0, 2, 3, 1))                   # s, r, W, j
        p = _bit_transpose_32(w)                             # s, r, W, z
        p = jnp.transpose(p, (2, 3, 0, 1))                   # W, z, s, r
        return p.reshape(1600, 8, G8)

    def _planes_to_state(planes):
        p = planes.reshape(50, 32, 8, G8)                    # W, z, s, r
        p = jnp.transpose(p, (2, 3, 0, 1))                   # s, r, W, z
        w = _bit_transpose_32(p)                             # s, r, W, j
        w = jnp.transpose(w, (0, 3, 1, 2))                   # s, j, r, W
        return jnp.transpose(w.reshape(B, 50), (1, 0)).reshape(25, 2, B)

    def _pack_lane_bits(m):
        """[B] u32 0/1 -> [8, G8] packed bitmask under the lane mapping."""
        g = m.reshape(8, 32, G8)
        shifts = jnp.arange(32, dtype=U32)
        return (g << shifts[None, :, None]).sum(axis=1, dtype=U32)

    def fold(meta_blk, val_blk, flg_blk, wc_state, cnt):
        flg5 = flg_blk.reshape(kq, 1, 8, 32, G8)[:, 0]
        par0 = _pack_lane_bits(cnt[0] & 1)[None]
        emwm, cntp = mask_call(flg5, par0)
        # slot flags from the 8 MB mask array (not the 128 MB flag
        # blocks): the XLA reduces here are two orders of magnitude off
        # the fold's critical path
        union = emwm[:, 0] | emwm[:, 1]
        slot_any = jnp.any(union != 0, axis=(1, 2)).astype(jnp.int32)
        slot_wrap = jnp.any(emwm[:, 1] != 0, axis=(1, 2)).astype(jnp.int32)
        meta5 = meta_blk.reshape(kq, 4, 8, 32, G8)
        val5 = val_blk.reshape(kq, 8, 8, 32, G8)
        st_planes = _state_to_planes(wc_state)
        out_planes = call(jnp.asarray(rc_tab), slot_any, slot_wrap,
                          meta5, val5, flg5, emwm, st_planes)
        wc_new = _planes_to_state(out_planes)
        # count planes (j, s, r) -> per-lane counts [B]
        dcnt = jnp.transpose(cntp, (1, 0, 2)).reshape(B)
        cnt_new = cnt + dcnt[None, :]
        return wc_new, cnt_new

    # internals exposed for the perf tooling (tools/probe_fold_split.py)
    fold._mask_call = mask_call
    fold._call = call
    fold._state_to_planes = _state_to_planes
    fold._planes_to_state = _planes_to_state
    fold._rc_tab = rc_tab
    return fold


def _run_chunk(config, tile, interpret, k_cycles, k_stop,
               bufs, wq, lq, dq, pq):
    """One fused-kernel chunk + queue-block splices (shared by the
    jitted multi-chunk wrapper and the ecrecover-detour driver).
    Executes min(k_stop, k_cycles) cycles of a k_cycles-compiled
    kernel; blocks for the unexecuted tail are zero."""
    cap = max(config.queue_capacity, SLOTS_PER_CYCLE)
    with_lq = config.storage_slots > 0 and config.log_queue_capacity > 0
    with_dq = config.storage_slots > 0 \
        and config.decommit_queue_capacity > 0
    with_pq = config.precompile_queue_capacity > 0
    call = _build_call(config, k_cycles, tile, interpret)
    step0 = jnp.min(bufs["scal"][_SROW["global_step"]]).astype(I32)
    bufs, blocks = call(step0, k_stop, bufs)
    if config.rolling_commitment:
        # bit-sliced fold whenever the plane layout fits (B % 256); the
        # u32-pair fallback covers small batches (unit tests, tiny-shard
        # meshes).  ERAVM_ROLLING_BITSLICED=0 forces the fallback for A/B.
        if (config.batch % 256 == 0
                and os.environ.get("ERAVM_ROLLING_BITSLICED", "1") == "1"):
            fold = _rolling_fold_bitsliced(config, k_cycles, interpret)
        else:
            fold = _rolling_fold_call(config, k_cycles, tile, interpret)
        wc_new, cnt_new = fold(
            blocks["wq_meta_blk"], blocks["wq_value_blk"],
            blocks["wq_flags_blk"], bufs["wc_state"],
            bufs["scal"][_SROW["wc_count"]][None, :])
        bufs = dict(bufs)
        bufs["wc_state"] = wc_new
        bufs["scal"] = bufs["scal"].at[_SROW["wc_count"]].set(cnt_new[0])
    if config.queue_capacity:
        base = jnp.maximum(
            jnp.minimum(step0 * 8, cap - k_cycles * 8), 0)
        wq = (
            jax.lax.dynamic_update_slice(
                wq[0], blocks["wq_meta_blk"], (base, 0, 0)),
            jax.lax.dynamic_update_slice(
                wq[1], blocks["wq_value_blk"], (base, 0, 0)),
            jax.lax.dynamic_update_slice(
                wq[2], blocks["wq_flags_blk"], (base, 0)),
        )
    if with_lq:
        lbase = jnp.maximum(jnp.minimum(
            step0, config.log_queue_capacity - k_cycles), 0)
        lq = tuple(
            _splice_batch_first(arr, blocks[name], lbase)
            for arr, name in zip(lq, ("lq_meta_blk", "lq_addr_blk",
                                      "lq_key_blk", "lq_read_blk",
                                      "lq_written_blk")))
    if with_dq:
        dbase = jnp.maximum(jnp.minimum(
            step0, config.decommit_queue_capacity - k_cycles), 0)
        dq = (_splice_batch_first(dq[0], blocks["dq_hash_blk"], dbase),
              _splice_batch_first(dq[1], blocks["dq_meta_blk"], dbase))
    if with_pq:
        # batch-global block clock: flagged cycles (any lane emitted)
        # advance pq_blocks; their PS-slot blocks splice at the clock
        # position; overflowed cycles drop their rows, flag lane_error,
        # and skip the per-lane pq_count credit — matching the jnp
        # clamp semantics at block granularity
        from .state import precompile_queue_slots

        PS = sum(precompile_queue_slots(config))
        cap_p = config.precompile_queue_capacity
        emit_rows = blocks["pq_emit_blk"]          # u32[K, B]
        nslot_rows = blocks["pq_nslots_blk"]       # u32[K, B]
        flags_k = jnp.any(emit_rows != 0, axis=1)  # [K]
        blocks0 = jnp.min(bufs["scal"][_SROW["pq_blocks"]]).astype(I32)
        pos_k = blocks0 + jnp.cumsum(flags_k.astype(I32)) \
            - flags_k.astype(I32)
        ovf_k = pos_k * PS > cap_p - PS
        pq_meta, pq_value, pq_flags = pq

        def body(k, carry):
            pq_meta, pq_value, pq_flags, lerr, pcount = carry
            base = jnp.minimum(pos_k[k] * PS, cap_p - PS)

            def write(args):
                pq_meta, pq_value, pq_flags = args
                m = jnp.transpose(blocks["pq_meta_blk"][k], (2, 0, 1))
                vv = jnp.transpose(blocks["pq_value_blk"][k], (2, 0, 1))
                fl = jnp.transpose(blocks["pq_flags_blk"][k], (1, 0))
                return (
                    jax.lax.dynamic_update_slice(pq_meta, m,
                                                 (0, base, 0)),
                    jax.lax.dynamic_update_slice(pq_value, vv,
                                                 (0, base, 0)),
                    jax.lax.dynamic_update_slice(pq_flags, fl,
                                                 (0, base)))

            pq_meta, pq_value, pq_flags = jax.lax.cond(
                flags_k[k] & ~ovf_k[k], write, lambda a: a,
                (pq_meta, pq_value, pq_flags))
            lerr = lerr | ((emit_rows[k] != 0) & ovf_k[k])
            pcount = pcount + jnp.where(ovf_k[k], 0,
                                        nslot_rows[k]).astype(I32)
            return pq_meta, pq_value, pq_flags, lerr, pcount

        lerr0 = jnp.zeros((config.batch,), dtype=jnp.bool_)
        pc0 = jnp.zeros((config.batch,), dtype=I32)
        pq_meta, pq_value, pq_flags, lerr, pcount = jax.lax.fori_loop(
            0, k_cycles, body, (pq_meta, pq_value, pq_flags, lerr0,
                                pc0))
        pq = (pq_meta, pq_value, pq_flags)
        scal = bufs["scal"]
        scal = scal.at[_SROW["lane_error"]].set(
            scal[_SROW["lane_error"]] | lerr.astype(jnp.uint32))
        scal = scal.at[_SROW["pq_count"]].set(
            scal[_SROW["pq_count"]] + pcount.astype(jnp.uint32))
        scal = scal.at[_SROW["pq_blocks"]].set(
            scal[_SROW["pq_blocks"]]
            + jnp.sum(flags_k.astype(jnp.uint32)))
        bufs = dict(bufs)
        bufs["scal"] = scal
    return bufs, wq, lq, dq, pq, blocks


def run_cycles_fused(state: BatchedVmState, config: VmConfig, n_cycles: int,
                     tile: int = 128, k_inner: int = 64,
                     interpret: bool | None = None) -> BatchedVmState:
    """Drop-in run_cycles built on the fused VMEM-resident cycle kernel.

    Bit-exact vs batched_vm.run_cycles for `supported(config)` geometries
    (asserted).  `tile` lanes per kernel instance stay VMEM-resident for
    `k_inner` cycles per kernel invocation; witness-queue blocks are spliced
    into the persistent queue between invocations.

    Configs with `precompile_ecrecover` dispatch to the host-paced
    detour driver (`_run_cycles_fused_ec`); everything else runs the
    fully-jitted multi-chunk path.
    """
    if config.precompile_ecrecover:
        return _run_cycles_fused_ec(state, config, n_cycles, tile=tile,
                                    k_inner=k_inner, interpret=interpret)
    return _run_cycles_fused_jit(state, config, n_cycles, tile=tile,
                                 k_inner=k_inner, interpret=interpret)


@partial(jax.jit, static_argnames=("config", "n_cycles", "tile", "k_inner",
                                   "interpret"),
         donate_argnames=("state",))
def _run_cycles_fused_jit(state: BatchedVmState, config: VmConfig,
                          n_cycles: int, tile: int = 128, k_inner: int = 64,
                          interpret: bool | None = None) -> BatchedVmState:
    assert supported(config), "config outside the fused-kernel subset"
    assert not config.precompile_ecrecover, "ec configs use the detour path"
    assert not config.sweep_gating, "fused path requires sweep_gating=False"
    assert config.batch % tile == 0, (config.batch, tile)
    if config.queue_capacity:
        assert config.queue_capacity >= min(n_cycles, k_inner) * 8
    if config.storage_slots > 0 and config.log_queue_capacity:
        assert config.log_queue_capacity >= min(n_cycles, k_inner)
    if config.storage_slots > 0 and config.decommit_queue_capacity:
        assert config.decommit_queue_capacity >= min(n_cycles, k_inner)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    bufs = _pack(state, config)
    wq = (state.wq_meta, state.wq_value, state.wq_flags)
    lq = (state.lq_meta, state.lq_addr, state.lq_key, state.lq_read,
          state.lq_written)
    dq = (state.dq_hash, state.dq_meta)
    cap = max(config.queue_capacity, SLOTS_PER_CYCLE)
    with_lq = config.storage_slots > 0 and config.log_queue_capacity > 0
    with_dq = config.storage_slots > 0 \
        and config.decommit_queue_capacity > 0
    with_pq = config.precompile_queue_capacity > 0
    pq = (state.pq_meta, state.pq_value, state.pq_flags)


    n_full = n_cycles // k_inner
    rem = n_cycles % k_inner

    if n_full == 1 and rem == 0:
        bufs, wq, lq, dq, pq, _ = _run_chunk(
            config, tile, interpret, k_inner, k_inner,
            bufs, wq, lq, dq, pq)
    elif n_full > 0:
        def chunk_body(_, carry):
            return _run_chunk(config, tile, interpret, k_inner, k_inner,
                              *carry)[:5]

        bufs, wq, lq, dq, pq = jax.lax.fori_loop(
            0, n_full, chunk_body, (bufs, wq, lq, dq, pq))
    if rem:
        bufs, wq, lq, dq, pq, _ = _run_chunk(
            config, tile, interpret, rem, rem, bufs, wq, lq, dq, pq)

    state = _unpack(bufs, state, config)
    if config.queue_capacity:
        state.wq_meta, state.wq_value, state.wq_flags = wq
    if with_lq:
        (state.lq_meta, state.lq_addr, state.lq_key, state.lq_read,
         state.lq_written) = lq
    if with_dq:
        state.dq_hash, state.dq_meta = dq
    if with_pq:
        state.pq_meta, state.pq_value, state.pq_flags = pq
    return state

@partial(jax.jit, static_argnames=("config", "tile", "k_inner", "interpret"),
         donate_argnames=("state",))
def run_chunk_fused_dyn(state: BatchedVmState, k_stop, config: VmConfig,
                        tile: int = 128, k_inner: int = 64,
                        interpret: bool | None = None) -> BatchedVmState:
    """One fused chunk of min(k_stop, k_inner) cycles with a DYNAMIC cycle
    count: ONE compiled program covers every chunk length the adaptive
    scheduler requests (a static n_cycles would recompile the multi-minute
    TPU kernel per distinct length).  Queue semantics under an early stop
    match the ec-detour path: the splice writes the full k_inner-cycle
    block extent (the unexecuted tail rows are zero with no validity
    bits), so callers tracking drain budgets must reserve k_inner cycles
    of queue headroom per call, not k_stop (models/scheduler.py does)."""
    assert supported(config), "config outside the fused-kernel subset"
    assert not config.precompile_ecrecover, "ec configs use the detour path"
    assert not config.sweep_gating, "fused path requires sweep_gating=False"
    assert config.batch % tile == 0, (config.batch, tile)
    if config.queue_capacity:
        assert config.queue_capacity >= k_inner * 8
    if config.storage_slots > 0 and config.log_queue_capacity:
        assert config.log_queue_capacity >= k_inner
    if config.storage_slots > 0 and config.decommit_queue_capacity:
        assert config.decommit_queue_capacity >= k_inner
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bufs = _pack(state, config)
    wq = (state.wq_meta, state.wq_value, state.wq_flags)
    lq = (state.lq_meta, state.lq_addr, state.lq_key, state.lq_read,
          state.lq_written)
    dq = (state.dq_hash, state.dq_meta)
    pq = (state.pq_meta, state.pq_value, state.pq_flags)
    bufs, wq, lq, dq, pq, _ = _run_chunk(
        config, tile, interpret, k_inner, k_stop, bufs, wq, lq, dq, pq)
    state = _unpack(bufs, state, config)
    if config.queue_capacity:
        state.wq_meta, state.wq_value, state.wq_flags = wq
    if config.storage_slots > 0 and config.log_queue_capacity > 0:
        (state.lq_meta, state.lq_addr, state.lq_key, state.lq_read,
         state.lq_written) = lq
    if config.storage_slots > 0 and config.decommit_queue_capacity > 0:
        state.dq_hash, state.dq_meta = dq
    if config.precompile_queue_capacity > 0:
        state.pq_meta, state.pq_value, state.pq_flags = pq
    return state


# ===========================================================================
# ecrecover detour: optimistic chunks + single-cycle jnp execution
# ===========================================================================

@partial(jax.jit, static_argnames=("config", "k_inner", "tile", "interpret"))
def _ec_chunk(state: BatchedVmState, k_stop, config: VmConfig,
              k_inner: int, tile: int, interpret: bool):
    """One fused chunk (dynamic k_stop cycles of a k_inner-compiled kernel)
    returning (new state, per-lane first-ecrecover-cycle index).  NOT
    donating: the detour driver re-runs the same input state."""
    bufs = _pack(state, config)
    wq = (state.wq_meta, state.wq_value, state.wq_flags)
    lq = (state.lq_meta, state.lq_addr, state.lq_key, state.lq_read,
          state.lq_written)
    dq = (state.dq_hash, state.dq_meta)
    pq = (state.pq_meta, state.pq_value, state.pq_flags)
    bufs, wq, lq, dq, pq, blocks = _run_chunk(
        config, tile, interpret, k_inner, k_stop, bufs, wq, lq, dq, pq)
    state = _unpack(bufs, state, config)
    if config.queue_capacity:
        state.wq_meta, state.wq_value, state.wq_flags = wq
    if config.storage_slots > 0 and config.log_queue_capacity > 0:
        (state.lq_meta, state.lq_addr, state.lq_key, state.lq_read,
         state.lq_written) = lq
    if config.storage_slots > 0 and config.decommit_queue_capacity > 0:
        state.dq_hash, state.dq_meta = dq
    if config.precompile_queue_capacity > 0:
        state.pq_meta, state.pq_value, state.pq_flags = pq
    return state, blocks["ec_first_blk"]


def _run_cycles_fused_ec(state: BatchedVmState, config: VmConfig,
                         n_cycles: int, tile: int, k_inner: int,
                         interpret: bool | None) -> BatchedVmState:
    """Host-paced ecrecover-detour driver (see supported() docstring).

    Chunks run OPTIMISTICALLY with the kernel detecting (not executing)
    ecrecover cycles; when a chunk contains one, its results are discarded,
    the chunk re-runs up to that cycle (dynamic k_stop — same compiled
    kernel), and the ecrecover cycle itself executes on the jnp engine
    (batched_vm.run_cycles — bit-exact by definition, including the
    two-word output protocol and the pq round-witness rows).  Ecrecover-
    free chunks pay nothing beyond the per-cycle k<k_stop guard.

    Host-paced (reads the detector between chunks): not callable under an
    enclosing jit/shard_map — shard the batch outside and call per shard.
    """
    import numpy as np

    from .batched_vm import run_cycles as _run_jnp

    assert supported(config), "config outside the fused-kernel subset"
    assert not config.sweep_gating, "fused path requires sweep_gating=False"
    assert config.batch % tile == 0, (config.batch, tile)
    K = min(k_inner, n_cycles)
    if config.queue_capacity:
        assert config.queue_capacity >= K * 8
    if config.storage_slots > 0 and config.log_queue_capacity:
        assert config.log_queue_capacity >= K
    if config.storage_slots > 0 and config.decommit_queue_capacity:
        assert config.decommit_queue_capacity >= K
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    done = 0
    while done < n_cycles:
        want = min(K, n_cycles - done)
        trial, ecf = _ec_chunk(state, jnp.int32(want), config, K, tile,
                               interpret)
        first = int(np.asarray(ecf).min())
        if first >= want:
            state = trial
            done += want
            continue
        del trial                      # discard the optimistic run
        if first > 0:
            state, _ = _ec_chunk(state, jnp.int32(first), config, K, tile,
                                 interpret)
        state = _run_jnp(state, config, 1)
        done += first + 1
    return state
