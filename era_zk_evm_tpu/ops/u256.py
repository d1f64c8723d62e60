"""Branchless 256-bit limb arithmetic on uint32[..., 8] arrays (JAX/VPU).

The compute vocabulary of the batched interpreter: every EraVM arithmetic
opcode (SURVEY.md §2.5 table) lowers to these kernels over [batch, 8] arrays.
All ops are elementwise/VPU-shaped, fully vectorized over leading dims, with
no data-dependent control flow — XLA fuses them into the cycle-step program.

Conventions:
  * limbs are little-endian uint32 (see utils/u256_host.py),
  * carry/borrow/flag outputs are uint32 0/1 arrays (bool_ arrays where noted),
  * per-lane dynamic shift amounts are uint32 arrays (values taken mod 256
    by the VM layer before calling; shift >= 256 yields 0 like the
    reference's U256 shl/shr).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

N = 8  # limbs per word
DIGITS = 16  # 16-bit digits per word
U32 = jnp.uint32
_MASK16 = jnp.uint32(0xFFFF)


def zeros(shape=()) -> jax.Array:
    return jnp.zeros((*shape, N), dtype=U32)


def from_u32_scalar(x) -> jax.Array:
    """Broadcast a uint32 array [...] into [..., 8] with high limbs zero."""
    x = jnp.asarray(x, dtype=U32)
    return jnp.concatenate(
        [x[..., None], jnp.zeros((*x.shape, N - 1), dtype=U32)], axis=-1)


def low_u32(a: jax.Array) -> jax.Array:
    return a[..., 0]


def low_u16(a: jax.Array) -> jax.Array:
    return a[..., 0] & _MASK16


# ---------------------------------------------------------------------------
# add / sub / compare
# ---------------------------------------------------------------------------

def add(a: jax.Array, b: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(a + b) mod 2^256 and the carry-out (0/1 uint32)."""
    out = []
    carry = jnp.zeros(a.shape[:-1], dtype=U32)
    for i in range(N):
        s = a[..., i] + b[..., i]
        c1 = (s < a[..., i]).astype(U32)
        s = s + carry
        c2 = (s < carry).astype(U32)
        out.append(s)
        carry = c1 | c2
    return jnp.stack(out, axis=-1), carry


def sub(a: jax.Array, b: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(a - b) mod 2^256 and the borrow-out (0/1 uint32)."""
    out = []
    borrow = jnp.zeros(a.shape[:-1], dtype=U32)
    for i in range(N):
        d = a[..., i] - b[..., i]
        b1 = (a[..., i] < b[..., i]).astype(U32)
        d2 = d - borrow
        b2 = (d < borrow).astype(U32)
        out.append(d2)
        borrow = b1 | b2
    return jnp.stack(out, axis=-1), borrow


def is_zero(a: jax.Array) -> jax.Array:
    return jnp.all(a == 0, axis=-1)


def eq(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.all(a == b, axis=-1)


def lt(a: jax.Array, b: jax.Array) -> jax.Array:
    """a < b as bool array."""
    _, borrow = sub(a, b)
    return borrow.astype(jnp.bool_)


def gt(a: jax.Array, b: jax.Array) -> jax.Array:
    return lt(b, a)


# ---------------------------------------------------------------------------
# bitwise
# ---------------------------------------------------------------------------

def bit_and(a, b):
    return a & b


def bit_or(a, b):
    return a | b


def bit_xor(a, b):
    return a ^ b


def bit_not(a):
    return ~a


def select(mask, a, b):
    """Per-lane select: mask is bool [...]; a/b are [..., 8]."""
    return jnp.where(mask[..., None], a, b)


# ---------------------------------------------------------------------------
# multiplication: 512-bit product via 16-bit digit schoolbook
# ---------------------------------------------------------------------------

def _to_digits(a: jax.Array) -> jax.Array:
    """uint32[..., 8] -> uint32[..., 16] of 16-bit digits."""
    lo = a & _MASK16
    hi = a >> 16
    return jnp.stack([lo, hi], axis=-1).reshape(*a.shape[:-1], DIGITS)


def _from_digits(d: jax.Array) -> jax.Array:
    """uint32 digit array [..., 2k] (digits < 2^16) -> uint32 [..., k] limbs."""
    pairs = d.reshape(*d.shape[:-1], d.shape[-1] // 2, 2)
    return pairs[..., 0] | (pairs[..., 1] << 16)

def _column_selectors():
    import numpy as np

    sel_lo = np.zeros((DIGITS * DIGITS, 2 * DIGITS), dtype=np.float32)
    sel_hi = np.zeros((DIGITS * DIGITS, 2 * DIGITS), dtype=np.float32)
    for i in range(DIGITS):
        for j in range(DIGITS):
            sel_lo[i * DIGITS + j, i + j] = 1.0
            sel_hi[i * DIGITS + j, i + j + 1] = 1.0
    return jnp.asarray(sel_lo), jnp.asarray(sel_hi)


def mul_full(a: jax.Array, b: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Full 512-bit product -> (low 256, high 256).

    Schoolbook over 16-bit digits: the 16x16 digit products are split into
    lo/hi halves so 32-digit column accumulators stay far below 2^32
    (<= 32 terms * (2^16-1) + carry < 2^22).  This keeps everything in
    native 32-bit VPU lanes — no 64-bit emulation.
    """
    ad = _to_digits(a)  # [..., 16]
    bd = _to_digits(b)
    # outer product of digits: [..., 16, 16], each < 2^32
    prod = ad[..., :, None] * bd[..., None, :]
    plo = (prod & _MASK16).astype(jnp.float32)
    phi = (prod >> 16).astype(jnp.float32)
    # Column sums as an MXU matmul against constant selection matrices:
    # product digit k collects plo[i, j] with i+j == k and phi[i, j] with
    # i+j == k-1.  The 16-bit half-products and the <= 32-term column sums
    # stay far below 2^24, so float32 accumulation is exact — and the
    # formulation cuts the XLA graph ~5x vs unrolled adds (XLA:CPU compile
    # cost is super-linear in chain length) while mapping onto the MXU.
    sel_lo, sel_hi = _column_selectors()
    flat_shape = a.shape[:-1] + (DIGITS * DIGITS,)
    cols = jnp.dot(plo.reshape(flat_shape), sel_lo,
                   preferred_element_type=jnp.float32) \
        + jnp.dot(phi.reshape(flat_shape), sel_hi,
                  preferred_element_type=jnp.float32)
    cols = cols.astype(U32)  # [..., 32]
    # Carry resolution in log depth (Kogge-Stone lookahead) instead of a
    # 32-step ripple: column values are < 2^22, so one local split leaves
    # digits e < 2^16+64 with carries in {0,1}; generate/propagate prefixes
    # then settle everything at depth 5.  Keeps the XLA graph shallow (the
    # sequential ripple made mod-arithmetic chains pathological to compile
    # on XLA:CPU) and the VPU busy.
    local = cols & _MASK16
    carry0 = cols >> 16
    e = local + jnp.concatenate(
        [jnp.zeros((*cols.shape[:-1], 1), dtype=U32), carry0[..., :-1]],
        axis=-1)
    g = (e >> 16).astype(jnp.bool_)          # generates a carry
    p = e == _MASK16                          # propagates an incoming carry

    def shift1(x, sh):
        pad = jnp.zeros((*x.shape[:-1], sh), dtype=x.dtype)
        return jnp.concatenate([pad, x[..., :-sh]], axis=-1)

    for sh in (1, 2, 4, 8, 16):
        g = g | (p & shift1(g, sh))
        p = p & shift1(p, sh)
    carry_in = shift1(g.astype(U32), 1)
    d = (e + carry_in) & _MASK16
    limbs = _from_digits(d)  # [..., 16]
    return limbs[..., :N], limbs[..., N:]


def mul_low(a: jax.Array, b: jax.Array) -> jax.Array:
    lo, _ = mul_full(a, b)
    return lo


# ---------------------------------------------------------------------------
# shifts (per-lane dynamic amounts)
# ---------------------------------------------------------------------------

def _shift_limbs_left(a: jax.Array, words: jax.Array) -> jax.Array:
    """Shift limbs towards higher indices by `words` (per-lane, 0..8).

    One-hot select over source limbs (result[i] = a[i - words]): per-lane
    dynamic gathers serialize per row on TPU, whereas this is a dense [.., 8, 8]
    compare+reduce the VPU chews through (out-of-range selects nothing = 0).
    """
    i = jnp.arange(N, dtype=jnp.int32)
    sel = i[None, :] == (i[:, None] - words[..., None, None].astype(jnp.int32))
    return jnp.sum(a[..., None, :] * sel.astype(a.dtype), axis=-1)


def _shift_limbs_right(a: jax.Array, words: jax.Array) -> jax.Array:
    i = jnp.arange(N, dtype=jnp.int32)
    sel = i[None, :] == (i[:, None] + words[..., None, None].astype(jnp.int32))
    return jnp.sum(a[..., None, :] * sel.astype(a.dtype), axis=-1)


def shl(a: jax.Array, n: jax.Array) -> jax.Array:
    """a << n per lane; n uint32 [...]; n >= 256 yields 0."""
    n = jnp.asarray(n, dtype=U32)
    words = (n >> 5).astype(jnp.int32)
    bits = (n & 31).astype(U32)
    moved = _shift_limbs_left(a, words)
    lo_part = moved << bits[..., None]
    # bits from the next-lower limb; guard bits==0 (x >> 32 is UB-ish)
    carry_src = _shift_limbs_left(a, words + 1)
    hi_part = jnp.where((bits == 0)[..., None], 0,
                        carry_src >> ((32 - bits) % 32)[..., None])
    out = lo_part | hi_part
    return jnp.where((n >= 256)[..., None], 0, out)


def shr(a: jax.Array, n: jax.Array) -> jax.Array:
    """a >> n per lane; n >= 256 yields 0."""
    n = jnp.asarray(n, dtype=U32)
    words = (n >> 5).astype(jnp.int32)
    bits = (n & 31).astype(U32)
    moved = _shift_limbs_right(a, words)
    lo_part = moved >> bits[..., None]
    carry_src = _shift_limbs_right(a, words + 1)
    hi_part = jnp.where((bits == 0)[..., None], 0,
                        carry_src << ((32 - bits) % 32)[..., None])
    out = lo_part | hi_part
    return jnp.where((n >= 256)[..., None], 0, out)


def rol(a: jax.Array, n: jax.Array) -> jax.Array:
    """Rotate left by n (mod-256 semantics of the reference shift opcode:
    shl(n) | shr(256-n), where shifts of >= 256 give 0)."""
    n = jnp.asarray(n, dtype=U32)
    return shl(a, n) | shr(a, 256 - n)


def ror(a: jax.Array, n: jax.Array) -> jax.Array:
    n = jnp.asarray(n, dtype=U32)
    return shr(a, n) | shl(a, 256 - n)


def shl1(a: jax.Array) -> jax.Array:
    """Cheap static shift-left-by-1 (hot inside div_mod)."""
    hi = a << 1
    carry = a >> 31
    shifted_carry = jnp.concatenate(
        [jnp.zeros((*a.shape[:-1], 1), dtype=U32), carry[..., :-1]], axis=-1)
    return hi | shifted_carry


# ---------------------------------------------------------------------------
# division: binary long division, 256 fori_loop steps
# ---------------------------------------------------------------------------

def div_mod(a: jax.Array, b: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Unsigned (a // b, a % b); b == 0 lanes return (0, 0).

    256-step restoring division under lax.fori_loop — the VM layer gates the
    whole call behind `any lane executes Div this cycle` so the cost is only
    paid when needed.
    """
    b_is_zero = is_zero(b)

    def body(i, carry):
        q, r = carry
        bit_idx = 255 - i
        limb = bit_idx // 32
        bit = bit_idx % 32
        # current dividend bit, per lane
        a_bit = (jax.lax.dynamic_index_in_dim(a, limb, axis=-1, keepdims=False)
                 >> bit.astype(U32)) & 1
        r = shl1(r)
        r = r.at[..., 0].set(r[..., 0] | a_bit)
        r_minus_b, borrow = sub(r, b)
        fits = borrow == 0
        r = select(fits, r_minus_b, r)
        q = shl1(q)
        q = q.at[..., 0].set(q[..., 0] | fits.astype(U32))
        return q, r

    q0 = jnp.zeros_like(a)
    r0 = jnp.zeros_like(a)
    q, r = jax.lax.fori_loop(0, 256, body, (q0, r0))
    q = select(b_is_zero, jnp.zeros_like(q), q)
    r = select(b_is_zero, jnp.zeros_like(r), r)
    return q, r
