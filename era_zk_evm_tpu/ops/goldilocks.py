"""Goldilocks field (p = 2^64 - 2^32 + 1) arithmetic on u32-pair lanes.

The sorted-queue permutation argument (witness/sorted_queue.py) commits to
queue multisets with grand products over a prime field; Goldilocks is the
field of zkSync Era's prover stack (Boojum), so the framework pins the same
field.  Elements ride as (lo, hi) u32 pairs — the TPU-native form (no u64
vector type on the VPU).

Reduction identities used (standard Goldilocks folklore):
    2^64 ≡ 2^32 - 1   (mod p)
    2^96 ≡ -1         (mod p)
so a 128-bit product a + b*2^64 + c*2^96 (a < 2^64; b, c < 2^32) reduces to
a + b*(2^32 - 1) - c, settled with one conditional add/sub of p.

Differential-tested against Python ints in tests/test_sorted_queue.py.
"""

from __future__ import annotations

import jax.numpy as jnp

U32 = jnp.uint32
GOLDILOCKS_P = (1 << 64) - (1 << 32) + 1
_P_LO = U32(1)
_P_HI = U32(0xFFFFFFFF)


def _add64(a_lo, a_hi, b_lo, b_hi):
    """64+64 -> (lo, hi, carry_out)."""
    lo = a_lo + b_lo
    c0 = (lo < a_lo).astype(U32)
    hi = a_hi + b_hi
    c1 = (hi < a_hi).astype(U32)
    hi2 = hi + c0
    c2 = (hi2 < c0).astype(U32)
    return lo, hi2, c1 | c2


def _sub64(a_lo, a_hi, b_lo, b_hi):
    """64-64 -> (lo, hi, borrow_out)."""
    lo = a_lo - b_lo
    b0 = (a_lo < b_lo).astype(U32)
    hi = a_hi - b_hi
    b1 = (a_hi < b_hi).astype(U32)
    hi2 = hi - b0
    b2 = (hi < b0).astype(U32)
    return lo, hi2, b1 | b2


def _geq_p(lo, hi):
    return (hi > _P_HI) | ((hi == _P_HI) & (lo >= _P_LO))


def gl_reduce64(lo, hi):
    """Reduce a full u64 (as a u32 pair) mod p — at most one subtraction."""
    ge = _geq_p(lo, hi)
    slo, shi, _ = _sub64(lo, hi, _P_LO, _P_HI)
    return jnp.where(ge, slo, lo), jnp.where(ge, shi, hi)


def _mul32(a, b):
    """u32 × u32 -> (lo, hi) via 16-bit splits (no u64 vectors on TPU)."""
    a0, a1 = a & 0xFFFF, a >> 16
    b0, b1 = b & 0xFFFF, b >> 16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    mid = (ll >> 16) + (lh & 0xFFFF) + (hl & 0xFFFF)
    lo = (ll & 0xFFFF) | ((mid & 0xFFFF) << 16)
    hi = hh + (lh >> 16) + (hl >> 16) + (mid >> 16)
    return lo, hi


def gl_mul(a_lo, a_hi, b_lo, b_hi):
    """(a * b) mod p for canonical inputs (< p)."""
    # 128-bit product limbs m0..m3 (u32 each)
    p00_lo, p00_hi = _mul32(a_lo, b_lo)
    p01_lo, p01_hi = _mul32(a_lo, b_hi)
    p10_lo, p10_hi = _mul32(a_hi, b_lo)
    p11_lo, p11_hi = _mul32(a_hi, b_hi)
    m0 = p00_lo
    # m1 = p00_hi + p01_lo + p10_lo (with carries into m2)
    s1 = p00_hi + p01_lo
    c1 = (s1 < p00_hi).astype(U32)
    m1 = s1 + p10_lo
    c1 = c1 + (m1 < s1).astype(U32)
    # m2 = p01_hi + p10_hi + p11_lo + c1 (carries into m3)
    s2 = p01_hi + p10_hi
    c2 = (s2 < p01_hi).astype(U32)
    s2b = s2 + p11_lo
    c2 = c2 + (s2b < s2).astype(U32)
    m2 = s2b + c1
    c2 = c2 + (m2 < c1).astype(U32)
    m3 = p11_hi + c2

    # reduce: x = (m0, m1) + m2*2^64 + m3*2^96
    #       ≡ (m0, m1) + m2*(2^32 - 1) - m3      (mod p)
    # m2*(2^32-1) = (m2 << 32) - m2 = ((-m2) mod 2^32, m2 - borrow)
    t_lo = -m2  # == 2^32 - m2 (mod 2^32)
    t_hi = m2 - (m2 != 0).astype(U32)
    z = jnp.zeros_like(m0)
    lo, hi, carry = _add64(m0, m1, t_lo, t_hi)
    # fold carries of 2^64 ≡ 2^32 - 1; the second fold cannot carry again
    # (a wrapped value is < 2^32 - 1 before the second fold)
    lo, hi, carry2 = _add64(lo, hi, U32(0xFFFFFFFF) * carry, z)
    lo, hi, _ = _add64(lo, hi, U32(0xFFFFFFFF) * carry2, z)
    # subtract m3 (< 2^32); on borrow add p back (x - m3 + p < 2^64 + p)
    slo, shi, borrow = _sub64(lo, hi, m3, jnp.zeros_like(m3))
    blo, bhi, _ = _add64(slo, shi, _P_LO, _P_HI)
    lo = jnp.where(borrow != 0, blo, slo)
    hi = jnp.where(borrow != 0, bhi, shi)
    return gl_reduce64(lo, hi)


def gl_add(a_lo, a_hi, b_lo, b_hi):
    """(a + b) mod p for canonical inputs."""
    lo, hi, carry = _add64(a_lo, a_hi, b_lo, b_hi)
    # a + b < 2p < 2^65: on carry, the value is lo + hi*2^32 + 2^64;
    # 2^64 mod p = 2^32 - 1, and the in-range part is < p after one sub
    clo, chi, _ = _add64(lo, hi, U32(0xFFFFFFFF), jnp.zeros_like(lo))
    lo = jnp.where(carry != 0, clo, lo)
    hi = jnp.where(carry != 0, chi, hi)
    return gl_reduce64(lo, hi)
