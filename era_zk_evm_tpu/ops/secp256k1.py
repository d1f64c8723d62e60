"""Batched secp256k1 signature recovery (JAX, u32-limb arithmetic).

The least TPU-shaped math in the system (SURVEY.md §7 hard-part #2), made
branchless: field/scalar arithmetic works in unnormalized [0, 2^256) residues
using the pseudo-Mersenne folds (2^256 ≡ 2^32+977 mod p; 2^256 ≡ delta mod n),
inversions and square roots are fixed-exponent square-and-multiply ladders
under `lax.fori_loop` (static exponent bit tables, batch-uniform indexing),
and the point ladder runs in Jacobian coordinates with select-resolved edge
cases (infinity, doubling collisions) instead of branches.

Scalar reference: era_zk_evm_tpu.golden.precompiles.ecrecover_inner."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import to_limbs
from . import u256

U32 = jnp.uint32

P_INT = 2**256 - 2**32 - 977
N_INT = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141
GX_INT = 0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798
GY_INT = 0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8

_P = to_limbs(P_INT)
_N = to_limbs(N_INT)
_FOLD_P = to_limbs(2**256 - P_INT)   # 2^32 + 977
_FOLD_N = to_limbs(2**256 - N_INT)


def _const(arr, batch):
    return jnp.broadcast_to(jnp.asarray(arr), (batch, 8))


def _fold_carry(s, carry, fold):
    """s + carry * fold (carry is 0/1 u32); result may wrap again -> repeat."""
    add_term = u256.select(carry.astype(jnp.bool_), fold, u256.zeros(s.shape[:-1]))
    s2, c2 = u256.add(s, add_term)
    add_term2 = u256.select(c2.astype(jnp.bool_), fold,
                            u256.zeros(s.shape[:-1]))
    s3, _ = u256.add(s2, add_term2)
    return s3


def mod_add(a, b, fold):
    s, c = u256.add(a, b)
    return _fold_carry(s, c, fold)


def mod_sub(a, b, fold):
    d, bw = u256.sub(a, b)
    # borrow: result is a-b+2^256 ≡ a-b+fold; subtract may borrow again
    sub_term = u256.select(bw.astype(jnp.bool_), fold, u256.zeros(d.shape[:-1]))
    d2, bw2 = u256.sub(d, sub_term)
    sub_term2 = u256.select(bw2.astype(jnp.bool_), fold,
                            u256.zeros(d.shape[:-1]))
    d3, _ = u256.sub(d2, sub_term2)
    return d3


def _maybe_barrier(x):
    """XLA:CPU's fusion passes are super-linear in integer-chain length —
    long mod-arithmetic chains (a point-add is ~16 multiplies) take tens of
    minutes to compile unbroken.  A fusion barrier after each field multiply
    restores linear compile cost; on TPU we keep full fusion freedom."""
    if jax.default_backend() == "cpu":
        return jax.lax.optimization_barrier(x)
    return x


def mod_mul(a, b, fold):
    """a*b in [0, 2^256) residues: fold the 512-bit product down.

    Three fold levels: the mod-n fold constant is 129 bits, so hi2*fold can
    reach 2^258 (hi3 <= 3); hi3*fold then provably fits in 256 bits.
    """
    lo, hi = u256.mul_full(a, b)
    lo2, hi2 = u256.mul_full(hi, fold)
    lo3, hi3 = u256.mul_full(hi2, fold)
    lo4, _ = u256.mul_full(hi3, fold)
    s, c1 = u256.add(lo, lo2)
    s = _fold_carry(s, c1, fold)
    s, c2 = u256.add(s, lo3)
    s = _fold_carry(s, c2, fold)
    s, c3 = u256.add(s, lo4)
    return _maybe_barrier(_fold_carry(s, c3, fold))


def normalize(a, modulus):
    """[0, 2^256) residue -> canonical [0, m); one conditional subtract
    suffices because 2^256 < 2m for both moduli."""
    d, bw = u256.sub(a, modulus)
    return u256.select((bw == 0), d, a)


def mod_pow_const(base, exponent: int, fold):
    """base^exponent with a static exponent (inversions, square roots)."""
    bits = jnp.asarray(
        np.array([(exponent >> i) & 1 for i in range(256)], dtype=np.uint32))
    nbits = exponent.bit_length()

    def body(i, acc):
        j = nbits - 1 - i
        acc = mod_mul(acc, acc, fold)
        mult = mod_mul(acc, base, fold)
        return u256.select((bits[j] == 1), mult, acc)

    one = jnp.zeros_like(base).at[..., 0].set(1)
    return jax.lax.fori_loop(0, nbits, body, one)


# ---------------------------------------------------------------------------
# Jacobian point arithmetic (a = 0 curve), batch arrays X/Y/Z u32[B, 8]
# ---------------------------------------------------------------------------

def _pt_double(X, Y, Z, fold):
    A = mod_mul(X, X, fold)
    Bv = mod_mul(Y, Y, fold)
    C = mod_mul(Bv, Bv, fold)
    XB = mod_add(X, Bv, fold)
    D = mod_sub(mod_sub(mod_mul(XB, XB, fold), A, fold), C, fold)
    D = mod_add(D, D, fold)
    E = mod_add(mod_add(A, A, fold), A, fold)
    F = mod_mul(E, E, fold)
    X3 = mod_sub(F, mod_add(D, D, fold), fold)
    Y3 = mod_sub(mod_mul(E, mod_sub(D, X3, fold), fold),
                 _times8(C, fold), fold)
    YZ = mod_mul(Y, Z, fold)
    Z3 = mod_add(YZ, YZ, fold)
    return X3, Y3, Z3


def _times8(v, fold):
    v2 = mod_add(v, v, fold)
    v4 = mod_add(v2, v2, fold)
    return mod_add(v4, v4, fold)


def _is_zero_mod(v, modulus):
    nv = normalize(v, modulus)
    return u256.is_zero(nv)


def _pt_add(X1, Y1, Z1, X2, Y2, Z2, fold, modulus):
    """Full Jacobian addition with select-resolved edge cases."""
    z1_zero = _is_zero_mod(Z1, modulus)
    z2_zero = _is_zero_mod(Z2, modulus)
    Z1Z1 = mod_mul(Z1, Z1, fold)
    Z2Z2 = mod_mul(Z2, Z2, fold)
    U1 = mod_mul(X1, Z2Z2, fold)
    U2 = mod_mul(X2, Z1Z1, fold)
    S1 = mod_mul(Y1, mod_mul(Z2, Z2Z2, fold), fold)
    S2 = mod_mul(Y2, mod_mul(Z1, Z1Z1, fold), fold)
    H = mod_sub(U2, U1, fold)
    R = mod_sub(S2, S1, fold)
    h_zero = _is_zero_mod(H, modulus)
    r_zero = _is_zero_mod(R, modulus)
    same_point = h_zero & r_zero
    opposite = h_zero & ~r_zero

    HH = mod_mul(H, H, fold)
    HHH = mod_mul(HH, H, fold)
    V = mod_mul(U1, HH, fold)
    RR = mod_mul(R, R, fold)
    X3 = mod_sub(mod_sub(RR, HHH, fold),
                 mod_add(V, V, fold), fold)
    Y3 = mod_sub(mod_mul(R, mod_sub(V, X3, fold), fold),
                 mod_mul(S1, HHH, fold), fold)
    Z3 = mod_mul(mod_mul(Z1, Z2, fold), H, fold)

    dX, dY, dZ = _pt_double(X1, Y1, Z1, fold)
    X3 = u256.select(same_point, dX, X3)
    Y3 = u256.select(same_point, dY, Y3)
    Z3 = u256.select(same_point, dZ, Z3)
    zero = u256.zeros(X3.shape[:-1])
    X3 = u256.select(opposite, zero, X3)
    Y3 = u256.select(opposite, zero, Y3)
    Z3 = u256.select(opposite, zero, Z3)
    # identity cases
    X3 = u256.select(z1_zero, X2, X3)
    Y3 = u256.select(z1_zero, Y2, Y3)
    Z3 = u256.select(z1_zero, Z2, Z3)
    X3 = u256.select(z2_zero & ~z1_zero, X1, X3)
    Y3 = u256.select(z2_zero & ~z1_zero, Y1, Y3)
    Z3 = u256.select(z2_zero & ~z1_zero, Z1, Z3)
    return X3, Y3, Z3


def scalar_mul(k, px, py, fold, modulus):
    """k * (px, py) in Jacobian coords; MSB-first double-and-add ladder."""
    B = k.shape[0]
    one = jnp.zeros((B, 8), dtype=U32).at[:, 0].set(1)
    zero = u256.zeros((B,))

    def body(i, carry):
        X, Y, Z = carry
        X, Y, Z = _pt_double(X, Y, Z, fold)
        bit_idx = 255 - i
        limb = jax.lax.dynamic_index_in_dim(k, bit_idx // 32, axis=1,
                                            keepdims=False)
        bit = (limb >> jnp.uint32(bit_idx % 32)) & 1
        aX, aY, aZ = _pt_add(X, Y, Z, px, py, one, fold, modulus)
        X = u256.select(bit == 1, aX, X)
        Y = u256.select(bit == 1, aY, Y)
        Z = u256.select(bit == 1, aZ, Z)
        return X, Y, Z

    return jax.lax.fori_loop(0, 256, body, (zero, zero, zero))


def to_affine(X, Y, Z, fold, modulus, modulus_int):
    zinv = mod_pow_const(Z, modulus_int - 2, fold)
    zinv2 = mod_mul(zinv, zinv, fold)
    x = normalize(mod_mul(X, zinv2, fold), modulus)
    y = normalize(mod_mul(Y, mod_mul(zinv2, zinv, fold), fold), modulus)
    return x, y


# ---------------------------------------------------------------------------
# ecrecover
# ---------------------------------------------------------------------------

@jax.jit
def ecrecover_batched(digest, v, r, s):
    """Batched address recovery.

    digest/r/s: u32[B, 8]; v: u32[B] (recovery bit 0/1).
    Returns (ok bool[B], address u32[B, 8] — low 160 bits of keccak(pubkey)).
    """
    B = digest.shape[0]
    fp = _const(_FOLD_P, B)
    fn = _const(_FOLD_N, B)
    p_mod = _const(_P, B)
    n_mod = _const(_N, B)

    r_n = normalize(r, n_mod)
    s_n = normalize(s, n_mod)
    ok = ~u256.is_zero(r_n) & ~u256.is_zero(s_n) \
        & u256.lt(r, n_mod) & u256.lt(s, n_mod) & (v <= 1)
    ok = ok & u256.lt(r, p_mod)  # R.x must be a field element

    # lift x = r to a curve point: y = sqrt(x^3 + 7)
    x = r_n
    x3 = mod_mul(mod_mul(x, x, fp), x, fp)
    seven = jnp.zeros((B, 8), dtype=U32).at[:, 0].set(7)
    y_sq = mod_add(x3, seven, fp)
    y = mod_pow_const(y_sq, (P_INT + 1) // 4, fp)
    y_check = normalize(mod_mul(y, y, fp), p_mod)
    ok = ok & u256.eq(y_check, normalize(y_sq, p_mod))
    y = normalize(y, p_mod)
    # match the requested parity
    flip = (y[:, 0] & 1) != v
    y = u256.select(flip, mod_sub(p_mod, y, fp), y)

    # e = digest mod n; u1 = (n - e) * r^-1; u2 = s * r^-1
    e = normalize(digest, n_mod)
    r_inv = mod_pow_const(r_n, N_INT - 2, fn)
    neg_e = mod_sub(n_mod, e, fn)  # ≡ -e (n for e == 0, fine: n ≡ 0)
    u1 = normalize(mod_mul(neg_e, r_inv, fn), n_mod)
    u2 = normalize(mod_mul(s_n, r_inv, fn), n_mod)

    gx = _const(to_limbs(GX_INT), B)
    gy = _const(to_limbs(GY_INT), B)
    Xr, Yr, Zr = scalar_mul(u2, x, y, fp, p_mod)
    Xg, Yg, Zg = scalar_mul(u1, gx, gy, fp, p_mod)
    Xq, Yq, Zq = _pt_add(Xr, Yr, Zr, Xg, Yg, Zg, fp, p_mod)
    ok = ok & ~_is_zero_mod(Zq, p_mod)
    qx, qy = to_affine(Xq, Yq, Zq, fp, p_mod, P_INT)

    # address = low 160 bits of keccak256(qx BE || qy BE)
    from .keccak import keccak_f1600

    def bswap(xv):
        return ((xv & 0xFF) << 24) | ((xv & 0xFF00) << 8) \
            | ((xv >> 8) & 0xFF00) | (xv >> 24)

    lo = [jnp.zeros((B,), U32) for _ in range(25)]
    hi = [jnp.zeros((B,), U32) for _ in range(25)]
    # 64 message bytes -> lanes 0..7 (LE u64 lanes of the BE byte stream)
    for k in range(4):
        lo[k] = bswap(qx[:, 7 - 2 * k])
        hi[k] = bswap(qx[:, 6 - 2 * k])
        lo[4 + k] = bswap(qy[:, 7 - 2 * k])
        hi[4 + k] = bswap(qy[:, 6 - 2 * k])
    # keccak256 padding for a 64-byte message in a 136-byte rate block
    lo[8] = lo[8] ^ jnp.uint32(0x01)
    hi[16] = hi[16] ^ jnp.uint32(0x80000000)
    lo, hi = keccak_f1600(lo, hi, unroll=False)
    # digest bytes 12..32 (BE address) from the LE-lane digest
    dbytes = []
    for i in range(32):
        lane_v = lo[i // 8] if (i % 8) < 4 else hi[i // 8]
        dbytes.append((lane_v >> (8 * ((i % 8) % 4))) & 0xFF)
    addr = jnp.zeros((B, 8), dtype=U32)
    for j in range(5):  # low 160 bits: address bytes 12..31 BE
        limb = (dbytes[28 - 4 * j] << 24) | (dbytes[29 - 4 * j] << 16) \
            | (dbytes[30 - 4 * j] << 8) | dbytes[31 - 4 * j]
        addr = addr.at[:, j].set(limb)
    addr = u256.select(ok, addr, jnp.zeros_like(addr))
    return ok, addr
