"""Differential tests: JAX limb kernels vs Python big-int arithmetic."""

import random

import numpy as np
import jax.numpy as jnp

from era_zk_evm_tpu.ops import u256
from era_zk_evm_tpu.utils import batch_from_limbs, batch_to_limbs

U256_MASK = (1 << 256) - 1
rng = random.Random(0xE5A)


def rand_values(n):
    vals = []
    for _ in range(n):
        kind = rng.randrange(5)
        if kind == 0:
            vals.append(rng.getrandbits(256))
        elif kind == 1:
            vals.append(rng.getrandbits(rng.randrange(1, 64)))
        elif kind == 2:
            vals.append(0)
        elif kind == 3:
            vals.append(U256_MASK)
        else:
            vals.append(1 << rng.randrange(256))
    return vals


A_VALS = rand_values(64)
B_VALS = rand_values(64)
A = jnp.asarray(batch_to_limbs(A_VALS))
B = jnp.asarray(batch_to_limbs(B_VALS))


def check(batch_result, expected):
    got = batch_from_limbs(np.asarray(batch_result))
    assert got == expected


class TestAddSub:
    def test_add(self):
        s, carry = u256.add(A, B)
        check(s, [(a + b) & U256_MASK for a, b in zip(A_VALS, B_VALS)])
        assert list(np.asarray(carry)) == [
            int(a + b > U256_MASK) for a, b in zip(A_VALS, B_VALS)]

    def test_sub(self):
        d, borrow = u256.sub(A, B)
        check(d, [(a - b) & U256_MASK for a, b in zip(A_VALS, B_VALS)])
        assert list(np.asarray(borrow)) == [
            int(a < b) for a, b in zip(A_VALS, B_VALS)]

    def test_compare(self):
        assert list(np.asarray(u256.lt(A, B))) == [a < b for a, b in zip(A_VALS, B_VALS)]
        assert list(np.asarray(u256.gt(A, B))) == [a > b for a, b in zip(A_VALS, B_VALS)]
        assert list(np.asarray(u256.is_zero(A))) == [a == 0 for a in A_VALS]


class TestMul:
    def test_mul_full(self):
        lo, hi = u256.mul_full(A, B)
        full = [a * b for a, b in zip(A_VALS, B_VALS)]
        check(lo, [f & U256_MASK for f in full])
        check(hi, [f >> 256 for f in full])


class TestDiv:
    def test_div_mod(self):
        q, r = u256.div_mod(A, B)
        expect_q = [a // b if b else 0 for a, b in zip(A_VALS, B_VALS)]
        expect_r = [a % b if b else 0 for a, b in zip(A_VALS, B_VALS)]
        check(q, expect_q)
        check(r, expect_r)


class TestShifts:
    def test_shl_shr_various(self):
        shifts = [0, 1, 5, 31, 32, 33, 63, 64, 100, 128, 200, 255]
        n = jnp.asarray(np.array(
            [shifts[i % len(shifts)] for i in range(len(A_VALS))],
            dtype=np.uint32))
        got_l = u256.shl(A, n)
        got_r = u256.shr(A, n)
        ns = [shifts[i % len(shifts)] for i in range(len(A_VALS))]
        check(got_l, [(a << s) & U256_MASK for a, s in zip(A_VALS, ns)])
        check(got_r, [a >> s for a, s in zip(A_VALS, ns)])

    def test_rotates(self):
        ns = [0, 1, 8, 32, 100, 255, 128, 7] * 8
        n = jnp.asarray(np.array(ns, dtype=np.uint32))
        got_rol = u256.rol(A, n)
        got_ror = u256.ror(A, n)

        def pyrol(a, s):
            s %= 256
            return ((a << s) | (a >> (256 - s))) & U256_MASK if s else a

        def pyror(a, s):
            s %= 256
            return ((a >> s) | (a << (256 - s))) & U256_MASK if s else a

        check(got_rol, [pyrol(a, s) for a, s in zip(A_VALS, ns)])
        check(got_ror, [pyror(a, s) for a, s in zip(A_VALS, ns)])

    def test_shift_ge_256_is_zero(self):
        n = jnp.full((len(A_VALS),), 256, dtype=jnp.uint32)
        assert np.all(np.asarray(u256.shl(A, n)) == 0)
        assert np.all(np.asarray(u256.shr(A, n)) == 0)


class TestBitwise:
    def test_ops(self):
        check(u256.bit_and(A, B), [a & b for a, b in zip(A_VALS, B_VALS)])
        check(u256.bit_or(A, B), [a | b for a, b in zip(A_VALS, B_VALS)])
        check(u256.bit_xor(A, B), [a ^ b for a, b in zip(A_VALS, B_VALS)])


class TestSelectAndConvert:
    def test_select(self):
        mask = jnp.asarray(np.array([i % 2 == 0 for i in range(len(A_VALS))]))
        got = u256.select(mask, A, B)
        check(got, [a if i % 2 == 0 else b
                    for i, (a, b) in enumerate(zip(A_VALS, B_VALS))])

    def test_from_u32(self):
        x = jnp.asarray(np.arange(10, dtype=np.uint32))
        got = u256.from_u32_scalar(x)
        check(got, list(range(10)))
        assert list(np.asarray(u256.low_u32(got))) == list(range(10))
