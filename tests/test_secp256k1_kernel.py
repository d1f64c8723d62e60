"""Batched ecrecover kernel vs the scalar golden implementation."""

import numpy as np
import jax.numpy as jnp

from era_zk_evm_tpu.golden.precompiles import (
    SECP_GX, SECP_GY, SECP_N, SECP_P, _ec_mul, _inv_mod, ecrecover_inner,
    keccak256,
)
from era_zk_evm_tpu.ops import secp256k1 as ec
from era_zk_evm_tpu.ops import u256
from era_zk_evm_tpu.utils import batch_from_limbs, batch_to_limbs


def _sign(d, digest, k):
    R = _ec_mul(k, (SECP_GX, SECP_GY))
    r = R[0] % SECP_N
    s = _inv_mod(k, SECP_N) * (digest + r * d) % SECP_N
    v = R[1] & 1
    if s > SECP_N // 2:
        s = SECP_N - s
        v ^= 1
    return v, r, s


class TestFieldArithmetic:
    def test_mod_mul_both_moduli(self):
        rng = np.random.default_rng(5)
        vals = [int.from_bytes(rng.bytes(32), "big") for _ in range(32)]
        a = jnp.asarray(batch_to_limbs(vals[:16]))
        b = jnp.asarray(batch_to_limbs(vals[16:]))
        B = 16
        import jax

        for mod_int, fold_arr, mod_arr in (
                (ec.P_INT, ec._FOLD_P, ec._P), (ec.N_INT, ec._FOLD_N, ec._N)):
            fold = ec._const(fold_arr, B)
            modulus = ec._const(mod_arr, B)
            got = batch_from_limbs(np.asarray(jax.jit(
                lambda x, y: ec.normalize(ec.mod_mul(x, y, fold), modulus))(a, b)))
            want = [(x * y) % mod_int for x, y in zip(vals[:16], vals[16:])]
            assert got == want
            got_add = batch_from_limbs(np.asarray(
                ec.normalize(ec.mod_add(a, b, fold), modulus)))
            assert got_add == [(x + y) % mod_int
                               for x, y in zip(vals[:16], vals[16:])]
            got_sub = batch_from_limbs(np.asarray(
                ec.normalize(ec.mod_sub(a, b, fold), modulus)))
            assert got_sub == [(x - y) % mod_int
                               for x, y in zip(vals[:16], vals[16:])]

    def test_mod_pow_inverse(self):
        vals = [123456789, SECP_P - 5, 2**255 + 17, 31337]
        a = jnp.asarray(batch_to_limbs(vals))
        fold = ec._const(ec._FOLD_P, 4)
        modulus = ec._const(ec._P, 4)
        import jax

        inv = jax.jit(lambda x: ec.normalize(
            ec.mod_pow_const(x, ec.P_INT - 2, fold), modulus))(a)
        got = batch_from_limbs(np.asarray(inv))
        want = [pow(v, -1, SECP_P) for v in vals]
        assert got == want


class TestScalarMul:
    def test_matches_scalar_reference(self):
        import jax

        rng = np.random.default_rng(9)
        scalars = [1, 2, 3, int.from_bytes(rng.bytes(32), "big") % SECP_N,
                   SECP_N - 1, 0x1234567890ABCDEF]
        B = len(scalars)
        k = jnp.asarray(batch_to_limbs(scalars))
        gx = ec._const(ec.to_limbs(SECP_GX), B)
        gy = ec._const(ec.to_limbs(SECP_GY), B)
        fold = ec._const(ec._FOLD_P, B)
        modulus = ec._const(ec._P, B)

        @jax.jit
        def run(k):
            X, Y, Z = ec.scalar_mul(k, gx, gy, fold, modulus)
            return ec.to_affine(X, Y, Z, fold, modulus, ec.P_INT)

        x, y = run(k)
        got_x = batch_from_limbs(np.asarray(x))
        got_y = batch_from_limbs(np.asarray(y))
        for i, s in enumerate(scalars):
            wx, wy = _ec_mul(s, (SECP_GX, SECP_GY))
            assert (got_x[i], got_y[i]) == (wx, wy), f"scalar {s:#x}"


class TestEcrecover:
    def test_recover_random_signatures(self):
        rng = np.random.default_rng(13)
        cases = []
        for i in range(6):
            d = int.from_bytes(rng.bytes(32), "big") % SECP_N or 7
            digest = int.from_bytes(keccak256(bytes([i]) * 11), "big")
            kk = int.from_bytes(rng.bytes(32), "big") % SECP_N or 11
            v, r, s = _sign(d, digest, kk)
            cases.append((digest, v, r, s))
        # plus invalid cases
        cases.append((123, 0, 0, 5))          # r == 0
        cases.append((123, 1, 10, 0))         # s == 0
        cases.append((123, 2, 10, 5))         # bad v

        digests = jnp.asarray(batch_to_limbs([c[0] for c in cases]))
        vs = jnp.asarray(np.array([c[1] for c in cases], dtype=np.uint32))
        rs = jnp.asarray(batch_to_limbs([c[2] for c in cases]))
        ss = jnp.asarray(batch_to_limbs([c[3] for c in cases]))
        ok, addr = ec.ecrecover_batched(digests, vs, rs, ss)
        ok = np.asarray(ok)
        addrs = batch_from_limbs(np.asarray(addr))
        for i, (digest, v, r, s) in enumerate(cases):
            want = ecrecover_inner(digest, v, r, s) if v <= 1 else None
            if want is None:
                assert not ok[i], f"case {i} should fail"
            else:
                assert ok[i], f"case {i} should succeed"
                assert addrs[i] == want, f"case {i} address"
