"""Bisect the Mosaic VectorLayout::join SIGABRT in the v2 u32-pair fold.

Compiles minimal variants of the fold kernel structure on the real chip.
Usage: python tools/bisect_fold.py [variant ...]
Variants: old wrapb sel two new
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from era_zk_evm_tpu.models.fused_cycle import _keccak_f1600_kernel

U32 = jnp.uint32
KQ = 16
B = 32768
TILE = 512


def build(variant: str):
    def kernel(flg_ref, wc_ref, wc_out, st_scr):
        st_scr[...] = wc_ref[...]             # [51, TB]

        def slot_body(s_, carry):
            st51 = st_scr[...]
            flg = flg_ref[pl.dslice(s_, 1)][0]       # [TB]
            valid = (flg & 4) != 0
            rec_row = (flg & 1) | (flg & 2)
            zrow = jnp.zeros_like(st51[:1])
            z17 = jnp.broadcast_to(zrow, (17,) + zrow.shape[1:])
            z8 = jnp.broadcast_to(zrow, (8,) + zrow.shape[1:])
            z9 = jnp.broadcast_to(zrow, (9,) + zrow.shape[1:])
            r8 = jnp.broadcast_to(rec_row[None, :], (8,) + zrow.shape[1:])
            rec_even = jnp.concatenate([r8, z17, r8, z17], axis=0)

            if variant == "old":
                ab50 = jnp.where(valid[None, :], st51[:50] ^ rec_even,
                                 st51[:50])

                @pl.when(jnp.any(valid))
                def _absorb():
                    lo = [ab50[i] for i in range(25)]
                    hi = [ab50[25 + i] for i in range(25)]
                    plo, phi = _keccak_f1600_kernel(lo, hi)
                    out50 = jnp.stack(plo + phi, axis=0)
                    new50 = jnp.where(valid[None, :], out50, st51[:50])
                    ncount = st51[50] + valid.astype(U32)
                    st_scr[...] = jnp.concatenate(
                        [new50, ncount[None, :]], axis=0)
                return carry

            wrap_b = ((flg >> 2) & st51[50] & 1) != 0
            if variant == "wrapb":
                ab50 = jnp.where(valid[None, :], st51[:50] ^ rec_even,
                                 st51[:50])
            else:
                rec_odd = jnp.concatenate([z8, r8, z9, z8, r8, z9], axis=0)
                rec50 = jnp.where(wrap_b[None, :], rec_odd, rec_even)
                ab50 = jnp.where(valid[None, :], st51[:50] ^ rec50,
                                 st51[:50])
            ncount = st51[50] + valid.astype(U32)
            gate = valid if variant in ("wrapb", "sel") else wrap_b

            if variant in ("wrapb", "sel"):
                @pl.when(jnp.any(gate))
                def _absorb():
                    lo = [ab50[i] for i in range(25)]
                    hi = [ab50[25 + i] for i in range(25)]
                    plo, phi = _keccak_f1600_kernel(lo, hi)
                    out50 = jnp.stack(plo + phi, axis=0)
                    new50 = jnp.where(wrap_b[None, :], out50, st51[:50])
                    st_scr[...] = jnp.concatenate(
                        [new50, ncount[None, :]], axis=0)
            else:  # "two" / "new": split absorb + perm whens
                @pl.when(jnp.any(valid))
                def _absorb():
                    st_scr[...] = jnp.concatenate(
                        [ab50, ncount[None, :]], axis=0)

                @pl.when(jnp.any(wrap_b))
                def _perm():
                    st51b = st_scr[...]
                    lo = [st51b[i] for i in range(25)]
                    hi = [st51b[25 + i] for i in range(25)]
                    plo, phi = _keccak_f1600_kernel(lo, hi)
                    out50 = jnp.stack(plo + phi, axis=0)
                    new50 = jnp.where(wrap_b[None, :], out50, st51b[:50])
                    st_scr[...] = jnp.concatenate(
                        [new50, st51b[50:51]], axis=0)
            return carry

        jax.lax.fori_loop(0, KQ, slot_body, 0)
        wc_out[...] = st_scr[...]

    def spec(shape_prefix):
        nd = len(shape_prefix)
        return pl.BlockSpec(
            tuple(shape_prefix) + (TILE,),
            (lambda i, _nd=nd: (0,) * _nd + (i,)),
            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(B // TILE,),
        in_specs=[spec((KQ,)), spec((51,))],
        out_specs=spec((51,)),
        out_shape=jax.ShapeDtypeStruct((51, B), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((51, TILE), jnp.uint32)],
        interpret=False,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=112 * 2**20),
    )


def main():
    variants = sys.argv[1:] or ["old", "wrapb", "sel", "two"]
    flg = jnp.ones((KQ, B), U32) * 5
    wc = jnp.zeros((51, B), U32)
    for v in variants:
        t0 = time.time()
        try:
            call = build(v)
            out = jax.jit(call)(flg, wc)
            int(np.asarray(out)[0, 0])
            print(f"{v}: OK ({time.time() - t0:.0f}s)", flush=True)
        except Exception as exc:  # noqa: BLE001
            msg = str(exc).split("\n")[0][:120]
            print(f"{v}: FAIL ({time.time() - t0:.0f}s) {msg}", flush=True)


if __name__ == "__main__":
    main()
