"""Mosaic feature probe: uniform-index fast paths for arena sweeps.

Checks, on the real chip, that a Pallas TPU kernel can
  1. reduce a per-lane index vector to a scalar (min/max),
  2. branch on scalar uniformity (lax.cond),
  3. dynamically slice a VMEM ref on a non-lane dim with that scalar,
which is what the lockstep fast path for stack/heap/register gathers needs
(all lanes usually share one index, making the one-hot sweep redundant).

Prints PROBE OK + a timing comparison vs the one-hot sweep, or the crash.
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

U32 = jnp.uint32
I32 = jnp.int32
W, TB, REPS = 256, 256, 512


def kernel(mode_ref, arena_ref, idx_ref, out_ref):
    arena = arena_ref[...]        # [8, W, TB]
    idx = idx_ref[...]            # [TB] u32
    mode = mode_ref[0]

    def onehot_gather():
        iota = jax.lax.broadcasted_iota(I32, (W, TB), 0)
        oh = iota == idx.astype(I32)[None, :]
        acc = jnp.where(oh[None, :, :], arena, 0)
        return jnp.sum(acc.astype(I32), axis=1).astype(U32)

    def uniform_gather():
        # dynamic REF indexing (lax.dynamic_slice on a value is not
        # implemented in the Pallas TPU lowering — probed)
        i0 = jnp.min(idx.astype(I32))
        return arena_ref[:, pl.dslice(i0, 1), :][:, 0, :]

    def body(r, acc):
        uniform = jnp.min(idx.astype(I32)) == jnp.max(idx.astype(I32))
        val = jax.lax.cond(uniform & (mode == 1), uniform_gather,
                           onehot_gather)
        return acc + val

    out_ref[...] = jax.lax.fori_loop(
        0, REPS, body, jnp.zeros((8, TB), dtype=U32))


def main():
    print(f"platform: {jax.devices()}", file=sys.stderr)
    arena = jnp.arange(8 * W * TB, dtype=U32).reshape(8, W, TB)
    idx = jnp.full((TB,), 37, dtype=U32)

    def run(mode):
        call = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec((8, W, TB), lambda i, *_: (0, 0, 0),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((TB,), lambda i, *_: (0,),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((8, TB), lambda i, *_: (0, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((8, TB), jnp.uint32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 2**20),
        )
        f = jax.jit(lambda a, i, m: call(m, a, i))
        m = jnp.asarray([mode], dtype=I32)
        out = f(arena, idx, m)
        int(np.asarray(out)[0, 0])
        t0 = time.time()
        out = f(arena, idx, m)
        int(np.asarray(out)[0, 0])
        dt = time.time() - t0
        return np.asarray(out), dt

    want, t_sweep = run(0)
    got, t_fast = run(1)
    assert (want == got).all(), "uniform fast path result mismatch"
    print(f"PROBE OK — one-hot sweep {t_sweep*1e6/REPS:.2f} us/gather, "
          f"uniform dynamic-slice {t_fast*1e6/REPS:.2f} us/gather")


if __name__ == "__main__":
    main()
