"""Keccak-f[1600] formulation probes (VERDICT r3 weak #5 / next-step #4).

Adversarial audit of the "15M perms/s is VPU speed-of-light" claim.
Algorithmic op budget for the u32-pair form (counted from ops/keccak._round):

  per round, per state, in u32-element ops:
    theta C   : 5 x-cols x 2 halves x 4 XOR                =  40
    theta D   : 5 x (rot1 pair = 6 ops + 2 XOR)            =  40
    theta app : 25 lanes x 2 halves                        =  50
    rho       : 24 lanes x (pair rot ~6 ops)               = 144
    pi        : free (renaming)
    chi       : 25 x 2 x (NOT+AND+XOR)                     = 150
    iota      : 2
    total                                                  ~ 426

  => ~10.2k u32-ops/perm.  One v5e VPU vreg op covers 1024 u32 lanes at
  ~0.94e9 vreg-ops/s => ~9.6e11 u32-ops/s => ~94M perms/s ceiling —
  NOT 12-15M.  The measured 15M implies ~8x more vreg-ops than the
  algorithm needs, which is exactly the factor lost if each rank-1 [TB]
  row occupies one SUBLANE per vreg (128 useful u32 per vreg instead of
  1024).  Probes below test that hypothesis (2D [8, TB/8] rows) plus a
  fully bit-sliced formulation (32 states per u32 bit-plane, rho/pi free):

    bit-sliced per round per 32 states (G-wide u32 vectors):
      theta C 1280, theta D 320 (rot free), theta apply 1600,
      rho/pi free, chi 4800 (NOT shared), iota ~4  => ~8000 ops
    => 24*8000/32 = 6000 u32-ops/perm => ~160M/s ceiling.

Usage:  python tools/probe_keccak.py [variant ...]
Variants: base  rows2d  rows2d_t4096  bitslice
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from era_zk_evm_tpu.golden.precompiles import KECCAK_RC, KECCAK_ROTATIONS  # noqa: E402
from era_zk_evm_tpu.ops.keccak import _round, keccak_f1600_pallas  # noqa: E402

U32 = jnp.uint32


def _time(fn, st, iters, batch, reps=3):
    out = fn(st)
    int(np.asarray(out).ravel()[0])  # hard sync (axon block_until_ready lies)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn(st)
        int(np.asarray(out).ravel()[0])
        best = min(best, time.time() - t0)
    return batch * iters / best


# ---------------------------------------------------------------------------
# Variant: 2D rows — state [25, 2, 8, B/8]; each lane-half row is (8, TB/8),
# a dense (8,128)-tiled vreg layout.  Round function is elementwise, so
# ops/keccak._round works unchanged on 2D rows.
# ---------------------------------------------------------------------------

def keccak_pallas_rows2d(state, iters, tile, interpret=False, unroll=1):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = state.shape[0]
    assert B % tile == 0 and tile % 8 == 0 and iters % unroll == 0
    bl = jnp.transpose(state, (1, 2, 0)).reshape(25, 2, 8, B // 8)

    def kernel(s_ref, o_ref):
        st = s_ref[...]
        st50 = jnp.concatenate([st[:, 0], st[:, 1]], axis=0)  # [50, 8, TB/8]

        def perm(i, st50):
            lo = [st50[j] for j in range(25)]
            hi = [st50[25 + j] for j in range(25)]
            for _ in range(unroll):
                for r in range(24):
                    lo, hi = _round(lo, hi, U32(KECCAK_RC[r] & 0xFFFFFFFF),
                                    U32(KECCAK_RC[r] >> 32))
            return jnp.stack(lo + hi, axis=0)

        st50 = jax.lax.fori_loop(0, iters // unroll, perm, st50)
        o_ref[...] = jnp.stack([st50[:25], st50[25:]], axis=1)

    spec = pl.BlockSpec((25, 2, 8, tile // 8), lambda i: (0, 0, 0, i),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel, grid=(B // tile,), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((25, 2, 8, B // 8), jnp.uint32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 2**20),
    )(bl)
    return jnp.transpose(out.reshape(25, 2, B), (2, 0, 1))


# ---------------------------------------------------------------------------
# Variant: bit-sliced — 32 sponge states per u32; state = [1600, G] bit
# planes (plane p = bit z of lane (x,y), p = (x + 5*y)*64 + z), G u32 groups
# of 32 states each.  rho/pi are plane renamings (free); theta rot1 free.
# Probe only measures the permutation core on synthetic planes (transpose
# in/out is host-side for the probe; a production kernel would amortize it
# per absorbed block, ~5 butterfly stages per 32x32 bit tile).
# ---------------------------------------------------------------------------

def _bitslice_round_plan():
    """Static index plans: theta-parity inputs, D source map, chi sources."""
    # plane index for lane (x, y), bit z
    def p(x, y, z):
        return (x % 5 + 5 * (y % 5)) * 64 + (z % 64)
    # rho offsets per lane (flat x + 5y), from KECCAK_ROTATIONS
    # pi: B[y][2x+3y] = A[x][y]  (i.e. dst (x', y') = (y, 2x+3y))
    chi_src = []  # for each output plane: (s1, s2, s3) post-theta planes
    for y in range(5):
        for x in range(5):
            for z in range(64):
                def pre(xx, yy, zz):
                    # value of B[xx,yy,zz] comes from post-theta A at
                    # inverse-pi lane rotated by rho
                    # pi: B[x', y'] = A[x, y] with x'=y, y'=(2x+3y)%5
                    # so A-lane for B[xx,yy] solves: y=xx? no:
                    # x' = y, y' = (2x+3y)%5  => y = xx... wait invert:
                    # given (xx, yy): y = ... solve x' = y_src, so
                    # y_src = xx? B[y][(2x+3y)%5] = A[x][y] means
                    # dst_x = y, dst_y = (2x+3y)%5.  Inverse:
                    # y_src = xx; 2*x_src = (yy - 3*xx); x_src = ?
                    xx, yy = xx % 5, yy % 5
                    y_src = xx
                    x_src = (yy - 3 * xx) * 3 % 5  # 2*3=6=1 mod 5
                    r = KECCAK_ROTATIONS[x_src + 5 * y_src]
                    return p(x_src, y_src, zz - r)
                chi_src.append((pre(x, y, z), pre(x + 1, y, z),
                                pre(x + 2, y, z)))
    return chi_src


def _verify_bitslice_plan():
    """Check the bit-sliced round against ops/keccak on one random state."""
    rng = np.random.RandomState(0)
    lanes = rng.randint(0, 1 << 62, size=25, dtype=np.uint64)
    # scalar reference round (round 0)
    lo = [jnp.full((8,), np.uint32(v & 0xFFFFFFFF)) for v in lanes]
    hi = [jnp.full((8,), np.uint32(v >> np.uint64(32))) for v in lanes]
    rlo, rhi = _round(lo, hi, U32(KECCAK_RC[0] & 0xFFFFFFFF),
                      U32(KECCAK_RC[0] >> 32))
    want = [int(np.asarray(rlo[i])[0]) | (int(np.asarray(rhi[i])[0]) << 32)
            for i in range(25)]

    # bit-sliced round on numpy (G=1, all 32 slots = same state)
    planes = np.zeros(1600, dtype=np.uint32)
    for i in range(25):
        for z in range(64):
            if (int(lanes[i]) >> z) & 1:
                planes[i * 64 + z] = 0xFFFFFFFF
    planes = _bitslice_round_np(planes, 0)
    got = []
    for i in range(25):
        v = 0
        for z in range(64):
            if planes[i * 64 + z] & 1:
                v |= 1 << z
        got.append(v)
    assert got == want, (got[:3], want[:3])
    print("bitslice plan verified vs ops/keccak._round", file=sys.stderr)


def _bitslice_round_np(planes, rnd):
    out = np.zeros_like(planes)
    C = np.zeros((5, 64) + planes.shape[1:], dtype=planes.dtype)
    for x in range(5):
        for z in range(64):
            v = planes[x * 64 + z]
            for y in range(1, 5):
                v = v ^ planes[(x + 5 * y) * 64 + z]
            C[x, z] = v
    th = planes.copy()
    for x in range(5):
        for z in range(64):
            d = C[(x - 1) % 5, z] ^ C[(x + 1) % 5, (z - 1) % 64]
            for y in range(5):
                th[(x + 5 * y) * 64 + z] ^= d
    chi_src = _bitslice_round_plan()
    for i, (s1, s2, s3) in enumerate(chi_src):
        out[i] = th[s1] ^ (~th[s2] & th[s3])
    rc = KECCAK_RC[rnd]
    for z in range(64):
        if (rc >> z) & 1:
            out[z] ^= np.uint32(0xFFFFFFFF)
    return out


def keccak_pallas_bitslice(planes, iters, interpret=False):
    """Fully bit-sliced keccak-f[1600]: 32 sponge states per u32 bit-plane.

    planes u32[1600, 8, G8] (plane p = bit z of lane (x,y), p = (x+5y)*64+z;
    each u32 element packs bit-planes of 32 distinct states; total states =
    32*8*G8) -> planes after `iters` permutations.

    rho/pi and the theta rot1 are PLANE RENAMINGS (free) — the whole round
    is pure XOR/AND/NOT dataflow, ~8k vector ops + ~11k VMEM ld/st per
    round for 32*8*G8 states.  State lives in two VMEM buffers (the output
    ref and one scratch), double-buffered per round; fori carries stay
    EMPTY (CLAUDE.md Mosaic rule), two rounds per body so the state ends
    each body in the output ref.  Round constants ride in SMEM as
    0/0xFFFFFFFF masks indexed by the dynamic round number.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    chi_src = _bitslice_round_plan()
    G8 = planes.shape[2]
    rc_planes = np.zeros((24, 64), dtype=np.uint32)
    for r in range(24):
        for z in range(64):
            if (KECCAK_RC[r] >> z) & 1:
                rc_planes[r, z] = 0xFFFFFFFF

    def _round_refs(a_ref, b_ref, rc_ref, r):
        # theta parities (values; Mosaic spills as needed)
        C = [[None] * 64 for _ in range(5)]
        for x in range(5):
            for z in range(64):
                v = a_ref[x * 64 + z]
                for y in range(1, 5):
                    v = v ^ a_ref[(x + 5 * y) * 64 + z]
                C[x][z] = v
        # theta apply, in place on A
        for x in range(5):
            for z in range(64):
                d = C[(x - 1) % 5][z] ^ C[(x + 1) % 5][(z - 1) % 64]
                for y in range(5):
                    idx = (x + 5 * y) * 64 + z
                    a_ref[idx] = a_ref[idx] ^ d
        # rho+pi (renaming) + chi, A -> B
        for i, (s1, s2, s3) in enumerate(chi_src):
            b_ref[i] = a_ref[s1] ^ (~a_ref[s2] & a_ref[s3])
        # iota on lane (0,0) planes
        for z in range(64):
            b_ref[z] = b_ref[z] ^ rc_ref[r, z]

    def kernel(rc_ref, s_ref, o_ref, scratch_ref):
        o_ref[...] = s_ref[...]

        def body(j, _):
            r = 2 * (j % 12)
            _round_refs(o_ref, scratch_ref, rc_ref, r)
            _round_refs(scratch_ref, o_ref, rc_ref, r + 1)
            return 0

        jax.lax.fori_loop(0, 12 * iters, body, 0)

    spec = pl.BlockSpec((1600, 8, G8), lambda: (0, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel, grid=(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(planes.shape, jnp.uint32),
        scratch_shapes=[pltpu.VMEM((1600, 8, G8), jnp.uint32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
    )(jnp.asarray(rc_planes), planes)


def probe_vpu_rate(op: str = "xor", rows: int = 8, tile: int = 1024,
                   inner: int = 512, iters: int = 65536,
                   rank1: bool = False) -> float:
    """Empirical VPU u32 issue rate: a dependency-limited-but-wide chain of
    `rows` independent streams of `op` on dense (8, tile/8) row values
    (or rank-1 [tile] rows when rank1 — the fused cycle kernel's lane-
    scalar shape).  Returns achieved vreg-ops/s assuming dense packing
    (1 vreg = 1024 u32 lanes), so a sparse layout shows up as a LOW rate."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(s_ref, o_ref):
        st = s_ref[...]  # [rows, 8, tile//8] (or [rows, tile] rank-1)

        def body(i, st):
            rs = [st[j] for j in range(rows)]
            for k in range(inner // rows):
                if op == "xor":  # 1 op/step, cross-row deps (not foldable)
                    rs = [rs[j] ^ rs[(j + 1) % rows] for j in range(rows)]
                elif op == "mix":  # rot-by-1 pair + xor: 3 ops/step
                    rs = [((rs[j] << 1) | (rs[j] >> 31)) ^ rs[(j + 1) % rows]
                          for j in range(rows)]
                elif op == "andnot":  # chi shape: 3 ops/step
                    rs = [rs[j] ^ (~rs[(j + 1) % rows] & rs[(j + 2) % rows])
                          for j in range(rows)]
            return jnp.stack(rs, axis=0)

        st = jax.lax.fori_loop(0, iters, body, st)
        o_ref[...] = st

    shape = (rows, tile) if rank1 else (rows, 8, tile // 8)
    spec = pl.BlockSpec(shape, lambda: (0,) * len(shape),
                        memory_space=pltpu.VMEM)
    st = jnp.ones(shape, jnp.uint32)
    f = jax.jit(lambda s: pl.pallas_call(
        kernel, grid=(), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(st.shape, jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20))(s))
    int(np.asarray(f(st)).ravel()[0])
    t0 = time.time()
    int(np.asarray(f(st)).ravel()[0])
    dt = time.time() - t0
    ops_per_chain = {"xor": 1, "mix": 3, "andnot": 3}[op]
    vregs_per_row = (8 * (tile // 8)) / 1024
    total_vreg_ops = iters * (inner // rows) * rows * ops_per_chain \
        * vregs_per_row
    return total_vreg_ops / dt


def probe_round_rate(tile: int = 1024, iters: int = 4096,
                     carry: str = "tuple") -> float:
    """Rate of the bare keccak round dataflow: fori over single rounds with
    the 50 rows carried as a tuple of dense 2D values (no per-perm
    stack/slice), fixed RC (perf-representative, semantically one long
    round chain).  Returns perms/s-equivalent (rounds/24) for one tile."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(s_ref, o_ref):
        st = s_ref[...]  # [50, 8, tile//8]

        def body(i, carry_t):
            lo, hi = list(carry_t[0]), list(carry_t[1])
            lo, hi = _round(lo, hi, U32(0x12345678), U32(0x9ABCDEF0))
            return tuple(lo), tuple(hi)

        lo0 = tuple(st[j] for j in range(25))
        hi0 = tuple(st[25 + j] for j in range(25))
        lo, hi = jax.lax.fori_loop(0, iters, body, (lo0, hi0))
        o_ref[...] = jnp.stack(list(lo) + list(hi), axis=0)

    spec = pl.BlockSpec((50, 8, tile // 8), lambda: (0, 0, 0),
                        memory_space=pltpu.VMEM)
    st = jnp.ones((50, 8, tile // 8), jnp.uint32)
    f = jax.jit(lambda s: pl.pallas_call(
        kernel, grid=(), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(st.shape, jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20))(s))
    int(np.asarray(f(st)).ravel()[0])
    t0 = time.time()
    int(np.asarray(f(st)).ravel()[0])
    dt = time.time() - t0
    return tile * iters / 24 / dt


def keccak_pallas_bitslice_fused(planes, iters, interpret=False):
    """Bit-sliced variant with theta fused into the chi reads: no in-place
    theta pass (saves 1600 ld + 1600 st per round), each chi source reads
    the PRE-theta plane and XORs its D term on the fly (+2 xors per
    output).  Win iff the kernel is ld/st-port bound."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    chi_src = _bitslice_round_plan()
    G8 = planes.shape[2]
    rc_planes = np.zeros((24, 64), dtype=np.uint32)
    for r in range(24):
        for z in range(64):
            if (KECCAK_RC[r] >> z) & 1:
                rc_planes[r, z] = 0xFFFFFFFF

    def _round_refs(a_ref, b_ref, rc_ref, r):
        C = [[None] * 64 for _ in range(5)]
        for x in range(5):
            for z in range(64):
                v = a_ref[x * 64 + z]
                for y in range(1, 5):
                    v = v ^ a_ref[(x + 5 * y) * 64 + z]
                C[x][z] = v
        D = [[C[(x - 1) % 5][z] ^ C[(x + 1) % 5][(z - 1) % 64]
              for z in range(64)] for x in range(5)]

        def th(p):
            x, z = (p // 64) % 5, p % 64
            return a_ref[p] ^ D[x][z]

        for i, (s1, s2, s3) in enumerate(chi_src):
            b_ref[i] = th(s1) ^ (~th(s2) & th(s3))
        for z in range(64):
            b_ref[z] = b_ref[z] ^ rc_ref[r, z]

    def kernel(rc_ref, s_ref, o_ref, scratch_ref):
        o_ref[...] = s_ref[...]

        def body(j, _):
            r = 2 * (j % 12)
            _round_refs(o_ref, scratch_ref, rc_ref, r)
            _round_refs(scratch_ref, o_ref, rc_ref, r + 1)
            return 0

        jax.lax.fori_loop(0, 12 * iters, body, 0)

    spec = pl.BlockSpec((1600, 8, G8), lambda: (0, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel, grid=(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(planes.shape, jnp.uint32),
        scratch_shapes=[pltpu.VMEM((1600, 8, G8), jnp.uint32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
    )(jnp.asarray(rc_planes), planes)


def main(argv):
    variants = argv or ["base", "rows2d"]
    batch, iters = 131072, 128
    if variants == ["verify"]:
        jax.config.update("jax_platforms", "cpu")
    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    if "verify" in variants:
        _verify_bitslice_plan()
        if variants == ["verify"]:
            return
    st = jnp.ones((batch, 25, 2), jnp.uint32)
    for v in variants:
        t0 = time.time()
        if v == "base":
            rate = _time(jax.jit(lambda s: keccak_f1600_pallas(
                s, iters=iters, tile=2048, interpret=False)), st, iters, batch)
        elif v == "rows2d":
            rate = _time(jax.jit(lambda s: keccak_pallas_rows2d(
                s, iters, tile=2048)), st, iters, batch)
        elif v.startswith("rows2d_t"):
            rest = v[len("rows2d_t"):]
            t, _, u = rest.partition("_u")
            t, u = int(t), int(u) if u else 1
            rate = _time(jax.jit(lambda s: keccak_pallas_rows2d(
                s, iters, tile=t, unroll=u)), st, iters, batch)
        elif v.startswith("roundrate"):
            t = int(v.split("_t")[1]) if "_t" in v else 1024
            rate = probe_round_rate(tile=t)
            print(f"{v}: {rate / 1e6:.1f}M perm-equiv/s per tile")
            continue
        elif v.startswith("vpu_"):
            rest = v[4:]
            tile = 1024
            if "_t" in rest:
                rest, _, t = rest.partition("_t")
                tile = int(t)
            rank1 = rest.endswith("_r1")
            if rank1:
                rest = rest[:-3]
            rate = probe_vpu_rate(op=rest, rank1=rank1, tile=tile)
            print(f"{v}: {rate / 1e9:.2f}G dense-equivalent vreg-ops/s")
            continue
        elif v.startswith("bitslice"):
            g8 = int(v[len("bitslice_g"):]) if "_g" in v else 128
            pl_in = jnp.ones((1600, 8, g8), jnp.uint32)
            n_states = 32 * 8 * g8
            rate = _time(jax.jit(lambda s: keccak_pallas_bitslice(s, iters)),
                         pl_in, iters, n_states)
        else:
            print(f"unknown variant {v}", file=sys.stderr)
            continue
        print(f"{v}: {rate / 1e6:.1f}M perms/s  "
              f"(total {time.time() - t0:.0f}s incl. compile)")


if __name__ == "__main__":
    main(sys.argv[1:])
