"""Batched Keccak-f[1600] permutation + keccak256 sponge (JAX, u32 pairs).

The EraVM keccak256 precompile and the witness queue commitments both reduce
to this permutation (SURVEY.md §2.10, §7).  TPU-native formulation: the 25
64-bit lanes are (lo, hi) uint32 pairs held as 50 separate [B] vectors — every
rotation amount is a compile-time constant, so the whole 24-round permutation
unrolls into a pure elementwise XOR/AND/NOT dataflow that XLA fuses; no
gathers, no 64-bit emulation.

Scalar reference: era_zk_evm_tpu.golden.precompiles.keccak_f1600 (validated
against public test vectors)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..golden.precompiles import KECCAK_RATE_BYTES, KECCAK_RC, KECCAK_ROTATIONS

U32 = jnp.uint32

RATE_WORDS = KECCAK_RATE_BYTES // 8  # 17 u64 lanes per absorbed block


def _rotl(lo, hi, n: int):
    """Rotate a (lo, hi) u64 pair left by constant n."""
    n %= 64
    if n == 0:
        return lo, hi
    if n == 32:
        return hi, lo
    if n < 32:
        new_lo = (lo << n) | (hi >> (32 - n))
        new_hi = (hi << n) | (lo >> (32 - n))
        return new_lo, new_hi
    m = n - 32
    new_lo = (hi << m) | (lo >> (32 - m))
    new_hi = (lo << m) | (hi >> (32 - m))
    return new_lo, new_hi


def keccak_f1600(lo: list, hi: list, unroll: bool = True) -> tuple[list, list]:
    """One permutation over 25 (lo, hi) [B] uint32 vector pairs (flat x+5y).

    `unroll=False` runs the 24 rounds under lax.fori_loop — ~24x smaller XLA
    graph (XLA:CPU's simplifier is super-linear on the unrolled chain), at a
    modest runtime cost on TPU; the fully unrolled form stays the default for
    peak-throughput use.
    """
    if not unroll:
        rc_lo = jnp.asarray([c & 0xFFFFFFFF for c in KECCAK_RC], dtype=U32)
        rc_hi = jnp.asarray([c >> 32 for c in KECCAK_RC], dtype=U32)

        def body(i, carry):
            lo, hi = list(carry[0]), list(carry[1])
            lo, hi = _round(lo, hi, rc_lo[i], rc_hi[i])
            return (tuple(lo), tuple(hi))

        lo_t, hi_t = jax.lax.fori_loop(0, 24, body, (tuple(lo), tuple(hi)))
        return list(lo_t), list(hi_t)

    lo, hi = list(lo), list(hi)
    for rnd in range(24):
        lo, hi = _round(lo, hi, jnp.uint32(KECCAK_RC[rnd] & 0xFFFFFFFF),
                        jnp.uint32(KECCAK_RC[rnd] >> 32))
    return lo, hi


def _round(lo, hi, rc_lo, rc_hi):
    # theta
    c_lo = [lo[x] ^ lo[x + 5] ^ lo[x + 10] ^ lo[x + 15] ^ lo[x + 20]
            for x in range(5)]
    c_hi = [hi[x] ^ hi[x + 5] ^ hi[x + 10] ^ hi[x + 15] ^ hi[x + 20]
            for x in range(5)]
    d = []
    for x in range(5):
        r_lo, r_hi = _rotl(c_lo[(x + 1) % 5], c_hi[(x + 1) % 5], 1)
        d.append((c_lo[(x - 1) % 5] ^ r_lo, c_hi[(x - 1) % 5] ^ r_hi))
    lo = [lo[i] ^ d[i % 5][0] for i in range(25)]
    hi = [hi[i] ^ d[i % 5][1] for i in range(25)]
    # rho + pi
    b_lo, b_hi = [None] * 25, [None] * 25
    for x in range(5):
        for y in range(5):
            s = x + 5 * y
            dst = y + 5 * ((2 * x + 3 * y) % 5)
            b_lo[dst], b_hi[dst] = _rotl(lo[s], hi[s], KECCAK_ROTATIONS[s])
    # chi
    lo = [b_lo[i] ^ (~b_lo[(i % 5 + 1) % 5 + 5 * (i // 5)]
                     & b_lo[(i % 5 + 2) % 5 + 5 * (i // 5)])
          for i in range(25)]
    hi = [b_hi[i] ^ (~b_hi[(i % 5 + 1) % 5 + 5 * (i // 5)]
                     & b_hi[(i % 5 + 2) % 5 + 5 * (i // 5)])
          for i in range(25)]
    # iota
    lo[0] = lo[0] ^ rc_lo
    hi[0] = hi[0] ^ rc_hi
    return lo, hi


def keccak_f1600_array(state: jax.Array) -> jax.Array:
    """Permutation over packed state u32[B, 25, 2] ([..., 0]=lo, [..., 1]=hi).

    fori round form: the 24-round unrolled chain now takes >100 s to
    compile on XLA:CPU even at B=8 (regressed vs round 1 — measured),
    and the TPU throughput difference is in the noise."""
    lo = [state[:, i, 0] for i in range(25)]
    hi = [state[:, i, 1] for i in range(25)]
    lo, hi = keccak_f1600(lo, hi, unroll=False)
    return jnp.stack([jnp.stack(lo, axis=1), jnp.stack(hi, axis=1)], axis=2)


def absorb_blocks(blocks: jax.Array) -> jax.Array:
    """Absorb padded rate-blocks and return the final sponge states.

    blocks: u32[B, n_blocks, 34] — each block is 17 u64 lanes as (lo, hi)
    interleaved pairs (lane k -> columns 2k, 2k+1), already padded.
    Returns u32[B, 25, 2].
    """
    B, n_blocks, _ = blocks.shape
    lo = [jnp.zeros((B,), U32) for _ in range(25)]
    hi = [jnp.zeros((B,), U32) for _ in range(25)]
    for blk in range(n_blocks):  # block count is small & static
        for k in range(RATE_WORDS):
            lo[k] = lo[k] ^ blocks[:, blk, 2 * k]
            hi[k] = hi[k] ^ blocks[:, blk, 2 * k + 1]
        lo, hi = keccak_f1600(lo, hi, unroll=False)
    return jnp.stack([jnp.stack(lo, axis=1), jnp.stack(hi, axis=1)], axis=2)


def pad_messages(messages: bytes | list[bytes]) -> "np.ndarray":
    """Host helper: pad byte messages (all the same length) into rate blocks.

    Returns u32[B, n_blocks, 34] ready for absorb_blocks.
    """
    import numpy as np

    if isinstance(messages, (bytes, bytearray)):
        messages = [bytes(messages)]
    length = len(messages[0])
    assert all(len(m) == length for m in messages), "uniform length required"
    pad_len = KECCAK_RATE_BYTES - (length % KECCAK_RATE_BYTES)
    if pad_len == 1:
        pad = b"\x81"
    else:
        pad = b"\x01" + b"\x00" * (pad_len - 2) + b"\x80"
    n_blocks = (length + pad_len) // KECCAK_RATE_BYTES
    out = np.zeros((len(messages), n_blocks, 34), dtype=np.uint32)
    for b, m in enumerate(messages):
        padded = m + pad
        for blk in range(n_blocks):
            chunk = padded[blk * KECCAK_RATE_BYTES:(blk + 1) * KECCAK_RATE_BYTES]
            for k in range(RATE_WORDS):
                lane = int.from_bytes(chunk[8 * k:8 * k + 8], "little")
                out[b, blk, 2 * k] = lane & 0xFFFFFFFF
                out[b, blk, 2 * k + 1] = lane >> 32
    return out


def digest_from_state(state) -> list[bytes]:
    """u32[B, 25, 2] -> per-lane 32-byte keccak256 digests (host side)."""
    import numpy as np

    state = np.asarray(state)
    digests = []
    for b in range(state.shape[0]):
        out = b"".join(
            (int(state[b, k, 0]) | (int(state[b, k, 1]) << 32)).to_bytes(8, "little")
            for k in range(4))
        digests.append(out)
    return digests


@jax.jit
def keccak256_batched(blocks: jax.Array) -> jax.Array:
    """Full sponge over pre-padded blocks -> final states u32[B, 25, 2]."""
    return absorb_blocks(blocks)


# ---------------------------------------------------------------------------
# Bit-sliced formulation: 32 sponge states per u32 bit-plane.
#
# Round-4 audit result (tools/probe_keccak.py, PERF.md): the u32-pair Pallas
# kernel is register-file/spill bound at 12-22M perms/s; the bit-sliced form
# turns rho/pi and the theta rot1 into PLANE RENAMINGS (zero ops) and its
# linear ref-streaming dataflow pipelines on the VPU without a register
# working set — measured >100M perms/s (7x) on one v5e chip at G8=256.
# Plane index p = (x + 5y)*64 + z; z<32 -> bit z of the lo u32, z>=32 ->
# bit z-32 of the hi u32 (matching the (lo, hi) pair convention above).
# ---------------------------------------------------------------------------

def _bit_transpose_32(x: jax.Array) -> jax.Array:
    """Transpose 32x32 bit matrices: u32[..., 32] -> u32[..., 32] where
    out[..., i] bit j == in[..., j] bit i.  5-stage butterfly, jnp ops."""
    masks = (jnp.uint32(0x55555555), jnp.uint32(0x33333333),
             jnp.uint32(0x0F0F0F0F), jnp.uint32(0x00FF00FF),
             jnp.uint32(0x0000FFFF))
    for stage in range(5):
        w = 1 << stage
        # pair rows i (bit w clear) with rows i + w (bit w set)
        xs = x.reshape(x.shape[:-1] + (32 // (2 * w), 2, w))
        a, b = xs[..., 0, :], xs[..., 1, :]
        m = masks[stage]
        t = (a >> w ^ b) & m
        a, b = a ^ (t << w), b ^ t
        x = jnp.stack([a, b], axis=-2).reshape(x.shape)
    return x


def states_to_planes(state: jax.Array) -> jax.Array:
    """u32[B, 25, 2] packed states -> bit planes u32[1600, 8, B//256].

    B must be a multiple of 256 (32 states per u32 slot x (8, B/256) dense
    rows).  Inverse of planes_to_states."""
    B = state.shape[0]
    assert B % 256 == 0, B
    w = state.reshape(B // 32, 32, 50)            # [G, s, word]
    w = jnp.transpose(w, (0, 2, 1))               # [G, word, s]
    p = _bit_transpose_32(w)                      # [G, word, bit] -> plane
    # plane index (word, bit) -> 64*(word//2) + 32*(word%2) + bit == flat
    # (word, bit) order already: word-major pairs (lo bits 0..31, hi 32..63)
    p = p.reshape(B // 32, 1600)                  # [G, plane]
    p = jnp.transpose(p, (1, 0))                  # [plane, G]
    return p.reshape(1600, 8, B // 256)


def planes_to_states(planes: jax.Array) -> jax.Array:
    """Inverse of states_to_planes: u32[1600, 8, G8] -> u32[32*8*G8, 25, 2]."""
    G = planes.shape[1] * planes.shape[2]
    p = planes.reshape(1600, G)
    p = jnp.transpose(p, (1, 0)).reshape(G, 50, 32)
    w = _bit_transpose_32(p)                      # [G, word, s]
    w = jnp.transpose(w, (0, 2, 1)).reshape(G * 32, 25, 2)
    return w


def rc_planes_np():
    """Round-constant 0/0xFFFFFFFF bit-plane masks u32[24, 64] (SMEM table
    for the bit-sliced kernels)."""
    import numpy as np

    rc = np.zeros((24, 64), dtype=np.uint32)
    for r in range(24):
        for z in range(64):
            if (KECCAK_RC[r] >> z) & 1:
                rc[r, z] = 0xFFFFFFFF
    return rc


def bitsliced_round_refs(a_ref, b_ref, rc_ref, r, chi_src=None):
    """One keccak-f round on bit-plane refs: reads a_ref (pre-theta state),
    writes b_ref.  Refs are [1600, ...] plane-major; rc_ref is the SMEM
    rc_planes_np table, r the dynamic round index.  Shared by
    keccak_f1600_bitsliced and the rolling-commitment fold kernel
    (models/fused_cycle)."""
    if chi_src is None:
        chi_src = _chi_source_planes()
    c = [[None] * 64 for _ in range(5)]
    for x in range(5):
        for z in range(64):
            v = a_ref[x * 64 + z]
            for y in range(1, 5):
                v = v ^ a_ref[(x + 5 * y) * 64 + z]
            c[x][z] = v
    d = [[c[(x - 1) % 5][z] ^ c[(x + 1) % 5][(z - 1) % 64]
          for z in range(64)] for x in range(5)]

    # theta fused into the chi reads: no in-place theta pass (saves
    # 1600 ld + 1600 st per round for +3200 co-issued xors) — measured
    # 190M vs 110M perms/s same-run A/B (tools/probe_keccak.py)
    def th(p):
        return a_ref[p] ^ d[(p // 64) % 5][p % 64]

    for i, (s1, s2, s3) in enumerate(chi_src):
        b_ref[i] = th(s1) ^ (~th(s2) & th(s3))
    for z in range(64):
        b_ref[z] = b_ref[z] ^ rc_ref[r, z]


def _g8_tile(G8: int) -> int:
    """Largest divisor of G8 that is <= 256 (the measured throughput
    optimum; an untiled large G8 blows the VMEM budget — one [1600, 8, G8]
    buffer is G8/4 MB and the kernels hold 2-3 of them)."""
    if G8 <= 256:
        return G8
    for t in range(256, 0, -1):
        if G8 % t == 0:
            return t
    return G8


def keccak_f1600_bitsliced(planes: jax.Array, iters: int = 1,
                           interpret: bool | None = None) -> jax.Array:
    """Chained permutations on bit-plane state u32[1600, 8, G8].

    State double-buffers between the output ref and one VMEM scratch, two
    rounds per fori body (EMPTY carries — the Mosaic rule), round-constant
    0/0xFFFFFFFF masks in SMEM indexed by the dynamic round number.
    Semantics pinned by tests vs keccak_f1600_array / golden."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    chi_src = _chi_source_planes()
    rc_planes = rc_planes_np()
    G8 = planes.shape[2]

    def _round_refs(a_ref, b_ref, rc_ref, r):
        bitsliced_round_refs(a_ref, b_ref, rc_ref, r, chi_src)

    def kernel(rc_ref, s_ref, o_ref, scratch_ref):
        o_ref[...] = s_ref[...]

        def body(j, _):
            r = 2 * (j % 12)
            _round_refs(o_ref, scratch_ref, rc_ref, r)
            _round_refs(scratch_ref, o_ref, rc_ref, r + 1)
            return 0

        jax.lax.fori_loop(0, 12 * iters, body, 0)

    # tile the group axis: permutations are independent across u32 groups,
    # and one [1600, 8, G8] block costs G8/4 MB of VMEM x3 (in/out/scratch)
    # — an untiled G8=2048 call (a 512k-record fingerprint batch) blew the
    # 128 MB VMEM budget (measured).  G8=256 per block is the measured
    # throughput optimum (212-245M perms/s); non-power-of-two G8 takes the
    # largest divisor <= 256 (an untiled G8=1000 fingerprint batch would
    # need ~154 MB of VMEM and fail to compile — advisor round-4 finding).
    g8_tile = _g8_tile(G8)
    spec = pl.BlockSpec((1600, 8, g8_tile), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel, grid=(G8 // g8_tile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(planes.shape, jnp.uint32),
        scratch_shapes=[pltpu.VMEM((1600, 8, g8_tile), jnp.uint32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 2**20),
    )(jnp.asarray(rc_planes), planes)


def _chi_source_planes() -> list:
    """Static chi source-plane triples for the bit-sliced round.

    For each output plane (x, y, z): the three post-theta planes feeding
    out = B[x,y,z] ^ (~B[x+1,y,z] & B[x+2,y,z]) where B is the post-rho/pi
    state: B[x', y'] = rot(A[x, y], rho) with pi (x', y') = (y, (2x+3y)%5),
    inverted here to source-plane indices."""
    def p(x, y, z):
        return (x % 5 + 5 * (y % 5)) * 64 + (z % 64)

    def pre(xx, yy, zz):
        xx, yy = xx % 5, yy % 5
        y_src = xx
        x_src = (yy - 3 * xx) * 3 % 5  # inverse of y'=(2x+3y): 2^-1=3 mod 5
        r = KECCAK_ROTATIONS[x_src + 5 * y_src]
        return p(x_src, y_src, zz - r)

    out = []
    for y in range(5):
        for x in range(5):
            for z in range(64):
                out.append((pre(x, y, z), pre(x + 1, y, z), pre(x + 2, y, z)))
    return out


def keccak_f1600_pallas(state: jax.Array, iters: int = 1,
                        tile: int = 4096,
                        interpret: bool | None = None) -> jax.Array:
    """Chained keccak-f[1600] permutations as a VMEM-resident Pallas kernel.

    state u32[B, 25, 2] -> the state after `iters` permutations.  The jnp
    form streams every round's 50 u32[B] lanes through HBM (measured ~5M
    perms/s on one v5e chip); here a batch tile's whole state stays in
    VMEM across all iterations, so HBM sees it twice total.

    Layout (round-4 probe, tools/probe_keccak.py): each of the 50 lane-half
    rows rides as a dense 2D (8, tile/8) value — rank-1 [TB] rows cost ~1.7x
    (Mosaic gives 1D vectors a sublane-sparse layout).  tile=4096 measured
    fastest (22.4M perms/s vs 12-15M for the rank-1 form; t1024 13.1M,
    t2048 20.7M, t8192 19.6M).  The kernel is register-file/spill bound,
    not VPU-issue bound — see PERF.md for the audit.  Falls back to the
    rank-1 layout when tile is too small for dense (8, 128k) rows (unit
    tests run tiny tiles in interpret mode).
    """
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = state.shape[0]
    assert B % tile == 0, (B, tile)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    rows2d = tile % 1024 == 0
    if rows2d:
        bl = jnp.transpose(state, (1, 2, 0)).reshape(25, 2, 8, B // 8)
    else:
        bl = jnp.transpose(state, (1, 2, 0))    # [25, 2, B]

    def kernel(s_ref, o_ref):
        st = s_ref[...]
        # the fori carry is ONE array (rank-1 tuple carries crash Mosaic's
        # layout inference): [50, 8, TB/8] dense rows, or [50, TB] in the
        # small-tile fallback
        st50 = jnp.concatenate([st[:, 0], st[:, 1]], axis=0)

        def perm(i, st50):
            lo = [st50[j] for j in range(25)]
            hi = [st50[25 + j] for j in range(25)]
            if not interpret:
                # 24 rounds unrolled with np-scalar round constants (no
                # array captures); Mosaic compiles the unrolled chain
                # fine — only XLA:CPU's simplifier is super-linear on it
                for r in range(24):
                    lo, hi = _round(lo, hi,
                                    U32(KECCAK_RC[r] & 0xFFFFFFFF),
                                    U32(KECCAK_RC[r] >> 32))
            else:
                # interpret mode lowers through XLA:CPU (super-linear on
                # the unrolled chain): fori the rounds, with constants
                # selected by a scalar where-chain (array-valued rc
                # tables would be rejected closure captures)
                def rnd(r, carry):
                    lo, hi = list(carry[0]), list(carry[1])
                    rc_lo = U32(0)
                    rc_hi = U32(0)
                    for k in range(24):
                        rc_lo = jnp.where(r == k,
                                          U32(KECCAK_RC[k] & 0xFFFFFFFF),
                                          rc_lo)
                        rc_hi = jnp.where(r == k,
                                          U32(KECCAK_RC[k] >> 32), rc_hi)
                    lo, hi = _round(lo, hi, rc_lo, rc_hi)
                    return tuple(lo), tuple(hi)

                lo_t, hi_t = jax.lax.fori_loop(
                    0, 24, rnd, (tuple(lo), tuple(hi)))
                lo, hi = list(lo_t), list(hi_t)
            return jnp.stack(lo + hi, axis=0)

        st50 = jax.lax.fori_loop(0, iters, perm, st50)
        o_ref[...] = jnp.stack([st50[:25], st50[25:]], axis=1)

    if rows2d:
        spec = pl.BlockSpec((25, 2, 8, tile // 8), lambda i: (0, 0, 0, i),
                            memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((25, 2, 8, B // 8), jnp.uint32)
    else:
        spec = pl.BlockSpec((25, 2, tile), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((25, 2, B), jnp.uint32)
    out = pl.pallas_call(
        kernel,
        grid=(B // tile,),
        in_specs=[spec],
        out_specs=spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 2**20),
    )(bl)
    if rows2d:
        out = out.reshape(25, 2, B)
    return jnp.transpose(out, (2, 0, 1))
