"""Pallas TPU encode kernel — scalar greedy scan, lane-aligned vectors.

Companion to pallas_decode.py: the scalar unit runs the reference's exact
greedy hash-table scan (/root/reference/src/block/blockCompress.js:31-232 —
same multiplicative hash, pos+1 table encoding, acceleration stride, forward
-only extension, so compressed output is BYTE-IDENTICAL to the host/oracle
encoders), while all bulk data movement is 128-lane vectors:

- the 16K-entry hash table lives in VMEM as a (128,128) tile; get/set are
  aligned row loads with single-lane merge via iota masks;
- 4-byte window words are precomputed outside the kernel (cheap XLA shifts)
  and read with dynamic lane rotations;
- match extension compares 128-byte chunks and finds the first mismatch
  lane with a masked min-reduction (128 bytes per ~10 vector ops);
- literal runs copy as wild 128-byte chunks; token/length/offset bytes are
  single-lane read-modify-writes.

VMEM budget (8 blocks/grid-step, 64KB blocks): words 2MB + out 2.2MB +
table 64KB, double-buffered ≈ 8.5MB.

Independent blocks only in this revision (hist_len=0); linked blocks use
encode_linked_scan (XLA) or the host tier.

Round-2 restructuring past the round-1 Mosaic hang (the old kernel nested
emit while_loops inside lax.cond branches inside the sequence while_loop,
with VMEM RMW at the innermost level): the hit/miss branch is now
STRAIGHT-LINE predicated code — every iteration computes the would-be
sequence layout arithmetically, emission writes run under a single
``pl.when(good)`` (fori-loop chunk writes only, the shape pallas_decode
compiles), the 0xFF-run length extensions are masked 128-lane vector writes
instead of a byte-at-a-time while_loop, and the loop state advances by
``jnp.where`` selects. The only remaining lax.cond wraps the read-only
match-extension search (skipped on the miss path, which dominates).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import (
    HASH_MASK,
    HASH_MULTIPLIER,
    HASH_SHIFT,
    LAST_LITERALS,
    MF_LIMIT,
    MIN_MATCH,
    SKIP_TRIGGER,
    WINDOW_SIZE,
    block_bound,
)

LANES = 128
SLACK = 256


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_kernel(rows: int, src_nr: int, out_nr: int, smem_words: bool):
    def kernel(lens_ref, *refs):
        refs = list(refs)
        words_ref = refs.pop(0)
        words_s_ref = refs.pop(0) if smem_words else None
        out_ref = refs.pop(0)
        table_ref = refs.pop(0)
        g = pl.program_id(0)
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

        def rrow(ref, base_row, q):
            return ref[pl.ds(base_row + q // LANES, 1), :]

        def read128(ref, base_row, q):
            s = q % LANES
            r0 = pltpu.roll(rrow(ref, base_row, q), -s, axis=1)
            r1 = pltpu.roll(rrow(ref, base_row, q + LANES), -s, axis=1)
            return jnp.where(iota < LANES - s, r0, r1)

        def write128(ref, base_row, q, v):
            s = q % LANES
            rolled = pltpu.roll(v, s, axis=1)
            row = base_row + q // LANES
            d0 = ref[pl.ds(row, 1), :]
            d1 = ref[pl.ds(row + 1, 1), :]
            ref[pl.ds(row, 1), :] = jnp.where(iota >= s, rolled, d0)
            ref[pl.ds(row + 1, 1), :] = jnp.where(iota < s, rolled, d1)

        def readlane(ref, base_row, q):
            s = q % LANES
            return pltpu.roll(rrow(ref, base_row, q), -s, axis=1)[0, 0]

        def writebyte(ref, base_row, q, val):
            s = q % LANES
            row = base_row + q // LANES
            d = ref[pl.ds(row, 1), :]
            ref[pl.ds(row, 1), :] = jnp.where(iota == s, val, d)

        # Hash table lives in SMEM: get/set are single scalar loads/stores
        # (the round-1 VMEM tile paid a lane extract + masked row RMW per
        # probe — the dominant per-position cost).
        def table_get(h):
            return table_ref[h]

        def table_set(h, val):
            table_ref[h] = val

        if smem_words:
            # Probe-path word read = scalar SMEM load instead of a
            # vreg->sreg lane extract.
            def streamword(base_row, q):
                return words_s_ref[base_row + q // LANES, q % LANES]
        else:
            def streamword(base_row, q):
                return readlane(words_ref, base_row, q)

        def encode_row(r):
            src_base = r * src_nr
            out_base = r * out_nr
            src_len = lens_ref[g * rows + r]
            mf_limit = src_len - MF_LIMIT
            match_limit = src_len - LAST_LITERALS

            # clear the hash table (scalar SMEM stores)
            def clr(t, _):
                table_ref[t] = 0
                return 0
            jax.lax.fori_loop(0, HASH_MASK + 1, clr, 0)

            def ext_count(val):
                """Encoded size of the 0xFF-run length extension for val."""
                return jnp.where(val >= 15,
                                 1 + jnp.maximum(val - 15, 0) // 255, 0)

            def emit_ext(d, val):
                """Masked-vector write of the 0xFF-run extension at d (no-op
                when val < 15). Wild-writes past the run; every byte beyond
                it is rewritten by the following literals/sequences."""
                rem = jnp.maximum(val - 15, 0)
                k = rem // 255          # number of 0xFF bytes
                last = rem % 255        # remainder byte at index k
                nb = ext_count(val)

                def chunk(i, _):
                    jj = i * LANES + iota
                    v = jnp.where(jj < k, jnp.int32(255),
                                  jnp.full((1, LANES), last, jnp.int32))
                    write128(out_ref, out_base, d + i * LANES, v)
                    return 0
                jax.lax.fori_loop(0, (nb + LANES - 1) // LANES, chunk, 0)

            def copy_literals(dst, src, n):
                def body(k, _):
                    write128(out_ref, out_base, dst + k * LANES,
                             read128(words_ref, src_base, src + k * LANES)
                             & 0xFF)
                    return 0
                jax.lax.fori_loop(0, (n + LANES - 1) // LANES, body, 0)

            def extend_match(s, cand):
                """Forward match length from s/cand (starting at +4),
                capped at match_limit; 128-byte vector compares.
                Read-only — safe under lax.cond."""
                def cond(st):
                    k, done = st
                    return jnp.logical_not(done)

                def body(st):
                    k, _ = st
                    a = read128(words_ref, src_base, s + MIN_MATCH + k) & 0xFF
                    b = read128(words_ref, src_base, cand + MIN_MATCH + k) \
                        & 0xFF
                    pos = s + MIN_MATCH + k + iota
                    neq = (a != b) | (pos >= match_limit)
                    mm = jnp.min(jnp.where(neq, iota, LANES))
                    return k + mm, mm < LANES

                k, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), False))
                return MIN_MATCH + k  # total match length

            def seq_step(st):
                s, anchor, d, search = st

                seq = streamword(src_base, s)
                h = ((seq.astype(jnp.uint32) * jnp.uint32(HASH_MULTIPLIER))
                     >> HASH_SHIFT).astype(jnp.int32) & HASH_MASK
                cand = table_get(h) - 1
                table_set(h, s + 1)

                good = ((cand >= 0) & (s != cand)
                        & (s - cand < WINDOW_SIZE)
                        & (streamword(src_base, jnp.maximum(cand, 0))
                           == seq))

                # Match length: guarded read-only search (misses dominate).
                mlen = jax.lax.cond(
                    good,
                    lambda args: extend_match(*args),
                    lambda args: jnp.int32(MIN_MATCH),
                    (s, jnp.maximum(cand, 0)))

                # Sequence layout, computed arithmetically every iteration.
                lit_len = s - anchor
                mcode = mlen - MIN_MATCH
                offset = s - cand
                d_tok = d
                d_litx = d + 1
                d_lits = d_litx + ext_count(lit_len)
                d_off = d_lits + lit_len
                d_mx = d_off + 2
                d_next = d_mx + ext_count(mcode)

                @pl.when(good)
                def _():
                    emit_ext(d_litx, lit_len)
                    copy_literals(d_lits, anchor, lit_len)
                    writebyte(out_ref, out_base, d_tok,
                              (jnp.minimum(lit_len, 15) << 4)
                              | jnp.minimum(mcode, 15))
                    writebyte(out_ref, out_base, d_off, offset & 0xFF)
                    writebyte(out_ref, out_base, d_off + 1,
                              (offset >> 8) & 0xFF)
                    emit_ext(d_mx, mcode)

                adv = s + mlen
                return (jnp.where(good, adv, s + (search >> SKIP_TRIGGER)),
                        jnp.where(good, adv, anchor),
                        jnp.where(good, d_next, d),
                        jnp.where(good, jnp.int32((1 << SKIP_TRIGGER) + 3),
                                  search + 1))

            s, anchor, d, _ = jax.lax.while_loop(
                lambda st: st[0] < mf_limit, seq_step,
                (jnp.int32(0), jnp.int32(0), jnp.int32(0),
                 jnp.int32((1 << SKIP_TRIGGER) + 3)))

            # trailing literal run
            lit_len = src_len - anchor
            token_pos = d
            d_lits = d + 1 + ext_count(lit_len)
            emit_ext(d + 1, lit_len)
            copy_literals(d_lits, anchor, lit_len)
            writebyte(out_ref, out_base, token_pos,
                      jnp.minimum(lit_len, 15) << 4)
            d = d_lits + lit_len
            d = jnp.where(src_len > 0, d, 0)

            out_ref[pl.ds(out_base + out_nr - 1, 1), :] = jnp.full(
                (1, LANES), d, jnp.int32)

        def row_loop(r, _):
            encode_row(r)
            return 0

        jax.lax.fori_loop(0, rows, row_loop, 0)

    return kernel


# Per-grid-step SMEM budget for the scalar copy of the window words
# (conservative; v5e SMEM is ~1 MB/core; the 64 KB hash table also lives
# there).
SMEM_WORDS_BUDGET = 512 * 1024


@functools.partial(jax.jit, static_argnames=("block_size", "interpret"))
def encode_blocks_pallas(work: jax.Array, lens: jax.Array, block_size: int,
                         interpret: bool = False):
    """Encode a batch of independent LZ4 blocks (reference-identical output).

    Args:
      work: i32[nb, block_size] plaintext bytes (zero-padded rows).
      lens: i32[nb] payload sizes.
      block_size: static row width; % 1024 == 0.

    Returns (out: i32[nb, out_width], out_len: i32[nb]).
    """
    nb, B = work.shape
    assert B == block_size and B % 1024 == 0
    work = work.astype(jnp.int32)  # uint8 OK: widening runs on device

    # Rows per grid step: as many as keep the scalar-path words copy within
    # the SMEM budget (the probe loop then runs on scalar loads); blocks too
    # large even at rows=1 fall back to the vreg-extract path.
    src_bytes = _round_up(B + SLACK, 1024) * 4
    rows = 8
    while rows > 1 and rows * src_bytes > SMEM_WORDS_BUDGET:
        rows //= 2
    smem_words = rows * src_bytes <= SMEM_WORDS_BUDGET
    if not smem_words:
        rows = 8

    if nb % rows:
        pad = rows - nb % rows
        work = jnp.concatenate([work, jnp.zeros((pad, B), jnp.int32)])
        lens = jnp.concatenate([lens, jnp.zeros(pad, jnp.int32)])
    nbp = work.shape[0]

    # Precompute 4-byte LE window words with cheap XLA shifts; the kernel
    # recovers bytes as word & 0xFF.
    w = (work
         + (jnp.pad(work[:, 1:], ((0, 0), (0, 1))) << 8)
         + (jnp.pad(work[:, 2:], ((0, 0), (0, 2))) << 16)
         + (jnp.pad(work[:, 3:], ((0, 0), (0, 3))) << 24))
    # Pad so wild reads stay in bounds (>= SLACK) AND the per-step block's
    # sublane count rows*src_nr stays divisible by 8 (Mosaic block rule)
    # for every rows choice: width multiple of 1024 gives src_nr % 8 == 0.
    w = jnp.pad(w, ((0, 0), (0, _round_up(B + SLACK, 1024) - B)))

    src_nr = w.shape[1] // LANES
    out_bytes = _round_up(block_bound(B) + SLACK + LANES, 1024)
    out_nr = out_bytes // LANES

    w_flat = w.reshape(nbp * src_nr, LANES)
    in_specs = [pl.BlockSpec((rows * src_nr, LANES),
                             lambda g, lens: (g, 0),
                             memory_space=pltpu.VMEM)]
    operands = [w_flat]
    if smem_words:
        in_specs.append(pl.BlockSpec((rows * src_nr, LANES),
                                     lambda g, lens: (g, 0),
                                     memory_space=pltpu.SMEM))
        operands.append(w_flat)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbp // rows,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((rows * out_nr, LANES),
                                lambda g, lens: (g, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.SMEM((HASH_MASK + 1,), jnp.int32)],
    )

    out, = pl.pallas_call(
        _make_kernel(rows, src_nr, out_nr, smem_words),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nbp * out_nr, LANES), jnp.int32)],
        interpret=interpret,
    )(lens, *operands)

    out = out.reshape(nbp, out_nr * LANES)
    out_len = out[:nb, (out_nr - 1) * LANES]
    return out[:nb], out_len


def encode_block_pallas_host(data: np.ndarray, block_size: int | None = None,
                             interpret: bool | None = None) -> np.ndarray:
    """Host convenience wrapper for tests: bytes in → LZ4 block bytes out."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = len(data)
    B = _round_up(max(n, 1024), 1024) if block_size is None else block_size
    work = np.zeros((1, B), np.int32)
    work[0, :n] = data
    out, out_len = encode_blocks_pallas(
        jnp.asarray(work), jnp.asarray(np.array([n], np.int32)), B, interpret)
    return np.asarray(out[0][: int(out_len[0])]).astype(np.uint8)
