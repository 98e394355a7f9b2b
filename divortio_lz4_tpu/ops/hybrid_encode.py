"""Hybrid device LZ4 encode — XLA candidate search + Pallas sequence emitter.

The two pure strategies both leave throughput on the table (measured,
docs/DESIGN.md):

- the all-XLA kernel (encode_xla.py) is fully data-parallel but pays
  ~50-110 general gather/scatter passes at TPU's scalar gather rate
  (~1.2 MB/s/chip at 64 KB blocks);
- the all-Pallas kernel (pallas_encode.py) reproduces the reference's greedy
  hash-table scan byte-for-byte but iterates the Mosaic scalar core once per
  input POSITION (the probe loop), which bounds it regardless of how cheap
  each probe is.

This module splits the work by what each engine is good at:

1. **XLA chain phase** (`build_chains`): exhaustive candidate search by
   lexicographic sort — for every position, the nearest previous position
   with an identical 4-byte window (same derivation as encode_xla.py step 2,
   /root/reference/src/block/blockCompress.js:53-63's hash table made exact).
   A reverse cummin over `(payload_pos << 16 | dist)` then packs, for every
   position, the NEXT matchable position at-or-after it and that position's
   match distance into one i32 — so the greedy walk below needs exactly one
   scalar load per emitted sequence and the phase needs no per-position
   gather at all (one sort + one scatter + one scan).

2. **Pallas walk phase** (`encode_blocks_hybrid` kernel): the scalar core
   hops anchor -> chain[anchor] -> anchor + match_len, once per SEQUENCE
   (pallas_decode.py's amortization, ~15-60 bytes per iteration, not per
   input byte), extending each match with 128-lane vector compares and
   emitting literals/token/offset as lane-aligned vector writes — the exact
   emission machinery pallas_encode.py compiles today.

Output is decode-compatible LZ4 at a ratio <= the reference encoder's on
every corpus measured (bench.py asserts it per run). The chain commits to
the NEAREST previous occurrence; in principle the reference's stale 16K
table can hold an older, longer match at a position the chain resolves
short, so the bound is empirical, not structural. It is not byte-identical
to either the reference or the XLA kernel (encode_xla's match-inheritance
pass can pick longer matches at compacted positions). All decoder tiers and
the golden-vector suite verify the streams.

Greedy semantics match blockCompress.js: matches start below
src_len - MF_LIMIT, end below src_len - LAST_LITERALS, minimum length 4,
offsets < 64 KB; history rows ([dict window | payload], hist_len static)
give dictionary and linked-mode frames for free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import (
    LAST_LITERALS,
    MF_LIMIT,
    MIN_MATCH,
    WINDOW_SIZE,
    block_bound,
)
from .pallas_decode import _vmem_helpers

LANES = 128
SLACK = 256


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# --------------------------------------------------------------------------
# Phase 1: XLA chain builder
# --------------------------------------------------------------------------

def _chain_row(work: jax.Array, src_len: jax.Array, hist_len: int,
               hist_start: jax.Array) -> jax.Array:
    """Packed greedy chain for one block row.

    Args:
      work: i32[N] bytes, N = hist_len + cap (payload zero-padded).
      src_len: dynamic payload length.
      hist_len: static history prefix (0 or WINDOW_SIZE).
      hist_start: first valid history index (window may be left-padded).

    Returns i32[cap]; entry at payload position a is
    ``(m << 16) | dist`` where m is the first payload position >= a that has
    a match (u16, payload-relative) and dist its offset — or m = 0xFFFF when
    no matchable position remains (0xFFFF >= any mf_limit, so the walk's
    ``m < mf_limit`` test terminates on it naturally).

    ONE 3-operand sort (round 4; the round-3 builder ran a 3-operand sort
    for the nearest chain plus a 6-operand scored sort for the
    interior-excluded chain — 51 ms of a 66 ms 4 MB encode). Everything
    rides two uint32 keys plus one packed payload:

      key 1  w     — the 4-byte window word (candidates = same-word preds);
      key 2  idx2  — ``bad<<31 | interior<<30 | idx<<13 | fp16_13``:
                     within a word, non-interior sources sort first (by
                     position), then run interiors, then invalid positions
                     — so a non-interior receiver's sort predecessors are
                     exactly the old chain B's candidate set, an interior
                     receiver's predecessor-1 is the nearest interior (the
                     old chain A's in-run answer), and invalid positions
                     can never sit between real candidates. The low 13
                     bits carry the 16-byte-prefix fingerprint tier for
                     free (idx above them keeps the order exact);
      payload sAB  — 64-byte tier (high 16) | 256-byte tier (low 16).

    Truncated fingerprints only ever INFLATE a score on collision
    (2^-13 / 2^-16 per compare); the walk computes the true extension, so
    ratio noise is the only exposure — fenced by the adversarial ratio
    gate (tests/test_hybrid_encode.py) and the bench's <=-reference assert.
    """
    valid, dist = _cand_row(work, src_len, hist_len, hist_start)
    cap = work.shape[0] - hist_len

    # Payload-relative packing + reverse cummin: the minimum of
    # (pos << 16 | dist) over positions >= a is held by the nearest valid
    # position (pos dominates the high bits), carrying its dist along.
    ip = jnp.arange(cap, dtype=jnp.uint32)
    packed = jnp.where(valid[hist_len:],
                       (ip << 16) | dist[hist_len:].astype(jnp.uint32),
                       jnp.uint32(0xFFFFFFFF))
    chain = jax.lax.cummin(packed, axis=0, reverse=True)
    return chain.astype(jnp.int32)


def _cand_row(work: jax.Array, src_len: jax.Array, hist_len: int,
              hist_start: jax.Array, hashed: bool = False):
    """Shared candidate search (the sort phase): for every position, the
    scored best previous same-word occurrence. Returns (valid bool[N],
    dist i32[N]) over [history | payload] positions — the packers above
    slice the payload range.

    Two key layouts (round 4):

    - ``hashed=False`` (the hybrid walk's): 3 sorted operands
      ``(word, bad|interior|idx|fp13, scoreAB)`` with num_keys=2 — EXACT
      word buckets, so a selected candidate's first MIN_MATCH bytes are
      equal by construction (the Pallas walk extends from MIN_MATCH
      without verifying).

    - ``hashed=True`` (the chain-direct production path's sort diet): the
      word is HASHED into the single sort key
      ``hash << (ibits+2) | bad | interior | idx`` and the scoring tiers
      pack into ONE u32 payload — 2 sorted operands, num_keys=1, ~8
      sorted bytes/position instead of 12. This is the TPU-native form of
      the reference's 16K hash table WITH its collision exposure
      (blockCompress.js:13-17,64-66): a different word can share a bucket,
      so candidates are claims, not guarantees — the host serializer
      verifies 4 bytes and skips false candidates
      (lz4t_chain_serialize16). An extra 8-bit word-check in the payload
      keeps the false-claim rate ~2^-22 per pred, so incompressible data
      doesn't flood the host scan. Bucket counts: 64 KB independent
      blocks get 2^14 buckets (the reference's own geometry), history
      rows 2^13.
    """
    N = work.shape[0]
    assert N <= (1 << 17), "idx2 packs positions in 17 bits"
    idx = jnp.arange(N, dtype=jnp.int32)
    s_end = hist_len + src_len
    mf_limit = s_end - MF_LIMIT

    b = work
    w = (b + (jnp.concatenate([b[1:], jnp.zeros(1, b.dtype)]) << 8)
         + (jnp.concatenate([b[2:], jnp.zeros(2, b.dtype)]) << 16)
         + (jnp.concatenate([b[3:], jnp.zeros(3, b.dtype)]) << 24)
         ).astype(jnp.uint32)
    invalid = (idx + MIN_MATCH > s_end) | (idx < hist_start)

    # Prefix-fingerprint scoring: h_d[p] hashes the WHOLE range [p, p+d)
    # (polynomial rolling hash, the encode_xla.py LCE machinery), so a
    # candidate's sampled LCE is the longest d with equal fingerprints —
    # contiguous coverage, no blind spots (word samples at sparse offsets
    # missed single-byte mutations between samples; measured on the
    # period-53 trap corpus). Carried through the sort, never gathered.
    # Equality with the zero padding past s_end only affects scores of
    # tail positions the walk clamps anyway.
    from .encode_xla import _B1, _B1_INV, _pows
    inv1 = _pows(_B1_INV, N + 1)
    pw1 = _pows(_B1, N + 1)
    c1 = jnp.concatenate([jnp.zeros(1, jnp.uint32),
                          jnp.cumsum(b.astype(jnp.uint32) * inv1[:N],
                                     dtype=jnp.uint32)])

    def _range_hash(d):
        hi = jnp.concatenate([c1[d:], jnp.zeros(max(d - 1, 0), jnp.uint32)])
        return (hi[:N] - c1[:N]) * pw1[:N]

    # Each tier hash-combines two prefix ranges (d/2 and d) — coarse tiers
    # (16/64/256) still discriminate the period-53 mutation trap: the
    # winning source's first divergence sits a full tier further out.
    def _tier(d):
        return _range_hash(d // 2) * jnp.uint32(0x9E3779B1) + _range_hash(d)

    t16, t64, t256 = _tier(16), _tier(64), _tier(256)

    # Run-interior positions (word repeats within 4 bytes) are POISON
    # sources for anything but in-run anchors: their extensions die at the
    # run boundary, while the run START's extension propagates through the
    # whole periodic region — measured 55x worse ratio on period-53 data
    # with nearest-any candidates (docs/DESIGN.md). The idx2 interior bit
    # hides them from non-interior receivers while keeping them nearest-
    # ordered for in-run anchors (any in-run distance extends to the run
    # end, so nearest wins there).
    interior = jnp.zeros(N, bool)
    for p in (1, 2, 3, 4):
        interior = interior.at[p:].set(interior[p:] | (w[p:] == w[:-p]))

    def shifted(a, k, fill=0):
        return jnp.concatenate(
            [jnp.full(k, fill, a.dtype), a[:-k]])

    # Which sort-predecessors to score: the nearest previous occurrence is
    # NOT always the best source — on mutated-periodic data the reference's
    # stale 16K table lands on mutation-phase-aligned sources whose matches
    # extend THROUGH the mutations (measured 1.34x worse than the reference
    # with nearest-only on period-53 + mutation-every-200 corpora — the
    # adversarial ratio gate in tests/test_hybrid_encode.py pins this).
    PREDS = (1, 2, 3, 4, 6, 8)
    best_key = jnp.full(N, -1, jnp.int32)
    best_cand = jnp.full(N, -1, jnp.int32)

    if hashed:
        ibits = (N - 1).bit_length()
        hbits = 30 - ibits
        mask = jnp.uint32((1 << ibits) - 1)
        wc8 = (w * jnp.uint32(0x85EBCA77)) >> 24           # word check
        fp16 = (t16 * jnp.uint32(0x9E3779B1)) >> 23        # 9-bit tier 16
        fp64 = (t64 * jnp.uint32(0x85EBCA77)) >> 24        # 8-bit tier 64
        fp256 = (t256 * jnp.uint32(0xC2B2AE3D)) >> 25      # 7-bit tier 256
        pay = (wc8 << 24) | (fp16 << 15) | (fp64 << 7) | fp256
        h = (w * jnp.uint32(0x9E3779B1)) >> (32 - hbits)
        key = ((h << (ibits + 2))
               | jnp.where(invalid,
                           jnp.uint32(1) << (ibits + 1), jnp.uint32(0))
               | jnp.where(interior, jnp.uint32(1) << ibits, jnp.uint32(0))
               | idx.astype(jnp.uint32))

        skey, spay = jax.lax.sort((key, pay), num_keys=1)
        si = (skey & mask).astype(jnp.int32)
        for k in PREDS:
            pkey = shifted(skey, k, fill=0xFFFFFFFF)
            ppay = shifted(spay, k)
            pi = (pkey & mask).astype(jnp.int32)
            pgood = ((pkey >> (ibits + 1)) & 1) == 0
            bucket = (pkey >> (ibits + 2)) == (skey >> (ibits + 2))
            wc_eq = (ppay >> 24) == (spay >> 24)
            dist = si - pi
            ok = pgood & bucket & wc_eq & (dist > 0) & (dist < WINDOW_SIZE)
            # approximate LCE: longest run of equal fingerprint tiers
            m16 = ok & (((ppay >> 15) & 0x1FF) == ((spay >> 15) & 0x1FF))
            m64 = m16 & (((ppay >> 7) & 0xFF) == ((spay >> 7) & 0xFF))
            m256 = m64 & ((ppay & 0x7F) == (spay & 0x7F))
            sc = (4 + jnp.where(m16, 16, 0) + jnp.where(m64, 64, 0)
                  + jnp.where(m256, 256, 0))
            keysc = jnp.where(ok, sc * 16 + (15 - k), -1)
            better = keysc > best_key
            best_key = jnp.where(better, keysc, best_key)
            best_cand = jnp.where(better, pi, best_cand)
    else:
        fp13 = (t16 * jnp.uint32(0x85EBCA77)) >> 19         # 13-bit tier 16
        sAB = (t64 & jnp.uint32(0xFFFF0000)) | (t256 >> 16)  # 16+16 payload
        idx2 = (jnp.where(invalid, jnp.uint32(1) << 31, jnp.uint32(0))
                | jnp.where(interior, jnp.uint32(1) << 30, jnp.uint32(0))
                | (idx.astype(jnp.uint32) << 13) | fp13)

        sw, si2, ssAB = jax.lax.sort((w, idx2, sAB), num_keys=2)
        si = ((si2 >> 13) & jnp.uint32(0x1FFFF)).astype(jnp.int32)
        for k in PREDS:
            # Shift fill has the bad bit set: slots before the first k
            # entries can never take a padding candidate.
            pi2 = shifted(si2, k, fill=0xFFFFFFFF)
            pw = shifted(sw, k)
            pi = ((pi2 >> 13) & jnp.uint32(0x1FFFF)).astype(jnp.int32)
            pgood = pi2 < (jnp.uint32(1) << 31)
            dist = si - pi
            ok = pgood & (pw == sw) & (dist > 0) & (dist < WINDOW_SIZE)
            # approximate LCE: longest run of equal fingerprint tiers
            m16 = (pi2 & jnp.uint32(0x1FFF)) == (si2 & jnp.uint32(0x1FFF))
            psAB = shifted(ssAB, k)
            m64 = m16 & ((psAB >> 16) == (ssAB >> 16))
            m256 = m64 & ((psAB & jnp.uint32(0xFFFF))
                          == (ssAB & jnp.uint32(0xFFFF)))
            sc = (4 + jnp.where(m16, 16, 0) + jnp.where(m64, 64, 0)
                  + jnp.where(m256, 256, 0))
            key = jnp.where(ok, sc * 16 + (15 - k), -1)
            better = key > best_key
            best_key = jnp.where(better, key, best_key)
            best_cand = jnp.where(better, pi, best_cand)
    # Unsort via a second sort, NOT a scatter: si is a permutation of
    # 0..N-1, so sorting on si restores position order. Measured (v5e,
    # 64x64K): .at[si].set costs 31.6 ms/batch — the WHOLE rest of the
    # chain phase combined — while the inverse-perm sort is 12.2 ms
    # (general scatter runs at scalar rate; sort is the fast permutation
    # primitive on this chip).
    recv_ok = (idx >= hist_len) & (idx < mf_limit)
    if N <= (1 << 16):
        # si and dist both fit 16 bits (the preds loop enforces
        # 0 < dist < WINDOW_SIZE): pack them into ONE sorted operand
        # (1-op and 2-op sorts measure 10.5 vs 12.2 ms standalone).
        dist_s = jnp.where(best_cand >= 0, (si - best_cand), 0)
        packed = (si.astype(jnp.uint32) << 16) | dist_s.astype(jnp.uint32)
        dist = (jax.lax.sort(packed) & jnp.uint32(0xFFFF)) \
            .astype(jnp.int32)
        return (dist > 0) & recv_ok, dist
    cand = jax.lax.sort((si.astype(jnp.uint32), best_cand), num_keys=1)[1]
    valid = (cand >= 0) & (idx - cand < WINDOW_SIZE) & recv_ok
    return valid, idx - cand


def _dist_row(work: jax.Array, src_len: jax.Array, hist_len: int,
              hist_start: jax.Array, hashed: bool = False) -> jax.Array:
    """u16 per-position match distance for one block row (0 = no match).

    Same candidate search as ``_chain_row`` but WITHOUT the next-match
    packing: the host serializer (lz4t_chain_serialize16) finds the next
    matchable position by scanning for the next nonzero distance — an
    SIMD-friendly memchr-class pass — so the device skips the reverse
    cummin AND the fetch ships 2 bytes/position instead of 4. With
    ``hashed`` the sort runs the dieted single-key layout and entries are
    CLAIMS the serializer verifies (see ``_cand_row``)."""
    valid, dist = _cand_row(work, src_len, hist_len, hist_start, hashed)
    return jnp.where(valid[hist_len:], dist[hist_len:], 0).astype(jnp.uint16)


@functools.partial(jax.jit, static_argnames=("hist_len",))
def build_chains(work: jax.Array, lens: jax.Array, hist_len: int,
                 hist_start: jax.Array) -> jax.Array:
    """Vmapped chain builder: i32[nb, N] work -> i32[nb, cap] chains."""
    hs = jnp.broadcast_to(jnp.asarray(hist_start, jnp.int32),
                          (work.shape[0],))
    return jax.vmap(_chain_row, in_axes=(0, 0, None, 0))(
        work, lens, hist_len, hs)


@functools.partial(jax.jit, static_argnames=("hist_len", "hashed"))
def build_dist_chains(work: jax.Array, lens: jax.Array, hist_len: int,
                      hist_start: jax.Array,
                      hashed: bool = True) -> jax.Array:
    """Vmapped u16 dist-only chains: i32[nb, N] work -> u16[nb, cap].

    The chain-direct (split) encode's wire format: half the device->host
    bytes of ``build_chains``' packed i32 and no reverse-cummin pass; the
    host serializer scans for the next nonzero distance instead of jumping
    (lz4t_chain_serialize16). Default ``hashed=True`` runs the round-4
    sort diet (2 sorted operands, hashed buckets — see ``_cand_row``);
    entries are claims the serializer's 4-byte verify filters.
    ``hashed=False`` gives exact-word chains whose wire bytes are
    identical to the packed form's / the hybrid walk's."""
    hs = jnp.broadcast_to(jnp.asarray(hist_start, jnp.int32),
                          (work.shape[0],))
    return jax.vmap(
        functools.partial(_dist_row, hashed=hashed),
        in_axes=(0, 0, None, 0))(work, lens, hist_len, hs)


# --------------------------------------------------------------------------
# Phase 2: Pallas sequence walk + emission
# --------------------------------------------------------------------------

def _make_kernel(rows: int, src_nr: int, out_nr: int, chain_nr: int,
                 hist_len: int):
    """Kernel refs:
      lens_ref:  SMEM i32[nb] (scalar prefetch)
      words_ref: VMEM (rows*src_nr, 128) — LE32 window words incl. history
      chain_ref: SMEM (rows*chain_nr, 128) — packed (m<<16|dist) per
                 payload position
      out_ref:   VMEM (rows*out_nr, 128)
    """

    def kernel(lens_ref, words_ref, chain_ref, out_ref):
        g = pl.program_id(0)
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        # Byte-addressed VMEM primitives shared with the decode kernels.
        read128, write128, _, _ = _vmem_helpers(iota, words_ref, None)

        def writebyte(ref, base_row, q, val):
            s = q % LANES
            row = base_row + q // LANES
            d = ref[pl.ds(row, 1), :]
            ref[pl.ds(row, 1), :] = jnp.where(iota == s, val, d)

        def encode_row(r):
            src_base = r * src_nr
            out_base = r * out_nr
            chain_base = r * chain_nr
            src_len = lens_ref[g * rows + r]
            mf_limit = src_len - MF_LIMIT          # payload-relative
            match_limit = src_len - LAST_LITERALS

            def getchain(a):
                v = chain_ref[chain_base + a // LANES, a % LANES]
                return (v >> 16) & 0xFFFF, v & 0xFFFF

            def ext_count(val):
                return jnp.where(val >= 15,
                                 1 + jnp.maximum(val - 15, 0) // 255, 0)

            def emit_ext(d, val):
                """0xFF-run length extension at d (no-op when val < 15);
                wild tails are rewritten by the following fields."""
                rem = jnp.maximum(val - 15, 0)
                k = rem // 255
                last = rem % 255
                nb = ext_count(val)

                def chunk(i, _):
                    jj = i * LANES + iota
                    v = jnp.where(jj < k, jnp.int32(255),
                                  jnp.full((1, LANES), last, jnp.int32))
                    write128(out_ref, out_base, d + i * LANES, v)
                    return 0
                jax.lax.fori_loop(0, (nb + LANES - 1) // LANES, chunk, 0)

            def copy_literals(dst, src, n):
                """src is payload-relative; history sits below it."""
                def body(k, _):
                    write128(out_ref, out_base, dst + k * LANES,
                             read128(words_ref, src_base,
                                     hist_len + src + k * LANES) & 0xFF)
                    return 0
                jax.lax.fori_loop(0, (n + LANES - 1) // LANES, body, 0)

            def extend(m, dist):
                """Match length at payload position m, offset dist. The
                first MIN_MATCH bytes are equal by construction (identical
                sort words); extension compares 128-byte chunks."""
                def cond(st):
                    k, done = st
                    return jnp.logical_not(done)

                def body(st):
                    k, _ = st
                    q = hist_len + m + MIN_MATCH + k
                    a = read128(words_ref, src_base, q) & 0xFF
                    b = read128(words_ref, src_base, q - dist) & 0xFF
                    pos = m + MIN_MATCH + k + iota
                    neq = (a != b) | (pos >= match_limit)
                    mm = jnp.min(jnp.where(neq, iota, LANES))
                    return k + mm, mm < LANES

                k, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), False))
                return MIN_MATCH + k

            def seq_step(st):
                anchor, d, m, dist, _, _ = st
                mlen = extend(m, dist)

                lit_len = m - anchor
                mcode = mlen - MIN_MATCH
                d_tok = d
                d_litx = d + 1
                d_lits = d_litx + ext_count(lit_len)
                d_off = d_lits + lit_len
                d_mx = d_off + 2
                d_next = d_mx + ext_count(mcode)

                emit_ext(d_litx, lit_len)
                copy_literals(d_lits, anchor, lit_len)
                writebyte(out_ref, out_base, d_tok,
                          (jnp.minimum(lit_len, 15) << 4)
                          | jnp.minimum(mcode, 15))
                # Offset as one wild vector write (lane 0 = lo, rest = hi;
                # lanes past +2 are rewritten by the following fields).
                write128(out_ref, out_base, d_off,
                         jnp.where(iota == 0, dist & 0xFF,
                                   jnp.full((1, LANES), (dist >> 8) & 0xFF,
                                            jnp.int32)))
                emit_ext(d_mx, mcode)

                nanchor = m + mlen
                nm, ndist = getchain(nanchor)
                # carry this sequence's stream start + literal anchor for
                # the big-block boundary splicer (meta lanes 3-4)
                return nanchor, d_next, nm, ndist, d, anchor

            m0, dist0 = getchain(0)
            anchor, d, _, _, last_d, last_anchor = jax.lax.while_loop(
                lambda st: st[2] < mf_limit, seq_step,
                (jnp.int32(0), jnp.int32(0), m0, dist0,
                 jnp.int32(-1), jnp.int32(-1)))

            # trailing literal run
            lit_len = src_len - anchor
            token_pos = d
            d_lits = d + 1 + ext_count(lit_len)
            emit_ext(d + 1, lit_len)
            copy_literals(d_lits, anchor, lit_len)
            writebyte(out_ref, out_base, token_pos,
                      jnp.minimum(lit_len, 15) << 4)
            d = jnp.where(src_len > 0, d_lits + lit_len, 0)

            # Meta row: lane 0 = stream length, lane 1 = trailing-token
            # position, lane 2 = trailing literal count, lane 3 = stream
            # offset of the last MATCH sequence (-1 if none), lane 4 = its
            # output anchor (payload-relative). The segmented big-block
            # splicer consumes lanes 1-4 (parallel/bigblock.py).
            out_ref[pl.ds(out_base + out_nr - 1, 1), :] = jnp.where(
                iota == 0, d,
                jnp.where(iota == 1, token_pos,
                          jnp.where(iota == 2, lit_len,
                                    jnp.where(iota == 3, last_d,
                                              jnp.where(iota == 4,
                                                        last_anchor, 0)))))

        def row_loop(r, _):
            encode_row(r)
            return 0

        jax.lax.fori_loop(0, rows, row_loop, 0)

    return kernel


# Per-grid-step SMEM budget for the chain operand, in bytes. The pipeline
# double-buffers input windows, so the true footprint is 2x this; 448 KB
# keeps the total under v5e's ~1 MB/core ceiling (same sizing as
# pallas_decode.SMEM_STREAM_BUDGET, validated against its observed OOM).
SMEM_CHAIN_BUDGET = 448 * 1024

def hybrid_max_bs() -> int:
    """Largest supported block size. The chain packs payload positions as
    u16 (pos << 16 | dist), so payloads must stay within 64 KB — which is
    also the largest LZ4 block-size tier below 256 KB, and keeps the chain
    within the SMEM budget. Larger blocks use encode_xla."""
    return WINDOW_SIZE


@functools.partial(jax.jit,
                   static_argnames=("block_size", "hist_len", "interpret"))
def encode_blocks_hybrid(work: jax.Array, lens: jax.Array, block_size: int,
                         hist_len: int = 0, hist_start=0,
                         interpret: bool = False):
    """Encode a batch of LZ4 blocks (sort-exact candidates, Pallas walk).

    Args:
      work: i32[nb, hist_len + block_size] bytes ([history | payload] rows,
        zero-padded payload tails).
      lens: i32[nb] payload sizes.
      block_size: static payload capacity; % 1024 == 0, <= hybrid_max_bs()
        (the chain packs payload positions as u16; larger blocks use
        encode_xla).
      hist_len: static history prefix width (0 or WINDOW_SIZE).
      hist_start: first valid history index per batch (scalar or i32[nb]).

    Returns (out: i32[nb, out_width], out_len: i32[nb]).
    """
    nb, NW = work.shape
    B = block_size
    assert NW == hist_len + B and B % 1024 == 0
    assert B <= hybrid_max_bs(), "block exceeds the u16 chain ceiling"
    # Accept uint8 rows: the widening to i32 lanes runs ON DEVICE, so the
    # host->device transfer ships 1 byte/byte (the tunnel/PCIe link is the
    # production path's bottleneck, measured in docs/BENCHMARKS.md).
    work = work.astype(jnp.int32)

    rows = 8
    while rows > 1 and rows * B * 4 > SMEM_CHAIN_BUDGET:
        rows //= 2
    hist_start = jnp.broadcast_to(jnp.asarray(hist_start, jnp.int32), (nb,))
    if nb % rows:
        pad = rows - nb % rows
        work = jnp.concatenate([work, jnp.zeros((pad, NW), jnp.int32)])
        lens = jnp.concatenate([lens, jnp.zeros(pad, jnp.int32)])
        hist_start = jnp.concatenate([hist_start,
                                      jnp.zeros(pad, jnp.int32)])
    nbp = work.shape[0]

    chains = build_chains(work, lens, hist_len, hist_start)

    # LE32 window words (the kernel recovers bytes as word & 0xFF), padded
    # so wild 128-byte reads stay in bounds and sublane counts stay
    # divisible by 8 at every rows choice.
    w = (work
         + (jnp.pad(work[:, 1:], ((0, 0), (0, 1))) << 8)
         + (jnp.pad(work[:, 2:], ((0, 0), (0, 2))) << 16)
         + (jnp.pad(work[:, 3:], ((0, 0), (0, 3))) << 24))
    w = jnp.pad(w, ((0, 0), (0, _round_up(NW + SLACK, 1024) - NW)))

    src_nr = w.shape[1] // LANES
    chain_nr = B // LANES
    out_bytes = _round_up(block_bound(B) + SLACK + LANES, 1024)
    out_nr = out_bytes // LANES

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbp // rows,),
        in_specs=[
            pl.BlockSpec((rows * src_nr, LANES), lambda g, lens: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows * chain_nr, LANES), lambda g, lens: (g, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[pl.BlockSpec((rows * out_nr, LANES),
                                lambda g, lens: (g, 0),
                                memory_space=pltpu.VMEM)],
    )

    out, = pl.pallas_call(
        _make_kernel(rows, src_nr, out_nr, chain_nr, hist_len),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nbp * out_nr, LANES), jnp.int32)],
        interpret=interpret,
    )(lens, w.reshape(nbp * src_nr, LANES),
      chains.reshape(nbp * chain_nr, LANES))

    out = out.reshape(nbp, out_nr * LANES)
    out_len = out[:nb, (out_nr - 1) * LANES]
    return out[:nb], out_len


def encode_block_hybrid_host(data: np.ndarray,
                             history: np.ndarray | None = None,
                             block_size: int | None = None,
                             interpret: bool | None = None) -> np.ndarray:
    """Host convenience wrapper for tests: bytes in -> LZ4 block bytes out."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = len(data)
    B = _round_up(max(n, 1024), 1024) if block_size is None else block_size
    use_hist = history is not None and len(history) > 0
    hist_len = WINDOW_SIZE if use_hist else 0
    hist_start = 0
    work = np.zeros((1, hist_len + B), np.int32)
    if use_hist:
        h = np.asarray(history, dtype=np.uint8)[-WINDOW_SIZE:]
        hist_start = WINDOW_SIZE - len(h)
        work[0, hist_start:hist_len] = h
    work[0, hist_len: hist_len + n] = data
    out, out_len = encode_blocks_hybrid(
        jnp.asarray(work), jnp.asarray(np.array([n], np.int32)), B,
        hist_len, jnp.int32(hist_start), interpret)
    return np.asarray(out[0][: int(out_len[0])]).astype(np.uint8)
