"""Split encode: XLA scored chains + record-walk Pallas kernel + host
serialization.

Round-3 rebuild of the device encode path, the mirror of
ops/pallas_split_decode.py's decode split. The round-2 hybrid walk
(ops/hybrid_encode.py) emits WIRE BYTES on device — token, 0xFF-run
extensions, literal copies, offset — costing ~0.6 us per sequence on the
Mosaic scalar pipeline (ablation: extension loop ~30%, emission ~33%,
core ~35%; docs/DESIGN.md). This module removes both big terms
structurally:

1. **The kernel emits RECORDS, not bytes.** Per sequence it stores two
   SMEM words — (dist | mlen << 16, lit_len) — and advances. The native
   host serializer (``lz4t_serialize_records``) turns records into the
   spec byte stream at GB/s, reading literals straight from the input the
   host already owns. No token math, no extension runs, no literal copies
   on the scalar core.

2. **Extension is ONE straight-line 128-lane compare.** No inner while:
   a match longer than the compare window emits a 128-byte record and
   CONTINUES in the next loop iteration (lit_len 0, same dist); the
   serializer merges continuations back into one sequence (always-valid
   LZ4, same bytes a full extension would produce). Inner loops are
   control-flow barriers that serialize the Mosaic pipeline (measured on
   the decode kernel, round 3); the walk body is fully predicated
   straight-line code.

3. **Blocks interleave.** WAYS blocks' walks run in lockstep per grid
   step (one iteration each per loop pass); the walk's reads all hit the
   read-only words/chain inputs, so iterations pipeline across ways
   (round-3 microbench: read-only-input bodies interleave near-perfectly;
   the only serial state is each way's scalar cursor chain).

The candidate chains are hybrid_encode's scored chains (nearest previous
identical word is NOT always the best source; prefix-fingerprint samples
pick among the last {1,2,3,4,6,8} occurrences). Chains live in VMEM —
SMEM cannot hold WAYS x 256 KB — and are read with a roll+extract
(2 vector ops + one vreg->sreg transfer per sequence).

Greedy semantics match the hybrid walk exactly (same chains, same
extension-to-limit), so the wire is sequence-identical to
engine="hybrid" and the ratio gates carry over. Reference semantics:
/root/reference/src/block/blockCompress.js:31-232.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import LAST_LITERALS, MF_LIMIT, MIN_MATCH, block_bound
from .hybrid_encode import build_chains, hybrid_max_bs

LANES = 128
SLACK = 256

# Max records per block per kernel call. A record is a sequence or a
# 128-byte match continuation; blocks needing more (avg sequence advance
# < ~8.5 B) overflow and fall back to the byte-emitting hybrid walk.
REC_CAP = 8192

SMEM_BUDGET = 384 * 1024
VMEM_BUDGET = 6 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def plan_ways(hist_len: int, block_size: int) -> int:
    """Interleave width: words + chains per way must fit VMEM; records
    fit SMEM."""
    words_b = (hist_len + block_size + SLACK) * 4
    chain_b = block_size * 4
    ways = 8
    while ways > 1 and (ways * (words_b + chain_b) * 2 > VMEM_BUDGET
                        or ways * REC_CAP * 8 > SMEM_BUDGET):
        ways //= 2
    return ways


def _make_kernel(ways: int, src_nr: int, chain_nr: int, rec_rows: int,
                 hist_len: int, block_size: int):
    """Record-walk kernel.

    Refs:
      lens_ref:  SMEM i32[nb] (scalar prefetch) — payload sizes
      words_ref: VMEM (ways*src_nr, 128) — [history | payload | slack]
                 bytes (i32 lanes)
      chain_ref: VMEM (ways*chain_nr, 128) — packed (m<<16|dist) per
                 payload position (read via roll+extract)
      recs_ref:  SMEM out (ways*rec_rows, 128) i32 — records
                 (dist|mlen<<16, lit_len) per way
      meta_ref:  SMEM out (8, 128) i32 (rows 0..ways-1 used; 8 for the
                 Mosaic block-shape divisibility rule) — lane 0 nrec,
                 lane 1 final anchor, lane 2 overflow flag
    """

    def kernel(lens_ref, words_ref, chain_ref, recs_ref, meta_ref):
        g = pl.program_id(0)
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

        def read128(base_row, q):
            s = q % LANES
            r0 = pltpu.roll(words_ref[pl.ds(base_row + q // LANES, 1), :],
                            -s, axis=1)
            r1 = pltpu.roll(
                words_ref[pl.ds(base_row + q // LANES + 1, 1), :], -s,
                axis=1)
            return jnp.where(iota < LANES - s, r0, r1)

        def getchain(base_row, a):
            """Chain entry at payload position a (VMEM roll+extract)."""
            v = pltpu.roll(chain_ref[pl.ds(base_row + a // LANES, 1), :],
                           -(a % LANES), axis=1)[0, 0]
            return (v >> 16) & 0xFFFF, v & 0xFFFF

        def way_state(r):
            src_len = lens_ref[g * ways + r]
            m0, d0 = getchain(r * chain_nr, 0)
            # anchor, cand_m, cand_dist, cont, nrec
            return (jnp.int32(0), m0, d0, jnp.int32(0), jnp.int32(0),
                    src_len)

        def way_step(r, st):
            anchor, cand_m, cand_d, cont, nrec, src_len = st
            mf_limit = src_len - MF_LIMIT
            match_limit = src_len - LAST_LITERALS
            active = (cont > 0) | (cand_m < mf_limit)

            pos = jnp.where(cont > 0, anchor, cand_m)
            dist = cand_d
            base = jnp.where(cont > 0, 0, MIN_MATCH)
            q = hist_len + pos + base
            a = read128(r * src_nr, q) & 0xFF
            b = read128(r * src_nr, q - dist) & 0xFF
            lim = match_limit - (pos + base)
            neq = (a != b) | (iota >= lim)
            mm = jnp.min(jnp.where(neq, iota, LANES))
            mlen = jnp.where(active, base + mm, 0)

            # Emit (unconditional store; inactive ways park junk at slot
            # nrec, which the next active record overwrites and the meta
            # count never exposes).
            slot = jnp.minimum(nrec, REC_CAP - 1)
            base_row = r * rec_rows
            w0 = dist | (mlen << 16)
            recs_ref[base_row + (2 * slot) // LANES,
                     (2 * slot) % LANES] = w0
            recs_ref[base_row + (2 * slot + 1) // LANES,
                     (2 * slot + 1) % LANES] = pos - anchor
            nrec = nrec + jnp.where(active, 1, 0)

            adv = pos + mlen
            anchor = jnp.where(active, adv, anchor)
            full = active & (mm == LANES)
            nm, nd = getchain(r * chain_nr,
                              jnp.clip(adv, 0, block_size - 1))
            cand_m = jnp.where(active, jnp.where(full, adv, nm), cand_m)
            cand_d = jnp.where(active, jnp.where(full, dist, nd), cand_d)
            cont = jnp.where(full, 1, 0)
            return (anchor, cand_m, cand_d, cont, nrec, src_len)

        def any_active(sts):
            alive = jnp.int32(0)
            for r in range(ways):
                anchor, cand_m, cand_d, cont, nrec, src_len = sts[r]
                active = ((cont > 0) | (cand_m < src_len - MF_LIMIT)) \
                    & (nrec < REC_CAP)
                alive = alive | jnp.where(active, 1, 0)
            return alive > 0

        def body(sts):
            return tuple(way_step(r, sts[r]) for r in range(ways))

        sts = tuple(way_state(r) for r in range(ways))
        sts = jax.lax.while_loop(any_active, body, sts)

        for r in range(ways):
            anchor, cand_m, cand_d, cont, nrec, src_len = sts[r]
            overflow = jnp.where(nrec >= REC_CAP, 1, 0)
            meta_ref[r, 0] = nrec
            meta_ref[r, 1] = anchor
            meta_ref[r, 2] = overflow

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("block_size", "hist_len", "interpret"))
def walk_blocks_split(work: jax.Array, lens: jax.Array, block_size: int,
                      hist_len: int = 0, hist_start=0,
                      interpret: bool = False):
    """Chain + record-walk a batch of blocks on device.

    Args:
      work: u8/i32[nb, hist_len + block_size] ([history | payload] rows).
      lens: i32[nb] payload sizes.
      block_size: static payload capacity (% 1024 == 0, <= hybrid_max_bs()).
      hist_len: static history width (0 or WINDOW_SIZE).
      hist_start: first valid history index (scalar or i32[nb]).

    Returns (recs: i32[nb, REC_CAP, 2], meta: i32[nb, 3]) — meta columns
    (record count, final anchor, overflow flag). Serialization happens on
    host (``serialize_block``).
    """
    nb, NW = work.shape
    B = block_size
    assert NW == hist_len + B and B % 1024 == 0
    assert B <= hybrid_max_bs()
    work = work.astype(jnp.int32)
    ways = plan_ways(hist_len, B)
    if nb % ways:
        pad = ways - nb % ways
        work = jnp.concatenate([work, jnp.zeros((pad, NW), jnp.int32)])
        lens = jnp.concatenate([lens, jnp.zeros(pad, jnp.int32)])
    nbp = work.shape[0]

    chains = build_chains(work, lens, hist_len, hist_start)  # i32[nbp, B]

    src_bytes = _round_up(NW + SLACK, 1024)
    src_nr = src_bytes // LANES
    words = jnp.pad(work, ((0, 0), (0, src_bytes - NW)))
    chain_nr = B // LANES
    rec_rows = REC_CAP * 2 // LANES

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbp // ways,),
        in_specs=[
            pl.BlockSpec((ways * src_nr, LANES), lambda g, l: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ways * chain_nr, LANES), lambda g, l: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ways * rec_rows, LANES), lambda g, l: (g, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, LANES), lambda g, l: (g, 0),
                         memory_space=pltpu.SMEM),
        ],
    )

    recs, meta = pl.pallas_call(
        _make_kernel(ways, src_nr, chain_nr, rec_rows, hist_len, B),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nbp * rec_rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((nbp // ways * 8, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(lens, words.reshape(nbp * src_nr, LANES),
      chains.reshape(nbp * chain_nr, LANES))

    recs = recs.reshape(nbp, REC_CAP, 2)
    # meta rows are (step, way) in 8-row groups -> flatten back to blocks
    meta = meta.reshape(nbp // ways, 8, LANES)[:, :ways, :].reshape(
        nbp, LANES)
    return recs[:nb], meta[:nb, :3]


def serialize_block(payload: np.ndarray, recs: np.ndarray,
                    nrec: int) -> np.ndarray:
    """Host serialization of one block's records (native fast path)."""
    out = np.empty(block_bound(len(payload)) + 16, np.uint8)
    recs = np.ascontiguousarray(recs[:nrec], dtype=np.uint32)
    try:
        from ..native import serialize_records_native
    except Exception:
        serialize_records_native = None
    if serialize_records_native is not None:
        n = serialize_records_native(payload, recs, out)
        return out[:n]
    return _serialize_records_py(payload, recs)


def _serialize_records_py(payload: np.ndarray,
                          recs: np.ndarray) -> np.ndarray:
    """Pure-Python serializer (same contract as lz4t_serialize_records)."""
    parts = []
    anchor = 0
    k = 0
    rl = recs.tolist()
    n = len(rl)
    src_len = len(payload)
    while k < n:
        w0, lit = rl[k]
        dist, mlen = w0 & 0xFFFF, w0 >> 16
        k += 1
        while k < n and rl[k][1] == 0 and (rl[k][0] & 0xFFFF) == dist:
            mlen += rl[k][0] >> 16
            k += 1
        if mlen == 0 and lit == 0:
            continue
        if mlen < MIN_MATCH or dist == 0:
            raise ValueError("LZ4: Malformed Input")
        mcode = mlen - MIN_MATCH
        head = [min(lit, 15) << 4 | min(mcode, 15)]
        if lit >= 15:
            rem = lit - 15
            while rem >= 255:
                head.append(255)
                rem -= 255
            head.append(rem)
        parts.append(np.array(head, np.uint8))
        parts.append(payload[anchor: anchor + lit])
        anchor += lit + mlen
        tail = [dist & 0xFF, dist >> 8]
        if mcode >= 15:
            rem = mcode - 15
            while rem >= 255:
                tail.append(255)
                rem -= 255
            tail.append(rem)
        parts.append(np.array(tail, np.uint8))
    lit = src_len - anchor
    head = [min(lit, 15) << 4]
    if lit >= 15:
        rem = lit - 15
        while rem >= 255:
            head.append(255)
            rem -= 255
        head.append(rem)
    parts.append(np.array(head, np.uint8))
    parts.append(payload[anchor:])
    return np.concatenate(parts)


def encode_block_split_host(data: np.ndarray, block_size: int | None = None,
                            interpret: bool | None = None) -> np.ndarray:
    """Host convenience wrapper (one block in, wire bytes out), for tests.
    Falls back to the hybrid byte-emitting walk on record overflow."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    data = np.ascontiguousarray(data, dtype=np.uint8)
    n = len(data)
    if n == 0:
        return np.empty(0, np.uint8)
    if block_size is None:
        block_size = max(_round_up(n, 1024), 1024)
    work = np.zeros((1, block_size), np.int32)
    work[0, :n] = data
    recs, meta = walk_blocks_split(jnp.asarray(work),
                                   jnp.asarray(np.array([n], np.int32)),
                                   block_size, 0, 0, interpret)
    nrec, _, overflow = (int(x) for x in np.asarray(meta[0]))
    if overflow:
        from .hybrid_encode import encode_block_hybrid_host
        return encode_block_hybrid_host(data, block_size)
    return serialize_block(data, np.asarray(recs[0]), nrec)
