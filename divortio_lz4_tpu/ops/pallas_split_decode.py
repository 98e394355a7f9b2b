"""Split decode: host-parsed records + interleaved all-vector Pallas copies.

Round-3 rebuild of the device decode path. The round-2 interpreter kernel
(ops/pallas_decode.py) hit its own measured floor at ~398 ns/sequence: the
scalar-core token parse (3-4 SMEM loads + two 0xFF-run whiles + clamps +
branch) cost 209 ns/seq and the copy path the rest, and per-sequence ablations
showed no remaining lever (docs/DESIGN.md). This module breaks that floor
structurally, in two moves:

1. **Parse on host, copy on device.** The sequence parse is O(wire) serial
   byte work — a CPU job. ``lz4t_parse_records`` (native/lz4_kernels.cpp)
   walks the stream at GB/s and emits (a) a PLACED-LITERAL image of the
   output (literal bytes memcpy'd to their final offsets — bandwidth-bound
   host work) and (b) fixed-shape match records ``(offset | mlen<<16, dst)``.
   The device kernel never sees a token: it executes ONLY the match copies —
   the one truly order-dependent part of LZ4 decode (out[j] = out[j-offset]).

2. **Interleave independent blocks' record streams in one scalar loop.**
   Measured on v5e (microbench, round 3): a full record-copy body costs
   ~165 ns/record alone but ~42 ns/record when FOUR independent bodies
   interleave in the same fori body — the Mosaic scalar+vector pipeline is
   dependency-latency-bound, not issue-bound (~3.5 ns/op effective at 4-way).
   Blocks in a batch are independent, so each grid step decodes WAYS blocks
   in lockstep, one record each per iteration. Each way gets its OWN output
   ref: a shared ref would make Mosaic serialize the ways on false
   read-after-write hazards. (pl.when measured +5 ns even when its body is
   skipped 88% of the time — the body stays straight-line predicated.)

The copy itself keeps the round-2 machinery that is already optimal on this
VPU: lane-aligned row reads + ``pltpu.roll`` rotations for byte addressing,
in-register log-doubling periodization for overlap matches (offset < 128 —
exact LZ4 overlap propagation), periodic-source chunk reads for matches
longer than 128 B. Writes are masked on BOTH edges (read-modify-write):
unlike the interpreter kernel, wild tails are not rewritten by later
sequences here — the literal image is already in place.

Reference semantics: /root/reference/src/block/blockDecompress.js:55-272
(dictionary back-references included: the literal image carries the history
window, so they are plain negative offsets).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import WINDOW_SIZE

W = WINDOW_SIZE
SLACK = 256
LANES = 128

# Per-grid-step budgets (bytes). SMEM holds the ways' record windows
# (double-buffered by the grid pipeline, so the true footprint is 2x —
# 448 KB matches hybrid_encode.SMEM_CHAIN_BUDGET, validated against v5e's
# ~1 MB/core ceiling); VMEM holds the wire images + io blocks (~16 MB on
# v5e; the planner's x8 accounting is i32 widening x double buffering, so
# 10 MB compared = 10 MB resident). Round 3's 384 KB/6 MB silently
# dropped dense corpora (cap 8192: the canonical bench slice) to ways=4.
SMEM_BUDGET = 448 * 1024
VMEM_BUDGET = 10 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pow2_at_least(x: int, lo: int) -> int:
    m = lo
    while m < x:
        m <<= 1
    return m


# A padding record the kernel executes as a no-op: offset=1, mlen=0, dst=1
# (empty write masks; src = out_base >= 0 so the read stays in bounds).
NOOP_W0 = 1
NOOP_W1 = 1

# Records per way per dynamic-loop iteration. 1: measured best — the
# dynamic-bound fori costs ~nothing here, and an 8x unroll (32 inlined
# bodies) regressed ~2x (register pressure serializes the pipeline).
UNROLL = 1


def _make_kernel(ways: int, cap: int, io_nr: int, out_base: int,
                 out_cap: int):
    """Interleaved record-copy kernel.

    Refs:
      trips_ref: SMEM i32[nsteps] (scalar prefetch) — record-loop bound per
        grid step (max over the step's ways; shorter ways are padded with
        no-op records).
      recs_ref:  SMEM i32(ways*cap*2 // 128, 128) — per-way match records,
        flattened to 128-lane rows (Mosaic block-shape divisibility).
      lit_ref:   VMEM (ways*io_nr, 128) — placed-literal images (read-only;
        one shared ref is fine, reads carry no hazards).
      io_refs:   ways x VMEM (io_nr, 128) — outputs, one PER WAY (separate
        refs keep Mosaic from serializing the interleave on false
        read-after-write hazards).
    """
    bs_limit = out_base + out_cap

    def kernel(trips_ref, recs_ref, lit_ref, *io_refs):
        g = pl.program_id(0)
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

        # Seed every way's io with its literal image, (8,128) tiles.
        def seed(k, _):
            for r in range(ways):
                io_refs[r][pl.ds(k * 8, 8), :] = \
                    lit_ref[pl.ds(r * io_nr + k * 8, 8), :]
            return 0
        jax.lax.fori_loop(0, io_nr // 8, seed, 0)

        def read128(ref, q):
            s = q % LANES
            r0 = pltpu.roll(ref[pl.ds(q // LANES, 1), :], -s, axis=1)
            r1 = pltpu.roll(ref[pl.ds(q // LANES + 1, 1), :], -s, axis=1)
            return jnp.where(iota < LANES - s, r0, r1)

        def copy_record(io_ref, w0, w1):
            # Decode one match record: STRAIGHT-LINE, no inner loops — a
            # while/fori in the body is a control-flow barrier that
            # serializes the cross-way interleave (measured: the periodized
            # variant ran at the single-way rate). The parser contract
            # guarantees mlen <= 128 and a fully-written source, so one
            # read + one masked two-row RMW is the whole record.
            # Hostile-record clamps: records normally come from our own
            # parser; garbage must still stay inside the io region.
            offset = w0 & 0xFFFF
            mlen = (w0 >> 16) & 0xFFFF
            dst = jnp.maximum(jnp.clip(w1, 0, out_cap) + out_base, 1)
            offset = jnp.clip(offset, 1, dst)
            mlen = jnp.clip(mlen, 0,
                            jnp.minimum(LANES, bs_limit - dst))
            src = dst - offset

            v = read128(io_ref, src)

            # Masked RMW of the two spanning rows. Masks cover exactly
            # [dst, dst+mlen) — the surrounding bytes are placed literals
            # and must survive (no wild tails here, nothing rewrites them).
            s = dst % LANES
            e = s + mlen
            placed = pltpu.roll(v, s, axis=1)
            j = dst // LANES
            d0 = io_ref[pl.ds(j, 1), :]
            d1 = io_ref[pl.ds(j + 1, 1), :]
            io_ref[pl.ds(j, 1), :] = jnp.where(
                (iota >= s) & (iota < e), placed, d0)
            io_ref[pl.ds(j + 1, 1), :] = jnp.where(
                iota < e - LANES, placed, d1)

        def body(i, _):
            # UNROLL records per way per iteration: a dynamic-bound loop is
            # a Mosaic while, whose per-iteration overhead is ~0.5-1 us
            # (measured round 2/3; a static-bound fori is a ~5 ns hardware
            # loop). The unroll amortizes it 8x; padding rounds trips up by
            # at most UNROLL-1 no-op records per way.
            for u in range(UNROLL):
                for r in range(ways):
                    # Way r's record k lives at flat words r*cap*2 + 2k(+1);
                    # cap*2 % 128 == 0, so the row split is exact.
                    k = i * UNROLL + u
                    base_row = r * cap * 2 // LANES
                    w0 = recs_ref[base_row + (2 * k) // LANES,
                                  (2 * k) % LANES]
                    w1 = recs_ref[base_row + (2 * k + 1) // LANES,
                                  (2 * k + 1) % LANES]
                    copy_record(io_refs[r], w0, w1)
            return 0

        jax.lax.fori_loop(0, trips_ref[g], body, 0)

    return kernel


def plan_ways(cap: int, io_bytes: int) -> int:
    """Interleave width for a given record capacity / block footprint."""
    ways = 8
    while ways > 1 and (ways * cap * 8 > SMEM_BUDGET
                        or ways * io_bytes * 8 > VMEM_BUDGET):
        ways //= 2
    return ways


@functools.partial(jax.jit,
                   static_argnames=("block_size", "use_history", "interpret"))
def decode_blocks_split(lit: jax.Array, recs: jax.Array, trips: jax.Array,
                        block_size: int, use_history: bool = False,
                        interpret: bool = False):
    """Run the interleaved copy kernel over pre-parsed blocks.

    Args:
      lit: u8/i32[nb, io_bytes] placed-literal images; io_bytes =
        round_up((W if use_history else 0) + block_size + SLACK, 1024);
        history bytes (if any) pre-placed in the first W bytes.
      recs: i32[nb, cap, 2] match records (offset|mlen<<16, dst), padded
        with NOOP records; cap a power of two.
      trips: i32[nb / ways] per-grid-step record-loop bounds (max record
        count over the step's ways; rounded up to UNROLL internally).
      block_size: static output capacity per block.

    Returns out: i32[nb, block_size]. (Output lengths come from the host
    parser — the kernel doesn't recompute them.)
    """
    nb, io_bytes = lit.shape
    cap = recs.shape[1]
    out_base = W if use_history else 0
    io_nr = io_bytes // LANES
    assert io_bytes % 1024 == 0, io_bytes
    ways = plan_ways(cap, io_bytes)
    assert nb % ways == 0, (nb, ways)
    nsteps = nb // ways

    lit = lit.astype(jnp.int32).reshape(nb * io_nr, LANES)
    assert (cap * 2) % LANES == 0, cap
    recs_flat = recs.reshape(nb * cap * 2 // LANES, LANES)
    trips = (trips + UNROLL - 1) // UNROLL

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((ways * cap * 2 // LANES, LANES),
                         lambda g, t: (g, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((ways * io_nr, LANES), lambda g, t: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((io_nr, LANES), lambda g, t: (g, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(ways)
        ],
    )

    outs = pl.pallas_call(
        _make_kernel(ways, cap, io_nr, out_base, block_size),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nsteps * io_nr, LANES), jnp.int32)
                   for _ in range(ways)],
        interpret=interpret,
    )(trips, recs_flat, lit)

    # outs[r][step] is block step*ways + r: interleave back to block order.
    out = jnp.stack([o.reshape(nsteps, io_nr * LANES) for o in outs],
                    axis=1).reshape(nb, io_nr * LANES)
    return out[:, out_base: out_base + block_size]


# ---------------------------------------------------------------------------
# Host-side parse + batching
# ---------------------------------------------------------------------------

def _parse_records_py(src: np.ndarray, lit: np.ndarray, out_cap: int,
                      dict_len: int = 0):
    """Pure-Python fallback for lz4t_parse_records (same record contract:
    mlen <= 128 per record, source fully written in array order —
    host-materialized overlaps / doubling chains / 128-byte splits)."""
    cb = src.tolist()
    n = len(cb)
    p = o = 0
    mat_start = 0
    recs = []
    while p < n:
        tok = cb[p]; p += 1
        ll = tok >> 4
        if ll == 15:
            while True:
                if p >= n:
                    raise ValueError("LZ4: Malformed Input")
                v = cb[p]; p += 1; ll += v
                if v != 255:
                    break
        if o + ll > out_cap:
            raise ValueError("LZ4: Output Buffer Too Small")
        if p + ll > n:
            raise ValueError("LZ4: Malformed Input")
        lit[o: o + ll] = src[p: p + ll]
        o += ll; p += ll
        if p >= n:
            break
        if p + 2 > n:
            raise ValueError("LZ4: Malformed Input")
        off = cb[p] | (cb[p + 1] << 8)
        p += 2
        if off == 0:
            raise ValueError("LZ4: Invalid Offset 0")
        if off > o + dict_len:
            raise ValueError("LZ4: Dictionary Offset Out of Bounds")
        ml = tok & 15
        if ml == 15:
            while True:
                if p >= n:
                    raise ValueError("LZ4: Malformed Input")
                v = cb[p]; p += 1; ml += v
                if v != 255:
                    break
        ml += 4
        if o + ml > out_cap:
            raise ValueError("LZ4: Output Buffer Too Small")
        if off < 128 and o - off >= mat_start:
            reps = -(-ml // off)
            lit[o: o + ml] = np.tile(lit[o - off: o], reps)[:ml]
            o += ml
            continue
        rem = ml
        while off < 128 and rem > 0:
            take = min(rem, off)
            recs.append((off | (take << 16), o))
            o += take
            rem -= take
            off *= 2
        while rem > 0:
            take = min(rem, 128)
            recs.append((off | (take << 16), o))
            o += take
            rem -= take
        mat_start = o
    return (np.array(recs, np.uint32).reshape(-1, 2) if recs
            else np.empty((0, 2), np.uint32)), o


def parse_records(src: np.ndarray, lit: np.ndarray, out_cap: int,
                  dict_len: int = 0):
    """Parse one block into (records, out_len), placing literals into *lit*
    (native fast path, Python fallback)."""
    src = np.ascontiguousarray(src, dtype=np.uint8)
    try:
        from ..native import parse_records_native
    except Exception:
        parse_records_native = None
    if parse_records_native is not None:
        return parse_records_native(src, lit, out_cap, dict_len)
    return _parse_records_py(src, lit, out_cap, dict_len)


def parse_block_batch(comps, block_size: int, histories=None):
    """Parse a batch of blocks for ``decode_blocks_split``.

    Args:
      comps: list of per-block wire byte arrays (u8).
      block_size: per-block output capacity.
      histories: optional list of per-block history windows (u8, <= 64 KB;
        None entries = no history).

    Returns (lit u8[nb, io_bytes], recs i32[nb, cap, 2], counts i32[nb],
    out_lens i32[nb], use_history). Blocks are NOT reordered here — callers
    batch-sort by record count for interleave efficiency (see
    ``decode_blocks_split_batched``).
    """
    nb = len(comps)
    use_history = histories is not None and any(
        h is not None and len(h) for h in histories)
    out_base = W if use_history else 0
    io_bytes = _round_up(out_base + block_size + SLACK, 1024)
    lit = np.zeros((nb, io_bytes), np.uint8)
    recs_l = []
    counts = np.zeros(nb, np.int32)
    out_lens = np.zeros(nb, np.int32)
    for i, c in enumerate(comps):
        h = histories[i] if use_history else None
        hl = len(h) if h is not None else 0
        if hl:
            lit[i, out_base - hl: out_base] = h
        r, ol = parse_records(c, lit[i, out_base:], block_size, hl)
        recs_l.append(r)
        counts[i] = len(r)
        out_lens[i] = ol
    cap = _pow2_at_least(max(int(counts.max(initial=0)) + 1, 2), 128)
    recs = np.empty((nb, cap, 2), np.uint32)
    recs[:, :, 0] = NOOP_W0
    recs[:, :, 1] = NOOP_W1
    for i, r in enumerate(recs_l):
        recs[i, : len(r)] = r
    return lit, recs.view(np.int32), counts, out_lens, use_history


# ---------------------------------------------------------------------------
# Round-4 "wire-direct" split decode (v2): 1x wire bytes on the link
# ---------------------------------------------------------------------------
#
# The round-3 split path ships a PLACED-LITERAL image (~1x plaintext) plus
# match records — ~2-3x the compressed stream on the wire, which loses the
# end-to-end tier on transfer-bound links (VERDICT r3 weak #3). The v2 path
# ships the COMPRESSED BYTES THEMSELVES as the kernel's literal source:
# each record covers up to 128 contiguous output bytes — a literal slice
# copied from the wire image plus (optionally) a match copy from prior
# output — so ~one record per LZ4 sequence:
#
#   shipped (narrow, block_size <= 64 KB): u16[nb, cap, 3] =
#       (src, offset, ll | ml<<8)            — 6 B/record on the link
#   shipped (wide):                        u32[nb, cap, 2] =
#       (src, offset | ll<<16 | ml<<24)      — 8 B/record
#
# dst is NOT shipped: records tile the output exactly in order, so the
# device derives it with one cumsum (``_expand_wire_records``). That same
# tiling property buys the kernel WILD writes the placed-image kernel can
# never use: everything at/after a record's end is rewritten by later
# records, so only the leading edge of the first output row needs a masked
# read-modify-write — the second row is a plain store.
#
# Host parse gets ~3x cheaper too (no literal memcpy — pure arithmetic) and
# overlaps the previous batch's kernel in the frame path (async dispatch).
# Reference semantics: blockDecompress.js:61-123 (literal copies now run on
# device), :204-268 (match cases).

# Lane budget per record (output bytes covered).
REC_SPAN = 128


def _parse_records2_py(src: np.ndarray, out_cap: int, dict_len: int = 0):
    """Pure-Python fallback for lz4t_parse_records2 (same record contract)."""
    cb = src.tolist()
    n = len(cb)
    p = o = 0
    recs = []

    def emit(s, off, ll, ml):
        recs.append((s, (off | (ll << 16) | (ml << 24)) & 0xFFFFFFFF))

    while p < n:
        tok = cb[p]; p += 1
        ll = tok >> 4
        if ll == 15:
            while True:
                if p >= n:
                    raise ValueError("LZ4: Malformed Input")
                v = cb[p]; p += 1; ll += v
                if v != 255:
                    break
        if o + ll > out_cap:
            raise ValueError("LZ4: Output Buffer Too Small")
        if p + ll > n:
            raise ValueError("LZ4: Malformed Input")
        lp = p
        o += ll; p += ll
        if p >= n:
            while ll > 0:
                take = min(ll, 128)
                emit(lp, 1, take, 0)
                lp += take; ll -= take
            break
        if p + 2 > n:
            raise ValueError("LZ4: Malformed Input")
        off = cb[p] | (cb[p + 1] << 8)
        p += 2
        if off == 0:
            raise ValueError("LZ4: Invalid Offset 0")
        if off > o + dict_len:
            raise ValueError("LZ4: Dictionary Offset Out of Bounds")
        ml = tok & 15
        if ml == 15:
            while True:
                if p >= n:
                    raise ValueError("LZ4: Malformed Input")
                v = cb[p]; p += 1; ml += v
                if v != 255:
                    break
        ml += 4
        if o + ml > out_cap:
            raise ValueError("LZ4: Output Buffer Too Small")
        o += ml
        if ll + ml <= 128 and off >= ll + ml:
            emit(lp, off, ll, ml)          # one combined record
            continue
        if off >= 128:
            while ll > 128:
                emit(lp, 1, 128, 0)
                lp += 128; ll -= 128
            take = min(ml, 128 - ll)
            emit(lp, off, ll, take)        # literal tail absorbs match head
            ml -= take
            while ml > 0:
                take = min(ml, 128)
                emit(0, off, 0, take)
                ml -= take
            continue
        while ll > 0:                      # overlap: literals, then doubling
            take = min(ll, 128)
            emit(lp, 1, take, 0)
            lp += take; ll -= take
        d = off
        while d < 128 and ml > 0:
            take = min(ml, d)
            emit(0, d, 0, take)
            ml -= take; d *= 2
        while ml > 0:
            take = min(ml, 128)
            emit(0, d, 0, take)
            ml -= take
    return (np.array(recs, np.uint32).reshape(-1, 2) if recs
            else np.empty((0, 2), np.uint32)), o


def parse_records_wire(src: np.ndarray, out_cap: int, dict_len: int = 0):
    """Parse one block's wire bytes into v2 records (native fast path,
    Python fallback). Returns (recs u32[nrec, 2], out_len)."""
    src = np.ascontiguousarray(src, dtype=np.uint8)
    try:
        from ..native import parse_records2_native
    except Exception:
        parse_records2_native = None
    if parse_records2_native is not None:
        return parse_records2_native(src, out_cap, dict_len)
    return _parse_records2_py(src, out_cap, dict_len)


def stored_wire_records(size: int) -> np.ndarray:
    """Pure-literal v2 records for a STORED block: the wire image IS the
    plaintext, so the kernel copies it through in 128-byte slices."""
    if size == 0:
        return np.empty((0, 2), np.uint32)
    n = -(-size // 128)
    r = np.empty((n, 2), np.uint32)
    r[:, 0] = np.arange(n, dtype=np.uint32) * 128
    take = np.full(n, 128, np.uint32)
    take[-1] = size - 128 * (n - 1)
    r[:, 1] = 1 | (take << 16)
    return r


def _expand_wire_records(recs: jax.Array, out_cap: int):
    """Device-side record packing for the kernel's SMEM word layout; runs
    inside the decode jit, fused ahead of the pallas_call.

    Narrow (u16 triplets src/off/llml) -> 2 words/record ("n2"):
    (src|llml<<16, dst|off<<16) with dst from one cumsum over ll+ml
    (records tile the output in order). A packed 6 B "p6" form with a
    running-dst scalar carried in the kernel loop was built and measured
    SLOWER (19.0-19.3 ms vs 16.6 at the bench shape, any ways): the
    loop-carried dst chain serializes the interleave — an SMEM-resident
    dst keeps every record's body independent. (The LINK already ships
    the 6 B u16 triplets either way; this is only the SMEM form.)

    Wide (u32 pairs, blocks whose wire exceeds u16 addressing) -> 3
    words/record (src, off|ll<<16|ml<<24, dst via cumsum), unchanged.

    Returns (words i32[nb, nwords], fmt) with fmt in {"n2", "w3"}."""
    nb, cap = recs.shape[0], recs.shape[1]
    if recs.dtype == jnp.uint16:
        r = recs.astype(jnp.int32)
        src, off, llml = r[..., 0], r[..., 1], r[..., 2]
        tot = (llml & 0xFF) + ((llml >> 8) & 0xFF)
        dst = jnp.cumsum(tot, axis=1) - tot
        dst = jnp.minimum(dst, min(out_cap, 0xFFFF))  # keep the u16 field
        w0 = src | (llml << 16)
        w1 = dst | (off << 16)
        return jnp.stack([w0, w1], -1).reshape(nb, cap * 2), "n2"
    r = recs.astype(jnp.int32)
    src, w1 = r[..., 0], r[..., 1]
    tot = ((w1 >> 16) & 0xFF) + ((w1 >> 24) & 0xFF)
    dst = jnp.cumsum(tot, axis=1) - tot
    dst = jnp.minimum(dst, out_cap)
    return jnp.stack([src, w1, dst], -1).reshape(nb, cap * 3), "w3"


def _make_wire_kernel(ways: int, cap: int, fmt: str, wire_nr: int,
                      io_nr: int, hist_nr: int, out_base: int, out_cap: int,
                      pair: int = 1):
    """Interleaved wire-direct record kernel (see the v2 section header).

    Refs: trips (SMEM prefetch), recs (SMEM; fmt "n2" = 2 words/record,
    "w3" = 3 words/record), wire (VMEM, per-way compressed images, shared
    read-only ref), [hist (VMEM, per-way history rows — only when
    out_base > 0)], ways x io outputs. dst lives IN the records (cumsum
    on device): a running-dst carry measured slower — see
    _expand_wire_records.

    ``pair``: records per way per loop iteration. The fori back-edge is a
    pipeline drain (interleaved vector work cannot overlap across
    iterations), so a larger straight-line body amortizes it; record
    k+1 of a way RAW-depends on record k through the way's io ref, but
    the other ways' records sit between them in program order. Pad
    records (zero llml, cumsum-dst = out_len) write nothing, so an odd
    way simply runs one no-op."""
    bs_limit = out_base + out_cap

    def kernel(trips_ref, recs_ref, wire_ref, *rest):
        if hist_nr:
            hist_ref, io_refs = rest[0], rest[1:]
        else:
            io_refs = rest
        g = pl.program_id(0)
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

        if hist_nr:
            # seed each way's window region from its history rows
            def seed(k, _):
                for r in range(ways):
                    io_refs[r][pl.ds(k * 8, 8), :] = \
                        hist_ref[pl.ds(r * hist_nr + k * 8, 8), :]
                return 0
            jax.lax.fori_loop(0, hist_nr // 8, seed, 0)

        def read_at(ref, q, ls):
            """Two rows of *ref* rolled so byte q+t sits at lane (ls+t)%128
            — ONE (2,128) slice + ONE roll (both rows shift by the same
            amount; splitting back to (1,128) views is free). The separate
            per-row read+roll form costs 2 extra vector ops per call
            (4/record — measured in the round-4 op budget)."""
            sq = q % LANES
            x = pltpu.roll(ref[pl.ds(q // LANES, 2), :], ls - sq, axis=1)
            return x[0:1, :], x[1:2, :], sq

        def do_record(io_ref, wire_base, src, off, ll, ml, dst):
            """Copy one record at absolute output position *dst*.
            Hostile-record clamps: records normally come from our own
            parser; garbage must still stay inside the refs."""
            tot = jnp.clip(ll + ml, 0, jnp.minimum(LANES, bs_limit - dst))
            ll = jnp.minimum(ll, tot)
            off = jnp.maximum(off, 1)
            msrc = jnp.maximum(dst + ll - off, 0)
            src = jnp.clip(src, 0, (wire_nr - 2) * LANES)

            s = dst % LANES
            t = (iota - s) & (LANES - 1)
            # Row-crossing selects compare t against a SCALAR boundary
            # (128 - source-lane phase) — one vector cmp each; the
            # vector-add forms cost an extra op per select. vm's t-ll
            # skips the &127: lanes with t < ll take vl in comb, so their
            # vm value is dead either way.
            l0, l1, sql = read_at(wire_ref, wire_base + src, s)
            vl = jnp.where(t < LANES - sql, l0, l1)
            m0, m1, sqm = read_at(io_ref, msrc, (s + ll) % LANES)
            vm = jnp.where(t - ll < LANES - sqm, m0, m1)
            comb = jnp.where(t < ll, vl, vm)

            # Row j masked on both edges (lanes below s hold earlier
            # records' bytes; an empty record — e.g. a shorter way's pad,
            # whose dst sits at out_len — must write NOTHING). Row j+1 is
            # a plain WILD store: everything at/after a record's end is
            # rewritten by later records (records tile the output in
            # order), and garbage past out_len is sliced away on host. The
            # placed-image kernel can never write wild.
            e = s + tot
            j = dst // LANES
            d0 = io_ref[pl.ds(j, 1), :]
            io_ref[pl.ds(j, 1), :] = jnp.where((iota >= s) & (iota < e),
                                               comb, d0)
            io_ref[pl.ds(j + 1, 1), :] = comb

        rw = 2 if fmt == "n2" else 3

        def one(r, ri):
            base_row = r * cap * rw // LANES
            w0 = recs_ref[base_row + (rw * ri) // LANES,
                          (rw * ri) % LANES]
            w1 = recs_ref[base_row + (rw * ri + 1) // LANES,
                          (rw * ri + 1) % LANES]
            if fmt == "n2":
                src = w0 & 0xFFFF
                ll = (w0 >> 16) & 0xFF
                ml = (w0 >> 24) & 0xFF
                dstr = w1 & 0xFFFF
                off = (w1 >> 16) & 0xFFFF
            else:
                w2 = recs_ref[base_row + (3 * ri + 2) // LANES,
                              (3 * ri + 2) % LANES]
                src = w0
                off = w1 & 0xFFFF
                ll = (w1 >> 16) & 0xFF
                ml = (w1 >> 24) & 0xFF
                dstr = w2
            dst = jnp.minimum(dstr, out_cap) + out_base
            do_record(io_refs[r], r * wire_nr * LANES, src, off, ll,
                      ml, dst)

        def body(i, _):
            # way-major order: a way's dependent pair sits ways-1
            # independent records apart in program order
            for p in range(pair):
                for r in range(ways):
                    one(r, pair * i + p)
            return 0

        jax.lax.fori_loop(0, trips_ref[g], body, 0)

    return kernel


def _make_wire_kernel_compact(ways: int, wire_nr: int,
                              hist_nr: int, out_base: int, out_cap: int,
                              pair: int):
    """Compact-stream variant of _make_wire_kernel (round 5, VERDICT r4
    #3): the records live in ONE flat SMEM-resident array (scalar
    prefetch) instead of per-way cap-padded windows, with a prefetched
    per-(step, way) word BASE. Each row's stream is padded only to its
    GROUP's trip bound (count-sorted groups -> tiny inflation), so

      * the link ships ~8 B/record total instead of cap * 6 B/way, and
      * the SMEM constraint becomes the DISPATCH's total record count —
        per-way cap no longer caps the interleave, so dense tiers run
        ways=8 (plan_ways_compact is VMEM-bound only).

    dst is host-computed (the parser walks the stream anyway), packed as
    w0 = src | llml<<16, w1 = dst | off<<16 — the same fields the "n2"
    form derives on device. Pad records (w0=0, w1=min(out_len, 0xFFFF))
    write nothing: tot=0 masks the first row and the wild second-row
    store lands in the slack past out_len."""
    bs_limit = out_base + out_cap

    def kernel(trips_ref, bases_ref, recs_ref, wire_ref, *rest):
        if hist_nr:
            hist_ref, io_refs = rest[0], rest[1:]
        else:
            io_refs = rest
        g = pl.program_id(0)
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

        if hist_nr:
            def seed(k, _):
                for r in range(ways):
                    io_refs[r][pl.ds(k * 8, 8), :] = \
                        hist_ref[pl.ds(r * hist_nr + k * 8, 8), :]
                return 0
            jax.lax.fori_loop(0, hist_nr // 8, seed, 0)

        def read_at(ref, q, ls):
            sq = q % LANES
            x = pltpu.roll(ref[pl.ds(q // LANES, 2), :], ls - sq, axis=1)
            return x[0:1, :], x[1:2, :], sq

        def do_record(io_ref, wire_base, src, off, ll, ml, dst):
            tot = jnp.clip(ll + ml, 0, jnp.minimum(LANES, bs_limit - dst))
            ll = jnp.minimum(ll, tot)
            off = jnp.maximum(off, 1)
            msrc = jnp.maximum(dst + ll - off, 0)
            src = jnp.clip(src, 0, (wire_nr - 2) * LANES)

            s = dst % LANES
            t = (iota - s) & (LANES - 1)
            l0, l1, sql = read_at(wire_ref, wire_base + src, s)
            vl = jnp.where(t < LANES - sql, l0, l1)
            m0, m1, sqm = read_at(io_ref, msrc, (s + ll) % LANES)
            vm = jnp.where(t - ll < LANES - sqm, m0, m1)
            comb = jnp.where(t < ll, vl, vm)

            e = s + tot
            j = dst // LANES
            d0 = io_ref[pl.ds(j, 1), :]
            io_ref[pl.ds(j, 1), :] = jnp.where((iota >= s) & (iota < e),
                                               comb, d0)
            io_ref[pl.ds(j + 1, 1), :] = comb

        def one(r, base, ri):
            w0 = recs_ref[base + 2 * ri]
            w1 = recs_ref[base + 2 * ri + 1]
            src = w0 & 0xFFFF
            ll = (w0 >> 16) & 0xFF
            ml = (w0 >> 24) & 0xFF
            dstr = w1 & 0xFFFF
            off = (w1 >> 16) & 0xFFFF
            dst = jnp.minimum(dstr, out_cap) + out_base
            do_record(io_refs[r], r * wire_nr * LANES, src, off, ll,
                      ml, dst)

        bases = [bases_ref[g * ways + r] for r in range(ways)]

        def body(i, _):
            # way-major order: a way's dependent pair sits ways-1
            # independent records apart in program order
            for p in range(pair):
                for r in range(ways):
                    one(r, bases[r], pair * i + p)
            return 0

        jax.lax.fori_loop(0, trips_ref[g], body, 0)

    return kernel


def plan_ways_compact(wire_bytes: int, io_bytes: int,
                      hist_bytes: int) -> int:
    """Interleave width for the COMPACT wire kernel: VMEM-bound only (the
    resident record stream scales with the dispatch's record total, not
    with ways) — 64 KB blocks always plan ways=8."""
    ways = 8
    while ways > 1 and (ways * (wire_bytes + io_bytes + hist_bytes) * 8
                        > VMEM_BUDGET):
        ways //= 2
    return ways


# Resident compact record stream budget per dispatch (words * 4 bytes).
# SMEM holds it once (no double-buffered windows), alongside trips/bases.
# 512 KB: the bench mix's densest chunk (one 8-way group of ~7.9k-record
# rows = 504 KB) measured 654 MB/s at this residency; 800 KB measured
# SLOWER (SMEM pressure), and the guard in stage_compact shrinks a
# chunk's ways when a single group alone would exceed this (dense 64 KB
# rows at ~15k records would stage ~960 KB at ways=8).
SMEM_COMPACT_WORDS = 128 * 1024  # 512 KB


@functools.partial(jax.jit,
                   static_argnames=("block_size", "use_history", "interpret",
                                    "pair", "ways"))
def decode_blocks_wire_compact(wire: jax.Array, words: jax.Array,
                               bases: jax.Array, trips: jax.Array,
                               block_size: int, use_history: bool = False,
                               hist: jax.Array | None = None,
                               interpret: bool = False,
                               pair: int | None = None,
                               ways: int = 8):
    """Compact-stream wire decode (see _make_wire_kernel_compact).

    Args:
      wire: u8[nb, wire_cap] compressed images in DISPATCH ORDER.
      words: i32[N] flat record stream (2 words/record; rows padded to
        their group's pair-rounded trip bound — build_compact_batch).
      bases: i32[nb] word offset of each row's stream.
      trips: i32[nb / ways] PAIR-DIVIDED record-loop bounds per grid step.
      block_size: static output capacity per block (<= 65536: compact
        streams use the narrow u16 record fields).

    Returns out u8[nb, block_size]."""
    nb, wire_bytes = wire.shape
    # u16 src addressability: entries are <= 64 KB, so every referenced
    # wire byte sits below 0xFFFF (stored records top out at size-128,
    # compressed blocks are < block_size); the cap itself may round a
    # touch past 64 KB (+SLACK alignment).
    assert block_size <= 65536 and \
        wire_bytes <= _round_up(65536 + SLACK, 1024)
    out_base = W if use_history else 0
    io_bytes = _round_up(out_base + block_size + SLACK, 1024)
    io_nr = io_bytes // LANES
    wire_nr = wire_bytes // LANES
    hist_nr = (W // LANES) if use_history else 0
    assert nb % ways == 0, (nb, ways)
    nsteps = nb // ways
    if pair is None:
        # 32 record bodies per iteration measured best for THIS kernel
        # (654.9 vs 623.5 MB/s at 16, 433.3 at 64, same process — the
        # flat-stream reads spend fewer SMEM index ops per body than the
        # padded form, so the register wall sits one doubling later).
        pair = max(1, 32 // ways)

    wire_i = wire.astype(jnp.int32).reshape(nb * wire_nr, LANES)
    in_specs = [
        pl.BlockSpec((ways * wire_nr, LANES), lambda g, t, b, w_: (g, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [wire_i]
    if use_history:
        in_specs.append(
            pl.BlockSpec((ways * hist_nr, LANES),
                         lambda g, t, b, w_: (g, 0),
                         memory_space=pltpu.VMEM))
        args.append(hist.astype(jnp.int32).reshape(nb * hist_nr, LANES))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nsteps,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((io_nr, LANES), lambda g, t, b, w_: (g, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(ways)
        ],
    )
    outs = pl.pallas_call(
        _make_wire_kernel_compact(ways, wire_nr, hist_nr, out_base,
                                  block_size, pair),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nsteps * io_nr, LANES), jnp.int32)
                   for _ in range(ways)],
        interpret=interpret,
    )(trips, bases, words, *args)

    out = jnp.stack([o.reshape(nsteps, io_nr * LANES) for o in outs],
                    axis=1).reshape(nb, io_nr * LANES)
    return out[:, out_base: out_base + block_size].astype(jnp.uint8)


def build_compact_batch(recs_l, counts, order_p, ways, pair,
                        block_size):
    """Build the compact record stream for rows laid out in *order_p*
    (already padded to a ways multiple; padding repeats a low-count row).

    Per group of *ways* rows: trip bound = pair-rounded max count; every
    row's stream is padded to that bound with no-op records (dst = the
    row's summed output length, clamped u16 — their wild second-row
    store lands in the slack past the output), so the kernel's loop
    never reads a foreign row's records. Returns
    (words i32[N], bases i32[len(order_p)], trips i32[nsteps] —
    ALREADY pair-divided)."""
    nsteps = len(order_p) // ways
    dst_cap = min(block_size, 0xFFFF)
    trips = np.empty(nsteps, np.int32)
    bases = np.empty(len(order_p), np.int32)
    chunks = []
    pos = 0
    for g in range(nsteps):
        rows = order_p[g * ways:(g + 1) * ways]
        t = int(counts[rows].max(initial=0))
        tp = -(-max(t, 1) // pair) * pair
        trips[g] = tp // pair
        for k, b in enumerate(rows):
            r = recs_l[b]
            n = len(r)
            w = np.zeros((tp, 2), np.int32)
            if n:
                w1r = r[:, 1].astype(np.int64)
                tot = ((w1r >> 16) & 0xFF) + ((w1r >> 24) & 0xFF)
                dst = np.minimum(np.cumsum(tot) - tot, dst_cap)
                llml = (w1r >> 16) & 0xFFFF
                off = w1r & 0xFFFF
                w[:n, 0] = (r[:, 0].astype(np.int64)
                            | (llml << 16)).astype(np.uint32).view(np.int32)
                w[:n, 1] = (dst | (off << 16)).astype(np.uint32) \
                    .view(np.int32)
                pad_dst = min(int(tot.sum()), dst_cap)
            else:
                pad_dst = 0
            w[n:, 1] = pad_dst
            bases[g * ways + k] = pos
            pos += 2 * tp
            chunks.append(w.reshape(-1))
    words = np.concatenate(chunks) if chunks else np.zeros(2, np.int32)
    return words, bases, trips


def parse_wire_raw(entries, block_size: int, window=None):
    """Parse a batch for the COMPACT dispatch path: per-block raw record
    lists (u32[nrec, 2]), no cap padding. Returns
    (wire u8[nb, wire_cap], recs_l, counts i32[nb], out_lens i64[nb],
    hist u8[nb, W] | None)."""
    nb = len(entries)
    hl = len(window) if window is not None and len(window) else 0
    max_wire = max((len(c) for c, _ in entries), default=1)
    wire_cap = _round_up(max_wire + SLACK, 1024)
    wire = np.zeros((nb, wire_cap), np.uint8)
    counts = np.zeros(nb, np.int32)
    out_lens = np.zeros(nb, np.int64)
    recs_l = []
    for i, (c, stored) in enumerate(entries):
        wire[i, : len(c)] = c
        if stored:
            r, ol = stored_wire_records(len(c)), len(c)
        else:
            r, ol = parse_records_wire(c, block_size, hl)
        recs_l.append(r)
        counts[i] = len(r)
        out_lens[i] = ol
    hist = None
    if hl:
        hist = np.zeros((nb, W), np.uint8)
        hist[:, W - hl:] = window
    return wire, recs_l, counts, out_lens, hist


def _group_words(gmax: int, ways: int, pair: int) -> int:
    """Resident words one interleave group costs: ways rows padded to the
    pair-rounded trip bound, 2 words/record."""
    return 2 * (-(-max(gmax, 1) // pair) * pair) * ways


def stage_compact(wire, recs_l, counts, out_lens, wire_w, block_size,
                  hist=None):
    """Staging half of the compact-stream dispatch: sort blocks by record
    count, chunk the sorted order so each dispatch's resident stream fits
    SMEM_COMPACT_WORDS, pad each chunk's rows to a bucket (low-count row
    repeats — whole no-op groups at the minimal trip count), build the
    per-group padded streams, and move the arrays to device. Returns
    staged = [(sel_p, ways, pair, d_wire, d_words, d_bases, d_trips,
    d_hist | None)] — ways/pair are PER CHUNK: a dense chunk whose single
    8-way group would alone exceed the budget (8 x ~15k records ≈
    960 KB — past the validated envelope and near v5e's SMEM ceiling)
    shrinks its own interleave instead (review find, round 5)."""
    use_history = hist is not None
    io_bytes = _round_up((W if use_history else 0) + block_size + SLACK,
                         1024)
    order = np.argsort(counts, kind="stable")
    ways0 = plan_ways_compact(wire.shape[1], io_bytes,
                              W if use_history else 0)
    staged = []
    i, n = 0, len(order)
    while i < n:
        # Per-chunk interleave: ONE group must fit the resident budget.
        # Sorted order puts the chunk's sparsest rows first, so checking
        # the first group suffices — a later over-budget group simply
        # starts the next chunk, where it is the first group.
        ways = ways0
        pair = max(1, 32 // ways)
        while ways > 1:
            gmax = int(counts[order[i: i + ways]].max(initial=1))
            if _group_words(gmax, ways, pair) <= SMEM_COMPACT_WORDS:
                break
            ways //= 2
            pair = max(1, 32 // ways)
        # chunk the sorted order by the resident-stream budget
        # (pair-rounded per-group padding counted exactly)
        j, w_words = i, 0
        while j < n:
            gmax = int(counts[order[j: j + ways]].max(initial=1))
            g_words = _group_words(gmax, ways, pair)
            if j > i and w_words + g_words > SMEM_COMPACT_WORDS:
                break
            w_words += g_words
            j += ways
        sel = order[i: min(j, n)]
        i = min(j, n)
        # row-count bucket (compile-cache hygiene); pad groups cost
        # real resident words too — fall back to plain ways-multiple
        # padding when the bucket would bust the budget just enforced
        target = _pow2_at_least(max(len(sel), ways), ways) \
            if len(sel) <= 64 else _round_up(len(sel), 64)
        pad_groups = (target - len(sel) + ways - 1) // ways
        pad_words = pad_groups * _group_words(
            int(counts[sel[0]]), ways, pair)
        if w_words + pad_words > SMEM_COMPACT_WORDS:
            target = _round_up(len(sel), ways)
        padn = target - len(sel)
        sel_p = np.concatenate([sel, np.full(padn, sel[0], np.int64)]) \
            if padn else sel
        words, bases, trips = build_compact_batch(
            recs_l, counts, sel_p, ways, pair, block_size)
        # bucket the stream length (compile-cache hygiene; the zero tail
        # is never read — every base+stream stays below it)
        wb = _round_up(len(words), 16384)
        if wb > len(words):
            words = np.pad(words, (0, wb - len(words)))
        wcap = _round_up(int(wire_w[sel].max(initial=0)) + SLACK, 1024)
        staged.append((
            sel_p, ways, pair,
            jnp.asarray(np.ascontiguousarray(wire[sel_p, :wcap])),
            jnp.asarray(words), jnp.asarray(bases), jnp.asarray(trips),
            jnp.asarray(hist[sel_p]) if use_history else None))
    return staged


def dispatch_compact(wire, recs_l, counts, out_lens, wire_w, block_size,
                     interpret, hist=None):
    """Compact-stream batched dispatch (stage_compact + one
    decode_blocks_wire_compact per chunk). Returns [(sel_p, out)]
    (async), outputs in dispatch-row order."""
    staged = stage_compact(wire, recs_l, counts, out_lens, wire_w,
                           block_size, hist)
    use_history = hist is not None
    return [(sel_p,
             decode_blocks_wire_compact(dw, dwd, db, dt, block_size,
                                        use_history, dh, interpret,
                                        pair=pair, ways=ways))
            for sel_p, ways, pair, dw, dwd, db, dt, dh in staged]


def plan_ways_wire(cap: int, rw: float, wire_bytes: int, io_bytes: int,
                   hist_bytes: int) -> int:
    """Interleave width for the wire-direct kernel: the SMEM window holds
    rw words/record (2 narrow, 3 wide), VMEM
    holds wire + io (+ history) per way."""
    ways = 8
    while ways > 1 and (int(ways * cap * rw * 4) > SMEM_BUDGET
                        or ways * (wire_bytes + io_bytes + hist_bytes) * 8
                        > VMEM_BUDGET):
        ways //= 2
    return ways


def _cap_bucket(n: int) -> int:
    """Record-capacity bucket: multiples of 1024 up to 8K, pow2 beyond —
    tighter than pure pow2 (the SMEM window is the ways limiter) while
    keeping the compile cache small."""
    if n <= 8192:
        return max(-(-n // 1024) * 1024, 1024)
    return _pow2_at_least(n, 8192)


@functools.partial(jax.jit,
                   static_argnames=("block_size", "use_history", "interpret",
                                    "pair", "ways"))
def decode_blocks_wire(wire: jax.Array, recs: jax.Array, trips: jax.Array,
                       block_size: int, use_history: bool = False,
                       hist: jax.Array | None = None,
                       interpret: bool = False, pair: int | None = None,
                       ways: int | None = None):
    """Decode pre-parsed blocks straight from their wire bytes (v2 path).

    Args:
      wire: u8[nb, wire_cap] compressed images (zero-padded; wire_cap
        % 1024 == 0, >= max wire + SLACK).
      recs: u16[nb, cap, 3] (narrow) or u32/i32[nb, cap, 2] (wide) compact
        records, zero-padded (cap % 128 == 0).
      trips: i32[nb / ways] per-grid-step record-loop bounds.
      block_size: static output capacity per block.
      hist: u8[nb, 64 KB] history rows (required when use_history).

    Returns out u8[nb, block_size] (lengths come from the host parser)."""
    nb, wire_bytes = wire.shape
    cap = recs.shape[1]
    assert wire_bytes % 1024 == 0 and cap % 128 == 0, (wire_bytes, cap)
    out_base = W if use_history else 0
    io_bytes = _round_up(out_base + block_size + SLACK, 1024)
    io_nr = io_bytes // LANES
    wire_nr = wire_bytes // LANES
    hist_nr = (W // LANES) if use_history else 0

    words, fmt = _expand_wire_records(recs, block_size)
    wpr = 2 if fmt == "n2" else 3  # SMEM words per record
    if ways is None:
        # Standalone planning — ONLY safe when the caller also derived
        # its trips/padding from these exact shapes. Callers that
        # partition by density tier and slice the wire to a per-tier
        # width MUST pass their planned ways explicitly: replanning on
        # the narrowed wire can pick a WIDER interleave than the trips
        # were grouped for, silently misapplying record-loop bounds.
        ways = plan_ways_wire(cap, wpr, wire_bytes, io_bytes,
                              W if use_history else 0)
    assert nb % ways == 0, (nb, ways)
    nsteps = nb // ways

    wpw = cap * wpr  # words per way
    assert wpw % LANES == 0, (cap, fmt)
    words = words.reshape(nb * wpw // LANES, LANES)
    wire_i = wire.astype(jnp.int32).reshape(nb * wire_nr, LANES)
    in_specs = [
        pl.BlockSpec((ways * wpw // LANES, LANES), lambda g, t: (g, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((ways * wire_nr, LANES), lambda g, t: (g, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [wire_i]
    if use_history:
        in_specs.append(
            pl.BlockSpec((ways * hist_nr, LANES), lambda g, t: (g, 0),
                         memory_space=pltpu.VMEM))
        args.append(hist.astype(jnp.int32).reshape(nb * hist_nr, LANES))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((io_nr, LANES), lambda g, t: (g, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(ways)
        ],
    )
    # pair>1: the loop covers ceil(trips/pair) iterations of pair records
    # per way; the overhang reads zero-pad records (no-op writes — cap is
    # always >= max count + 1, _cap_bucket). Default: 16 record bodies
    # per iteration total — measured optimum at the bench shape (456 MB/s
    # vs 323 at pair=1, 349 at 32 bodies: the fori back-edge is a
    # pipeline drain, but 32 inlined bodies hit register pressure).
    if pair is None:
        pair = max(1, 16 // ways)
    # The paired loop's odd-tail overhang reads record indices up to
    # pair*ceil(trips/pair)-1; with trips <= cap-1 this stays inside the
    # way's own cap-record window only when pair divides cap — a
    # non-divisor pair would read the NEXT way's records (executing a
    # foreign record into the wrong output row).
    assert cap % pair == 0, (cap, pair)
    outs = pl.pallas_call(
        _make_wire_kernel(ways, cap, fmt, wire_nr, io_nr, hist_nr, out_base,
                          block_size, pair),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nsteps * io_nr, LANES), jnp.int32)
                   for _ in range(ways)],
        interpret=interpret,
    )((trips + (pair - 1)) // pair, words, *args)

    out = jnp.stack([o.reshape(nsteps, io_nr * LANES) for o in outs],
                    axis=1).reshape(nb, io_nr * LANES)
    return out[:, out_base: out_base + block_size].astype(jnp.uint8)


def parse_wire_batch(entries, block_size: int, window=None):
    """Parse a batch of blocks for ``decode_blocks_wire`` (the PADDED
    per-way-window form — wide blocks and the padded sharded tiers; the
    compact paths use ``parse_wire_raw`` directly and skip the cap
    padding).

    Args:
      entries: list of (wire_bytes u8, stored bool) per block.
      block_size: per-block output capacity.
      window: optional shared history window (u8, <= 64 KB) — the
        dictionary case; every block sees the same window.

    Returns (wire u8[nb, wire_cap], recs (u16[nb,cap,3] | u32[nb,cap,2]),
    counts i32[nb], out_lens i64[nb], hist u8[nb, W] | None).
    """
    wire, recs_l, counts, out_lens, hist = parse_wire_raw(
        entries, block_size, window)
    nb = len(entries)
    wire_cap = wire.shape[1]
    cap = _cap_bucket(max(int(counts.max(initial=0)) + 1, 2))
    narrow = block_size <= 65536 and wire_cap - SLACK <= 65536
    if narrow:
        recs = np.zeros((nb, cap, 3), np.uint16)
        for i, r in enumerate(recs_l):
            if len(r):
                recs[i, : len(r), 0] = r[:, 0]
                recs[i, : len(r), 1] = r[:, 1] & 0xFFFF
                recs[i, : len(r), 2] = r[:, 1] >> 16
    else:
        recs = np.zeros((nb, cap, 2), np.uint32)
        for i, r in enumerate(recs_l):
            if len(r):
                recs[i, : len(r)] = r
        recs = recs.view(np.int32)
    return wire, recs, counts, out_lens, hist


def partition_by_plan(counts: np.ndarray, order: np.ndarray, rw: int,
                      wire_cap: int, io_bytes: int, hist_bytes: int):
    """Split count-sorted blocks into maximal runs sharing an interleave
    plan. The SMEM record window is ways*cap words, so ONE dense block
    (cap 16384) caps the whole batch at ways=2 even when the majority
    would fit ways=8 at cap<=7168; bucketed dispatches let each density
    tier run at its own width (dispatches queue back to back — amortized
    cost is per record, not per call). Returns [(sel, cap, ways)] with
    sel slices of `order`."""
    parts = []
    i, n = 0, len(order)
    while i < n:
        cap = _cap_bucket(int(counts[order[i]]) + 1)
        ways = plan_ways_wire(cap, rw, wire_cap, io_bytes, hist_bytes)
        j = i
        while j < n:
            c2 = _cap_bucket(int(counts[order[j]]) + 1)
            if c2 > cap:
                if plan_ways_wire(c2, rw, wire_cap, io_bytes,
                                  hist_bytes) != ways:
                    break
                cap = c2
            j += 1
        parts.append((order[i:j], cap, ways))
        i = j
    return parts


def dispatch_partitioned(wire: np.ndarray, recs: np.ndarray,
                         counts: np.ndarray, wire_w: np.ndarray,
                         block_size: int, interpret: bool):
    """Density-tier batched dispatch (the ONE shared implementation —
    streaming burst path and bench both use it; the frame path repeats
    the pattern with history/chunking on top): sort blocks by record
    count, partition into same-plan tiers (partition_by_plan), pad each
    tier to its ways, slice recs to the tier cap and wire to the tier's
    own max width, and queue one decode_blocks_wire per tier WITH THE
    PLANNED WAYS (replanning inside on the narrowed wire could pick a
    wider interleave than the trips were grouped for — silent
    corruption, caught by review + regression test).

    Returns [(sel_p, out)] with outputs still on device (async)."""
    rw = 2 if recs.dtype == np.uint16 else 3
    io_bytes = _round_up(block_size + SLACK, 1024)
    order = np.argsort(counts, kind="stable")
    pend = []
    for sel, cap, ways in partition_by_plan(counts, order, rw,
                                            wire.shape[1], io_bytes, 0):
        pad = (-len(sel)) % ways
        sel_p = np.concatenate([sel, np.repeat(sel[-1], pad)]) \
            if pad else sel
        trips = grouped_trips(counts[sel_p], ways)
        # per-tier wire width: the link ships only this tier's max image
        wcap = _round_up(int(wire_w[sel].max(initial=0)) + SLACK, 1024)
        out = decode_blocks_wire(
            jnp.asarray(np.ascontiguousarray(wire[sel_p, :wcap])),
            jnp.asarray(np.ascontiguousarray(recs[sel_p, :cap])),
            jnp.asarray(trips), block_size, False, None, interpret,
            ways=ways)
        pend.append((sel_p, out))
    return pend


def decode_wire_blocks2(comps, block_size: int,
                        interpret: bool | None = None):
    """Decode a list of independent blocks' wire bytes in batched
    wire-direct dispatches. Narrow shapes (<= 64 KB blocks and wire) take
    the round-5 COMPACT-stream path (dispatch_compact); wide shapes keep
    the density-tier padded dispatches (partition_by_plan). Returns
    np.uint8 outputs in input order. The streaming decoder's device burst
    path."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    wire_w = np.array([len(c) for c in comps])
    if block_size <= 65536 and int(wire_w.max(initial=0)) <= 65536:
        wire, recs_l, counts, out_lens, _ = parse_wire_raw(
            [(c, False) for c in comps], block_size)
        pend = dispatch_compact(wire, recs_l, counts, out_lens, wire_w,
                                block_size, interpret)
    else:
        wire, recs, counts, out_lens, _ = parse_wire_batch(
            [(c, False) for c in comps], block_size)
        pend = dispatch_partitioned(wire, recs, counts, wire_w, block_size,
                                    interpret)
    res = [None] * len(comps)
    for sel_p, out in pend:
        out_np = np.asarray(out)
        for k, b in enumerate(sel_p):
            if res[b] is None:
                res[b] = out_np[k][: int(out_lens[b])]
    return res


def grouped_trips(counts: np.ndarray, ways: int) -> np.ndarray:
    """Per-grid-step record-loop bounds for rows ALREADY laid out in
    dispatch order (len(counts) % ways == 0): max count over each
    consecutive group of *ways* rows. Unlike build_sorted_batch this does
    NOT reorder — use it when the caller controls the row order (e.g.
    sorted rows with zero-count padding appended)."""
    nsteps = len(counts) // ways
    return np.array([int(counts[g * ways:(g + 1) * ways].max(initial=0))
                     for g in range(nsteps)], np.int32)


def build_sorted_batch(counts: np.ndarray, ways: int):
    """The production interleave grouping, shared by every batching call
    site (frame path, streaming decoder, bench): blocks sorted by record
    count so groups run similar trip counts, padded to a `ways` multiple
    by repeating the last index, per-group max as the trip bound.
    Returns (order_p, trips)."""
    order = np.argsort(counts, kind="stable")
    pad = (-len(order)) % ways
    order_p = np.concatenate(
        [order, np.full(pad, order[-1] if len(order) else 0, np.int64)]) \
        if pad else order
    nsteps = len(order_p) // ways
    cs = counts[order_p] if len(order_p) else np.zeros(0, np.int32)
    trips = np.array([int(cs[g * ways:(g + 1) * ways].max(initial=0))
                      for g in range(nsteps)], np.int32)
    return order_p, trips


def decode_wire_blocks(comps, block_size: int,
                       interpret: bool | None = None):
    """Decode a list of independent blocks' wire bytes in ONE batched
    kernel dispatch (sorted interleave groups; production grouping).
    Returns a list of np.uint8 outputs, in input order. Used by the
    device-backed streaming decoder and the bench tiers."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    lit, recs, counts, out_lens, uh = parse_block_batch(comps, block_size)
    ways = plan_ways(recs.shape[1], lit.shape[1])
    order_p, trips = build_sorted_batch(counts, ways)
    out = decode_blocks_split(jnp.asarray(lit[order_p]),
                              jnp.asarray(recs[order_p]),
                              jnp.asarray(trips), block_size, uh, interpret)
    out_np = np.asarray(out).astype(np.uint8)
    res = [None] * len(comps)
    for k, b in enumerate(order_p):
        if res[b] is None:
            res[b] = out_np[k][: int(out_lens[b])]
    return res


def decode_block_split_host(comp_bytes: np.ndarray, out_cap: int,
                            history: np.ndarray | None = None,
                            interpret: bool | None = None) -> np.ndarray:
    """Host convenience wrapper (numpy bytes in/out), for tests."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    comp_bytes = np.ascontiguousarray(comp_bytes, dtype=np.uint8)
    hists = [history[-W:] if history is not None and len(history) else None]
    lit, recs, counts, out_lens, use_history = parse_block_batch(
        [comp_bytes], out_cap, hists if hists[0] is not None else None)
    ways = plan_ways(recs.shape[1], lit.shape[1])
    if 1 % ways:
        pad = ways - 1
        lit = np.concatenate([lit, np.zeros((pad,) + lit.shape[1:],
                                            lit.dtype)])
        noop = np.empty((pad,) + recs.shape[1:], np.uint32)
        noop[..., 0] = NOOP_W0
        noop[..., 1] = NOOP_W1
        recs = np.concatenate([recs, noop.view(np.int32)])
    trips = np.array([int(counts.max(initial=0))], np.int32)
    out = decode_blocks_split(jnp.asarray(lit), jnp.asarray(recs),
                              jnp.asarray(trips), out_cap, use_history,
                              interpret)
    return np.asarray(out[0][: int(out_lens[0])]).astype(np.uint8)
