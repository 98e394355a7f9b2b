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
# (double-buffered by the grid pipeline); VMEM holds the lit window + the
# ways' io blocks. Same reasoning as ops/pallas_decode.py's budgets.
SMEM_BUDGET = 384 * 1024
VMEM_BUDGET = 6 * 1024 * 1024


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


@functools.partial(jax.jit, static_argnames=("chunk_cap", "interpret"))
def decode_chain_chunk_split(lit_tail: jax.Array, recs: jax.Array,
                             trips: jax.Array, window: jax.Array,
                             total: jax.Array, chunk_cap: int,
                             interpret: bool = False):
    """Decode one CHUNK of a dependent piece chain with the split kernel.

    The chain layout trick of ops/pallas_decode.decode_linked_chunk_pallas
    applied to the split path: the io region is [64 KB window | outputs],
    so cross-piece (and dictionary) back-references are plain offsets; the
    carried window stays a DEVICE array between chunk calls (no host round
    trip). Records' dst are chunk-output-relative (the host parser adds
    piece bases); out_base = W rides the kernel's use_history path.

    Args:
      lit_tail: u8[io_bytes - W] placed-literal image of the chunk's
        outputs (stored pieces = their wire bytes), io_bytes =
        round_up(W + chunk_cap + SLACK, 1024).
      recs: i32[1, cap, 2] concatenated records (NOOP-padded).
      trips: i32[1] record count.
      window: u8[W] carried history.
      total: i32 scalar — the chunk's total decoded bytes (host-known).
      chunk_cap: static output capacity.

    Returns (out u8[chunk_cap], win_next u8[W]).
    """
    lit = jnp.concatenate([window, lit_tail])[None]
    # nb=1 must satisfy decode_blocks_split's interleave-width contract —
    # pad rows to `ways` with no-op blocks rather than relying on the
    # SMEM/VMEM budget constants happening to force ways == 1.
    ways = plan_ways(recs.shape[1], lit.shape[1])
    if ways > 1:
        lit = jnp.concatenate(
            [lit, jnp.zeros((ways - 1,) + lit.shape[1:], lit.dtype)])
        noop = jnp.full((ways - 1,) + recs.shape[1:], NOOP_W0, recs.dtype)
        recs = jnp.concatenate([recs, noop])
    out = decode_blocks_split(lit, recs, trips, chunk_cap, True, interpret)
    flat = jnp.concatenate([window.astype(jnp.int32),
                            out[0]]).astype(jnp.uint8)
    win_next = jax.lax.dynamic_slice(flat, (total,), (W,))
    return out[0].astype(jnp.uint8), win_next


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
