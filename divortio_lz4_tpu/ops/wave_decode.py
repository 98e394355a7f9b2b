"""Chain-wave decode: ONE kernel dispatch for a whole big-block frame.

The reference's DEFAULT config is 4 MB blocks
(/root/reference/src/buffer/bufferCompress.js:100). Round 3 decoded those as
dependent piece chains with one dispatch per 256 KB chunk — and on the
tunneled dev link every dispatch pays ~30-70 ms of relay latency, so the
path measured 4.1 MB/s (BENCH_r03 device_bigblock_dec, dispatch-bound).

This module collapses the chain into ONE pallas_call:

- The host splits every block's sequence stream into pieces of >= 64 KB
  output (bigblock.scan_pieces) and groups consecutive pieces into WAVES of
  <= 256 KB output. The kernel's grid runs one wave per step (grid steps
  are sequential on a TPU core; dimension_semantics=("arbitrary",) pins it).
- A VMEM SCRATCH buffer [64 KB window | 256 KB out | slack] persists across
  grid steps: the window carries on-chip between waves with zero host round
  trips. Independent blocks re-seed the window from the dictionary rows at
  each block's first wave (spec window-reset semantics); linked frames seed
  once and chain straight through.
- Records are the round-4 wire-direct v2 contract (ops/pallas_split_decode:
  one record per sequence — literal slice from the wave's wire image +
  match copy; dst derived by cumsum; wild row j+1 stores). Cross-piece and
  cross-wave back-references are plain offsets into [window | out].
- Each wave's finished bytes copy from scratch to that grid step's output
  block, which Pallas pipelines out while the next wave decodes.

Every wave except a block's last outputs >= 64 KB (the piece target), so
the window carry is a disjoint [total, total+W) -> [0, W) copy; block-final
waves skip the carry (the next wave re-seeds or the frame ends).

Reference semantics: blockDecompress.js:61-268; window rules :145-154.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import WINDOW_SIZE
from .pallas_split_decode import (
    LANES,
    SLACK,
    _expand_wire_records,
    _round_up,
    parse_records_wire,
    stored_wire_records,
)

W = WINDOW_SIZE

# Wave output capacity: must cover the largest piece (bigblock.PIECE_CAP).
WAVE_CHUNK = 262144


def _make_wave_kernel(cap: int, wire_nr: int, win_nr: int, chunk_nr: int,
                      io_nr: int, pair: int = 1, ways: int = 1):
    """One grid step = one wave PER WAY. Refs: meta (SMEM prefetch
    i32[G, ways*3]: per-way trips/total/reset), recs (SMEM, 3
    words/record, per-way windows), wire (VMEM, per-way compressed
    images), win (VMEM, shared init window — dictionary or zeros),
    ways x out (VMEM block per step), ways x io (VMEM scratch, persists
    across steps).

    ``ways``: independent block-CHAINS interleaved in one kernel (the
    wire kernel's lever applied to the wave path — a 25 MB frame at the
    reference-default 4 MB blocks is 6+ independent chains that would
    otherwise serialize through one scratch window). Within a way the
    records stay a dependent chain; across ways they interleave in the
    record loop.

    ``pair``: records per way per loop iteration — the fori back-edge is
    a pipeline drain a longer straight-line body amortizes (same lever
    as pallas_split_decode). Odd-tail/short-way overhang reads zero-pad
    records whose cumsum dst = the way's total: masked row writes
    nothing, wild row lands above the window-carry read range
    (plan_waves caps ensure the reads stay in SMEM bounds)."""
    chunk = chunk_nr * LANES
    bs_limit = W + chunk

    def kernel(meta_ref, recs_ref, wire_ref, win_ref, *rest):
        out_refs, io_refs = rest[:ways], rest[ways:]
        g = pl.program_id(0)
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

        for r in range(ways):
            reset = meta_ref[g, 3 * r + 2]

            @pl.when(reset == 1)
            def _(r=r):
                def cpy(k, _):
                    io_refs[r][pl.ds(k * 8, 8), :] = \
                        win_ref[pl.ds(k * 8, 8), :]
                    return 0
                jax.lax.fori_loop(0, win_nr // 8, cpy, 0)

        def read_at(ref, q, ls):
            """Two rows of *ref* rolled so byte q+t sits at lane
            (ls+t)%128 — ONE (2,128) slice + ONE roll (both rows shift by
            the same amount; the (1,128) views are free). Same trim as
            pallas_split_decode.read_at."""
            sq = q % LANES
            x = pltpu.roll(ref[pl.ds(q // LANES, 2), :], ls - sq, axis=1)
            return x[0:1, :], x[1:2, :], sq

        def one(r, ri):
            base = r * cap * 3
            w0 = recs_ref[(base + 3 * ri) // LANES,
                          (base + 3 * ri) % LANES]
            w1 = recs_ref[(base + 3 * ri + 1) // LANES,
                          (base + 3 * ri + 1) % LANES]
            w2 = recs_ref[(base + 3 * ri + 2) // LANES,
                          (base + 3 * ri + 2) % LANES]
            io_ref = io_refs[r]
            src = w0
            off = w1 & 0xFFFF
            ll = (w1 >> 16) & 0xFF
            ml = (w1 >> 24) & 0xFF
            dst = jnp.minimum(w2, chunk) + W
            tot = jnp.clip(ll + ml, 0, jnp.minimum(LANES, bs_limit - dst))
            ll_c = jnp.minimum(ll, tot)
            off = jnp.maximum(off, 1)
            msrc = jnp.maximum(dst + ll_c - off, 0)
            src = jnp.clip(src, 0, (wire_nr - 2) * LANES)

            s = dst % LANES
            t = (iota - s) & (LANES - 1)
            # Scalar-boundary row-crossing selects; vm's t-ll skips the
            # &127 (lanes with t < ll take vl — dead value either way).
            l0, l1, sql = read_at(wire_ref, r * wire_nr * LANES + src, s)
            vl = jnp.where(t < LANES - sql, l0, l1)
            m0, m1, sqm = read_at(io_ref, msrc, (s + ll_c) % LANES)
            vm = jnp.where(t - ll_c < LANES - sqm, m0, m1)
            comb = jnp.where(t < ll_c, vl, vm)

            e = s + tot
            j = dst // LANES
            d0 = io_ref[pl.ds(j, 1), :]
            io_ref[pl.ds(j, 1), :] = jnp.where((iota >= s) & (iota < e),
                                               comb, d0)
            io_ref[pl.ds(j + 1, 1), :] = comb

        def body(i, _):
            # way-major order: a way's dependent pair sits ways-1
            # independent records apart in program order
            for p in range(pair):
                for r in range(ways):
                    one(r, pair * i + p)
            return 0

        max_trips = meta_ref[g, 0]
        for r in range(1, ways):
            max_trips = jnp.maximum(max_trips, meta_ref[g, 3 * r])
        jax.lax.fori_loop(0, (max_trips + (pair - 1)) // pair, body, 0)

        for r in range(ways):
            # Ship the wave's bytes out (Pallas pipelines the block
            # store).
            def outcpy(k, _, r=r):
                out_refs[r][pl.ds(k * 8, 8), :] = \
                    io_refs[r][pl.ds(win_nr + k * 8, 8), :]
                return 0
            jax.lax.fori_loop(0, chunk_nr // 8, outcpy, 0)

            # Window carry: last W bytes of [window | out[:total]] = io
            # bytes [total, total+W) -> [0, W). The forward row copy is
            # safe for ANY total >= 0: destination row k only reads
            # source rows >= k (rows already written this loop are never
            # read), so short waves (total < W) blend the old window tail
            # with the new bytes — exactly the window a continuous
            # decoder would carry.
            total = meta_ref[g, 3 * r + 1]

            def ccpy(k, _, r=r, total=total):
                q = total + k * LANES
                sq = q % LANES
                x = pltpu.roll(io_refs[r][pl.ds(q // LANES, 2), :], -sq,
                               axis=1)
                io_refs[r][pl.ds(k, 1), :] = jnp.where(
                    iota < LANES - sq, x[0:1, :], x[1:2, :])
                return 0
            jax.lax.fori_loop(0, win_nr, ccpy, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "pair", "chunk"))
def decode_chain_waves(wire: jax.Array, recs: jax.Array, meta: jax.Array,
                       init_win: jax.Array, interpret: bool = False,
                       pair: int = 8, chunk: int = WAVE_CHUNK):
    """Run the wave kernel over a planned frame.

    Args:
      wire: u8[G*ways, wire_cap] per-(step, way) compressed images, row
        g*ways + w (wire_cap % 1024 == 0, >= max wave wire + SLACK).
      recs: u32/i32[G*ways, cap, 2] compact wide records (src, off|
        ll<<16|ml<<24), zero-padded; cap % 128 == 0.
      meta: i32[G, ways, 3] — per way (record count, wave output bytes,
        window reset).
      init_win: u8[W] dictionary window (right-aligned) or zeros.
      chunk: static wave output capacity (ways=1 uses WAVE_CHUNK; wider
        interleaves shrink it to fit VMEM — plan_waves decides).

    Returns u8[ways, G, chunk] (the caller slices each wave by its
    total)."""
    G, ways = meta.shape[0], meta.shape[1]
    wire_bytes = wire.shape[1]
    cap = recs.shape[1]
    chunk_nr = chunk // LANES
    win_nr = W // LANES
    io_nr = _round_up(W + chunk + SLACK, 1024) // LANES  # sublanes % 8
    wire_nr = wire_bytes // LANES

    words, fmt = _expand_wire_records(recs, chunk)
    assert fmt == "w3"  # wave records are the wide u32 form
    # Paired-loop overhang reads up to pair-1 records past the count;
    # pair must divide cap or the tail read crosses into the next way's
    # record window (see decode_blocks_wire).
    assert cap % pair == 0, (cap, pair)
    words = words.reshape(G * ways * cap * 3 // LANES, LANES)
    wire_i = wire.astype(jnp.int32).reshape(G * ways * wire_nr, LANES)
    win_i = init_win.astype(jnp.int32).reshape(win_nr, LANES)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((ways * cap * 3 // LANES, LANES),
                         lambda g, m: (g, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((ways * wire_nr, LANES), lambda g, m: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((win_nr, LANES), lambda g, m: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((chunk_nr, LANES), lambda g, m: (g, 0),
                                memory_space=pltpu.VMEM)
                   for _ in range(ways)],
        scratch_shapes=[pltpu.VMEM((io_nr, LANES), jnp.int32)
                        for _ in range(ways)],
    )
    outs = pl.pallas_call(
        _make_wave_kernel(cap, wire_nr, win_nr, chunk_nr, io_nr, pair,
                          ways),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((G * chunk_nr, LANES), jnp.int32)
                   for _ in range(ways)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(meta.reshape(G, ways * 3), words, wire_i, win_i)
    return jnp.stack([o.reshape(G, chunk) for o in outs]).astype(jnp.uint8)


# Per-wave record ceiling: the SMEM window is cap*12 bytes double-buffered;
# 24576 keeps it under ~600 KB. Pathological streams (~3-byte sequences
# throughout a 256 KB wave) exceed it and fall back to the XLA kernels.
MAX_WAVE_RECS = 24576


# Per-ways wave budgets: output chunk + record cap per wave. SMEM holds
# ways*cap*12 B (double-buffered 2x; all rows <= 448 KB single like the
# wire kernel); VMEM holds ways x (wire + out at 8x bytes for i32
# widening x pipeline double-buffer, io scratch at 4x — not pipelined).
WAVE_CHUNK_BY_WAYS = {1: 262144, 2: 196608, 4: 131072}
WAVE_RECS_BY_WAYS = {1: MAX_WAVE_RECS, 2: 16200, 4: 7950}
WAVE_VMEM_BUDGET = 12 * 1024 * 1024


def _build_chain_waves(buf: np.ndarray, pieces, dict_len: int,
                       rec_budget: int, chunk: int):
    """Group ONE chain's pieces into <= chunk-output waves and parse
    their v2 records. Returns [(wire u8, recs u32[n,2], total, reset)]
    or None when a LONE piece overflows rec_budget (caller retries at a
    wider budget / falls back). A piece's available history (dict + all
    preceding chain output) is the same on either side of a wave split,
    so records parse before the split decision with the same validation
    bound."""
    waves = []
    first = True
    hist_avail = dict_len
    parts, rparts = [], []
    tot = nrec = wbase = 0

    # Stored pieces are whole blocks (no sequence boundaries to split at)
    # but they're pure literal copies — split them at the chunk grain. A
    # CODED piece wider than the chunk can't be split here: fail to the
    # wider-chunk tier.
    expanded = []
    for off, wl, ol, stored in pieces:
        if stored and ol > chunk:
            for k in range(0, ol, chunk):
                ln = min(chunk, ol - k)
                expanded.append((off + k, ln, ln, True))
        elif not stored and ol > chunk:
            return None
        else:
            expanded.append((off, wl, ol, stored))
    pieces = expanded

    def flush(reset, parts, rparts, tot):
        recs_w = (np.concatenate(rparts) if rparts
                  else np.empty((0, 2), np.uint32))
        waves.append((np.concatenate(parts) if parts
                      else np.empty(0, np.uint8), recs_w, tot,
                      1 if reset else 0))

    for off, wl, ol, stored in pieces:
        pw = buf[off: off + wl]
        if stored:
            r = stored_wire_records(wl)
        else:
            r, got = parse_records_wire(pw, ol, hist_avail + tot)
            if got != ol:
                raise ValueError("LZ4: Malformed Input")
        if len(r) >= rec_budget:
            return None  # lone piece over budget
        if parts and (tot + ol > chunk or nrec + len(r) >= rec_budget):
            flush(first, parts, rparts, tot)
            first = False
            hist_avail = min(W, hist_avail + tot)
            parts, rparts = [], []
            tot = nrec = wbase = 0
        if len(r):
            r = r.copy()
            r[:, 0] += wbase
        parts.append(pw)
        rparts.append(r)
        wbase += wl
        tot += ol
        nrec += len(r)
    if parts or first:
        flush(first, parts, rparts, tot)
    return waves


def plan_waves(buf: np.ndarray, plan, independent: bool, dict_len: int,
               max_ways: int = 1):
    """Plan a frame's wave decode: per-chain wave lists (window reset at
    each chain's first wave), chains interleaved across WAYS (independent
    frames only — a linked frame is one chain). One dense chain can't be
    split, so the ways tier is chosen so every wave fits its record
    budget; failing even ways=1 returns None (pathological ~3 B
    sequences — caller falls back to the XLA kernels).

    max_ways DEFAULTS TO 1 (measured, 16 MB x 4 MB-block mixed corpus,
    v5e): ways=2 ran 110.7 MB/s vs serial 135.4 — the record loop runs
    to the per-step MAX trips, so interleaving chains of dissimilar
    density burns the gap as full-cost no-op pad records, and the
    narrower per-ways chunk adds steps (more carry/outcpy overhead). A
    pl.when guard that skips exhausted ways measured worse still
    (100.4 — predicated regions break the cross-way pipeline). The
    interleave only pays when the paired chains' per-wave record
    profiles align; pass max_ways explicitly to opt in.

    Args:
      buf: the frame buffer (wire offsets in *plan* are absolute).
      plan: per-block piece lists [(abs_off, wire_len, out_len, stored)]
        from bigblock._plan_pieces.
      independent: whether the window resets at each block start.
      dict_len: available dictionary bytes (offset validation).

    Returns (wire u8[G*ways, wire_cap], recs u32[G*ways, cap, 2], meta
    i32[G, ways, 3], totals i64[G, ways], assign [(way, g0, nwaves)] per
    chain in original order, chunk) or None."""
    chains = plan if independent else [
        [pc for pieces in plan for pc in pieces]]
    nch = max(1, len(chains))

    w0 = 1
    if nch >= 2 and max_ways >= 2:
        w0 = 2
    if nch >= 4 and max_ways >= 4:
        w0 = 4
    for ways in sorted({w0, min(2, w0), 1}, reverse=True):
        chunk = WAVE_CHUNK_BY_WAYS[ways]
        budget = WAVE_RECS_BY_WAYS[ways]
        per_chain = []
        ok = True
        for pieces in chains:
            wv = _build_chain_waves(buf, pieces, dict_len, budget, chunk)
            if wv is None:
                ok = False
                break
            per_chain.append(wv)
        if not ok:
            continue
        if not per_chain:
            per_chain = [[(np.empty(0, np.uint8),
                           np.empty((0, 2), np.uint32), 0, 1)]]

        max_wire = max((len(w[0]) for wv in per_chain for w in wv),
                       default=1)
        wire_cap = _round_up(max_wire + SLACK, 1024)
        io_bytes = _round_up(W + chunk + SLACK, 1024)
        if ways > 1 and ways * ((wire_cap + chunk) * 8 + io_bytes * 4) \
                > WAVE_VMEM_BUDGET:
            continue

        # least-loaded way assignment, chains in original order
        loads = [0] * ways
        assign = []
        for wv in per_chain:
            w = loads.index(min(loads))
            assign.append((w, loads[w], len(wv)))
            loads[w] += len(wv)
        G = max(max(loads), 1)

        max_recs = max((len(w[1]) for wv in per_chain for w in wv),
                       default=1)
        # +8: the paired-record loop's odd-tail overhang may read up to
        # pair-1 records past the count (decode_chain_waves pair <= 8)
        cap = _round_up(max_recs + 8, 2048)
        wire = np.zeros((G * ways, wire_cap), np.uint8)
        recs = np.zeros((G * ways, cap, 2), np.uint32)
        meta = np.zeros((G, ways, 3), np.int32)
        for ci, wv in enumerate(per_chain):
            w, g0, _n = assign[ci]
            for k, (pw, r, tot, reset) in enumerate(wv):
                g = g0 + k
                row = g * ways + w
                wire[row, : len(pw)] = pw
                if len(r):
                    recs[row, : len(r)] = r
                meta[g, w] = (len(r), tot, reset)
        totals = meta[:, :, 1].astype(np.int64)
        return wire, recs.view(np.int32), meta, totals, assign, chunk
    return None


def decompress_frame_waves(buf: np.ndarray, blocks, header, window,
                           interpret: bool | None = None,
                           defer: bool = False):
    """Decode a big-block (or linked) frame body with ONE wave-kernel
    dispatch. *blocks*/*header* from parse_block_index. Returns the
    plaintext, or None when a piece exceeds the wave capacity (giant RLE
    — caller falls back to the XLA kernels).

    defer=True returns (out_device_array, totals, assign) with the kernel
    QUEUED but not synced — the multi-frame path
    (parallel/device.py device_decompress_frames) queues every frame's
    wave kernel before one stacked fetch, then assembles with
    ``waves_assemble``."""
    from ..parallel.bigblock import _plan_pieces

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    plan = _plan_pieces(buf, blocks, header["block_max"])
    if plan is None:
        return None
    dict_len = len(window) if window is not None else 0
    planned = plan_waves(buf, plan, header["independent"], dict_len)
    if planned is None:
        return None
    wire, recs, meta, totals, assign, chunk = planned
    win = np.zeros(W, np.uint8)
    if dict_len:
        win[W - min(dict_len, W):] = window[-W:]
    out = decode_chain_waves(jnp.asarray(wire), jnp.asarray(recs),
                             jnp.asarray(meta), jnp.asarray(win),
                             interpret, chunk=chunk)
    if defer:
        return (out, totals, assign)
    return waves_assemble(np.asarray(out), totals, assign)


def waves_assemble(out_np: np.ndarray, totals, assign) -> np.ndarray:
    """Splice a fetched wave-kernel output back into plaintext order."""
    parts = []
    for way, g0, n in assign:  # chains in original (block) order
        for k in range(n):
            parts.append(out_np[way, g0 + k][: int(totals[g0 + k, way])])
    return (np.concatenate(parts) if parts else np.empty(0, np.uint8))
