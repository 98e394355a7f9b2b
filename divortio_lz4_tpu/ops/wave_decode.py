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
                      io_nr: int, pair: int = 1):
    """One grid step = one wave. Refs: meta (SMEM prefetch i32[G,3]:
    trips, total, reset), recs (SMEM, 3 words/record), wire (VMEM, the
    wave's compressed image), win (VMEM, init window — dictionary or
    zeros), out (VMEM block per step), io (VMEM scratch, persists across
    steps).

    ``pair``: records per loop iteration — the records are a DEPENDENT
    chain (no interleave), but the fori back-edge is still a pipeline
    drain a longer straight-line body amortizes (same lever as
    pallas_split_decode). The odd-tail overhang reads zero-pad records
    whose cumsum dst = total: masked row writes nothing, wild row lands
    above the window-carry read range (plan_waves caps ensure the reads
    stay in SMEM bounds)."""
    chunk = chunk_nr * LANES
    bs_limit = W + chunk

    def kernel(meta_ref, recs_ref, wire_ref, win_ref, out_ref, io_ref):
        g = pl.program_id(0)
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        trips = meta_ref[g, 0]
        total = meta_ref[g, 1]
        reset = meta_ref[g, 2]

        @pl.when(reset == 1)
        def _():
            def cpy(k, _):
                io_ref[pl.ds(k * 8, 8), :] = win_ref[pl.ds(k * 8, 8), :]
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

        def one(ri):
            w0 = recs_ref[(3 * ri) // LANES, (3 * ri) % LANES]
            w1 = recs_ref[(3 * ri + 1) // LANES, (3 * ri + 1) % LANES]
            w2 = recs_ref[(3 * ri + 2) // LANES, (3 * ri + 2) % LANES]
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
            l0, l1, sql = read_at(wire_ref, src, s)
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
            for p in range(pair):
                one(pair * i + p)
            return 0

        jax.lax.fori_loop(0, (trips + (pair - 1)) // pair, body, 0)

        # Ship the wave's bytes out (Pallas pipelines the block store).
        def outcpy(k, _):
            out_ref[pl.ds(k * 8, 8), :] = \
                io_ref[pl.ds(win_nr + k * 8, 8), :]
            return 0
        jax.lax.fori_loop(0, chunk_nr // 8, outcpy, 0)

        # Window carry: last W bytes of [window | out[:total]] = io bytes
        # [total, total+W) -> [0, W). The forward row copy is safe for ANY
        # total >= 0: destination row k only reads source rows >= k (rows
        # already written this loop are never read), so short waves
        # (total < W) blend the old window tail with the new bytes —
        # exactly the window a continuous decoder would carry.
        def ccpy(k, _):
            q = total + k * LANES
            sq = q % LANES
            x = pltpu.roll(io_ref[pl.ds(q // LANES, 2), :], -sq, axis=1)
            io_ref[pl.ds(k, 1), :] = jnp.where(iota < LANES - sq,
                                               x[0:1, :], x[1:2, :])
            return 0
        jax.lax.fori_loop(0, win_nr, ccpy, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "pair"))
def decode_chain_waves(wire: jax.Array, recs: jax.Array, meta: jax.Array,
                       init_win: jax.Array, interpret: bool = False,
                       pair: int = 4):
    """Run the wave kernel over a planned frame.

    Args:
      wire: u8[G, wire_cap] per-wave compressed images (wire_cap % 1024
        == 0, >= max wave wire + SLACK).
      recs: u32/i32[G, cap, 2] compact wide records (src, off|ll<<16|
        ml<<24), zero-padded; cap % 128 == 0.
      meta: i32[G, 3] — (record count, wave output bytes, window reset).
      init_win: u8[W] dictionary window (right-aligned) or zeros.

    Returns u8[G, WAVE_CHUNK] (the caller slices each wave by its total).
    """
    G, wire_bytes = wire.shape
    cap = recs.shape[1]
    chunk = WAVE_CHUNK
    chunk_nr = chunk // LANES
    win_nr = W // LANES
    io_nr = _round_up(W + chunk + SLACK, 1024) // LANES  # sublanes % 8
    wire_nr = wire_bytes // LANES

    words, fmt = _expand_wire_records(recs, chunk)
    assert fmt == "w3"  # wave records are the wide u32 form
    words = words.reshape(G * cap * 3 // LANES, LANES)
    wire_i = wire.astype(jnp.int32).reshape(G * wire_nr, LANES)
    win_i = init_win.astype(jnp.int32).reshape(win_nr, LANES)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((cap * 3 // LANES, LANES), lambda g, m: (g, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((wire_nr, LANES), lambda g, m: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((win_nr, LANES), lambda g, m: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((chunk_nr, LANES), lambda g, m: (g, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.VMEM((io_nr, LANES), jnp.int32)],
    )
    out, = pl.pallas_call(
        _make_wave_kernel(cap, wire_nr, win_nr, chunk_nr, io_nr, pair),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((G * chunk_nr, LANES), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(meta, words, wire_i, win_i)
    return out.reshape(G, chunk).astype(jnp.uint8)


# Per-wave record ceiling: the SMEM window is cap*12 bytes double-buffered;
# 24576 keeps it under ~600 KB. Pathological streams (~3-byte sequences
# throughout a 256 KB wave) exceed it and fall back to the XLA kernels.
MAX_WAVE_RECS = 24576


def plan_waves(buf: np.ndarray, plan, independent: bool, dict_len: int):
    """Group pieces into <= WAVE_CHUNK-output waves and parse their v2
    records.

    Independent frames group per block, with a window reset at each
    block's first wave. Linked frames flatten EVERY block's pieces into
    one chain (a block's short final piece must share its wave window
    with the next block's pieces — no resets mid-frame).

    Args:
      buf: the frame buffer (wire offsets in *plan* are absolute).
      plan: per-block piece lists [(abs_off, wire_len, out_len, stored)]
        from bigblock._plan_pieces.
      independent: whether the window resets at each block start.
      dict_len: available dictionary bytes (offset validation).

    Returns (wire u8[G, wire_cap], recs u32[G, cap, 2] compact wide,
    meta i32[G, 3], totals int64[G]), or None when a wave's records
    overflow MAX_WAVE_RECS (pathological streams — caller falls back).
    """
    chains = plan if independent else [
        [pc for pieces in plan for pc in pieces]]
    # Single pass: parse each piece's records, then group pieces into
    # waves bounded by BOTH the output chunk AND the record budget —
    # grouping by output size alone left a silent XLA fallback whenever a
    # dense (small-sequence) corpus pushed a 256 KB wave past
    # MAX_WAVE_RECS (the canonical bench corpus sits at 97% of it). A
    # piece's available history (dict + all preceding chain output) is the
    # same on either side of a wave split, so records parse before the
    # split decision with the same validation bound.
    recs_l, wires_l, metas = [], [], []
    for pieces in chains:
        first = True
        hist_avail = dict_len
        parts, rparts = [], []
        tot = nrec = wbase = 0

        def flush(reset, parts=None, rparts=None, tot=0):
            recs_w = (np.concatenate(rparts) if rparts
                      else np.empty((0, 2), np.uint32))
            wires_l.append(np.concatenate(parts) if parts
                           else np.empty(0, np.uint8))
            recs_l.append(recs_w)
            metas.append((len(recs_w), tot, 1 if reset else 0))

        for off, wl, ol, stored in pieces:
            pw = buf[off: off + wl]
            if stored:
                r = stored_wire_records(wl)
            else:
                r, got = parse_records_wire(pw, ol, hist_avail + tot)
                if got != ol:
                    raise ValueError("LZ4: Malformed Input")
            if parts and (tot + ol > WAVE_CHUNK
                          or nrec + len(r) >= MAX_WAVE_RECS):
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
    if not metas:
        metas.append((0, 0, 1))
        wires_l.append(np.empty(0, np.uint8))
        recs_l.append(np.empty((0, 2), np.uint32))
    G = len(metas)

    max_recs = max((len(r) for r in recs_l), default=1)
    if max_recs >= MAX_WAVE_RECS:
        return None  # a LONE piece over budget (pathological ~3 B seqs)
    max_wire = max((len(w) for w in wires_l), default=1)
    wire_cap = _round_up(max_wire + SLACK, 1024)
    # +8: the paired-record loop's odd-tail overhang may read up to
    # pair-1 records past the count (decode_chain_waves pair <= 8)
    cap = _round_up(max_recs + 8, 2048)
    wire = np.zeros((G, wire_cap), np.uint8)
    recs = np.zeros((G, cap, 2), np.uint32)
    for g in range(G):
        wire[g, : len(wires_l[g])] = wires_l[g]
        if len(recs_l[g]):
            recs[g, : len(recs_l[g])] = recs_l[g]
    meta = np.array(metas, np.int32).reshape(G, 3)
    totals = meta[:, 1].astype(np.int64)
    return wire, recs.view(np.int32), meta, totals


def decompress_frame_waves(buf: np.ndarray, blocks, header, window,
                           interpret: bool | None = None):
    """Decode a big-block (or linked) frame body with ONE wave-kernel
    dispatch. *blocks*/*header* from parse_block_index. Returns the
    plaintext, or None when a piece exceeds the wave capacity (giant RLE
    — caller falls back to the XLA kernels)."""
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
    wire, recs, meta, totals = planned
    win = np.zeros(W, np.uint8)
    if dict_len:
        win[W - min(dict_len, W):] = window[-W:]
    out = decode_chain_waves(jnp.asarray(wire), jnp.asarray(recs),
                             jnp.asarray(meta), jnp.asarray(win), interpret)
    out_np = np.asarray(out)
    if not len(totals):
        return np.empty(0, np.uint8)
    return np.concatenate([out_np[g][: int(totals[g])]
                           for g in range(len(totals))])
