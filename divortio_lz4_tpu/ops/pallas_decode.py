"""Pallas TPU decode kernel — scalar-driven interpreter, lane-aligned vectors.

The XLA two-phase decode (decode_xla.py) is fully data-parallel but pays
~35 general-gather passes at TPU's scalar gather rate. This kernel takes the
opposite mapping, shaped by what Mosaic actually allows: the scalar unit
walks the sequence stream like a CPU decoder
(/root/reference/src/block/blockDecompress.js:55-272), and all data movement
is 128-lane vectors. Mosaic requires every VMEM access to be lane-aligned,
so byte addressing is built from aligned row loads + dynamic lane rotations:

  read128(q)  = select(roll(row[q/128], s), roll(row[q/128+1], s)), s = q%128
  write128(q) = read-modify-write of the two spanning rows with lane masks
  readbyte(q) = roll(row, s)[0]

Copy strategy per match offset:
  offset >= 128 : straight read128/write128 chunks;
  1 < offset<128: chunk 0 writes a PERIODIZED vector (log-step in-register
                  doubling of the first `offset` lanes); later chunks read
                  at dst - m*offset (m chosen so the source is fully
                  written and >= match start) — exact LZ4 overlap
                  propagation with no scalar copies;
  offset == 1   : broadcast fill.

Layout: each block's output row is [64K history | B output | slack] so
linked-block/dictionary references are plain negative offsets (no special
cases); wild chunk copies spill into slack and are overwritten, the
reference's own double-copy idea (blockDecompress.js:77-110) at vector width.

Bytes travel widened to int32 lanes. Valid-input contract as decode_xla
(verify untrusted frames via checksums on host first); hostile input is
additionally write-bound clamped (see seq_body) so garbage can never leave
the block's io region.

SMEM stream variant (round 2, the 5x): every sequence-stream byte read
(token, 0xFF-run lengths, offset) used to be a one-lane extract from a
VMEM vector — a vreg->sreg transfer costing tens of cycles each, 6-8 per
sequence, which dominated the 16 MB/s round-1 figure. The kernel now takes
the compressed bytes TWICE: once in VMEM (vector literal copies) and once
in SMEM (scalar parse loads) — the parse path becomes plain scalar memory
reads while bulk data movement stays 128-lane. The double fetch costs one
extra HBM read of the (compressed, small) stream.

The SMEM copy is PACKED 4 bytes per i32 word (scalar shift+mask on read):
SMEM is ~1 MB/core and the pipeline double-buffers input windows, so the
unpacked one-byte-per-word form blew the space at production comp widths
(observed: 512 KB window x 2 buffering levels = OOM at M=32 KB, rows=4).
Packing buys 4x, keeping 8 rows/step resident at any 64 KB-block width.
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
SLACK = 256          # wild-copy spill rows (2 x 128)
LANES = 128

_IOTA = None  # built inside the kernel (TPU needs 2D iota)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _vmem_helpers(iota, comp_ref, comp_s_ref):
    """Byte-addressed primitives over lane-aligned VMEM (+ packed SMEM
    parse loads). Shared by the batched and linked decode kernels."""

    def rrow(ref, base_row, q):
        """Aligned (1,128) row containing byte q (row base + q//128)."""
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

    def readbyte(ref, base_row, q):
        s = q % LANES
        return pltpu.roll(rrow(ref, base_row, q), -s, axis=1)[0, 0]

    if comp_s_ref is not None:
        # Sequence-stream byte read = one scalar SMEM load plus a
        # shift/mask unpack (the round-1 version paid a vreg->sreg lane
        # extract here, ~10x costlier). base_row is the VMEM row base
        # (r*comp_nr); the packed base is base_row//4 = r*pk_nr.
        def streambyte(base_row, q):
            wd = comp_s_ref[base_row // 4 + q // (4 * LANES),
                            (q // 4) % LANES]
            return (wd >> ((q % 4) * 8)) & 0xFF
    else:
        def streambyte(base_row, q):
            return readbyte(comp_ref, base_row, q)

    return read128, write128, readbyte, streambyte


def _interpret_block(iota, io_ref, io_base, comp_ref, comp_base, comp_len,
                     o_start, o_limit, helpers):
    """Run the LZ4 sequence interpreter for one block
    (blockDecompress.js:55-272 semantics) writing into io_ref starting at
    byte o_start; returns the final output cursor.

    The body is STRAIGHT-LINE predicated code — no lax.cond/lax.switch per
    sequence (measured perf-neutral vs the branched round-2 form — Mosaic
    branches were NOT the bottleneck — but the flat form is the base the
    ablation harness and the copy-path work build on):
      * 0xFF-run length extensions are zero-trip while loops (the run
        flag initializes false unless the nibble is 15);
      * the match parse runs unconditionally — rows carry >= SLACK zero
        padding past comp_len, so the trailing-literals sequence reads
        zeros and its match clamps to mlen=0 / p restored;
      * far / near / RLE match copies unify into ONE periodize-then-copy
        path: chunk 0 periodizes the first `offset` lanes by in-register
        doubling (zero grow iterations when offset >= 128 — identity),
        chunks k>=1 read at dst - m*offset, m = floor((dst-cs)/offset),
        which is exact LZ4 overlap propagation for EVERY offset >= 1.
    Chunk-0 writes are wild (they land beyond the final frontier when
    mlen == 0 and are overwritten by later sequences or fall in slack).

    Hostile-input bounds: parsed lengths clamp so the write cursor never
    leaves [o_start, o_limit) (wild chunk writes spill at most SLACK bytes
    past it) and the literal read cursor stays inside the zero padding.
    The fuzz suite drives this with garbage blocks.
    """
    read128, write128, readbyte, streambyte = helpers
    del readbyte  # RLE is the offset==1 case of the periodized copy

    def ext_cond(st):
        return st[2] == 255

    def ext_body(st):
        ln, p, _ = st
        v = streambyte(comp_base, p)
        return ln + v, p + 1, v

    def seq_body(st):
        p, o = st
        token = streambyte(comp_base, p)
        p = p + 1

        # Literal length: zero-trip 0xFF-run unless the nibble is 15.
        lit_len = token >> 4
        lit_len, p, _ = jax.lax.while_loop(
            ext_cond, ext_body,
            (lit_len, p, jnp.where(lit_len == 15, 255, 0)))
        # Clamp to the output bound AND the padded input bound (hostile
        # lengths must not walk the read cursor off the comp row).
        lit_len = jnp.minimum(jnp.minimum(lit_len, o_limit - o),
                              comp_len + SLACK // 2 - p)
        lit_len = jnp.maximum(lit_len, 0)

        # literals: wild 128-byte chunks
        def lit_chunk(k, _):
            write128(io_ref, io_base, o + k * LANES,
                     read128(comp_ref, comp_base, p + k * LANES))
            return 0

        jax.lax.fori_loop(0, (lit_len + LANES - 1) // LANES,
                          lit_chunk, 0)
        p = p + lit_len
        o = o + lit_len

        # Match — parsed unconditionally (reads land in the zero padding
        # when this was the trailing-literals sequence; run loop exits on
        # the first 0 byte and mlen clamps to 0).
        valid = p < comp_len
        offset = streambyte(comp_base, p) + (streambyte(comp_base, p + 1) << 8)
        p2 = p + 2
        mlen = token & 15
        mlen, p2, _ = jax.lax.while_loop(
            ext_cond, ext_body,
            (mlen, p2, jnp.where(valid & (mlen == 15), 255, 0)))
        mlen = jnp.where(valid, jnp.minimum(mlen + 4, o_limit - o), 0)
        # Hostile offsets (0, or reaching before the io region) zero the
        # copy instead of reading out of bounds.
        mlen = jnp.where((offset >= 1) & (offset <= o), mlen, 0)
        offset = jnp.clip(offset, 1, jnp.maximum(o, 1))
        cs = jnp.maximum(o - offset, 0)
        nchunks = (mlen + LANES - 1) // LANES

        # Chunk 0: periodize the first `offset` lanes of the source row
        # (identity — zero grow iterations — when offset >= 128).
        v0 = read128(io_ref, io_base, cs)

        def grow(st):
            v, wdt = st
            v = jnp.where(iota < wdt, v, pltpu.roll(v, wdt, axis=1))
            return v, wdt * 2

        v, _ = jax.lax.while_loop(lambda st: st[1] < LANES, grow,
                                  (v0, offset))
        write128(io_ref, io_base, o, v)

        # Chunks k>=1: read at dst - m*offset with m = floor((dst-cs)/
        # offset): the source lies in [cs, cs+offset) mod-offset-aligned
        # and is fully written at chunk-k time for every offset >= 1.
        def mchunk(k, _):
            dst = o + k * LANES
            m = (dst - cs) // offset
            write128(io_ref, io_base, dst,
                     read128(io_ref, io_base, dst - m * offset))
            return 0

        jax.lax.fori_loop(1, nchunks, mchunk, 0)
        p = jnp.where(valid, p2, p)
        return p, o + mlen

    p, o = jax.lax.while_loop(
        lambda st: st[0] < comp_len, seq_body,
        (jnp.int32(0), jnp.int32(0) + o_start))
    return o


def _make_kernel(rows: int, comp_nr: int, io_nr: int, hist_nr: int,
                 out_base: int, out_cap: int, smem_stream: bool):
    """Build the batched (independent-blocks) kernel for a
    (rows)-blocks-per-step layout.

    Refs (2D, lane dim 128):
      lens_ref: SMEM i32[nb] (scalar prefetch)
      comp_ref: (rows*comp_nr, 128) VMEM (vector literal copies)
      comp_s_ref: same bytes PACKED 4-per-i32 in SMEM (scalar parse loads),
        (rows*comp_nr//4, 128) — smem_stream only
      hist_ref: (rows*hist_nr, 128) or None
      io_ref:   (rows*io_nr, 128)
    """

    def kernel(lens_ref, *refs):
        refs = list(refs)
        comp_ref = refs.pop(0)
        comp_s_ref = refs.pop(0) if smem_stream else None
        hist_ref = refs.pop(0) if hist_nr else None
        io_ref = refs.pop(0)
        g = pl.program_id(0)
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        helpers = _vmem_helpers(iota, comp_ref, comp_s_ref)

        def decode_row(r):
            comp_base = r * comp_nr
            io_base = r * io_nr
            comp_len = lens_ref[g * rows + r]

            if hist_ref is not None:
                # Seed the history region with aligned row copies.
                def seed(k, _):
                    io_ref[pl.ds(io_base + k, 1), :] = \
                        hist_ref[pl.ds(r * hist_nr + k, 1), :]
                    return 0
                jax.lax.fori_loop(0, hist_nr, seed, 0)

            o = _interpret_block(iota, io_ref, io_base, comp_ref, comp_base,
                                 comp_len, jnp.int32(out_base),
                                 out_base + out_cap, helpers)
            # Output length rides in the last slack row of this block's io.
            io_ref[pl.ds(io_base + io_nr - 1, 1), :] = jnp.full(
                (1, LANES), o - out_base, jnp.int32)

        def row_loop(r, _):
            decode_row(r)
            return 0

        jax.lax.fori_loop(0, rows, row_loop, 0)

    return kernel


# Per-grid-step SMEM budget for the scalar parse copy of the compressed
# stream, in PACKED bytes (4 per i32 word). v5e SMEM is ~1 MB/core and the
# grid pipeline double-buffers input windows, so the true footprint is 2x
# this plus spill slots + the scalar-prefetch operand — 448 KB keeps the
# total under the 1 MB ceiling with headroom (the unpacked round-2 form
# OOMed at M=32 KB: 512 KB window x 2 levels). Batches whose packed width
# exceeds it at rows=1 fall back to the vreg-extract parse path.
SMEM_STREAM_BUDGET = 448 * 1024

# Per-grid-step VMEM budget (io + comp windows, bytes of i32 lanes).
# VMEM is ~16 MB/core and the pipeline double-buffers windows; 6 MB/step
# keeps the doubled footprint comfortably under the ceiling. Blocks whose
# single-row footprint exceeds it (e.g. 4 MB blocks) must use the XLA
# decoder — callers gate on pallas_row_bytes().
VMEM_BUDGET = 6 * 1024 * 1024


def pallas_row_bytes(block_size: int, M: int, use_history: bool) -> int:
    """Per-block VMEM footprint (bytes) of the batched decode kernel."""
    hist = W if use_history else 0
    return (_round_up(hist + block_size + SLACK, 1024) + M + hist) * 4


@functools.partial(jax.jit,
                   static_argnames=("block_size", "use_history", "interpret",
                                    "smem_stream"))
def decode_blocks_pallas(comp: jax.Array, lens: jax.Array, hist: jax.Array,
                         block_size: int, use_history: bool = False,
                         interpret: bool = False,
                         smem_stream: bool | None = None):
    """Decode a batch of LZ4 blocks with the Pallas interpreter kernel.

    Args:
      comp: i32[nb, M] compressed bytes; M % 1024 == 0 with >= SLACK zero
        pad beyond each row's length.
      lens: i32[nb] compressed sizes.
      hist: i32[nb, 65536] RIGHT-aligned history (ignored unless
        use_history — independent blocks skip the seeding copies and the
        extra VMEM residency).
      block_size: static output capacity per block.
      smem_stream: route sequence parsing through a scalar SMEM copy of the
        stream (None = auto by SMEM budget).

    Returns (out: i32[nb, block_size], out_len: i32[nb]).
    """
    nb, M = comp.shape
    assert M % 1024 == 0, M
    # Accept uint8 rows: widening to i32 lanes runs on device (transfers
    # ship 1 byte/byte — the host link is the frame path's bottleneck).
    comp = comp.astype(jnp.int32)
    hist = hist.astype(jnp.int32)
    rows = 8 if not use_history else 4
    # Large blocks: cap rows so the double-buffered io+comp windows fit
    # VMEM (callers gate out blocks whose single-row footprint exceeds
    # the budget — see pallas_row_bytes).
    per_row = pallas_row_bytes(block_size, M, use_history)
    while rows > 1 and rows * per_row > VMEM_BUDGET:
        rows //= 2
    # Fewer rows per grid step keep the SMEM parse copy within budget even
    # for barely-compressible batches (M near the block bound); the grid
    # pipeline amortizes the extra steps. Footprint is in packed bytes.
    r = rows
    while r > 1 and r * M > SMEM_STREAM_BUDGET:
        r //= 2
    if smem_stream is None:
        smem_stream = r * M <= SMEM_STREAM_BUDGET
    if smem_stream:
        rows = r
    if nb % rows:
        pad = rows - nb % rows
        comp = jnp.concatenate([comp, jnp.zeros((pad, M), jnp.int32)])
        lens = jnp.concatenate([lens, jnp.zeros(pad, jnp.int32)])
        hist = jnp.concatenate([hist, jnp.zeros((pad, W), jnp.int32)])
    nbp = comp.shape[0]

    comp_nr = M // LANES
    hist_nr = (W // LANES) if use_history else 0
    out_base = W if use_history else 0
    io_bytes = _round_up(out_base + block_size + SLACK, 1024)
    io_nr = io_bytes // LANES

    comp_flat = comp.reshape(nbp * comp_nr, LANES)
    in_specs = [pl.BlockSpec((rows * comp_nr, LANES),
                             lambda g, lens: (g, 0),
                             memory_space=pltpu.VMEM)]
    operands = [comp_flat]
    if smem_stream:
        # Packed 4-bytes-per-word SMEM copy of the stream (parse path).
        c4 = comp.reshape(nbp, M // 4, 4)
        comp_pk = (c4[..., 0] | (c4[..., 1] << 8) | (c4[..., 2] << 16)
                   | (c4[..., 3] << 24))
        in_specs.append(pl.BlockSpec((rows * comp_nr // 4, LANES),
                                     lambda g, lens: (g, 0),
                                     memory_space=pltpu.SMEM))
        operands.append(comp_pk.reshape(nbp * comp_nr // 4, LANES))
    if use_history:
        in_specs.append(pl.BlockSpec((rows * hist_nr, LANES),
                                     lambda g, lens: (g, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(hist.reshape(nbp * hist_nr, LANES))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbp // rows,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((rows * io_nr, LANES), lambda g, lens: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
    )

    io, = pl.pallas_call(
        _make_kernel(rows, comp_nr, io_nr, hist_nr, out_base, block_size,
                     smem_stream),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nbp * io_nr, LANES), jnp.int32)],
        interpret=interpret,
    )(lens, *operands)

    io = io.reshape(nbp, io_nr * LANES)
    out_len = io[:nb, (io_nr - 1) * LANES]
    return io[:nb, out_base: out_base + block_size], out_len


def _make_linked_kernel(rows: int, comp_nr: int, io_nr: int, olen_nr: int,
                        block_size: int, smem_stream: bool):
    """Linked-chain kernel: decode `rows` dependent blocks serially into ONE
    contiguous io region laid out as [64 KB window | out0 | out1 | ...], so
    cross-block (and dictionary) back-references are plain negative offsets
    — the layout trick of the batched kernel applied to the whole chain
    (lz4Decode.js:279-306's rolling window becomes implicit). The output
    cursor carries across rows inside the kernel; stored blocks copy their
    wire bytes as vector chunks (no pl.when: their chunk counts and the
    interpreter's comp_len zero out on the other path, so both paths are
    straight-line).

    Refs: lens_ref/stored_ref (scalar prefetch), comp_ref VMEM
    (rows*comp_nr,128), [comp_s_ref packed SMEM], win_ref VMEM (W/128,128),
    io_ref out (io_nr,128), olen_ref out (olen_nr,128).
    """
    W_NR = W // LANES

    def kernel(lens_ref, stored_ref, *refs):
        refs = list(refs)
        comp_ref = refs.pop(0)
        comp_s_ref = refs.pop(0) if smem_stream else None
        win_ref = refs.pop(0)
        io_ref = refs.pop(0)
        olen_ref = refs.pop(0)
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        helpers = _vmem_helpers(iota, comp_ref, comp_s_ref)
        read128, write128, _, _ = helpers

        def seed(k, _):
            io_ref[pl.ds(k, 1), :] = win_ref[pl.ds(k, 1), :]
            return 0
        jax.lax.fori_loop(0, W_NR, seed, 0)

        def row_step(r, cursor):
            comp_base = r * comp_nr
            clen = jnp.minimum(lens_ref[r], block_size)
            is_stored = stored_ref[r] > 0

            # Stored block: wire bytes ARE the plaintext — vector copy.
            stored_n = jnp.where(is_stored, clen, 0)

            def copy_chunk(k, _):
                write128(io_ref, 0, cursor + k * LANES,
                         read128(comp_ref, comp_base, k * LANES))
                return 0
            jax.lax.fori_loop(0, (stored_n + LANES - 1) // LANES,
                              copy_chunk, 0)

            o_end = _interpret_block(
                iota, io_ref, 0, comp_ref, comp_base,
                jnp.where(is_stored, 0, lens_ref[r]),
                cursor, cursor + block_size, helpers)
            out_len = jnp.where(is_stored, clen, o_end - cursor)
            olen_ref[pl.ds(r, 1), :] = jnp.full((1, LANES), out_len,
                                                jnp.int32)
            return cursor + out_len

        jax.lax.fori_loop(0, rows, row_step, jnp.int32(W))

    return kernel


@functools.partial(jax.jit, static_argnames=("block_size", "interpret"))
def decode_linked_chunk_pallas(comp: jax.Array, lens: jax.Array,
                               stored: jax.Array, window: jax.Array,
                               block_size: int, interpret: bool = False):
    """Decode a chunk of LINKED (dependent) LZ4 blocks on device.

    Args:
      comp: u8/i32[rows, M] wire bytes per block (compressed, or the raw
        payload for stored rows); M % 1024 == 0 with >= SLACK zero pad.
      lens: i32[rows] wire sizes (0 rows are skipped).
      stored: i32[rows] stored-block flags.
      window: u8/i32[WINDOW_SIZE] initial history, right-aligned (zeros
        where no history exists yet).
      block_size: static per-block output capacity.

    Returns (out: u8[rows*block_size] packed plaintext, total: i32,
    out_lens: i32[rows], win_next: i32[WINDOW_SIZE] — the carried window
    for the next chunk, valid even when this chunk decodes 0 bytes).
    """
    rows, M = comp.shape
    assert M % 1024 == 0, M
    comp = comp.astype(jnp.int32)
    window = window.astype(jnp.int32)
    smem_stream = rows * M <= SMEM_STREAM_BUDGET

    comp_nr = M // LANES
    io_bytes = _round_up(W + rows * block_size + SLACK + LANES, 1024)
    io_nr = io_bytes // LANES
    olen_nr = max(_round_up(rows, 8), 8)

    in_specs = [pl.BlockSpec((rows * comp_nr, LANES),
                             lambda g, lens, stored: (g, 0),
                             memory_space=pltpu.VMEM)]
    operands = [comp.reshape(rows * comp_nr, LANES)]
    if smem_stream:
        c4 = comp.reshape(rows, M // 4, 4)
        comp_pk = (c4[..., 0] | (c4[..., 1] << 8) | (c4[..., 2] << 16)
                   | (c4[..., 3] << 24))
        in_specs.append(pl.BlockSpec((rows * comp_nr // 4, LANES),
                                     lambda g, lens, stored: (g, 0),
                                     memory_space=pltpu.SMEM))
        operands.append(comp_pk.reshape(rows * comp_nr // 4, LANES))
    in_specs.append(pl.BlockSpec((W // LANES, LANES),
                                 lambda g, lens, stored: (g, 0),
                                 memory_space=pltpu.VMEM))
    operands.append(window.reshape(W // LANES, LANES))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((io_nr, LANES), lambda g, lens, stored: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((olen_nr, LANES), lambda g, lens, stored: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
    )

    io, olen = pl.pallas_call(
        _make_linked_kernel(rows, comp_nr, io_nr, olen_nr, block_size,
                            smem_stream),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((io_nr, LANES), jnp.int32),
                   jax.ShapeDtypeStruct((olen_nr, LANES), jnp.int32)],
        interpret=interpret,
    )(lens, stored, *operands)

    out_lens = olen[:rows, 0]
    total = jnp.sum(out_lens)
    flat = io.reshape(-1)
    out = flat[W: W + rows * block_size].astype(jnp.uint8)
    # Next chunk's window = the last W bytes of [window | outputs]
    # = flat[total : total + W] (total == 0 returns the input window).
    win_next = jax.lax.dynamic_slice(flat, (total,), (W,))
    return out, total, out_lens, win_next


def decode_block_pallas_host(comp_bytes: np.ndarray, out_cap: int,
                             history: np.ndarray | None = None,
                             interpret: bool | None = None) -> np.ndarray:
    """Host convenience wrapper (numpy bytes in/out), for tests."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m = len(comp_bytes)
    M = _round_up(m + SLACK, 1024)
    comp = np.zeros((1, M), np.int32)
    comp[0, :m] = comp_bytes
    hist_arr = np.zeros((1, W), np.int32)
    use_history = history is not None and len(history) > 0
    if use_history:
        h = history[-W:]
        hist_arr[0, W - len(h):] = h
    out, out_len = decode_blocks_pallas(
        jnp.asarray(comp), jnp.asarray(np.array([m], np.int32)),
        jnp.asarray(hist_arr), out_cap, use_history, interpret)
    return np.asarray(out[0][: int(out_len[0])]).astype(np.uint8)
