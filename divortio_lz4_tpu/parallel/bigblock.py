"""Segmented device codec for LARGE blocks (256 KB / 1 MB / 4 MB).

The fast device kernels are 64 KB machines: the hybrid encoder's chain packs
payload positions as u16 (ops/hybrid_encode.py `hybrid_max_bs`) and the
Pallas decoder's per-block VMEM footprint caps out near 64 KB rows
(ops/pallas_decode.py `VMEM_BUDGET`). The reference's DEFAULT config is
4 MB blocks (/root/reference/src/buffer/bufferCompress.js:100), which round 2
served with the ~1-2 MB/s all-XLA kernels. This module routes big blocks
onto the fast kernels by exploiting the format's own locality bound:
**LZ4 match offsets never exceed 64 KB**, so any position's decode/encode
context is the previous 64 KB of plaintext, wherever the block boundaries
are.

Encode (``compress_frame_big``): split every block into 64 KB segments;
each segment encodes independently with its preceding 64 KB of plaintext
as a history row (the linked-mode trick of parallel/device.py
`_compress_linked`, applied INSIDE a block — fully data-parallel, batched,
shardable). Round 4: segments run the CHAIN-DIRECT engine — device u16
dist chains (ops/hybrid_encode.build_dist_chains) + the native host
select/extend/serialize with splice meta (lz4t_chain_serialize16m) —
replacing the hybrid Pallas walk (~0.6 us/sequence scalar floor). The
per-segment sequence streams are then spliced into one
spec-exact block stream on host: a segment's trailing-literal run merges
into the next segment's first sequence (their literal bytes are contiguous
plaintext), so only one token/length header is rewritten per boundary.
Boundary cost: matches cannot SPAN a segment boundary and each segment pays
the MF_LIMIT/LAST_LITERALS end rules (~17 bytes per 64 KB worst case);
measured ratio stays below the reference encoder's.

Decode (``decompress_frame_big``): a native O(wire) scan
(lz4t_scan_pieces) splits each block's sequence stream at sequence
boundaries into pieces of ~64 KB output each; the pieces then decode as a
chain through the chained-io Pallas kernel
(ops/pallas_decode.py `decode_linked_chunk_pallas`, layout
[64 KB window | out0 | out1 ...]) — cross-piece back-references are plain
negative offsets, the window carries on device between chunk calls.
Independent blocks reset the window per block (spec semantics,
/root/reference/src/block/blockDecompress.js:145-154 dictionary rules);
linked blocks chain straight through. Blocks containing a single sequence
longer than the piece capacity (giant RLE) make the caller fall back to the
XLA kernels; malformed streams raise the host tier's error taxonomy.

Cost ledger (advisor r2 #3, measured r3): a piece CHAIN is sequential by
nature (piece i's window is piece i-1's output), and on the tunneled dev
link each device dispatch carries ~30-70 ms of relay latency, so
multi-piece decodes are dispatch-bound there (independent blocks' chains
dispatch asynchronously but still serialize on the relay). The round-3
engine="split" route (parallel/device.py _decode_chain_split) keeps the
carried window ON DEVICE between chunks and measured 1.6x this module's
decode path at 4 MB blocks; a cross-block wave batch (piece k of every
independent block in one kernel) remains the next lever if a
non-tunneled host shows kernel-bound behavior.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..config import FrameConfig
from ..constants import WINDOW_SIZE, UNCOMPRESSED_FLAG
from ..utils import ensure_buffer, write_u32le
from ..xxh import xxhash32

SEG = WINDOW_SIZE            # encode segment size (the u16 chain ceiling)
LANES = 128

PIECE_TARGET = WINDOW_SIZE   # decode: close a piece once it outputs >= this
PIECE_CAP = 4 * WINDOW_SIZE  # decode: per-piece output capacity (256 KB)


# --------------------------------------------------------------------------
# Sequence-stream piece scan (native fast path + pure-Python fallback)
# --------------------------------------------------------------------------

def _scan_pieces_py(src: np.ndarray, target: int):
    """Pure-Python piece scan (same contract as lz4t_scan_pieces)."""
    cb = src.tolist()
    n = len(cb)
    p = o = ps = po = 0
    off_l, wl_l, ol_l = [], [], []
    while p < n:
        tok = cb[p]; p += 1
        lit = tok >> 4
        if lit == 15:
            while True:
                if p >= n:
                    raise ValueError("LZ4: Malformed Input")
                v = cb[p]; p += 1; lit += v
                if v != 255:
                    break
        if p + lit > n:
            raise ValueError("LZ4: Malformed Input")
        p += lit; o += lit
        if p >= n:
            break
        if p + 2 > n:
            raise ValueError("LZ4: Malformed Input")
        if cb[p] == 0 and cb[p + 1] == 0:
            raise ValueError("LZ4: Invalid Offset 0")
        p += 2
        ml = tok & 15
        if ml == 15:
            while True:
                if p >= n:
                    raise ValueError("LZ4: Malformed Input")
                v = cb[p]; p += 1; ml += v
                if v != 255:
                    break
        o += ml + 4
        if o - po >= target and p < n:
            off_l.append(ps); wl_l.append(p - ps); ol_l.append(o - po)
            ps, po = p, o
    off_l.append(ps); wl_l.append(p - ps); ol_l.append(o - po)
    return (np.array(off_l, np.int64), np.array(wl_l, np.int64),
            np.array(ol_l, np.int64))


def scan_pieces(src: np.ndarray, target: int = PIECE_TARGET):
    """Split one block's sequence stream at sequence boundaries.

    Returns (wire_off, wire_len, out_len) int64 arrays, one entry per piece;
    every piece except the last outputs >= target bytes. Raises
    "LZ4: Malformed Input" on truncated length runs / zero offsets. O(wire)
    — only size arithmetic, no copies.
    """
    src = np.ascontiguousarray(src, dtype=np.uint8)
    try:
        from ..native import scan_pieces_native
    except Exception:
        # Match the package-level guard (divortio_lz4_tpu/__init__.py): a
        # native toolchain failure re-raises as CalledProcessError /
        # FileNotFoundError from _build() on re-import, not ImportError.
        scan_pieces_native = None
    if scan_pieces_native is not None:
        return scan_pieces_native(src, target)
    return _scan_pieces_py(src, target)


# --------------------------------------------------------------------------
# Encode: 64 KB segment rows + host splice
# --------------------------------------------------------------------------

def _segment_rows(raw: np.ndarray, bs: int, window: Optional[np.ndarray],
                  linked: bool):
    """[64 KB history | 64 KB payload] rows for every segment of every block.

    Independent blocks clip history at the block start (dictionary window
    fills the remainder); linked blocks see prior-block plaintext too —
    identical context to what a single continuous encoder would use.
    Returns (work u8[nrows, W+SEG], lens i32, hist_start i32,
    seg_rows: list of per-block [row indices]).
    """
    W = WINDOW_SIZE
    n = len(raw)
    dict_len = len(window) if window is not None else 0
    nblocks = max(1, -(-n // bs))
    seg_rows = []
    rows = []
    lens = []
    hist_start = []
    for b in range(nblocks):
        bstart = b * bs
        bend = min(bstart + bs, n)
        nseg = max(1, -(-(bend - bstart) // SEG))
        rlist = []
        for j in range(nseg):
            sstart = bstart + j * SEG
            send = min(sstart + SEG, bend)
            row = np.zeros(W + SEG, np.uint8)
            row[W: W + (send - sstart)] = raw[sstart:send]
            floor = 0 if linked else bstart
            avail = min(sstart - floor, W)
            if avail > 0:
                row[W - avail: W] = raw[sstart - avail: sstart]
            room = W - avail
            take = min(dict_len, room)
            if take > 0:
                row[room - take: room] = window[dict_len - take:]
            rows.append(row)
            lens.append(send - sstart)
            hist_start.append(room - take)
            rlist.append(len(rows) - 1)
        seg_rows.append(rlist)
    return (np.stack(rows), np.array(lens, np.int32),
            np.array(hist_start, np.int32), seg_rows)


def _dispatch_segments(work: np.ndarray, lens: np.ndarray,
                       hist_start: np.ndarray):
    """Queue the chain-kernel dispatches for segment rows (async).
    Returns [(row_base, real_rows, chains_device)] — the dispatch half of
    _encode_segments, split out so the multi-frame path can queue EVERY
    frame's chains before the first fetch."""
    import jax.numpy as jnp

    from ..ops.hybrid_encode import build_dist_chains

    CH = 32
    nrows = work.shape[0]
    pend = []
    for i in range(0, nrows, CH):
        w = work[i: i + CH]
        l = lens[i: i + CH]
        hs = hist_start[i: i + CH]
        r = w.shape[0]
        target = CH if nrows > CH else -(-r // 8) * 8
        if r < target:
            w = np.concatenate(
                [w, np.zeros((target - r, w.shape[1]), w.dtype)])
            l = np.concatenate([l, np.zeros(target - r, np.int32)])
            hs = np.concatenate([hs, np.zeros(target - r, np.int32)])
        ch = build_dist_chains(jnp.asarray(w.astype(np.int32)),
                               jnp.asarray(l), WINDOW_SIZE,
                               jnp.asarray(hs))
        pend.append((i, r, ch))
    return pend


def _encode_segments(work: np.ndarray, lens: np.ndarray,
                     hist_start: np.ndarray, pend=None, fetched=None):
    """Chain-direct encode of segment rows (round 4): device scored
    chains (build_dist_chains, u16 dist wire) + native host
    select/extend/serialize — the same engine as the 64 KB frame path,
    ~20x the hybrid Pallas walk this replaced (the walk paid ~0.6 us per
    sequence on the scalar core; the chains run at the sort phase's
    rate and the host tail overlaps the next chunk's device work).
    Returns (outs u8[nrows, OW], out_lens i64, meta i64[nrows, 4]) with
    the splice meta lanes: trailing-token position, trailing literal
    count, last-match-sequence stream offset, last-match output anchor
    (lz4t_chain_serialize16m)."""
    import jax.numpy as jnp

    from ..constants import block_bound
    from ..ops.hybrid_encode import build_dist_chains
    from ..ops.split_encode import chain_select_serialize_meta

    CH = 32
    nrows, rowlen = work.shape
    # queue every chunk's chain dispatch before fetching any (fetch of
    # chunk k overlaps chunks k+1.. on device); the multi-frame path
    # passes pre-queued *pend* (+ optionally pre-fetched chains) instead
    if pend is None:
        pend = _dispatch_segments(work, lens, hist_start)
    # serializer reads 8-byte words past hist+src: pad rows once
    wk = np.zeros((nrows, rowlen + 8), np.uint8)
    wk[:, :rowlen] = work
    OW = block_bound(SEG) + 16
    outs = np.zeros((nrows, OW), np.uint8)
    out_lens = np.zeros(nrows, np.int64)
    metas = np.zeros((nrows, 4), np.int64)

    from ..utils.pool import host_pool

    ex = host_pool()
    for j, (i, r, ch) in enumerate(pend):
        # syncs this chunk; later chunks keep going (or all chunks were
        # pre-fetched in one stacked pull by the multi-frame path)
        ch_np = np.asarray(ch) if fetched is None else fetched[j]

        def _ser_one(k, base=i, chains=ch_np):
            s, meta = chain_select_serialize_meta(
                wk[k], WINDOW_SIZE, int(lens[k]), chains[k - base])
            outs[k, : len(s)] = s
            out_lens[k] = len(s)
            metas[k] = meta

        list(ex.map(_ser_one, range(i, i + r)))
    return outs, out_lens, metas


def _seq_header(lit_len: int, low_nibble: int) -> np.ndarray:
    """Token byte + 0xFF-run literal-length extension."""
    b = [(min(lit_len, 15) << 4) | low_nibble]
    if lit_len >= 15:
        rem = lit_len - 15
        while rem >= 255:
            b.append(255)
            rem -= 255
        b.append(rem)
    return np.array(b, np.uint8)


def _parse_litlen(stream: np.ndarray, p: int = 0):
    """(literal length, header byte count) of the sequence at *p*."""
    tok = int(stream[p])
    lit = tok >> 4
    q = p + 1
    if lit == 15:
        while True:
            v = int(stream[q]); q += 1; lit += v
            if v != 255:
                break
    return lit, q - p


def _parse_seq(stream: np.ndarray, p: int):
    """Parse one full (match-carrying) sequence at byte offset *p*.

    Returns dict(lit, hdr, off, mlen, end): literal count, token+lit-ext
    byte count, match offset, match length, offset past the sequence."""
    lit, hdr = _parse_litlen(stream, p)
    q = p + hdr + lit
    off = int(stream[q]) | (int(stream[q + 1]) << 8)
    q += 2
    tok = int(stream[p])
    ml = tok & 15
    if ml == 15:
        while True:
            v = int(stream[q]); q += 1; ml += v
            if v != 255:
                break
    return {"lit": lit, "hdr": hdr, "off": off, "mlen": ml + 4, "end": q}


def _emit_seq(lit_bytes: np.ndarray, off: int, mlen: int) -> np.ndarray:
    """Serialize one full sequence (token, lit ext, literals, offset,
    match ext)."""
    head = _seq_header(len(lit_bytes), min(mlen - 4, 15))
    tail = [np.array([off & 0xFF, (off >> 8) & 0xFF], np.uint8)]
    if mlen - 4 >= 15:
        rem = mlen - 4 - 15
        mx = []
        while rem >= 255:
            mx.append(255)
            rem -= 255
        mx.append(rem)
        tail.append(np.array(mx, np.uint8))
    return np.concatenate([head, lit_bytes] + tail)


def _ext_len(raw: np.ndarray, start: int, dist: int, limit: int) -> int:
    """How far plaintext continues to match itself at -dist from *start*."""
    if limit <= 0:
        return 0
    a = raw[start: start + limit]
    b = raw[start - dist: start - dist + len(a)]
    neq = np.nonzero(a != b)[0]
    return int(neq[0]) if len(neq) else len(a)


def _absorb_prefix(stream, take_total: int, seg_g: int, raw: np.ndarray):
    """Absorb up to *take_total* output bytes from a segment stream's front
    (whole sequences; literal runs cut anywhere; matches cut from the front
    down to mlen >= 4 — dist is start-relative, so a front cut is free).
    Returns (absorbed, skip, rebuilt_first_or_None)."""
    e2 = 0
    p = 0
    rebuild = None
    while e2 < take_total:
        fs = _parse_seq(stream, p)
        cover = fs["lit"] + fs["mlen"]
        if e2 + cover <= take_total:
            e2 += cover
            p = fs["end"]
            continue
        r = take_total - e2
        if r <= fs["lit"]:
            lit2 = fs["lit"] - r
            ls = seg_g + e2 + r
            rebuild = _emit_seq(raw[ls: ls + lit2], fs["off"], fs["mlen"])
        else:
            q = r - fs["lit"]
            if fs["mlen"] - q < 4:
                q = fs["mlen"] - 4
                if q <= 0:
                    break
                r = fs["lit"] + q
            rebuild = _emit_seq(raw[seg_g:seg_g], fs["off"], fs["mlen"] - q)
        e2 += r
        p = fs["end"]
        break
    return e2, p, rebuild


def _splice_block(raw: np.ndarray, bstart: int, bend: int, streams, metas,
                  seg_sizes, src_floor: int) -> np.ndarray:
    """Join per-segment sequence streams into ONE block stream.

    Two boundary repairs make the result match what a continuous encoder
    would emit (measured: without them, segmentation costs ~25 B per 64 KB
    boundary and loses the <=-reference ratio gate on highly compressible
    corpora):

    1. **Trailing-literal merge**: a segment's trailing-literal run (>= 5
       bytes by the LAST_LITERALS rule, or the whole segment when it found
       no match) merges into the next segment's first sequence — the two
       literal runs are contiguous plaintext, so only one token/length
       header is rewritten.
    2. **Boundary match extension**: each segment's FINAL match stopped at
       an artificial match limit, so it is re-extended over the boundary by
       direct plaintext comparison, absorbing first the trailing literals
       and then the next segment's leading output (whole sequences;
       partial literal runs and front-cut matches are free rewrites). The
       block-level spec rules stay intact: extension never reaches past
       block_end - 5, and the final 12-byte no-match zone belongs to the
       block's last segment, which keeps its own end rules.
    """
    parts = []
    pending = 0        # trailing literals awaiting a merge
    pend_start = 0     # their global plaintext start
    open_ext = None    # {budget, fidx, lit_bytes, off, mlen} — an extended
    #                    final match that may keep absorbing forward

    def emit_final(f):
        return _emit_seq(f["lit_bytes"], f["off"], f["mlen"])

    for j, stream in enumerate(streams):
        ssz = int(seg_sizes[j])
        if ssz == 0:
            continue
        tp, tl, lsd, lanchor = (int(x) for x in metas[j])
        seg_g = bstart + j * SEG
        body_start = 0
        rebuild_first = None
        final_fields = None

        if open_ext is not None:
            if tp == 0:
                take = min(open_ext["budget"], ssz)
                open_ext["mlen"] += take
                open_ext["budget"] -= take
                if take == ssz:
                    continue  # whole literal segment swallowed; stay open
                parts[open_ext["fidx"]] = emit_final(open_ext)
                open_ext = None
                pending = ssz - take
                pend_start = seg_g + take
                continue
            final = _parse_seq(stream, lsd)
            budget = open_ext["budget"]
            fcover = final["lit"] + final["mlen"]
            if budget < lanchor:
                # (a) stop among the early sequences
                e2, body_start, rebuild_first = _absorb_prefix(
                    stream, budget, seg_g, raw)
                open_ext["mlen"] += e2
            elif budget < lanchor + fcover:
                # (b) stop inside the final sequence: cut its literal run
                # anywhere / its match from the front (dist is relative —
                # a front cut is free down to mlen >= 4)
                r = budget - lanchor
                if r <= final["lit"]:
                    ls = seg_g + lanchor + r
                    final_fields = {
                        "lit_bytes": raw[ls: ls + final["lit"] - r],
                        "off": final["off"], "mlen": final["mlen"]}
                    absorbed = budget
                else:
                    q = min(r - final["lit"], final["mlen"] - 4)
                    final_fields = {
                        "lit_bytes": raw[seg_g:seg_g],
                        "off": final["off"], "mlen": final["mlen"] - q}
                    absorbed = lanchor + final["lit"] + q
                open_ext["mlen"] += absorbed
                body_start = lsd  # early sequences fully absorbed
            else:
                # (c) swallow the final sequence whole, then eat into the
                # trailing literals; stay open past an exhausted segment
                rem = budget - lanchor - fcover
                e_tl = min(rem, tl)
                open_ext["mlen"] += lanchor + fcover + e_tl
                open_ext["budget"] = rem - e_tl
                if e_tl == tl and open_ext["budget"] > 0:
                    continue
                parts[open_ext["fidx"]] = emit_final(open_ext)
                open_ext = None
                pending = tl - e_tl
                pend_start = seg_g + ssz - pending
                continue
            parts[open_ext["fidx"]] = emit_final(open_ext)
            open_ext = None

        if tp == 0:
            # All-literal segment: extend (or start) the pending run.
            if pending == 0:
                pend_start = seg_g
            pending += ssz
            continue

        if final_fields is None:
            final = _parse_seq(stream, lsd)
            final_fields = {
                "lit_bytes": raw[seg_g + lanchor:
                                 seg_g + lanchor + final["lit"]],
                "off": final["off"], "mlen": final["mlen"],
            }
        if pending > 0:
            lit1, hdr = _parse_litlen(stream)
            merged = pending + lit1
            if lsd == 0:
                final_fields["lit_bytes"] = raw[pend_start:
                                                pend_start + merged]
            else:
                parts.append(_seq_header(merged, int(stream[0]) & 0x0F))
                parts.append(raw[pend_start: pend_start + merged])
                parts.append(stream[hdr + lit1: lsd])
        else:
            if rebuild_first is not None:
                parts.append(rebuild_first)
            parts.append(stream[body_start:lsd])
        parts.append(emit_final(final_fields))
        fidx = len(parts) - 1

        pending = tl
        pend_start = seg_g + ssz - tl
        match_end = pend_start
        if match_end - final_fields["off"] >= src_floor:
            e = _ext_len(raw, match_end, final_fields["off"],
                         (bend - 5) - match_end)
            e_pend = min(e, pending)
            if e_pend > 0:
                final_fields["mlen"] += e_pend
                pending -= e_pend
                pend_start += e_pend
                parts[fidx] = emit_final(final_fields)
            if pending == 0 and e > e_pend:
                open_ext = dict(final_fields, budget=e - e_pend, fidx=fidx)

    if open_ext is not None:
        parts[open_ext["fidx"]] = emit_final(open_ext)
    parts.append(_seq_header(pending, 0))
    parts.append(raw[pend_start: pend_start + pending])
    return np.concatenate(parts) if parts else np.empty(0, np.uint8)


def compress_frame_big(data,
                       config: FrameConfig,
                       dictionary=None, defer: bool = False):
    """Device-compress a frame whose block size exceeds the hybrid
    encoder's 64 KB ceiling (segment + splice; see module docstring).

    Supports independent and linked frames, dictionaries, block checksums,
    stored fallback — the full `device_compress_frame` contract at
    256 KB / 1 MB / 4 MB block sizes.

    defer=True returns an opaque state after QUEUEING the chain-kernel
    dispatches (async, no sync paid); finish with
    ``_finish_frame_big(state, fetched)`` where *fetched* holds the
    chains pulled by the multi-frame stacked fetch
    (compress_frames_big) — or None to fetch per chunk."""
    from .device import _dict_window, _frame_header_bytes

    raw = ensure_buffer(data)
    n = len(raw)
    bs = config.resolved_block_size
    assert bs > SEG and bs % SEG == 0, bs
    window, dict_id = _dict_window(dictionary)
    linked = not config.block_independence

    work, lens, hist_start, seg_rows = _segment_rows(raw, bs, window, linked)
    pend = _dispatch_segments(work, lens, hist_start)
    if defer:
        return (raw, n, bs, config, dict_id, linked, seg_rows, work, lens,
                hist_start, pend)
    return _finish_frame_big(
        (raw, n, bs, config, dict_id, linked, seg_rows, work, lens,
         hist_start, pend), None)


def _finish_frame_big(state, fetched) -> np.ndarray:
    """Serialize/splice/assemble half of compress_frame_big."""
    from .device import _frame_header_bytes

    (raw, n, bs, config, dict_id, linked, seg_rows, work, lens,
     hist_start, pend) = state
    outs, out_lens, metas = _encode_segments(work, lens, hist_start,
                                             pend=pend, fetched=fetched)

    comps = []
    for b, rlist in enumerate(seg_rows):
        bstart = b * bs
        bend = min(bstart + bs, n)
        comp = _splice_block(
            raw, bstart, bend,
            [outs[r][: int(out_lens[r])] for r in rlist],
            [metas[r] for r in rlist],
            [lens[r] for r in rlist],
            src_floor=0 if linked else bstart)
        comps.append(comp)

    # --- Frame assembly (header / size words / stored fallback / EndMark) ---
    frame = np.empty(19 + n + (n // 255) + (16 + 8) * len(comps) + 8,
                     np.uint8)
    header = _frame_header_bytes(config, n, dict_id)
    frame[: len(header)] = header
    pos = len(header)
    if n > 0:
        for b, comp in enumerate(comps):
            bstart = b * bs
            bsize = min(bs, n - bstart)
            clen = len(comp)
            if 0 < clen < bsize:
                write_u32le(frame, pos, clen)
                pos += 4
                frame[pos: pos + clen] = comp
                pos += clen
                data_start = pos - clen
            else:
                write_u32le(frame, pos, bsize | UNCOMPRESSED_FLAG)
                pos += 4
                frame[pos: pos + bsize] = raw[bstart: bstart + bsize]
                pos += bsize
                data_start = pos - bsize
            if config.block_checksums:
                write_u32le(frame, pos, xxhash32(frame[data_start:pos], 0))
                pos += 4
    write_u32le(frame, pos, 0)
    pos += 4
    if config.content_checksum:
        write_u32le(frame, pos, xxhash32(raw, 0))
        pos += 4
    return frame[:pos]


def compress_frames_big(datas, config: FrameConfig,
                        dictionary=None) -> list:
    """Multi-frame PIPELINED big-block encode (VERDICT r4 #6): queue
    EVERY frame's chain-kernel dispatches before the first fetch, pull
    all chains in ONE stacked fetch, then serialize/splice/assemble per
    frame — per-frame syncs paid ~30 ms each on this link."""
    from .device import _fetch_stacked

    states = [compress_frame_big(d, config, dictionary, defer=True)
              for d in datas]
    fetched = _fetch_stacked([ch for s in states for (_, _, ch) in s[10]])
    k = 0
    out = []
    for s in states:
        nf = len(s[10])
        out.append(_finish_frame_big(s, fetched[k: k + nf]))
        k += nf
    return out


# --------------------------------------------------------------------------
# Decode: piece scan + chained Pallas kernel
# --------------------------------------------------------------------------

def _plan_pieces(buf: np.ndarray, blocks, block_max: int):
    """Piece lists per block: [(abs_off, wire_len, out_len, stored), ...].

    Returns None when any piece exceeds PIECE_CAP (giant-RLE fallback).
    Raises the host taxonomy when a block's TOTAL decoded output exceeds
    the frame's declared block size (a hostile few-KB frame of RLE
    sequences must not silently decode far past the BD bound — the host
    tier raises the same error)."""
    plan = []
    for off, size, stored in blocks:
        pieces = []
        if stored:
            for s in range(0, size, PIECE_CAP):
                ln = min(PIECE_CAP, size - s)
                pieces.append((off + s, ln, ln, True))
        else:
            wo, wl, ol = scan_pieces(buf[off: off + size])
            if int(ol.sum()) > block_max:
                raise ValueError("LZ4: Output Buffer Too Small")
            if int(ol.max(initial=0)) > PIECE_CAP:
                return None
            for k in range(len(wo)):
                pieces.append((off + int(wo[k]), int(wl[k]), int(ol[k]),
                               False))
        plan.append(pieces)
    return plan


def _decode_piece_chain(buf: np.ndarray, pieces, d_win, interpret: bool):
    """Decode one dependent piece chain via the chained-io Pallas kernel;
    returns (list of np plaintext parts, carried window device array)."""
    import jax.numpy as jnp

    from ..ops.pallas_decode import (SLACK, SMEM_STREAM_BUDGET, VMEM_BUDGET,
                                     decode_linked_chunk_pallas)
    from ..ops.pallas_decode import _round_up as _ru
    from .device import _bucket_pow2

    bs = PIECE_CAP
    max_wire = max((p[1] for p in pieces), default=1)
    M = _bucket_pow2(_ru(max_wire + SLACK, 1024), 1024)
    CH = 8
    while CH > 1 and ((WINDOW_SIZE + CH * bs + SLACK) * 4 + CH * M * 4
                      > VMEM_BUDGET or CH * M > SMEM_STREAM_BUDGET):
        CH //= 2

    nb = len(pieces)
    comp = np.zeros((nb, M), np.uint8)
    lens = np.zeros(nb, np.int32)
    stored = np.zeros(nb, np.int32)
    for i, (aoff, wl, _, st) in enumerate(pieces):
        comp[i, :wl] = buf[aoff: aoff + wl]
        lens[i] = wl
        stored[i] = 1 if st else 0

    parts = []
    for i in range(0, nb, CH):
        rows = min(CH, nb - i)

        def pad(a):
            if rows == CH:
                return a[i: i + rows]
            return np.concatenate(
                [a[i: i + rows],
                 np.zeros((CH - rows,) + a.shape[1:], a.dtype)])

        out, total, _, d_win = decode_linked_chunk_pallas(
            jnp.asarray(pad(comp)), jnp.asarray(pad(lens)),
            jnp.asarray(pad(stored)), d_win, bs, interpret)
        parts.append(np.asarray(out)[: int(total)])
    return parts, d_win


def decompress_frame_big(buf: np.ndarray, blocks, header,
                         window: Optional[np.ndarray]):
    """Pallas decode of a big-block frame body (see module docstring).

    *blocks* / *header* come from parse_block_index. Returns the plaintext,
    or None when a piece exceeds PIECE_CAP (the caller falls back to the
    XLA kernels). Malformed sequence streams raise "LZ4: Malformed Input".
    """
    import jax
    import jax.numpy as jnp

    plan = _plan_pieces(buf, blocks, header["block_max"])
    if plan is None:
        return None
    interpret = jax.default_backend() != "tpu"

    win0 = np.zeros(WINDOW_SIZE, np.uint8)
    if window is not None:
        win0[WINDOW_SIZE - len(window):] = window
    d_win0 = jnp.asarray(win0)

    parts = []
    if header["independent"]:
        # Window resets at every block: one fresh chain per block.
        for pieces in plan:
            p, _ = _decode_piece_chain(buf, pieces, d_win0, interpret)
            parts.extend(p)
    else:
        # Linked: one continuous chain across every block's pieces.
        flat = [pc for pieces in plan for pc in pieces]
        d_win = d_win0
        parts, _ = _decode_piece_chain(buf, flat, d_win, interpret)
    if not parts:
        return np.empty(0, np.uint8)
    return np.concatenate(parts)
