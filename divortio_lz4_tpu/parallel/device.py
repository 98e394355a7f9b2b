"""Single-device frame codec: batched block kernels + host frame assembly.

The frame wire format (headers, sizes, stored-block fallback, checksums) is
cheap host work; the block codec is the compute. Blocks are padded into a
(nblocks, block_size) batch, encoded/decoded on device in one jit call, and
stitched into a spec-exact LZ4 frame on host.

Independent blocks (FrameConfig.block_independence=True) are the natural
device layout — every block is data-parallel. Linked frames are decoded by
carrying the 64 KB tail window between batched calls (still device compute,
serial across blocks), and encoded with a device loop over blocks.
"""

from __future__ import annotations

import functools as _functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DEFAULT_CONFIG, FrameConfig
from ..constants import (
    BLOCK_SIZE_MASK,
    FLG_BLOCK_CHECKSUM,
    FLG_CONTENT_CHECKSUM,
    FLG_CONTENT_SIZE,
    FLG_DICT_ID,
    FLG_VERSION_MASK,
    LZ4_VERSION,
    MAGIC_NUMBER,
    UNCOMPRESSED_FLAG,
    WINDOW_SIZE,
    block_bound,
)
from ..utils import ensure_buffer, read_u32le, write_u32le
from ..xxh import xxhash32
from ..ops.decode_xla import decode_blocks_batch
from ..ops.encode_xla import encode_blocks_batch


def _blocks_to_batch(raw: np.ndarray, block_size: int):
    n = len(raw)
    nblocks = max(1, -(-n // block_size))
    # uint8 rows: device transfers ship 1 byte/byte; kernels widen to i32
    # lanes on device (the host link is the offload path's bottleneck).
    work = np.zeros((nblocks, block_size), dtype=np.uint8)
    lens = np.zeros(nblocks, dtype=np.int32)
    for i in range(nblocks):
        chunk = raw[i * block_size: (i + 1) * block_size]
        work[i, : len(chunk)] = chunk
        lens[i] = len(chunk)
    return work, lens, nblocks


def _frame_header_bytes(config: FrameConfig, n: int,
                        dict_id: Optional[int] = None) -> np.ndarray:
    """Build the frame header (magic..header checksum) for the device path."""
    hdr = np.empty(19, np.uint8)
    hdr[0:4] = (0x04, 0x22, 0x4D, 0x18)
    flg = LZ4_VERSION << 6
    if config.block_independence:
        flg |= 0x20
    if config.content_checksum:
        flg |= FLG_CONTENT_CHECKSUM
    if config.block_checksums:
        flg |= FLG_BLOCK_CHECKSUM
    if config.content_size:
        flg |= FLG_CONTENT_SIZE
    if dict_id is not None:
        flg |= FLG_DICT_ID
    hdr[4] = flg
    hdr[5] = (config.block_id & 0x07) << 4
    pos = 6
    if config.content_size:
        write_u32le(hdr, pos, n & 0xFFFFFFFF)
        write_u32le(hdr, pos + 4, n >> 32)
        pos += 8
    if dict_id is not None:
        write_u32le(hdr, pos, dict_id)
        pos += 4
    hdr[pos] = (xxhash32(hdr[4:pos], 0) >> 8) & 0xFF
    return hdr[: pos + 1]


def _dict_window(dictionary) -> tuple[Optional[np.ndarray], Optional[int]]:
    """Last-64KB window + dictID of a dictionary (None, None when absent)."""
    if dictionary is None:
        return None, None
    dict_buf = ensure_buffer(dictionary)
    if len(dict_buf) == 0:
        return None, None
    dict_id = xxhash32(dict_buf, 0)
    window = dict_buf[-WINDOW_SIZE:]
    return np.asarray(window, np.uint8), dict_id


def device_compress_frame(data,
                          config: FrameConfig = DEFAULT_CONFIG,
                          use_fingerprints: Optional[bool] = None,
                          encode_batch=None,
                          dictionary=None,
                          engine: str = "xla",
                          assemble: str = "host") -> np.ndarray:
    """Compress *data* into an LZ4 frame with the block codec on device.

    Independent frames batch data-parallel (BASELINE configs 1/2/5); linked
    frames run as a single jitted lax.scan carrying the 64 KB window on
    device (BASELINE config 3). *encode_batch* optionally overrides the
    batch kernel — signature (work, lens, hist_len, hist_start) where work
    rows carry a static hist_len-byte history prefix (the sharded codec
    passes its shard_map-wrapped version). *dictionary* feeds every block's
    history window and stamps the frame's dictID
    (bufferCompress.js:109-125 semantics on the device tier).

    engine: "xla" (sort-based data-parallel kernel), "hybrid" (sort-based
    candidates + Pallas sequence walk — the fastest device encoder, ~18x
    the XLA kernel per chip, ratio < reference on measured corpora), or "pallas" (the
    compiled greedy-scan kernel — BYTE-IDENTICAL to the reference encoder).
    "pallas" applies to independent frames without a dictionary; "hybrid"
    covers dictionaries and linked frames too, up to
    hybrid_encode.hybrid_max_bs() (64 KB blocks — the chain's u16 position
    ceiling). Unsupported shapes fall back to XLA.
    """
    if use_fingerprints is None:
        use_fingerprints = config.favor_ratio
    if engine == "split" and encode_batch is None:
        from ..ops.hybrid_encode import hybrid_max_bs
        _bs = config.resolved_block_size
        if _bs <= hybrid_max_bs():
            if config.block_independence:
                return _compress_independent_split(data, config, dictionary)
            return _compress_linked_split(data, config, dictionary)
        # Big blocks: the hybrid segment+splice machinery covers them.
        engine = "hybrid"
    if engine == "hybrid" and encode_batch is None:
        import jax as _jax

        from ..ops.hybrid_encode import encode_blocks_hybrid, hybrid_max_bs
        _bs = config.resolved_block_size
        if _bs <= hybrid_max_bs():
            def encode_batch(w, l, hl, hs):
                return encode_blocks_hybrid(
                    w, l, _bs, hl, hs, _jax.default_backend() != "tpu")
        elif assemble == "host":
            # Big blocks (256 KB / 1 MB / 4 MB incl. the reference's 4 MB
            # default) ride the hybrid kernel as 64 KB history segments
            # spliced into spec-exact block streams on host.
            from .bigblock import compress_frame_big
            return compress_frame_big(data, config, dictionary)
    if not config.block_independence:
        return _compress_linked(data, config, use_fingerprints, dictionary,
                                encode_batch, assemble)

    raw = ensure_buffer(data)
    n = len(raw)
    bs = config.resolved_block_size
    work, lens, nblocks = _blocks_to_batch(raw, bs)

    if (engine == "pallas" and encode_batch is None and dictionary is None):
        import jax as _jax

        from ..ops.pallas_encode import encode_blocks_pallas

        def encode_batch(w, l, hl, hs):
            assert hl == 0
            return encode_blocks_pallas(
                w, l, bs, _jax.default_backend() != "tpu")

    window, dict_id = _dict_window(dictionary)
    if window is not None:
        # Every independent block sees the dictionary as history: rows are
        # [64 KB window (right-aligned) | payload], hist_len = WINDOW_SIZE.
        hist_len = WINDOW_SIZE
        hist_start = WINDOW_SIZE - len(window)
        hist_block = np.zeros((nblocks, WINDOW_SIZE), np.uint8)
        hist_block[:, hist_start:] = window
        work = np.concatenate([hist_block, work], axis=1)
    else:
        hist_len = 0
        hist_start = 0

    if encode_batch is None:
        def encode_batch(w, l, hl, hs):
            hs_rows = jnp.broadcast_to(
                jnp.asarray(hs, jnp.int32), (w.shape[0],))
            return encode_blocks_batch(w, l, hl, use_fingerprints, hs_rows)

    if not config.block_checksums and n > 0 and assemble == "device":
        # Device assembly: stitch size words + payloads (incl. stored
        # fallback and EndMark) on device. Keeps the frame device-resident
        # for downstream device consumers; for a host-bound result the
        # default host assembly below is faster on this link (one bulk u8
        # fetch beats the extra device passes + sliced fetch — measured,
        # docs/DESIGN.md round-2 notes).
        from ..ops.assemble_xla import assemble_blocks
        d_work = jnp.asarray(work)
        outs, out_lens = encode_batch(d_work, jnp.asarray(lens), hist_len,
                                      hist_start)
        d_payload = d_work[:, hist_len:] if hist_len else d_work
        cap = nblocks * (4 + bs) + 4
        body, body_total = assemble_blocks(
            jnp.asarray(outs), jnp.asarray(out_lens), d_payload,
            jnp.asarray(lens), cap)
        body_np = np.asarray(body[: int(body_total)].astype(jnp.uint8))
        header = _frame_header_bytes(config, n, dict_id)
        parts = [header, body_np]
        if config.content_checksum:
            ck = np.empty(4, np.uint8)
            write_u32le(ck, 0, xxhash32(raw, 0))
            parts.append(ck)
        return np.concatenate(parts)

    outs, out_lens = _chunked_encode(work, lens, encode_batch, hist_len,
                                     hist_start)
    return _host_assemble(raw, outs, out_lens, lens, nblocks, bs, config,
                          dict_id)


def _compress_independent_split(data, config: FrameConfig,
                                dictionary=None, defer: bool = False):
    """Independent-frame encode via the chain-direct path
    (ops/split_encode): the device builds exhaustive candidate chains (the
    expensive search); the native host greedy-selects, exactly extends, and
    serializes at memcpy-class speed — wire byte-identical to
    engine="hybrid". Stored fallback and frame assembly as the host tier."""
    from ..ops.split_encode import chain_select_serialize, encode_blocks_chain

    raw = ensure_buffer(data)
    n = len(raw)
    bs = config.resolved_block_size
    work, lens, nblocks = _blocks_to_batch(raw, bs)
    window, dict_id = _dict_window(dictionary)
    if window is not None:
        hist_len = WINDOW_SIZE
        hist_start = WINDOW_SIZE - len(window)
        hist_block = np.zeros((nblocks, WINDOW_SIZE), np.uint8)
        hist_block[:, hist_start:] = window
        work = np.concatenate([hist_block, work], axis=1)
    else:
        hist_len = 0
        hist_start = 0

    CH = _FRAME_CHUNK_ROWS
    pend = []
    for i in range(0, nblocks, CH):
        rows = min(CH, nblocks - i)
        target = CH if nblocks > CH else _chunk_rows_bucket(rows)
        w = work[i: i + rows]
        l = lens[i: i + rows]
        if rows < target:
            w = np.concatenate(
                [w, np.zeros((target - rows,) + w.shape[1:], w.dtype)])
            l = np.concatenate([l, np.zeros(target - rows, np.int32)])
        pend.append((i, rows,
                     encode_blocks_chain(w, l, bs, hist_len, hist_start)))
    state = (raw, work, lens, nblocks, bs, hist_len, pend, config, dict_id)
    if defer:
        return state
    return _split_encode_fetch(state)


def _split_encode_fetch(state) -> np.ndarray:
    """Select/serialize/assemble phase of the chain-direct encode.
    Separated so device_compress_frames can queue every frame's chain
    dispatches before the first host serialize (the device computes frame
    k+1's chains while the host serializes frame k)."""
    raw, work, lens, nblocks, bs, hist_len, pend, config, dict_id = state
    from ..ops.split_encode import chain_select_serialize

    comps = [None] * nblocks

    if hist_len == 0:
        # ONE padded copy of the frame instead of a zeros+memcpy per
        # block (8 MB of pure memory traffic per 4 MB batch): row b's
        # work view is raw_pad[b*bs : b*bs+src_len+8]. The 8 slack bytes
        # may be the NEXT block's bytes — harmless: the extension loop
        # clamps at match_limit and only needs them readable.
        raw_pad = np.empty(nblocks * bs + 8, np.uint8)
        raw_np = np.asarray(raw, np.uint8)
        raw_pad[: len(raw_np)] = raw_np
        raw_pad[len(raw_np):] = 0

        def _serialize_one(b, chains_np, k):
            src_len = int(lens[b])
            comps[b] = chain_select_serialize(
                raw_pad[b * bs: b * bs + src_len + 8], 0, src_len,
                chains_np[k])
    else:
        def _serialize_one(b, chains_np, k):
            src_len = int(lens[b])
            wk = np.zeros(hist_len + src_len + 8, np.uint8)
            wk[:hist_len] = work[b, :hist_len]
            wk[hist_len: hist_len + src_len] = raw[b * bs: b * bs + src_len]
            comps[b] = chain_select_serialize(wk, hist_len, src_len,
                                              chains_np[k])

    # The native selector releases the GIL — blocks serialize in parallel
    # on the shared internal pool (a fresh executor costs ~1-2 ms/call).
    from ..utils.pool import host_pool
    ex = host_pool()
    futs = []
    for i, rows, chains in pend:
        chains_np = np.asarray(chains)
        for k in range(rows):
            futs.append(ex.submit(_serialize_one, i + k, chains_np, k))
    for f in futs:
        f.result()

    return _assemble_frame_host(raw, comps, lens, nblocks, bs, config,
                                dict_id)


def _assemble_frame_host(raw, comps, lens, nblocks, bs, config,
                         dict_id) -> np.ndarray:
    """Host frame assembly over per-block wire streams: header, size
    words, stored fallback, optional block checksums, EndMark, content
    checksum."""
    n = len(raw)
    frame = np.empty(19 + n + (n // 255) + 16 * max(nblocks, 1) + 8,
                     np.uint8)
    header = _frame_header_bytes(config, n, dict_id)
    frame[: len(header)] = header
    pos = len(header)
    for b in range(nblocks):
        bsize = int(lens[b])
        comp = comps[b]
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
            frame[pos: pos + bsize] = raw[b * bs: b * bs + bsize]
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


def _compress_linked_split(data, config: FrameConfig,
                           dictionary=None) -> np.ndarray:
    """Linked-frame encode via the chain-direct path: per-block
    [history | payload] rows (the linked chain's serialism is an
    encoder-side illusion — block i's window is known plaintext, see
    _compress_linked), device candidate chains, host select/serialize.
    Wire byte-identical to engine='hybrid' linked frames."""
    from ..ops.split_encode import chain_select_serialize, encode_blocks_chain

    raw = ensure_buffer(data)
    n = len(raw)
    bs = config.resolved_block_size
    work, lens, nblocks = _blocks_to_batch(raw, bs)
    window, dict_id = _dict_window(dictionary)
    dict_len = len(window) if window is not None else 0

    W = WINDOW_SIZE
    hist = np.zeros((nblocks, W), np.uint8)
    for i in range(nblocks):
        avail = min(i * bs, W)
        if avail > 0:
            hist[i, W - avail:] = raw[i * bs - avail: i * bs]
        room = W - avail
        take = min(dict_len, room)
        if take > 0:
            hist[i, room - take: room] = window[dict_len - take:]
    work_h = np.concatenate([hist, work], axis=1)
    valid = np.minimum(np.arange(nblocks, dtype=np.int64) * bs + dict_len, W)
    hist_start = (W - valid).astype(np.int32)

    CH = _FRAME_CHUNK_ROWS
    pend = []
    for i in range(0, nblocks, CH):
        rows = min(CH, nblocks - i)
        target = CH if nblocks > CH else _chunk_rows_bucket(rows)
        w = work_h[i: i + rows]
        l = lens[i: i + rows]
        hs = hist_start[i: i + rows]
        if rows < target:
            w = np.concatenate(
                [w, np.zeros((target - rows,) + w.shape[1:], w.dtype)])
            l = np.concatenate([l, np.zeros(target - rows, np.int32)])
            hs = np.concatenate([hs, np.full(target - rows, W, np.int32)])
        pend.append((i, rows,
                     encode_blocks_chain(w, l, bs, W, jnp.asarray(hs))))

    comps = [None] * nblocks

    def _serialize_one(b, chains_np, k):
        src_len = int(lens[b])
        wk = np.zeros(W + src_len + 8, np.uint8)
        wk[:W] = hist[b]
        wk[W: W + src_len] = raw[b * bs: b * bs + src_len]
        comps[b] = chain_select_serialize(wk, W, src_len, chains_np[k])

    from ..utils.pool import host_pool
    ex = host_pool()
    futs = []
    for i, rows, chains in pend:
        chains_np = np.asarray(chains)
        for k in range(rows):
            futs.append(ex.submit(_serialize_one, i + k, chains_np, k))
    for f in futs:
        f.result()
    return _assemble_frame_host(raw, comps, lens, nblocks, bs, config,
                                dict_id)


# Device-dispatch granularity for the frame paths: fixed-shape chunks keep
# the compile cache to a handful of shapes across all corpus sizes, and
# queueing chunk k+1's host->device transfer while chunk k computes overlaps
# the host link with the kernel (measured win, docs/DESIGN.md round-2).
# Decode chunks are larger: its host->device leg is small (compressed
# bytes), so overlap buys little and per-dispatch latency dominates.
_FRAME_CHUNK_ROWS = 32
_FRAME_CHUNK_ROWS_DEC = 64


def _chunk_rows_bucket(rows: int) -> int:
    return -(-rows // 8) * 8


def _chunked_encode(work: np.ndarray, lens: np.ndarray, encode_batch,
                    hist_len: int, hist_start):
    """Run encode_batch over fixed-shape row chunks, async-queued; returns
    (outs u8[nb, W], out_lens i32[nb]) fetched in order."""
    nb = work.shape[0]
    CH = _FRAME_CHUNK_ROWS
    parts = []
    for i in range(0, nb, CH):
        w = work[i: i + CH]
        l = lens[i: i + CH]
        rows = w.shape[0]
        target = CH if nb > CH else _chunk_rows_bucket(rows)
        if rows < target:
            w = np.concatenate(
                [w, np.zeros((target - rows, w.shape[1]), w.dtype)])
            l = np.concatenate([l, np.zeros(target - rows, np.int32)])
        o, ol = encode_batch(jnp.asarray(w), jnp.asarray(l), hist_len,
                             hist_start)
        parts.append((jnp.asarray(o).astype(jnp.uint8), ol, rows))
    outs = np.concatenate([np.asarray(o)[:r] for o, _, r in parts])
    out_lens = np.concatenate([np.asarray(ol)[:r] for _, ol, r in parts])
    return outs, out_lens


def _host_assemble(raw, outs, out_lens, lens, nblocks, bs,
                   config: FrameConfig, dict_id) -> np.ndarray:
    """Stitch the frame on host from (already fetched, u8) kernel outputs:
    header, per-block size words, stored fallback, EndMark, checksums."""
    n = len(raw)
    frame = np.empty(19 + n + (n // 255) + (16 + 8) * nblocks + 8,
                     dtype=np.uint8)
    header = _frame_header_bytes(config, n, dict_id)
    frame[: len(header)] = header
    pos = len(header)

    if n > 0:
        for i in range(nblocks):
            bsize = int(lens[i])
            comp_len = int(out_lens[i])
            if 0 < comp_len < bsize:
                write_u32le(frame, pos, comp_len)
                pos += 4
                frame[pos: pos + comp_len] = outs[i, :comp_len]
                pos += comp_len
                data_start = pos - comp_len
            else:
                write_u32le(frame, pos, bsize | UNCOMPRESSED_FLAG)
                pos += 4
                frame[pos: pos + bsize] = raw[i * bs: i * bs + bsize]
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


def parse_block_index(buf: np.ndarray, verify_checksum: bool = True):
    """Host scan of a frame's block table.

    Returns (header, blocks, tail_pos) where blocks is a list of
    (data_offset, size, is_stored) and header is a dict of parsed fields.
    The scan touches only the 4-byte size words — O(nblocks), not O(n).

    Every declared block size is bounds-checked against the buffer and the
    EndMark must be present: a truncated or corrupt frame raises
    "LZ4: Malformed Input" here instead of zero-padding rows into the device
    decoders (which would emit clipped wrong output). The header-checksum
    byte is verified unless *verify_checksum* is False.
    """
    n = len(buf)
    if n < 7 or read_u32le(buf, 0) != MAGIC_NUMBER:
        raise ValueError("LZ4: Invalid Magic Number")
    pos = 4
    flg = int(buf[pos]); pos += 1
    if (flg & FLG_VERSION_MASK) >> 6 != LZ4_VERSION:
        raise ValueError("LZ4: Unsupported Version")
    bd = int(buf[pos]); pos += 1
    header = {
        "independent": bool(flg & 0x20),
        "block_checksums": bool(flg & FLG_BLOCK_CHECKSUM),
        "content_size": None,
        "content_checksum": bool(flg & FLG_CONTENT_CHECKSUM),
        "dict_id": None,
        "block_max": {4: 65536, 5: 262144, 6: 1048576, 7: 4194304}.get(
            (bd >> 4) & 0x07, 4194304),
    }
    if flg & FLG_CONTENT_SIZE:
        if pos + 8 > n:
            raise ValueError("LZ4: Malformed Input")
        header["content_size"] = read_u32le(buf, pos) | (
            read_u32le(buf, pos + 4) << 32)
        pos += 8
    if flg & FLG_DICT_ID:
        if pos + 4 > n:
            raise ValueError("LZ4: Malformed Input")
        header["dict_id"] = read_u32le(buf, pos)
        pos += 4
    if pos >= n:
        raise ValueError("LZ4: Malformed Input")
    if verify_checksum:
        expect_hc = (xxhash32(buf[4:pos], 0) >> 8) & 0xFF
        if int(buf[pos]) != expect_hc:
            raise ValueError("LZ4: Header Checksum Error")
    pos += 1  # header checksum

    blocks = []
    saw_end = False
    while pos + 4 <= n:
        word = read_u32le(buf, pos)
        pos += 4
        if word == 0:
            saw_end = True
            break
        size = word & BLOCK_SIZE_MASK
        # Spec: "Block Size shall not exceed Block Maximum Size". Enforcing
        # it here also bounds the device decoders' comp-row allocation
        # against hostile size words.
        if size > header["block_max"]:
            raise ValueError("LZ4: Malformed Input")
        need = size + (4 if header["block_checksums"] else 0)
        if pos + need > n:
            raise ValueError("LZ4: Malformed Input")
        blocks.append((pos, size, bool(word & UNCOMPRESSED_FLAG)))
        pos += need
    if not saw_end:
        raise ValueError("LZ4: Malformed Input")
    return header, blocks, pos


def device_decompress_frame(data, verify_checksum: bool = True,
                            decode_batch=None,
                            engine: str = "xla",
                            dictionary=None,
                            split_sharded=None) -> np.ndarray:
    """Decompress an LZ4 frame with batched device block decode.

    Independent frames decode fully data-parallel. Linked frames decode as a
    sequential chain of device calls carrying the 64 KB window.

    engine: "xla" (two-phase data-parallel kernel), "pallas" (the
    scalar-interpreter kernel, ops/pallas_decode.py), or "split" (host
    record parse + interleaved all-vector copy kernel,
    ops/pallas_split_decode.py — the fastest per chip; falls back to the
    pallas machinery for linked frames and >256 KB blocks).

    A frame built with a dictionary (FLG dictID set) REQUIRES *dictionary*
    and verifies its xxh32 id — matching the stream decoder's strictness
    (lz4Decode.js:165-179); the history window feeds the device kernels'
    hist inputs so back-references into the dictionary resolve exactly.
    """
    buf = ensure_buffer(data)
    header, blocks, tail = parse_block_index(buf, verify_checksum)
    bs = header["block_max"]

    window, dict_id = _dict_window(dictionary)
    if header["dict_id"] is not None:
        if window is None:
            raise ValueError("LZ4: Frame requires a Dictionary")
        if dict_id != header["dict_id"]:
            raise ValueError("LZ4: Dictionary ID Mismatch")

    if verify_checksum and header["block_checksums"]:
        for off, size, _ in blocks:
            stored = read_u32le(buf, off + size)
            if stored != xxhash32(buf[off: off + size], 0):
                raise ValueError("LZ4: Block Checksum Error")

    result = None
    if not blocks:
        result = np.empty(0, dtype=np.uint8)
    elif (header["independent"] and engine == "split"
          and decode_batch is None and bs <= _SPLIT_MAX_BS):
        result = _decode_independent_split(buf, blocks, bs, window,
                                           sharded=split_sharded)
    elif (header["independent"] and engine == "split"
          and decode_batch is None):
        # Big blocks: ONE wave-kernel dispatch for the whole frame body
        # (window resets per block on device — spec semantics). None =
        # giant-RLE piece / pathological record density, fall through.
        from ..ops.wave_decode import decompress_frame_waves
        result = decompress_frame_waves(buf, blocks, header, window)
    elif (header["independent"] and engine == "pallas"
          and decode_batch is None):
        if _pallas_indep_fits(buf, blocks, bs, window):
            result = _decode_independent_pallas(buf, blocks, bs, window)
        else:
            # Big blocks: piece-scan + chained Pallas kernel; None means a
            # piece exceeded capacity (giant RLE) — fall through to XLA.
            from .bigblock import decompress_frame_big
            result = decompress_frame_big(buf, blocks, header, window)
    elif (not header["independent"] and engine == "split"
          and decode_batch is None):
        result = _decode_linked_split(buf, blocks, bs, window, bs)
    elif (not header["independent"] and engine == "pallas"
          and decode_batch is None and bs > _PALLAS_LINKED_MAX_BS):
        from .bigblock import decompress_frame_big
        result = decompress_frame_big(buf, blocks, header, window)
    if result is None:
        if header["independent"]:
            result = _decode_independent(buf, blocks, bs, decode_batch,
                                         window)
        elif (engine in ("pallas", "split") and decode_batch is None
              and bs <= _PALLAS_LINKED_MAX_BS):
            result = _decode_linked_pallas(buf, blocks, bs, window)
        else:
            result = _decode_linked(buf, blocks, bs, window)

    if header["content_checksum"] and verify_checksum:
        if tail + 4 > len(buf):
            raise ValueError("LZ4: Malformed Input")
        stored = read_u32le(buf, tail)
        if stored != xxhash32(result, 0):
            raise ValueError("LZ4: Content Checksum Error")
    return result


def _bucket_pow2(n: int, floor: int = 4096) -> int:
    b = floor
    while b < n:
        b <<= 1
    return b


def _decode_independent(buf, blocks, bs, decode_batch=None,
                        window=None) -> np.ndarray:
    nb = len(blocks)
    # Phase A of the decode kernel scales with the padded compressed width;
    # bucket it to the batch's actual maximum instead of the worst-case
    # bound (typically 3-4x smaller on compressible data).
    max_comp = max((size for _, size, stored in blocks if not stored),
                   default=1)
    m_cap = min(_bucket_pow2(max_comp), block_bound(bs))
    comp = np.zeros((nb, m_cap), dtype=np.uint8)
    lens = np.zeros(nb, dtype=np.int32)
    stored_rows = {}
    for i, (off, size, stored) in enumerate(blocks):
        if stored:
            stored_rows[i] = buf[off: off + size]
        else:
            comp[i, :size] = buf[off: off + size]
            lens[i] = size
    if window is not None:
        hist = np.zeros((nb, WINDOW_SIZE), dtype=np.uint8)
        hist[:, WINDOW_SIZE - len(window):] = window  # right-aligned
        d_hist = jnp.asarray(hist)
    else:
        # all-zero history: materialized on device, never transferred
        d_hist = jnp.zeros((nb, WINDOW_SIZE), jnp.uint8)
    if decode_batch is None:
        def decode_batch(c, l, h):
            return decode_blocks_batch(c, l, h, bs)
    outs, out_lens = decode_batch(jnp.asarray(comp), jnp.asarray(lens),
                                  d_hist)

    if not stored_rows:
        # Fast path: drop row padding on device, one contiguous result.
        from ..ops.assemble_xla import concat_blocks
        flat, total = concat_blocks(jnp.asarray(outs), jnp.asarray(out_lens),
                                    nb * bs)
        return np.asarray(flat[: int(total)].astype(jnp.uint8))

    outs = np.asarray(jnp.asarray(outs).astype(jnp.uint8))
    out_lens = np.asarray(out_lens)
    parts = []
    for i in range(nb):
        if i in stored_rows:
            parts.append(stored_rows[i])
        else:
            parts.append(outs[i, : int(out_lens[i])])
    return np.concatenate(parts) if parts else np.empty(0, np.uint8)


def _rows_bucket(nb: int) -> int:
    b = 4
    while b < nb:
        b <<= 1
    return b


def _compress_linked(data, config: FrameConfig,
                     use_fingerprints: bool, dictionary=None,
                     encode_batch=None,
                     assemble: str = "host") -> np.ndarray:
    """Linked-frame device encode — DATA-PARALLEL, not a serial scan.

    The linked chain's serialism is an encoder-side illusion: block i's 64 KB
    window is the last 64 KB of *plaintext* before it, which is known from
    the input up front. Each block therefore encodes independently with its
    own history slice — the same per-block kernel inputs the round-1 lax.scan
    produced serially (byte-identical frames), but batched/shardable across
    chips (SURVEY §2.6 "tail-window" parallelization; the chain being
    parallelized is lz4Encode.js:262-295). Only DECODE of linked frames is
    truly sequential (each block's output feeds the next window).
    """
    if config.block_checksums:
        # Device assembly does not interleave block checksums; the host
        # frame layer covers that configuration.
        from ..frame import compress_frame
        return compress_frame(data, dictionary, config)

    raw = ensure_buffer(data)
    n = len(raw)
    bs = config.resolved_block_size
    work, lens, nblocks = _blocks_to_batch(raw, bs)

    window, dict_id = _dict_window(dictionary)
    dict_len = len(window) if window is not None else 0

    # Per-row history: row i sees the last 64 KB of plaintext before its
    # block (dictionary tail for row 0, right-aligned).
    W = WINDOW_SIZE
    hist = np.zeros((nblocks, W), np.uint8)
    for i in range(nblocks):
        avail = min(i * bs, W)
        if avail > 0:
            hist[i, W - avail:] = raw[i * bs - avail: i * bs]
        room = W - avail
        take = min(dict_len, room)
        if take > 0:
            hist[i, room - take: room] = window[dict_len - take:]
    work_h = np.concatenate([hist, work], axis=1)
    # First valid history index per row (everything below is zero padding).
    valid = np.minimum(np.arange(nblocks, dtype=np.int64) * bs + dict_len, W)
    hist_start = (W - valid).astype(np.int32)

    if encode_batch is None:
        outs, out_lens = encode_blocks_batch(
            jnp.asarray(work_h), jnp.asarray(lens), W, use_fingerprints,
            jnp.asarray(hist_start))
    else:
        outs, out_lens = encode_batch(work_h, lens, W, hist_start)

    lcfg = config.with_(block_independence=False)
    if assemble == "device":
        from ..ops.assemble_xla import assemble_blocks
        cap = nblocks * (4 + bs) + 4
        body, body_total = assemble_blocks(
            jnp.asarray(outs[:nblocks]), jnp.asarray(out_lens[:nblocks]),
            jnp.asarray(work[:nblocks]), jnp.asarray(lens[:nblocks]), cap)
        body_np = np.asarray(body[: int(body_total)].astype(jnp.uint8))
        header = _frame_header_bytes(lcfg, n, dict_id)
        parts = [header, body_np]
        if config.content_checksum:
            ck = np.empty(4, np.uint8)
            write_u32le(ck, 0, xxhash32(raw, 0))
            parts.append(ck)
        return np.concatenate(parts)
    outs_np = np.asarray(jnp.asarray(outs[:nblocks]).astype(jnp.uint8))
    out_lens_np = np.asarray(out_lens[:nblocks])
    return _host_assemble(raw, outs_np, out_lens_np, lens[:nblocks],
                          nblocks, bs, lcfg, dict_id)


def _decode_independent_pallas(buf, blocks, bs, window=None) -> np.ndarray:
    """Independent-frame decode via the Pallas scalar-interpreter kernel."""
    import jax

    from ..ops.pallas_decode import SLACK
    from ..ops.pallas_decode import _round_up as _ru

    nb = len(blocks)
    any_stored = False
    max_comp = 1
    for _, size, stored in blocks:
        if stored:
            any_stored = True
        else:
            max_comp = max(max_comp, size)
    # pow2 bucket keeps the compile cache warm across frames
    M = _bucket_pow2(_ru(max_comp + SLACK, 1024), 1024)
    comp = np.zeros((nb, M), np.uint8)
    lens = np.zeros(nb, np.int32)
    sizes = np.zeros(nb, np.int32)       # wire size (stored = plain size)
    stored_mask = np.zeros(nb, np.int32)
    for i, (off, size, stored) in enumerate(blocks):
        sizes[i] = size
        if stored:
            stored_mask[i] = 1
        else:
            comp[i, :size] = buf[off: off + size]
            lens[i] = size
    use_history = window is not None
    interpret = jax.default_backend() != "tpu"

    # Fused per-chunk device programs (decode + row concat + u8 narrowing,
    # one dispatch each) over fixed-shape row chunks, async-queued so chunk
    # k+1's transfer overlaps chunk k's compute; per-program round trips
    # through the host link cost tens of ms each (measured, docs/DESIGN.md
    # round-2 notes).
    CH = _FRAME_CHUNK_ROWS_DEC
    hist_base = None
    if use_history:
        hist_base = np.zeros((CH, WINDOW_SIZE), np.uint8)
        hist_base[:, WINDOW_SIZE - len(window):] = window
    chunks = []
    for i in range(0, nb, CH):
        rows = min(CH, nb - i)
        target = CH if nb > CH else _chunk_rows_bucket(rows)

        def pad(a):
            if rows == target:
                return a[i: i + rows]
            return np.concatenate(
                [a[i: i + rows],
                 np.zeros((target - rows,) + a.shape[1:], a.dtype)])

        if use_history:
            d_hist = jnp.asarray(hist_base[:target])
        else:
            d_hist = jnp.zeros((target, WINDOW_SIZE), jnp.uint8)
        flat, total, row_lens = _pallas_decode_concat(
            jnp.asarray(pad(comp)), jnp.asarray(pad(lens)),
            jnp.asarray(pad(sizes)), jnp.asarray(pad(stored_mask)),
            d_hist, bs, use_history, interpret)
        chunks.append((flat, total, row_lens))
    out = np.concatenate(
        [np.array(f)[: int(t)] for f, t, _ in chunks])  # writable u8
    if any_stored:
        # Stored rows were concatenated as garbage placeholders of their
        # true size — patch them straight from the wire bytes. starts[i]
        # indexes by GLOBAL block position: this relies on chunk padding
        # only ever appearing after the last real block (pad rows have
        # row_len 0, so trailing pads cannot shift any real start).
        row_lens = np.concatenate([np.asarray(rl) for _, _, rl in chunks])
        assert len(row_lens) >= nb and not row_lens[nb:].any()
        starts = np.concatenate([[0], np.cumsum(row_lens[:-1])])
        for i, (off, size, stored) in enumerate(blocks):
            if stored:
                out[starts[i]: starts[i] + size] = buf[off: off + size]
    return out


@_functools.partial(jax.jit,
                    static_argnames=("bs", "use_history", "interpret"))
def _pallas_decode_concat(comp, lens, sizes, stored, hist, bs: int,
                          use_history: bool, interpret: bool):
    """Fused device program: Pallas block decode -> ordered row concat
    (stored rows reserve their wire size) -> u8 narrowing."""
    from ..ops.assemble_xla import concat_blocks
    from ..ops.pallas_decode import decode_blocks_pallas

    outs, out_lens = decode_blocks_pallas(comp, lens, hist, bs, use_history,
                                          interpret)
    row_lens = jnp.where(stored > 0, sizes, out_lens)
    flat, total = concat_blocks(outs, row_lens, comp.shape[0] * bs)
    return flat.astype(jnp.uint8), total, row_lens


def _pallas_indep_fits(buf, blocks, bs, window) -> bool:
    """Whether the batched Pallas decoder's per-block VMEM footprint fits
    (large blocks — e.g. the 4 MB default — fall back to the XLA kernel)."""
    from ..ops.pallas_decode import SLACK, VMEM_BUDGET, pallas_row_bytes
    from ..ops.pallas_decode import _round_up as _ru

    max_comp = max((size for _, size, stored in blocks if not stored),
                   default=1)
    M = _bucket_pow2(_ru(max_comp + SLACK, 1024), 1024)
    return pallas_row_bytes(bs, M, window is not None) <= VMEM_BUDGET


# Linked-chain Pallas decode keeps the whole chunk's io region
# ([64 KB window | outputs]) in VMEM; larger block sizes fall back to the
# XLA scan.
_PALLAS_LINKED_MAX_BS = 262144

def _decode_linked_split(buf, blocks, bs, window, block_max) -> np.ndarray:
    """Linked-frame decode via the wave kernel: every block scans into
    <= 64 KB-output pieces (bigblock.scan_pieces — O(wire), gives out_len
    up front), then the whole frame decodes as one dependent chain in ONE
    kernel dispatch (the window carries across grid steps in VMEM
    scratch)."""
    from ..ops.wave_decode import decompress_frame_waves

    header = {"independent": False, "block_max": block_max}
    return decompress_frame_waves(buf, blocks, header, window)

# Split decode (host record parse + interleaved copy kernel) keeps each
# block's full io image in VMEM per way; beyond this the big-block router
# takes over.
_SPLIT_MAX_BS = 262144


def stage_sharded_tiers(wire, recs, counts, sizes, bs, ndev, io_bytes,
                        rw, use_history, hist, dec_fn, interpret):
    """Per-tier SHARDED dispatches (VERDICT r4 #2): shard_map programs are
    SPMD — every shard traces the same kernel shapes — so a per-shard
    interleave width is impossible inside ONE dispatch. The TPU-native fix
    is the same bucketing the single-device path uses, lifted over the
    mesh: partition the count-sorted blocks into density tiers, then queue
    one shard_map dispatch PER TIER at that tier's own (cap, ways), rows
    striped across devices so shard totals balance. One dense straggler
    now costs one narrow dispatch instead of pinning every shard's whole
    batch at ways=2.

    Tier sizing vs the mesh: device parallelism beats intra-core
    interleave, so a tier smaller than ndev*ways SHRINKS ITS WAYS (powers
    of two) before giving up mesh spread — padding a 4-row tier to
    ndev*ways rows replicates dense work up to ways-fold (measured 0.62x
    at 8 devices). A tier with fewer rows than devices dispatches
    UNSHARDED on the default device instead.

    dec_fn(wire, recs, trips, hist, use_history, bs, ways) is the
    shard_map-wrapped decode_blocks_wire (parallel/sharding.py); ways is
    passed through explicitly — replanning on the tier's narrowed wire
    could pick a wider interleave than the trips were grouped for.

    Returns [(row_indices, out_device_array)] with outputs still queued
    (async)."""
    from ..ops.pallas_split_decode import grouped_trips

    plans = plan_sharded_tiers(counts, sizes, ndev, io_bytes, rw,
                               wire.shape[1],
                               use_history=use_history)
    staged = []
    for rows, cap_c, w, wcap, is_sharded in plans:
        staged.append((
            rows, w, is_sharded,
            jnp.asarray(np.ascontiguousarray(wire[rows, :wcap])),
            jnp.asarray(np.ascontiguousarray(recs[rows, :cap_c])),
            jnp.asarray(grouped_trips(counts[rows], w)),
            jnp.asarray(hist[rows]) if use_history else None))
    return dispatch_sharded_tiers(staged, bs, use_history, dec_fn,
                                  interpret)


def plan_sharded_tiers(counts, sizes, ndev, io_bytes, rw, wire_cap,
                       use_history: bool = False):
    """Pure planning half of stage_sharded_tiers (no array slicing — the
    dryrun times the dispatch phase alone against this plan). Returns
    [(rows, cap, ways, wcap, sharded)] where *rows* is the final
    padded/striped row-index layout for the dispatch."""
    from ..ops.pallas_split_decode import partition_by_plan
    from ..ops.pallas_split_decode import SLACK as SP_SLACK
    from ..ops.pallas_split_decode import W as SP_W
    from ..ops.pallas_split_decode import _round_up as _ru

    order = np.argsort(counts, kind="stable")
    plans = []
    for sel_t, cap_c, ways_c in partition_by_plan(
            counts, order, rw, wire_cap, io_bytes,
            SP_W if use_history else 0):
        # per-tier wire width: ship only this tier's max image
        wcap = _ru(int(sizes[sel_t].max(initial=0)) + SP_SLACK, 1024)
        w = ways_c
        while w > 1 and len(sel_t) < ndev * w:
            w //= 2
        if len(sel_t) < ndev:
            # Too few rows to use the mesh: single-device dispatch padded
            # only to its own interleave.
            padn = (-len(sel_t)) % w
            # pad with the tier's SPARSEST row: pads share a group with
            # denser rows, so a low count rides free under the group's
            # trip bound (a dense pad would replicate the tier's worst
            # row — measured to erase the 2-device win entirely)
            sel_p = np.concatenate(
                [sel_t, np.full(padn, sel_t[0], np.int64)]) \
                if padn else sel_t
            plans.append((sel_p, cap_c, w, wcap, False))
            continue
        unit = ndev * w
        padn = (-len(sel_t)) % unit
        # sparsest-row pads (see above)
        sel_p = np.concatenate(
            [sel_t, np.full(padn, sel_t[0], np.int64)]) \
            if padn else sel_t
        # stripe sorted blocks across devices: device d takes rows
        # d::ndev (balanced totals; within a device, counts stay sorted
        # so interleave groups run similar trips)
        stripe = np.concatenate([sel_p[d::ndev] for d in range(ndev)])
        plans.append((stripe, cap_c, w, wcap, True))
    return plans


def dispatch_sharded_tiers(staged, bs, use_history, dec_fn, interpret):
    """Dispatch half of stage_sharded_tiers: queue one kernel call per
    staged tier (sharded via dec_fn, or plain decode_blocks_wire for the
    unsharded fallback). staged rows/arrays come from plan_sharded_tiers'
    layout. Returns [(rows, out)] (async)."""
    from ..ops.pallas_split_decode import decode_blocks_wire

    pend = []
    for rows, w, is_sharded, d_wire, d_recs, d_trips, d_hist in staged:
        if is_sharded:
            out = dec_fn(d_wire, d_recs, d_trips, d_hist, use_history,
                         bs, w)
        else:
            out = decode_blocks_wire(d_wire, d_recs, d_trips, bs,
                                     use_history, d_hist, interpret,
                                     ways=w)
        pend.append((rows, out))
    return pend


def stage_sharded_compact(wire, recs_l, counts, out_lens, wire_w, bs,
                          ndev, hist=None):
    """Sharded staging for the COMPACT-stream kernel (round 5): stripe
    count-sorted rows across the mesh, build an EQUAL-LENGTH flat record
    stream PER SHARD (shard-local word bases and trips), chunk dispatches
    so each shard's resident stream fits SMEM_COMPACT_WORDS. Compact
    planning is VMEM-bound only, so ways is uniform across shards (8 at
    <= 64 KB blocks) and the SPMD one-shape-per-dispatch constraint costs
    nothing — no density tiers needed at narrow shapes (the padded
    per-tier machinery remains for wide blocks).

    Returns staged = [(stripe, ways, pair, wire_rows, words2d, bases2d,
    trips2d, hist_rows | None)] as HOST arrays (the shard_map wrapper
    device_puts with the mesh sharding); ways/pair are PER CHUNK — a
    dense chunk whose single group would bust the per-shard resident
    budget shrinks its own interleave (see stage_compact)."""
    from ..ops.pallas_split_decode import (
        SMEM_COMPACT_WORDS, _group_words, build_compact_batch,
        plan_ways_compact)
    from ..ops.pallas_split_decode import SLACK as SP_SLACK
    from ..ops.pallas_split_decode import W as SP_W
    from ..ops.pallas_split_decode import _round_up as _ru

    use_history = hist is not None
    io_bytes = _ru((SP_W if use_history else 0) + bs + SP_SLACK, 1024)
    ways0 = plan_ways_compact(wire.shape[1], io_bytes,
                              SP_W if use_history else 0)
    order = np.argsort(counts, kind="stable")
    staged = []
    i, n = 0, len(order)
    while i < n:
        # Per-chunk interleave (sorted order: the chunk's first band is
        # its sparsest — an over-budget later band starts the next chunk
        # where it is first).
        ways = ways0
        pair = max(1, 32 // ways)
        while ways > 1:
            bmax = int(counts[order[i: i + ndev * ways]].max(initial=1))
            if _group_words(bmax, ways, pair) <= SMEM_COMPACT_WORDS:
                break
            ways //= 2
            pair = max(1, 32 // ways)
        unit = ndev * ways
        # greedy chunking by a per-shard worst-band bound: a band of
        # `unit` sorted rows stripes to ONE group per shard, each group
        # costing at most the band-max words
        j, w_bound = i, 0
        while j < n:
            bmax = int(counts[order[j: j + unit]].max(initial=1))
            bw = _group_words(bmax, ways, pair)
            if j > i and w_bound + bw > SMEM_COMPACT_WORDS:
                break
            w_bound += bw
            j += unit
        sel = order[i: min(j, n)]
        i = min(j, n)
        padn = (-len(sel)) % unit
        sel_p = np.concatenate([sel, np.full(padn, sel[0], np.int64)]) \
            if padn else sel
        stripe = np.concatenate([sel_p[d::ndev] for d in range(ndev)])
        rpd = len(sel_p) // ndev
        words_l, bases_l, trips_l = [], [], []
        for d in range(ndev):
            wd, bd, td = build_compact_batch(
                recs_l, counts, stripe[d * rpd:(d + 1) * rpd],
                ways, pair, bs)
            words_l.append(wd)
            bases_l.append(bd)
            trips_l.append(td)
        L = _ru(max(len(w) for w in words_l), 16384)
        words2d = np.zeros((ndev, L), np.int32)
        for d, wd in enumerate(words_l):
            words2d[d, : len(wd)] = wd
        bases2d = np.stack(bases_l)
        trips2d = np.stack(trips_l)
        wcap = _ru(int(wire_w[sel].max(initial=0)) + SP_SLACK, 1024)
        staged.append((
            stripe, ways, pair,
            np.ascontiguousarray(wire[stripe, :wcap]), words2d,
            bases2d, trips2d,
            np.ascontiguousarray(hist[stripe]) if use_history else None))
    return staged


def _merge_sharded_pend(nb, pend, out_lens):
    """Fetch queued sharded-decode outputs and splice rows back into
    frame order (first occurrence wins — pads repeat a real row)."""
    outs = [None] * nb
    for rows, out in pend:
        out_np = np.asarray(out)
        for k, b in enumerate(rows):
            if outs[b] is None:
                outs[b] = out_np[k]
    return np.concatenate(
        [outs[i][: int(out_lens[i])] for i in range(nb)]) \
        if nb else np.empty(0, np.uint8)


def _decode_independent_split(buf, blocks, bs, window=None,
                              sharded=None, defer: bool = False):
    """Independent-frame decode via the WIRE-DIRECT split path (round 4,
    ops/pallas_split_decode v2): the host parser emits compact records
    (~one per LZ4 sequence, 6 B each) and the device kernel copies literal
    slices straight from the compressed bytes — the link ships 1x wire
    instead of a placed-literal image. Stored blocks become pure-literal
    record runs over their own wire image. Blocks are batch-sorted by
    record count so interleave groups run similar trip counts; dispatches
    queue async (the host parse of later work overlaps earlier kernels)
    and results are fetched once at the end.

    sharded: optional (ndev, dec_fn) — one dispatch over a device mesh.
    Sorted blocks are STRIPED across devices (balanced record counts);
    rows pad to ndev*ways so every shard's groups align; dec_fn is the
    shard_map-wrapped decode_blocks_wire (parallel/sharding.py)."""
    import jax

    from ..ops.pallas_split_decode import (
        decode_blocks_wire, dispatch_compact, grouped_trips,
        parse_wire_batch, parse_wire_raw)
    from ..ops.pallas_split_decode import SLACK as SP_SLACK
    from ..ops.pallas_split_decode import W as SP_W
    from ..ops.pallas_split_decode import _round_up as _ru

    nb = len(blocks)
    use_history = window is not None
    io_bytes = _ru((SP_W if use_history else 0) + bs + SP_SLACK, 1024)
    entries = [(buf[off: off + size], stored) for off, size, stored in blocks]
    interpret = jax.default_backend() != "tpu"

    max_wire = max((size for _, size, _ in blocks), default=1)
    if sharded is not None and len(sharded) > 2 and bs <= 65536 \
            and max_wire <= 65536:
        # Sharded COMPACT path: per-shard flat streams over the mesh
        # (round 5; ways uniform, no density tiers at narrow shapes).
        ndev, _, dec_fn_c = sharded
        wire, recs_l, counts, out_lens, hist = parse_wire_raw(
            entries, bs, window)
        wire_w = np.array([size for _, size, _ in blocks], np.int64) \
            if nb else np.zeros(0, np.int64)
        staged = stage_sharded_compact(
            wire, recs_l, counts, out_lens, wire_w, bs, ndev, hist)
        pend = [(stripe,
                 dec_fn_c(w_, wd_, b_, t_, h_, use_history, bs, c_ways,
                          c_pair))
                for stripe, c_ways, c_pair, w_, wd_, b_, t_, h_ in staged]
        return _merge_sharded_pend(nb, pend, out_lens)

    if sharded is None and bs <= 65536 and max_wire <= 65536:
        # COMPACT-stream path (round 5): flat scalar-prefetched record
        # stream + per-way bases — no per-way cap window, so dense tiers
        # keep ways=8 and the link ships ~8 B/record (654.9 vs 443.7
        # MB/s kernel on the bench mix; 0.23x plaintext shipped on the
        # reference corpus). The padded-window kernel remains for wide
        # blocks and the sharded path.
        wire, recs_l, counts, out_lens, hist = parse_wire_raw(
            entries, bs, window)
        wire_w = np.array([size for _, size, _ in blocks], np.int64) \
            if nb else np.zeros(0, np.int64)
        pend = dispatch_compact(wire, recs_l, counts, out_lens, wire_w,
                                bs, interpret, hist=hist)
        if defer:
            return (nb, pend, out_lens)
        return _split_decode_fetch((nb, pend, out_lens))

    wire, recs, counts, out_lens, hist = parse_wire_batch(entries, bs,
                                                          window)
    rw = 2 if recs.dtype == np.uint16 else 3

    order = np.argsort(counts, kind="stable")

    if sharded is not None:
        ndev, dec_fn = sharded[0], sharded[1]
        sizes = np.array([size for _, size, _ in blocks], np.int64) \
            if nb else np.zeros(0, np.int64)
        pend = stage_sharded_tiers(
            wire, recs, counts, sizes, bs, ndev, io_bytes, rw,
            use_history, hist, dec_fn, interpret)
        return _merge_sharded_pend(nb, pend, out_lens)

    CH = _FRAME_CHUNK_ROWS_DEC
    pend = []
    from ..ops.pallas_split_decode import partition_by_plan
    # Partition the sorted order into density tiers FIRST (each tier gets
    # its own record cap + interleave width — one dense straggler no
    # longer caps the whole batch at ways=2), then chunk each tier to the
    # canonical row shapes.
    sizes = np.array([size for _, size, _ in blocks], np.int64) \
        if nb else np.zeros(0, np.int64)
    for sel_t, cap_c, ways_c in partition_by_plan(
            counts, order, rw, wire.shape[1], io_bytes,
            SP_W if use_history else 0):
        # per-tier wire width: ship only this tier's max image
        wcap = _ru(int(sizes[sel_t].max(initial=0)) + SP_SLACK, 1024)
        for i in range(0, len(sel_t), CH):
            rows = min(CH, len(sel_t) - i)
            sel = sel_t[i: i + rows]
            cnt_c = counts[sel]
            target = CH if len(sel_t) > CH \
                else max(_chunk_rows_bucket(rows), ways_c)
            wire_c = np.ascontiguousarray(wire[sel, :wcap])
            recs_c = np.ascontiguousarray(recs[sel, :cap_c])
            if rows < target:
                pad = target - rows
                wire_c = np.concatenate(
                    [wire_c, np.zeros((pad,) + wire_c.shape[1:], np.uint8)])
                recs_c = np.concatenate(
                    [recs_c,
                     np.zeros((pad,) + recs_c.shape[1:], recs.dtype)])
                cnt_c = np.concatenate([cnt_c, np.zeros(pad, np.int32)])
            # Trips must follow THIS chunk's actual row layout (sorted
            # rows + zero-count pads at the end) — build_sorted_batch
            # would re-sort and misassign group bounds when a chunk spans
            # several groups.
            trips = grouped_trips(cnt_c, ways_c)
            hist_c = None
            if use_history:
                hist_c = hist[sel]
                if rows < target:
                    hist_c = np.concatenate(
                        [hist_c,
                         np.zeros((target - rows, SP_W), np.uint8)])
                hist_c = jnp.asarray(hist_c)
            # ways passed EXPLICITLY: replanning inside on the narrowed
            # per-tier wire width can pick a wider interleave than these
            # trips were grouped for (silent corruption — review find).
            out = decode_blocks_wire(
                jnp.asarray(wire_c), jnp.asarray(recs_c),
                jnp.asarray(trips), bs, use_history, hist_c, interpret,
                ways=ways_c)
            pend.append((sel, out))
    if defer:
        return (nb, pend, out_lens)
    return _split_decode_fetch((nb, pend, out_lens))


def _split_decode_fetch(state) -> np.ndarray:
    """Fetch phase of the split decode: sync the queued dispatches and
    splice blocks back into frame order. Separated so the multi-frame
    pipeline (device_decompress_frames) can dispatch EVERY frame's kernels
    before paying the first sync."""
    nb, pend, out_lens = state
    outs = [None] * nb  # per-block u8 rows, original indexing
    for sel, out in pend:
        out_np = np.asarray(out)
        for k, b in enumerate(sel):
            outs[b] = out_np[k]
    return np.concatenate(
        [outs[i][: int(out_lens[i])] for i in range(nb)]) \
        if nb else np.empty(0, np.uint8)


def _decode_linked_pallas(buf, blocks, bs, window=None) -> np.ndarray:
    """Linked-frame decode via the chained Pallas interpreter: chunks of
    blocks decode serially INSIDE one kernel call (cross-block
    back-references are plain negative offsets in the chained io layout);
    the 64 KB window carries between chunk calls as a device array, so the
    only per-chunk host traffic is the wire bytes in and plaintext out."""
    import jax

    from ..ops.pallas_decode import (SLACK, SMEM_STREAM_BUDGET, VMEM_BUDGET,
                                     decode_linked_chunk_pallas)
    from ..ops.pallas_decode import _round_up as _ru

    nb = len(blocks)
    max_comp = max((size for _, size, _ in blocks), default=1)
    M = _bucket_pow2(_ru(max_comp + SLACK, 1024), 1024)
    # Chunk rows: the chained io region + comp windows must fit VMEM and
    # the packed parse stream should fit SMEM.
    CH = 16
    while CH > 1 and ((WINDOW_SIZE + CH * bs + SLACK) * 4 + CH * M * 4
                      > VMEM_BUDGET or CH * M > SMEM_STREAM_BUDGET):
        CH //= 2

    comp = np.zeros((nb, M), np.uint8)
    lens = np.zeros(nb, np.int32)
    stored = np.zeros(nb, np.int32)
    for i, (off, size, st) in enumerate(blocks):
        comp[i, :size] = buf[off: off + size]
        lens[i] = size
        stored[i] = 1 if st else 0

    win = np.zeros(WINDOW_SIZE, np.uint8)
    if window is not None:
        win[WINDOW_SIZE - len(window):] = window
    d_win = jnp.asarray(win)
    interp = jax.default_backend() != "tpu"

    parts = []
    for i in range(0, nb, CH):
        rows = min(CH, nb - i)
        # Always pad to CH: one compiled shape per (CH, M), and the pad
        # never exceeds the VMEM/SMEM budget the CH loop just enforced
        # (zero-length rows decode to nothing).
        target = CH

        def pad(a):
            if rows == target:
                return a[i: i + rows]
            return np.concatenate(
                [a[i: i + rows],
                 np.zeros((target - rows,) + a.shape[1:], a.dtype)])

        out, total, _, d_win = decode_linked_chunk_pallas(
            jnp.asarray(pad(comp)), jnp.asarray(pad(lens)),
            jnp.asarray(pad(stored)), d_win, bs, interp)
        parts.append((out, total))
    if not parts:
        return np.empty(0, np.uint8)
    return np.concatenate([np.asarray(o)[: int(t)] for o, t in parts])


def _decode_linked(buf, blocks, bs, window=None) -> np.ndarray:
    """Linked-frame device decode: one jitted scan carrying the window."""
    from ..ops.linked_xla import decode_linked_scan

    nb = len(blocks)
    max_comp = max((size for _, size, _ in blocks), default=1)
    m_cap = min(_bucket_pow2(max_comp), block_bound(bs))
    nbp = _rows_bucket(nb)
    comp = np.zeros((nbp, m_cap), np.uint8)
    lens = np.zeros(nbp, np.int32)
    stored = np.zeros(nbp, np.int32)
    for i, (off, size, st) in enumerate(blocks):
        comp[i, :size] = buf[off: off + size]
        lens[i] = size
        stored[i] = 1 if st else 0

    init_window = np.zeros(WINDOW_SIZE, np.uint8)
    init_filled = 0
    if window is not None:
        init_filled = len(window)
        init_window[WINDOW_SIZE - init_filled:] = window

    outs, out_lens = decode_linked_scan(
        jnp.asarray(comp), jnp.asarray(lens), jnp.asarray(stored),
        jnp.asarray(init_window), jnp.int32(init_filled), bs)

    from ..ops.assemble_xla import concat_blocks
    flat, total = concat_blocks(outs[:nb], out_lens[:nb], nb * bs)
    return np.asarray(flat[: int(total)].astype(jnp.uint8))


# ---------------------------------------------------------------------------
# Multi-frame pipelining (VERDICT r3 #5): the e2e device path pays this
# link's ~30 ms dispatch+sync per frame; queueing every frame's device work
# before the first sync (and overlapping host parse/serialize of frame k
# with device compute of frames k+1..) amortizes it the way the kernel
# tiers already do.
# ---------------------------------------------------------------------------

def _fetch_stacked(arrs):
    """Fetch a list of queued device arrays with ONE host sync per
    distinct (trailing-shape, dtype) group: concatenate on device and pull
    a single buffer — on the tunneled link every separate np.asarray pays
    its own ~30 ms dispatch+sync round trip, which dominated the
    multi-frame path when fetched per frame. Returns numpy views in input
    order."""
    if not arrs:
        return []
    res = [None] * len(arrs)
    groups = {}
    for idx, a in enumerate(arrs):
        groups.setdefault((tuple(a.shape[1:]), str(a.dtype)),
                          []).append(idx)
    for idxs in groups.values():
        if len(idxs) == 1:
            res[idxs[0]] = np.asarray(arrs[idxs[0]])
            continue
        flat = np.asarray(jnp.concatenate([arrs[i] for i in idxs], axis=0))
        pos = 0
        for i in idxs:
            r = arrs[i].shape[0]
            res[i] = flat[pos: pos + r]
            pos += r
    return res


def device_compress_frames(datas, config: FrameConfig = DEFAULT_CONFIG,
                           dictionary=None, engine: str = "split"):
    """Encode N payloads into N frames with device dispatches PIPELINED.

    Phase 1 queues every frame's chain-kernel dispatches (JAX dispatch is
    async); phase 2 pulls EVERY frame's chains in one stacked fetch (one
    link sync instead of one per frame), then runs the host
    select/serialize per frame. Shapes stay canonical (per-frame chunking
    unchanged), so no new kernel compiles. Falls back to serial
    device_compress_frame calls for configurations the chain-direct path
    doesn't serve.
    """
    datas = list(datas)
    eligible = engine == "split" and config.block_independence \
        and not config.block_checksums
    big = False
    if eligible:
        from ..ops.hybrid_encode import hybrid_max_bs
        big = config.resolved_block_size > hybrid_max_bs()
    if eligible and big:
        # Big-block frames (the reference's 4 MB default) pipeline through
        # the segment engine: every frame's chain dispatches queue before
        # ONE stacked chain fetch (VERDICT r4 #6).
        from .bigblock import compress_frames_big
        return compress_frames_big(datas, config, dictionary)
    if not eligible:
        return [device_compress_frame(d, config, dictionary=dictionary,
                                      engine=engine) for d in datas]
    states = [_compress_independent_split(d, config, dictionary, defer=True)
              for d in datas]
    fetched = _fetch_stacked([c for s in states for (_, _, c) in s[6]])
    k = 0
    out = []
    for s in states:
        pend = []
        for (i, rows, _c) in s[6]:
            pend.append((i, rows, fetched[k]))
            k += 1
        out.append(_split_encode_fetch(s[:6] + (pend,) + s[7:]))
    return out


def device_decompress_frames(frames, verify_checksum: bool = True,
                             dictionary=None, engine: str = "split"):
    """Decode N frames with device dispatches PIPELINED (see
    device_compress_frames). Frame k+1's host record parse overlaps frame
    k's kernels; all syncs land in phase 2. Ineligible frames (linked,
    big-block, non-split engines) decode in place via
    device_decompress_frame — order is preserved either way."""
    frames = [ensure_buffer(f) for f in frames]
    results = [None] * len(frames)
    pend = []
    wave_pend = []
    window, dict_id = _dict_window(dictionary)
    for i, buf in enumerate(frames):
        header, blocks, tail = parse_block_index(buf, verify_checksum)
        bs = header["block_max"]
        big = engine == "split" and header["independent"] and blocks \
            and bs > _SPLIT_MAX_BS
        if not (engine == "split" and header["independent"] and blocks
                and (bs <= _SPLIT_MAX_BS or big)):
            results[i] = device_decompress_frame(
                buf, verify_checksum, dictionary=dictionary, engine=engine)
            continue
        if header["dict_id"] is not None:
            if window is None:
                raise ValueError("LZ4: Frame requires a Dictionary")
            if dict_id != header["dict_id"]:
                raise ValueError("LZ4: Dictionary ID Mismatch")
        if verify_checksum and header["block_checksums"]:
            for off, size, _ in blocks:
                stored = read_u32le(buf, off + size)
                if stored != xxhash32(buf[off: off + size], 0):
                    raise ValueError("LZ4: Block Checksum Error")
        if big:
            # Big-block frames: queue each frame's ONE wave kernel now,
            # sync with the stacked fetch below (VERDICT r4 #6). A None
            # plan (giant RLE) falls back to the serial path.
            from ..ops.wave_decode import decompress_frame_waves
            st = decompress_frame_waves(buf, blocks, header, window,
                                        defer=True)
            if st is None:
                results[i] = device_decompress_frame(
                    buf, verify_checksum, dictionary=dictionary,
                    engine=engine)
            else:
                wave_pend.append((i, st, header, buf, tail))
            continue
        state = _decode_independent_split(buf, blocks, bs, window,
                                          defer=True)
        pend.append((i, state, header, buf, tail))
    # ONE stacked fetch for every frame's decoded chunks (per-frame
    # np.asarray paid a ~30 ms link sync each). Wave outputs ride the
    # same fetch (grouped by trailing shape).
    fetched = _fetch_stacked(
        [out for _, st, _, _, _ in pend for (_, out) in st[1]]
        + [st[0].reshape(-1) for _, st, _, _, _ in wave_pend])
    # (wave outputs flattened: per-frame (ways, G, chunk) shapes differ,
    # flat u8 rows share one fetch group)
    k = 0

    def _verify_tail(header, buf, tail, out):
        if header["content_checksum"] and verify_checksum:
            if tail + 4 > len(buf):
                raise ValueError("LZ4: Malformed Input")
            if read_u32le(buf, tail) != xxhash32(out, 0):
                raise ValueError("LZ4: Content Checksum Error")

    for i, state, header, buf, tail in pend:
        nb_f, pend_f, out_lens_f = state
        np_pend = []
        for (sel, _out) in pend_f:
            np_pend.append((sel, fetched[k]))
            k += 1
        out = _split_decode_fetch((nb_f, np_pend, out_lens_f))
        _verify_tail(header, buf, tail, out)
        results[i] = out
    from ..ops.wave_decode import waves_assemble
    for fi, st, header, buf, tail in wave_pend:
        d_out, totals, assign = st
        out = waves_assemble(fetched[k].reshape(d_out.shape), totals,
                             assign)
        k += 1
        _verify_tail(header, buf, tail, out)
        results[fi] = out
    return results
