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
    work = np.zeros((nblocks, block_size), dtype=np.int32)
    lens = np.zeros(nblocks, dtype=np.int32)
    for i in range(nblocks):
        chunk = raw[i * block_size: (i + 1) * block_size]
        work[i, : len(chunk)] = chunk
        lens[i] = len(chunk)
    return work, lens, nblocks


def _frame_header_bytes(config: FrameConfig, n: int) -> np.ndarray:
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
    hdr[4] = flg
    hdr[5] = (config.block_id & 0x07) << 4
    pos = 6
    if config.content_size:
        write_u32le(hdr, pos, n & 0xFFFFFFFF)
        write_u32le(hdr, pos + 4, n >> 32)
        pos += 8
    hdr[pos] = (xxhash32(hdr[4:pos], 0) >> 8) & 0xFF
    return hdr[: pos + 1]


def device_compress_frame(data,
                          config: FrameConfig = DEFAULT_CONFIG,
                          use_fingerprints: Optional[bool] = None,
                          encode_batch=None) -> np.ndarray:
    """Compress *data* into an LZ4 frame with the block codec on device.

    Independent frames batch data-parallel (BASELINE configs 1/2/5); linked
    frames run as a single jitted lax.scan carrying the 64 KB window on
    device (BASELINE config 3). *encode_batch* optionally overrides the
    batch kernel (the sharded codec passes its shard_map-wrapped version).
    """
    if use_fingerprints is None:
        use_fingerprints = config.favor_ratio
    if not config.block_independence:
        return _compress_linked(data, config, use_fingerprints)

    raw = ensure_buffer(data)
    n = len(raw)
    bs = config.resolved_block_size
    work, lens, nblocks = _blocks_to_batch(raw, bs)

    if encode_batch is None:
        def encode_batch(w, l):
            return encode_blocks_batch(w, l, 0, use_fingerprints,
                                       jnp.zeros(w.shape[0], jnp.int32))
    d_work = jnp.asarray(work)
    outs, out_lens = encode_batch(d_work, jnp.asarray(lens))

    if not config.block_checksums and n > 0:
        # Fast path: stitch size words + payloads (incl. stored fallback and
        # EndMark) on device; only the tiny header is host work.
        from ..ops.assemble_xla import assemble_blocks
        cap = nblocks * (4 + bs) + 4
        body, body_total = assemble_blocks(
            jnp.asarray(outs), jnp.asarray(out_lens), d_work,
            jnp.asarray(lens), cap)
        body_np = np.asarray(body[: int(body_total)]).astype(np.uint8)
        header = _frame_header_bytes(config, n)
        parts = [header, body_np]
        if config.content_checksum:
            ck = np.empty(4, np.uint8)
            write_u32le(ck, 0, xxhash32(raw, 0))
            parts.append(ck)
        return np.concatenate(parts)

    outs = np.asarray(outs)
    out_lens = np.asarray(out_lens)

    # --- host frame assembly ---
    frame = np.empty(19 + n + (n // 255) + (16 + 8) * nblocks + 8,
                     dtype=np.uint8)
    pos = 0
    frame[0:4] = (0x04, 0x22, 0x4D, 0x18)
    pos = 4
    flg = (LZ4_VERSION << 6) | 0x20  # independent
    if config.content_checksum:
        flg |= FLG_CONTENT_CHECKSUM
    if config.block_checksums:
        flg |= FLG_BLOCK_CHECKSUM
    if config.content_size:
        flg |= FLG_CONTENT_SIZE
    frame[pos] = flg
    pos += 1
    frame[pos] = (config.block_id & 0x07) << 4
    pos += 1
    if config.content_size:
        write_u32le(frame, pos, n & 0xFFFFFFFF)
        write_u32le(frame, pos + 4, n >> 32)
        pos += 8
    frame[pos] = (xxhash32(frame[4:pos], 0) >> 8) & 0xFF
    pos += 1

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


def parse_block_index(buf: np.ndarray):
    """Host scan of a frame's block table.

    Returns (header, blocks, tail_pos) where blocks is a list of
    (data_offset, size, is_stored) and header is a dict of parsed fields.
    The scan touches only the 4-byte size words — O(nblocks), not O(n).
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
        header["content_size"] = read_u32le(buf, pos) | (
            read_u32le(buf, pos + 4) << 32)
        pos += 8
    if flg & FLG_DICT_ID:
        header["dict_id"] = read_u32le(buf, pos)
        pos += 4
    pos += 1  # header checksum

    blocks = []
    while pos + 4 <= n:
        word = read_u32le(buf, pos)
        pos += 4
        if word == 0:
            break
        size = word & BLOCK_SIZE_MASK
        blocks.append((pos, size, bool(word & UNCOMPRESSED_FLAG)))
        pos += size
        if header["block_checksums"]:
            pos += 4
    return header, blocks, pos


def device_decompress_frame(data, verify_checksum: bool = True,
                            decode_batch=None,
                            engine: str = "xla") -> np.ndarray:
    """Decompress an LZ4 frame with batched device block decode.

    Independent frames decode fully data-parallel. Linked frames decode as a
    sequential chain of device calls carrying the 64 KB window.

    engine: "xla" (two-phase data-parallel kernel) or "pallas" (the
    scalar-interpreter kernel — ~11x faster per chip, see
    ops/pallas_decode.py). Applies to independent frames.
    """
    buf = ensure_buffer(data)
    header, blocks, tail = parse_block_index(buf)
    bs = header["block_max"]

    if verify_checksum and header["block_checksums"]:
        for off, size, _ in blocks:
            stored = read_u32le(buf, off + size)
            if stored != xxhash32(buf[off: off + size], 0):
                raise ValueError("LZ4: Block Checksum Error")

    if not blocks:
        result = np.empty(0, dtype=np.uint8)
    elif header["independent"] and engine == "pallas" and decode_batch is None:
        result = _decode_independent_pallas(buf, blocks, bs)
    elif header["independent"]:
        result = _decode_independent(buf, blocks, bs, decode_batch)
    else:
        result = _decode_linked(buf, blocks, bs)

    if header["content_checksum"] and verify_checksum:
        stored = read_u32le(buf, tail)
        if stored != xxhash32(result, 0):
            raise ValueError("LZ4: Content Checksum Error")
    return result


def _bucket_pow2(n: int, floor: int = 4096) -> int:
    b = floor
    while b < n:
        b <<= 1
    return b


def _decode_independent(buf, blocks, bs, decode_batch=None) -> np.ndarray:
    nb = len(blocks)
    # Phase A of the decode kernel scales with the padded compressed width;
    # bucket it to the batch's actual maximum instead of the worst-case
    # bound (typically 3-4x smaller on compressible data).
    max_comp = max((size for _, size, stored in blocks if not stored),
                   default=1)
    m_cap = min(_bucket_pow2(max_comp), block_bound(bs))
    comp = np.zeros((nb, m_cap), dtype=np.int32)
    lens = np.zeros(nb, dtype=np.int32)
    stored_rows = {}
    for i, (off, size, stored) in enumerate(blocks):
        if stored:
            stored_rows[i] = buf[off: off + size]
        else:
            comp[i, :size] = buf[off: off + size]
            lens[i] = size
    hist = np.zeros((nb, WINDOW_SIZE), dtype=np.int32)
    if decode_batch is None:
        def decode_batch(c, l, h):
            return decode_blocks_batch(c, l, h, bs)
    outs, out_lens = decode_batch(jnp.asarray(comp), jnp.asarray(lens),
                                  jnp.asarray(hist))

    if not stored_rows:
        # Fast path: drop row padding on device, one contiguous result.
        from ..ops.assemble_xla import concat_blocks
        flat, total = concat_blocks(jnp.asarray(outs), jnp.asarray(out_lens),
                                    nb * bs)
        return np.asarray(flat[: int(total)]).astype(np.uint8)

    outs = np.asarray(outs)
    out_lens = np.asarray(out_lens)
    parts = []
    for i in range(nb):
        if i in stored_rows:
            parts.append(stored_rows[i])
        else:
            parts.append(outs[i, : int(out_lens[i])].astype(np.uint8))
    return np.concatenate(parts) if parts else np.empty(0, np.uint8)


def _rows_bucket(nb: int) -> int:
    b = 4
    while b < nb:
        b <<= 1
    return b


def _compress_linked(data, config: FrameConfig,
                     use_fingerprints: bool) -> np.ndarray:
    """Linked-frame device encode: one jitted scan over the block chain."""
    from ..ops.linked_xla import encode_linked_scan

    if config.block_checksums:
        # Device assembly does not interleave block checksums; the host
        # frame layer covers that configuration.
        from ..frame import compress_frame
        return compress_frame(data, None, config)

    raw = ensure_buffer(data)
    n = len(raw)
    bs = config.resolved_block_size
    work, lens, nblocks = _blocks_to_batch(raw, bs)
    nbp = _rows_bucket(nblocks)
    if nbp > nblocks:
        work = np.concatenate(
            [work, np.zeros((nbp - nblocks, bs), np.int32)])
        lens = np.concatenate([lens, np.zeros(nbp - nblocks, np.int32)])

    outs, out_lens = encode_linked_scan(
        jnp.asarray(work), jnp.asarray(lens),
        jnp.zeros(WINDOW_SIZE, jnp.int32), jnp.int32(0),
        bs, use_fingerprints)

    from ..ops.assemble_xla import assemble_blocks
    cap = nblocks * (4 + bs) + 4
    body, body_total = assemble_blocks(
        outs[:nblocks], out_lens[:nblocks], jnp.asarray(work[:nblocks]),
        jnp.asarray(lens[:nblocks]), cap)
    body_np = np.asarray(body[: int(body_total)]).astype(np.uint8)
    header = _frame_header_bytes(config.with_(block_independence=False), n)
    parts = [header, body_np]
    if config.content_checksum:
        ck = np.empty(4, np.uint8)
        write_u32le(ck, 0, xxhash32(raw, 0))
        parts.append(ck)
    return np.concatenate(parts)


def _decode_independent_pallas(buf, blocks, bs) -> np.ndarray:
    """Independent-frame decode via the Pallas scalar-interpreter kernel."""
    import jax

    from ..ops.pallas_decode import SLACK, decode_blocks_pallas
    from ..ops.pallas_decode import _round_up as _ru

    nb = len(blocks)
    stored_rows = {}
    max_comp = 1
    for i, (off, size, stored) in enumerate(blocks):
        if stored:
            stored_rows[i] = buf[off: off + size]
        else:
            max_comp = max(max_comp, size)
    M = _ru(max_comp + SLACK, 1024)
    comp = np.zeros((nb, M), np.int32)
    lens = np.zeros(nb, np.int32)
    for i, (off, size, stored) in enumerate(blocks):
        if not stored:
            comp[i, :size] = buf[off: off + size]
            lens[i] = size
    hist = jnp.zeros((nb, WINDOW_SIZE), jnp.int32)
    outs, out_lens = decode_blocks_pallas(
        jnp.asarray(comp), jnp.asarray(lens), hist, bs, False,
        jax.default_backend() != "tpu")
    outs = np.asarray(outs)
    out_lens = np.asarray(out_lens)
    parts = []
    for i in range(nb):
        if i in stored_rows:
            parts.append(stored_rows[i])
        else:
            parts.append(outs[i, : int(out_lens[i])].astype(np.uint8))
    return np.concatenate(parts) if parts else np.empty(0, np.uint8)


def _decode_linked(buf, blocks, bs) -> np.ndarray:
    """Linked-frame device decode: one jitted scan carrying the window."""
    from ..ops.linked_xla import decode_linked_scan

    nb = len(blocks)
    max_comp = max((size for _, size, _ in blocks), default=1)
    m_cap = min(_bucket_pow2(max_comp), block_bound(bs))
    nbp = _rows_bucket(nb)
    comp = np.zeros((nbp, m_cap), np.int32)
    lens = np.zeros(nbp, np.int32)
    stored = np.zeros(nbp, np.int32)
    for i, (off, size, st) in enumerate(blocks):
        comp[i, :size] = buf[off: off + size]
        lens[i] = size
        stored[i] = 1 if st else 0

    outs, out_lens = decode_linked_scan(
        jnp.asarray(comp), jnp.asarray(lens), jnp.asarray(stored),
        jnp.zeros(WINDOW_SIZE, jnp.int32), jnp.int32(0), bs)

    from ..ops.assemble_xla import concat_blocks
    flat, total = concat_blocks(outs[:nb], out_lens[:nb], nb * bs)
    return np.asarray(flat[: int(total)]).astype(np.uint8)
