"""Device-side frame assembly and block concatenation (JAX/XLA).

The frame layer's remaining host work after batched block encode is stitching
variable-length block payloads (with 4-byte size words and the stored-block
fallback) into one contiguous byte stream — a Python loop over blocks in the
reference (bufferCompress.js:209-239) and in parallel/device.py's first cut.
These kernels do it on device with the same zone-scatter machinery as the
codec kernels, so the full encode path (blocks → wire bytes) never leaves
the accelerator.

assemble_blocks: [header? no — header is tiny host work] block table + data:
  for every wire byte j: a cumulative-max zone fill maps j to its block and
  intra-block offset; the byte is a size-word byte, a compressed byte, or a
  stored raw byte. EndMark appended.

concat_blocks: drops per-row padding from batched decode output
  (nb, cap) + lens → (total,) contiguous plaintext.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..constants import UNCOMPRESSED_FLAG


@functools.partial(jax.jit, static_argnames=("out_cap",))
def assemble_blocks(outs: jax.Array, out_lens: jax.Array, work: jax.Array,
                    lens: jax.Array, out_cap: int):
    """Assemble the block section of an LZ4 frame on device.

    Args:
      outs: i32[nb, W] compressed block bytes (from encode_blocks_batch).
      out_lens: i32[nb] compressed sizes.
      work: i32[nb, BS] original block payloads (stored-fallback source).
      lens: i32[nb] payload sizes (0 rows are skipped entirely).
      out_cap: static capacity of the result (>= worst case + 4).

    Returns:
      (bytes: i32[out_cap], total): block section incl. the 4-byte EndMark.
    """
    nb, W = outs.shape
    BS = work.shape[1]
    work = work.astype(jnp.int32)  # uint8 OK: widening runs on device

    stored = (out_lens <= 0) | (out_lens >= lens)
    data_len = jnp.where(lens > 0, jnp.where(stored, lens, out_lens), 0)
    wire = jnp.where(lens > 0, 4 + data_len, 0)
    starts = jnp.cumsum(wire) - wire
    total = jnp.sum(wire) + 4  # + EndMark

    size_word = jnp.where(stored,
                          lens.astype(jnp.uint32)
                          | jnp.uint32(UNCOMPRESSED_FLAG),
                          out_lens.astype(jnp.uint32))

    jW = jnp.arange(out_cap, dtype=jnp.int32)
    drop = out_cap
    blk_start = jnp.where(lens > 0, starts, drop)
    marker = (jnp.full(out_cap, -1, jnp.int32)
              .at[blk_start].set(jnp.arange(nb, dtype=jnp.int32),
                                 mode="drop"))
    pos_mark = jnp.where(marker >= 0, jW, -1)
    fill_pos = jax.lax.cummax(pos_mark, axis=0)
    blk = jnp.take(marker, jnp.clip(fill_pos, 0, out_cap - 1), mode="clip")
    blk_c = jnp.clip(blk, 0, nb - 1)
    r = jW - fill_pos  # offset within the block record

    sw = jnp.take(size_word, blk_c)
    size_byte = (sw >> (8 * jnp.clip(r, 0, 3).astype(jnp.uint32))) & 0xFF
    comp_byte = outs[blk_c, jnp.clip(r - 4, 0, W - 1)]
    raw_byte = work[blk_c, jnp.clip(r - 4, 0, BS - 1)]
    data_byte = jnp.where(jnp.take(stored, blk_c), raw_byte, comp_byte)
    byte = jnp.where(r < 4, size_byte.astype(jnp.int32), data_byte)

    in_record = (blk >= 0) & (r < 4 + jnp.take(data_len, blk_c))
    body_end = total - 4
    byte = jnp.where((jW < body_end) & in_record, byte, 0)  # EndMark zeros
    byte = jnp.where(jW < total, byte, 0)
    return byte, total


@functools.partial(jax.jit, static_argnames=("out_cap",))
def concat_blocks(rows: jax.Array, row_lens: jax.Array, out_cap: int):
    """Concatenate padded rows into one contiguous array on device.

    rows: i32[nb, cap]; row_lens: i32[nb]; returns (flat i32[out_cap], total).
    """
    nb, cap = rows.shape
    starts = jnp.cumsum(row_lens) - row_lens
    total = jnp.sum(row_lens)
    jW = jnp.arange(out_cap, dtype=jnp.int32)
    drop = out_cap
    marker = (jnp.full(out_cap, -1, jnp.int32)
              .at[jnp.where(row_lens > 0, starts, drop)]
              .set(jnp.arange(nb, dtype=jnp.int32), mode="drop"))
    pos_mark = jnp.where(marker >= 0, jW, -1)
    fill_pos = jax.lax.cummax(pos_mark, axis=0)
    blk = jnp.take(marker, jnp.clip(fill_pos, 0, out_cap - 1), mode="clip")
    blk_c = jnp.clip(blk, 0, nb - 1)
    r = jW - fill_pos
    byte = rows[blk_c, jnp.clip(r, 0, cap - 1)]
    return jnp.where(jW < total, byte, 0), total
